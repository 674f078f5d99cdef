#!/usr/bin/env python3
"""Per-query-delta consistency test between two bench artifacts.

The r15 floor adjudication (SURVEY §15.3) established that on this
host an ENGINE regression shows up as a consistent, concentrated
per-query delta, while environment drift (microVM physical-host
neighbor noise, invisible to in-guest gauges) is diffuse and flips
sign across runs. This tool applies that test mechanically so a floor
drift in round N+1 is adjudicated from committed artifacts instead of
re-running for a flat window that may not exist.

Usage:
    python3 tools/floorcheck.py [--quiet] [--force] OLD NEW [NEW2 ...]

When EVERY NEW line in the pool is band-ineligible (contended by its
own gauges), the tool REFUSES to adjudicate (VERDICT r18 #4): a pool
whose every member shares the slow host-state class fabricates
CONSISTENT regressions — measured twice (r17: 5 fake rows from the
r16+r17 sidecars; r18: 15 fake rows from 12 all-steal-contended runs
against an EMPTY src/main diff). Re-pool with at least one sidecar
from a different host-state class, or pass --force to override with
the caveat printed (e.g. to reproduce the trap on purpose). --quiet
is unaffected — it already drops those lines and errors when none
survive.

--quiet applies the MAINTENANCE §3 band rule to every NEW line
(mechanizing the matched-host-state cut): a line is kept iff at most
one round is canary-flagged and no round is foreign-flagged, read
from the emitted `contended` field (r17+) or derived from the raw
gauge arrays with the same triggers (older lines). Dropped counts are
printed, and lines kept with NO gauge arrays at all (pre-r15) are
announced as unverified. When a line carries both the emitted flag
and raw gauges, the two are cross-checked and a mismatch warns on
stderr (trigger drift between Bench.scala and this file). A file with
zero parseable bench lines errors out even under --quiet. Gauge-only:
pre-foreign-gauge lines whose _note records observed co-tenancy (r15
sidecar lines 8-11) pass the gauge rule and must be excluded by hand
if they matter to the claim. OLD is never filtered — pick it
deliberately.

Each argument is a bench JSON line file (the raw one-line artifact, a
driver BENCH_r{N}.json wrapper with a "parsed" field, or a
BENCH_r15_selfruns.jsonl — for a .jsonl every line is taken as a NEW
run). Compares the per-query medians over keys shared by OLD and every
NEW run (the line keeps only the ~35 slowest, so the shared set is the
expensive queries — exactly where an engine regression matters).

Verdict per query (only queries shared by ALL inputs):
  CONSISTENT — delta vs OLD has the same sign in every NEW run and
               |delta| >= max(0.15 s, 10% of OLD) in every run.
  diffuse    — everything else.

A floor drift with zero CONSISTENT regressions is environment; one
with CONSISTENT regressions names the bisect targets.

CALIBRATION (measured, r15): NEW runs must span HOST STATES (different
days/rounds) — same-day runs share environment and fake consistency in
both directions (q11 read a consistent −1.3 s on byte-identical code
because OLD was a contended driver capture; x34/x67 read a consistent
+0.25 s that the full 14-run day spread shows is a day-shift whose low
equals OLD exactly). Prefer an OLD taken from the same host-state
class (quiet vs driver-contended), and treat a CONSISTENT verdict from
fewer than 3 cross-day NEW runs as a lead, not a conviction.
"""
import json
import sys


# The MAINTENANCE §3 band-rule triggers, mirroring Bench.contendedFlags
CPU_TRIGGER, IO_TRIGGER, FOREIGN_TRIGGER = 0.4, 0.6, 10.0


def round_flags(d, label=None):
    """Per-round (contended, foreign_flagged) from a line's gauges.

    Uses the emitted `contended` array when present (r17+ lines);
    otherwise derives it from the raw gauge arrays with the same
    triggers. foreign_flagged is always derived (the emitted boolean
    doesn't say WHICH gauge tripped).

    Trigger-drift cross-check (ADVICE r17 #2): the constants above
    mirror Bench.contendedFlags by hand, and only BenchLineSpec pins
    the Scala side. Whenever a line carries BOTH the emitted array and
    gauge arrays, derive the flag independently and warn on mismatch —
    so a future Scala recalibration can't silently mix old-trigger
    derivations (pre-r17 lines) with new-trigger emitted flags in one
    pool. The emitted value still wins (it reflects the triggers in
    force when the line was captured).
    """
    cpu = d.get("canary_sec") or []
    io = d.get("canary_io") or []
    fg = d.get("foreign_cpu_sec") or []
    emitted = d.get("contended")
    n = max(len(cpu), len(io), len(fg), len(emitted or []))
    out = []
    mismatches = []
    for i in range(n):
        fg_flag = i < len(fg) and fg[i] > FOREIGN_TRIGGER
        has_gauge = i < len(cpu) or i < len(io) or i < len(fg)
        derived = (fg_flag
                   or (i < len(cpu) and cpu[i][1] > CPU_TRIGGER)
                   or (i < len(io) and io[i][0] >= 0
                       and io[i][1] > IO_TRIGGER))
        if emitted is not None and i < len(emitted):
            c = bool(emitted[i])
            if has_gauge and c != derived:
                mismatches.append(i)
        else:
            c = derived
        out.append((c, fg_flag))
    if mismatches:
        print(f"[warn] {label or 'line'}: emitted contended != derived "
              f"from gauges at round(s) {mismatches} — trigger drift "
              f"between Bench.contendedFlags and floorcheck.py? "
              f"(python triggers: cpu {CPU_TRIGGER} io {IO_TRIGGER} "
              f"foreign {FOREIGN_TRIGGER})", file=sys.stderr)
    return out


def is_band_eligible(fl):
    """MAINTENANCE §3 quiet-band rule over round_flags(line) output:
    at most ONE canary-flagged round and NO foreign-flagged round.
    Gauge-only — note-based exclusions (pre-foreign-gauge co-tenancy
    narration, r15 lines 8-11) are the caller's job; this rule can
    only read what the line carries. A line with NO gauge arrays at
    all (pre-r15, empty fl) is eligible by absence of evidence, not
    evidence of quiet — the caller flags those (ADVICE r17 #3)."""
    if any(fg for _, fg in fl):
        return False
    return sum(1 for c, _ in fl if c) <= 1


def load_runs(path, quiet_only=False):
    """Return a list of (label, {query: median_sec}, total_min,
    band_eligible, gauged) from one file. band_eligible is the
    MAINTENANCE §3 band-rule verdict from the line's own gauges (True
    for gauge-less lines — absence of evidence); gauged says whether
    the line CARRIES gauges at all, so main() can tell affirmatively-
    quiet apart from passed-by-absence (ADVICE r19 #4). The refusal
    logic in main() reads both. round_flags (and its trigger-drift
    cross-check) runs on EVERY line that carries gauges, not just
    under --quiet (ADVICE r18 #1)."""
    runs = []
    found = 0      # lines carrying a queries map, pre-filter
    dropped = 0    # band-ineligible lines removed by --quiet
    gaugeless = 0  # kept by --quiet with no gauge arrays (unverified)
    with open(path) as f:
        text = f.read()
    try:
        lines = [json.dumps(json.loads(text))]  # one (possibly pretty) doc
    except json.JSONDecodeError:
        lines = [l for l in text.splitlines() if l.strip().startswith("{")]
    for i, line in enumerate(lines):
        d = json.loads(line)
        if "parsed" in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        q = d.get("queries")
        if not q:
            continue
        found += 1
        label = (d.get("_note") or f"{path}#{i}")[:60]
        fl = round_flags(d, label=label)
        eligible = is_band_eligible(fl)
        if quiet_only:
            if not eligible:
                dropped += 1
                continue
            if not fl:
                gaugeless += 1
        # gauged = carries RAW gauge arrays (review r20): an emitted-only
        # line ({"contended": [...]} with the arrays stripped) yields a
        # non-empty round_flags, but there is nothing to VERIFY the flag
        # against — for the no-quiet-witness caveat such a line must not
        # count as affirmative evidence
        gauged = bool(d.get("canary_sec") or d.get("canary_io")
                      or d.get("foreign_cpu_sec"))
        runs.append((label, q, d.get("total_min"), eligible, gauged))
    # diagnostics go to stderr like the drift warning — stdout stays
    # the machine-readable report (ADVICE r18 #2)
    if dropped:
        print(f"[quiet] {path}: dropped {dropped} contended line(s)",
              file=sys.stderr)
    if gaugeless:
        # passed the band rule by ABSENCE of gauges, not evidence of
        # quiet (pre-r15 lines) — tell the caller (ADVICE r17 #3)
        print(f"[quiet] {path}: kept {gaugeless} gauge-less line(s) "
              f"unverified (no gauge arrays to apply the band rule to)",
              file=sys.stderr)
    if found == 0:
        # a NEW file with zero parseable bench lines is an input error
        # regardless of --quiet; silently skipping it would let the
        # aggregate message misattribute the empty pool (ADVICE r17 #1)
        raise SystemExit(f"{path}: no bench line with a queries map")
    return runs


def main(argv):
    quiet = "--quiet" in argv
    force = "--force" in argv
    argv = [a for a in argv if a not in ("--quiet", "--force")]
    if len(argv) < 3:
        raise SystemExit(__doc__)
    old_label, old, old_floor, _, _ = load_runs(argv[1])[0]
    news = []
    for p in argv[2:]:
        news.extend(load_runs(p, quiet_only=quiet))
    if not news:
        raise SystemExit("--quiet dropped every NEW run; nothing to compare")
    # Retained-window trap refusal (VERDICT r18 #4): a NEW pool whose
    # EVERY line is affirmatively contended shares one slow host-state
    # class and fabricates CONSISTENT regressions — r17 measured 5 fake
    # rows, r18 measured 15 against an empty src/main diff. Refuse
    # rather than print a poisoned verdict; --force overrides for
    # deliberate reproductions, with the caveat on stderr.
    if not quiet and all(not eligible for _, _, _, eligible, _ in news):
        msg = (f"all {len(news)} NEW line(s) are contended by their own "
               "gauges — a single-host-state pool fakes CONSISTENT "
               "regressions (MAINTENANCE §3 caveat; measured r17/r18). "
               "Re-pool with at least one sidecar from a different "
               "host-state class (then --quiet can cut the contended "
               "lines), or pass --force to override. --quiet on THIS "
               "pool would drop every line.")
        if not force:
            raise SystemExit(f"REFUSED: {msg}")
        print(f"[warn] --force: {msg} Verdict below is suspect.",
              file=sys.stderr)
    # ADVICE r19 #4: the refusal above only fires when every line is
    # AFFIRMATIVELY contended — a pool made entirely of gauge-less
    # (pre-r15) lines slips past it on absence of evidence, yet nothing
    # in it is verified quiet, so the single-host-state trap can still
    # pass unflagged. Adjudication proceeds (old artifacts stay usable)
    # but the caller is told the pool carries no quiet witness.
    elif not any(eligible and gauged for _, _, _, eligible, gauged in news):
        print("[warn] no NEW line is affirmatively quiet (every line is "
              "either contended or carries no gauge arrays to verify) — "
              "the pool may share one host-state class; treat a "
              "CONSISTENT verdict as a lead, not a conviction "
              "(MAINTENANCE §3 caveat).", file=sys.stderr)
    shared = set(old)
    for _, q, _, _, _ in news:
        shared &= set(q)
    print(f"old: {old_label} (floor {old_floor})")
    for label, _, floor, _, _ in news:
        print(f"new: {label} (floor {floor})")
    print(f"shared queries: {len(shared)}")

    rows = []
    for name in shared:
        deltas = [q[name] - old[name] for _, q, _, _, _ in news]
        thresh = max(0.15, 0.10 * old[name])
        consistent = (
            all(d >= thresh for d in deltas)
            or all(d <= -thresh for d in deltas))
        rows.append((name, old[name], deltas, consistent))

    rows.sort(key=lambda r: -max(abs(d) for d in r[2]))
    # The verdict counts over ALL shared rows (ADVICE r15 #1): a small
    # consistent regression (threshold is only max(0.15s, 10%)) ranked
    # below the display slice by max|delta| — easy when diffuse noise
    # spikes larger in single runs — must still flip the verdict. The
    # [:20] slice is display-only; CONSISTENT rows outside it are
    # appended so the table always shows every verdict-bearing row.
    n_consistent_up = sum(
        1 for _, _, deltas, consistent in rows
        if consistent and deltas[0] > 0)
    shown = rows[:20] + [r for r in rows[20:] if r[3]]
    for name, base, deltas, consistent in shown:
        tag = "CONSISTENT" if consistent else "diffuse"
        ds = " ".join(f"{d:+.2f}" for d in deltas)
        print(f"  {tag:10s} {name:28s} {base:6.2f} -> {ds}")

    print()
    if n_consistent_up == 0:
        print("VERDICT: no consistent per-query regression — "
              "floor drift (if any) is environment, not engine.")
    else:
        print(f"VERDICT: {n_consistent_up} consistent regression(s) — "
              "bisect the named queries.")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
