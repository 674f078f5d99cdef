#!/usr/bin/env python3
"""Pins floorcheck.py's adjudication behaviors (VERDICT r18 #4 +
ADVICE r18 #1/#2). Standalone — `python3 tools/test_floorcheck.py`
from the repo root; part of the MAINTENANCE §3 gate ritual. Uses
synthetic bench lines plus, when the committed artifacts exist, the
literal r18 retained-window pool that motivated the refusal.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
TOOL = os.path.join(HERE, "floorcheck.py")
REPO = os.path.dirname(HERE)


def line(queries, total_min=100.0, foreign=None, contended=None,
         cpu=None, io=None, note=None):
    d = {"metric": "total", "value": sum(queries.values()), "unit": "sec",
         "n": 3, "queries": queries, "total_min": total_min}
    if foreign is not None:
        d["foreign_cpu_sec"] = foreign
    if contended is not None:
        d["contended"] = contended
    if cpu is not None:
        d["canary_sec"] = cpu
    if io is not None:
        d["canary_io"] = io
    if note is not None:
        d["_note"] = note
    return json.dumps(d)


def run(args):
    p = subprocess.run([sys.executable, TOOL] + args,
                       capture_output=True, text=True)
    return p.returncode, p.stdout, p.stderr


def main():
    failures = []

    def check(name, cond, detail=""):
        status = "ok" if cond else "FAIL"
        print(f"[{status}] {name}" + (f" — {detail}" if not cond else ""))
        if not cond:
            failures.append(name)

    q = {"q10": 4.0, "x41": 3.0, "x107": 3.0}
    slow = {"q10": 6.0, "x41": 4.5, "x107": 4.5}  # consistent +50%
    with tempfile.TemporaryDirectory() as td:
        old = os.path.join(td, "old.json")
        with open(old, "w") as f:
            f.write(line(q, foreign=[1.0, 1.0, 1.0], note="quiet OLD"))
        # every NEW line contended by its own gauges (foreign > 10)
        allbad = os.path.join(td, "allbad.jsonl")
        with open(allbad, "w") as f:
            for i in range(3):
                f.write(line(slow, total_min=120.0,
                             foreign=[50.0, 40.0, 60.0],
                             contended=[True, True, True],
                             note=f"contended NEW {i}") + "\n")
        # mixed pool: one band-eligible line among the contended
        mixed = os.path.join(td, "mixed.jsonl")
        with open(mixed, "w") as f:
            f.write(line(slow, foreign=[50.0, 40.0, 60.0],
                         contended=[True, True, True], note="bad") + "\n")
            f.write(line(q, foreign=[1.0, 2.0, 1.0],
                         contended=[False, False, False], note="good") + "\n")
        # emitted flag contradicts the gauges (drift must warn sans --quiet).
        # The pool also carries a quiet line so the run ADJUDICATES rather
        # than refusing — the pinned claim (ADVICE r18 #1) is the warning
        # alongside a completed plain-mode verdict, not pre-refusal output
        drift = os.path.join(td, "drift.jsonl")
        with open(drift, "w") as f:
            f.write(line(q, foreign=[50.0], contended=[False],
                         note="drifted") + "\n")
            f.write(line(q, foreign=[1.0], contended=[False],
                         note="quiet peer") + "\n")

        # 1. refusal: all-contended NEW pool exits nonzero, names the fix
        rc, out, err = run([old, allbad])
        check("refusal on all-contended pool", rc != 0)
        refusal_text = (err + out)
        check("refusal names REFUSED + --force",
              "REFUSED" in refusal_text and "--force" in refusal_text,
              refusal_text[:200])
        check("refusal prints no verdict", "VERDICT" not in out, out[:200])

        # 2. --force overrides, warns on stderr, verdict is printed
        rc, out, err = run(["--force", old, allbad])
        check("--force proceeds", rc == 0, err[:200])
        check("--force warns on stderr",
              "[warn]" in err and "suspect" in err, err[:200])
        check("--force verdict present (the fake CONSISTENT rows)",
              "VERDICT" in out and "consistent regression" in out, out[:300])

        # 3. --quiet on the same pool drops everything and errors
        rc, out, err = run(["--quiet", old, allbad])
        check("--quiet drops all and errors", rc != 0)
        check("--quiet drop notice on stderr (ADVICE r18 #2)",
              "dropped 3 contended" in err, err[:200])
        check("stdout carries no [quiet] noise", "[quiet]" not in out)

        # 4. mixed pool: no refusal, adjudication runs
        rc, out, err = run([old, mixed])
        check("mixed pool adjudicates", rc == 0 and "VERDICT" in out,
              (err + out)[:200])
        check("mixed pool not refused", "REFUSED" not in err + out)

        # 4b. gauge-less pool (pre-r15 lines): slips past the refusal on
        #     absence of evidence, so it must ADJUDICATE but carry the
        #     no-quiet-witness caveat on stderr (ADVICE r19 #4) — and the
        #     mixed pool above (an affirmatively-quiet line present) must
        #     NOT carry it
        gaugeless = os.path.join(td, "gaugeless.jsonl")
        with open(gaugeless, "w") as f:
            for i in range(2):
                f.write(line(slow, note=f"pre-r15 NEW {i}") + "\n")
        rc, out, err = run([old, gaugeless])
        check("gauge-less pool adjudicates", rc == 0 and "VERDICT" in out,
              (err + out)[:200])
        check("gauge-less pool caveat on stderr (ADVICE r19 #4)",
              "affirmatively quiet" in err, err[:300])
        check("gauge-less caveat not on stdout",
              "affirmatively quiet" not in out)
        rc, out, err = run([old, mixed])
        check("mixed pool carries no gauge-less caveat",
              "affirmatively quiet" not in err + out, (err + out)[:200])
        # an emitted-only line (contended flag present, RAW gauge arrays
        # stripped) asserts quiet without evidence — it must not count
        # as an affirmative witness either (review r20)
        emitonly = os.path.join(td, "emitonly.jsonl")
        with open(emitonly, "w") as f:
            f.write(line(slow, contended=[False, False, False],
                         note="emitted-only") + "\n")
        rc, out, err = run([old, emitonly])
        check("emitted-only pool adjudicates with the caveat",
              rc == 0 and "VERDICT" in out and "affirmatively quiet" in err,
              (err + out)[:300])

        # 5. trigger-drift cross-check fires WITHOUT --quiet (ADVICE r18 #1),
        #    and the plain-mode adjudication still completes around it
        rc, out, err = run([old, drift])
        check("drift warning in plain mode", "trigger drift" in err,
              err[:200])
        check("drift pool still adjudicates", rc == 0 and "VERDICT" in out,
              (err + out)[:200])
        # and the warning goes to stderr, not the stdout report
        check("drift warning on stderr only", "trigger drift" not in out)

    # 6. the literal r18 reproduction, when the artifacts are present:
    #    OLD = BENCH_r14 (quiet cross-day), NEW = the all-steal-contended
    #    r17+r18 sidecars + BENCH_r17 — the pool that faked 15 CONSISTENT
    #    rows. The tool must now refuse it outright.
    pool = [os.path.join(REPO, p) for p in
            ("BENCH_r14.json", "BENCH_r17_selfruns.jsonl",
             "BENCH_r18_selfruns.jsonl", "BENCH_r17.json")]
    if all(os.path.exists(p) for p in pool):
        rc, out, err = run([pool[0]] + pool[1:])
        check("r18 retained-window pool is refused", rc != 0
              and "REFUSED" in err + out, (err + out)[:300])
        rc, out, err = run(["--quiet", pool[0]] + pool[1:])
        # the documented behaviors only — a crash (traceback) must FAIL
        # this check, not hide behind "any nonzero exit" (review r19)
        check("r18 pool under --quiet adjudicates or errors with the "
              "documented message",
              (rc == 0 and "VERDICT" in out)
              or (rc != 0 and "dropped every NEW run" in err + out
                  and "Traceback" not in err),
              (err + out)[:300])
    else:
        print("[skip] committed r14/r17/r18 artifacts not all present")

    if failures:
        print(f"\n{len(failures)} FAILED: {failures}")
        return 1
    print("\nall floorcheck behavior checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
