#!/usr/bin/env python3
"""Dev-loop parity checker: mimics the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir> [query ...]

Reads each Verify-written parquet result and the dumped oracle_sql.json,
runs the oracle SQL in DuckDB against views over the testdata parquet,
sorts columns by name + rows by all columns, and diffs values exactly.
NOT part of the shipped Scala library — local development tooling only.
"""
import sys, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def to_cmp(v):
    """Array cells (numpy arrays / lists) -> nested tuples so pandas can
    sort and compare them; scalars pass through."""
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(to_cmp(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, to_cmp(x)) for k, x in v.items()))
    return v


def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(to_cmp)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        # dtype mismatches (e.g. DuckDB HUGEINT -> float64 vs Spark int64)
        # hash-fail in the driver even when values compare equal here
        dt = [(c, str(got[c].dtype), str(want[c].dtype))
              for c in got.columns if got[c].dtype != want[c].dtype]
        if dt:
            print(f"FAIL {name}: dtype mismatch {dt}")
            failures += 1
            continue
        bad = None
        ga, wa = got.values, want.values
        for i in range(len(got)):
            for j, c in enumerate(got.columns):
                if not cells_equal(ga[i][j], wa[i][j]):
                    bad = (i, c, ga[i][j], wa[i][j])
                    break
            if bad:
                break
        if bad:
            i, c, g, w = bad
            print(f"FAIL {name}: row {i} col {c}: spark={g!r} oracle={w!r}")
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
