#!/usr/bin/env python3
"""Local dev harness mirroring the driver's t2 correctness gate.

Usage:
  python3 tools/check_oracle.py [sfDir] [outDir] [--skip-verify] [query...]

Runs `sbt runMain graft.Verify <sfDir> <outDir>` (unless --skip-verify),
then for each query in <outDir>/oracle_sql.json: executes the oracle SQL
in DuckDB (views named after the parquet tables) and compares against
the Spark parquet dump — columns sorted by name, rows sorted by all
columns, exact value equality (floats compared exactly; report max
abs diff when close).
"""
import json, math, struct, subprocess, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    # Floats compare BITWISE (the driver hashes typed values, so -0.0 vs
    # 0.0 or a 1-ulp difference is a real failure even though == passes).
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v).hex()
    return v


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    only = set(args[2:])

    if "--skip-verify" not in flags:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-3000:], r.stderr[-3000:])
            sys.exit(1)

    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pdir = Path(out_dir, name)
        if not pdir.exists():
            print(f"FAIL {name}: no Spark output dir")
            n_fail += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_fail += 1
            continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        gv = [[norm(v) for v in row] for row in g.itertuples(index=False)]
        ev = [[norm(v) for v in row] for row in e.itertuples(index=False)]
        if gv == ev:
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        else:
            # find worst float diff / first mismatch
            worst = 0.0
            first = None
            for i, (a, b) in enumerate(zip(gv, ev)):
                if a != b:
                    for x, y in zip(a, b):
                        if isinstance(x, float) and isinstance(y, float):
                            worst = max(worst, abs(x - y))
                        elif x != y and first is None:
                            first = (i, x, y)
                    if first is None and worst == 0.0:
                        first = (i, a, b)
            print(f"FAIL {name}: value mismatch, max float diff {worst:.3e}, first non-float mismatch {first}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
