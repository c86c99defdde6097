#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify, then
for each query compare its parquet dump against DuckDB executing the declared
oracle SQL over the same testdata tables. Usage:

    python3 scripts/check_oracle.py /root/testdata/sf0.01 [outDir]

Pass --no-spark to reuse an existing outDir without re-running Verify."""
import sys, os, json, subprocess, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    """Sort columns by name, stringify values, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/graft-verify-out"
    if "--no-spark" not in sys.argv:
        subprocess.run(["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
                       cwd="/root/repo", check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = f"{out_dir}/{name}"
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
            got_cols, got_rows = canon(got.fetchall(), got.columns)
            want = con.sql(oracle[name])
            want_cols, want_rows = canon(want.fetchall(), want.columns)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}"); n_fail += 1
        elif got_rows != want_rows:
            diff = [(a, b) for a, b in zip(got_rows, want_rows) if a != b][:3]
            print(f"FAIL {name}: {len(got_rows)} vs {len(want_rows)} rows; first diffs: {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)"); n_pass += 1

    # queries with no oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        name = os.path.basename(d)
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"ROWS {name}: {n}")

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
