#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate: for each query dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables
and compare (rows, schema-by-sorted-column-name, values).

Usage: python3 dev/check.py /tmp/verify_out /root/testdata/sf0.01
"""
import glob
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    # EXACT comparison, floats included: both engines compute the same
    # arithmetic on the same data, and every query ROUNDs or
    # integer-scales its float outputs — so bitwise equality is the
    # contract. Rounding here would mask diffs the driver's hash-compare
    # would catch.
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only checks for registered queries without an oracle. Iterate
    # the REGISTERED list (queries.json), not the directories that
    # happen to exist: a query that crashed and wrote nothing must FAIL,
    # and a stale/foreign directory must not count as a pass.
    registered = json.load(open(f"{outdir}/queries.json"))
    for name in sorted(set(registered) - set(oracle)):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        n = (con.execute(f"SELECT count(*) FROM read_parquet({files!r})")
             .fetchone()[0] if files else 0)
        if n > 0:
            print(f"PASS {name} (rows-only, {n} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: no output or no rows")
            n_fail += 1
    for stale in sorted(
            {os.path.basename(p.rstrip("/")) for p in glob.glob(f"{outdir}/*/")}
            - set(registered)):
        print(f"WARN stale output dir not in registered queries: {stale}")
    for name in sorted(oracle):
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            mine = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        mc, wc = sorted(mine.columns), sorted(want.columns)
        if mc != wc:
            print(f"FAIL {name}: columns {mc} vs {wc}")
            n_fail += 1
            continue
        a = [[canon(v) for v in row] for row in mine[mc].itertuples(index=False)]
        b = [[canon(v) for v in row] for row in want[wc].itertuples(index=False)]
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if bad:
            i, x, y = bad[0]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first at {i}:")
            print(f"  mine:   {x}")
            print(f"  oracle: {y}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
