#!/usr/bin/env python3
"""Time the oracle SQL suite in DuckDB over the same parquet tables the
Spark bench reads — the same-host comparator for BENCH totals (the judge's
methodology: warm pass first, then min-of-N per query).

Usage: python3 dev/duckbench.py /tmp/verify_out/oracle_sql.json /root/testdata/sf0.1 [reps]
"""
import json
import os
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(oracle_json, sfdir, reps=3):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(oracle_json))
    # warm pass: page cache + duckdb internal state, not measured
    for name, sql in sqls.items():
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            print(f"WARM-FAIL {name}: {e}", file=sys.stderr)
    def measure(sql, n):
        rep_times = []
        for _ in range(n):
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except Exception:
                break
            rep_times.append(time.perf_counter() - t0)
        if not rep_times:
            return None, 0.0
        # symmetric with the Spark bench's estimator: the reported
        # statistic is the min, so the flag is the agreement of the
        # two best reps — if even they disagree >30%, the number is
        # soft; single mid-rep outliers (GC, scheduler) are not
        s = sorted(rep_times)
        spread = (s[1] - s[0]) / s[0] if len(s) >= 2 and s[0] > 0 else 0.0
        return min(rep_times), spread

    times = {}
    unstable = {}
    for name, sql in sqls.items():
        t, spread = measure(sql, reps)
        if t is not None:
            times[name] = t
            if spread > 0.3:
                unstable[name] = round(spread, 2)
    # adaptive retry, symmetric with the Spark bench: flagged queries
    # get their own reps doubled (up to two rounds); the min merges,
    # the flag is re-judged on the larger retry sample
    for rnd in (1, 2):
        if not unstable:
            break
        for name in list(unstable):
            t, spread = measure(sqls[name], reps * (2 ** rnd))
            if t is not None:
                times[name] = min(times[name], t)
                if spread > 0.3:
                    unstable[name] = round(spread, 2)
                else:
                    del unstable[name]
    total = sum(times.values())
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "n_queries": len(times),
                      "sf": sfdir, "unstable": unstable,
                      "queries": {k: round(v, 6) for k, v in
                                  sorted(times.items(), key=lambda x: -x[1])}}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
