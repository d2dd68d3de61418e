#!/usr/bin/env python3
"""Time the oracle SQL suite in DuckDB over the same parquet tables the
Spark bench reads — the same-host comparator for BENCH totals (the judge's
methodology: warm pass first, then min-of-N per query).

Large scale factors need guard rails (learned at 25x, round 13): a
handful of one-shot oracle formulations are intractable there — the
unrolled Lloyd+PQ SQL died spilling to DISK-FULL in round 9, and the
full-oracle warm pass wrote 77 GB of temp before being killed in round
13. So the runner (a) pins DuckDB's temp spill to its own directory
with a hard size cap, and (b) takes an optional per-query timeout
(enforced via Connection.interrupt from a watchdog timer). A query that
times out or exhausts the spill cap is recorded by NAME in a `failed`
map — the honest statement is "this formulation has no number at this
scale", not a dead host — and is skipped by the measurement passes so
it costs its timeout once, not once per rep.

Usage: python3 dev/duckbench.py ORACLE.json SFDIR [reps] [timeout_s]
  timeout_s = 0 (default) disables the watchdog.
"""
import json
import os
import sys
import threading
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

SPILL_DIR = "/tmp/graft-duckspill"
SPILL_CAP = "30GiB"


def main(oracle_json, sfdir, reps=3, timeout_s=0):
    con = duckdb.connect()
    # spill discipline: never the cwd (round 13 found .tmp/ growing
    # inside the repo), never unbounded (the disk is shared with the
    # corpora under test)
    os.makedirs(SPILL_DIR, exist_ok=True)
    con.execute(f"SET temp_directory='{SPILL_DIR}'")
    con.execute(f"SET max_temp_directory_size='{SPILL_CAP}'")
    # self-limit well under physical RAM: DuckDB's default (80% of RAM)
    # lets a pathological operator push the PROCESS into a kernel OOM
    # kill — silent death, no JSON, nothing attributable (observed at
    # 25x after x72's allocator error). A conservative internal limit
    # turns that into a caught per-query Out of Memory Error instead.
    con.execute(f"SET memory_limit='{os.environ.get('DUCK_MEM', '48GiB')}'")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sqls = json.load(open(oracle_json))
    failed = {}

    def run_guarded(sql):
        """Execute with the watchdog; raises RuntimeError with an
        evidence-based reason on timeout/error.

        Two races this closes (found in review after round 13):
        - fire-after-return: the Timer can fire in the gap between
          fetchall() returning and timer.cancel(), leaving a stale
          interrupt flag on the idle connection that would spuriously
          cancel the NEXT query. The `done` event narrows the window
          to the fire() body, and the absorb probe below drains any
          interrupt that still lands there.
        - timeout mislabeling: a genuine error surfacing near the
          deadline used to be labeled a timeout by elapsed-time
          proximity. Now the label requires BOTH the watchdog having
          fired and DuckDB's own interrupt signature in the exception.
        """
        interrupted = threading.Event()
        done = threading.Event()
        timer = None
        if timeout_s > 0:
            def fire():
                if not done.is_set():
                    interrupted.set()
                    con.interrupt()
            timer = threading.Timer(timeout_s, fire)
            timer.daemon = True
            timer.start()
        try:
            con.execute(sql).fetchall()
        except Exception as e:
            is_interrupt = isinstance(
                e, getattr(duckdb, "InterruptException", ())) \
                or "INTERRUPT" in str(e).upper()
            if interrupted.is_set() and is_interrupt:
                raise RuntimeError(f"timeout >{timeout_s}s") from e
            raise RuntimeError(str(e).split("\n")[0][:200]) from e
        finally:
            done.set()
            if timer is not None:
                timer.cancel()
            if interrupted.is_set():
                # The watchdog fired. If the query still completed (the
                # interrupt landed in the return gap), the connection
                # may carry a stale interrupt flag — absorb it on a
                # throwaway probe so it can't cancel the next query.
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:
                    pass

    # warm pass: page cache + duckdb internal state, not measured.
    # A warm failure (error, spill cap, timeout) disqualifies the query
    # from measurement — it already proved it has no number here.
    for name, sql in sqls.items():
        print(f"WARM {name}", file=sys.stderr, flush=True)
        try:
            run_guarded(sql)
        except Exception as e:
            failed[name] = str(e)
            print(f"WARM-FAIL {name}: {e}", file=sys.stderr)

    def measure(sql, n):
        rep_times = []
        for _ in range(n):
            t0 = time.perf_counter()
            try:
                run_guarded(sql)
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
        if name in failed:
            continue
        print(f"MEASURE {name}", file=sys.stderr, flush=True)
        t, spread = measure(sql, reps)
        if t is not None:
            times[name] = t
            if spread > 0.3:
                unstable[name] = round(spread, 2)
        else:
            failed[name] = "failed during measurement"
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
                      "failed": failed,
                      "queries": {k: round(v, 6) for k, v in
                                  sorted(times.items(), key=lambda x: -x[1])}}))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 3,
         int(sys.argv[4]) if len(sys.argv) > 4 else 0)
