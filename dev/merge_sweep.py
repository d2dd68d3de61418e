#!/usr/bin/env python3
"""Merge a Bench JSON line, a TwinAgreement JSON line, and protocol
notes into one sweep artifact (dev/sweeps/*.json). Also derives the
scaling note the sweep protocol asks for: every query whose sweep wall
grew more than GROWTH_FLAG x over its sf0.1 time is listed explicitly —
silent superlinear growth reads as "scales fine" when it doesn't.

Usage: python3 dev/merge_sweep.py BENCH_LINE_JSON TWIN_LINE_JSON \
           SF01_DETAIL_JSON SCALE_MULT OUT_JSON [extra notes as k=v...]
"""
import json
import sys

GROWTH_FLAG = 15.0


def main(bench_path, twin_path, sf01_path, mult, out, extras):
    bench = json.load(open(bench_path))
    twin = json.load(open(twin_path))
    sf01 = json.load(open(sf01_path))["queries"]
    mult = float(mult)

    growth = {}
    for q, t in bench["queries"].items():
        base = sf01.get(q)
        if base and base > 0:
            growth[q] = round(t / base, 2)
    flagged = {q: g for q, g in sorted(growth.items(), key=lambda x: -x[1])
               if g > GROWTH_FLAG}

    bench["twin_agreement"] = {**twin.get("twin_agreement", {}),
                               "all": twin.get("all"),
                               "notes": twin.get("notes", {})}
    notes = bench.setdefault("notes", {})
    notes["growth_vs_sf01"] = {
        "multiplier": mult,
        "flagged_over_%gx" % GROWTH_FLAG: flagged,
        "all": dict(sorted(growth.items(), key=lambda x: -x[1])),
    }
    for kv in extras:
        k, v = kv.split("=", 1)
        notes[k] = v
    json.dump(bench, open(out, "w"), indent=1)
    print(f"wrote {out}: {len(bench['queries'])} queries, "
          f"{len(flagged)} flagged >{GROWTH_FLAG}x, twins all="
          f"{twin.get('all')}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5],
         sys.argv[6:])
