#!/usr/bin/env python3
"""Build an N× scale corpus from a fixture dir by key-shifted
replication: each copy k offsets every ENTITY KEY by k*OFFSET so join
fan-out stays linear (the round-4 sweep's copied-key corpus multiplied
join outputs 25× and polluted the scaling read). Dimension tables
(region/nation) and foreign keys INTO them are left alone — star
dimensions grow slower than facts in reality, and keeping them shared
preserves broadcast-side size. Content columns (text, embeddings) are
copied verbatim, so the dedup/ANN families see N× corpora whose
cross-copy duplicates are REAL near-dups — their clusters grow with N
by construction; that is documented, intended load, not an artifact.

Usage: python3 dev/make_scale_corpus.py /root/testdata/sf0.1 /tmp/sf5x 5
"""
import os
import sys

import duckdb

OFFSET = 100_000_000

# per-table: columns to shift by copy*OFFSET
SHIFT = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main(src, dst, n):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for t, keys in SHIFT.items():
        p = f"{src}/{t}.parquet"
        if not os.path.exists(p):
            continue
        out = f"{dst}/{t}.parquet"
        if not keys:  # shared dimensions: single copy
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{p}')) TO '{out}' (FORMAT PARQUET)")
            continue
        cols = [f.strip() for f in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{p}')").fetchall()
            for f in [f[0]]]
        selects = []
        for k in range(n):
            proj = ", ".join(
                f"({c} + {k * OFFSET}) AS {c}" if c in keys else c
                for c in cols)
            selects.append(f"SELECT {proj} FROM read_parquet('{p}')")
        con.execute(
            f"COPY ({' UNION ALL '.join(selects)}) TO '{out}' (FORMAT PARQUET)")
        print(t, con.execute(
            f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 5)
