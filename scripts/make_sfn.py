"""Deterministic scale-up replicator: sf0.1 × N → an sf{N/10} dataset.

No network and no reference data generator exist in this sandbox, so
scale-stress data is built by replicating the driver-generated sf0.1
parquet N times with KEY-OFFSET shifts (the round-3 verdict's recipe):
replica i shifts every entity key by i × (key-space size), so all
foreign keys stay internally consistent (orders of replica i reference
customers of replica i, lineitems reference orders/parts/suppliers of
replica i, …). Non-key attributes are copied verbatim — value
distributions per replica are exactly sf0.1's.

What this buys: a 6 M-row lineitem / 1 M-row events / 50 k-doc corpus
where AQE join-strategy flips, skew handling, and shuffle sizing can be
observed — while remaining 100% oracle-checkable because DuckDB reads
the SAME files (scripts/verify_gate.py <out-dir>).

Known semantic consequence (intended): replica documents/embeddings are
byte-identical to their originals, so the dedup/near-dup operators see
10-way exact-duplicate clusters — a stress case for LSH buckets,
connected components, and tie-breaking, all of which must stay
deterministic (every tie-break in the registry is keyed on a unique id,
which replication preserves).

region/nation are fixed-cardinality dimensions at ANY scale factor
(TPC-H semantics) and are copied unchanged.

Usage:
    python scripts/make_sfn.py [--src /root/testdata/sf0.1] \
        [--out /root/repo/data/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# table -> {column: key-space size} (offset = replica * size); key spaces
# measured from sf0.1 (all dense from 0, verified at build time below).
KEY_SPACES = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_users"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
COPY_AS_IS = ("region", "nation")


def build(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    # key-space sizes = max(key)+1 per entity, measured from the source
    # so the script works on any dense-keyed sf directory.
    sizes = {
        "customer": _span(con, src, "customer", "c_custkey"),
        "supplier": _span(con, src, "supplier", "s_suppkey"),
        "part": _span(con, src, "part", "p_partkey"),
        "orders": _span(con, src, "orders", "o_orderkey"),
        "events": _span(con, src, "events", "event_id"),
        "events_users": _span(con, src, "events", "user_id"),
        "documents": _span(con, src, "documents", "doc_id"),
        "embeddings": _span(con, src, "embeddings", "vec_id"),
    }

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, keymap in KEY_SPACES.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + i * {sizes[keymap[c]]} AS {c}" if c in keymap else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range({factor})) AS i) ORDER BY i) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({factor}x)")


def _span(con: duckdb.DuckDBPyConnection, src: str, t: str, key: str) -> int:
    lo, hi = con.execute(
        f"SELECT MIN({key}), MAX({key}) FROM '{src}/{t}.parquet'"
    ).fetchone()
    if lo != 0:
        raise ValueError(f"{t}.{key} not dense from 0 (min={lo})")
    return hi + 1


def main() -> int:
    ap = argparse.ArgumentParser(prog="make_sfn")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/data/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    build(args.src, args.out, args.factor)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
