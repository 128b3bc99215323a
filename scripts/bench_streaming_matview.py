"""Throughput bench for incremental materialized-view maintenance
(streaming/matview.py).

Drains the full lineitem corpus through ``start_matview_job`` split
into ``n_batches`` micro-batches (maxFilesPerTrigger=1, so the
per-batch delta path is exercised ``n_batches`` times), reports
rows/sec for the drain and the finalize time, and BIT-compares the
folded pricing summary against q1_pricing_summary over the same corpus
— doubles included, so the bench is also a correctness run at scale.

Usage: python scripts/bench_streaming_matview.py [sf_dir] [cpus] [n_batches]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

_COLS = [
    "l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.plans.tpch import q1_pricing_summary
    from flink_tank_spark.session import get_spark
    from flink_tank_spark.streaming import matview as mv

    spark = get_spark("matview-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="matview_bench_")
    try:
        src = os.path.join(work, "in")
        vd = os.path.join(work, "mv")
        ckpt = os.path.join(work, "ck")
        os.makedirs(src)
        li = load_table(spark, sf_dir, "lineitem").select(*_COLS)
        n_rows = li.count()
        payload = F.to_json(F.struct(
            *[c for c in _COLS if c != "l_shipdate"],
            F.col("l_shipdate").cast("string").alias("l_shipdate"),
        )).alias("value")
        for i in range(n_batches):
            (li.filter(F.pmod("l_orderkey", F.lit(n_batches)) == i)
               .select(payload).coalesce(1)
               .write.mode("overwrite").text(os.path.join(src, f"b{i}")))
        files = sorted(
            os.path.join(d, f)
            for d, _, fs in os.walk(src) for f in fs if f.endswith(".txt")
        )
        flat = os.path.join(work, "flat")
        os.makedirs(flat)
        for i, f in enumerate(files):
            shutil.copy(f, os.path.join(flat, f"b{i}.jsonl"))

        t0 = time.perf_counter()
        q = mv.start_matview_job(spark, flat, vd, ckpt, max_files_per_trigger=1)
        q.awaitTermination(1800)
        drain_s = time.perf_counter() - t0
        n_done = len([p for p in os.listdir(os.path.join(vd, mv.MV_SUBDIR))
                      if p.startswith("ingest_batch=")])

        t1 = time.perf_counter()
        streamed = [tuple(r) for r in mv.load_pricing_summary(spark, vd).collect()]
        finalize_s = time.perf_counter() - t1
        batch = [tuple(r) for r in q1_pricing_summary(spark, sf_dir).collect()]
        assert streamed == batch, "streamed view != q1 batch rollup"

        print(json.dumps({
            "metric": "streaming_matview_drain",
            "value": round(n_rows / drain_s, 1),
            "unit": "rows/sec",
            "n_rows": n_rows,
            "n_batches": n_done,
            "drain_sec": round(drain_s, 2),
            "finalize_sec": round(finalize_s, 2),
            "view_groups": len(streamed),
            "parity": "exact",
            "sf_dir": sf_dir,
            "cpus": cpus,
        }))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
