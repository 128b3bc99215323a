"""Throughput bench for the streaming data-quality sinks: the windowed
Top-N leaderboard (streaming/topk.py) and the 3σ anomaly monitor
(streaming/anomaly.py).

Each sink drains the full events corpus split into ``n_batches``
micro-batches (maxFilesPerTrigger=1) and the derived read-side result
is BIT-compared against its batch query — the bench doubles as a
correctness run at scale.

Usage: python scripts/bench_streaming_quality.py [sf_dir] [cpus] [n_batches]
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.plans.analytics import ev_value_outliers
    from flink_tank_spark.plans.streaming_batch import ev_hourly_top_users
    from flink_tank_spark.session import get_spark
    from flink_tank_spark.streaming import anomaly as an
    from flink_tank_spark.streaming import topk as stk

    spark = get_spark("quality-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="quality_bench_")
    try:
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        n_events = ev.count()
        src = os.path.join(work, "in")
        os.makedirs(src)
        payload = F.to_json(F.struct(
            "event_id", F.col("ts").cast("string").alias("ts"),
            "user_id", "event_type", "value",
        )).alias("value")
        for i in range(n_batches):
            (ev.filter(F.pmod("event_id", F.lit(n_batches)) == i)
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

        report = {
            "metric": "streaming_quality_drain",
            "n_events": n_events,
            "n_batches": n_batches,
            "sf_dir": sf_dir,
            "cpus": cpus,
        }
        for name, start, load, batch_fn in (
            ("topn", stk.start_topn_job, stk.load_top_users,
             ev_hourly_top_users),
            ("anomaly", an.start_anomaly_job, an.load_outliers,
             ev_value_outliers),
        ):
            sd = os.path.join(work, f"{name}_state")
            ck = os.path.join(work, f"{name}_ck")
            t0 = time.perf_counter()
            q = start(spark, flat, sd, ck, max_files_per_trigger=1)
            q.awaitTermination(1800)
            drain_s = time.perf_counter() - t0
            t1 = time.perf_counter()
            streamed = [tuple(r) for r in load(spark, sd).collect()]
            finalize_s = time.perf_counter() - t1
            batch = [tuple(r) for r in batch_fn(spark, sf_dir).collect()]
            assert streamed == batch, f"{name}: streamed != batch"
            report[name] = {
                "events_per_sec": round(n_events / drain_s, 1),
                "drain_sec": round(drain_s, 2),
                "finalize_sec": round(finalize_s, 2),
                "result_rows": len(streamed),
                "parity": "exact",
            }
        print(json.dumps(report))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
