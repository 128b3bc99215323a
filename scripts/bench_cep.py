"""Throughput bench for the streaming CEP matcher (streaming/cep.py).

Drains the full events corpus (time-ordered per key by source order)
through ``cep_match_stream`` as ONE availableNow batch — the honest
regime per the round-6 micro-batch-splitting finding — and reports
events/sec plus the match count, cross-checked against the batch
``ev_cep_match`` plan on the same corpus (movers appended per key so
tail pendings flush; the parity assertion makes the bench also a
correctness run at scale).

Usage: python scripts/bench_cep.py [sf_dir] [cpus]
Prints ONE JSON line.
"""

from __future__ import annotations

import glob
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

    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.plans.analytics import ev_cep_match
    from flink_tank_spark.session import get_spark
    from flink_tank_spark.streaming import cep

    spark = get_spark("cep-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="cep_bench_")
    try:
        src = os.path.join(work, "in")
        out = os.path.join(work, "out")
        ckpt = os.path.join(work, "ck")
        ev = load_table(spark, sf_dir, "events").select(
            "user_id", "event_id", "ts", "event_type"
        )
        n_events = ev.count()
        # corpus as jsonl, globally time-ordered (the per-key in-order
        # contract), plus one mover per key to flush tail pendings
        (ev.orderBy("ts", "event_id")
           .select(F.to_json(F.struct("user_id", "event_id",
                                      F.col("ts").cast("string").alias("ts"),
                                      "event_type")).alias("value"))
           .coalesce(1).write.mode("overwrite").text(src))
        bounds = ev.agg(F.max("ts").alias("mx")).first()
        users = [r.user_id for r in ev.select("user_id").distinct().collect()]
        import datetime as dt
        flush_iso = (bounds.mx + dt.timedelta(hours=2)).isoformat()
        with open(os.path.join(src, "zz_movers.jsonl"), "w") as f:
            for u in users:
                f.write(json.dumps({
                    "user_id": u, "event_id": 20_000_000 + u,
                    "ts": flush_iso, "event_type": "view",
                }) + "\n")

        stream = (
            spark.readStream.schema(
                "user_id long, event_id long, ts string, event_type string"
            ).json(src).withColumn("ts", F.to_timestamp("ts"))
        )
        t0 = time.monotonic()
        q = (cep.cep_match_stream(stream)
             .writeStream.format("json").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(1800)
        wall = time.monotonic() - t0

        got = 0
        for fp in glob.glob(os.path.join(out, "*.json")):
            with open(fp) as f:
                got += sum(1 for line in f if line.strip())
        expected = ev_cep_match(spark, sf_dir).count()
        print(json.dumps({
            "metric": "streaming_cep_throughput",
            "sf": os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"),
            "cpus": cpus,
            "events": n_events,
            "keys": len(users),
            "wall_sec": round(wall, 2),
            "events_per_sec": round(n_events / wall, 1),
            "matches_streamed": got,
            "matches_batch": expected,
            "parity": got == expected,
        }))
        return 0 if got == expected else 1
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
