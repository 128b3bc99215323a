"""Throughput bench for streaming-incremental sketch maintenance
(streaming/sketches.py).

Drains the full events corpus through ``start_sketch_job`` split into
``n_batches`` micro-batches (maxFilesPerTrigger=1, so the per-batch
delta path — the thing this module exists for — is actually exercised
``n_batches`` times), reports events/sec for the drain and the folded-
state finalize time, and BIT-compares the folded CMS/HLL/histogram
tables against from-scratch batch builds over the same corpus — the
parity assertion makes the bench a correctness run at scale.

Usage: python scripts/bench_streaming_sketch.py [sf_dir] [cpus] [n_batches]
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
    from flink_tank_spark.operators import bloom, sketch
    from flink_tank_spark.session import get_spark
    from flink_tank_spark.streaming import sketches as ssk

    spark = get_spark("sketch-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="sketch_bench_")
    try:
        src = os.path.join(work, "in")
        sk = os.path.join(work, "sk")
        ckpt = os.path.join(work, "ck")
        os.makedirs(src)
        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        n_events = ev.count()
        payload = F.to_json(F.struct(
            "event_id", F.col("ts").cast("string").alias("ts"),
            "user_id", "event_type", "value",
        )).alias("value")
        # n_batches source files -> n_batches micro-batches; each file
        # written as one part so a micro-batch is a contiguous slice
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

        t0 = time.perf_counter()
        q = ssk.start_sketch_job(
            spark, flat, sk, ckpt, max_files_per_trigger=1
        )
        q.awaitTermination(1800)
        drain_s = time.perf_counter() - t0
        n_done = len([p for p in os.listdir(os.path.join(sk, ssk.CMS_SUBDIR))
                      if p.startswith("ingest_batch=")])

        t1 = time.perf_counter()
        folded = ssk.load_sketches(spark, sk)
        streamed = {
            "cms": {(r.row, r.col, r.cnt) for r in folded["cms"].collect()},
            "hll": {(r.event_type, r.register, r.rho)
                    for r in folded["hll"].collect()},
            "hist": {(r.event_type, r.bin, r.n)
                     for r in folded["hist"].collect()},
            "kmv": {(r.event_type, tuple(r.ks))
                    for r in folded["kmv"].collect()},
            "bloom": {(r.word, r.bits) for r in folded["bloom"].collect()},
        }
        finalize_s = time.perf_counter() - t1

        batch = {
            "cms": {(r.row, r.col, r.cnt) for r in sketch.cms_counters(
                ssk._user_key(ev), "user_key").collect()},
            "hll": {(r.event_type, r.register, r.rho)
                    for r in sketch.hll_registers(
                        ssk._user_day(ev), "user_day", ["event_type"]
                    ).collect()},
            "hist": {(r.event_type, r.bin, r.n) for r in sketch.fp_histogram(
                ev, "value", ["event_type"]).collect()},
            "kmv": {(r.event_type, tuple(r.ks)) for r in sketch.kmv_sketch(
                ssk._user_day(ev), "user_day", ["event_type"]).collect()},
            "bloom": {(r.word, r.bits) for r in bloom.bloom_words(
                ssk._user_key(ev), "user_key",
                ssk.BLOOM_M_BITS, ssk.BLOOM_K).collect()},
        }
        assert streamed == batch, "streamed state != from-scratch batch build"

        state_rows = sum(
            len(v) if k != "kmv" else sum(1 + len(ks) for _, ks in v)
            for k, v in streamed.items()
        )
        print(json.dumps({
            "metric": "streaming_sketch_drain",
            "value": round(n_events / drain_s, 1),
            "unit": "events/sec",
            "n_events": n_events,
            "n_batches": n_done,
            "drain_sec": round(drain_s, 2),
            "finalize_sec": round(finalize_s, 2),
            "state_rows": state_rows,
            "parity": "exact",
            "sf_dir": sf_dir,
            "cpus": cpus,
        }))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
