"""Throughput bench for the streaming curation sinks: the
weighted-sample bottom-k maintainer (streaming/wsample.py), the
summary-fold sessionizer (streaming/sessions.py), the round-11
count-delta twins — vocabulary coverage (streaming/vocab_cov.py) and
DSIR importance weights (streaming/dsir.py) — and the round-12 BPE
vocabulary maintainer (streaming/bpe.py).

Each sink drains its full corpus split into ``n_batches`` micro-batches
(maxFilesPerTrigger=1) and the derived read-side result is BIT-compared
against its batch query — the bench doubles as a correctness run at
scale.

Usage: python scripts/bench_streaming_curation.py [sf_dir] [cpus] [n_batches]
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


def _spill_jsonl(df, payload, src, n_batches, key):
    from pyspark.sql import functions as F

    os.makedirs(src, exist_ok=True)
    for i in range(n_batches):
        (df.filter(F.pmod(key, F.lit(n_batches)) == i)
           .select(payload).coalesce(1)
           .write.mode("overwrite").text(os.path.join(src, f"raw{i}")))
    files = sorted(
        os.path.join(d, f)
        for d, _, fs in os.walk(src) for f in fs if f.endswith(".txt")
    )
    flat = src + "_flat"
    os.makedirs(flat, exist_ok=True)
    for i, f in enumerate(files):
        shutil.copy(f, os.path.join(flat, f"b{i}.jsonl"))
    return flat


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.plans.sampling import doc_weighted_sample
    from flink_tank_spark.plans.streaming_batch import ev_sessionize
    from flink_tank_spark.session import get_spark
    from flink_tank_spark.streaming import sessions as ss
    from flink_tank_spark.streaming import wsample as ws

    spark = get_spark("curation-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="curation_bench_")
    try:
        report = {
            "metric": "streaming_curation_drain",
            "n_batches": n_batches,
            "sf_dir": sf_dir,
            "cpus": cpus,
        }

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        doc_src = _spill_jsonl(
            docs,
            F.to_json(F.struct("doc_id", "text")).alias("value"),
            os.path.join(work, "docs_in"), n_batches, F.col("doc_id"),
        )
        sd, ck = os.path.join(work, "ws_state"), os.path.join(work, "ws_ck")
        t0 = time.perf_counter()
        q = ws.start_wsample_job(spark, doc_src, sd, ck, max_files_per_trigger=1)
        q.awaitTermination(1800)
        drain_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        streamed = sorted(tuple(r) for r in ws.load_weighted_sample(spark, sd).collect())
        finalize_s = time.perf_counter() - t1
        batch = sorted(tuple(r) for r in doc_weighted_sample(spark, sf_dir).collect())
        assert streamed == batch, "wsample: streamed != batch"
        report["wsample"] = {
            "docs_per_sec": round(n_docs / drain_s, 1),
            "n_docs": n_docs,
            "drain_sec": round(drain_s, 2),
            "finalize_sec": round(finalize_s, 2),
            "sample_rows": len(streamed),
            "parity": "exact",
        }

        from flink_tank_spark.plans.sampling import doc_dsir_weights
        from flink_tank_spark.plans.vocab import doc_vocab_coverage
        from flink_tank_spark.streaming import dsir as ds
        from flink_tank_spark.streaming import vocab_cov as vc

        vdocs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        vdoc_src = _spill_jsonl(
            vdocs,
            F.to_json(F.struct("doc_id", "source", "text")).alias("value"),
            os.path.join(work, "vdocs_in"), n_batches, F.col("doc_id"),
        )
        sd, ck = os.path.join(work, "vc_state"), os.path.join(work, "vc_ck")
        t0 = time.perf_counter()
        q = vc.start_vocab_job(spark, vdoc_src, sd, ck, max_files_per_trigger=1)
        q.awaitTermination(1800)
        drain_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        streamed = sorted(
            tuple(str(x) for x in r)
            for r in vc.load_vocab_coverage(spark, sd).collect()
        )
        finalize_s = time.perf_counter() - t1
        batch = sorted(
            tuple(str(x) for x in r)
            for r in doc_vocab_coverage(spark, sf_dir).collect()
        )
        assert streamed == batch, "vocab_cov: streamed != batch"
        report["vocab_coverage"] = {
            "docs_per_sec": round(n_docs / drain_s, 1),
            "n_docs": n_docs,
            "drain_sec": round(drain_s, 2),
            "finalize_sec": round(finalize_s, 2),
            "parity": "exact",
        }

        ddocs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "text"
        )
        ddoc_src = _spill_jsonl(
            ddocs,
            F.to_json(F.struct("doc_id", "lang", "text")).alias("value"),
            os.path.join(work, "ddocs_in"), n_batches, F.col("doc_id"),
        )
        sd, ck = os.path.join(work, "ds_state"), os.path.join(work, "ds_ck")
        t0 = time.perf_counter()
        q = ds.start_dsir_job(spark, ddoc_src, sd, ck, max_files_per_trigger=1)
        q.awaitTermination(1800)
        drain_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        streamed = sorted(
            tuple(str(x) for x in r)
            for r in ds.load_dsir_weights(spark, sd).collect()
        )
        finalize_s = time.perf_counter() - t1
        batch = sorted(
            tuple(str(x) for x in r)
            for r in doc_dsir_weights(spark, sf_dir).collect()
        )
        assert streamed == batch, "dsir: streamed != batch"
        report["dsir_weights"] = {
            "docs_per_sec": round(n_docs / drain_s, 1),
            "n_docs": n_docs,
            "drain_sec": round(drain_s, 2),
            "finalize_sec": round(finalize_s, 2),
            "parity": "exact",
        }

        # round-12 twin: BPE vocabulary maintenance — same (doc_id,
        # lang, text) wire split as DSIR, so reuse its jsonl spill
        from flink_tank_spark.plans.bpe import doc_bpe_merges256
        from flink_tank_spark.streaming import bpe as sbpe

        sd, ck = os.path.join(work, "bpe_state"), os.path.join(work, "bpe_ck")
        t0 = time.perf_counter()
        q = sbpe.start_bpe_job(spark, ddoc_src, sd, ck, max_files_per_trigger=1)
        q.awaitTermination(1800)
        # a timeout leaves the query live and the state partial — fail
        # loudly here rather than with a misleading parity mismatch
        assert not q.isActive, "bpe: stream still active after 1800s drain"
        drain_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        streamed = sorted(
            tuple(str(x) for x in r)
            for r in sbpe.load_bpe_merges(spark, sd).collect()
        )
        finalize_s = time.perf_counter() - t1
        batch = sorted(
            tuple(str(x) for x in r)
            for r in doc_bpe_merges256(spark, sf_dir).collect()
        )
        assert streamed == batch, "bpe: streamed != batch"
        report["bpe_vocab"] = {
            "docs_per_sec": round(n_docs / drain_s, 1),
            "n_docs": n_docs,
            "drain_sec": round(drain_s, 2),
            "finalize_sec": round(finalize_s, 2),
            "n_merges": len(streamed),
            "parity": "exact",
        }

        ev = load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        n_events = ev.count()
        ev_src = _spill_jsonl(
            ev,
            F.to_json(F.struct(
                "event_id", F.col("ts").cast("string").alias("ts"),
                "user_id", "event_type", "value",
            )).alias("value"),
            os.path.join(work, "ev_in"), n_batches, F.col("event_id"),
        )
        sd, ck = os.path.join(work, "ss_state"), os.path.join(work, "ss_ck")
        t0 = time.perf_counter()
        q = ss.start_sessions_job(spark, ev_src, sd, ck, max_files_per_trigger=1)
        q.awaitTermination(1800)
        drain_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        streamed = [tuple(str(x) for x in r) for r in ss.load_sessions(spark, sd).collect()]
        finalize_s = time.perf_counter() - t1
        batch = [tuple(str(x) for x in r) for r in ev_sessionize(spark, sf_dir).collect()]
        assert streamed == batch, "sessions: streamed != batch"
        report["sessions"] = {
            "events_per_sec": round(n_events / drain_s, 1),
            "n_events": n_events,
            "drain_sec": round(drain_s, 2),
            "finalize_sec": round(finalize_s, 2),
            "session_rows": len(streamed),
            "parity": "exact",
        }
        print(json.dumps(report))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
