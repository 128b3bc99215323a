"""Throughput bench for the streaming-incremental LLM stages.

Drives the text (MinHash/LSH) and embedding (IVF) incremental near-dup
sinks batch-by-batch over the documents / embeddings corpus split into
N equal micro-batches, timing each sink call — the per-batch
incremental cost as the accumulated index grows. The foreachBatch sink
IS the engine path; what this excludes is streaming-query startup /
state-store commit overhead, which BENCH_STREAMING_r*.json measures on
the chained pipeline.

Reported per stage: total wall, docs(vectors)/sec, per-batch walls
(the growth trend — locally every batch re-scans all accumulated index
partitions, so a linear term is EXPECTED here; at cluster scale the
bucket/cell-clustered layout turns the probe into a pruned co-located
join), pairs found, and the wall of a post-compaction batch (the
small-file hygiene payoff).

Usage: python scripts/streaming_neardup_bench.py [sf_dir] [cpus] [n_batches]
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from flink_tank_spark.session import get_spark
    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.operators.similarity import kmeans_centroids
    from flink_tank_spark.streaming import emb_neardup, neardup

    spark = get_spark("streaming-neardup-bench", cpus=cpus)
    work = tempfile.mkdtemp(prefix="snd_bench_")
    out: dict = {"metric": "streaming_neardup_throughput",
                 "sf": os.path.basename(sf_dir).removeprefix("sf"),
                 "cpus": cpus, "n_batches": n_batches}

    try:
        # ---- text near-dup ------------------------------------------------
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_docs = docs.count()
        idx, pairs = os.path.join(work, "t_idx"), os.path.join(work, "t_pairs")
        sink = neardup.incremental_near_dup_sink(idx, pairs)
        walls = []
        t0 = time.monotonic()
        for b in range(n_batches):
            bt = time.monotonic()
            sink(docs.filter(F.pmod(F.col("doc_id"), n_batches) == b), b)
            walls.append(round(time.monotonic() - bt, 2))
        total = time.monotonic() - t0
        n_pairs = spark.read.option("basePath", pairs).parquet(pairs).count()
        neardup.compact(spark, idx)
        ct = time.monotonic()
        sink(docs.filter(F.pmod(F.col("doc_id"), n_batches) == 0)
             .withColumn("doc_id", F.col("doc_id") + 10_000_000), n_batches)
        post_compact_wall = time.monotonic() - ct
        out["text"] = {
            "docs": n_docs, "wall_sec": round(total, 2),
            "docs_per_sec": round(n_docs / total, 1),
            "per_batch_wall": walls, "pairs_found": n_pairs,
            "post_compact_batch_wall": round(post_compact_wall, 2),
        }

        # ---- embedding near-dup ------------------------------------------
        emb = load_table(spark, sf_dir, "embeddings").select(
            "vec_id", "embedding")
        n_vec = emb.count()
        # same adaptive-cell contract as the batch operator (~500/cell)
        n_cells = max(8, -(-n_vec // 500))
        cent = kmeans_centroids(emb, k=n_cells, iters=2).select(
            F.col("centroid_id").alias("vec_id"), F.col("cv").alias("embedding")
        ).cache()
        cent.count()
        idx_e = os.path.join(work, "e_idx")
        pairs_e = os.path.join(work, "e_pairs")
        esink = emb_neardup.incremental_emb_near_dup_sink(
            idx_e, pairs_e, centroids=cent, threshold=0.45, probes=2)
        ewalls = []
        t0 = time.monotonic()
        for b in range(n_batches):
            bt = time.monotonic()
            esink(emb.filter(F.pmod(F.col("vec_id"), n_batches) == b), b)
            ewalls.append(round(time.monotonic() - bt, 2))
        etotal = time.monotonic() - t0
        e_pairs = spark.read.option("basePath", pairs_e).parquet(pairs_e).count()
        emb_neardup.compact(spark, idx_e)
        ct = time.monotonic()
        esink(emb.filter(F.pmod(F.col("vec_id"), n_batches) == 0)
              .withColumn("vec_id", F.col("vec_id") + 10_000_000), n_batches)
        e_post = time.monotonic() - ct
        out["embedding"] = {
            "vectors": n_vec, "n_cells": n_cells,
            "wall_sec": round(etotal, 2),
            "vectors_per_sec": round(n_vec / etotal, 1),
            "per_batch_wall": ewalls, "pairs_found": e_pairs,
            "post_compact_batch_wall": round(e_post, 2),
        }

        # ---- SRP embedding near-dup (stateless bands, r9) -----------------
        from flink_tank_spark.streaming import srp_neardup

        idx_s = os.path.join(work, "s_idx")
        pairs_s = os.path.join(work, "s_pairs")
        # freeze the stream's band width at what the adaptive batch query
        # picks for this corpus size (streaming contract: width fixed at
        # stream start)
        from flink_tank_spark.plans.srp import ND_BANDS, _nd_bits

        nd_bits = _nd_bits(n_vec)
        ssink = srp_neardup.incremental_srp_near_dup_sink(
            idx_s, pairs_s, n_planes=ND_BANDS * nd_bits, n_bands=ND_BANDS
        )
        swalls = []
        t0 = time.monotonic()
        for b in range(n_batches):
            bt = time.monotonic()
            ssink(emb.filter(F.pmod(F.col("vec_id"), n_batches) == b), b)
            swalls.append(round(time.monotonic() - bt, 2))
        stotal = time.monotonic() - t0
        s_pairs = spark.read.option("basePath", pairs_s).parquet(pairs_s).count()
        srp_neardup.compact(spark, idx_s)
        ct = time.monotonic()
        ssink(emb.filter(F.pmod(F.col("vec_id"), n_batches) == 0)
              .withColumn("vec_id", F.col("vec_id") + 10_000_000), n_batches)
        s_post = time.monotonic() - ct
        out["srp_embedding"] = {
            "vectors": n_vec, "band_bits": nd_bits,
            "wall_sec": round(stotal, 2),
            "vectors_per_sec": round(n_vec / stotal, 1),
            "per_batch_wall": swalls, "pairs_found": s_pairs,
            "post_compact_batch_wall": round(s_post, 2),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
