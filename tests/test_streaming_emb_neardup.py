"""Streaming-incremental embedding near-dup (streaming/emb_neardup.py):
with the SAME centroids and probes the streamed verdicts must equal the
batch ``ivf_assign → cell_blocked_pairs`` rebuild bit-exactly (cos_sim
included), regardless of micro-batch boundaries, and survive restarts
from the checkpoint. Seeded-centroid mode diverges only in BLOCKING
(documented); its emitted pairs must still be an exact-verified subset
of the brute-force truth.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators.similarity import (
    cell_blocked_pairs,
    cell_probe_pairs,
    ivf_assign,
    kmeans_centroids,
)
from flink_tank_spark.streaming import emb_neardup

THRESHOLD = 0.45  # 7 true pairs in the sf0.001 corpus — non-vacuous


def _vectors(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")


def _centroids(spark, sf_dir, k=8):
    return kmeans_centroids(_vectors(spark, sf_dir), k=k, iters=2).select(
        F.col("centroid_id").alias("vec_id"), F.col("cv").alias("embedding")
    )


def _batch_pairs(vectors, centroids, threshold=THRESHOLD, probes=2):
    assigned = ivf_assign(vectors, centroids, probes=probes)
    return {
        (r.id_a, r.id_b, r.cos_sim)
        for r in cell_blocked_pairs(assigned, threshold).collect()
    }


def _collected_pairs(spark, pairs_dir):
    if not os.path.isdir(pairs_dir):
        return set()
    df = spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
    return {(r.id_a, r.id_b, r.cos_sim) for r in df.collect()}


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(
                {"vec_id": r["vec_id"],
                 "embedding": [float(x) for x in r["embedding"]]}) + "\n")


def test_rectangular_equals_square_when_all_probe(spark, sf_dir):
    """cell_probe_pairs with every row a probe IS cell_blocked_pairs —
    same fixed-point dot, bit-identical cos_sim."""
    cent = _centroids(spark, sf_dir)
    assigned = ivf_assign(_vectors(spark, sf_dir), cent, probes=2)
    square = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in cell_blocked_pairs(assigned, THRESHOLD).collect()
    }
    rect = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in cell_probe_pairs(
            assigned.withColumn("is_probe", F.lit(True)), THRESHOLD
        ).collect()
    }
    assert square, "no pairs at this threshold; test would be vacuous"
    assert rect == square


def test_streamed_equals_batch_rebuild_same_centroids(spark, sf_dir, tmp_path):
    """Three micro-batches with pinned external centroids: the union of
    emitted pairs equals the batch rebuild, bit-exact."""
    vectors = _vectors(spark, sf_dir)
    cent = _centroids(spark, sf_dir)
    expected = _batch_pairs(vectors, cent)
    assert expected, "no pairs at this threshold; parity would be vacuous"

    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = emb_neardup.incremental_emb_near_dup_sink(
        index_dir, pairs_dir, centroids=cent, threshold=THRESHOLD, probes=2
    )
    rows = sorted((r.asDict() for r in vectors.collect()),
                  key=lambda r: r["vec_id"])
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    for i, chunk in enumerate(thirds):
        sink(spark.createDataFrame(chunk, schema=vectors.schema), i)
    assert _collected_pairs(spark, pairs_dir) == expected


def test_streaming_job_restart_carries_index(spark, sf_dir, tmp_path):
    """The file-stream job across three restarted runs (one new source
    file each) ends with the same verdicts as one single-run pass —
    the accumulated index and checkpoint survive restart."""
    vectors = _vectors(spark, sf_dir)
    cent = _centroids(spark, sf_dir)
    expected = _batch_pairs(vectors, cent)
    rows = sorted((r.asDict() for r in vectors.collect()),
                  key=lambda r: r["vec_id"])

    src_a = str(tmp_path / "a_in")
    _write_jsonl(src_a, "all.jsonl", rows)
    qa = emb_neardup.start_emb_near_dup_job(
        spark, src_a, str(tmp_path / "a_idx"), str(tmp_path / "a_pairs"),
        str(tmp_path / "a_ck"), centroids=cent, threshold=THRESHOLD,
    )
    qa.awaitTermination(300)
    assert _collected_pairs(spark, str(tmp_path / "a_pairs")) == expected

    src_b = str(tmp_path / "b_in")
    idx_b, pairs_b = str(tmp_path / "b_idx"), str(tmp_path / "b_pairs")
    ckpt_b = str(tmp_path / "b_ck")
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    for i, chunk in enumerate(thirds):
        _write_jsonl(src_b, f"b{i}.jsonl", chunk)
        qb = emb_neardup.start_emb_near_dup_job(
            spark, src_b, idx_b, pairs_b, ckpt_b,
            centroids=cent, threshold=THRESHOLD,
        )
        qb.awaitTermination(300)
    assert _collected_pairs(spark, pairs_b) == expected


def test_seeded_centroids_replay_and_precision(spark, tmp_path):
    """Seeded mode: centroids come from the first batch, persist, and a
    replayed batch (the foreachBatch crash contract) rewrites identical
    content. A pair split across batches is found once; every verdict
    is exact-verified (subset of brute-force truth at the threshold)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(30, 16)
    # plant near-dups: ids 100+i jitters of ids i (cos ~0.99)
    jit = base[:5] + 0.05 * rng.randn(5, 16)
    rows = [
        {"vec_id": i, "embedding": [float(x) for x in base[i]]}
        for i in range(30)
    ] + [
        {"vec_id": 100 + i, "embedding": [float(x) for x in jit[i]]}
        for i in range(5)
    ]
    # brute-force truth at threshold 0.8
    ids = [r["vec_id"] for r in rows]
    v = np.array([r["embedding"] for r in rows])
    n = np.linalg.norm(v, axis=1)
    cos = (v @ v.T) / np.outer(n, n)
    truth = {
        (min(ids[i], ids[j]), max(ids[i], ids[j]))
        for i in range(len(ids)) for j in range(i + 1, len(ids))
        if cos[i, j] >= 0.8
    }
    assert len(truth) >= 5

    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = emb_neardup.incremental_emb_near_dup_sink(
        index_dir, pairs_dir, centroids=None, threshold=0.8,
        probes=2, seed_cells=4,
    )
    schema = "vec_id bigint, embedding array<double>"
    b0, b1 = rows[:20], rows[20:]
    sink(spark.createDataFrame(b0, schema=schema), 0)
    first = _collected_pairs(spark, pairs_dir)
    sink(spark.createDataFrame(b0, schema=schema), 0)  # replay
    assert _collected_pairs(spark, pairs_dir) == first
    cent_dir = os.path.join(index_dir, emb_neardup.CENTROIDS_SUBDIR)
    assert os.path.isdir(os.path.join(cent_dir, "ingest_batch=0"))
    sink(spark.createDataFrame(b1, schema=schema), 1)
    got = {(a, b) for a, b, _ in _collected_pairs(spark, pairs_dir)}
    # precision 1.0: every emitted pair is true
    assert got <= truth
    # the planted jitter pairs all involve a cross-batch member; the
    # seeded blocking must still catch them (cos ~0.99 ⇒ same cell with
    # overwhelming margin at 4 cells / 2 probes)
    planted = {(i, 100 + i) for i in range(5)}
    assert planted <= got


def test_compaction_preserves_verdicts(spark, sf_dir, tmp_path):
    """compact() folds the vector partitions into ingest_batch=-1;
    subsequent batches see the same accumulated index and produce the
    same verdicts as the uncompacted run."""
    vectors = _vectors(spark, sf_dir)
    cent = _centroids(spark, sf_dir)
    expected = _batch_pairs(vectors, cent)
    rows = sorted((r.asDict() for r in vectors.collect()),
                  key=lambda r: r["vec_id"])
    thirds = [rows[0::3], rows[1::3], rows[2::3]]

    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = emb_neardup.incremental_emb_near_dup_sink(
        index_dir, pairs_dir, centroids=cent, threshold=THRESHOLD, probes=2
    )
    for i, chunk in enumerate(thirds[:2]):
        sink(spark.createDataFrame(chunk, schema=vectors.schema), i)
    emb_neardup.compact(spark, index_dir)
    vec_base = os.path.join(index_dir, emb_neardup.VECTORS_SUBDIR)
    assert sorted(
        e for e in os.listdir(vec_base) if e.startswith("ingest_batch=")
    ) == ["ingest_batch=-1"]
    sink(spark.createDataFrame(thirds[2], schema=vectors.schema), 2)
    assert _collected_pairs(spark, pairs_dir) == expected
