"""Streaming SRP near-dup (streaming/srp_neardup.py): the streamed
verdicts must equal the batch srp_near_dup_pairs rebuild EXACTLY under
any micro-batch split (no seeded state to match, unlike the IVF twin),
survive same-batch replay, and compact without changing history.
"""

from __future__ import annotations

import json
import os

import numpy as np
from pyspark.sql import functions as F

from flink_tank_spark.operators.similarity import srp_near_dup_pairs
from flink_tank_spark.streaming import compaction, srp_neardup


def _corpus(n=60, dim=64, seed=5):
    """Clustered vectors so near-dup pairs exist at the 0.45 threshold."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for c in range(6):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(n // 6):
            v = center + 0.25 * rng.normal(size=dim) / np.sqrt(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return rows


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for vid, emb in rows:
            f.write(json.dumps({"vec_id": vid, "embedding": emb}) + "\n")


def _drain(spark, src, index_dir, pairs_dir, ckpt):
    q = srp_neardup.run_srp_near_dup_job(spark, src, index_dir, pairs_dir, ckpt)
    q.awaitTermination(180)
    q.stop()


def _pairs(spark, pairs_dir):
    if not os.path.isdir(pairs_dir):
        return set()
    df = spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
    return {(r.id_a, r.id_b, r.cos_sim) for r in df.collect()}


def test_streamed_equals_batch_rebuild_any_split(spark, tmp_path):
    rows = _corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    expected = {
        (r.id_a, r.id_b, r.cos_sim) for r in srp_near_dup_pairs(df).collect()
    }
    assert expected, "corpus has no near-dups; parity test would be vacuous"

    src = str(tmp_path / "in")
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")
    # three uneven waves
    _write_jsonl(src, "w0.jsonl", rows[:10])
    _drain(spark, src, index_dir, pairs_dir, ckpt)
    _write_jsonl(src, "w1.jsonl", rows[10:45])
    _drain(spark, src, index_dir, pairs_dir, ckpt)
    _write_jsonl(src, "w2.jsonl", rows[45:])
    _drain(spark, src, index_dir, pairs_dir, ckpt)

    assert _pairs(spark, pairs_dir) == expected


def test_replay_is_idempotent_and_compact_preserves(spark, tmp_path):
    rows = _corpus(n=36)
    src = str(tmp_path / "in")
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")
    _write_jsonl(src, "w0.jsonl", rows[:20])
    _drain(spark, src, index_dir, pairs_dir, ckpt)
    _write_jsonl(src, "w1.jsonl", rows[20:])
    _drain(spark, src, index_dir, pairs_dir, ckpt)
    before = _pairs(spark, pairs_dir)

    # crash-replay surrogate: re-execute wave 1's landed micro-batch
    replay = spark.createDataFrame(
        rows[20:], "vec_id long, embedding array<float>"
    )
    srp_neardup.incremental_srp_near_dup_sink(index_dir, pairs_dir)(replay, 1)
    assert _pairs(spark, pairs_dir) == before

    srp_neardup.compact(spark, index_dir)
    for sub in (srp_neardup.BANDS_SUBDIR, srp_neardup.VECTORS_SUBDIR):
        assert compaction.parts(os.path.join(index_dir, sub)) == [
            "ingest_batch=-1"
        ]
    # a post-compact batch still detects pairs against the merged corpus
    extra_center = spark.createDataFrame(
        rows[:1], "vec_id long, embedding array<float>"
    ).select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    srp_neardup.incremental_srp_near_dup_sink(index_dir, pairs_dir)(
        extra_center, 2
    )
    after = _pairs(spark, pairs_dir)
    new = {p for p in after if p[1] >= 1000}
    assert any(p[0] == 0 for p in new), "clone of vec 0 must pair with it"


def test_multiprobe_streamed_equals_batch_multiprobe(spark, tmp_path):
    # probes=8: the streamed union must equal the batch MULTI-PROBE
    # operator exactly — probe keys ride the index as kind='p' rows and
    # probe∩probe collisions are excluded, the batch candidate rule
    rows = _corpus()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plain = {
        (r.id_a, r.id_b) for r in srp_near_dup_pairs(df).collect()
    }
    expected = {
        (r.id_a, r.id_b, r.cos_sim)
        for r in srp_near_dup_pairs(df, n_probes=8).collect()
    }
    assert {(a, b) for a, b, _ in expected} >= plain  # probes only add

    src = str(tmp_path / "in")
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")

    def drain():
        q = srp_neardup.run_srp_near_dup_job(
            spark, src, index_dir, pairs_dir, ckpt, n_probes=8
        )
        q.awaitTermination(180)
        q.stop()

    _write_jsonl(src, "w0.jsonl", rows[:25])
    drain()
    _write_jsonl(src, "w1.jsonl", rows[25:])
    drain()
    assert _pairs(spark, pairs_dir) == expected


def test_legacy_band_index_without_kind_column(spark, tmp_path):
    """Round-12 advisory fix: band indexes persisted before the
    multi-probe round carry no 'kind' column; the step must default
    them to base bands ('b') instead of raising AnalysisException on
    unionByName — and the streamed pair set must still equal the batch
    rebuild."""
    rows = _corpus(n=36)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    expected = {
        (r.id_a, r.id_b, r.cos_sim) for r in srp_near_dup_pairs(df).collect()
    }

    first = spark.createDataFrame(
        rows[:20], "vec_id long, embedding array<float>"
    )
    second = spark.createDataFrame(
        rows[20:], "vec_id long, embedding array<float>"
    )
    p0, bands0, vecs0 = srp_neardup.srp_near_dup_step(first, None, None)
    got = {(r.id_a, r.id_b, r.cos_sim) for r in p0.collect()}
    legacy_bands = bands0.drop("kind")  # pre-round-11 on-disk layout
    p1, _, _ = srp_neardup.srp_near_dup_step(second, legacy_bands, vecs0)
    got |= {(r.id_a, r.id_b, r.cos_sim) for r in p1.collect()}
    assert got == expected
