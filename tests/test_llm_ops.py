"""Operator-level tests for the LLM data-pipeline layer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import dedup, multimodal, similarity


def test_multimodal_encode_decode_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "x" * 700)], ["media_id", "payload"]
    )
    media = multimodal.encode_fake(df, "media_id", "payload", kind="video")
    decoded = multimodal.decode_stub(media)
    rows = {r.media_id: r for r in decoded.collect()}
    assert rows[1].width == 11 % 640 + 16
    assert rows[1].height == 11 % 480 + 16
    assert rows[1].n_frames == 11 % 30 + 1
    assert rows[1].n_payload_bytes == 11
    assert rows[2].width == 700 % 640 + 16  # width wraps past 640
    assert rows[2].n_payload_bytes == 700
    assert rows[2].kind == "video"


def test_multimodal_frame_sample(spark):
    df = spark.createDataFrame([(1, "a" * 25)], ["media_id", "payload"])  # 26 frames
    media = multimodal.encode_fake(df, "media_id", "payload")
    frames = multimodal.frame_sample(media, every_nth=10).collect()
    assert [f.frame_idx for f in frames] == [0, 10, 20]


def test_lsh_recalls_known_near_dups(spark, sf_dir):
    """The synthetic corpus contains ~0.99-Jaccard pairs; MinHash-LSH
    blocking must recover them (2 bands x 2 rows at j=0.99 misses with
    probability ~(1-0.98)^2 ~ 4e-4)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, n_perms=4)
    cands = dedup.lsh_candidate_pairs(sigs, rows_per_band=2)
    cand_pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    # ground truth: top pairs by exact jaccard
    pairs = dedup.jaccard_pairs(dedup.shingle_sets(docs))
    top = pairs.filter(F.col("jaccard") > 0.9).collect()
    assert len(top) > 0
    missed = [(r.id_a, r.id_b) for r in top if (r.id_a, r.id_b) not in cand_pairs]
    assert missed == []


def test_simhash_close_for_near_dups(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.jaccard_pairs(dedup.shingle_sets(docs))
    top = pairs.orderBy(F.desc("jaccard")).limit(1).collect()[0]
    sh = {r.doc_id: r.simhash for r in dedup.simhash_bits(
        docs.filter(F.col("doc_id").isin(top.id_a, top.id_b))).collect()}
    hamming = sum(a != b for a, b in zip(sh[top.id_a], sh[top.id_b]))
    assert hamming <= 8  # near-dups agree on almost all simhash bits


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    """IVF searches one cell, so recall < 1 by design — but the top-1
    neighbor of each query should usually share the query's cell."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = similarity.cosine_topk(emb, queries, k=1).collect()
    from flink_tank_spark.plans.llm import emb_ivf_topk

    ivf = emb_ivf_topk(spark, sf_dir)
    ivf_top1 = {r.query_id: r.neighbor_id for r in ivf.collect() if r.rk == 1}
    agree = sum(1 for r in exact if ivf_top1.get(r.query_id) == r.neighbor_id)
    assert agree >= 3  # partial recall is expected; zero would be a bug
