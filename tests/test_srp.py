"""Semantic tests for banded SRP-LSH (operators/similarity.srp_*).

Registry parity gates emb_srp_topk/emb_srp_recall against DuckDB; these
pin the operator's quality claim and determinism on controlled data.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_tank_spark.operators import similarity


def test_srp_weights_deterministic_rademacher():
    w1 = similarity.srp_weights(24, 64)
    w2 = similarity.srp_weights(24, 64)
    assert (w1 == w2).all()
    assert set(np.unique(w1)) == {-1, 1}
    # roughly balanced (md5 parity): not all-same on any plane
    assert (np.abs(w1.sum(axis=1)) < 64).all()


def test_srp_recovers_clustered_neighbors(spark):
    """On a CLUSTERED corpus (neighbors at cos >= 0.9) banded SRP must
    recover nearly all true top-k — the quality envelope the docstring
    claims for real embedding distributions."""
    rng = np.random.default_rng(7)
    dim, per = 64, 6
    rows = []
    vid = 0
    for c in range(8):  # 8 tight clusters
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(per):
            # per-component sigma 0.04 -> noise NORM ~0.32 vs unit center,
            # intra-cluster cos ~0.95 (0.15 per component would give a
            # norm-1.2 noise vector that swamps the center)
            v = center + 0.04 * rng.normal(size=dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") < 3)  # 3 queries from cluster 0
    got = similarity.srp_topk(df, queries, k=5).collect()
    # exact top-5 for comparison
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(df, queries, k=5).collect()
    }
    hits = sum((r["query_id"], r["neighbor_id"]) in exact for r in got)
    assert hits >= 13, f"clustered recall too low: {hits}/15"


def test_srp_pair_distinct_under_multi_band_collision(spark):
    """Identical vectors collide in EVERY band; the candidate pair must
    still appear once (DISTINCT before rerank)."""
    v = [float(x) for x in np.arange(64)]
    df = spark.createDataFrame(
        [(0, v), (1, v)], "vec_id long, embedding array<float>"
    )
    out = similarity.srp_topk(df, df.filter(F.col("vec_id") == 0), k=5).collect()
    assert len(out) == 1
    assert out[0]["neighbor_id"] == 1 and out[0]["rk"] == 1


def test_probe_keys_extend_base_keys(spark):
    # probe output = base band keys (prefix) + n_probes flipped keys;
    # each probe shares exactly its band's tag bits and differs in 1-2
    # data bits
    df = spark.createDataFrame(
        [(1, [float(i % 7) - 3.0 for i in range(64)])],
        "vec_id long, embedding array<double>",
    )
    base = df.select(
        similarity.srp_band_keys(F.col("embedding"), 24, 6, 64).alias("k")
    ).first()["k"]
    probed = df.select(
        similarity.srp_probe_keys(F.col("embedding"), 24, 6, 64, 8).alias("k")
    ).first()["k"]
    assert probed[:6] == base
    assert len(probed) == 6 + 8
    for pk in probed[6:]:
        tag = pk >> 56
        assert 0 <= tag < 6
        diff = pk ^ base[tag]
        assert diff != 0 and diff < (1 << 4)  # data bits only
        assert bin(diff).count("1") in (1, 2)


def test_multi_probe_candidates_superset_lifts_recall(spark, sf_dir):
    # probes only ADD buckets, so the probed top-k's hit set against
    # the exact top-5 is a superset of the unprobed one
    from flink_tank_spark.io.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").persist()
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, q, k=5).collect()
    }
    plain = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.srp_topk(emb, q, k=5).collect()
    }
    probed = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.srp_topk(emb, q, k=5, n_probes=8).collect()
    }
    assert len(probed & exact) >= len(plain & exact)
    emb.unpersist()


def test_probe_count_beyond_universe_is_refused(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 64)], "vec_id long, embedding array<double>"
    )
    # 6 bands x 4 rows: 6*(4 + 6) = 60 flips max
    with pytest.raises(ValueError, match="exceeds"):
        df.select(
            similarity.srp_probe_keys(F.col("embedding"), 24, 6, 64, 61)
        ).collect()
