"""Unit tests for the round-4 scale operators.

The oracle gate already hash-checks these end-to-end at sf0.01/sf1;
these tests pin the component-level contracts: the spread guard's
no-op condition, DataFrame-vs-Column fingerprint equivalence on edge
strings, blocked-matmul pair parity with the naive quadratic rescore,
and the integer-exactness of the adaptive IVF cell rule against the
DuckDB expression it mirrors.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_tank_spark.operators.skew import spread_partitions


def test_spread_partitions_spreads_single_split(spark):
    df = spark.range(1000).coalesce(1)
    out = spread_partitions(df)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert out.count() == 1000


def test_spread_partitions_noop_when_already_parallel(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).repartition(target + 3)
    out = spread_partitions(df)
    # unchanged object semantics: no extra exchange on an already-wide input
    assert out.rdd.getNumPartitions() == target + 3
    assert "RoundRobinPartitioning" not in out._jdf.queryExecution().executedPlan().toString() or out is df


def test_fingerprint_docs_matches_column_form(spark):
    from flink_tank_spark.operators import text

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "short"),          # < k chars: md5 of the whole text
        (2, "exactly8"),       # == k chars: one gram
        (3, ""),               # empty string
        (4, "aaaaaaaaaaaaaaaa"),  # repeated grams collapse to one hash
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    col_form = {
        r.doc_id: r.fp
        for r in docs.select(
            "doc_id", text.fingerprint(F.col("text"), 8).alias("fp")
        ).collect()
    }
    df_form = {
        r.doc_id: r.fingerprint
        for r in text.fingerprint_docs(docs, "doc_id", "text", 8).collect()
    }
    assert df_form == col_form


def test_cell_blocked_pairs_matches_naive_rescore(spark):
    from flink_tank_spark.operators import similarity

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.2]),
        (4, [0.5, 0.5, 0.0]),
        (5, [1.0, 0.01, 0.0]),
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    centroids = emb.filter(F.col("vec_id") < 2)
    assigned = similarity.ivf_assign(emb, centroids, probes=2)
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.cell_blocked_pairs(assigned, threshold=0.6).collect()
    }
    # naive: every pair sharing a probe cell, exact fixed-point cosine
    cells = assigned.select("vec_id", "centroid_id").collect()
    member = {}
    for r in cells:
        member.setdefault(r.centroid_id, set()).add(r.vec_id)
    vmap = {
        r.vec_id: (r.v, r.vnorm)
        for r in assigned.select("vec_id", "v", "vnorm").distinct().collect()
    }
    import math

    def fp_cos(a, b):
        sa = sum(math.floor(x * y * 1e12 + 0.5) for x, y in zip(vmap[a][0], vmap[b][0]))
        return (sa / 1e12) / (vmap[a][1] * vmap[b][1])

    want = {}
    for members in member.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                c = fp_cos(a, b)
                if c >= 0.6:
                    want[(a, b)] = c
    assert got == want


@pytest.mark.parametrize(
    "n", [1, 100, 499, 500, 501, 15999, 16000, 16001, 20000, 100000, 12345678]
)
def test_adaptive_cell_rule_matches_duckdb(n):
    """The engine computes max(32, (n+499)//500); the oracle SQL computes
    GREATEST(32, (COUNT(*)+499)//500). They must agree INTEGER-EXACTLY
    for any corpus size or the gate would diverge."""
    py = max(32, (n + 499) // 500)
    (db,) = duckdb.sql(f"SELECT GREATEST(32, ({n} + 499) // 500)").fetchone()
    assert py == db


def test_bm25_wand_matches_exact_and_prunes_terms(spark, oracle_sf_dir):
    """WAND promise, both halves, on the real sf0.01 corpus: (1) the
    pruned top-k is row-identical to the exact operator; (2) the term
    prune is REAL — non-essential (query, term) pairs exist, so their
    posting lists are skipped during candidate generation. (Candidate
    DOC pruning doesn't fire on this corpus — its uniform synthetic
    vocabulary puts an essential term in every doc; the doc-level prune
    is exercised on a skewed corpus in the next test.)"""
    from flink_tank_spark.operators import retrieval
    from flink_tank_spark.io.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    qids = range(5)
    exact = retrieval.bm25_topk(docs, qids, k=10)
    parts = retrieval.bm25_wand_parts(docs, qids, k=10)

    got = sorted(map(tuple, parts["topk"].collect()))
    want = sorted(map(tuple, exact.collect()))
    assert got == want

    # term-level prune: strictly fewer essential (query, term) pairs
    # than query terms ⇒ postings skipped in candidate generation
    n_qterms = parts["qterms"].count()
    n_essential = parts["essential"].count()
    assert n_essential < n_qterms, (n_essential, n_qterms)
    # every query produced a theta (>= k rare-term seed docs at this SF)
    assert parts["theta"].count() == 5


def test_bm25_wand_doc_pruning_fires_on_skewed_corpus(spark):
    """Doc-level prune on a discriminative query: docs containing ONLY
    the ultra-common low-impact term must never become candidates, and
    the answer must still equal the exact operator's."""
    from flink_tank_spark.operators import retrieval

    # query doc 0 = "rare common"; docs 1-8 match the rare term; docs
    # 9-208 contain only the common term (plus per-doc unique filler so
    # they aren't exact duplicates)
    rows = [(0, "rare common")]
    rows += [(i, f"rare common pad{i % 3}") for i in range(1, 9)]
    rows += [(i, f"common filler{i}") for i in range(9, 209)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    exact = retrieval.bm25_topk(docs, [0], k=3)
    parts = retrieval.bm25_wand_parts(docs, [0], k=3)
    got = sorted(map(tuple, parts["topk"].collect()))
    want = sorted(map(tuple, exact.collect()))
    assert got == want

    cand_docs = {r.doc_id for r in parts["candidates"].collect()}
    # the rare-term docs are candidates; the common-only docs are not
    assert cand_docs and cand_docs <= set(range(1, 9)), cand_docs
    ess = {r.term for r in parts["essential"].collect()}
    assert "common" not in ess and "rare" in ess, ess


def test_bm25_wand_no_theta_means_no_pruning(spark):
    """A query with < k seed docs must get NO theta row and therefore
    keep every term essential — the no-unsafe-pruning path."""
    from flink_tank_spark.operators import retrieval

    rows = [(0, "alpha beta"), (1, "alpha gamma"), (2, "beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    parts = retrieval.bm25_wand_parts(docs, [0], k=10)
    assert parts["theta"].count() == 0
    # all of query 0's terms stay essential
    assert parts["essential"].count() == 2
    got = sorted(map(tuple, parts["topk"].collect()))
    want = sorted(map(tuple, retrieval.bm25_topk(docs, [0], k=10).collect()))
    assert got == want


def test_cell_blocked_pairs_drops_zero_norm_vectors(spark):
    """A zero-norm embedding has NaN cosine to everything (0/0); the
    blocked rescorer must exclude it from pairing (documented contract)
    rather than let numpy's NaN-is-False comparison silently diverge
    from Spark SQL's NaN-sorts-high semantics."""
    from flink_tank_spark.operators import similarity

    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [0.0, 0.0]),  # zero norm
    ]
    emb = spark.createDataFrame(vecs, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )
    centroids = emb.filter(F.col("vec_id") == 0)
    assigned = similarity.ivf_assign(emb, centroids)
    pairs = similarity.cell_blocked_pairs(assigned, threshold=0.5).collect()
    ids = {i for r in pairs for i in (r.id_a, r.id_b)}
    assert 2 not in ids
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


def test_bm25_term_stats_path_is_value_identical(spark, oracle_sf_dir):
    """The precomputed term_statistics index path must give row-identical
    results to the inline df/UB computation for BOTH operators — the
    amortized-index deployment cannot change values."""
    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.operators import retrieval

    docs = load_table(spark, oracle_sf_dir, "documents")
    posts = retrieval.term_postings(docs)
    tstats = retrieval.term_statistics(posts, retrieval.corpus_stats(docs))
    qids = range(5)
    for fn in (retrieval.bm25_topk, retrieval.bm25_wand_topk):
        inline = sorted(map(tuple, fn(docs, qids, k=10, posts=posts).collect()))
        indexed = sorted(map(tuple, fn(
            docs, qids, k=10, posts=posts, term_stats=tstats
        ).collect()))
        assert inline == indexed, fn.__name__


def test_bm25_term_stats_k1_b_mismatch_raises(spark, oracle_sf_dir):
    """ub_i is k1/b-dependent: an index built under different parameters
    than the query must be REJECTED (stale upper bounds would prune
    silently wrong). The params ride as schema metadata; a metadata-less
    table (hand-built) passes under the documented contract."""
    import pytest

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.operators import retrieval

    docs = load_table(spark, oracle_sf_dir, "documents")
    posts = retrieval.term_postings(docs)
    tstats = retrieval.term_statistics(
        posts, retrieval.corpus_stats(docs), k1=2.0, b=0.5
    )
    with pytest.raises(ValueError, match="k1"):
        retrieval.bm25_wand_parts(
            docs, [0], k=3, posts=posts, term_stats=tstats
        )
    # same params: accepted
    ok = retrieval.bm25_wand_parts(
        docs, [0], k=3, k1=2.0, b=0.5, posts=posts, term_stats=tstats
    )
    assert ok["topk"].count() > 0
    # the unpersist handle releases every cached frame
    assert ok["persisted"]
    retrieval.release_wand_parts(ok)
    assert all(not df.is_cached for df in ok["persisted"])
    # stripped metadata (e.g. a rebuilt/hand-authored table): accepted
    bare = tstats.select(
        "term", "df", F.col("ub_i").cast("long").alias("ub_i")
    )
    assert not (bare.schema["ub_i"].metadata or {})
    assert retrieval.bm25_wand_parts(
        docs, [0], k=3, posts=posts, term_stats=bare
    )["topk"].count() > 0


def test_sqdist_vectorized_matches_hof_bit_exact(spark):
    """The Arrow-batched fixed-point squared L2 equals the interpreted
    HOF fold on every pair — same exact-integer argument as
    dot_vectorized, pinned on real embeddings."""
    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.operators import similarity

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").limit(64)
    a = emb.select(
        F.col("vec_id").alias("ia"),
        similarity.as_double_array("embedding").alias("va"),
    )
    b = emb.select(
        F.col("vec_id").alias("ib"),
        similarity.as_double_array("embedding").alias("vb"),
    )
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    diff = pairs.select(
        (similarity.fp_sqdist(F.col("va"), F.col("vb"))
         - similarity.sqdist_vectorized(F.col("va"), F.col("vb"))).alias("d")
    ).agg(F.sum(F.abs(F.col("d"))), F.count(F.lit(1))).first()
    assert diff[1] > 1000 and diff[0] == 0, diff
