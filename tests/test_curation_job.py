"""End-to-end curation job: stage funnel + materialized corpus."""

from __future__ import annotations

import argparse
import json

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.jobs.curation_job import STAGES, curation_flags, funnel_stats, run

SF = "/root/testdata/sf0.001"


def test_flags_consistent_and_funnel_monotone(spark):
    docs = load_table(spark, SF, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 11 == 0).select("doc_id", "text")
    flags = curation_flags(docs, eval_docs=eval_docs)
    rows = flags.collect()
    assert len(rows) == docs.count()
    # kept == AND of all stage flags, row by row
    for r in rows:
        assert r.kept == all(getattr(r, f"keep_{s}") for s in STAGES)
    stats = funnel_stats(flags)
    # funnel never grows, something survives, something is dropped
    seq = [stats["n_docs"]] + [stats[f"after_{s}"] for s in STAGES]
    assert all(a >= b for a, b in zip(seq, seq[1:])), seq
    assert 0 < stats["n_kept"] < stats["n_docs"]
    # eval docs present verbatim in the corpus are contamination BY
    # DEFINITION (they share every 8-gram with the bench set) and must
    # be decontam-dropped — benchmark text never ships in the corpus
    ev = {r.doc_id for r in eval_docs.select("doc_id").collect()}
    for r in rows:
        if r.doc_id in ev:
            assert not r.keep_decontam


def test_job_materializes_lang_partitioned_corpus(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    args = argparse.Namespace(
        sf_dir=SF, out=out, min_quality=0.2, max_dup_3gram=0.5, no_decontam=False
    )
    assert run(spark, args) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    corpus = spark.read.parquet(out)
    assert corpus.count() == stats["n_kept"]
    # hive-style lang partitioning on disk
    import os

    parts = {d for d in os.listdir(out) if d.startswith("lang=")}
    langs = {r.lang for r in corpus.select("lang").distinct().collect()}
    assert parts == {f"lang={l}" for l in langs} and parts


def test_containment_stage_drops_subset_duplicates(spark):
    # a short doc fully contained in a long one has Jaccard -> 0 (the
    # neardup stage is blind to it) but containment 1.0 — the optional
    # stage must drop the CONTAINED doc and keep the container
    small = " ".join(f"tok{i}" for i in range(30))
    big = small + " " + " ".join(f"pad{i}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, "en", "synth", small), (2, "en", "synth", big),
         (3, "de", "synth", "completely unrelated text " * 20)],
        "doc_id long, lang string, source string, text string",
    )
    off = {r.doc_id: r.keep_containment for r in curation_flags(docs).collect()}
    assert off == {1: True, 2: True, 3: True}  # disabled ⇒ constant-true
    on = {
        r.doc_id: r.keep_containment
        for r in curation_flags(docs, containment=True).collect()
    }
    assert on == {1: False, 2: True, 3: True}


def test_containment_survivor_mode_both_ways(spark):
    """The A-in-B-and-B-dropped case (r13 verdict #7), pinned BOTH
    ways: B contains A but B itself fails a quality-family stage.
    Global semantics evict A anyway (pair set over the full corpus);
    survivor-relative semantics keep A because B is not a surviving
    container — A's content still ships."""
    a = ("the quick brown fox jumps over the lazy dog while the small "
         "red hen walks near the old stone wall")
    # junk: 300 DISTINCT 20-digit words — B keeps A as a prefix (so
    # containment(A in B) = 1.0) but B's alpha ratio / stopword rate /
    # mean word length all collapse, failing the quality stage while
    # leaving repetition legitimate (no duplicate 3-grams)
    junk = " ".join("%020d" % i for i in range(300))
    docs = spark.createDataFrame(
        [(1, "en", "synth", a), (2, "en", "synth", a + " " + junk)],
        "doc_id long, lang string, source string, text string",
    )

    g = {r.doc_id: r for r in
         curation_flags(docs, containment="global").collect()}
    # B is a containment-keeper but dies at another stage
    assert g[2].keep_containment and not g[2].kept
    assert not g[2].keep_quality
    # GLOBAL: the doomed container still evicts A
    assert not g[1].keep_containment and not g[1].kept

    s = {r.doc_id: r for r in
         curation_flags(docs, containment="survivors").collect()}
    assert not s[2].kept  # B still dropped by quality
    # SURVIVORS: B is not a surviving container, so A ships
    assert s[1].keep_containment and s[1].kept

    # same drop rule when the container IS a survivor: plain subset
    # pair with a healthy container behaves identically in both modes
    b_ok = a + " and then the calm grey owl flew back home before dark"
    docs2 = spark.createDataFrame(
        [(1, "en", "synth", a), (2, "en", "synth", b_ok)],
        "doc_id long, lang string, source string, text string",
    )
    for mode in ("global", "survivors"):
        f = {r.doc_id: r for r in
             curation_flags(docs2, containment=mode).collect()}
        assert not f[1].keep_containment and f[2].kept, mode


def test_job_optional_stages_sample_dsir_vocab(spark, tmp_path, capsys):
    out = str(tmp_path / "corpus")
    args = argparse.Namespace(
        sf_dir=SF, out=out, min_quality=0.2, max_dup_3gram=0.5,
        no_decontam=False, containment=True, sample_k=20,
        dsir_scores=True, vocab_stats=True,
    )
    assert run(spark, args) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    corpus = spark.read.parquet(out)

    # the funnel gained the containment stage and stays monotone
    seq = [stats["n_docs"]] + [stats[f"after_{s}"] for s in STAGES]
    assert all(a >= b for a, b in zip(seq, seq[1:])), seq

    # the sample is a further cut of the kept corpus; sampled count is
    # what actually shipped
    assert stats["n_sampled"] == corpus.count()
    assert 0 < stats["n_sampled"] <= min(stats["n_kept"], 20)

    # every shipped multi-token doc carries a DSIR score
    assert "dsir_score_ppm" in corpus.columns
    scored = corpus.filter(F.col("dsir_score_ppm").isNotNull()).count()
    assert scored > 0

    # per-source OOV stats of the shipped corpus, bounded rows
    cov = stats["vocab_coverage"]
    assert cov and all(
        set(r) >= {"source", "n_docs", "n_tokens", "n_oov", "oov_ppm"}
        for r in cov
    )
    assert sum(r["n_docs"] for r in cov) == stats["n_sampled"]
