"""Streaming-incremental retrieval index (streaming/retrieval_index.py)
and its algebra (operators/retrieval.term_state / merge_term_states /
term_statistics_from_state / stats_state): the incrementally-maintained
index must reproduce a from-scratch batch build BIT-exactly — term
statistics, corpus stats, and the BM25 top-k built on them — under any
batch split, after restarts, and after compaction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import retrieval
from flink_tank_spark.streaming import retrieval_index as ridx


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")


def _direct_index(docs):
    posts = retrieval.term_postings(docs)
    stats = retrieval.corpus_stats(docs)
    return posts, retrieval.term_statistics(posts, stats), stats


def test_merged_state_equals_direct_build_bit_exact(spark, sf_dir):
    """Pure algebra, no streaming: term states built per batch and
    merged, finalized against merged corpus stats, equal the
    from-scratch term_statistics row-for-row; avgdl is bit-identical."""
    docs = _docs(spark, sf_dir)
    _, direct_ts, direct_stats = _direct_index(docs)
    parts = [docs.filter(F.pmod("doc_id", F.lit(3)) == i) for i in range(3)]
    states = None
    sstates = None
    for p in parts:
        st = retrieval.term_state(retrieval.term_postings(p))
        ss = retrieval.stats_state(p)
        states = st if states is None else states.unionByName(st)
        sstates = ss if sstates is None else sstates.unionByName(ss)
    fstats = retrieval.finalize_corpus_stats(sstates)
    assert fstats.collect() == direct_stats.collect()
    merged_ts = retrieval.term_statistics_from_state(
        retrieval.merge_term_states(states), fstats
    )
    assert sorted(map(tuple, merged_ts.collect())) == sorted(
        map(tuple, direct_ts.collect())
    )


def test_streamed_index_reproduces_batch_bm25(spark, sf_dir, tmp_path):
    """Docs streamed across three RESTARTED runs (checkpoint carries
    progress): the loaded index's BM25 exact AND WAND top-k equal the
    from-scratch batch build on the same corpus — and stay equal after
    compact() folds the delta partitions."""
    docs = _docs(spark, sf_dir)
    rows = sorted((r.asDict() for r in docs.collect()), key=lambda r: r["doc_id"])
    src = str(tmp_path / "in")
    index_dir, ckpt = str(tmp_path / "idx"), str(tmp_path / "ck")
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    for i, chunk in enumerate(thirds):
        _write_jsonl(src, f"b{i}.jsonl", chunk)
        q = ridx.start_index_job(spark, src, index_dir, ckpt)
        q.awaitTermination(300)

    posts_d, ts_d, stats_d = _direct_index(docs)
    qids = list(range(5))
    expect_exact = sorted(map(tuple, retrieval.bm25_topk(
        docs, qids, posts=posts_d, term_stats=ts_d, stats=stats_d
    ).collect()))
    expect_wand = sorted(map(tuple, retrieval.bm25_wand_topk(
        docs, qids, posts=posts_d, term_stats=ts_d, stats=stats_d
    ).collect()))
    assert expect_exact == expect_wand  # WAND losslessness sanity

    def check():
        idx = ridx.load_index(spark, index_dir)
        assert sorted(map(tuple, idx["term_stats"].collect())) == sorted(
            map(tuple, ts_d.collect())
        )
        got = sorted(map(tuple, retrieval.bm25_wand_topk(
            docs, qids,
            posts=idx["posts"], term_stats=idx["term_stats"], stats=idx["stats"],
        ).collect()))
        assert got == expect_exact
        got_e = sorted(map(tuple, retrieval.bm25_topk(
            docs, qids,
            posts=idx["posts"], term_stats=idx["term_stats"], stats=idx["stats"],
        ).collect()))
        assert got_e == expect_exact

    check()
    ridx.compact(spark, index_dir)
    # exactly one merged partition remains per state table
    for sub in (ridx.TERM_STATE_SUBDIR, ridx.STATS_SUBDIR):
        parts = [e for e in os.listdir(os.path.join(index_dir, sub))
                 if e.startswith("ingest_batch=")]
        assert parts == ["ingest_batch=-1"], parts
    check()


def test_replayed_index_batch_is_idempotent(spark, tmp_path):
    """Re-running the sink for the same batch id (foreachBatch replay)
    overwrites its partitions with identical content — postings, term
    state, and corpus stats all stay single-counted."""
    rows = [
        {"doc_id": 1, "text": "alpha beta alpha gamma"},
        {"doc_id": 2, "text": "beta beta delta"},
    ]
    index_dir = str(tmp_path / "idx")
    sink = ridx.incremental_index_sink(index_dir)
    batch = spark.createDataFrame(rows)
    sink(batch, 0)
    idx1 = ridx.load_index(spark, index_dir)
    stats1 = idx1["stats"].collect()
    posts1 = sorted(map(tuple, idx1["posts"].collect()))
    sink(batch, 0)  # replay
    idx2 = ridx.load_index(spark, index_dir)
    assert idx2["stats"].collect() == stats1
    assert sorted(map(tuple, idx2["posts"].collect())) == posts1
    assert stats1[0]["n_docs"] == 2
