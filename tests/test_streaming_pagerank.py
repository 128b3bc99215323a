"""Streaming PageRank view (streaming/pagerank.py): ranks derived at
read from the near-dup sink's accumulated state must equal the batch
doc_pagerank query bit-exactly — the pair stream IS the edge-delta
stream, the shingle index IS the node set, and the view runs the
literal batch fixpoint + finalize. A late batch must re-rank everything
(power iteration is global), and compaction must not change the view.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.graph import doc_pagerank
from flink_tank_spark.streaming import neardup
from flink_tank_spark.streaming import pagerank as spr


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")


def _rows(df):
    return [tuple(str(x) for x in r) for r in df.collect()]


def test_streamed_pagerank_equals_batch(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = [r.asDict() for r in docs.collect()]
    expected = _rows(doc_pagerank(spark, sf_dir))
    assert expected, "fixture produced no ranks"

    src = str(tmp_path / "in")
    index_dir, pairs_dir = str(tmp_path / "index"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    q = neardup.start_near_dup_job(spark, src, index_dir, pairs_dir, ckpt)
    q.awaitTermination(300)
    assert not q.isActive

    got = _rows(spr.load_pagerank(spark, index_dir, pairs_dir))
    assert got == expected

    # compaction folds the node/edge state without changing the view
    neardup.compact(spark, index_dir)
    assert _rows(spr.load_pagerank(spark, index_dir, pairs_dir)) == expected


def test_late_batch_reranks_previous_docs(spark, tmp_path):
    # wave 1: docs 1/2 near-identical, 3 isolated -> 1 or 2 leads.
    # the late wave adds 4 and 5, both near-dups of doc 3 but NOT of
    # each other (distinct pads push their mutual Jaccard under 0.8):
    # doc 3 becomes a degree-2 STAR HUB — it receives each leaf's FULL
    # damped contribution while every other doc has degree <= 1 — and
    # takes rank 1: the late edges re-ranked OLD docs. (A clique would
    # not work here: damped PageRank is identical across any regular
    # clique regardless of size.)
    base = " ".join(f"tok{i}" for i in range(40))
    alt = " ".join(f"alt{i}" for i in range(40))
    w1 = [
        {"doc_id": 1, "text": base + " uniq1"},
        {"doc_id": 2, "text": base + " uniq2"},
        {"doc_id": 3, "text": alt},
    ]
    pad4 = " ".join(f"p4x{i}" for i in range(8))
    pad5 = " ".join(f"p5x{i}" for i in range(8))
    w2 = [
        {"doc_id": 4, "text": alt + " " + pad4},
        {"doc_id": 5, "text": alt + " " + pad5},
    ]
    src = str(tmp_path / "in")
    index_dir, pairs_dir = str(tmp_path / "index"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")

    _write_jsonl(src, "w1.jsonl", w1)
    q = neardup.start_near_dup_job(spark, src, index_dir, pairs_dir, ckpt)
    q.awaitTermination(300)
    first = spr.load_pagerank(spark, index_dir, pairs_dir).collect()
    assert first[0].doc_id in (1, 2)

    _write_jsonl(src, "w2.jsonl", w2)
    q = neardup.start_near_dup_job(spark, src, index_dir, pairs_dir, ckpt)
    q.awaitTermination(300)
    after = spr.load_pagerank(spark, index_dir, pairs_dir).collect()
    assert after[0].doc_id == 3, [
        (r.doc_id, r.degree, r.pr_scaled) for r in after
    ]
