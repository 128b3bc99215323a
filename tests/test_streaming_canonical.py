"""Streaming dedup endpoint (streaming/canonical.py): the keep/drop
view derived from the accumulated near-dup pair state must equal the
batch pipeline's group resolution (doc_dedup_groups convention) and
keep-one corpus, and a LATE duplicate must demote a previously-kept
document at the next read.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import dedup
from flink_tank_spark.streaming import canonical, neardup


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")


def _drain(q):
    q.awaitTermination(300)
    assert not q.isActive


def test_view_equals_batch_groups_and_corpus(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    rows = [r.asDict() for r in docs.collect()]
    batch_pairs = dedup.lsh_near_dup_pairs(docs).select("id_a", "id_b")
    expected_groups = {
        (r.doc_id, r.canon_id)
        for r in dedup.connected_components(batch_pairs).collect()
    }
    assert expected_groups, "corpus has no dup groups; test would be vacuous"
    dropped = {d for d, c in expected_groups if c < d}
    expected_kept = {r["doc_id"] for r in rows} - dropped

    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "index"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(neardup.start_near_dup_job(spark, src, idx, pd_, ck))

    got_groups = {
        (r.doc_id, r.canon_id)
        for r in canonical.dedup_groups_view(spark, pd_).collect()
    }
    assert got_groups == expected_groups
    got_kept = {
        r.doc_id for r in canonical.kept_corpus_view(spark, idx, pd_).collect()
    }
    assert got_kept == expected_kept


def test_late_duplicate_demotes_previously_kept_doc(spark, tmp_path):
    text = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(58)) + " xx yy"
    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "index"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    _write_jsonl(src, "b0.jsonl", [{"doc_id": 7, "text": near},
                                   {"doc_id": 9, "text": "unrelated words only"}])
    _drain(neardup.start_near_dup_job(spark, src, idx, pd_, ck))
    kept0 = {r.doc_id for r in canonical.kept_corpus_view(spark, idx, pd_).collect()}
    assert kept0 == {7, 9}  # doc 7 currently survives

    # its lower-id near-duplicate arrives LATE: the view must demote 7
    _write_jsonl(src, "b1.jsonl", [{"doc_id": 3, "text": text}])
    _drain(neardup.start_near_dup_job(spark, src, idx, pd_, ck))
    kept1 = {r.doc_id for r in canonical.kept_corpus_view(spark, idx, pd_).collect()}
    assert kept1 == {3, 9}
