"""Streaming-incremental weighted sampling (streaming/wsample.py): the
derived sample must equal plans/sampling.weighted_sample over the same
corpus bit-exactly — regardless of micro-batch split, across replay of
an already-landed batch, and after compaction. Mergeability
(bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪ bottom_k(B))) is what makes
the ≤ k-row per-batch delta lossless, so the parity is structural, not
statistical.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.sampling import doc_weighted_sample
from flink_tank_spark.streaming import wsample as ws


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streamed_sample_equals_batch(spark, sf_dir, tmp_path):
    rows = [r.asDict() for r in _docs(spark, sf_dir).collect()]
    expected = _rows(doc_weighted_sample(spark, sf_dir))
    assert expected, "fixture produced an empty sample"

    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    for i in range(4):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::4])
    _drain(ws.start_wsample_job(spark, src, sd, ck))
    assert _rows(ws.load_weighted_sample(spark, sd)) == expected


def test_replay_and_compaction_are_lossless(spark, sf_dir, tmp_path):
    rows = [r.asDict() for r in _docs(spark, sf_dir).collect()]
    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(ws.start_wsample_job(spark, src, sd, ck))
    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(ws.start_wsample_job(spark, src, sd, ck))
    before = _rows(ws.load_weighted_sample(spark, sd))
    assert before == _rows(doc_weighted_sample(spark, sf_dir))

    # crash-replay surrogate: re-execute an already-landed batch id —
    # per-partition overwrite of an identical delta must change nothing
    replay = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows[1::2]], "doc_id long, text string"
    )
    ws.incremental_wsample_sink(sd)(replay, 1)
    assert _rows(ws.load_weighted_sample(spark, sd)) == before

    ws.compact(spark, sd)
    from flink_tank_spark.streaming import compaction

    base = os.path.join(sd, ws.WSAMPLE_SUBDIR)
    assert compaction.parts(base) == ["ingest_batch=-1"]
    assert _rows(ws.load_weighted_sample(spark, sd)) == before


def test_delta_is_bounded_by_k(spark, sf_dir, tmp_path):
    # the per-batch delta is the batch's own bottom-k: <= k rows no
    # matter how many documents the batch carries
    sd = str(tmp_path / "st")
    batch = _docs(spark, sf_dir)
    ws.incremental_wsample_sink(sd, k=7)(batch, 0)
    delta = spark.read.parquet(os.path.join(sd, ws.WSAMPLE_SUBDIR, "ingest_batch=0"))
    assert delta.count() == 7
