"""Streaming-incremental windowed Top-N (streaming/topk.py): the
derived leaderboard must equal ev_hourly_top_users over the same events
bit-exactly — regardless of micro-batch split, across a checkpoint
restart, after replay, after compaction, and (the property eager
materialization loses) when a LATE event reorders an old window.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.streaming_batch import ev_hourly_top_users
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming import topk as stk


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({
                "event_id": r["event_id"], "ts": str(r["ts"]),
                "user_id": r["user_id"], "event_type": r["event_type"],
                "value": r["value"],
            }) + "\n")


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_streamed_topn_equals_batch(spark, sf_dir, tmp_path):
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    expected = _rows(ev_hourly_top_users(spark, sf_dir))
    assert expected, "fixture produced an empty leaderboard"

    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(stk.start_topn_job(spark, src, sd, ck))
    assert _rows(stk.load_top_users(spark, sd)) == expected


def test_late_event_reorders_an_old_window(spark, sf_dir, tmp_path):
    """Counts-as-state means a late arrival still lands in its event-time
    window and can flip the board — derive-at-read keeps it correct."""
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")

    # everything except a slice of the FIRST hour's events arrives first
    first_ts = min(r["ts"] for r in rows)
    late = [r for r in rows if r["ts"] == first_ts]
    on_time = [r for r in rows if r["ts"] != first_ts]
    assert late, "fixture has no tied-first-timestamp rows"
    _write_jsonl(src, "b0.jsonl", on_time)
    _drain(stk.start_topn_job(spark, src, sd, ck))
    # the stragglers arrive a restart later
    _write_jsonl(src, "b1.jsonl", late)
    _drain(stk.start_topn_job(spark, src, sd, ck))
    assert _rows(stk.load_top_users(spark, sd)) == _rows(
        ev_hourly_top_users(spark, sf_dir)
    )


def test_replay_idempotent_and_compaction_preserves_board(
    spark, sf_dir, tmp_path
):
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", rows)
    _drain(stk.start_topn_job(spark, src, sd, ck))
    before = _rows(stk.load_top_users(spark, sd))

    # replay of batch 0's content must rewrite, not double-count
    batch = spark.createDataFrame(rows, _events(spark, sf_dir).schema)
    stk.incremental_topn_sink(sd)(batch, 0)
    assert _rows(stk.load_top_users(spark, sd)) == before

    stk.compact(spark, sd)
    assert compaction.parts(os.path.join(sd, stk.TOPN_SUBDIR)) == [
        compaction.MERGED_PART
    ]
    assert _rows(stk.load_top_users(spark, sd)) == before == _rows(
        ev_hourly_top_users(spark, sf_dir)
    )
