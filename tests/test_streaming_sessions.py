"""Streaming-incremental sessionization (streaming/sessions.py).

Summary-fold twin: the derived session table must equal ev_sessionize
over the same events bit-exactly — under hash (time-interleaved) batch
splits, when a LATE batch bridges two previously-separate sessions,
across replay, and after compaction.

Native watermarked session_window job: append-mode emit-once semantics
pinned — a session closed well before the final watermark emits exactly
the batch row; the tail session still open relative to the watermark
stays buffered.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.streaming_batch import ev_sessionize
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming import sessions as ss


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
    return [tuple(str(x) for x in r) for r in df.collect()]


def test_streamed_sessions_equal_batch_under_hash_split(spark, sf_dir, tmp_path):
    # hash split i::3 interleaves TIME across batches — every batch
    # carries fragments of most sessions, so the read-side merge is
    # doing real work, not concatenation
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    expected = _rows(ev_sessionize(spark, sf_dir))
    assert expected, "fixture produced no sessions"

    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(ss.start_sessions_job(spark, src, sd, ck))
    assert _rows(ss.load_sessions(spark, sd)) == expected


def test_late_batch_bridges_two_sessions(spark, tmp_path):
    # user 7: two events 50 min apart -> two sessions; a LATE event at
    # +25 min bridges them into ONE session of 3 events (the property
    # eager emission loses)
    def ev(i, ts):
        return {"event_id": i, "ts": ts, "user_id": 7,
                "event_type": "click", "value": 1.0}

    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", [ev(1, "2024-01-01 10:00:00"),
                                   ev(2, "2024-01-01 10:50:00")])
    _drain(ss.start_sessions_job(spark, src, sd, ck))
    two = _rows(ss.load_sessions(spark, sd))
    assert [r[2] for r in two] == ["1", "1"] and len(two) == 2

    _write_jsonl(src, "b1.jsonl", [ev(3, "2024-01-01 10:25:00")])
    _drain(ss.start_sessions_job(spark, src, sd, ck))
    one = _rows(ss.load_sessions(spark, sd))
    assert one == [("7", "2024-01-01 10:00:00", "3")]


def test_replay_and_compaction_are_lossless(spark, sf_dir, tmp_path):
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(ss.start_sessions_job(spark, src, sd, ck))
    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(ss.start_sessions_job(spark, src, sd, ck))
    before = _rows(ss.load_sessions(spark, sd))
    assert before == _rows(ev_sessionize(spark, sf_dir))

    replay = spark.createDataFrame(
        [(r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
         for r in rows[1::2]],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    ss.incremental_sessions_sink(sd)(replay, 1)
    assert _rows(ss.load_sessions(spark, sd)) == before

    ss.compact(spark, sd)
    base = os.path.join(sd, ss.SESSIONS_SUBDIR)
    assert compaction.parts(base) == ["ingest_batch=-1"]
    assert _rows(ss.load_sessions(spark, sd)) == before


def test_native_session_window_emits_closed_sessions_once(spark, tmp_path):
    # two files -> two micro-batches (maxFilesPerTrigger=1). User 1's
    # session closes 9 hours before the second file's timestamps, so
    # the watermark finalizes and emits it in batch 2; user 2's tail
    # session is still open relative to the final watermark and stays
    # buffered (append-mode semantics, pinned).
    def ev(i, u, ts):
        return {"event_id": i, "ts": ts, "user_id": u,
                "event_type": "click", "value": 1.0}

    src = str(tmp_path / "in")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _write_jsonl(src, "a0.jsonl", [ev(1, 1, "2024-01-01 01:00:00"),
                                   ev(2, 1, "2024-01-01 01:10:00")])
    _write_jsonl(src, "a1.jsonl", [ev(3, 2, "2024-01-01 10:00:00")])
    _drain(ss.start_native_session_job(spark, src, out, ck,
                                       max_files_per_trigger=1))
    got = _rows(
        spark.read.parquet(out).select("user_id", "session_start", "n_events")
    )
    assert got == [("1", "2024-01-01 01:00:00", "2")]


def test_subsecond_gap_boundary_not_truncated(spark, tmp_path):
    # True gap 1800.8s (> 30 min) with sub-second endpoints: whole-second
    # truncation would compute 1800 and wrongly merge. Must stay TWO
    # sessions — and the 1799.8s twin must stay ONE.
    def ev(i, ts):
        return {"event_id": i, "ts": ts, "user_id": 7,
                "event_type": "click", "value": 1.0}

    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", [ev(1, "2024-01-01 10:00:00.100")])
    _drain(ss.start_sessions_job(spark, src, sd, ck))
    _write_jsonl(src, "b1.jsonl", [ev(2, "2024-01-01 10:30:00.900"),
                                   ev(3, "2024-01-01 10:59:59.700")])
    _drain(ss.start_sessions_job(spark, src, sd, ck))
    got = _rows(ss.load_sessions(spark, sd))
    # 10:00:00.100 alone (gap to next = 1800.8s); the next two merge
    # (gap 1798.8s)
    assert got == [("7", "2024-01-01 10:00:00.100000", "1"),
                   ("7", "2024-01-01 10:30:00.900000", "2")]
