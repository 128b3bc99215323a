"""Streaming CEP (streaming/cep.py): streamed matches must equal the
batch ev_cep_match plan on the same corpus, across micro-batch splits
and a checkpoint restart, with tail matches flushed by per-key mover
events (the session-window finalize contract)."""

from __future__ import annotations

import glob
import json
import os

import pandas as pd
from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.analytics import ev_cep_match
from flink_tank_spark.streaming import cep

SF_DIR = "/root/testdata/sf0.01"


def _write_wave(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_wave(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts string, event_type string"
        )
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        cep.cep_match_stream(stream)
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)


def _collect_matches(spark, out):
    files = glob.glob(os.path.join(out, "*.json"))
    got = set()
    for fp in files:
        with open(fp) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    got.add((r["user_id"], r["signup_event_id"]))
    return got


def _event_rows(spark):
    ev = (
        load_table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts", "event_type")
        .orderBy("ts", "event_id")
    )
    return [
        {
            "user_id": r.user_id,
            "event_id": r.event_id,
            "ts": r.ts.isoformat(),
            "event_type": r.event_type,
        }
        for r in ev.collect()
    ]


def _movers(rows):
    """One per-key finalize event past every window (ts max + 2 h)."""
    last = max(pd.Timestamp(r["ts"]) for r in rows)
    flush_ts = (last + pd.Timedelta(hours=2)).isoformat()
    users = sorted({r["user_id"] for r in rows})
    return [
        {"user_id": u, "event_id": 10_000_000 + u, "ts": flush_ts,
         "event_type": "view"}
        for u in users
    ]


def _batch_expected(spark):
    return {
        (r.user_id, r.signup_event_id)
        for r in ev_cep_match(spark, SF_DIR).collect()
    }


def test_streamed_cep_equals_batch(spark, tmp_path):
    rows = _event_rows(spark)
    expected = _batch_expected(spark)
    assert expected, "corpus has no CEP matches; parity test is vacuous"
    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    # time-ordered thirds (the per-key in-order contract), then movers
    third = len(rows) // 3
    _write_wave(src, "w0.jsonl", rows[:third])
    _write_wave(src, "w1.jsonl", rows[third : 2 * third])
    _write_wave(src, "w2.jsonl", rows[2 * third :])
    _write_wave(src, "w3.jsonl", _movers(rows))
    _run_wave(spark, src, out, ckpt)
    assert _collect_matches(spark, out) == expected


def test_streamed_cep_restart_carries_partial_matches(spark, tmp_path):
    """Same corpus, but each wave is a SEPARATE restarted run resuming
    the checkpoint — open partial matches and held-back pendings must
    survive in state across restarts."""
    rows = _event_rows(spark)
    expected = _batch_expected(spark)
    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    half = len(rows) // 2
    for i, wave in enumerate([rows[:half], rows[half:], _movers(rows)]):
        _write_wave(src, f"w{i}.jsonl", wave)
        _run_wave(spark, src, out, ckpt)  # fresh query each time
    assert _collect_matches(spark, out) == expected


def test_cep_tie_rule_across_batch_boundary(spark, tmp_path):
    """The held-back pending exists exactly for this case: a purchase
    closes a signup at the end of one micro-batch, and an error at the
    SAME timestamp arrives in the NEXT batch — the match must NOT be
    emitted. A control user with no such error must match."""
    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    t = "2024-01-01T00:"
    _write_wave(src, "w0.jsonl", [
        {"user_id": 1, "event_id": 10, "ts": t + "00:00", "event_type": "signup"},
        {"user_id": 1, "event_id": 11, "ts": t + "10:00", "event_type": "purchase"},
        {"user_id": 2, "event_id": 20, "ts": t + "00:00", "event_type": "signup"},
        {"user_id": 2, "event_id": 21, "ts": t + "10:00", "event_type": "purchase"},
    ])
    _run_wave(spark, src, out, ckpt)
    # same-ts error for user 1 only, then movers for both
    _write_wave(src, "w1.jsonl", [
        {"user_id": 1, "event_id": 12, "ts": t + "10:00", "event_type": "error"},
        {"user_id": 1, "event_id": 13, "ts": t + "30:00", "event_type": "view"},
        {"user_id": 2, "event_id": 22, "ts": t + "30:00", "event_type": "view"},
    ])
    _run_wave(spark, src, out, ckpt)
    assert _collect_matches(spark, out) == {(2, 20)}


def _run_wave_timeout(spark, src, out, ckpt, idle_flush_ms):
    """Drain the source, then keep the query alive until idle_flush_ms
    (plus a timer-batch margin) passes with no input — the idle timers
    have then fired. availableNow can't drive this: a pending one-shot
    processing-time timer leaves it neither firing nor terminating (the
    heartbeat availableNow gotcha, one-shot edition), so poll progress
    under a processingTime trigger and stop() explicitly."""
    import time

    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts string, event_type string"
        )
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        cep.cep_match_stream_timeout(stream, idle_flush_ms=idle_flush_ms)
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    deadline = time.time() + 240
    last_data = time.time()
    quiet_batches: set = set()
    try:
        while time.time() < deadline:
            time.sleep(0.5)
            p = q.lastProgress
            if not p:
                continue
            if p["numInputRows"] > 0:
                last_data = time.time()
                quiet_batches.clear()
                continue
            # a fixed wall margin flakes under host load (the trigger
            # can be scheduled late): require TWO distinct zero-input
            # micro-batches to COMPLETE after the idle window — the
            # second proves the timer batch itself ran to completion
            if time.time() - last_data > idle_flush_ms / 1000 + 1:
                quiet_batches.add(p["batchId"])
                if len(quiet_batches) >= 2:
                    return
        raise AssertionError("wave did not quiesce before deadline")
    finally:
        q.stop()


def test_cep_timeout_flushes_idle_key(spark, tmp_path):
    """The timer twin's whole point: a within-window signup->purchase on
    a key that then goes silent must emit WITHOUT any subsequent event
    for the key (no mover), once the idle grace period lapses."""
    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    t = "2024-01-01T00:"
    _write_wave(src, "w0.jsonl", [
        {"user_id": 1, "event_id": 10, "ts": t + "00:00", "event_type": "signup"},
        {"user_id": 1, "event_id": 11, "ts": t + "10:00", "event_type": "purchase"},
    ])
    _run_wave_timeout(spark, src, out, ckpt, idle_flush_ms=2000)
    assert _collect_matches(spark, out) == {(1, 10)}


def test_cep_timeout_holds_tie_rule_within_grace(spark, tmp_path):
    """An error at exactly the purchase ts arriving WITHIN the grace
    period must still cancel the pending — the idle timer must not fire
    under (or despite) incoming data. Runs one continuous
    processing-time-trigger query and drops the error in mid-flight
    (an availableNow wave can't model this: it waits out its own timers
    before terminating)."""
    import time

    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    t = "2024-01-01T00:"
    _write_wave(src, "w0.jsonl", [
        {"user_id": 1, "event_id": 10, "ts": t + "00:00", "event_type": "signup"},
        {"user_id": 1, "event_id": 11, "ts": t + "10:00", "event_type": "purchase"},
        {"user_id": 2, "event_id": 20, "ts": t + "00:00", "event_type": "signup"},
        {"user_id": 2, "event_id": 21, "ts": t + "10:00", "event_type": "purchase"},
    ])
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts string, event_type string"
        )
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        cep.cep_match_stream_timeout(stream, idle_flush_ms=10_000)
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    got = set()
    try:
        # the error lands inside both keys' 10 s grace window (if the
        # machine stalls and it shares user 1's first batch, per-key
        # ordering makes the outcome identical)
        time.sleep(2)
        _write_wave(src, "w1.jsonl", [
            {"user_id": 1, "event_id": 12, "ts": t + "10:00",
             "event_type": "error"},
        ])
        deadline = time.time() + 120
        while time.time() < deadline:
            got = _collect_matches(spark, out)
            if got:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    # user 1 cancelled by the tie rule; user 2 flushed by its idle timer
    assert got == {(2, 20)}


def test_cep_timeout_restart_batch_parity(spark, tmp_path):
    """Corpus parity WITHOUT movers: the idle timers finalize the tails.
    Each wave is a separate restarted run resuming the checkpoint —
    opens survive the timeout flush and the restart (user-2-style
    cross-wave matches must still complete)."""
    rows = _event_rows(spark)
    expected = _batch_expected(spark)
    assert expected
    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    half = len(rows) // 2
    for i, wave in enumerate([rows[:half], rows[half:]]):
        _write_wave(src, f"w{i}.jsonl", wave)
        _run_wave_timeout(spark, src, out, ckpt, idle_flush_ms=2000)
    assert _collect_matches(spark, out) == expected


def test_cep_custom_pattern_instance(spark, tmp_path):
    """make_matcher binds arbitrary (start, end, negation, within):
    view -> click within 5 min, purchase negation."""
    src = str(tmp_path / "in")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    t = "2024-01-01T00:"
    _write_wave(src, "w0.jsonl", [
        {"user_id": 1, "event_id": 10, "ts": t + "00:00", "event_type": "view"},
        {"user_id": 1, "event_id": 11, "ts": t + "02:00", "event_type": "click"},
        {"user_id": 2, "event_id": 20, "ts": t + "00:00", "event_type": "view"},
        {"user_id": 2, "event_id": 21, "ts": t + "01:00", "event_type": "purchase"},
        {"user_id": 2, "event_id": 22, "ts": t + "02:00", "event_type": "click"},
        {"user_id": 3, "event_id": 30, "ts": t + "00:00", "event_type": "view"},
        {"user_id": 3, "event_id": 31, "ts": t + "10:00", "event_type": "click"},
        {"user_id": 1, "event_id": 40, "ts": t + "30:00", "event_type": "signup"},
        {"user_id": 2, "event_id": 41, "ts": t + "30:00", "event_type": "signup"},
        {"user_id": 3, "event_id": 42, "ts": t + "30:00", "event_type": "signup"},
    ])
    stream = (
        spark.readStream.schema(
            "user_id long, event_id long, ts string, event_type string"
        )
        .json(src)
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        cep.cep_match_stream(
            stream, start="view", end="click", negation="purchase",
            within_us=300_000_000,
        )
        .writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    # user 1: clean view->click in 2 min; user 2: purchase negation;
    # user 3: click outside 5 min window
    assert _collect_matches(spark, out) == {(1, 10)}
