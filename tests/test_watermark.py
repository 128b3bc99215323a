"""Event-time watermark semantics: late data dropped, windows finalized.

The reference has no event-time/watermark handling at all (SURVEY §2.8);
this pins the extension's late-data contract: in append mode a window
emits exactly once after the watermark passes its end, and events
arriving later than the watermark allows are never counted.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.operators.aggregate import sliding_metrics_watermarked


def _run(spark, src, out, ckpt, rows):
    os.makedirs(src, exist_ok=True)
    name = f"b{len(os.listdir(src))}.jsonl"
    with open(os.path.join(src, name), "w") as f:
        for user, etype, ts in rows:
            f.write(json.dumps({"originalId": user, "eventType": etype, "et": ts}) + "\n")
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.schema("originalId string, eventType string, et string")
        .json(src)
        .withColumn("eventTime", F.to_timestamp("et"))
    )
    metrics = sliding_metrics_watermarked(
        raw, window_size="1 minute", slide="1 minute", watermark="30 seconds"
    )
    q = (
        metrics.writeStream.format("json")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def _read(spark, out):
    import glob

    rows = []
    for p in glob.glob(os.path.join(out, "*.json")) + glob.glob(os.path.join(out, "*.txt")):
        with open(p) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    return rows


def test_late_data_dropped_and_windows_finalized(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))

    # batch 1: two on-time events in the 12:00 window
    _run(spark, src, out, ckpt, [
        ("u1", "a", "2024-06-01 12:00:10"),
        ("u1", "b", "2024-06-01 12:00:20"),
    ])
    # batch 2: advance event time far past the watermark -> 12:00 window
    # finalizes WITHOUT the late straggler below
    _run(spark, src, out, ckpt, [("u1", "c", "2024-06-01 12:05:00")])
    # batch 3: a late event for the already-finalized 12:00 window + a
    # mover to flush 12:05
    _run(spark, src, out, ckpt, [
        ("u1", "LATE", "2024-06-01 12:00:30"),
        ("u1", "d", "2024-06-01 12:10:00"),
    ])

    rows = _read(spark, out)
    w1200 = [r for r in rows if r["windowStart"].startswith("2024-06-01T12:00")]
    assert len(w1200) == 1, f"12:00 window must emit exactly once: {w1200}"
    assert w1200[0]["totalEventCount"] == 2  # LATE never counted
    assert json.loads(w1200[0]["eventTypeCounts"]) == {"a": 1, "b": 1}
    w1205 = [r for r in rows if r["windowStart"].startswith("2024-06-01T12:05")]
    assert len(w1205) == 1 and w1205[0]["totalEventCount"] == 1


def test_streaming_session_windows_finalize_and_match_batch(spark, tmp_path):
    """Streaming twin of ev_sessionize: session_window + watermark in
    append mode. A session emits exactly once, after the watermark
    passes its close (start + gap beyond the last event); the emitted
    sessions must carry exactly the batch session_window aggregation's
    counts on the same rows. The reference has no session concept at
    all — this pins the extension's streaming form."""
    import glob

    from pyspark.sql import functions as F

    src = str(tmp_path / "sess-src")
    out = str(tmp_path / "sess-out")
    ckpt = str(tmp_path / "sess-ckpt")
    os.makedirs(src, exist_ok=True)

    def run_batchfile(name, rows):
        with open(os.path.join(src, name), "w") as f:
            for user, ts in rows:
                f.write(json.dumps({"user_id": user, "et": ts}) + "\n")
        raw = (
            spark.readStream.schema("user_id string, et string")
            .json(src)
            .withColumn("ts", F.to_timestamp("et"))
            .withWatermark("ts", "10 seconds")
        )
        sessions = (
            raw.groupBy(F.session_window("ts", "30 seconds").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id",
                F.col("w.start").cast("string").alias("session_start"),
                "n_events",
            )
        )
        q = (
            sessions.writeStream.format("json")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    # wave 1: user a has 3 events 10 s apart (one session), user b has 2
    wave1 = [("a", "2024-01-01T00:00:00"), ("a", "2024-01-01T00:00:10"),
             ("a", "2024-01-01T00:00:20"), ("b", "2024-01-01T00:00:05"),
             ("b", "2024-01-01T00:00:15")]
    run_batchfile("w1.jsonl", wave1)
    # wave 2: a much-later event pushes the watermark far past wave 1's
    # session closes -> those sessions finalize and emit
    wave2 = [("c", "2024-01-01T00:40:00")]
    run_batchfile("w2.jsonl", wave2)

    rows = []
    for p in glob.glob(os.path.join(out, "*.json")):
        with open(p) as f:
            rows += [json.loads(line) for line in f if line.strip()]
    emitted = {(r["user_id"], r["session_start"]): r["n_events"] for r in rows}

    # batch truth on the SAME input rows
    pdf = spark.createDataFrame(
        [(u, t) for u, t in wave1 + wave2], ["user_id", "et"]
    ).withColumn("ts", F.to_timestamp("et"))
    batch = {
        (r["user_id"], str(r["session_start"])): r["n_events"]
        for r in (
            pdf.groupBy(F.session_window("ts", "30 seconds").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", F.col("w.start").alias("session_start"), "n_events")
            .collect()
        )
    }
    # every emitted session equals the batch answer, and wave-1's two
    # sessions did emit (c's session may still be open -> not required)
    for key, n in emitted.items():
        assert batch[key] == n, (key, n, batch)
    assert ("a", "2024-01-01 00:00:00") in emitted
    assert ("b", "2024-01-01 00:00:05") in emitted
    assert emitted[("a", "2024-01-01 00:00:00")] == 3
    assert emitted[("b", "2024-01-01 00:00:05")] == 2
