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
