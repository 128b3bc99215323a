"""True Structured Streaming tests: cross-micro-batch state + sinks.

Exercises the streaming path the batch golden tests can't: the per-key
sequence must SURVIVE across micro-batches via GroupState (the analogue
of Flink's ValueState persisting across records, EventProcessorJob.kt:
104-126), and the topology must run end-to-end from a file source to a
file sink with checkpointing.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.io.kafka import read_jsonl_stream
from flink_tank_spark.streaming.jobs import get_output_streams, serialize_processed


_ARRIVAL = 0


def _write_batch(dirpath: str, name: str, messages: list[str]) -> None:
    global _ARRIVAL
    os.makedirs(dirpath, exist_ok=True)
    tmp = os.path.join(dirpath, f".{name}.tmp")
    with open(tmp, "w") as f:
        for m in messages:
            f.write(f"{_ARRIVAL}\t{m}\n")
            _ARRIVAL += 1
    os.rename(tmp, os.path.join(dirpath, f"{name}.jsonl"))


def test_sequence_state_survives_micro_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_available(msgs, batch_name):
        _write_batch(src, batch_name, msgs)
        raw = read_jsonl_stream(spark, src)
        processed, _ = get_output_streams(raw, streaming=True)
        q = (
            serialize_processed(processed)
            .writeStream.format("text")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # micro-batch 1: user-1 ×2, user-2 ×1
    run_available(
        [
            '{"id":"user-1","type":"a","timestamp":1,"data":{}}',
            '{"id":"user-2","type":"b","timestamp":2,"data":{}}',
            '{"id":"user-1","type":"c","timestamp":3,"data":{}}',
        ],
        "batch1",
    )
    # micro-batch 2 (separate query run, state restored from checkpoint)
    run_available(
        [
            '{"id":"user-1","type":"d","timestamp":4,"data":{}}',
            '{"id":"user-2","type":"e","timestamp":5,"data":{}}',
        ],
        "batch2",
    )

    rows = [
        json.loads(r.value)
        for r in spark.read.text(out_dir).collect()
    ]
    seqs = {(r["originalId"], r["eventType"]): r["sequence"] for r in rows}
    assert seqs == {
        ("user-1", "a"): 1,
        ("user-1", "c"): 2,
        ("user-1", "d"): 3,  # state survived the restart
        ("user-2", "b"): 1,
        ("user-2", "e"): 2,
    }
    # processingDelay invariant (reference asserts >= 0)
    assert all(r["processingDelay"] >= 0 for r in rows)


def test_error_stream_end_to_end(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_batch(src, "b1", ["{broken", '{"id":"u","type":"t","timestamp":1,"data":{}}'])
    raw = read_jsonl_stream(spark, src)
    _, errors = get_output_streams(raw, streaming=True)
    from flink_tank_spark.streaming.jobs import serialize_errors

    q = (
        serialize_errors(errors)
        .writeStream.format("memory")
        .queryName("err_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    vals = [json.loads(r.value) for r in spark.sql("SELECT * FROM err_sink").collect()]
    assert len(vals) == 1
    assert vals[0]["rawMessage"] == "{broken"
    assert vals[0]["errorType"] == "PARSE_ERROR"


def test_stream_dedup_drops_redeliveries_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark state must survive micro-batches:
    a re-delivered event id in a LATER batch (within the watermark
    horizon) is dropped; fresh ids pass."""
    from flink_tank_spark.streaming.dedup import dedup_stream

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_available(msgs, batch_name):
        _write_batch(src, batch_name, msgs)
        raw = read_jsonl_stream(spark, src)
        parsed = raw.select(
            F.get_json_object("value", "$.event_id").alias("event_id"),
            F.to_timestamp(F.get_json_object("value", "$.ts")).alias("ts"),
        )
        deduped = dedup_stream(parsed, ["event_id"], ts_col="ts", delay="1 hour")
        q = (
            deduped.select(F.to_json(F.struct("event_id", "ts")).alias("value"))
            .writeStream.format("text")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def mk(eid, ts):
        return json.dumps({"event_id": eid, "ts": ts})

    run_available(
        [mk("e1", "2024-01-01 10:00:00"), mk("e2", "2024-01-01 10:00:05"),
         mk("e1", "2024-01-01 10:00:07")],  # same-batch duplicate
        "b1",
    )
    run_available(
        [mk("e1", "2024-01-01 10:01:00"),   # cross-batch re-delivery -> dropped
         mk("e3", "2024-01-01 10:01:30")],  # fresh -> kept
        "b2",
    )

    out = []
    for fn in os.listdir(out_dir):
        if fn.startswith("part-"):
            with open(os.path.join(out_dir, fn)) as f:
                out += [json.loads(line) for line in f if line.strip()]
    ids = sorted(e["event_id"] for e in out)
    assert ids == ["e1", "e2", "e3"]
