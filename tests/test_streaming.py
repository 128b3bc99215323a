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


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermark-bounded stream-stream inner join: clicks attribute to a
    view of the same user within 10 minutes; out-of-window or other-user
    clicks don't match."""
    from flink_tank_spark.streaming.joins import stream_interval_join

    views_dir = str(tmp_path / "views")
    clicks_dir = str(tmp_path / "clicks")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def mk(dirpath, name, rows):
        _write_batch(dirpath, name, [json.dumps(r) for r in rows])

    mk(views_dir, "v1", [
        {"user": "u1", "view_ts": "2024-01-01 10:00:00"},
        {"user": "u2", "view_ts": "2024-01-01 10:00:00"},
    ])
    mk(clicks_dir, "c1", [
        {"user": "u1", "click_ts": "2024-01-01 10:05:00"},   # in window
        {"user": "u1", "click_ts": "2024-01-01 10:20:00"},   # too late
        {"user": "u3", "click_ts": "2024-01-01 10:01:00"},   # no view
    ])

    views = read_jsonl_stream(spark, views_dir).select(
        F.get_json_object("value", "$.user").alias("user"),
        F.to_timestamp(F.get_json_object("value", "$.view_ts")).alias("view_ts"),
    )
    clicks = read_jsonl_stream(spark, clicks_dir).select(
        F.get_json_object("value", "$.user").alias("user"),
        F.to_timestamp(F.get_json_object("value", "$.click_ts")).alias("click_ts"),
    )
    joined = stream_interval_join(
        views, clicks, key="user", left_ts="view_ts", right_ts="click_ts"
    )
    q = (
        joined.select(F.to_json(F.struct("user", "view_ts", "click_ts")).alias("value"))
        .writeStream.format("text")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    out = []
    for fn in os.listdir(out_dir):
        if fn.startswith("part-"):
            with open(os.path.join(out_dir, fn)) as f:
                out += [json.loads(line) for line in f if line.strip()]
    assert [(e["user"], e["click_ts"]) for e in out] == [("u1", "2024-01-01T10:05:00.000Z")]


def test_sequence_tws_matches_legacy_state_api(spark, tmp_path):
    """transformWithStateInPandas sequence == applyInPandasWithState
    sequence, including state carried across micro-batches."""
    import pytest

    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState control channel needs protobuf "
        "(shipped on real clusters, absent in this offline container)",
    )
    from flink_tank_spark.operators.parse import parse_and_route
    from flink_tank_spark.streaming.sequence import with_sequence_stream
    from flink_tank_spark.streaming.sequence_tws import with_sequence_stream_tws

    msgs1 = [
        '{"id":"user-1","type":"a","timestamp":1,"data":{}}',
        '{"id":"user-2","type":"b","timestamp":2,"data":{}}',
        '{"id":"user-1","type":"c","timestamp":3,"data":{}}',
    ]
    msgs2 = [
        '{"id":"user-1","type":"d","timestamp":4,"data":{}}',
        '{"id":"user-2","type":"e","timestamp":5,"data":{}}',
    ]

    def run(variant, seq_fn):
        src = str(tmp_path / f"in-{variant}")
        ckpt = str(tmp_path / f"ckpt-{variant}")
        out_dir = str(tmp_path / f"out-{variant}")
        for name, msgs in (("b1", msgs1), ("b2", msgs2)):
            _write_batch(src, name, msgs)
            raw = read_jsonl_stream(spark, src)
            valid, _ = parse_and_route(raw)
            seq = seq_fn(valid.select("id", "type", "timestamp", "data", "arrival"))
            q = (
                seq.select(F.to_json(F.struct("id", "type", "sequence")).alias("value"))
                .writeStream.format("text")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        out = []
        for fn in os.listdir(out_dir):
            if fn.startswith("part-"):
                with open(os.path.join(out_dir, fn)) as f:
                    out += [json.loads(line) for line in f if line.strip()]
        return sorted((e["id"], e["type"], e["sequence"]) for e in out)

    legacy = run("legacy", with_sequence_stream)
    tws = run("tws", with_sequence_stream_tws)
    assert legacy == tws
    assert legacy == [
        ("user-1", "a", 1), ("user-1", "c", 2), ("user-1", "d", 3),
        ("user-2", "b", 1), ("user-2", "e", 2),
    ]


def test_dual_sink_foreachbatch_routes_both_outputs(spark, tmp_path):
    """One query + one checkpoint feeding both sinks (foreachBatch dual
    write): processed and error records land in their own sinks with the
    stateful sequence intact across micro-batches."""
    from flink_tank_spark.io.kafka import write_dual_stream
    from flink_tank_spark.streaming.jobs import get_tagged_output_stream, split_tagged

    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    ok_dir = str(tmp_path / "ok")
    err_dir = str(tmp_path / "err")
    os.makedirs(ok_dir), os.makedirs(err_dir)

    def text_sink(dirpath):
        def write(df, batch_id):
            rows = [r.value for r in df.collect()]
            if rows:
                with open(os.path.join(dirpath, f"b{batch_id}.jsonl"), "a") as f:
                    f.write("\n".join(rows) + "\n")
        return write

    def run_available(msgs, name):
        _write_batch(src, name, msgs)
        raw = read_jsonl_stream(spark, src)
        q = write_dual_stream(
            get_tagged_output_stream(raw, streaming=True),
            split_tagged,
            text_sink(ok_dir),
            text_sink(err_dir),
            ckpt,
            f"dual-{name}",
            available_now=True,
        )
        q.awaitTermination(120)

    run_available(
        ['{"id":"user-1","type":"a","timestamp":1,"data":{}}',
         "{not json",
         '{"id":"user-1","type":"b","timestamp":2,"data":{}}'],
        "b1",
    )
    run_available(
        ['{"id":"user-1","type":"c","timestamp":3,"data":{}}'],
        "b2",
    )

    def read_dir(d):
        out = []
        for fn in sorted(os.listdir(d)):
            with open(os.path.join(d, fn)) as f:
                out += [json.loads(line) for line in f if line.strip()]
        return out

    ok = read_dir(ok_dir)
    err = read_dir(err_dir)
    assert [(e["originalId"], e["sequence"]) for e in sorted(ok, key=lambda e: e["sequence"])] == [
        ("user-1", 1), ("user-1", 2), ("user-1", 3),
    ]
    assert len(err) == 1 and err[0]["rawMessage"] == "{not json"


def test_ingest_job_lands_partitioned_parquet(spark, tmp_path):
    """Ingest job: raw jsonl stream -> date-partitioned parquet with
    exactly-once file-sink semantics across restarts (second availableNow
    run must not duplicate batch-1 rows)."""
    from flink_tank_spark.jobs.ingest_job import start_ingest

    src = str(tmp_path / "raw")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    def run(msgs, name):
        _write_batch(src, name, msgs)
        q1, q2 = start_ingest(spark, src, lake, ckpt, once=True)
        q1.awaitTermination(120)
        q2.awaitTermination(120)

    # ts 1700000000000 -> 2023-11-14; 1700100000000 -> 2023-11-16
    run(
        ['{"id":"u1","type":"click","timestamp":1700000000000,"data":{}}',
         '{"id":"u2","type":"view","timestamp":1700200000000,"data":{}}',
         "{nope"],
        "b1",
    )
    run(
        ['{"id":"u1","type":"view","timestamp":1700000001000,"data":{}}'],
        "b2",
    )

    events = spark.read.parquet(f"{lake}/events")
    assert events.count() == 3  # no duplicates from the restart
    dates = {str(r.event_date) for r in events.select("event_date").distinct().collect()}
    assert dates == {"2023-11-14", "2023-11-17"}
    # partition pruning works on the landed layout
    pruned = events.filter(F.col("event_date") == "2023-11-14")
    assert pruned.count() == 2
    errors = spark.read.parquet(f"{lake}/errors")
    assert errors.count() == 1


def test_hll_registers_as_streaming_state(spark, tmp_path):
    """The HLL register table works as STREAMING state: max-per-register
    is an algebraic aggregate Structured Streaming maintains in its
    state store, so after any number of micro-batches the emitted
    registers (and hence estimates) are bit-identical to the batch
    sketch over all rows seen — distinct-count state stays bounded at
    groups x 256 rows no matter how many events arrive."""
    import json
    import os

    from flink_tank_spark.operators import sketch

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(src)
    batch1 = [("click", f"u{i}:d1") for i in range(300)]
    batch2 = [("click", f"u{i}:d2") for i in range(200)] + [
        ("view", f"u{i}:d1") for i in range(150)
    ]

    def write_batch(rows):
        name = os.path.join(src, f"b{len(os.listdir(src))}.jsonl")
        with open(name, "w") as f:
            for et, ud in rows:
                f.write(json.dumps({"event_type": et, "user_day": ud}) + "\n")

    def run_stream():
        stream = spark.readStream.schema("event_type string, user_day string").json(src)
        q = (
            sketch.hll_registers(stream, "user_day", ["event_type"])
            .writeStream.format("memory")
            .queryName("hll_stream_regs")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r.event_type, r.register): r.rho
            for r in spark.table("hll_stream_regs").collect()
        }

    def batch_regs(rows):
        df = spark.createDataFrame(rows, ["event_type", "user_day"])
        return {
            (r.event_type, r.register): r.rho
            for r in sketch.hll_registers(df, "user_day", ["event_type"]).collect()
        }

    write_batch(batch1)
    assert run_stream() == batch_regs(batch1)

    # second micro-batch: the restarted query resumes from the same
    # checkpoint and only the register STATE carries history forward
    write_batch(batch2)
    streamed = run_stream()
    assert streamed == batch_regs(batch1 + batch2)
    assert len(streamed) <= 2 * 256  # bounded: groups x registers


def test_histogram_as_streaming_state(spark, tmp_path):
    """Like the HLL registers, the fixed-precision histogram is an
    algebraic aggregate (count per bin): the same fp_histogram transform
    runs on a streaming DataFrame with state bounded at groups x bins,
    and after checkpointed restarts across micro-batches the emitted
    bins equal the batch histogram over all rows seen."""
    import json
    import os

    from flink_tank_spark.operators import sketch

    src, ckpt = str(tmp_path / "in"), str(tmp_path / "ck")
    os.makedirs(src)
    batch1 = [("a", round(0.01 * (i % 50), 2)) for i in range(400)]
    batch2 = [("a", round(0.01 * (i % 30), 2)) for i in range(300)]

    def write_batch(rows):
        name = os.path.join(src, f"b{len(os.listdir(src))}.jsonl")
        with open(name, "w") as f:
            for g, v in rows:
                f.write(json.dumps({"g": g, "value": v}) + "\n")

    def run_stream():
        stream = spark.readStream.schema("g string, value double").json(src)
        q = (
            sketch.fp_histogram(stream, "value", ["g"])
            .writeStream.format("memory")
            .queryName("hist_stream")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {(r.g, r.bin): r.n for r in spark.table("hist_stream").collect()}

    def batch_hist(rows):
        df = spark.createDataFrame(rows, ["g", "value"])
        return {
            (r.g, r.bin): r.n
            for r in sketch.fp_histogram(df, "value", ["g"]).collect()
        }

    write_batch(batch1)
    assert run_stream() == batch_hist(batch1)
    write_batch(batch2)
    assert run_stream() == batch_hist(batch1 + batch2)
