"""The full two-job streaming chain: producer wire → Job 1 → Job 2.

The reference's complete dataflow is two independently-deployed Flink
jobs chained through Kafka topics: the event processor consumes
``input-events`` and produces ``output-results`` + ``error-events``
(``EventProcessorJob.kt:50-52``), and the aggregation job consumes
``output-results`` and produces ``aggregated-metrics``
(``AggregationJob.kt:214-215``). This module is that deployment as two
checkpointed Structured Streaming queries:

- **Job 1** (:func:`start_processor_job`): wire source → parse/route →
  stateful per-key sequence → enrich → serialize, ONE query feeding the
  processed and error sinks through a shared checkpoint
  (io/kafka.write_dual_stream — the K1/K2 dual-topic parity).
- **Job 2** (:func:`start_aggregation_job`): Job-1's processed output →
  lenient parse (failures silently dropped — the reference's error-path
  asymmetry, AggregationJob.kt:246-256) → timer-based sliding-window
  heartbeat aggregator (streaming/heartbeat.py) → metrics sink.

Transport: with a broker, both hops are Kafka (io/kafka.py) and the
chain is at-least-once per hop, exactly like the reference (SURVEY §7.4
pt 7). Without one, the hop is a directory of text files written by
:func:`idempotent_wire_sink` — per-micro-batch DETERMINISTIC file names,
so a replayed (uncommitted) batch rewrites the same file instead of
minting a new one. Structured Streaming's file source tracks inputs by
name, which upgrades the file hop to effectively exactly-once and makes
the chain test's parity assertion strict instead of duplicate-tolerant.
The sink coalesces each micro-batch to one file — matching the
reference's operating point (≤10 msg/s out) and keeping the name set
deterministic; a high-throughput deployment would use the Kafka hop,
not this shim.

Cadence defaults mirror the reference: 60 s checkpoint intervals
(EventProcessorJob.kt:161), 10 min window / 5 s emit (AggregationJob.kt:
53-54). Tests shrink all three to keep wall-clock short.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from flink_tank_spark.io.kafka import (
    DEFAULT_CHECKPOINT_INTERVAL,
    read_jsonl_stream,
    write_dual_stream,
)
from flink_tank_spark.streaming.heartbeat import (
    EMIT_EVERY_MS,
    WINDOW_MS,
    sliding_metrics_heartbeat,
)
from flink_tank_spark.streaming.jobs import (
    get_tagged_output_stream,
    parse_processed_events,
    serialize_metrics,
    split_tagged,
)


def idempotent_wire_sink(dirpath: str, fanout: int = 1):
    """foreachBatch writer: land a micro-batch of ``value`` strings as
    deterministically-named text files — ``batch-<id>.txt`` at the
    default ``fanout=1``, else ``batch-<id>-<part>.txt`` × ``fanout``.

    ``fanout`` exists because a one-file batch serializes the whole
    micro-batch write through a single task (profiled: the chained
    two-job bench spent most of Job-1 in that one writer task). With
    ``fanout > 1`` the batch is HASH-partitioned on the payload value —
    a pure function of content, so a replayed batch reproduces the
    identical file set (round-robin repartition would not) — and each
    non-empty part lands under a name derived from its partition index.

    Replay safety (the foreachBatch idempotency contract from the Spark
    docs, keyed on ``batch_id``): the batch is written distributed to a
    scratch dir, then each part file is renamed over its final name — a
    same-filesystem atomic replace PER FILE. Atomicity is per-file, not
    per-batch: at ``fanout=1`` a batch that died before its single
    rename left nothing visible; at ``fanout > 1`` a crash mid-loop can
    expose a PARTIAL batch to the downstream file source. Exactly-once
    still holds: names and contents are pure functions of batch content
    (hash partitioning on value), a replayed batch reproduces the same
    row set (its input files and rolled-back state are the same) and so
    re-lands byte-identical files, completing the set — and downstream
    file sources, which track files by NAME, never double-read the
    already-landed ones.

    DEPLOYMENT CONSTRAINT: the rename runs DRIVER-side with ``os``
    calls, so the path must be a POSIX filesystem visible to both the
    driver and every executor — local mode (this repo's test/bench
    setup) or a shared mount (NFS). It is NOT valid for object-store
    paths (s3a://, gs://, …); a real cluster uses the Kafka hop
    (io/kafka.py), not this shim. Guarded two ways below: URI schemes
    are rejected up front, and a scratch dir the driver cannot see
    (executors wrote to non-shared storage) fails loudly instead of
    silently landing nothing.
    """
    for prefix in ("s3://", "s3a://", "s3n://", "gs://", "abfs://",
                   "abfss://", "wasb://", "hdfs://"):
        if dirpath.startswith(prefix):
            raise ValueError(
                f"idempotent_wire_sink requires a driver-visible POSIX path, "
                f"got {dirpath!r}; use the Kafka hop (io/kafka.py) on a cluster"
            )
    os.makedirs(dirpath, exist_ok=True)

    from pyspark.sql import functions as F

    def write(df: DataFrame, batch_id: int) -> None:
        scratch = os.path.join(dirpath, f"_scratch-{uuid.uuid4().hex}")
        shaped = (
            df.repartition(fanout, F.col("value")) if fanout > 1 else df.coalesce(1)
        )
        shaped.write.mode("overwrite").text(scratch)
        if not os.path.isdir(scratch):
            raise RuntimeError(
                f"executors wrote {scratch!r} but the driver cannot see it: "
                "idempotent_wire_sink needs a shared POSIX filesystem "
                "(local mode or NFS); use the Kafka hop on a real cluster"
            )
        parts = sorted(
            f
            for f in os.listdir(scratch)
            if f.startswith("part-")
            and os.path.getsize(os.path.join(scratch, f)) > 0
        )
        # empty batches/partitions write 0-byte parts — don't land them.
        # Spark names task outputs part-NNNNN-...; NNNNN is the partition
        # index, which is content-deterministic under hash partitioning,
        # so a replayed batch reproduces the identical final-name set.
        for p in parts:
            idx = int(p.split("-")[1])
            final = (
                f"batch-{batch_id:08d}.txt"
                if fanout == 1
                else f"batch-{batch_id:08d}-{idx:04d}.txt"
            )
            os.replace(os.path.join(scratch, p), os.path.join(dirpath, final))
        for f in os.listdir(scratch):
            os.remove(os.path.join(scratch, f))
        os.rmdir(scratch)

    return write


def start_processor_job(
    spark: SparkSession,
    source_dir: str,
    processed_dir: str,
    errors_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    trigger_interval: str | None = DEFAULT_CHECKPOINT_INTERVAL,
    available_now: bool = False,
    wire_fanout: int = 1,
):
    """Job 1 over the file wire: one checkpointed dual-sink query.

    ``wire_fanout`` > 1 parallelizes the processed-side wire write (see
    idempotent_wire_sink) — the chain-throughput knob; errors stay
    single-file (the reference's error topic is low-volume by design).
    """
    raw = read_jsonl_stream(spark, source_dir, max_files_per_trigger)
    tagged = get_tagged_output_stream(raw, streaming=True)
    return write_dual_stream(
        tagged,
        split_tagged,
        idempotent_wire_sink(processed_dir, fanout=wire_fanout),
        idempotent_wire_sink(errors_dir),
        checkpoint_dir,
        "processor-job",
        available_now=available_now,
        trigger_interval=None if available_now else trigger_interval,
    )


def start_aggregation_job(
    spark: SparkSession,
    processed_dir: str,
    metrics_dir: str,
    checkpoint_dir: str,
    window_ms: int = WINDOW_MS,
    emit_every_ms: int = EMIT_EVERY_MS,
    trigger_interval: str | None = None,
    max_files_per_trigger: int | None = None,
    event_time: bool = False,
    watermark: str = "1 minute",
):
    """Job 2 over the file wire: parse → sliding aggregation → metrics
    file sink.

    Two aggregation modes, selectable per deployment:

    - **heartbeat** (default): the reference-parity PROCESSING-TIME
      aggregator (streaming/heartbeat.py) — emits every ``emit_every_ms``
      including zero-count heartbeats, timers aligned like
      AggregationJob.kt. State is bounded by the window length.
    - **event_time=True**: the idiomatic Structured Streaming form the
      reference's own docs name as the alternative (AggregationJob.kt:
      30-46 discusses event-time windows): watermark + built-in
      ``window()`` in APPEND mode — each window emits exactly once when
      the watermark passes it, late events beyond ``watermark`` are
      dropped, and closed-window state is EVICTED (the property that
      bounds state at 100 TB). The event time is the ORIGINAL event's
      epoch-millis timestamp, which Job-1's enrichment spliced into
      ``enrichedData.original_timestamp`` (operators/enrich.py) — the
      only place the reference's ProcessedEvent carries it
      (Events.kt:10-17 has no event-time field).

    The metrics sink is Structured Streaming's native text sink —
    manifest-committed per micro-batch, so readers see each metric
    exactly once across restarts of THIS query.
    """
    from pyspark.sql import functions as F

    from flink_tank_spark.operators.aggregate import sliding_metrics_watermarked

    os.makedirs(processed_dir, exist_ok=True)  # source dir may not exist yet
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.text(processed_dir)
    parsed = parse_processed_events(raw)
    if event_time:
        ev_ts = F.timestamp_millis(
            F.get_json_object("enrichedData", "$.original_timestamp").cast("long")
        )
        # explicit malformed-row policy (mirrors the parse path's
        # corrupt-record filter): a NULL eventTime would land in a null
        # window group that never crosses the watermark in append mode —
        # silently never emitted, state never evicted. Drop it up front.
        metrics = sliding_metrics_watermarked(
            parsed.withColumn("eventTime", ev_ts).filter(ev_ts.isNotNull()),
            window_size=f"{window_ms} milliseconds",
            slide=f"{emit_every_ms} milliseconds",
            watermark=watermark,
        )
        out_mode = "append"
    else:
        metrics = sliding_metrics_heartbeat(
            parsed, window_ms=window_ms, emit_every_ms=emit_every_ms
        )
        out_mode = "append"
    writer = (
        serialize_metrics(metrics)
        .writeStream.format("text")
        .outputMode(out_mode)
        .option("path", metrics_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("aggregation-job")
    )
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def main(argv: list[str] | None = None) -> None:
    """Run the whole chain (both jobs, one driver) over the file wire.

    The reference deploys the two jobs separately (two Flink clusters);
    with a broker, use jobs/event_processor.py + jobs/aggregation.py the
    same way. This entrypoint is the broker-less single-driver form —
    the same two checkpointed queries the chain test kills/restarts.
    """
    import argparse

    from flink_tank_spark.session import get_spark

    ap = argparse.ArgumentParser(description="Two-job streaming chain (file wire)")
    ap.add_argument("--source", required=True, help="wire-format input dir")
    ap.add_argument("--out", required=True, help="output root (processed/errors/metrics)")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--trigger", default=DEFAULT_CHECKPOINT_INTERVAL)
    ap.add_argument(
        "--event-time",
        action="store_true",
        help="Job 2 uses watermarked event-time windows (append mode) "
        "instead of the processing-time heartbeat",
    )
    ap.add_argument("--wire-fanout", type=int, default=1)
    args = ap.parse_args(argv)

    spark = get_spark("pipeline")
    q1 = start_processor_job(
        spark,
        args.source,
        f"{args.out}/processed",
        f"{args.out}/errors",
        f"{args.checkpoint_dir}/job1",
        trigger_interval=args.trigger,
        wire_fanout=args.wire_fanout,
    )
    q2 = start_aggregation_job(
        spark,
        f"{args.out}/processed",
        f"{args.out}/metrics",
        f"{args.checkpoint_dir}/job2",
        trigger_interval=args.trigger,
        event_time=args.event_time,
    )
    q1.awaitTermination()
    q2.awaitTermination()


if __name__ == "__main__":
    main()
