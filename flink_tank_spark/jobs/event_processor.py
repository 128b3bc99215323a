"""Job 1 entrypoint: Kafka → parse/route/enrich → Kafka (+ error topic).

Mirrors the reference job's config surface (``EventProcessorJob.kt:48-53``
ParameterTool args; K8s wiring ``k8s/flink/event-processor-job.yaml:27-38``)
on Structured Streaming: two queries off one source — the stateful
sequence requires running inside the streaming query, and Kafka re-reads
are the idiomatic Spark replacement for Flink side outputs (SURVEY §2.5).
Checkpointing gives the same at-least-once contract (SURVEY §2.2).

Usage:
    spark-submit -m event_processor \\
        --brokers kafka:9092 --input-topic input-events \\
        --output-topic output-results --error-topic error-events \\
        --checkpoint-dir /chk/event-processor
"""

from __future__ import annotations

import argparse

from flink_tank_spark.io.kafka import (
    DEFAULT_CHECKPOINT_INTERVAL,
    read_kafka_stream,
    write_kafka_stream,
)
from flink_tank_spark.session import get_spark
from flink_tank_spark.streaming.jobs import (
    get_output_streams,
    serialize_errors,
    serialize_processed,
)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="Event Processor Job (Spark)")
    ap.add_argument("--brokers", default="localhost:9092")
    ap.add_argument("--input-topic", default="input-events")
    ap.add_argument("--output-topic", default="output-results")
    ap.add_argument("--error-topic", default="error-events")
    ap.add_argument("--checkpoint-dir", required=True)
    # 60 s micro-batch cadence = the reference's checkpoint interval
    # (EventProcessorJob.kt:161); each micro-batch commit checkpoints,
    # so the trigger interval IS the at-least-once commit cadence.
    ap.add_argument("--trigger-interval", default=DEFAULT_CHECKPOINT_INTERVAL)
    # one query + one checkpoint feeding both topics (reference shape:
    # a single job owns both sinks) instead of two independent queries
    ap.add_argument("--dual-sink", action="store_true")
    args = ap.parse_args(argv)

    spark = get_spark("event-processor")
    raw = read_kafka_stream(spark, args.brokers, args.input_topic)

    if args.dual_sink:
        from flink_tank_spark.io.kafka import write_dual_stream
        from flink_tank_spark.streaming.jobs import get_tagged_output_stream, split_tagged

        def kafka_batch_sink(topic: str):
            def write(df, batch_id):
                (
                    df.selectExpr("CAST(value AS BINARY) AS value")
                    .write.format("kafka")
                    .option("kafka.bootstrap.servers", args.brokers)
                    .option("topic", topic)
                    .save()
                )
            return write

        q = write_dual_stream(
            get_tagged_output_stream(raw, streaming=True),
            split_tagged,
            kafka_batch_sink(args.output_topic),
            kafka_batch_sink(args.error_topic),
            f"{args.checkpoint_dir}/dual",
            "event-processor-dual",
            trigger_interval=args.trigger_interval,
        )
        q.awaitTermination()
        return

    processed, errors = get_output_streams(raw, streaming=True)

    q1 = write_kafka_stream(
        serialize_processed(processed),
        args.brokers,
        args.output_topic,
        f"{args.checkpoint_dir}/processed",
        "event-processor-main",
        trigger_interval=args.trigger_interval,
    )
    q2 = write_kafka_stream(
        serialize_errors(errors),
        args.brokers,
        args.error_topic,
        f"{args.checkpoint_dir}/errors",
        "event-processor-errors",
        trigger_interval=args.trigger_interval,
    )
    spark.streams.awaitAnyTermination()
    q1.stop(), q2.stop()


if __name__ == "__main__":
    main()
