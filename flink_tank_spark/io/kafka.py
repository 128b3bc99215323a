"""Kafka source/sink helpers (S1/S2, K1/K2) + generic streaming wiring.

Reference wiring: KafkaSource with earliest offsets and value-only string
deserialization (``EventProcessorJob.kt:57-63``, ``AggregationJob.kt:
224-230``); KafkaSink per topic with JSON string values
(``EventProcessorJob.kt:65-74``, ``AggregationJob.kt:233-241``);
checkpointing every 60 s ⇒ at-least-once (SURVEY §2.2) — Structured
Streaming's Kafka sink + checkpointLocation gives the same guarantee.

The Kafka connector jar (spark-sql-kafka) may be absent in offline test
environments; ``kafka_available`` gates it, and the jobs accept any
string-valued source/sink (file JSONL works identically for tests —
sources are interchangeable because topologies are pure functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_CHECKPOINT_INTERVAL = "60 seconds"  # EventProcessorJob.kt:161


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S1/S2: value-only string deserialization + Kafka offset as the
    per-partition arrival order (what Flink's FIFO per-partition order
    provides implicitly)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.col("value").cast("string").alias("value"),
        F.col("offset").alias("arrival"),
    )


def read_jsonl_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-based stand-in source for tests/local runs.

    Format: ``<arrival>\\t<json message>`` per line — the explicit arrival
    number plays the role of the Kafka offset (file sources expose no
    offset, and monotonically_increasing_id is not allowed on streams).
    Raw tab characters cannot appear inside JSON string literals, so the
    delimiter is unambiguous.

    ``max_files_per_trigger`` is the file-source analogue of the Kafka
    source's ``maxOffsetsPerTrigger`` rate limit: it bounds each
    micro-batch, which (a) keeps per-batch state/shuffle memory flat on
    a backlogged source and (b) gives crash-recovery tests a stream
    whose progress is spread over many committed batches.
    """
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    reader = (
        spark.readStream.schema(
            StructType(
                [
                    StructField("arrival", LongType()),
                    StructField("value", StringType()),
                ]
            )
        )
        .options(sep="\t", quote="", escape="")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.csv(path)


def write_kafka_stream(
    json_df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_dir: str,
    query_name: str,
    trigger_interval: str | None = None,
    available_now: bool = False,
):
    """K1/K2: JSON string per record to one topic, checkpointed.

    ``available_now`` drains everything currently in the source then
    stops — the batch-ish mode integration tests use against a real
    broker.
    """
    writer = (
        json_df.select(F.col("value").cast("binary").alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def write_dual_stream(
    source_df: DataFrame,
    split_fn,
    sink_a,
    sink_b,
    checkpoint_dir: str,
    query_name: str,
    available_now: bool = False,
    trigger_interval: str | None = None,
):
    """ONE streaming query feeding TWO sinks via foreachBatch — the
    direct analogue of the reference's single Flink job writing both the
    output and error topics (EventProcessorJob.kt:65-74): the source is
    read ONCE per micro-batch and both writes commit under the same
    checkpoint, instead of two queries each re-reading Kafka with
    independent progress.

    ``split_fn(batch_df) -> (df_a, df_b)``; ``sink_a``/``sink_b`` are
    ``fn(df, batch_id)`` batch writers. The batch is persisted so the
    two sinks don't recompute the (shared) topology.
    """

    def write_both(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            df_a, df_b = split_fn(batch_df)
            sink_a(df_a, batch_id)
            sink_b(df_b, batch_id)
        finally:
            batch_df.unpersist()

    writer = (
        source_df.writeStream.foreachBatch(write_both)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()


def write_jsonl_stream(
    json_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    query_name: str,
    available_now: bool = False,
):
    writer = (
        json_df.writeStream.format("text")
        .option("path", path)
        .option("checkpointLocation", checkpoint_dir)
        .queryName(query_name)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
