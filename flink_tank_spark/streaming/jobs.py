"""Job topologies — pure DataFrame→DataFrame functions + streaming wiring.

Mirrors the reference's key design split (SURVEY §3.3): topology is a
pure function from input stream(s) to output stream(s), separable from
sources and sinks (``EventProcessorJob.getOutputStreams``,
``EventProcessorJob.kt:130-143``), so the SAME transform code runs in
batch pytest golden tests and in the streaming mains.

Job 1 (Event Processor, EventProcessorJob.kt:156-177):
    raw strings → parse/route → per-key sequence + enrich
    → (processed JSON, error JSON)

Job 2 (Aggregation, AggregationJob.kt:208-275):
    processed JSON → parse (failures silently dropped — the reference's
    error-path asymmetry, AggregationJob.kt:246-256; do NOT route) →
    sliding window metrics → JSON
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_tank_spark.operators.aggregate import (
    sliding_metrics,
    sliding_metrics_single_agg,
)
from flink_tank_spark.operators.enrich import enrich
from flink_tank_spark.operators.parse import parse_and_route
from flink_tank_spark.schemas import PROCESSED_EVENT_SCHEMA


def get_output_streams(
    raw_df: DataFrame,
    now: Column | None = None,
    order_by: list[str] | None = None,
    streaming: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Job 1 topology: raw strings → (ProcessedEvents, ErrorEvents).

    Batch mode assigns sequences with ``row_number`` over ``order_by``;
    streaming mode threads the stateful per-key counter
    (streaming/sequence.py) through the same enrichment projection.
    """
    valid, errors = parse_and_route(raw_df, now=now)
    if streaming:
        from flink_tank_spark.streaming.sequence import with_sequence_stream

        if "arrival" not in valid.columns:
            raise ValueError("streaming mode requires an 'arrival' order column")
        sequenced = with_sequence_stream(valid.select("id", "type", "timestamp", "data", "arrival"))
        processed = enrich(sequenced, now=now, sequence=F.col("sequence"))
    else:
        processed = enrich(valid, now=now, order_by=order_by)
    return processed, errors


def serialize_processed(processed: DataFrame) -> DataFrame:
    """M3: ProcessedEvent → one JSON string column ``value``.

    ``enrichedData`` is a raw JSON object string; ``parse_json`` lifts it
    to a VARIANT so ``to_json`` embeds it as a nested OBJECT (with its
    original value types), not a quoted string — byte-compatible with the
    reference's Jackson output (EventProcessorJob.kt:147-151).
    """
    return processed.select(
        F.to_json(
            F.struct(
                "originalId",
                "eventType",
                "processedAt",
                "processingDelay",
                F.parse_json(F.col("enrichedData")).alias("enrichedData"),
                "sequence",
            )
        ).alias("value")
    )


def get_tagged_output_stream(raw_df: DataFrame, streaming: bool = True) -> DataFrame:
    """Both Job-1 outputs as ONE tagged stream (columns: value, tag) for
    the foreachBatch dual-sink path (io/kafka.write_dual_stream): the
    stateful sequence stays inside the streaming query (state must
    persist across micro-batches), the union carries processed ('ok')
    and error ('err') records together, and a single checkpoint commits
    both sinks' progress atomically — the closest Spark analogue of the
    reference's one job writing two topics (EventProcessorJob.kt:65-74).
    """
    processed, errors = get_output_streams(raw_df, streaming=streaming)
    return serialize_processed(processed).withColumn("tag", F.lit("ok")).unionByName(
        serialize_errors(errors).withColumn("tag", F.lit("err"))
    )


def split_tagged(batch_df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """foreachBatch splitter for get_tagged_output_stream batches."""
    ok = batch_df.filter(F.col("tag") == "ok").select("value")
    err = batch_df.filter(F.col("tag") == "err").select("value")
    return ok, err


def serialize_errors(errors: DataFrame) -> DataFrame:
    return errors.select(
        F.to_json(F.struct("rawMessage", "errorType", "errorMessage", "timestamp")).alias("value")
    )


def serialize_metrics(metrics: DataFrame) -> DataFrame:
    return metrics.select(
        F.to_json(
            F.struct(
                "userId",
                "windowStart",
                "windowEnd",
                "totalEventCount",
                F.parse_json(F.col("eventTypeCounts")).alias("eventTypeCounts"),
            )
        ).alias("value")
    )


def parse_processed_events(raw_df: DataFrame, value_col: str = "value") -> DataFrame:
    """Job 2's M1/F1/M2: parse ProcessedEvent JSON, silently dropping
    failures (corrupt marker ⇔ Jackson throw → null → filter;
    AggregationJob.kt:246-257). No error routing — the reference's
    error-path asymmetry, preserved deliberately (SURVEY §7.4 pt 5)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from flink_tank_spark.schemas import CORRUPT_COL

    schema = StructType(
        list(PROCESSED_EVENT_SCHEMA.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    parsed = raw_df.select(
        F.from_json(
            F.col(value_col),
            schema,
            {"columnNameOfCorruptRecord": CORRUPT_COL, "mode": "PERMISSIVE"},
        ).alias("p")
    )
    return (
        parsed.filter(
            F.col(f"p.{CORRUPT_COL}").isNull() & F.col("p.originalId").isNotNull()
        )
        .select("p.*")
        .drop(CORRUPT_COL)
    )


def get_aggregation_stream(
    processed_df: DataFrame,
    ts_col: str = "eventTime",
    streaming: bool = False,
    window_size: str = "10 minutes",
    slide: str = "5 seconds",
) -> DataFrame:
    """Job 2 topology: ProcessedEvents (+ an event-time column) →
    AggregatedMetrics. Streaming uses the single-aggregation variant."""
    fn = sliding_metrics_single_agg if streaming else sliding_metrics
    return fn(
        processed_df,
        key_col="originalId",
        type_col="eventType",
        ts_col=ts_col,
        window_size=window_size,
        slide=slide,
    )
