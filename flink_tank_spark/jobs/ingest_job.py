"""Streaming ingest → partitioned parquet lake (the landing-zone job).

The pipeline step the batch analytics in ``plans/`` assume has already
happened: raw JSON event streams land as date-partitioned parquet with
exactly-once file-sink semantics (Structured Streaming's file sink
commits atomically per micro-batch via its transaction log, so restarts
never duplicate or lose a batch).

Scale notes:
- partitionBy(event_date) ⇒ downstream date filters become partition
  PRUNING (directories skipped, `tests/test_io_layout.py`).
- the parse is the same lenient topology as Job 1 (operators/parse.py);
  unparseable lines land in an errors/ subdirectory, nothing is dropped.

Usage:
    python -m flink_tank_spark.jobs.ingest_job \\
        --source /data/raw-events --lake /lake/events \\
        --checkpoint-dir /chk/ingest [--once]
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_tank_spark.io.kafka import read_jsonl_stream
from flink_tank_spark.operators.parse import parse_and_route
from flink_tank_spark.session import get_spark


def ingest_stream(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid events with event_date partition column, error records)."""
    valid, errors = parse_and_route(raw)
    landed = valid.select(
        "id",
        "type",
        "timestamp",
        F.col("data").alias("data_json"),
        "arrival",
        F.to_date(F.timestamp_millis(F.col("timestamp"))).alias("event_date"),
    )
    return landed, errors


def start_ingest(
    spark,
    source_dir: str,
    lake_dir: str,
    checkpoint_dir: str,
    once: bool = False,
    max_files_per_trigger: int | None = None,
):
    raw = read_jsonl_stream(spark, source_dir, max_files_per_trigger)
    landed, errors = ingest_stream(raw)
    w1 = (
        landed.writeStream.format("parquet")
        .option("path", f"{lake_dir}/events")
        .option("checkpointLocation", f"{checkpoint_dir}/events")
        .partitionBy("event_date")
        .queryName("ingest-events")
    )
    w2 = (
        errors.writeStream.format("parquet")
        .option("path", f"{lake_dir}/errors")
        .option("checkpointLocation", f"{checkpoint_dir}/errors")
        .queryName("ingest-errors")
    )
    if once:
        w1 = w1.trigger(availableNow=True)
        w2 = w2.trigger(availableNow=True)
    return w1.start(), w2.start()


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="Streaming ingest to parquet lake")
    ap.add_argument("--source", required=True, help="raw jsonl stream directory")
    ap.add_argument("--lake", required=True, help="parquet lake root")
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--once", action="store_true", help="drain available input and stop")
    args = ap.parse_args(argv)

    spark = get_spark("ingest")
    q1, q2 = start_ingest(spark, args.source, args.lake, args.checkpoint_dir, once=args.once)
    q1.awaitTermination()
    q2.awaitTermination()


if __name__ == "__main__":
    main()
