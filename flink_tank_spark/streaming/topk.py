"""Streaming-incremental windowed Top-N — Flink's "window TopN" under
continuous ingest.

Same incremental-view recipe as streaming/matview.py: the per-(hour,
user) counts are algebraic (fold by SUM), so each micro-batch lands one
bounded delta (≤ |windows × batch-active users| rows) under
``ingest_batch=<b>`` (replay-idempotent overwrite) and finalize folds
the deltas then runs the SAME top-3 definition the batch query uses
(plans/streaming_batch.hourly_top_users_from_counts) — structural
parity, pinned bit-exact in tests/test_streaming_topk.py across
micro-batch splits, restarts, replay, and compaction.

Only the COUNTS are state; the leaderboard is derived at read time, so
a late event can still reorder an old window correctly — the property
eager per-window top-k materialization loses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.plans.streaming_batch import hourly_top_users_from_counts
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming.sketches import EVENTS_SCHEMA

TOPN_SUBDIR = "topn_state"


def counts_delta(batch_df: DataFrame) -> DataFrame:
    """The micro-batch's (window_start, user_id, n_events) delta —
    the same window assignment as the batch query."""
    return (
        batch_df.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events")
    )


def incremental_topn_sink(state_dir: str):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        counts_delta(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, TOPN_SUBDIR, part)
        )

    return write


def _folded_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, TOPN_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no top-N state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return state.groupBy("window_start", "user_id").agg(
        F.sum("n_events").alias("n_events")
    )


def load_top_users(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the count deltas and derive the per-window top-3 — equal to
    ev_hourly_top_users over the union of everything ingested."""
    return hourly_top_users_from_counts(_folded_counts(spark, state_dir))


def compact(spark: SparkSession, state_dir: str) -> None:
    """Fold the count state into ONE merged partition via the
    crash-safe hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, TOPN_SUBDIR)
    compaction.recover(base)
    merged = _folded_counts(spark, state_dir)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_topn_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming windowed-Top-N maintenance over a jsonl event stream."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_topn_sink(state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-topn")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
