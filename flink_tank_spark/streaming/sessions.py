"""Streaming-incremental sessionization — session windows under
continuous, out-of-order ingest, with exact batch parity.

Two surfaces:

1. **Summary-fold twin (exact, derive-at-read)** — the repo's
   incremental-view recipe applied to session windows. The key fact:
   a session SUMMARY (user, first_ts, last_ts, n_events) is a lossless
   merge token. Within a summary every consecutive event pair is ≤ gap
   apart (that is what made it one session), and its endpoints are real
   event times — so the sessions of a UNION of event sets equal
   gaps-and-islands re-run over the combined summaries' endpoints:
   summaries merge iff first_ts − running_max(last_ts) ≤ gap, counts
   add. Each micro-batch therefore lands only its own sessions
   (bounded: ≤ batch events, typically ≪) under ``ingest_batch=<b>``
   (replay-idempotent overwrite); the view folds all summaries through
   one per-user window pass and emits exactly
   plans/streaming_batch.ev_sessionize over everything ingested —
   bit-equal under ANY batch split, including time-interleaved splits
   where a late batch BRIDGES two previously-separate sessions into
   one (the correctness property eager session emission loses).

2. **Native watermarked session_window job** — Spark's built-in
   streaming sessionization (`groupBy(session_window(...))` + watermark,
   append mode): sessions emit FINALIZED once the watermark passes
   their close. This is the at-scale operational mode (bounded state,
   state eviction by watermark); its emit-once semantics are pinned in
   tests (a drained session emits exactly the batch row; the tail
   session past the final watermark stays buffered, by design).

Scale shape: the per-batch step is Spark's native session_window over
the batch (partition-local after one shuffle on user); fold state is
session summaries, not events; the fold window partitions on user_id —
bounded per-user rows, no global sort. Compaction folds summary deltas
into merged sessions, after which the state is exactly one row per
closed session.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming.sketches import EVENTS_SCHEMA

SESSIONS_SUBDIR = "session_state"
GAP = "30 minutes"
GAP_SECONDS = 30 * 60


def session_summaries(events: DataFrame) -> DataFrame:
    """The batch's own sessions as merge tokens (user_id, s_start,
    s_end, n_events) — native session_window does the partition-local
    sessionization; endpoints are real event times (NOT window.end,
    which is last_ts + gap)."""
    return (
        events.groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "s_start", "s_end", "n_events")
    )


def merge_summaries(summaries: DataFrame) -> DataFrame:
    """Gaps-and-islands over summary endpoints: summaries merge iff
    this one starts within GAP of the latest end seen so far (running
    max — summaries from different batches may nest or interleave).
    Exact: endpoints are event times and intra-summary chaining is
    guaranteed, so this equals sessionizing the union of the raw
    events."""
    order = W.partitionBy("user_id").orderBy("s_start", "s_end")
    prev_max_end = F.max("s_end").over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    # Compare at FULL timestamp precision (unix_micros), never cast("long"):
    # second-truncation would wrongly merge two sessions whose true gap is
    # in (GAP, GAP + 1s) when the endpoints carry sub-second components
    # (e.g. prev_end=X.1, s_start=X+1800.9 → truncated diff 1800, true
    # gap 1800.8s), breaking bit-exact parity with ev_sessionize.
    flagged = summaries.withColumn(
        "_new",
        F.when(
            prev_max_end.isNull()
            | (
                F.unix_micros(F.col("s_start")) - F.unix_micros(prev_max_end)
                > GAP_SECONDS * 1_000_000
            ),
            1,
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "_sid", F.sum("_new").over(order.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        islands.groupBy("user_id", "_sid")
        .agg(
            F.min("s_start").alias("s_start"),
            F.max("s_end").alias("s_end"),
            F.sum("n_events").alias("n_events"),
        )
        .drop("_sid")
    )


def incremental_sessions_sink(state_dir: str):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        session_summaries(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, SESSIONS_SUBDIR, part)
        )

    return write


def _folded(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, SESSIONS_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no session state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return merge_summaries(state)


def load_sessions(spark: SparkSession, state_dir: str) -> DataFrame:
    """Derive the session table — equal to ev_sessionize over the union
    of everything ingested: (user_id, session_start, n_events)."""
    return (
        _folded(spark, state_dir)
        .select(
            "user_id",
            F.col("s_start").alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


def compact(spark: SparkSession, state_dir: str) -> None:
    """Fold summary deltas into ONE merged-session partition via the
    crash-safe hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, SESSIONS_SUBDIR)
    compaction.recover(base)
    merged = _folded(spark, state_dir)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_sessions_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Summary-fold sessionization over a jsonl event stream."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_sessions_sink(state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-sessions")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_native_session_job(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark_delay: str = "0 seconds",
    max_files_per_trigger: int | None = None,
):
    """Spark's NATIVE streaming sessionization: watermarked
    session_window aggregation in append mode — sessions emit exactly
    once, finalized, when the watermark passes their close (last event
    + gap). Bounded state with watermark eviction: the at-scale
    operational mode; the trade (pinned in tests) is that sessions
    still open relative to the final watermark stay buffered until
    more data arrives."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sessions = (
        reader.json(source_dir)
        .withWatermark("ts", watermark_delay)
        .groupBy(F.session_window("ts", GAP).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
    )
    return (
        sessions.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("native-sessions")
        .trigger(availableNow=True)
        .start()
    )
