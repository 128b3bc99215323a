"""Streaming-incremental weighted corpus sampling — bottom-k ticket
state under continuous ingest.

The batch sampler (plans/sampling.py) is a bottom-k over exact
md5-ticket priorities, and bottom-k is a KMV-family MERGEABLE sketch:

    bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪ bottom_k(B))

so the streaming twin needs no rescan and no rebalancing — each
micro-batch lands ``bottom_k(batch tickets)`` (≤ k rows!) under
``ingest_batch=<b>`` (per-partition overwrite ⇒ replay-idempotent),
and the view folds the deltas through ONE more bottom-k, then the SAME
doc-level finalize the batch query uses. Structural parity: the sample
over everything ingested is bit-equal to the batch sampler over the
union corpus, pinned in tests/test_streaming_wsample.py across batch
splits, restart/replay, and compaction.

This is the streaming property A-ES/priority sampling is famous for
(one pass, bounded state) with the repo's exactness contract: priorities
are content-addressed md5 strings, so ANY arrival order, batch split, or
replay produces the identical sample. State is ≤ k rows per delta —
broadcast-scale; compaction folds the deltas into one partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.plans.sampling import (
    SAMPLE_K,
    bottom_k_tickets,
    doc_weights,
    ticket_ballots,
)
from flink_tank_spark.streaming import compaction

WSAMPLE_SUBDIR = "wsample_state"


def ticket_delta(batch_df: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """The micro-batch's winning-ticket candidates: bottom-k of the
    batch's own tickets — the only rows that can ever enter the global
    bottom-k (mergeability), so the delta is ≤ k rows regardless of
    batch size."""
    return bottom_k_tickets(ticket_ballots(doc_weights(batch_df)), k)


def incremental_wsample_sink(state_dir: str, k: int = SAMPLE_K):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        ticket_delta(batch_df, k).write.mode("overwrite").parquet(
            os.path.join(state_dir, WSAMPLE_SUBDIR, part)
        )

    return write


def _folded_tickets(spark: SparkSession, state_dir: str, k: int) -> DataFrame:
    path = os.path.join(state_dir, WSAMPLE_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no weighted-sample state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return bottom_k_tickets(state, k)


def load_weighted_sample(
    spark: SparkSession, state_dir: str, k: int = SAMPLE_K
) -> DataFrame:
    """Fold the ticket deltas to the global bottom-k and finalize to the
    doc-level sample — equal to plans/sampling.weighted_sample over the
    union of everything ingested."""
    wins = _folded_tickets(spark, state_dir, k)
    return (
        wins.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("n_win"), F.min("pr").alias("best_pr"))
        .select(
            "doc_id", "w", F.col("n_win").cast("long").alias("n_win"), "best_pr"
        )
    )


def compact(spark: SparkSession, state_dir: str, k: int = SAMPLE_K) -> None:
    """Fold the ticket deltas into ONE ≤ k-row partition via the
    crash-safe hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, WSAMPLE_SUBDIR)
    compaction.recover(base)
    merged = _folded_tickets(spark, state_dir, k)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_wsample_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    k: int = SAMPLE_K,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming weighted-sample maintenance over a jsonl document
    stream (doc_id, text)."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema("doc_id bigint, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_wsample_sink(state_dir, k))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-wsample")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
