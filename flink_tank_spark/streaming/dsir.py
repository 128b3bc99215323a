"""Streaming-incremental DSIR importance weights — target-vs-raw
hashed-bigram scores under continuous document ingest, exact batch
parity.

The batch query (plans/sampling.doc_dsir_weights) derives everything —
the raw and target bucket distributions, the ≤256-row weight table, the
per-doc and per-language scores — from the (doc_id, lang, bkt, c)
hashed-bigram count table. Bucket counts of a union corpus are the
per-key sums of each part's counts, so that table is the MERGEABLE
state: each micro-batch lands only its own bag under
``ingest_batch=<b>`` (per-partition overwrite ⇒ replay-idempotent) and
the view folds the deltas through one groupBy-sum, then runs the SAME
finalize the batch query uses (dsir_weights_from_counts — shared code,
so parity is structural). Bit-equal to doc_dsir_weights over the union
of everything ingested under ANY batch split, replay, or compaction —
the weight table is re-derived at read, so late target-language
documents correctly re-weight EVERY document already ingested (the
property a frozen weight table loses).

Scale shape: per-batch delta = one bigram explode + map-side-combinable
count, bounded by batch_docs × 256 buckets; fold state ≤ docs × 256
rows; the weight table stays a ≤256-row broadcast at read. Exact
decimal arithmetic end to end — identical bits under any split.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.plans.sampling import (
    dsir_bucket_counts,
    dsir_weights_from_counts,
)
from flink_tank_spark.streaming import compaction

DSIR_SUBDIR = "dsir_state"


def bucket_count_delta(batch_df: DataFrame) -> DataFrame:
    """The micro-batch's own (doc_id, lang, bkt, c) hashed-bigram bag."""
    return dsir_bucket_counts(batch_df)


def incremental_dsir_sink(state_dir: str):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        bucket_count_delta(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, DSIR_SUBDIR, part)
        )

    return write


def _folded_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, DSIR_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no DSIR state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return state.groupBy("doc_id", "lang", "bkt").agg(
        F.sum("c").cast("decimal(20,0)").alias("c")
    )


def load_dsir_weights(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the bucket-count deltas and finalize — equal to
    plans/sampling.doc_dsir_weights over the union of everything
    ingested."""
    return dsir_weights_from_counts(_folded_counts(spark, state_dir))


def compact(spark: SparkSession, state_dir: str) -> None:
    """Fold count deltas into ONE partition via the crash-safe
    hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, DSIR_SUBDIR)
    compaction.recover(base)
    merged = _folded_counts(spark, state_dir)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_dsir_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming DSIR-weight maintenance over a jsonl document stream
    (doc_id, lang, text)."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema("doc_id bigint, lang string, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_dsir_sink(state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-dsir")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
