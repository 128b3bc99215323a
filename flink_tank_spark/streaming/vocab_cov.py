"""Streaming-incremental vocabulary-coverage audit — OOV rates under
continuous document ingest, with exact batch parity.

The batch query (plans/vocab.doc_vocab_coverage) is three layers over
the per-doc token-count table: top-V vocabulary by global frequency,
broadcast membership join, per-source integer-ppm aggregates. The
token-count table is the MERGEABLE state: token counts of a union
corpus are the per-key sums of each part's counts, so each micro-batch
lands only its own (doc_id, source, tok, c) bag under
``ingest_batch=<b>`` (per-partition overwrite ⇒ replay-idempotent) and
the view folds the deltas through one groupBy-sum, then runs the SAME
finalize the batch query uses (vocab_coverage_from_counts — shared
code, so parity is structural). Bit-equal to doc_vocab_coverage over
the union of everything ingested under ANY batch split, replay, or
compaction — including splits that change which tokens make the top-V
vocabulary mid-stream, the property an eager materialized vocab loses.

Scale shape: the per-batch delta is the batch's own token bag (one
explode + map-side-combinable count); fold state is per-(doc, tok)
counts — strictly smaller than the token stream; the vocabulary stays
orderBy+limit (TakeOrderedAndProject) and membership stays a ≤V-row
broadcast join at read. Compaction folds deltas into one partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.plans.vocab import (
    VOCAB_V,
    doc_token_counts,
    vocab_coverage_from_counts,
)
from flink_tank_spark.streaming import compaction

VOCAB_SUBDIR = "vocab_state"


def token_count_delta(batch_df: DataFrame) -> DataFrame:
    """The micro-batch's own (doc_id, source, tok, c) bag."""
    return doc_token_counts(batch_df)


def incremental_vocab_sink(state_dir: str):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        token_count_delta(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, VOCAB_SUBDIR, part)
        )

    return write


def _folded_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, VOCAB_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no vocab state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return state.groupBy("doc_id", "source", "tok").agg(
        F.sum("c").alias("c")
    )


def load_vocab_coverage(
    spark: SparkSession, state_dir: str, v: int = VOCAB_V
) -> DataFrame:
    """Fold the token-count deltas and finalize — equal to
    plans/vocab.doc_vocab_coverage over the union of everything
    ingested."""
    return vocab_coverage_from_counts(_folded_counts(spark, state_dir), v)


def compact(spark: SparkSession, state_dir: str) -> None:
    """Fold count deltas into ONE partition via the crash-safe
    hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, VOCAB_SUBDIR)
    compaction.recover(base)
    merged = _folded_counts(spark, state_dir)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_vocab_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming vocabulary-coverage maintenance over a jsonl document
    stream (doc_id, source, text)."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema("doc_id bigint, source string, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_vocab_sink(state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-vocab-coverage")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
