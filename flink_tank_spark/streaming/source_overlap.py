"""Streaming-incremental source-overlap audit — cross-crawl shingle
Jaccard under continuous document ingest, with exact batch parity.

The batch query (plans/llm.doc_source_overlap) is a finalize over the
DISTINCT (source, shingle) table. That table is the MERGEABLE state:
the distinct set of a union corpus is the distinct of the union of
each part's distinct sets, so each micro-batch lands only its OWN
distinct (source, g) bag under ``ingest_batch=<b>`` (per-partition
overwrite ⇒ replay-idempotent) and the read view folds the deltas
through one ``distinct()`` and runs the SAME finalize the batch query
uses (``source_overlap_from_shingles`` — shared code, so parity is
structural). Bit-equal to doc_source_overlap over the union of
everything ingested under ANY batch split, replay, or compaction —
including splits where a source pair's first shared shingle arrives
in different batches on each side.

Scale shape: the per-batch delta is the batch's own shingle bag (one
explode + distinct); fold state is vocabulary-bounded per source
(distinct shingles, NOT corpus-bounded), and the finalize's pair join
volume is bounded by vocab × sources². Compaction folds deltas into
one partition via the crash-safe hide → commit → clean swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators import dedup
from flink_tank_spark.plans.llm import source_overlap_from_shingles
from flink_tank_spark.streaming import compaction

OVERLAP_SUBDIR = "source_overlap_state"


def shingle_delta(batch_df: DataFrame) -> DataFrame:
    """The micro-batch's own distinct (source, g) shingle bag — the
    same word-3-shingle definition the batch pipeline uses
    (operators/dedup.shingle_sets)."""
    return (
        dedup.shingle_sets(batch_df)
        .join(batch_df.select("doc_id", "source"), "doc_id")
        .select("source", F.explode("shingles").alias("g"))
        .distinct()
    )


def incremental_overlap_sink(state_dir: str):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        shingle_delta(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, OVERLAP_SUBDIR, part)
        )

    return write


def _folded_shingles(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, OVERLAP_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no source-overlap state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return state.distinct()


def load_source_overlap(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the shingle deltas and finalize — equal to
    plans/llm.doc_source_overlap over the union of everything
    ingested."""
    return source_overlap_from_shingles(_folded_shingles(spark, state_dir))


def compact(spark: SparkSession, state_dir: str) -> None:
    """Fold shingle deltas into ONE partition via the crash-safe
    hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, OVERLAP_SUBDIR)
    compaction.recover(base)
    merged = _folded_shingles(spark, state_dir)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_source_overlap_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming source-overlap maintenance over a jsonl document
    stream (doc_id, source, text)."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema("doc_id bigint, source string, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_overlap_sink(state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-source-overlap")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
