"""Streaming-incremental column profiling — data-quality monitoring at
ingest.

The batch profiler (plans/profile.py) is one melted scan + one
distinct-keyed aggregate; its statistics are all ALGEBRAIC, so the
streaming twin never rescans history: each micro-batch lands

    stats_state/ingest_batch=<b>     col_name, n_rows, n_null,
                                     min_val, max_val   (one row/column)
    distinct_state/ingest_batch=<b>  col_name, val      (batch-distinct,
                                     nulls excluded like countDistinct)

and :func:`load_profile` folds the deltas with the same operators —
counts by SUM, extrema by MIN/MAX, distincts by distinct-of-union —
producing a table BIT-identical to ``profile_numeric`` over the union
of everything ingested (pinned across micro-batch splits, restarts, and
compaction in tests/test_streaming_profile.py). That exactness is why
the distinct state stores VALUES, not a sketch: distinct-of-union of
per-batch distinct sets IS the exact distinct set. The state is bounded
by the corpus' per-column distinct cardinality after :func:`compact`
(between compactions, by the sum of per-batch distincts); when an
approximate monitor is enough, the HLL path in streaming/sketches.py is
the cheaper register-merge alternative.

Partitioned ``mode=overwrite`` appends make foreachBatch replay
idempotent, and the crash-safe hide → commit → clean compaction swap is
shared via streaming/compaction.py — the same contracts as
streaming/sketches.py and streaming/retrieval_index.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.plans.profile import melt_numeric
from flink_tank_spark.streaming import compaction

STATS_SUBDIR = "stats_state"
DISTINCT_SUBDIR = "distinct_state"
_SUBDIRS = (STATS_SUBDIR, DISTINCT_SUBDIR)

# the lineitem numeric surface the batch query profiles, as a stream
# schema (jsonl wire form used by the tests/bench harnesses)
LINEITEM_NUMERIC_SCHEMA = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber int, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double"
)


def incremental_profile_sink(profile_dir: str, cols: tuple[str, ...]):
    """foreachBatch writer: melt the micro-batch ONCE (persisted across
    the two write actions — the multi-branch-DAG lesson) and land the
    algebraic stats delta plus the batch-distinct value pairs."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        melted = melt_numeric(batch_df, cols).persist()
        try:
            (
                melted.groupBy("col_name")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    (F.count(F.lit(1)) - F.count("val")).alias("n_null"),
                    F.min("val").alias("min_val"),
                    F.max("val").alias("max_val"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(profile_dir, STATS_SUBDIR, part))
            )
            (
                melted.filter(F.col("val").isNotNull())
                .distinct()
                .write.mode("overwrite")
                .parquet(os.path.join(profile_dir, DISTINCT_SUBDIR, part))
            )
        finally:
            melted.unpersist()

    return write


def _read_parts(
    spark: SparkSession, profile_dir: str, subdir: str
) -> DataFrame | None:
    path = os.path.join(profile_dir, subdir)
    compaction.check_readable(path)
    if not compaction.parts(path):
        return None
    return spark.read.option("basePath", path).parquet(path).drop("ingest_batch")


def load_profile(spark: SparkSession, profile_dir: str) -> DataFrame:
    """Fold the accumulated deltas into the batch profiler's output
    shape: (col_name, n_rows, n_null, n_distinct, min_val, max_val),
    BIT-identical to ``profile_numeric`` over the ingested union. A
    column whose every ingested value was NULL has no distinct rows —
    coalesce to 0, matching ``countDistinct``. Raises on empty state."""
    stats = _read_parts(spark, profile_dir, STATS_SUBDIR)
    dist = _read_parts(spark, profile_dir, DISTINCT_SUBDIR)
    if stats is None:
        raise ValueError(f"no profile partitions under {profile_dir!r}")
    merged = stats.groupBy("col_name").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_null").alias("n_null"),
        F.min("min_val").alias("min_val"),
        F.max("max_val").alias("max_val"),
    )
    if dist is not None:
        d = dist.groupBy("col_name").agg(
            F.countDistinct("val").alias("n_distinct")
        )
        merged = merged.join(d, "col_name", "left")
    else:
        merged = merged.withColumn("n_distinct", F.lit(None).cast("long"))
    return merged.select(
        "col_name",
        "n_rows",
        "n_null",
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_val",
        "max_val",
    ).orderBy("col_name")


def compact(spark: SparkSession, profile_dir: str) -> None:
    """Rewrite each state as ONE merged partition (``ingest_batch=-1``)
    via the crash-safe hide → commit → clean swap; run only while the
    stream is STOPPED (same double-count argument as the sibling
    modules). Distinct state collapses to the exact per-column distinct
    value set — the point where state size becomes corpus-bounded."""
    for subdir in _SUBDIRS:
        compaction.recover(os.path.join(profile_dir, subdir))
    stats = _read_parts(spark, profile_dir, STATS_SUBDIR)
    dist = _read_parts(spark, profile_dir, DISTINCT_SUBDIR)
    if stats is None:
        raise ValueError(f"no profile partitions under {profile_dir!r}")
    folded = [
        (
            STATS_SUBDIR,
            stats.groupBy("col_name").agg(
                F.sum("n_rows").alias("n_rows"),
                F.sum("n_null").alias("n_null"),
                F.min("min_val").alias("min_val"),
                F.max("max_val").alias("max_val"),
            ),
        )
    ]
    if dist is not None:
        folded.append((DISTINCT_SUBDIR, dist.distinct()))
    for subdir, df in folded:
        base = os.path.join(profile_dir, subdir)
        parts = compaction.parts(base)
        df.write.mode("overwrite").parquet(
            os.path.join(base, compaction.TMP_NAME)
        )
        compaction.commit_swap(base, parts)


def start_profile_job(
    spark: SparkSession,
    source_dir: str,
    profile_dir: str,
    checkpoint_dir: str,
    cols: tuple[str, ...],
    schema: str = LINEITEM_NUMERIC_SCHEMA,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming profile-maintenance job over a jsonl stream. Returns
    the StreamingQuery; ``max_files_per_trigger=1`` forces one
    micro-batch per source file for per-batch delta-path tests."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(
            incremental_profile_sink(profile_dir, cols)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-profile")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
