"""Streaming-incremental anomaly monitoring — the 3σ outlier report
kept current under continuous event ingest.

The state is the exact micro-unit VALUE HISTOGRAM per (type, day)
(plans/analytics.value_hist_events): counts fold by SUM, and the
z-test derives at read time through the SAME finalize the batch query
uses (outliers_from_hist) — structural parity, like streaming/topk.py.
The histogram is what makes the monitor exact: mean/variance fold
algebraically but the outlier COUNT needs the value distribution, and
per-(group, distinct-value) counts are the smallest state that carries
it losslessly (bounded by the value domain, ~5e4 micro-unit bins here,
not by row count — the exact-distinct argument from
streaming/profile.py).

Derive-at-read also gives the right semantics for late data: a
straggler lands in its event-time (type, day) group and can flip
yesterday's verdicts — eager per-batch flagging against partial stats
cannot.

Same layout/replay/compaction contracts as the sibling modules:
``anomaly_state/ingest_batch=<b>`` partitions, idempotent overwrite,
crash-safe hide → commit → clean swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.plans.analytics import outliers_from_hist, value_hist_events
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming.sketches import EVENTS_SCHEMA

ANOMALY_SUBDIR = "anomaly_state"


def incremental_anomaly_sink(state_dir: str):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        value_hist_events(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, ANOMALY_SUBDIR, part)
        )

    return write


def _folded_hist(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, ANOMALY_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no anomaly state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return state.groupBy("event_type", "day", "v").agg(
        F.sum("cnt").alias("cnt")
    )


def load_outliers(spark: SparkSession, state_dir: str) -> DataFrame:
    """Fold the histogram deltas and derive the outlier report — equal
    to ev_value_outliers over the union of everything ingested."""
    return outliers_from_hist(_folded_hist(spark, state_dir))


def compact(spark: SparkSession, state_dir: str) -> None:
    """Fold the histogram state into ONE merged partition via the
    crash-safe hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, ANOMALY_SUBDIR)
    compaction.recover(base)
    merged = _folded_hist(spark, state_dir)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_anomaly_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming anomaly-monitor maintenance over a jsonl event stream."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_anomaly_sink(state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-anomaly")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
