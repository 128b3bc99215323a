"""Sliding-window per-key metrics (declarative form).

Reference operator P3/A1/A2 — ``SlidingWindowAggregator:
KeyedProcessFunction`` (``AggregationJob.kt:109-206``): per key
(`originalId`), a 10-minute window sliding/emitting every 5 seconds
(:53-54), counting total events (A1, :172) and per-eventType counts
(A2, :173-177).

Spark-first re-expression: ``F.window(ts, "10 minutes", "5 seconds")``
— the declarative sliding window the reference's own docs name as the
idiomatic form (AggregationJob.kt:30-46). Window *bounds* are
epoch-aligned buckets rather than the reference's wall-clock-anchored
``[now-10min, now]`` (SURVEY §2.8, §7.4 pt 4): counts are identical for
the same input; bounds differ by design and are excluded from golden
hashes. The zero-count heartbeat variant (emit even when a key saw no
events) needs processing-time timers and lives with the stateful
operators; this module is the scalable batch/micro-batch path.

Scale notes: the per-type map is built with a single groupBy on
(window, key, type) followed by a re-group to (window, key) —
two map-side-combinable shuffles on compact keys. The alternative
(collect_list of types per (window, key)) ships every event's type
through the shuffle; at 100 TB the pre-aggregated form is strictly
smaller. For STREAMING use (single-aggregation constraint), use
``sliding_metrics_single_agg``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_tank_spark.operators.parse import iso_instant


def sliding_metrics(
    df: DataFrame,
    key_col: str = "originalId",
    type_col: str = "eventType",
    ts_col: str = "eventTime",
    window_size: str = "10 minutes",
    slide: str = "5 seconds",
) -> DataFrame:
    """Batch/micro-batch sliding-window metrics, two-level aggregation.

    Output: userId, windowStart, windowEnd (ISO strings), totalEventCount,
    eventTypeCounts (JSON object string, keys sorted) — the
    AggregatedMetrics shape (Events.kt:26-32).
    """
    per_type = (
        df.groupBy(
            F.window(F.col(ts_col), window_size, slide).alias("w"),
            F.col(key_col).alias("userId"),
            F.col(type_col).alias("et"),
        ).agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_type.groupBy("w", "userId")
        .agg(
            F.sum("cnt").cast("int").alias("totalEventCount"),
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("et", "cnt")))
            ).alias("_counts"),
        )
        .select(
            "userId",
            iso_instant(F.col("w.start")).alias("windowStart"),
            iso_instant(F.col("w.end")).alias("windowEnd"),
            "totalEventCount",
            F.to_json(F.col("_counts")).alias("eventTypeCounts"),
        )
    )


def sliding_metrics_watermarked(
    df: DataFrame,
    key_col: str = "originalId",
    type_col: str = "eventType",
    ts_col: str = "eventTime",
    window_size: str = "10 minutes",
    slide: str = "5 seconds",
    watermark: str = "1 minute",
) -> DataFrame:
    """EVENT-TIME variant with late-data handling — the semantics the
    reference explicitly does NOT have (no watermarks anywhere, SURVEY
    §2.8) but that a production deployment needs: events later than
    ``watermark`` behind the max seen event time are dropped, and in
    append mode windows emit exactly once, when finalized. State for
    closed windows is evicted — this is what bounds state at 100 TB
    scale (the processing-time heartbeat variant instead bounds state by
    the window length itself)."""
    return sliding_metrics_single_agg(
        df.withWatermark(ts_col, watermark),
        key_col=key_col,
        type_col=type_col,
        ts_col=ts_col,
        window_size=window_size,
        slide=slide,
    )


def sliding_metrics_single_agg(
    df: DataFrame,
    key_col: str = "originalId",
    type_col: str = "eventType",
    ts_col: str = "eventTime",
    window_size: str = "10 minutes",
    slide: str = "5 seconds",
) -> DataFrame:
    """Streaming-legal variant: ONE aggregation (streaming allows a single
    stateful agg per query in update mode). The per-type histogram is
    computed from the collected type list with higher-order functions —
    fine for the reference's cardinalities (≤5 types, bounded keys);
    prefer :func:`sliding_metrics` for large batch jobs.
    """
    lst = F.collect_list(F.col(type_col))
    agged = (
        df.groupBy(
            F.window(F.col(ts_col), window_size, slide).alias("w"),
            F.col(key_col).alias("userId"),
        ).agg(
            F.count(F.lit(1)).cast("int").alias("totalEventCount"),
            lst.alias("_types"),
        )
    )
    hist = F.map_from_entries(
        F.transform(
            F.array_sort(F.array_distinct(F.col("_types"))),
            lambda t: F.struct(
                t.alias("key"),
                F.size(F.filter(F.col("_types"), lambda x: x == t)).alias("value"),
            ),
        )
    )
    return agged.select(
        "userId",
        iso_instant(F.col("w.start")).alias("windowStart"),
        iso_instant(F.col("w.end")).alias("windowEnd"),
        "totalEventCount",
        F.to_json(hist).alias("eventTypeCounts"),
    )
