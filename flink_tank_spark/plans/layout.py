"""Data-layout queries: Z-order clustering quality, made measurable.

ev_zorder_extents computes the Morton key over the events table's two
natural predicate dimensions (user, hour) and reports, per Z-range
bucket, the row count and the rectangle the bucket spans in EACH
dimension — the numbers that decide how much a two-column predicate can
prune after a Z-order rewrite. Exact integer bit arithmetic end to end,
oracle-gated; the quantitative naive-vs-zorder comparison lives in
tests/test_zorder.py.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.io.zorder import morton_expr, sql_morton
from flink_tank_spark.plans.registry import QuerySpec

BITS = 16
BUCKET_BITS = 5  # 32 Z-range buckets


def ev_zorder_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per Z-bucket extents of the (user, hour) plane: after a Z-order
    rewrite each bucket becomes ~one file, and these min/max spans are
    exactly the parquet footer stats a scan would prune on.

    Quantization is min/max RANGE scaling to the full 16-bit domain
    (exact integer multiply + floor division against a 1-row broadcast
    stats scalar) — raw values would leave the high interleave bits
    constant and collapse every row into one Z-bucket."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.col("user_id").alias("u"),
        # floor, not cast-truncation: matches the oracle's FLOOR(epoch/3600)
        # for negative epochs too (pre-1970 timestamps round toward -inf)
        F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("long").alias("h"),
    )
    stats = raw.agg(
        F.min("u").alias("umin"), F.max("u").alias("umax"),
        F.min("h").alias("hmin"), F.max("h").alias("hmax"),
    )
    hi = (1 << BITS) - 1
    dims = raw.crossJoin(F.broadcast(stats)).select(
        F.expr(f"((u - umin) * {hi}) div greatest(umax - umin, 1)").alias("ux"),
        F.expr(f"((h - hmin) * {hi}) div greatest(hmax - hmin, 1)").alias("hy"),
    )
    keyed = dims.withColumn("zkey", morton_expr("ux", "hy", BITS))
    return (
        keyed.groupBy(
            F.shiftrightunsigned("zkey", 2 * BITS - BUCKET_BITS).alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ux").alias("ux_min"),
            F.max("ux").alias("ux_max"),
            F.min("hy").alias("hy_min"),
            F.max("hy").alias("hy_max"),
        )
        .orderBy("zbucket")
    )


EV_ZORDER_EXTENTS_SQL = dedent(f"""
    WITH raw AS (
      SELECT user_id AS u,
             CAST(FLOOR(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) AS h
      FROM events
    ),
    stats AS (
      SELECT MIN(u) AS umin, MAX(u) AS umax, MIN(h) AS hmin, MAX(h) AS hmax
      FROM raw
    ),
    dims AS (
      SELECT ((u - umin) * {(1 << BITS) - 1}) // GREATEST(umax - umin, 1) AS ux,
             ((h - hmin) * {(1 << BITS) - 1}) // GREATEST(hmax - hmin, 1) AS hy
      FROM raw CROSS JOIN stats
    ),
    keyed AS (
      SELECT ux, hy, {sql_morton('ux', 'hy', BITS)} AS zkey FROM dims
    )
    SELECT zkey >> {2 * BITS - BUCKET_BITS} AS zbucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(ux) AS ux_min, MAX(ux) AS ux_max,
           MIN(hy) AS hy_min, MAX(hy) AS hy_max
    FROM keyed
    GROUP BY 1
    ORDER BY zbucket
""")


QUERIES = [
    QuerySpec(
        "ev_zorder_extents",
        ev_zorder_extents,
        EV_ZORDER_EXTENTS_SQL,
        "per-Z-bucket (user, hour) extents — two-column pruning quality",
        ("layout", "events"),
    ),
]
