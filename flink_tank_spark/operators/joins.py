"""Temporal join operators Spark lacks as built-ins: as-of and interval.

Extension surface (the reference has NO joins at all — SURVEY §2.12).
Both are expressed as compositions of existing DataFrame ops (the
preferred strategy for custom operators), never driver-side loops:

- **as-of join** (each left row matched to the most recent right row at
  or before its timestamp, per key): implemented WITHOUT a join — union
  the two sides, sort per key once, and carry the last right value
  forward with ``last(..., ignorenulls=True)`` over an unbounded
  preceding frame. One shuffle + one sort per key, linear shuffle
  payload; the classic merge-based as-of at cluster scale. (A join
  formulation would need a per-left-row argmax over an inequality —
  quadratic within keys.)
- **interval join** (left×right within a time window, per key): a plain
  equi-join on the key with the range as a post-join filter — Spark
  partitions by the equi-key, so the inequality never forces a
  cartesian product; within-key match lists stay bounded by the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    value_alias: str = "asof_value",
) -> DataFrame:
    """For every left row: the latest ``right_value`` whose ``right_ts``
    <= ``left_ts`` for the same ``key`` (NULL if none). Left columns are
    preserved. Ties at equal timestamps: the right row sorts first
    (side marker), so a right event at exactly left_ts IS matched.
    """
    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_left"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("_rv"),
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(lhs.schema["_left"].dataType).alias("_left"),
        F.col(right_value).alias("_rv"),
    )
    unioned = lhs.unionByName(rhs)
    w = (
        W.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("_asof", F.last("_rv", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("_side") == 1)
        .select(F.col("_left.*"), F.col("_asof").alias(value_alias))
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Join rows of the same key where ``right_ts`` ∈
    [left_ts + lower, left_ts + upper]. Equi-join on the key; the range
    condition rides along as a join predicate (evaluated within the
    key's partition, no cartesian explosion).
    """
    r = right.select(
        F.col(key).alias("_rkey"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
    )
    cond = (
        (F.col(key) == F.col("_rkey"))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) + lower)
        & (F.col(f"r_{right_ts}") <= F.col(left_ts) + upper)
    )
    return left.join(r, cond, how).drop("_rkey")
