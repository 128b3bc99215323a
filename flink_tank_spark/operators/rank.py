"""Scale-safe global ranking: distributed row_number / ntile.

``F.row_number().over(Window.orderBy(...))`` with no ``partitionBy``
funnels the ENTIRE dataset through one task — correct at sf0.1, dead at
100 TB. The classic distributed form used here:

1. ``repartitionByRange`` on the sort key — non-overlapping sorted key
   ranges across partitions (any boundary placement is fine; sampling
   only affects balance, never correctness).
2. per-partition ``row_number`` (Window PARTITIONED by partition id —
   parallel, no global funnel).
3. per-partition counts (tiny: one row per partition) → cumulative
   offsets via a window over the partition-count table, broadcast back.

global_rn = local_rn + offset. NTILE(k) is then pure arithmetic on
(global_rn, n_total): the first ``n % k`` tiles get ``n//k + 1`` rows —
identical to ANSI NTILE, verified against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def distributed_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "global_rn",
    num_ranges: int | None = None,
) -> DataFrame:
    """Global 1-based row_number by ``order_cols`` with NO single-task
    global window. ``order_cols`` must be a total order (include a unique
    tiebreak) for deterministic output."""
    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in order_cols])
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    local = with_pid.withColumn(
        "_lrn", F.row_number().over(W.partitionBy("_pid").orderBy(*order_cols))
    )
    # One row per partition — tiny; the window below runs on <= num_ranges
    # rows, so the "global" window here is not a scale concern.
    counts = with_pid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    # constant partitionBy: same single-partition execution over the
    # <=num_ranges count rows, without tripping WindowExec's global-window
    # warning (this window is tiny by construction, not a scale funnel).
    offsets = counts.withColumn(
        "_off",
        F.coalesce(
            F.sum("_cnt").over(
                W.partitionBy(F.lit(0)).orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("_pid", "_off")
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lrn") + F.col("_off")).cast("int"))
        .drop("_pid", "_lrn", "_off")
    )


def ntile_expr(rn: Column, n_total: Column, k: int) -> Column:
    """ANSI NTILE(k) from a global row number and the total row count.

    With q = n // k and rem = n % k: the first ``rem`` tiles hold q+1
    rows, the rest hold q.
    """
    def idiv(a: Column, b: Column) -> Column:
        # exact integer division on long columns (no double rounding)
        return ((a - a % b) / b).cast("long")

    q = idiv(n_total.cast("long"), F.lit(k))
    rem = n_total.cast("long") % k
    head = rem * (q + 1)  # rows covered by the larger leading tiles
    # greatest(q, 1): when n < k the otherwise-branch is never selected,
    # but SQL still evaluates it — avoid a divide-by-zero there.
    q_safe = F.greatest(q, F.lit(1))
    return (
        F.when(rn <= head, idiv(rn.cast("long") - 1, q + 1) + 1)
        .otherwise(rem + idiv(rn.cast("long") - head - 1, q_safe) + 1)
        .cast("int")
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "cumsum",
    partition_cols: list[str] | None = None,
    num_ranges: int | None = None,
) -> DataFrame:
    """Running SUM(value) OVER (PARTITION BY partition_cols ORDER BY
    order_cols) that scales when partition_cols is LOW-CARDINALITY (few
    languages, few tenants): a plain window would funnel each partition
    through one task. Same two-level shape as distributed_row_number:
    range-split each logical partition, local cumsums in parallel, tiny
    per-split totals rolled into broadcast offsets.

    Exactness: bit-exact for integer/fixed-point values (offset addition
    is associative); for raw doubles the split changes summation order —
    scale them first (functions/numeric.py).
    """
    parts = list(partition_cols or [])
    n = num_ranges or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n, *[F.col(c) for c in parts + order_cols])
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())
    local = with_pid.withColumn(
        "_lcs",
        F.sum(value_col).over(
            W.partitionBy(*parts, "_pid")
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    totals = with_pid.groupBy(*parts, "_pid").agg(F.sum(value_col).alias("_psum"))
    offsets = totals.withColumn(
        "_off",
        F.coalesce(
            F.sum("_psum").over(
                W.partitionBy(*(parts or [F.lit(0)]))
                .orderBy("_pid")
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(*parts, "_pid", "_off")
    return (
        local.join(F.broadcast(offsets), parts + ["_pid"])
        .withColumn(out_col, F.col("_lcs") + F.col("_off"))
        .drop("_pid", "_lcs", "_off")
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list[str],
    k: int,
    out_col: str = "ntile",
) -> DataFrame:
    """NTILE(k) OVER (ORDER BY order_cols) without a global single-task
    window: distributed row_number + broadcast total count + arithmetic."""
    rn = distributed_row_number(df, order_cols, out_col="_grn")
    total = df.agg(F.count(F.lit(1)).alias("_n_total"))
    return (
        rn.crossJoin(F.broadcast(total))
        .withColumn(out_col, ntile_expr(F.col("_grn"), F.col("_n_total"), k))
        .drop("_grn", "_n_total")
    )


def salted_topk(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    salt_col: str,
    k: int,
    salts: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Deterministic per-group top-k WITHOUT the per-group window
    funnel: a direct ``row_number() OVER (PARTITION BY group)`` drags
    every row of a hot group through one task (billions per partition
    at 100 TB). Two-phase instead — phase 1 ranks within
    (group, hash(salt_col) % salts): bounded partitions, and every
    global top-k member is necessarily top-k within its own salt;
    phase 2 ranks the ≤ k·salts survivors per group, a constant-size
    task. ``order`` must be a TOTAL order (break ties!) so the result
    is partition-invariant. Same recipe as the MCV statistics and the
    distributed-NTILE family (plans/profile.py, operators/rank.py).
    """
    w1 = W.partitionBy(*group_cols, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", F.pmod(F.hash(salt_col), F.lit(salts)))
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )
    w2 = W.partitionBy(*group_cols).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(w2).cast("integer"))
        .filter(F.col(rank_col) <= k)
    )
