"""Analytic window functions, grouping sets, and set operations.

All absent in the reference (SURVEY §2.12 — no sorts, no top-k, no set
operations, no grouping sets) — this module is extension surface, built
entirely on built-in Spark operators so Catalyst plans them (window
exchange reuse, partial aggregation, AQE).

Determinism notes (drive every design choice here):
- Running/windowed SUMs over doubles are ORDER-DEPENDENT in IEEE float —
  worse, DuckDB evaluates windowed aggregates with a segment tree
  (pairwise merge order) while Spark accumulates sequentially, so raw
  double window sums can never hash-match. Every windowed sum goes
  through the fixed-point recipe (functions/numeric.py): long micro-units
  summed exactly, one final division.
- Every window ORDER BY carries a unique tiebreak column so rank/lag
  results are engine-independent.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_tank_spark.functions.numeric import dsum, sql_dsum
from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.registry import QuerySpec

MICRO = 1_000_000.0


def _scaled_long(col: str) -> F.Column:
    return F.floor(F.col(col) * F.lit(MICRO) + F.lit(0.5))


# --------------------------------------------------------------------------
# win_running_total — running revenue per customer over order history
# --------------------------------------------------------------------------

def win_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(_scaled_long("o_totalprice")).over(w) / F.lit(MICRO)).alias("running_total"),
    )


WIN_RUNNING_TOTAL_SQL = dedent("""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(FLOOR(o_totalprice * 1000000.0 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 1000000.0 AS running_total
    FROM orders
""")


# --------------------------------------------------------------------------
# win_top_orders_per_cust — rank + filter top-3 orders per customer
# --------------------------------------------------------------------------

def win_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


WIN_TOP_ORDERS_SQL = dedent("""
    SELECT o_custkey, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rk
      FROM orders)
    WHERE rk <= 3
""")


# --------------------------------------------------------------------------
# win_order_gaps — lag: days since the customer's previous order
# --------------------------------------------------------------------------

def win_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    )


WIN_ORDER_GAPS_SQL = dedent("""
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS INTEGER) AS days_since_prev
    FROM orders
""")


# --------------------------------------------------------------------------
# win_moving_avg — 10-event moving average of `value` per user (events)
# --------------------------------------------------------------------------

def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    mv = (F.sum(_scaled_long("value")).over(w) / F.lit(MICRO)) / F.count(F.lit(1)).over(w)
    return ev.select("event_id", "user_id", mv.alias("moving_avg_value"))


WIN_MOVING_AVG_SQL = dedent("""
    WITH events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events)
    SELECT event_id, user_id,
           CAST(SUM(CAST(FLOOR(value * 1000000.0 + 0.5) AS BIGINT))
                OVER w AS DOUBLE) / 1000000.0 / COUNT(*) OVER w AS moving_avg_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
""")


# --------------------------------------------------------------------------
# win_balance_quartiles — ntile + per-bucket stats
# --------------------------------------------------------------------------

def win_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NTILE over an UNPARTITIONED window would funnel the whole table
    # through one task; distributed_ntile (operators/rank.py) computes the
    # identical ANSI NTILE via range-partitioned local row_numbers +
    # broadcast offsets — parallel at any scale.
    from flink_tank_spark.operators.rank import distributed_ntile

    cust = load_table(spark, sf_dir, "customer")
    return (
        distributed_ntile(cust, ["c_acctbal", "c_custkey"], 4, out_col="quartile")
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            dsum("c_acctbal", "sum_bal"),
        )
        .orderBy("quartile")
    )


WIN_BALANCE_QUARTILES_SQL = dedent(f"""
    SELECT quartile, COUNT(*) AS n,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
           {sql_dsum('c_acctbal')} AS sum_bal
    FROM (
      SELECT c_acctbal,
             CAST(NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS INTEGER) AS quartile
      FROM customer)
    GROUP BY quartile
    ORDER BY quartile
""")


# --------------------------------------------------------------------------
# agg_rollup_region_nation — ROLLUP revenue hierarchy
# --------------------------------------------------------------------------

def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, nat, reg = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "nation", "region")
    )
    dims = nat.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey")).select(
        "n_nationkey", F.col("n_name").alias("nation"), F.col("r_name").alias("region")
    )
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(dims), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("region", "nation")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("region").asc_nulls_first(), F.col("nation").asc_nulls_first()
        )
    )


AGG_ROLLUP_SQL = dedent(f"""
    SELECT r_name AS region, n_name AS nation,
           {sql_dsum('o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
                JOIN nation   ON c_nationkey = n_nationkey
                JOIN region   ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region ASC NULLS FIRST, nation ASC NULLS FIRST
""")


# --------------------------------------------------------------------------
# set_churned_customers — EXCEPT: active in 1996, gone in 1997
# --------------------------------------------------------------------------

def set_churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, nat = (
        load_table(spark, sf_dir, t) for t in ("customer", "orders", "nation")
    )
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    # subtract = EXCEPT DISTINCT (set semantics) — exceptAll would leak
    # customers whose 1996 order count merely exceeds their 1997 count.
    churned = y96.distinct().subtract(y97.distinct())
    return (
        churned.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_churned"))
        .orderBy("n_name")
    )


SET_CHURNED_SQL = dedent("""
    WITH churned AS (
      SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    )
    SELECT n_name, COUNT(*) AS n_churned
    FROM churned JOIN customer ON o_custkey = c_custkey
                 JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
""")


# --------------------------------------------------------------------------
# set_loyal_customers — INTERSECT: active in both years
# --------------------------------------------------------------------------

def set_loyal_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    y97 = orders.filter(F.year("o_orderdate") == 1997).select("o_custkey")
    return (
        y96.intersect(y97)
        .agg(F.count(F.lit(1)).alias("n_loyal"))
    )


SET_LOYAL_SQL = dedent("""
    SELECT COUNT(*) AS n_loyal FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      INTERSECT
      SELECT DISTINCT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    )
""")


# --------------------------------------------------------------------------
# win_price_position — percent_rank / cume_dist within order priority
# --------------------------------------------------------------------------

def win_price_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics: percent_rank and cume_dist are exact
    rational values ((rank-1)/(n-1), n_le/n) — engine-portable, unlike
    interpolating percentile functions. Partitioned by o_orderpriority
    (bounded per-group size at any SF via the date filter)."""
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-02-01")
    )
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        base.select(
            "o_orderkey",
            "o_orderpriority",
            F.percent_rank().over(w).alias("price_pct_rank"),
            F.cume_dist().over(w).alias("price_cume_dist"),
        )
        .orderBy("o_orderkey")
    )


WIN_PRICE_POSITION_SQL = dedent("""
    SELECT o_orderkey, o_orderpriority,
           PERCENT_RANK() OVER w AS price_pct_rank,
           CUME_DIST() OVER w AS price_cume_dist
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01' AND o_orderdate < DATE '1997-02-01'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
""")


# --------------------------------------------------------------------------
# win_exact_percentiles — exact rank-select percentiles, distributed
# --------------------------------------------------------------------------

def win_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles by RANK SELECTION: value at row ceil(p·n) of the
    total order — no interpolation (interpolated percentile arithmetic is
    not engine-portable), no single-task global sort (global rank via
    operators/rank.distributed_row_number), no sketch approximation.
    The shape to use when an exact p99 matters at 100 TB."""
    from flink_tank_spark.operators.rank import distributed_row_number

    cust = load_table(spark, sf_dir, "customer")
    ranked = distributed_row_number(cust, ["c_acctbal", "c_custkey"], out_col="rn")
    n = cust.agg(F.count(F.lit(1)).alias("n_rows"))
    with_n = ranked.crossJoin(F.broadcast(n))
    parts = [
        with_n.filter(F.col("rn") == F.ceil(F.lit(p) * F.col("n_rows"))).select(
            F.lit(p).alias("p"), F.col("c_acctbal").alias("value")
        )
        for p in (0.25, 0.5, 0.95, 0.99)
    ]
    out = parts[0]
    for df in parts[1:]:
        out = out.union(df)
    return out.orderBy("p")


WIN_EXACT_PERCENTILES_SQL = dedent("""
    WITH ranked AS (
      SELECT c_acctbal,
             ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS rn
      FROM customer
    ),
    n AS (SELECT COUNT(*) AS n_rows FROM customer)
    SELECT CAST(0.25 AS DOUBLE) AS p, c_acctbal AS value FROM ranked, n WHERE rn = CEIL(0.25 * n_rows)
    UNION ALL
    SELECT CAST(0.5  AS DOUBLE), c_acctbal FROM ranked, n WHERE rn = CEIL(0.5 * n_rows)
    UNION ALL
    SELECT CAST(0.95 AS DOUBLE), c_acctbal FROM ranked, n WHERE rn = CEIL(0.95 * n_rows)
    UNION ALL
    SELECT CAST(0.99 AS DOUBLE), c_acctbal FROM ranked, n WHERE rn = CEIL(0.99 * n_rows)
    ORDER BY p
""")


# --------------------------------------------------------------------------
# agg_cube_status_priority — full CUBE over two order dimensions
# --------------------------------------------------------------------------

def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


AGG_CUBE_SQL = dedent(f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dsum('o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
""")


# --------------------------------------------------------------------------
# agg_grouping_sets — explicit GROUPING SETS (the general form ROLLUP/CUBE
# specialize): per-status, per-priority, and grand-total rows in ONE pass
# --------------------------------------------------------------------------

def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(dsum("o_totalprice", "revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


AGG_GROUPING_SETS_SQL = dedent(f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dsum('o_totalprice')} AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
""")


def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier) of parts: the (size, price) points
    no other part dominates — bigger-or-equal size AND cheaper-or-equal
    price, strict in one. The OLAP shape behind "best tradeoff" queries
    (Borzsony/Kossmann/Stocker, ICDE 2001).

    Scale shape — the classic quadratic formulations (NOT EXISTS
    anti-join, or a window over one global sort) are both banned here;
    instead the corpus-sized work is ONE map-side-combinable groupBy:
    per size keep the min price (any dominated-dimension point can
    never reach the frontier), then run the running-min scan over the
    SIZE DOMAIN — 50 rows at any corpus size, the same
    bounded-domain-window argument as doc_zipf_ranks' 20-row rank
    window. Continuous dominated dimensions would first bucket via the
    fp_histogram recipe; the frontier of the bucketed domain bounds the
    true frontier within half a bin. ``n_parts`` counts the parts
    sitting exactly on each frontier point (broadcast join of the
    bounded candidate frame back to the per-(size, price) counts)."""
    part = load_table(spark, sf_dir, "part")
    per_point = part.groupBy("p_size", "p_retailprice").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    best = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("best_price")
    )
    cand = best.join(
        F.broadcast(per_point),
        (best.p_size == per_point.p_size)
        & (best.best_price == per_point.p_retailprice),
    ).select(best.p_size, "best_price", "n_parts")
    w = (
        W.orderBy(F.desc("p_size"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        cand.withColumn("_prev_min", F.min("best_price").over(w))
        .filter(
            F.col("_prev_min").isNull()
            | (F.col("best_price") < F.col("_prev_min"))
        )
        .select("p_size", "best_price", "n_parts")
        .orderBy(F.desc("p_size"))
    )


PART_SKYLINE_SQL = dedent("""
    WITH per_point AS (
      SELECT p_size, p_retailprice, COUNT(*) AS n_parts
      FROM part GROUP BY 1, 2
    ),
    best AS (
      SELECT p_size, MIN(p_retailprice) AS best_price FROM part GROUP BY 1
    ),
    cand AS (
      SELECT b.p_size, b.best_price, p.n_parts
      FROM best b JOIN per_point p
        ON p.p_size = b.p_size AND p.p_retailprice = b.best_price
    ),
    scan AS (
      SELECT p_size, best_price, n_parts,
             MIN(best_price) OVER (ORDER BY p_size DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_min
      FROM cand
    )
    SELECT p_size, best_price, n_parts
    FROM scan
    WHERE prev_min IS NULL OR best_price < prev_min
    ORDER BY p_size DESC
""")


QUERIES = [
    QuerySpec("win_running_total", win_running_total, WIN_RUNNING_TOTAL_SQL,
              "running revenue per customer (exact fixed-point window sum)", ("window",)),
    QuerySpec("win_top_orders_per_cust", win_top_orders_per_cust, WIN_TOP_ORDERS_SQL,
              "row_number top-3 orders per customer", ("window", "topk")),
    QuerySpec("win_order_gaps", win_order_gaps, WIN_ORDER_GAPS_SQL,
              "lag: days between consecutive orders", ("window",)),
    QuerySpec("win_moving_avg", win_moving_avg, WIN_MOVING_AVG_SQL,
              "10-event moving average per user", ("window",), bench=True),
    QuerySpec("win_balance_quartiles", win_balance_quartiles, WIN_BALANCE_QUARTILES_SQL,
              "ntile quartiles of customer balances", ("window",)),
    QuerySpec("agg_rollup_region_nation", agg_rollup_region_nation, AGG_ROLLUP_SQL,
              "ROLLUP revenue by region/nation", ("groupingsets",)),
    QuerySpec("agg_cube_status_priority", agg_cube_status_priority, AGG_CUBE_SQL,
              "CUBE revenue/counts over order status x priority", ("groupingsets",)),
    QuerySpec("agg_grouping_sets", agg_grouping_sets, AGG_GROUPING_SETS_SQL,
              "explicit GROUPING SETS: per-status + per-priority + grand total",
              ("groupingsets",)),
    QuerySpec("win_price_position", win_price_position, WIN_PRICE_POSITION_SQL,
              "percent_rank/cume_dist of order price within priority", ("window",)),
    QuerySpec("win_exact_percentiles", win_exact_percentiles, WIN_EXACT_PERCENTILES_SQL,
              "exact p25/p50/p95/p99 by distributed rank selection", ("window",)),
    QuerySpec("set_churned_customers", set_churned_customers, SET_CHURNED_SQL,
              "EXCEPT: customers active in 1996 but not 1997", ("setops",)),
    QuerySpec("part_skyline", part_skyline, PART_SKYLINE_SQL,
              "2-D skyline / Pareto frontier of (size, price) — one "
              "map-side groupBy + a bounded size-domain scan",
              ("window", "analytics", "tpch")),
    QuerySpec("set_loyal_customers", set_loyal_customers, SET_LOYAL_SQL,
              "INTERSECT: customers active in both years", ("setops",)),
]
