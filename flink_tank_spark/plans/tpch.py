"""TPC-H-style batch analytics over the driver's star schema.

The reference (alexdgarland/flink-tank) has NO batch relational layer —
SURVEY.md §2.12 records scan/filter/project/join/agg/sort/limit/set-ops as
absent. This module is the rebuild's batch analytics surface, adapted from
the public TPC-H query set to the available columns (no partsupp table,
no l_shipmode/l_commitdate — see FIXTURES.md §5).

Every query is written with the DataFrame API (Catalyst optimizes: filters
and projections push to the parquet scan, small dims broadcast) and has a
DuckDB oracle producing identical column names and values.

Scale notes (100 TB design):
- region/nation are fixed-cardinality → always broadcast (no shuffle of
  the fact side).
- customer/supplier/part grow with SF → left to AQE, which switches to
  broadcast when the filtered side is small and splits skewed shuffle
  partitions otherwise.
- All double aggregation goes through exact DECIMAL(30,10)
  (functions/numeric.py) so results are independent of partitioning —
  required for oracle hashing AND for run-to-run reproducibility on a
  1000-executor cluster.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_tank_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.registry import QuerySpec


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    return [load_table(spark, sf_dir, n) for n in names]


# --------------------------------------------------------------------------
# Q1 — pricing summary report (flagship; classic TPC-H Q1 shape)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * (
        F.lit(1) + F.col("l_tax")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = dedent(f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
""")


# --------------------------------------------------------------------------
# Q3 — shipping priority (join + agg + top-k)
# --------------------------------------------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1997-03-15").cast("timestamp")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = dedent(f"""
    SELECT l_orderkey, o_orderdate, o_orderpriority,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
""")


# --------------------------------------------------------------------------
# Q4 — order priority checking (semi-join / EXISTS)
# Adapted: "late" = lineitem shipped >90 days after order date
# (no l_commitdate/l_receiptdate in this schema).
# --------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = li.join(
        o.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey")
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    return (
        o.join(late.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = dedent("""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
""")


# --------------------------------------------------------------------------
# Q5 — local supplier volume (6-way join, broadcast dims)
# --------------------------------------------------------------------------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nat, reg = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    asia_nations = (
        nat.join(F.broadcast(reg.filter(F.col("r_name") == "ASIA")),
                 F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, (F.col("l_suppkey") == F.col("s_suppkey"))
                    & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = dedent(f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer JOIN orders   ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
                  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
                  JOIN nation   ON s_nationkey = n_nationkey
                  JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
""")


# --------------------------------------------------------------------------
# Q6 — forecasting revenue change (pure scan+filter+agg; pushdown showcase)
# --------------------------------------------------------------------------

def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


Q6_SQL = dedent(f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
""")


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations, by year
# --------------------------------------------------------------------------

def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nat = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation"
    )
    n1 = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = dedent(f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
""")


# --------------------------------------------------------------------------
# Q8 — national market share (share-of-sum; deterministic division)
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, supp, nat, reg = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    america = (
        nat.join(F.broadcast(reg.filter(F.col("r_name") == "AMERICA")),
                 F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("c_region_nk"))
    )
    supp_nat = nat.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    base = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(america), F.col("c_nationkey") == F.col("c_region_nk"), "left_semi")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(supp_nat), F.col("s_nationkey") == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate"))
        .withColumn("volume", vol)
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0.0))
    return (
        base.groupBy("o_year")
        .agg((dsum(nation_vol) / dsum(F.col("volume"))).alias("mkt_share"))
        .orderBy("o_year")
    )


Q8_SQL = dedent(f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
             / {sql_dsum('volume')} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n1.n_name AS supp_nation
      FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                    JOIN customer ON o_custkey = c_custkey
                    JOIN supplier ON l_suppkey = s_suppkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
      WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND c_nationkey IN (
          SELECT n_nationkey FROM nation JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'AMERICA')
    )
    GROUP BY o_year
    ORDER BY o_year
""")


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# Adapted: cost proxy = p_retailprice * l_quantity (no partsupp.ps_supplycost).
# --------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, nat = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    amount = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(part.filter(F.col("p_type") == "PROMO"), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("l_shipdate"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(dsum(amount, "sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


Q9_SQL = dedent(f"""
    SELECT n_name AS nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS o_year,
           {sql_dsum('l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity')} AS sum_profit
    FROM lineitem JOIN part     ON l_partkey = p_partkey
                  JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'PROMO'
    GROUP BY n_name, CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER)
    ORDER BY nation, o_year DESC
""")


# --------------------------------------------------------------------------
# Q10 — returned-item reporting (top 20 customers by lost revenue)
# --------------------------------------------------------------------------

def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, nat = _t(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = dedent(f"""
    SELECT c_custkey, c_name, c_acctbal, n_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN orders   ON l_orderkey = o_orderkey
                  JOIN customer ON o_custkey = c_custkey
                  JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
""")


# --------------------------------------------------------------------------
# Q12 — shipping delay vs priority (conditional aggregation)
# Adapted: late = shipped >60 days after order date (no l_shipmode).
# --------------------------------------------------------------------------

def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", late)
        .groupBy("is_late")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("is_late")
    )


Q12_SQL = dedent("""
    SELECT (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    ORDER BY 1
""")


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join + double groupBy)
# --------------------------------------------------------------------------

def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = dedent("""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
""")


# --------------------------------------------------------------------------
# Q14 — promotion effect (share-of-sum on a join)
# --------------------------------------------------------------------------

def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg((F.lit(100.0) * dsum(promo) / dsum(vol)).alias("promo_revenue"))
    )


Q14_SQL = dedent(f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
           / {sql_dsum('l_extendedprice * (1 - l_discount)')} AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
""")


# --------------------------------------------------------------------------
# Q15 — top supplier (window max over an aggregate)
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "total_revenue"))
    )
    top = rev.withColumn("max_rev", F.max("total_revenue").over(W.partitionBy()))
    return (
        top.filter(F.col("total_revenue") == F.col("max_rev"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = dedent(f"""
    WITH revenue AS (
      SELECT l_suppkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
""")


# --------------------------------------------------------------------------
# Q16 — part/supplier relationship counts (distinct agg after join)
# Adapted: supplier set per part comes from lineitem (no partsupp).
# --------------------------------------------------------------------------

def q16_parts_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    return (
        li.join(
            part.filter((F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = dedent("""
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1,5,9,13,17,21,25,29)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""")


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (per-group average threshold)
# --------------------------------------------------------------------------

def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    avg_qty = li.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        li.join(
            part.filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(avg_qty, F.col("l_partkey") == F.col("ap_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.5) * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_SQL = dedent(f"""
    SELECT {sql_dsum('l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON l_partkey = p_partkey
    JOIN (
      SELECT l_partkey AS ap_partkey, {sql_davg('l_quantity')} AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON l_partkey = ap_partkey
    WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
      AND l_quantity < 0.5 * avg_qty
""")


# --------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING over join)
# --------------------------------------------------------------------------

def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy(F.col("l_orderkey").alias("b_orderkey"))
        .agg(dsum("l_quantity", "b_qty"))
        .filter(F.col("b_qty") > 150)
        .select("b_orderkey")
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("b_orderkey"), "left_semi")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", "sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


Q18_SQL = dedent(f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM customer JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING {sql_dsum('l_quantity')} > 150)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
""")


# --------------------------------------------------------------------------
# Q19 — discounted revenue (disjunctive multi-predicate join)
# --------------------------------------------------------------------------

def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
         & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
           & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
           & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 30))
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "revenue")
    )


Q19_SQL = dedent(f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
""")


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# Adapted: late = shipped >60 days after order date.
# --------------------------------------------------------------------------

def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li, supp, nat = _t(spark, sf_dir, "orders", "lineitem", "supplier", "nation")
    of = orders.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    l1 = (
        li.join(of, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    late1 = l1.filter(F.col("late")).select(
        F.col("l_orderkey").alias("k1"), F.col("l_suppkey").alias("sk1")
    )
    # EXISTS: another supplier on the same order
    others = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("sk2")).distinct()
    with_other = late1.join(
        others, (F.col("k1") == F.col("k2")) & (F.col("sk1") != F.col("sk2")), "left_semi"
    )
    # NOT EXISTS: another supplier late on the same order
    late_others = l1.filter(F.col("late")).select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("sk3")
    ).distinct()
    sole_late = with_other.join(
        late_others, (F.col("k1") == F.col("k3")) & (F.col("sk1") != F.col("sk3")), "left_anti"
    )
    return (
        sole_late.join(supp, F.col("sk1") == F.col("s_suppkey"))
        .join(F.broadcast(nat.filter(F.col("n_name") == "NATION_5")),
              F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = dedent("""
    SELECT s_name, COUNT(*) AS numwait
    FROM lineitem l1
      JOIN orders   ON l1.l_orderkey = o_orderkey
      JOIN supplier ON l1.l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_5'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
""")


# --------------------------------------------------------------------------
# Q22 — global sales opportunity (scalar subquery + anti join)
# --------------------------------------------------------------------------

def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, nat = _t(spark, sf_dir, "customer", "orders", "nation")
    # Lazy scalar subquery: a 1-row aggregate broadcast into a cross join
    # (never .collect() at plan-build time — that would eagerly run a job
    # inside the builder and break composition/reuse of the plan).
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(davg("c_acctbal", "avg_bal"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .drop("avg_bal")
        .join(orders.select("o_custkey").distinct(),
              F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
        .orderBy("n_name")
    )


Q22_SQL = dedent(f"""
    SELECT n_name, COUNT(*) AS numcust, {sql_dsum('c_acctbal')} AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (
        SELECT {sql_davg('c_acctbal')} FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY n_name
    ORDER BY n_name
""")




# --------------------------------------------------------------------------
# Q2 — minimum-unit-price supplier per part (adapted: unit price from
# lineitem, no partsupp) — correlated-min + join-back pattern
# --------------------------------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, nat = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    unit = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(davg(F.col("l_extendedprice") / F.col("l_quantity"), "unit_price"))
    )
    min_unit = unit.groupBy(F.col("l_partkey").alias("mp_partkey")).agg(
        F.min("unit_price").alias("min_price")
    )
    return (
        unit.join(
            min_unit,
            (F.col("l_partkey") == F.col("mp_partkey"))
            & (F.col("unit_price") == F.col("min_price")),
        )
        .join(part.filter(F.col("p_size") <= 5), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_name", "s_name", F.col("n_name").alias("nation"), "min_price")
        .orderBy("p_partkey", "s_name")
    )


Q2_SQL = dedent(f"""
    WITH unit AS (
      SELECT l_partkey, l_suppkey,
             {sql_davg('l_extendedprice / l_quantity')} AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    mn AS (SELECT l_partkey AS mp_partkey, MIN(unit_price) AS min_price
           FROM unit GROUP BY l_partkey)
    SELECT p_partkey, p_name, s_name, n_name AS nation, min_price
    FROM unit JOIN mn ON l_partkey = mp_partkey AND unit_price = min_price
              JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
    WHERE p_size <= 5
    ORDER BY p_partkey, s_name
""")


# --------------------------------------------------------------------------
# Q11 — important part stock (adapted): parts whose revenue share exceeds
# a threshold of the grand total — HAVING vs scalar subquery
# --------------------------------------------------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), "part_value")
    )
    # Lazy scalar subquery via broadcast cross join (see q22 note).
    total = per_part.agg(dsum("part_value", "total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * F.lit(0.0005))
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = dedent(f"""
    WITH per_part AS (
      SELECT l_partkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS part_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM per_part
    WHERE part_value > (SELECT {sql_dsum('part_value')} FROM per_part) * 0.0005
    ORDER BY part_value DESC, l_partkey
""")


# --------------------------------------------------------------------------
# Q20 — suppliers with excess shipments (adapted): suppliers whose 1996
# PROMO-part quantity exceeds half their total 1996 quantity
# --------------------------------------------------------------------------

def q20_excess_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp, nat = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    li96 = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", F.col("l_quantity")).otherwise(F.lit(0.0))
    per_supp = (
        li96.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(
            dsum(promo, "promo_qty"),
            dsum("l_quantity", "total_qty"),
        )
        # adaptation parameter: the synthetic part mix tops out around a
        # 0.32 promo share, so the TPC-H-ish 0.5 threshold matched zero
        # rows at EVERY scale factor — trivially-empty gate evidence.
        # 0.25 selects a real (small) result at sf0.01 and sf0.1.
        .filter(F.col("promo_qty") > F.lit(0.25) * F.col("total_qty"))
    )
    return (
        per_supp.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", F.col("n_name").alias("nation"), "promo_qty", "total_qty")
        .orderBy("s_name")
    )


Q20_SQL = dedent(f"""
    WITH per_supp AS (
      SELECT l_suppkey,
             {sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_quantity ELSE 0.0 END")} AS promo_qty,
             {sql_dsum('l_quantity')} AS total_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_name, n_name AS nation, promo_qty, total_qty
    FROM per_supp JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation ON s_nationkey = n_nationkey
    WHERE promo_qty > 0.25 * total_qty
    ORDER BY s_name
""")


QUERIES = [
    QuerySpec("q1_pricing_summary", q1_pricing_summary, Q1_SQL,
              "TPC-H Q1: scan+filter+groupBy with 8 aggregates", ("tpch", "agg"), bench=True),
    QuerySpec("q3_shipping_priority", q3_shipping_priority, Q3_SQL,
              "TPC-H Q3: 3-way join, agg, top-10", ("tpch", "join", "topk"), bench=True),
    QuerySpec("q4_order_priority", q4_order_priority, Q4_SQL,
              "TPC-H Q4 (adapted): EXISTS semi-join", ("tpch", "semijoin")),
    QuerySpec("q5_local_supplier_volume", q5_local_supplier_volume, Q5_SQL,
              "TPC-H Q5: 6-way join with broadcast dims", ("tpch", "join"), bench=True),
    QuerySpec("q6_forecast_revenue", q6_forecast_revenue, Q6_SQL,
              "TPC-H Q6: pushdown filter + single agg", ("tpch", "scan"), bench=True),
    QuerySpec("q7_volume_shipping", q7_volume_shipping, Q7_SQL,
              "TPC-H Q7: nation-pair volume by year", ("tpch", "join")),
    QuerySpec("q8_market_share", q8_market_share, Q8_SQL,
              "TPC-H Q8 (adapted): market share, share-of-sum", ("tpch", "join")),
    QuerySpec("q9_product_profit", q9_product_profit, Q9_SQL,
              "TPC-H Q9 (adapted): profit by nation/year", ("tpch", "join"), bench=True),
    QuerySpec("q10_returned_items", q10_returned_items, Q10_SQL,
              "TPC-H Q10: returned-item revenue top-20", ("tpch", "join", "topk")),
    QuerySpec("q12_late_shipments", q12_late_shipments, Q12_SQL,
              "TPC-H Q12 (adapted): conditional counts", ("tpch", "agg")),
    QuerySpec("q13_customer_distribution", q13_customer_distribution, Q13_SQL,
              "TPC-H Q13: left join + nested agg", ("tpch", "outerjoin"), bench=True),
    QuerySpec("q14_promo_revenue", q14_promo_revenue, Q14_SQL,
              "TPC-H Q14: promo share-of-sum", ("tpch", "join")),
    QuerySpec("q15_top_supplier", q15_top_supplier, Q15_SQL,
              "TPC-H Q15: argmax via window over agg", ("tpch", "window")),
    QuerySpec("q16_parts_suppliers", q16_parts_suppliers, Q16_SQL,
              "TPC-H Q16 (adapted): distinct agg", ("tpch", "distinct")),
    QuerySpec("q17_small_quantity", q17_small_quantity, Q17_SQL,
              "TPC-H Q17: per-group avg threshold", ("tpch", "subquery")),
    QuerySpec("q18_large_volume_customers", q18_large_volume_customers, Q18_SQL,
              "TPC-H Q18: HAVING subquery + top-100", ("tpch", "semijoin", "topk"), bench=True),
    QuerySpec("q19_discounted_revenue", q19_discounted_revenue, Q19_SQL,
              "TPC-H Q19: disjunctive predicates", ("tpch", "join")),
    QuerySpec("q21_suppliers_waiting", q21_suppliers_waiting, Q21_SQL,
              "TPC-H Q21 (adapted): EXISTS + NOT EXISTS", ("tpch", "antijoin")),
    QuerySpec("q22_sales_opportunity", q22_sales_opportunity, Q22_SQL,
              "TPC-H Q22 (adapted): scalar subquery + anti join", ("tpch", "antijoin")),
    QuerySpec("q2_min_cost_supplier", q2_min_cost_supplier, Q2_SQL,
              "TPC-H Q2 (adapted): min-unit-price supplier per part", ("tpch", "subquery")),
    QuerySpec("q11_important_stock", q11_important_stock, Q11_SQL,
              "TPC-H Q11 (adapted): revenue share threshold", ("tpch", "subquery")),
    QuerySpec("q20_excess_shipments", q20_excess_shipments, Q20_SQL,
              "TPC-H Q20 (adapted): promo-share filter per supplier", ("tpch", "agg")),
]
