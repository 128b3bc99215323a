"""Semantic pins for the column profiler and the SCD2 point-in-time join.

The registry parity test already proves oracle equality end-to-end;
these tests pin the SEMANTICS small-scale so a refactor that keeps both
sides of the oracle in sync but changes meaning still fails:
- profile_numeric: null accounting, exact distincts, min/max identity;
- as-of join: half-open [valid_from, valid_to) intervals — a fact at
  exactly the effective timestamp sees the NEW version — and the
  every-fact-matches-exactly-one-version totality invariant.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.profile import (
    MCV_K,
    PROFILE_COLS,
    mcv_numeric,
    melt_numeric,
    profile_numeric,
)
from flink_tank_spark.plans.scd import _scd2_post_image, dim_scd2_asof_join

SF = "/root/testdata/sf0.001"


def test_profile_null_and_distinct_accounting(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (1, None), (3, 2.0), (None, 7.5)],
        "a bigint, b double",
    )
    rows = {r["col_name"]: r for r in profile_numeric(df, ("a", "b")).collect()}
    a, b = rows["a"], rows["b"]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 1, 2)
    assert (a["min_val"], a["max_val"]) == (1.0, 3.0)
    assert (b["n_rows"], b["n_null"], b["n_distinct"]) == (4, 1, 2)
    assert (b["min_val"], b["max_val"]) == (2.0, 7.5)


def test_profile_lineitem_shape(spark):
    prof = profile_numeric(load_table(spark, SF, "lineitem"), PROFILE_COLS)
    rows = {r["col_name"]: r for r in prof.collect()}
    assert set(rows) == set(PROFILE_COLS)
    n = load_table(spark, SF, "lineitem").count()
    assert all(r["n_rows"] == n for r in rows.values())
    # l_linenumber is 1..7 by construction: exact-distinct must be exact
    assert rows["l_linenumber"]["n_distinct"] == 7
    assert rows["l_discount"]["min_val"] >= 0.0
    assert rows["l_discount"]["max_val"] <= 0.11


def test_mcv_salted_topk_equals_direct_window(spark):
    """The two-phase salted top-k must equal a DIRECT single-window
    top-k (the salting is a partition-size bound, never a result
    change), for every salt count including salts=1 (degenerate) and
    salts >> distinct values (every value alone in its salt)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    li = load_table(spark, SF, "lineitem")
    counts = (
        melt_numeric(li, PROFILE_COLS)
        .filter(F.col("val").isNotNull())
        .groupBy("col_name", "val")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("col_name").orderBy(
        F.col("cnt").desc(), F.col("val").asc()
    )
    direct = {
        tuple(r)
        for r in counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= MCV_K)
        .collect()
    }
    for salts in (1, 7, 4096):
        got = {
            tuple(r)
            for r in mcv_numeric(li, PROFILE_COLS, salts=salts).collect()
        }
        assert got == direct, f"salted top-k diverged at salts={salts}"


def test_asof_join_totality(spark):
    """Every order matches exactly ONE dimension version (half-open
    intervals tile the timeline with no gap and no overlap)."""
    out = dim_scd2_asof_join(spark, SF)
    n_orders = load_table(spark, SF, "orders").count()
    assert out.agg(F.sum("n_orders")).collect()[0][0] == n_orders


def test_asof_boundary_is_half_open(spark):
    """A fact at exactly the effective timestamp sees the NEW version;
    one tick earlier sees the OLD one."""
    scd2 = _scd2_post_image(spark, SF)
    eff = scd2.filter(F.col("valid_to").isNotNull()).agg(
        F.max("valid_to")
    ).collect()[0][0]
    key = (
        scd2.filter(F.col("valid_to") == eff)
        .select("custkey")
        .limit(1)
        .collect()[0][0]
    )
    facts = spark.createDataFrame(
        [(key, eff), (key, eff - datetime.timedelta(seconds=1))],
        "fk bigint, ts timestamp",
    )
    j = facts.join(
        F.broadcast(scd2),
        (F.col("fk") == F.col("custkey"))
        & (F.col("valid_from") <= F.col("ts"))
        & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to"))),
    ).select("ts", "is_current").collect()
    got = {r["ts"]: r["is_current"] for r in j}
    assert len(j) == 2, "each probe must match exactly one version"
    assert got[eff] is True, "at the boundary: the NEW (current) version"
    assert got[eff - datetime.timedelta(seconds=1)] is False, (
        "before the boundary: the CLOSED version"
    )


def test_corr_matches_numpy(spark, sf_dir):
    """Pearson r equals numpy.corrcoef on the raw columns (values have
    <=2 decimals so the x100 scaling is lossless) for every pair."""
    import numpy as np

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.plans.profile import CORR_COLS, tbl_corr_lineitem

    pdf = load_table(spark, sf_dir, "lineitem").select(*CORR_COLS).toPandas()
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in tbl_corr_lineitem(spark, sf_dir).collect()}
    assert len(got) == 6
    for (a, b), r in got.items():
        expect = np.corrcoef(pdf[a], pdf[b])[0, 1]
        assert abs(r - expect) < 1e-9, (a, b, r, expect)


def test_corr_pinned_pair_semantics(spark, tmp_path):
    """Perfectly correlated / anti-correlated / independent planted
    columns land at r = 1, -1, ~0."""
    import numpy as np

    from flink_tank_spark.plans.profile import tbl_corr_lineitem

    n = 1000
    rng = np.random.RandomState(7)
    q = rng.randint(1, 100, n).astype(float)
    rows = [
        # l_extendedprice = 2*q (r=1 with quantity), l_discount = (100-q)/100
        # (r=-1), l_tax independent
        (i, 1, 1, 1, float(q[i]), float(2 * q[i]),
         float((100 - q[i]) / 100.0), float(rng.randint(0, 9)) / 100.0)
        for i in range(n)
    ]
    import datetime as dt
    full = [r + ("N", "O", dt.datetime(1995, 1, 1)) for r in rows]
    spark.createDataFrame(
        full,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = {(r["col_a"], r["col_b"]): r["corr"]
           for r in tbl_corr_lineitem(spark, str(tmp_path)).collect()}

    def r_of(a, b):
        return got[(a, b)] if (a, b) in got else got[(b, a)]

    assert abs(r_of("l_quantity", "l_extendedprice") - 1.0) < 1e-12
    assert abs(r_of("l_quantity", "l_discount") + 1.0) < 1e-12
    assert abs(r_of("l_quantity", "l_tax")) < 0.1
