"""Distributed global ranking (operators/rank.py) vs the ANSI built-ins.

The point of distributed_row_number/distributed_ntile is to be
VALUE-IDENTICAL to `F.row_number()/F.ntile()` over an unpartitioned
window while never funneling the dataset through one task.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators.rank import distributed_ntile, distributed_row_number


def test_distributed_row_number_matches_global_window(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer")
    got = {
        r.c_custkey: r.grn
        for r in distributed_row_number(
            cust, ["c_acctbal", "c_custkey"], out_col="grn"
        ).collect()
    }
    want = {
        r.c_custkey: r.rn
        for r in cust.withColumn(
            "rn", F.row_number().over(W.orderBy("c_acctbal", "c_custkey"))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("k,n", [(4, 150), (4, 151), (4, 153), (7, 23), (3, 2)])
def test_distributed_ntile_matches_ansi_ntile(spark, k, n):
    # n % k != 0 exercises the uneven-tile arithmetic (first n%k tiles
    # get one extra row); n < k exercises the degenerate tiny-input path.
    df = spark.range(n).select(
        (F.col("id") * 7919 % 1000).alias("v"), F.col("id").alias("tid")
    )
    got = {r.tid: r.nt for r in distributed_ntile(df, ["v", "tid"], k, out_col="nt").collect()}
    want = {
        r.tid: r.nt
        for r in df.withColumn("nt", F.ntile(k).over(W.orderBy("v", "tid"))).collect()
    }
    assert got == want


def test_distributed_ntile_plan_has_no_global_window_on_data(spark, sf_dir):
    """The only unpartitioned-ish window may run over the per-partition
    COUNT table (<= num_ranges rows), never over the data itself: every
    Window node on the main data must be partitioned by _pid."""
    import io
    import contextlib

    cust = load_table(spark, sf_dir, "customer")
    df = distributed_ntile(cust, ["c_acctbal", "c_custkey"], 4)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ntile(4)" not in plan  # no built-in global NTILE window call
    # row_number window runs partitioned by the range-partition id
    assert "_pid" in plan


def test_distributed_cumsum_matches_window(spark, sf_dir):
    from flink_tank_spark.operators.rank import distributed_cumsum

    ev = load_table(spark, sf_dir, "events").limit(2000).select(
        "event_id", "event_type", F.lit(1).alias("one")
    )
    got = {
        r.event_id: r.cs
        for r in distributed_cumsum(
            ev, ["event_id"], "one", out_col="cs", partition_cols=["event_type"]
        ).collect()
    }
    want = {
        r.event_id: r.cs
        for r in ev.withColumn(
            "cs",
            F.sum("one").over(
                W.partitionBy("event_type")
                .orderBy("event_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        ).collect()
    }
    assert got == want


def test_distributed_cumsum_no_partition_cols(spark):
    from flink_tank_spark.operators.rank import distributed_cumsum

    df = spark.range(500).select(F.col("id"), (F.col("id") % 7).alias("v"))
    got = {r.id: r.cs for r in distributed_cumsum(df, ["id"], "v", out_col="cs").collect()}
    want = {
        r.id: r.cs
        for r in df.withColumn(
            "cs",
            F.sum("v").over(
                W.orderBy("id").rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        ).collect()
    }
    assert got == want
