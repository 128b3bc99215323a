"""Write-path layout tests: partition pruning + bucketed shuffle-free joins."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table, write_partitioned


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_year")
    write_partitioned(
        orders.withColumn("o_year", F.year("o_orderdate")), path, ["o_year"]
    )
    back = spark.read.parquet(path).filter(F.col("o_year") == 1996)
    plan = _explain(back)
    assert "PartitionFilters" in plan and "o_year" in plan
    # pruned read returns exactly the 1996 orders
    expected = orders.filter(F.year("o_orderdate") == 1996).count()
    assert back.count() == expected


def _drop_table_and_location(spark, name: str) -> None:
    # saveAsTable writes into the session warehouse dir; a table dropped
    # from a FRESH session's catalog leaves its directory behind, so a
    # re-run would die with LOCATION_ALREADY_EXISTS. Scrub both.
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


def test_bucketed_join_skips_shuffle(spark, sf_dir, tmp_path):
    from flink_tank_spark.io.tables import write_bucketed

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    _drop_table_and_location(spark, "t_orders_b")
    _drop_table_and_location(spark, "t_lineitem_b")
    write_bucketed(orders, "t_orders_b", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "t_lineitem_b",
        ["o_orderkey"], n_buckets=8,
    )
    a = spark.table("t_orders_b")
    b = spark.table("t_lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = _explain(joined)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # bucketed-bucketed equi-join on the bucket column: no shuffle
    # exchange feeds the join (bucket layout replaces it)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan


def test_compact_partitioned_collapses_small_files(spark, sf_dir, tmp_path):
    """Compaction: a many-small-files partitioned dataset is rewritten to
    files_per_partition files per partition dir, data unchanged."""
    import glob

    from flink_tank_spark.io.tables import compact_partitioned

    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    src = str(tmp_path / "frag")
    dest = str(tmp_path / "compact")
    # fragment: ~12 files per partition
    orders.repartition(12).write.partitionBy("o_year").parquet(src)
    frag_files = glob.glob(f"{src}/o_year=*/part-*.parquet")
    assert len(frag_files) > 20  # genuinely fragmented

    compact_partitioned(spark, src, dest, ["o_year"], files_per_partition=1)
    for d in glob.glob(f"{dest}/o_year=*"):
        assert len(glob.glob(f"{d}/part-*.parquet")) == 1, d
    # identical data
    a = spark.read.parquet(src)
    b = spark.read.parquet(dest)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
