"""Incremental materialized-view maintenance (streaming/matview.py):
the folded pricing-summary state must equal q1_pricing_summary over the
same lineitems BIT-exactly — regardless of micro-batch split, across a
checkpoint restart, after foreachBatch replay, and after compaction.
Exact fixed-point sums fold associatively, so equality (including the
derived averages' doubles) is the required outcome, not a tolerance.
"""

from __future__ import annotations

import json
import os

import pytest

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.tpch import q1_pricing_summary
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming import matview as mv

_COLS = [
    "l_orderkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount",
    "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
]


def _lineitems(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(*_COLS)


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            d = {c: r[c] for c in _COLS}
            d["l_shipdate"] = str(d["l_shipdate"])
            f.write(json.dumps(d) + "\n")


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_streamed_view_equals_q1_bit_exactly(spark, sf_dir, tmp_path):
    li = _lineitems(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    expected = _rows(q1_pricing_summary(spark, sf_dir))
    assert expected, "fixture produced an empty rollup"

    src = str(tmp_path / "in")
    vd, ck = str(tmp_path / "mv"), str(tmp_path / "ck")
    for i in range(4):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::4])
    _drain(mv.start_matview_job(spark, src, vd, ck))
    got = _rows(mv.load_pricing_summary(spark, vd))
    assert got == expected  # bit-exact, doubles included


def test_restart_resumes_and_stays_batch_equal(spark, sf_dir, tmp_path):
    li = _lineitems(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    src = str(tmp_path / "in")
    vd, ck = str(tmp_path / "mv"), str(tmp_path / "ck")

    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(mv.start_matview_job(spark, src, vd, ck))
    # restart from the same checkpoint with new arrivals
    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(mv.start_matview_job(spark, src, vd, ck))
    assert _rows(mv.load_pricing_summary(spark, vd)) == _rows(
        q1_pricing_summary(spark, sf_dir)
    )


def test_replayed_batch_is_idempotent(spark, sf_dir, tmp_path):
    li = _lineitems(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    src = str(tmp_path / "in")
    vd, ck = str(tmp_path / "mv"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", rows)
    _drain(mv.start_matview_job(spark, src, vd, ck))
    before = _rows(mv.load_pricing_summary(spark, vd))

    # simulate a foreachBatch replay of the same batch content: the
    # sink must rewrite the same partition, not double-count
    batch = spark.createDataFrame(rows, _lineitems(spark, sf_dir).schema)
    mv.incremental_matview_sink(vd)(batch, 0)
    assert _rows(mv.load_pricing_summary(spark, vd)) == before


def test_compact_folds_to_one_partition_and_preserves_view(
    spark, sf_dir, tmp_path
):
    li = _lineitems(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    src = str(tmp_path / "in")
    vd, ck = str(tmp_path / "mv"), str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(mv.start_matview_job(spark, src, vd, ck))

    before = _rows(mv.load_pricing_summary(spark, vd))
    mv.compact(spark, vd)
    assert compaction.parts(os.path.join(vd, mv.MV_SUBDIR)) == [
        compaction.MERGED_PART
    ]
    assert _rows(mv.load_pricing_summary(spark, vd)) == before

    # post-compact ingest keeps folding correctly
    _write_jsonl(src, "b3.jsonl", rows[0::5])
    _drain(mv.start_matview_job(spark, src, vd, ck))
    ev2 = li.unionAll(
        spark.createDataFrame(
            [r for i, r in enumerate(rows) if i % 5 == 0], li.schema
        )
    )
    # q1 over the unioned rows, via a temp parquet round-trip for parity
    p = str(tmp_path / "union_sf")
    ev2.write.mode("overwrite").parquet(f"{p}/lineitem.parquet")
    assert _rows(mv.load_pricing_summary(spark, vd)) == _rows(
        q1_pricing_summary(spark, p)
    )


def test_interrupted_compact_is_detected(spark, sf_dir, tmp_path):
    li = _lineitems(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    src = str(tmp_path / "in")
    vd, ck = str(tmp_path / "mv"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", rows)
    _drain(mv.start_matview_job(spark, src, vd, ck))

    base = os.path.join(vd, mv.MV_SUBDIR)
    state = spark.read.option("basePath", base).parquet(base).drop("ingest_batch")
    state.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    for p in compaction.parts(base):
        os.rename(os.path.join(base, p),
                  os.path.join(base, compaction.OLD_PREFIX + p))
    with pytest.raises(RuntimeError):
        mv.load_pricing_summary(spark, vd)
    compaction.recover(base)
    assert _rows(mv.load_pricing_summary(spark, vd)) == _rows(
        q1_pricing_summary(spark, sf_dir)
    )


def test_star_join_view_equals_batch_join_aggregate(spark, sf_dir, tmp_path):
    """The nation-revenue star view (fact stream ⋈ static dims at
    ingest) folds to the batch join+aggregate bit-exactly, and both
    views stay correct maintained side-by-side from one batch scan."""
    from pyspark.sql import functions as F

    from flink_tank_spark.functions.numeric import dsum

    li = _lineitems(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    dims = mv.supplier_nation_dims(spark, sf_dir)
    expected = [
        tuple(r)
        for r in (
            li.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
            .groupBy("n_name")
            .agg(
                dsum(
                    F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                    "revenue",
                ),
                F.count(F.lit(1)).alias("n_lineitems"),
            )
            .orderBy("n_name")
            .collect()
        )
    ]
    assert expected, "fixture produced an empty star view"

    src = str(tmp_path / "in")
    vd, ck = str(tmp_path / "mv"), str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(mv.start_matview_job(spark, src, vd, ck, dims=dims))
    assert _rows(mv.load_nation_revenue(spark, vd)) == expected
    # the pricing view was maintained from the same scan
    assert _rows(mv.load_pricing_summary(spark, vd)) == _rows(
        q1_pricing_summary(spark, sf_dir)
    )
    # compaction folds BOTH states and preserves both views
    mv.compact(spark, vd)
    for sub in (mv.MV_SUBDIR, mv.NATION_SUBDIR):
        assert compaction.parts(os.path.join(vd, sub)) == [compaction.MERGED_PART]
    assert _rows(mv.load_nation_revenue(spark, vd)) == expected
