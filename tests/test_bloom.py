"""Bloom-filter build/probe (operators/bloom.py): zero false negatives
by construction, false-positive rate near design, pure-codegen plan
(no Python crossing, probe side never shuffles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_tank_spark.operators import bloom


def _keys(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_params_shape():
    m, k = bloom.bloom_params(10_000, fpp=0.01)
    assert m % 64 == 0
    assert m / 10_000 == pytest.approx(9.585, abs=0.1)  # bits/key at 1%
    assert k == 7
    m2, _ = bloom.bloom_params(10_000, fpp=0.001)
    assert m2 > m


def test_no_false_negatives_and_fp_rate(spark):
    m, k = bloom.bloom_params(2_000, fpp=0.01)
    build = _keys(spark, 0, 2_000)
    filt = bloom.bloom_build(build, "k", m, k)
    # every inserted key passes
    hits = bloom.bloom_probe(build, "k", filt, m, k).count()
    assert hits == 2_000
    # disjoint probe keys pass at ~fpp
    misses = _keys(spark, 1_000_000, 1_020_000)
    fp = bloom.bloom_probe(misses, "k", filt, m, k).count()
    assert fp / 20_000 < 0.05


def test_insert_idempotent_and_merge_free(spark):
    """Duplicated build input yields the identical filter map."""
    m, k = bloom.bloom_params(500, fpp=0.01)
    once = bloom.bloom_build(_keys(spark, 0, 500), "k", m, k).first()["bloom"]
    twice = bloom.bloom_build(
        _keys(spark, 0, 500).unionAll(_keys(spark, 0, 500)), "k", m, k
    ).first()["bloom"]
    assert once == twice


def test_rejects_unaligned_m(spark):
    with pytest.raises(ValueError):
        bloom.bloom_build(_keys(spark, 0, 10), "k", 100, 3)


def test_probe_plan_is_codegen_filter(spark):
    """The probe is a broadcast + filter: no shuffle of the probed side,
    no Python eval in the plan."""
    m, k = bloom.bloom_params(1_000, fpp=0.01)
    filt = bloom.bloom_build(_keys(spark, 0, 1_000), "k", m, k)
    plan = (
        bloom.bloom_probe(_keys(spark, 0, 100_000), "k", filt, m, k)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Python" not in plan
    # the probed range never exchanges
    probe_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in probe_side
