"""Lifecycle contract of the shared-stage cache (plans/shared.py)."""

from __future__ import annotations

from pyspark import StorageLevel

from flink_tank_spark.plans import shared


def _df(spark, n=3):
    return spark.range(n)


def test_same_params_return_same_persisted_object(spark):
    shared.clear(spark)
    builds = []

    def build():
        builds.append(1)
        return _df(spark)

    a = shared.stage(spark, "t_stage", ("p",), build)
    b = shared.stage(spark, "t_stage", ("p",), build)
    assert a is b, "re-invocation must reuse, not re-persist (the r2 leak)"
    assert len(builds) == 1
    assert a.storageLevel == StorageLevel.MEMORY_AND_DISK
    shared.clear(spark)


def test_param_change_replaces_and_unpersists_old_entry(spark):
    shared.clear(spark)
    a = shared.stage(spark, "t_stage", ("p1",), lambda: _df(spark))
    a.count()  # materialize the cache
    b = shared.stage(spark, "t_stage", ("p2",), lambda: _df(spark, 5))
    assert b is not a
    assert a.storageLevel == StorageLevel.NONE, "old entry must be unpersisted"
    # at most one live entry per stage name -> bounded cache
    assert shared.stage(spark, "t_stage", ("p2",), lambda: _df(spark)) is b
    shared.clear(spark)


def test_clear_unpersists_everything(spark):
    shared.clear(spark)
    a = shared.stage(spark, "t_stage_a", (), lambda: _df(spark))
    b = shared.stage(spark, "t_stage_b", (), lambda: _df(spark))
    shared.clear(spark)
    assert a.storageLevel == StorageLevel.NONE
    assert b.storageLevel == StorageLevel.NONE
    # rebuilt fresh afterwards
    assert shared.stage(spark, "t_stage_a", (), lambda: _df(spark)) is not a
    shared.clear(spark)


def test_disable_bypasses_cache_and_persistence(spark):
    shared.clear(spark)
    shared.DISABLE = True
    try:
        a = shared.stage(spark, "t_stage", (), lambda: _df(spark))
        b = shared.stage(spark, "t_stage", (), lambda: _df(spark))
        assert a is not b
        assert a.storageLevel == StorageLevel.NONE
    finally:
        shared.DISABLE = False
