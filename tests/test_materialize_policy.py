"""Session-level cluster-safe materialization policy (r15).

materialize.ckpt is the single lineage-truncation helper: local default
unchanged (localCheckpoint), SPARK_GRAFT_RELIABLE_CKPT flips every
un-plumbed call site to reliable checkpoint() (with the
SPARK_GRAFT_CKPT_DIR fallback so the flag cannot fail at action time),
and an explicit caller flag still wins. plans/shared.stage honors the
companion SPARK_GRAFT_STAGE_DIR switch (persist -> parquet stage).
Values must be identical through every branch.
"""

from __future__ import annotations

import os

from flink_tank_spark import materialize
from flink_tank_spark.plans import shared

ROWS = [(1, "a"), (2, "b"), (3, "c")]


def _vals(df):
    return sorted((r[0], r[1]) for r in df.collect())


def test_ckpt_default_is_local(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_RELIABLE_CKPT", raising=False)
    df = spark.createDataFrame(ROWS, ["k", "v"])
    out = materialize.ckpt(df, eager=True)
    assert out.rdd.context is spark.sparkContext
    assert _vals(out) == _vals(df)
    # localCheckpoint leaves no files behind and needs no checkpoint dir
    assert not materialize.reliable_default()


def test_ckpt_env_switch_uses_reliable_checkpoint(spark, tmp_path, monkeypatch):
    ckpt_dir = str(tmp_path / "ckpt")
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CKPT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CKPT_DIR", ckpt_dir)
    assert materialize.reliable_default()
    df = spark.createDataFrame(ROWS, ["k", "v"])
    out = materialize.ckpt(df, eager=True)
    assert _vals(out) == _vals(df)
    # the env fallback set the dir and the reliable checkpoint wrote files
    got_dir = spark.sparkContext.getCheckpointDir()
    assert got_dir is not None and "ckpt" in got_dir
    walked = [f for _, _, fs in os.walk(ckpt_dir) for f in fs]
    assert walked, "reliable checkpoint() must write files under SPARK_GRAFT_CKPT_DIR"


def test_ckpt_explicit_flag_wins_over_env(spark, tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_RELIABLE_CKPT", "1")
    monkeypatch.setenv("SPARK_GRAFT_CKPT_DIR", str(tmp_path / "unused"))
    df = spark.createDataFrame(ROWS, ["k", "v"])
    out = materialize.ckpt(df, reliable=False, eager=True)
    assert _vals(out) == _vals(df)
    assert not (tmp_path / "unused").exists(), "explicit reliable=False must not checkpoint"


def test_stage_parquet_mode_materializes_and_memoizes(spark, tmp_path, monkeypatch):
    stage_dir = str(tmp_path / "stages")
    monkeypatch.setenv("SPARK_GRAFT_STAGE_DIR", stage_dir)
    shared.clear(spark)
    calls = []

    def build():
        calls.append(1)
        return spark.createDataFrame(ROWS, ["k", "v"])

    a = shared.stage(spark, "policy_test_stage", ("p",), build)
    b = shared.stage(spark, "policy_test_stage", ("p",), build)
    assert len(calls) == 1, "second call must return the memoized stage"
    assert _vals(a) == _vals(b) == sorted(ROWS)
    app_dir = os.path.join(stage_dir, spark.sparkContext.applicationId)
    assert os.path.isdir(os.path.join(app_dir, "policy_test_stage"))
    shared.clear(spark)
