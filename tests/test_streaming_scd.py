"""Streaming SCD2 dimension maintenance (streaming/scd.py): the view
over the incrementally-landed change log must equal the batch
scd2_apply post-image for a single update wave, chain versions across
waves, and survive replay of an already-landed micro-batch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.plans.scd import scd2_apply
from flink_tank_spark.streaming import scd


def _dim(spark):
    rows = [
        (1, "alpha", "BUILDING", 100.0),
        (2, "beta", "MACHINERY", 200.0),
        (3, "gamma", "BUILDING", 300.0),
    ]
    return spark.createDataFrame(
        rows, "custkey long, c_name string, c_mktsegment string, acctbal double"
    ).withColumn("valid_from", F.lit("1992-01-01").cast("timestamp"))


def _write_updates(src, name, updates):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for custkey, bal, ts in updates:
            f.write(
                json.dumps(
                    {"custkey": custkey, "new_acctbal": bal, "eff_ts": ts}
                )
                + "\n"
            )


def _drain(spark, src, dim_dir, ckpt):
    q = scd.run_scd_stream(spark, src, dim_dir, ckpt)
    q.awaitTermination(120)
    q.stop()


def _history(spark, dim_dir):
    return {
        (r.custkey, r.c_name, r.acctbal, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd.scd2_view(spark, dim_dir).collect()
    }


def test_single_wave_matches_batch_apply(spark, tmp_path):
    dim_dir, src, ckpt = (
        str(tmp_path / "dim"), str(tmp_path / "in"), str(tmp_path / "ck")
    )
    dim = _dim(spark)
    scd.init_dim(dim, dim_dir)
    _write_updates(src, "w0.jsonl", [(1, 150.0, "1995-03-01 00:00:00"),
                                     (3, 275.0, "1995-03-01 00:00:00")])
    _drain(spark, src, dim_dir, ckpt)

    updates = spark.createDataFrame(
        [(1, 150.0), (3, 275.0)], "custkey long, new_acctbal double"
    ).withColumn("eff_ts", F.lit("1995-03-01").cast("timestamp"))
    expected = {
        (r.custkey, r.c_name, r.acctbal, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in scd2_apply(dim, updates).collect()
    }
    assert _history(spark, dim_dir) == expected


def test_multi_wave_chains_versions_and_replay_is_idempotent(spark, tmp_path):
    dim_dir, src, ckpt = (
        str(tmp_path / "dim"), str(tmp_path / "in"), str(tmp_path / "ck")
    )
    scd.init_dim(_dim(spark), dim_dir)
    _write_updates(src, "w0.jsonl", [(1, 150.0, "1995-03-01 00:00:00")])
    _drain(spark, src, dim_dir, ckpt)
    _write_updates(src, "w1.jsonl", [(1, 175.0, "1996-07-01 00:00:00"),
                                     (2, 250.0, "1996-07-01 00:00:00")])
    _drain(spark, src, dim_dir, ckpt)

    hist = scd.scd2_view(spark, dim_dir)
    k1 = sorted(
        ((r.acctbal, str(r.valid_from), str(r.valid_to), r.is_current)
         for r in hist.filter(F.col("custkey") == 1).collect()),
        key=lambda t: t[1],
    )
    # three chained versions: 100 -> 150 -> 175; middle version CLOSED by
    # the second wave — history a single MERGE post-image cannot express
    assert [round(v[0]) for v in k1] == [100, 150, 175]
    assert k1[0][2] == k1[1][1] and k1[1][2] == k1[2][1]
    assert [v[3] for v in k1] == [False, False, True]
    assert hist.filter(F.col("is_current")).count() == 3

    before = _history(spark, dim_dir)
    # crash-replay surrogate: a sink that died after writing but before
    # the checkpoint commit re-executes the SAME batch id on restart;
    # the per-partition overwrite must leave the log (and view) identical
    replay = spark.createDataFrame(
        [(1, 175.0), (2, 250.0)], "custkey long, new_acctbal double"
    ).withColumn("eff_ts", F.lit("1996-07-01").cast("timestamp"))
    scd.incremental_scd_sink(dim_dir)(replay, 1)
    assert _history(spark, dim_dir) == before


def test_compact_preserves_history(spark, tmp_path):
    dim_dir, src, ckpt = (
        str(tmp_path / "dim"), str(tmp_path / "in"), str(tmp_path / "ck")
    )
    scd.init_dim(_dim(spark), dim_dir)
    _write_updates(src, "w0.jsonl", [(1, 150.0, "1995-03-01 00:00:00")])
    _drain(spark, src, dim_dir, ckpt)
    _write_updates(src, "w1.jsonl", [(2, 250.0, "1996-07-01 00:00:00")])
    _drain(spark, src, dim_dir, ckpt)
    before = _history(spark, dim_dir)
    scd.compact(spark, dim_dir)
    from flink_tank_spark.streaming import compaction

    assert compaction.parts(os.path.join(dim_dir, "changes")) == ["ingest_batch=-1"]
    assert _history(spark, dim_dir) == before


def test_duplicate_version_timestamp_fails_loudly(spark, tmp_path):
    # the update contract (one update per key per batch, distinct
    # eff_ts) is ENFORCED, not assumed: a duplicate (custkey, eff_ts)
    # would make the lead() chain nondeterministic, so the view must
    # raise instead of silently emitting a zero-length version interval
    import pytest
    from py4j.protocol import Py4JJavaError

    dim_dir = str(tmp_path / "dim")
    scd.init_dim(_dim(spark), dim_dir)
    dup = spark.createDataFrame(
        [(1, 150.0), (1, 160.0)], "custkey long, new_acctbal double"
    ).withColumn("eff_ts", F.lit("1995-03-01").cast("timestamp"))
    scd.incremental_scd_sink(dim_dir)(dup, 0)
    with pytest.raises((Py4JJavaError, Exception), match="duplicate \\(custkey, valid_from\\)"):
        scd.scd2_view(spark, dim_dir).collect()


def test_contract_guard_passes_clean_history(spark, tmp_path):
    dim_dir = str(tmp_path / "dim")
    scd.init_dim(_dim(spark), dim_dir)
    ok = spark.createDataFrame(
        [(1, 150.0), (2, 250.0)], "custkey long, new_acctbal double"
    ).withColumn("eff_ts", F.lit("1995-03-01").cast("timestamp"))
    scd.incremental_scd_sink(dim_dir)(ok, 0)
    hist = _history(spark, dim_dir)
    assert len(hist) == 5  # 3 base + 2 updates
