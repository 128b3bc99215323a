"""Streaming temporal (as-of) dimension join (streaming/scd.py): each
fact micro-batch enriches against the SCD2 version valid at the fact's
event time. Pins: (1) when dimension changes land before the facts
that reference them, the streamed output is row-identical to the batch
as-of join against the final history; (2) the processing-time
semantic — a fact arriving BEFORE its dimension update sees the
version current at arrival; (3) unknown keys survive with NULL
attributes (enrichment never drops facts); (4) replayed fact batches
do not duplicate output rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

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
            f.write(json.dumps(
                {"custkey": custkey, "new_acctbal": bal, "eff_ts": ts}) + "\n")


def _write_facts(src, name, facts):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for fact_id, custkey, ts, amount in facts:
            f.write(json.dumps(
                {"fact_id": fact_id, "custkey": custkey,
                 "ts": ts, "amount": amount}) + "\n")


def _drain(q):
    q.awaitTermination(120)
    q.stop()


def _paths(tmp_path):
    return tuple(
        str(tmp_path / d)
        for d in ("dim", "upd_in", "upd_ck", "fact_in", "out", "fact_ck")
    )


def _enriched(spark, out):
    return {
        (r.fact_id, r.custkey, r.amount, r.c_mktsegment, r.acctbal,
         str(r.valid_from), r.is_current)
        for r in scd.read_enriched(spark, out).collect()
    }


def _batch_asof(spark, dim_dir, facts_df):
    scd2 = scd.scd2_view(spark, dim_dir)
    return {
        (r.fact_id, r.custkey, r.amount, r.c_mktsegment, r.acctbal,
         str(r.valid_from), r.is_current)
        for r in facts_df.join(
            scd2,
            (facts_df["custkey"] == scd2["custkey"])
            & (scd2["valid_from"] <= facts_df["ts"])
            & (scd2["valid_to"].isNull()
               | (facts_df["ts"] < scd2["valid_to"])),
            "left",
        ).select(
            facts_df["fact_id"], facts_df["custkey"], facts_df["amount"],
            scd2["c_mktsegment"], scd2["acctbal"], scd2["valid_from"],
            scd2["is_current"],
        ).collect()
    }


def test_streamed_join_matches_batch_asof_when_dim_leads(spark, tmp_path):
    dim_dir, upd_in, upd_ck, fact_in, out, fact_ck = _paths(tmp_path)
    scd.init_dim(_dim(spark), dim_dir)
    _write_updates(upd_in, "w0.jsonl", [(1, 150.0, "1995-03-01 00:00:00")])
    _write_updates(upd_in, "w1.jsonl", [(1, 175.0, "1997-06-01 00:00:00"),
                                        (2, 250.0, "1997-06-01 00:00:00")])
    _drain(scd.run_scd_stream(spark, upd_in, dim_dir, upd_ck))

    facts = [
        (10, 1, "1994-01-01 00:00:00", 5.0),   # before any update: base row
        (11, 1, "1995-03-01 00:00:00", 6.0),   # exactly at eff: NEW version
        (12, 1, "1996-01-01 00:00:00", 7.0),   # middle version
        (13, 1, "1998-01-01 00:00:00", 8.0),   # current version
        (14, 2, "1997-05-31 23:59:59", 9.0),   # one tick before: base row
        (15, 3, "1999-01-01 00:00:00", 1.0),   # never-updated key
    ]
    for i in range(3):
        _write_facts(fact_in, f"f{i}.jsonl", facts[i::3])
    _drain(scd.run_temporal_join_stream(
        spark, fact_in, dim_dir, out, fact_ck, max_files_per_trigger=1))

    facts_df = spark.createDataFrame(
        facts, "fact_id long, custkey long, ts string, amount double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = _enriched(spark, out)
    assert got == _batch_asof(spark, dim_dir, facts_df)
    by_id = {r[0]: r for r in got}
    assert by_id[10][4] == 100.0 and by_id[11][4] == 150.0
    assert by_id[12][4] == 150.0 and by_id[13][4] == 175.0
    assert by_id[14][4] == 200.0 and by_id[15][4] == 300.0


def test_processing_time_semantic_and_null_survival(spark, tmp_path):
    dim_dir, upd_in, upd_ck, fact_in, out, fact_ck = _paths(tmp_path)
    scd.init_dim(_dim(spark), dim_dir)

    # fact arrives BEFORE the dimension update that covers its ts
    _write_facts(fact_in, "f0.jsonl",
                 [(20, 1, "1996-01-01 00:00:00", 5.0),
                  (21, 99, "1996-01-01 00:00:00", 2.0)])  # unknown key
    _drain(scd.run_temporal_join_stream(
        spark, fact_in, dim_dir, out, fact_ck))

    _write_updates(upd_in, "w0.jsonl", [(1, 150.0, "1995-03-01 00:00:00")])
    _drain(scd.run_scd_stream(spark, upd_in, dim_dir, upd_ck))

    # same event time, arriving after the update
    _write_facts(fact_in, "f1.jsonl", [(22, 1, "1996-01-01 00:00:00", 6.0)])
    _drain(scd.run_temporal_join_stream(
        spark, fact_in, dim_dir, out, fact_ck))

    by_id = {r[0]: r for r in _enriched(spark, out)}
    assert by_id[20][4] == 100.0, "pre-update arrival saw the then-current version"
    assert by_id[22][4] == 150.0, "post-update arrival sees the restated version"
    assert by_id[21][3] is None and by_id[21][4] is None, (
        "unknown key survives with NULL attributes"
    )
    assert len(by_id) == 3


def test_replay_does_not_duplicate(spark, tmp_path):
    dim_dir, upd_in, upd_ck, fact_in, out, fact_ck = _paths(tmp_path)
    scd.init_dim(_dim(spark), dim_dir)
    facts = [(30, 1, "1994-01-01 00:00:00", 5.0)]
    _write_facts(fact_in, "f0.jsonl", facts)
    _drain(scd.run_temporal_join_stream(
        spark, fact_in, dim_dir, out, fact_ck))
    # simulate replay of the same micro-batch id
    facts_df = spark.createDataFrame(
        facts, "fact_id long, custkey long, ts string, amount double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    scd.temporal_enrich_sink(dim_dir, out)(facts_df, 0)
    assert len(_enriched(spark, out)) == 1
