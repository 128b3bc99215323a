"""Streaming-incremental anomaly monitor (streaming/anomaly.py): the
derived 3σ outlier report must equal ev_value_outliers over the same
events bit-exactly — across micro-batch splits, a checkpoint restart,
compaction, and (the derive-at-read property) when a late straggler
flips an old day's verdicts.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.analytics import ev_value_outliers
from flink_tank_spark.streaming import anomaly as an
from flink_tank_spark.streaming import compaction


def _events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({
                "event_id": r["event_id"], "ts": str(r["ts"]),
                "user_id": r["user_id"], "event_type": r["event_type"],
                "value": r["value"],
            }) + "\n")


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_streamed_outliers_equal_batch(spark, sf_dir, tmp_path):
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    expected = _rows(ev_value_outliers(spark, sf_dir))
    assert expected and any(r[2] > 0 for r in expected), (
        "fixture produced no outliers — the parity check would be vacuous"
    )

    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(an.start_anomaly_job(spark, src, sd, ck))
    assert _rows(an.load_outliers(spark, sd)) == expected


def test_late_straggler_flips_an_old_day(spark, sf_dir, tmp_path):
    """Hold back the most extreme-valued events; when they finally
    arrive (after a restart), the report equals the batch answer —
    their own day's stats shift and verdicts re-derive correctly."""
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    rows_sorted = sorted(rows, key=lambda r: r["value"])
    late, on_time = rows_sorted[-20:], rows_sorted[:-20]

    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", on_time)
    _drain(an.start_anomaly_job(spark, src, sd, ck))
    partial = _rows(an.load_outliers(spark, sd))

    _write_jsonl(src, "b1.jsonl", late)
    _drain(an.start_anomaly_job(spark, src, sd, ck))
    final = _rows(an.load_outliers(spark, sd))
    assert final == _rows(ev_value_outliers(spark, sf_dir))
    assert final != partial  # the stragglers changed some verdicts


def test_compaction_preserves_report(spark, sf_dir, tmp_path):
    rows = [r.asDict() for r in _events(spark, sf_dir).collect()]
    src = str(tmp_path / "in")
    sd, ck = str(tmp_path / "st"), str(tmp_path / "ck")
    for i in range(2):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::2])
    _drain(an.start_anomaly_job(spark, src, sd, ck))
    before = _rows(an.load_outliers(spark, sd))
    an.compact(spark, sd)
    assert compaction.parts(os.path.join(sd, an.ANOMALY_SUBDIR)) == [
        compaction.MERGED_PART
    ]
    assert _rows(an.load_outliers(spark, sd)) == before == _rows(
        ev_value_outliers(spark, sf_dir)
    )
