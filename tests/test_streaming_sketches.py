"""Streaming-incremental sketches (streaming/sketches.py): the folded
CMS / HLL / histogram states must equal from-scratch batch builds over
the same events BIT-exactly — regardless of micro-batch split, across a
checkpoint restart, and after compaction. Merge associativity (MAX for
registers, SUM for counters and bins) is what makes exact equality the
required outcome, not an approximation bound.
"""

from __future__ import annotations

import json
import os

import pytest

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import bloom, sketch
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming import sketches as ssk


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


def _expected(ev):
    cms = {
        (r.row, r.col, r.cnt)
        for r in sketch.cms_counters(ssk._user_key(ev), "user_key").collect()
    }
    hll = {
        (r.event_type, r.register, r.rho)
        for r in sketch.hll_registers(
            ssk._user_day(ev), "user_day", ["event_type"]
        ).collect()
    }
    hist = {
        (r.event_type, r.bin, r.n)
        for r in sketch.fp_histogram(ev, "value", ["event_type"]).collect()
    }
    kmv = {
        (r.event_type, tuple(r.ks))
        for r in sketch.kmv_sketch(
            ssk._user_day(ev), "user_day", ["event_type"]
        ).collect()
    }
    blm = {
        (r.word, r.bits)
        for r in bloom.bloom_words(
            ssk._user_key(ev), "user_key", ssk.BLOOM_M_BITS, ssk.BLOOM_K
        ).collect()
    }
    return cms, hll, hist, kmv, blm


def _folded(spark, sketch_dir):
    m = ssk.load_sketches(spark, sketch_dir)
    return (
        {(r.row, r.col, r.cnt) for r in m["cms"].collect()},
        {(r.event_type, r.register, r.rho) for r in m["hll"].collect()},
        {(r.event_type, r.bin, r.n) for r in m["hist"].collect()},
        {(r.event_type, tuple(r.ks)) for r in m["kmv"].collect()},
        {(r.word, r.bits) for r in m["bloom"].collect()},
    )


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def test_streamed_sketches_equal_batch_build(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    rows = [r.asDict() for r in ev.collect()]
    expected = _expected(ev)
    assert all(expected), "fixture produced an empty sketch table"

    src = str(tmp_path / "in")
    sk, ck = str(tmp_path / "sk"), str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(ssk.start_sketch_job(spark, src, sk, ck))
    assert _folded(spark, sk) == expected


def test_restart_resumes_and_stays_batch_equal(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    rows = [r.asDict() for r in ev.collect()]
    src = str(tmp_path / "in")
    sk, ck = str(tmp_path / "sk"), str(tmp_path / "ck")

    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(ssk.start_sketch_job(spark, src, sk, ck))
    # restart from the same checkpoint with new arrivals
    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(ssk.start_sketch_job(spark, src, sk, ck))
    assert _folded(spark, sk) == _expected(ev)


def test_compact_folds_to_one_partition_and_preserves_state(
    spark, sf_dir, tmp_path
):
    ev = _events(spark, sf_dir)
    rows = [r.asDict() for r in ev.collect()]
    src = str(tmp_path / "in")
    sk, ck = str(tmp_path / "sk"), str(tmp_path / "ck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(ssk.start_sketch_job(spark, src, sk, ck))

    before = _folded(spark, sk)
    ssk.compact(spark, sk)
    for subdir in ssk._SUBDIRS:
        assert compaction.parts(os.path.join(sk, subdir)) == [
            compaction.MERGED_PART
        ]
    assert _folded(spark, sk) == before == _expected(ev)

    # post-compact ingest keeps merging correctly (merged part id -1
    # sorts below any replayed batch id)
    _write_jsonl(src, "b3.jsonl", rows[0::7])
    _drain(ssk.start_sketch_job(spark, src, sk, ck))
    ev2 = ev.unionAll(
        spark.createDataFrame([r for i, r in enumerate(rows) if i % 7 == 0],
                              ev.schema)
    )
    assert _folded(spark, sk) == _expected(ev2)


def test_interrupted_compact_is_detected(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    rows = [r.asDict() for r in ev.collect()]
    src = str(tmp_path / "in")
    sk, ck = str(tmp_path / "sk"), str(tmp_path / "ck")
    _write_jsonl(src, "b0.jsonl", rows)
    _drain(ssk.start_sketch_job(spark, src, sk, ck))

    # simulate a crash inside the swap window: tmp written, originals
    # hidden, commit not yet done
    base = os.path.join(sk, ssk.CMS_SUBDIR)
    m = ssk.load_sketches(spark, sk)
    m["cms"].write.mode("overwrite").parquet(
        os.path.join(base, compaction.TMP_NAME)
    )
    for p in compaction.parts(base):
        os.rename(os.path.join(base, p),
                  os.path.join(base, compaction.OLD_PREFIX + p))
    with pytest.raises(RuntimeError):
        ssk.load_sketches(spark, sk)
    # recover() rolls forward and the state reads again, unchanged
    compaction.recover(base)
    assert _folded(spark, sk) == _expected(ev)
