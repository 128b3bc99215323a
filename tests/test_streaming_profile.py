"""Streaming-incremental column profile (streaming/profile.py): the
folded state must equal the batch ``profile_numeric`` over the same
rows BIT-exactly — regardless of micro-batch split, across a
checkpoint restart, and after compaction. Counts fold by SUM, extrema
by MIN/MAX, exact distincts by distinct-of-union; exact equality is the
contract, not an approximation bound.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.profile import PROFILE_COLS, profile_numeric
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming import profile as sprof


def _lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({c: r[c] for c in PROFILE_COLS}) + "\n")


def _profile_set(df):
    return {
        (r.col_name, r.n_rows, r.n_null, r.n_distinct, r.min_val, r.max_val)
        for r in df.collect()
    }


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _start(spark, src, pdir, ck):
    return sprof.start_profile_job(spark, src, pdir, ck, PROFILE_COLS)


def test_streamed_profile_equals_batch_build(spark, sf_dir, tmp_path):
    li = _lineitem(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    expected = _profile_set(profile_numeric(li, PROFILE_COLS))
    assert len(expected) == len(PROFILE_COLS)

    src, pdir, ck = (str(tmp_path / d) for d in ("in", "prof", "ck"))
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(_start(spark, src, pdir, ck))
    assert _profile_set(sprof.load_profile(spark, pdir)) == expected


def test_restart_resumes_and_stays_batch_equal(spark, sf_dir, tmp_path):
    li = _lineitem(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    src, pdir, ck = (str(tmp_path / d) for d in ("in", "prof", "ck"))

    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(_start(spark, src, pdir, ck))
    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(_start(spark, src, pdir, ck))
    assert _profile_set(sprof.load_profile(spark, pdir)) == _profile_set(
        profile_numeric(li, PROFILE_COLS)
    )


def test_null_column_accounting_matches_batch(spark, tmp_path):
    """A column that is entirely NULL in one batch and partially NULL in
    another must fold to the batch answer (nulls counted, excluded from
    distincts, coalesced to 0 when no value ever arrived)."""
    src, pdir, ck = (str(tmp_path / d) for d in ("in", "prof", "ck"))
    base = {c: None for c in PROFILE_COLS}
    b0 = [dict(base, l_orderkey=1, l_quantity=2.5),
          dict(base, l_orderkey=2)]
    b1 = [dict(base, l_orderkey=2, l_quantity=2.5, l_discount=0.05)]
    _write_jsonl(src, "b0.jsonl", b0)
    _drain(_start(spark, src, pdir, ck))
    _write_jsonl(src, "b1.jsonl", b1)
    _drain(_start(spark, src, pdir, ck))

    batch_df = spark.createDataFrame(
        [tuple(r[c] for c in PROFILE_COLS) for r in b0 + b1],
        sprof.LINEITEM_NUMERIC_SCHEMA,
    )
    assert _profile_set(sprof.load_profile(spark, pdir)) == _profile_set(
        profile_numeric(batch_df, PROFILE_COLS)
    )
    got = {r.col_name: r for r in sprof.load_profile(spark, pdir).collect()}
    assert got["l_tax"].n_distinct == 0 and got["l_tax"].n_null == 3
    assert got["l_quantity"].n_distinct == 1
    assert got["l_orderkey"].n_distinct == 2


def test_compact_folds_to_one_partition_and_preserves_state(
    spark, sf_dir, tmp_path
):
    li = _lineitem(spark, sf_dir)
    rows = [r.asDict() for r in li.collect()]
    src, pdir, ck = (str(tmp_path / d) for d in ("in", "prof", "ck"))
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(_start(spark, src, pdir, ck))

    before = _profile_set(sprof.load_profile(spark, pdir))
    sprof.compact(spark, pdir)
    for subdir in sprof._SUBDIRS:
        assert compaction.parts(os.path.join(pdir, subdir)) == [
            compaction.MERGED_PART
        ]
    assert _profile_set(sprof.load_profile(spark, pdir)) == before

    # post-compact ingest keeps folding correctly
    _write_jsonl(src, "b3.jsonl", rows[0::7])
    _drain(_start(spark, src, pdir, ck))
    li2 = li.unionAll(
        spark.createDataFrame(
            [tuple(r[c] for c in PROFILE_COLS)
             for i, r in enumerate(rows) if i % 7 == 0],
            li.schema,
        )
    )
    assert _profile_set(sprof.load_profile(spark, pdir)) == _profile_set(
        profile_numeric(li2, PROFILE_COLS)
    )
