"""Streaming-incremental near-dup (streaming/neardup.py): the streamed
verdicts must equal a from-scratch batch rebuild on the same corpus —
regardless of how the stream is split into micro-batches — and survive
restarts from the checkpoint.

The corpora here keep every LSH bucket under the cap, so batch and
streaming semantics coincide exactly (see the module docstring for the
arrival-time-cap superset argument when they don't).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import dedup
from flink_tank_spark.streaming import neardup


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")


def _collected_pairs(spark, pairs_dir):
    if not os.path.isdir(pairs_dir):
        return set()
    df = spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
    return {
        (r.id_a, r.id_b, r.n_common, r.jaccard) for r in df.collect()
    }


def _batch_pairs(docs):
    return {
        (r.id_a, r.id_b, r.n_common, r.jaccard)
        for r in dedup.lsh_near_dup_pairs(docs).collect()
    }


def test_streamed_verdicts_equal_batch_rebuild(spark, sf_dir, tmp_path):
    """Three micro-batches over the documents corpus: the union of
    emitted pairs equals lsh_near_dup_pairs over the whole corpus —
    same constants, same rescorer, pair detected exactly once."""
    docs = _docs(spark, sf_dir)
    rows = [r.asDict() for r in docs.collect()]
    # batch rebuild ground truth; also assert the cap never bites here,
    # so equality (not superset) is the required outcome
    sigs = dedup.minhash_from_shingled(
        dedup.shingle_sets(docs), n_perms=8
    )
    max_bucket = (
        dedup.lsh_bucket_rows(sigs)
        .groupBy("bucket").count().agg(F.max("count")).first()[0]
    )
    assert max_bucket <= 64, "fixture grew a degenerate bucket; pick another"
    expected = _batch_pairs(docs)
    assert expected, "corpus has no near-dups; parity test would be vacuous"

    src = str(tmp_path / "in")
    index_dir, pairs_dir = str(tmp_path / "index"), str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ck")
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    for i, chunk in enumerate(thirds):
        _write_jsonl(src, f"b{i}.jsonl", chunk)
    q = neardup.start_near_dup_job(
        spark, src, index_dir, pairs_dir, ckpt,
    )
    # one source file per micro-batch would need maxFilesPerTrigger;
    # availableNow may fold them — batch-split invariance is pinned
    # separately below, here we want the end-state contract
    q.awaitTermination(300)
    assert _collected_pairs(spark, pairs_dir) == expected


def test_batch_split_invariance_and_restart(spark, sf_dir, tmp_path):
    """The SAME corpus streamed as one batch vs. incrementally across
    three separate restarted runs (each resuming the checkpoint) gives
    identical verdicts — detection is batch-boundary-invariant and the
    accumulated index survives restart."""
    docs = _docs(spark, sf_dir)
    rows = sorted(
        (r.asDict() for r in docs.collect()), key=lambda r: r["doc_id"]
    )
    expected = _batch_pairs(docs)

    # run A: everything in one go
    src_a = str(tmp_path / "a_in")
    _write_jsonl(src_a, "all.jsonl", rows)
    qa = neardup.start_near_dup_job(
        spark, src_a, str(tmp_path / "a_idx"), str(tmp_path / "a_pairs"),
        str(tmp_path / "a_ck"),
    )
    qa.awaitTermination(300)
    got_a = _collected_pairs(spark, str(tmp_path / "a_pairs"))

    # run B: three restarts, one new file each — state must carry over
    src_b = str(tmp_path / "b_in")
    idx_b, pairs_b = str(tmp_path / "b_idx"), str(tmp_path / "b_pairs")
    ckpt_b = str(tmp_path / "b_ck")
    thirds = [rows[0::3], rows[1::3], rows[2::3]]
    for i, chunk in enumerate(thirds):
        _write_jsonl(src_b, f"b{i}.jsonl", chunk)
        qb = neardup.start_near_dup_job(
            spark, src_b, idx_b, pairs_b, ckpt_b,
        )
        qb.awaitTermination(300)
    got_b = _collected_pairs(spark, pairs_b)

    assert got_a == expected
    assert got_b == expected


def test_replayed_batch_is_idempotent(spark, tmp_path):
    """Re-running near_dup_batch's sink for the same batch id (the
    foreachBatch replay contract after a crash) overwrites its own
    partitions with identical content — no duplicate verdicts, no
    double-counted index rows."""
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta"},
        {"doc_id": 2, "text": "alpha beta gamma delta epsilon zeta theta"},
        {"doc_id": 3, "text": "completely different words entirely here now"},
    ]
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = neardup.incremental_near_dup_sink(index_dir, pairs_dir)
    batch = spark.createDataFrame(rows)
    sink(batch, 0)
    first = _collected_pairs(spark, pairs_dir)
    sink(batch, 0)  # replay
    assert _collected_pairs(spark, pairs_dir) == first
    shingle_rows = spark.read.option(
        "basePath", os.path.join(index_dir, neardup.SHINGLES_SUBDIR)
    ).parquet(os.path.join(index_dir, neardup.SHINGLES_SUBDIR)).count()
    assert shingle_rows == len(rows)


def test_cross_batch_pair_detected_once(spark, tmp_path):
    """A near-dup pair split across two batches is emitted exactly once
    (by the later batch), and an unrelated doc emits nothing."""
    base = " ".join(f"w{i}" for i in range(30))  # 28 shingles
    a = {"doc_id": 10, "text": base + " tail-a"}
    b = {"doc_id": 20, "text": base + " tail-b"}  # true J = 28/32 = 0.875
    c = {"doc_id": 30, "text": "unrelated content entirely disjoint tokens"}
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = neardup.incremental_near_dup_sink(index_dir, pairs_dir)
    sink(spark.createDataFrame([a]), 0)
    assert _collected_pairs(spark, pairs_dir) == set()
    sink(spark.createDataFrame([b, c]), 1)
    got = _collected_pairs(spark, pairs_dir)
    assert {(p[0], p[1]) for p in got} == {(10, 20)}
    # batch rebuild agreement on the union
    full = spark.createDataFrame([a, b, c])
    assert got == _batch_pairs(full)


def test_compaction_preserves_verdicts(spark, sf_dir, tmp_path):
    """compact() folds the shingle/bucket partitions into
    ingest_batch=-1; subsequent batches see the same accumulated index
    and the final verdicts still equal the batch rebuild."""
    docs = _docs(spark, sf_dir)
    expected = _batch_pairs(docs)
    rows = sorted((r.asDict() for r in docs.collect()),
                  key=lambda r: r["doc_id"])
    thirds = [rows[0::3], rows[1::3], rows[2::3]]

    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = neardup.incremental_near_dup_sink(index_dir, pairs_dir)
    for i, chunk in enumerate(thirds[:2]):
        sink(spark.createDataFrame(chunk), i)
    neardup.compact(spark, index_dir)
    for sub in (neardup.SHINGLES_SUBDIR, neardup.BUCKETS_SUBDIR):
        base = os.path.join(index_dir, sub)
        assert sorted(
            e for e in os.listdir(base) if e.startswith("ingest_batch=")
        ) == ["ingest_batch=-1"]
    sink(spark.createDataFrame(thirds[2]), 2)
    assert _collected_pairs(spark, pairs_dir) == expected


def test_interrupted_compact_detected_and_recovered(spark, tmp_path):
    """A compact interrupted at ANY point must never be misread. The
    old swap (write tmp -> delete originals -> rename) had a window
    where a crash left zero visible partitions and the next stream
    start silently treated the corpus as fresh; the hide -> commit ->
    clean protocol makes every interrupted state detectable
    (readers raise) and recoverable (compact rolls back/forward)."""
    import pytest

    from flink_tank_spark.streaming import compaction

    base_text = " ".join(f"w{i}" for i in range(30))
    rows = [
        {"doc_id": 1, "text": base_text + " tail-a"},
        {"doc_id": 2, "text": base_text + " tail-b"},  # true J = 0.875
    ]
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = neardup.incremental_near_dup_sink(index_dir, pairs_dir)
    sink(spark.createDataFrame([rows[0]]), 0)
    base = os.path.join(index_dir, neardup.SHINGLES_SUBDIR)

    # legacy fatal state: tmp exists, zero visible partitions
    os.rename(
        os.path.join(base, "ingest_batch=0"),
        os.path.join(base, compaction.TMP_NAME),
    )
    with pytest.raises(RuntimeError, match="interrupted compact"):
        sink(spark.createDataFrame([rows[1]]), 1)
    # recovery: a tmp with no hidden originals is a stale partial write
    # of a NOT-yet-started swap — but here there are no originals at
    # all, so rebuild the partition instead of recovering blind
    os.rename(
        os.path.join(base, compaction.TMP_NAME),
        os.path.join(base, "ingest_batch=0"),
    )

    # mid-hide / pre-commit state: originals hidden, tmp present
    os.makedirs(os.path.join(base, compaction.TMP_NAME))
    os.rename(
        os.path.join(base, "ingest_batch=0"),
        os.path.join(base, compaction.OLD_PREFIX + "ingest_batch=0"),
    )
    with pytest.raises(RuntimeError, match="interrupted compact"):
        sink(spark.createDataFrame([rows[1]]), 1)
    compaction.recover(base)  # rolls back: originals restored, tmp gone
    assert compaction.parts(base) == ["ingest_batch=0"]
    assert not os.path.exists(os.path.join(base, compaction.TMP_NAME))

    # post-commit state: merged partition visible, leftover hidden dir
    neardup.compact(spark, index_dir)
    os.makedirs(os.path.join(base, compaction.OLD_PREFIX + "ingest_batch=0"))
    with pytest.raises(RuntimeError, match="interrupted compact"):
        sink(spark.createDataFrame([rows[1]]), 1)
    compaction.recover(base)  # rolls forward: leftover deleted
    assert compaction.parts(base) == ["ingest_batch=-1"]

    # after recovery the stream resumes and still finds the cross-batch
    # pair against the compacted index
    sink(spark.createDataFrame([rows[1]]), 1)
    got = {(p[0], p[1]) for p in _collected_pairs(spark, pairs_dir)}
    assert got == {(1, 2)}


def test_read_index_ignores_crashed_first_batch_partition(spark, tmp_path):
    """A replayed FIRST batch whose crashed attempt already wrote its
    own ingest_batch=0 partition must see a fresh index (None), not an
    empty frame — the existence check applies the same < before_batch
    rule as the content filter."""
    rows = [{"doc_id": 1, "text": "alpha beta gamma delta epsilon"}]
    index_dir, pairs_dir = str(tmp_path / "idx"), str(tmp_path / "pairs")
    sink = neardup.incremental_near_dup_sink(index_dir, pairs_dir)
    sink(spark.createDataFrame(rows), 0)  # the "crashed attempt"
    assert (
        neardup._read_index(spark, index_dir, neardup.SHINGLES_SUBDIR, 0)
        is None
    )
    assert (
        neardup._read_index(spark, index_dir, neardup.SHINGLES_SUBDIR, 1)
        is not None
    )


def test_streamed_split_leakage_equals_batch_audit(spark, sf_dir, tmp_path):
    """Governance-over-streaming closure: running the split-leakage
    audit (plans/llm.doc_split_leakage semantics — split is a pure
    projection of the doc id) over pairs emitted by the STREAMING sink
    equals the batch audit over the same corpus. Because assignment is
    content-derived and never changes as the corpus grows, the audit
    needs no re-computation on ingest: each newly emitted pair can be
    classified the moment it appears."""
    from flink_tank_spark.plans.llm import _split_col, doc_split_leakage

    docs = _docs(spark, sf_dir)
    rows = [r.asDict() for r in docs.collect()]
    src = str(tmp_path / "in")
    pairs_dir = str(tmp_path / "pairs")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    q = neardup.start_near_dup_job(
        spark, src, str(tmp_path / "idx"), pairs_dir, str(tmp_path / "ck"),
    )
    q.awaitTermination(300)

    streamed = spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
    streamed_leaks = {
        (r.id_a, r.id_b, r.split_a, r.split_b)
        for r in streamed.select(
            "id_a", "id_b",
            _split_col(F.col("id_a")).alias("split_a"),
            _split_col(F.col("id_b")).alias("split_b"),
        ).filter(F.col("split_a") != F.col("split_b")).collect()
    }
    batch_leaks = {
        (r.id_a, r.id_b, r.split_a, r.split_b)
        for r in doc_split_leakage(spark, sf_dir).collect()
    }
    assert streamed_leaks == batch_leaks
    assert batch_leaks, "no cross-split near-dup at this sf; vacuous"
