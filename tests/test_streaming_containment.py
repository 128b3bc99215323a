"""Streaming-incremental containment dedup (streaming/containment.py):
the union of per-batch verdicts must equal the batch operator's pair
set bit-exactly (both blockings are lossless, verification identical),
each unordered arrival pair must be emitted exactly once, replay must
be idempotent, and the subset pair Jaccard misses must surface at
ingest time.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import dedup
from flink_tank_spark.streaming import containment as ct

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")


def _drain(q):
    q.awaitTermination(180)
    assert not q.isActive


def _batch_pairs(spark):
    sh = dedup.shingle_sets(_docs(spark))
    return {
        (r.id_a, r.id_b, r.n_common, r.containment, r.jaccard)
        for r in dedup.containment_pairs(sh).collect()
    }


def _streamed_pairs(spark, pairs_dir):
    return [
        (r.id_a, r.id_b, r.n_common, r.containment, r.jaccard)
        for r in ct.load_pairs(spark, pairs_dir).collect()
    ]


def test_streamed_union_equals_batch_and_each_pair_once(spark, tmp_path):
    rows = [r.asDict() for r in _docs(spark).collect()]
    expected = _batch_pairs(spark)
    assert expected, "fixture produced no containment pairs"

    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "idx"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck,
                                    max_files_per_trigger=1))
    got = _streamed_pairs(spark, pd_)
    assert set(got) == expected
    assert len(got) == len(set(got)), "a pair was emitted more than once"


def test_replay_is_idempotent_and_compaction_preserves(spark, tmp_path):
    rows = [r.asDict() for r in _docs(spark).collect()]
    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "idx"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    before = sorted(_streamed_pairs(spark, pd_))
    assert set(before) == _batch_pairs(spark)

    replay = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows[1::2]], "doc_id long, text string"
    )
    ct.incremental_containment_sink(idx, pd_)(replay, 1)
    assert sorted(_streamed_pairs(spark, pd_)) == before

    ct.compact(spark, idx)
    # further ingest against the compacted index still works
    extra = spark.createDataFrame(
        [(999001, rows[0]["text"])], "doc_id long, text string"
    )
    ct.incremental_containment_sink(idx, pd_)(extra, 2)
    after = _streamed_pairs(spark, pd_)
    assert set(before) <= set(after)
    assert any(r[1] == 999001 or r[0] == 999001 for r in after), (
        "re-ingested duplicate text must pair with the compacted corpus"
    )


def test_subset_pair_surfaces_at_arrival(spark, tmp_path):
    small = " ".join(f"tok{i}" for i in range(30))
    big = small + " " + " ".join(f"pad{i}" for i in range(300))
    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "idx"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    # small doc arrives first; the containing doc arrives a batch later
    _write_jsonl(src, "b0.jsonl", [{"doc_id": 1, "text": small}])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    assert _streamed_pairs(spark, pd_) == []
    _write_jsonl(src, "b1.jsonl", [{"doc_id": 2, "text": big}])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    got = _streamed_pairs(spark, pd_)
    assert [(r[0], r[1]) for r in got] == [(1, 2)]
    assert got[0][3] == 1.0 and got[0][4] < 0.2


def test_rerank_compaction_preserves_pairs_and_changes_order(spark, tmp_path):
    # ingest half, RE-RANK (accumulated-df rarest-first order), ingest
    # the rest: union of verdicts still equals the batch operator —
    # prefix filtering is lossless under any consistently-applied total
    # order — and the rebuilt index actually carries the new order
    rows = [r.asDict() for r in _docs(spark).collect()]
    expected = _batch_pairs(spark)

    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "idx"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))

    import os as _os

    tok_base = _os.path.join(idx, ct.TOKENS_SUBDIR)
    before = spark.read.option("basePath", tok_base).parquet(tok_base)
    assert before.filter("odf > 0").count() == 0  # frozen md5 order

    ct.compact_rerank(spark, idx)
    after = spark.read.option("basePath", tok_base).parquet(tok_base)
    assert after.filter("odf > 0").count() > 0  # df order took effect
    # every token carries ONE odf — the no-mixed-orders invariant
    mixed = (
        after.groupBy("tok").agg(F.countDistinct("odf").alias("k"))
        .filter("k > 1").count()
    )
    assert mixed == 0

    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    got = _streamed_pairs(spark, pd_)
    assert set(got) == expected
    assert len(got) == len(set(got))


def test_order_sidecar_lifecycle(spark, tmp_path):
    """Round-12 advisory fix: the (tok, odf) dictionary is persisted as
    an underscore-hidden sidecar inside the token table — written on
    the re-rank's atomic commit, carried forward by plain compact(),
    self-healed for legacy indexes — so per-batch ingest reads it
    instead of re-aggregating the full token index every micro-batch."""
    import shutil

    from flink_tank_spark.streaming import compaction

    rows = [r.asDict() for r in _docs(spark).collect()]
    expected = _batch_pairs(spark)

    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "idx"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    _write_jsonl(src, "b0.jsonl", rows[0::2])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    assert ct.load_order(spark, idx) is None  # never re-ranked yet

    ct.compact_rerank(spark, idx)
    tok_base = os.path.join(idx, ct.TOKENS_SUBDIR)
    side = ct.load_order(spark, idx)
    assert side is not None
    got = {(r.tok, r.odf) for r in side.collect()}
    toks = (
        spark.read.option("basePath", tok_base).parquet(tok_base)
        .drop("ingest_batch")
    )
    exp = {(r.tok, r.odf) for r in ct.index_order(toks).collect()}
    assert got == exp and got, "sidecar must equal the odf-derived dictionary"

    # plain compact() must carry the sidecar into the merged partition
    ct.compact(spark, idx)
    side2 = ct.load_order(spark, idx)
    assert side2 is not None
    assert {(r.tok, r.odf) for r in side2.collect()} == got

    # ingest under the sidecar order still reproduces the batch pairs
    _write_jsonl(src, "b1.jsonl", rows[1::2])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    assert set(_streamed_pairs(spark, pd_)) == expected

    # legacy migration: a pre-sidecar layout (re-ranked index, no
    # sidecar) self-heals on the next sink call — derived once from the
    # stored odf column and persisted for every batch after
    for part in compaction.parts(tok_base):
        p = os.path.join(tok_base, part, ct.ORDER_NAME)
        if os.path.isdir(p):
            shutil.rmtree(p)
    assert ct.load_order(spark, idx) is None
    extra = spark.createDataFrame(
        [(999001, rows[0]["text"])], "doc_id long, text string"
    )
    ct.incremental_containment_sink(idx, pd_)(extra, 9)
    healed = ct.load_order(spark, idx)
    assert healed is not None
    assert {(r.tok, r.odf) for r in healed.collect()} == got


def _batch_drop_ids(spark):
    sh = dedup.shingle_sets(_docs(spark))
    return {r.doc_id for r in dedup.containment_drop_ids(sh).collect()}


def test_corpus_view_matches_batch_across_splits_replay_compaction(
    spark, tmp_path
):
    """The keep-one CORPUS endpoint: containment_drop_view folded from
    the accumulated pair state must equal the batch
    containment_drop_ids bit-exactly — after split ingest, after a
    replayed batch, and after compaction (parity is structural: the
    pair sets are equal and the fold is the literal shared
    containment_drop_from_pairs)."""
    rows = [r.asDict() for r in _docs(spark).collect()]
    expected_drop = _batch_drop_ids(spark)
    assert expected_drop, "fixture produced no containment drops"
    all_ids = {r["doc_id"] for r in rows}

    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "idx"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck,
                                    max_files_per_trigger=1))

    def _view_sets():
        drop = {r.doc_id for r in
                ct.containment_drop_view(spark, idx, pd_).collect()}
        kept = {r.doc_id for r in
                ct.containment_kept_view(spark, idx, pd_).collect()}
        return drop, kept

    drop, kept = _view_sets()
    assert drop == expected_drop
    assert kept == all_ids - expected_drop

    # replayed batch (idempotent per-partition overwrite) → unchanged
    replay = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in rows[2::3]],
        "doc_id long, text string",
    )
    ct.incremental_containment_sink(idx, pd_)(replay, 2)
    assert _view_sets() == (drop, kept)

    # compaction folds the index partitions → views read the same state
    ct.compact(spark, idx)
    assert _view_sets() == (drop, kept)


def test_corpus_view_demotes_on_late_container(spark, tmp_path):
    """A larger container arriving many batches later must DEMOTE the
    previously kept doc at the next read — the monotone-emission
    property an eager keep/drop materialization would lose."""
    small = " ".join(f"tok{i}" for i in range(30))
    big = small + " " + " ".join(f"pad{i}" for i in range(300))
    src = str(tmp_path / "in")
    idx, pd_, ck = (
        str(tmp_path / "idx"), str(tmp_path / "pairs"), str(tmp_path / "ck")
    )
    _write_jsonl(src, "b0.jsonl", [{"doc_id": 1, "text": small}])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    kept = {r.doc_id for r in
            ct.containment_kept_view(spark, idx, pd_).collect()}
    assert kept == {1}
    _write_jsonl(src, "b1.jsonl", [{"doc_id": 2, "text": big}])
    _drain(ct.start_containment_job(spark, src, idx, pd_, ck))
    kept = {r.doc_id for r in
            ct.containment_kept_view(spark, idx, pd_).collect()}
    assert kept == {2}, "doc 1 must be demoted once its container arrives"
