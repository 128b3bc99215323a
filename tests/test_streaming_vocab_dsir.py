"""Streaming-incremental vocabulary coverage (streaming/vocab_cov.py)
and DSIR weights (streaming/dsir.py): the derived views must equal the
batch queries (plans/vocab.doc_vocab_coverage,
plans/sampling.doc_dsir_weights) bit-exactly — regardless of
micro-batch split, across replay of an already-landed batch, and after
compaction. Both states are mergeable count tables, so parity is
structural: the finalize is the SAME function the batch query runs.

The split fixtures use hash interleaving (i::3) so every batch carries
documents of most languages/sources — the folded vocabulary and weight
table genuinely differ from any single batch's, which is what makes a
late batch re-rank the top-V vocab / re-weight already-ingested docs.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.sampling import doc_dsir_weights
from flink_tank_spark.plans.vocab import doc_vocab_coverage
from flink_tank_spark.streaming import dsir as ds
from flink_tank_spark.streaming import vocab_cov as vc


def _write_jsonl(src, name, rows, fields):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps({k: r[k] for k in fields}) + "\n")


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_streamed_vocab_coverage_equals_batch(spark, sf_dir, tmp_path):
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    ]
    expected = _rows(doc_vocab_coverage(spark, sf_dir))
    assert expected, "fixture produced no coverage rows"

    src = str(tmp_path / "vin")
    sd, ck = str(tmp_path / "vst"), str(tmp_path / "vck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3], ("doc_id", "source", "text"))
    # one file per micro-batch so the replay below hits a REAL batch id
    _drain(vc.start_vocab_job(spark, src, sd, ck, max_files_per_trigger=1))
    assert _rows(vc.load_vocab_coverage(spark, sd)) == expected

    # replay an already-landed batch id: identical delta, nothing changes
    replay = spark.createDataFrame(
        [(r["doc_id"], r["source"], r["text"]) for r in rows[1::3]],
        "doc_id long, source string, text string",
    )
    vc.incremental_vocab_sink(sd)(replay, 1)
    assert _rows(vc.load_vocab_coverage(spark, sd)) == expected

    vc.compact(spark, sd)
    from flink_tank_spark.streaming import compaction

    assert compaction.parts(os.path.join(sd, vc.VOCAB_SUBDIR)) == ["ingest_batch=-1"]
    assert _rows(vc.load_vocab_coverage(spark, sd)) == expected


def test_late_batch_rotates_vocabulary(spark, tmp_path):
    # the top-1 vocab after batch 0 is 'aa'; a late batch flips the
    # majority token to 'bb', so doc 1 becomes fully OOV at read — the
    # re-derivation property an eagerly frozen vocab loses
    src = str(tmp_path / "vin")
    sd, ck = str(tmp_path / "vst"), str(tmp_path / "vck")
    _write_jsonl(
        src, "b0.jsonl",
        [{"doc_id": 1, "source": "s1", "text": "aa aa aa"}],
        ("doc_id", "source", "text"),
    )
    _drain(vc.start_vocab_job(spark, src, sd, ck))
    first = {
        r["source"]: r["n_oov"]
        for r in vc.load_vocab_coverage(spark, sd, v=1).collect()
    }
    assert first == {"s1": 0}

    _write_jsonl(
        src, "b1.jsonl",
        [{"doc_id": 2, "source": "s2", "text": "bb bb bb bb"}],
        ("doc_id", "source", "text"),
    )
    _drain(vc.start_vocab_job(spark, src, sd, ck))
    second = {
        r["source"]: r["n_oov"]
        for r in vc.load_vocab_coverage(spark, sd, v=1).collect()
    }
    assert second == {"s1": 3, "s2": 0}


def test_streamed_dsir_equals_batch(spark, sf_dir, tmp_path):
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    expected = _rows(doc_dsir_weights(spark, sf_dir))
    assert expected, "fixture produced no DSIR rows"

    src = str(tmp_path / "din")
    sd, ck = str(tmp_path / "dst"), str(tmp_path / "dck")
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3], ("doc_id", "lang", "text"))
    # one file per micro-batch so the replay below hits a REAL batch id
    _drain(ds.start_dsir_job(spark, src, sd, ck, max_files_per_trigger=1))
    assert _rows(ds.load_dsir_weights(spark, sd)) == expected

    replay = spark.createDataFrame(
        [(r["doc_id"], r["lang"], r["text"]) for r in rows[2::3]],
        "doc_id long, lang string, text string",
    )
    ds.incremental_dsir_sink(sd)(replay, 2)
    assert _rows(ds.load_dsir_weights(spark, sd)) == expected

    ds.compact(spark, sd)
    from flink_tank_spark.streaming import compaction

    assert compaction.parts(os.path.join(sd, ds.DSIR_SUBDIR)) == ["ingest_batch=-1"]
    assert _rows(ds.load_dsir_weights(spark, sd)) == expected


def test_late_target_docs_reweight_ingested_corpus(spark, tmp_path):
    # batch 0 has only a non-target doc; a late TARGET-language batch
    # changes the weight table and therefore batch-0's doc score — the
    # re-derivation property a frozen weight table loses
    src = str(tmp_path / "din")
    sd, ck = str(tmp_path / "dst"), str(tmp_path / "dck")
    _write_jsonl(
        src, "b0.jsonl",
        [{"doc_id": 1, "lang": "fr", "text": "le chat dort bien"}],
        ("doc_id", "lang", "text"),
    )
    _drain(ds.start_dsir_job(spark, src, sd, ck))
    before = {
        r["lang"]: r["avg_score_ppm"]
        for r in ds.load_dsir_weights(spark, sd).collect()
    }

    _write_jsonl(
        src, "b1.jsonl",
        [{"doc_id": 2, "lang": "en", "text": "the cat sleeps well today"}],
        ("doc_id", "lang", "text"),
    )
    _drain(ds.start_dsir_job(spark, src, sd, ck))
    after = {
        r["lang"]: r["avg_score_ppm"]
        for r in ds.load_dsir_weights(spark, sd).collect()
    }
    assert set(after) == {"fr", "en"}
    assert after["fr"] != before["fr"]  # late target docs re-weighted it
