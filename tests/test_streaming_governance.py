"""Governed ingest (streaming/governance.py): the streamed corpus,
split assignments, redaction audit, and leak set must equal the batch
operators on the same input — including docs carrying real PII-shaped
strings — and survive a checkpoint restart."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import dedup
from flink_tank_spark.operators import text as T
from flink_tank_spark.streaming import governance

SF_DIR = "/root/testdata/sf0.01"


def _rows_with_pii(spark):
    """The sf0.01 corpus (which contains planted near-dups) with
    PII-shaped strings spliced into every third doc python-side — the
    scrubber must remove them; doc-unique strings so shingle overlap
    (and therefore the near-dup verdicts) is unchanged."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rows = []
    for r in docs.collect():
        txt = r.text
        if r.doc_id % 3 == 0:
            txt += f" contact agent{r.doc_id}@example.net or 555-{r.doc_id % 10000:04d}"
        rows.append({"doc_id": r.doc_id, "text": txt})
    return rows


def _write_wave(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _read_parts(spark, base):
    return spark.read.option("basePath", base).parquet(base)


def _expected(spark, rows):
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    governed = governance.governed_batch(batch).cache()
    pairs = dedup.lsh_near_dup_pairs(governed.select("doc_id", "text"))
    leaks = {
        (r.id_a, r.id_b, r.split_a, r.split_b)
        for r in pairs.select(
            "id_a", "id_b",
            T.split_col(F.col("id_a")).alias("split_a"),
            T.split_col(F.col("id_b")).alias("split_b"),
        ).filter(F.col("split_a") != F.col("split_b")).collect()
    }
    corpus = {
        r.doc_id: (r.split, r.text, r.n_redactions)
        for r in governed.collect()
    }
    governed.unpersist()
    return corpus, leaks


def _run(spark, src, dirs):
    q = governance.start_governed_ingest_job(spark, src, *dirs)
    assert q.awaitTermination(300)


def test_governed_ingest_equals_batch_and_survives_restart(spark, tmp_path):
    rows = _rows_with_pii(spark)
    exp_corpus, exp_leaks = _expected(spark, rows)
    assert exp_leaks, "no cross-split near-dups at this sf; vacuous"
    assert any(v[2] > 0 for v in exp_corpus.values()), "no PII injected"

    src = str(tmp_path / "in")
    dirs = (
        str(tmp_path / "corpus"), str(tmp_path / "idx"),
        str(tmp_path / "leaks"), str(tmp_path / "ck"),
    )
    # wave 1+2 in one run, wave 3 in a SEPARATE restarted run (the
    # accumulated index and checkpoint must carry over)
    _write_wave(src, "w0.jsonl", rows[0::3])
    _write_wave(src, "w1.jsonl", rows[1::3])
    _run(spark, src, dirs)
    _write_wave(src, "w2.jsonl", rows[2::3])
    _run(spark, src, dirs)

    got_corpus = {
        r.doc_id: (r.split, r.text, r.n_redactions)
        for r in _read_parts(spark, dirs[0])
        .select("doc_id", "split", "text", "n_redactions").collect()
    }
    assert got_corpus == exp_corpus
    # nothing PII-shaped survives in the stored corpus
    resid = (
        _read_parts(spark, dirs[0])
        .select(sum(T.pii_counts(F.col("text")).values()).alias("r"))
        .agg(F.sum("r")).first()[0]
    )
    assert resid == 0
    got_leaks = {
        (r.id_a, r.id_b, r.split_a, r.split_b)
        for r in _read_parts(spark, dirs[2])
        .select("id_a", "id_b", "split_a", "split_b").collect()
    }
    assert got_leaks == exp_leaks
