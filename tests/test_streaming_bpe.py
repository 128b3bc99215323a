"""Streaming-incremental BPE vocabulary maintenance (streaming/bpe.py):
the re-trained merge list and token stats must equal the batch queries
(plans/bpe.doc_bpe_merges256 / doc_bpe_tokens256) bit-exactly —
regardless of micro-batch split, across replay of an already-landed
batch, and after compaction. State is the mergeable (lang, word, cnt)
table; the read path runs the LITERAL batch trainer + finalize, so
parity is structural.

The late-batch test pins the property an eagerly-frozen vocabulary
loses: a late batch that shifts global pair counts changes EARLY merge
decisions, and the twin re-learns them.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.bpe import doc_bpe_merges256, doc_bpe_tokens256
from flink_tank_spark.streaming import bpe as sb
from flink_tank_spark.streaming import compaction


def _write_jsonl(src, name, rows):
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, name), "w") as f:
        for r in rows:
            f.write(
                json.dumps(
                    {"doc_id": r["doc_id"], "lang": r["lang"], "text": r["text"]}
                )
                + "\n"
            )


def _drain(q):
    q.awaitTermination(120)
    assert not q.isActive


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_streamed_merges_and_tokens_equal_batch(spark, sf_dir, tmp_path):
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    ]
    exp_merges = _rows(doc_bpe_merges256(spark, sf_dir))
    exp_tokens = _rows(doc_bpe_tokens256(spark, sf_dir))
    assert exp_merges, "fixture learned no merges"

    src = str(tmp_path / "bin")
    sd, ck = str(tmp_path / "bst"), str(tmp_path / "bck")
    # hash-interleaved thirds: every batch carries most langs, so the
    # folded vocabulary genuinely differs from any single batch's
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3])
    # one file per micro-batch so the replay below hits a REAL batch id
    _drain(sb.start_bpe_job(spark, src, sd, ck, max_files_per_trigger=1))
    assert _rows(sb.load_bpe_merges(spark, sd)) == exp_merges
    assert _rows(sb.load_bpe_tokens(spark, sd)) == exp_tokens

    # replay an already-landed batch id: identical delta, nothing changes
    replay = spark.createDataFrame(
        [(r["doc_id"], r["lang"], r["text"]) for r in rows[1::3]],
        "doc_id long, lang string, text string",
    )
    sb.incremental_bpe_sink(sd)(replay, 1)
    assert _rows(sb.load_bpe_merges(spark, sd)) == exp_merges

    sb.compact(spark, sd)
    assert compaction.parts(os.path.join(sd, sb.WORDS_SUBDIR)) == [
        "ingest_batch=-1"
    ]
    assert _rows(sb.load_bpe_merges(spark, sd)) == exp_merges
    assert _rows(sb.load_bpe_tokens(spark, sd)) == exp_tokens


def test_late_batch_relearns_early_merges(spark, tmp_path):
    # batch 0: 'ab' dominates → first merge is (a,b). The late batch
    # floods 'cd' → the first merge FLIPS to (c,d): the greedy argmax
    # is global, so early decisions are not append-stable — re-training
    # at read is what keeps the twin equal to the batch trainer.
    src = str(tmp_path / "bin")
    sd, ck = str(tmp_path / "bst"), str(tmp_path / "bck")
    b0 = [{"doc_id": 1, "lang": "en", "text": "ab ab ab cd"}]
    b1 = [{"doc_id": 2, "lang": "en", "text": "cd cd cd cd cd"}]
    _write_jsonl(src, "b0.jsonl", b0)
    _drain(sb.start_bpe_job(spark, src, sd, ck, max_files_per_trigger=1))
    first = sb.load_bpe_merges(spark, sd, n_merges=1).collect()[0]
    assert (first.left_sym, first.right_sym) == ("a", "b")

    _write_jsonl(src, "b1.jsonl", b1)
    _drain(sb.start_bpe_job(spark, src, sd, ck, max_files_per_trigger=1))
    first = sb.load_bpe_merges(spark, sd, n_merges=1).collect()[0]
    assert (first.left_sym, first.right_sym) == ("c", "d")
