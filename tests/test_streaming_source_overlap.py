"""Streaming-incremental source-overlap audit
(streaming/source_overlap.py): the derived view must equal the batch
query (plans/llm.doc_source_overlap) bit-exactly — regardless of
micro-batch split, across replay of an already-landed batch, and
after compaction. State is the mergeable DISTINCT (source, shingle)
table (distinct-of-union == distinct-of-union-of-distincts), so
parity is structural: the finalize is the SAME function
(source_overlap_from_shingles) the batch query runs.
"""

from __future__ import annotations

import json
import os

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.plans.llm import doc_source_overlap
from flink_tank_spark.streaming import source_overlap as so


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


def test_streamed_source_overlap_equals_batch(spark, sf_dir, tmp_path):
    rows = [
        r.asDict()
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", "text")
        .collect()
    ]
    expected = _rows(doc_source_overlap(spark, sf_dir))
    assert expected, "fixture produced no overlap rows"

    src = str(tmp_path / "oin")
    sd, ck = str(tmp_path / "ost"), str(tmp_path / "ock")
    # hash interleave so each batch carries docs of most sources — the
    # folded pair table genuinely differs from any single batch's
    for i in range(3):
        _write_jsonl(src, f"b{i}.jsonl", rows[i::3], ("doc_id", "source", "text"))
    # one file per micro-batch so the replay below hits a REAL batch id
    _drain(so.start_source_overlap_job(spark, src, sd, ck, max_files_per_trigger=1))
    assert _rows(so.load_source_overlap(spark, sd)) == expected

    # replay an already-landed batch id: identical delta, nothing changes
    replay = spark.createDataFrame(
        [(r["doc_id"], r["source"], r["text"]) for r in rows[1::3]],
        "doc_id long, source string, text string",
    )
    so.incremental_overlap_sink(sd)(replay, 1)
    assert _rows(so.load_source_overlap(spark, sd)) == expected

    so.compact(spark, sd)
    from flink_tank_spark.streaming import compaction

    assert compaction.parts(os.path.join(sd, so.OVERLAP_SUBDIR)) == [
        "ingest_batch=-1"
    ]
    assert _rows(so.load_source_overlap(spark, sd)) == expected


def test_cross_batch_pair_materializes_at_read(spark, tmp_path):
    """A shingle's two sides arriving in DIFFERENT batches must still
    count as overlap at read — the property an eager per-batch pair
    count loses. Also pins that set sizes keep deduplicating across
    batches (doc 3 re-contributes s1's existing shingle, n_a stays 1).
    """
    src = str(tmp_path / "oin")
    sd, ck = str(tmp_path / "ost"), str(tmp_path / "ock")
    _write_jsonl(
        src, "b0.jsonl",
        [{"doc_id": 1, "source": "s1", "text": "a b c"}],
        ("doc_id", "source", "text"),
    )
    _drain(so.start_source_overlap_job(spark, src, sd, ck))
    assert so.load_source_overlap(spark, sd).count() == 0  # one source only

    _write_jsonl(
        src, "b1.jsonl",
        [{"doc_id": 2, "source": "s2", "text": "a b c d"},
         {"doc_id": 3, "source": "s1", "text": "a b c"}],
        ("doc_id", "source", "text"),
    )
    _drain(so.start_source_overlap_job(spark, src, sd, ck))
    got = [
        (r.source_a, r.source_b, r.n_a, r.n_b, r.n_common, r.jaccard_ppm)
        for r in so.load_source_overlap(spark, sd).collect()
    ]
    # s1 = {"a b c"} (doc 3 is a duplicate), s2 = {"a b c", "b c d"}
    assert got == [("s1", "s2", 1, 2, 1, 500_000)]
