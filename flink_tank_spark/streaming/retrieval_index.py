"""Streaming-incremental BM25 retrieval-index maintenance.

The batch retrieval index (operators/retrieval.py) is two tables:
inverted postings (doc, dl, term, tf) and per-term statistics (df,
ub_i). Under continuous ingest a 100 TB corpus cannot afford a
per-batch rebuild — but both tables are maintainable from per-batch
DELTAS:

- postings: doc-local (a doc's rows depend only on its own text), so a
  batch's postings simply APPEND;
- term statistics: (df, ub_i) itself is NOT append-mergeable (df and
  n_docs/avgdl shift the idf and dl-normalization baked into ub_i), but
  the :func:`~flink_tank_spark.operators.retrieval.term_state`
  sufficient statistics ARE — df merges by sum, the (tf, dl) Pareto
  frontier by union + re-frontier, corpus stats by sum — and finalize
  reproduces the from-scratch table BIT-exactly (tests/test_scale_ops).

Layout under ``index_dir`` (all parquet, one partition per micro-batch,
written with mode=overwrite for foreachBatch replay idempotency — same
argument as streaming/neardup.py):

    postings/ingest_batch=<b>     doc_id, dl, term, tf
    term_state/ingest_batch=<b>   term, df, frontier
    stats_state/ingest_batch=<b>  n_docs, dl_ssum  (1 row)

:func:`load_index` folds the deltas into the (posts, term_stats, stats)
triple the batch operators consume unchanged. Delta-count growth is
bounded operationally by :func:`compact` (merge all partitions into
one) — at cluster scale, a periodic maintenance job.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from flink_tank_spark.operators import retrieval
from flink_tank_spark.streaming import compaction

POSTINGS_SUBDIR = "postings"
TERM_STATE_SUBDIR = "term_state"
STATS_SUBDIR = "stats_state"
_SUBDIRS = (POSTINGS_SUBDIR, TERM_STATE_SUBDIR, STATS_SUBDIR)


def _read_parts(spark: SparkSession, index_dir: str, subdir: str) -> DataFrame | None:
    """Raises on an interrupted-compact dir (compaction.check_readable)
    rather than reading a partial index."""
    path = os.path.join(index_dir, subdir)
    compaction.check_readable(path)
    if not compaction.parts(path):
        return None
    return spark.read.option("basePath", path).parquet(path).drop("ingest_batch")


def incremental_index_sink(
    index_dir: str, id_col: str = "doc_id", text_col: str = "text"
):
    """foreachBatch writer: derive the batch's postings / term-state /
    stats-state deltas and land each under ``ingest_batch=<b>``
    (idempotent per-partition overwrite on replay)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        posts = retrieval.term_postings(batch_df, id_col=id_col, text_col=text_col)
        # one shingle... postings pass feeds both the postings delta and
        # the term-state delta; persist so the two writes share it
        posts = posts.persist()
        try:
            posts.write.mode("overwrite").parquet(
                os.path.join(index_dir, POSTINGS_SUBDIR, part)
            )
            retrieval.term_state(posts).write.mode("overwrite").parquet(
                os.path.join(index_dir, TERM_STATE_SUBDIR, part)
            )
            retrieval.stats_state(batch_df, text_col).write.mode(
                "overwrite"
            ).parquet(os.path.join(index_dir, STATS_SUBDIR, part))
        finally:
            posts.unpersist()

    return write


def load_index(
    spark: SparkSession, index_dir: str, k1: float = 1.2, b: float = 0.75
) -> dict[str, DataFrame]:
    """Fold the accumulated deltas into the batch operators' index
    triple: ``posts`` (union of postings deltas), ``term_stats``
    (merged term states finalized against the merged corpus stats —
    bit-identical to a from-scratch term_statistics build), ``stats``
    (the 1-row (n_docs, avgdl) corpus stats). Raises if the index is
    empty."""
    posts = _read_parts(spark, index_dir, POSTINGS_SUBDIR)
    states = _read_parts(spark, index_dir, TERM_STATE_SUBDIR)
    sstates = _read_parts(spark, index_dir, STATS_SUBDIR)
    if posts is None or states is None or sstates is None:
        raise ValueError(f"no index partitions under {index_dir!r}")
    stats = retrieval.finalize_corpus_stats(sstates)
    term_stats = retrieval.term_statistics_from_state(
        retrieval.merge_term_states(states), stats, k1=k1, b=b
    )
    return {"posts": posts, "term_stats": term_stats, "stats": stats}


def compact(spark: SparkSession, index_dir: str) -> None:
    """Rewrite the accumulated term-state / stats-state deltas as ONE
    merged partition (``ingest_batch=-1`` — below any real batch id, so
    in-flight replay filters keep working) and drop the originals.
    Postings partitions are left as-is: they are already the final
    table (append-only), and at cluster scale their compaction is the
    storage layer's file-compaction concern, not index algebra.

    Run only while the stream is STOPPED (between availableNow drains /
    during a maintenance window): compacting a partition whose batch
    could still replay would let the replayed delta double-count on top
    of the merged row it was folded into. Crash safety within compact
    itself: the hide → commit → clean swap protocol with auto-recovery
    (streaming/compaction.py) — an interrupted swap is detectable and
    _read_parts refuses to read it as a partial or fresh index."""
    for subdir in (TERM_STATE_SUBDIR, STATS_SUBDIR):
        compaction.recover(os.path.join(index_dir, subdir))
    states = _read_parts(spark, index_dir, TERM_STATE_SUBDIR)
    sstates = _read_parts(spark, index_dir, STATS_SUBDIR)
    if states is None or sstates is None:
        raise ValueError(f"no index partitions under {index_dir!r}")
    merged = retrieval.merge_term_states(states)
    folded = sstates.groupBy().sum("n_docs", "dl_ssum").toDF("n_docs", "dl_ssum")
    for subdir, df in ((TERM_STATE_SUBDIR, merged), (STATS_SUBDIR, folded)):
        base = os.path.join(index_dir, subdir)
        parts = compaction.parts(base)
        df.write.mode("overwrite").parquet(
            os.path.join(base, compaction.TMP_NAME)
        )
        compaction.commit_swap(base, parts)


def start_index_job(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Streaming index-maintenance job over a jsonl document stream
    (``{"doc_id": ..., "text": ...}``). Returns the StreamingQuery."""
    os.makedirs(source_dir, exist_ok=True)
    stream = (
        spark.readStream.schema("doc_id bigint, text string").json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            incremental_index_sink(index_dir, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-retrieval-index")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
