"""Streaming governed ingest: scrub → split → incremental leak audit.

The streaming composition of the round-7 governance trio — what a
continuously-ingesting training pipeline actually runs at the door:

1. **PII scrub first** (operators/text.pii_scrub): redaction happens
   BEFORE anything else sees the text — the near-dup index, the stored
   corpus, and every downstream consumer only ever hold scrubbed text.
   Per-doc redaction counts are kept as audit columns.
2. **Split assignment at arrival** (operators/text.split_col): the
   assignment is a pure function of the doc id, so it needs no state
   and never changes as the corpus grows — the property that makes
   split-at-ingest sound.
3. **Incremental split-leakage audit**: each batch's docs are near-dup
   probed against the ACCUMULATED signature/bucket index (the
   streaming/neardup.py machinery, unchanged) over the SCRUBBED text,
   and verified pairs straddling splits land in ``leaks_dir`` the
   moment the second endpoint arrives — train/test contamination is
   caught at ingest time, not in a nightly batch sweep.

Outputs per micro-batch (all idempotent per-batch-partition overwrites,
the neardup replay argument applies verbatim):

- ``corpus_dir/ingest_batch=<b>``  — (doc_id, split, text [scrubbed],
  n_redactions)
- ``leaks_dir/ingest_batch=<b>``   — cross-split verified near-dup
  pairs (id_a, id_b, split_a, split_b, n_common, jaccard)
- ``index_dir/{shingles,buckets}/ingest_batch=<b>`` — the growing
  near-dup index (compactable via streaming/neardup.compact)

Equality with the batch operators on the same corpus — scrub output,
split assignment, and the leak set — is pinned by
tests/test_streaming_governance.py, including a restart split.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators import text as T
from flink_tank_spark.streaming import neardup
from flink_tank_spark.streaming.neardup import (
    BUCKETS_SUBDIR,
    SHINGLES_SUBDIR,
    _read_index,
)


def governed_batch(batch_docs: DataFrame) -> DataFrame:
    """The stateless governance projection: scrubbed text + redaction
    audit + split. Shared by the sink and the batch-parity tests so the
    two can never drift."""
    counts = T.pii_counts(F.col("text"))
    return batch_docs.select(
        "doc_id",
        T.split_col(F.col("doc_id")).alias("split"),
        T.pii_scrub(F.col("text")).alias("text"),
        sum(counts.values()).alias("n_redactions"),
    )


def governed_ingest_sink(
    corpus_dir: str,
    index_dir: str,
    leaks_dir: str,
    threshold: float = 0.8,
    n_perms: int = 8,
    rows_per_band: int = 2,
    max_bucket_size: int | None = 64,
):
    """foreachBatch writer for the governed ingest stage."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        # the four write actions below all re-derive from the scrub /
        # shingle / minhash lineage — persist the shared stages so each
        # runs once per micro-batch, not once per referencing branch
        # (the multi-branch-DAG re-evaluation cost); the bucket index is
        # additionally scanned twice when the cap is on (sizes + join)
        governed = governed_batch(batch_df).persist()
        persisted = [governed]
        idx_sh = _read_index(spark, index_dir, SHINGLES_SUBDIR, batch_id)
        idx_bk = _read_index(spark, index_dir, BUCKETS_SUBDIR, batch_id)
        if idx_bk is not None and max_bucket_size is not None:
            idx_bk = idx_bk.persist()
            persisted.append(idx_bk)
        try:
            pairs, b_sh, b_bk = neardup.near_dup_batch(
                governed.select("doc_id", "text"), idx_sh, idx_bk,
                threshold=threshold, n_perms=n_perms,
                rows_per_band=rows_per_band, max_bucket_size=max_bucket_size,
            )
            b_sh, b_bk = b_sh.persist(), b_bk.persist()
            persisted += [b_sh, b_bk]
            leaks = (
                pairs.select(
                    "id_a", "id_b",
                    T.split_col(F.col("id_a")).alias("split_a"),
                    T.split_col(F.col("id_b")).alias("split_b"),
                    "n_common", "jaccard",
                )
                .filter(F.col("split_a") != F.col("split_b"))
            )
            part = f"ingest_batch={batch_id}"
            governed.write.mode("overwrite").parquet(
                os.path.join(corpus_dir, part)
            )
            leaks.write.mode("overwrite").parquet(
                os.path.join(leaks_dir, part)
            )
            b_sh.write.mode("overwrite").parquet(
                os.path.join(index_dir, SHINGLES_SUBDIR, part)
            )
            b_bk.write.mode("overwrite").parquet(
                os.path.join(index_dir, BUCKETS_SUBDIR, part)
            )
        finally:
            for df in persisted:
                df.unpersist()

    return write


def start_governed_ingest_job(
    spark: SparkSession,
    source_dir: str,
    corpus_dir: str,
    index_dir: str,
    leaks_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Governed ingest over a jsonl document stream (``{"doc_id": ...,
    "text": ...}`` per line — the same file-stream surrogate the other
    streaming jobs use for the Kafka boundary)."""
    os.makedirs(source_dir, exist_ok=True)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            governed_ingest_sink(corpus_dir, index_dir, leaks_dir, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("governed-ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
