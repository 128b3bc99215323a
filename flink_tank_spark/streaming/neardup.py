"""Streaming-incremental MinHash/LSH near-duplicate detection.

Extends the engine's streaming paradigm (the reference's pure-topology
pattern, EventProcessorJob.kt:130-143) to the LLM dedup layer, which
was batch-only: a continuously-ingesting training pipeline needs each
arriving document checked against the ACCUMULATED corpus without
re-running all-pairs detection per micro-batch.

Shape per micro-batch (foreachBatch, batch id ``b``):

1. shingle + MinHash-sign the batch with the SAME operators and
   constants the batch pipeline uses (operators/dedup.shingle_sets /
   minhash_from_shingled(n_perms=8) / lsh_bucket_rows — one definition,
   no drift);
2. candidate pairs = batch docs × (index ∪ batch) docs sharing a band
   bucket — the BATCH side is broadcast, so the accumulated index is
   probed by one equi-join scan per micro-batch, never a cross-product.
   A pair is detected exactly once: when its LATER document arrives;
3. exact-Jaccard rescore ≥ threshold (precision 1.0, like batch);
4. append the batch's shingle sets and bucket rows to the index as a
   NEW partition ``ingest_batch=b``.

Exactly-once under replay: every write lands under its batch id's
partition directory with mode=overwrite, and all derivations are pure
functions of the (replayed-identical) batch content; a replayed batch
re-lands byte-identical files. Reads of the accumulated index filter
``ingest_batch < b``, so a half-written partition from a crashed
attempt of batch ``b`` can never leak into its own reprocessing.

Bucket-cap semantics (the ONE deliberate divergence from batch): the
degenerate-bucket guardrail (``max_bucket_size``) is evaluated against
the bucket's membership AT ARRIVAL TIME (index ∪ batch). Batch mode
drops an over-cap bucket retroactively — including pairs a streaming
run already emitted while the bucket was small. Emitted verdicts are
monotone (streaming never retracts), so the streamed pair set can be a
SUPERSET of the batch rebuild's on buckets that later exceed the cap;
every extra pair still passed the exact-Jaccard rescore, so it is a
true near-dup. When no bucket ever exceeds the cap the two are EQUAL —
pinned in tests/test_streaming_neardup.py.

At cluster scale the index tables are ordinary parquet (or Iceberg/
Delta) tables partitioned by ingest batch; writing the bucket table
additionally bucketed-by ``bucket`` turns the per-micro-batch probe
into a co-located join.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators.dedup import (
    lsh_bucket_rows,
    minhash_from_shingled,
    rescore_jaccard,
    shingle_sets,
)
from flink_tank_spark.streaming import compaction

SHINGLES_SUBDIR = "shingles"
BUCKETS_SUBDIR = "buckets"


def _read_index(
    spark: SparkSession, index_dir: str, subdir: str, before_batch: int
) -> DataFrame | None:
    """Accumulated index rows from partitions ``ingest_batch < b`` —
    None when no prior partition exists (first batch / fresh index).
    The strict filter makes replay safe: a crashed attempt's own
    partition is invisible to its reprocessing — and the existence
    check applies the SAME ``< before_batch`` rule, so a replayed
    first batch whose crashed attempt left its own partition still
    reads None, not an empty frame. Raises on an interrupted-compact
    dir (compaction.check_readable) instead of silently treating the
    accumulated corpus as fresh."""
    path = os.path.join(index_dir, subdir)
    compaction.check_readable(path)
    prior = [
        e for e in compaction.parts(path)
        if int(e.split("=", 1)[1]) < before_batch
    ]
    if not prior:
        return None
    df = spark.read.option("basePath", path).parquet(path)
    return df.filter(F.col("ingest_batch") < before_batch).drop("ingest_batch")


def near_dup_batch(
    batch_docs: DataFrame,
    index_shingles: DataFrame | None,
    index_buckets: DataFrame | None,
    threshold: float = 0.8,
    n_perms: int = 8,
    rows_per_band: int = 2,
    max_bucket_size: int | None = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Pure-DataFrame core of one incremental step: returns
    (verified_pairs, batch_shingles, batch_buckets).

    ``verified_pairs`` are the NEW near-dup verdicts this batch creates
    (batch × accumulated ∪ batch × batch, each pair once, id_a < id_b);
    the two batch_* frames are what the caller appends to the index.
    Doc ids must be globally unique across the stream (the corpus
    contract — run the exact streaming dedup, streaming/dedup.py,
    upstream when the source re-delivers).
    """
    batch_shingles = shingle_sets(batch_docs, id_col=id_col, text_col=text_col)
    batch_buckets = lsh_bucket_rows(
        minhash_from_shingled(batch_shingles, id_col=id_col, n_perms=n_perms),
        id_col=id_col,
        rows_per_band=rows_per_band,
    )
    all_buckets = (
        batch_buckets if index_buckets is None
        else index_buckets.unionByName(batch_buckets)
    )
    if max_bucket_size is not None:
        # arrival-time cap over the bucket's CURRENT membership
        sizes = all_buckets.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        ok = sizes.filter(F.col("_bsz") <= max_bucket_size).select("bucket")
        probe = batch_buckets.join(ok, "bucket")
        build = all_buckets.join(ok, "bucket")
    else:
        probe, build = batch_buckets, all_buckets
    # batch side broadcast: ONE scan of the accumulated bucket index per
    # micro-batch; pairs normalized (least, greatest) so a within-batch
    # pair arriving from both join sides collapses in the distinct.
    cands = (
        build.join(
            F.broadcast(probe.select(F.col(id_col).alias("_pid"), "bucket")),
            "bucket",
        )
        .filter(F.col(id_col) != F.col("_pid"))
        .select(
            F.least(F.col(id_col), F.col("_pid")).alias("id_a"),
            F.greatest(F.col(id_col), F.col("_pid")).alias("id_b"),
        )
        .distinct()
    )
    all_shingles = (
        batch_shingles if index_shingles is None
        else index_shingles.unionByName(batch_shingles)
    )
    verified = rescore_jaccard(cands, all_shingles, id_col=id_col).filter(
        F.col("jaccard") >= threshold
    )
    return verified, batch_shingles, batch_buckets


def incremental_near_dup_sink(
    index_dir: str,
    pairs_dir: str,
    threshold: float = 0.8,
    n_perms: int = 8,
    rows_per_band: int = 2,
    max_bucket_size: int | None = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """foreachBatch writer maintaining the incremental near-dup state:
    verdicts land under ``pairs_dir/ingest_batch=<b>``, the signature/
    bucket index grows under ``index_dir/{shingles,buckets}/
    ingest_batch=<b>`` — every write an idempotent per-batch-partition
    overwrite (see module docstring for the replay argument)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx_sh = _read_index(spark, index_dir, SHINGLES_SUBDIR, batch_id)
        idx_bk = _read_index(spark, index_dir, BUCKETS_SUBDIR, batch_id)
        # the bucket index is scanned twice when the cap is on (bucket
        # sizes, then the candidate join), and the shingle index twice
        # by the rescore (id_a and id_b sides) — persist both for the
        # batch so the second reference hits cache, not parquet
        persisted = []
        if idx_bk is not None and max_bucket_size is not None:
            idx_bk = idx_bk.persist()
            persisted.append(idx_bk)
        if idx_sh is not None:
            idx_sh = idx_sh.persist()
            persisted.append(idx_sh)
        try:
            pairs, b_sh, b_bk = near_dup_batch(
                batch_df, idx_sh, idx_bk,
                threshold=threshold, n_perms=n_perms,
                rows_per_band=rows_per_band,
                max_bucket_size=max_bucket_size, id_col=id_col,
                text_col=text_col,
            )
            # the three write actions below all re-derive the batch's
            # CPU-dense shingle/minhash lineage (pairs via the candidate
            # join + rescore, the two index appends directly) — persist
            # so shingling runs once per micro-batch, not once per
            # referencing action (the pairs plan picks the cached
            # subtrees up via CacheManager plan-equality substitution)
            b_sh, b_bk = b_sh.persist(), b_bk.persist()
            persisted += [b_sh, b_bk]
            part = f"ingest_batch={batch_id}"
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_dir, part)
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


def start_near_dup_job(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Streaming near-dup job over a jsonl document stream
    (``{"doc_id": ..., "text": ...}`` per line — the same file-stream
    surrogate the chained pipeline uses for the Kafka boundary).
    Returns the started StreamingQuery."""
    os.makedirs(source_dir, exist_ok=True)
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            incremental_near_dup_sink(index_dir, pairs_dir, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-near-dup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(spark: SparkSession, index_dir: str) -> None:
    """Fold the accumulated per-micro-batch index partitions into ONE
    merged partition (``ingest_batch=-1`` — below any real batch id, so
    in-flight replay filters keep working) and drop the originals.
    Unlike retrieval_index.compact this is pure small-file hygiene (the
    rows are append-only facts, no state algebra); the bucket table is
    re-clustered on ``bucket`` so the per-batch probe join reads
    co-located files. Run only while the stream is STOPPED (same replay
    double-count argument as retrieval_index.compact). Crash safety: the
    hide → commit → clean swap protocol (streaming/compaction.py) —
    any interrupted state is detectable and auto-recovered here, and the
    index readers refuse to misread it as a fresh corpus."""
    for subdir, key in ((SHINGLES_SUBDIR, "doc_id"), (BUCKETS_SUBDIR, "bucket")):
        base = os.path.join(index_dir, subdir)
        compaction.recover(base)
        parts = compaction.parts(base)
        if not parts:
            raise ValueError(f"no index partitions under {base!r}")
        df = (
            spark.read.option("basePath", base).parquet(base)
            .drop("ingest_batch").repartition(F.col(key))
        )
        df.write.mode("overwrite").parquet(
            os.path.join(base, compaction.TMP_NAME)
        )
        compaction.commit_swap(base, parts)
