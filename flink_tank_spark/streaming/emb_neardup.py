"""Streaming-incremental embedding (semantic) near-duplicate detection.

Completes the streaming LLM layer: text near-dup
(streaming/neardup.py) and the BM25 index (streaming/retrieval_index.py)
went incremental in the same round; this module does the same for the
IVF-blocked embedding near-dup that plans/llm.py runs in batch
(`emb_near_dup_pairs` — reference scope: the training-pipeline
extension surface, not a reference operator).

Shape per micro-batch (foreachBatch, batch id ``b``):

1. load centroids. They are FIXED for the life of the index — either
   supplied externally (the production pattern: trained offline on a
   sample, re-trained + re-assigned in a maintenance window) or seeded
   deterministically from the first batch via
   :func:`~flink_tank_spark.operators.similarity.kmeans_centroids`;
2. assign the batch's vectors to their ``probes`` nearest cells
   (:func:`~flink_tank_spark.operators.similarity.ivf_assign` — the
   same multi-probe blocking criterion as batch: a pair is a candidate
   iff the two vectors share ANY probed cell);
3. candidate cells = accumulated index rows ∪ batch rows, restricted to
   cells the batch actually probes; the exact fixed-point cosine
   rescore runs as a RECTANGULAR per-cell blocked matmul
   (:func:`~flink_tank_spark.operators.similarity.cell_probe_pairs`:
   probe-rows × cell, so index×index work is never recomputed and an
   index vector crosses Arrow once per probing batch, not once per
   candidate pair);
4. append the batch's assignment rows to the index as partition
   ``ingest_batch=b``.

A pair is detected exactly once — when its LATER vector arrives — and
verdicts are monotone (never retracted). Precision is 1.0 by the exact
rescore; blocking recall is the IVF multi-probe trade, identical to the
batch operator under the same centroids. With the SAME centroids and
probes the streamed pair set EQUALS the batch
``ivf_assign → cell_blocked_pairs`` rebuild bit-exactly (cos_sim
included) regardless of micro-batch boundaries — pinned in
tests/test_streaming_emb_neardup.py. With seeded centroids the
blocking differs from a batch rebuild's corpus-trained cells (the one
divergence — documented, measured by the recall-vs-brute-force test),
but every emitted pair is still exact-verified.

Exactly-once under replay: same argument as streaming/neardup.py —
every write is a pure function of the (replayed-identical) batch
content landing under its own ``ingest_batch=<b>`` partition with
mode=overwrite, and index/centroid reads filter ``ingest_batch < b``,
so a crashed attempt's half-written partition can never leak into its
own reprocessing. Centroids seeded from the first batch land under
``centroids/ingest_batch=<b0>`` by the same rule.

At cluster scale the index is an ordinary parquet/Iceberg table
partitioned by ingest batch and bucketed by ``centroid_id`` (turning
the per-batch probe into a co-located join); centroid drift under a
shifting corpus is handled by periodic re-train + re-assign compaction,
not per-batch re-clustering (which would retroactively invalidate the
blocking of every emitted verdict).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators.similarity import (
    cell_probe_pairs,
    ivf_assign,
    kmeans_centroids,
)
from flink_tank_spark.streaming import compaction

VECTORS_SUBDIR = "vectors"
CENTROIDS_SUBDIR = "centroids"


def _read_part(
    spark: SparkSession, index_dir: str, subdir: str, before_batch: int
) -> DataFrame | None:
    """Accumulated rows from partitions ``ingest_batch < b`` — None when
    no prior partition exists (fresh index / replayed first batch).
    Raises on an interrupted-compact dir (compaction.check_readable)
    instead of silently treating the accumulated corpus as fresh."""
    path = os.path.join(index_dir, subdir)
    compaction.check_readable(path)
    parts = compaction.parts(path)
    if not any(int(p.split("=", 1)[1]) < before_batch for p in parts):
        return None
    df = spark.read.option("basePath", path).parquet(path)
    return df.filter(F.col("ingest_batch") < before_batch).drop("ingest_batch")


def emb_near_dup_step(
    batch_vecs: DataFrame,
    centroids: DataFrame,
    index_assigned: DataFrame | None,
    threshold: float = 0.45,
    probes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Pure-DataFrame core of one incremental step: returns
    (verified_pairs, batch_assigned).

    ``verified_pairs`` are the NEW verdicts this batch creates
    (batch × accumulated ∪ batch × batch, each pair once, id_a < id_b,
    exact cos_sim); ``batch_assigned`` (vec_id, v, vnorm, centroid_id —
    ``probes`` rows per vector) is what the caller appends to the index.
    Vector ids must be globally unique across the stream (the corpus
    contract — run the exact streaming dedup upstream when the source
    re-delivers)."""
    batch_assigned = ivf_assign(
        batch_vecs, centroids, id_col=id_col, vec_col=vec_col, probes=probes
    )
    probe = batch_assigned.withColumn("is_probe", F.lit(True))
    if index_assigned is None:
        pool = probe
    else:
        # restrict the index scan to cells this batch probes: the cell
        # list is bounded by batch_size × probes, so it broadcasts
        probed_cells = probe.select("centroid_id").distinct()
        pool = probe.unionByName(
            index_assigned.join(F.broadcast(probed_cells), "centroid_id")
            .withColumn("is_probe", F.lit(False))
        )
    pairs = cell_probe_pairs(pool, threshold, id_col=id_col)
    return pairs, batch_assigned


def incremental_emb_near_dup_sink(
    index_dir: str,
    pairs_dir: str,
    centroids: DataFrame | None = None,
    threshold: float = 0.45,
    probes: int = 2,
    seed_cells: int = 8,
    seed_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """foreachBatch writer maintaining the incremental embedding
    near-dup state: verdicts land under ``pairs_dir/ingest_batch=<b>``,
    assignments under ``index_dir/vectors/ingest_batch=<b>`` — every
    write an idempotent per-batch-partition overwrite.

    ``centroids`` pins external (offline-trained) cells; None seeds them
    deterministically from the first non-empty batch and persists them
    under ``index_dir/centroids/ingest_batch=<b0>``."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cent = centroids
        seeded_here = False
        if cent is None:
            stored = _read_part(spark, index_dir, CENTROIDS_SUBDIR, batch_id)
            if stored is not None:
                cent = stored.select(
                    F.col("centroid_id").alias(id_col), F.col("cv").alias(vec_col)
                )
            else:
                if batch_df.isEmpty():
                    return
                cent = kmeans_centroids(
                    batch_df, k=seed_cells, iters=seed_iters,
                    id_col=id_col, vec_col=vec_col,
                ).select(F.col("centroid_id").alias(id_col),
                         F.col("cv").alias(vec_col))
                seeded_here = True
        # seeded centroids derive from a k-means run over the batch —
        # persist so the three write actions below (centroids, pairs,
        # assignments) share one execution instead of re-training per
        # referencing branch (the multi-branch-DAG re-evaluation cost)
        if seeded_here:
            cent = cent.persist()
        assigned = None
        try:
            idx = _read_part(spark, index_dir, VECTORS_SUBDIR, batch_id)
            pairs, assigned = emb_near_dup_step(
                batch_df, cent, idx,
                threshold=threshold, probes=probes, id_col=id_col,
                vec_col=vec_col,
            )
            # assigned (a full multi-probe scoring pass over the batch)
            # feeds both the pairs plan and its own index append —
            # persist so the assignment runs once per micro-batch
            assigned = assigned.persist()
            part = f"ingest_batch={batch_id}"
            if seeded_here:
                cent.select(
                    F.col(id_col).alias("centroid_id"),
                    F.col(vec_col).alias("cv"),
                ).write.mode("overwrite").parquet(
                    os.path.join(index_dir, CENTROIDS_SUBDIR, part)
                )
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_dir, part)
            )
            assigned.write.mode("overwrite").parquet(
                os.path.join(index_dir, VECTORS_SUBDIR, part)
            )
        finally:
            if seeded_here:
                cent.unpersist()
            if assigned is not None:
                assigned.unpersist()

    return write


def start_emb_near_dup_job(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **kwargs,
):
    """Streaming embedding near-dup job over a jsonl vector stream
    (``{"vec_id": ..., "embedding": [...]}`` per line — the same
    file-stream surrogate the chained pipeline uses for the Kafka
    boundary). Returns the started StreamingQuery."""
    os.makedirs(source_dir, exist_ok=True)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<double>")
        .json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            incremental_emb_near_dup_sink(index_dir, pairs_dir, **kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-emb-near-dup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(spark: SparkSession, index_dir: str) -> None:
    """Fold the accumulated vector-assignment partitions into ONE
    merged partition (``ingest_batch=-1``), re-clustered on
    ``centroid_id`` so the per-batch cell probe reads co-located files —
    pure small-file hygiene, same contract as streaming/neardup.compact
    (stream STOPPED; hide → commit → clean swap protocol with
    auto-recovery, streaming/compaction.py).
    Centroids are a single write-once partition and are left alone."""
    base = os.path.join(index_dir, VECTORS_SUBDIR)
    compaction.recover(base)
    parts = compaction.parts(base)
    if not parts:
        raise ValueError(f"no index partitions under {base!r}")
    df = (
        spark.read.option("basePath", base).parquet(base)
        .drop("ingest_batch").repartition(F.col("centroid_id"))
    )
    df.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)
