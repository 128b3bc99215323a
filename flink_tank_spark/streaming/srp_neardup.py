"""Streaming-incremental SRP-blocked embedding near-duplicate detection.

The ZERO-MAINTENANCE streaming variant next to streaming/emb_neardup.py:
IVF blocking needs centroids — trained offline or seeded from the first
batch, drifting as the corpus shifts — while the banded SRP hash
(operators/similarity.srp_band_keys) is stateless and content-derived,
so the index is nothing but append-only parquet of what already
arrived. There is no state to seed, no training batch, no drift, and
the streamed pair set equals the batch rebuild
(similarity.srp_near_dup_pairs) EXACTLY under any micro-batch split —
not just under matched seeds (pinned in
tests/test_streaming_srp_neardup.py).

Shape per micro-batch (foreachBatch, batch id ``b``):

1. hash the batch's vectors to band keys (one Arrow-batched int matmul);
2. candidates = batch×accumulated band-key collisions ∪ batch×batch
   (each pair once, oriented id_a < id_b, DISTINCT over multi-band
   collisions) — an equi-join against the accumulated band table,
   never a cross product;
3. exact fixed-point cosine rescore at the batch-operator threshold;
4. append the batch's band rows and (vector, norm) rows under
   ``ingest_batch=b``.

Exactly-once under replay: every write is a pure function of the
replayed-identical batch content landing under its own partition with
mode=overwrite, and index reads filter ``ingest_batch < b`` — the
streaming/neardup.py argument verbatim. Crash-safe compaction via the
hide → commit → clean swap protocol (streaming/compaction.py), bands
re-clustered on band_key so the per-batch probe reads co-located files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators.similarity import (
    as_double_array,
    dot_vectorized,
    norm,
    srp_band_keys,
    srp_probe_keys,
)
from flink_tank_spark.streaming import compaction

BANDS_SUBDIR = "bands"
VECTORS_SUBDIR = "vectors"

THRESHOLD = 0.45
# the wide-band near-dup blocking config (plans/srp.py ND_*): all-pairs
# candidate volume is sum-of-bucket^2, so bits-per-band tracks
# log2(corpus) — see similarity.srp_near_dup_pairs' scale note
N_PLANES = 48
N_BANDS = 4
DIM = 64


def _read_part(
    spark: SparkSession, index_dir: str, subdir: str, before_batch: int
) -> DataFrame | None:
    """Accumulated rows from partitions ``ingest_batch < b`` — None when
    no prior partition exists (fresh index / replayed first batch).
    Raises on an interrupted-compact dir instead of silently treating
    the accumulated corpus as fresh."""
    path = os.path.join(index_dir, subdir)
    compaction.check_readable(path)
    parts = compaction.parts(path)
    if not any(int(p.split("=", 1)[1]) < before_batch for p in parts):
        return None
    df = spark.read.option("basePath", path).parquet(path)
    return df.filter(F.col("ingest_batch") < before_batch).drop("ingest_batch")


def srp_near_dup_step(
    batch_vecs: DataFrame,
    index_bands: DataFrame | None,
    index_vecs: DataFrame | None,
    threshold: float = THRESHOLD,
    n_planes: int = N_PLANES,
    n_bands: int = N_BANDS,
    dim: int = DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 0,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Pure-DataFrame core of one incremental step: returns
    (verified_pairs, batch_bands, batch_vectors).

    ``verified_pairs`` are the NEW verdicts this batch creates
    (batch × accumulated ∪ batch × batch, each pair once, id_a < id_b,
    exact cos_sim ≥ threshold); the two batch_* frames are what the
    caller appends to the index. Vector ids must be globally unique
    across the stream (the corpus contract — run the exact streaming
    dedup upstream when the source re-delivers).

    ``n_probes > 0`` is the multi-probe twin (batch operator
    srp_near_dup_pairs n_probes): every vector's key rows carry a
    ``kind`` tag — 'b' base bands, 'p' lowest-margin flip probes — and
    a candidate needs at least one BASE side (probe∩probe pairs are
    excluded, exactly the batch rule), so the streamed union stays
    bit-equal to the batch multi-probe operator. The probe keys are
    content-derived like the base keys: the index remains append-only
    with zero maintenance, just (n_bands + n_probes) rows per vector."""
    v = (
        batch_vecs.select(
            F.col(id_col).alias("vec_id"),
            as_double_array(F.col(vec_col)).alias("v"),
        )
        .withColumn("vn", norm(F.col("v")))
        .filter(F.col("vn") > 0)
    )
    batch_bands = v.select(
        "vec_id",
        F.explode(srp_band_keys(F.col("v"), n_planes, n_bands, dim)).alias(
            "band_key"
        ),
    ).withColumn("kind", F.lit("b"))
    if n_probes > 0:
        batch_bands = batch_bands.unionByName(
            v.select(
                "vec_id",
                F.explode(
                    F.slice(
                        srp_probe_keys(
                            F.col("v"), n_planes, n_bands, dim, n_probes
                        ),
                        n_bands + 1,
                        n_probes,
                    )
                ).alias("band_key"),
            ).withColumn("kind", F.lit("p"))
        )
    if index_bands is not None and "kind" not in index_bands.columns:
        # band indexes persisted before the multi-probe round carry no
        # 'kind' column — every row there is a base band by
        # construction (probes were never indexed), so default 'b'
        # keeps old on-disk indexes readable after upgrade
        index_bands = index_bands.withColumn("kind", F.lit("b"))
    all_bands = (
        batch_bands if index_bands is None
        else batch_bands.unionByName(index_bands)
    )
    # batch side probes the full accumulated band table; orientation by
    # id makes (old, new) and (new, new) pairs one uniform rule and the
    # streamed union order-independent. A pair needs >=1 base side.
    cand = (
        batch_bands.select(
            F.col("vec_id").alias("pid"), "band_key",
            F.col("kind").alias("ka"),
        )
        .join(
            all_bands.select(
                F.col("vec_id").alias("qid"), "band_key",
                F.col("kind").alias("kb"),
            ),
            "band_key",
        )
        .filter(
            (F.col("pid") != F.col("qid"))
            & ~((F.col("ka") == "p") & (F.col("kb") == "p"))
        )
        .select(
            F.least("pid", "qid").alias("id_a"),
            F.greatest("pid", "qid").alias("id_b"),
        )
        .distinct()
    )
    all_vecs = v if index_vecs is None else v.unionByName(index_vecs)
    va = all_vecs.select(
        F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
        F.col("vn").alias("na"),
    )
    vb = all_vecs.select(
        F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
        F.col("vn").alias("nb"),
    )
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                dot_vectorized(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    return verified, batch_bands, v


def incremental_srp_near_dup_sink(index_dir: str, pairs_dir: str, **step_kwargs):
    """foreachBatch writer: detect the batch's new pairs against the
    accumulated corpus, land them under ``pairs/ingest_batch=<b>``, and
    append the batch's band/vector rows to the index (all
    replay-idempotent per-partition overwrites)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = f"ingest_batch={batch_id}"
        index_bands = _read_part(spark, index_dir, BANDS_SUBDIR, batch_id)
        index_vecs = _read_part(spark, index_dir, VECTORS_SUBDIR, batch_id)
        verified, batch_bands, batch_vecs = srp_near_dup_step(
            batch_df, index_bands, index_vecs, **step_kwargs
        )
        # three write actions share the batch's hash/norm lineage —
        # persist it once (the r8 multi-branch-DAG discipline)
        batch_vecs = batch_vecs.persist()
        batch_bands = batch_bands.persist()
        try:
            verified.write.mode("overwrite").parquet(
                os.path.join(pairs_dir, part)
            )
            batch_bands.write.mode("overwrite").parquet(
                os.path.join(index_dir, BANDS_SUBDIR, part)
            )
            batch_vecs.write.mode("overwrite").parquet(
                os.path.join(index_dir, VECTORS_SUBDIR, part)
            )
        finally:
            batch_bands.unpersist()
            batch_vecs.unpersist()

    return write


def run_srp_near_dup_job(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    **step_kwargs,
):
    """File-stream surrogate for the Kafka boundary: jsonl rows
    ``{"vec_id": ..., "embedding": [...]}``. Returns the started
    StreamingQuery."""
    os.makedirs(source_dir, exist_ok=True)
    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(
            incremental_srp_near_dup_sink(index_dir, pairs_dir, **step_kwargs)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-srp-near-dup")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact(spark: SparkSession, index_dir: str) -> None:
    """Fold the accumulated per-micro-batch index partitions into one
    merged ``ingest_batch=-1`` partition (below any real batch id, so
    in-flight replay filters keep working). Bands re-cluster on
    band_key for co-located probe reads; vectors on vec_id. Run only
    while the stream is STOPPED (the replay double-count argument);
    crash safety via the hide → commit → clean swap protocol."""
    for subdir, key in ((BANDS_SUBDIR, "band_key"), (VECTORS_SUBDIR, "vec_id")):
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
