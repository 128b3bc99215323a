"""Streaming-incremental PageRank over the near-dup similarity graph.

The near-dup sink (streaming/neardup.py) ALREADY maintains the graph
incrementally: its verdict partitions are the edge deltas (each
LSH-verified pair lands exactly once, under the batch that completed
it) and its shingle index holds every ingested node. Centrality
therefore needs NO new state and NO per-batch work — this module is a
pure READ VIEW that folds the accumulated pairs into the symmetric
edge list and runs the LITERAL batch code: the
``operators/graph.pagerank_scaled`` fixpoint and the
``plans/graph.pagerank_top`` finalize. Equal to ``doc_pagerank`` by
construction whenever the streamed pair set equals the batch rebuild
(exactly the contract tests/test_streaming_neardup.py pins), bit-equal
under any split/replay/compaction.

Why re-rank at read instead of maintaining ranks incrementally: a new
edge changes EVERY vertex's rank (power iteration is global), so any
eagerly-materialized rank table is stale the moment a batch lands —
the same argument as the vocab/DSIR/BPE twins. The fold that feeds the
fixpoint is bounded: nodes = one distinct over the shingle index's id
column, edges = the accumulated verdict table (strictly smaller than
the candidate stream), and the 5-round iteration is O(edges) shuffled
work per round — identical to the batch plan, because it IS the batch
plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators import graph
from flink_tank_spark.plans.graph import PR_ITERS, PR_TOPN, pagerank_top
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming.neardup import SHINGLES_SUBDIR


def load_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame | None:
    """Accumulated (id_a, id_b) verdicts, or None when no batch has
    emitted a pair yet (an edgeless graph is a valid early state)."""
    if not os.path.isdir(pairs_dir):
        return None
    compaction.check_readable(pairs_dir)
    if not os.listdir(pairs_dir):
        return None
    return (
        spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
        .select("id_a", "id_b")
    )


def load_pagerank(
    spark: SparkSession,
    index_dir: str,
    pairs_dir: str,
    iters: int = PR_ITERS,
    top_n: int = PR_TOPN,
) -> DataFrame:
    """The doc_pagerank view over everything ingested so far."""
    sh_base = os.path.join(index_dir, SHINGLES_SUBDIR)
    compaction.check_readable(sh_base)
    nodes = (
        spark.read.option("basePath", sh_base).parquet(sh_base)
        .select("doc_id")
        .distinct()
    )
    pairs = load_pairs(spark, pairs_dir)
    if pairs is None:
        edges = spark.createDataFrame([], "src bigint, dst bigint")
    else:
        edges = pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ).union(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
    # the fixpoint references the edge list once per round — persist for
    # the computation (the batch plan does the same via shared.stage),
    # then release: the finalize output is ≤ top_n rows, so it
    # materializes eagerly and the returned frame is a bounded local one
    # with the EXACT schema of the lazy plan
    edges = edges.persist()
    try:
        top = pagerank_top(
            graph.pagerank_scaled(nodes, edges, id_col="doc_id", iters=iters),
            top_n,
        )
        return spark.createDataFrame(top.collect(), schema=top.schema)
    finally:
        edges.unpersist()
