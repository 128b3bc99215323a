"""Iterative graph centrality (PageRank) as pure DataFrame ops.

The missing category next to connected components (operators/dedup.py):
CC answers "which docs are the same", PageRank answers "which docs are
CENTRAL in the similarity graph" — the signal curation pipelines use to
pick the canonical representative of a duplicate cluster or to weight
documents by how templated/hub-like they are.

Distributed shape (Pregel-style, expressed declaratively): per
iteration ONE equi-join of the edge list with the current rank vector
plus ONE groupBy(dst) sum — identical to the label-propagation shape
that already survives the sf5 invariance sweep for CC. Edges shuffle on
src/dst; no global windows, no driver-side collect, no all-pairs work.

Determinism contract (the gate's bit-exactness requirement): ranks are
SCALED BIGINTs (1.0 == 1_000_000) and every per-edge contribution is
``(rank * 17) div (20 * degree)`` — exact integer arithmetic with a
damping factor of 17/20 = 0.85, so the per-node sum is
partition-order-independent and the DuckDB oracle (``//`` floor
division; both engines truncate identically on non-negative operands)
reproduces it bit-for-bit. Float PageRank would differ in the last ulp
between engines AND between partitionings of the same engine.

Overflow envelope: total scaled mass is bounded by N * 1e6; a single
node's rank is below that, and the *17 stays under 2^63 for any corpus
below ~5e11 docs — comfortably past 100 TB of documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000  # scaled fixed-point: 1.0 == 1e6
PR_BASE = 150_000  # (1 - d) * SCALE with d = 0.85


def pagerank_scaled(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    iters: int = 5,
) -> DataFrame:
    """Fixed-iteration damped PageRank over an undirected edge list.

    ``nodes``: one row per vertex (column ``id_col``) — includes
    isolated vertices, which hold the base rank (1-d)*SCALE.
    ``edges``: directed (``src``, ``dst``) rows; callers pass both
    directions for an undirected graph. Returns (id_col, degree,
    pr_scaled) with degree 0 for isolated vertices.

    ``iters`` is a fixed unroll (the oracle mirrors the same count), not
    a convergence loop: rank queries want a reproducible snapshot, and
    five damped iterations already separate hubs from leaves. The plan
    depth is linear in ``iters`` (each round references the previous
    ranks once), so no checkpoint truncation is needed at this depth —
    unlike CC's fixpoint loop whose rounds self-reference twice.
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # Degree rides along with each edge so the per-iteration work is one
    # join against ranks + one aggregation; built once, reused per round.
    edges_d = edges.join(deg, "src")

    ranks = nodes.select(
        F.col(id_col), F.lit(PR_SCALE).cast("long").alias("pr_scaled")
    )
    for _ in range(iters):
        contribs = (
            edges_d.join(
                ranks.select(
                    F.col(id_col).alias("src"), F.col("pr_scaled").alias("src_pr")
                ),
                "src",
            )
            .select(
                "dst",
                F.expr("(src_pr * 17) div (20 * deg)").alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inc"))
        )
        ranks = nodes.join(
            contribs, nodes[id_col] == contribs["dst"], "left"
        ).select(
            nodes[id_col],
            (F.lit(PR_BASE) + F.coalesce(F.col("inc"), F.lit(0)))
            .cast("long")
            .alias("pr_scaled"),
        )
    return ranks.join(
        deg.select(F.col("src").alias(id_col), F.col("deg").alias("degree")),
        id_col,
        "left",
    ).select(
        id_col,
        F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
        "pr_scaled",
    )
