"""Semantic tests for the PageRank operator (operators/graph.py).

The registry-wide parity test already gates doc_pagerank against its
DuckDB oracle; these pin the OPERATOR semantics on a hand-built graph —
the exact integer recurrence, isolated-node behavior, and the
centrality ordering the query's curation story depends on.
"""

from __future__ import annotations

from flink_tank_spark.operators.graph import PR_BASE, PR_SCALE, pagerank_scaled


def _expected(nodes, undirected_edges, iters):
    """Reference simulation of the exact scaled-integer recurrence."""
    edges = [(a, b) for a, b in undirected_edges] + [
        (b, a) for a, b in undirected_edges
    ]
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    pr = {n: PR_SCALE for n in nodes}
    for _ in range(iters):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += (pr[s] * 17) // (20 * deg[s])
        pr = {n: PR_BASE + inc[n] for n in nodes}
    return deg, pr


def test_pagerank_matches_integer_recurrence(spark):
    nodes_l = [1, 2, 3, 4, 5]
    und = [(1, 2), (2, 3), (2, 4)]  # star on 2, node 5 isolated
    nodes = spark.createDataFrame([(n,) for n in nodes_l], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    got = {
        r["doc_id"]: (r["degree"], r["pr_scaled"])
        for r in pagerank_scaled(nodes, edges, iters=5).collect()
    }
    deg, pr = _expected(nodes_l, und, 5)
    assert got == {n: (deg.get(n, 0), pr[n]) for n in nodes_l}
    # hub outranks leaves; isolated node sits at the damped base rank
    assert got[2][1] > got[1][1]
    assert got[5] == (0, PR_BASE)


def test_pagerank_partition_invariant(spark):
    nodes_l = list(range(30))
    und = [(i, (i * 7 + 1) % 30) for i in range(30) if i != (i * 7 + 1) % 30]
    nodes = spark.createDataFrame([(n,) for n in nodes_l], "doc_id long")
    edges = spark.createDataFrame(
        [(a, b) for a, b in und] + [(b, a) for a, b in und], "src long, dst long"
    )
    one = sorted(
        pagerank_scaled(nodes.coalesce(1), edges.coalesce(1), iters=4).collect()
    )
    many = sorted(
        pagerank_scaled(
            nodes.repartition(7), edges.repartition(11), iters=4
        ).collect()
    )
    assert one == many
