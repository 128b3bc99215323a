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


# --------------------------------------------------------------------------
# triangle_counts (operators/graph.py)
# --------------------------------------------------------------------------

from flink_tank_spark.operators.graph import CC_SCALE, triangle_counts


def _tri_df(spark, und_pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in und_pairs], "id_a long, id_b long"
    )


def test_triangle_counts_on_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3); pendant node 5 off 1;
    # path node 6-7 (no triangles); 8 isolated (degree 0 -> absent).
    und = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (1, 5),
        (6, 7),
    ]
    got = {
        r["doc_id"]: (r["degree"], r["n_tri"], r["cc_ppm"])
        for r in triangle_counts(_tri_df(spark, und)).collect()
    }
    # K4 interior: node 1 has degree 4 (incl. pendant), 3 triangles ->
    # cc = 2*3/(4*3) = 0.5; nodes 2..4 degree 3, 3 triangles -> cc = 1.0.
    assert got[1] == (4, 3, CC_SCALE // 2)
    for n in (2, 3, 4):
        assert got[n] == (3, 3, CC_SCALE)
    assert got[5] == (1, 0, 0)  # pendant: degree 1, cc undefined -> 0
    assert got[6] == (1, 0, 0) and got[7] == (1, 0, 0)
    assert 8 not in got  # no edges -> no row
    # global triangle count: sum of per-node counts / 3
    assert sum(v[1] for v in got.values()) == 4 * 3


def test_triangle_counts_skewed_hub_and_invariance(spark):
    # hub 0 connected to 1..20 (star: no triangles), plus one triangle
    # hanging off leaves 1-2 via (1,2): nodes 0,1,2 form the only triangle.
    und = [(0, i) for i in range(1, 21)] + [(1, 2)]
    base = triangle_counts(_tri_df(spark, und))
    got = {r["doc_id"]: (r["degree"], r["n_tri"]) for r in base.collect()}
    assert got[0] == (20, 1)
    assert got[1] == (2, 1) and got[2] == (2, 1)
    assert all(got[i] == (1, 0) for i in range(3, 21))
    # partitioning must not change anything (exact integer outputs)
    one = sorted(map(tuple, triangle_counts(_tri_df(spark, und).coalesce(1)).collect()))
    many = sorted(map(tuple, triangle_counts(_tri_df(spark, und).repartition(13)).collect()))
    assert one == many


# --------------------------------------------------------------------------
# kcore (operators/graph.py)
# --------------------------------------------------------------------------

import pytest

from flink_tank_spark.operators.graph import kcore


def test_kcore_peels_chains_keeps_cliques(spark):
    # K4 with a pendant (5) and a detached path 10-11-12-13: the 2-core
    # is exactly the K4, each member at within-core degree 3 (the
    # pendant edge peels first, then the whole path end-first).
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
           (10, 11), (11, 12), (12, 13)]
    got = sorted(map(tuple, kcore(_tri_df(spark, und), k=2).collect()))
    assert got == [(1, 3), (2, 3), (3, 3), (4, 3)]
    # the 3-core is the same K4; the 4-core is empty
    assert sorted(map(tuple, kcore(_tri_df(spark, und), k=3).collect())) == got
    assert kcore(_tri_df(spark, und), k=4).count() == 0


def test_kcore_cascading_peel_and_cap(spark):
    # a 20-node path peels ~2 nodes per round: converges inside the
    # default budget, and a tiny cap raises instead of lying
    und = [(i, i + 1) for i in range(20)]
    assert kcore(_tri_df(spark, und), k=2).count() == 0
    with pytest.raises(RuntimeError):
        kcore(_tri_df(spark, und), k=2, iters=3)


def test_kcore_partition_invariant(spark):
    und = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    one = sorted(map(tuple, kcore(_tri_df(spark, und).coalesce(1), k=2).collect()))
    many = sorted(map(tuple, kcore(_tri_df(spark, und).repartition(7), k=2).collect()))
    assert one == many == [(1, 3), (2, 3), (3, 3), (4, 3)]
