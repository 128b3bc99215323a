"""Oracle parity at sf0.1 — 10× the driver gate's scale factor.

Determinism bugs that sf0.01 masks (partition-order-dependent float
sums, skewed-bucket behavior, tie-breaks that only materialize with more
data) surface here. Heavy, so gated behind SPARK_GRAFT_SLOW_TESTS=1;
run explicitly before shipping plan changes:

    SPARK_GRAFT_SLOW_TESTS=1 python -m pytest tests/test_parity_sf01.py
"""

from __future__ import annotations

import os

import pytest

from flink_tank_spark.plans.oracle import check_query
from flink_tank_spark.plans.registry import all_queries

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SLOW_TESTS") != "1",
    reason="sf0.1 parity is slow; set SPARK_GRAFT_SLOW_TESTS=1",
)

SF01 = "/root/testdata/sf0.1"

# Representative heavy subset: fixed-point aggregation, LSH + exact
# rescore, SimHash fold, IVF blocking + vectorized dot, distributed
# ntile/percentiles, iterative CC, window sums.
HEAVY = [
    "q1_pricing_summary",
    "q9_product_profit",
    "win_balance_quartiles",
    "win_exact_percentiles",
    "win_running_total",
    "ev_sliding_peak",
    "doc_lsh_near_dups",
    "doc_simhash",
    "doc_dedup_groups",
    "doc_pack_chunks",
    "emb_near_dup_pairs",
    "emb_ivf_kmeans_topk",
    "doc_bm25_topk",
    "ev_value_quantiles_merged",
    "ev_hll_merge_days",
    "mm_wav_roundtrip",
]


@pytest.mark.parametrize("name", HEAVY)
def test_sf01_parity(spark, name):
    problems = check_query(spark, SF01, all_queries()[name])
    assert not problems, "\n".join(problems)
