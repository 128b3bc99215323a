"""Automated physical-plan audit over the ENTIRE registry.

Pins the scale property the manual PLANS.md audit checks by hand: no
query may plan a quadratic join. ``CartesianProduct`` is banned
everywhere; ``BroadcastNestedLoopJoin`` is banned except where the
broadcast side is a 1-row scalar aggregate (a lazy scalar subquery —
constant work at any scale), which Catalyst necessarily plans as a
nested-loop cross join.

Also doubles as a build-every-plan smoke test: `.explain` forces full
analysis/optimization of every registry plan (the fixpoint-iterating
connected-components queries additionally execute their label jobs at
build time — inherent to convergence detection).

The shared-stage cache (plans/shared.py) is disabled here so `.explain`
shows every stage's full plan, not an InMemoryTableScan over a cached
prefix — the audit must see the joins inside the shared stages.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from flink_tank_spark.plans import shared
from flink_tank_spark.plans.registry import all_queries


@pytest.fixture(autouse=True)
def _no_shared_cache():
    shared.DISABLE = True
    try:
        yield
    finally:
        shared.DISABLE = False

# Queries whose ONLY nested-loop join is against a broadcast 1-row
# scalar aggregate (q11/q22 lazy scalar subqueries, doc_top_terms'
# corpus-size N, distributed_ntile's total count).
SCALAR_BROADCAST_OK = {
    "q11_important_stock",
    "q22_sales_opportunity",
    "doc_top_terms",
    "doc_bm25_topk",  # 1-row (n_docs, avgdl) corpus stats
    "doc_bm25_wand",  # same 1-row stats, crossed into impacts + rescore
    "doc_bm25_wand_batch64",  # same 1-row stats at the batched load
    "doc_idf_rarity",  # same 1-row n_docs stats frame
    "ev_funnel_conversion",  # four 1-row funnel-step counts cross-joined
    "ev_cms_merge_days",  # 1-row n_days count crossed into the output
    "doc_zipf_ranks",  # 20-row top-k crossed with the 1-row corpus total
    "doc_mix_reweight",  # 5-row lang mix crossed with the 1-row totals
    "doc_pmi_pairs",  # 1-row n_docs corpus count crossed into the lift
    "ev_kmv_overlap_types",  # |types|-row sketch frames pairwise joined
    # on type_a < type_b — bounded by |types|^2 at any corpus size
    "join_bloom_prune",  # 1-row bloom map<word,bits> frame (bounded by
    # the filter size itself, ~1.2 bytes/build-key) broadcast to probe
    "win_balance_quartiles",
    "win_exact_percentiles",
    "tbl_fk_audit",  # per-FK 1-row orphan/child-stats frames crossed into
    # the 1-row audit output (all broadcast scalars, q11/q22 pattern)
    "doc_dsir_weights",  # 1-row (nr_tot, nt_tot) corpus totals crossed
    "doc_dsir_topk",  # same 1-row totals frame under the selection cut
    # into the <=256-row bucket weight table (bm25 stats pattern)
    "ev_zorder_extents",  # 1-row min/max quantization stats frame crossed
    # into the dims projection (no equality predicate for Catalyst to
    # convert into a hash join, unlike dim_scd2_customer's month filter)
}

SPECS = sorted(all_queries().values(), key=lambda s: s.name)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_no_quadratic_join_in_plan(spark, sf_dir, spec):
    plan = _explain(spec.spark(spark, sf_dir))
    assert "CartesianProduct" not in plan, f"{spec.name}: cartesian product"
    if spec.name not in SCALAR_BROADCAST_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{spec.name}: nested-loop join (quadratic at scale)"
        )


def test_filters_and_pruning_reach_the_scan(spark, sf_dir):
    """Predicate pushdown + column pruning regression pin: q6's range
    predicates must appear in the parquet scan's PushedFilters, and the
    ReadSchema must carry only the 4 referenced lineitem columns."""
    from flink_tank_spark.plans.tpch import q3_shipping_priority, q6_forecast_revenue

    plan = _explain(q6_forecast_revenue(spark, sf_dir))
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_shipdate" in pushed
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert schema_line.count(":") == 5  # struct<4 cols> -> 4 col types + 1 in 'ReadSchema:'

    plan3 = _explain(q3_shipping_priority(spark, sf_dir))
    assert "EqualTo(c_mktsegment,BUILDING)" in plan3


def test_fixed_dims_are_broadcast(spark, sf_dir):
    """region/nation are fixed-cardinality at ANY scale factor: their
    joins must be BroadcastHashJoin, never a shuffled fact side."""
    from flink_tank_spark.plans.tpch import q5_local_supplier_volume

    plan = _explain(q5_local_supplier_volume(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_runtime_bloom_filter_injects_on_selective_join(spark, tmp_path):
    """Runtime bloom-filter injection (Spark's InjectRuntimeFilter): a
    selective small side joined to a large scan gets a `might_contain`
    semi-filter pushed onto the large side's scan stage — rows that
    cannot match are dropped BEFORE the shuffle. This is the engine
    feature that keeps the decontamination join (corpus n-grams ⋈
    benchmark n-grams) from shuffling the whole corpus at 100 TB; the
    application-side threshold defaults to 10 GB, so at lake scale it
    fires out of the box — the test lowers it to fire at fixture scale."""
    import pyspark.sql.functions as F

    big_p, small_p = str(tmp_path / "big"), str(tmp_path / "small")
    spark.range(100_000).withColumn("k", F.col("id") % 10_000).write.parquet(big_p)
    spark.range(100).withColumn("k", F.col("id") * 97).write.parquet(small_p)

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        big = spark.read.parquet(big_p)
        small = spark.read.parquet(small_p).filter(F.col("id") < 50)
        joined = big.join(small, "k")
        plan = _explain(joined)
        assert "might_contain" in plan, "runtime bloom filter not injected"
        # and the filtered join still computes the right answer
        assert joined.count() == 50 * 10  # each small k matches 10 big rows
    finally:
        for key, val in saved.items():
            if val is None:
                conf.unset(key)
            else:
                conf.set(key, val)
