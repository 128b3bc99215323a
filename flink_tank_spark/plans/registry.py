"""Central query registry.

Every analytic capability the engine claims is registered here as a
:class:`QuerySpec` — a named pair of (Spark plan builder, DuckDB oracle
SQL). The driver's correctness harness consumes this through
``__spark_entry__.queries()`` / ``oracle_sql()``; ``bench.py`` and the
pytest parity suite consume it directly.

Contract (see repo root README):
- ``spark(spark_session, sf_dir)`` returns a DataFrame.
- ``oracle`` is ANSI-ish SQL DuckDB can run against the same parquet
  views, producing identical column NAMES and (canonicalized) values.
  ``None`` ⇒ not SQL-expressible; the driver records a rows-only check.
- Every computed column is aliased identically on both sides; doubles
  produced by aggregation go through exact decimal (functions/numeric.py)
  so values are bit-identical under any partitioning.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


# The driver harness runs the registry in insertion order under a
# cumulative time budget and truncates at the tail (~50 rows/round), so
# queries whose newest driver-certified CORRECTNESS row is the STALEST
# run FIRST (order is otherwise meaningless to the gate). Round-9
# rotation: the driver emitted NO CORRECTNESS_r08.json, so the round-8
# head (r8 additions + the r7 red + config/semantic re-certs) keeps its
# place with the round-9 additions prepended; the tail remains the
# queries whose newest driver cert is round 6.
FRONT_OF_LINE = (
    # new in round 9 — no driver cert yet
    "doc_triangles",
    "doc_kcore",
    "ev_value_outliers",
    "ev_value_deciles",
    "ev_hourly_top_users",
    "ev_session_stats",
    "tbl_fk_audit",
    "emb_split_drift",
    "ev_trimmed_mean",
    "ev_value_mad",
    "ev_daily_trend",
    "tbl_corr_lineitem",
    "doc_ppjoin_near_dups",
    "doc_split_ks",
    "ev_anomaly_days",
    "dim_scd2_asof_join",
    "tbl_profile_lineitem",
    "doc_profile_text",
    "tbl_mcv_lineitem",
    "emb_srp_near_dups",
    "doc_canonical_by_pr",
    "ev_type_transitions",
    "ev_zorder_extents",
    "doc_pagerank",
    "doc_bpe_merges",
    "doc_bpe_tokens",
    "emb_srp_topk",
    "emb_srp_recall",
    "dim_scd2_customer",
    # new in round 8 — no driver cert yet (r8 driver run never landed)
    "emb_pq_topk",
    "doc_bigram_fluency",
    "part_skyline",
    "mm_audio_decimate",
    "ev_kmv_overlap_types",
    "join_bloom_prune",
    "doc_fuzzy_near_dups",
    "doc_pmi_pairs",
    "doc_clean_boilerplate",
    "doc_minhash_est",
    "doc_zipf_ranks",
    "doc_span_dedup",
    "doc_mix_reweight",
    # red in round 7 (HUGEINT oracle dtype, fixed in sketches.py) —
    # must re-certify
    "ev_cms_merge_days",
    # re-registered at the measured recall knee (32-dim/C=200) in r8 —
    # config change must re-certify
    "emb_two_stage_topk",
    # r8: staged pii counts (no double-count of overlapping patterns) —
    # semantic change must re-certify
    "doc_pii_scrub",
    # newest cert is round 6
    "agg_cube_status_priority",
    "agg_rollup_region_nation",
    "doc_dedup_stats",
    "doc_fingerprint",
    "doc_idf_rarity",
    "doc_jaccard_topk",
    "doc_lang_id",
    "doc_lsh_near_dups",
    "doc_minhash",
    "doc_quality",
    "doc_simhash",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_matryoshka_topk",
    "emb_near_dup_pairs",
    "ev_asof_login",
    "ev_cms_heavy_hitters",
    "ev_enrich",
    "ev_error_routing",
    "ev_interval_clicks",
    "ev_json_extract",
    "ev_parse_route",
    "ev_salted_counts",
    "ev_sequence",
    "ev_sessionize",
    "ev_sliding_peak",
    "ev_tumbling_hourly",
    "ev_type_counts",
    "mm_decode",
    "q10_returned_items",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_discounted_revenue",
    "q8_market_share",
    "q9_product_profit",
    "set_churned_customers",
    "set_loyal_customers",
    "win_balance_quartiles",
    "win_exact_percentiles",
    "win_moving_avg",
    "win_order_gaps",
    "win_price_position",
)


def all_queries() -> dict[str, QuerySpec]:
    """Assemble the full registry (imported lazily to keep startup light)."""
    from flink_tank_spark.plans import (
        analytics,
        bpe,
        graph,
        llm,
        layout,
        profile,
        scd,
        sketches,
        srp,
        streaming_batch,
        tpch,
        windows,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (
        tpch, windows, streaming_batch, sketches, analytics, llm, graph, bpe,
        srp, scd, layout, profile,
    ):
        for spec in module.QUERIES:
            if spec.name in registry:
                raise ValueError(f"duplicate query name {spec.name!r}")
            registry[spec.name] = spec
    unknown = [n for n in FRONT_OF_LINE if n not in registry]
    if unknown:
        raise ValueError(f"FRONT_OF_LINE names not in registry: {unknown}")
    ordered = {n: registry.pop(n) for n in FRONT_OF_LINE}
    ordered.update(registry)
    return ordered
