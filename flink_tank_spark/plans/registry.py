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
# run FIRST (order is otherwise meaningless to the gate). Round-12
# rotation (computed from the union of all CORRECTNESS_r*.json after
# round 11: 50 certed r11, 48 r10, 44 r9, 7 r7): head = the 7 round-7
# certs, then the 44 round-9 certs, then ev_json_extract (plan changed
# this round — lenient try_parse_json) — 52 queries ≈ one driver
# budget. The r10/r11 certs sit at the tail.
FRONT_OF_LINE = (
    # new in round 12 — no driver cert yet
    "doc_dsir_topk",
    "doc_containment_corpus",
    # newest driver cert is round 7 — stalest, run first
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "win_running_total",
    "win_top_orders_per_cust",
    # newest driver cert is round 9
    "agg_cube_status_priority",
    "agg_rollup_region_nation",
    "dim_scd2_asof_join",
    "dim_scd2_customer",
    "doc_bigram_fluency",
    "doc_bpe_merges",
    "doc_bpe_tokens",
    "doc_canonical_by_pr",
    "doc_clean_boilerplate",
    "doc_dedup_stats",
    "doc_fingerprint",
    "doc_fuzzy_near_dups",
    "doc_idf_rarity",
    "doc_kcore",
    "doc_minhash_est",
    "doc_mix_reweight",
    "doc_pagerank",
    "doc_pii_scrub",
    "doc_pmi_pairs",
    "doc_ppjoin_near_dups",
    "doc_profile_text",
    "doc_span_dedup",
    "doc_split_ks",
    "doc_triangles",
    "doc_zipf_ranks",
    "emb_pq_topk",
    "emb_split_drift",
    "emb_two_stage_topk",
    "ev_cms_merge_days",
    "ev_daily_trend",
    "ev_hourly_top_users",
    "ev_kmv_overlap_types",
    "ev_session_stats",
    "ev_trimmed_mean",
    "ev_type_transitions",
    "ev_value_deciles",
    "ev_value_mad",
    "join_bloom_prune",
    "mm_audio_decimate",
    "part_skyline",
    "tbl_corr_lineitem",
    "tbl_fk_audit",
    "tbl_mcv_lineitem",
    "tbl_profile_lineitem",
    # changed in round 12 (try_parse_json lenient variant path) — re-certify
    "ev_json_extract",
)


def all_queries() -> dict[str, QuerySpec]:
    """Assemble the full registry (imported lazily to keep startup light)."""
    from flink_tank_spark.plans import (
        analytics,
        bpe,
        graph,
        hamming,
        llm,
        layout,
        profile,
        sampling,
        scd,
        sketches,
        srp,
        streaming_batch,
        vocab,
        tpch,
        windows,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (
        tpch, windows, streaming_batch, sketches, analytics, llm, graph, bpe,
        srp, scd, layout, profile, hamming, sampling, vocab,
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
