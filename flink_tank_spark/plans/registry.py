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
# run FIRST (order is otherwise meaningless to the gate). Round-13
# rotation (computed from the union of all CORRECTNESS_r*.json after
# round 12: 50 certed r12, 50 r11, 48 r10, 3 r9): head = the 16
# queries whose ORACLE text changed this round (compute-once verify
# CTEs + emb_n norms join — values bit-identical, but a changed
# comparison side needs a fresh driver cert) plus ev_json_extract
# (plan changed r12 after its r11 cert), then the 3 round-9 certs,
# then the remaining 44 round-10 certs — 64 queries; the driver budget
# (~50) certifies the head and the r10 tail rolls to next round.
FRONT_OF_LINE = (
    # oracle/plan changed THIS round (r13: compute-once pair verify CTEs,
    # emb_n norms join; ev_json_extract changed r12) — certify first
    "ev_json_extract",
    "doc_lsh_near_dups",
    "doc_containment_dups",
    "emb_near_dup_pairs",
    "emb_srp_near_dups",
    "doc_dedup_groups",
    "doc_containment_corpus",
    "doc_ppjoin_near_dups",
    "doc_split_leakage",
    "doc_dedup_corpus",
    "emb_semantic_dedup",
    "doc_minhash_est",
    "doc_pagerank",
    "doc_triangles",
    "doc_kcore",
    "doc_canonical_by_pr",
    "emb_srp_near_dups_mp",
    # newest driver cert is round 9
    "tbl_fk_audit",
    "tbl_mcv_lineitem",
    "tbl_profile_lineitem",
    # newest driver cert is round 10
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_shipments",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_discounted_revenue",
    "win_balance_quartiles",
    "win_exact_percentiles",
    "set_churned_customers",
    "set_loyal_customers",
    "ev_parse_route",
    "ev_error_routing",
    "ev_sequence",
    "ev_sliding_peak",
    "ev_type_counts",
    "ev_sessionize",
    "ev_tumbling_hourly",
    "ev_asof_login",
    "ev_interval_clicks",
    "ev_salted_counts",
    "ev_cms_heavy_hitters",
    "ev_anomaly_days",
    "ev_value_outliers",
    "emb_matryoshka_topk",
    "doc_minhash",
    "doc_jaccard_topk",
    "doc_simhash",
    "doc_lang_id",
    "doc_quality",
    "emb_knn_label_purity",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "mm_decode",
    "emb_srp_topk",
    "emb_srp_recall",
    "ev_zorder_extents",
    "emb_profile_dims",
    "doc_simhash_near_dups",
    "doc_weighted_sample",
    "doc_chunk_windows",
    "doc_dsir_weights",
    "doc_vocab_coverage",
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
