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
# run FIRST (order is otherwise meaningless to the gate). Round-14
# rotation (computed from the union of all CORRECTNESS_r*.json after
# round 13: 50 certed r13, 43 r12, 44 r11, 14 r10): the one NEW query
# leads (never driver-certified), then the 14 round-10 certs (r13
# verdict #4), then the full round-11 block — 59 queries; the driver
# budget (~50) certifies the head and the r11 tail rolls to next
# round, leaving r11 the stalest cert anywhere.
FRONT_OF_LINE = (
    # NEW this round — never certified
    "doc_source_overlap",
    # newest driver cert is round 10
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
    # newest driver cert is round 11
    "agg_grouping_sets",
    "doc_bm25_topk",
    "doc_bm25_wand",
    "doc_bm25_wand_batch64",
    "doc_bpe_merges256",
    "doc_bpe_tokens256",
    "doc_contamination",
    "doc_ngram_freq",
    "doc_pack_chunks",
    "doc_repetition",
    "doc_sample_stratified",
    "doc_split_assign",
    "doc_token_stats",
    "doc_top_terms",
    "emb_ivf_kmeans_topk",
    "emb_ivf_recall",
    "emb_quantize_int8",
    "emb_srp_recall_mp",
    "emb_srp_topk_mp",
    "ev_cep_match",
    "ev_enrich",
    "ev_funnel_conversion",
    "ev_gap_fill",
    "ev_hll_merge_days",
    "ev_hll_user_days",
    "ev_pivot_type_counts",
    "ev_retention_cohorts",
    "ev_value_quantiles",
    "ev_value_quantiles_merged",
    "mm_frame_stats",
    "mm_resize",
    "mm_wav_roundtrip",
    "q11_important_stock",
    "q16_parts_suppliers",
    "q17_small_quantity",
    "q18_large_volume_customers",
    "q1_pricing_summary",
    "q20_excess_shipments",
    "q21_suppliers_waiting",
    "q22_sales_opportunity",
    "q2_min_cost_supplier",
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
