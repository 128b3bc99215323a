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
# run FIRST (order is otherwise meaningless to the gate). Round-7
# rotation: the 37 queries whose newest driver cert is round 5
# (CORRECTNESS_r06.json certified exactly the other 50), computed as
#   sorted(set(r05) - set(r06)) over the CORRECTNESS_r*.json keys,
# so after this round every query's newest driver cert stays ≤2 rounds
# old. Round-7 additions (never certified) go at the very head.
FRONT_OF_LINE = (
    # new in round 7 — no driver cert yet
    "ev_cep_match",
    "doc_split_assign",
    "doc_split_leakage",
    "doc_pii_scrub",
    "emb_two_stage_topk",
    "ev_cms_merge_days",
    "doc_bm25_wand_batch64",
    # newest cert is round 5
    "agg_grouping_sets",
    "doc_bm25_topk",
    "doc_bm25_wand",
    "doc_contamination",
    "doc_dedup_corpus",
    "doc_dedup_groups",
    "doc_ngram_freq",
    "doc_pack_chunks",
    "doc_repetition",
    "doc_sample_stratified",
    "doc_token_stats",
    "doc_top_terms",
    "emb_ivf_kmeans_topk",
    "emb_ivf_recall",
    "emb_quantize_int8",
    "emb_semantic_dedup",
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
    "q20_excess_shipments",
    "q21_suppliers_waiting",
    "q22_sales_opportunity",
    "q2_min_cost_supplier",
    "win_running_total",
    "win_top_orders_per_cust",
)


def all_queries() -> dict[str, QuerySpec]:
    """Assemble the full registry (imported lazily to keep startup light)."""
    from flink_tank_spark.plans import (
        analytics,
        llm,
        sketches,
        streaming_batch,
        tpch,
        windows,
    )

    registry: dict[str, QuerySpec] = {}
    for module in (tpch, windows, streaming_batch, sketches, analytics, llm):
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
