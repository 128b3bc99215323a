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
# queries that still lack a driver-certified CORRECTNESS row in ANY round
# run FIRST (order is otherwise meaningless to the gate). Round-3
# rotation: the 15 round-2 additions that have never had a driver row,
# plus doc_token_stats whose only driver row (r1) predates its fix —
# everything else is green in CORRECTNESS_r01/r02. Round-3 additions
# (new queries, no row anywhere yet) are appended at the end of the
# block so they certify this round too.
FRONT_OF_LINE = (
    "doc_token_stats",
    "doc_repetition",
    "doc_contamination",
    "doc_sample_stratified",
    "doc_ngram_freq",
    "doc_top_terms",
    "doc_pack_chunks",
    "emb_quantize_int8",
    "ev_hll_user_days",
    "ev_hll_merge_days",
    "mm_frame_stats",
    "emb_ivf_kmeans_topk",
    "emb_ivf_recall",
    "doc_dedup_groups",
    "doc_dedup_corpus",
    "emb_semantic_dedup",
    "mm_wav_roundtrip",
    "doc_bm25_topk",
    "ev_value_quantiles",
    "ev_value_quantiles_merged",
    "ev_gap_fill",
    "ev_pivot_type_counts",
    "agg_grouping_sets",
    "ev_funnel_conversion",
    "ev_retention_cohorts",
    "mm_resize",
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
