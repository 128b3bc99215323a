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
# run FIRST (order is otherwise meaningless to the gate). Round-4
# rotation: the 33 queries with no round-3 driver row (round-3 certified
# exactly the other 50 — CORRECTNESS_r03.json is 50/50 green), so after
# this round every query's newest driver cert is ≤2 rounds old. The 7
# queries whose only cert is round-1 (doc_dedup_stats … doc_quality)
# lead the block.
FRONT_OF_LINE = (
    # certified r1 only — highest staleness
    "doc_dedup_stats",
    "doc_minhash",
    "doc_lsh_near_dups",
    "doc_jaccard_topk",
    "doc_simhash",
    "doc_lang_id",
    "doc_quality",
    # certified r1/r2, no r3 row
    "doc_fingerprint",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_near_dup_pairs",
    "mm_decode",
    "win_order_gaps",
    "win_moving_avg",
    "win_balance_quartiles",
    "agg_rollup_region_nation",
    "agg_cube_status_priority",
    "win_price_position",
    "win_exact_percentiles",
    "set_churned_customers",
    "set_loyal_customers",
    "ev_parse_route",
    "ev_error_routing",
    "ev_sequence",
    "ev_enrich",
    "ev_sliding_peak",
    "ev_type_counts",
    "ev_sessionize",
    "ev_json_extract",
    "ev_tumbling_hourly",
    "ev_asof_login",
    "ev_interval_clicks",
    "ev_salted_counts",
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
