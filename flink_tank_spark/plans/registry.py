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


# The round-1 driver harness ran the registry in insertion order under a
# cumulative time budget and truncated at the tail, leaving these five
# with no CORRECTNESS row at all. They run FIRST now so a budget hit can
# never starve them again (order is otherwise meaningless to the gate).
FRONT_OF_LINE = (
    "doc_fingerprint",
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_near_dup_pairs",
    "mm_decode",
)


def all_queries() -> dict[str, QuerySpec]:
    """Assemble the full registry (imported lazily to keep startup light)."""
    from flink_tank_spark.plans import llm, sketches, streaming_batch, tpch, windows

    registry: dict[str, QuerySpec] = {}
    for module in (tpch, windows, streaming_batch, sketches, llm):
        for spec in module.QUERIES:
            if spec.name in registry:
                raise ValueError(f"duplicate query name {spec.name!r}")
            registry[spec.name] = spec
    ordered = {n: registry.pop(n) for n in FRONT_OF_LINE if n in registry}
    ordered.update(registry)
    return ordered
