"""Oracle-exact, scale-proof numeric aggregation.

Floating-point SUM is order-dependent: Spark sums per-partition then
merges, DuckDB sums in its own order, so ``SUM(double)`` differs in the
last bits between engines — and between runs of the SAME Spark job at
different partition counts. That makes raw double aggregates unusable for
hash-verified correctness AND non-reproducible at scale.

Fix: aggregate in exact fixed-point integers. Each input double is scaled
to micro-units with pure IEEE-754 ops — ``FLOOR(x * 1e6 + 0.5)`` — which
both Spark and DuckDB evaluate bit-identically (multiply and floor are
deterministic IEEE ops; no locale/string formatting involved). The longs
are summed through exact DECIMAL (Spark) / HUGEINT-widening SUM (DuckDB),
so ANY partitioning/merge order yields the same total; one final division
back to double is a single deterministic rounding.

Why not ``CAST(double AS DECIMAL(30,10))``: Spark lowers that cast to
``BigDecimal.valueOf(d)`` == ``Double.toString`` per row — a string
round-trip in the aggregation hot loop. Profiled on local[32] it
dominates CPU (and interacts with a JDK ThreadLocal pathology that
produced 40× stalls); at 100 TB it is exactly the per-row scalar work
whole-stage codegen is supposed to avoid. The FLOOR recipe stays in
pure-JVM arithmetic inside codegen.

Precision envelope: micro-unit scaling is exact for the money/quantity
domain here (inputs have ≤2 decimal digits; triple products like
``ep*(1-disc)*(1+tax)`` have ≤6). |x| must stay < 2^53/1e6 ≈ 9e9 for the
scaled value to be integer-exact — far above any row-level value in a
TPC-H-shaped schema. SUM overflow: DECIMAL(30,0) micro-units allow ~1e24
≈ 1e13 rows of 1e5-magnitude values — comfortably past 100 TB.

SQL-side mirror (DuckDB oracle):
    CAST(SUM(CAST(FLOOR((expr) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 1_000_000.0  # micro-units


def _scaled(c: Column) -> Column:
    # floor(x*1e6 + 0.5): round-half-up in pure IEEE ops; Spark's floor on
    # double returns BIGINT natively, then widens to exact decimal for the sum.
    return F.floor(c * F.lit(SCALE) + F.lit(0.5)).cast("decimal(30,0)")


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Exact, order-independent SUM of a double expression → double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(_scaled(c)).cast("double") / F.lit(SCALE)
    return out.alias(alias) if alias else out


def davg(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent AVG: exact fixed-point SUM → double, / COUNT.

    A single double division of two deterministic operands is itself
    deterministic (IEEE-754), so this matches the oracle exactly.
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(_scaled(c)).cast("double") / F.lit(SCALE) / F.count(c)
    return out.alias(alias) if alias else out


def sql_dsum(expr: str) -> str:
    """DuckDB/ANSI mirror of :func:`dsum` for oracle strings.

    Parenthesized so the trailing division survives inlining into larger
    expressions (e.g. ``sql_dsum(a) / sql_dsum(b)``).
    """
    return f"(CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0)"


def sql_davg(expr: str) -> str:
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / 1000000.0 / COUNT({expr}))"
    )
