"""Z-order (Morton) multi-dimensional data layout.

Single-column range partitioning gives file-skipping on ONE predicate
column; queries filtering on two (user AND time, key AND date) scan
everything for the second. Interleaving the bits of both quantized
dimensions into a Morton key and range-partitioning + sorting on it
keeps each output file a tight rectangle in BOTH dimensions — the
standard lakehouse Z-ORDER/OPTIMIZE clustering, here as a plain
DataFrame transform so any writer can apply it.

Everything is exact integer bit arithmetic (shift/and/or over BIGINTs),
so the key is partition-invariant and mirrorable in any SQL dialect —
the registry query ev_zorder_extents gates it against DuckDB, and
tests/test_zorder.py measures the extent-tightening quantitatively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_expr(x_col: str, y_col: str, bits: int = 16) -> Column:
    """The 2·bits-bit Morton interleave of two integer columns, each
    already quantized to [0, 2^bits): x occupies the even bit
    positions, y the odd. Unrolled shift/and/shiftleft terms — pure
    whole-stage-codegen arithmetic, no UDF, no loop at runtime."""
    terms = []
    for b in range(bits):
        terms.append(f"shiftleft(shiftright({x_col}, {b}) & 1, {2 * b})")
        terms.append(f"shiftleft(shiftright({y_col}, {b}) & 1, {2 * b + 1})")
    return F.expr(" + ".join(terms))


def sql_morton(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """DuckDB/ANSI mirror of :func:`morton_expr` (identical bit terms;
    ``>>``/``&``/``<<`` on BIGINT are exact in both engines)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({x_expr}) >> {b} & 1) << {2 * b})")
        terms.append(f"((({y_expr}) >> {b} & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 16,
    n_files: int = 32,
    key_col: str = "_zkey",
) -> DataFrame:
    """Cluster ``df`` for writing: Morton key → range partition into
    ``n_files`` → sort within partitions. Each output file then covers
    a contiguous Z-curve segment (a union of small rectangles in the
    (x, y) plane), so parquet min/max stats prune on BOTH columns.
    The key column is retained for debugging; drop it before write if
    undesired. At 100 TB this is the layout-maintenance job's core —
    the range partitioner samples the key like any repartitionByRange.
    """
    keyed = df.withColumn(key_col, morton_expr(x_col, y_col, bits))
    return keyed.repartitionByRange(n_files, key_col).sortWithinPartitions(
        key_col
    )
