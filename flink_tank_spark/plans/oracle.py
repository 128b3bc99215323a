"""DuckDB-oracle parity harness.

Mirrors the driver's correctness gate: run a registered query's Spark plan
and its DuckDB oracle SQL over the same parquet tables, canonicalize
(sort columns by name, sort rows), and compare values exactly. Used by
the pytest suite so parity failures are caught before the driver runs.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from flink_tank_spark.io.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Column-name order + row order insensitive canonical form."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # lists/dicts aren't sortable; stringify (avoid in oracle queries)
            if s.map(lambda v: isinstance(v, (list, dict, tuple))).any():
                pdf[c] = s.map(repr)
    if len(pdf.columns):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="last")
    return pdf.reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty = match)."""
    problems: list[str] = []
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}")
        return problems
    if len(a) != len(b):
        problems.append(f"row count differs: spark={len(a)} oracle={len(b)}")
        return problems
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            eq = (av.astype("float64").fillna(-0.123456789e300)
                  == bv.astype("float64").fillna(-0.123456789e300))
        else:
            eq = (av.isna() & bv.isna()) | (av == bv)
        if not bool(eq.all()):
            bad = (~eq).idxmax()
            problems.append(
                f"column {c!r}: {int((~eq).sum())}/{len(a)} rows differ; "
                f"first at row {bad}: spark={av[bad]!r} oracle={bv[bad]!r}"
            )
    return problems


def check_query(spark, sf_dir: str, spec) -> list[str]:
    """Run one QuerySpec against its oracle; [] means parity holds."""
    if spec.oracle is None:
        df = spec.spark(spark, sf_dir)
        n = df.count()
        return [] if n >= 0 else [f"{spec.name}: negative row count?!"]
    spark_pdf = spec.spark(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(spec.oracle).fetchdf()
    finally:
        con.close()
    return [f"{spec.name}: {p}" for p in compare_frames(spark_pdf, oracle_pdf)]
