"""Driver-style correctness gate: run every registry query against its
DuckDB oracle at sf0.01 with the driver's own canonicalization/hash.

    python scripts/verify_gate.py [sf_dir] [cpus]

Exit 0 iff every query matches. This is the same comparison the round
driver applies (row count + sorted-column value hash), so a green run
here means a green CORRECTNESS_r{N}.json.

``cpus`` (default 8, the driver-comparable setting) sizes local[N] and
shuffle partitions — raise it for scale-stress runs (data/sf1) where
the default serializes 6 M-row scans onto 8 threads. Per-query output
shows Spark and oracle wall time separately so DuckDB-side bottlenecks
at larger SFs are attributable.
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import sys
import time

import duckdb
import pandas as pd

REPO = "/root/repo"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _hash(pdf: pd.DataFrame) -> str:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[us]")
        elif pdf[c].dtype == object:
            # Spark DateType arrives as object-of-datetime.date while
            # DuckDB DATE arrives as datetime64 — the driver treats them
            # as equal (ev_retention_cohorts was driver-green), so
            # canonicalize dates before taking the dtype signature.
            nonnull = pdf[c].dropna()
            if len(nonnull) and all(
                type(v).__name__ == "date" for v in nonnull.head(100)
            ):
                pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    pdf = pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)
    # The driver's value-hash is dtype-sensitive: DuckDB SUM(BIGINT) →
    # HUGEINT → pandas float64 rendered "86.0" passes a pure %.17g CSV
    # hash against Spark's long "86" but fails the driver (r7's only
    # red, ev_cms_merge_days). Fold a width-insensitive dtype *kind*
    # signature (int vs float vs object vs datetime) into the hash so
    # this gate is at least as strict as the driver on numeric typing.
    kinds = ",".join(
        f"{c}:{'i' if pdf[c].dtype.kind == 'u' else pdf[c].dtype.kind}"
        for c in pdf.columns
    )
    return hashlib.md5(
        (kinds + "\n" + pdf.to_csv(index=False, float_format="%.17g")).encode()
    ).hexdigest()[:10]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", f"{REPO}/__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode defaults to a 1g driver JVM — fine at the sf0.01
        # gate, GC-thrash at scale-stress SFs (observed at sf1).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_entry = len(mod.entry(spark).collect())
    print(f"entry rows: {n_entry}")
    queries, oracles = mod.queries(), mod.oracle_sql()
    only = os.environ.get("SPARK_GRAFT_GATE_ONLY")
    if only:  # comma-separated subset, e.g. for post-edit spot checks
        keep = {s.strip() for s in only.split(",") if s.strip()}
        unknown = keep - set(queries)
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_GATE_ONLY unknown: {sorted(unknown)}")
        queries = {k: v for k, v in queries.items() if k in keep}
    bad = 0
    t0 = time.perf_counter()
    for name in queries:  # registry order, like the driver
        tq = time.perf_counter()
        sp = queries[name](spark, sf_dir).toPandas()
        dt = time.perf_counter() - tq
        if name not in oracles:
            print(f"{name:34s} {dt:6.2f}s rows {len(sp):5d} (no oracle)", flush=True)
            continue
        to = time.perf_counter()
        od = con.execute(oracles[name]).fetchdf()
        dto = time.perf_counter() - to
        ok = _hash(sp) == _hash(od) and len(sp) == len(od)
        bad += not ok
        print(
            f"{name:34s} {dt:6.2f}s oracle {dto:6.2f}s"
            f" rows spark={len(sp):5d} oracle={len(od):5d}"
            f"{' MISMATCH' if not ok else ''}",
            flush=True,
        )
    print(
        f"queries: {len(queries)} mismatches: {bad} "
        f"total {time.perf_counter() - t0:.0f}s"
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
