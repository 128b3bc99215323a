"""Query-runner CLI over the registry — the batch-analytics entrypoint.

    python -m flink_tank_spark.tools.run_query --list
    python -m flink_tank_spark.tools.run_query q1_pricing_summary
    python -m flink_tank_spark.tools.run_query doc_lsh_near_dups --explain
    python -m flink_tank_spark.tools.run_query q6_forecast_revenue --oracle
    python -m flink_tank_spark.tools.run_query emb_cosine_topk --check
    python -m flink_tank_spark.tools.run_query --sql \\
        "SELECT lang, COUNT(*) FROM documents GROUP BY lang"

``--check`` runs the Spark plan AND the DuckDB oracle and diffs them —
the same comparison the correctness gate applies. ``--sql`` runs ad-hoc
Spark SQL with every catalog table (region nation customer supplier
part orders lineitem events documents embeddings) registered as a view
— the free-form entry point next to the curated registry.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_query", description="run a registry query")
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    ap.add_argument("-n", "--rows", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--oracle", action="store_true", help="print the DuckDB oracle SQL")
    ap.add_argument("--check", action="store_true", help="diff Spark vs DuckDB oracle")
    ap.add_argument("--sql", help="ad-hoc Spark SQL over the registered catalog views")
    args = ap.parse_args(argv)

    if args.sql:
        from flink_tank_spark.io.tables import register_tables
        from flink_tank_spark.session import get_spark

        spark = get_spark("run-sql")
        register_tables(spark, args.sf_dir)
        df = spark.sql(args.sql)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.rows, truncate=False)
        return 0

    from flink_tank_spark.plans.registry import all_queries

    registry = all_queries()
    if args.list or not args.name:
        for name, spec in sorted(registry.items()):
            tags = ",".join(spec.tags)
            print(f"{name:28s} [{tags}] {spec.description}")
        return 0
    if args.name not in registry:
        print(f"unknown query {args.name!r}; use --list", file=sys.stderr)
        return 2
    spec = registry[args.name]

    if args.oracle:
        print(spec.oracle or "-- not SQL-expressible (rows-only check)")
        return 0

    from flink_tank_spark.session import get_spark

    spark = get_spark(f"run-{args.name}")
    df = spec.spark(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.check:
        from flink_tank_spark.plans.oracle import check_query

        problems = check_query(spark, args.sf_dir, spec)
        print(f"{args.name}: " + ("OK" if not problems else "; ".join(problems)))
        return 0 if not problems else 1
    df.show(args.rows, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
