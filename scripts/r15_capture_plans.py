"""Dump .explain('formatted') for registry queries into plans/r15/.

    python scripts/r15_capture_plans.py <suffix> [query,query,...]

Writes plans/r15/<query>_<suffix>.txt (suffix = before|after). With no
query list, captures the full bench set. Shared-stage memoization is
disabled so every plan shows its complete physical tree instead of an
InMemoryTableScan over a previously persisted prefix.

Planning only — no job is executed, so this is safe to run while other
measurements are in flight.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r15"


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = (
        {s.strip() for s in sys.argv[2].split(",") if s.strip()}
        if len(sys.argv) > 2
        else None
    )
    from flink_tank_spark.plans import shared
    from flink_tank_spark.plans.registry import all_queries
    from flink_tank_spark.session import get_spark

    shared.DISABLE = True
    spark = get_spark("r15-plan-capture")
    os.makedirs(OUT, exist_ok=True)
    for name, spec in sorted(all_queries().items()):
        if only is not None:
            if name not in only:
                continue
        elif not spec.bench:
            continue
        df = spec.spark(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"{name}: {len(txt.splitlines())} plan lines -> {path}", flush=True)


if __name__ == "__main__":
    main()
