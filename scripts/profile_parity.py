"""Timing + parity profile of the full registry at the driver's gate SF.

Mirrors the driver: per query, run the Spark plan (toPandas) and the
DuckDB oracle, compare, and report wall time for each side. Output is a
table sorted by total cost — the budget the driver's correctness harness
actually spends. Run: python scripts/profile_parity.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from flink_tank_spark.plans.oracle import compare_frames, duckdb_connection
from flink_tank_spark.plans.registry import all_queries
from flink_tank_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("profile-parity", cpus=32)
    rows = []
    t_all = time.perf_counter()
    for name, spec in all_queries().items():
        t0 = time.perf_counter()
        err = None
        try:
            spark_pdf = spec.spark(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            err = f"spark: {e}"
            spark_pdf = None
        t1 = time.perf_counter()
        problems = []
        if err is None and spec.oracle is not None:
            con = duckdb_connection(sf_dir)
            try:
                oracle_pdf = con.execute(spec.oracle).fetchdf()
                problems = compare_frames(spark_pdf, oracle_pdf)
            except Exception as e:  # noqa: BLE001
                err = f"oracle: {e}"
            finally:
                con.close()
        t2 = time.perf_counter()
        rows.append(
            dict(name=name, spark_s=round(t1 - t0, 2), oracle_s=round(t2 - t1, 2),
                 total_s=round(t2 - t0, 2), ok=err is None and not problems,
                 err=err or ("; ".join(problems) or None))
        )
        print(f"{name:28s} spark={t1 - t0:6.2f}s oracle={t2 - t1:6.2f}s "
              f"{'OK' if rows[-1]['ok'] else 'FAIL: ' + str(rows[-1]['err'])[:120]}",
              flush=True)
    total = time.perf_counter() - t_all
    print(f"\nTOTAL {total:.1f}s over {len(rows)} queries")
    print("\nTop 10 by total cost:")
    for r in sorted(rows, key=lambda r: -r["total_s"])[:10]:
        print(f"  {r['name']:28s} {r['total_s']:6.2f}s (spark {r['spark_s']}, oracle {r['oracle_s']})")
    with open("/tmp/profile_parity.json", "w") as f:
        json.dump({"total_s": round(total, 1), "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
