"""Benchmark harness: run the headline queries and print ONE JSON line.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS;
SPARK_GRAFT_BENCH_ONLY=q1,q2 runs just the named registry queries —
any registry name, not only the default bench set — for scale
spot-checks at big SF dirs where the full set would take too long)

Per query: one COLD run (recorded — first-touch codegen/broadcast/
shared-stage cost) followed by two timed warm runs — plus a THIRD when
the two disagree by >1.5x (single warm runs on this VM show stochastic
multi-x host-noise spikes) — of which the BEST is reported. ``value`` is
the sum of the per-query best-warm times; ``spread`` is each query's
max/min warm ratio so residual instability is visible in the JSON.
Prints: {"metric": "...", "value": total_sec, "unit": "sec",
         "queries": {name: best_warm_sec, ...},
         "cold_total": sec, "cold": {name: first_run_sec, ...},
         "spread": {name: ratio, ...}, "sf": sf}
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_tank_spark.plans.registry import all_queries
    from flink_tank_spark.session import get_spark

    spark = get_spark("flink_tank_spark-bench")

    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        unknown = names - set(all_queries())
        if unknown:
            raise KeyError(f"SPARK_GRAFT_BENCH_ONLY names not in registry: {sorted(unknown)}")
        specs = [s for s in all_queries().values() if s.name in names]
    else:
        specs = [s for s in all_queries().values() if s.bench]
    specs.sort(key=lambda s: s.name)

    # Warm the JVM/codegen/catalog on a trivial plan so per-query numbers
    # measure execution, not first-touch initialization.
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    spread: dict[str, float] = {}
    for spec in specs:
        # Warm run first (codegen compile, parquet footer cache, broadcast
        # build), then the BEST of two timed runs measures steady-state
        # execution — this VM shows stochastic multi-x spikes on single
        # runs (JVM/host noise), and min-of-2 keeps one spike from
        # reading as a regression. collect() is fine because every
        # headline query returns a small (aggregated) result. The warm-up
        # is also recorded (``cold``) so first-touch cost — codegen,
        # shared-stage builds — stays visible instead of disappearing
        # into an untimed run.
        t0 = time.perf_counter()
        spec.spark(spark, sf_dir).collect()
        cold[spec.name] = round(time.perf_counter() - t0, 4)
        runs: list[float] = []
        for _ in range(2):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        # spread-damping (r12 advisory): single-session host noise shows
        # stochastic 2-3x spikes on individual runs. When the two warm
        # runs disagree by >1.5x, take a third so one spike cannot set
        # the reported number; the per-query spread column makes any
        # residual instability visible instead of needing a separate
        # attribution round.
        if max(runs) / min(runs) > 1.5:
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[spec.name] = round(min(runs), 4)
        spread[spec.name] = round(max(runs) / min(runs), 2)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "cold_total": round(sum(cold.values()), 4),
        "cold": cold,
        "spread": spread,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    # Regime guidance measured in WAND_BENCH_r07.json (fresh-batch,
    # cache-honest): WAND's pruning overhead only pays for itself from
    # ~128 queries/batch; the batch-64 headline row deliberately sits
    # BELOW the crossover to keep both regimes visible.
    if "doc_bm25_wand_batch64" in timings:
        out["notes"] = {
            "doc_bm25_wand_batch64": (
                "WAND crossover is ~128 queries/batch; below that run "
                "bm25_topk (exact) — this row measures the pre-crossover "
                "regime on purpose"
            )
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
