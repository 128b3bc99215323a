"""Per-stage profile of registry queries via the Spark UI REST API.

    python scripts/r14_profile_query.py q17_small_quantity,mm_wav_roundtrip \
        [sf_dir] [cpus] [warm_reps]

For each named query: one cold run + ``warm_reps`` warm runs (collect()),
each labelled with setJobDescription("<name>#cold|warm<i>"); afterwards the
script reads /api/v1/applications/<app>/jobs and /stages and prints, per
run, the jobs it launched and each job's stages with submission-to-
completion wall time, task count, executor run/CPU time, shuffle bytes,
and the stage's first plan line — the data needed to attribute a slow
query to scheduling overhead vs a specific exchange/UDF stage.

Measurement harness only (guide §1): not part of the engine or bench.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

UI_PORT = int(os.environ.get("SPARK_GRAFT_UI_PORT", "4055"))


def _get(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1{path}") as r:
        return json.load(r)


def main() -> None:
    names = [s for s in sys.argv[1].split(",") if s]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = sys.argv[3] if len(sys.argv) > 3 else os.environ.get("SPARK_GRAFT_CPUS", "32")
    warm_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from pyspark.sql import SparkSession

    from flink_tank_spark.plans.registry import all_queries

    n = int(cpus)
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName("r14-profile")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", str(4 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.retainedJobs", "10000")
        .config("spark.ui.retainedStages", "10000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    # session warm-up like bench.py
    spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).count()

    walls: dict[str, float] = {}
    for name in names:
        spec = specs[name]
        for run in ["cold"] + [f"warm{i}" for i in range(warm_reps)]:
            label = f"{name}#{run}"
            spark.sparkContext.setJobDescription(label)
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).collect()
            walls[label] = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)

    app = _get("/applications")[0]["id"]
    jobs = _get(f"/applications/{app}/jobs?status=succeeded") + _get(
        f"/applications/{app}/jobs?status=failed"
    )
    stages = {s["stageId"]: s for s in _get(f"/applications/{app}/stages")}

    def ms(s: str) -> float:
        return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))

    by_label: dict[str, list] = {}
    for j in jobs:
        d = j.get("description", "") or ""
        if "#" in d:
            by_label.setdefault(d, []).append(j)
    for label, wall in walls.items():
        print(f"\n=== {label}  wall={wall:.3f}s  jobs={len(by_label.get(label, []))}")
        for j in sorted(by_label.get(label, []), key=lambda j: j["jobId"]):
            jt = ms(j["completionTime"]) - ms(j["submissionTime"])
            print(f"  job {j['jobId']:4d}  ~{jt:4.0f}s  stages={len(j['stageIds'])}")
            for sid in sorted(j["stageIds"]):
                st = stages.get(sid)
                if not st or st.get("status") == "SKIPPED":
                    continue
                dur = 0.0
                if st.get("firstTaskLaunchedTime") and st.get("completionTime"):
                    dur = ms(st["completionTime"]) - ms(st["firstTaskLaunchedTime"])
                desc = (st.get("description") or st.get("name") or "")[:110]
                print(
                    f"    stage {sid:4d} {st['status']:9s} dur~{dur:5.1f}s "
                    f"tasks={st['numCompleteTasks']:3d} "
                    f"run={st['executorRunTime']/1000:7.2f}s "
                    f"cpu={st['executorCpuTime']/1e9:7.2f}s "
                    f"shR={st['shuffleReadBytes']:>9d} shW={st['shuffleWriteBytes']:>9d} "
                    f"in={st['inputBytes']:>9d}  {desc}"
                )
    print("\nwalls:", json.dumps({k: round(v, 3) for k, v in walls.items()}))


if __name__ == "__main__":
    main()
