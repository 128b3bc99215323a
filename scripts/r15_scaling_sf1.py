"""sf1 scaling evidence: the bench's big movers at 8 vs 32 cores (r15,
verdict item #5).

    python scripts/r15_scaling_sf1.py [out_json] [queries] [reps]

The sf0.1 driver scaling block reads ~<=1 for most queries because the
inputs are KB-scale — per-task fixed overhead x 32 exceeds the compute,
so the low-core run wins (r14 verdict: "the sf0.1 bench cannot
demonstrate parallelism"). This artifact runs the engine-heavy movers
at sf1 (~10x the data) under SPARK_GRAFT_CPUS=32 and 8 in fresh
interleaved subprocesses and reports warm best-of-reps ratios
(expect >1 where the operators claim parallel shapes). Additive
measurement only — bench.py and the driver contract are untouched.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

DEFAULT = (
    "doc_triangles,doc_pagerank,doc_dedup_groups,doc_bm25_topk,"
    "doc_bpe_tokens,emb_srp_topk_mp,doc_simhash_near_dups,mm_wav_roundtrip"
)


def run(queries: str, cpus: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = queries
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = "/root/repo/data/sf1"
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=3600,
    )
    wall = round(time.perf_counter() - t0, 1)
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(f"bench failed rc={out.returncode}: {out.stderr[-2000:]}")
    d = json.loads(out.stdout.strip().splitlines()[-1])
    d["_wall"] = wall
    return d


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r15_scaling_sf1.json"
    queries = sys.argv[2] if len(sys.argv) > 2 else DEFAULT
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    report = {"sf_dir": "data/sf1", "queries": queries,
              "runs": {"32": [], "8": []}}
    for rep in range(reps):
        for cpus in (32, 8):  # interleaved
            r = run(queries, cpus)
            report["runs"][str(cpus)].append(r)
            print(json.dumps({"rep": rep, "cpus": cpus,
                              "warm": r["queries"], "wall": r["_wall"]}),
                  flush=True)
            with open(out_path, "w") as f:
                json.dump(report, f, indent=1)

    def best(runs):
        out = {}
        for r in runs:
            for q, v in r["queries"].items():
                out[q] = min(out.get(q, float("inf")), v)
        return out

    b32, b8 = best(report["runs"]["32"]), best(report["runs"]["8"])
    report["scaling_8_over_32"] = {
        q: {"warm32_best": b32[q], "warm8_best": b8[q],
            "ratio": round(b8[q] / b32[q], 2)}
        for q in sorted(set(b32) & set(b8))
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["scaling_8_over_32"]))


if __name__ == "__main__":
    main()
