"""Same-tree A/B of the AQE advisory-partition local default.

The r14 pre/post bench A/B showed a cluster of small scan-light queries
reading 1.2-2x slower warm in the optimized tree while the structural
movers and the whole-bench wall improved. The optimized tree differs
from pre-opt in BOTH code and session config
(coalescePartitions.parallelismFirst=false + 8 MB advisory), so this
script isolates the CONFIG axis: same HEAD, same bench methodology,
interleaved fresh subprocesses with SPARK_GRAFT_ADVISORY_PARTITION
toggled. If the small-query regression follows the advisory size, it is
the coalescing trade (fewer post-shuffle tasks on MB-scale exchanges);
if it does not, the cause is in the code diff and needs a different
hunt.

Usage: python scripts/r14_advisory_ab.py out.json [queries] [reps]
Measurement harness only (guide SS1) - not part of the engine or bench.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

DEFAULT_QUERIES = (
    "doc_token_stats,q1_pricing_summary,dim_scd2_asof_join,"
    "doc_dedup_stats,doc_simhash_near_dups,doc_lsh_near_dups,"
    "q3_shipping_priority,doc_bpe_tokens"
)
SETTINGS = ["8m", "64k"]  # 8m = shipped local default; 64k ~= old task parallelism


def run_bench(queries: str, advisory: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = queries
    env["SPARK_GRAFT_ADVISORY_PARTITION"] = advisory
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd="/root/repo",
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(
            f"bench.py failed (rc={out.returncode}, advisory={advisory}): "
            f"{out.stderr[-2000:]}"
        )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r14_advisory_ab.json"
    queries = sys.argv[2] if len(sys.argv) > 2 else DEFAULT_QUERIES
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    report = {"queries": queries, "settings": SETTINGS, "runs": {s: [] for s in SETTINGS}}
    for rep in range(reps):
        for s in SETTINGS:  # interleaved so a host phase cannot pick the winner
            r = run_bench(queries, s)
            report["runs"][s].append(r)
            print(json.dumps({"rep": rep, "advisory": s, "value": r["value"],
                              "queries": r["queries"]}), flush=True)

    best = {
        s: {q: min(run["queries"][q] for run in report["runs"][s])
            for q in report["runs"][s][0]["queries"]}
        for s in SETTINGS
    }
    report["comparison"] = {
        q: {
            "best_8m": best["8m"][q],
            "best_64k": best["64k"][q],
            "8m_over_64k": round(best["8m"][q] / best["64k"][q], 2),
        }
        for q in best["8m"]
    }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["comparison"], indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
