"""Interleaved A/B of the session Arrow warmup (r15, verdict item #4).

    python scripts/r15_arrow_warmup_ab.py [out_json] [reps]

Runs `SPARK_GRAFT_BENCH_ONLY=emb_cosine_topk bench.py` (the bench's
first Arrow-crossing query) in fresh subprocesses, alternating
SPARK_GRAFT_ARROW_WARMUP on/off, and records the query's COLD time and
the whole-process wall. The warmup moves the once-per-session
Python-worker/JIT first-touch out of the first query's cold; the wall
column shows whether the total session cost moved or just relocated.
Measurement harness only (guide §1).
"""

from __future__ import annotations

import json
import subprocess
import sys
import os
import time

QUERY = "emb_cosine_topk"


def run(warmup: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = QUERY
    env["SPARK_GRAFT_ARROW_WARMUP"] = "1" if warmup else ""
    t0 = time.perf_counter()
    out = subprocess.run(
        [sys.executable, "bench.py"], cwd="/root/repo", env=env,
        capture_output=True, text=True, timeout=1800,
    )
    wall = round(time.perf_counter() - t0, 2)
    if out.returncode != 0 or not out.stdout.strip():
        raise RuntimeError(f"bench failed rc={out.returncode}: {out.stderr[-2000:]}")
    d = json.loads(out.stdout.strip().splitlines()[-1])
    return {
        "warmup": warmup,
        "cold": d["cold"][QUERY],
        "warm": d["queries"][QUERY],
        "process_wall": wall,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r15_arrow_warmup_ab.json"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    runs = []
    for rep in range(reps):
        for w in (True, False):  # interleaved: host phase cannot pick the winner
            r = run(w)
            r["rep"] = rep
            runs.append(r)
            print(json.dumps(r), flush=True)
    summary = {}
    for w in (True, False):
        sel = [r for r in runs if r["warmup"] == w]
        summary["warmup_on" if w else "warmup_off"] = {
            "cold_best": min(r["cold"] for r in sel),
            "cold_all": [r["cold"] for r in sel],
            "warm_best": min(r["warm"] for r in sel),
            "wall_best": min(r["process_wall"] for r in sel),
            "wall_all": [r["process_wall"] for r in sel],
        }
    report = {"query": QUERY, "reps": reps, "runs": runs, "summary": summary}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
