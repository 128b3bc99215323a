"""Cross-round same-host bench attribution (the r11/r12 playbook,
made a reusable script so the step can't be skipped again — r13
verdict #2).

Cross-session bench numbers on this VM are incomparable (identical
code has scored 33.3 s and 64.4 s on different days), so any raw
round-over-round mover must be attributed on ONE host: check out the
previous round's HEAD in a git worktree, run ITS bench.py and the
current tree's bench.py INTERLEAVED (old,new,old,new — a monotone
host drift then cannot pick a winner), and additionally A/B the named
suspect queries in isolation (SPARK_GRAFT_BENCH_ONLY) where the short
run sharpens the comparison. Every run is a fresh subprocess (own JVM)
so no cache or session state leaks between sides.

Usage:
    python scripts/bench_attribution.py OLD_COMMIT OUT.json \
        [--sf-dir /root/testdata/sf0.1] [--reps 2] \
        [--movers q1,q2,...] [--mover-reps 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time


def run_bench(tree: str, sf_dir: str, only: str | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "bench.py"], cwd=tree, env=env,
        capture_output=True, text=True,
    )
    wall = round(time.time() - t0, 1)
    if p.returncode != 0:
        raise RuntimeError(
            f"bench.py failed in {tree} (rc={p.returncode}):\n{p.stderr[-4000:]}"
        )
    out = json.loads(p.stdout.strip().splitlines()[-1])
    out["_wall"] = wall
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old_commit")
    ap.add_argument("out")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--movers", default="")
    ap.add_argument("--mover-reps", type=int, default=3)
    args = ap.parse_args()

    new_commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    tree = tempfile.mkdtemp(prefix="bench_attr_wt_")
    os.rmdir(tree)
    subprocess.run(["git", "worktree", "add", "--detach", tree,
                    args.old_commit], check=True, capture_output=True)
    report: dict = {
        "old_commit": args.old_commit, "new_commit": new_commit,
        "sf_dir": args.sf_dir, "interleave_order": [],
        "full_runs": {"old": [], "new": []},
        "movers": args.movers, "mover_runs": {"old": [], "new": []},
    }

    def flush() -> None:  # queue timeouts must not lose finished reps
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)

    try:
        for rep in range(args.reps):
            for label, where in (("old", tree), ("new", ".")):
                r = run_bench(where, args.sf_dir)
                report["full_runs"][label].append(r)
                report["interleave_order"].append(label)
                print(json.dumps({"rep": rep, "side": label,
                                  "warm_total": r.get("value"),
                                  "wall": r["_wall"]}), flush=True)
                flush()
        if args.movers:
            for rep in range(args.mover_reps):
                for label, where in (("old", tree), ("new", ".")):
                    r = run_bench(where, args.sf_dir, only=args.movers)
                    report["mover_runs"][label].append(r)
                    print(json.dumps({"mover_rep": rep, "side": label,
                                      "queries": r.get("queries")}),
                          flush=True)
                    flush()
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", tree],
                       capture_output=True)

    # per-query best-of-reps comparison over the common warm set
    def best(runs: list[dict]) -> dict[str, float]:
        out: dict[str, float] = {}
        for r in runs:
            for q, v in (r.get("queries") or {}).items():
                out[q] = min(out.get(q, float("inf")), v)
        return out

    for section, key in (("full_runs", "comparison"),
                         ("mover_runs", "mover_comparison")):
        ob, nb = best(report[section]["old"]), best(report[section]["new"])
        report[key] = {
            q: {"old_best": ob[q], "new_best": nb[q],
                "new_over_old": round(nb[q] / ob[q], 2) if ob[q] else None}
            for q in sorted(set(ob) & set(nb))
        }
    if report["comparison"]:
        tot_old = sum(v["old_best"] for v in report["comparison"].values())
        tot_new = sum(v["new_best"] for v in report["comparison"].values())
        report["common_set_totals"] = {
            "old_best_sum": round(tot_old, 2),
            "new_best_sum": round(tot_new, 2),
            "new_over_old": round(tot_new / tot_old, 3),
        }
    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
