"""Same-host A/B of the round-13 oracle cost fixes (DuckDB side only).

Cross-session bench comparisons on this VM are invalid (identical code
has scored 33 s and 64 s on different days), so the claim "the verify
CTE rewrite cut doc_ppjoin_near_dups' oracle cost" is measured here by
running the OLD oracle text (extracted from git at the pre-fix commit)
and the NEW text back-to-back on the same host, asserting frame
equality — the exactness proof and the attribution in one run.

Usage: python scripts/oracle_ab_r13.py [sf_dir] [pre_fix_commit] [out]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

QUERIES = ["doc_ppjoin_near_dups", "doc_lsh_near_dups", "doc_canonical_by_pr",
           "doc_containment_dups", "emb_semantic_dedup"]


def old_oracles(commit: str) -> dict[str, str]:
    """Oracle SQL texts as of ``commit`` — dumped by a subprocess
    inside a git worktree of that commit (the r11 attribution
    playbook), so the old module tree composes its CTE f-strings with
    its own sibling imports."""
    import os
    import tempfile

    tree = tempfile.mkdtemp(prefix="pre_fix_wt_")
    os.rmdir(tree)
    subprocess.run(["git", "worktree", "add", "--detach", tree, commit],
                   check=True, capture_output=True)
    try:
        dump = subprocess.run(
            [sys.executable, "-c", (
                "import sys, json; sys.path.insert(0, '.');"
                "from flink_tank_spark.plans.registry import all_queries;"
                f"names = {QUERIES!r};"
                "print(json.dumps({n: s.oracle for n, s in"
                " all_queries().items() if n in names}))"
            )],
            cwd=tree, capture_output=True, text=True,
        )
        # check=True's CalledProcessError hides captured stderr (the old
        # commit's import error would be invisible — r13 advisory);
        # re-raise with it attached instead.
        if dump.returncode != 0:
            raise RuntimeError(
                f"old-commit oracle dump failed (rc={dump.returncode}) in "
                f"{tree}:\nSTDERR:\n{dump.stderr}\nSTDOUT:\n{dump.stdout}"
            )
        # last stdout line is the JSON payload; anything before it is
        # diagnostics from the old tree's imports — surface, don't drop.
        lines = dump.stdout.strip().splitlines()
        for diag in lines[:-1]:
            print(f"[old-tree stdout] {diag}", file=sys.stderr)
        return json.loads(lines[-1])
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", tree],
                       capture_output=True)


def main() -> None:
    global QUERIES
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    commit = sys.argv[2] if len(sys.argv) > 2 else "2bb1c3c"
    out_path = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_AB_r13.json"
    if len(sys.argv) > 4:  # optional comma-separated subset
        QUERIES = [q for q in sys.argv[4].split(",") if q]

    old = old_oracles(commit)
    from flink_tank_spark.plans.registry import all_queries
    new = {n: s.oracle for n, s in all_queries().items() if n in QUERIES}

    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    report = {"sf_dir": sf_dir, "pre_fix_commit": commit, "queries": {}}
    for name in QUERIES:
        if old.get(name) == new[name]:
            report["queries"][name] = {"unchanged": True}
            continue
        row = {}
        frames = {}
        # interleave old/new twice so a host-noise drift cannot pick
        # the winner (the r12 attribution playbook)
        for rep in range(2):
            for label, sql in (("old", old[name]), ("new", new[name])):
                t0 = time.time()
                frames[label] = con.execute(sql).fetchdf()
                row.setdefault(label, []).append(round(time.time() - t0, 1))
                # per-rep flush: a queue timeout mid-query keeps the
                # finished reps reconstructable from the log
                print(json.dumps({"progress": name, "rep": rep,
                                  "side": label, "sec": row[label][-1]}),
                      flush=True)
        pd.testing.assert_frame_equal(frames["old"], frames["new"])
        row["frames_equal"] = True
        row["speedup_best"] = round(min(row["old"]) / min(row["new"]), 2)
        report["queries"][name] = row
        print(json.dumps({name: row}), flush=True)

    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
