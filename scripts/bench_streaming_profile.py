"""Throughput bench for the streaming-incremental column profiler.

Drives the profile foreachBatch sink batch-by-batch over the lineitem
numeric surface split into N equal micro-batches, timing each sink call
— then folds the state and asserts BIT-equality with the one-pass batch
profile over the same rows (the bench refuses to report a number for a
wrong answer). Also times a post-compaction batch (small-file hygiene)
and the fold itself.

Per-batch cost here is dominated by the distinct-pair delta write
(stats deltas are 8 rows regardless of batch size); unlike the
near-dup sinks there is NO index probe against accumulated state, so
per-batch wall should stay FLAT as the corpus grows — that flatness is
the scale argument, and the printed per_batch_wall list is the
evidence.

Usage: python scripts/bench_streaming_profile.py [sf_dir] [cpus] [n_batches]
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from pyspark.sql import functions as F

    from flink_tank_spark.session import get_spark
    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.plans.profile import PROFILE_COLS, profile_numeric
    from flink_tank_spark.streaming import profile as sprof

    spark = get_spark("streaming-profile-bench", cpus=cpus)
    work = tempfile.mkdtemp(prefix="sprof_bench_")
    out: dict = {"metric": "streaming_profile_throughput",
                 "sf": os.path.basename(sf_dir.rstrip("/")).removeprefix("sf"),
                 "cpus": cpus, "n_batches": n_batches}
    try:
        li = load_table(spark, sf_dir, "lineitem").select(*PROFILE_COLS)
        n_rows = li.count()
        pdir = os.path.join(work, "prof")
        sink = sprof.incremental_profile_sink(pdir, PROFILE_COLS)
        batches = [
            li.filter(F.pmod(F.col("l_orderkey"), n_batches) == i)
            for i in range(n_batches)
        ]
        walls = []
        t0 = time.monotonic()
        for i, b in enumerate(batches):
            tb = time.monotonic()
            sink(b, i)
            walls.append(round(time.monotonic() - tb, 2))
        wall = time.monotonic() - t0

        tf = time.monotonic()
        folded = {tuple(r) for r in sprof.load_profile(spark, pdir).collect()}
        fold_wall = time.monotonic() - tf
        expected = {
            tuple(r) for r in profile_numeric(li, PROFILE_COLS).collect()
        }
        assert folded == expected, "streamed profile != batch profile"

        tc = time.monotonic()
        sprof.compact(spark, pdir)
        compact_wall = time.monotonic() - tc
        tb = time.monotonic()
        sink(batches[0], n_batches)  # replayed slice, post-compact cost
        post_compact = time.monotonic() - tb

        out["rows"] = n_rows
        out["wall_sec"] = round(wall, 2)
        out["rows_per_sec"] = round(n_rows / wall, 1)
        out["per_batch_wall"] = walls
        out["fold_wall_sec"] = round(fold_wall, 2)
        out["compact_wall_sec"] = round(compact_wall, 2)
        out["post_compact_batch_wall"] = round(post_compact, 2)
        out["fold_equals_batch"] = True
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
