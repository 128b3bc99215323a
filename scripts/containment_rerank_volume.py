"""Candidate-volume effect of the containment index re-rank
(streaming/containment.compact_rerank).

Measures the round-10 verdict's documented trade: the streaming
containment index freezes a content-addressed (md5) token order at
ingest, forfeiting the rarest-first prefix optimization; compact_rerank
rebuilds the index under the accumulated-df order during a maintenance
window. This script quantifies the reclaim:

1. ingest the first half of the corpus (frozen md5 order);
2. probe with the second half against the UN-reranked index, counting
   prefix-join rows and surviving candidates (stats hook);
3. re-rank the index, probe with the SAME batch, count again;
4. assert the verified pair sets are IDENTICAL (losslessness) and
   report the volume ratio.

Usage: python scripts/containment_rerank_volume.py [sf_dir] [cpus] [out]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out_path = sys.argv[3] if len(sys.argv) > 3 else "CONTAINMENT_RERANK_r11.json"
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.session import get_spark
    from flink_tank_spark.streaming import containment as ct

    spark = get_spark("containment-rerank-volume", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    work = tempfile.mkdtemp(prefix="ct_rerank_")
    idx = os.path.join(work, "idx")
    try:
        # ingest half A as two batches under the frozen md5 order
        sink = ct.incremental_containment_sink(idx, os.path.join(work, "pairs"))
        sink(half_a.filter(F.col("doc_id") % 4 == 0), 0)
        sink(half_a.filter(F.col("doc_id") % 4 == 2), 1)

        def probe() -> dict:
            idx_tok = ct._read_index(spark, idx, ct.TOKENS_SUBDIR, 99).persist()
            idx_sh = ct._read_index(spark, idx, ct.SHINGLES_SUBDIR, 99).persist()
            stats: dict = {}
            verified, _, _ = ct.containment_batch(half_b, idx_tok, idx_sh, stats)
            res = {
                "prefix_rows": stats["prefix_rows"].count(),
                "candidates": stats["candidates"].count(),
                "verified": sorted(
                    (r["id_a"], r["id_b"]) for r in verified.collect()
                ),
            }
            idx_tok.unpersist()
            idx_sh.unpersist()
            return res

        before = probe()
        ct.compact_rerank(spark, idx)
        after = probe()

        assert before["verified"] == after["verified"], (
            "re-rank changed the verified pair set — losslessness violated"
        )
        result = {
            "sf_dir": sf_dir,
            "n_index_docs": half_a.count(),
            "n_probe_docs": half_b.count(),
            "prefix_rows_before": before["prefix_rows"],
            "prefix_rows_after": after["prefix_rows"],
            "candidates_before": before["candidates"],
            "candidates_after": after["candidates"],
            "candidate_ratio": round(
                after["candidates"] / max(1, before["candidates"]), 4
            ),
            "verified_pairs": len(after["verified"]),
            "verified_identical": True,
        }
        print(json.dumps(result))
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
