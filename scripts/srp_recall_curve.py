"""Banded-SRP recall/cost curve: recall@5 and candidate fraction per
band configuration.

The SRP analogue of ivf_recall_curve.py: for (planes, bands) settings
over the embeddings table it reports

- recall@5 of the band-blocked search vs the exact brute-force top-5
  (macro = mean per-query recall, the registered emb_srp_recall
  measurement generalized across configs);
- mean candidate FRACTION per query (candidates scored / corpus) — the
  cost side of the OR-amplification knob 1-(1-p^r)^b.

On the synthetic near-isotropic corpus recall tracks the candidate
fraction closely (true neighbors at cos ≈ 0.3 agree on only ~61% of
hyperplanes); the registered 6×4 config sits at the measured knee.

Usage:
    python scripts/srp_recall_curve.py [sf_dir] [cpus]
Prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (planes, bands, query-side probes) — probes=0 is the plain banded
# search; probes>0 adds the lowest-margin 1/2-bit flip buckets
# (multi-probe LSH, round 11)
CONFIGS = [
    (16, 4, 0), (24, 6, 0), (16, 8, 0), (24, 4, 0), (32, 4, 0),
    (24, 6, 2), (24, 6, 6), (24, 6, 8),
    (25, 5, 8), (25, 5, 24),
    (24, 4, 16), (24, 4, 48),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))

    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.operators import similarity
    from flink_tank_spark.operators.skew import spread_partitions
    from flink_tank_spark.session import get_spark

    spark = get_spark("srp-recall-curve", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spread_partitions(load_table(spark, sf_dir, "embeddings")).persist()
    n_corpus = emb.count()
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.cosine_topk(emb, queries, k=5).collect()
    }
    n_queries = len({q for q, _ in exact})

    for planes, bands, probes in CONFIGS:
        got = similarity.srp_topk(
            emb, queries, k=5, n_planes=planes, n_bands=bands,
            n_probes=probes,
        ).collect()
        hits_per_q: dict[int, int] = {}
        for r in got:
            if (r["query_id"], r["neighbor_id"]) in exact:
                hits_per_q[r["query_id"]] = hits_per_q.get(r["query_id"], 0) + 1
        qids = {q for q, _ in exact}
        macro = (
            sum(hits_per_q.get(q, 0) / 5.0 for q in qids) / len(qids)
            if qids else 0.0
        )
        # candidate fraction: distinct band-collision partners / corpus
        keys = emb.select(
            "vec_id",
            F.explode(
                similarity.srp_band_keys(
                    similarity.as_double_array(F.col("embedding")), planes, bands
                )
            ).alias("band_key"),
        ).persist()
        if probes > 0:
            qk = queries.select(
                F.col("vec_id").alias("qid"),
                F.explode(
                    similarity.srp_probe_keys(
                        similarity.as_double_array(F.col("embedding")),
                        planes, bands, 64, probes,
                    )
                ).alias("band_key"),
            )
        else:
            qk = keys.filter(F.col("vec_id") < 10).select(
                F.col("vec_id").alias("qid"), "band_key"
            )
        n_cand = (
            qk.join(keys, "band_key")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
            .distinct()
            .count()
        )
        keys.unpersist()
        print(json.dumps({
            "sf_dir": sf_dir,
            "n_corpus": n_corpus,
            "planes": planes,
            "bands": bands,
            "rows_per_band": planes // bands,
            "probes": probes,
            "recall_at_5_macro": round(macro, 4),
            "mean_candidate_fraction": round(
                n_cand / (n_queries * max(n_corpus - 1, 1)), 4
            ),
        }))
    emb.unpersist()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
