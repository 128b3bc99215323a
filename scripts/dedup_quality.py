"""Near-dup detection quality vs PLANTED ground truth (round 6).

The mutating sfN generator (scripts/make_sfn.py) plants controlled
near-duplicates — documents at known edit rates, embeddings at known
target cosines — and records them in ``documents_truth.parquet`` /
``embeddings_truth.parquet``. This script turns those relations into
the measured precision/recall evidence the verbatim-replica corpora
could never produce (every metric there was degenerate by
construction):

- **Documents / MinHash-LSH** (the registry's ``doc_lsh_near_dups``
  constants via ``dedup.lsh_near_dup_pairs``): for the planted pairs
  whose TRUE shingle-Jaccard clears the operator threshold,
  - candidate recall — did LSH banding surface the pair at all?
  - detection recall — did it survive the exact rescore ≥ threshold
    (equals candidate recall by construction, since eligibility is
    defined by the same exact Jaccard the rescorer computes)?
  broken down by true-Jaccard band, plus the count of non-planted
  detections (background pairs genuinely above threshold — correct
  output, reported for context, not as "false positives").
- **Embeddings / IVF-blocked cosine** (the registry's
  ``emb_near_dup_pairs`` path): recall of planted pairs (all of which
  sit at cosine 0.90–0.985, far above the 0.45 threshold) — misses are
  pure BLOCKING misses (origin and replica assigned to disjoint probe
  cells), the honest cost of linear-in-corpus candidate generation.

Usage:
    python scripts/dedup_quality.py [sf_dir] [cpus]
Prints one JSON line per section (documents, embeddings).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "16")
    )
    os.environ.setdefault("SPARK_GRAFT_CPUS", str(cpus))
    if not os.path.exists(f"{sf_dir}/documents_truth.parquet"):
        print(json.dumps({"error": f"{sf_dir} has no truth sidecars — "
                          "rebuild with the mutating make_sfn.py"}))
        return 1

    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.operators import dedup, similarity
    from flink_tank_spark.operators.skew import spread_partitions
    from flink_tank_spark.session import get_spark

    spark = get_spark("dedup-quality", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # ---------------- documents: MinHash-LSH vs planted near pairs ----
    docs = spread_partitions(load_table(spark, sf_dir, "documents"))
    truth = spark.read.parquet(f"{sf_dir}/documents_truth.parquet")
    planted = (
        truth.filter(F.col("relation") == "near")
        .select(
            F.least("doc_id", "origin_doc_id").alias("id_a"),
            F.greatest("doc_id", "origin_doc_id").alias("id_b"),
        )
    )
    threshold = 0.8  # the registry constant (dedup.lsh_near_dup_pairs)
    shingled = dedup.shingle_sets(docs).persist()
    # true Jaccard of every planted pair — exact, same rescorer the
    # pipeline uses, so "eligible" is defined in the operator's own units
    planted_j = dedup.rescore_jaccard(planted, shingled).persist()
    # the registry's 4-band config (lsh_near_dup_pairs defaults): 8
    # perms x 2 rows — P(candidate | J=0.8) = 1-(1-0.64)^4 = 0.983
    sigs = dedup.minhash_from_shingled(shingled, n_perms=8)
    cands = dedup.lsh_candidate_pairs(sigs, max_bucket_size=64).persist()
    detected = dedup.rescore_jaccard(cands, shingled).filter(
        F.col("jaccard") >= threshold
    ).persist()

    bands = [(0.80, 0.85), (0.85, 0.90), (0.90, 0.95), (0.95, 1.01)]
    def _recall(joined, lo, hi):
        elig = planted_j.filter(
            (F.col("jaccard") >= lo) & (F.col("jaccard") < hi)
        )
        n_elig = elig.count()
        n_hit = elig.join(joined, ["id_a", "id_b"], "semi").count()
        return n_elig, n_hit

    cand_pairs = cands.select("id_a", "id_b")
    det_pairs = detected.select("id_a", "id_b")
    per_band = {}
    for lo, hi in bands:
        n_elig, n_cand_hit = _recall(cand_pairs, lo, hi)
        _, n_det_hit = _recall(det_pairs, lo, hi)
        per_band[f"[{lo:.2f},{min(hi, 1.0):.2f})"] = {
            "planted": n_elig,
            "candidate_recall": round(n_cand_hit / n_elig, 3) if n_elig else None,
            "detection_recall": round(n_det_hit / n_elig, 3) if n_elig else None,
        }
    n_elig_total = planted_j.filter(F.col("jaccard") >= threshold).count()
    n_det_planted = (
        planted_j.filter(F.col("jaccard") >= threshold)
        .join(det_pairs, ["id_a", "id_b"], "semi")
        .count()
    )
    n_detected = detected.count()
    n_planted_all = planted_j.count()
    print(json.dumps({
        "section": "documents_lsh",
        "sf": sf_tag,
        "threshold": threshold,
        "planted_near_pairs": n_planted_all,
        "planted_above_threshold": n_elig_total,
        "detection_recall": round(n_det_planted / n_elig_total, 3)
        if n_elig_total else None,
        "detected_total": n_detected,
        "detected_background": n_detected - n_det_planted,
        "candidate_pairs_generated": cand_pairs.count(),
        "per_true_jaccard_band": per_band,
    }), flush=True)
    # ---------------- documents: exact PPJoin vs planted truth --------
    # the completeness check: prefix filtering must find EVERY planted
    # pair whose true Jaccard clears the threshold — recall exactly 1.0
    # (anything less is an algorithm bug, not a tuning trade)
    pp_pairs = dedup.ppjoin_pairs(shingled).select("id_a", "id_b").persist()
    n_pp_hit = (
        planted_j.filter(F.col("jaccard") >= threshold)
        .join(pp_pairs, ["id_a", "id_b"], "semi")
        .count()
    )
    n_pp_total = pp_pairs.count()
    print(json.dumps({
        "section": "documents_ppjoin_exact",
        "sf": sf_tag,
        "threshold": threshold,
        "planted_above_threshold": n_elig_total,
        "detection_recall": round(n_pp_hit / n_elig_total, 3)
        if n_elig_total else None,
        "detected_total": n_pp_total,
        "lsh_detected_total": n_detected,
        "recall_delta_vs_lsh": n_pp_total - n_detected,
    }), flush=True)

    # ---------------- documents: SimHash Hamming-ball vs planted truth
    # doc_simhash_near_dups is an EXACT-RADIUS detector: recall is 1.0
    # at Hamming <= 3 by pigeonhole, but 64-bit SimHash distance rises
    # with edit rate — so the honest metric is the CAPTURE RATE of the
    # radius-3 ball by planted edit-rate band (its operating curve),
    # plus the planted pairs' Hamming distribution for calibration.
    from flink_tank_spark.plans import hamming as _hm

    sh_sigs = dedup.simhash_bits(docs).persist()
    sh_pairs = _hm.simhash_near_dup_pairs(sh_sigs).select("id_a", "id_b").persist()
    near_pairs_sh = (
        truth.filter(F.col("relation") == "near")
        .select(
            F.least("doc_id", "origin_doc_id").alias("id_a"),
            F.greatest("doc_id", "origin_doc_id").alias("id_b"),
            "edit_rate",
        )
    )
    xa = sh_sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sa"))
    xb = sh_sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sb"))
    hdist = sum(
        F.bit_count(
            _hm._block_int("sa", b).bitwiseXOR(_hm._block_int("sb", b))
        )
        for b in range(_hm.N_BLOCKS)
    ).cast("long")
    planted_h = (
        near_pairs_sh.join(xa, "id_a").join(xb, "id_b")
        .withColumn("hamming", hdist)
        .persist()
    )
    sh_bands = [(0.00, 0.06), (0.06, 0.09), (0.09, 0.13)]
    sh_per_band = {}
    for lo, hi in sh_bands:
        band = planted_h.filter(
            (F.col("edit_rate") >= lo) & (F.col("edit_rate") < hi)
        )
        n_band = band.count()
        n_hit = band.filter(F.col("hamming") <= _hm.HAMMING_K).count()
        sh_per_band[f"[{lo:.2f},{hi:.2f})"] = {
            "planted": n_band,
            "capture_rate": round(n_hit / n_band, 3) if n_band else None,
        }
    h_quantiles = (
        planted_h.groupBy().agg(
            *[F.expr(f"percentile(hamming, {q})").alias(f"p{int(q*100)}")
              for q in (0.25, 0.5, 0.75, 0.9)]
        ).first()
    )
    n_sh_total = sh_pairs.count()
    n_sh_planted = planted_h.filter(
        F.col("hamming") <= _hm.HAMMING_K
    ).count()
    print(json.dumps({
        "section": "documents_simhash_hamming3",
        "sf": sf_tag,
        "radius": _hm.HAMMING_K,
        "planted_near_pairs": planted_h.count(),
        "planted_within_radius": n_sh_planted,
        "capture_by_edit_rate_band": sh_per_band,
        "planted_hamming_quantiles": {
            "p25": float(h_quantiles["p25"]), "p50": float(h_quantiles["p50"]),
            "p75": float(h_quantiles["p75"]), "p90": float(h_quantiles["p90"]),
        },
        "detected_total": n_sh_total,
        "detected_background": n_sh_total - n_sh_planted,
        "note": "recall at the radius is 1.0 by pigeonhole; the curve "
                "shows how much planted mutation the radius-3 ball covers",
    }), flush=True)

    # ---------------- governance: split-leakage audit vs planted truth
    # doc_split_leakage = detected pairs whose endpoints straddle the
    # deterministic md5 train/val/test split. Ground truth: planted
    # above-threshold pairs that straddle splits. Leakage recall equals
    # detection recall restricted to cross-split pairs — measured here
    # directly so the audit's catch rate is pinned, not inferred.
    from flink_tank_spark.plans.llm import _split_col

    def _cross(df):
        return df.filter(
            _split_col(F.col("id_a")) != _split_col(F.col("id_b"))
        ).select("id_a", "id_b")

    planted_cross = _cross(planted_j.filter(F.col("jaccard") >= threshold))
    n_pc = planted_cross.count()
    n_pc_hit = planted_cross.join(det_pairs, ["id_a", "id_b"], "semi").count()
    n_det_cross = _cross(detected).count()
    print(json.dumps({
        "section": "governance_leakage",
        "sf": sf_tag,
        "planted_cross_split_pairs": n_pc,
        "leakage_recall": round(n_pc_hit / n_pc, 3) if n_pc else None,
        "audit_reported_pairs": n_det_cross,
        "audit_reported_background": n_det_cross - n_pc_hit,
    }), flush=True)

    # ---------------- fuzzy prefix linkage vs planted truth -----------
    # doc_fuzzy_near_dups is an EDIT-DISTANCE PREFIX matcher, not a
    # content near-dup detector: its contract is "first-12-token
    # prefixes within Levenshtein 20". Planted pairs whose mutations
    # fall inside the prefix beyond that are out of contract, so this
    # section reports the measured CAPTURE RATE by planted edit-rate
    # band — the honest operating curve — rather than recall against a
    # threshold defined in the operator's own units (as LSH above).
    from flink_tank_spark.plans.llm import doc_fuzzy_near_dups

    fz = doc_fuzzy_near_dups(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    ).persist()
    near_pairs = (
        truth.filter(F.col("relation") == "near")
        .select(
            F.least("doc_id", "origin_doc_id").alias("id_a"),
            F.greatest("doc_id", "origin_doc_id").alias("id_b"),
            "edit_rate",
        )
        .persist()
    )
    erate_bands = [(0.00, 0.06), (0.06, 0.09), (0.09, 0.13)]
    fz_per_band = {}
    for lo, hi in erate_bands:
        elig = near_pairs.filter(
            (F.col("edit_rate") >= lo) & (F.col("edit_rate") < hi)
        )
        n_elig = elig.count()
        n_hit = elig.join(fz, ["id_a", "id_b"], "semi").count()
        fz_per_band[f"[{lo:.2f},{hi:.2f})"] = {
            "planted": n_elig,
            "capture_rate": round(n_hit / n_elig, 3) if n_elig else None,
        }
    n_fz = fz.count()
    n_fz_planted = near_pairs.join(fz, ["id_a", "id_b"], "semi").count()
    print(json.dumps({
        "section": "documents_fuzzy_prefix",
        "sf": sf_tag,
        "planted_near_pairs": near_pairs.count(),
        "captured_planted": n_fz_planted,
        "detected_total": n_fz,
        "detected_background": n_fz - n_fz_planted,
        "per_edit_rate_band": fz_per_band,
    }), flush=True)

    for df in (shingled, planted_j, cands, detected, fz, near_pairs):
        df.unpersist()

    # ---------------- embeddings: IVF blocking vs planted near pairs --
    emb = spread_partitions(load_table(spark, sf_dir, "embeddings"))
    etruth = spark.read.parquet(f"{sf_dir}/embeddings_truth.parquet")
    eplanted = (
        etruth.filter(F.col("relation") == "near")
        .select(
            F.least("vec_id", "origin_vec_id").alias("id_a"),
            F.greatest("vec_id", "origin_vec_id").alias("id_b"),
            "target_cosine",
        )
        .persist()
    )
    n_cells = max(32, (emb.count() + 499) // 500)  # the registry rule
    centroids = emb.filter(F.col("vec_id") < n_cells)
    assigned = similarity.ivf_assign(emb, centroids, probes=2)
    pairs = similarity.cell_blocked_pairs(assigned, threshold=0.45).persist()
    n_pairs = pairs.count()
    n_eplanted = eplanted.count()
    n_ehit = eplanted.join(
        pairs.select("id_a", "id_b"), ["id_a", "id_b"], "semi"
    ).count()
    print(json.dumps({
        "section": "embeddings_ivf",
        "sf": sf_tag,
        "threshold": 0.45,
        "probes": 2,
        "n_cells": int(n_cells),
        "planted_near_pairs": n_eplanted,
        "blocking_recall": round(n_ehit / n_eplanted, 3) if n_eplanted else None,
        "detected_total": n_pairs,
        "detected_background": n_pairs - n_ehit,
    }), flush=True)

    # ---------------- embeddings: stateless SRP blocking ± multi-probe
    # the zero-maintenance streaming niche (emb_srp_near_dups): planted
    # recall at the registry's adaptive band width, with and without
    # the round-11 lowest-margin probe buckets (emb_srp_near_dups_mp) —
    # the recall lift multi-probe buys on an UNCHANGED index
    from flink_tank_spark.plans.srp import ND_BANDS, ND_PROBES, _nd_bits

    bits = _nd_bits(emb.count())
    for probes_mp in (0, ND_PROBES):
        sp_pairs = similarity.srp_near_dup_pairs(
            emb, threshold=0.45, n_planes=ND_BANDS * bits,
            n_bands=ND_BANDS, n_probes=probes_mp,
        ).persist()
        n_sp = sp_pairs.count()
        n_sp_hit = eplanted.join(
            sp_pairs.select("id_a", "id_b"), ["id_a", "id_b"], "semi"
        ).count()
        print(json.dumps({
            "section": "embeddings_srp",
            "sf": sf_tag,
            "threshold": 0.45,
            "bands": ND_BANDS,
            "bits_per_band": int(bits),
            "probes": probes_mp,
            "planted_near_pairs": n_eplanted,
            "blocking_recall": round(n_sp_hit / n_eplanted, 3)
            if n_eplanted else None,
            "detected_total": n_sp,
            "detected_background": n_sp - n_sp_hit,
        }), flush=True)
        sp_pairs.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
