"""Measured impact of the round-12 containment order-dictionary sidecar.

The round-11 advisory: after a re-rank compaction, every ingest
micro-batch re-derived the (tok, odf) ranking dictionary from the FULL
accumulated token index (index_order — an O(index) groupBy) and
force-broadcast it. Round 12 persists the dictionary once at
compact_rerank time and reads it per batch. This script quantifies the
per-batch saving on a real index and asserts the two order sources
produce IDENTICAL verdicts (they are the same dictionary by the
ranking invariant — this is a cost fix, not a semantics change).

Protocol: ingest 60% of the documents corpus (4 batches), re-rank,
then for each of 4 probe batches time `containment_batch(...).collect()`
twice — once ranked via the persisted sidecar, once via the
index_order fallback — with the accumulated index persisted in both
variants (mirroring the sink), so the delta isolates the dictionary
derivation + join-side difference.

Usage: python scripts/containment_sidecar_bench.py [sf_dir] [cpus] [out]

``sf_dir`` may also be ``synth:<n_docs>:<vocab>`` — a deterministic
HIGH-VOCABULARY corpus (words drawn uniformly from a <vocab>-word
space, 150 words/doc, every 10th probe doc a contiguous 80% slice of a
base doc so verified containment pairs exist). The r12 A/B ran on the
sf1 documents table whose 29,791 distinct shingles make the order
dictionary trivially small; the synthetic corpus pushes the
accumulated dictionary past 10^6 rows — the regime where the
fallback's per-batch O(index) re-aggregate + dictionary rebuild is
structurally expensive (round-12 verdict task 4).
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import tempfile
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))


def synth_corpus(n_docs: int, vocab: int, seed: int = 7):
    """Deterministic (doc_id, text) rows with ~149 distinct 3-shingles
    per doc and planted containment: every 10th doc in the LAST 40%
    (the probe region) is a contiguous 80% slice of a base-region doc,
    so its shingle set is a strict subset (containment 1.0)."""
    rng = random.Random(seed)
    words_per_doc = 150
    texts = []
    for _ in range(n_docs):
        texts.append(
            " ".join(f"w{rng.randrange(vocab)}" for _ in range(words_per_doc))
        )
    base_end = int(n_docs * 0.6)
    for i in range(base_end, n_docs):
        if (i - base_end) % 10 == 0:
            donor = texts[rng.randrange(base_end)].split(" ")
            texts[i] = " ".join(donor[: int(words_per_doc * 0.8)])
    return [(i, t) for i, t in enumerate(texts)]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "data/sf1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    out = sys.argv[3] if len(sys.argv) > 3 else "CONTAINMENT_SIDECAR_r12.json"
    # probe-batch count: more batches = smaller batches = the realistic
    # streaming regime (small per-trigger work against a large
    # accumulated index), where the fallback's O(index) re-aggregate is
    # proportionally heaviest
    n_probe = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.session import get_spark
    from flink_tank_spark.streaming import containment as ct

    spark = get_spark("containment-sidecar-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ct_sidecar_")
    idx = os.path.join(work, "idx")
    pd_ = os.path.join(work, "pairs")
    try:
        if sf_dir.startswith("synth:"):
            _, nd, vb = sf_dir.split(":")
            synth = synth_corpus(int(nd), int(vb))
            rows = spark.createDataFrame(
                synth, "doc_id long, text string"
            ).collect()
        else:
            docs = (
                load_table(spark, sf_dir, "documents")
                .select("doc_id", "text")
                .orderBy("doc_id")
            )
            rows = docs.collect()
        base, probes = rows[: int(len(rows) * 0.6)], rows[int(len(rows) * 0.6):]
        sink = ct.incremental_containment_sink(idx, pd_)
        for b in range(4):
            batch = spark.createDataFrame(
                [(r.doc_id, r.text) for r in base[b::4]],
                "doc_id long, text string",
            )
            sink(batch, b)
        ct.compact_rerank(spark, idx)

        side = ct.load_order(spark, idx)
        assert side is not None, "re-rank must persist the sidecar"
        n_dict = side.count()

        report = {
            "metric": "containment_sidecar_ab",
            "sf_dir": sf_dir,
            "n_base_docs": len(base),
            "dict_rows": n_dict,
            "batches": [],
        }
        n_probe_batches = n_probe
        for b in range(n_probe_batches):
            batch = spark.createDataFrame(
                [(r.doc_id, r.text) for r in probes[b::n_probe_batches]],
                "doc_id long, text string",
            )
            idx_tok = ct._read_index(spark, idx, ct.TOKENS_SUBDIR, 100 + b)
            idx_sh = ct._read_index(spark, idx, ct.SHINGLES_SUBDIR, 100 + b)
            idx_tok, idx_sh = idx_tok.persist(), idx_sh.persist()
            idx_tok.count(), idx_sh.count()  # materialize like the sink

            timings = {}
            results = {}
            for label, order in (
                ("sidecar", ct.load_order(spark, idx)),
                ("fallback_index_order", ct.index_order(idx_tok)),
            ):
                t0 = time.perf_counter()
                pairs, _, _ = ct.containment_batch(
                    batch, idx_tok, idx_sh, order_df=order
                )
                got = {
                    (r.id_a, r.id_b, r.n_common) for r in pairs.collect()
                }
                timings[label] = round(time.perf_counter() - t0, 3)
                results[label] = got
            assert results["sidecar"] == results["fallback_index_order"], (
                "order sources must be verdict-identical"
            )
            report["batches"].append(
                {"batch": b, "batch_docs": batch.count(),
                 "pairs": len(results["sidecar"]), **timings}
            )
            idx_tok.unpersist(), idx_sh.unpersist()

        tot_s = sum(r["sidecar"] for r in report["batches"])
        tot_f = sum(r["fallback_index_order"] for r in report["batches"])
        report["total_sidecar_sec"] = round(tot_s, 2)
        report["total_fallback_sec"] = round(tot_f, 2)
        report["speedup"] = round(tot_f / tot_s, 2) if tot_s else None
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
        print(json.dumps({k: report[k] for k in (
            "total_sidecar_sec", "total_fallback_sec", "speedup", "dict_rows")}))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
