"""Exact set-containment join (operators/dedup.containment_pairs):
prefix blocking must be lossless (blocked == brute force at the
threshold), and the operator must catch the subset-duplicate case
Jaccard dedup is structurally blind to.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tank_spark.operators import dedup

SF = "/root/testdata/sf0.001"


def test_prefix_blocking_is_lossless(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = dedup.shingle_sets(docs).cache()
    got = {
        (r.id_a, r.id_b)
        for r in dedup.containment_pairs(sh).collect()
    }
    a = sh.select(F.col("doc_id").alias("ia"), F.col("shingles").alias("sa"))
    b = sh.select(F.col("doc_id").alias("ib"), F.col("shingles").alias("sb"))
    nc = F.size(F.array_intersect("sa", "sb"))
    brute = {
        (r.ia, r.ib)
        for r in a.crossJoin(b)
        .filter(F.col("ia") != F.col("ib"))
        .filter(nc * 10 >= F.size("sa") * 9)
        .collect()
    }
    assert got == brute and brute, "blocking lost (or test degenerate)"


def test_catches_subset_duplicate_jaccard_misses(spark):
    # A = 30 tokens fully quoted inside B = A + 300 fresh tokens:
    # containment(A->B) = 1.0 but Jaccard ~ 0.09 — invisible to any
    # Jaccard-0.8 pass (LSH and PPJoin alike), the case this join exists for
    small = " ".join(f"tok{i}" for i in range(30))
    big = small + " " + " ".join(f"pad{i}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, " ".join(f"other{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    sh = dedup.shingle_sets(docs).cache()
    cont = dedup.containment_pairs(sh).collect()
    assert [(r.id_a, r.id_b) for r in cont] == [(1, 2)]
    assert cont[0].containment == 1.0 and cont[0].jaccard < 0.2
    jacc = dedup.ppjoin_pairs(sh).collect()
    assert not jacc, "a Jaccard-0.8 pass should NOT see the subset pair"
