"""SimHash Hamming-ball near-dups (plans/hamming.py): the pigeonhole
blocking must be lossless — blocked pairs == brute-force all-pairs at
the configured radius — and each reported distance must be the true
Hamming distance of the signatures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tank_spark.operators import dedup
from flink_tank_spark.plans import hamming

SF = "/root/testdata/sf0.001"


def _sigs(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return dedup.simhash_bits(docs).cache()


def _brute_pairs(spark, sigs, k):
    a = sigs.select(F.col("doc_id").alias("ia"), F.col("simhash").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("ib"), F.col("simhash").alias("sb"))
    d = sum(
        F.when(F.substring("sa", i + 1, 1) != F.substring("sb", i + 1, 1), 1).otherwise(0)
        for i in range(64)
    )
    return {
        (r.ia, r.ib, r.d)
        for r in a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("d", d.cast("long"))
        .filter(F.col("d") <= k)
        .collect()
    }


def test_pigeonhole_blocking_is_lossless(spark):
    sigs = _sigs(spark)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming.simhash_near_dup_pairs(sigs).collect()
    }
    assert got == _brute_pairs(spark, sigs, hamming.HAMMING_K)


def test_radius_zero_is_exact_duplicate_set(spark):
    sigs = _sigs(spark)
    got = {
        (r.id_a, r.id_b)
        for r in hamming.simhash_near_dup_pairs(sigs, k=0).collect()
    }
    assert got == {(a, b, 0)[:2] for (a, b, d) in _brute_pairs(spark, sigs, 0)}


def test_block_int_parses_signature_bits(spark):
    df = spark.createDataFrame([(1, "0" * 15 + "1" + "1" + "0" * 47)], "doc_id long, simhash string")
    row = df.select(
        hamming._block_int("simhash", 0).alias("b0"),
        hamming._block_int("simhash", 1).alias("b1"),
        hamming._block_int("simhash", 2).alias("b2"),
    ).first()
    assert (row.b0, row.b1, row.b2) == (1, 1 << 15, 0)


def test_k_beyond_blocking_guarantee_is_refused(spark):
    # N_BLOCKS is fixed at HAMMING_K+1; a larger radius would silently
    # lose recall (pigeonhole needs k+1 blocks), so it must raise.
    import pytest

    sigs = spark.createDataFrame(
        [(1, "0" * 64), (2, "0" * 64)], "doc_id long, simhash string"
    )
    with pytest.raises(ValueError, match="exceeds HAMMING_K"):
        hamming.simhash_near_dup_pairs(sigs, k=hamming.HAMMING_K + 1)
