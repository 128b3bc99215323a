"""Skew-mitigation operators: salted two-stage aggregation.

At 100 TB a handful of hot keys (one viral user, one null-ish default)
can pin a single reducer. AQE's skew-join splitting handles JOIN skew;
for AGGREGATIONS over skewed keys the standard fix is salting: shard
each key into ``n_salts`` sub-keys, pre-aggregate the shards (stage 1
spreads the hot key over n reducers), then merge shards (stage 2 moves
only n rows per key).

For algebraic aggregates Spark's own partial aggregation already does
map-side combining — salting matters when the per-key state is too big
for a map-side hash (huge distinct sets, collect-style aggs) or when a
single reduce key exceeds one task. The operator is exposed as a pure
transform and its count form is oracle-checked (same result as a plain
groupBy, by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[Column, Column, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a random salt shard per input row.

    ``aggs``: (stage1_agg_expr, stage2_merge_expr_over('<name>'), name).
    E.g. a count: ``(F.count(F.lit(1)), F.sum("n"), "n")``; a sum:
    ``(F.sum("x"), F.sum("sx"), "sx")``. Only algebraic aggregates
    (mergeable partials) are valid here — the same restriction any
    two-phase combiner has.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    stage1 = salted.groupBy(*keys, "_salt").agg(
        *[e.alias(name) for e, _, name in aggs]
    )
    return stage1.groupBy(*keys).agg(
        *[merge.alias(name) for _, merge, name in aggs]
    )


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """Salted count per key group; result identical to a plain
    ``groupBy(keys).count()`` under ANY salt assignment."""
    return salted_agg(
        df,
        keys,
        [(F.count(F.lit(1)), F.sum("n"), "n")],
        n_salts=n_salts,
    )


def spread_partitions(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition IF the input is under-parallelized.

    The inverse skew problem: a byte-small but CPU-dense input (a few
    MB of text that will fan out into millions of hash evaluations)
    arrives as 1-2 parquet splits because partitioning is BYTE-based
    (``spark.sql.files.maxPartitionBytes``), pinning all downstream
    per-row compute onto one task. Measured here: the char-8-gram
    fingerprint over a single-file 50 k-doc corpus ran 24 s on one task
    vs 3 s spread over 32 (see PLANS.md round-4).

    No-op when the input already has >= min_parts partitions (a real
    lake scan at cluster scale), so the extra shuffle is only paid when
    it unlocks parallelism worth more than the (tiny, by precondition)
    data movement.

    Batch-only probe: the split count comes from ``df.rdd`` (there is no
    DataFrame-level partition count), which plans the scan once on the
    driver — cheap for the file scans this guards, and cached per plan
    build. Streaming DataFrames have no static partitioning to probe
    (and ``.rdd`` raises), so they pass through unchanged.
    """
    if df.isStreaming:
        return df
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
