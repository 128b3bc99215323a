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
