"""Stream-stream joins (watermark-bounded state).

Spark's stream-stream inner join buffers both sides in state; without
time bounds that state is unbounded. The interval form below carries BOTH
a watermark per side and a time-range join predicate, so the state store
evicts rows once the watermark passes their join window — the only shape
that survives an unbounded 100 TB/day pair of streams.

Batch analogue (same semantics, oracle-gated): ``ev_interval_clicks``
(`plans/streaming_batch.py` / `operators/joins.py` interval join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Inner-join right-side events that occur within
    ``[left_ts, left_ts + max_delay]`` for the same key.

    Both sides get watermarks (state eviction); the range predicate gives
    Spark the bound it needs to compute each side's state retention.
    Output carries the left key column.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.expr(
        f"l.{key} = r.{key} AND "
        f"r.{right_ts} >= l.{left_ts} AND "
        f"r.{right_ts} <= l.{left_ts} + INTERVAL {max_delay}"
    )
    return l.join(r, cond).select(
        F.col(f"l.{key}").alias(key),
        *[F.col(f"l.{c}") for c in left.columns if c != key],
        *[F.col(f"r.{c}") for c in right.columns if c != key],
    )
