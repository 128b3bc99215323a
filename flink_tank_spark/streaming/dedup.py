"""Streaming ingest deduplication.

A training-data ingest stream re-delivers records (at-least-once Kafka,
producer retries); exact dedup at ingest is the streaming sibling of the
batch content-hash dedup (operators/dedup.py).

``dropDuplicatesWithinWatermark`` is the scale-correct tool: state holds
only keys younger than the watermark delay (bounded memory per key
range), instead of ``dropDuplicates`` whose state grows forever on an
unbounded stream. RocksDB state store (session.py) keeps the key set
off-heap and spillable — the 100 TB/day configuration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop re-deliveries of the same key seen within the watermark
    horizon. Records later than ``delay`` behind the max event time may
    re-emit (their dedup state has been reclaimed) — the standard
    bounded-state trade on unbounded streams; size ``delay`` to the
    redelivery window of the upstream system."""
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
