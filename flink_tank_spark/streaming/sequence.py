"""Per-key monotone sequence — true streaming state.

Reference operator P2 — ``EnrichValidEvent: KeyedProcessFunction`` keeps
``ValueState<Int> latestSequence`` per key and assigns ``prev+1`` to each
element in arrival order (``EventProcessorJob.kt:99-128``, keyed by
``id`` at :136).

A running per-key counter is not expressible declaratively under
streaming (SURVEY §2.6), so this is the one place the engine drops to a
stateful Pandas operator: ``applyInPandasWithState`` with a single-int
``GroupState`` per key — the direct Spark analogue of Flink's
``ValueState<Int>``. Data crosses to Python Arrow-batched, one call per
(key, micro-batch), not per row.

Scale: state is one int per key, partitioned by the grouping key across
executors — the same sharding Flink's keyBy gives. Key cardinality
bounds state size exactly as in the reference (50 users → 50 ints).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# state: (latest_sequence,)
_STATE_SCHEMA = StructType([StructField("latest_sequence", LongType())])

SEQUENCED_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("timestamp", LongType()),
        StructField("data", StringType()),
        StructField("arrival", LongType()),
        StructField("sequence", LongType()),
    ]
)


def _assign_sequences(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    latest = state.get[0] if state.exists else 0
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        # Within a micro-batch, arrival order is pinned by the explicit
        # `arrival` column (Kafka offset / file line number) — the same
        # per-partition FIFO order Flink relies on for per-key sequencing.
        pdf = pdf.sort_values("arrival", kind="stable")
        n = len(pdf)
        pdf = pdf.assign(sequence=range(latest + 1, latest + n + 1))
        latest += n
        yield pdf
    state.update((latest,))


def with_sequence_stream(valid_df: DataFrame) -> DataFrame:
    """Attach per-key sequence to a STREAMING valid-events DataFrame.

    Input must carry an ``arrival`` long column (Kafka offset or
    equivalent monotone per-partition id) defining within-batch order.
    """
    return (
        valid_df.groupBy("id")
        .applyInPandasWithState(
            _assign_sequences,
            outputStructType=SEQUENCED_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
