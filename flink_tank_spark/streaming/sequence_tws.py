"""Per-key monotone sequence on the transformWithState API (Spark 4.x).

Same operator as streaming/sequence.py (reference P2,
``EventProcessorJob.kt:99-128``: ``ValueState<Int> latestSequence``,
assign prev+1 in arrival order) — expressed on the modern
``transformWithStateInPandas`` StatefulProcessor API instead of the
legacy ``applyInPandasWithState``/GroupState pair.

Why both exist: applyInPandasWithState is the stable long-standing API;
transformWithState is its successor (typed state handles, timers,
initial state, TTL) and requires the RocksDB state store the session
factory already configures. The two produce identical output — pinned by
``tests/test_streaming.py::test_sequence_tws_matches_legacy_state_api``.

Environment note: transformWithState's control channel uses protobuf
(``google.protobuf``), which standard Spark clusters ship but this
offline test container does not — the parity test skips cleanly when
protobuf is absent, and the GroupState implementation remains the
default path either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from flink_tank_spark.streaming.sequence import SEQUENCED_SCHEMA


class SequenceProcessor(StatefulProcessor):
    """ValueState<long> latest_sequence per key; prev+1 per element in
    arrival order — state survives micro-batches via the state store."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._latest = handle.getValueState("latest_sequence", "latest LONG")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        latest = self._latest.get()[0] if self._latest.exists() else 0
        for pdf in rows:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("arrival", kind="stable")
            n = len(pdf)
            pdf = pdf.assign(sequence=range(latest + 1, latest + n + 1))
            latest += n
            yield pdf
        self._latest.update((latest,))

    def close(self) -> None:
        pass


def with_sequence_stream_tws(valid_df: DataFrame) -> DataFrame:
    """transformWithState twin of sequence.with_sequence_stream."""
    return valid_df.groupBy("id").transformWithStateInPandas(
        SequenceProcessor(),
        outputStructType=SEQUENCED_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
