"""Sliding-window heartbeat aggregator on the transformWithState API.

Same operator as streaming/heartbeat.py (reference P3,
``AggregationJob.kt:109-206``: 10-minute per-key buffer, 5-second
aligned processing-time timer, prune-then-ALWAYS-emit including the
zero-count drain record, re-register only while events remain) —
expressed on the modern ``transformWithStateInPandas`` StatefulProcessor
API, whose first-class timer callbacks (``handleExpiredTimer``) are the
direct analogue of the reference's ``TimerService`` registration at
``AggregationJob.kt:151,197``, instead of the legacy GroupState
single-timeout encoding.

SURVEY §1.5/§2.9 names this as the Spark-4-native mapping; the
sequence operator already carries the same twin pair
(streaming/sequence.py ↔ streaming/sequence_tws.py).

Semantic mapping, line for line against heartbeat.py:

- ``ValueState window``   → ``getValueState("win", next_fire + event
  arrays)`` — the intended ALIGNED fire time still rides in state so
  pruning/window bounds use it, not the jittery batch wall clock.
- ``setTimeoutDuration``  → ``handle.registerTimer(next_fire)`` with the
  ABSOLUTE aligned timestamp — transformWithState timers are absolute,
  so the ``max(next - now, 1)`` relative-duration dance disappears.
- ``state.hasTimedOut``   → ``handleExpiredTimer`` — a dedicated
  callback carrying the expiry time; no in-band flag.
- timer-dedup ValueState (AggregationJob.kt:81-107, a self-documented
  pessimization) — still NOT replicated: transformWithState keys timers
  by (key, timestamp), and this operator registers exactly one.

Environment note: transformWithState's Python control channel needs the
protobuf package, which standard Spark clusters ship but this offline
test container does not — the parity test
(tests/test_heartbeat.py::test_heartbeat_tws_matches_legacy_state_api)
skips cleanly when protobuf is absent, and the GroupState heartbeat
stays the default path either way.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_tank_spark.streaming.heartbeat import (
    EMIT_EVERY_MS,
    METRICS_SCHEMA,
    WINDOW_MS,
    _iso,
)

_WIN_SCHEMA = StructType(
    [
        StructField("next_fire", LongType()),
        StructField("ev_ts", ArrayType(LongType())),
        StructField("ev_type", ArrayType(StringType())),
    ]
)


class HeartbeatProcessor(StatefulProcessor):
    """Per-key 10-min buffer + 5-s aligned absolute timers."""

    def __init__(
        self, window_ms: int = WINDOW_MS, emit_every_ms: int = EMIT_EVERY_MS
    ) -> None:
        self._window_ms = window_ms
        self._emit_every_ms = emit_every_ms

    def _aligned_next(self, now_ms: int) -> int:
        # ((t / 5000) + 1) * 5000 — AggregationJob.kt:150
        return (now_ms // self._emit_every_ms + 1) * self._emit_every_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._win = handle.getValueState("win", _WIN_SCHEMA)

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        now_wall = timerValues.getCurrentProcessingTimeInMs()
        # stamp arrivals with processing time (AggregationJob.kt:136)
        new_type: list[str] = []
        for pdf in rows:
            new_type.extend(list(pdf["eventType"]))
        new_ts = [now_wall] * len(new_type)
        if self._win.exists():
            next_fire, ev_ts, ev_type = self._win.get()
            ev_ts = list(ev_ts) + new_ts
            ev_type = list(ev_type) + new_type
        else:
            next_fire = self._aligned_next(now_wall)
            ev_ts, ev_type = new_ts, new_type
            self._handle.registerTimer(next_fire)
        self._win.update((next_fire, ev_ts, ev_type))
        return iter(())

    def handleExpiredTimer(
        self, key: tuple, timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        if not self._win.exists():  # drained and cleared between batches
            return
        next_fire, ev_ts, ev_type = self._win.get()
        now = next_fire  # the aligned time this timer was meant for
        cutoff = now - self._window_ms
        kept = [(t, e) for t, e in zip(ev_ts, ev_type) if t >= cutoff]
        counts: dict[str, int] = {}
        for _, e in kept:
            counts[e] = counts.get(e, 0) + 1
        # ALWAYS emit, zero counts included (AggregationJob.kt:171-186)
        out = pd.DataFrame(
            [
                (
                    key[0],
                    _iso(now - self._window_ms),
                    _iso(now),
                    len(kept),
                    json.dumps(
                        dict(sorted(counts.items())), separators=(",", ":")
                    ),
                )
            ],
            columns=list(METRICS_SCHEMA.fieldNames()),
        )
        if kept:
            nxt = self._aligned_next(
                max(now, timerValues.getCurrentProcessingTimeInMs())
            )
            self._win.update((nxt, [t for t, _ in kept], [e for _, e in kept]))
            self._handle.registerTimer(nxt)
        else:
            # window drained: stop ticking until new data arrives
            self._win.clear()
        yield out

    def close(self) -> None:
        pass


def sliding_metrics_heartbeat_tws(
    processed_df: DataFrame,
    window_ms: int = WINDOW_MS,
    emit_every_ms: int = EMIT_EVERY_MS,
) -> DataFrame:
    """transformWithState twin of heartbeat.sliding_metrics_heartbeat."""
    return processed_df.groupBy("originalId").transformWithStateInPandas(
        HeartbeatProcessor(window_ms, emit_every_ms),
        outputStructType=METRICS_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime",
    )
