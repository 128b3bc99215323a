"""Exact-parity sliding-window aggregator with zero-count heartbeats.

Reference operator P3 exact semantics (``AggregationJob.kt:109-206``):
per key, keep a 10-minute event buffer; every 5 seconds (processing-time
timer aligned to 5-s boundaries, :150) prune events older than 10 min
(:169) and ALWAYS emit — including a zero-count record with an empty
type map when the window just drained (:171-186) — then re-register the
timer only while the window still has events ("activity-based
heartbeat", :193-204). Window bounds are wall-clock ``[now-10min, now]``
(:166,181-182), not aligned buckets.

Declarative ``window()`` cannot express always-emit-on-cadence
(streaming aggs emit only on data/watermark advance — SURVEY §4.2), so
this is the engine's second and last custom-state operator:
``applyInPandasWithState`` with ``ProcessingTimeTimeout`` — per-key
state + per-key processing-time timeouts, the direct analogues of the
reference's ``ValueState<WindowState>`` + timer service. (The newer
``transformWithStateInPandas`` API would fit even more directly, but
its Python driver worker requires the protobuf package, unavailable
here; GroupState timeouts express identical semantics.) The reference's
extra timer-dedup ValueState — self-documented as a pessimization,
AggregationJob.kt:81-107 — is NOT replicated: the single pending
timeout per key is managed by the engine.

Alignment detail: the intended fire time is carried IN the state
(``next_fire``), so pruning and window bounds use the aligned timer
timestamp exactly like the reference, not the jittery wall clock at
which the micro-batch happened to run.

Scale: state is (keys × events-in-window), sharded across executors by
the grouping key — the same bound and sharding as Flink's keyBy.
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

WINDOW_MS = 10 * 60 * 1000  # AggregationJob.kt:53
EMIT_EVERY_MS = 5 * 1000  # AggregationJob.kt:54

# state: intended next fire time + parallel event arrays (ts, type)
_STATE_SCHEMA = StructType(
    [
        StructField("next_fire", LongType()),
        StructField("ev_ts", ArrayType(LongType())),
        StructField("ev_type", ArrayType(StringType())),
    ]
)

METRICS_SCHEMA = StructType(
    [
        StructField("userId", StringType()),
        StructField("windowStart", StringType()),
        StructField("windowEnd", StringType()),
        StructField("totalEventCount", IntegerType()),
        StructField("eventTypeCounts", StringType()),
    ]
)


def _iso(ms: int) -> str:
    return (
        dt.datetime.fromtimestamp(ms / 1000, tz=dt.timezone.utc)
        .strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]
        + "Z"
    )


def make_heartbeat_fn(window_ms: int = WINDOW_MS, emit_every_ms: int = EMIT_EVERY_MS):
    def aligned_next(now_ms: int) -> int:
        # ((t / 5000) + 1) * 5000 — AggregationJob.kt:150
        return (now_ms // emit_every_ms + 1) * emit_every_ms

    def fn(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        now_wall = state.getCurrentProcessingTimeMs()

        if state.hasTimedOut:
            next_fire, ev_ts, ev_type = state.get
            now = next_fire  # the aligned time this timer was meant for
            cutoff = now - window_ms
            kept = [(t, e) for t, e in zip(ev_ts, ev_type) if t >= cutoff]
            counts: dict[str, int] = {}
            for _, e in kept:
                counts[e] = counts.get(e, 0) + 1
            # ALWAYS emit, zero counts included (AggregationJob.kt:171-186)
            out = pd.DataFrame(
                [
                    (
                        key[0],
                        _iso(now - window_ms),
                        _iso(now),
                        len(kept),
                        json.dumps(dict(sorted(counts.items())), separators=(",", ":")),
                    )
                ],
                columns=list(METRICS_SCHEMA.fieldNames()),
            )
            if kept:
                nxt = aligned_next(max(now, now_wall))
                state.update((nxt, [t for t, _ in kept], [e for _, e in kept]))
                state.setTimeoutDuration(max(nxt - now_wall, 1))
            else:
                # window drained: stop ticking until new data arrives
                state.remove()
            yield out
            return

        # data path: stamp arrivals with processing time (AggregationJob.kt:136)
        new_ts: list[int] = []
        new_type: list[str] = []
        for pdf in pdf_iter:
            n = len(pdf)
            new_ts.extend([now_wall] * n)
            new_type.extend(list(pdf["eventType"]))
        if state.exists:
            next_fire, ev_ts, ev_type = state.get
            ev_ts = list(ev_ts) + new_ts
            ev_type = list(ev_type) + new_type
        else:
            next_fire, ev_ts, ev_type = aligned_next(now_wall), new_ts, new_type
        state.update((next_fire, ev_ts, ev_type))
        state.setTimeoutDuration(max(next_fire - now_wall, 1))
        return

    return fn


def sliding_metrics_heartbeat(
    processed_df: DataFrame,
    window_ms: int = WINDOW_MS,
    emit_every_ms: int = EMIT_EVERY_MS,
) -> DataFrame:
    """STREAMING exact-parity variant of Job 2's aggregation: group the
    ProcessedEvent stream by originalId and run the timer-based window."""
    return processed_df.groupBy("originalId").applyInPandasWithState(
        make_heartbeat_fn(window_ms, emit_every_ms),
        outputStructType=METRICS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
