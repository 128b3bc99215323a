"""Streaming CEP pattern matching — the stateful twin of the batch
``ev_cep_match`` plan (plans/analytics.py).

Pattern (Flink-CEP shape — the library a Flink user reaches for beyond
the reference's core surface, relaxed contiguity + within + negation):
per user, a ``signup`` matches the FIRST subsequent ``purchase`` within
1 hour, provided no ``error`` occurs between the two (an error at
exactly the purchase timestamp rejects — the batch plan's tie rule,
where the negation compares raw timestamps).

State machine per user (``applyInPandasWithState``, the direct analogue
of Flink CEP's NFA state in a ``KeyedProcessFunction``):

- ``opens``   — signups awaiting their first subsequent purchase.
- ``pending`` — tentatively matched (signup, purchase) pairs held back
  ONE event: an error at exactly the purchase ts may still arrive later
  in (ts, event_id) order, so a match is emitted only once a strictly
  later-ts event for the key proves no such error exists.

Per event, in (ts, event_id) order:

1. emit pending matches whose purchase ts < event ts (now safe);
2. ``error``   → clear opens (negation kills every open partial match)
   and cancel pending matches at exactly this ts (tie rule);
   ``purchase`` → resolve ALL opens: within-window ones become pending,
   the rest are dead (their FIRST subsequent purchase was out of
   window — a later purchase can never be "first");
   ``signup``  → open a new partial match; other types are skipped
   (relaxed contiguity);
3. evict opens whose window can no longer be met (open ts + 1 h <
   event ts) — bounds state to one hour of signups per key no matter
   how long the stream runs.

Ordering contract: per key, events must arrive in event-time order
across micro-batches (the in-order Kafka-partition contract the
sequence operator also relies on; within a batch the processor sorts).
Tail matches on a quiet key flush on the key's next event — streams
that need bounded finalization either append a per-key mover event past
the window (like the session-window append-mode finalize,
tests/test_watermark.py) or run the TIMER twin
(``cep_match_stream_timeout``): a processing-time idle timer flushes an
idle key's pendings after a grace period, matching the reference's
processing-time timer semantics (``AggregationJob.kt:151,197``) and
Flink CEP's timeout behavior.

Scale: state is O(events in the last hour per key) ids+timestamps,
sharded by user across executors; one Arrow crossing per (key, batch).
Equality with the batch plan on identical corpora is pinned by
tests/test_streaming_cep.py, including a kill/restart split.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

WINDOW_US = 3_600_000_000  # 1 hour, microseconds

_STATE_SCHEMA = StructType(
    [
        StructField("open_ids", ArrayType(LongType())),
        StructField("open_ts", ArrayType(LongType())),
        StructField("pend_sids", ArrayType(LongType())),
        StructField("pend_sts", ArrayType(LongType())),
        StructField("pend_pts", ArrayType(LongType())),
    ]
)

MATCH_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("signup_event_id", LongType()),
        StructField("signup_ts", TimestampType()),
        StructField("purchase_ts", TimestampType()),
    ]
)


def _load_state(state: GroupState):
    """Unpack (opens, pend) from GroupState (empty when absent)."""
    if state.exists:
        open_ids, open_ts, pend_sids, pend_sts, pend_pts = (
            list(c) for c in state.get
        )
    else:
        open_ids, open_ts, pend_sids, pend_sts, pend_pts = [], [], [], [], []
    return list(zip(open_ids, open_ts)), list(
        zip(pend_sids, pend_sts, pend_pts)
    )


def _state_tuple(opens, pend):
    return (
        [s[0] for s in opens],
        [s[1] for s in opens],
        [p[0] for p in pend],
        [p[1] for p in pend],
        [p[2] for p in pend],
    )


def _advance(user_id, pdf_iter, opens, pend, start, end, negation, within_us):
    """Run the NFA over one micro-batch's events for a key, in
    (ts, event_id) order. Mutates nothing; returns (opens, pend, out)."""
    out: list[tuple[int, int, int, int]] = []  # (user, sid, sts, pts)
    # concat the batch's chunks BEFORE sorting — the Arrow iterator may
    # split a group across chunks whose rows interleave in time
    chunks = [pdf for pdf in pdf_iter if not pdf.empty]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            ["ts", "event_id"], kind="stable"
        )
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for eid, t, etype in zip(pdf["event_id"], ts_us, pdf["event_type"]):
            t = int(t)
            if pend:
                ripe = [p for p in pend if p[2] < t]
                if ripe:
                    out.extend((user_id, *p) for p in ripe)
                    pend = [p for p in pend if p[2] >= t]
            if etype == negation:
                opens = []
                pend = [p for p in pend if p[2] != t]
            elif etype == end:
                pend.extend(
                    (sid, sts, t) for sid, sts in opens if t <= sts + within_us
                )
                opens = []
            elif etype == start:
                opens.append((int(eid), t))
            if opens:
                opens = [s for s in opens if s[1] + within_us >= t]
    return opens, pend, out


def _matches_frame(out):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in out],
            "signup_event_id": [r[1] for r in out],
            "signup_ts": pd.to_datetime([r[2] for r in out], unit="us"),
            "purchase_ts": pd.to_datetime([r[3] for r in out], unit="us"),
        }
    )


def make_matcher(
    start: str = "signup",
    end: str = "purchase",
    negation: str = "error",
    within_us: int = WINDOW_US,
):
    """Build the per-key matcher for an arbitrary (start, end, negation,
    within) pattern instance — the defaults ARE the batch
    ``ev_cep_match`` pattern, and the equality tests run against those;
    other instances reuse the same state machine unchanged."""

    def _match_key(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        opens, pend = _load_state(state)
        opens, pend, out = _advance(
            key[0], pdf_iter, opens, pend, start, end, negation, within_us
        )
        state.update(_state_tuple(opens, pend))
        if out:
            yield _matches_frame(out)

    return _match_key


def make_matcher_timeout(
    start: str = "signup",
    end: str = "purchase",
    negation: str = "error",
    within_us: int = WINDOW_US,
    idle_flush_ms: int = 60_000,
):
    """Timer-driven twin of :func:`make_matcher` — the Flink-CEP timer
    semantics the reference's processing-time timers model
    (``AggregationJob.kt:151,197``): an idle key's held-back pending
    matches flush via a processing-time timer instead of waiting for the
    key's next event (or a synthetic per-key mover).

    Data path: identical NFA; afterwards, if pendings remain, register a
    processing-time timeout ``idle_flush_ms`` out (re-armed, i.e. pushed
    back, by every batch that brings the key data — an IDLE timer).

    Timeout path: the key saw no events for ``idle_flush_ms`` of wall
    time; under the per-key in-order ingestion contract the stream is
    quiet, so every pending (signup, purchase) pair's no-error-at-
    purchase-ts condition can no longer be violated — emit them all.
    This is the same trust a watermark finalize places in the idle gap:
    an event with ts ≤ a flushed purchase ts arriving AFTER the grace
    period would have been a (now-missed) tie-rule rejection. Opens are
    KEPT (they cannot emit without a future ``end`` event, so holding
    them preserves exact batch parity for resumed keys; event-time
    eviction bounds them to one window's worth on the key's next event)
    and no timer is re-armed for them — a forever-idle key holds O(one
    window of signups) and fires no further timers."""

    def _match_key(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        opens, pend = _load_state(state)
        if state.hasTimedOut:
            out = [(key[0], *p) for p in pend]
            if opens:
                state.update(_state_tuple(opens, []))
            else:
                state.remove()
            if out:
                yield _matches_frame(out)
            return
        opens, pend, out = _advance(
            key[0], pdf_iter, opens, pend, start, end, negation, within_us
        )
        state.update(_state_tuple(opens, pend))
        if pend:
            state.setTimeoutDuration(idle_flush_ms)
        if out:
            yield _matches_frame(out)

    return _match_key


def cep_match_stream(
    events: DataFrame,
    start: str = "signup",
    end: str = "purchase",
    negation: str = "error",
    within_us: int = WINDOW_US,
) -> DataFrame:
    """Attach the CEP matcher to a STREAMING events DataFrame carrying
    (user_id long, event_id long, ts timestamp, event_type string)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_matcher(start, end, negation, within_us),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cep_match_stream_timeout(
    events: DataFrame,
    start: str = "signup",
    end: str = "purchase",
    negation: str = "error",
    within_us: int = WINDOW_US,
    idle_flush_ms: int = 60_000,
) -> DataFrame:
    """Timer-flushing variant of :func:`cep_match_stream`: identical
    matches, but an idle key's held-back pendings emit after
    ``idle_flush_ms`` of wall-clock silence instead of waiting for the
    key's next event (see :func:`make_matcher_timeout`)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_matcher_timeout(start, end, negation, within_us, idle_flush_ms),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
