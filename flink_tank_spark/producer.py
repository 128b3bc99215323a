"""Synthetic event generator (reference operator S4).

Same distributions as the reference's standalone Kafka producer
(``jobs/producer/src/main/kotlin/com/example/producer/EventProducer.kt``):
50-user key pool (:20), 5 event types (:23), 5% malformed (:25) drawn
from 4 variants (:42-51), data map with session_id / value double /
category (:34-38), keyed records (:96), 2 events/s pacing (:26) when run
live.

Deterministic: seeded RNG; timestamps advance 500 ms per event from a
fixed epoch instead of wall clock, so batch fixtures are reproducible.
"""

from __future__ import annotations

import json
import random
import time
from collections.abc import Iterator

EVENT_TYPES = ["login", "purchase", "view", "click", "logout"]
N_USERS = 50
MALFORMED_RATE = 0.05
EVENT_INTERVAL_MS = 500

# The four malformation variants (EventProducer.kt:44-49). Note variants
# 2/3 parse VALID under lenient-with-defaults — the reference producer
# calls them invalid but the pipeline accepts them (SURVEY §1.4).
MALFORMED_VARIANTS = [
    "{invalid json",
    "{}",
    '{"id": "user-1"}',
    '{"id": "user-1", "type": "", "timestamp": "not-a-number"}',
]


def generate_messages(
    n: int,
    seed: int = 42,
    start_ts_ms: int = 1_700_000_000_000,
) -> Iterator[tuple[str | None, str]]:
    """Yield (key, json_value) pairs with the reference's distributions."""
    rng = random.Random(seed)
    ts = start_ts_ms
    malformed_i = 0
    for _ in range(n):
        ts += EVENT_INTERVAL_MS
        if rng.random() < MALFORMED_RATE:
            value = MALFORMED_VARIANTS[malformed_i % len(MALFORMED_VARIANTS)]
            malformed_i += 1
            yield None, value
            continue
        user = f"user-{rng.randint(1, N_USERS)}"
        event = {
            "id": user,
            "type": rng.choice(EVENT_TYPES),
            "timestamp": ts,
            "data": {
                "session_id": f"session-{rng.randint(1, 1000)}",
                "value": round(rng.random() * 100, 2),
                "category": rng.choice(["A", "B", "C"]),
            },
        }
        yield user, json.dumps(event, separators=(",", ":"))


def write_jsonl(path: str, n: int, seed: int = 42) -> int:
    with open(path, "w") as f:
        for _, value in generate_messages(n, seed=seed):
            f.write(value + "\n")
    return n


def run_live(
    brokers: str,
    topic: str,
    events_per_second: float = 2.0,
    seed: int | None = None,
) -> None:  # pragma: no cover - needs a Kafka broker
    """Live producer at the reference's 2 ev/s pacing (kafka-python if
    present; the engine itself never depends on it)."""
    try:
        from kafka import KafkaProducer  # type: ignore
    except ImportError as e:
        raise RuntimeError("kafka-python not installed; use write_jsonl for local runs") from e
    producer = KafkaProducer(
        bootstrap_servers=brokers, acks="all", retries=3,
        key_serializer=lambda k: k.encode() if k else None,
        value_serializer=lambda v: v.encode(),
    )
    interval = 1.0 / events_per_second
    for key, value in generate_messages(n=2**62, seed=seed or int(time.time())):
        producer.send(topic, key=key, value=value)
        time.sleep(interval)
