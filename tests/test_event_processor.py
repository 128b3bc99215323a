"""Golden tests for the Job-1 topology — the reference's behavioral contract.

Replicates the 5 cases of ``EventProcessorJobTest.kt`` (SURVEY §5.1) as
batch DataFrames over the pure topology function, same pattern as the
reference's ``getOutputStreams`` tests (EventProcessorJobTest.kt:41-153),
plus the parse contract rows from FIXTURES.md §1 and JSON round-trips.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_tank_spark.schemas import PROCESSING_PIPELINE
from flink_tank_spark.streaming.jobs import (
    get_output_streams,
    parse_processed_events,
    serialize_errors,
    serialize_processed,
)

FIXED_NOW_STR = "2024-06-01 12:00:00"
FIXED_NOW_MS = 1717243200000


def fixed_now():
    return F.to_timestamp(F.lit(FIXED_NOW_STR))


def _raw_df(spark, messages):
    return spark.createDataFrame(
        [(i, m) for i, m in enumerate(messages)], ["arrival", "value"]
    )


def run_topology(spark, messages, now=None):
    now = now if now is not None else fixed_now()
    raw = _raw_df(spark, messages)
    processed, errors = get_output_streams(raw, now=now, order_by=["arrival"])
    return (
        processed.orderBy("originalId", "sequence").collect(),
        errors.orderBy("rawMessage").collect(),
    )


# -- case 1: valid event parsed + enriched (EventProcessorJobTest.kt:34-54)
def test_valid_event_enrichment(spark):
    msg = '{"id":"event-123","type":"user.signup","timestamp":1234567890,"data":{"userId":"user-456"}}'
    processed, errors = run_topology(spark, [msg])
    assert errors == []
    [p] = processed
    assert p.originalId == "event-123"
    assert p.eventType == "user.signup"
    assert p.sequence == 1
    assert p.processingDelay == FIXED_NOW_MS - 1234567890
    assert p.processingDelay >= 0
    enriched = json.loads(p.enrichedData)
    assert enriched["userId"] == "user-456"
    assert enriched["original_timestamp"] == 1234567890
    assert enriched["processing_pipeline"] == PROCESSING_PIPELINE


# -- case 2: invalid JSON → ErrorEvent (EventProcessorJobTest.kt:56-73)
def test_invalid_json_routed_to_errors(spark):
    processed, errors = run_topology(spark, ["{invalid json"])
    assert processed == []
    [e] = errors
    assert e.rawMessage == "{invalid json"
    assert e.errorType == "PARSE_ERROR"
    assert len(e.errorMessage) > 0


# -- case 3: mixed stream routes both ways (EventProcessorJobTest.kt:75-97)
def test_mixed_stream_routing(spark):
    msgs = [
        '{"id":"12","type":"order.created","timestamp":1000,"data":{}}',
        "not valid json at all",
        '{"id":"23","type":"order.shipped","timestamp":2000,"data":{"orderId":"ord-123"}}',
    ]
    processed, errors = run_topology(spark, msgs)
    assert [p.originalId for p in processed] == ["12", "23"]
    assert [e.rawMessage for e in errors] == ["not valid json at all"]


# -- case 4: data passthrough + metadata (EventProcessorJobTest.kt:99-123)
def test_data_passthrough_and_metadata(spark):
    msg = '{"id":"evt-004","type":"purchase","timestamp":1733328010000,"data":{"userId":42,"productId":"prod-789","amount":29.99,"currency":"USD"}}'
    processed, _ = run_topology(spark, [msg])
    [p] = processed
    enriched = json.loads(p.enrichedData)
    # original values with original types (ints stay ints, doubles doubles)
    assert enriched["userId"] == 42
    assert enriched["productId"] == "prod-789"
    assert enriched["amount"] == 29.99
    assert enriched["currency"] == "USD"
    assert enriched["original_timestamp"] == 1733328010000
    assert enriched["processing_pipeline"] == PROCESSING_PIPELINE


# -- case 5: per-key sequence isolation (EventProcessorJobTest.kt:125-153)
def test_per_key_sequence_isolation(spark):
    msgs = [
        '{"id":"12","type":"a","timestamp":1,"data":{}}',
        '{"id":"23","type":"b","timestamp":2,"data":{}}',
        '{"id":"23","type":"c","timestamp":3,"data":{}}',
        '{"id":"12","type":"d","timestamp":4,"data":{}}',
    ]
    processed, _ = run_topology(spark, msgs)
    seqs = {(p.originalId, p.eventType): p.sequence for p in processed}
    assert seqs == {("12", "a"): 1, ("12", "d"): 2, ("23", "b"): 1, ("23", "c"): 2}


# -- lenient-parse contract: all FIXTURES.md §1 variants
def test_lenient_parse_contract(spark):
    msgs = [
        "{invalid json",  # malformed → error
        "{}",  # valid, all defaults
        '{"id": "user-1"}',  # valid, defaults
        '{"id": "user-1", "type": "", "timestamp": "not-a-number"}',  # type mismatch → error
        "not valid json at all",  # → error
        "garbage",  # → error
    ]
    processed, errors = run_topology(spark, msgs)
    assert len(processed) == 2
    assert len(errors) == 4
    defaults = [p for p in processed if p.originalId == ""]
    assert len(defaults) == 1  # "{}" → id "", timestamp 0 → delay 0
    assert defaults[0].processingDelay == 0
    enriched = json.loads(defaults[0].enrichedData)
    assert enriched == {
        "original_timestamp": 0,
        "processing_pipeline": PROCESSING_PIPELINE,
    }


# -- M3 serialization round-trip: Job 1 output JSON feeds Job 2 parse
def test_serialization_round_trip(spark):
    msgs = [
        '{"id":"u1","type":"login","timestamp":1000,"data":{"n":7,"s":"x"}}',
        "broken{",
    ]
    raw = _raw_df(spark, msgs)
    processed, errors = get_output_streams(raw, now=fixed_now(), order_by=["arrival"])
    wire = serialize_processed(processed)
    [row] = wire.collect()
    obj = json.loads(row.value)
    # enrichedData embedded as an OBJECT with original types, not a string
    assert obj["enrichedData"]["n"] == 7
    assert obj["enrichedData"]["s"] == "x"
    assert obj["sequence"] == 1

    # Job 2 ingests Job 1's wire format (AggregationJob.kt:246-254)
    reparsed = parse_processed_events(wire).collect()
    assert [r.originalId for r in reparsed] == ["u1"]

    # Job 2 silently DROPS malformed input (error-path asymmetry)
    bad_wire = spark.createDataFrame([("not-json",), ('{"x": }',)], ["value"])
    assert parse_processed_events(bad_wire).count() == 0

    [e] = serialize_errors(errors).collect()
    eobj = json.loads(e.value)
    assert eobj["rawMessage"] == "broken{"
    assert eobj["errorType"] == "PARSE_ERROR"


# -- producer distributions (EventProducer.kt:20-51)
def test_producer_distributions():
    from flink_tank_spark.producer import MALFORMED_VARIANTS, generate_messages

    msgs = list(generate_messages(2000, seed=42))
    malformed = [v for k, v in msgs if k is None]
    valid = [json.loads(v) for k, v in msgs if k is not None]
    assert 0.03 < len(malformed) / len(msgs) < 0.07  # ~5%
    assert set(v for v in malformed) <= set(MALFORMED_VARIANTS)
    users = {e["id"] for e in valid}
    assert users <= {f"user-{i}" for i in range(1, 51)} and len(users) == 50
    types = {e["type"] for e in valid}
    assert types == {"login", "purchase", "view", "click", "logout"}
    # deterministic
    again = list(generate_messages(2000, seed=42))
    assert msgs == again


# -- lenient-parse contract on the VARIANT path (SURVEY §7.4 pts 1+2):
#    same routing as the string path, with the open map variant-typed
def test_lenient_parse_contract_variant_path(spark):
    from pyspark.sql import functions as F

    from flink_tank_spark.operators.parse import parse_and_route

    msgs = [
        "{invalid json",  # malformed → error
        "{}",  # valid, all defaults (data defaults to variant {})
        '{"id": "user-1"}',  # valid, defaults
        '{"id": "u2", "type": "t", "timestamp": 5, "data": {"k": 1, "s": "x"}}',
        '{"id": "user-1", "type": "", "timestamp": "not-a-number"}',  # → error
        "not valid json at all",  # → error
        "garbage",  # → error
    ]
    raw = _raw_df(spark, msgs)
    valid, errors = parse_and_route(
        raw, now=fixed_now(), variant_data=True
    )
    assert errors.count() == 4
    got = {
        r["id"]: (r["timestamp"], r["dj"], r["k"])
        for r in valid.select(
            "id",
            "timestamp",
            F.to_json("data").alias("dj"),
            F.try_variant_get("data", "$.k", "long").alias("k"),
        ).collect()
    }
    # typed access works, defaults hold, missing data → variant {}
    assert got == {
        "": (0, "{}", None),
        "user-1": (0, "{}", None),
        "u2": (5, '{"k":1,"s":"x"}', 1),
    }


# -- lenient contract reaches the batch variant query too (round-12
#    advisory fix: try_parse_json, so one malformed props row nulls out
#    instead of failing the whole aggregate)
def test_ev_json_extract_lenient_on_malformed_props(spark, tmp_path):
    import datetime as dt

    from flink_tank_spark.plans.streaming_batch import ev_json_extract

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t, 10, "click", 1.0, '{"k": 3}'),
        (2, t, 11, "click", 1.0, "{bad json"),
        (3, t, 12, "view", 1.0, '{"k": 7}'),
        (4, t, 13, "view", 1.0, '{"other": true}'),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        r.event_type: (r.sum_k, r.n_with_k)
        for r in ev_json_extract(spark, str(tmp_path)).collect()
    }
    assert out == {"click": (3, 1), "view": (7, 1)}
