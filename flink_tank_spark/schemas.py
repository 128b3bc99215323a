"""Typed schemas for the four reference record types.

Reference data model: the four Kotlin data classes in
``jobs/common/src/main/kotlin/com/example/events/Events.kt:3-32``
(InputEvent, ProcessedEvent, ErrorEvent, AggregatedMetrics).

Design decision (SURVEY §7.4): the open ``data: Map<String, Any>`` field is
carried as a RAW JSON STRING column, not a typed MapType. ``from_json``
with a ``StringType`` field extracts the exact JSON substring, so
heterogeneous value types (strings/ints/doubles) survive round-trips
losslessly — the same observable behavior as Jackson's ``Map<String,Any>``
— while staying a plain string column for Catalyst (pushdown-friendly,
no Python in the loop).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    VariantType,
)

# Column that from_json populates with the raw record when parsing fails —
# either malformed JSON or a field type mismatch (both of which throw in
# the reference's Jackson binding, EventProcessorJob.kt:86-95).
CORRUPT_COL = "_corrupt_record"

# InputEvent (Events.kt:3-8): id/type default "", timestamp default 0,
# data default emptyMap(). Defaults are applied post-parse (parse.py),
# mirroring Jackson's lenient binding: {} and {"id":"x"} are VALID.
INPUT_EVENT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("timestamp", LongType()),  # epoch millis
        StructField("data", StringType()),  # raw JSON object (open map)
        StructField(CORRUPT_COL, StringType()),
    ]
)

# Variant-typed twin (SURVEY §7.4 pt 1, Spark 4.x): the open map parsed
# into VariantType in the SAME single from_json pass — typed access via
# variant_get (no per-access JSON re-parse) with shredding-ready storage.
# Canonicalization note: the variant binary format keeps object fields
# in a SORTED key dictionary, so to_json(variant) emits keys sorted —
# vs the raw-string carry, which preserves wire order. Either is a
# faithful open-map carry; queries that compare serialized forms must
# pick one convention (ev_enrich pins the sorted one on this path).
INPUT_EVENT_SCHEMA_VARIANT = StructType(
    [
        StructField("id", StringType()),
        StructField("type", StringType()),
        StructField("timestamp", LongType()),  # epoch millis
        StructField("data", VariantType()),  # open map, variant-typed
        StructField(CORRUPT_COL, StringType()),
    ]
)

# ProcessedEvent (Events.kt:10-17)
PROCESSED_EVENT_SCHEMA = StructType(
    [
        StructField("originalId", StringType(), False),
        StructField("eventType", StringType(), False),
        StructField("processedAt", StringType(), False),  # ISO-8601 instant
        StructField("processingDelay", LongType(), False),
        StructField("enrichedData", StringType(), False),  # raw JSON object
        StructField("sequence", IntegerType(), False),
    ]
)

# ErrorEvent (Events.kt:19-24)
ERROR_EVENT_SCHEMA = StructType(
    [
        StructField("rawMessage", StringType(), False),
        StructField("errorType", StringType(), False),
        StructField("errorMessage", StringType(), False),
        StructField("timestamp", StringType(), False),  # ISO-8601
    ]
)

# AggregatedMetrics (Events.kt:26-32); eventTypeCounts carried as a JSON
# object string (same open-map decision as `data`).
AGGREGATED_METRICS_SCHEMA = StructType(
    [
        StructField("userId", StringType(), False),
        StructField("windowStart", StringType(), False),
        StructField("windowEnd", StringType(), False),
        StructField("totalEventCount", IntegerType(), False),
        StructField("eventTypeCounts", StringType(), False),
    ]
)

PROCESSING_PIPELINE = "flink-event-processor"
