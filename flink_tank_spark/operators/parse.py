"""Parse & route: raw JSON strings → (valid InputEvents, ErrorEvents).

Reference operators P1/F2/R1 — ``ParseAndRoute: ProcessFunction<String,
InputEvent>`` with an error side output (``EventProcessorJob.kt:79-97``,
OutputTag at ``:45``, retrieved at ``:140``).

Spark-first re-expression: Spark has no side outputs, so the topology is
ONE ``from_json`` projection with two filters off it. ``from_json`` in
PERMISSIVE mode with a corrupt-record column reproduces the reference's
Jackson contract exactly (verified empirically):

- malformed JSON (``{invalid``, ``garbage``, bare strings, arrays) →
  corrupt col set → error path, like ``readValue`` throwing
  (EventProcessorJob.kt:86-95);
- field type mismatch (``"timestamp": "not-a-number"``) → corrupt col
  set → error path, like Jackson's InvalidFormatException;
- missing fields (``{}``, ``{"id":"user-1"}``) → VALID with nulls,
  coalesced to the Kotlin defaults ``""``/``0``/``{}``
  (Events.kt:4-7, SURVEY §1.4 "lenient-with-defaults");
- numeric ``id`` → coerced to string, like Jackson.

Both output branches share the single parsed projection, so a batch (or
one ``foreachBatch`` micro-batch) reads and parses the source exactly
once — same single-pass behavior as the reference's one ProcessFunction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_tank_spark.schemas import (
    CORRUPT_COL,
    INPUT_EVENT_SCHEMA,
    INPUT_EVENT_SCHEMA_VARIANT,
)

PARSE_ERROR = "PARSE_ERROR"

# ISO-8601 instant with millisecond precision, e.g. 2024-01-01T00:00:07.179Z
ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def iso_instant(ts: Column) -> Column:
    """Format a timestamp column as an ISO-8601 instant (UTC, millis)."""
    return F.date_format(ts, ISO_FMT)


def parse_events(
    raw_df: DataFrame, value_col: str = "value", variant_data: bool = False
) -> DataFrame:
    """Single-pass parse projection; adds struct fields + corrupt marker.
    ``variant_data=True`` parses the open ``data`` map into VariantType
    in the same pass (SURVEY §7.4 pt 1 — typed access via variant_get,
    no per-access JSON re-parse); the lenient contract is IDENTICAL on
    both paths (pinned in tests/test_event_processor.py): malformed JSON
    and field type mismatches set the corrupt marker, missing fields
    stay null-then-defaulted."""
    schema = INPUT_EVENT_SCHEMA_VARIANT if variant_data else INPUT_EVENT_SCHEMA
    parsed = F.from_json(
        F.col(value_col),
        schema,
        {"columnNameOfCorruptRecord": CORRUPT_COL, "mode": "PERMISSIVE"},
    )
    return raw_df.withColumn("_parsed", parsed)


def parse_and_route(
    raw_df: DataFrame,
    value_col: str = "value",
    now: Column | None = None,
    variant_data: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Route raw strings into (valid_df, error_df).

    valid_df columns: id, type, timestamp (epoch ms), data — the open
    map as a raw JSON object string, or as VariantType when
    ``variant_data=True`` (default ``{}`` either way) — Kotlin defaults
    applied.
    error_df columns: rawMessage, errorType, errorMessage, timestamp —
    the ErrorEvent shape (Events.kt:19-24).

    ``now`` injects a deterministic clock for tests/oracles; defaults to
    processing time like the reference (EventProcessorJob.kt:92).
    """
    if now is None:
        now = F.current_timestamp()
    p = parse_events(raw_df, value_col, variant_data)

    # from_json leaves the corrupt marker unset for empty input and the
    # bare JSON literal `null` (it returns an all-null row instead), but
    # Jackson's readValue throws on both — route them to errors
    # explicitly. (Edge found by the hypothesis contract test.)
    is_error = (
        F.col(f"_parsed.{CORRUPT_COL}").isNotNull()
        | F.col(value_col).isNull()
        | F.trim(F.col(value_col)).isin("", "null")
    )

    # Source metadata columns (e.g. the `arrival` offset) pass through the
    # valid branch — the stateful sequence operator needs the order.
    passthrough = [c for c in raw_df.columns if c != value_col]
    empty_map = (
        F.parse_json(F.lit("{}")) if variant_data else F.lit("{}")
    )
    valid = p.filter(~is_error).select(
        F.coalesce(F.col("_parsed.id"), F.lit("")).alias("id"),
        F.coalesce(F.col("_parsed.type"), F.lit("")).alias("type"),
        F.coalesce(F.col("_parsed.timestamp"), F.lit(0).cast("long")).alias("timestamp"),
        F.coalesce(F.col("_parsed.data"), empty_map).alias("data"),
        *[F.col(c) for c in passthrough],
    )

    errors = p.filter(is_error).select(
        F.col(value_col).alias("rawMessage"),
        F.lit(PARSE_ERROR).alias("errorType"),
        F.concat(
            F.lit("Failed to parse event JSON: "),
            F.substring(F.col(value_col), 1, 256),
        ).alias("errorMessage"),
        iso_instant(now).alias("timestamp"),
    )
    return valid, errors
