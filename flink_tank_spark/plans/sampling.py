"""Deterministic weighted corpus sampling — the ticket-ballot bottom-k.

A training-data pipeline rarely trains on the whole corpus: it draws a
weighted sample (longer / higher-quality documents proportionally more
often). The standard streaming-friendly construction is bottom-k
priority sampling (Efraimidis–Spirakis A-ES: priority u^(1/w), keep the
k best). A-ES needs ln/pow floats, which are NOT bit-identical across
engines (libm vs JVM), so this module uses the exact-integer
ticket-ballot variant:

- every document casts ``w`` ballots (w = its token count, capped),
  ticket t's priority = md5("<doc_id>:<t>") — a content-addressed,
  uniformly-distributed hex string (the same public md5 convention the
  MinHash permutations and SRP hyperplanes use);
- the sample is the set of documents holding any of the k globally
  smallest priorities.

Inclusion probability rises with weight (≈ 1 − (1 − p)^w for the
per-ticket win rate p = k/Σw), doubling a document's weight ≈ doubles
its chance at small p — the PPS behaviour a data-mixing pipeline wants,
with every comparison an exact string compare: any partitioning, any
engine, the same sample.

Scale shape at 100 TB:
- the ticket explode is bounded by TICKET_CAP per document (no
  quadratic blowup, no full-text amplification — tickets carry only
  (doc_id, t));
- the global bottom-k is orderBy+limit → TakeOrderedAndProject: each
  task keeps its local k, the driver merges P·k rows — never a global
  sort, never a single-reducer window;
- the winning-ticket table is ≤ k rows — broadcastable state, which is
  exactly what the streaming twin (streaming/wsample.py) folds
  incrementally: bottom-k is a KMV-style mergeable sketch
  (bottom_k(A ∪ B) = bottom_k(bottom_k(A) ∪ bottom_k(B))).
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators.skew import spread_partitions
from flink_tank_spark.plans.registry import QuerySpec

SAMPLE_K = 50      # winning tickets per draw
TICKET_CAP = 32    # max ballots per document (bounds the explode)


def doc_weights(docs: DataFrame) -> DataFrame:
    """(doc_id, w): whitespace token count capped at TICKET_CAP —
    the sampling weight. Kept minimal so the ticket stage never carries
    text."""
    return docs.select(
        "doc_id",
        F.least(
            F.size(F.split(F.col("text"), " ")), F.lit(TICKET_CAP)
        ).cast("long").alias("w"),
    )


def ticket_ballots(weights: DataFrame) -> DataFrame:
    """Explode each doc into its w tickets with md5 priorities.
    Bounded fanout (≤ TICKET_CAP), codegen md5 — no Python."""
    return weights.select(
        "doc_id",
        "w",
        F.explode(F.sequence(F.lit(0), F.col("w") - 1)).alias("t"),
    ).withColumn(
        "pr",
        F.md5(F.concat_ws(":", F.col("doc_id"), F.col("t")).cast("binary")),
    )


def bottom_k_tickets(tickets: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """The k globally smallest ticket priorities (ties broken by
    doc_id, t — md5 collisions are astronomically unlikely but the
    order must be total for determinism). orderBy+limit lowers to
    TakeOrderedAndProject — per-partition local k, driver merge."""
    return tickets.orderBy("pr", "doc_id", "t").limit(k)


def weighted_sample(docs: DataFrame, k: int = SAMPLE_K) -> DataFrame:
    """The sampled documents: distinct holders of winning tickets, with
    their weight, number of winning tickets, and best (smallest)
    priority."""
    wins = bottom_k_tickets(ticket_ballots(doc_weights(docs)), k)
    return (
        wins.groupBy("doc_id", "w")
        .agg(
            F.count(F.lit(1)).alias("n_win"),
            F.min("pr").alias("best_pr"),
        )
        .select("doc_id", "w", F.col("n_win").cast("long").alias("n_win"), "best_pr")
    )


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ticket-ballot weighted sample of the documents table: 50 winning
    tickets, weight = capped token count. Deterministic under any
    partitioning (exact md5-string priorities, total tie order)."""
    docs = spread_partitions(load_table(spark, sf_dir, "documents"))
    return weighted_sample(docs).orderBy("doc_id")


DOC_WEIGHTED_SAMPLE_SQL = dedent(f"""
    WITH w AS (
      SELECT doc_id,
             LEAST(len(string_split(text, ' ')), {TICKET_CAP}) AS w
      FROM documents
    ),
    tickets AS (
      SELECT doc_id, CAST(w AS BIGINT) AS w, CAST(t.t AS BIGINT) AS t,
             md5(doc_id || ':' || t.t) AS pr
      FROM w CROSS JOIN LATERAL (SELECT unnest(range(0, w)) AS t) t
    ),
    wins AS (
      SELECT doc_id, w, t, pr
      FROM tickets
      ORDER BY pr, doc_id, t
      LIMIT {SAMPLE_K}
    )
    SELECT doc_id, w,
           CAST(COUNT(*) AS BIGINT) AS n_win,
           MIN(pr) AS best_pr
    FROM wins
    GROUP BY doc_id, w
    ORDER BY doc_id
""")


QUERIES = [
    QuerySpec(
        "doc_weighted_sample",
        doc_weighted_sample,
        DOC_WEIGHTED_SAMPLE_SQL,
        "ticket-ballot weighted bottom-k corpus sample (exact md5 "
        "priorities, PPS-style inclusion, TakeOrderedAndProject)",
        ("llm", "curation"),
    ),
]
