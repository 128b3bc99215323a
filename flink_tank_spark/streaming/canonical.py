"""Streaming dedup ENDPOINT — the keep/drop corpus view derived from
the accumulated near-dup verdicts.

streaming/neardup.py maintains the incremental PAIR table; a real
ingest pipeline consumes the endpoint: which documents survive
dedup RIGHT NOW. This module derives it at read time from the
accumulated state, the same recipe as every incremental view here
(counts→leaderboard, summaries→sessions): group resolution runs over
the PAIR table (bounded by true duplicates — a small fraction of the
corpus — never corpus-sized), and the keep/drop decision is the batch
pipeline's own convention (connected component, canon = min id,
drop everything else).

Correctness inherits from the pair-level parity theorem: when no LSH
bucket overflows the cap, the streamed pair set equals the batch
rebuild EXACTLY (pinned in tests/test_streaming_neardup.py), so
components, canons, and the kept set are equal too — pinned here
against doc_dedup_groups' convention end-to-end. Late pairs (a doc's
duplicate arriving many batches later) correctly DEMOTE a previously
kept doc at the next read — the monotone-emission property eager
keep/drop materialization would lose.

Scale shape: connected_components runs on the accumulated pairs (the
checkpoint-truncated counted-fixpoint loop from operators/dedup); the
doc universe comes from the shingle index's id column (column-pruned
parquet scan); the drop list feeds one anti-join whose strategy is
left to AQE (broadcast when small, shuffle when duplicate-heavy) —
exactly the batch doc_dedup_corpus shape.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators.dedup import connected_components
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming.neardup import SHINGLES_SUBDIR


def _all_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    compaction.check_readable(pairs_dir)
    return (
        spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
        .select("id_a", "id_b")
    )


def _all_doc_ids(spark: SparkSession, index_dir: str) -> DataFrame:
    path = os.path.join(index_dir, SHINGLES_SUBDIR)
    compaction.check_readable(path)
    return (
        spark.read.option("basePath", path).parquet(path)
        .select("doc_id")
    )


def dedup_groups_view(spark: SparkSession, pairs_dir: str) -> DataFrame:
    """(doc_id, canon_id) for every doc in any duplicate group — equal
    to plans/llm.doc_dedup_groups over the ingested corpus when no
    bucket overflowed the cap."""
    return connected_components(_all_pairs(spark, pairs_dir))


def kept_corpus_view(
    spark: SparkSession, index_dir: str, pairs_dir: str
) -> DataFrame:
    """The surviving doc ids (canon of its group, or never grouped) —
    the corpus a downstream training job reads NOW."""
    canon = dedup_groups_view(spark, pairs_dir)
    dropped = canon.filter(F.col("canon_id") < F.col("doc_id")).select("doc_id")
    # No broadcast hint: the drop list is every non-canonical duplicate,
    # which on a duplicate-heavy corpus is unbounded — forcing broadcast
    # could blow the driver/broadcast limit. AQE picks broadcast itself
    # whenever the materialized side is actually small.
    return _all_doc_ids(spark, index_dir).join(dropped, "doc_id", "left_anti")
