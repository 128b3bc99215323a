"""Streaming-incremental BPE vocabulary maintenance — the tokenizer's
merge list kept current under continuous document ingest, with exact
batch parity.

The round-11 trainer made this cheap: BPE training consumes nothing but
the word-frequency table, and word counts of a union corpus are the
per-key sums of each part's counts — the SAME mergeable-count-table
state shape as streaming/vocab_cov.py and streaming/dsir.py. Each
micro-batch therefore lands only its own (lang, word, cnt) bag under
``ingest_batch=<b>`` (per-partition overwrite ⇒ replay-idempotent), and
the reads fold the deltas through one groupBy-sum, then run the SAME
code the batch queries run: ``operators/bpe.train_merges_auto`` for the
merge list (plans/bpe.doc_bpe_merges256) and
``plans/bpe.token_stats_from_lang_counts`` for the per-language
compression stats (doc_bpe_tokens256) — shared functions, so parity is
structural, bit-equal under ANY batch split, replay, or compaction.

Why re-train at read instead of maintaining merges incrementally: a
late batch can change EARLY merge decisions (greedy argmax over global
pair counts), so any eagerly-frozen merge list silently diverges from
the corpus vocabulary — the property tests pin. Re-training is
vocabulary-sized work, not corpus-sized: the auto trainer's local path
retrains 256 merges over a 20k-word vocab in ~3 s (BPE_SCALE_r11.json),
and the fold that feeds it is one groupBy-sum over state strictly
smaller than the token stream. At a production vocabulary the same
dispatch sends it to the distributed incremental-delta trainer — the
read path needs no separate scale story.

Scale shape per batch: one explode + map-side-combinable count over
the batch's own text (no index read at ingest AT ALL — cheaper than
every other streaming twin here); state growth is bounded by distinct
(lang, word) pairs per batch. Compaction folds deltas into one
partition via the crash-safe hide → commit → clean swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.operators import bpe
from flink_tank_spark.plans.bpe import (
    N_MERGES_BIG,
    lang_word_counts,
    merges_to_df,
    token_stats_from_lang_counts,
)
from flink_tank_spark.streaming import compaction

WORDS_SUBDIR = "bpe_state"


def word_count_delta(batch_df: DataFrame) -> DataFrame:
    """The micro-batch's own (lang, word, cnt) bag — the literal
    plans/bpe.lang_word_counts aggregation over just this batch."""
    return lang_word_counts(batch_df)


def incremental_bpe_sink(state_dir: str):
    def write(batch_df: DataFrame, batch_id: int) -> None:
        part = f"ingest_batch={batch_id}"
        word_count_delta(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, WORDS_SUBDIR, part)
        )

    return write


def _folded_lang_counts(spark: SparkSession, state_dir: str) -> DataFrame:
    path = os.path.join(state_dir, WORDS_SUBDIR)
    compaction.check_readable(path)
    if not compaction.parts(path):
        raise ValueError(f"no BPE state partitions under {state_dir!r}")
    state = spark.read.option("basePath", path).parquet(path).drop("ingest_batch")
    return state.groupBy("lang", "word").agg(F.sum("cnt").alias("cnt"))


def _trained(
    spark: SparkSession, state_dir: str, n_merges: int
) -> tuple[DataFrame, list[bpe.Merge]]:
    """(folded lang counts, merges re-trained on their word marginal) —
    the merge list is re-derived at read by the SAME auto trainer the
    batch query uses, so a late batch correctly re-learns EARLY merges
    (greedy argmax over global pair counts — the decision a frozen
    vocabulary gets wrong)."""
    lw = _folded_lang_counts(spark, state_dir)
    words = bpe.seed_symbols(
        lw.groupBy("word").agg(F.sum("cnt").alias("cnt"))
    )
    return lw, bpe.train_merges_auto(words, n_merges)


def load_bpe_merges(
    spark: SparkSession, state_dir: str, n_merges: int = N_MERGES_BIG
) -> DataFrame:
    """Fold the word-count deltas and train — equal to
    plans/bpe.doc_bpe_merges256 over the union of everything ingested."""
    _, merges = _trained(spark, state_dir, n_merges)
    return merges_to_df(spark, merges)


def load_bpe_tokens(
    spark: SparkSession, state_dir: str, n_merges: int = N_MERGES_BIG
) -> DataFrame:
    """Per-language compression stats under the re-trained vocabulary —
    equal to plans/bpe.doc_bpe_tokens256 over everything ingested."""
    lw, merges = _trained(spark, state_dir, n_merges)
    words = bpe.seed_symbols(
        lw.groupBy("word").agg(F.sum("cnt").alias("cnt"))
    )
    vocab = bpe.apply_merges(words, merges).select(
        "word", bpe.token_count_col().alias("n_tok")
    )
    return token_stats_from_lang_counts(lw, vocab)


def compact(spark: SparkSession, state_dir: str) -> None:
    """Fold count deltas into ONE partition via the crash-safe
    hide → commit → clean swap (stream must be stopped)."""
    base = os.path.join(state_dir, WORDS_SUBDIR)
    compaction.recover(base)
    merged = _folded_lang_counts(spark, state_dir)
    parts = compaction.parts(base)
    merged.write.mode("overwrite").parquet(os.path.join(base, compaction.TMP_NAME))
    compaction.commit_swap(base, parts)


def start_bpe_job(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming BPE vocabulary maintenance over a jsonl document
    stream (doc_id, lang, text)."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema("doc_id bigint, lang string, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(incremental_bpe_sink(state_dir))
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-bpe-vocab")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
