"""Streaming-incremental EXACT set-containment dedup — subset
duplicates detected at ingest.

Completes the streaming dedup family (exact → streaming/dedup.py,
MinHash-LSH → streaming/neardup.py, SRP embedding → srp_neardup.py)
with the asymmetric detector: every arriving document is checked both
ways against the ACCUMULATED corpus — does it contain an old doc, is
it contained in one — at containment |A∩B|/|A| ≥ 0.9, recall 1.0 at
the threshold.

The one semantic twist vs the batch operator
(operators/dedup.containment_pairs): prefix filtering is lossless
under ANY fixed total token order — rarest-first is only the
candidate-volume optimization — but a df-derived order DRIFTS as the
corpus grows, which would silently invalidate previously-indexed
prefixes. The streaming variant therefore freezes a CONTENT-ADDRESSED
order (md5(token), token): prefixes computed at ingest stay valid
forever, the index is append-only, and exactness is unconditional. The
honest trade: prefix tokens are no longer corpus-rare, so candidate
volume is higher than the batch operator's at the same threshold (the
verify step keeps precision exact either way); the batch-equality
test holds because both blockings are lossless and verification is
identical. The reclaim path is :func:`compact_rerank` — a maintenance
compaction that rebuilds the token index from the stored shingle sets
under the accumulated-df rarest-first order (each row stores the odf
it was ranked under, so readable states are never mixed-order and
subsequent ingest picks the new order up from the index itself).

Shape per micro-batch (foreachBatch, batch id ``b``):

1. shingle the batch, rank tokens per doc under the frozen md5 order,
   flag the containment prefix (first n − ceil(t·n) + 1 tokens);
2. candidates, both directions, each unordered arrival pair exactly
   once (when its LATER doc arrives):
   new-contained: batch PREFIX × (index ∪ batch) full tokens;
   old-contained: index PREFIX × batch full tokens (batch side
   broadcast — one scan of the accumulated index per micro-batch);
3. exact verify on the shingle arrays (integer threshold compare);
4. append the batch's token rows (with prefix flags) and shingle sets
   as ``ingest_batch=b`` partitions; verdicts land under the same
   partition scheme — every write an idempotent per-batch overwrite,
   reads filter ``ingest_batch < b`` (the neardup.py replay argument).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flink_tank_spark.operators.dedup import shingle_sets
from flink_tank_spark.streaming import compaction
from flink_tank_spark.streaming.neardup import _read_index

TOKENS_SUBDIR = "ctokens"
SHINGLES_SUBDIR = "cshingles"
# The (tok, odf) order dictionary a re-rank ranked the index under,
# persisted INSIDE the token table's merged partition as an
# underscore-prefixed subdir: Hadoop's hidden-path filter keeps it out
# of every parquet scan of the token table, and it rides the SAME
# atomic `_compact_tmp -> ingest_batch=-1` rename that commits the
# re-ranked rows — so a readable token table and its sidecar can never
# disagree (the mixed-order hazard a separately-swapped sidecar would
# reintroduce). Per-batch ingest then READS the dictionary instead of
# re-aggregating the full token index every micro-batch (round-12
# advisory fix: that rebuild was an O(index) groupBy + forced broadcast
# per batch).
ORDER_NAME = "_order"
T_NUM, T_DEN = 9, 10  # containment threshold 0.9
SLACK = 2  # extended-prefix slack = required matching prefix rows
           # (the batch operator's multi-match prune — see
           # operators/dedup.containment_pairs docstring)


def ranked_tokens(
    shingled: DataFrame, order_df: DataFrame | None = None
) -> DataFrame:
    """(doc_id, tok, odf, rn, n, is_prefix) under the CURRENT total
    order ``(odf, md5(tok), tok)`` — ``odf`` is the token's document
    frequency frozen at the last re-rank compaction (0 for tokens never
    seen at a compaction, including the whole stream before the first
    one, where the order degenerates to the original content-addressed
    md5 order). Rarest-known-first: low-df tokens sort first, so
    prefixes regain the batch operator's candidate-volume optimization
    after each maintenance re-rank, while any FIXED total order keeps
    the prefix filter lossless between compactions. The odf a row was
    ranked under is STORED with the row, so every readable index state
    is self-describing and single-table swaps stay crash-consistent.

    ``rn`` is kept in the index so probes can apply the lossless
    POSITIONAL filter (see operators/dedup.containment_pairs: the first
    common token of a qualifying pair must sit within the container's
    first nb − ceil(t·na) + 1 positions)."""
    tok = shingled.select("doc_id", F.explode("shingles").alias("tok"))
    if order_df is not None:
        # no broadcast hint: the dictionary covers every distinct
        # shingle in the accumulated corpus, which outgrows any
        # broadcast limit at scale — AQE picks broadcast while it is
        # genuinely small and shuffle-hash after
        tok = tok.join(order_df, "tok", "left").withColumn(
            "odf", F.coalesce(F.col("odf"), F.lit(0)).cast("long")
        )
    else:
        tok = tok.withColumn("odf", F.lit(0).cast("long"))
    w_rank = W.partitionBy("doc_id").orderBy("odf", F.md5("tok"), "tok")
    w_all = W.partitionBy("doc_id")
    return (
        tok.withColumn("rn", F.row_number().over(w_rank))
        .withColumn("n", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "is_prefix",
            F.col("rn")
            <= F.col("n")
            - F.expr(f"({T_NUM} * n + {T_DEN} - 1) div {T_DEN}")
            + SLACK,
        )
        .select("doc_id", "tok", "odf", "rn", "n", "is_prefix")
    )


def index_order(index_tokens: DataFrame | None) -> DataFrame | None:
    """The (tok, odf) dictionary the CURRENT index was ranked under,
    re-derived from the stored odf column — every row of a token
    carries the same odf by the ranking invariant, so any aggregate
    works; tokens at odf 0 are the fallback order and need no
    dictionary row. This is the O(index) FALLBACK for indexes whose
    sidecar is absent (pre-sidecar layouts); the steady-state ingest
    path reads the persisted sidecar via :func:`load_order` instead."""
    if index_tokens is None:
        return None
    return (
        index_tokens.filter(F.col("odf") > 0)
        .groupBy("tok")
        .agg(F.max("odf").alias("odf"))
    )


def load_order(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """The persisted (tok, odf) sidecar written by the last
    :func:`compact_rerank`, or None when no re-rank has happened (the
    whole stream is then at the odf-0 content order and needs no
    dictionary) or the sidecar was written by pre-sidecar code (caller
    falls back to :func:`index_order`). Ingest batches only ever ADD
    rows ranked under the dictionary (unknown tokens land at odf 0), so
    the sidecar stays exact between re-ranks without maintenance."""
    found = _order_dirs(os.path.join(index_dir, TOKENS_SUBDIR))
    if not found:
        return None
    # at most one partition carries a sidecar: compact_rerank writes it
    # into the single merged partition and compact() carries it forward
    return spark.read.parquet(*found)


def _order_dirs(tok_base: str) -> list[str]:
    """Committed sidecar dirs under the token table's visible
    partitions — a dir counts only with its _SUCCESS marker, so a
    crashed half-written sidecar is invisible (the next reader
    re-derives and rewrites it)."""
    return [
        p
        for part in compaction.parts(tok_base)
        if os.path.isfile(
            os.path.join(p := os.path.join(tok_base, part, ORDER_NAME), "_SUCCESS")
        )
    ]


def containment_batch(
    batch_docs: DataFrame,
    index_tokens: DataFrame | None,
    index_shingles: DataFrame | None,
    stats: dict | None = None,
    order_df: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Pure-DataFrame core of one incremental step: returns
    (verified_pairs, batch_tokens, batch_shingles). ``verified_pairs``
    are the NEW ordered (contained, container) verdicts this batch
    creates. Doc ids must be globally unique across the stream. The
    batch's tokens are ranked under the INDEX's current order so prefix
    filtering stays lossless across a re-rank compaction — pass the
    persisted sidecar dictionary as ``order_df`` (the sink does); when
    omitted it is re-derived from the index's stored odf column
    (index_order), the slow-but-always-correct path."""
    batch_shingles = shingle_sets(batch_docs)
    if order_df is None:
        order_df = index_order(index_tokens)
    batch_tokens = ranked_tokens(batch_shingles, order_df)

    all_tokens = (
        batch_tokens if index_tokens is None
        else index_tokens.unionByName(batch_tokens)
    )
    b_prefix = batch_tokens.filter("is_prefix").select(
        F.col("doc_id").alias("id_a"), "tok", F.col("n").alias("na")
    )
    # new-contained direction: batch prefixes (small — broadcast) probe
    # the accumulated-plus-batch full token rows in one scan
    d1 = (
        all_tokens.select(
            F.col("doc_id").alias("id_b"), "tok",
            F.col("n").alias("nb"), F.col("rn").alias("rn_b"),
        )
        .join(F.broadcast(b_prefix), "tok")
    )
    pairs = [d1]
    if index_tokens is not None:
        i_prefix = index_tokens.filter("is_prefix").select(
            F.col("doc_id").alias("id_a"), "tok", F.col("n").alias("na")
        )
        b_full = batch_tokens.select(
            F.col("doc_id").alias("id_b"), "tok",
            F.col("n").alias("nb"), F.col("rn").alias("rn_b"),
        )
        # old-contained direction: accumulated prefixes scanned once,
        # probed by the broadcast batch full-token side
        d2 = i_prefix.join(F.broadcast(b_full), "tok")
        pairs.append(d2)
    req = F.expr(f"({T_NUM} * na + {T_DEN} - 1) div {T_DEN}")  # ceil(t·|A|)
    rows = None
    for d in pairs:
        c = d.filter(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("nb") * T_DEN >= F.col("na") * T_NUM)
            & (F.col("rn_b") <= F.col("nb") - req + SLACK)  # positional
        ).select("id_a", "id_b", "na")
        rows = c if rows is None else rows.unionByName(c)
    # multi-match prune (exact, see batch operator): a qualifying pair
    # shares >= SLACK tokens inside the extended prefix. The two
    # directions are disjoint row sets (a new vs a old), so the union
    # groupBy counts each direction's matches correctly.
    cands = (
        rows.groupBy("id_a", "id_b", "na")
        .agg(F.count(F.lit(1)).alias("_npref"))
        .filter((F.col("_npref") >= SLACK) | (F.col("na") < SLACK))
        .select("id_a", "id_b")
    )
    if stats is not None:
        # instrumentation hook (scripts/containment_rerank_volume.py):
        # the pre-verify candidate set — the quantity a re-rank shrinks
        stats["prefix_rows"] = rows
        stats["candidates"] = cands

    all_shingles = (
        batch_shingles if index_shingles is None
        else index_shingles.unionByName(batch_shingles)
    )
    sh = all_shingles.select("doc_id", "shingles")
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    verified = (
        cands.join(
            sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a")),
            "id_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b")),
            "id_b",
        )
        .filter(n_common * T_DEN >= F.size("sh_a") * T_NUM)
        .select(
            "id_a",
            "id_b",
            n_common.alias("n_common"),
            (n_common.cast("double") / F.size("sh_a")).alias("containment"),
            (
                n_common.cast("double")
                / (F.size("sh_a") + F.size("sh_b") - n_common)
            ).alias("jaccard"),
        )
    )
    return verified, batch_tokens, batch_shingles


def incremental_containment_sink(index_dir: str, pairs_dir: str):
    """foreachBatch writer: verdicts under ``pairs_dir/ingest_batch=<b>``,
    token/shingle index growth under ``index_dir/{ctokens,cshingles}/
    ingest_batch=<b>`` — idempotent per-batch-partition overwrites."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        idx_tok = _read_index(spark, index_dir, TOKENS_SUBDIR, batch_id)
        idx_sh = _read_index(spark, index_dir, SHINGLES_SUBDIR, batch_id)
        persisted = []
        if idx_tok is not None:
            idx_tok = idx_tok.persist()
            persisted.append(idx_tok)
        if idx_sh is not None:
            idx_sh = idx_sh.persist()
            persisted.append(idx_sh)
        order_df = load_order(spark, index_dir)
        if order_df is None and idx_tok is not None:
            # prior index with no persisted dictionary: a pre-sidecar
            # layout (possibly re-ranked, odf > 0) or a stream that has
            # never compacted. Derive the dictionary from the stored
            # odf column ONCE, persist it into the oldest prior
            # partition (immutable until the next compaction — a
            # replayed current batch only ever overwrites its own), and
            # read it back — every later micro-batch then skips the
            # O(index) re-aggregate this sidecar exists to kill.
            tok_base = os.path.join(index_dir, TOKENS_SUBDIR)
            oldest = min(
                (
                    p for p in compaction.parts(tok_base)
                    if int(p.split("=", 1)[1]) < batch_id
                ),
                key=lambda p: int(p.split("=", 1)[1]),
            )
            dest = os.path.join(tok_base, oldest, ORDER_NAME)
            index_order(idx_tok).write.mode("overwrite").parquet(dest)
            order_df = spark.read.parquet(dest)
        try:
            pairs, b_tok, b_sh = containment_batch(
                batch_df, idx_tok, idx_sh, order_df=order_df
            )
            b_tok, b_sh = b_tok.persist(), b_sh.persist()
            persisted += [b_tok, b_sh]
            part = f"ingest_batch={batch_id}"
            pairs.write.mode("overwrite").parquet(os.path.join(pairs_dir, part))
            b_tok.write.mode("overwrite").parquet(
                os.path.join(index_dir, TOKENS_SUBDIR, part)
            )
            b_sh.write.mode("overwrite").parquet(
                os.path.join(index_dir, SHINGLES_SUBDIR, part)
            )
        finally:
            for df in persisted:
                df.unpersist()

    return write


def load_pairs(spark: SparkSession, pairs_dir: str) -> DataFrame:
    compaction.check_readable(pairs_dir)
    return (
        spark.read.option("basePath", pairs_dir).parquet(pairs_dir)
        .drop("ingest_batch")
    )


def compact(spark: SparkSession, index_dir: str) -> None:
    """Fold each index table's batch partitions into one merged
    partition via the crash-safe hide → commit → clean swap (stream
    must be stopped). Token prefixes are order-stable between re-ranks
    (every row stores the odf it was ranked under), so this compaction
    is a pure concatenation — no re-ranking needed for correctness."""
    for sub in (TOKENS_SUBDIR, SHINGLES_SUBDIR):
        base = os.path.join(index_dir, sub)
        compaction.recover(base)
        merged = (
            spark.read.option("basePath", base).parquet(base)
            .drop("ingest_batch")
        )
        parts = compaction.parts(base)
        merged.write.mode("overwrite").parquet(
            os.path.join(base, compaction.TMP_NAME)
        )
        if sub == TOKENS_SUBDIR:
            # carry the (tok, odf) sidecar forward into the merged
            # partition — written inside the tmp dir, so it commits on
            # the same atomic rename as the folded rows
            found = _order_dirs(base)
            if found:
                spark.read.parquet(*found).write.mode("overwrite").parquet(
                    os.path.join(base, compaction.TMP_NAME, ORDER_NAME)
                )
        compaction.commit_swap(base, parts)


def compact_rerank(spark: SparkSession, index_dir: str) -> None:
    """Maintenance compaction that RE-RANKS the token order by the
    accumulated document frequency — reclaiming the rarest-first
    candidate-volume optimization the frozen content order forfeits
    (the documented trade in this module's header). Stream must be
    stopped.

    Exactness: any single total order applied consistently to both join
    sides keeps prefix filtering lossless, so the only invariant that
    matters is NO MIXED ORDERS in a readable index. That holds by
    construction: the shingle table is folded first (order-free), then
    the token table is REBUILT from it under the new (df, md5, tok)
    order and swapped in one crash-safe commit — a crash between the
    two swaps leaves the old token table intact (old order, old odf
    column, still self-consistent). Subsequent micro-batches pick the
    new order up from the stored odf column via index_order().

    Cost: one df aggregate + one re-rank over the shingle index —
    O(index) during a maintenance window, the standard public
    PPJoin-family stats-refresh shape.
    """
    sh_base = os.path.join(index_dir, SHINGLES_SUBDIR)
    tok_base = os.path.join(index_dir, TOKENS_SUBDIR)
    compaction.recover(sh_base)
    compaction.recover(tok_base)

    # 1. fold the shingle sets (pure concatenation)
    all_sh = (
        spark.read.option("basePath", sh_base).parquet(sh_base)
        .drop("ingest_batch")
    )
    sh_parts = compaction.parts(sh_base)
    all_sh.write.mode("overwrite").parquet(
        os.path.join(sh_base, compaction.TMP_NAME)
    )
    compaction.commit_swap(sh_base, sh_parts)

    # 2. rebuild the token index under the accumulated-df order
    folded_sh = spark.read.option("basePath", sh_base).parquet(sh_base).drop(
        "ingest_batch"
    )
    df_order = (
        folded_sh.select(F.explode("shingles").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("odf"))
    )
    rebuilt = ranked_tokens(folded_sh, df_order)
    tok_parts = compaction.parts(tok_base)
    rebuilt.write.mode("overwrite").parquet(
        os.path.join(tok_base, compaction.TMP_NAME)
    )
    # persist the order dictionary INSIDE the tmp dir (hidden from
    # parquet scans by the underscore prefix) so the sidecar and the
    # re-ranked rows commit on the same atomic rename — subsequent
    # micro-batches read it via load_order() instead of re-aggregating
    # the token index
    df_order.write.mode("overwrite").parquet(
        os.path.join(tok_base, compaction.TMP_NAME, ORDER_NAME)
    )
    compaction.commit_swap(tok_base, tok_parts)


def start_containment_job(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming containment-dedup job over a jsonl document stream
    (doc_id, text)."""
    os.makedirs(source_dir, exist_ok=True)
    reader = spark.readStream.schema("doc_id bigint, text string")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.json(source_dir)
    writer = (
        stream.writeStream.foreachBatch(
            incremental_containment_sink(index_dir, pairs_dir)
        )
        .option("checkpointLocation", checkpoint_dir)
        .queryName("incremental-containment")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# read views — the keep/drop CORPUS endpoint derived from accumulated state
# --------------------------------------------------------------------------

def _all_shingles(spark: SparkSession, index_dir: str) -> DataFrame:
    path = os.path.join(index_dir, SHINGLES_SUBDIR)
    compaction.check_readable(path)
    return (
        spark.read.option("basePath", path).parquet(path)
        .select("doc_id", "shingles")
    )


def containment_drop_view(
    spark: SparkSession, index_dir: str, pairs_dir: str
) -> DataFrame:
    """(doc_id) drop list under keep-one containment dedup RIGHT NOW —
    the accumulated verified pair table folded through the LITERAL
    batch rule (operators/dedup.containment_drop_from_pairs, the same
    function doc_containment_corpus and the curation job's
    --containment stage call). Parity is structural: the streamed pair
    set equals the batch containment_pairs set exactly (pinned in
    tests/test_streaming_containment.py — both blockings lossless,
    verification identical), and the fold is shared code, so the drop
    list is bit-equal to containment_drop_ids over the ingested corpus.

    Late arrivals behave correctly by construction: a larger container
    arriving many batches later adds its pair at ingest, and the next
    READ of this view demotes the previously kept doc — the monotone
    property an eager keep/drop materialization would lose (same
    argument as streaming/canonical.kept_corpus_view).

    Scale shape: sizes come from one column-pruned scan of the stored
    shingle sets (F.size only — the arrays never shuffle); the rule is
    two equi-joins on the PAIR table (bounded by true subset
    duplicates, never corpus-sized) + a distinct. Join strategy is left
    to AQE — no broadcast hint, the pair table is unbounded on a
    duplicate-heavy corpus."""
    from flink_tank_spark.operators.dedup import containment_drop_from_pairs

    sizes = _all_shingles(spark, index_dir).select(
        F.col("doc_id").alias("_sid"), F.size("shingles").alias("_n")
    )
    pairs = load_pairs(spark, pairs_dir).select("id_a", "id_b")
    return containment_drop_from_pairs(pairs, sizes)


def containment_kept_view(
    spark: SparkSession, index_dir: str, pairs_dir: str
) -> DataFrame:
    """The surviving doc ids — what a downstream training job reads NOW
    (the streaming twin of the corpus side of doc_containment_corpus;
    join it back to the document table for the per-lang accounting)."""
    dropped = containment_drop_view(spark, index_dir, pairs_dir)
    ids = _all_shingles(spark, index_dir).select("doc_id")
    # AQE picks broadcast iff the drop list is actually small
    return ids.join(dropped, "doc_id", "left_anti")
