"""BPE tokenizer-training queries over the documents corpus.

doc_bpe_merges learns the vocabulary (the top-8 pair merges); doc_bpe_tokens
re-tokenizes the corpus with the learned vocabulary and reports per-language
compression stats. Both are oracle-gated: the DuckDB mirror re-derives the
SAME merges through an unrolled MATERIALIZED CTE chain (one
pairs→argmax→rewrite block per step — the k-means/PQ iterative-oracle
pattern), so the gate certifies the full train→apply pipeline, not just the
final aggregation.

Scale notes (see operators/bpe.py): training runs on the word-frequency
table — one corpus scan, then vocabulary-sized iterations; the per-step
argmax is a 1-row collect (the driver needs the winning pair to build the
next plan, the same bounded scalar the Lloyd loop collects). The tokenize
query joins per-(lang, word) counts against the learned vocab table — an
equi-join on word, never a corpus-sized regex re-pass per merge.
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import bpe
from flink_tank_spark.operators.skew import spread_partitions
from flink_tank_spark.plans import shared
from flink_tank_spark.plans.registry import QuerySpec

N_MERGES = 8

# learned merges are driver-side scalars; memoized per app/sf/n so
# doc_bpe_tokens reuses doc_bpe_merges' training pass within a session
_MERGES_CACHE: dict[tuple[str, str, int], list[bpe.Merge]] = {}


def _seeded_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared stage: global (word, cnt, syms) — the one corpus scan both
    BPE queries start from."""

    def build() -> DataFrame:
        docs = spread_partitions(load_table(spark, sf_dir, "documents"))
        return bpe.seed_symbols(bpe.word_counts(docs))

    return shared.stage(spark, "bpe_seeded_words", sf_dir, build)


def _trained_merges(
    spark: SparkSession, sf_dir: str, n_merges: int = N_MERGES
) -> list[bpe.Merge]:
    key = (spark.sparkContext.applicationId, sf_dir, n_merges)
    if key not in _MERGES_CACHE:
        _MERGES_CACHE[key] = bpe.train_merges(
            _seeded_words(spark, sf_dir), n_merges
        )
    return _MERGES_CACHE[key]


def doc_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned vocabulary: 8 BPE merges in training order."""
    rows = [
        (m.step, m.left, m.right, m.merged, m.count)
        for m in _trained_merges(spark, sf_dir)
    ]
    return spark.createDataFrame(
        rows,
        "step int, left_sym string, right_sym string, merged string, pair_count long",
    ).orderBy("step")


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenization stats under the learned vocabulary:
    word/token totals and the mean tokens-per-word compression ratio."""
    merges = _trained_merges(spark, sf_dir)
    vocab = bpe.apply_merges(_seeded_words(spark, sf_dir), merges).select(
        "word", bpe.token_count_col().alias("n_tok")
    )
    docs = spread_partitions(load_table(spark, sf_dir, "documents"))
    lw = (
        docs.select(
            "lang",
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{bpe.WORD_REGEX}', 1)")
            ).alias("word"),
        )
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        lw.join(vocab, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct_words"),
            F.sum("cnt").cast("long").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_tok")).cast("long").alias("n_tokens"),
        )
        .withColumn(
            "avg_tokens_per_word",
            F.col("n_tokens").cast("double") / F.col("n_words").cast("double"),
        )
        .orderBy("lang")
    )


def _bpe_train_ctes(n_merges: int) -> str:
    """Oracle mirror of the training loop: per step k, pair counts over
    the current segmentation (s/p), the deterministic argmax (b), and
    the merge rewrite (w). MATERIALIZED throughout — each w references
    its predecessor, and DuckDB 1.0 inlines plain CTEs exponentially.
    The LEFT JOIN in w keeps the chain total even if a step finds no
    pair left to merge (mirrors train_merges' early break)."""
    parts = [dedent("""\
        words_all AS MATERIALIZED (
          SELECT lang, unnest(regexp_extract_all(lower(text), '([a-z]+)', 1)) AS word
          FROM documents
        ),
        words AS MATERIALIZED (
          SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM words_all GROUP BY word
        ),
        w0 AS MATERIALIZED (
          SELECT word, cnt,
                 array_to_string(list_transform(range(1, len(word) + 1),
                                 i -> '{' || substr(word, i, 1) || '}'), '')
                   || '{</w>}' AS syms
          FROM words
        )""")]
    for k in range(1, n_merges + 1):
        parts.append(dedent(f"""\
            s{k} AS MATERIALIZED (
              SELECT cnt, regexp_extract_all(syms, '\\{{([^}}]*)\\}}', 1) AS sl FROM w{k - 1}
            ),
            p{k} AS MATERIALIZED (
              SELECT list_extract(sl, i) AS l, list_extract(sl, i + 1) AS r,
                     CAST(SUM(cnt) AS BIGINT) AS pair_cnt
              FROM (SELECT cnt, sl, unnest(range(1, len(sl))) AS i FROM s{k})
              GROUP BY 1, 2
            ),
            b{k} AS MATERIALIZED (
              SELECT l, r, pair_cnt FROM p{k} ORDER BY pair_cnt DESC, l, r LIMIT 1
            ),
            w{k} AS MATERIALIZED (
              SELECT w.word, w.cnt,
                     CASE WHEN b.l IS NULL THEN w.syms
                          ELSE replace(w.syms, '{{' || b.l || '}}{{' || b.r || '}}',
                                       '{{' || b.l || b.r || '}}')
                     END AS syms
              FROM w{k - 1} w LEFT JOIN b{k} b ON TRUE
            )"""))
    return ",\n    ".join(parts)


DOC_BPE_MERGES_SQL = dedent(f"""
    WITH {_bpe_train_ctes(N_MERGES)}
    SELECT * FROM (
      {" UNION ALL ".join(
          f"SELECT CAST({k} AS INTEGER) AS step, l AS left_sym, r AS right_sym,"
          f" l || r AS merged, pair_cnt AS pair_count FROM b{k}"
          for k in range(1, N_MERGES + 1)
      )}
    )
    ORDER BY step
""")

DOC_BPE_TOKENS_SQL = dedent(f"""
    WITH {_bpe_train_ctes(N_MERGES)},
    vocab AS MATERIALIZED (
      SELECT word,
             CAST(length(syms) - length(replace(syms, '{{', '')) AS BIGINT) AS n_tok
      FROM w{N_MERGES}
    ),
    lw AS MATERIALIZED (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM words_all GROUP BY lang, word
    )
    SELECT l.lang,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
           CAST(SUM(l.cnt) AS BIGINT) AS n_words,
           CAST(SUM(l.cnt * v.n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(l.cnt * v.n_tok) AS DOUBLE) / CAST(SUM(l.cnt) AS DOUBLE)
             AS avg_tokens_per_word
    FROM lw l JOIN vocab v USING (word)
    GROUP BY l.lang
    ORDER BY l.lang
""")


QUERIES = [
    QuerySpec(
        "doc_bpe_merges",
        doc_bpe_merges,
        DOC_BPE_MERGES_SQL,
        "learn the top-8 BPE pair merges from the corpus word table",
        ("llm", "text", "tokenizer"),
    ),
    QuerySpec(
        "doc_bpe_tokens",
        doc_bpe_tokens,
        DOC_BPE_TOKENS_SQL,
        "per-lang token stats under the learned BPE vocabulary",
        ("llm", "text", "tokenizer"),
        bench=True,
    ),
]
