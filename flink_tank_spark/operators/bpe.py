"""Distributed BPE vocabulary training (byte-pair-encoding merges).

The tokenizer-construction step of an LLM data pipeline: given the
corpus, learn the top-N pair merges (Sennrich et al. 2016, the public
BPE algorithm) and apply them. doc_token_stats counts tokens with a
FIXED regex; this module learns the vocabulary itself.

Distributed shape — the standard trick that makes BPE feasible on 100 TB:
train on the WORD-FREQUENCY table, not the token stream. One corpus
scan builds (word, count) — natural-language vocabulary is bounded
(~1e6-1e8 distinct words at web scale, with Zipf mass in the head), so
every subsequent iteration is an aggregation over the persisted word
table, never a corpus re-scan. Per merge step: one explode of adjacent
symbol pairs weighted by word count + one map-side-combinable groupBy,
then a 1-ROW argmax collect (the driver must know the winning pair to
build the next iteration's plan — same bounded driver-scalar pattern as
the k-means Lloyd loop in operators/similarity.py).

Symbol-string representation (the determinism/correctness core): a
word's current segmentation is stored as ``{s1}{s2}...{sN}{</w>}`` —
every symbol brace-wrapped, NO shared delimiter characters between
adjacent symbols. Merging pair (a,b) is then the literal string
replacement ``{a}{b}`` → ``{ab}``: left-to-right non-overlapping
replacement (identical semantics in Java's String.replace and DuckDB's
replace) IS greedy BPE merging — e.g. ``{a}{a}{a}`` merges the first
two and leaves the third, exactly like the reference algorithm. A
space-delimited representation would break here: adjacent occurrences
share the separator space, so single-pass replace misses every second
occurrence. Words are restricted to ``[a-z]+`` runs so '{' / '}' can
never occur inside a symbol.

Tie-breaking: max pair count, then lexicographically smallest (left,
right) — pure ASCII byte order, identical in Spark and DuckDB, so the
learned vocabulary is bit-reproducible under any partitioning.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_REGEX = r"([a-z]+)"
END_MARK = "</w>"

# seed segmentation: one symbol per character + the end-of-word marker
_SEED_EXPR = (
    "concat(array_join(transform(sequence(1, length(word)),"
    " i -> concat('{', substr(word, i, 1), '}')), ''), '{</w>}')"
)
# symbols back out of the brace string
_SYMS_EXPR = r"regexp_extract_all(syms, '\\{([^}]*)\\}', 1)"


@dataclass(frozen=True)
class Merge:
    step: int
    left: str
    right: str
    count: int

    @property
    def merged(self) -> str:
        return self.left + self.right


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan → the global (word, cnt) table. Explode +
    map-side-combinable count; the output is vocabulary-sized."""
    return (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_REGEX}', 1)")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def seed_symbols(words: DataFrame) -> DataFrame:
    """Add the brace-wrapped per-character segmentation column ``syms``.
    The transform HOF is interpreted, but it runs once per DISTINCT word
    over bounded word lengths — not on the token stream."""
    return words.withColumn("syms", F.expr(_SEED_EXPR))


def _pair_counts(segmented: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency. Single-symbol
    words are filtered BEFORE the transform: Spark's sequence(1, 0)
    would generate a DESCENDING [1, 0] range, not an empty one."""
    sl = segmented.select("cnt", F.expr(_SYMS_EXPR).alias("sl")).filter(
        F.size("sl") >= 2
    )
    pairs = sl.select(
        "cnt",
        F.explode(
            F.expr(
                "transform(sequence(1, size(sl) - 1),"
                " i -> struct(element_at(sl, i) AS l, element_at(sl, i + 1) AS r))"
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("cnt").alias("pair_cnt")
    )


def merge_expr(col: Column, left: str, right: str) -> Column:
    """The literal merge rewrite ``{left}{right}`` → ``{leftright}``."""
    return F.replace(
        col,
        F.lit("{" + left + "}{" + right + "}"),
        F.lit("{" + left + right + "}"),
    )


def train_merges(segmented: DataFrame, n_merges: int) -> list[Merge]:
    """Learn ``n_merges`` BPE merges from a seeded word table.

    Callers should pass a PERSISTED ``segmented`` frame (plans/shared.py
    stage): each iteration's argmax action re-evaluates the replace
    chain from that base — k cheap projections over a vocabulary-sized
    table at step k, never a corpus re-scan."""
    merges: list[Merge] = []
    cur = segmented
    for step in range(1, n_merges + 1):
        top = (
            _pair_counts(cur)
            .orderBy(F.col("pair_cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:  # vocabulary fully merged — nothing left to learn
            break
        row = top[0]
        m = Merge(step, row["l"], row["r"], row["pair_cnt"])
        merges.append(m)
        cur = cur.withColumn("syms", merge_expr(F.col("syms"), m.left, m.right))
    return merges


def apply_merges(segmented: DataFrame, merges: list[Merge]) -> DataFrame:
    """Re-segment a seeded word table with an already-learned merge
    list: one chained-replace projection, pure codegen, no actions."""
    out = F.col("syms")
    for m in merges:
        out = merge_expr(out, m.left, m.right)
    return segmented.withColumn("syms", out)


def token_count_col(syms: Column | str = "syms") -> Column:
    """Number of BPE tokens in a segmentation = number of '{' braces."""
    c = F.col(syms) if isinstance(syms, str) else syms
    return (F.length(c) - F.length(F.replace(c, F.lit("{"), F.lit("")))).cast(
        "long"
    )
