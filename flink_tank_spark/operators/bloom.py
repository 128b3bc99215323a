"""Distributed Bloom-filter build + probe for join pruning.

The 100 TB join problem this solves: a selective predicate on a
dimension table should prune the FACT side before the fact rows travel
through a shuffle — shipping a compact bit-set of the qualifying keys to
every fact partition costs KBs..MBs where broadcasting the key set
itself (or shuffling the fact table into a hash join) costs GBs. Spark's
own runtime filters (``spark.sql.optimizer.runtimeFilter.bloomFilter``)
apply the same idea opportunistically; this operator makes it an
explicit, composable stage with a measurable plan (and works on any
boolean-prunable expression, not just where the optimizer infers it).

Construction is pure codegen aggregation — no driver-side bit array:

- build: explode each key into ``k`` positions (``xxhash64(key, i) mod
  m``), map to (word, bit), ``groupBy(word).agg(bit_or)`` — a shuffle of
  at most ``m/64`` rows regardless of input size — then densify against
  a ``range(m/64)`` frame and fold into a single-row ``array<long>``.
  The one-row frame is bounded by the filter size itself (``m/64``
  longs ≈ m/8 bytes), the same bounded-broadcast contract as the repo's
  1-row stats frames; at the default 1% fpp that is ~1.2 bytes per
  build-side key. The DENSE ARRAY is load-bearing: Spark's map
  ``element_at`` (GetMapValue) is a LINEAR scan over the entries, so a
  ``map<long,long>`` filter costs O(m/64) per probe — measured 20.6 s
  for the sf1 registry query vs 4 s with O(1) array indexing.
- probe: broadcast-crossJoin the 1-row frame and test all ``k`` bits
  with ``element_at``/``shiftright``/``bitwiseAND`` — whole-stage
  codegen, no Python crossing, no shuffle of the probed side.

A Bloom pass admits false positives, so callers that need EXACT join
semantics follow the probe with the real join on the survivors — the
pruning only shrinks what reaches that join's shuffle. Reference
parity: the reference engine has no sketch-pruned joins; this is part
of the extension surface (SURVEY §2.12) motivated by the same
mergeable-summary design as operators/sketch.py.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Classic sizing: m = n*ln(1/fpp)/ln(2)^2 bits rounded up to a
    multiple of 64 (whole words), k = round(m/n * ln 2) hash functions.
    Driver-side arithmetic on metadata only — never on row values."""
    n = max(1, n_keys)
    m = int(math.ceil(n * math.log(1.0 / fpp) / (math.log(2.0) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2.0)))
    return m, k


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    # xxhash64 seeded by the probe index via an extra lit column: the
    # same (key, i) pair hashes identically on build and probe side.
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _bit(pos: Column) -> Column:
    # shiftleft with a COLUMN shift (the pyspark wrapper only takes a
    # Python-int shift; the SQL function itself is column-capable).
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"),
        pos.bitwiseAND(F.lit(63)).cast("int"),
    )


def bloom_words(keys: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """Sparse word table (word, bits) — the MERGEABLE form of the
    filter: tables from any key subsets fold by (word)-grouped bit_or
    into exactly the table a one-pass build produces (OR is idempotent,
    commutative, associative). The streaming sink persists this form;
    :func:`bloom_build` densifies it for O(1) probing."""
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    pos = F.explode(F.array(*_positions(F.col(key_col), m_bits, k))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.shiftright(F.col("pos"), 6).alias("word"),
            _bit(F.col("pos")).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_build(keys: DataFrame, key_col: str, m_bits: int, k: int) -> DataFrame:
    """1-row frame ``bloom: array<long>`` (index = word, value = 64-bit
    word; dense, length m_bits/64) over every value of
    ``keys[key_col]``. Insert is idempotent, so the input needs no
    pre-distinct; the (word)-grouped ``bit_or`` is the only data-sized
    shuffle and carries <= m/64 rows. Densification (left join against
    ``range(m/64)``, array_sort by word, project bits) keeps probe
    lookups O(1) — see the module docstring for why a map is not."""
    words = bloom_words(keys, key_col, m_bits, k)
    dense = (
        keys.sparkSession.range(m_bits // 64)
        .select(F.col("id").alias("word"))
        .join(words, "word", "left")
        .select("word", F.coalesce("bits", F.lit(0).cast("long")).alias("bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("word", "bits"))),
            lambda s: s["bits"],
        ).alias("bloom")
    )


def bloom_probe(
    df: DataFrame, key_col: str, bloom: DataFrame, m_bits: int, k: int
) -> DataFrame:
    """Rows of ``df`` that MIGHT be in the filter (false positives
    possible, false negatives impossible). Broadcasts the 1-row filter
    frame; the test is a codegen conjunction of k bit probes."""
    tests = []
    for p in _positions(F.col(key_col), m_bits, k):
        # 1-based dense-array index; always in range by pmod
        word = (F.shiftright(p, 6) + F.lit(1)).cast("int")
        bit = _bit(p)
        tests.append(
            F.element_at(F.col("bloom"), word).bitwiseAND(bit)
            != F.lit(0).cast("long")
        )
    cond = reduce(lambda a, b: a & b, tests)
    return df.crossJoin(F.broadcast(bloom)).filter(cond).drop("bloom")
