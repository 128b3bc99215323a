"""Mergeable cardinality sketches (deterministic HyperLogLog).

Extension surface for 100 TB analytics (absent in the reference —
SURVEY §2.12): exact ``COUNT(DISTINCT)`` over a high-cardinality key
shuffles every distinct value; an HLL sketch reduces each partition to
``m`` small registers that merge by element-wise MAX — map-side
combinable, re-aggregatable across days/partitions without rescanning,
and tiny on the wire. This is the canonical "pre-aggregate then merge"
sketch pattern (Flajolet et al., HyperLogLog 2007).

Determinism design (what makes this ORACLE-CHECKABLE, unlike Spark's
``approx_count_distinct`` whose HLL++ bytes are engine-private):
- hash = md5 of the key rendered as a string — identical in Spark,
  DuckDB, and Python (same recipe as operators/text.py).
- register index = first 2 hex chars (m = 256); rho = 1 + number of
  leading zero bits in the next 48 bits, computed via base-conversion
  string length (pure integer ops in both engines).
- the register merge is MAX (order-free); the estimator's register sum
  uses scaled INTEGER arithmetic — ``sum(2^(49-rho))`` with rho ≤ 49
  is an exact int64 sum (≤ 2^56), so no floating-point reordering can
  change the result under any partitioning. The final alpha*m²/denom
  is a fixed sequence of scalar IEEE ops, identical everywhere.
- the standard small-range linear-counting correction (``m·ln(m/V)``)
  is deliberately elided: ``ln`` differs across libm implementations in
  the last ulp. At production scale (cardinality ≫ 2.5m) the raw
  estimator is the active branch anyway; tests pin the error envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M_BITS = 8          # 2^8 = 256 registers
M = 1 << M_BITS
RHO_BITS = 48       # hash bits fed to the leading-zero count
RHO_MAX = RHO_BITS + 1
_SCALE = float(1 << (RHO_MAX))  # 2^49, the fixed-point denominator


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL registers: (group_cols..., register, rho).

    One narrow projection + one map-side-combinable groupBy MAX — the
    shuffle carries at most ``|groups| * 256`` rows regardless of input
    size. The output IS the sketch: union register tables from any
    number of runs/days and re-MAX to merge (see :func:`hll_estimate`).

    Works UNCHANGED on a streaming DataFrame: max-per-register is an
    algebraic aggregate Structured Streaming maintains incrementally in
    its state store (update/complete mode), so the streaming state for a
    distinct-count query is the bounded sketch — groups×256 rows — not
    the unbounded distinct-key set. Pinned in
    tests/test_streaming.py::test_hll_registers_as_streaming_state.
    """
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    v48 = F.conv(F.substring(h, 3, 12), 16, 10).cast("long")
    # leading-zero count via base-2 string length: conv drops leading
    # zeros, so bits(v) = length(conv(v,16,2)); v = 0 ⇒ all 48 zero.
    nbits = F.length(F.conv(F.substring(h, 3, 12), 16, 2))
    rho = F.when(v48 == 0, F.lit(RHO_MAX)).otherwise(
        F.lit(RHO_BITS + 1) - nbits
    )
    reg = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    return (
        df.select(*group_cols, reg.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Collapse a register table to per-group cardinality estimates.

    Accepts the direct output of :func:`hll_registers` OR a union of
    several register tables (sketch merge): the max-per-register here
    makes union-then-estimate equal estimate-of-union exactly.
    """
    merged = registers.groupBy(*group_cols, "register").agg(
        F.max("rho").alias("rho")
    )
    # exact integer register sum: 2^(49-rho) is an exact long for
    # rho in [1, 49]; the sum is ≤ 256 * 2^48 < 2^63.
    term = F.pow(F.lit(2.0), F.lit(RHO_MAX) - F.col("rho")).cast("long")
    alpha = 0.7213 / (1.0 + 1.079 / M)
    per_group = merged.groupBy(*group_cols).agg(
        F.sum(term).alias("_ssum"),
        F.count(F.lit(1)).alias("n_reg_set"),
    )
    denom = (
        F.col("_ssum").cast("double") / F.lit(_SCALE)
        + (F.lit(M) - F.col("n_reg_set")).cast("double")
    )
    return per_group.select(
        *group_cols,
        F.col("n_reg_set").cast("long").alias("n_reg_set"),
        (F.lit(alpha) * F.lit(float(M * M)) / denom).alias("hll_est"),
    )


def hll_distinct(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """End-to-end: per-group approximate distinct count of ``key_col``."""
    return hll_estimate(hll_registers(df, key_col, group_cols), group_cols)


# ---------------------------------------------------------------------------
# Mergeable fixed-precision histograms → rank-based quantiles
# ---------------------------------------------------------------------------

def fp_histogram(
    df: DataFrame, value_col: str, group_cols: list[str], cents: int = 100
) -> DataFrame:
    """Per-group fixed-precision histogram: (group_cols..., bin, n).

    The quantile analogue of the HLL register table: one map-side-
    combinable groupBy reduces any number of rows to at most
    ``|groups| × |value range| × cents`` bins, and histograms MERGE by
    summing counts — so daily histogram tables answer all-time quantile
    questions without rescanning history (union + re-sum, see
    :func:`histogram_quantiles`).

    For fixed-precision data (money-like values with ≤ ``log10(cents)``
    decimals) the binning ``floor(x·cents + 0.5)`` is lossless, so the
    derived quantiles are EXACT rank-based quantiles, not estimates —
    the counting-sort trick. For continuous data the error is bounded by
    half a bin width. Pure IEEE multiply+floor ⇒ bit-identical binning
    in Spark and the SQL oracle.
    """
    b = F.floor(F.col(value_col) * F.lit(float(cents)) + F.lit(0.5)).cast("long")
    return (
        df.select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    cents: int = 100,
) -> DataFrame:
    """Collapse a histogram table (or a UNION of several — sketch merge)
    to per-group lower quantiles: p_q = smallest value whose cumulative
    count reaches ``ceil(q·N)``.

    The cumulative window runs over the MERGED histogram — per group at
    most a few thousand bins, so the window partition is tiny no matter
    how many input rows the histogram absorbed.
    """
    from pyspark.sql.window import Window as W

    merged = hist.groupBy(*group_cols, "bin").agg(F.sum("n").alias("n"))
    w_cum = W.partitionBy(*group_cols).orderBy("bin")
    w_tot = W.partitionBy(*group_cols)
    cum = merged.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(w_tot)
    )
    aggs = [
        F.min(
            F.when(F.col("cum") >= F.ceil(F.lit(q) * F.col("total")), F.col("bin"))
        ).alias(f"_b{round(q * 100)}")
        for q in qs
    ]
    out = cum.groupBy(*group_cols).agg(*aggs)
    return out.select(
        *group_cols,
        *[
            (F.col(f"_b{round(q * 100)}") / F.lit(float(cents))).alias(
                f"p{round(q * 100)}"
            )
            for q in qs
        ],
    )


# ---------------------------------------------------------------------------
# Count-Min sketch → heavy-hitter frequency estimates
# ---------------------------------------------------------------------------

CMS_DEPTH = 4       # independent hash rows
CMS_WIDTH = 256     # counters per row (one md5 hex byte)

# width → hex chars per row hash; widths are powers of 16 so a row's
# column is exactly nhex md5 hex chars — no modulo bias, and the
# default (256, 2 chars) stays bit-compatible with the SQL oracles.
_CMS_NHEX = {16: 1, 256: 2, 4096: 3, 65536: 4}


def _cms_cells(key_col: str, d: int, w: int):
    """The d (row, col) probe cells of a key: col j = md5 hex chars
    [j·nhex, (j+1)·nhex) — disjoint slices ⇒ independent-enough rows,
    identical bytes in Spark, DuckDB, and Python. One definition shared
    by build (:func:`cms_counters`) and query (:func:`cms_estimate`) so
    the probe can never drift from the sketch."""
    if w not in _CMS_NHEX:
        raise ValueError(f"cms width must be one of {sorted(_CMS_NHEX)}, got {w}")
    nhex = _CMS_NHEX[w]
    if d * nhex > 32:
        raise ValueError(
            f"d={d} rows x {nhex} hex chars exceeds md5's 32 hex chars"
        )
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    return F.array(*[
        F.struct(
            F.lit(j).alias("row"),
            F.conv(
                F.substring(h, nhex * j + 1, nhex), 16, 10
            ).cast("int").alias("col"),
        )
        for j in range(d)
    ])


def cms_counters(
    df: DataFrame,
    key_col: str,
    d: int = CMS_DEPTH,
    w: int = CMS_WIDTH,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-Min sketch counter table: (group..., row, col, cnt) —
    ≤ d×w cells per group (no ``group_cols``: one global sketch).

    The frequency analogue of the HLL register table (Cormode &
    Muthukrishnan 2005): one narrow projection + one map-side-combinable
    groupBy SUM reduces any number of rows to ≤ d·w counters, and
    sketches MERGE by summing cell-wise (:func:`cms_merge`) — daily
    sketch tables answer all-time frequency questions by union + re-sum.

    Determinism (oracle-checkable): row j's hash of a key is hex byte j
    of md5(key) — identical bytes in Spark, DuckDB, and Python. d=4,
    w=256 gives the standard guarantee shape: estimate ≥ true count
    always, and P[overestimate > 2N/w] ≤ (1/2)^d per query.
    """
    cells = _cms_cells(key_col, d, w)
    g = list(group_cols or [])
    return (
        df.select(*g, F.explode(cells).alias("c"))
        .select(*g, "c.row", "c.col")
        .groupBy(*g, "row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(counters: DataFrame) -> DataFrame:
    """Merge per-group sketches into one: cell-wise SUM over the group
    columns. Counting is additive, so the merged table is BIT-IDENTICAL
    to a direct one-pass :func:`cms_counters` build over the union of
    the groups' rows (pinned in tests/test_sketch.py) — the
    re-aggregation property that lets daily sketch tables answer
    all-time frequency questions without rescanning history."""
    return counters.groupBy("row", "col").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    counters: DataFrame, keys: DataFrame, key_col: str,
    d: int = CMS_DEPTH, w: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: the estimate is
    the MIN over the key's d cells. ``counters`` (≤ d·w rows) is
    broadcast; the output carries (key_col, cms_est). ``d``/``w`` must
    match the :func:`cms_counters` build (same probe-cell derivation —
    one shared definition, :func:`_cms_cells`)."""
    probes = keys.select(
        key_col, F.explode(_cms_cells(key_col, d, w)).alias("c")
    ).select(key_col, "c.row", "c.col")
    return (
        probes.join(F.broadcast(counters), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


# ---------------------------------------------------------------------------
# KMV (k minimum values) sketches → SET-OPERATION estimates
# ---------------------------------------------------------------------------
# The fourth sketch family: HLL answers |A|, CMS answers freq(x),
# histograms answer quantiles — none can answer |A ∩ B| or J(A, B),
# because HLL registers lose the identity of the hashed values. A KMV
# sketch (Bar-Yossef et al. 2002; Beyer et al. "distinct-value synopses"
# 2007) keeps the k SMALLEST hash values of the set: a uniform sample of
# the hash space that supports union (k smallest of the merged arrays),
# intersection/Jaccard (fraction of the union-sketch prefix present in
# both sides), and distinct-count (k-1 over the k-th minimum) — all from
# k values per group, re-aggregatable like every other sketch here.
#
# Determinism: hashes are full md5 hex strings — fixed width, so their
# LEXICOGRAPHIC order IS their numeric order, and min-k/merge/estimate
# are pure integer/string ops identical in Spark and the SQL oracle;
# the estimator consumes the first 48 bits via the same base-conversion
# recipe as the HLL registers. Every derived double is a single IEEE
# division/multiply of exactly-representable operands.

KMV_K = 64
_KMV_48 = float(1 << 48)


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = KMV_K,
    n_salts: int = 32,
) -> DataFrame:
    """Per-group KMV sketch: (group_cols..., ks: array<string>) holding
    the ``k`` smallest md5 hashes of the group's DISTINCT keys.

    Two-phase salted build (never a window over a low-cardinality group
    partition, never a whole-group collect): phase 1 groups by
    (group, salt-of-hash) and keeps each salt's local min-k — identical
    keys share a hash and therefore a salt, so ``collect_set`` dedups
    exactly; phase 2 merges the ≤ ``n_salts`` bounded arrays per group.
    ``n_salts`` is the executor-memory knob: a salt group materializes
    ~distinct/n_salts hashes, so at 100 TB it scales with the corpus
    exactly like ``spark.sql.shuffle.partitions`` (the arrays crossing
    the phase-2 shuffle stay ≤ n_salts × k per group regardless)."""
    h = F.md5(F.col(key_col).cast("string").cast("binary"))
    hashed = df.select(*group_cols, h.alias("h"))
    local = (
        hashed.withColumn("_salt", F.pmod(F.xxhash64("h"), F.lit(n_salts)))
        .groupBy(*group_cols, "_salt")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("_hs"))
    )
    return local.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_hs"))), 1, k)
        .alias("ks")
    )


def _v48(h: "F.Column") -> "F.Column":
    # first 48 hash bits as an exact long (the HLL recipe)
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def kmv_distinct_est(ks: "F.Column", k: int = KMV_K) -> "F.Column":
    """Distinct-count estimate from a sketch array: exact size when the
    sketch never filled; else (k-1)/u_k with u_k the k-th minimum mapped
    to (0,1) — written as one literal-by-double division so Spark and
    the oracle agree bit-for-bit."""
    full = F.size(ks) >= k
    vk = _v48(F.element_at(ks, F.size(ks)))
    return F.when(
        full, F.lit(float((k - 1)) * _KMV_48) / vk.cast("double")
    ).otherwise(F.size(ks).cast("double"))


def kmv_set_estimates(
    ks_a: "F.Column", ks_b: "F.Column", k: int = KMV_K
) -> dict[str, "F.Column"]:
    """Union/Jaccard/intersection estimates for two sketches: merge to
    the union sketch u (k smallest of the deduped concat), count the
    prefix elements present in BOTH sides, estimate
    J = common/|u|, |A ∪ B| from u's k-th min, |A ∩ B| = J × union."""
    u = F.slice(F.array_sort(F.array_union(ks_a, ks_b)), 1, k)
    n_u = F.size(u)
    n_common = F.size(F.array_intersect(u, F.array_intersect(ks_a, ks_b)))
    union_est = kmv_distinct_est(u, k)
    jaccard_est = n_common.cast("double") / n_u
    return {
        "n_common": n_common.cast("long"),
        "kmv_union_est": union_est,
        "kmv_jaccard_est": jaccard_est,
        "kmv_inter_est": jaccard_est * union_est,
    }
