"""Sketch queries: mergeable approximate distinct counts over events.

Extension surface (SURVEY §2.12; operators/sketch.py). The pair of
registry entries demonstrates the two properties that make sketches the
right tool at 100 TB:

- ``ev_hll_user_days``: one pass builds 256 registers per group; the
  shuffle after partial aggregation carries ≤ groups×256 rows no matter
  how many input rows — vs exact COUNT(DISTINCT) shuffling every
  distinct key.
- ``ev_hll_merge_days``: registers sketched per (day, type) and then
  MERGED across days produce BIT-IDENTICAL estimates to sketching the
  whole stream directly — the re-aggregation property that lets daily
  sketch tables answer all-time questions without rescanning history.

Both are oracle-checked: the md5/fixed-point construction in
operators/sketch.py makes the estimates deterministic across engines,
unlike builtin ``approx_count_distinct`` (engine-private HLL++ bytes).
"""

from __future__ import annotations

from textwrap import dedent

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_tank_spark.io.tables import load_table
from flink_tank_spark.operators import sketch
from flink_tank_spark.plans import shared
from flink_tank_spark.plans.registry import QuerySpec


def _user_day_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, day, user_day) — user_day is the DAU-style composite
    key 'user:date' whose distinct count per type is the HLL target."""
    ev = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    return ev.select(
        "event_type",
        day.alias("day"),
        F.concat_ws(
            ":", F.col("user_id").cast("string"), day.cast("string")
        ).alias("user_day"),
    )


def _daily_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared stage: the per-(day, event_type) HLL register table — the
    md5-heavy events pass both HLL queries start from. Built once per
    session (plans/shared.py) and tiny when persisted (days × types ×
    ≤256 rows). The re-aggregation property (max-merge associativity,
    pinned bit-exact at the operator level in tests/test_sketch.py)
    makes estimates derived from this table identical to a direct
    per-type register build, so BOTH queries can share it safely."""

    def build() -> DataFrame:
        return sketch.hll_registers(
            _user_day_events(spark, sf_dir), "user_day", ["day", "event_type"]
        )

    return shared.stage(spark, "ev_hll_daily_registers", (sf_dir,), build)


def ev_hll_user_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _user_day_events(spark, sf_dir)
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_day").alias("n_exact")
    )
    est = sketch.hll_estimate(_daily_registers(spark, sf_dir), ["event_type"])
    return (
        exact.join(est, "event_type")
        .select("event_type", "n_exact", "n_reg_set", "hll_est")
        .orderBy("event_type")
    )


def ev_hll_merge_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch per (day, type), merge across days to per-type estimates —
    bit-identical to a direct one-pass per-type build (the property is
    pinned at the operator level in tests/test_sketch.py)."""
    return (
        sketch.hll_estimate(_daily_registers(spark, sf_dir), ["event_type"])
        .select("event_type", "n_reg_set", "hll_est")
        .orderBy("event_type")
    )


# Shared oracle CTEs mirroring operators/sketch.py: register = first 2
# md5 hex chars, rho = 1 + leading zeros of the next 48 bits (via base-2
# string length), register sum in scaled int64 (2^(49-rho) exact).
_HLL_CTES = dedent("""\
    events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events),
    k AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR) AS user_day
      FROM events
    ),
    hashed AS (SELECT event_type, day, user_day, md5(user_day) AS h FROM k),
    rr AS (
      SELECT event_type, day,
             ('0x' || substr(h, 1, 2))::INTEGER AS register,
             CASE WHEN ('0x' || substr(h, 3, 12))::BIGINT = 0 THEN 49
                  ELSE 49 - length(bin(('0x' || substr(h, 3, 12))::BIGINT)) END AS rho
      FROM hashed
    )""")

_HLL_EST = dedent("""\
    est AS (
      SELECT event_type,
             COUNT(*) AS n_reg_set,
             SUM(CAST(pow(2.0, 49 - rho) AS BIGINT)) AS ssum
      FROM regs GROUP BY event_type
    ),
    final_est AS (
      SELECT event_type, CAST(n_reg_set AS BIGINT) AS n_reg_set,
             (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
               / (CAST(ssum AS DOUBLE) / 562949953421312.0
                  + CAST(256 - n_reg_set AS DOUBLE)) AS hll_est
      FROM est
    )""")

EV_HLL_USER_DAYS_SQL = dedent(f"""
    WITH {_HLL_CTES},
    regs AS (
      SELECT event_type, register, MAX(rho) AS rho FROM rr GROUP BY 1, 2
    ),
    {_HLL_EST},
    ex AS (
      SELECT event_type, COUNT(DISTINCT user_day) AS n_exact FROM k GROUP BY 1
    )
    SELECT f.event_type, ex.n_exact, f.n_reg_set, f.hll_est
    FROM final_est f JOIN ex ON ex.event_type = f.event_type
    ORDER BY f.event_type
""")

EV_HLL_MERGE_DAYS_SQL = dedent(f"""
    WITH {_HLL_CTES},
    daily AS (
      SELECT event_type, day, register, MAX(rho) AS rho FROM rr GROUP BY 1, 2, 3
    ),
    regs AS (
      SELECT event_type, register, MAX(rho) AS rho FROM daily GROUP BY 1, 2
    ),
    {_HLL_EST}
    SELECT event_type, n_reg_set, hll_est
    FROM final_est
    ORDER BY event_type
""")


# ---------------------------------------------------------------------------
# Histogram-quantile pair: direct build vs merged daily sketches — same
# two properties as the HLL pair (bounded shuffle, exact re-aggregation),
# and because events.value is 2-decimal the quantiles are EXACT.
# ---------------------------------------------------------------------------

def ev_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hist = sketch.fp_histogram(ev, "value", ["event_type"])
    return sketch.histogram_quantiles(hist, ["event_type"]).orderBy("event_type")


def ev_value_quantiles_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram per (day, type), merged across days — bit-identical
    quantiles to the direct pass (pinned in tests/test_sketch.py)."""
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = sketch.fp_histogram(ev, "value", ["day", "event_type"])
    merged = daily.drop("day")
    return sketch.histogram_quantiles(merged, ["event_type"]).orderBy("event_type")


_HIST_QUANTILE_SELECT = dedent("""\
    SELECT event_type,
           MIN(CASE WHEN cum >= CEIL(0.5 * total) THEN bin END) / 100.0 AS p50,
           MIN(CASE WHEN cum >= CEIL(0.95 * total) THEN bin END) / 100.0 AS p95,
           MIN(CASE WHEN cum >= CEIL(0.99 * total) THEN bin END) / 100.0 AS p99
    FROM c GROUP BY event_type ORDER BY event_type""")

EV_VALUE_QUANTILES_SQL = dedent(f"""
    WITH b AS (
      SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS bin
      FROM events
    ),
    h AS (SELECT event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM h
    )
    {_HIST_QUANTILE_SELECT}
""")

EV_VALUE_QUANTILES_MERGED_SQL = dedent(f"""
    WITH events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events),
    b AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS bin
      FROM events
    ),
    daily AS (SELECT day, event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2, 3),
    h AS (SELECT event_type, bin, SUM(n) AS n FROM daily GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM h
    )
    {_HIST_QUANTILE_SELECT}
""")


# ---------------------------------------------------------------------------
# Count-Min heavy hitters: frequency estimates for the top users — the
# third sketch family (HLL = distinct, histogram = quantiles, CMS =
# frequency), same two scale properties (bounded shuffle, merge-by-sum).
# ---------------------------------------------------------------------------

def ev_cms_heavy_hitters(spark: SparkSession, sf_dir: str, top: int = 20) -> DataFrame:
    """Count-Min sketch frequency estimates for the top-20 exact
    heaviest users: the sketch's one-sided guarantee (estimate ≥ truth,
    bounded overcount) becomes a checkable column. Top-k is
    TakeOrderedAndProject (orderBy+limit — distributed), never a global
    window; the 4×256 counter table is broadcast for point queries."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.col("user_id").cast("string").alias("user_key"))
    counters = sketch.cms_counters(keyed, "user_key")
    exact = keyed.groupBy("user_key").agg(F.count(F.lit(1)).alias("n_exact"))
    topk = exact.orderBy(F.desc("n_exact"), "user_key").limit(top)
    est = sketch.cms_estimate(counters, topk.select("user_key"), "user_key")
    return (
        topk.join(est, "user_key")
        .select(
            "user_key",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
        )
        .orderBy(F.desc("n_exact"), "user_key")
    )


def ev_cms_merge_days(spark: SparkSession, sf_dir: str, top: int = 20) -> DataFrame:
    """CMS sketched per DAY, then merged cell-wise across days
    (operators/sketch.cms_merge) before point-querying the top-20 exact
    heaviest users — the daily-sketch-table deployment. Counting is
    additive, so the merged estimates are bit-identical to the direct
    one-pass build (ev_cms_heavy_hitters); the oracle mirrors the
    daily-then-merge staging, so the gate certifies the merge path
    itself. ``n_days`` reports how many daily sketches merged."""
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(
        F.to_date("ts").alias("day"),
        F.col("user_id").cast("string").alias("user_key"),
    )
    daily = sketch.cms_counters(keyed, "user_key", group_cols=["day"])
    merged = sketch.cms_merge(daily)
    n_days = keyed.select(F.countDistinct("day").alias("n_days"))
    exact = keyed.groupBy("user_key").agg(F.count(F.lit(1)).alias("n_exact"))
    topk = exact.orderBy(F.desc("n_exact"), "user_key").limit(top)
    est = sketch.cms_estimate(merged, topk.select("user_key"), "user_key")
    return (
        topk.join(est, "user_key")
        .crossJoin(F.broadcast(n_days))
        .select(
            "user_key",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overcount"),
            "n_days",
        )
        .orderBy(F.desc("n_exact"), "user_key")
    )


EV_CMS_MERGE_DAYS_SQL = dedent("""
    WITH keyed AS (
      SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
             CAST(user_id AS VARCHAR) AS user_key
      FROM events
    ),
    rows4 AS (SELECT unnest(range(4)) AS row),
    cells AS (
      SELECT k.day, r.row AS row,
             ('0x' || substr(md5(k.user_key), 2 * r.row + 1, 2))::INTEGER AS col
      FROM keyed k CROSS JOIN rows4 r
    ),
    daily AS (SELECT day, row, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2, 3),
    merged AS (SELECT row, col, CAST(SUM(cnt) AS BIGINT) AS cnt
               FROM daily GROUP BY 1, 2),
    nd AS (SELECT COUNT(DISTINCT day) AS n_days FROM keyed),
    exact AS (SELECT user_key, COUNT(*) AS n_exact FROM keyed GROUP BY user_key),
    topk AS (SELECT user_key, n_exact FROM exact
             ORDER BY n_exact DESC, user_key LIMIT 20),
    probes AS (
      SELECT t.user_key, r.row AS row,
             ('0x' || substr(md5(t.user_key), 2 * r.row + 1, 2))::INTEGER AS col
      FROM topk t CROSS JOIN rows4 r
    ),
    est AS (
      SELECT p.user_key, MIN(c.cnt) AS cms_est
      FROM probes p JOIN merged c ON c.row = p.row AND c.col = p.col
      GROUP BY p.user_key
    )
    SELECT t.user_key, t.n_exact, e.cms_est,
           e.cms_est - t.n_exact AS overcount, nd.n_days
    FROM topk t JOIN est e ON e.user_key = t.user_key CROSS JOIN nd
    ORDER BY t.n_exact DESC, t.user_key
""")


EV_CMS_HEAVY_HITTERS_SQL = dedent("""
    WITH keyed AS (SELECT CAST(user_id AS VARCHAR) AS user_key FROM events),
    rows4 AS (SELECT unnest(range(4)) AS row),
    cells AS (
      SELECT r.row AS row,
             ('0x' || substr(md5(k.user_key), 2 * r.row + 1, 2))::INTEGER AS col
      FROM keyed k CROSS JOIN rows4 r
    ),
    counters AS (SELECT row, col, COUNT(*) AS cnt FROM cells GROUP BY 1, 2),
    exact AS (SELECT user_key, COUNT(*) AS n_exact FROM keyed GROUP BY user_key),
    topk AS (SELECT user_key, n_exact FROM exact
             ORDER BY n_exact DESC, user_key LIMIT 20),
    probes AS (
      SELECT t.user_key, r.row AS row,
             ('0x' || substr(md5(t.user_key), 2 * r.row + 1, 2))::INTEGER AS col
      FROM topk t CROSS JOIN rows4 r
    ),
    est AS (
      SELECT p.user_key, MIN(c.cnt) AS cms_est
      FROM probes p JOIN counters c ON c.row = p.row AND c.col = p.col
      GROUP BY p.user_key
    )
    SELECT t.user_key, t.n_exact, e.cms_est, e.cms_est - t.n_exact AS overcount
    FROM topk t JOIN est e ON e.user_key = t.user_key
    ORDER BY t.n_exact DESC, t.user_key
""")


# ---------------------------------------------------------------------------
# KMV set-operation estimates: the sketch family's fourth member —
# HLL = distinct, histogram = quantiles, CMS = frequency, KMV = set
# OVERLAP (|A ∩ B| / Jaccard between groups), which HLL registers
# cannot answer because they lose hash identity.
# ---------------------------------------------------------------------------

def ev_kmv_overlap_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Estimated vs exact audience overlap between event types: per-type
    KMV sketches (k=64 smallest md5 hashes of the distinct user-day
    set), merged pairwise into union sketches, yielding union/Jaccard/
    intersection estimates — with the exact intersection and Jaccard
    alongside, the same checkable-estimate pattern as the CMS overcount
    column. The pairwise stage joins the 5-row per-type sketch frames
    (bounded by |types|^2, constant at any corpus size); the only
    data-sized work is the distinct + salted min-k build, whose shuffle
    carries <= n_salts x k hashes per type."""
    ev = _user_day_events(spark, sf_dir)
    duser = ev.select("event_type", "user_day").distinct()
    sk = sketch.kmv_sketch(duser, "user_day", ["event_type"])
    a = sk.select(F.col("event_type").alias("type_a"), F.col("ks").alias("ks_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("ks").alias("ks_b"))
    est = sketch.kmv_set_estimates(F.col("ks_a"), F.col("ks_b"))
    # broadcast pinned: the sketch frames are |types| rows but come out
    # of an aggregation with no stats — without the hint the sf1 planner
    # demoted this to a CartesianProduct (caught by plan_scale_audit r8)
    pairs = (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b",
                est["n_common"].alias("n_common"),
                est["kmv_union_est"].alias("kmv_union_est"),
                est["kmv_jaccard_est"].alias("kmv_jaccard_est"),
                est["kmv_inter_est"].alias("kmv_inter_est"))
    )
    x, y = duser.alias("x"), duser.alias("y")
    ex = (
        x.join(y, (F.col("x.user_day") == F.col("y.user_day"))
               & (F.col("x.event_type") < F.col("y.event_type")))
        .groupBy(F.col("x.event_type").alias("type_a"),
                 F.col("y.event_type").alias("type_b"))
        .agg(F.count(F.lit(1)).alias("n_inter_exact"))
    )
    sz = duser.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    n_inter = F.coalesce("n_inter_exact", F.lit(0).cast("bigint"))
    return (
        pairs.join(ex, ["type_a", "type_b"], "left")
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_common",
            "kmv_union_est", "kmv_jaccard_est", "kmv_inter_est",
            n_inter.alias("n_inter_exact"),
            (n_inter.cast("double")
             / (F.col("n_a") + F.col("n_b") - n_inter)).alias("jaccard_exact"),
        )
        .orderBy("type_a", "type_b")
    )


EV_KMV_OVERLAP_TYPES_SQL = dedent("""
    WITH events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events),
    k AS (
      SELECT event_type,
             CAST(user_id AS VARCHAR) || ':' || CAST(CAST(ts AS DATE) AS VARCHAR) AS user_day
      FROM events
    ),
    duser AS (SELECT DISTINCT event_type, user_day FROM k),
    d AS (SELECT event_type, md5(user_day) AS h FROM duser),
    sk AS (
      SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM d) WHERE rk <= 64
    ),
    types AS (SELECT DISTINCT event_type FROM duser),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b
      FROM types a JOIN types b ON a.event_type < b.event_type
    ),
    uni0 AS (
      SELECT p.type_a, p.type_b, s.h, COUNT(*) AS cnt
      FROM pairs p JOIN sk s
        ON s.event_type = p.type_a OR s.event_type = p.type_b
      GROUP BY 1, 2, 3
    ),
    uni AS (
      SELECT type_a, type_b, h, cnt,
             row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rk,
             COUNT(*) OVER (PARTITION BY type_a, type_b) AS n_all
      FROM uni0
    ),
    agg AS (
      SELECT type_a, type_b,
             LEAST(64, MAX(n_all)) AS n_u,
             CAST(SUM(CASE WHEN rk <= 64 AND cnt = 2 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_common,
             MAX(CASE WHEN rk = LEAST(64, n_all)
                      THEN ('0x' || substr(h, 1, 12))::BIGINT END) AS vk
      FROM uni GROUP BY 1, 2
    ),
    est AS (
      SELECT type_a, type_b, n_common,
             CASE WHEN n_u >= 64
                  THEN 17732923532771328.0 / CAST(vk AS DOUBLE)
                  ELSE CAST(n_u AS DOUBLE) END AS kmv_union_est,
             CAST(n_common AS DOUBLE) / n_u AS kmv_jaccard_est
      FROM agg
    ),
    ex AS (
      SELECT x.event_type AS type_a, y.event_type AS type_b,
             COUNT(*) AS n_inter
      FROM duser x JOIN duser y
        ON x.user_day = y.user_day AND x.event_type < y.event_type
      GROUP BY 1, 2
    ),
    sz AS (SELECT event_type, COUNT(*) AS n FROM duser GROUP BY 1)
    SELECT e.type_a, e.type_b, e.n_common,
           e.kmv_union_est, e.kmv_jaccard_est,
           e.kmv_jaccard_est * e.kmv_union_est AS kmv_inter_est,
           COALESCE(ex.n_inter, 0) AS n_inter_exact,
           CAST(COALESCE(ex.n_inter, 0) AS DOUBLE)
             / (sa.n + sb.n - COALESCE(ex.n_inter, 0)) AS jaccard_exact
    FROM est e
    LEFT JOIN ex ON ex.type_a = e.type_a AND ex.type_b = e.type_b
    JOIN sz sa ON sa.event_type = e.type_a
    JOIN sz sb ON sb.event_type = e.type_b
    ORDER BY e.type_a, e.type_b
""")


# --------------------------------------------------------------------------
# ev_value_deciles — equi-depth discretization, applied at the BIN level
# --------------------------------------------------------------------------

def ev_value_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth feature discretization: every event's value mapped to
    its within-type decile (the binning step a feature pipeline runs
    before bucketized embeddings / monotonic models), reported as per-
    (type, decile) occupancy with the bucket's value range.

    Scale shape — the decile is assigned at the BIN level, never per
    event: after the one map-side-combinable histogram groupBy, edges
    and assignments live on the bounded (type × bins) dimension table
    (the fp_histogram counting-sort trick), so corpus-sized work is ONE
    aggregation regardless of row count, and the bin→decile map is a
    broadcast-sized dimension any downstream apply joins against. The
    decile threshold test is pure integers (10·cum ≥ d·total — no
    ceil/float), and bucket bounds are exact bin/100 doubles, so any
    partitioning and the DuckDB oracle agree bit-for-bit.
    """
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    hist = sketch.fp_histogram(ev, "value", ["event_type"])
    cum = hist.withColumn(
        "cum", F.sum("n").over(W.partitionBy("event_type").orderBy("bin"))
    ).withColumn("total", F.sum("n").over(W.partitionBy("event_type")))
    d = F.explode(F.sequence(F.lit(1), F.lit(9))).alias("d")
    edges = (
        cum.select("event_type", "bin", "cum", "total", d)
        .filter(F.lit(10) * F.col("cum") >= F.col("d") * F.col("total"))
        .groupBy("event_type", "d")
        .agg(F.min("bin").alias("edge_bin"))
    )
    bin_decile = (
        hist.join(F.broadcast(edges), "event_type")
        .groupBy("event_type", "bin", "n")
        .agg(
            (
                F.lit(1)
                + F.sum((F.col("edge_bin") < F.col("bin")).cast("integer"))
            ).cast("long").alias("decile")
        )
    )
    return (
        bin_decile.groupBy("event_type", "decile")
        .agg(
            F.sum("n").alias("n_events"),
            (F.min("bin") / F.lit(100.0)).alias("lo"),
            (F.max("bin") / F.lit(100.0)).alias("hi"),
        )
        .orderBy("event_type", "decile")
    )


EV_VALUE_DECILES_SQL = dedent("""
    WITH events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events),
    b AS (
      SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS bin
      FROM events
    ),
    h AS (SELECT event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM h
    ),
    edges AS (
      SELECT event_type, d, MIN(bin) AS edge_bin
      FROM c CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) ds
      WHERE 10 * cum >= d * total
      GROUP BY event_type, d
    ),
    bd AS (
      SELECT h.event_type, h.bin, h.n,
             CAST(1 + SUM(CASE WHEN e.edge_bin < h.bin THEN 1 ELSE 0 END)
                  AS BIGINT) AS decile
      FROM h JOIN edges e USING (event_type)
      GROUP BY h.event_type, h.bin, h.n
    )
    SELECT event_type, decile,
           CAST(SUM(n) AS BIGINT) AS n_events,
           MIN(bin) / 100.0 AS lo,
           MAX(bin) / 100.0 AS hi
    FROM bd GROUP BY event_type, decile
    ORDER BY event_type, decile
""")



# --------------------------------------------------------------------------
# ev_trimmed_mean — robust (winsor-trimmed) mean via exact bin overlap
# --------------------------------------------------------------------------

def ev_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean of value per event type (drop the bottom and
    top 5% BY RANK, average the rest) — the robust center the plain
    mean loses to the heavy tail ev_value_outliers flags.

    Exact at any scale via the histogram counting-sort trick: ranks
    come from the cumulative bin counts, each bin contributes
    ``bin · |[cum−n+1, cum] ∩ (k_lo, k_hi]|`` — pure integer overlap
    arithmetic, no sort of raw rows, no percentile estimate. The kept
    range (k_lo, k_hi] = (ceil(0.05·N), floor(0.95·N)] is integer-exact
    via 20·k bounds. One corpus groupBy; the trimming runs on the
    bounded (type × bins) table; final mean = one int/int double
    division mirrored verbatim in the oracle."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    hist = sketch.fp_histogram(ev, "value", ["event_type"])
    cum = hist.withColumn(
        "cum", F.sum("n").over(W.partitionBy("event_type").orderBy("bin"))
    ).withColumn("total", F.sum("n").over(W.partitionBy("event_type")))
    # this bin holds ranks (cum-n, cum]; the kept window is
    # (floor(N/20), floor(19N/20)] — pure integer division both sides,
    # so the overlap is exact at any N
    lo_excl = F.col("cum") - F.col("n")
    hi_rank = F.expr("(total * 19) div 20")
    lo_rank = F.expr("total div 20")
    kept_int = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("cum"), hi_rank) - F.greatest(lo_excl, lo_rank),
    )
    out = (
        cum.withColumn("kept", kept_int)
        .groupBy("event_type")
        .agg(
            F.sum(F.col("kept") * F.col("bin")).alias("ksum"),
            F.sum("kept").alias("kn"),
        )
        .select(
            "event_type",
            F.col("kn").cast("long").alias("n_kept"),
            (
                F.col("ksum").cast("double")
                / F.col("kn").cast("double")
                / F.lit(100.0)
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )
    return out


EV_TRIMMED_MEAN_SQL = dedent("""
    WITH events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events),
    b AS (
      SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS bin
      FROM events
    ),
    h AS (SELECT event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin, n,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM h
    ),
    k AS (
      SELECT event_type, bin,
             GREATEST(0, LEAST(cum, (total * 19) // 20)
                         - GREATEST(cum - n, total // 20)) AS kept
      FROM c
    )
    SELECT event_type,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(kept * bin) AS DOUBLE) / CAST(SUM(kept) AS DOUBLE) / 100.0
             AS trimmed_mean
    FROM k GROUP BY event_type
    ORDER BY event_type
""")



# --------------------------------------------------------------------------
# ev_value_mad — median absolute deviation via two bounded bin passes
# --------------------------------------------------------------------------

def ev_value_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median and median-absolute-deviation of value per event type —
    the robust location/scale pair (MAD is what you calibrate outlier
    thresholds with when the tail makes stddev lie).

    Exact rank statistics at any scale, zero raw-row sorts: the median
    is the smallest bin whose cumulative count reaches half (the
    counting-sort trick, integer test 2·cum ≥ N); the deviation
    distribution |bin − median| is then REBINNED from the histogram
    itself (weights carry over — never a second corpus pass) and MAD is
    the same rank rule on that bounded table. Both windows run over
    ≤ bins-per-type rows."""
    from pyspark.sql.window import Window as W

    ev = load_table(spark, sf_dir, "events")
    hist = sketch.fp_histogram(ev, "value", ["event_type"])
    w_cum = W.partitionBy("event_type").orderBy("bin")
    cum = hist.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(W.partitionBy("event_type"))
    )
    med = (
        cum.filter(F.lit(2) * F.col("cum") >= F.col("total"))
        .groupBy("event_type")
        .agg(F.min("bin").alias("med_bin"))
    )
    dev = (
        hist.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.abs(F.col("bin") - F.col("med_bin")).alias("d"),
            "n",
        )
        .groupBy("event_type", "d")
        .agg(F.sum("n").alias("n"))
    )
    w_dcum = W.partitionBy("event_type").orderBy("d")
    dcum = dev.withColumn("cum", F.sum("n").over(w_dcum)).withColumn(
        "total", F.sum("n").over(W.partitionBy("event_type"))
    )
    mad = (
        dcum.filter(F.lit(2) * F.col("cum") >= F.col("total"))
        .groupBy("event_type")
        .agg(F.min("d").alias("mad_bin"), F.max("total").alias("n_events"))
    )
    return (
        mad.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            F.col("n_events").cast("long"),
            (F.col("med_bin") / F.lit(100.0)).alias("median"),
            (F.col("mad_bin") / F.lit(100.0)).alias("mad"),
        )
        .orderBy("event_type")
    )


EV_VALUE_MAD_SQL = dedent("""
    WITH events AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM main.events),
    b AS (
      SELECT event_type, CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS bin
      FROM events
    ),
    h AS (SELECT event_type, bin, COUNT(*) AS n FROM b GROUP BY 1, 2),
    c AS (
      SELECT event_type, bin,
             SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM h
    ),
    med AS (
      SELECT event_type, MIN(bin) AS med_bin
      FROM c WHERE 2 * cum >= total GROUP BY event_type
    ),
    dev AS (
      SELECT h.event_type, ABS(h.bin - m.med_bin) AS d, SUM(h.n) AS n
      FROM h JOIN med m USING (event_type)
      GROUP BY 1, 2
    ),
    dc AS (
      SELECT event_type, d,
             SUM(n) OVER (PARTITION BY event_type ORDER BY d) AS cum,
             SUM(n) OVER (PARTITION BY event_type) AS total
      FROM dev
    ),
    mad AS (
      SELECT event_type, MIN(d) AS mad_bin, CAST(MAX(total) AS BIGINT) AS n_events
      FROM dc WHERE 2 * cum >= total GROUP BY event_type
    )
    SELECT m.event_type, m.n_events,
           e.med_bin / 100.0 AS median,
           m.mad_bin / 100.0 AS mad
    FROM mad m JOIN med e USING (event_type)
    ORDER BY event_type
""")



QUERIES = [
    QuerySpec("ev_cms_heavy_hitters", ev_cms_heavy_hitters,
              EV_CMS_HEAVY_HITTERS_SQL,
              "Count-Min sketch frequency estimates vs exact for the top-20 users",
              ("sketch", "events")),
    QuerySpec("ev_cms_merge_days", ev_cms_merge_days, EV_CMS_MERGE_DAYS_SQL,
              "daily CMS sketches merged cell-wise across days (re-aggregation)",
              ("sketch", "events")),
    QuerySpec("ev_hll_user_days", ev_hll_user_days, EV_HLL_USER_DAYS_SQL,
              "HLL-sketched distinct user-days per event type vs exact",
              ("sketch", "events"), bench=True),
    QuerySpec("ev_hll_merge_days", ev_hll_merge_days, EV_HLL_MERGE_DAYS_SQL,
              "daily HLL sketches merged across days (re-aggregation property)",
              ("sketch", "events"), bench=True),
    QuerySpec("ev_value_quantiles", ev_value_quantiles, EV_VALUE_QUANTILES_SQL,
              "exact p50/p95/p99 per type from a fixed-precision histogram",
              ("sketch", "events")),
    QuerySpec("ev_value_mad", ev_value_mad, EV_VALUE_MAD_SQL,
              "median + MAD per type via two bounded bin passes (exact rank stats)",
              ("sketch", "events", "quality")),
    QuerySpec("ev_trimmed_mean", ev_trimmed_mean, EV_TRIMMED_MEAN_SQL,
              "10%-trimmed robust mean via exact bin-rank overlap arithmetic",
              ("sketch", "events", "quality")),
    QuerySpec("ev_value_deciles", ev_value_deciles, EV_VALUE_DECILES_SQL,
              "equi-depth within-type deciles assigned at the bin level "
              "(occupancy + exact bucket bounds)",
              ("sketch", "events", "quality")),
    QuerySpec("ev_value_quantiles_merged", ev_value_quantiles_merged,
              EV_VALUE_QUANTILES_MERGED_SQL,
              "daily histograms merged across days (same quantiles, re-aggregation)",
              ("sketch", "events"), bench=True),
    QuerySpec("ev_kmv_overlap_types", ev_kmv_overlap_types,
              EV_KMV_OVERLAP_TYPES_SQL,
              "KMV-sketch audience overlap between event types: union/"
              "Jaccard/intersection estimates vs exact",
              ("sketch", "events", "setops")),
]
