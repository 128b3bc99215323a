"""HLL sketch operator properties (operators/sketch.py, plans/sketches.py).

The oracle gate proves cross-engine determinism; these tests pin the
sketch-algebra properties the gate can't see: merge associativity
(daily-merged == direct, bit-exact) and the accuracy envelope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_tank_spark.operators import sketch
from flink_tank_spark.plans.sketches import (
    _user_day_events,
    ev_hll_merge_days,
    ev_hll_user_days,
)


def test_merge_equals_direct_bit_exact(spark, sf_dir):
    """Union-of-daily-sketches then estimate == estimate of one pass.
    Must hold EXACTLY (not approximately): max-merge is associative and
    the estimator is order-free fixed-point — this is what makes daily
    sketch tables answerable without rescanning history.

    Pinned at the OPERATOR level (hll_registers/hll_estimate built
    independently here), because the two registry queries now share one
    per-(day, type) register stage — comparing them would be a tautology.
    This test is exactly the property that makes that sharing sound."""
    ev = _user_day_events(spark, sf_dir)
    direct = {
        r["event_type"]: (r["n_reg_set"], r["hll_est"])
        for r in sketch.hll_estimate(
            sketch.hll_registers(ev, "user_day", ["event_type"]), ["event_type"]
        ).collect()
    }
    merged = {
        r["event_type"]: (r["n_reg_set"], r["hll_est"])
        for r in sketch.hll_estimate(
            sketch.hll_registers(ev, "user_day", ["day", "event_type"]),
            ["event_type"],
        ).collect()
    }
    assert direct.keys() == merged.keys()
    for et in direct:
        assert direct[et] == merged[et], et  # bit-identical, == on floats
    # and the registry pair serves exactly these values
    q = {r["event_type"]: (r["n_reg_set"], r["hll_est"])
         for r in ev_hll_merge_days(spark, sf_dir).collect()}
    assert q == merged
    q2 = {r["event_type"]: (r["n_reg_set"], r["hll_est"])
          for r in ev_hll_user_days(spark, sf_dir)
          .select("event_type", "n_reg_set", "hll_est").collect()}
    assert q2 == merged


def test_estimate_error_envelope(spark, oracle_sf_dir):
    """Relative error within the HLL envelope. m=256 ⇒ ~6.5% std error;
    assert 4 sigma. Uses sf0.01 where per-type cardinality (~1500) is
    above the small-range regime the estimator (deliberately, see
    operators/sketch.py docstring) doesn't correct for."""
    rows = ev_hll_user_days(spark, oracle_sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_exact"] > 640, "fixture regressed into small-range regime"
        rel = abs(r["hll_est"] - r["n_exact"]) / r["n_exact"]
        assert rel < 0.26, (r["event_type"], r["hll_est"], r["n_exact"])


def test_registers_bounded_and_mergeable_shape(spark, sf_dir):
    """The sketch is ≤ 256 rows per group with rho in [1, 49] — the
    bounded-size property that makes the shuffle O(groups), not O(keys)."""
    ev = _user_day_events(spark, sf_dir)
    regs = sketch.hll_registers(ev, "user_day", ["event_type"])
    per_group = regs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rho").alias("lo"),
        F.max("rho").alias("hi"),
        F.countDistinct("register").alias("nr"),
    )
    for r in per_group.collect():
        assert r["n"] <= 256 and r["n"] == r["nr"]
        assert 1 <= r["lo"] <= r["hi"] <= 49


def test_partitioning_invariance(spark, sf_dir):
    """Same estimate under adversarial repartitioning — the fixed-point
    register sum is the reason (no float reordering effects)."""
    ev = _user_day_events(spark, sf_dir)
    base = sketch.hll_distinct(ev, "user_day", ["event_type"]).collect()
    shuffled = sketch.hll_distinct(
        ev.repartition(17, "user_day"), "user_day", ["event_type"]
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_histogram_quantiles_exact_for_two_decimal_data(spark):
    """events.value-style 2-decimal data: floor(x*100+0.5) binning is
    lossless, so the sketch quantile equals the brute-force lower
    quantile (smallest v with rank >= ceil(q*N))."""
    import math

    vals = [round(0.01 * v, 2) for v in (5, 5, 7, 11, 11, 11, 42, 99, 100, 250)]
    df = spark.createDataFrame([("a", v) for v in vals], ["g", "value"])
    hist = sketch.fp_histogram(df, "value", ["g"])
    got = sketch.histogram_quantiles(hist, ["g"], qs=(0.5, 0.9)).collect()[0]
    sv = sorted(vals)
    assert got["p50"] == sv[math.ceil(0.5 * len(sv)) - 1] == 0.11
    assert got["p90"] == sv[math.ceil(0.9 * len(sv)) - 1] == 1.00


def test_histogram_merge_identity(spark, sf_dir):
    """Union of per-day histograms re-aggregated == direct histogram:
    the property that lets daily sketch tables answer all-time quantile
    questions. Bit-identical, not approximately equal."""
    from flink_tank_spark.io.tables import load_table

    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    direct = sketch.histogram_quantiles(
        sketch.fp_histogram(ev, "value", ["event_type"]), ["event_type"]
    ).collect()
    daily = sketch.fp_histogram(ev, "value", ["day", "event_type"]).drop("day")
    merged = sketch.histogram_quantiles(daily, ["event_type"]).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, merged))


def test_histogram_is_bounded(spark):
    """The histogram table is O(groups x distinct bins), not O(rows) —
    the bounded-size property that makes it a sketch: 10k rows over 100
    distinct cent values collapse to exactly 100 rows per group."""
    df = spark.createDataFrame(
        [("g", round(0.01 * (i % 100), 2)) for i in range(10_000)], ["g", "value"]
    )
    assert sketch.fp_histogram(df, "value", ["g"]).count() == 100


def test_cms_estimate_never_undercounts(spark, sf_dir):
    """Count-Min's one-sided guarantee: estimate >= exact for EVERY key
    (collisions only add), and the counter table is bounded at d x w
    cells no matter the input size."""
    from flink_tank_spark.io.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k")
    )
    counters = sketch.cms_counters(ev, "k")
    assert counters.count() <= sketch.CMS_DEPTH * sketch.CMS_WIDTH
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("n_exact"))
    est = sketch.cms_estimate(counters, exact.select("k"), "k")
    joined = exact.join(est, "k").collect()
    assert len(joined) == exact.count()
    assert all(r.cms_est >= r.n_exact for r in joined)


def test_cms_merge_by_sum_equals_direct(spark, sf_dir):
    """Sketch-merge property: per-day counter tables summed cell-wise
    (cms_counters(group_cols=['day']) + cms_merge) give BIT-identical
    counters to one direct pass — the property that lets daily sketches
    answer all-time frequency questions."""
    from flink_tank_spark.io.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), F.col("user_id").cast("string").alias("k")
    )
    direct = sketch.cms_counters(ev, "k")
    merged = sketch.cms_merge(
        sketch.cms_counters(ev, "k", group_cols=["day"])
    )
    assert sorted(map(tuple, direct.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_cms_error_bound_sweep(spark, oracle_sf_dir):
    """The CMS accuracy envelope as a checked property across
    width/depth settings, directly and under merge-by-sum of daily
    sketches: for EVERY key, estimate >= exact (one-sided, structural)
    and overcount <= e*N/w (the Cormode-Muthukrishnan eps = e/width
    bound; probabilistic per random key, but deterministic — hence
    pinnable — on this fixed corpus + md5). Merged-daily estimates must
    equal direct estimates BIT-exactly at every setting (counting is
    additive)."""
    import math

    from flink_tank_spark.io.tables import load_table

    ev = load_table(spark, oracle_sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        F.col("user_id").cast("string").alias("k"),
    )
    n_total = ev.count()
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("n_exact"))
    for d, w in [(2, 16), (4, 256), (8, 256), (4, 4096), (2, 65536)]:
        direct = sketch.cms_counters(ev, "k", d=d, w=w)
        assert direct.count() <= d * w
        est = sketch.cms_estimate(direct, exact.select("k"), "k", d=d, w=w)
        rows = exact.join(est, "k").collect()
        assert len(rows) == exact.count(), (d, w)
        bound = math.e * n_total / w
        for r in rows:
            assert r.cms_est >= r.n_exact, (d, w, r)
            assert r.cms_est - r.n_exact <= bound, (d, w, r, bound)
        merged = sketch.cms_merge(
            sketch.cms_counters(ev, "k", d=d, w=w, group_cols=["day"])
        )
        m_est = {
            r.k: r.cms_est
            for r in sketch.cms_estimate(
                merged, exact.select("k"), "k", d=d, w=w
            ).collect()
        }
        assert m_est == {r.k: r.cms_est for r in rows}, (d, w)


def test_cms_rejects_invalid_shapes(spark):
    """Width must be a power of 16 (a whole number of md5 hex chars per
    row) and d rows of nhex chars must fit md5's 32 — both misuses fail
    loudly instead of silently mis-hashing."""
    import pytest

    df = spark.range(3).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="width"):
        sketch.cms_counters(df, "k", w=100)
    with pytest.raises(ValueError, match="32"):
        sketch.cms_counters(df, "k", d=20, w=4096)


def test_kmv_merge_equals_direct_and_salt_invariant(spark, sf_dir):
    """The KMV sketch of a union equals the k-smallest merge of the
    per-part sketches (re-aggregation, like every sketch here), and the
    salted two-phase build is invariant to the salt count."""
    from flink_tank_spark.io.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("k"),
        F.to_date("ts").alias("day"),
    )
    direct = {
        tuple(r.ks)
        for r in sketch.kmv_sketch(ev, "k", [], k=16).collect()
    }
    daily = sketch.kmv_sketch(ev, "k", ["day"], k=16)
    merged = {
        tuple(r.ks)
        for r in daily.select(F.explode("ks").alias("h"))
        .distinct()
        .agg(F.slice(F.array_sort(F.collect_list("h")), 1, 16).alias("ks"))
        .collect()
    }
    assert direct == merged
    for n_salts in (1, 7, 64):
        alt = {
            tuple(r.ks)
            for r in sketch.kmv_sketch(ev, "k", [], k=16, n_salts=n_salts)
            .collect()
        }
        assert alt == direct, n_salts


def test_kmv_estimates_track_exact(spark, oracle_sf_dir):
    """Distinct / Jaccard / intersection estimates land within the
    standard KMV envelope (~1/sqrt(k)) of the exact values on the real
    per-type user-day sets."""
    from flink_tank_spark.plans.sketches import ev_kmv_overlap_types

    rows = ev_kmv_overlap_types(spark, oracle_sf_dir).collect()
    assert len(rows) == 10  # 5 types -> 10 pairs
    for r in rows:
        assert abs(r.kmv_jaccard_est - r.jaccard_exact) <= 0.15, r
        assert r.kmv_inter_est == r.kmv_jaccard_est * r.kmv_union_est, r
        assert abs(r.kmv_inter_est - r.n_inter_exact) / r.n_inter_exact <= 0.5, r


# --------------------------------------------------------------------------
# ev_value_deciles — equi-depth discretization semantics
# --------------------------------------------------------------------------

def test_value_deciles_fixture_semantics(spark, tmp_path):
    """1..100 at two decimals: deciles are exactly 10 buckets of 10 with
    contiguous, non-overlapping bounds."""
    import datetime as dt

    from flink_tank_spark.plans.sketches import ev_value_deciles

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0, i, "click", float(i), "{}") for i in range(1, 101)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = ev_value_deciles(spark, str(tmp_path)).collect()
    assert [r["decile"] for r in got] == list(range(1, 11))
    assert all(r["n_events"] == 10 for r in got)
    # contiguous non-overlapping coverage: 1-10, 11-20, ..., 91-100
    for i, r in enumerate(got):
        assert (r["lo"], r["hi"]) == (10.0 * i + 1.0, 10.0 * (i + 1))


def test_value_deciles_corpus_equal_depth(spark, sf_dir):
    """On the real corpus each within-type decile holds n/10 rows up to
    bin granularity (ties share a bin, so deviation is bounded by the
    largest single bin's count)."""
    from pyspark.sql import functions as F

    from flink_tank_spark.io.tables import load_table
    from flink_tank_spark.operators.sketch import fp_histogram
    from flink_tank_spark.plans.sketches import ev_value_deciles

    ev = load_table(spark, sf_dir, "events")
    got = ev_value_deciles(spark, sf_dir).collect()
    per_type = {}
    for r in got:
        per_type.setdefault(r["event_type"], []).append(r["n_events"])
    max_bin = {
        r["event_type"]: r["m"]
        for r in fp_histogram(ev, "value", ["event_type"])
        .groupBy("event_type").agg(F.max("n").alias("m"))
        .collect()
    }
    for et, counts in per_type.items():
        total = sum(counts)
        assert len(counts) == 10
        for c in counts:
            assert abs(c - total / 10) <= max_bin[et] + 1


def test_trimmed_mean_fixture_semantics(spark, tmp_path):
    """1..100 plus two wild outliers: the 10%-trimmed mean drops the
    bottom/top 5% by rank (including the outliers) and equals the
    arithmetic mean of the kept middle — cross-checked against a plain
    Python trim of the sorted values."""
    import datetime as dt

    from flink_tank_spark.plans.sketches import ev_trimmed_mean

    vals = [float(i) for i in range(1, 101)] + [10000.0, 20000.0]
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i, "click", v, "{}") for i, v in enumerate(vals)]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = ev_trimmed_mean(spark, str(tmp_path)).collect()[0]
    n = len(vals)
    lo, hi = n // 20, (n * 19) // 20  # kept ranks (lo, hi]
    kept = sorted(vals)[lo:hi]
    assert r["n_kept"] == len(kept)
    assert abs(r["trimmed_mean"] - sum(kept) / len(kept)) < 1e-9
    # the outliers moved the plain mean but not the trimmed one
    assert abs(sum(vals) / n - r["trimmed_mean"]) > 1.0


def test_value_mad_fixture_semantics(spark, tmp_path):
    """Known values: median and MAD equal the numpy rank statistics
    (lower median convention), and MAD ignores the wild outlier."""
    import datetime as dt

    import numpy as np

    from flink_tank_spark.plans.sketches import ev_value_mad

    vals = [1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 100.0]
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, i, "click", v, "{}") for i, v in enumerate(vals)]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    r = ev_value_mad(spark, str(tmp_path)).collect()[0]
    v = np.array(vals)
    med = np.sort(v)[(len(v) - 1) // 2]  # lower median (odd n: the middle)
    mad = np.sort(np.abs(v - med))[(len(v) - 1) // 2]
    assert r["n_events"] == len(vals)
    assert r["median"] == med == 3.0
    assert r["mad"] == mad == 1.0  # the 100.0 cannot move it
