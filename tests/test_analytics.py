"""Product-analytics plan semantics on constructed fixtures.

The parity suite certifies these queries against DuckDB on the
synthetic corpus; the fixtures here pin the SEMANTIC edges the corpus
may not exercise (CEP negation/within/tie rules, overlap behavior).
"""

from __future__ import annotations

import datetime as dt

from flink_tank_spark.plans.analytics import ev_cep_match


def _write_events(spark, path, rows):
    # (event_id, ts, user_id, event_type) padded to the events schema
    t0 = dt.datetime(2024, 1, 1)
    full = [
        (eid, t0 + dt.timedelta(minutes=m), uid, et, 1.0, "{}")
        for eid, m, uid, et in rows
    ]
    spark.createDataFrame(
        full, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_cep_match_negation_within_tie_and_overlap(spark, tmp_path):
    rows = [
        # user 1: clean match 10 min after signup
        (10, 0, 1, "signup"), (11, 10, 1, "purchase"),
        # user 2: error strictly between -> negation rejects
        (20, 0, 2, "signup"), (21, 5, 2, "error"), (22, 10, 2, "purchase"),
        # user 3: purchase outside the 1 h window -> within rejects
        (30, 0, 3, "signup"), (31, 120, 3, "purchase"),
        # user 4: error at EXACTLY the purchase ts -> tie rule rejects
        (40, 0, 4, "signup"), (41, 10, 4, "error"), (42, 10, 4, "purchase"),
        # user 5: two open signups closed by one purchase -> both match
        (50, 0, 5, "signup"), (51, 1, 5, "signup"), (52, 30, 5, "purchase"),
        # user 6: purchase BEFORE the signup only -> no match
        (60, 0, 6, "purchase"), (61, 1, 6, "signup"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        (r.user_id, r.signup_event_id)
        for r in ev_cep_match(spark, str(tmp_path)).collect()
    }
    assert got == {(1, 10), (5, 50), (5, 51)}


# --------------------------------------------------------------------------
# ev_value_outliers — exact z-score semantics
# --------------------------------------------------------------------------

def _write_valued_events(spark, path, vals, day=1):
    t0 = dt.datetime(2024, 1, day)
    full = [
        (i, t0 + dt.timedelta(minutes=i), i, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        full, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_value_outliers_flags_exactly_the_3sigma_points(spark, tmp_path):
    from flink_tank_spark.plans.analytics import ev_value_outliers

    # 20 values at 10.0 plus one wild point: mean≈14.3, the 100.0 sits
    # far beyond 3σ while the 10.0s sit well inside.
    vals = [10.0] * 20 + [100.0]
    _write_valued_events(spark, str(tmp_path), vals)
    rows = ev_value_outliers(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["n_events"], r["n_out3"]) == (21, 1)
    # numpy cross-check of the max z² (population σ), scaled to ppm
    import numpy as np

    v = np.array(vals)
    z2 = ((v - v.mean()) ** 2 / v.var()).max()
    assert abs(r["z2_max_ppm"] / 1e6 - z2) < 1e-3


def test_value_outliers_constant_group_has_no_outliers(spark, tmp_path):
    from flink_tank_spark.plans.analytics import ev_value_outliers

    _write_valued_events(spark, str(tmp_path), [5.0] * 10)
    r = ev_value_outliers(spark, str(tmp_path)).collect()[0]
    # zero variance: nothing beyond 3σ, z² guard yields 0 (no div-by-zero)
    assert (r["n_events"], r["n_out3"], r["z2_max_ppm"]) == (10, 0, 0)


def test_daily_trend_matches_numpy_ols(spark, tmp_path):
    """A type with linearly growing daily volume vs a flat one: slopes
    equal numpy's polyfit to float precision; the flat type is ~0."""
    import datetime as dt

    import numpy as np

    from flink_tank_spark.plans.analytics import ev_daily_trend

    rows, eid = [], 0
    t0 = dt.datetime(2024, 1, 1)
    for d in range(10):
        for _ in range(5 + 3 * d):  # growing: y = 5 + 3d
            rows.append((eid, t0 + dt.timedelta(days=d), eid, "grow", 1.0, "{}"))
            eid += 1
        for _ in range(7):  # flat
            rows.append((eid, t0 + dt.timedelta(days=d), eid, "flat", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {r["event_type"]: r for r in ev_daily_trend(spark, str(tmp_path)).collect()}
    x = np.arange(10)
    slope_grow = np.polyfit(x, 5 + 3 * x, 1)[0]
    assert abs(got["grow"]["slope"] - slope_grow) < 1e-9
    assert got["grow"]["slope"] == 3.0
    assert got["flat"]["slope"] == 0.0
    assert got["flat"]["avg_daily"] == 7.0
    assert got["grow"]["n_days"] == 10
