"""Time-series analytics operators (operators/timeseries.py): calendar
gap-fill, ordered funnels, cohort retention."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from python_mozetl_spark.operators.timeseries import (
    funnel_counts,
    gapfill_daily,
    retention_cohorts,
)

from tests.conftest import assert_df_equals


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour)


def _events(spark, rows):
    df = spark.createDataFrame(rows, "user_id int, ts timestamp_ntz, event_type string, value double")
    return df


def test_gapfill_fills_interior_days_with_zeros(spark):
    df = _events(
        spark,
        [
            (1, _ts(1), "view", 10.0),
            (1, _ts(1, 6), "view", 2.5),
            (1, _ts(4), "view", 1.0),  # 3-day gap: jan 2, jan 3 missing
            (2, _ts(10), "view", 5.0),  # single-day span: no fill
        ],
    )
    out = gapfill_daily(df, "user_id", "ts", "value")
    assert_df_equals(
        out.withColumn("day", F.date_format("day", "yyyy-MM-dd")),
        [
            {"user_id": 1, "day": "2024-01-01", "n_events": 2, "sum_value": 12.5},
            {"user_id": 1, "day": "2024-01-02", "n_events": 0, "sum_value": 0.0},
            {"user_id": 1, "day": "2024-01-03", "n_events": 0, "sum_value": 0.0},
            {"user_id": 1, "day": "2024-01-04", "n_events": 1, "sum_value": 1.0},
            {"user_id": 2, "day": "2024-01-10", "n_events": 1, "sum_value": 5.0},
        ],
    )


def test_funnel_requires_strict_order(spark):
    df = _events(
        spark,
        [
            # u1 completes all three in order
            (1, _ts(1), "view", 0.0),
            (1, _ts(2), "click", 0.0),
            (1, _ts(3), "purchase", 0.0),
            # u2: click BEFORE its first view -> stuck at step 1
            (2, _ts(2), "view", 0.0),
            (2, _ts(1), "click", 0.0),
            # u3: purchase without click -> stuck at step 1
            (3, _ts(1), "view", 0.0),
            (3, _ts(2), "purchase", 0.0),
            # u4: never viewed -> depth 0, counted nowhere
            (4, _ts(1), "click", 0.0),
            (4, _ts(2), "purchase", 0.0),
        ],
    )
    out = funnel_counts(df, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    assert_df_equals(
        out,
        [
            {"step_idx": 1, "step": "view", "n_users": 3},
            {"step_idx": 2, "step": "click", "n_users": 1},
            {"step_idx": 3, "step": "purchase", "n_users": 1},
        ],
    )


def test_funnel_equal_timestamps_do_not_advance(spark):
    # click at EXACTLY the first view's timestamp is not "strictly after"
    df = _events(
        spark,
        [
            (1, _ts(1), "view", 0.0),
            (1, _ts(1), "click", 0.0),
            # u2's click is later the same day -> advances
            (2, _ts(1), "view", 0.0),
            (2, _ts(1, 1), "click", 0.0),
        ],
    )
    out = funnel_counts(df, "user_id", "ts", "event_type", ["view", "click"])
    assert_df_equals(
        out,
        [
            {"step_idx": 1, "step": "view", "n_users": 2},
            {"step_idx": 2, "step": "click", "n_users": 1},
        ],
    )


def test_funnel_greedy_uses_earliest_match(spark):
    # first view at day 1; a click exists before it (ignored) and one
    # after it (matches); purchase only after the LATER view would fail
    # a non-greedy matcher but greedy-earliest still catches the one
    # after the click
    df = _events(
        spark,
        [
            (1, _ts(3), "view", 0.0),
            (1, _ts(1), "view", 0.0),
            (1, _ts(2), "click", 0.0),
            (1, _ts(4), "purchase", 0.0),
        ],
    )
    out = funnel_counts(df, "user_id", "ts", "event_type", ["view", "click", "purchase"])
    assert_df_equals(
        out,
        [
            {"step_idx": 1, "step": "view", "n_users": 1},
            {"step_idx": 2, "step": "click", "n_users": 1},
            {"step_idx": 3, "step": "purchase", "n_users": 1},
        ],
    )


def test_funnel_per_user_cap_keeps_earliest(spark):
    # 5 views then the click; cap=2 keeps the two earliest views per
    # level, which is all the greedy walk needs
    rows = [(1, _ts(1, h), "view", 0.0) for h in range(5)]
    rows.append((1, _ts(2), "click", 0.0))
    out = funnel_counts(
        _events(spark, rows),
        "user_id",
        "ts",
        "event_type",
        ["view", "click"],
        max_events_per_user=2,
    )
    assert_df_equals(
        out,
        [
            {"step_idx": 1, "step": "view", "n_users": 1},
            {"step_idx": 2, "step": "click", "n_users": 1},
        ],
    )


def test_retention_cohort_offsets(spark):
    # u1 first active week of Jan 1 (Mon), returns weeks +1 and +3
    # u2 first active week of Jan 8, returns week +1
    # u3 only active once
    df = _events(
        spark,
        [
            (1, _ts(2), "view", 0.0),   # week 2024-01-01
            (1, _ts(9), "view", 0.0),   # +1
            (1, _ts(22), "view", 0.0),  # +3
            (2, _ts(8), "view", 0.0),   # week 2024-01-08
            (2, _ts(16), "view", 0.0),  # +1
            (3, _ts(3), "view", 0.0),   # week 2024-01-01
        ],
    )
    out = retention_cohorts(df, "user_id", "ts").withColumn(
        "cohort_week", F.date_format("cohort_week", "yyyy-MM-dd")
    )
    assert_df_equals(
        out,
        [
            {"cohort_week": "2024-01-01", "week_offset": 0, "n_users": 2},
            {"cohort_week": "2024-01-01", "week_offset": 1, "n_users": 1},
            {"cohort_week": "2024-01-01", "week_offset": 3, "n_users": 1},
            {"cohort_week": "2024-01-08", "week_offset": 0, "n_users": 1},
            {"cohort_week": "2024-01-08", "week_offset": 1, "n_users": 1},
        ],
    )


def test_new_user_growth_counts_first_events_only(spark):
    from python_mozetl_spark.operators.timeseries import new_user_growth

    df = _events(
        spark,
        [
            (1, _ts(1), "view", 0.0),
            (1, _ts(5), "view", 0.0),   # not new on day 5
            (2, _ts(1), "view", 0.0),
            (3, _ts(3), "view", 0.0),
        ],
    )
    out = new_user_growth(df, "user_id", "ts").withColumn(
        "day", F.date_format("day", "yyyy-MM-dd")
    )
    assert_df_equals(
        out,
        [
            {"day": "2024-01-01", "n_new": 2, "cum_users": 2},
            {"day": "2024-01-03", "n_new": 1, "cum_users": 3},
        ],
    )


def test_rolling_zscore_flags_spike_only(spark):
    from python_mozetl_spark.operators.timeseries import rolling_zscore_anomalies

    rows = [(1, _ts(d), "view", 10.0) for d in range(1, 7)]
    rows.append((1, _ts(7), "view", 200.0))  # spike
    rows += [(2, _ts(d), "view", 10.0) for d in range(1, 8)]  # flat user
    out = rolling_zscore_anomalies(
        _events(spark, rows), "user_id", "ts", "value"
    ).withColumn("day", F.date_format("day", "yyyy-MM-dd"))
    got = out.collect()
    assert len(got) == 1
    r = got[0]
    assert r["user_id"] == 1 and r["day"] == "2024-01-07"
    # mu = 260/7, sd = stddev_samp of [10]*6+[200]
    import statistics

    vals = [10.0] * 6 + [200.0]
    z = (200.0 - statistics.mean(vals)) / statistics.stdev(vals)
    assert r["zscore"] == pytest.approx(round(z, 6), abs=1e-6)


def test_event_multi_rollup_lattice_consistency(spark):
    from python_mozetl_spark.plans.queries import REGISTRY

    out = REGISTRY["event_multi_rollup"].build(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    grains = {}
    for r in rows:
        grains.setdefault(r["grain"], []).append(r)
    assert set(grains) == {"hour", "day", "week"}
    n_hour = sum(r["n_events"] for r in grains["hour"])
    n_day = sum(r["n_events"] for r in grains["day"])
    n_week = sum(r["n_events"] for r in grains["week"])
    assert n_hour == n_day == n_week  # every grain partitions the stream
    # buckets are unique within a grain
    for g, rs in grains.items():
        assert len({r["bucket"] for r in rs}) == len(rs)
