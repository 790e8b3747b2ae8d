"""Z-score and histogram arithmetic on hand-checked fixtures."""

from __future__ import annotations

import math

import pandas as pd

from geostore_spark.operators.stats import stats_histogram, stats_zscore


def test_zscore_profile(spark, tmp_path):
    vals = [10.0] * 98 + [10.0 + 5.0, 10.0 - 5.0]  # symmetric spikes
    pd.DataFrame(
        {
            "event_id": range(100),
            "ts": pd.to_datetime(["2024-01-01"] * 100),
            "user_id": [1] * 100,
            "event_type": ["a"] * 100,
            "value": vals,
            "props": ["{}"] * 100,
        }
    ).to_parquet(tmp_path / "events.parquet")
    row = stats_zscore(spark, str(tmp_path)).collect()[0]
    assert row["n"] == 100 and row["mean"] == 10.0
    # std = sqrt(50/100); spikes sit at |z| = 5/std ≈ 7.07 -> both outliers
    assert math.isclose(row["std"], math.sqrt(0.5), rel_tol=1e-12)
    assert row["n_outliers"] == 2
    assert math.isclose(row["z_max"], 5 / math.sqrt(0.5), rel_tol=1e-12)
    assert math.isclose(row["z_min"], -row["z_max"], rel_tol=1e-12)


def test_zscore_constant_group_has_no_outliers(spark, tmp_path):
    pd.DataFrame(
        {
            "event_id": range(10),
            "ts": pd.to_datetime(["2024-01-01"] * 10),
            "user_id": [1] * 10,
            "event_type": ["c"] * 10,
            "value": [7.0] * 10,
            "props": ["{}"] * 10,
        }
    ).to_parquet(tmp_path / "events.parquet")
    row = stats_zscore(spark, str(tmp_path)).collect()[0]
    assert row["std"] == 0.0 and row["n_outliers"] == 0
    assert row["z_min"] is None and row["z_max"] is None  # z undefined, not inf


def test_histogram_buckets(spark, tmp_path):
    # values 0..99 over 20 buckets of width 4.95: 5 per bucket, max clamps
    pd.DataFrame(
        {
            "l_orderkey": range(100),
            "l_partkey": [1] * 100,
            "l_suppkey": [1] * 100,
            "l_linenumber": [1] * 100,
            "l_quantity": [1.0] * 100,
            "l_extendedprice": [float(i) for i in range(100)],
            "l_discount": [0.0] * 100,
            "l_tax": [0.0] * 100,
            "l_returnflag": ["N"] * 100,
            "l_linestatus": ["O"] * 100,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * 100),
        }
    ).to_parquet(tmp_path / "lineitem.parquet")
    rows = stats_histogram(spark, str(tmp_path)).collect()
    assert [r["bucket"] for r in rows] == list(range(20))
    assert sum(r["cnt"] for r in rows) == 100
    assert rows[0]["bucket_lo"] == 0.0
    assert all(r["cnt"] == 5 for r in rows)


def test_corr_perfectly_linear(spark, tmp_path):
    # value == hour-of-day -> quantized x = 1000*y: r = 1, slope = 1000
    hours = list(range(24)) * 3
    pd.DataFrame(
        {
            "event_id": range(len(hours)),
            "ts": pd.to_datetime([f"2024-01-01 {h:02d}:00:00" for h in hours]),
            "user_id": [1] * len(hours),
            "event_type": ["a"] * len(hours),
            "value": [float(h) for h in hours],
            "props": ["{}"] * len(hours),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from geostore_spark.operators.stats import stats_corr

    row = stats_corr(spark, str(tmp_path)).collect()[0]
    assert math.isclose(row["r"], 1.0, rel_tol=1e-12)
    assert math.isclose(row["beta_vs_hour"], 1000.0, rel_tol=1e-12)


def test_attribution_buckets(spark, tmp_path):
    # u1: click 30min before purchase (within_1h); u2: view 2h before
    # purchase (within_1d); u3: purchase with no prior touch (none);
    # u4's error event must not count as a touch
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click"),
        (2, "2024-01-01 10:30:00", 1, "purchase"),
        (3, "2024-01-01 08:00:00", 2, "view"),
        (4, "2024-01-01 10:00:00", 2, "purchase"),
        (5, "2024-01-01 09:00:00", 3, "purchase"),
        (6, "2024-01-01 09:00:00", 4, "error"),
        (7, "2024-01-01 09:30:00", 4, "purchase"),
    ]
    pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")
    from geostore_spark.operators.windows import win_attribution

    got = {
        r["touch_bucket"]: (r["purchases"], r["sum_latency_us"])
        for r in win_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {
        "within_1h": (1, 1_800_000_000),
        "within_1d": (1, 7_200_000_000),
        "none": (2, 0),
    }


def test_event_gap_hand_computed(spark, tmp_path):
    pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:00:10", "2024-01-01 00:00:30"]
            ),
            "user_id": [1, 1, 1],
            "event_type": ["a", "a", "a"],
            "value": [0.0, 0.0, 0.0],
            "props": ["{}"] * 3,
        }
    ).to_parquet(tmp_path / "events.parquet")
    from geostore_spark.operators.windows import win_event_gap

    row = win_event_gap(spark, str(tmp_path)).collect()[0]
    assert row["n_gaps"] == 2
    assert row["max_gap_us"] == 20_000_000
    assert math.isclose(row["avg_gap_s"], 15.0, rel_tol=1e-12)



def test_theil_sen_selection_tiers_agree(spark):
    """The histogram k-th selection and the two-phase rank fallback
    must pick the SAME median pair (dispatch never changes the
    answer); the degenerate guard (winner bucket too big) routes to
    the rank path."""
    from geostore_spark.operators import stats as st

    sf = "/root/testdata/sf0.001"
    fast = [tuple(r) for r in st.stats_theil_sen(spark, sf).collect()]
    orig = st.TS_WINNER_MAX
    try:
        st.TS_WINNER_MAX = 0  # every bucket 'too big' -> rank fallback
        slow = [tuple(r) for r in st.stats_theil_sen(spark, sf).collect()]
    finally:
        st.TS_WINNER_MAX = orig
    assert fast == slow
    assert len(fast) == 1 and fast[0][0] > 0
