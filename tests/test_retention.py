"""Hand-computed fixtures for cohort retention and conversion funnel."""

from __future__ import annotations

import pandas as pd


def _write_events(tmp_path, rows):
    pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime([r[1] for r in rows]),
            "user_id": [r[0] for r in rows],
            "event_type": [r[2] for r in rows],
            "value": [0.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    ).to_parquet(tmp_path / "events.parquet")


def test_retention_triangle(spark, tmp_path):
    # u1: cohort Jan, active Jan+Feb; u2: cohort Jan, active Jan only;
    # u3: cohort Feb, active Feb+Mar
    _write_events(
        tmp_path,
        [
            (1, "2024-01-05", "view"),
            (1, "2024-02-10", "view"),
            (2, "2024-01-20", "view"),
            (3, "2024-02-01", "view"),
            (3, "2024-03-15", "view"),
        ],
    )
    from geostore_spark.operators.retention import q_retention

    got = {
        (r["cohort_m"], r["months_since"]): r["active_users"]
        for r in q_retention(spark, str(tmp_path)).collect()
    }
    jan, feb = 2024 * 12 + 1, 2024 * 12 + 2
    assert got == {(jan, 0): 2, (jan, 1): 1, (feb, 0): 1, (feb, 1): 1}


def test_funnel_counts_only_post_signup_purchases(spark, tmp_path):
    # u1 converts in 2 days; u2 purchased only BEFORE signup (no convert);
    # u3 never signed up; u4 converts same day
    _write_events(
        tmp_path,
        [
            (1, "2024-01-01 00:00:00", "signup"),
            (1, "2024-01-03 00:00:00", "purchase"),
            (2, "2024-01-01 00:00:00", "purchase"),
            (2, "2024-01-02 00:00:00", "signup"),
            (3, "2024-01-01 00:00:00", "purchase"),
            (4, "2024-01-05 06:00:00", "signup"),
            (4, "2024-01-05 18:00:00", "purchase"),
        ],
    )
    from geostore_spark.operators.retention import q_funnel

    got = {
        r["days_to_convert"]: r["conversions"]
        for r in q_funnel(spark, str(tmp_path)).collect()
    }
    assert got == {0: 1, 2: 1}
