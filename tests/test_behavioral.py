"""Unit tests for behavioral operators (funnel / retention / sessionize)
on hand-built event frames with known answers."""

from __future__ import annotations

from datetime import datetime

import pytest

from consumer_loans_analysis_spark.operators import behavioral


def _ts(day: int, hour: int = 0, minute: int = 0, second: int = 0):
    return datetime(2024, 1, day, hour, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    # user 1: full ordered funnel, two sessions (gap > 30 min between e2/e3)
    # user 2: click BEFORE view (funnel must not count the click step)
    # user 3: view only; single 1-event session
    rows = [
        (1, 1, _ts(1, 9, 0), "view"),
        (2, 1, _ts(1, 9, 10), "click"),
        (3, 1, _ts(1, 11, 0), "purchase"),
        (4, 2, _ts(1, 8, 0), "click"),
        (5, 2, _ts(1, 9, 0), "view"),
        (6, 3, _ts(2, 9, 0), "view"),
    ]
    return spark.createDataFrame(
        rows, schema="event_id long, user_id long, ts timestamp, event_type string"
    )


def test_funnel_strict_order(events):
    got = {
        r["step"]: r["n_users"]
        for r in behavioral.funnel_steps(events, ["view", "click", "purchase"]).collect()
    }
    # user 2's click precedes their view → only user 1 converts past step 0
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_conversion_window(events):
    got = {
        r["step"]: r["n_users"]
        for r in behavioral.funnel_steps(
            events, ["view", "click", "purchase"], within_seconds=3600
        ).collect()
    }
    # user 1's purchase is 110 min after the click → outside a 1 h window
    assert got == {"view": 3, "click": 1, "purchase": 0}


def test_retention_cohorts(events):
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in behavioral.retention_cohorts(events).collect()
    }
    # users 1+2 first seen Jan 1 (active that day only), user 3 on Jan 2
    assert got == {("2024-01-01", 0): 2, ("2024-01-02", 0): 1}


def test_sessionize_gap_boundary(events):
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["duration_sec"])
        for r in behavioral.sessionize(events, gap_seconds=1800).collect()
    }
    assert got == {
        # user 1: events at 9:00/9:10 merge (10 min gap), 11:00 splits
        (1, 1): (2, 600.0),
        (1, 2): (1, 0.0),
        # user 2: 8:00 and 9:00 are separate sessions (60 min > 30 min)
        (2, 1): (1, 0.0),
        (2, 2): (1, 0.0),
        (3, 1): (1, 0.0),
    }


def test_sessionize_exact_gap_does_not_split(spark):
    # a gap of exactly gap_seconds stays within the session (strict >)
    df = spark.createDataFrame(
        [(1, 1, _ts(1, 9, 0, 0), "view"), (2, 1, _ts(1, 9, 30, 0), "view")],
        schema="event_id long, user_id long, ts timestamp, event_type string",
    )
    out = behavioral.sessionize(df, gap_seconds=1800).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2
