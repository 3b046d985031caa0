"""Gap-based sessionization: hand-computed session boundaries, shuffle
count, and determinism under duplicate timestamps."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.sessions import (
    session_summary,
    sessionize,
)


@pytest.fixture(scope="module")
def events(spark):
    t = lambda m: datetime(2024, 1, 1, m // 60, m % 60)
    rows = [
        # user 1: events at 0, 10, 20 min (one session), then 60 (new)
        (0, t(0), 1, 1.0), (1, t(10), 1, 2.0), (2, t(20), 1, 3.0),
        (3, t(60), 1, 4.0),
        # user 2: single event
        (4, t(5), 2, 5.0),
        # user 3: duplicate timestamps — tie broken by event_id
        (5, t(0), 3, 1.0), (6, t(0), 3, 1.0), (7, t(59), 3, 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")


def test_session_assignment(events):
    s = {(r["user_id"], r["event_id"]): r["session_seq"]
         for r in sessionize(events, gap_minutes=30).collect()}
    assert s[(1, 0)] == s[(1, 1)] == s[(1, 2)] == 1
    assert s[(1, 3)] == 2                      # 40-min gap → new session
    assert s[(2, 4)] == 1
    assert s[(3, 5)] == s[(3, 6)] == 1
    assert s[(3, 7)] == 2                      # 59-min gap → new session


def test_session_summary_values(events):
    out = {(r["user_id"], r["session_seq"]): r
           for r in session_summary(events, gap_minutes=30).collect()}
    r = out[(1, 1)]
    assert r["n_events"] == 3 and r["sum_value"] == 6.0
    assert r["end_us"] - r["start_us"] == 20 * 60 * 1_000_000
    assert out[(1, 2)]["n_events"] == 1
    assert len(out) == 5


def test_single_shuffle(events):
    """The summary agg must reuse the window's user partitioning —
    exactly one Exchange in the physical plan."""
    plan = session_summary(events)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1
