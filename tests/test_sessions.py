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


def test_tz_aware_timestamps_sessionize_on_absolute_instants(spark):
    """TIMESTAMP (non-NTZ) inputs carry absolute instants: two
    encodings of the SAME instants in different zones must produce
    identical sessions, regardless of the engine's UTC session tz."""
    from datetime import timedelta, timezone

    est = timezone(timedelta(hours=-5))
    cet = timezone(timedelta(hours=+1))
    utc = timezone.utc
    instants = [datetime(2026, 1, 10, 12, 0, tzinfo=utc),
                datetime(2026, 1, 10, 12, 20, tzinfo=utc),
                datetime(2026, 1, 10, 13, 30, tzinfo=utc)]
    frames = {}
    for name, tz in [("utc", utc), ("est", est), ("cet", cet)]:
        rows = [(i, t.astimezone(tz), 1, 1.0)
                for i, t in enumerate(instants)]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double")
        frames[name] = sorted(
            (r["event_id"], r["session_seq"])
            for r in sessionize(df, gap_minutes=30).collect())
    assert frames["utc"] == frames["est"] == frames["cet"]
    # gap rule on absolute time: 20-min gap joins, 70-min gap splits
    assert frames["utc"] == [(0, 1), (1, 1), (2, 2)]


def test_dst_spring_forward_gap_uses_absolute_time(spark):
    """Across a DST spring-forward, wall clocks jump an hour — the gap
    rule must use the absolute gap (59 min here), not the apparent
    2-hour wall-clock difference: split at gap=30, joined at gap=60."""
    from zoneinfo import ZoneInfo

    ny = ZoneInfo("America/New_York")
    rows = [(0, datetime(2026, 3, 8, 1, 30, tzinfo=ny), 1, 1.0),
            (1, datetime(2026, 3, 8, 3, 29, tzinfo=ny), 1, 1.0)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double")
    tight = {r["event_id"]: r["session_seq"]
             for r in sessionize(df, gap_minutes=30).collect()}
    loose = {r["event_id"]: r["session_seq"]
             for r in sessionize(df, gap_minutes=60).collect()}
    assert tight == {0: 1, 1: 2}
    assert loose == {0: 1, 1: 1}
    # and the summary's micros bounds reflect the 59-min absolute span
    s = session_summary(df, gap_minutes=60).collect()[0]
    assert s["end_us"] - s["start_us"] == 59 * 60 * 1_000_000


# ----------------------------------------------------- funnel_stages

def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, ty) for i, (u, t, ty) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string")


def test_funnel_order_matters(spark):
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    s = lambda k: t0 + dt.timedelta(seconds=k)  # noqa: E731
    rows = [
        # user 1: full ordered funnel (with noise between)
        (1, s(0), "view"), (1, s(1), "error"), (1, s(2), "click"),
        (1, s(3), "purchase"),
        # user 2: purchase BEFORE view/click — only reaches stage 1
        (2, s(0), "purchase"), (2, s(1), "view"), (2, s(2), "error"),
        # user 3: view then purchase, no click — stage 1
        (3, s(0), "view"), (3, s(1), "purchase"),
        # user 4: never enters
        (4, s(0), "error"),
    ]
    from data_validation_spark.operators.sessions import funnel_stages
    out = {r.user_id: r.stage for r in
           funnel_stages(_ev(spark, rows),
                         ["view", "click", "purchase"]).collect()}
    assert out == {1: 3, 2: 1, 3: 1, 4: 0}


def test_funnel_tie_break_deterministic(spark):
    """Same-timestamp events order by event_id — the click (lower id)
    counts before the purchase at the identical instant."""
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    rows = [(1, t0, "view"), (1, t0, "click"), (1, t0, "purchase")]
    from data_validation_spark.operators.sessions import funnel_stages
    out = funnel_stages(_ev(spark, rows),
                        ["view", "click", "purchase"]).collect()
    assert out[0].stage == 3


def test_funnel_empty_config(spark):
    import pytest as _pytest
    from data_validation_spark.operators.sessions import funnel_stages
    with _pytest.raises(ValueError):
        funnel_stages(_ev(spark, []), [])


def test_native_session_window_parity_with_composed(events, spark):
    """session_window_summary (Catalyst native state op) and
    session_summary (lag+cumsum composition) must agree row-for-row on
    bounds/counts/sums — including at the EXACT-gap boundary, where
    both keep the session open (break only when gap strictly
    exceeds)."""
    from datetime import datetime, timedelta
    from data_validation_spark.operators.sessions import (
        session_window_summary)
    t0 = datetime(2024, 6, 1)
    extra = spark.createDataFrame(
        [(100, t0, 9, 1.0),
         (101, t0 + timedelta(minutes=30), 9, 1.0),          # == gap
         (102, t0 + timedelta(minutes=60, seconds=1), 9, 1.0)],  # > gap
        "event_id long, ts timestamp, user_id long, value double")
    df = events.unionByName(extra)

    composed = {(r.user_id, r.start_us): (r.end_us, r.n_events, r.sum_value)
                for r in session_summary(df, gap_minutes=30).collect()}
    native = {(r.user_id, r.start_us): (r.end_us, r.n_events, r.sum_value)
              for r in session_window_summary(df, gap_minutes=30).collect()}
    assert native == composed
    # the exact-gap pair merged; the strictly-greater gap split
    assert sum(1 for (u, _) in native if u == 9) == 2


def test_event_transitions(spark):
    """Hand-computed transition matrix; ties break on event_id; each
    user's stream is independent (no cross-user transitions)."""
    from datetime import datetime, timedelta
    from data_validation_spark.operators.sessions import event_transitions
    t0 = datetime(2024, 3, 1)
    rows = [
        # user 1: a -> b -> a   user 2: a -> b  (no cross-user a<-b)
        (1, 1, t0, "a"), (2, 1, t0 + timedelta(1), "b"),
        (3, 1, t0 + timedelta(2), "a"),
        (4, 2, t0 + timedelta(3), "a"), (5, 2, t0 + timedelta(4), "b"),
        # user 3: same-ts tie -> event_id order decides: c -> d
        (6, 3, t0, "c"), (7, 3, t0, "d"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string")
    out = {(r.from_type, r.to_type): (r.n_transitions, r.n_from, r.p)
           for r in event_transitions(df).collect()}
    assert out == {("a", "b"): (2, 2, 1.0),
                   ("b", "a"): (1, 1, 1.0),
                   ("c", "d"): (1, 1, 1.0)}
