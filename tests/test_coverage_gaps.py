"""coverage_gaps (operators/health.py): exact missing days, per-group
spans, complete-coverage empty result, single-day groups."""

import datetime as dt

from pyspark.sql import functions as F

from data_validation_spark.operators.health import coverage_gaps

D0 = dt.datetime(2026, 3, 1, 12)


def _d(days):
    return D0 + dt.timedelta(days=days)


def test_gaps_are_exactly_the_missing_days(spark):
    rows = ([("a", _d(k)) for k in (0, 1, 4, 7)]        # gaps 2,3,5,6
            + [("b", _d(k)) for k in (2, 3)])           # contiguous
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = coverage_gaps(df, ["g"]).collect()
    got = sorted((r.g, r.gap_day.isoformat()) for r in out)
    assert got == [("a", "2026-03-0%d" % (3 + k)) for k in (0, 1, 3, 4)]
    assert all(r.span_start.isoformat() == "2026-03-01"
               and r.span_end.isoformat() == "2026-03-08"
               for r in out)


def test_spans_are_per_group_not_global(spark):
    # b's span is days 5..7 — day 0..4 (covered only by a) is NOT a
    # gap for b
    rows = [("a", _d(0)), ("a", _d(1)), ("b", _d(5)), ("b", _d(7))]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = sorted((r.g, r.gap_day.isoformat())
                 for r in coverage_gaps(df, ["g"]).collect())
    assert out == [("b", "2026-03-07")]


def test_complete_coverage_and_single_day(spark):
    rows = [("a", _d(0)), ("a", _d(1)), ("solo", _d(3))]
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    assert coverage_gaps(df, ["g"]).count() == 0


def test_multiple_group_cols(spark):
    rows = [("a", 1, _d(0)), ("a", 1, _d(2)), ("a", 2, _d(0)),
            ("a", 2, _d(1))]
    df = spark.createDataFrame(rows, "g string, sub long, ts timestamp")
    out = [(r.g, r.sub, r.gap_day.isoformat())
           for r in coverage_gaps(df, ["g", "sub"]).collect()]
    assert out == [("a", 1, "2026-03-02")]
