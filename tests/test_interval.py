"""Interval containment join (operators/interval.py): exact boundary
semantics, bin-width invariance, multi-bin spans, degenerate and
inverted intervals, the span-cap guard, and plan shape (equi-join,
no nested-loop)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from data_validation_spark.operators.interval import interval_join

T0 = dt.datetime(2026, 1, 1)
US = 1_000_000


def _s(k):
    return T0 + dt.timedelta(seconds=k)


@pytest.fixture()
def frames(spark):
    points = spark.createDataFrame(
        [(1, 1, _s(0)), (2, 1, _s(5)), (3, 1, _s(10)), (4, 1, _s(11)),
         (5, 2, _s(5)), (6, 3, _s(5))],
        "pid long, key long, ts timestamp")
    intervals = spark.createDataFrame(
        [(10, 1, _s(0), _s(10)),     # [0, 10] — catches 0, 5, 10
         (11, 1, _s(4), _s(6)),      # [4, 6]  — catches 5
         (12, 2, _s(6), _s(9)),      # starts after the key-2 point
         (13, 2, _s(5), _s(5)),      # degenerate [5, 5] — exact hit
         (14, 2, _s(9), _s(3))],     # inverted — matches nothing
        "iid long, key long, start timestamp, end timestamp")
    return points, intervals


def _pairs(out):
    return sorted((r.pid, r.iid) for r in out.collect())

EXPECTED = [(1, 10), (2, 10), (2, 11), (3, 10), (5, 13)]


def test_containment_inclusive_both_ends(spark, frames):
    points, intervals = frames
    out = interval_join(points, intervals, ["key"], bin_width_us=4 * US)
    assert _pairs(out) == EXPECTED
    # output carries point cols + non-key interval cols
    assert set(out.columns) == {"pid", "key", "ts", "iid", "start", "end"}


@pytest.mark.parametrize("w", [1, 3, 7, 10, 60])
def test_bin_width_invariance(spark, frames, w):
    """Result is a pure function of the data — any bin width agrees."""
    points, intervals = frames
    out = interval_join(points, intervals, ["key"], bin_width_us=w * US)
    assert _pairs(out) == EXPECTED


def test_no_duplicate_pairs_on_multi_bin_interval(spark, frames):
    """An interval spanning many bins still emits each pair once —
    the point sits in exactly one bin."""
    points, intervals = frames
    out = interval_join(points, intervals, ["key"], bin_width_us=US)
    pairs = _pairs(out)
    assert pairs == EXPECTED and len(pairs) == len(set(pairs))


def test_span_cap_raises_loud(spark, frames):
    points, intervals = frames
    with pytest.raises(Exception, match="interval_join: interval spans"):
        interval_join(points, intervals, ["key"], bin_width_us=US,
                      max_span_bins=4).collect()


def test_name_collision_suffixed(spark):
    points = spark.createDataFrame([(1, 1, _s(5))],
                                   "pid long, key long, ts timestamp")
    ivs = spark.createDataFrame([(9, 1, _s(0), _s(10), "x")],
                                "pid long, key long, start timestamp, "
                                "end timestamp, label string")
    out = interval_join(points, ivs, ["key"])
    assert set(out.columns) == {"pid", "key", "ts", "pid_iv", "start",
                                "end", "label"}
    r = out.collect()[0]
    assert (r.pid, r.pid_iv, r.label) == (1, 9, "x")


def test_plan_is_equi_join_not_nested_loop(spark, frames):
    points, intervals = frames
    plan = (interval_join(points, intervals, ["key"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


# -- merge_intervals ----------------------------------------------------------

def test_merge_intervals_overlap_touch_gap(spark):
    from data_validation_spark.operators.interval import merge_intervals
    rows = [("u", 0, 10), ("u", 5, 20),    # overlap -> [0,20]
            ("u", 20, 30),                 # touch  -> [0,30]
            ("u", 31, 40),                 # gap    -> new span
            ("v", 100, 200)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = sorted(((r.k, r.span_start, r.span_end, r.n_intervals)
                  for r in merge_intervals(df, ["k"], "s", "e")
                  .collect()))
    assert out == [("u", 0, 30, 3), ("u", 31, 40, 1),
                   ("v", 100, 200, 1)]


def test_merge_intervals_contained_and_duplicate(spark):
    from data_validation_spark.operators.interval import merge_intervals
    rows = [("u", 0, 100), ("u", 10, 20), ("u", 10, 20), ("u", 0, 100)]
    df = spark.createDataFrame(rows, "k string, s long, e long")
    out = merge_intervals(df, ["k"], "s", "e").collect()
    assert [(r.span_start, r.span_end, r.n_intervals)
            for r in out] == [(0, 100, 4)]


def test_merge_intervals_single_exchange(spark):
    from data_validation_spark.operators.interval import merge_intervals
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("s"),
        (F.col("id") + 3).alias("e"))
    plan = merge_intervals(df, ["k"], "s", "e")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
