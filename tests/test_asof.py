"""As-of join (operators/asof.py): backward/forward semantics, exact
ties, tolerance, unmatched rows, and plan shape (single Exchange)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.asof import asof_join

T0 = dt.datetime(2026, 1, 1)


def _s(k):
    return T0 + dt.timedelta(seconds=k)


@pytest.fixture()
def frames(spark):
    left = spark.createDataFrame(
        [(1, 1, _s(10)), (2, 1, _s(5)), (3, 1, _s(2)),
         (4, 2, _s(10)), (5, 3, _s(10))],
        "trade_id long, key long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _s(0), 100.0), (1, _s(5), 105.0), (1, _s(8), 108.0),
         (2, _s(20), 200.0)],
        "key long, ts timestamp, price double")
    return left, right


def test_backward_semantics_and_exact_tie(spark, frames):
    left, right = frames
    out = {r.trade_id: (r.price_asof,
                        r.ts_asof and (r.ts_asof - T0).total_seconds())
           for r in asof_join(left, right, ["key"]).collect()}
    assert out[1] == (108.0, 8.0)     # latest at-or-before 10
    assert out[2] == (105.0, 5.0)     # EXACT tie matches (<= semantics)
    assert out[3] == (100.0, 0.0)
    assert out[4] == (None, None)     # right exists only later
    assert out[5] == (None, None)     # key absent from right


def test_forward_semantics(spark, frames):
    left, right = frames
    out = {r.trade_id: r.price_asof for r in
           asof_join(left, right, ["key"],
                     direction="forward").collect()}
    # earliest at-or-after
    assert out[2] == 105.0            # exact tie
    assert out[3] == 105.0            # next at-or-after t=2 is t=5
    assert out[1] is None             # nothing after t=10 for key 1
    assert out[4] == 200.0


def test_tolerance_filters_stale_matches(spark, frames):
    left, right = frames
    out = {r.trade_id: r.price_asof for r in
           asof_join(left, right, ["key"],
                     tolerance_us=2_000_000).collect()}
    assert out[1] == 108.0            # lag 2s == tolerance: kept
    assert out[2] == 105.0            # lag 0
    assert out[3] == 100.0            # lag exactly 2s: kept
    tight = {r.trade_id: r.price_asof for r in
             asof_join(left, right, ["key"],
                       tolerance_us=1_000_000).collect()}
    assert tight[1] is None and tight[3] is None  # lag 2s > 1s: dropped
    assert tight[2] == 105.0


def test_single_exchange_plan(spark, frames):
    left, right = frames
    plan = (asof_join(left, right, ["key"])
            ._jdf.queryExecution().executedPlan().toString())
    import re
    n = len(re.findall(r"Exchange", plan))
    assert n == 1, plan
