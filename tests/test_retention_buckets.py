"""Retention cohorts (operators/retention.py) and global quantile
buckets (operators/bucketize.py): hand-computed matrices, tie/NULL
semantics, cardinality guard, and no-global-sort plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.bucketize import global_quantile_buckets
from data_validation_spark.operators.retention import retention_cohorts

D0 = dt.datetime(1970, 1, 1)  # period 0 under unit_days=7


def _d(days):
    return D0 + dt.timedelta(days=days)


def test_retention_hand_computed(spark):
    # cohort 0: users 1,2,3 (first seen days 0..6); user1 active p0,p1,p2;
    # user2 p0,p2; user3 p0 only. cohort 1: user4, active p1 only.
    rows = [(1, _d(0)), (1, _d(8)), (1, _d(15)),
            (2, _d(3)), (2, _d(16)),
            (3, _d(6)),
            (4, _d(7))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_period, r.period_offset):
           (r.n_active, r.cohort_size, r.retention)
           for r in retention_cohorts(df).collect()}
    assert out == {
        (0, 0): (3, 3, 1.0),
        (0, 1): (1, 3, round(1 / 3, 6)),
        (0, 2): (2, 3, round(2 / 3, 6)),
        (1, 0): (1, 1, 1.0),
    }


def test_retention_duplicate_events_count_once(spark):
    rows = [(1, _d(0)), (1, _d(0)), (1, _d(1)), (1, _d(8))]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_period, r.period_offset): r.n_active
           for r in retention_cohorts(df).collect()}
    assert out == {(0, 0): 1, (0, 1): 1}


def test_retention_unit_days_validation(spark):
    df = spark.createDataFrame([(1, _d(0))], "user_id long, ts timestamp")
    with pytest.raises(ValueError):
        retention_cohorts(df, unit_days=0)


def test_quantile_buckets_exact_quartiles(spark):
    df = spark.createDataFrame([(i, i) for i in range(1, 9)],
                               "id long, x long")
    out = {r.id: r.qbucket for r in
           global_quantile_buckets(df, "x", n_buckets=4).collect()}
    assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}


def test_quantile_buckets_ties_never_straddle(spark):
    # 6x value 5, 2x value 9 -> all 5s share a bucket under any n
    df = spark.createDataFrame([(i, 5) for i in range(6)]
                               + [(6, 9), (7, 9)], "id long, x long")
    out = global_quantile_buckets(df, "x", n_buckets=4)
    got = {r.x: {b for b in [r.qbucket]} for r in out.collect()}
    rows = out.collect()
    assert len({r.qbucket for r in rows if r.x == 5}) == 1
    assert {r.qbucket for r in rows if r.x == 9} == {4}


def test_quantile_buckets_null_passthrough(spark):
    df = spark.createDataFrame([(1, 10), (2, None), (3, 20)],
                               "id long, x long")
    out = {r.id: r.qbucket for r in
           global_quantile_buckets(df, "x", n_buckets=2).collect()}
    assert out[2] is None and out[1] == 1 and out[3] == 2


def test_quantile_buckets_cardinality_guard(spark):
    df = spark.range(100).select(F.col("id"), F.col("id").alias("x"))
    with pytest.raises(Exception, match="distinct values"):
        global_quantile_buckets(df, "x", n_buckets=4,
                                max_distinct=50).collect()


def test_quantile_buckets_no_global_sort_of_rows(spark):
    """The |rows|-sized side must not pass through a single-partition
    sort/window — only the collapsed distinct-value frame does."""
    df = spark.range(10000).select(
        F.col("id"), F.pmod(F.col("id"), 97).alias("x"))
    out = global_quantile_buckets(df, "x", n_buckets=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the row side reaches the output via BroadcastHashJoin, untouched
    # by Exchange SinglePartition
    assert "BroadcastHashJoin" in plan
    counts = {r.qbucket: r["count"] for r in
              out.groupBy("qbucket").count().collect()}
    assert sum(counts.values()) == 10000
    assert all(800 <= v <= 1200 for v in counts.values()), counts
