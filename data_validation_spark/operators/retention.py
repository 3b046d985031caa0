"""Cohort retention — "of the users who first appeared in period P,
how many were active k periods later?" — in one wide shuffle.

Periods are ``floor(epoch_days / unit_days)``: a pure integer function
of the date, free of week-start / ISO-week conventions, so every
engine derives identical cohorts.  The heavy lifting is ONE
map-side-combined groupBy on the user key: ``min(period)`` (the
cohort) and ``collect_set(period)`` (the activity set, bounded by the
number of periods in the data window — weeks, not events) come out of
the same aggregate, so the event table crosses the wire once and the
per-user state is O(#periods), never O(#events).  Everything after
runs over (cohort, offset) cells — thousands of rows at any corpus
size.

Retention is the single division ``n_active / cohort_size`` of two
exact integers — one IEEE op, bit-identical on every engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["retention_cohorts"]


def retention_cohorts(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      unit_days: int = 7) -> DataFrame:
    """Retention matrix: one row per (cohort_period, period_offset)
    with the active-user count, the cohort's size, and the retention
    ratio.  ``cohort_period`` is the integer period index (multiply by
    ``unit_days`` for days-since-epoch); offset 0 rows have
    ``retention = 1.0`` by construction.
    """
    if unit_days <= 0:
        raise ValueError("unit_days must be positive")
    period = F.floor(
        F.datediff(F.to_date(F.col(ts_col)),
                   F.lit("1970-01-01").cast("date"))
        / F.lit(int(unit_days))).cast("long")

    per_user = (df.select(F.col(user_col).alias("__u"),
                          period.alias("__p"))
                .groupBy("__u")
                .agg(F.min("__p").alias("cohort_period"),
                     F.collect_set("__p").alias("__ps")))
    cells = (per_user
             .select("cohort_period", F.explode("__ps").alias("__p"))
             .groupBy("cohort_period",
                      (F.col("__p") - F.col("cohort_period"))
                      .alias("period_offset"))
             .agg(F.count(F.lit(1)).alias("n_active")))
    sizes = (cells.filter(F.col("period_offset") == 0)
             .select("cohort_period",
                     F.col("n_active").alias("cohort_size")))
    return (cells.join(F.broadcast(sizes), "cohort_period")
            .select("cohort_period", "period_offset", "n_active",
                    "cohort_size",
                    F.round(F.col("n_active") / F.col("cohort_size"), 6)
                    .alias("retention")))
