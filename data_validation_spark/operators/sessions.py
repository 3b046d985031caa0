"""Gap-based sessionization of event streams (training-data pipelines
segment interaction logs into sessions before sampling/weighting).

Pure Catalyst window arithmetic — no UDF:

* a session breaks when the gap to the previous event of the same user
  exceeds ``gap``; the running sum of break flags is the per-user
  session sequence number (the classic lag + cumulative-sum idiom);
* timestamps compare as ``unix_micros`` longs so the semantics are
  integer-exact and engine-portable (no float epoch rounding);
* ordering ties break on ``event_id`` so results are deterministic
  under duplicate timestamps.

Scale shape: both windows partition by ``user_col`` — parallelism =
#users, state per task = one user's events (bounded by retention in any
real log).  A single pathological user concentrating millions of events
lands on one task; shard such users upstream by day before sessionizing
(the gap rule can't span shards a session crosses — the standard
trade-off — or fall back to the watermarked streaming path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(col: Column) -> Column:
    """Microsecond epoch of a timestamp column.  TIMESTAMP_NTZ (what
    parquet event logs usually carry) holds a wall clock; the cast
    interprets it in the session timezone — pinned to UTC in
    ``session.ENGINE_DEFAULTS`` — making the value engine-portable
    (DuckDB ``epoch_us`` parity).  A no-op for plain TIMESTAMP."""
    return F.unix_micros(col.cast("timestamp"))


def sessionize(df: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_minutes: int = 30,
               order_cols: tuple[str, ...] = ("event_id",)) -> DataFrame:
    """Input rows + ``session_seq`` (1-based per user) assigned by the
    gap rule.  One shuffle (by user), two windows over the same sort."""
    us = _micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    gap_us = gap_minutes * 60 * 1_000_000
    new_session = (
        F.when(F.lag(us).over(w).isNull(), F.lit(1))
        .when(us - F.lag(us).over(w) > F.lit(gap_us), F.lit(1))
        .otherwise(F.lit(0)))
    running = Window.partitionBy(user_col).orderBy(ts_col, *order_cols) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn("session_seq",
                         F.sum(new_session).over(running))


def session_summary(df: DataFrame, user_col: str = "user_id",
                    ts_col: str = "ts", gap_minutes: int = 30,
                    value_col: str | None = "value",
                    order_cols: tuple[str, ...] = ("event_id",)
                    ) -> DataFrame:
    """One row per (user, session): bounds (micros), event count, value
    sum.  No second shuffle: the window leaves the data hash-partitioned
    by ``user_col``, which satisfies the groupBy's clustering on
    (user, session_seq) — a subset key co-locates every group — so the
    agg runs in the same stage (verify: one Exchange in `.explain`)."""
    s = sessionize(df, user_col, ts_col, gap_minutes, order_cols)
    us = _micros(F.col(ts_col))
    aggs = [F.min(us).alias("start_us"), F.max(us).alias("end_us"),
            F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return s.groupBy(user_col, "session_seq").agg(*aggs)


def session_window_summary(df: DataFrame, user_col: str = "user_id",
                           ts_col: str = "ts", gap_minutes: int = 30,
                           value_col: str | None = "value") -> DataFrame:
    """The same per-(user, session) summary through Catalyst's NATIVE
    ``session_window`` operator instead of the composed lag+cumsum —
    the idiom to prefer when the input is a STREAM: session state lives
    in the JVM state store (merged incrementally, closed by the
    watermark), so an always-on pipeline never re-sorts a user's
    history per batch.  Works identically on batch frames, where it
    plans as a MergingSessions aggregate.

    Surface parity with ``session_summary`` (same session boundaries —
    a session breaks when the gap EXCEEDS ``gap_minutes``): start/end
    come back as the min/max event micros per session so the composed
    and native paths are row-for-row comparable (Spark's raw
    session_window.end is last-event + gap, a representation detail
    this summary normalizes away).  Exact-integer surface except
    ``sum_value``, which callers cast per the DECIMAL oracle policy.
    """
    gap = f"{int(gap_minutes)} minutes"
    us = _micros(F.col(ts_col))
    aggs = [F.min(us).alias("start_us"), F.max(us).alias("end_us"),
            F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    return (df.groupBy(F.session_window(F.col(ts_col).cast("timestamp"),
                                        gap).alias("__w"),
                       F.col(user_col))
            .agg(*aggs)
            .drop("__w"))


def funnel_stages(events: DataFrame, funnel: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  id_col: str = "event_id") -> DataFrame:
    """Per-user funnel progress: the furthest ``funnel`` stage each
    user reached, where stages must occur IN ORDER (a purchase before
    the first view does not count) — the classic conversion-funnel
    query, here as a greedy ordered-subsequence match.

    One shuffle keyed by user: events collect per user, sort by
    ``(ts, id)`` (the same deterministic tie-break as sessionize), and
    a Catalyst ``aggregate`` fold walks the type sequence advancing a
    stage counter — no window over the event stream, no UDF, state per
    user = that user's events (the same bound sessionization already
    accepts; a user's event list is assumed executor-sized, true for
    any human-scale actor — cap upstream for bot actors).

    Returns ``(user_col, stage)`` with stage in 0..len(funnel);
    greedy matching is exactly funnel semantics (matching a stage as
    early as possible never hurts later stages)."""
    if not funnel:
        raise ValueError("funnel must be non-empty")
    ordered = F.array_sort(F.collect_list(
        F.struct(F.col(ts_col).alias("t"), F.col(id_col).alias("i"),
                 F.col(type_col).alias("y"))))
    types = F.transform(ordered, lambda s: s["y"])

    def step(acc, x):
        e = acc
        for i, name in reversed(list(enumerate(funnel))):
            e = F.when((acc == F.lit(i)) & (x == F.lit(name)),
                       F.lit(i + 1)).otherwise(e)
        return e

    return (events
            .groupBy(F.col(user_col))
            .agg(F.aggregate(types, F.lit(0), step).alias("stage")))


def event_transitions(df: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts", type_col: str = "event_type",
                      order_cols: tuple[str, ...] = ("event_id",)
                      ) -> DataFrame:
    """First-order transition matrix of the event stream: for every
    ordered (from_type, to_type) pair of CONSECUTIVE events of the same
    user, the transition count and conditional probability — the
    behavioral fingerprint drift monitors compare release-over-release
    (a bot cohort shows up as a transition row that jumps).

    One user-keyed shuffle (the same lag window as ``sessionize``, same
    deterministic (ts, order_cols) tie-break), then a (from, to)
    aggregate over |types|² rows.  ``p`` is the single exact-integer
    division n_transitions / n_from, rounded to 6 — engine-portable.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, *order_cols)
    pairs = (df.withColumn("__from", F.lag(type_col).over(w))
             .filter(F.col("__from").isNotNull())
             .groupBy(F.col("__from").alias("from_type"),
                      F.col(type_col).alias("to_type"))
             .agg(F.count(F.lit(1)).alias("n_transitions")))
    totals = (pairs.groupBy("from_type")
              .agg(F.sum("n_transitions").alias("n_from")))
    return (pairs.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n_transitions", "n_from",
                    F.round(F.col("n_transitions") / F.col("n_from"), 6)
                    .alias("p")))
