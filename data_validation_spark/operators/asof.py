"""As-of (point-in-time) join — the temporal operator Spark's join
zoo lacks, composed from a union + ONE keyed window instead of a
per-row probe.

"For every left row, the latest right row at or before its timestamp"
(backward; forward = earliest at-or-after) is how pipelines attach
slowly-changing state to events: the model version that scored a
request, the feature snapshot a trade saw, the profile a user had when
they purchased.  A naive implementation is a range join (quadratic per
key); the classic shuffle-once formulation used here:

1. tag right rows 0 and left rows 1, union them with the right row's
   payload carried as ONE struct column,
2. ONE shuffle keyed by the join key, sorted by ``(ts, tag, payload)``
   — right rows sort before left rows at equal timestamps, so an
   exact-tie right row is visible to the left row (ASOF ``<=``
   semantics, matching DuckDB's native ``ASOF JOIN``),
3. ``last(payload, ignorenulls=True)`` over rows unbounded-preceding →
   current propagates the latest-seen right payload onto every left
   row; keep the left rows.

Cost: one Exchange of |left| + |right| narrow rows and a sort — the
same bound as sessionization; no range explosion, no per-row Python.
Timestamps compare as ``unix_micros`` longs (integer-exact,
engine-portable).  Ties among RIGHT rows at the same (key, ts) resolve
by payload struct order (document or pre-dedupe when that matters).
The ``asof_join`` oracle replays against DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, key_cols: list[str],
              left_ts: str = "ts", right_ts: str | None = None,
              value_cols: list[str] | None = None,
              direction: str = "backward",
              tolerance_us: int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """Left rows plus, for each, the latest right row at-or-before its
    timestamp (``direction="backward"``; ``"forward"`` = earliest
    at-or-after).  Unmatched (or out-of-``tolerance_us``) left rows
    keep NULL asof columns — the join is left-outer by construction.

    Output = every ``left`` column, plus each of ``value_cols`` (default:
    all right columns except keys + timestamp) renamed with ``suffix``,
    plus ``<right_ts><suffix>`` (the matched row's timestamp — callers
    audit staleness with it).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_ts = right_ts or left_ts
    if value_cols is None:
        value_cols = [c for c in right.columns
                      if c not in set(key_cols) | {right_ts}]

    # NTZ-tolerant: unix_micros requires TIMESTAMP; the session TZ is
    # UTC-pinned (session.py) so the cast is a pure re-tag
    lts = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rts = F.unix_micros(F.col(right_ts).cast("timestamp"))
    # forward = backward on the negated time axis
    sign = 1 if direction == "backward" else -1

    payload = F.struct(
        F.col(right_ts).alias("__matched_ts"),
        *[F.col(c) for c in value_cols])
    r = right.select(
        *[F.col(c) for c in key_cols],
        (rts * sign).alias("__t"),
        F.lit(0).alias("__tag"),
        payload.alias("__payload"))
    l = left.select(
        *[F.col(c) for c in key_cols],
        (lts * sign).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__payload"].dataType)
        .alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"))
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"]
                                                .dataType))

    w = (Window.partitionBy(*key_cols)
         .orderBy("__t", "__tag", "__payload")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = (r.unionByName(l)
               .withColumn("__m", F.last("__payload", ignorenulls=True)
                           .over(w))
               .filter(F.col("__tag") == 1))

    if tolerance_us is not None:
        lag = (F.col("__t")
               - F.unix_micros(F.col("__m.__matched_ts")
                               .cast("timestamp")) * sign)
        matched = matched.withColumn(
            "__m", F.when(lag <= F.lit(int(tolerance_us)),
                          F.col("__m")))

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__matched_ts")
                    .alias(f"{right_ts}{suffix}"))
    out_cols += [F.col(f"__m.{c}").alias(f"{c}{suffix}")
                 for c in value_cols]
    return matched.select(*out_cols)
