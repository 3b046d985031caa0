"""Interval containment join — "which intervals contain this point?"
as a binned equi-join, not a range probe.

Spark has no range-join optimizer (a plain ``ON p.ts BETWEEN i.start
AND i.end`` plans as BroadcastNestedLoopJoin or a cartesian product —
quadratic per key, a non-starter at 100 TB).  The classic fix, used by
every production range-join implementation (Databricks' range-join
hints, GeoSpark's grid partitioning), is to discretize the time axis:

1. pick a bin width ``w`` (≈ the typical interval length, so each
   interval spans O(1) bins),
2. explode every interval to the bins it overlaps
   (``sequence(floor(start/w), floor(end/w))`` — pure Catalyst),
3. map every point to its single bin (``floor(t/w)``),
4. equi-join on ``(key..., bin)`` — ONE ordinary shuffle each side,
   AQE-skew-splittable like any other equi-join,
5. re-check exact containment ``start <= t <= end`` (micros, integer-
   exact) to discard same-bin-but-outside pairs.

A point lies in exactly ONE bin, so the join emits each (point,
interval) pair at most once — no post-join dedup.  Cost is
``|P| + |I| * ceil(len/w)`` narrow rows through one exchange pair;
the quadratic blow-up of a true range join never appears.

Scale guard: an interval ``max_span_bins * w`` long or longer would
silently multiply itself into that many join rows; when the cap is
set, such rows ``raise_error`` at execution time (fail loud beats a
silent 10^6-row self-amplification — same policy as the ANSI-mode
overflow stance in functions/stats.py).

Both endpoints are inclusive (``start <= t <= end``), matching SQL
``BETWEEN`` — the ``interval_attribution`` oracle replays the exact
semantics as a DuckDB inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(points: DataFrame, intervals: DataFrame,
                  key_cols: list[str], point_ts: str = "ts",
                  start_ts: str = "start", end_ts: str = "end",
                  bin_width_us: int = 3_600_000_000,
                  max_span_bins: int | None = 4096,
                  suffix: str = "_iv") -> DataFrame:
    """Inner-join every point row to each interval row (same
    ``key_cols``) whose ``[start_ts, end_ts]`` contains ``point_ts``.

    Output = all ``points`` columns plus all ``intervals`` columns,
    interval-side names that collide with a point-side name get
    ``suffix``.  Intervals with ``end < start`` match nothing (filtered
    before the explode, never an error — mirrors BETWEEN).

    ``bin_width_us`` tunes the cost knob: each interval becomes
    ``ceil(len / bin_width_us) + 1`` join rows.  Set it near the
    typical interval length.
    """
    w = int(bin_width_us)
    if w <= 0:
        raise ValueError("bin_width_us must be positive")

    pt = F.unix_micros(F.col(point_ts).cast("timestamp"))
    st = F.unix_micros(F.col(start_ts).cast("timestamp"))
    en = F.unix_micros(F.col(end_ts).cast("timestamp"))

    # floor-divide micros into bins; floor(), unlike integer `div`,
    # rounds toward -inf so pre-1970 timestamps bin consistently, and
    # micros < 2^53 keep the double division exact
    def _bin(c):
        return F.floor(c / F.lit(w)).cast("long")

    p = points.select(
        *[F.col(c) for c in points.columns],
        _bin(pt).alias("__bin"), pt.alias("__t"))

    span = _bin(en) - _bin(st)
    if max_span_bins is not None:
        span = F.when(
            span >= F.lit(int(max_span_bins)),
            F.raise_error(F.concat(
                F.lit(f"interval_join: interval spans >= {max_span_bins} "
                      f"bins of {w}us — raise bin_width_us or split the "
                      "interval (len_us="), (en - st).cast("string"),
                F.lit(")")))
        ).otherwise(span)
    iv_renamed = [(c, f"{c}{suffix}" if c in set(points.columns) else c)
                  for c in intervals.columns]
    # end < start matches nothing under BETWEEN; filter BEFORE the
    # sequence() explode (Spark's sequence(0, negative) would step -1
    # and emit bins, not an empty array)
    intervals = intervals.filter(en >= st)
    i = intervals.select(
        *[F.col(c).alias(a) for c, a in iv_renamed],
        st.alias("__s"), en.alias("__e"),
        F.explode(F.sequence(F.lit(0).cast("long"), span))
        .alias("__k"))
    i = i.withColumn("__bin", F.floor(F.col("__s") / F.lit(w)).cast("long")
                     + F.col("__k"))

    key_pairs = [p[c].eqNullSafe(i[f"{c}{suffix}" if c in set(points.columns)
                                   else c]) for c in key_cols]
    joined = p.join(i, key_pairs
                    + [p["__bin"] == i["__bin"],
                       F.col("__t") >= F.col("__s"),
                       F.col("__t") <= F.col("__e")])

    out = [p[c] for c in points.columns]
    out += [i[a] for c, a in iv_renamed if c not in key_cols]
    return joined.select(*out)


def merge_intervals(df: DataFrame, key_cols: list[str],
                    start_col: str, end_col: str) -> DataFrame:
    """Coalesce overlapping/touching ``[start, end]`` intervals per key
    — the sweep every attribution/billing/availability pipeline runs
    before measuring covered time (unmerged spans double-count).

    Classic sweep as pure window arithmetic over ONE hash partitioning
    by key: rows sort by (start, end), an interval whose start exceeds
    the running max of all PRIOR ends opens a new group (strictly
    greater — touching intervals merge), the group id is the running
    sum of those flags, and a final groupBy((key, group)) emits each
    merged span with its source-row count.  Both windows and the agg
    share the same key hash: a single Exchange, no self-join, no
    driver state; per-task state = one key's intervals.

    Output: ``key_cols…, span_start, span_end, n_intervals`` —
    ordering ties are total because equal (start, end) rows merge by
    construction."""
    w_sort = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w_sort.rowsBetween(Window.unboundedPreceding, -1))
    flag = F.when(prev_max_end.isNull()
                  | (F.col(start_col) > prev_max_end), 1).otherwise(0)
    gid = F.sum(flag).over(
        w_sort.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.select(*key_cols, start_col, end_col)
            .withColumn("__g", gid)
            .groupBy(*key_cols, "__g")
            .agg(F.min(start_col).alias("span_start"),
                 F.max(end_col).alias("span_end"),
                 F.count(F.lit(1)).alias("n_intervals"))
            .drop("__g"))
