"""Slowly-changing-dimension (type 2) history from a change stream.

Lakehouse pipelines ingest entity *restatements* (CDC feeds, daily
snapshots, event-sourced facts) and need the classic SCD2 shape —
one row per (key, version) with a ``[valid_from, valid_to)`` interval —
to join facts point-in-time.  Like ``asof.py``/``interval.py`` this
extends past the rdv spec's operator list (SURVEY.md §2.2 has no
temporal-table op) into territory the brief's training-data pipelines
need — ``asof_join`` consumes exactly the table this module builds.
Spark-first shape:

* consecutive records whose tracked attributes are IDENTICAL
  (NULL-safe) collapse into one version — a feed that re-states an
  unchanged row never mints a spurious version;
* everything is window arithmetic over ONE hash partitioning by key:
  the change-detection lag, the version row_number, and the
  ``valid_to`` lead all share the same (key, order) sort, and the
  filter between them preserves the distribution, so the whole build
  is a single Exchange (plan-asserted in tests);
* ordering ties break on ``order_cols`` so duplicate timestamps are
  deterministic — required, not optional, when the change stream can
  carry same-instant rows.

Scale shape: parallelism = #keys; per-task state = one key's history
(bounded by retention).  No collect, no UDF, no second shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(df: DataFrame, key_cols: list[str], ts_col: str,
                   attr_cols: list[str],
                   order_cols: tuple[str, ...] = ()) -> DataFrame:
    """Collapse a change stream into type-2 intervals.

    Returns one row per retained version: ``key_cols + attr_cols +
    (valid_from, valid_to, version, is_current)`` where ``valid_from``
    / ``valid_to`` keep ``ts_col``'s type (``valid_to`` NULL on the
    open current version), ``version`` is 1-based per key, and a
    version is retained iff it is the key's first record or differs
    (NULL-safely) from the previous record in any tracked attribute.

    ``ts_col`` must be non-null; rows sharing (key, ts) are ordered by
    ``order_cols`` (pass the stream's unique id for determinism).
    """
    if not attr_cols:
        raise ValueError("scd2_intervals: attr_cols must be non-empty")
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(w))
    kept = df.select(*key_cols, ts_col, *order_cols, *attr_cols,
                     changed.alias("_changed")) \
        .where("_changed")
    w2 = Window.partitionBy(*key_cols).orderBy(ts_col, *order_cols)
    return kept.select(
        *key_cols, *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"))


def as_of_snapshot(scd2: DataFrame, at) -> DataFrame:
    """Point-in-time reconstruction: the version of every key whose
    interval contains ``at`` (``valid_from <= at < valid_to``; the
    open current version matches any later instant).  A pure filter —
    Catalyst pushes it to the scan, so snapshotting a persisted SCD2
    table reads only matching row groups."""
    at = F.lit(at)
    return scd2.where((F.col("valid_from") <= at)
                      & (F.col("valid_to").isNull()
                         | (F.col("valid_to") > at)))
