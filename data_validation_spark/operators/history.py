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


def scd2_apply_batch(batch_df: DataFrame, current_df: DataFrame,
                     key_cols: list[str], ts_col: str,
                     attr_cols: list[str],
                     order_cols: tuple[str, ...] = ()
                     ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Incrementally fold ONE batch of change records into a
    maintained SCD2 split — the merge step ``streaming_scd2`` runs per
    micro-batch, exposed batch-side so the invariant is testable:
    *(history ∪ current) after folding batches 1..n one at a time ==
    ``scd2_intervals`` over the concatenation* (pinned by test).

    ``current_df`` holds the open version per key (``key_cols +
    attr_cols + version + valid_from``).  Returns ``(history_rows,
    new_current, late_rows)``:

    * ``history_rows`` — intervals CLOSED by this batch (batch-local
      closures, plus each affected key's previous open version closed
      at the batch's first change), shaped like ``scd2_intervals``
      output with ``is_current=false``;
    * ``new_current`` — replacement open rows for exactly the keys the
      batch touched on time (delete those keys from the current table,
      then append this);
    * ``late_rows`` — batch records older than their key's open
      ``valid_from`` (out-of-order CDC): SCD2 cannot splice history
      retroactively, so they are returned for quarantine/accounting,
      never silently folded.  Re-delivery AT the open version's exact
      instant is NOT late (at-least-once feeds re-send the last
      record; the NULL-safe collapse absorbs it).

    Everything is key-partitioned joins/windows — the batch side
    shuffles, the current table contributes one row per touched key.
    """
    cur = current_df.select(
        *key_cols,
        *[F.col(a).alias(f"__cur_{a}") for a in attr_cols],
        F.col("version").alias("__cur_version"),
        F.col("valid_from").alias("__cur_from"))

    tagged = batch_df.join(cur.select(*key_cols, "__cur_from"),
                           key_cols, "left")
    late_rows = tagged.where(F.col(ts_col) < F.col("__cur_from")) \
        .select(*batch_df.columns)
    on_time = tagged.where(F.col("__cur_from").isNull()
                           | (F.col(ts_col) >= F.col("__cur_from"))) \
        .select(*batch_df.columns)

    b = scd2_intervals(on_time, key_cols, ts_col, attr_cols,
                       order_cols).join(cur, key_cols, "left")
    has_cur = F.col("__cur_version").isNotNull()
    same = F.lit(True)
    for a in attr_cols:
        same = same & F.col(a).eqNullSafe(F.col(f"__cur_{a}"))
    merged_v1 = (F.col("version") == 1) & has_cur & same
    wk = Window.partitionBy(*key_cols)
    key_merged = F.max(merged_v1.cast("int")).over(wk) == 1
    shift = (F.when(~has_cur, F.lit(0))
             .when(key_merged, F.col("__cur_version") - 1)
             .otherwise(F.col("__cur_version")))
    b = b.withColumn("__new_version",
                     (F.col("version") + shift).cast("int")) \
         .withColumn("__merged_v1", merged_v1)

    live = b.where(~F.col("__merged_v1"))
    hist_batch = live.where(F.col("valid_to").isNotNull()).select(
        *key_cols, *attr_cols, "valid_from", "valid_to",
        F.col("__new_version").alias("version"),
        F.lit(False).alias("is_current"))
    # the previous open version, closed by this batch's first change
    # (merged: it absorbed v1, so it closes where v1 would have —
    # v1.valid_to; unmerged: at v1.valid_from); stays open iff merged
    # and the batch never moved past it
    v1 = b.where(F.col("version") == 1).where(has_cur)
    closed_at = F.when(F.col("__merged_v1"), F.col("valid_to")) \
        .otherwise(F.col("valid_from"))
    hist_cur = v1.where(closed_at.isNotNull()).select(
        *key_cols,
        *[F.col(f"__cur_{a}").alias(a) for a in attr_cols],
        F.col("__cur_from").alias("valid_from"),
        closed_at.alias("valid_to"),
        F.col("__cur_version").alias("version"),
        F.lit(False).alias("is_current"))

    open_batch = live.where(F.col("valid_to").isNull()).select(
        *key_cols, *attr_cols,
        F.col("__new_version").alias("version"), "valid_from")
    open_cur = v1.where(F.col("__merged_v1")
                        & F.col("valid_to").isNull()).select(
        *key_cols,
        *[F.col(f"__cur_{a}").alias(a) for a in attr_cols],
        F.col("__cur_version").alias("version"),
        F.col("__cur_from").alias("valid_from"))
    return (hist_batch.unionByName(hist_cur),
            open_batch.unionByName(open_cur), late_rows)


def cdc_apply(base: DataFrame, changes: DataFrame, key_cols: list[str],
              ts_col: str, op_col: str | None = None,
              order_cols: tuple[str, ...] = ()) -> DataFrame:
    """SCD **type-1** CDC merge — the latest-wins snapshot MERGE INTO
    every lakehouse maintains beside the SCD2 history: union the
    standing snapshot with a change batch, keep each key's newest row,
    drop keys whose newest record is a delete marker.

    ``op_col`` (optional) carries the CDC verb; only the value ``'D'``
    is special (delete) — anything else, or a missing column on the
    base side, means upsert.  Ordering is ``(ts_col, *order_cols)``
    with the CHANGE side winning exact ties against the base (a batch
    that restates the same instant supersedes the snapshot) — ties
    within a side break on ``order_cols``, required when a batch can
    carry same-instant rows for one key.

    ONE window over one hash partitioning by key (row_number over
    (key) ordered newest-first, keep rank 1, then the delete filter);
    parallelism = #keys, per-task state = one key's records.  Output
    schema = ``base`` columns (op column dropped) — the snapshot
    contract downstream jobs join against."""
    cols = [c for c in base.columns if c != op_col]
    opv = (F.lit(None).cast("string") if op_col is None
           or op_col not in base.columns else F.col(op_col))
    b = base.select(*cols, opv.alias("__op"), F.lit(0).alias("__side"))
    copv = (F.lit(None).cast("string") if op_col is None
            else F.col(op_col))
    ch = changes.select(*cols, copv.alias("__op"),
                        F.lit(1).alias("__side"))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col("__side").desc(),
        *[F.col(c).desc() for c in order_cols])
    return (b.unionByName(ch)
            .withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1)
                    & ~F.coalesce(F.col("__op") == "D", F.lit(False)))
            .select(*cols))
