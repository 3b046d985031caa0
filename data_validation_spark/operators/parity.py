"""Snapshot parity / diff — the content-parity checksum turned into an
operator: which PARTITIONS of a table changed between two snapshots
(engine migration A/B, replication audit, pre/post-backfill check)?

Per snapshot: one pruned scan → per-partition (rows, token count,
order-insensitive Rabin checksum) via the Catalyst higher-order fold in
``functions.hashing`` (no arrays are shuffled — reduce state is three
longs per partition).  The diff is a full-outer join of the two tiny
aggregate frames, so comparing two 100 TB snapshots shuffles kilobytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_spark.functions.hashing import partition_checksum_exprs


def snapshot_checksums(df: DataFrame, tokens: str | Column,
                       partition_cols: list[str]) -> DataFrame:
    """(partition_cols..., checksum_sum, n_rows_with_tokens, n_tokens)."""
    return df.groupBy(*partition_cols).agg(*partition_checksum_exprs(tokens))


def snapshot_diff(a: DataFrame, b: DataFrame, tokens: str | Column,
                  partition_cols: list[str],
                  include_matching: bool = False) -> DataFrame:
    """Partition-level diff of two snapshots: one row per partition
    present in either side, with both sides' fingerprints and a
    ``match`` verdict.  ``include_matching=False`` (default) returns
    only the partitions that differ — at parity the result is EMPTY,
    which is the cheap invariant a migration gate asserts."""
    ca = snapshot_checksums(a, tokens, partition_cols)
    cb = snapshot_checksums(b, tokens, partition_cols)
    return checksum_diff(ca, cb, partition_cols, include_matching)


def checksum_diff(ca: DataFrame, cb: DataFrame, partition_cols: list[str],
                  include_matching: bool = False) -> DataFrame:
    """``snapshot_diff`` over two already-computed ``snapshot_checksums``
    frames — the shape an incremental pipeline uses, where each run
    persists its (KB-sized) checksum frame and the next run diffs
    against it without touching the previous snapshot's data."""
    renames_a = {c: f"{c}_a" for c in
                 ("checksum_sum", "n_rows_with_tokens", "n_tokens")}
    renames_b = {c: f"{c}_b" for c in renames_a}
    ca = ca.withColumnsRenamed(renames_a)
    cb = cb.withColumnsRenamed(renames_b)
    out = ca.join(cb, on=partition_cols, how="full_outer")
    match = (F.col("checksum_sum_a").eqNullSafe(F.col("checksum_sum_b"))
             & F.col("n_rows_with_tokens_a")
               .eqNullSafe(F.col("n_rows_with_tokens_b"))
             & F.col("n_tokens_a").eqNullSafe(F.col("n_tokens_b")))
    out = out.withColumn("match", match)
    return out if include_matching else out.filter(~F.col("match"))
