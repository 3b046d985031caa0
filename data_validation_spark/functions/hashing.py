"""Hashing / partition-transform expressions (SURVEY.md P3/P4).

All JVM-side Catalyst expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_transform(col: str | Column, n_buckets: int) -> Column:
    """Iceberg ``bucket(N, col)`` emulation: ``(murmur3(col) & MAX_INT) % N``.

    Spark's ``F.hash`` is murmur3_x86_32 (seed 42) — the same hash family
    Iceberg's bucket transform uses.  Iceberg specifies
    ``(hash & Integer.MAX_VALUE) % N`` on murmur3 of the *Iceberg binary
    encoding*; for string columns the encoding is UTF-8 bytes, matching
    Spark's string hashing, so this is layout-compatible for string keys.
    Exact cross-engine parity must be re-verified against Iceberg jars
    when available (SURVEY.md §4.3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c).bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n_buckets))


def salt_column(col: str | Column, fanout: int) -> Column:
    """Deterministic salt in [0, fanout) derived from the key itself —
    used to split a hot *group* across reducers (P3)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(fanout))


def stable_hash64(*cols: str | Column) -> Column:
    """xxhash64 over one or more columns — stable across runs/sessions."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*cs)
