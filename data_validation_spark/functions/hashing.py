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


#: modulus/multiplier for the polynomial token checksum (Rabin-style)
_CHK_P = 1_000_000_007
_CHK_MUL = 2_654_435_761


def token_checksum_col(tokens: str | Column) -> Column:
    """Order-sensitive polynomial checksum of a token array (mod 1e9+7),
    computed with a Catalyst higher-order ``aggregate`` — no UDF.

    Used for cross-engine / cross-snapshot content-parity checks: two
    tables claiming the same sequences must agree per-row on
    (doc_id, checksum), which verifies the token-array-equality
    invariant (BASELINE.json:15) without shipping token arrays.
    Arithmetic stays within int64 under ANSI mode: every step reduces
    mod p, so ``acc*31 + mix < 32e9 + 1e9``.
    """
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.aggregate(
        c, F.lit(0).cast("long"),
        lambda acc, x: F.pmod(
            acc * F.lit(31)
            + F.pmod(x.cast("long") * F.lit(_CHK_MUL), F.lit(_CHK_P)),
            F.lit(_CHK_P)))


def partition_checksum_exprs(tokens: str | Column) -> list[Column]:
    """Partition-level content fingerprint: element count + an
    order-insensitive sum of per-row checksums (so the partition value
    is independent of row order within the partition, which is not
    stable across scans)."""
    row = token_checksum_col(tokens)
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return [
        F.sum(F.when(c.isNotNull(), row)).alias("checksum_sum"),
        F.count(F.when(c.isNotNull(), F.lit(1))).alias("n_rows_with_tokens"),
        F.sum(F.when(c.isNotNull(), F.array_size(c))).alias("n_tokens"),
    ]
