"""Hashing / partition-transform expressions (SURVEY.md P3/P4).

All JVM-side Catalyst expressions — no Python in the hot path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_transform(col: str | Column, n_buckets: int) -> Column:
    """Deterministic bucket in [0, N): ``(murmur3(col) & MAX_INT) % N``.

    Uses Spark's JVM-side ``F.hash`` (murmur3_x86_32, **seed 42**) — the
    fast path for the engine's OWN bucketing/salting needs, where only
    determinism and uniformity matter.  NOTE: this is deliberately NOT
    byte-identical to Iceberg's ``bucket(N, col)``: Iceberg specifies
    murmur3_x86_32 with **seed 0** over the Iceberg single-value binary
    encoding, and Spark exposes no seed-0 hash.  When the bucket value
    must match what Iceberg wrote into partition metadata (e.g. routing
    a key to its Iceberg partition without a jar round-trip), use
    ``iceberg_bucket_col`` below — spec-vector-verified parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.hash(c).bitwiseAND(F.lit(0x7FFFFFFF)), F.lit(n_buckets))


# ---------------------------------------------------------------------------
# Iceberg-parity bucket transform (spec Appendix B: murmur3_x86_32 seed 0
# over the single-value binary encoding; verified against the published
# spec test vectors in tests/test_extractors.py)
# ---------------------------------------------------------------------------

def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """Reference murmur3_x86_32 (the public Murmur3 algorithm, as
    specified by the Iceberg spec for its bucket transform).  Matches
    the spec's published test vectors: long 34 → 2017239379,
    "iceberg" → 1210000089, bytes 00010203 → -188683207,
    date 2017-11-16 → -653330422."""
    import struct
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[nblocks * 4:]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 2 ** 32 if h >= 2 ** 31 else h


def iceberg_bucket_value(value, n_buckets: int) -> int | None:
    """Iceberg ``bucket(N, value)`` for a single Python value — int/long
    (8-byte little-endian), str (UTF-8), bytes.  NULL → None (Iceberg
    buckets null as null)."""
    import struct
    if value is None:
        return None
    if isinstance(value, bool):
        raise TypeError("Iceberg bucket is not defined for booleans")
    if isinstance(value, int):
        data = struct.pack("<q", value)
    elif isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, (bytes, bytearray)):
        data = bytes(value)
    else:
        raise TypeError(f"unsupported bucket source type {type(value)!r}")
    return (murmur3_x86_32(data) & 0x7FFFFFFF) % n_buckets


def iceberg_bucket_col(col: str | Column, n_buckets: int) -> Column:
    """Iceberg-parity ``bucket(N, col)`` as an Arrow-batched pandas UDF.

    Integer columns are hashed fully vectorized (numpy murmur3 over the
    fixed 8-byte little-endian blocks); strings fall back to the
    per-item reference implementation inside the Arrow batch — use this
    only where byte-parity with Iceberg partition values is required;
    ``bucket_transform`` is the JVM-side fast path otherwise."""
    from pyspark.sql.types import IntegerType

    def _hash_int64_vec(vals: np.ndarray) -> np.ndarray:
        c1, c2 = np.uint32(0xCC9E2D51), np.uint32(0x1B873593)
        le = vals.astype("<i8").view(np.uint32).reshape(-1, 2)
        h = np.zeros(len(vals), dtype=np.uint32)
        with np.errstate(over="ignore"):
            for blk in range(2):
                k = le[:, blk].copy()
                k *= c1
                k = (k << np.uint32(15)) | (k >> np.uint32(17))
                k *= c2
                h ^= k
                h = (h << np.uint32(13)) | (h >> np.uint32(19))
                h = h * np.uint32(5) + np.uint32(0xE6546B64)
            h ^= np.uint32(8)
            h ^= h >> np.uint32(16)
            h *= np.uint32(0x85EBCA6B)
            h ^= h >> np.uint32(13)
            h *= np.uint32(0xC2B2AE35)
            h ^= h >> np.uint32(16)
        return h

    @F.pandas_udf(IntegerType())
    def _bucket(s: pd.Series) -> pd.Series:
        if s.empty:
            return pd.Series([], dtype="Int32")
        # Arrow hands a nullable integer column to pandas as float64
        # (NaN for nulls) — still the vectorized path
        if (pd.api.types.is_integer_dtype(s.dtype)
                or pd.api.types.is_float_dtype(s.dtype)):
            mask = s.notna()
            out = pd.array([None] * len(s), dtype="Int32")
            if mask.any():
                h = _hash_int64_vec(s[mask].to_numpy(dtype=np.int64))
                out[np.flatnonzero(mask.to_numpy())] = (
                    (h & np.uint32(0x7FFFFFFF)) % np.uint32(n_buckets)
                ).astype(np.int32)
            return pd.Series(out)
        return pd.Series(
            [iceberg_bucket_value(v, n_buckets) for v in s],
            dtype="Int32")

    c = F.col(col) if isinstance(col, str) else col
    return _bucket(c)


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
