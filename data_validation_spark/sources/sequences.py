"""Deterministic synthetic `sequences` table (FIXTURES.md §1).

Generates the BASELINE.json:15 input shape — ``doc_id:string,
tokens:array<int32>, n_tok:int32, source:string`` — fully distributed
(``spark.range`` → ``mapInPandas``) and fully deterministic: every value
is a pure function of the row index via a counter-based splitmix64
hash, so the table is identical regardless of parallelism, partitioning
or batch boundaries.  No per-row Python: each Arrow batch is generated
with vectorized numpy.

Violation injection (known-by-construction assertion targets):
  i % 97  == 0 (i>0) → doc_id duplicates row i-1        (uniqueness)
  i % 131 == 0        → tokens[0] out-of-vocab           (vocab bounds)
  i % 211 == 0        → tokens is NULL                   (null profile)
  i % 173 == 0        → n_tok = len(tokens) + 1          (length consistency)
  source "BADSRC" (~1%) absent from the dimension        (referential)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

VOCAB_SIZE = 50257
MAX_LEN = 8192
N_BUCKETS = 8

SOURCE_WEIGHTS = {"web": 0.70, "books": 0.15, "code": 0.10,
                  "wiki": 0.04, "BADSRC": 0.01}
SOURCE_WEIGHTS_SHIFTED = {"web": 0.55, "books": 0.15, "code": 0.25,
                          "wiki": 0.04, "BADSRC": 0.01}
ALLOWED_SOURCES = ["web", "books", "code", "wiki"]

SEQUENCES_SCHEMA = StructType([
    StructField("doc_id", StringType(), False),
    StructField("tokens", ArrayType(IntegerType(), False), True),
    StructField("n_tok", IntegerType(), False),
    StructField("source", StringType(), False),
])


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a pure uint64→uint64 mix."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(ids: np.ndarray, seed: int, salt: int) -> np.ndarray:
    """Deterministic U(0,1) per id — counter-based, order-independent."""
    mix = (seed * 0x51_7C_C1B7_2722_0A95 + salt) & 0xFFFF_FFFF_FFFF_FFFF
    h = _splitmix64(ids.astype(np.uint64) ^ np.uint64(mix))
    return (h >> np.uint64(11)).astype(np.float64) * (1.0 / (1 << 53))


def _norm_ppf(u: np.ndarray) -> np.ndarray:
    """Inverse standard-normal CDF (Acklam's rational approximation,
    |rel err| < 1.15e-9) — scipy is absent in the sandbox."""
    a = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
         1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
         6.680131188771972e+01, -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
         -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
         3.754408661907416e+00]
    u = np.clip(u, 1e-300, 1 - 1e-16)
    out = np.empty_like(u)
    lo, hi = 0.02425, 1 - 0.02425
    m_lo, m_hi = u < lo, u > hi
    m_mid = ~(m_lo | m_hi)
    q = np.sqrt(-2 * np.log(u[m_lo])) if m_lo.any() else np.array([])
    if m_lo.any():
        out[m_lo] = (((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
                    ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    if m_hi.any():
        q = np.sqrt(-2 * np.log(1 - u[m_hi]))
        out[m_hi] = -(((((c[0]*q+c[1])*q+c[2])*q+c[3])*q+c[4])*q+c[5]) / \
                     ((((d[0]*q+d[1])*q+d[2])*q+d[3])*q+1)
    if m_mid.any():
        q = u[m_mid] - 0.5
        r = q * q
        out[m_mid] = (((((a[0]*r+a[1])*r+a[2])*r+a[3])*r+a[4])*r+a[5])*q / \
                     (((((b[0]*r+b[1])*r+b[2])*r+b[3])*r+b[4])*r+1)
    return out


def _gen_batch(ids: np.ndarray, seed: int, shift: bool) -> pd.DataFrame:
    n = len(ids)
    mu = 5.9 if shift else 5.5
    weights = SOURCE_WEIGHTS_SHIFTED if shift else SOURCE_WEIGHTS

    # n_tok ~ clipped lognormal(mu, 0.6), deterministic per id
    z = _norm_ppf(_uniform(ids, seed, salt=1))
    lens = np.clip(np.exp(mu + 0.6 * z), 1, MAX_LEN).astype(np.int64)

    # skewed categorical source
    u_src = _uniform(ids, seed, salt=2)
    names = list(weights)
    cuts = np.cumsum([weights[k] for k in names])
    src = np.array(names, dtype=object)[np.searchsorted(cuts, u_src)]

    # flat token stream: token t of row i has counter i*MAX_LEN + t
    counters = (np.repeat(ids.astype(np.uint64), lens) * np.uint64(MAX_LEN)
                + _concat_aranges(lens))
    tok_mix = (seed * 0x9E3779B9 + 7) & 0xFFFF_FFFF_FFFF_FFFF
    flat = (_splitmix64(counters ^ np.uint64(tok_mix))
            % np.uint64(VOCAB_SIZE)).astype(np.int32)

    # violation injections (see module docstring)
    oov = (ids % 131 == 0)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    flat[starts[oov]] = (VOCAB_SIZE + (ids[oov] % 7)).astype(np.int32)

    token_lists = np.split(flat, np.cumsum(lens)[:-1])
    tokens = pd.Series(token_lists, dtype=object)
    tokens[ids % 211 == 0] = None

    n_tok = lens.copy()
    n_tok[ids % 173 == 0] += 1

    doc_ids = np.char.add("doc-", np.char.zfill(ids.astype("U10"), 8))
    dup = (ids % 97 == 0) & (ids > 0)
    doc_ids[dup] = np.char.add(
        "doc-", np.char.zfill((ids[dup] - 1).astype("U10"), 8))

    return pd.DataFrame({
        "doc_id": doc_ids,
        "tokens": tokens,
        "n_tok": n_tok.astype(np.int32),
        "source": src,
    })


def _concat_aranges(lens: np.ndarray) -> np.ndarray:
    """[arange(l) for l in lens] concatenated, vectorized."""
    total = int(lens.sum())
    out = np.arange(total, dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return out - np.repeat(starts.astype(np.uint64), lens)


def synth_sequences(spark: SparkSession, n_rows: int, seed: int = 42,
                    shift: bool = False, num_partitions: int | None = None,
                    with_partition_cols: bool = True) -> DataFrame:
    """Distributed deterministic sequences table.

    ``with_partition_cols`` adds the physical Iceberg-emulating partition
    columns ``source`` (already present) and ``bucket = pmod(hash(doc_id),
    8)`` (P4 bucket transform, Spark murmur3 — same family as Iceberg's
    bucket transform; see functions/hashing.py for the parity note).
    """
    num_partitions = num_partitions or max(1, min(64, n_rows // 2000 or 1))

    def gen(batches):
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), seed, shift)

    df = (spark.range(0, n_rows, numPartitions=num_partitions)
          .mapInPandas(gen, schema=SEQUENCES_SCHEMA))
    if with_partition_cols:
        from data_validation_spark.functions.hashing import bucket_transform
        df = df.withColumn("bucket", bucket_transform("doc_id", N_BUCKETS))
    return df


def write_sequences_table(spark: SparkSession, path: str, n_rows: int,
                          seed: int = 42, shift: bool = False) -> None:
    """Materialize as a partitioned parquet table (Iceberg layout stand-in)."""
    df = synth_sequences(spark, n_rows, seed=seed, shift=shift)
    df.write.mode("overwrite").partitionBy("source", "bucket").parquet(path)


def allowed_sources_df(spark: SparkSession) -> DataFrame:
    """FIXTURES.md §2 dimension: allowed sources + expected frequencies
    (rescaled to sum 1) — doubles as the drift reference histogram."""
    w = {k: SOURCE_WEIGHTS[k] for k in ALLOWED_SOURCES}
    tot = sum(w.values())
    rows = [(k, v / tot) for k, v in w.items()]
    return spark.createDataFrame(rows, "source string, weight double")
