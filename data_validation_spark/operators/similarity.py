"""Similarity search over embedding columns (array<float>).

Three tiers, trading exactness for scan cost:

* ``brute_force_topk`` — exact cosine top-k via Catalyst expressions +
  ``orderBy(...).limit(k)`` (Spark plans a TakeOrdered: per-partition
  heap + driver merge of k rows per partition — no global sort even at
  10^12 rows).
* ``brute_force_topk_pandas`` — same semantics, Arrow-batched numpy
  matrix kernel (mapInPandas) for throughput when the vector column is
  wide; this is the fast path for bulk scoring.
* ``lsh_bucketed_topk`` — random-hyperplane LSH: vectors land in
  2^n_planes sign buckets; the query probes its own bucket plus
  ``n_probe`` single-bit-flip neighbors, scanning only those partitions
  of the index.  Approximate, tunable recall, scan cost ~ bucket share.
* ``embedding_near_duplicates`` — cosine ≥ threshold pairs within LSH
  buckets (near-dup path for embedding dedup).

Hyperplanes are generated from a fixed seed so index and query agree
deterministically across jobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validation_spark.functions.arrays import cosine_col, lit_vector

DEFAULT_SEED = 42


def brute_force_topk(df: DataFrame, query_vec, k: int = 10,
                     vec_col: str = "embedding",
                     id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k against a literal query vector — pure Catalyst
    (zip_with/aggregate), deterministic ties broken by id."""
    q = lit_vector(query_vec)
    return (df.select(F.col(id_col),
                      cosine_col(F.col(vec_col), q).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def brute_force_topk_pandas(df: DataFrame, query_vec, k: int = 10,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k with an Arrow-batched numpy kernel: each batch
    is scored as one matrix-vector product, and only each batch's local
    top-k survives to the final TakeOrdered."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / np.linalg.norm(q)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(mat, axis=1)
            norms[norms == 0] = 1.0
            cos = (mat @ qn) / norms
            out = pd.DataFrame({id_col: pdf[id_col], "cosine": cos})
            yield out.nlargest(min(k, len(out)), "cosine")

    scored = df.select(id_col, vec_col).mapInPandas(
        score, schema=f"{id_col} long, cosine double")
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# random-hyperplane LSH index
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((n_planes, dim))


def _bucket_kernel(planes: np.ndarray, vec_col: str, id_col: str):
    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            signs = (mat @ planes.T) > 0
            bucket = np.zeros(len(pdf), dtype=np.int64)
            for b in range(planes.shape[0]):
                bucket |= signs[:, b].astype(np.int64) << b
            yield pd.DataFrame({id_col: pdf[id_col], "bucket": bucket,
                                vec_col: pdf[vec_col]})
    return assign


def lsh_bucket_index(df: DataFrame, dim: int, n_planes: int = 8,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     seed: int = DEFAULT_SEED) -> DataFrame:
    """Assign every vector a sign-bucket id.  Persist/partition this by
    ``bucket`` as the ANN index (e.g. write partitioned parquet so a
    probe prunes to the probed buckets' files)."""
    planes = _hyperplanes(dim, n_planes, seed)
    return df.select(id_col, vec_col).mapInPandas(
        _bucket_kernel(planes, vec_col, id_col),
        schema=f"{id_col} long, bucket long, {vec_col} array<float>")


def query_buckets(query_vec, dim: int, n_planes: int = 8, n_probe: int = 4,
                  seed: int = DEFAULT_SEED) -> list[int]:
    """The query's bucket plus its n_probe nearest single-bit flips
    (flip order = |margin| ascending: the planes the query is closest
    to are the most likely sign errors)."""
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    margins = planes @ q
    base = 0
    for b in range(n_planes):
        base |= int(margins[b] > 0) << b
    flips = np.argsort(np.abs(margins))[:n_probe]
    return [base] + [base ^ (1 << int(b)) for b in flips]


def lsh_bucketed_topk(index: DataFrame, query_vec, k: int = 10,
                      dim: int | None = None, n_planes: int = 8,
                      n_probe: int = 4, vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      seed: int = DEFAULT_SEED) -> DataFrame:
    """Approximate top-k: exact cosine over only the probed buckets."""
    dim = dim or len(query_vec)
    probes = query_buckets(query_vec, dim, n_planes, n_probe, seed)
    cand = index.filter(F.col("bucket").isin(probes))
    return brute_force_topk(cand, query_vec, k, vec_col, id_col)


def embedding_near_duplicates(df: DataFrame, dim: int,
                              threshold: float = 0.95, n_planes: int = 10,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              seed: int = DEFAULT_SEED,
                              max_bucket: int = 5000) -> DataFrame:
    """Embedding-cosine near-dup pairs: candidates must share an LSH
    sign bucket (high-cosine pairs almost always do at small n_planes);
    verification is an exact pairwise cosine inside each bucket via an
    Arrow-batched numpy kernel (applyInPandas per bucket)."""
    index = lsh_bucket_index(df, dim, n_planes, vec_col, id_col, seed)
    sizes = index.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    index = index.join(
        sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("bucket"), "bucket")

    def pairwise(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        cos = unit @ unit.T
        ia, ib = np.triu_indices(len(pdf), k=1)
        keep = cos[ia, ib] >= threshold
        ids = pdf[id_col].to_numpy()
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi,
                             "cosine": cos[ia, ib][keep]})

    return (index.groupBy("bucket")
            .applyInPandas(pairwise, schema="id_a long, id_b long, cosine double")
            .distinct())
