"""Persisted IVF ANN index — the similarity-search scale path as a
LIFECYCLE, not a per-query rebuild.

At 100 TB the embedding corpus is rebuilt rarely and queried
constantly; the index must therefore be durable state, like the
minhash band state (operators/dedup.minhash_band_state):

* **build** — train the deterministic coarse quantizer
  (``similarity.ivf_centroids``: hash-ordered sample init, fsum-merged
  Lloyd — bit-identical on rebuild), assign every vector to its cell
  in one Arrow pass, and persist the assignment table PARTITIONED BY
  CELL plus a tiny centroid sidecar table.  Cell-partitioned parquet is
  what makes a probe cheap: the probe filter prunes to the probed
  cells' FILES at the source (PLANS.md asserts PartitionFilters), so a
  4-of-√N-cell probe reads ~4/√N of the bytes, not a full scan.
* **load** — reconstruct the quantizer from the sidecar (k × dim
  doubles; driver-bounded by construction).
* **append** — assign ONLY the new batch against the frozen centroids
  and append its rows to the partitioned table; the standing corpus is
  never re-read.  Centroids drift as the corpus grows — callers track
  ``appended_since_build`` and rebuild when it passes a fraction of
  the corpus (the standard IVF retrain rule); the index stays CORRECT
  meanwhile (recall degrades gracefully, never silently wrong results,
  because assignment always uses the same frozen centroids the probe
  uses).
* **query** — assign the query batch to its ``n_probe`` nearest cells,
  collect the DISTINCT probed cell ids (≤ n_centroids rows — never
  row-scale), prune the index read to those partitions, and run the
  cogrouped ``ivf_knn_join`` (one shuffle by cell, blocked matrix
  scoring).

No reference file to cite (checkout empty — SURVEY.md §0); the IVF
design follows the published FAISS/IVFADC literature (PAPERS.md).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_validation_spark.operators.similarity import (
    ivf_assign_queries,
    ivf_centroids,
    ivf_index,
    ivf_knn_join,
)
from data_validation_spark.sources.table_provider import TableProvider

CENTROID_SUFFIX = "__centroids"


@dataclass
class AnnIndex:
    """Handle to a persisted IVF index: the provider/table addressing
    the cell-partitioned assignment rows, plus the frozen quantizer."""
    provider: TableProvider
    table: str
    centroids: np.ndarray
    vec_col: str = "embedding"
    id_col: str = "vec_id"

    @property
    def n_centroids(self) -> int:
        return len(self.centroids)


def default_n_centroids(n_rows: int) -> int:
    """The standard IVF sizing rule: ~sqrt(N) cells (probe cost and
    cell-scan cost balance there), clamped to [4, 65536]."""
    return int(min(max(4, round(n_rows ** 0.5)), 65536))


def build_ann_index(df: DataFrame, provider: TableProvider,
                    table: str = "ann_index", dim: int = 64,
                    n_centroids: int | None = None, n_iters: int = 2,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> AnnIndex:
    """Train + assign + persist.  ``n_centroids=None`` sizes the
    quantizer from one count() at the sqrt rule; pass it explicitly in
    production to skip that pass."""
    if n_centroids is None:
        n_centroids = default_n_centroids(df.count())
    cents = ivf_centroids(df, dim=dim, n_centroids=n_centroids,
                          n_iters=n_iters, vec_col=vec_col, id_col=id_col)
    assigned = ivf_index(df, cents, vec_col=vec_col, id_col=id_col)
    provider.overwrite(assigned, table, partition_by=["cell"])
    spark = df.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "centroid_id long, vector array<double>")
    provider.overwrite(cdf, table + CENTROID_SUFFIX)
    return AnnIndex(provider=provider, table=table, centroids=cents,
                    vec_col=vec_col, id_col=id_col)


def load_ann_index(provider: TableProvider, table: str = "ann_index",
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> AnnIndex:
    """Reconstruct the handle from the persisted sidecar — k × dim
    doubles, driver-bounded by the quantizer's own size."""
    rows = (provider.read(table + CENTROID_SUFFIX)
            .orderBy("centroid_id").collect())
    if not rows:
        raise ValueError(f"ANN index {table!r}: centroid sidecar is empty")
    cents = np.stack([np.asarray(r["vector"], dtype=np.float64)
                      for r in rows])
    return AnnIndex(provider=provider, table=table, centroids=cents,
                    vec_col=vec_col, id_col=id_col)


def ann_index_append(index: AnnIndex, batch: DataFrame) -> dict:
    """Incremental ingest: assign the batch against the FROZEN
    centroids (same Arrow kernel as build — a vector appended today
    lands in exactly the cell a rebuild would give it under these
    centroids) and append to the partitioned table.  Only the batch is
    scanned; per-cell counts come back from the assignment's own
    collapsed agg (≤ n_centroids rows) for retrain accounting."""
    assigned = ivf_index(batch, index.centroids,
                         vec_col=index.vec_col, id_col=index.id_col)
    assigned.persist()
    try:
        per_cell = {r["cell"]: r["n"] for r in
                    assigned.groupBy("cell")
                    .agg(F.count(F.lit(1)).alias("n")).collect()}
        index.provider.append(assigned, index.table, partition_by=["cell"])
    finally:
        assigned.unpersist()
    return {"appended": int(sum(per_cell.values())),
            "cells_touched": len(per_cell),
            "per_cell": per_cell}


def ann_index_query(index: AnnIndex, queries: DataFrame, k: int = 10,
                    n_probe: int = 4) -> DataFrame:
    """Batch top-k against the persisted index.  The probed-cell set is
    collected first (distinct over the query assignment — bounded by
    n_centroids, NEVER by query count) so the index read carries an
    explicit ``cell IN (...)`` partition filter: on the cell-partitioned
    table that prunes to the probed directories before any byte is
    read.  Scoring is the standard cogrouped ``ivf_knn_join``."""
    # the assignment kernel runs twice over the query batch (once for
    # the prune list, once inside ivf_knn_join) — one extra Arrow pass
    # over M query rows buys partition pruning over the N-row index
    probes = ivf_assign_queries(queries, index.centroids, n_probe=n_probe,
                                vec_col=index.vec_col, id_col=index.id_col)
    cells = [int(r["cell"]) for r in
             probes.select("cell").distinct().collect()]
    # partition-directory columns read back as int32: cast so the
    # cogroup key types match the probe side's long
    idx = (index.provider.read(index.table)
           .filter(F.col("cell").isin(cells))
           .withColumn("cell", F.col("cell").cast("long")))
    return ivf_knn_join(queries, idx, index.centroids, k=k,
                        n_probe=n_probe, vec_col=index.vec_col,
                        id_col=index.id_col)
