"""Persisted IVF ANN index lifecycle: build → load → query (exact mode
vs numpy ground truth), incremental append, partition pruning of the
probe read, and determinism of the persisted quantizer."""

import numpy as np
import pytest

from data_validation_spark.operators.ann_index import (
    ann_index_append,
    ann_index_query,
    build_ann_index,
    default_n_centroids,
    load_ann_index,
)
from data_validation_spark.sources.table_provider import TableProvider

DIM = 16
N = 240


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(11)
    return rng.standard_normal((N, DIM)).astype(np.float32)


@pytest.fixture(scope="module")
def emb(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>").cache()


def _exact_topk(vectors, ids, q, k):
    # mirror the kernel: float32 storage upcast to float64 BEFORE
    # normalization (a float32 ground truth reads self-cosine 0.99999994)
    v = vectors.astype(np.float64)
    q = np.asarray(q, dtype=np.float64)
    unit = v / np.linalg.norm(v, axis=1, keepdims=True)
    cos = unit @ (q / np.linalg.norm(q))
    order = np.lexsort((ids, -cos))
    return [(int(ids[i]), float(cos[i])) for i in order[:k]]


def test_build_query_exact_matches_numpy(spark, emb, vectors, tmp_path):
    tp = TableProvider(spark, str(tmp_path))
    idx = build_ann_index(emb, tp, dim=DIM, n_centroids=8)
    queries = emb.filter("vec_id < 5")
    out = ann_index_query(idx, queries, k=3, n_probe=8)  # all cells=exact
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["vec_id"], round(r["cosine"], 6)))
    ids = np.arange(N)
    for q in range(5):
        expect = [(i, round(c, 6)) for i, c in
                  _exact_topk(vectors, ids, vectors[q], 3)]
        assert sorted(got[q]) == sorted(expect), q


def test_load_roundtrip_bit_identical(spark, emb, tmp_path):
    tp = TableProvider(spark, str(tmp_path))
    built = build_ann_index(emb, tp, dim=DIM, n_centroids=8)
    loaded = load_ann_index(tp)
    assert np.array_equal(built.centroids, loaded.centroids)
    q = emb.filter("vec_id < 3")
    a = sorted(map(tuple, ann_index_query(built, q, k=2, n_probe=2)
                   .collect()))
    b = sorted(map(tuple, ann_index_query(loaded, q, k=2, n_probe=2)
                   .collect()))
    assert a == b


def test_append_makes_batch_findable(spark, emb, vectors, tmp_path):
    tp = TableProvider(spark, str(tmp_path))
    corpus = emb.filter("vec_id >= 40")
    batch = emb.filter("vec_id < 40")
    idx = build_ann_index(corpus, tp, dim=DIM, n_centroids=8)
    stats = ann_index_append(idx, batch)
    assert stats["appended"] == 40
    assert sum(stats["per_cell"].values()) == 40
    # each appended vector must now find ITSELF at rank 1 even with a
    # single probed cell (its own cell is its nearest centroid)
    out = ann_index_query(idx, batch, k=1, n_probe=1).collect()
    assert len(out) == 40
    for r in out:
        assert r["vec_id"] == r["query_id"]
        assert r["cosine"] > 0.999999


def test_query_read_is_partition_pruned(spark, emb, tmp_path):
    tp = TableProvider(spark, str(tmp_path))
    idx = build_ann_index(emb, tp, dim=DIM, n_centroids=8)
    from pyspark.sql import functions as F
    pruned = tp.read("ann_index").filter(F.col("cell").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell" in plan.split("PartitionFilters", 1)[1][:200]


def test_load_missing_index_raises(spark, tmp_path):
    tp = TableProvider(spark, str(tmp_path))
    with pytest.raises(Exception):
        load_ann_index(tp, "nope")


def test_default_n_centroids_sqrt_rule():
    assert default_n_centroids(100) == 10
    assert default_n_centroids(10 ** 12) == 65536  # clamped
    assert default_n_centroids(3) == 4             # floor
