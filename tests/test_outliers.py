"""Embedding outliers (operators/outliers.py): hand-computed ranking,
partition-invariance of the exact centroid math, tie determinism, and
NULL handling."""

import math

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.outliers import embedding_outliers

SCHEMA = "vec_id long, label long, embedding array<float>"


@pytest.fixture(scope="module")
def vecs(spark):
    # label 0: 4 points near the origin + one far point (id 4) and one
    # medium point (id 3); label 1: two mirrored points, equidistant
    rows = [
        (0, 0, [0.0, 0.0]), (1, 0, [0.1, 0.0]), (2, 0, [0.0, 0.1]),
        (3, 0, [1.0, 1.0]), (4, 0, [5.0, 5.0]),
        (10, 1, [1.0, 0.0]), (11, 1, [-1.0, 0.0]),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_ranking_and_distance(spark, vecs):
    out = {(r.label, r["rank"]): (r.vec_id, r.dist)
           for r in embedding_outliers(vecs, top_k=2).collect()}
    # centroid ~(1.22, 1.22): the far point ranks 1, the ORIGIN (not
    # the medium point) ranks 2 — it is farther than (1,1)
    assert out[(0, 1)][0] == 4 and out[(0, 2)][0] == 0
    # centroid of label 0 = (1.22, 1.22)/5; dist of id 4 computed
    # from the quantized integers exactly as the operator defines it
    cx = (0 + 100000 + 0 + 1000000 + 5000000) / 5 / 1e6
    cy = (0 + 0 + 100000 + 1000000 + 5000000) / 5 / 1e6
    expected = round(math.hypot(5 - cx, 5 - cy), 6)
    assert out[(0, 1)][1] == pytest.approx(expected, abs=2e-6)


def test_equidistant_tie_breaks_by_id(spark, vecs):
    out = {(r.label, r["rank"]): r.vec_id
           for r in embedding_outliers(vecs, top_k=2).collect()}
    assert out[(1, 1)] == 10 and out[(1, 2)] == 11


def test_partition_invariance_bit_exact(spark, vecs):
    """Integer moments are associative — any partitioning yields the
    identical result rows (the property float centroids lack)."""
    a = sorted(map(tuple, embedding_outliers(
        vecs.repartition(1), top_k=7).collect()))
    b = sorted(map(tuple, embedding_outliers(
        vecs.repartition(32), top_k=7).collect()))
    assert a == b


def test_null_vectors_ignored(spark):
    rows = [(0, 0, [0.0, 0.0]), (1, 0, [1.0, 1.0]), (2, 0, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    out = embedding_outliers(df, top_k=10).collect()
    assert sorted(r.vec_id for r in out) == [0, 1]


def test_moment_shuffle_is_the_only_wide_one(spark, vecs):
    plan = (embedding_outliers(vecs, top_k=2)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan  # centroid joins broadcast


# -- embedding_centroid_drift -------------------------------------------------

def test_centroid_drift_identical_and_opposite(spark):
    from data_validation_spark.operators.outliers import (
        embedding_centroid_drift)
    a = spark.createDataFrame([(i, [1.0, 0.0]) for i in range(5)],
                              "vec_id long, embedding array<float>")
    b = spark.createDataFrame([(i, [2.0, 0.0]) for i in range(10)],
                              "vec_id long, embedding array<float>")
    r = embedding_centroid_drift(a, b).collect()[0]
    # same direction, ref magnitude 2x -> cosine 1, ratio 0.5
    assert (r.n_cur, r.n_ref, r.dims) == (5, 10, 2)
    assert r.centroid_cosine == 1.0 and r.norm_ratio == 0.5

    c = spark.createDataFrame([(0, [-1.0, 0.0])],
                              "vec_id long, embedding array<float>")
    r2 = embedding_centroid_drift(a, c).collect()[0]
    assert r2.centroid_cosine == -1.0


def test_centroid_drift_orthogonal_and_zero(spark):
    from data_validation_spark.operators.outliers import (
        embedding_centroid_drift)
    a = spark.createDataFrame([(0, [1.0, 0.0])],
                              "vec_id long, embedding array<float>")
    b = spark.createDataFrame([(0, [0.0, 1.0])],
                              "vec_id long, embedding array<float>")
    assert embedding_centroid_drift(a, b).collect()[0] \
        .centroid_cosine == 0.0
    z = spark.createDataFrame([(0, [0.0, 0.0])],
                              "vec_id long, embedding array<float>")
    r = embedding_centroid_drift(a, z).collect()[0]
    assert r.centroid_cosine is None and r.norm_ratio is None


def test_centroid_drift_matches_numpy(spark):
    import numpy as np
    from data_validation_spark.operators.outliers import (
        embedding_centroid_drift)
    rng = np.random.RandomState(3)
    va = rng.randn(40, 8).astype("float32")
    vb = (rng.randn(30, 8) + 0.5).astype("float32")
    a = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(va)],
        "vec_id long, embedding array<float>")
    b = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(vb)],
        "vec_id long, embedding array<float>")
    r = embedding_centroid_drift(a, b).collect()[0]
    qa = np.round(va.astype("float64") * 1e6).sum(axis=0)
    qb = np.round(vb.astype("float64") * 1e6).sum(axis=0)
    exp = float(qa @ qb / (np.linalg.norm(qa) * np.linalg.norm(qb)))
    assert abs(r.centroid_cosine - round(exp, 6)) <= 1e-6
