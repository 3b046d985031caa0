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
