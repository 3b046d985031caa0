"""SemDeDup semantic dedup (operators/semantic.py): within-cluster
pair kernel vs numpy brute force, closure labeling, oversize guard,
IVF-cell production path."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.semantic import (
    cluster_near_pairs,
    oversize_clusters,
    semantic_dedup,
)


def _mk(spark, vecs, clusters):
    rows = [(i, [float(x) for x in v], int(c))
            for i, (v, c) in enumerate(zip(vecs, clusters))]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster int")


@pytest.fixture()
def clustered(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(6, 8)).astype(np.float32)
    vecs, clusters = [], []
    for i, b in enumerate(base):
        vecs.append(b)                     # original
        vecs.append(b * 2.0)               # exact-direction dup (cos=1)
        vecs.append(b + rng.normal(scale=3.0, size=8).astype(np.float32))
        clusters += [i % 3] * 3
    return _mk(spark, vecs, clusters)


def test_pairs_match_numpy_bruteforce(spark, clustered):
    got = {(r.id_a, r.id_b) for r in
           cluster_near_pairs(clustered, "cluster",
                              threshold=0.999).collect()}
    pdf = clustered.toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1)[:, None]
    want = set()
    for a in range(len(pdf)):
        for b in range(a + 1, len(pdf)):
            if (pdf["cluster"][a] == pdf["cluster"][b]
                    and mat[a] @ mat[b] >= 0.999):
                want.add((pdf["vec_id"][a], pdf["vec_id"][b]))
    assert got == want and len(want) >= 6   # the 6 scaled twins at least


def test_cross_cluster_pairs_not_emitted(spark):
    v = [1.0] * 8
    df = _mk(spark, [v, v], [0, 1])   # identical vectors, different cells
    assert cluster_near_pairs(df, "cluster").count() == 0


def test_semantic_dedup_labels(spark, clustered):
    out = semantic_dedup(clustered, "cluster", threshold=0.999)
    rows = {r.vec_id: r for r in out.collect()}
    assert len(rows) == clustered.count()
    # every scaled twin (3i, 3i+1) shares a component labeled min id
    for i in range(6):
        a, b = rows[3 * i], rows[3 * i + 1]
        assert a.cluster_id == b.cluster_id == 3 * i
        assert a.is_canonical and not b.is_canonical
    # canonical rows = number of components; sizes sum to N
    assert sum(r.cluster_size for r in rows.values() if r.is_canonical) \
        == clustered.count()


def test_oversize_error_and_skip(spark):
    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(30, 4))
    df = _mk(spark, vecs, [0] * 20 + [1] * 10)
    over = oversize_clusters(df, "cluster", max_cluster_rows=16)
    assert [(r.cluster, r.n_rows) for r in over.collect()] == [(0, 20)]
    with pytest.raises(Exception, match="max_cluster_rows"):
        cluster_near_pairs(df, "cluster", max_cluster_rows=16).count()
    stats = {}
    out = semantic_dedup(df, "cluster", threshold=0.999,
                         max_cluster_rows=16, on_oversize="skip",
                         stats_out=stats)
    # oversize cluster rows survive as singletons, counted
    assert out.count() == 30
    assert stats == {"n_oversize_clusters": 1, "n_oversize_rows": 20}


def test_semantic_dedup_over_ivf_cells(spark):
    """Production path: cluster col = IVF cell assignment from the
    repo's deterministic k-means."""
    from data_validation_spark.operators.similarity import (
        ivf_centroids, ivf_index)
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 8)) * 10
    vecs = []
    # noise scale 2.0: distinct members of a cell sit at cosine ~0.997
    # (clearly below the 0.9999 threshold, so they never merge) while
    # each scaled twin pair is at ~1 - 1e-8 (clearly above)
    for i in range(40):
        v = centers[i % 4] + rng.normal(scale=2.0, size=8)
        vecs.append(v)
    vecs = np.array(vecs)
    dup = vecs.copy() * 1.5                      # 40 exact-direction dups
    allv = np.vstack([vecs, dup])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(allv)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_centroids(df, dim=8, n_centroids=4, n_iters=2)
    idx = ivf_index(df, cents)
    out = semantic_dedup(idx, "cell", threshold=0.9999)
    rows = {r.vec_id: r for r in out.collect()}
    # every (i, i+40) scaled pair maps to the same cell (identical
    # direction ⇒ identical argmax) and must share a component
    ok = sum(1 for i in range(40)
             if rows[i].cluster_id == rows[i + 40].cluster_id == i)
    assert ok == 40
    assert sum(r.is_canonical for r in rows.values()) == out.count() - 40


def test_cluster_col_string_type(spark):
    """The pair kernel's output schema follows the cluster column's
    type — exercise a string cluster key (e.g. a source/domain)."""
    v = [1.0, 0.0, 0.0, 0.0]
    rows = [(0, v, "en"), (1, v, "en"), (2, v, "de")]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, cluster string")
    pairs = cluster_near_pairs(df, "cluster").collect()
    assert [(p.cluster, p.id_a, p.id_b) for p in pairs] == [("en", 0, 1)]
    out = {r.vec_id: r.cluster_id
           for r in semantic_dedup(df, "cluster").collect()}
    assert out == {0: 0, 1: 0, 2: 2}


def test_multiprobe_recovers_cross_boundary_pair(spark):
    """VERDICT r3 #7: a planted near-identical pair straddling a
    Voronoi boundary — single-probe SemDeDup misses it by design,
    top-2 multi-probe must recover it."""
    import numpy as np
    from data_validation_spark.operators.semantic import (
        semantic_dedup, semantic_dedup_multiprobe)
    from data_validation_spark.operators.similarity import ivf_index
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    # a is nearest c0, b nearest c1, cosine(a,b) ~ 0.9999995
    rows = [(1, [1.0, 0.999]), (2, [0.999, 1.0]),
            (3, [1.0, 0.001]), (4, [0.001, 1.0])]   # cell anchors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    single = ivf_index(df, cents)
    cells = {r.vec_id: r.cell for r in single.collect()}
    assert cells[1] != cells[2]        # the planted pair IS split

    res1 = semantic_dedup(single, "cell", threshold=0.999)
    one = {r.vec_id: r.cluster_id for r in res1.collect()}
    assert one[1] != one[2]            # documented single-probe miss

    res2 = semantic_dedup_multiprobe(df, cents, threshold=0.999,
                                     n_probe=2)
    out = {r.vec_id: r for r in res2.collect()}
    assert out[1].cluster_id == out[2].cluster_id == 1
    assert out[1].cluster_size == 2 and out[1].is_canonical
    assert not out[2].is_canonical
    # anchors stay singletons; sizes not inflated by the expansion
    assert out[3].cluster_size == 1 and out[4].cluster_size == 1


def test_multiprobe_matches_singleprobe_when_no_boundary_pairs(spark):
    """On well-separated duplicates the multi-probe path must return
    the exact same clustering (the distinct() kills the doubled
    pairs)."""
    import numpy as np
    from data_validation_spark.operators.semantic import (
        semantic_dedup, semantic_dedup_multiprobe)
    from data_validation_spark.operators.similarity import ivf_index
    rng = np.random.default_rng(7)
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    rows = []
    for i in range(40):
        base = np.array([1.0, 0.0]) if i % 2 else np.array([0.0, 1.0])
        v = base + rng.normal(0, 0.01, 2)
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 1000, [float(x) for x in v]))  # exact dup
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = {(r.vec_id, r.cluster_id, r.cluster_size, r.is_canonical)
         for r in semantic_dedup(ivf_index(df, cents), "cell",
                                 threshold=0.9999).collect()}
    b = {(r.vec_id, r.cluster_id, r.cluster_size, r.is_canonical)
         for r in semantic_dedup_multiprobe(df, cents,
                                            threshold=0.9999,
                                            n_probe=2).collect()}
    assert a == b
