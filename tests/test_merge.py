"""merge_profiles — shard-level profiling then a data-free driver fold
must equal profiling the whole table directly (the distributed-profiling
invariant: profile where the data lands, merge the KB artifacts)."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.profile import build_profile, merge_profiles
from data_validation_spark.plans.suite import Component, Profile


COMPS = [Component("n_tok", "numeric"), Component("source", "categoric"),
         Component("tokens", "tokens")]


@pytest.fixture(scope="module")
def halves(spark, sequences):
    a = sequences.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0)
    b = sequences.filter(F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 1)
    return a, b


def test_merge_equals_direct_build(spark, sequences, halves):
    a, b = halves
    direct = build_profile(sequences, COMPS, name="direct")
    merged = merge_profiles(
        [build_profile(a, COMPS), build_profile(b, COMPS)], name="merged")

    sd, sm = direct.components["n_tok"].stats, merged.components["n_tok"].stats
    assert (sd.n, sd.min, sd.max) == (sm.n, sm.min, sm.max)
    assert sm.mean == pytest.approx(sd.mean, rel=1e-12)
    assert sm.std == pytest.approx(sd.std, rel=1e-12)
    # integral component retained its histogram -> quantiles merge EXACTLY
    assert sd.hist is not None and sm.hist == sd.hist
    assert sm.quantiles == sd.quantiles

    cd, cm = direct.components["source"].stats, merged.components["source"].stats
    assert cm.counts == cd.counts and cm.n == cd.n

    td, tm = direct.components["tokens"].stats, merged.components["tokens"].stats
    assert (td.n, td.elem_min, td.elem_max) == (tm.n, tm.elem_min, tm.elem_max)
    assert tm.pinv == pytest.approx(td.pinv, abs=1e-12)


def test_merge_partition_union_and_overlap(spark, sequences, halves):
    a, b = halves
    pcols = ["source"]
    direct = build_profile(sequences, COMPS, partition_cols=pcols)
    merged = merge_profiles([build_profile(a, COMPS, partition_cols=pcols),
                             build_profile(b, COMPS, partition_cols=pcols)])
    # every source appears in both halves -> same label set, merged stats
    assert set(merged.partitions) == set(direct.partitions)
    for label in direct.partitions:
        sd = direct.partitions[label]["n_tok"].stats
        sm = merged.partitions[label]["n_tok"].stats
        assert (sd.n, sd.min, sd.max) == (sm.n, sm.min, sm.max)
        assert sm.mean == pytest.approx(sd.mean, rel=1e-12)
        cd = direct.partitions[label]["source"].stats
        cm = merged.partitions[label]["source"].stats
        assert cm.counts == cd.counts

    # disjoint partition labels union untouched
    only_a = build_profile(a.filter(F.col("source") == "web"), COMPS,
                           partition_cols=pcols)
    only_b = build_profile(b.filter(F.col("source") == "code"), COMPS,
                           partition_cols=pcols)
    u = merge_profiles([only_a, only_b])
    assert set(u.partitions) == {"source=web", "source=code"}
    assert u.partitions["source=web"]["n_tok"].stats.n == \
        only_a.partitions["source=web"]["n_tok"].stats.n


def test_merge_survives_jcr_round_trip(spark, halves):
    """Artifacts travel as JSON between jobs: merge(load(save(p)))
    must equal merge(p) — hist keys included."""
    a, b = halves
    pa, pb = build_profile(a, COMPS), build_profile(b, COMPS)
    pa2 = Profile.from_json(pa.to_json())
    pb2 = Profile.from_json(pb.to_json())
    m1 = merge_profiles([pa, pb])
    m2 = merge_profiles([pa2, pb2])
    assert m1.to_json() == m2.to_json()
    # and the merged artifact itself round-trips
    assert Profile.from_json(m1.to_json()).to_json() == m1.to_json()


def test_merge_is_associative_on_exact_fields(spark, sequences):
    thirds = [sequences.filter(F.pmod(F.xxhash64("doc_id"), F.lit(3)) == i)
              for i in range(3)]
    ps = [build_profile(t, COMPS) for t in thirds]
    left = merge_profiles([merge_profiles(ps[:2]), ps[2]])
    flat = merge_profiles(ps)
    sl, sf_ = left.components["n_tok"].stats, flat.components["n_tok"].stats
    assert (sl.n, sl.min, sl.max, sl.hist) == (sf_.n, sf_.min, sf_.max, sf_.hist)
    assert sl.quantiles == sf_.quantiles  # exact via summed hist
    assert sl.mean == pytest.approx(sf_.mean, rel=1e-12)
    cl = left.components["source"].stats.counts
    cf = flat.components["source"].stats.counts
    assert cl == cf


def test_merge_rejects_mismatched_components(spark, halves):
    a, b = halves
    pa = build_profile(a, [Component("n_tok", "numeric")])
    pb = build_profile(b, [Component("source", "categoric")])
    with pytest.raises(ValueError, match="component sets differ"):
        merge_profiles([pa, pb])
