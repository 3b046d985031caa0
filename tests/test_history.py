"""SCD2 interval builder: collapse semantics, interval chaining,
determinism, point-in-time reconstruction, single-Exchange plan."""

import pytest

from data_validation_spark.operators.history import (
    as_of_snapshot, scd2_intervals)


@pytest.fixture(scope="module")
def stream(spark):
    # (key, ts, seq, status, tier) — restatements, a revert, NULLs
    rows = [
        ("k1", 10, 1, "A", "gold"),
        ("k1", 20, 2, "A", "gold"),     # restated → collapses
        ("k1", 30, 3, "B", "gold"),     # status change → v2
        ("k1", 40, 4, "B", "gold"),     # restated → collapses
        ("k1", 50, 5, "A", "gold"),     # REVERT → v3 (not deduped)
        ("k2", 15, 6, "A", "silver"),   # single-record key
        ("k3", 10, 7, None, "gold"),    # NULL attr opens history
        ("k3", 20, 8, None, "gold"),    # NULL == NULL → collapses
        ("k3", 30, 9, "X", None),       # both attrs flip → v2
        ("k3", 40, 10, None, "gold"),   # flip back to NULLs → v3
    ]
    return spark.createDataFrame(
        rows, "key string, ts long, seq long, status string, "
              "tier string")


def _hist(stream):
    return scd2_intervals(stream, ["key"], "ts", ["status", "tier"],
                          order_cols=("seq",))


def test_collapse_and_versions(stream):
    out = {(r.key, r.version): r for r in _hist(stream).collect()}
    assert len(out) == 7                      # 3 + 1 + 3 versions
    k1 = [out[("k1", v)] for v in (1, 2, 3)]
    assert [r.status for r in k1] == ["A", "B", "A"]
    assert [r.valid_from for r in k1] == [10, 30, 50]
    assert [r.valid_to for r in k1] == [30, 50, None]
    assert [r.is_current for r in k1] == [False, False, True]
    k2 = out[("k2", 1)]
    assert (k2.valid_from, k2.valid_to, k2.is_current) == (15, None,
                                                           True)
    k3 = [out[("k3", v)] for v in (1, 2, 3)]
    assert [(r.status, r.tier) for r in k3] == [
        (None, "gold"), ("X", None), (None, "gold")]
    assert [r.valid_to for r in k3] == [30, 40, None]


def test_intervals_chain_exactly(stream):
    """Every non-final valid_to equals the next version's valid_from —
    no gaps, no overlaps."""
    rows = sorted(_hist(stream).collect(),
                  key=lambda r: (r.key, r.version))
    for a, b in zip(rows, rows[1:]):
        if a.key == b.key:
            assert a.valid_to == b.valid_from


def test_duplicate_ts_deterministic(spark):
    """Same-instant rows order by order_cols: the LAST by seq wins the
    instant, and reruns agree."""
    df = spark.createDataFrame(
        [("k", 10, 2, "B"), ("k", 10, 1, "A"), ("k", 20, 3, "C")],
        "key string, ts long, seq long, status string")
    out = scd2_intervals(df, ["key"], "ts", ["status"],
                         order_cols=("seq",))
    got = [(r.version, r.status, r.valid_from, r.valid_to)
           for r in sorted(out.collect(), key=lambda r: r.version)]
    assert got == [(1, "A", 10, 10), (2, "B", 10, 20),
                   (3, "C", 20, None)]


def test_as_of_snapshot(stream):
    hist = _hist(stream)
    # at t=35: k1 is B (v2), k2 is A, k3 is X (v2)
    snap = {r.key: r for r in as_of_snapshot(hist, 35).collect()}
    assert snap["k1"].status == "B" and snap["k1"].version == 2
    assert snap["k2"].status == "A"
    assert snap["k3"].status == "X"
    # at t=5: before every interval → empty
    assert as_of_snapshot(hist, 5).count() == 0
    # boundary: at == valid_from matches the NEW version
    assert as_of_snapshot(hist, 30).where("key='k1'") \
        .collect()[0].status == "B"


def test_single_exchange(stream):
    plan = _hist(stream)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_requires_attrs(stream):
    with pytest.raises(ValueError):
        scd2_intervals(stream, ["key"], "ts", [])
