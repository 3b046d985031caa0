"""Sequence-packing plan: hand-computed offsets/pack ids, straddle
detection, NULL/zero token handling, per-stream independence, and the
single-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.packing import (
    pack_assignments,
    pack_stats,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # stream A: 5, 6 (straddles at C=8), 3, then NULL and 0
        (0, "A", 5), (1, "A", 6), (2, "A", 3), (3, "A", None), (4, "A", 0),
        # stream B: exact multiples
        (10, "B", 8), (11, "B", 8),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tok int").cache()


def test_hand_computed_plan(docs):
    out = {r["doc_id"]: r for r in
           pack_assignments(docs, context_len=8).collect()}
    # stream A concatenated stream: [0,5) [5,11) [11,14)
    assert (out[0]["stream_offset"], out[0]["pack_id"],
            out[0]["pack_offset"], out[0]["n_packs_spanned"]) == (0, 0, 0, 1)
    assert (out[1]["stream_offset"], out[1]["pack_id"],
            out[1]["pack_offset"], out[1]["n_packs_spanned"]) == (5, 0, 5, 2)
    assert (out[2]["stream_offset"], out[2]["pack_id"],
            out[2]["pack_offset"], out[2]["n_packs_spanned"]) == (11, 1, 3, 1)
    # NULL / zero length contribute nothing and span nothing
    assert out[3]["n_packs_spanned"] == 0 and out[3]["stream_offset"] == 14
    assert out[4]["n_packs_spanned"] == 0
    # stream B independent: starts back at offset 0, no straddles
    assert (out[10]["stream_offset"], out[10]["n_packs_spanned"]) == (0, 1)
    assert (out[11]["stream_offset"], out[11]["pack_id"],
            out[11]["pack_offset"], out[11]["n_packs_spanned"]) == (8, 1, 0, 1)


def test_pack_stats(docs):
    s = {r["source"]: r for r in pack_stats(docs, context_len=8).collect()}
    a, b = s["A"], s["B"]
    assert (a["total_tokens"], a["n_docs"], a["n_straddling"],
            a["n_packs"]) == (14, 5, 1, 2)
    assert a["tail_fill"] == pytest.approx(6 / 8)
    assert (b["total_tokens"], b["n_packs"], b["n_straddling"]) == (16, 2, 0)
    assert b["tail_fill"] == 1.0      # exact multiple fills its tail


def test_deterministic_and_order_driven(docs):
    a = sorted(map(tuple, pack_assignments(docs, 8).collect()))
    b = sorted(map(tuple, pack_assignments(docs, 8).collect()))
    assert a == b
    # dropping the first doc shifts every later offset by its length —
    # membership is order-dependent BY DESIGN (stream semantics)
    out = {r["doc_id"]: r["stream_offset"] for r in
           pack_assignments(docs.where(F.col("doc_id") != 0), 8).collect()}
    assert out[1] == 0 and out[2] == 6


def test_single_shuffle_plan(docs):
    plan = pack_assignments(docs, 8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_context_len_validation(docs):
    with pytest.raises(ValueError):
        pack_assignments(docs, 0)


def test_chunk_tokens_windows(spark):
    from pyspark.sql import functions as F

    from data_validation_spark.operators.packing import chunk_tokens
    df = spark.createDataFrame(
        [("a", list(range(10))), ("b", list(range(3))), ("c", []),
         ("d", None)],
        "doc_id string, tokens array<int>")
    # non-overlapping size 4: a -> [0..3][4..7][8..9]; b -> [0..2]
    out = chunk_tokens(df, chunk_size=4)
    rows = {(r["doc_id"], r["chunk_id"]):
            (r["chunk_start"], r["chunk_len"], r["chunk_tokens"])
            for r in out.collect()}
    assert rows[("a", 0)] == (0, 4, [0, 1, 2, 3])
    assert rows[("a", 2)] == (8, 2, [8, 9])
    assert rows[("b", 0)] == (0, 3, [0, 1, 2])
    assert set(r[0] for r in rows) == {"a", "b"}  # empty/NULL: no chunks
    # overlapping stride 2: starts 0,2,4,6,8; min_chunk trims dup tails
    ov = chunk_tokens(df.filter("doc_id = 'a'"), chunk_size=4, stride=2,
                      min_chunk=3)
    got = [(r["chunk_start"], r["chunk_tokens"]) for r in
           ov.orderBy("chunk_id").collect()]
    assert got == [(0, [0, 1, 2, 3]), (2, [2, 3, 4, 5]),
                   (4, [4, 5, 6, 7]), (6, [6, 7, 8, 9])]
    # no shuffle in the plan — chunking is a pure projection
    plan = chunk_tokens(df, chunk_size=4)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
