"""Duplicate token-span detection / scrubbing (operators/spans.py)."""

import pyspark.sql.functions as F
import pytest

from data_validation_spark.operators.spans import (
    duplicate_span_report,
    duplicate_token_spans,
    scrub_duplicate_spans,
    token_span_postings,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


@pytest.fixture(scope="module")
def cross_doc(spark):
    # doc 1 shares its [1,2,3,4] prefix with doc 0 → grams (1,2,3) and
    # (2,3,4) each occur twice; doc 0 holds both first occurrences
    return _df(spark, [(0, [1, 2, 3, 4, 5, 6]),
                       (1, [1, 2, 3, 4, 9, 9]),
                       (2, [7, 7, 7, 7, 7, 7])])


@pytest.mark.parametrize("hashed", [True, False])
def test_postings_positions(spark, hashed):
    rows = (token_span_postings(_df(spark, [(0, [1, 2, 3, 4])]), k=3,
                                hashed=hashed)
            .orderBy("__pos").collect())
    assert [r["__pos"] for r in rows] == [0, 1]
    if not hashed:
        assert [r["__gram"] for r in rows] == ["1,2,3", "2,3,4"]


@pytest.mark.parametrize("hashed", [True, False])
def test_short_and_null_docs_emit_nothing(spark, hashed):
    df = _df(spark, [(0, [1, 2]), (1, None), (2, [])])
    assert token_span_postings(df, k=3, hashed=hashed).count() == 0


@pytest.mark.parametrize("hashed", [True, False])
def test_cross_doc_first_occurrence_wins(spark, cross_doc, hashed):
    dup = duplicate_token_spans(cross_doc, k=3, hashed=hashed).collect()
    # doc 1 repeats doc 0's prefix grams; doc 2 (7×6) self-repeats its
    # single gram at pos 1..3 (pos 0 is the first occurrence)
    assert sorted((r["doc_id"], r["__pos"]) for r in dup) == \
        [(1, 0), (1, 1), (2, 1), (2, 2), (2, 3)]


def test_within_doc_repeat_keeps_one(spark):
    # gram (7,8,9) at pos 0 and 3 of the SAME doc → pos 3 is the dup
    df = _df(spark, [(0, [7, 8, 9, 7, 8, 9, 1])])
    dup = duplicate_token_spans(df, k=3).collect()
    assert [(r["doc_id"], r["__pos"]) for r in dup] == [(0, 3)]
    out = scrub_duplicate_spans(df, k=3).collect()[0]
    assert out["tokens"] == [7, 8, 9, 1]


def test_report_interval_union(spark, cross_doc):
    rep = {r["doc_id"]: r for r in
           duplicate_span_report(cross_doc, k=3).collect()}
    # doc 1: dup positions 0,1 → union of [0,3) ∪ [1,4) = 4 tokens
    assert (rep[1]["n_dup_spans"], rep[1]["dup_covered_tokens"]) == (2, 4)
    assert rep[1]["dup_token_frac"] == pytest.approx(4 / 6)
    assert (rep[0]["n_dup_spans"], rep[0]["dup_covered_tokens"]) == (0, 0)
    # doc 2 = 7×6: grams at pos 0..3 all "7,7,7"; first is pos 0, dups
    # at 1,2,3 → union of [1,4)∪[2,5)∪[3,6) = 5 tokens
    assert (rep[2]["n_dup_spans"], rep[2]["dup_covered_tokens"]) == (3, 5)


def test_report_disjoint_intervals(spark):
    # dup windows far apart must not merge: doc 1 copies doc 0's gram
    # at positions 0 and 6 (separated by unique filler > k)
    df = _df(spark, [(0, [1, 2, 3, 50, 51, 52, 53]),
                     (1, [1, 2, 3, 60, 61, 62, 1, 2, 3, 70])])
    rep = {r["doc_id"]: r for r in duplicate_span_report(df, k=3).collect()}
    # gram (1,2,3) occurs at (0,0),(1,0),(1,6); first is (0,0) → dup
    # positions of doc 1 are {0, 6}, whose windows [0,3) and [6,9) are
    # disjoint → covered = 6, not the merged 9
    assert (rep[1]["n_dup_spans"], rep[1]["dup_covered_tokens"]) == (2, 6)
    assert (rep[0]["n_dup_spans"], rep[0]["dup_covered_tokens"]) == (0, 0)


def test_scrub_cross_doc(spark, cross_doc):
    out = {r["doc_id"]: r["tokens"] for r in
           scrub_duplicate_spans(cross_doc, k=3).collect()}
    assert out[0] == [1, 2, 3, 4, 5, 6]          # first occurrences survive
    assert out[1] == [9, 9]                       # covered prefix removed
    assert out[2] == [7]                          # 7×6 → first window only


def test_scrub_null_and_empty(spark):
    df = _df(spark, [(0, None), (1, []), (2, [1, 2])])
    out = {r["doc_id"]: r["tokens"] for r in
           scrub_duplicate_spans(df, k=3).collect()}
    assert out[0] is None and out[1] == [] and out[2] == [1, 2]


def test_hashed_and_string_grams_agree(spark):
    from data_validation_spark.functions.text import words_col
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.select(
        "doc_id", F.transform(words_col("text"), F.length).alias("tokens"))
    a = duplicate_span_report(df, k=8, hashed=True)
    b = duplicate_span_report(df, k=8, hashed=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_against_bruteforce(spark):
    import random
    rng = random.Random(7)
    rows = [(i, [rng.randrange(4) for _ in range(rng.randrange(0, 20))])
            for i in range(30)]
    k = 3
    # brute force: first occurrence of each gram in (doc, pos) order
    occ = {}
    for i, toks in rows:
        for p in range(len(toks) - k + 1):
            occ.setdefault(tuple(toks[p:p + k]), []).append((i, p))
    dup = {x for v in occ.values() if len(v) > 1 for x in v[1:]}
    exp = {}
    for i, toks in rows:
        ps = sorted(p for d, p in dup if d == i)
        covered = set()
        for p in ps:
            covered.update(range(p, p + k))
        exp[i] = (len(toks), len(ps), len(covered))
    got = {r["doc_id"]: (r["n_tok"], r["n_dup_spans"],
                         r["dup_covered_tokens"])
           for r in duplicate_span_report(_df(spark, rows), k=k).collect()}
    assert got == exp
    # scrub parity too
    exp_scrub = {}
    for i, toks in rows:
        cov = {x for p in (p for d, p in dup if d == i)
               for x in range(p, p + k)}
        exp_scrub[i] = [t for j, t in enumerate(toks) if j not in cov]
    got_scrub = {r["doc_id"]: r["tokens"] for r in
                 scrub_duplicate_spans(_df(spark, rows), k=k).collect()}
    assert got_scrub == exp_scrub
