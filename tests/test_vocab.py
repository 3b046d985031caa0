"""Vocabulary drift between snapshots (operators/vocab.py)."""

import math

import pyspark.sql.functions as F
import pytest

from data_validation_spark.operators.vocab import (
    unit_counts,
    vocab_drift_frame,
    vocab_drift_summary,
    vocab_top_movers,
)


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(
        [(start_id + i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def _unit():
    from data_validation_spark.functions.text import words_col
    return words_col("text")


def test_unit_counts(spark):
    df = _docs(spark, ["a a b", "b c"])
    got = {r["token"]: r["cnt"] for r in unit_counts(df, _unit()).collect()}
    assert got == {"a": 2, "b": 2, "c": 1}


def test_identical_snapshots_zero_drift(spark):
    df = _docs(spark, ["a a b c", "d e f a"])
    row = vocab_drift_summary(df, df, _unit()).collect()[0]
    assert int(row["tv_num4"]) == 0
    assert row["tv"] == 0.0
    assert row["kl_ab"] == pytest.approx(0.0, abs=1e-12)
    assert not row["drifted"]


def test_known_small_example(spark):
    # cur = {a:2, b:1}, ref = {a:1, b:2}; V=2, Na=Nb=3
    # smoothed p=(5/8,3/8), q=(3/8,5/8)
    cur, ref = _docs(spark, ["a a b"]), _docs(spark, ["a b b"])
    row = vocab_drift_summary(cur, ref, _unit()).collect()[0]
    assert (row["vocab_joint"], row["n_tokens_a"], row["n_tokens_b"]) \
        == (2, 3, 3)
    # per token |(2ca+1)(2Nb+V) − (2cb+1)(2Na+V)| = |5·8 − 3·8| = 16
    assert int(row["tv_num4"]) == 32
    assert row["tv"] == pytest.approx(32 / (2 * 8 * 8))
    exp_kl = 5 / 8 * math.log((5 / 8) / (3 / 8)) \
        + 3 / 8 * math.log((3 / 8) / (5 / 8))
    assert row["kl_ab"] == pytest.approx(exp_kl, rel=1e-12)
    assert row["drifted"]  # tv = 0.25 > 0.1


def test_disjoint_vocab(spark):
    cur, ref = _docs(spark, ["a a"]), _docs(spark, ["b b"])
    row = vocab_drift_summary(cur, ref, _unit()).collect()[0]
    # V=2, Na=Nb=2; smoothed p=(5/6,1/6), q=(1/6,5/6) → tv = 2/3
    assert row["tv"] == pytest.approx(2 / 3)
    assert row["drifted"]


def test_kl_matches_numpy_on_random_counts(spark):
    import numpy as np
    rng = np.random.default_rng(11)
    toks = list("abcdefghij")
    cur = _docs(spark, [" ".join(rng.choice(toks, size=40))
                        for _ in range(20)])
    ref = _docs(spark, [" ".join(rng.choice(toks[2:], size=35))
                        for _ in range(20)], start_id=100)
    row = vocab_drift_summary(cur, ref, _unit()).collect()[0]
    ca = {r["token"]: r["cnt"] for r in
          unit_counts(cur, _unit()).collect()}
    cb = {r["token"]: r["cnt"] for r in
          unit_counts(ref, _unit()).collect()}
    vocab = sorted(set(ca) | set(cb))
    v = len(vocab)
    na, nb = sum(ca.values()), sum(cb.values())
    p = np.array([(2 * ca.get(t, 0) + 1) / (2 * na + v) for t in vocab])
    q = np.array([(2 * cb.get(t, 0) + 1) / (2 * nb + v) for t in vocab])
    assert row["kl_ab"] == pytest.approx(float(np.sum(p * np.log(p / q))),
                                         rel=1e-9)
    assert row["tv"] == pytest.approx(0.5 * float(np.abs(p - q).sum()),
                                      rel=1e-9)


def test_top_movers_ranking_and_ties(spark):
    # Na = Nb = 6 → shift_num = 6·|ca − cb|; c moves most, then b;
    # a and d tie at 0 → token asc breaks the tie
    cur = _docs(spark, ["a a b b b c"])            # a2 b3 c1, Na=6
    ref = _docs(spark, ["a a b c c c"])            # a2 b1 c3, Nb=6
    rows = vocab_top_movers(cur, ref, _unit(), k=3).collect()
    assert [(r["rank"], r["token"]) for r in rows] == \
        [(1, "b"), (2, "c"), (3, "a")]
    assert [int(r["shift_num"]) for r in rows] == [12, 12, 0]
    # b vs c tie on |shift| = 12 → 'b' < 'c'


def test_token_id_unit(spark):
    cur = spark.createDataFrame([(0, [1, 1, 2])],
                                "doc_id long, tokens array<int>")
    ref = spark.createDataFrame([(0, [1, 2, 2])],
                                "doc_id long, tokens array<int>")
    row = vocab_drift_summary(cur, ref, F.col("tokens")).collect()[0]
    assert int(row["tv_num4"]) == 32 and row["tv"] == pytest.approx(0.25)


def test_plan_has_no_window_over_vocab(spark):
    cur = _docs(spark, ["a b c"] * 4)
    plan = vocab_top_movers(cur, cur, _unit(), k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bigram_pmi_matches_bruteforce(spark):
    """PMI ranks glue pairs of RARE words above frequent-word bigrams;
    result replayed exactly (rank keys, counts, 6-dp pmi) in python."""
    import math
    from data_validation_spark.operators.vocab import bigram_pmi_topk
    docs = (["the cat sat on the mat"] * 10
            + ["san francisco"] * 4
            + ["the the the"] * 5
            + ["new york city"] * 3
            + ["solo"] * 7          # 1-word docs: tokens yes, pairs no
            + ["   ", None])        # blank/NULL: dropped entirely
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    got = [(r.w1, r.w2, r.c_xy, r.c1, r.c2, r.rank_key, r.pmi)
           for r in bigram_pmi_topk(df, min_count=3, k=5).collect()]

    toks = [t.split() for t in docs if t and t.strip()]
    n_tokens = sum(len(w) for w in toks)
    n_pairs = sum(len(w) - 1 for w in toks)
    uni, bi = {}, {}
    for w in toks:
        for x in w:
            uni[x] = uni.get(x, 0) + 1
        for a, b in zip(w, w[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    cand = [(a, b, c, uni[a], uni[b],
             c * 10**12 // (uni[a] * uni[b]))
            for (a, b), c in bi.items() if c >= 3]
    cand.sort(key=lambda t: (-t[5], t[0], t[1]))
    want = [t + (round(math.log((t[2] / n_pairs)
                                / ((t[3] / n_tokens)
                                   * (t[4] / n_tokens))), 6),)
            for t in cand[:5]]
    assert got == want
    # the glue pair outranks every 'the *' bigram despite lower count
    assert got[0][:2] in {("san", "francisco"), ("new", "york"),
                          ("york", "city")}


def test_bigram_pmi_no_vocab_wide_window(spark):
    from data_validation_spark.operators.vocab import bigram_pmi_topk
    df = spark.createDataFrame([("a b a b",)], "text string")
    plan = bigram_pmi_topk(df)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


# -- tfidf_distinctive_terms --------------------------------------------------

def test_tfidf_distinctive_ranking(spark):
    from data_validation_spark.operators.vocab import (
        tfidf_distinctive_terms)
    rows = [
        ("s1", "alpha alpha alpha shared shared"),
        ("s1", "alpha beta"),
        ("s2", "gamma gamma shared"),
        ("s2", "shared shared beta"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = tfidf_distinctive_terms(df, "source", "text", top_k=2)
    got = {(r.group, r.rank): r for r in out.collect()}
    # s1: alpha tf=4 df=1 -> 4e6; shared tf=2 df=2 -> 1e6; beta tf=1
    # df=2 -> 5e5
    assert got[("s1", 1)].term == "alpha"
    assert got[("s1", 1)].score_micro == 4_000_000
    assert got[("s1", 2)].term == "shared"
    assert got[("s1", 2)].score_micro == 1_000_000
    # s2: gamma tf=2 df=1 -> 2e6 beats shared tf=3 df=2 -> 1.5e6
    assert got[("s2", 1)].term == "gamma"
    assert got[("s2", 2)].term == "shared"
    assert got[("s2", 2)].score_micro == 1_500_000


def test_tfidf_min_tf_drops_tail_and_rescopes_df(spark):
    from data_validation_spark.operators.vocab import (
        tfidf_distinctive_terms)
    rows = [("s1", "rare common common"), ("s2", "rare rare common")]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {(r.group, r.term): r for r in
           tfidf_distinctive_terms(df, "source", "text", top_k=5,
                                   min_tf=2).collect()}
    # s1's rare (tf=1) is gone; s2's rare survives and its group-df
    # counts only groups clearing the floor -> df=1
    assert ("s1", "rare") not in out
    assert out[("s2", "rare")].n_groups_with_term == 1
    assert out[("s2", "rare")].score_micro == 2_000_000


def test_tfidf_tie_break_deterministic(spark):
    from data_validation_spark.operators.vocab import (
        tfidf_distinctive_terms)
    df = spark.createDataFrame([("s1", "zeta apple zeta apple")],
                               "source string, text string")
    out = tfidf_distinctive_terms(df, "source", "text", top_k=2).collect()
    # equal scores -> term ASC
    assert [r.term for r in sorted(out, key=lambda r: r.rank)] \
        == ["apple", "zeta"]
