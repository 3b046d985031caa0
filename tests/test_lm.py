"""Unigram LM scoring — model counts/logps and per-doc scores verified
against straight Python/numpy on a hand-built corpus, including top-V
truncation tie-breaks, OOV accounting, and 0-token docs."""

import math

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.lm import doc_lm_scores, unigram_model

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat"),
    (2, "zz yy xx"),          # all-rare doc → low score
    (3, "   "),               # 0 tokens
    (4, "the the the"),
]
# counts: the×6 sat×2 cat,on,mat,dog,zz,yy,xx ×1 → N = 15


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string").cache()


def test_model_counts_and_logp(docs):
    m = {r["word"]: r for r in unigram_model(docs).collect()}
    assert m["the"]["cnt"] == 6 and m["sat"]["cnt"] == 2
    assert len(m) == 9
    n_total = sum(r["cnt"] for r in m.values())
    assert n_total == 15
    assert m["the"]["logp"] == pytest.approx(math.log(6 / 15), rel=1e-12)


def test_top_v_truncation_breaks_ties_on_word(docs):
    # 7 singletons tie at cnt=1; top_v=4 keeps the lexicographically
    # first two singletons after the/sat
    m = unigram_model(docs, top_v=4).collect()
    assert [r["word"] for r in m] == ["the", "sat", "cat", "dog"]
    # logp still normalizes by the FULL corpus N, not the kept head
    assert m[0]["logp"] == pytest.approx(math.log(6 / 15), rel=1e-12)


def test_doc_scores_exact_and_oov(docs):
    model = unigram_model(docs, top_v=4)   # vocab: the sat cat dog
    out = {r["doc_id"]: r for r in doc_lm_scores(docs, model).collect()}
    assert len(out) == 5
    r0 = out[0]  # the cat sat on the mat: in-vocab the,cat,sat,the
    assert (r0["n_tokens"], r0["n_oov"]) == (6, 2)
    assert r0["sum_cnt"] == 6 + 1 + 2 + 6
    assert r0["mean_cnt"] == pytest.approx(15 / 4)
    lp = {"the": math.log(6 / 15), "cat": math.log(1 / 15),
          "sat": math.log(2 / 15), "dog": math.log(1 / 15)}
    oov = math.log(1 / 15)  # default floor recovered from the head
    expect0 = (lp["the"] * 2 + lp["cat"] + lp["sat"] + oov * 2) / 6
    assert r0["mean_logp"] == pytest.approx(expect0, rel=1e-12)
    # all-OOV doc
    r2 = out[2]
    assert (r2["n_tokens"], r2["n_oov"], r2["sum_cnt"]) == (3, 3, 0)
    assert r2["mean_cnt"] is None
    assert r2["mean_logp"] == pytest.approx(oov, rel=1e-12)
    # 0-token doc keeps a row with zero counts and NULL means
    r3 = out[3]
    assert (r3["n_tokens"], r3["n_oov"], r3["sum_cnt"]) == (0, 0, 0)
    assert r3["mean_cnt"] is None and r3["mean_logp"] is None
    # fluent doc scores above the all-rare doc
    assert out[4]["mean_logp"] > out[2]["mean_logp"]


def test_explicit_oov_logp(docs):
    model = unigram_model(docs, top_v=4)
    out = {r["doc_id"]: r for r in
           doc_lm_scores(docs, model, oov_logp=-100.0).collect()}
    assert out[2]["mean_logp"] == pytest.approx(-100.0)


def test_broadcast_join_in_plan(docs):
    model = unigram_model(docs, top_v=4)
    plan = doc_lm_scores(docs, model)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan
