"""Filter acceptance report: per-filter and all-pass counts, NULL=fail
semantics, report/apply consistency."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.filters import (
    acceptance_report,
    apply_filters,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, "a", 10, "en"), (2, "a", 100, "en"), (3, "a", 100, "xx"),
            (4, "b", 300, "en"), (5, "b", None, "en"), (6, "b", 100, None)]
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_chars int, lang string").cache()


def preds():
    return {
        "len_ok": (F.col("n_chars") >= 50) & (F.col("n_chars") <= 400),
        "lang_ok": F.col("lang").isin(["en", "es"]),
    }


def test_acceptance_counts(docs):
    rep = {r["source"]: r for r in
           acceptance_report(docs, preds(), ["source"]).collect()}
    a, b = rep["a"], rep["b"]
    assert (a["n"], a["n_pass_len_ok"], a["n_pass_lang_ok"],
            a["n_pass_all"]) == (3, 2, 2, 1)
    # b: doc5 NULL n_chars fails len; doc6 NULL lang fails lang
    assert (b["n"], b["n_pass_len_ok"], b["n_pass_lang_ok"],
            b["n_pass_all"]) == (3, 2, 2, 1)


def test_apply_matches_report(docs):
    kept = apply_filters(docs, preds())
    total = acceptance_report(docs, preds()).first()["n_pass_all"]
    assert kept.count() == total == 2
    assert {r["doc_id"] for r in kept.collect()} == {2, 4}
