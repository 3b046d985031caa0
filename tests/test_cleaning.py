"""Line-level boilerplate removal (C4-style): document-frequency
counting, order-preserving strip, empty-doc survival."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.cleaning import (
    line_frequencies,
    strip_boilerplate,
)

FOOTER = "subscribe to our newsletter"
NAV = "home | about | contact"


@pytest.fixture(scope="module")
def pages(spark):
    rows = [
        (1, f"{NAV}\nunique article one\n{FOOTER}"),
        (2, f"{NAV}\nanother real text\nmore of it\n{FOOTER}"),
        (3, f"{NAV}\nthird page body\n{FOOTER}\n{FOOTER}"),  # dup inside
        (4, "standalone page with no chrome"),
        (5, f"{FOOTER}"),                                     # only chrome
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_line_frequencies_are_document_frequencies(pages):
    freq = {r["line"]: r["doc_freq"]
            for r in line_frequencies(pages, min_doc_freq=2).collect()}
    # FOOTER appears twice inside doc 3 but counts once per document
    assert freq == {NAV: 3, FOOTER: 4}


def test_strip_preserves_order_and_unique_content(pages):
    boiler = line_frequencies(pages, min_doc_freq=3)
    out = {r["doc_id"]: r["text"]
           for r in strip_boilerplate(pages, boiler).collect()}
    assert out[1] == "unique article one"
    assert out[2] == "another real text\nmore of it"
    assert out[4] == "standalone page with no chrome"
    assert out[5] == ""                       # chrome-only doc survives empty
    assert len(out) == 5


def test_strip_broadcast_plan(pages):
    boiler = line_frequencies(pages, min_doc_freq=3)
    plan = strip_boilerplate(pages, boiler) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_strip_shuffle_fallback_above_limit(pages):
    """Oversized flagged set: the broadcast HINT must not be forced —
    the anti-join plans from stats (at web scale: shuffle), a warning
    records the choice, and the result is identical."""
    boiler = line_frequencies(pages, min_doc_freq=3)
    with pytest.warns(UserWarning, match="shuffle"):
        out = strip_boilerplate(pages, boiler, broadcast_limit=0)
    want = {r["doc_id"]: r["text"]
            for r in strip_boilerplate(pages, boiler).collect()}
    got = {r["doc_id"]: r["text"] for r in out.collect()}
    assert got == want
    # no broadcast hint in the analyzed plan (the guarded path leaves
    # the join strategy to the planner's size estimates)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" not in analyzed


def test_strip_broadcast_limit_none_skips_count(pages):
    boiler = line_frequencies(pages, min_doc_freq=3)
    out = strip_boilerplate(pages, boiler, broadcast_limit=None)
    assert out.count() == 5
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "strategy=broadcast" in analyzed


def test_dedup_paragraphs_keeps_first_occurrence_only(spark):
    from data_validation_spark.operators.cleaning import dedup_paragraphs
    SHARED = "this exact paragraph went viral"
    rows = [
        (1, f"{SHARED}\nunique one"),
        (2, f"intro two\n{SHARED}\noutro two"),
        (3, f"{SHARED}\n{SHARED}"),            # dup within one doc too
        (4, "untouched document"),
        (5, f"{SHARED}"),                       # reduced to empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in dedup_paragraphs(df).collect()}
    assert out[1] == f"{SHARED}\nunique one"    # first occurrence survives
    assert out[2] == "intro two\noutro two"
    assert out[3] == ""                          # both copies later than doc 1
    assert out[4] == "untouched document"
    assert out[5] == ""
    assert len(out) == 5


def test_dedup_paragraphs_min_chars_exempts_short_lines(spark):
    from data_validation_spark.operators.cleaning import dedup_paragraphs
    rows = [(1, "ok\nlong repeated paragraph here"),
            (2, "ok\nlong repeated paragraph here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"]
           for r in dedup_paragraphs(df, min_chars=10).collect()}
    assert out[1] == "ok\nlong repeated paragraph here"
    assert out[2] == "ok"                        # short line exempt everywhere


def test_normalize_unicode_composes_decomposed(spark):
    from data_validation_spark.operators.cleaning import (
        normalize_unicode_col)
    from data_validation_spark.functions.text import fingerprint_col
    composed = "café"            # é as one codepoint
    decomposed = "café"         # e + combining acute
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed), (3, None)],
        "doc_id long, text string")
    out = df.select(
        "doc_id",
        normalize_unicode_col("text").alias("nfc"),
        fingerprint_col(normalize_unicode_col("text")).alias("fp"))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].nfc == rows[2].nfc == composed
    assert rows[1].fp == rows[2].fp          # dedup key now agrees
    assert rows[3].nfc is None and rows[3].fp is None
    # raw fingerprints DISAGREE — the failure mode this op exists for
    raw = {r.doc_id: r.fp for r in
           df.select("doc_id",
                     fingerprint_col("text").alias("fp")).collect()}
    assert raw[1] != raw[2]


def test_normalize_unicode_bad_form(spark):
    from data_validation_spark.operators.cleaning import (
        normalize_unicode_col)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="normal form"):
        normalize_unicode_col("text", form="NFX")
