"""End-to-end corpus prep composition (plans/prep.py): every stage's
effect visible in one run, ordering invariants pinned."""

import pyspark.sql.functions as F
import pytest

from data_validation_spark.plans.prep import prepare_corpus

FOOTER = "subscribe to our newsletter"


@pytest.fixture()
def corpus(spark):
    rows = [
        # 1+2: exact dups AFTER redaction (differ only in the email)
        (1, f"good doc alpha beta gamma delta\ncontact a@x.com\n{FOOTER}"),
        (2, f"good doc alpha beta gamma delta\ncontact b@y.org\n{FOOTER}"),
        # 3: unicode-decomposed dup of the same content (e + U+0301
        # nowhere — instead make 3 a dup of 4's composed text)
        (3, "café culture piece one two three"),
        (4, "café culture piece one two three"),
        # 5: too short — quality filter drops it
        (5, "tiny"),
        # 6: contaminated — contains the benchmark trigram
        (6, f"normal body text here plus the secret eval answer key\n{FOOTER}"),
        # 7: clean survivor
        (7, f"another perfectly fine document body line\n{FOOTER}"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_prepare_corpus_stages(spark, corpus):
    bench = spark.createDataFrame(
        [(1, "the secret eval answer key")], "doc_id long, text string")
    stats = {}
    out = prepare_corpus(
        corpus,
        filters={"len": F.length("text") >= 20},
        benchmark=bench,
        split_fractions={"train": 0.9, "val": 0.1},
        boilerplate_min_doc_freq=3,
        split_salt="t",
        stats_out=stats).cache()
    rows = {r.doc_id: r for r in out.collect()}

    # 5 dropped by filter; 6 dropped by decontamination; of (1,2) only
    # min-id 1 survives (identical after redaction); of (3,4) only 3
    # survives (identical after NFC)
    assert set(rows) == {1, 3, 7}
    # boilerplate footer stripped everywhere
    assert all(FOOTER not in r.text for r in rows.values())
    # PII redacted in the survivor
    assert "<EMAIL>" in rows[1].text and "@" not in rows[1].text
    # NFC: survivor 3's text is the composed form
    assert "café" in rows[3].text
    # split labels present and from the configured set
    assert {r.split for r in rows.values()} <= {"train", "val"}

    assert stats["input"] == 7
    assert stats["boilerplate_stripped"] == 7   # strip never drops docs
    assert stats["filtered"] == 6               # doc 5 out
    assert stats["deduped"] == 4                # 1,3,6,7
    assert stats["decontaminated"] == 3         # 6 out
    assert stats["output"] == 3


def test_prepare_corpus_minimal_config(spark, corpus):
    """Every optional stage off → exact dedup only, no split column."""
    out = prepare_corpus(corpus, normalize=False, redact=False)
    assert "split" not in out.columns
    # without redaction 1 and 2 differ; without NFC 3 and 4 differ
    assert out.count() == 7


def test_prepare_corpus_split_stability(spark, corpus):
    """A doc's split never changes when the corpus gains rows."""
    fr = {"train": 0.5, "val": 0.5}
    a = {r.doc_id: r.split for r in
         prepare_corpus(corpus.limit(4), split_fractions=fr,
                        split_salt="s").select("doc_id", "split")
         .collect()}
    b = {r.doc_id: r.split for r in
         prepare_corpus(corpus, split_fractions=fr, split_salt="s")
         .select("doc_id", "split").collect()}
    assert all(b[k] == v for k, v in a.items() if k in b)
