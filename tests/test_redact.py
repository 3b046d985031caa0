"""PII scrub: detection counts, redaction, idempotence, class filter,
and the no-shuffle plan shape."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.redact import (
    pii_report,
    redact_pii,
)

DOC = ("contact me at jane.doe+spam@example.co.uk or call "
       "+1 555 867 5309; server at 10.0.0.1 logged ssn 123-45-6789 "
       "twice: 123-45-6789.")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, "no pii here at all"), (3, None)],
        "doc_id long, text string").cache()


def test_pii_counts(docs):
    r = {x["doc_id"]: x for x in pii_report(docs).collect()}
    assert (r[1]["n_email"], r[1]["n_ipv4"], r[1]["n_ssn"],
            r[1]["n_phone"]) == (1, 1, 2, 1)
    assert (r[2]["n_email"], r[2]["n_ipv4"], r[2]["n_ssn"],
            r[2]["n_phone"]) == (0, 0, 0, 0)
    assert r[3]["n_email"] is None          # NULL text stays NULL


def test_redaction_and_idempotence(docs):
    once = redact_pii(docs)
    t = {x["doc_id"]: x["text"] for x in once.collect()}
    assert "<EMAIL>" in t[1] and "<IP>" in t[1] and "<PHONE>" in t[1]
    assert t[1].count("<SSN>") == 2
    assert "example.co.uk" not in t[1] and "867" not in t[1]
    assert t[2] == "no pii here at all"
    assert t[3] is None
    # idempotent: sentinels never re-match any pattern
    twice = {x["doc_id"]: x["text"] for x in redact_pii(once).collect()}
    assert twice == t
    # scrubbed text reports zero PII
    z = pii_report(once).where(F.col("doc_id") == 1).first()
    assert (z["n_email"], z["n_ipv4"], z["n_ssn"], z["n_phone"]) \
        == (0, 0, 0, 0)


def test_class_filter(docs):
    only_email = {x["doc_id"]: x["text"]
                  for x in redact_pii(docs, classes=["email"]).collect()}
    assert "<EMAIL>" in only_email[1]
    assert "10.0.0.1" in only_email[1]      # other classes untouched


def test_no_shuffle(docs):
    plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# -- k-anonymity --------------------------------------------------------------

def test_k_anonymity_summary(spark):
    from data_validation_spark.operators.redact import (
        k_anonymity_report, k_anonymity_violating_groups)
    rows = (
        [("10001", 30, "flu")] * 5          # big group, constant sens
        + [("10002", 40, "flu"), ("10002", 40, "cold")]  # size 2, l=2
        + [("10003", 50, "hiv")]            # singleton
    )
    df = spark.createDataFrame(rows, "zip string, age int, dx string")
    r = k_anonymity_report(df, ["zip", "age"], k=3,
                           sensitive_col="dx").collect()[0]
    assert (r.n_rows, r.n_groups) == (8, 3)
    assert (r.n_groups_below_k, r.n_rows_below_k) == (2, 3)
    assert r.min_group_size == 1
    assert r.min_l == 1
    # the size-5 group AND the singleton have constant dx
    assert r.n_groups_l1 == 2

    v = k_anonymity_violating_groups(df, ["zip", "age"], k=3).collect()
    assert sorted((g.zip, g.group_size) for g in v) \
        == [("10002", 2), ("10003", 1)]


def test_k_anonymity_null_is_a_value(spark):
    from data_validation_spark.operators.redact import k_anonymity_report
    rows = [(None, 1), (None, 1), ("z", 1)]
    df = spark.createDataFrame(rows, "zip string, v int")
    r = k_anonymity_report(df, ["zip"], k=2).collect()[0]
    # the two NULL-zip rows form one group of 2 -> only "z" violates
    assert (r.n_groups, r.n_groups_below_k, r.n_rows_below_k) == (2, 1, 1)


def test_k_anonymity_without_sensitive_has_no_l_cols(spark):
    from data_validation_spark.operators.redact import k_anonymity_report
    df = spark.createDataFrame([("a",), ("a",)], "q string")
    out = k_anonymity_report(df, ["q"], k=2)
    assert "min_l" not in out.columns
    assert out.collect()[0].n_groups_below_k == 0


def test_pseudonymize_deterministic_join_preserving(spark):
    from data_validation_spark.operators.redact import pseudonymize
    df = spark.createDataFrame(
        [("alice", 1), ("bob", 2), ("alice", 3), (None, 4)],
        "name string, v int")
    out = pseudonymize(df, ["name"], salt="s3cret").collect()
    toks = {}
    for r in out:
        toks.setdefault(r.name, []).append(r.v)
    # equal values -> equal tokens (join-preserving); NULL stays NULL
    tok_alice = [k for k, vs in toks.items() if sorted(vs) == [1, 3]]
    assert len(tok_alice) == 1 and tok_alice[0] is not None
    assert len(tok_alice[0]) == 16
    assert None in toks and toks[None] == [4]
    # different salt -> different tokens (rotation breaks linkage)
    out2 = pseudonymize(df, ["name"], salt="other").collect()
    assert {r.name for r in out2 if r.v in (1, 3)} \
        != {tok_alice[0]}
