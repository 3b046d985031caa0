"""Incremental (snapshot-vs-corpus) dedup + inter-source overlap
(operators/dedup.py corpus_fingerprints / dedup_increment /
increment_report / source_overlap)."""

import pyspark.sql.functions as F
import pytest

from data_validation_spark.operators.dedup import (
    corpus_fingerprints,
    dedup_increment,
    increment_report,
    source_overlap,
)
from data_validation_spark.sources.table_provider import TableProvider


@pytest.fixture()
def docs(spark):
    # 3 distinct contents; corpus holds A; batch brings A (re-crawl),
    # B twice (in-batch dup), C once
    rows = [
        (1, "alpha beta gamma", "corpus"),
        (10, "alpha  beta gamma ", "batch"),   # ws-normalized dup of A
        (11, "brand new text", "batch"),
        (12, "brand new text", "batch"),
        (13, "another fresh doc", "batch"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "split string")


def test_dedup_increment_survivors(spark, docs):
    corpus = docs.filter("split = 'corpus'")
    batch = docs.filter("split = 'batch'")
    fps = corpus_fingerprints(corpus)
    out = dedup_increment(batch, fps)
    assert sorted(r.doc_id for r in out.collect()) == [11, 13]
    # full rows survive, not just ids
    assert set(out.columns) == set(batch.columns)


def test_increment_report_counts(spark, docs):
    corpus = docs.filter("split = 'corpus'")
    batch = docs.filter("split = 'batch'")
    r = increment_report(batch, corpus_fingerprints(corpus)).first()
    assert (r.n_batch, r.n_distinct, r.n_seen_in_corpus,
            r.n_survivors) == (4, 3, 1, 2)


def test_increment_empty_corpus(spark, docs):
    batch = docs.filter("split = 'batch'")
    empty = corpus_fingerprints(batch.limit(0))
    out = dedup_increment(batch, empty)
    # pure in-batch dedup: first occurrence of each content
    assert sorted(r.doc_id for r in out.collect()) == [10, 11, 13]


def test_increment_against_bucketed_state_single_exchange(
        spark, docs, tmp_path):
    """The 100 TB contract: with the corpus fingerprint STATE stored
    bucketed on `fingerprint`, the anti-join plans NO Exchange on the
    corpus side — only the (small) batch side re-buckets."""
    provider = TableProvider(spark, str(tmp_path))
    corpus = docs.filter("split = 'corpus'")
    batch = docs.filter("split = 'batch'")
    provider.write_bucketed(corpus_fingerprints(corpus), "fp_state",
                            ["fingerprint"], 4)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the at-scale contract: bucket count == target shuffle parallelism
    # (otherwise the planner judges the bucketed scan useless — it
    # would have to re-shuffle the state side anyway — and disables it:
    # "Bucketed: false (disabled by query planner)")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        state = provider.read_bucketed("fp_state")
        fps = batch.select(
            F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " "))
            .alias("fingerprint"), "doc_id")
        first = fps.groupBy("fingerprint").agg(F.min("doc_id")
                                               .alias("doc_id"))
        anti = first.join(state, on="fingerprint", how="left_anti")
        plan = anti._jdf.queryExecution().executedPlan().toString()
        # exactly one shuffle: the batch side; the scan of the state
        # table is bucket-aligned (Bucketed: true, no Exchange above it)
        assert plan.count("Exchange") == 1, plan
        assert "Bucketed: true" in plan, plan
        assert sorted(r.doc_id for r in anti.collect()) == [11, 13]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.shuffle.partitions", old_sp)
        spark.sql("DROP TABLE IF EXISTS fp_state")


def test_source_overlap_matrix(spark):
    rows = [
        (1, "shared one", "web"), (2, "shared one", "wiki"),
        (3, "shared one", "web"),          # dup within web: still 1 set
        (4, "shared two", "web"), (5, "shared two", "books"),
        (6, "web only", "web"), (7, "wiki only", "wiki"),
        (8, "tri", "web"), (9, "tri", "wiki"), (10, "tri", "books"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, "
                                     "source string")
    out = {(r.source_a, r.source_b): r.n_shared
           for r in source_overlap(df).collect()}
    assert out == {("web", "wiki"): 2,      # "shared one", "tri"
                   ("books", "web"): 2,     # "shared two", "tri"
                   ("books", "wiki"): 1}    # "tri"
