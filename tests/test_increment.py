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


def test_increment_near_dups_finds_corpus_near_matches(spark, tmp_path):
    """Near-dup incremental ingest: batch docs matching the standing
    corpus by signature agreement are paired; state and signature
    tables stay bucketed (shuffle-free corpus side is asserted by the
    exact-path test; here we pin semantics)."""
    from data_validation_spark.operators.dedup import (
        dedup_increment_near, increment_near_dups, minhash_band_state,
        minhash_signatures)
    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i} eta theta iota "
              f"kappa lambda mu") for i in range(40)],
        "doc_id long, text string")
    state = minhash_band_state(corpus)
    sigs = minhash_signatures(corpus)
    # batch: 3 exact copies of corpus docs, 2 fresh docs, 1 in-batch dup
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta 7 eta theta iota "
               "kappa lambda mu"),       # copy of corpus 7
         (101, "alpha beta gamma delta epsilon zeta 13 eta theta iota "
               "kappa lambda mu"),       # copy of corpus 13
         (102, "totally different content nothing shared here at all "
               "one two three four"),
         (103, "totally different content nothing shared here at all "
               "one two three four"),    # in-batch dup of 102
         (104, "another genuinely fresh document with its own words "
               "five six seven eight")],
        "doc_id long, text string")
    pairs = increment_near_dups(batch, state, sigs, threshold=0.999999)
    got = {(r.batch_id, r.corpus_id) for r in pairs.collect()}
    assert got == {(100, 7), (101, 13)}
    assert all(r.est_jaccard == 1.0 for r in pairs.collect())

    stats = {}
    surv = dedup_increment_near(batch, state, sigs,
                                threshold=0.999999, stats_out=stats)
    assert sorted(r.doc_id for r in surv.collect()) == [102, 104]
    assert stats["n_dropped_buckets"] == 0


def test_increment_near_dups_estimator_tracks_jaccard(spark):
    """The signature-agreement estimate must sit near the true shingle
    Jaccard for a partially-overlapping pair (coarse band — 16 hashes)."""
    from data_validation_spark.operators.dedup import (
        increment_near_dups, minhash_band_state, minhash_signatures)
    base = "w%d " * 30
    corpus = spark.createDataFrame(
        [(0, (base % tuple(range(30))).strip())], "doc_id long, text string")
    # batch doc shares a 25-word prefix (high but sub-1 Jaccard)
    txt = (base % tuple(range(30))).split()
    batch = spark.createDataFrame(
        [(9, " ".join(txt[:25] + ["x1", "x2", "x3", "x4", "x5"]))],
        "doc_id long, text string")
    out = increment_near_dups(batch, minhash_band_state(corpus),
                              minhash_signatures(corpus), threshold=0.05)
    rows = out.collect()
    assert len(rows) == 1
    est = rows[0].est_jaccard
    assert 0.2 < est < 1.0      # nonzero, non-identical
