"""Deterministic hash sampling: reproducibility, nesting, stratified
fractions, and independence from RNG/task attempts."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.sampling import (
    hash_bucket_col,
    hash_sample,
    stratified_hash_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["web", "wiki", "books"][i % 3]) for i in range(3000)]
    return spark.createDataFrame(rows, "doc_id long, source string").cache()


def test_reproducible_and_rate(docs):
    a = {r["doc_id"] for r in hash_sample(docs, 0.2, salt="x").collect()}
    b = {r["doc_id"] for r in hash_sample(docs, 0.2, salt="x").collect()}
    assert a == b                       # no RNG anywhere
    assert 0.15 < len(a) / 3000 < 0.25  # ~20%


def test_nested_supersets_and_salt_independence(docs):
    small = {r["doc_id"] for r in hash_sample(docs, 0.1, salt="x").collect()}
    big = {r["doc_id"] for r in hash_sample(docs, 0.3, salt="x").collect()}
    assert small <= big                 # same salt: nested by construction
    other = {r["doc_id"] for r in hash_sample(docs, 0.1, salt="y").collect()}
    # different salt draws an (approximately) independent sample
    assert other != small


def test_membership_stable_under_growth(spark, docs):
    """A row's membership never changes when other rows appear — the
    property incremental pipelines need and df.sample lacks."""
    sample_full = {r["doc_id"]
                   for r in hash_sample(docs, 0.2, salt="x").collect()}
    half = docs.where(F.col("doc_id") < 1500)
    sample_half = {r["doc_id"]
                   for r in hash_sample(half, 0.2, salt="x").collect()}
    assert sample_half == {i for i in sample_full if i < 1500}


def test_stratified_fractions(docs):
    out = stratified_hash_sample(
        docs, "source", {"web": 0.6, "wiki": 0.2}, default_fraction=0.0)
    by_src = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert 0.5 < by_src["web"] / 1000 < 0.7
    assert 0.12 < by_src["wiki"] / 1000 < 0.3
    assert "books" not in by_src        # default 0 drops the stratum


def test_no_shuffle(docs):
    plan = stratified_hash_sample(docs, "source", {"web": 0.5}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_bucket_range(docs):
    r = docs.select(hash_bucket_col(F.col("doc_id")).alias("b")) \
        .agg(F.min("b"), F.max("b")).first()
    assert 0 <= r[0] and r[1] < 2 ** 32


def test_mix_to_proportions(docs):
    """1000 rows per source → target 60/20/20 keeps the binding stratum
    (web at 60% of a 1667-row ideal) and down-samples the rest."""
    from data_validation_spark.operators.sampling import mix_to_proportions
    fr = {}
    out = mix_to_proportions(docs, "source",
                             {"web": 0.6, "wiki": 0.2, "books": 0.2},
                             fractions_out=fr)
    assert fr["web"] == 1.0          # binding stratum kept in full
    assert 0.3 < fr["wiki"] <= 0.34  # 1000/0.6 * 0.2 / 1000 = 1/3
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert by["web"] == 1000
    # realized proportions approach 60/20/20 (hash sampling is ~exact)
    total = sum(by.values())
    assert 0.55 < by["web"] / total < 0.65
    assert 0.15 < by["wiki"] / total < 0.25


def test_on_null_error_default(spark):
    """NULL keys hash to NULL and silently fail the threshold predicate
    (module docstring) — the default now fails fast instead."""
    df = spark.createDataFrame(
        [(str(i),) for i in range(100)] + [(None,)] * 10, "doc_id string")
    with pytest.raises(Exception, match="hash sampling key is NULL"):
        hash_sample(df, 1.0).collect()


def test_on_null_drop_and_coalesce(spark):
    df = spark.createDataFrame(
        [(str(i),) for i in range(100)] + [(None,)] * 10,
        "doc_id string").cache()
    # drop: the legacy silent-shrink semantics, now opt-in
    assert hash_sample(df, 1.0, on_null="drop").count() == 100
    # coalesce: every NULL maps to one sentinel key, so at 1.0 all stay
    assert hash_sample(df, 1.0, on_null="coalesce").count() == 110
    # ... and at any fraction the NULL rows move as one block
    for frac in (0.3, 0.7):
        n_null = (hash_sample(df, frac, on_null="coalesce")
                  .where(F.col("doc_id").isNull()).count())
        assert n_null in (0, 10)
    with pytest.raises(ValueError):
        hash_sample(df, 0.5, on_null="bogus")


def test_mix_deterministic_and_pinnable(docs):
    from data_validation_spark.operators.sampling import mix_to_proportions
    a = {r["doc_id"] for r in mix_to_proportions(
        docs, "source", {"web": 0.5, "wiki": 0.5}, salt="m").collect()}
    b = {r["doc_id"] for r in mix_to_proportions(
        docs, "source", {"web": 0.5, "wiki": 0.5}, salt="m",
        counts={"web": 1000, "wiki": 1000}).collect()}
    assert a == b                    # pinned counts reproduce exactly


def test_weighted_sample_semantics(spark, docs):
    from data_validation_spark.operators.sampling import (
        hash_bucket_col, weighted_hash_sample)
    # weight 1 keeps everything, weight 0 nothing
    assert weighted_hash_sample(docs, F.lit(1.0)).count() == 3000
    assert weighted_hash_sample(docs, F.lit(0.0)).count() == 0
    # per-row weight: acceptance iff bucket < w * 2^32, replayed exactly
    w = (F.col("doc_id") % 100) / 100.0
    got = {r["doc_id"] for r in
           weighted_hash_sample(docs, w).collect()}
    buckets = {r["doc_id"]: r["b"] for r in docs.select(
        "doc_id", hash_bucket_col(F.col("doc_id").cast("string")).alias("b")
    ).collect()}
    expect = {i for i in range(3000)
              if buckets[i] < (i % 100) / 100.0 * (1 << 32)}
    assert got == expect
    # monotone: raising weights only ADDS rows
    more = {r["doc_id"] for r in weighted_hash_sample(
        docs, F.least(w + 0.2, F.lit(1.0))).collect()}
    assert got <= more
    # out-of-range weights clamp instead of misbehaving
    assert weighted_hash_sample(docs, F.lit(7.5)).count() == 3000
    assert weighted_hash_sample(docs, F.lit(-3.0)).count() == 0


# --------------------------------------------------------- hash_split

def test_hash_split_disjoint_exhaustive(spark, sequences):
    from data_validation_spark.operators.sampling import hash_split
    out = hash_split(sequences, {"train": 0.8, "val": 0.1, "test": 0.1},
                     key_col="doc_id", salt="s")
    n = sequences.count()
    by = {r["split"]: r["n"] for r in
          out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(by.values()) == n and None not in by
    # roughly proportional (hash uniformity)
    assert abs(by["train"] / n - 0.8) < 0.05


def test_hash_split_stable_under_growth(spark, sequences):
    """A row's split NEVER changes when the corpus grows — the
    property df.randomSplit cannot give."""
    from data_validation_spark.operators.sampling import hash_split
    fr = {"train": 0.5, "val": 0.5}
    small = sequences.limit(200)
    a = {r.doc_id: r.split for r in
         hash_split(small, fr, salt="g").select("doc_id", "split")
         .collect()}
    b = {r.doc_id: r.split for r in
         hash_split(sequences, fr, salt="g").select("doc_id", "split")
         .collect()}
    assert all(b[k] == v for k, v in a.items())


def test_hash_split_remainder_and_validation(spark, sequences):
    from data_validation_spark.operators.sampling import hash_split
    out = hash_split(sequences.limit(100), {"train": 0.5}, salt="r")
    labels = {r.split for r in out.select("split").distinct().collect()}
    assert labels <= {"train", None}  # remainder rows label NULL
    with pytest.raises(ValueError, match="sum"):
        hash_split(sequences, {"a": 0.9, "b": 0.2})
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(sequences, {})


def test_hash_split_shuffle_free(spark, sequences):
    from data_validation_spark.operators.sampling import hash_split
    plan = (hash_split(sequences, {"train": 0.9}, salt="p")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
