"""global_order_index / shuffle_corpus — exact global ranks without a
global window: verified against a driver-side sort, invariant to the
partition count, and reproducible across salts."""

import hashlib

import pytest
from pyspark.sql import functions as F

from data_validation_spark.operators.ordering import (
    global_order_index, shuffle_corpus)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"s{i % 7}") for i in range(991)]
    return spark.createDataFrame(rows, "doc_id long, source string").cache()


def test_positions_are_exact_global_ranks(docs):
    out = global_order_index(docs, [F.col("doc_id").desc()]).collect()
    got = {r["doc_id"]: r["position"] for r in out}
    assert sorted(got.values()) == list(range(991))
    assert got == {i: 990 - i for i in range(991)}


def test_invariant_to_partition_count(docs):
    a = {r["doc_id"]: r["position"] for r in global_order_index(
        docs, [F.col("doc_id")], num_partitions=3).collect()}
    b = {r["doc_id"]: r["position"] for r in global_order_index(
        docs, [F.col("doc_id")], num_partitions=17).collect()}
    assert a == b == {i: i for i in range(991)}


def test_no_unbounded_window_in_plan(docs):
    out = global_order_index(docs, [F.col("doc_id")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window must be partitioned on _pid, never a global sort task
    assert "partitionBy" not in plan or "_pid" in plan
    assert "Window" in plan and "_pid" in plan


def test_shuffle_corpus_replays_md5_order(docs):
    out = {r["doc_id"]: r["position"]
           for r in shuffle_corpus(docs, salt="ep1").collect()}
    expect_order = sorted(
        range(991),
        key=lambda i: (hashlib.md5(f"{i}ep1".encode()).hexdigest(), i))
    expect = {doc: pos for pos, doc in enumerate(expect_order)}
    assert out == expect
    # same salt replays; different salt is a different epoch order
    again = {r["doc_id"]: r["position"]
             for r in shuffle_corpus(docs, salt="ep1").collect()}
    assert again == out
    ep2 = {r["doc_id"]: r["position"]
           for r in shuffle_corpus(docs, salt="ep2").collect()}
    assert ep2 != out
    assert sorted(ep2.values()) == list(range(991))


def test_original_columns_preserved(docs):
    out = shuffle_corpus(docs)
    assert set(out.columns) == {"doc_id", "source", "position"}
