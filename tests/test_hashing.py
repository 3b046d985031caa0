"""Hashing + Iceberg bucket parity (P3/P4).

The Iceberg spec (Appendix B) defines bucket(N, v) as
murmur3_x86_32(seed 0) over the single-value binary encoding,
``(hash & Integer.MAX_VALUE) % N``, and publishes hash test vectors.
These tests lock byte-parity against those published constants — no
Iceberg jars needed."""

import struct

import pytest
from pyspark.sql import functions as F

from data_validation_spark.functions.hashing import (
    bucket_transform,
    iceberg_bucket_col,
    iceberg_bucket_value,
    murmur3_x86_32,
    token_checksum_col,
)

# (input bytes, expected murmur3_x86_32 seed-0 hash) — from the Iceberg
# spec's Appendix B test-vector table
SPEC_VECTORS = [
    (struct.pack("<q", 34), 2017239379),          # int and long 34
    ("iceberg".encode("utf-8"), 1210000089),      # string
    (bytes([0, 1, 2, 3]), -188683207),            # fixed/binary 00010203
    (struct.pack("<q", 17486), -653330422),       # date 2017-11-16 (days)
]


@pytest.mark.parametrize("data,expected", SPEC_VECTORS)
def test_murmur3_matches_iceberg_spec_vectors(data, expected):
    assert murmur3_x86_32(data) == expected


def test_iceberg_bucket_value_spec_parity():
    # bucket(N) = (hash & MAX_INT) % N on the spec hashes above
    assert iceberg_bucket_value(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert iceberg_bucket_value("iceberg", 16) == \
        (1210000089 & 0x7FFFFFFF) % 16
    assert iceberg_bucket_value(b"\x00\x01\x02\x03", 128) == \
        ((-188683207) & 0x7FFFFFFF) % 128
    assert iceberg_bucket_value(None, 16) is None


def test_iceberg_bucket_col_int_vectorized_matches_reference(spark):
    vals = [0, 1, -1, 34, 17486, 2**40, -2**40, 7, 999999999999, None]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["v"]: r["b"] for r in
           df.select("v", iceberg_bucket_col("v", 32).alias("b")).collect()}
    for v in vals:
        assert got[v] == iceberg_bucket_value(v, 32)


def test_iceberg_bucket_col_strings(spark):
    vals = ["iceberg", "", "doc-00000001", "héllo wörld", None]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = {r["v"]: r["b"] for r in
           df.select("v", iceberg_bucket_col("v", 64).alias("b")).collect()}
    for v in vals:
        assert got[v] == iceberg_bucket_value(v, 64)


def test_bucket_transform_is_uniform_and_deterministic(spark):
    df = spark.range(10_000).withColumn(
        "b", bucket_transform(F.col("id").cast("string"), 16))
    counts = [r["count"] for r in df.groupBy("b").count().collect()]
    assert len(counts) == 16
    assert max(counts) < 2 * min(counts)   # roughly uniform
    again = spark.range(10_000).withColumn(
        "b", bucket_transform(F.col("id").cast("string"), 16))
    assert df.collect() == again.collect()


def test_token_checksum_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, [1, 2, 3]), (2, [3, 2, 1]), (3, [1, 2, 3]), (4, None)],
        "id long, tokens array<int>")
    rows = {r["id"]: r["c"] for r in
            df.select("id", token_checksum_col("tokens").alias("c")).collect()}
    assert rows[1] == rows[3]
    assert rows[1] != rows[2]
    assert rows[4] is None
