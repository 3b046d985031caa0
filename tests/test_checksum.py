"""token_checksum_col / partition_checksum_exprs — content-parity
fingerprints (functions/hashing.py)."""

from pyspark.sql import functions as F

from data_validation_spark.functions.hashing import (
    _CHK_MUL,
    _CHK_P,
    partition_checksum_exprs,
    token_checksum_col,
)


def _ref_checksum(tokens):
    acc = 0
    for x in tokens:
        acc = (acc * 31 + (x * _CHK_MUL) % _CHK_P) % _CHK_P
    return acc


def test_checksum_matches_python_reference(spark):
    rows = [(1, [0, 1, 2]), (2, [50256]), (3, []), (4, None),
            (5, list(range(1000)))]
    df = spark.createDataFrame(rows, "id int, tokens array<int>")
    got = {r["id"]: r["c"] for r in
           df.select("id", token_checksum_col("tokens").alias("c")).collect()}
    for i, toks in rows:
        assert got[i] == (_ref_checksum(toks) if toks is not None else None)


def test_checksum_order_sensitive(spark):
    df = spark.createDataFrame([(1, [1, 2, 3]), (2, [3, 2, 1])],
                               "id int, tokens array<int>")
    a, b = [r["c"] for r in
            df.select(token_checksum_col("tokens").alias("c")).collect()]
    assert a != b


def test_partition_checksum_invariant_to_row_order(spark, sequences):
    """The partition fingerprint must not depend on scan order: compare
    against a repartition-shuffled copy of the same data."""
    base = (sequences.groupBy("source")
            .agg(*partition_checksum_exprs("tokens")))
    shuffled = (sequences.repartition(17, "doc_id").groupBy("source")
                .agg(*partition_checksum_exprs("tokens")))
    a = {r["source"]: (r["checksum_sum"], r["n_rows_with_tokens"],
                       r["n_tokens"]) for r in base.collect()}
    b = {r["source"]: (r["checksum_sum"], r["n_rows_with_tokens"],
                       r["n_tokens"]) for r in shuffled.collect()}
    assert a == b


def test_partition_checksum_detects_single_token_change(spark):
    rows = [(i, [i, i + 1, i + 2]) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, tokens array<int>")
    tampered = df.withColumn(
        "tokens", F.when(F.col("id") == 57,
                         F.array(F.lit(57), F.lit(58), F.lit(999)))
        .otherwise(F.col("tokens")))
    a = df.agg(*partition_checksum_exprs("tokens")).collect()[0]
    b = tampered.agg(*partition_checksum_exprs("tokens")).collect()[0]
    assert a["n_tokens"] == b["n_tokens"]
    assert a["checksum_sum"] != b["checksum_sum"]
