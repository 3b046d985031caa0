"""validate_incremental — only content-changed partitions are
revalidated across cycles (checksum diff), composing with, but
distinct from, within-cycle manifest resume."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.plans.runner import validate_incremental
from data_validation_spark.plans.suite import Component, Constraint, ValidationSuite


@pytest.fixture()
def suite():
    return ValidationSuite(
        name="incr_suite",
        components=[Component("n_tok", "numeric")],
        partition_cols=["source", "bucket"],
        constraints=[Constraint("n_tok_bounds", "bounds",
                                {"component": "n_tok", "min": 1,
                                 "max": 8192})])


def test_incremental_cycle(spark, sequences, suite):
    # cycle 0: no baseline → everything is changed
    r0 = validate_incremental(spark, sequences, suite, None)
    all_parts = sorted(
        f"source={r['source']}/bucket={r['bucket']}" for r in
        sequences.select("source", "bucket").distinct().collect())
    assert r0.changed_partitions == all_parts
    assert sorted(r0.run.partitions) == all_parts

    # cycle 1: identical snapshot → noop, no validation work
    r1 = validate_incremental(spark, sequences, suite, r0.checksums)
    assert r1.changed_partitions == []
    assert r1.run.partitions == []

    # cycle 2: mutate token content in exactly one partition (same
    # row count and n_tok, so only the CONTENT checksum can see it)
    target = sequences.select("source", "bucket").distinct().limit(1).first()
    hit = (F.col("source") == target["source"]) & \
          (F.col("bucket") == target["bucket"])
    mutated = sequences.withColumn(
        "tokens",
        F.when(hit, F.slice(F.col("tokens"), 1,
                            F.greatest(F.array_size("tokens") - 1,
                                       F.lit(1))))
        .otherwise(F.col("tokens")))
    r2 = validate_incremental(spark, mutated, suite, r1.checksums)
    lbl = f"source={target['source']}/bucket={target['bucket']}"
    assert r2.changed_partitions == [lbl]
    assert r2.run.partitions == [lbl]
    # the inner run only read the changed slice
    n_in_part = sequences.filter(hit).count()
    assert r2.run.n_rows == n_in_part

    # cycle 3: new partition appears → it alone is changed
    extra = sequences.limit(50).withColumn("source", F.lit("newsrc"))
    grown = mutated.unionByName(extra)
    r3 = validate_incremental(spark, grown, suite, r2.checksums)
    assert all(p.startswith("source=newsrc/") for p in
               r3.changed_partitions)
    assert r3.changed_partitions == sorted(r3.run.partitions)


def test_incremental_requires_partition_cols(spark, sequences):
    s = ValidationSuite(name="x", components=[Component("n_tok", "numeric")],
                        partition_cols=[], constraints=[])
    with pytest.raises(ValueError, match="partition_cols"):
        validate_incremental(spark, sequences, s, None)
