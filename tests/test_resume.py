"""Resume/checkpoint (IO7/J3): a run interrupted after k partitions is
completed by a second run that skips exactly those k (SURVEY.md §5.2.5)."""

import shutil

import pytest
from pyspark.sql import functions as F

from data_validation_spark.plans.manifest import completed_partitions, write_manifest
from data_validation_spark.plans.runner import run_validation
from data_validation_spark.plans.suite import Component, Constraint, ValidationSuite
from data_validation_spark.sources.sequences import allowed_sources_df
from data_validation_spark.sources.table_provider import TableProvider


@pytest.fixture()
def suite(components):
    return ValidationSuite(
        name="resume_suite",
        components=[Component("n_tok", "numeric")],
        partition_cols=["source", "bucket"],
        constraints=[Constraint("n_tok_bounds", "bounds",
                                {"component": "n_tok", "min": 1, "max": 8192})])


def test_resume_skips_completed_partitions(spark, sequences, suite, tmp_path):
    tp = TableProvider(spark, str(tmp_path))
    all_parts = [f"source={r['source']}/bucket={r['bucket']}" for r in
                 sequences.select("source", "bucket").distinct().collect()]
    half = sorted(all_parts)[: len(all_parts) // 2]

    # simulate a crashed first run that completed `half`
    write_manifest(tp, spark, suite.name, "run0", [(p, 1) for p in half])
    assert completed_partitions(tp, suite.name) == set(half)

    res = run_validation(spark, sequences, suite, sink=tp)
    assert sorted(res.skipped_partitions) == half
    assert sorted(res.partitions) == sorted(set(all_parts) - set(half))
    # processed exactly the remaining rows
    lbl = F.concat(F.lit("source="), "source", F.lit("/bucket="),
                   F.col("bucket").cast("string"))
    remaining = sequences.filter(~lbl.isin(half)).count()
    assert res.n_rows == remaining

    # third run: nothing left to do
    res2 = run_validation(spark, sequences, suite, sink=tp)
    assert res2.partitions == [] and len(res2.skipped_partitions) == len(all_parts)


def test_two_stage_resume_equals_one_run(spark, sequences, suite, tmp_path):
    """resume(half) + resume(rest) ≡ one full run (metrics row parity)."""
    tp_full = TableProvider(spark, str(tmp_path / "full"))
    full = run_validation(spark, sequences, suite, sink=tp_full, resume=False)

    tp_two = TableProvider(spark, str(tmp_path / "two"))
    all_parts = sorted(full.partitions)
    half = all_parts[: len(all_parts) // 2]
    write_manifest(tp_two, spark, suite.name, "seed", [(p, 1) for p in half])
    run_validation(spark, sequences, suite, sink=tp_two)          # does rest
    shutil.rmtree(str(tmp_path / "two" / "manifest"))
    write_manifest(tp_two, spark, suite.name, "seed2",
                   [(p, 1) for p in set(all_parts) - set(half)])
    run_validation(spark, sequences, suite, sink=tp_two)          # does half

    m_full = tp_full.read("metrics").filter(F.col("partition") != "<global>")
    m_two = tp_two.read("metrics").filter(F.col("partition") != "<global>")
    cols = ["partition", "component", "metric", "value"]
    assert sorted(map(tuple, m_full.select(*cols).collect())) == \
        sorted(map(tuple, m_two.select(*cols).collect()))
