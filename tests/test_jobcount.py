"""Per-run Spark job count — driver-serial scheduling time is a fixed
cost a 10^12-row job pays per ACTION, so the flagship no-sink run must
stay at its budget.  Measured on this suite shape (local[8], AQE on —
AQE materializes each shuffle stage as its own job id, so multi-shuffle
queries count >1): r2 shape = 12 jobs; current = 7 (dropped: the
partition-worklist distinct+collect, one incremental-limit round each
for the inline-dim / histogram / categoric probes via
``single_job_limit_collect``, and a separate cardinality-guard job
each for the histogram and categoric paths)."""

from pyspark.sql import functions as F

from data_validation_spark.plans.runner import run_validation
from data_validation_spark.plans.suite import (
    Component,
    Constraint,
    ValidationSuite,
)
from data_validation_spark.sources.sequences import (
    allowed_sources_df,
    synth_sequences,
)

GROUP = "jobcount-probe"


def _jobs_for(spark, fn) -> int:
    sc = spark.sparkContext
    sc.setJobGroup(GROUP, "job-count probe")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(GROUP))


def _flagship_suite() -> ValidationSuite:
    return ValidationSuite(
        name="jobcount",
        components=[Component("n_tok", "numeric"),
                    Component("tokens_len", "numeric",
                              extractor="size(tokens)"),
                    Component("source", "categoric")],
        constraints=[
            Constraint("len_consistency", "expression",
                       {"sql": "tokens is null or size(tokens) = n_tok"}),
            Constraint("tokens_not_null", "not_null",
                       {"component": "tokens"}),
            Constraint("unique_doc_id", "unique", {"keys": ["doc_id"]}),
            Constraint("source_allowed", "referential",
                       {"column": "source", "dim": "allowed_sources"}),
        ],
        partition_cols=["source", "bucket"],
    )


def test_flagship_no_sink_run_job_budget(spark):
    df = synth_sequences(spark, 2000).persist()
    df.count()  # materialize outside the probe
    suite = _flagship_suite()
    dims = {"allowed_sources": allowed_sources_df(spark)}
    n = _jobs_for(spark, lambda: run_validation(
        spark, df, suite, dims=dims, resume=False))
    assert n <= 7, f"no-sink validation run scheduled {n} jobs (budget 7)"
    df.unpersist()


def test_no_sink_run_matches_resume_path_verdicts(spark, tmp_path):
    """The worklist-free path must produce the same verdicts as the
    resume-capable path on the same input."""
    from data_validation_spark.sources.table_provider import TableProvider
    df = synth_sequences(spark, 2000)
    suite = _flagship_suite()
    dims = {"allowed_sources": allowed_sources_df(spark)}
    a = run_validation(spark, df, suite, dims=dims, resume=False)
    b = run_validation(spark, df, suite, dims=dims,
                       sink=TableProvider(spark, str(tmp_path)))
    key = lambda v: (v["partition"], v["constraint"])  # noqa: E731
    assert sorted(a.verdicts, key=key) == sorted(b.verdicts, key=key)
    assert sorted(a.partitions) == sorted(b.partitions)
