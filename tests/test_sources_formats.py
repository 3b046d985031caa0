"""JSON/CSV TableProvider backends: raw-ingest round trips and an
end-to-end validation run over a CSV input (pinned schema — at 100 TB
schema inference would be a full extra scan)."""

import pytest
from pyspark.sql import functions as F

from data_validation_spark.plans.runner import run_validation
from data_validation_spark.plans.suite import (
    Component,
    Constraint,
    ValidationSuite,
)
from data_validation_spark.sources.table_provider import TableProvider


@pytest.fixture()
def docs(spark):
    rows = [(i, f"doc number {i}", "en" if i % 3 else "xx", 40 + i)
            for i in range(30)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long")


def test_json_round_trip(spark, tmp_path, docs):
    tp = TableProvider(spark, str(tmp_path), backend="json",
                       schema="doc_id long, text string, lang string, "
                              "n_chars long")
    tp.overwrite(docs, "docs")
    back = tp.read("docs")
    assert back.count() == 30
    assert {r["doc_id"] for r in back.collect()} == set(range(30))
    assert dict(back.dtypes)["n_chars"] == "bigint"  # pinned, not inferred


def test_csv_round_trip_with_projection(spark, tmp_path, docs):
    tp = TableProvider(spark, str(tmp_path), backend="csv",
                       schema="doc_id long, text string, lang string, "
                              "n_chars long")
    tp.overwrite(docs, "docs")
    back = tp.read("docs", columns=["doc_id", "lang"])
    assert back.columns == ["doc_id", "lang"]
    assert back.count() == 30


def test_validation_over_csv_input(spark, tmp_path, docs):
    """The engine is format-agnostic end to end: a suite evaluated over
    a CSV-backed table finds exactly the planted violations."""
    tp = TableProvider(spark, str(tmp_path), backend="csv",
                       schema="doc_id long, text string, lang string, "
                              "n_chars long")
    tp.overwrite(docs, "docs")
    suite = ValidationSuite(
        name="csv_suite",
        components=[Component("n_chars", "numeric"),
                    Component("lang", "categoric")],
        constraints=[Constraint("lang_domain", "in_domain",
                                {"component": "lang",
                                 "values": ["en", "es"]})],
        partition_cols=[],
    )
    res = run_validation(spark, tp.read("docs"), suite, resume=False)
    planted = len([i for i in range(30) if i % 3 == 0])  # lang == "xx"
    assert res.n_violations == planted


def _iceberg_available(spark) -> bool:
    """True iff an Iceberg Spark runtime jar is on the session
    classpath (none ships in this sandbox — the test self-activates
    the moment one appears, so the writeTo/table branch cannot
    bit-rot silently)."""
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def test_iceberg_backend_round_trip_when_runtime_present(spark, tmp_path):
    """Jar-gated end-to-end exercise of the Iceberg TableProvider
    branch: create a local hadoop catalog, append twice, read back,
    partition-list, exists().  Skipped (not passed) without the jar."""
    import pytest as _pytest

    from data_validation_spark.sources.table_provider import TableProvider

    if not _iceberg_available(spark):
        _pytest.skip("no Iceberg Spark runtime jar on the classpath")
    cat = "dvs_it"
    spark.conf.set(f"spark.sql.catalog.{cat}",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{cat}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{cat}.warehouse",
                   str(tmp_path / "wh"))
    spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {cat}.db")
    tp = TableProvider(spark, root=f"{cat}.db", backend="iceberg")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    tp.overwrite(df, "t")
    tp.append(df, "t")
    assert tp.exists("t")
    assert tp.read("t").count() == 4
    assert tp.read("t", columns=["v"]).columns == ["v"]


def test_orc_round_trip_with_tokens(spark, tmp_path):
    """ORC backend (bundled with Spark): round-trips the full
    input_hint shape INCLUDING the tokens array column, with column
    pruning through the reader."""
    from data_validation_spark.sources.sequences import synth_sequences
    tp = TableProvider(spark, str(tmp_path), backend="orc")
    seq = synth_sequences(spark, 500)
    tp.overwrite(seq, "seq", partition_by=["source"])
    back = tp.read("seq")
    assert back.count() == 500
    assert dict(back.dtypes)["tokens"] == "array<int>"
    slim = tp.read("seq", columns=["doc_id", "n_tok"])
    assert slim.columns == ["doc_id", "n_tok"]
    # content parity with the source frame (exact row sets)
    a = sorted((r.doc_id, r.n_tok) for r in seq.select(
        "doc_id", "n_tok").collect())
    b = sorted((r.doc_id, r.n_tok) for r in slim.collect())
    assert a == b


def test_validation_over_orc_input(spark, tmp_path):
    from data_validation_spark.operators.constraints import (
        evaluate_constraints)
    from data_validation_spark.plans.suite import (
        Component, Constraint, ValidationSuite)
    from data_validation_spark.sources.sequences import synth_sequences
    tp = TableProvider(spark, str(tmp_path), backend="orc")
    tp.overwrite(synth_sequences(spark, 2000), "seq")
    suite = ValidationSuite(
        name="orc_suite", components=[Component("n_tok", "numeric")],
        partition_cols=["source", "bucket"],
        constraints=[Constraint("dup", "unique", {"keys": ["doc_id"]})])
    run = evaluate_constraints(tp.read("seq"), suite)
    # the generator's known dup rate (i%97 ids duplicated) surfaces
    assert run.violations.count() > 0
    assert run.violations.count() % 2 == 0  # dup rows come in pairs
