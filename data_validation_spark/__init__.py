"""data_validation_spark — a PySpark-native schema + constraint validation engine.

A from-scratch rebuild of the semantics of raymon-ai/data-validation
(rdv's Schema / Component / Stats model — see SURVEY.md §1-§3) designed
for Iceberg/parquet tables of pre-tokenized training sequences at
10^12-row scale:

* one vectorized per-partition pass computes column stats (min/max/mean/
  std/quantile sketches, categorical frequencies, null/length profiles),
* constraint predicates (bounds, domain, uniqueness, referential
  integrity, token-array consistency) emit per-partition pass/fail
  verdicts and violation rows,
* distribution-drift checks (chi-squared / KS / PSI) contrast a built
  profile against a frozen reference profile,
* runs are resumable from a checkpointed manifest of completed
  partitions, with lineage + metrics rows written to a results table.

Everything is expressed Spark-first: DataFrame/Catalyst expressions on
the hot path, Arrow-batched pandas UDFs where Catalyst genuinely cannot
express the kernel, zero per-row Python.
"""

__version__ = "0.1.0"

from data_validation_spark.plans.suite import (  # noqa: F401
    CategoricStats,
    Component,
    NumericStats,
    Profile,
    ValidationSuite,
)
