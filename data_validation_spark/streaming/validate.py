"""Structured Streaming validation — the engine's stats/constraint pass
applied to an unbounded sequences stream.

The reference (rdv) is batch-only (SURVEY.md §2.2: streaming listed as a
non-goal hook); this module is the *rebuild's* scale-path extension: the
same ``ValidationSuite`` evaluated continuously.

Two shapes, matching Spark's two streaming idioms:

* ``validate_stream`` — ``foreachBatch``: each micro-batch runs the
  identical batch constraint pass (``evaluate_constraints``) and appends
  verdict + violation rows (tagged with batch_id) through a
  ``TableProvider``.  Exactly the batch semantics, incrementally — and
  because ``foreachBatch`` hands us a plain DataFrame, every operator
  (salted uniqueness *within* the batch, broadcast referential, bounds)
  works unchanged.
* ``streaming_stats`` — native watermarked windowed aggregation: per
  (event-time window × partition column) stat rows (count / mean / min /
  max / null-count) as an incremental state-store agg.  Late rows beyond
  the watermark are dropped by Spark; this is the always-on profile feed
  that a drift monitor tails.

At scale: foreachBatch inherits all batch-path properties (map-side
partials, broadcast joins); the windowed agg's state is bounded by
(#windows in watermark horizon × #groups), never row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from data_validation_spark.operators.constraints import evaluate_constraints
from data_validation_spark.plans.suite import ValidationSuite
from data_validation_spark.sources.table_provider import TableProvider

STREAM_VERDICTS_TABLE = "stream_verdicts"
STREAM_VIOLATIONS_TABLE = "stream_violations"


def validate_stream(stream_df: DataFrame, suite: ValidationSuite,
                    sink: TableProvider,
                    dims: dict[str, DataFrame] | None = None,
                    checkpoint_dir: str | None = None,
                    trigger_available_now: bool = True) -> StreamingQuery:
    """Run the suite's constraint pass on every micro-batch.

    Returns the started StreamingQuery; callers ``awaitTermination()``.
    With ``trigger_available_now`` the query drains the current backlog
    and stops — the incremental-batch idiom used in tests and backfills.
    The checkpoint dir gives exactly-once batch tracking across
    restarts (the streaming analogue of the IO7 manifest).
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run = evaluate_constraints(batch_df, suite, dims)
        sink.append(run.verdicts.withColumn("batch_id", F.lit(batch_id)),
                    STREAM_VERDICTS_TABLE)
        sink.append(
            run.violations
               .withColumn("batch_id", F.lit(batch_id))
               .withColumn("errors", F.to_json("errors")),
            STREAM_VIOLATIONS_TABLE)

    writer = (stream_df.writeStream
              .foreachBatch(process_batch)
              .outputMode("update"))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_stats(stream_df: DataFrame, ts_col: str, value_expr: str,
                    group_cols: list[str] | None = None,
                    window_duration: str = "1 minute",
                    watermark: str = "2 minutes") -> DataFrame:
    """Watermarked windowed stats feed (S1/S2 incrementally).

    Returns an unbounded DataFrame of one stats row per closed
    (window × group); write it with ``.writeStream`` in append mode so
    only watermark-finalized windows are emitted.
    """
    group_cols = group_cols or []
    v = F.expr(value_expr).cast("double")
    return (stream_df
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window_duration), *group_cols)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.expr(value_expr).isNull().cast("long"))
                 .alias("n_invalid"),
                 F.min(v).alias("min_v"),
                 F.max(v).alias("max_v"),
                 F.avg(v).alias("mean_v"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    *group_cols, "n", "n_invalid", "min_v", "max_v",
                    "mean_v"))
