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
* ``streaming_duplicates`` — custom stateful operator
  (``applyInPandasWithState``): CROSS-batch uniqueness, the one check
  ``foreachBatch`` cannot express (it only sees one batch).  State is
  sharded by a hash bucket of the key, holds the seen-key set per
  shard, and expires on a processing-time timeout so it never grows
  unbounded.

At scale: foreachBatch inherits all batch-path properties (map-side
partials, broadcast joins); the windowed agg's state is bounded by
(#windows in watermark horizon × #groups), never row count; the
stateful dedup's state is bounded by (keys within TTL), sharded across
``n_shards`` state-store partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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


def streaming_duplicates(stream_df: DataFrame, key_col: str = "doc_id",
                         n_shards: int = 64,
                         state_ttl_ms: int = 30 * 60 * 1000) -> DataFrame:
    """Cross-micro-batch duplicate detection — a custom stateful
    operator built on ``applyInPandasWithState`` (U-surface: Arrow
    batches in and out, no per-row Python against Spark rows).

    Keys are sharded into ``n_shards`` hash buckets; each shard's
    ``GroupState`` holds the set of keys it has seen.  Each micro-batch
    emits ``(key, shard, n_dup)`` for every key that arrived again
    after its first-ever occurrence (``n_dup`` = duplicate arrivals in
    this batch); state expires after ``state_ttl_ms`` of shard
    inactivity (processing-time timeout), bounding memory to the keys
    seen within the TTL.

    Scale notes: state per shard is the distinct-key list — shard count
    spreads it across the state store's partitions, and the TTL bounds
    its lifetime; for a 10^12-key stream, swap the exact list for a
    Bloom filter inside the same operator shape (the state schema is
    already bytes-friendly).  Use ``outputMode("update")``.
    """
    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).alias("__shard")
    keyed = stream_df.select(F.col(key_col).cast("string").alias("key"), shard)

    def detect(key, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (seen,) = state.get if state.exists else ([],)
        seen_set = set(seen)
        dup: dict[str, int] = {}  # key -> duplicate arrivals this batch
        for pdf in pdfs:
            for k, c in pdf["key"].value_counts().items():
                extra = int(c) - (0 if k in seen_set else 1)
                if extra > 0:
                    dup[k] = dup.get(k, 0) + extra
                seen_set.add(k)
        state.update((list(seen_set),))
        state.setTimeoutDuration(state_ttl_ms)
        if dup:
            yield pd.DataFrame({"key": list(dup),
                                "shard": [key[0]] * len(dup),
                                "n_dup": list(dup.values())})

    return (keyed.groupBy("__shard").applyInPandasWithState(
        detect,
        outputStructType="key string, shard long, n_dup long",
        stateStructType="seen array<string>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))


STREAM_DRIFT_TABLE = "stream_drift"


def streaming_drift(stream_df: DataFrame, reference,
                    components: list, sink: TableProvider,
                    thresholds: dict | None = None,
                    min_batch_rows: int = 1000,
                    checkpoint_dir: str | None = None,
                    trigger_available_now: bool = True) -> StreamingQuery:
    """Always-on drift monitor — rdv's production loop (score live
    traffic against a frozen reference profile) as a stream: each
    micro-batch is profiled with the batch ``build_profile`` and
    contrasted (KS / PSI / chi² / Δpinv) against ``reference``; one row
    per (batch, component, test) lands in the ``stream_drift`` sink.

    ``min_batch_rows`` guards statistical power: tiny batches produce
    noisy statistics (chi² against a treated-as-exact reference is hot
    on small samples — see verify notes), so under-sized batches are
    recorded with test='skipped_small_batch' instead of fake verdicts.

    Scale shape: profiling a batch is the fused single pass (map-side
    partials); the contrast itself is driver-side arithmetic on
    aggregated profiles — O(components × quantile points), independent
    of batch size.
    """
    from data_validation_spark.operators.contrast import contrast
    from data_validation_spark.operators.profile import build_profile

    spark = stream_df.sparkSession

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        if n < min_batch_rows:
            rows = [(int(batch_id), n, "_batch", "skipped_small_batch",
                     None, False)]
        else:
            cur = build_profile(batch_df, components)
            report = contrast(cur, reference, thresholds)
            rows = [(int(batch_id), n, name, r.test,
                     float(r.statistic), bool(r.drifted))
                    for name, cd in report.components.items()
                    for r in cd.results]
        out = spark.createDataFrame(
            rows, "batch_id long, n_rows long, component string, "
                  "test string, statistic double, drifted boolean")
        sink.append(out, STREAM_DRIFT_TABLE)

    writer = stream_df.writeStream.foreachBatch(handle) \
        .outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
