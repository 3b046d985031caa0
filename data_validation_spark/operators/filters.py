"""Filter acceptance reporting — the dry run every pipeline owner does
before committing a filter config: "what fraction of each source
survives these thresholds, and which filter bites?"

One grouped aggregation computes every named predicate's pass count and
the all-filters survivor count — a single scan regardless of how many
filters are in the config (each is one more conditional-sum column,
map-side partials, reduce cardinality = #groups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def acceptance_report(df: DataFrame, predicates: dict[str, Column],
                      group_cols: list[str] | None = None) -> DataFrame:
    """Per-group (n, n_pass_<name>..., n_pass_all).  A NULL predicate
    result counts as FAIL (three-valued logic never inflates survivor
    counts).  ``predicates`` preserves insertion order in the output."""
    if not predicates:
        raise ValueError("predicates must be non-empty")
    aggs = [F.count(F.lit(1)).alias("n")]
    all_pred: Column | None = None
    for name, p in predicates.items():
        p0 = F.coalesce(p, F.lit(False))
        aggs.append(F.sum(p0.cast("int")).cast("long")
                    .alias(f"n_pass_{name}"))
        all_pred = p0 if all_pred is None else (all_pred & p0)
    aggs.append(F.sum(all_pred.cast("int")).cast("long")
                .alias("n_pass_all"))
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    return grouped.agg(*aggs)


def apply_filters(df: DataFrame,
                  predicates: dict[str, Column]) -> DataFrame:
    """Keep only rows passing EVERY predicate (NULL = fail) — the
    commit step after ``acceptance_report`` looks right."""
    cond = F.lit(True)
    for p in predicates.values():
        cond = cond & F.coalesce(p, F.lit(False))
    return df.where(cond)
