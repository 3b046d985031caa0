"""Boilerplate removal — C4/RefinedWeb-style line-level cleaning.

Web corpora repeat navigation chrome, cookie banners and footers across
millions of pages; the standard screen counts each distinct line's
DOCUMENT frequency and strips lines that appear in too many documents.

Scale shape:

* ``line_frequencies`` — explode each doc's DISTINCT lines → one
  hash-groupBy keyed by line (map-side partials; reduce cardinality =
  #distinct lines).  The distinct-per-doc step means a line repeated
  inside one page counts once — document frequency, not term frequency.
* ``strip_boilerplate`` — the flagged-line set is broadcast when it is
  broadcast-SIZED, which true boilerplate vocabularies are (the lines
  shared by MANY docs); but ``line_frequencies(min_doc_freq=2)`` over a
  web corpus flags every line shared by even two pages — far past
  broadcast size — so the join strategy is guarded: the flagged set is
  counted first and above ``broadcast_limit`` lines the anti-join runs
  as a shuffle join instead (both docs' lines and the flagged set
  exchange on the line key; correct at any size, no driver/executor
  OOM).  Each doc's lines posexplode, anti-join, and re-assemble in
  original order with a sorted ``collect_list`` — one shuffle keyed by
  doc id, state per key = that doc's surviving lines.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def doc_lines_col(text: str | Column = "text",
                  line_sep: str = "\n") -> Column:
    """Non-empty trimmed lines of a document."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.transform(F.split(c, line_sep), F.trim),
                    lambda x: F.length(x) > 0)


def line_frequencies(df: DataFrame, text_col: str | Column = "text",
                     line_sep: str = "\n",
                     min_doc_freq: int = 2) -> DataFrame:
    """(line, doc_freq) for every line appearing in ≥ ``min_doc_freq``
    DISTINCT documents — the boilerplate candidate list."""
    lines = F.explode(F.array_distinct(doc_lines_col(text_col, line_sep)))
    return (df.select(lines.alias("line"))
            .groupBy("line").agg(F.count(F.lit(1)).alias("doc_freq"))
            .filter(F.col("doc_freq") >= min_doc_freq))


#: flagged-line sets above this row count are anti-joined with a
#: shuffle join instead of a broadcast (a line row is ~100 B, so 10^6
#: lines ≈ 100 MB serialized — already past comfortable broadcast size)
BROADCAST_LINE_LIMIT = 1_000_000


def strip_boilerplate(df: DataFrame, boilerplate: DataFrame,
                      text_col: str = "text", id_col: str = "doc_id",
                      line_sep: str = "\n",
                      broadcast_limit: int | None = BROADCAST_LINE_LIMIT
                      ) -> DataFrame:
    """Remove every ``boilerplate.line`` from each document, preserving
    the original order of surviving lines.  Documents reduced to zero
    lines survive with empty text (drop them downstream if desired).

    ``broadcast_limit``: the flagged set is counted first (one small
    action — it was just aggregated, so this is cheap) and broadcast
    only when it has at most this many lines; above it the anti-join
    falls back to a shuffle join and a warning records the choice.
    Pass ``None`` to skip the count and force the broadcast (callers
    that already know the set is small, e.g. a curated stop-line list).
    """
    flagged = boilerplate.select(F.col("line").alias("__line"))
    if broadcast_limit is None:
        flagged = F.broadcast(flagged)
    else:
        n_flagged = flagged.count()
        if n_flagged <= broadcast_limit:
            flagged = F.broadcast(flagged)
        else:
            warnings.warn(
                f"strip_boilerplate: {n_flagged} flagged lines exceed "
                f"broadcast_limit={broadcast_limit}; using a shuffle "
                "anti-join (raise min_doc_freq if this set was meant to "
                "be boilerplate-sized)", stacklevel=2)
    exploded = df.select(
        F.col(id_col),
        F.posexplode_outer(doc_lines_col(text_col, line_sep))
        .alias("__pos", "__line"))
    kept = exploded.join(flagged, "__line", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(
                           F.struct("__pos", "__line"))),
                       lambda s: s["__line"]),
                   line_sep).alias("__clean")))
    return (df.join(rebuilt, id_col, "left")
            .withColumn(text_col, F.coalesce(F.col("__clean"), F.lit("")))
            .drop("__clean"))
