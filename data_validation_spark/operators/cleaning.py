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

import pandas as pd
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


def dedup_paragraphs(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id", line_sep: str = "\n",
                     min_chars: int = 1) -> DataFrame:
    """Corpus-GLOBAL paragraph/line dedup (the C4/Dolma span-dedup
    shape): every line that appears in more than one place survives
    only at its FIRST occurrence — ordered by (doc id, position) — and
    is removed everywhere else; surviving lines keep their original
    in-document order.

    ``min_chars`` exempts short lines (below it they are kept
    everywhere): global dedup of one-word lines would strip legitimate
    repeated structure corpus-wide.

    Scale shape (no window over the line key — a viral paragraph
    repeated 10^9 times must never sort on one task):

    1. posexplode each doc's lines;
    2. first occurrence per line via ``min(struct(id, pos))`` hash agg
       — MAP-SIDE partial mins tame hot lines before the shuffle;
    3. one equi-join of the exploded lines with their winner (AQE skew
       join splits any remaining hot key), keep the row iff it IS the
       winner;
    4. rebuild per doc with the order-preserving sorted collect_list.
    """
    eligible = F.length("__line") >= min_chars
    exploded = df.select(
        F.col(id_col),
        F.posexplode_outer(doc_lines_col(text_col, line_sep))
        .alias("__pos", "__line"))
    first = (exploded.where(eligible)
             .groupBy("__line")
             .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                 F.col("__pos").alias("p")))
                  .alias("__first")))
    kept = (exploded.join(first, "__line", "left")
            .where((~eligible)
                   | ((F.col("__first.i") == F.col(id_col))
                      & (F.col("__first.p") == F.col("__pos"))))
            .select(id_col, "__pos", "__line"))
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


# ---------------------------------------------------------------------------
# Unicode normalization (dedup-key canonicalization)
# ---------------------------------------------------------------------------

def normalize_unicode_col(text: str | Column = "text",
                          form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NFC by default) — the
    canonicalization that must run BEFORE content fingerprinting:
    ``é`` composed (U+00E9) and decomposed (``e`` + U+0301) are the
    same text to a reader but different bytes to ``md5``, so without
    this an accent-decomposed re-crawl silently escapes every exact
    and incremental dedup pass.

    Unicode normalization is inherently per-string (stateful
    codepoint-sequence rewriting — no Catalyst expression exists), so
    this is the repo's one sanctioned per-string kernel: an
    Arrow-batched pandas UDF over ``Series.str.normalize`` (C-level
    loop per batch, NULLs propagate).  Engine-portable: pandas, DuckDB
    ``nfc_normalize`` and ICU agree on the normal forms by spec.
    Compose as ``fingerprint_col(normalize_unicode_col(text))`` when
    ingesting sources that mix normal forms."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normal form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.str.normalize(form)

    return _norm(F.col(text) if isinstance(text, str) else text)
