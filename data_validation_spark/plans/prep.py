"""End-to-end training-corpus preparation — the operators composed in
the order a production pipeline runs them.

Each stage is an existing, individually oracle-checked operator; this
module fixes the COMPOSITION: the order is not arbitrary, and getting
it wrong silently weakens every later stage —

1. **Unicode NFC** first: every later fingerprint/shingle/hash must see
   canonical bytes, or a decomposed re-crawl escapes dedup and
   decontamination.
2. **Boilerplate strip** before quality filters and dedup: chrome lines
   inflate repetition scores (dropping good docs) and dominate shingle
   sets (merging unrelated docs in near-dedup).
3. **Quality filters** before dedup: no point paying shuffle for docs
   that will be dropped anyway — and a junk doc must not win a dedup
   group and evict its good duplicate (filters run first, so survivors
   compete).
4. **PII redaction** before dedup: two docs differing only in the PII
   span become the SAME doc after scrubbing — redact-then-dedup
   catches them, dedup-then-redact does not.
5. **Exact dedup** (min-id keeps determinism).
6. **Decontamination** after dedup (the benchmark screen is per
   content, cheaper after the corpus shrank).
7. **Split** last: labels assigned on the final surviving row set, but
   by key hash — so reruns with more data never move a doc's split.

Every stage is a narrow Catalyst/operator transformation; the whole
pipeline is ONE composed lazy plan apart from the operators' own
internal materializations.  ``stats_out`` (optional — each count is an
extra action) records per-stage surviving row counts, the first thing
a pipeline owner looks at when a corpus shrinks unexpectedly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_validation_spark.operators.cleaning import (
    line_frequencies,
    normalize_unicode_col,
    strip_boilerplate,
)
from data_validation_spark.operators.dedup import (
    dedup_exact,
    ngram_contamination,
)
from data_validation_spark.operators.filters import apply_filters
from data_validation_spark.operators.redact import redact_pii
from data_validation_spark.operators.sampling import hash_split

__all__ = ["prepare_corpus"]


def prepare_corpus(df: DataFrame,
                   filters: dict[str, Column] | None = None,
                   benchmark: DataFrame | None = None,
                   split_fractions: dict[str, float] | None = None,
                   text_col: str = "text", id_col: str = "doc_id",
                   normalize: bool = True,
                   boilerplate_min_doc_freq: int | None = None,
                   redact_classes: list[str] | None = None,
                   redact: bool = True,
                   contamination_k: int = 3,
                   contamination_min_hits: int = 1,
                   split_salt: str = "",
                   stats_out: dict | None = None) -> DataFrame:
    """Run the standard prep pipeline (module docstring has the staging
    rationale); returns the surviving rows with ``text_col`` cleaned in
    place and, when ``split_fractions`` is given, a ``split`` label
    column.  Stages whose argument is ``None``/``False`` are skipped.
    """
    def count(stage: str, d: DataFrame) -> DataFrame:
        if stats_out is not None:
            stats_out[stage] = d.count()
        return d

    out = count("input", df)
    if normalize:
        out = out.withColumn(text_col, normalize_unicode_col(text_col))
    if boilerplate_min_doc_freq is not None:
        flagged = line_frequencies(out, text_col,
                                   min_doc_freq=boilerplate_min_doc_freq)
        out = count("boilerplate_stripped",
                    strip_boilerplate(out, flagged, text_col, id_col))
    if filters:
        out = count("filtered", apply_filters(out, filters))
    if redact:
        out = redact_pii(out, text_col, redact_classes)
    out = count("deduped", dedup_exact(out, text_col, id_col))
    if benchmark is not None:
        hits = ngram_contamination(out, benchmark, text_col, id_col,
                                   k_shingle=contamination_k,
                                   min_hits=contamination_min_hits)
        out = count("decontaminated",
                    out.join(hits.select(id_col), id_col, "left_anti"))
    if split_fractions:
        out = hash_split(out, split_fractions, key_col=id_col,
                         salt=split_salt)
    return count("output", out)
