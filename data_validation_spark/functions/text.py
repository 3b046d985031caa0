"""Text-analysis expressions for training-data pipelines (driver brief:
language-ID, quality scoring, token counting, fingerprinting).

All hot-path logic is Catalyst expressions (split / regexp / higher-order
array functions) — JVM-side, whole-stage-codegen'd, no Python.  Every
builder returns a Column so callers compose them into a single select.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic — deliberately small; the operator shape is what matters
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "du"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "des"],
}


def words_col(text: str | Column = "text") -> Column:
    """Whitespace tokenization; empty/blank text → empty array (the
    bare ``split('')`` returns [''], which would count as one token)."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
            .otherwise(F.split(t, r"\s+"))


def token_count_col(text: str | Column = "text") -> Column:
    """Whitespace token count (S: token counting)."""
    return F.array_size(words_col(text))


def bpe_ish_token_count_col(text: str | Column = "text") -> Column:
    """BPE-ish token estimate: count of word-piece matches of a GPT-2-style
    pre-tokenizer regex (word chars run / number / punct run), so
    'don't stop!!' → 4 pieces.  Pure regex, JVM-side."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(
        c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), F.lit(0)))


def punct_ratio_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    puncts = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]-]", ""))
    return puncts / F.greatest(F.length(c), F.lit(1))


def uppercase_ratio_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    uppers = F.length(F.regexp_replace(c, r"[^A-Z]", ""))
    return uppers / F.greatest(F.length(c), F.lit(1))


def avg_word_len_col(text: str | Column = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    n_words = token_count_col(c)
    # chars in words = total chars - separators; use sum of word lengths
    chars = F.aggregate(words_col(c), F.lit(0),
                        lambda acc, w: acc + F.length(w))
    return F.when(n_words > 0, chars.cast("double") / n_words).otherwise(F.lit(0.0))


def stopword_count_col(text: str | Column, lang: str) -> Column:
    """Occurrences (not distinct) of the language's stopwords."""
    lit_set = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(
        F.transform(words_col(text), lambda w: F.lower(w)),
        lambda w: F.array_contains(lit_set, w)))


def lang_id_col(text: str | Column = "text") -> Column:
    """Heuristic language ID: argmax of stopword hit counts across the
    known languages; 'und' (undetermined) when nothing matches."""
    pairs = [F.struct(stopword_count_col(text, lang).alias("hits"),
                      F.lit(lang).alias("lang")) for lang in STOPWORDS]
    best = F.array_max(F.array(*pairs))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_col(text: str | Column = "text") -> Column:
    """Composite [0,1] quality heuristic: penalize empty/very short docs,
    extreme punctuation/uppercase density, degenerate word lengths.
    The exact weighting is a heuristic; the operator contract is a
    deterministic scalar per document."""
    n = token_count_col(text)
    len_ok = F.least(n.cast("double") / F.lit(20.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio_col(text) * 4)
    upper_pen = F.greatest(F.lit(0.0), F.lit(1.0) - uppercase_ratio_col(text) * 4)
    awl = avg_word_len_col(text)
    awl_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(len_ok * punct_pen * upper_pen * awl_ok, 6)


def fingerprint_col(text: str | Column = "text") -> Column:
    """Document fingerprint: md5 of the whitespace-normalized, lowercased
    text — stable across engines (oracle-parity with DuckDB md5)."""
    c = F.col(text) if isinstance(text, str) else text
    normalized = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
    return F.md5(normalized)


def rolling_hash_col(text: str | Column = "text", window: int = 8) -> Column:
    """Karp-Rabin-style rolling fingerprint set: xxhash64 of each
    ``window``-word shingle, min-sampled (keep the smallest 8) — a
    compact winnowing-style sketch for containment checks."""
    w = words_col(text)
    n = F.array_size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(0)))
    shingle_hashes = F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(w, i, window))))
    return F.slice(F.array_sort(shingle_hashes), 1, 8)


def dup_word_fraction_col(text: str | Column = "text") -> Column:
    """Gopher-style repetition signal: fraction of word occurrences
    beyond each word's first — 0 for all-distinct text, → 1 for
    degenerate repetition.  Pure Catalyst (no UDF)."""
    w = words_col(text)
    n = F.array_size(w)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (n - F.array_size(F.array_distinct(w))).cast("double") / n)


def dup_ngram_fraction_col(text: str | Column = "text",
                           k: int = 2) -> Column:
    """Fraction of word ``k``-gram occurrences beyond each gram's first
    — the MassiveText duplicate-n-gram filter's core statistic.
    Computed from the positional (non-distinct) gram list."""
    w = words_col(text)
    n = F.array_size(w)
    n_grams = F.greatest(n - k + 1, F.lit(0))
    grams = F.transform(F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
                        lambda i: F.concat_ws(" ", F.slice(w, i, k)))
    grams = F.when(n_grams > 0, grams).otherwise(
        F.array().cast("array<string>"))
    return F.when(n_grams == 0, F.lit(0.0)).otherwise(
        (n_grams - F.array_size(F.array_distinct(grams))).cast("double")
        / n_grams)


def repetition_stats_exprs(text: str | Column = "text") -> list[Column]:
    """The per-doc repetition battery (select alongside other stats)."""
    return [
        F.round(dup_word_fraction_col(text), 6).alias("dup_word_frac"),
        F.round(dup_ngram_fraction_col(text, 2), 6).alias("dup_2gram_frac"),
        F.round(dup_ngram_fraction_col(text, 3), 6).alias("dup_3gram_frac"),
    ]
