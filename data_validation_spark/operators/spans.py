"""Exact duplicate-SPAN detection over pre-tokenized sequences.

The corpus-level exact-substring dedup shape (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better"): find every
length-``k`` token window that occurs more than once ANYWHERE in the
corpus (across documents or repeated within one), keep its first
occurrence, and report / scrub the rest.  Doc-level near-dedup
(MinHash/SimHash, operators/dedup.py) misses this entirely — two
documents sharing one viral quoted paragraph are not near-duplicates,
but the paragraph still trains the model N times.

Re-expressed for Spark instead of the reference literature's
suffix-array formulation:

* a suffix array is a global SORT of all corpus positions; the
  MapReduce-equivalent is a hash-GROUPBY of all k-gram postings — the
  same O(total tokens) shuffle a distributed suffix-array build pays,
  but with MAP-SIDE partial aggregation collapsing hot grams (a
  boilerplate span repeated 10^9 times arrives at the reducer as one
  partial per map task, not 10^9 rows),
* postings carry a 64-bit gram HASH (one ``xxhash64`` over the k token
  ids — 8 bytes shuffled per position, vs ~4k bytes for the literal
  gram; 2⁻⁶⁴ collision mass is invisible next to near-dedup's own
  tolerances), with the literal comma-joined gram available for
  engine-portable oracle replay,
* first-occurrence-wins is ``min(struct(doc, pos))`` — associative,
  so partials collapse map-side exactly like ``dedup_paragraphs``,
* per-doc span coverage exploits that all intervals have EQUAL length
  k: the union of sorted intervals is ``k + Σ min(k, pos_i −
  pos_{i−1})`` — one pass over the doc's duplicated positions, no
  interval-merge state machine and no per-token expansion,
* the scrub rebuilds each doc from its kept token positions with the
  same order-preserving sorted ``collect_list`` as
  ``dedup_paragraphs`` — never a window over the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_validation_spark.functions.arrays import array_kgram_postings_col


def token_span_postings(df: DataFrame, tokens_col: str = "tokens",
                        id_col: str = "doc_id", k: int = 16,
                        hashed: bool = True) -> DataFrame:
    """(id, pos, gram) for every 0-based position ``pos`` whose k-gram
    window ``tokens[pos, pos+k)`` exists; docs shorter than ``k`` emit
    nothing.  ``hashed=True`` (production) emits the 64-bit
    ``xxhash64`` of the k token ids — fixed 8-byte postings;
    ``hashed=False`` emits the literal comma-joined gram (what a SQL
    oracle can rebuild).  The two agree on every dup/coverage count
    unless two distinct grams collide in 64 bits (~n²·2⁻⁶⁵)."""
    arr = F.col(tokens_col)
    if hashed:
        n = F.array_size(arr)
        idx = F.sequence(F.lit(1), n - k + 1)
        grams = F.transform(
            idx, lambda i: F.xxhash64(*[F.element_at(arr, i + j)
                                        for j in range(k)]))
        # ANSI sequence(1, n-k+1) with n < k would count DOWN — guard
        gram_arr = F.when(n >= k, grams).otherwise(
            F.array().cast("array<long>"))
    else:
        gram_arr = array_kgram_postings_col(arr, k)
    return df.select(F.col(id_col),
                     F.posexplode(gram_arr).alias("__pos", "__gram"))


def duplicate_token_spans(df: DataFrame, tokens_col: str = "tokens",
                          id_col: str = "doc_id", k: int = 16,
                          hashed: bool = True) -> DataFrame:
    """(id, pos) of every NON-FIRST occurrence of a k-gram that occurs
    ≥ 2 times corpus-wide.  "First" is the global ``(doc, pos)``
    minimum, so within-doc repeats count and exactly one occurrence of
    each duplicated span survives — the Lee-et-al. keep-one contract.
    One O(total tokens) posting shuffle (map-side combined), then one
    equi-join of postings against the per-gram winner (AQE splits any
    residual hot gram)."""
    postings = token_span_postings(df, tokens_col, id_col, k, hashed)
    dup = (postings
           .groupBy("__gram")
           .agg(F.min(F.struct(F.col(id_col).alias("i"),
                               F.col("__pos").alias("p"))).alias("__first"),
                F.count(F.lit(1)).alias("__n"))
           .filter(F.col("__n") > 1))
    return (postings.join(dup, "__gram")
            .where((F.col("__first.i") != F.col(id_col))
                   | (F.col("__first.p") != F.col("__pos")))
            .select(id_col, "__pos"))


def duplicate_span_report(df: DataFrame, tokens_col: str = "tokens",
                          id_col: str = "doc_id", k: int = 16,
                          hashed: bool = True) -> DataFrame:
    """Per-doc duplicated-span accounting: ``(id, n_tok, n_dup_spans,
    dup_covered_tokens, dup_token_frac)``.

    ``dup_covered_tokens`` is the exact size of the union of the doc's
    duplicated ``[pos, pos+k)`` intervals.  Because every interval has
    the same length, the union of the SORTED positions is
    ``k + Σ min(k, pos_i − pos_{i−1})`` — computed per doc from one
    ``sort_array(collect_list(pos))`` (bounded by doc length) with a
    ``zip_with`` over adjacent pairs; no per-token explode, no merge
    loop.  Docs with no duplicated span report zeros."""
    dup = duplicate_token_spans(df, tokens_col, id_col, k, hashed)
    ps = F.sort_array(F.collect_list("__pos"))
    per_doc = (dup.groupBy(id_col)
               .agg(F.count(F.lit(1)).alias("n_dup_spans"),
                    ps.alias("__ps")))
    sz = F.array_size(F.col("__ps"))
    diffs = F.zip_with(
        F.slice(F.col("__ps"), F.lit(2), sz - 1),
        F.slice(F.col("__ps"), F.lit(1), sz - 1),
        lambda a, b: F.least(F.lit(k), a - b))
    covered = (F.lit(k)
               + F.aggregate(diffs, F.lit(0), lambda acc, x: acc + x))
    per_doc = per_doc.select(
        id_col, "n_dup_spans",
        covered.cast("long").alias("dup_covered_tokens"))
    base = df.select(F.col(id_col),
                     F.coalesce(F.array_size(F.col(tokens_col)), F.lit(0))
                     .cast("long").alias("n_tok"))
    return (base.join(per_doc, id_col, "left")
            .select(
                id_col, "n_tok",
                F.coalesce("n_dup_spans", F.lit(0)).cast("long")
                .alias("n_dup_spans"),
                F.coalesce("dup_covered_tokens", F.lit(0))
                .alias("dup_covered_tokens"))
            .withColumn(
                "dup_token_frac",
                F.when(F.col("n_tok") > 0,
                       F.col("dup_covered_tokens") / F.col("n_tok"))
                .otherwise(F.lit(0.0))))


def scrub_duplicate_spans(df: DataFrame, tokens_col: str = "tokens",
                          id_col: str = "doc_id", k: int = 16,
                          hashed: bool = True) -> DataFrame:
    """Remove every token covered by a non-first duplicated span,
    preserving the order of survivors — the scrubbing half of
    exact-substring dedup.  Note the first occurrence of each span
    survives intact (keep-one), and a token is removed if ANY
    duplicated window covers it.

    Shape: duplicated positions expand to covered token indices
    (``sequence(pos, pos+k−1)``, bounded per doc by doc length), the
    doc's tokens posexplode once, survivors are a left-anti equi-join
    on ``(id, idx)``, and each doc rebuilds via order-preserving
    sorted ``collect_list`` — the ``dedup_paragraphs`` rebuild, no
    windows.  Fully-scrubbed docs come back as empty arrays; NULL
    token arrays stay NULL."""
    dup = duplicate_token_spans(df, tokens_col, id_col, k, hashed)
    covered = (dup.select(
        F.col(id_col),
        F.explode(F.sequence(F.col("__pos"),
                             F.col("__pos") + (k - 1))).alias("__idx"))
        .distinct())
    exploded = df.select(
        F.col(id_col),
        F.posexplode(F.col(tokens_col)).alias("__idx", "__tok"))
    kept = exploded.join(covered, [id_col, "__idx"], "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.transform(
                   F.array_sort(F.collect_list(
                       F.struct("__idx", "__tok"))),
                   lambda s: s["__tok"]).alias("__clean")))
    elem_t = [f.dataType for f in df.schema.fields
              if f.name == tokens_col][0]
    return (df.join(rebuilt, id_col, "left")
            .withColumn(
                tokens_col,
                F.when(F.col(tokens_col).isNull(), F.lit(None).cast(elem_t))
                .otherwise(F.coalesce(
                    F.col("__clean").cast(elem_t),
                    F.array().cast(elem_t))))
            .drop("__clean"))
