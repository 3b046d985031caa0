"""Array/vector expressions: shingles, cosine similarity, dot products.

Catalyst higher-order functions (``transform``/``zip_with``/
``aggregate``) keep all of this JVM-side; the pandas-UDF variants for
bulk similarity live in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_validation_spark.functions.text import words_col


def word_shingles_col(text: str | Column = "text", k: int = 3) -> Column:
    """Distinct word k-gram shingles of a document (dedup unit for
    MinHash/Jaccard).  Documents shorter than k words yield their full
    text as the single shingle."""
    w = words_col(text)
    n = F.array_size(w)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, k)))
    return F.array_distinct(grams)


def word_shingle_hashes_col(text: str | Column = "text",
                            k: int = 3) -> Column:
    """Distinct 64-bit hashes of the word k-gram shingles — the
    MinHash-side replacement for ``word_shingles_col`` that never
    materializes shingle STRINGS: each word is xxhash64'd ONCE, then
    every shingle is a fixed-width ``xxhash64(hw[i..i+k-1])`` remix of
    the k word hashes.  Byte cost is one hash pass over the document
    plus O(n_words) 8-byte remixes, vs concat-allocate-then-hash
    (~2× the bytes plus an allocation per shingle) for the string
    formulation — and the gap grows with document length.

    Semantics match ``word_shingles_col`` through a 64-bit hash:
    distinct shingles → distinct hashes (2⁻⁶⁴ collision mass, invisible
    to the Jaccard estimator); docs shorter than ``k`` words yield one
    shingle over the words present (``element_at`` past the end is
    NULL — ``try_element_at``, since ANSI ``element_at`` throws — and
    Spark's ``xxhash64`` skips NULL inputs, mirroring the string
    path's full-text fallback).  Use for LSH candidate
    generation; the exact-Jaccard verify tier keeps real shingle sets.
    """
    from data_validation_spark.functions.text import words_col
    w = words_col(text)

    def hashed(hw: Column) -> Column:
        n = F.array_size(hw)
        idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
        grams = F.transform(
            idx, lambda i: F.xxhash64(*[F.try_element_at(hw, i + j)
                                        for j in range(k)]))
        return F.array_distinct(grams)

    return let_col(F.transform(w, lambda x: F.xxhash64(x)), hashed)


def array_kgrams_col(arr: Column, k: int) -> Column:
    """Distinct contiguous k-grams of ANY array column, serialized as
    comma-joined strings — the gram unit for PRE-TOKENIZED corpora
    (token-id sequences), engine-portable so an oracle can rebuild the
    identical gram set.  Arrays shorter than ``k`` yield one gram over
    the elements present (mirrors ``word_shingles_col``)."""
    n = F.array_size(arr)
    idx = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(",", F.transform(
            F.slice(arr, i, k), lambda x: x.cast("string"))))
    return F.array_distinct(grams)


def array_kgram_postings_col(arr: Column, k: int) -> Column:
    """ALL contiguous k-grams of an array column in POSITION order
    (non-distinct), serialized as comma-joined strings — the posting
    unit for exact-substring span dedup, where position 0-based ``i``
    of the output is the gram covering elements ``[i, i+k)``.  Arrays
    shorter than ``k`` yield NO postings (a span that does not exist
    cannot be duplicated) — unlike ``array_kgrams_col``'s short-doc
    fallback, which exists for whole-doc similarity.  Engine-portable:
    an oracle rebuilds identical gram strings with list slicing."""
    n = F.array_size(arr)
    idx = F.sequence(F.lit(1), n - k + 1)
    grams = F.transform(
        idx, lambda i: F.concat_ws(",", F.transform(
            F.slice(arr, i, k), lambda x: x.cast("string"))))
    # ANSI sequence(1, n-k+1) with n < k would count DOWN — guard to empty
    return F.when(n >= k, grams).otherwise(
        F.array().cast("array<string>"))


def jaccard_col(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two (distinct-element) arrays."""
    inter = F.array_size(F.array_intersect(a, b)).cast("double")
    union = F.array_size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def let_col(value: Column, body) -> Column:
    """Catalyst "let-binding": evaluate ``value`` ONCE per row and feed
    it to ``body`` as a lambda variable.

    Composed column expressions are inlined by CollapseProject — e.g.
    16 ``element_at(sig, i)`` references to a signature column become
    16 full recomputations of the signature expression (measured: the
    LSH banding stage went quadratic in expression size, 12 s for 1000
    docs).  ``transform(array(value), v -> body(v))[1]`` binds the
    expression to a real lambda variable, which Catalyst cannot inline
    through."""
    return F.element_at(F.transform(F.array(value), body), 1)


def minhash_signature_col(shingles: Column, n_hashes: int) -> Column:
    """MinHash signature as an array<long>: for permutation j, the min
    of a permutation-j hash of each shingle over the shingle set.

    Single-pass: ONE ``aggregate`` traversal of the shingle array
    updates all ``n_hashes`` minima via ``zip_with(acc, hashes,
    least)``, so the (expensive) shingle expression is evaluated once
    per row no matter how wide the signature — the per-permutation
    ``array_min(transform(...))`` formulation re-evaluated the shingle
    array once per permutation after projection collapse.

    Cost shape: the VARIABLE-length string is hashed exactly once per
    shingle (let-bound ``xxhash64(s)``); the ``n_hashes`` permutations
    are fixed-width ``xxhash64(h, j)`` re-mixes of that single long —
    O(len + n_hashes) per shingle instead of O(len × n_hashes).  (The
    earlier ``xxhash64(concat(s, '#j'))`` formulation re-hashed the
    full string per permutation — measured ~15% slower on sf0.1's
    short ≤500-char docs, and the gap scales with document length:
    real multi-KB training documents pay len×16 string-hash bytes vs
    len+16 here.)  Composing through a 64-bit intermediate
    adds only ~2^-64 collision mass, so the J-estimator is unchanged;
    integer re-mixing also stays safely inside ANSI long arithmetic."""
    max_long = F.lit(0x7FFF_FFFF_FFFF_FFFF).cast("long")
    init = F.array(*[max_long for _ in range(n_hashes)])

    def step(acc: Column, s: Column) -> Column:
        def mixes(h: Column) -> Column:
            return F.array(*[F.xxhash64(h, F.lit(j))
                             for j in range(n_hashes)])
        return F.zip_with(acc, let_col(F.xxhash64(s), mixes),
                          lambda a, h: F.least(a, h))

    return F.aggregate(shingles, init, step)


def band_hashes_col(signature: Column, bands: int, rows: int) -> Column:
    """LSH banding: split the signature into ``bands`` groups of
    ``rows`` and hash each band → array<long> of band keys.  Band keys
    are ``xxhash64`` over the ``rows`` longs directly (fixed-width
    multi-arg form) — no per-band string building."""
    return F.array(*[
        F.xxhash64(F.lit(b), *[F.element_at(signature, b * rows + r + 1)
                               for r in range(rows)])
        for b in range(bands)])


def dot_col(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays via zip_with + aggregate."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x * x))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<numeric> columns (casts to double)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    denom = norm_col(ad) * norm_col(bd)
    return F.when(denom > 0, dot_col(ad, bd) / denom).otherwise(F.lit(0.0))


def lit_vector(values) -> Column:
    """A literal array<double> column from a Python/numpy vector."""
    return F.array(*[F.lit(float(v)) for v in values])
