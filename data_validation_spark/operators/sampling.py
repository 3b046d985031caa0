"""Deterministic hash-based sampling for training-data pipelines.

`df.sample()` re-draws on every scan/retry (RNG per task attempt) — a
retried stage can emit a DIFFERENT sample, and no other engine can
reproduce the row set.  Pipelines that must be auditable sample by
KEY HASH instead: a row is in the sample iff a fixed-width hash of its
key falls under ``fraction × 2³²``.  Properties the RNG path lacks:

* reproducible across runs, retries, engines (md5 is universal — the
  DuckDB oracle replays the selection bit-for-bit);
* stable under data growth: a row's membership never changes when other
  rows appear, so incremental pipelines don't churn their sample;
* disjoint/nested samples for free via ``salt`` (different salt →
  independent sample; same salt, larger fraction → superset).

NULL sampling keys: ``md5(concat(NULL, salt))`` is NULL, so the
threshold predicate is never true and a NULL-key row would silently
vanish from the sample even at fraction 1.0 — on dirty keys that is a
shrinking sample nobody notices.  The samplers therefore take
``on_null`` (default ``"error"``: fail the job at the first NULL key;
``"drop"``: the documented legacy semantics; ``"coalesce"``: map every
NULL to one sentinel key, so all NULL rows share one membership
decision — lumpy, but deterministic and never silent).

Pure projection + filter: no shuffle, no RNG state, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def hash_bucket_col(key: Column, salt: str = "") -> Column:
    """Uniform uint32 bucket from the first 8 hex chars of
    md5(key ⊕ salt) — identical arithmetic is expressible in any engine
    with md5 (the oracle uses ``('0x' || substr(md5(..),1,8))::BIGINT``)."""
    return (F.conv(F.substring(F.md5(F.concat(key.cast("string"),
                                              F.lit(salt))), 1, 8), 16, 10)
            .cast("long"))


_NULL_SENTINEL = "\x00__null__"


def _sample_key(key: Column, on_null: str) -> Column:
    """Key column with the configured NULL policy applied (module
    docstring: NULL keys hash to NULL and silently fail the threshold
    predicate, so 'drop' is the only mode that leaves them alone)."""
    if on_null == "error":
        return F.when(
            key.isNull(),
            F.raise_error(F.lit(
                "hash sampling key is NULL — pass on_null='drop' or "
                "'coalesce', or clean the key column first"))
        ).otherwise(key.cast("string"))
    if on_null == "coalesce":
        return F.coalesce(key.cast("string"), F.lit(_NULL_SENTINEL))
    if on_null == "drop":
        return key
    raise ValueError(f"on_null must be error|drop|coalesce, got {on_null!r}")


def hash_sample(df: DataFrame, fraction: float, key_col: str = "doc_id",
                salt: str = "", on_null: str = "error") -> DataFrame:
    """Keep ~``fraction`` of rows, selected by key hash (see module
    docstring for why not ``df.sample``, and for ``on_null``)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(hash_bucket_col(_sample_key(F.col(key_col), on_null),
                                    salt)
                    < F.lit(int(fraction * _BUCKETS)))


def stratified_hash_sample(df: DataFrame, strata_col: str,
                           fractions: dict[str, float],
                           key_col: str = "doc_id", salt: str = "",
                           default_fraction: float = 0.0,
                           on_null: str = "error") -> DataFrame:
    """Per-stratum hash sampling (e.g. down-weight web, keep all wiki).
    One projection+filter pass — the per-stratum threshold is a CASE
    expression, so there is still no shuffle and no RNG."""
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {k!r} must be in [0, 1]")
    thr: Column | None = None
    for k, f in fractions.items():
        cond = F.col(strata_col) == F.lit(k)
        lim = F.lit(int(f * _BUCKETS))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    if thr is None:
        thr = F.lit(int(default_fraction * _BUCKETS))
    else:
        thr = thr.otherwise(F.lit(int(default_fraction * _BUCKETS)))
    return df.where(hash_bucket_col(_sample_key(F.col(key_col), on_null),
                                    salt) < thr)


def mix_to_proportions(df: DataFrame, strata_col: str,
                       targets: dict[str, float], key_col: str = "doc_id",
                       salt: str = "",
                       counts: dict[str, int] | None = None,
                       fractions_out: dict | None = None,
                       on_null: str = "error") -> DataFrame:
    """Down-sample strata so the output matches ``targets``'s relative
    proportions (domain reweighting: "make the corpus 30% web, 60%
    wiki, 10% books") WITHOUT upsampling: the binding stratum — the one
    whose supply runs out first relative to its target share — is kept
    in full and every other stratum is hash-sampled down to match.

    ``fraction_s = α · target_s / count_s`` with
    ``α = min_s count_s / target_s`` (so ``max fraction = 1``).
    Strata absent from ``targets`` are dropped.

    One count job (skipped when ``counts`` is passed — e.g. from an
    existing profile's frequency map) + one projection/filter pass;
    membership inherits every ``hash_sample`` guarantee (reproducible,
    nested under one salt, stable as data grows apart from the
    recomputed fractions — pin ``counts`` to freeze them).
    ``fractions_out={}`` receives the resolved per-stratum fractions,
    rounded to 6 decimals — the SAME rounding the filter uses, so a
    caller (or an oracle) can replay the exact row selection.
    """
    if not targets:
        raise ValueError("targets must be non-empty")
    tot_share = sum(targets.values())
    shares = {k: v / tot_share for k, v in targets.items()}
    if counts is None:
        rows = (df.where(F.col(strata_col).isin(list(targets)))
                .groupBy(strata_col).agg(F.count(F.lit(1)).alias("n"))
                .collect())
        counts = {r[strata_col]: r["n"] for r in rows}
    missing = [k for k in targets if not counts.get(k)]
    if missing:
        raise ValueError(f"strata with no rows cannot be mixed: {missing}")
    alpha = min(counts[k] / shares[k] for k in targets)
    fractions = {k: round(min(alpha * shares[k] / counts[k], 1.0), 6)
                 for k in targets}
    if fractions_out is not None:
        fractions_out.update(fractions)
    return stratified_hash_sample(df, strata_col, fractions,
                                  key_col=key_col, salt=salt,
                                  default_fraction=0.0, on_null=on_null)


def weighted_hash_sample(df: DataFrame, weight: Column,
                         key_col: str = "doc_id", salt: str = "",
                         on_null: str = "error") -> DataFrame:
    """Per-row acceptance sampling with probability ``weight`` ∈ [0, 1]
    (quality-weighted retention: keep good docs with high probability,
    bad docs rarely — the DCLM/FineWeb "soft filter" shape), decided by
    the same engine-portable key hash as ``hash_sample`` so the row set
    is reproducible, auditable, and nested: raising a row's weight can
    only ADD it to the sample, never rotate membership.

    ``weight`` is any deterministic Column (a quality score, a cluster
    1/size correction, a per-domain multiplier...).  Values are clamped
    to [0, 1].  Same pure projection+filter plan as ``hash_sample`` —
    no shuffle, no RNG, whole-stage codegen; an oracle replays the
    selection exactly when it reproduces the weight expression.
    """
    w = F.least(F.greatest(weight.cast("double"), F.lit(0.0)), F.lit(1.0))
    return df.where(
        hash_bucket_col(_sample_key(F.col(key_col), on_null), salt)
        .cast("double") < w * F.lit(float(_BUCKETS)))


def hash_split(df: DataFrame, fractions: dict[str, float],
               key_col: str = "doc_id", salt: str = "",
               label_col: str = "split",
               on_null: str = "error") -> DataFrame:
    """Deterministic disjoint train/val/test split: every row gets a
    ``label_col`` chosen by where its key's hash bucket falls in the
    cumulative ``fractions`` ranges (insertion order; fractions must
    sum to ≤ 1, any remainder labels NULL).  The standard "99/0.5/0.5"
    corpus split, with the properties `df.sample` can never give:
    partitions are EXACTLY disjoint, every engine/retry reproduces the
    same assignment, and a row's split never changes as the corpus
    grows — so no eval example can ever drift into train.

    One CASE projection over the shared bucket hash — no shuffle, no
    RNG; the assignment predicate is replayable in SQL (the
    ``hash_split`` oracle)."""
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bucket = hash_bucket_col(_sample_key(F.col(key_col), on_null), salt)
    expr = F.lit(None).cast("string")
    hi = 0.0
    # build the CASE from the last range backwards so evaluation order
    # is first-range-first
    bounds = []
    for name, frac in fractions.items():
        lo, hi = hi, hi + frac
        bounds.append((name, lo, hi))
    for name, lo, hi in reversed(bounds):
        expr = F.when(
            (bucket >= F.lit(int(lo * _BUCKETS)))
            & (bucket < F.lit(int(hi * _BUCKETS))),
            F.lit(name)).otherwise(expr)
    return df.withColumn(label_col, expr)


def group_sample_exact_k(df: DataFrame, group_cols: list[str],
                         id_cols: list[str], k: int,
                         salt: str = "") -> DataFrame:
    """EXACTLY ``min(k, group size)`` rows per group, chosen by md5
    rank — the eval-set constructor fraction sampling can't be
    (``stratified_hash_sample`` gives binomial counts; benchmarks need
    exact ones).

    Rank = ``row_number`` over ``md5(id ⊕ salt)`` per group (ties — md5
    collisions — break on the id columns, so the selection is a pure
    function of the data).  Same determinism contract as every sampler
    in this module: reproducible across runs, engines, and retries; a
    different ``salt`` draws an independent sample.  Membership is NOT
    growth-stable (new rows re-rank a group — ranks must, by
    definition of exact-k); pin corpora before drawing eval sets, or
    use ``hash_sample`` when growth-stability matters more than exact
    counts.

    One shuffle on ``group_cols``; per-task state is one group's rows
    (the partitioned-window bound, same as sessionization).  Output
    rows carry ``sample_rank`` (1..k).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    key = F.md5(F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in id_cols], F.lit(salt)))
    w = Window.partitionBy(*group_cols).orderBy(
        key.asc(), *[F.col(c).asc() for c in id_cols])
    return (df.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= int(k)))
