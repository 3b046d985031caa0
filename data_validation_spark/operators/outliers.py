"""Embedding outlier detection — "which vectors sit far from their
group's centroid?" — with a centroid that is EXACT, so the verdict can
never flake across engines or partitionings.

The naive mean-of-floats centroid is order-dependent (float addition
is not associative; Spark's partial-agg order varies run to run) —
the same defect class as the round-2 sessionize hash flake.  Instead
(the pearson_corr_matrix playbook, operators/profile.py siblings):

1. quantize each element once: ``q = round(float * 1e6) :: BIGINT``
   — a float×small-int product is <= 44 significant bits, exact in
   double, and round() agrees on every engine;
2. per-(group, dim) sums as DECIMAL(38,0): integer addition is
   associative, so the centroid moments are bit-identical under ANY
   partitioning, and ANSI overflow fails loud at 10^38 instead of
   wrapping;
3. each row's squared distance in pure integers,
   ``dist2 = sum_dims (q*n - s)^2`` (the n-scaled form avoids the
   division), folded with ``zip_with`` + ``aggregate`` over the
   broadcast centroid array — a PROJECTION, no second exploded
   shuffle;
4. only the final surface leaves integer land:
   ``dist = round(sqrt(dist2) / (n * 1e6), 6)`` — cast/sqrt/divide are
   single IEEE ops in the same sequence on every engine (sqrt is
   correctly rounded by spec), so the rounded value cannot diverge.

Cost at scale: ONE map-side-combined shuffle of the 64x-exploded
(group, dim, q) rows for the moments; the distance + per-group top-k
window ranks with exact-integer keys (ties broken by id — never
reorder).  The centroid table is |groups| x dims rows — broadcast by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["embedding_outliers", "embedding_centroid_drift"]

_DEC = "decimal(38,0)"


def embedding_outliers(df: DataFrame, group_col: str = "label",
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       top_k: int = 5,
                       quant_scale: float = 1e6) -> DataFrame:
    """Per group, the ``top_k`` vectors farthest (L2) from the group's
    exact quantized centroid: ``group, id, rank, dist`` ordered by
    (dist2 DESC, id ASC) — integer sort keys, deterministic under ties.

    Rows with a NULL vector are ignored; all vectors in a group must
    share the same length (a short vector yields NULL terms and a loud
    NULL dist, never a silently truncated distance).
    """
    s = float(quant_scale)
    q = (df.filter(F.col(vec_col).isNotNull())
         .select(F.col(group_col).alias("grp"), F.col(id_col).alias("id"),
                 F.transform(vec_col,
                             lambda x: F.round(x.cast("double") * F.lit(s))
                             .cast("long")).alias("qv")))

    moments = (q.select("grp", F.posexplode("qv").alias("pos", "v"))
               .groupBy("grp", "pos")
               .agg(F.sum(F.col("v").cast(_DEC)).alias("s"),
                    F.count(F.lit(1)).alias("n")))
    centroid = (moments.groupBy("grp")
                .agg(F.max("n").alias("n"),
                     F.transform(
                         F.array_sort(F.collect_list(F.struct("pos", "s"))),
                         lambda e: e["s"]).alias("s_arr")))

    j = q.join(F.broadcast(centroid), "grp")
    term = F.zip_with(
        "qv", "s_arr",
        lambda v, sd: (v.cast(_DEC) * F.col("n") - sd)
        * (v.cast(_DEC) * F.col("n") - sd))
    d2 = j.select(
        "grp", "id", "n",
        F.aggregate(term, F.lit(0).cast(_DEC),
                    lambda acc, x: acc + x).alias("dist2"))

    w = Window.partitionBy("grp").orderBy(F.col("dist2").desc(),
                                          F.col("id").asc())
    return (d2.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= int(top_k))
            .select(F.col("grp").alias(group_col),
                    F.col("id").alias(id_col), "rank",
                    F.round(F.sqrt(F.col("dist2").cast("double"))
                            / (F.col("n").cast("double") * F.lit(s)), 6)
                    .alias("dist")))


def embedding_centroid_drift(cur: DataFrame, ref: DataFrame,
                             vec_col: str = "embedding",
                             quant_scale: float = 1e6) -> DataFrame:
    """Embedding-SPACE drift between two corpora — the lens the
    value-column drift family (chi²/KS/PSI/EMD) cannot provide: did
    the semantic center of the corpus move?  One row:
    ``n_cur, n_ref, dims, centroid_cosine, norm_ratio`` — cosine of
    the two mean vectors (1.0 = same direction; a topic/domain shift
    reads as a drop) and the ratio of their magnitudes (embedding
    "energy" change, e.g. a new encoder version).

    Exact by the module's playbook: elements quantize once
    (``round(x·scale)`` — identical on every engine), per-dimension
    sums are DECIMAL(38,0), and the n's CANCEL in cosine
    (``cos(Σa/nₐ, Σb/n_b) = cos(Σa, Σb)``) so the dot product and
    both squared norms are exact integers; only the final
    sqrt/divide/round-6 leaves integer land, a single IEEE sequence.
    Cost: one 64×-exploded map-side-combined shuffle PER SIDE down to
    |dims| rows, one |dims|-row join, one agg — corpus size only
    touches the first collapse.  A zero centroid on either side
    yields NULL (cosine undefined, never a guess)."""
    scale = F.lit(float(quant_scale))

    def moments(df: DataFrame, tag: str) -> DataFrame:
        e = (df.filter(F.col(vec_col).isNotNull())
             .select(F.posexplode(vec_col).alias("pos", "x")))
        q = F.round(F.col("x").cast("double") * scale).cast("long")
        return (e.select("pos", q.alias("q"))
                .groupBy("pos")
                .agg(F.sum(F.col("q").cast(_DEC)).alias(f"s_{tag}"),
                     F.count(F.lit(1)).alias(f"n_{tag}")))

    j = moments(cur, "a").join(moments(ref, "b"), "pos")
    agg = j.agg(
        F.max("n_a").alias("n_cur"), F.max("n_b").alias("n_ref"),
        F.count(F.lit(1)).alias("dims"),
        F.sum((F.col("s_a") * F.col("s_b")).cast(_DEC)).alias("dot"),
        F.sum((F.col("s_a") * F.col("s_a")).cast(_DEC)).alias("a2"),
        F.sum((F.col("s_b") * F.col("s_b")).cast(_DEC)).alias("b2"))
    ok = (F.col("a2") > 0) & (F.col("b2") > 0)
    cos = (F.col("dot").cast("double")
           / (F.sqrt(F.col("a2").cast("double"))
              * F.sqrt(F.col("b2").cast("double"))))
    ratio = (F.sqrt(F.col("a2").cast("double")) * F.col("n_ref")
             / (F.sqrt(F.col("b2").cast("double")) * F.col("n_cur")))
    return agg.select(
        "n_cur", "n_ref", "dims",
        F.when(ok, F.round(cos, 6)).alias("centroid_cosine"),
        F.when(ok, F.round(ratio, 6)).alias("norm_ratio"))
