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

__all__ = ["embedding_outliers"]

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
