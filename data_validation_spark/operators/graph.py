"""Distributed connected components and near-dup cluster assignment.

The step every LSH dedup pipeline needs after pair generation: near-dup
similarity is not transitive (A~B and B~C pass the threshold while A~C
does not), so "which docs are the same document" is the connected
component of the pair graph, not the pair list.  At 10^12 docs the pair
graph does not fit anywhere, so the component computation itself must
be a shuffle algorithm.

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond", SoCC 2014): each round
is one map-side-combinable ``groupBy().agg(min)`` plus an equi-join —
no driver-side union-find, no ``collect`` of graph data — and the edge
set converges to per-component stars in O(log n) rounds even on path
graphs (where naive min-label propagation needs O(diameter) rounds).
High-degree skew is the algorithm's own concern: large-star re-attaches
a hub's neighbors to the component minimum, so no node's degree grows
unboundedly across rounds; within a round, AQE skew-join handles hot
keys.  Per-round driver traffic is ONE (count, hash-sum) row for the
convergence check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "dedup_clusters", "soft_dedup_sample"]

# a path graph of n nodes needs ~log2(n) large/small rounds; 30 rounds
# covers any graph that could ever fit in storage (2^30+ diameter)
DEFAULT_MAX_ROUNDS = 30


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """(lo, hi) canonical undirected edges, self-loops dropped."""
    u, v = F.col(src), F.col(dst)
    return (edges
            .select(F.least(u, v).alias("cc_lo"),
                    F.greatest(u, v).alias("cc_hi"))
            .where(F.col("cc_lo") != F.col("cc_hi"))
            .distinct())


def _large_star(sym: DataFrame) -> DataFrame:
    """For each node u: attach every strictly-larger neighbor to
    m = min(N(u) ∪ {u}).  ``sym`` holds both directions of each edge.
    Output edges are (larger, smaller), distinct."""
    mins = sym.groupBy("u").agg(F.min("v").alias("cc_minv"))
    m = F.least(F.col("u"), F.col("cc_minv"))
    return (sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .distinct())


def _small_star(directed: DataFrame) -> DataFrame:
    """For each node u over its smaller neighbors N⁻(u) (``directed``
    orients every edge large→small): attach each v ∈ N⁻(u) ∪ {u},
    except the minimum m itself, to m.  Output (larger, smaller)."""
    mins = directed.groupBy("u").agg(F.min("v").alias("cc_m"))
    rewired = (directed.join(mins, "u")
               .where(F.col("v") != F.col("cc_m"))
               .select(F.col("v").alias("u"), F.col("cc_m").alias("v")))
    center = mins.select("u", F.col("cc_m").alias("v"))
    return rewired.unionByName(center).distinct()


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_rounds: int = DEFAULT_MAX_ROUNDS) -> DataFrame:
    """Component id (= minimum member id) for every node that appears
    in ``edges``.  Returns ``(node, component)`` with one row per
    distinct node; isolated nodes (absent from ``edges``) are absent —
    callers ``coalesce(component, id)`` after a left join.

    Node ids must be orderable and hash-joinable (int or string).  The
    result is deterministic: min-based attachment has no tie to break.
    """
    e = _canonical_edges(edges, src, dst)
    # localCheckpoint each round: persist alone caches DATA but the
    # LOGICAL plan still doubles per round — by round ~10 Catalyst
    # analysis dominates wall time (the classic iterative-Spark trap).
    # Checkpointing materializes to executor-local blocks and resets
    # the plan to a scan, so every round's plan is constant-size.
    e = (e.select(F.col("cc_hi").alias("u"), F.col("cc_lo").alias("v"))
         .localCheckpoint(eager=True))
    prev_sig = None
    for _ in range(max_rounds):
        sym = e.unionByName(e.select(F.col("v").alias("u"),
                                     F.col("u").alias("v")))
        e = _small_star(_large_star(sym)).localCheckpoint(eager=True)
        # one tiny driver row per round: (edge count, order-insensitive
        # hash sum) — equal signature means the star set is a fixpoint
        n, h = e.agg(
            F.count(F.lit(1)),
            # decimal(38,0) sum: exact and overflow-proof under ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)"))).first()
        if (n, h) == prev_sig:
            break
        prev_sig = (n, h)
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds — raise max_rounds (graph diameter ~2^{max_rounds}?)")
    # fixpoint edges are stars (node -> component minimum); the roots
    # name themselves
    comp = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node"),
                     F.col("v").alias("component")).distinct()
    return comp.unionByName(roots).distinct()


def dedup_clusters(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                   pair_cols: tuple[str, str] = ("id_a", "id_b"),
                   max_rounds: int = DEFAULT_MAX_ROUNDS) -> DataFrame:
    """Assign every row of ``df`` to its near-dup cluster: the
    connected component of the pair graph, labeled by the minimum
    ``id_col`` in the component (docs in no pair are their own
    singleton cluster).  Returns ``(id_col, cluster_id, cluster_size,
    is_canonical)`` — keep ``is_canonical`` rows to dedup, or weight by
    ``cluster_size`` for soft-dedup sampling.

    Scale: ``pairs`` is LSH output (bounded by banding, never
    all-pairs); the component computation is ``connected_components``
    above; the size/canonical annotations are one tiny agg on the
    cluster ids plus a broadcast-eligible join back.  Nothing here
    collects row data.
    """
    comp = connected_components(pairs, src=pair_cols[0], dst=pair_cols[1],
                                max_rounds=max_rounds)
    ids = df.select(F.col(id_col))
    labeled = (ids.join(comp, ids[id_col] == comp["node"], "left")
               .select(F.col(id_col),
                       F.coalesce("component", id_col).alias("__comp")))
    # cluster_id = min id among the rows of df ACTUALLY in the
    # component — the graph's own minimum may reference an id absent
    # from df (pairs from a stale index), and labeling by a non-member
    # would leave the whole cluster with no is_canonical row, silently
    # dropping it under hard dedup (ADVICE r3).  Same shuffle count:
    # the min rides the size agg.
    canon = labeled.groupBy("__comp").agg(
        F.min(id_col).alias("cluster_id"),
        F.count(F.lit(1)).alias("cluster_size"))
    return (labeled.join(canon, "__comp")
            .select(id_col, "cluster_id", "cluster_size",
                    (F.col(id_col) == F.col("cluster_id"))
                    .alias("is_canonical")))


def soft_dedup_sample(df: DataFrame, pairs: DataFrame,
                      id_col: str = "doc_id",
                      pair_cols: tuple[str, str] = ("id_a", "id_b"),
                      salt: str = "", target_per_cluster: float = 1.0,
                      on_null: str = "error") -> DataFrame:
    """Dedup without deleting: keep every doc with probability
    ``target_per_cluster / cluster_size`` — in expectation
    ``target_per_cluster`` survivors per near-dup cluster, drawn
    uniformly across the cluster instead of always the canonical doc
    (which biases toward whatever happens to sort first), with
    singletons kept outright for targets ≥ 1.  The SemDeDup-style soft
    alternative to hard canonical-keep.

    Deterministic end to end: cluster ids come from
    ``connected_components`` (min-based, tie-free) and retention from
    the portable md5 hash (``weighted_hash_sample``), so the surviving
    row SET is reproducible on any cluster and replayable by an
    oracle.  Returns the cluster-annotated rows that survive.
    """
    from data_validation_spark.operators.sampling import weighted_hash_sample
    clusters = dedup_clusters(df, pairs, id_col, pair_cols)
    w = F.least(F.lit(1.0),
                F.lit(float(target_per_cluster)) / F.col("cluster_size"))
    return weighted_hash_sample(clusters, w, key_col=id_col, salt=salt,
                                on_null=on_null)
