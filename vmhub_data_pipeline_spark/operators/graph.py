"""Connected components over a pair list — the clustering step that turns
near-duplicate PAIRS (Jaccard / MinHash / SimHash / cosine output) into
duplicate CLUSTERS with one canonical keeper per cluster.

The reference has no graph step (its dedup is row-identity inside the
warehouse load), but any corpus-scale dedup needs one: pair output is an
edge list, and "keep one copy per duplicate set" is exactly
min-label-per-component. This is the standard iterative min-label
propagation (each vertex repeatedly adopts the minimum label in its
neighborhood), expressed as DataFrame joins so every round is two shuffles
on the vertex key:

* round cost: one edge-to-label equi-join + one min-groupBy — both hash
  partition on vertex id, and AQE reuses the layout between rounds;
* rounds to converge: O(component diameter). Near-dup clusters are
  near-cliques (diameter 2-3 in practice), so 3-5 rounds close a web-scale
  corpus; a pathological long-chain graph would want the large-star /
  small-star variant (Kiveris et al., "Connected Components in MapReduce"),
  which the round loop here could host without changing the interface.
* lineage: each round ends in ``localCheckpoint(eager=True)`` — iterative
  DataFrame loops otherwise stack O(rounds) of plan and re-execute it all
  on every action (the classic iterative-Catalyst trap).

Convergence is detected exactly (no label changed), not by a fixed round
count; ``max_iter`` is a backstop against adversarial graphs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    pairs: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 25,
) -> DataFrame:
    """Label every vertex of the undirected pair graph with the minimum
    vertex id reachable from it (= its component id).

    Returns (vertex, component) — one row per distinct vertex appearing in
    ``pairs``. Vertices not in any pair are singletons by definition and
    are the caller's to add back (cheap union with the source table).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected: propagate both ways; dedup to keep the per-round join slim
    edges = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)  # reused every round

    labels = (
        edges.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("component", F.col("v"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min label among my neighbors (one equi-join + one partial-agg groupBy)
        nbr_min = (
            edges.join(labels, edges["a"] == labels["v"])
            .select(F.col("b").alias("v"), F.col("component"))
            .groupBy("v")
            .agg(F.min("component").alias("nbr_min"))
        )
        proposed = labels.join(nbr_min, "v", "left").select(
            "v",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
            (
                F.coalesce(F.col("nbr_min"), F.col("component")) < F.col("component")
            ).alias("_changed"),
        )
        proposed = proposed.localCheckpoint(eager=True)
        if proposed.filter(F.col("_changed")).limit(1).count() == 0:
            labels = proposed.drop("_changed")
            break
        labels = proposed.drop("_changed")
    return labels


def pagerank_integer(
    pairs: DataFrame,
    src: str,
    dst: str,
    iterations: int = 4,
    init_score: int = 1_000_000,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank over the undirected pair graph, computed
    ENTIRELY in integer arithmetic so the result is bit-identical across
    engines (the repo's exact-quantization convention, functions/exact.py,
    applied to an iterative numeric algorithm):

        contrib(u)  = score(u) div outdeg(u)
        score'(v)   = teleport + (damping_pct * SUM_in contrib) div 100
        teleport    = ((100 - damping_pct) * init_score) div 100  (per node)

    All quantities are BIGINT and non-negative, so Spark's ``div``
    (truncating) and SQL's ``//`` (flooring) agree exactly — no float
    summation-order divergence can flip a digit, which is what lets the
    DuckDB oracle hash-match a 4-round distributed fixpoint.

    Per round: one join on the vertex key + one sum-groupBy on the
    destination — the same 2-shuffle layout as connected_components, with
    ``localCheckpoint(eager=True)`` cutting lineage so round N doesn't
    re-execute rounds 1..N-1. Returns (v, score) for vertices that appear
    in ``pairs`` (isolated vertices have no edges and keep the analytic
    value teleport + 0 — callers union them back if needed).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.union(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    edges = edges.localCheckpoint(eager=True)

    # loop-invariant: checkpoint once, or every round's eager action would
    # re-run the distinct and the degree aggregation from scratch
    verts = edges.select(F.col("a").alias("v")).distinct().localCheckpoint(eager=True)
    outdeg = (
        edges.groupBy("a")
        .agg(F.count("*").cast("long").alias("outdeg"))
        .localCheckpoint(eager=True)
    )
    teleport = ((100 - damping_pct) * init_score) // 100

    ranks = verts.withColumn(
        "score", F.lit(init_score).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["a"] == ranks["v"])
            .join(outdeg, "a")
            .select(
                F.col("b"),
                F.expr("score div outdeg").alias("contrib"),
            )
        )
        inbound = contrib.groupBy("b").agg(F.sum("contrib").alias("m"))
        ranks = (
            verts.join(inbound, verts["v"] == inbound["b"], "left")
            .select(
                "v",
                (
                    F.lit(teleport)
                    + F.expr(f"({damping_pct} * coalesce(m, 0L)) div 100")
                )
                .cast("long")
                .alias("score"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def label_propagation(
    pairs: DataFrame,
    src: str,
    dst: str,
    rounds: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.)
    over the undirected pair graph, made fully deterministic: each round
    every vertex adopts the most frequent label among its NEIGHBORS, ties
    broken by the smallest label, for a FIXED number of rounds (no
    oscillation-prone convergence test — the same stance as
    ``pagerank_integer``'s fixed iterations).

    Communities differ from connected components: a long chain is one
    component but fragments into local communities, which is what makes
    LPA the "near-dup neighborhoods" view where CC is the "transitive
    closure" view.

    Per round: one edge-to-label equi-join + one (vertex, label) count
    groupBy + one per-vertex argmax window — all keyed on vertex id, with
    ``localCheckpoint(eager=True)`` cutting lineage per round. Returns
    (v, community).
    """
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    edges = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    edges = edges.localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("a").alias("v")).distinct().withColumn("lab", F.col("v"))
    ).localCheckpoint(eager=True)

    from pyspark.sql import Window

    w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(rounds):
        votes = (
            edges.join(labels, edges["a"] == labels["v"])
            .select(F.col("b").alias("v"), "lab")
            .groupBy("v", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "lab")
            .localCheckpoint(eager=True)
        )
    return labels.select("v", F.col("lab").alias("community"))
