"""Graph resolution for dedup pipelines.

Near-dup operators emit PAIRS; a training-data pipeline needs
CLUSTERS — pick one canonical document per group of transitively
connected near-duplicates.  That is connected components, the one
genuinely iterative algorithm in the dedup family.

:func:`connected_components` is min-label propagation expressed as
DataFrame ops: every vertex starts as its own label; each round a
vertex takes the minimum label among itself and its neighbors;
converged when no label changes.  Rounds = graph diameter — near-dup
clusters are near-cliques (diameter 1-2), so 2-3 rounds in practice.
Per round: one join + one aggregation (both shuffling on the vertex
key, AQE-coalesced), one tiny count for the convergence check — the
same driver-loop-on-aggregates altitude as the KMeans fit (SURVEY §7),
with ``localCheckpoint`` truncating the lineage so the plan does not
grow with the iteration count.  For adversarial long-chain graphs the
alternating large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce") halves the round count; near-dup workloads
never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``,
    where component = the minimum vertex id reachable from it.

    Raises if not converged within ``max_iter`` rounds (diameter
    ``> max_iter`` means the input is not a near-dup graph — use the
    alternating-star variant).
    """
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b"), F.col("a"))).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("c", F.col("v"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor = sym.join(labels, sym["b"] == labels["v"]).select(
            F.col("a").alias("v"), F.col("c")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("v")
            .agg(F.min("c").alias("c"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "v")
            .where(F.col("n.c") != F.col("o.c"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("v").alias("vertex"), F.col("c").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "graph diameter exceeds the near-dup regime — use alternating "
        "large-star/small-star"
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 3,
    damping: float = 0.85,
    precision: int = 6,
) -> DataFrame:
    """Fixed-iteration weighted PageRank: ``r_v = (1−d)/N +
    d·Σ_{u→v} (w_uv/W_u)·r_u``, unrolled ``iterations`` times into one
    declarative plan.

    Returns ``(vertex, rank)`` with rank rounded to ``precision``.
    Fixed iteration count (rather than convergence polling) keeps the
    whole computation a single Catalyst plan AND makes it exactly
    reproducible in any engine — the oracle unrolls the same three
    steps in SQL.

    Scale shape: per iteration one co-partitioned join of the
    transition matrix with the rank vector (both hash-partitioned on
    the vertex key — AQE reuses the exchange) and one hash agg on the
    destination.  The transition matrix and vertex set are
    ``localCheckpoint``-ed once so the 3-deep unrolled plan re-reads
    materialized partitions instead of recomputing the edge subtree
    per iteration.  N arrives via one tiny scalar count (the
    SURVEY-sanctioned driver altitude, like the KMeans centroid fit).

    Dangling vertices (no out-edges) leak their mass — acceptable for
    the symmetric graphs (co-occurrence, near-dup) this engine builds;
    add a dangling-mass redistribution term before using on directed
    web-style graphs.
    """
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    if not (0.0 < damping < 1.0):
        raise ValueError("damping must be in (0, 1)")
    w = F.col(weight) if weight else F.lit(1.0)
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b"), w.cast("double").alias("w")
    )
    # Spark is case-insensitive: name the out-weight distinctly from "w"
    outw = e.groupBy("a").agg(F.sum("w").alias("__tot"))
    trans = (
        e.join(outw, "a")
        .select("a", "b", (F.col("w") / F.col("__tot")).alias("p"))
        .localCheckpoint()
    )
    nodes = (
        e.select("a").unionByName(e.select(F.col("b").alias("a"))).distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.select(F.col("a").alias("v"), F.lit(1.0 / n).alias("r"))
    for _ in range(iterations):
        inflow = (
            trans.join(ranks, trans["a"] == ranks["v"])
            .groupBy("b")
            .agg(F.sum(F.col("p") * F.col("r")).alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes["a"] == inflow["b"], "left").select(
            F.col("a").alias("v"),
            (F.lit(base) + damping * F.coalesce("inflow", F.lit(0.0))).alias("r"),
        )
    return ranks.select(
        F.col("v").alias("vertex"), F.round("r", precision).alias("rank")
    )
