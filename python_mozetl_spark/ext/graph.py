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
key, AQE-coalesced), one tiny label-sum aggregate for the convergence
check — the same driver-loop-on-aggregates altitude as the KMeans fit
(SURVEY §7), with ``localCheckpoint`` truncating the lineage so the
plan does not grow with the iteration count.  Verified near-dup edge
lists are tiny relative to their corpus, so a bounded-probe driver
union-find fast path (one job) serves the common case and the loop is
the at-scale fallback.  For adversarial long-chain graphs the
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
    driver_max_edges: int = 200_000,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``,
    where component = the minimum vertex id reachable from it.

    Two paths, the same bounded-probe gate the dedup/ANN strategy
    gates use (ext/dedup.py, ext/similarity.py):

    - edge lists at or under ``driver_max_edges`` (near-dup graphs are
      pair-verified SURVIVORS — thousands of edges from millions of
      docs) collect once and resolve with union-find on the driver:
      ONE job instead of (2-3 jobs × diameter) rounds of min-label
      propagation, and the collect is bounded by a
      ``limit(max + 1)`` probe, never trusting an estimate;
    - anything larger runs the distributed min-label loop (pytest pins
      path equality via ``driver_max_edges=0``).

    Raises if the distributed loop has not converged within
    ``max_iter`` rounds (diameter ``> max_iter`` means the input is
    not a near-dup graph — use the alternating-star variant).
    """
    if driver_max_edges > 0:
        probe = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .limit(driver_max_edges + 1)
            .collect()
        )
        if len(probe) <= driver_max_edges:
            parent: dict = {}

            def find(x):
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for r in probe:
                a, b = r["a"], r["b"]
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:  # min-id root wins, matching the label fixpoint
                    lo, hi = (ra, rb) if ra < rb else (rb, ra)
                    parent[hi] = lo
            rows = [(v, find(v)) for v in parent]
            vtype = edges.schema[src].dataType.simpleString()
            return edges.sparkSession.createDataFrame(
                rows, f"vertex {vtype}, component {vtype}"
            )
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = sym.union(sym.select(F.col("b"), F.col("a"))).distinct().localCheckpoint()
    labels = (
        sym.select(F.col("a").alias("v"))
        .distinct()
        .withColumn("c", F.col("v"))
        .localCheckpoint()
    )

    # convergence check: min-label propagation only ever DECREASES a
    # label, so the label-sum strictly decreases until the fixpoint —
    # one aggregate over the just-checkpointed frame replaces the
    # old-vs-new join+count (a shuffle join per round, measured as the
    # dominant per-round cost on near-dup-sized graphs).  decimal(38,0)
    # keeps the sum exact out to ~1e26 (int64 ids × huge vertex counts
    # would overflow a bigint sum).
    def label_sum(frame: DataFrame) -> object:
        return frame.agg(
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    prev_sum = label_sum(labels)
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
        new_sum = label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            return labels.select(F.col("v").alias("vertex"), F.col("c").alias("component"))
        prev_sum = new_sum
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
