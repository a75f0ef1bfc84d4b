"""Clustering-based donor/similarity model (the ML-pipeline family).

Mirrors the taar_similarity shape (mozetl/taar/taar_similarity.py:
127-175: Pipeline.fit → cluster assignment → per-cluster stratified
donor sampling) re-expressed DataFrame-first:

- features come straight from an ``array<float>`` embedding column via
  ``array_to_vector`` (the reference instead dropped to RDDs to build
  features, taar_similarity.py:119-124 — the exact anti-pattern
  SURVEY.md §1.1 flags);
- donor sampling stays distributed (``sampleBy`` per cluster) instead
  of collect-then-decide;
- seeded end-to-end for reproducible tests (§5 technique 5).

The reference's HashingTF+IDF stage applies to token features; for
pre-embedded inputs KMeans consumes vectors directly.  Swap
``KMeans`` for ``BisectingKMeans`` for the reference's exact
estimator; both are pyspark.ml and interchangeable here.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_clusters(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Assign a cluster id to every row (adds ``prediction``)."""
    feats = embeddings.withColumn("features", array_to_vector(F.col(vec_col)))
    model = KMeans(k=k, seed=seed, featuresCol="features").fit(feats)
    return model.transform(feats).drop("features")


def sample_donors(
    assigned: DataFrame,
    donors_per_cluster: int = 50,
    seed: int = 42,
    cluster_col: str = "prediction",
) -> DataFrame:
    """Per-cluster proportional donor sample (taar_similarity.py:146-175).

    Fractions are derived from one small groupBy().count() collect (the
    cluster histogram — k rows, not the data), then applied with
    ``sampleBy``; a deterministic per-cluster cap would use
    operators.capped_random_per_key instead.
    """
    sizes = {r[cluster_col]: r["count"] for r in
             assigned.groupBy(cluster_col).count().collect()}
    fractions = {
        c: min(1.0, donors_per_cluster / n) for c, n in sizes.items() if n > 0
    }
    return assigned.sampleBy(cluster_col, fractions, seed=seed)


def run_similarity_model(
    embeddings: DataFrame,
    k: int = 8,
    donors_per_cluster: int = 50,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """Returns (full assignment, donor sample)."""
    assigned = fit_clusters(embeddings, k=k, seed=seed)
    donors = sample_donors(assigned, donors_per_cluster, seed=seed)
    return assigned, donors


# ----------------------------------------------------------------------
# The similarity-scoring / LR-curve tail (taar_similarity.py:216-342)
# ----------------------------------------------------------------------

import math

from pyspark.sql import Column, SparkSession, Window


def pair_similarity(
    categorical: list[str],
    continuous: list[str],
    left: str = "a",
    right: str = "b",
) -> Column:
    """The donor similarity score as ONE JVM expression over an
    aliased pair join — the reference's row-at-a-time
    ``similarity_function`` (taar_similarity.py:220-252: scipy hamming
    over categorical × canberra over continuous, ``abs((j_c + 0.001) *
    j_d)``) with the same null semantics ('' / 0 defaults) and no
    Python in the hot path.

    scipy conventions preserved: hamming = fraction of differing
    categorical fields; canberra terms with a zero denominator
    contribute 0.
    """
    cat = [
        (
            F.coalesce(F.col(f"{left}.{c}"), F.lit(""))
            != F.coalesce(F.col(f"{right}.{c}"), F.lit(""))
        ).cast("double")
        for c in categorical
    ]
    hamming = sum(cat[1:], cat[0]) / F.lit(float(len(categorical)))
    terms = []
    for c in continuous:
        x = F.coalesce(F.col(f"{left}.{c}").cast("double"), F.lit(0.0))
        y = F.coalesce(F.col(f"{right}.{c}").cast("double"), F.lit(0.0))
        denom = F.abs(x) + F.abs(y)
        terms.append(
            F.when(denom == F.lit(0.0), F.lit(0.0)).otherwise(F.abs(x - y) / denom)
        )
    canberra = sum(terms[1:], terms[0])
    return F.abs((canberra + F.lit(0.001)) * hamming)


def donor_pair_scores(
    donors: DataFrame,
    cluster_col: str,
    id_col: str,
    categorical: list[str],
    continuous: list[str],
    cluster_ids: list,
) -> DataFrame:
    """Intra- and inter-cluster donor similarity scores
    (taar_similarity.py:255-310) with DETERMINISTIC index pairing in
    place of the reference's seeded randomSplit + zipWithIndex RDD
    dance — same score-population semantics, oracle-checkable:

    - intra: within each cluster, members ranked by ``id_col``; rank
      2i−1 pairs with rank 2i (the reference pairs two random halves).
    - inter: per cluster c, the i-th member of c pairs with the i-th
      non-member (the reference zips the same two frames).

    The global-order windows here are fine at scale for the same
    reason the reference's zipWithIndex was: they run on the DONOR
    SAMPLE (O(num_donors) rows by construction), never the corpus.
    Returns (label, id_a, id_b, score).
    """
    sim = pair_similarity(categorical, continuous)
    cols = [cluster_col, id_col, *categorical, *continuous]
    d = donors.select(*cols)

    w = Window.partitionBy(cluster_col).orderBy(id_col)
    rn = d.withColumn("__rn", F.row_number().over(w))
    odd = rn.where(F.col("__rn") % 2 == 1).withColumn(
        "__pair", ((F.col("__rn") + 1) / 2).cast("int")
    )
    even = rn.where(F.col("__rn") % 2 == 0).withColumn(
        "__pair", (F.col("__rn") / 2).cast("int")
    )
    intra = (
        odd.alias("a")
        .join(
            even.alias("b"),
            (F.col(f"a.{cluster_col}") == F.col(f"b.{cluster_col}"))
            & (F.col("a.__pair") == F.col("b.__pair")),
        )
        .select(
            F.lit("intra").alias("label"),
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            sim.alias("score"),
        )
    )

    parts = []
    for c in cluster_ids:
        cur = d.where(F.col(cluster_col) == c).withColumn(
            "__rn", F.row_number().over(Window.orderBy(id_col))
        )
        oth = d.where(F.col(cluster_col) != c).withColumn(
            "__rn", F.row_number().over(Window.orderBy(id_col))
        )
        parts.append(
            cur.alias("a")
            .join(oth.alias("b"), F.col("a.__rn") == F.col("b.__rn"))
            .select(
                F.lit("inter").alias("label"),
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                sim.alias("score"),
            )
        )
    inter = parts[0]
    for p in parts[1:]:
        inter = inter.unionByName(p)
    return intra.unionByName(inter)


def kde_density(
    scores: DataFrame,
    grid: DataFrame,
    bandwidth: float,
    score_col: str = "score",
    x_col: str = "x",
) -> DataFrame:
    """Gaussian kernel density estimate of ``scores`` at every grid
    point, as a DataFrame op — the distributed twin of
    ``pyspark.mllib.stat.KernelDensity`` (taar_similarity.py:316-334):
    density(x) = mean over samples s of N(x; s, h).

    Shape for scale: the GRID side is broadcast (num_pdf_points rows),
    the score side streams, and the per-x mean is one partial+final
    hash agg keyed by the grid point — never a driver collect of the
    scores.
    """
    h = float(bandwidth)
    norm = h * math.sqrt(2.0 * math.pi)
    kern = F.exp(
        -F.pow(F.col(x_col) - F.col(score_col), F.lit(2.0)) / F.lit(2.0 * h * h)
    ) / F.lit(norm)
    return (
        scores.crossJoin(F.broadcast(grid))
        .groupBy(x_col)
        .agg(F.avg(kern).alias("density"))
    )


def lr_curves(
    spark: SparkSession,
    pair_scores: DataFrame,
    kernel_bandwidth: float = 0.35,
    num_pdf_points: int = 50,
) -> DataFrame:
    """Likelihood-ratio curves (taar_similarity.py:262-342): a linear
    grid spanning observed scores, with the intra-cluster ("same",
    numerator) and inter-cluster ("different", denominator) KDEs
    evaluated at each point.

    One 2-value agg collect fixes the grid bounds (the reference's
    StatCounter aggregate); everything else stays distributed.
    Returns (x, num_density, den_density) — the reference's
    ``[(idx, (numerator, denominator)), ...]`` as a DataFrame.
    """
    scored = pair_scores.select("label", F.round("score", 6).alias("score"))
    lo, hi = scored.agg(F.min("score"), F.max("score")).first()
    if lo is None:
        # no pairs at all (every cluster sampled < 2 donors): an empty
        # curve, not a driver TypeError
        return spark.createDataFrame(
            [], "x double, num_density double, den_density double"
        )
    # all-equal scores would make step 0 and collapse the grid to one
    # duplicated point; a token width keeps 50 distinct x values
    step = (abs(hi - lo) or 1e-6) / num_pdf_points
    grid = spark.range(num_pdf_points).select(
        (F.lit(float(lo)) + F.col("id") * F.lit(step)).alias("x")
    )
    num = kde_density(scored.where(F.col("label") == "intra"), grid, kernel_bandwidth)
    den = kde_density(
        scored.where(F.col("label") == "inter"), grid, kernel_bandwidth
    ).withColumnRenamed("density", "den_density")
    # FULL outer on the grid point: when exactly one label class has
    # zero pairs (e.g. every cluster sampled one donor -> inter pairs
    # but no intra), its KDE is 0 rows and an inner join would return
    # an EMPTY curve instead of the other side's densities with 0s
    return (
        num.withColumnRenamed("density", "num_density")
        .join(den, "x", "full_outer")
        .select(
            F.round("x", 6).alias("x"),
            F.round(F.coalesce("num_density", F.lit(0.0)), 4).alias("num_density"),
            F.round(F.coalesce("den_density", F.lit(0.0)), 4).alias("den_density"),
        )
    )
