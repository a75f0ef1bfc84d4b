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
