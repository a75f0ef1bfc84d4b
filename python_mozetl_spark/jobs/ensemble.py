"""Ensemble-weight training (TAAR ensemble).

Re-expresses mozetl/taar/taar_ensemble.py:417-493: k-fold split via
uniform-random ranges (U6), stacked per-fold training, a weighted
elastic-net LogisticRegression fit, and the coefficient dict artifact.

Two deliberate departures (SURVEY §7.3):
- the reference reloads the production `taar` recommender package
  inside executors via env vars (:156-231); here recommender scores
  are *columns* supplied by a pluggable mapping, so training is
  testable with no external service;
- the RDD union of per-fold lists (:478-481) becomes a fold tag + an
  arrangement explode (one scan, one seeded rand() per row) instead of
  unioning k-1 fold DataFrames per arrangement — the union form would
  re-evaluate the nondeterministic rand() subtree once per branch.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_fold_split(df: DataFrame, k_folds: int = 4, seed: int = 42) -> list[DataFrame]:
    """Seeded uniform k-fold partition (taar_ensemble.py:417-432)."""
    h = 1.0 / k_folds
    with_rand = df.withColumn("__rand", F.rand(seed))
    return [
        with_rand.where(
            (F.col("__rand") >= i * h) & (F.col("__rand") < (i + 1) * h)
        ).drop("__rand")
        for i in range(k_folds)
    ]


def score_features(df: DataFrame, scorers: Mapping[str, Column]) -> DataFrame:
    """Attach each recommender's score as a column — the pluggable
    replacement for executor-side recommender calls."""
    out = df
    for name, col in scorers.items():
        out = out.withColumn(name, col.cast("double"))
    return out


def fit_ensemble_weights(
    training: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label",
    weight_col: str | None = None,
    reg_param: float = 0.01,
    elastic_net_param: float = 0.5,
    k_folds: int = 4,
    seed: int = 42,
) -> dict[str, float]:
    """k-fold restack + LR fit → {feature: ensemble weight}.

    The stack mirrors the reference's per-fold training sets
    (taar_ensemble.py:478-481): arrangement *i* trains on every fold
    EXCEPT fold *i*, and the k arrangements union together — so each
    row appears exactly ``k_folds - 1`` times.  (A union of the folds
    themselves would be an identity transform: the original frame
    back, with ``k_folds`` silently inert.)  Implemented as ONE seeded
    fold tag + an arrangement explode — a single scan and one rand()
    evaluation per row, where re-unioning fold DataFrames would
    re-evaluate the nondeterministic rand() subtree per branch.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    if k_folds < 2:
        stacked = training
    else:
        fold = F.least(
            F.floor(F.rand(seed) * k_folds), F.lit(k_folds - 1)
        ).cast("int")
        arrangements = F.sequence(F.lit(0), F.lit(k_folds - 1))
        stacked = (
            training.withColumn("__fold", fold)
            .select("*", F.explode(arrangements).alias("__arr"))
            .where(F.col("__fold") != F.col("__arr"))
            .drop("__fold", "__arr")
        )
    assembled = VectorAssembler(
        inputCols=list(feature_cols), outputCol="features"
    ).transform(stacked)
    lr = LogisticRegression(
        maxIter=50,
        regParam=reg_param,
        elasticNetParam=elastic_net_param,
        featuresCol="features",
        labelCol=label_col,
    )
    if weight_col:
        lr = lr.setWeightCol(weight_col)
    model = lr.fit(assembled)
    return {
        name: float(coef)
        for name, coef in zip(feature_cols, model.coefficients)
    }


def run_ensemble(
    training: DataFrame,
    scorers: Mapping[str, Column],
    label_col: str = "label",
    **fit_kwargs,
) -> dict[str, float]:
    """Full pipeline: score columns → k-fold stack → LR → weights
    artifact (write with sinks.writers.write_json_artifact)."""
    scored = score_features(training, scorers)
    return fit_ensemble_weights(
        scored, feature_cols=list(scorers), label_col=label_col, **fit_kwargs
    )
