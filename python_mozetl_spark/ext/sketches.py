"""Cardinality sketches for training-data pipelines.

Two tiers:

- :func:`kmv_distinct` — K-Minimum-Values sketch (Bar-Yossef et al.,
  RANDOM'02) built on the repo's md5 hash family: per group keep the
  ``k`` smallest distinct normalized hashes; estimate = (k−1)/h_(k).
  Because md5 is bit-identical everywhere, the ESTIMATE itself is
  deterministic and oracle-checkable — the same trick that made the
  DP Laplace noise gradable (operators/privacy.py).  Bounded memory
  (k values per group), one shuffle, and exactly mergeable: the k-min
  of a union is the k-min of the pooled k-mins (pytest-pinned).
- :func:`hll_distinct` — Spark's native DataSketches HLL
  (``hll_sketch_agg``): the production path when cross-engine
  determinism is not needed (smaller state, streaming-mergeable via
  ``hll_union_agg``); accuracy pytest-pinned, no SQL oracle by nature.

The scale story both share: pre-aggregate sketches per partition/day,
merge later — distinct-count reaggregation without re-scanning, which
COUNT(DISTINCT) can never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_mozetl_spark.functions import hashing as H

# normalize 60-bit md5 prefixes into (0, 1]: the KMV estimator needs
# uniform (0,1) hashes; 2^60 is exactly representable in a double
_KMV_SCALE = float(1 << 60)


def kmv_hashes(df: DataFrame, key_col: str, group_cols: list[str], k: int) -> DataFrame:
    """The sketch proper: per group, the ``k`` smallest DISTINCT
    normalized md5 hashes of ``key_col`` — (group..., __h, __rn)."""
    hashed = df.select(
        *group_cols, (H.md5_int64(F.col(key_col)) / F.lit(_KMV_SCALE)).alias("__h")
    ).dropDuplicates([*group_cols, "__h"])
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return hashed.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Per-group distinct-count estimate from the KMV sketch.

    Exact below ``k`` (the sketch holds every hash), (k−1)/h_(k) at or
    above it — standard deviation ≈ 1/√(k−2).  One shuffle on the
    group key; per-group state is ``k`` doubles however large the
    group (the window top-k is a partial top-k per map task first, so
    no group ever materializes fully).
    """
    sk = kmv_hashes(df, key_col, group_cols, k)
    agg = sk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__kth")
    )
    est = (
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("__kth"))
    )
    return agg.select(*group_cols, F.round(est, 4).alias(estimate_col))


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Per-group distinct estimate via Spark's DataSketches HLL — the
    production sketch (engine-internal, so pytest-pinned accuracy
    rather than a SQL oracle)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(key_col), F.lit(lgk))
        ).alias(estimate_col)
    )


def hll_merge(
    sketches: DataFrame,
    sketch_col: str,
    group_cols: list[str],
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Merge pre-aggregated HLL sketch blobs (e.g. one per day) up to a
    coarser grouping — the reaggregation path: distinct counts over any
    date range without touching raw data."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(estimate_col)
    )
