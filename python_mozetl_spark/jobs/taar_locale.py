"""TAAR per-locale addon recommendations with privacy protections.

Re-expresses mozetl/taar/taar_locale.py:103-317 as a distributed
pipeline:

1. per-client addon rows restricted to a whitelist and per-locale
   client caps (seeded random subset — the RAND()-ordered row_number
   pattern, :139-173 → ``capped_random_per_key``);
2. per-(locale, addon) frequency counts (:279-281);
3. DP Laplace noise over the dense locale×whitelist grid
   (:176-237) — the reference does this driver-side in pandas; here
   the grid expansion and keyed noise stay in Spark
   (``operators/privacy.dp_noisy_counts``) so the same job runs when
   locale×addon is NOT small;
4. shift-to-zero + top-N share normalization (:292-317).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from python_mozetl_spark.operators.privacy import laplace_noise


def limit_client_addons(
    spark: SparkSession,
    client_addons: DataFrame,
    addon_limits: Mapping[str, int],
    whitelist: Sequence[str],
    seed: int = 42,
) -> DataFrame:
    """Keep ≤ limit whitelisted addons per client, limit varying by
    locale.  Inner join against the (broadcast) limits dim drops
    locales outside the dict — same semantics as the reference's
    spark.sql window (:139-173), but seeded and per-locale capped via
    a single window pass."""
    limits = spark.createDataFrame(
        [(k, int(v)) for k, v in addon_limits.items()],
        "locale string, client_max_addons int",
    )
    df = (
        client_addons.join(F.broadcast(limits), "locale")
        .where(F.col("addon").isin(list(whitelist)))
    )
    # capped_random_per_key with a per-row cap: seeded shuffle within
    # client, keep rows under the locale's limit.
    w = Window.partitionBy("client_id").orderBy(F.rand(seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= F.col("client_max_addons"))
        .select("client_id", "locale", "addon")
    )


def locale_addon_counts(client_addons: DataFrame) -> DataFrame:
    """Raw per-(locale, addon) client frequency counts."""
    return client_addons.groupBy("locale", "addon").agg(
        F.count(F.lit(1)).alias("count")
    )


def noisy_locale_counts(
    spark: SparkSession,
    counts: DataFrame,
    addon_limits: Mapping[str, int],
    whitelist: Sequence[str],
    epsilon: float = 0.4,
    seed: int = 42,
) -> DataFrame:
    """DP release: dense locale×whitelist grid, Laplace noise with
    per-locale sensitivity = that locale's addon cap."""
    locales = spark.createDataFrame(
        [(k, int(v)) for k, v in addon_limits.items()],
        "locale string, client_max_addons int",
    )
    addons = spark.createDataFrame([(a,) for a in whitelist], "addon string")
    grid = F.broadcast(locales).crossJoin(F.broadcast(addons))
    dense = grid.join(counts, ["locale", "addon"], "left").fillna({"count": 0})
    noise = laplace_noise(
        [F.col("locale"), F.col("addon")],
        epsilon=1.0,  # scale applied below: b = cap / eps per locale
        seed=seed,
    ) * (F.col("client_max_addons").cast("double") / F.lit(epsilon))
    return dense.select(
        "locale", "addon", (F.col("count") + noise).alias("count")
    )


def top_addons_by_locale(noisy: DataFrame, num_addons: int = 10) -> DataFrame:
    """Shift-to-zero, take top-N per locale, normalize to relative
    shares (taar_locale.py:292-317) — windows instead of driver pandas,
    so the artifact step scales with locale count."""
    w = Window.partitionBy("locale")
    shifted = noisy.withColumn(
        "pos", F.col("count") - F.least(F.min("count").over(w), F.lit(0.0))
    )
    ranked = shifted.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("locale").orderBy(F.col("pos").desc(), F.col("addon"))
        ),
    ).where(F.col("rn") <= num_addons)
    total = Window.partitionBy("locale")
    return ranked.select(
        "locale",
        "addon",
        (F.col("pos") / F.sum("pos").over(total)).alias("share"),
    )


def run_taar_locale(
    spark: SparkSession,
    client_addons: DataFrame,
    addon_limits: Mapping[str, int],
    whitelist: Sequence[str],
    epsilon: float = 0.4,
    num_addons: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Full pipeline → (locale, addon, share) recommendation weights."""
    limited = limit_client_addons(spark, client_addons, addon_limits, whitelist, seed)
    counts = locale_addon_counts(limited)
    noisy = noisy_locale_counts(spark, counts, addon_limits, whitelist, epsilon, seed)
    return top_addons_by_locale(noisy, num_addons)
