"""Sampling operators (SURVEY.md §2.9 U4-U7, §2.7 W4).

Three kinds the reference uses:
- deterministic hash/mod sampling (pushed into the BigQuery SQL at
  mozetl/bhr_collection/bhr_collection.py:529-545) → :func:`mod_sample`
  — reproducible, partition-prunable, oracle-checkable;
- stratified sampling (mozetl/taar/taar_similarity.py:146-175) →
  :func:`stratified_sample` (``sampleBy``);
- per-key random cap, a privacy reservoir
  (mozetl/taar/taar_locale.py:139-173) → :func:`capped_random_per_key`.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def mod_sample(
    df: DataFrame, key: Column | str, buckets: int = 100, take: int = 1
) -> DataFrame:
    """U7: keep rows where ``pmod(key, buckets) < take``.

    For string keys pass ``F.xxhash64(col)`` (or ``F.crc32``) as
    ``key``; for integer surrogate keys the raw column suffices and the
    predicate pushes down to the scan.
    """
    k = F.col(key) if isinstance(key, str) else key
    return df.where(F.pmod(k, F.lit(buckets)) < F.lit(take))


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: Mapping[str, float], seed: int = 42
) -> DataFrame:
    """U5: per-stratum Bernoulli sampling (``sampleBy``)."""
    return df.sampleBy(strata_col, dict(fractions), seed=seed)


def capped_random_per_key(
    df: DataFrame, keys: Sequence[str], cap: int, seed: int = 42
) -> DataFrame:
    """W4: keep at most ``cap`` rows per key, chosen by seeded shuffle —
    the reference's RAND()-ordered row_number privacy cap."""
    w = Window.partitionBy(*keys).orderBy(F.rand(seed))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )


def salt_keys(df: DataFrame, salt_buckets: int = 16,
              salt_col: str = "__salt") -> DataFrame:
    """Skew mitigation: add a salt from a WHOLE-ROW hash so one hot key
    spreads over ``salt_buckets`` reducers.  Aggregate on (key, salt)
    first, then re-aggregate on key — two shuffles, but the first is
    balanced.  AQE's skew handling covers joins; this is for skewed
    AGGREGATIONS, which AQE does not rebalance.
    """
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)),
    )


def two_phase_agg(df: DataFrame, key: str, value: Column, alias: str,
                  salt_buckets: int = 16) -> DataFrame:
    """Salted two-phase sum for skewed keys: partial sum on
    (key, salt) then final sum on key."""
    salted = salt_keys(df, salt_buckets)
    partial = salted.groupBy(key, "__salt").agg(value.alias("__p"))
    return partial.groupBy(key).agg(F.sum("__p").alias(alias))


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (Efraimidis-
    Spirakis, "Weighted random sampling with a reservoir", IPL 2006):
    each row draws ``key = -ln(u) / weight`` with ``u`` derived from
    ``md5(salt‖id)``, and the ``k`` smallest keys win — selection
    probability proportional to weight, yet a pure function of
    (salt, id, weight): reproducible across engines, retries, and
    partitionings, so the sample is oracle-checkable (``rand()`` is
    none of these).

    Rows with non-positive weight are excluded.  Returns the input
    columns plus ``__wkey``.

    ``__wkey`` is ROUNDED to 6 decimals before the top-k compare (with
    ``id_col`` as the tiebreaker): the raw key goes through ``ln``,
    whose last ulp differs between JVM ``log`` and other libms, so a
    near-tie at the k-th boundary could otherwise flip membership
    between engines/platforms.  Rounding makes selection a pure
    function of (salt, id, weight) at the comparison precision.

    Scale shape: one codegen'd expression + a global top-k —
    ``ORDER BY LIMIT k`` compiles to TakeOrdered (per-partition heaps,
    no full sort, no single-partition exchange).
    """
    from python_mozetl_spark.functions import hashing as H

    mod = 1_000_000
    u = (
        H.md5_int64(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
        % mod
        + F.lit(0.5)
    ) / mod
    key = -F.log(u) / F.col(weight_col).cast("double")
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("__wkey", F.round(key, 6))
        .orderBy("__wkey", id_col)
        .limit(k)
    )
