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


def hash_bernoulli_sample(
    df: DataFrame, key: Column | str, fraction: float, salt: str = "bs"
) -> DataFrame:
    """U4 with a DETERMINISM CONTRACT: keep a row iff
    ``md5(salt|key) mod 1e6 < fraction*1e6`` — a Bernoulli sample whose
    membership depends only on (key, salt, fraction), never on
    partitioning, task retries, or Spark version.

    ``df.sample(fraction, seed)`` draws per-partition from a seeded
    RNG, so the SAME seed yields DIFFERENT rows under a different
    partitioning (or engine) — unusable as a lineage-stable training
    split.  The md5 form is retry-stable, engine-portable (DuckDB
    computes the identical predicate, so it is oracle-gradeable), and
    collapses to a row-local filter: no shuffle, no state, pushes past
    column pruning.  Complementary fractions nest: the 1% sample is a
    subset of the 10% sample — the property A/B holdouts need.

    Rows with a NULL key are excluded (NULL has no stable identity to
    sample on); coalesce to a sentinel first if they must participate.
    """
    k = F.col(key) if isinstance(key, str) else key
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), k.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint") % 1_000_000
    # round, not int(): float error makes e.g. 0.3*1e6 = 299999.99...,
    # and truncation would break the documented exact-threshold contract
    return df.where(bucket < round(fraction * 1_000_000))


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


def neyman_stratified_sample(
    df: DataFrame,
    strata_col: str,
    value_col: str,
    id_col: str,
    total_n: int,
    salt: str = "neyman",
) -> DataFrame:
    """Optimal (Neyman) allocation stratified sampling: a total budget
    of ``total_n`` rows is split across strata PROPORTIONAL TO
    N_h * sigma_h (big/variable strata get more — the allocation that
    minimizes the estimator variance for a fixed budget; Neyman, JRSS
    1934), then each stratum takes its quota by md5-rank (exact count,
    deterministic, growth-stable — the doc_stratified_exact_sample
    machinery).

    Everything that decides ROWS is integer arithmetic, so the sample
    is bit-identical cross-engine:

    - per-stratum sums run in DECIMAL (value and value² exact), so
      sigma_h is a pure function of exact integers; it is rounded to
      6dp and scaled to a BIGINT weight ``w_h = N_h * round(sigma*1e6)``;
    - the allocation is largest-remainder on integers:
      ``base_h = total_n*w_h DIV W``, leftover seats go to the largest
      ``total_n*w_h MOD W`` (stratum id breaks ties);
    - the take is a per-stratum md5-rank window.

    One raw-stream exchange for the stats agg + one for the rank
    window; the |strata|-row allocation frame uses unpartitioned
    windows (strata-count-sized) and broadcasts back.

    A constant-valued stratum (sigma=0) gets weight 0 — allocate
    nothing, as Neyman prescribes.  Callers needing a floor can union
    a minimum take per stratum.  If a stratum's quota exceeds its row
    count the take is everything it has (the realized sample can then
    be smaller than ``total_n`` — Neyman allocation is unaware of
    stratum sizes by design; pick ``total_n`` ≪ N).
    """
    from pyspark.sql.functions import broadcast

    dec = F.col(value_col).cast("decimal(18,2)")
    stats = df.groupBy(F.col(strata_col).alias("__st")).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum(dec).alias("__s1"),
        F.sum(dec * dec).alias("__s2"),
    )
    nd = F.col("__n").cast("double")
    s1d, s2d = F.col("__s1").cast("double"), F.col("__s2").cast("double")
    sigma = F.when(
        F.col("__n") > 1,
        F.sqrt((s2d - s1d * s1d / nd) / (nd - 1.0)),
    ).otherwise(F.lit(0.0))
    weighted = stats.select(
        "__st",
        (F.col("__n")
         * F.round(sigma * 1000000.0, 0).cast("bigint")).alias("__w"),
    )
    from pyspark.sql import Window

    wall = Window.partitionBy()  # strata-count-sized frame
    # NB: name the total distinctly — "__W" would REPLACE "__w" under
    # Spark's default case-insensitive column resolution
    a = weighted.withColumn("__tw", F.sum("__w").over(wall))
    b = a.select(
        "__st",
        F.expr(f"{total_n} * __w DIV __tw").alias("__base"),
        F.expr(f"{total_n} * __w % __tw").alias("__rem"),
    )
    c = b.withColumn("__sbase", F.sum("__base").over(wall)).withColumn(
        "__rr",
        F.row_number().over(
            Window.partitionBy().orderBy(F.desc("__rem"), "__st")
        ),
    )
    alloc = c.select(
        "__st",
        (
            F.col("__base")
            + F.when(
                F.col("__rr") <= F.lit(total_n) - F.col("__sbase"), 1
            ).otherwise(0)
        ).alias("__nh"),
    )
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("bigint")
    wrank = Window.partitionBy(strata_col).orderBy(key, F.col(id_col))
    ranked = df.withColumn("__rn", F.row_number().over(wrank))
    return (
        ranked.join(
            broadcast(alloc),
            ranked[strata_col] == alloc["__st"],
        )
        .where(F.col("__rn") <= F.col("__nh"))
        .drop("__rn", "__st", "__nh")
    )
