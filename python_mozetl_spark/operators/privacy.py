"""Privacy operators (SURVEY.md §2.6 A15 + §2.7 W4).

The reference adds differential-privacy Laplace noise to a dense
locale×addon count grid in driver-side pandas+numpy
(mozetl/taar/taar_locale.py:176-237), justified there by the tiny
domain.  This version keeps the grid expansion distributed
(crossJoin of key domains + left join + zero-fill) and generates the
noise EXECUTOR-SIDE from a keyed hash — deterministic given (key,
seed), so results are reproducible run-to-run and testable, with no
driver collect and no RNG-state coordination across executors:

    u       = md5-based uniform in (-1/2, 1/2) keyed by (keys, seed)
    noise   = -(sensitivity/epsilon) * sign(u) * ln(1 - 2|u|)

which is the standard inverse-CDF Laplace sample.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.functions.hashing import md5_int64

_TWO_60 = float(2**60)


def keyed_uniform(cols: Sequence[Column], seed: int) -> Column:
    """Deterministic uniform in (0, 1) keyed by column values + seed."""
    key = F.concat_ws("\x1f", F.lit(str(seed)), *[c.cast("string") for c in cols])
    # (h + 0.5) / 2^60 keeps the value strictly inside (0, 1)
    return (md5_int64(key).cast("double") + F.lit(0.5)) / F.lit(_TWO_60)


def laplace_noise(cols: Sequence[Column], epsilon: float,
                  sensitivity: float = 1.0, seed: int = 42) -> Column:
    """Keyed Laplace(b = sensitivity/epsilon) noise column."""
    u = keyed_uniform(cols, seed) - F.lit(0.5)  # (-1/2, 1/2)
    b = F.lit(sensitivity / epsilon)
    return -b * F.signum(u) * F.log1p(-2 * F.abs(u))


def dp_noisy_counts(
    df: DataFrame,
    keys: Sequence[str],
    epsilon: float,
    seed: int = 42,
    domains: Sequence[DataFrame] | None = None,
    count_col: str = "n",
) -> DataFrame:
    """DP count release over the full key grid.

    ``domains`` (one single-column DataFrame per key) define the dense
    grid; absent combinations get count 0 — noise must cover them or
    absence itself leaks.  Defaults to the observed per-key distincts.
    One crossJoin of (small) domains + one left join + noise expr; the
    fact table shuffles once on ``keys``.
    """
    keys = list(keys)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias(count_col))
    if domains is None:
        domains = [df.select(k).distinct() for k in keys]
    grid = reduce(lambda a, b: a.crossJoin(b), domains)
    dense = grid.join(counts, keys, "left").fillna({count_col: 0})
    noisy = F.col(count_col) + laplace_noise(
        [F.col(k) for k in keys], epsilon=epsilon, seed=seed
    )
    return dense.withColumn(f"{count_col}_noisy", noisy)
