"""Window operators (SURVEY.md §2.7 W1-W4, §2.8).

These are the reference's most-repeated hand-rolled patterns — four
separate implementations of "latest row per key" alone
(mozetl/taar/taar_locale.py:61-77, taar_similarity.py:80-83,
taar_ensemble.py:68-75, taar_dynamo.py:338-346) — expressed once,
deterministically.

Scale notes: every function here is a single window shuffle on the
partition keys.  ``row_number`` windows carry no frame state, so they
stream within a partition; skewed keys are handled by AQE only for
joins, so for a known-skewed key prefer pre-aggregation or salting
upstream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_RN = "__rn"


def _order_cols(order_by: Sequence[Column | str], descending: bool) -> list[Column]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    return [c.desc() for c in cols] if descending else cols


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    descending: bool = True,
) -> DataFrame:
    """W1: keep exactly one row per key — the first under ``order_by``.

    ``order_by`` must be a *total* order within each key (include a
    unique tiebreaker column) or the result is nondeterministic — the
    exact trap the reference fell into with ``first()`` aggregates
    (SURVEY.md §7.3).
    """
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending))
    return (
        df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) == 1).drop(_RN)
    )


def top_n_per_group(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    n: int,
    descending: bool = True,
    rank_col: str | None = None,
) -> DataFrame:
    """W2: top-N rows per group (reference: landfill/sampler.py:134-143)."""
    w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending))
    out = df.withColumn(_RN, F.row_number().over(w)).where(F.col(_RN) <= n)
    if rank_col:
        return out.withColumnRenamed(_RN, rank_col)
    return out.drop(_RN)


def with_group_count(
    df: DataFrame, keys: Sequence[str], alias: str = "group_count"
) -> DataFrame:
    """W3: unbounded count over partition
    (reference: taar/taar_locale.py:145-150)."""
    w = Window.partitionBy(*keys)
    return df.withColumn(alias, F.count(F.lit(1)).over(w))


def running_agg(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
    agg_col: Column,
    alias: str,
    frame: tuple[int, int] = (Window.unboundedPreceding, Window.currentRow),
) -> DataFrame:
    """Running aggregate over an explicit ROWS frame (not in the
    reference — free Spark capability the rebuild exposes)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(*_order_cols(order_by, descending=False))
        .rowsBetween(*frame)
    )
    return df.withColumn(alias, agg_col.over(w))


def keyed_window(
    keys: Sequence[str], order_by: Sequence[Column | str], descending: bool = False
) -> WindowSpec:
    """Escape hatch: a partitioned+ordered WindowSpec for custom use."""
    return Window.partitionBy(*keys).orderBy(*_order_cols(order_by, descending))


def robust_outlier_stats(
    df,
    value_col: str,
    keys: list[str],
    z: float = 3.5,
):
    """Per-group robust outlier statistics: median, MAD (median absolute
    deviation), and the modified z-score acceptance band
    ``median ± z·MAD/0.6745`` (Iglewicz-Hoaglin).  Median/MAD shrug off
    the heavy tails that wreck mean/stddev filters — the standard
    numeric-quality gate before training-data aggregation.

    Two exact-percentile aggregations (each one shuffle on the group
    key) plus a counting pass; at 100 TB swap ``percentile`` for
    ``percentile_approx`` per group if exactness is not required.
    Returns (keys..., med, mad, lo, hi, n, n_outliers).
    """
    from pyspark.sql import functions as F

    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = df.join(med, keys)
    mad = with_med.groupBy(*keys).agg(
        F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad")
    )
    width = F.lit(z / 0.6745) * F.col("mad")
    return (
        with_med.join(mad, keys)
        .withColumn("lo", F.col("med") - width)
        .withColumn("hi", F.col("med") + width)
        .groupBy(*keys, "med", "mad", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi")),
                    1,
                ).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
        )
    )
