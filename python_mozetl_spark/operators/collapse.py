"""Group-collapse and share-normalization operators
(SURVEY.md §2.6 A13/A14).

Reference: the hardware report's two-pass "threshold collapse to
'Other'" (mozetl/hardware_report/summarize_json.py:351-417) and
ratio-normalization (:420-469) — privacy/presentation operators done
there in driver-side python loops.  Here they are pure DataFrame ops:
one aggregation plus one unbounded window (or a re-aggregation), fully
distributed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def collapse_small_groups(
    df: DataFrame,
    group_col: str,
    count_col: Column | None = None,
    threshold: int | float = 100,
    other_label: str = "Other",
    keys: Sequence[str] = (),
) -> DataFrame:
    """A13: relabel groups whose weight < ``threshold`` as ``other_label``
    and re-aggregate.  ``df`` is expected pre-aggregated (one row per
    group); ``count_col`` defaults to ``col("n")``.

    Two hash aggregations, no window: compute per-group weight upstream,
    relabel, re-sum — the collapse itself shuffles only the (small)
    aggregated frame.
    """
    weight = count_col if count_col is not None else F.col("n")
    relabeled = df.withColumn(
        group_col,
        F.when(weight < F.lit(threshold), F.lit(other_label)).otherwise(
            F.col(group_col)
        ),
    )
    value_cols = [
        c for c in relabeled.columns if c != group_col and c not in keys
    ]
    return relabeled.groupBy(*keys, group_col).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )


def normalize_shares(
    df: DataFrame,
    value_col: str,
    alias: str = "share",
    keys: Sequence[str] = (),
    precision: int | None = 6,
) -> DataFrame:
    """A14: value / total-within-``keys`` (empty keys ⇒ global total).

    Uses an unbounded window; on a pre-aggregated frame this is cheap.
    ``precision`` rounds for cross-engine reproducibility.
    """
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    share = F.col(value_col) / F.sum(value_col).over(w)
    if precision is not None:
        share = F.round(share, precision)
    return df.withColumn(alias, share)


def top_n_groups(
    df: DataFrame,
    group_col: str,
    count_col: Column | None = None,
    top_n: int = 10,
    other_label: str = "Other",
    keys: Sequence[str] = (),
) -> DataFrame:
    """A13 variant: keep the ``top_n`` heaviest groups (per ``keys``
    partition), fold the tail into ``other_label`` and re-aggregate —
    the graphics dashboard's top-N + Other pattern
    (mozetl/graphics/graphics_telemetry_dashboard.py:278-292).

    Rank ties break on the group label so the result is deterministic.
    """
    weight = count_col if count_col is not None else F.col("n")
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))
    ranked = df.withColumn(
        "__rk",
        F.row_number().over(w.orderBy(weight.desc(), F.col(group_col))),
    )
    relabeled = ranked.withColumn(
        group_col,
        F.when(F.col("__rk") <= top_n, F.col(group_col)).otherwise(
            F.lit(other_label)
        ),
    ).drop("__rk")
    value_cols = [
        c for c in relabeled.columns if c != group_col and c not in keys
    ]
    return relabeled.groupBy(*keys, group_col).agg(
        *[F.sum(c).alias(c) for c in value_cols]
    )
