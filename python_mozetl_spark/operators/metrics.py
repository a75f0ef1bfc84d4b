"""Sliced evaluation metrics with uncertainty — the "is this segment
actually worse?" layer of an experimentation/eval pipeline.

:func:`proportion_ci` computes per-group success proportions with the
Wilson score interval (Wilson, JASA 1927) — the interval of choice for
small/skewed slices where the normal approximation breaks (never
leaves [0, 1], sane at p→0/1).

One hash agg per call (exact integer n/successes with map-side
partials); the interval arithmetic is a fixed closed-form double
expression over those integers, so results are deterministic
cross-engine at output rounding.  The distributed-AUC twin for ranking
metrics is plans/queries.py:doc_length_auc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def proportion_ci(
    df: DataFrame,
    group_cols: list[str],
    success_col: str,
    z: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ``(n, successes, p, ci_lo, ci_hi)`` with the Wilson
    score interval at critical value ``z`` (1.96 ≈ 95%).

    ``success_col`` must be a 0/1-valued (or boolean) column.
    """
    z2 = z * z
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(success_col).cast("bigint")).cast("bigint").alias("successes"),
    )
    n = F.col("n").cast("double")
    p = F.col("successes").cast("double") / n
    denom = 1.0 + F.lit(z2) / n
    center = p + F.lit(z2) / (2.0 * n)
    margin = F.lit(z) * F.sqrt(
        p * (1.0 - p) / n + F.lit(z2) / (4.0 * n * n)
    )
    return agg.select(
        *group_cols,
        "n",
        "successes",
        F.round(p, round_to).alias("p"),
        F.round((center - margin) / denom, round_to).alias("ci_lo"),
        F.round((center + margin) / denom, round_to).alias("ci_hi"),
    )
