"""Pivot operator (SURVEY.md §2.6 A7).

Reference: mozetl/search/aggregates.py:153-177 — pivot on a derived
``type`` column with a FIXED value list, then alias cleanup.

Scale note: always pass ``values`` explicitly.  Without it Spark runs
an extra distinct-collect job over the full input to discover the
pivot domain — at 100 TB that is a full scan you didn't ask for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pivot_agg(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    agg: Column,
    alias_fmt: str = "{value}",
) -> DataFrame:
    """Pivot with explicit domain and sanitized output column names.

    ``alias_fmt`` formats each output column (e.g. ``"{value}_sum"``);
    hyphens become underscores as in the reference's alias cleanup.
    """
    out = df.groupBy(*keys).pivot(pivot_col, list(values)).agg(agg)
    renames = {
        v: alias_fmt.format(value=v).replace("-", "_").replace(":", "_")
        for v in values
    }
    for old, new in renames.items():
        if old != new:
            out = out.withColumnRenamed(old, new)
    return out


def manual_pivot(
    df: DataFrame,
    keys: Sequence[str],
    pivot_col: str,
    values: Sequence[str],
    value_expr: Column,
    alias_fmt: str = "{value}",
) -> DataFrame:
    """Pivot as explicit conditional aggregates (one hash-agg, no pivot
    plan node).  Identical result, trivially oracle-translatable, and
    the form to prefer when composing with other aggregates."""
    aggs = [
        F.sum(F.when(F.col(pivot_col) == v, value_expr)).alias(
            alias_fmt.format(value=v).replace("-", "_").replace(":", "_")
        )
        for v in values
    ]
    return df.groupBy(*keys).agg(*aggs)


def unpivot_metrics(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    name_col: str = "metric",
    value_col: str = "value",
) -> DataFrame:
    """Wide -> long (the inverse of :func:`pivot_agg`): melt
    ``value_cols`` into (``name_col``, ``value_col``) rows, keeping
    ``id_cols``.  Values are cast to double so heterogeneous metric
    types stack into one column (Spark's ``unpivot`` requires a
    common type).

    Backed by ``DataFrame.unpivot`` — a zero-shuffle, narrow
    row-expansion (|value_cols| output rows per input row) that
    whole-stage codegen handles like any generator; the shape that
    feeds metric-catalog sinks and per-metric alerting without one
    query per column.
    """
    casted = df.select(
        *id_cols, *[F.col(c).cast("double").alias(c) for c in value_cols]
    )
    return casted.unpivot(id_cols, value_cols, name_col, value_col)
