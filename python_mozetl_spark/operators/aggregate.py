"""Aggregation operators (SURVEY.md §2.6 A1-A6).

Centerpiece: :class:`AggSpec`, the table-driven wide aggregation that
re-expresses the reference's 90-aggregator ``fields.py`` table
(mozetl/clientsdaily/fields.py:35-213) as *data* — a list of
(expression, function, alias) rows — instead of code.  One
``groupBy().agg(*exprs)`` gets map-side partial aggregation from
Catalyst no matter how many aggregates are attached.

Determinism upgrade: the reference's ``first(ignorenulls=True)``
depends on scan order (SURVEY.md §7.3).  Here "first"/"last" are
:func:`first_by` / :func:`last_by` — ``min_by``/``max_by`` under an
explicit total order — so wide rollups are reproducible run-to-run.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, GroupedData
from pyspark.sql import functions as F


def conditional_sum(cond: Column, value: Column | int, alias: str) -> Column:
    """A2: ``sum(case when cond then value else 0 end)``."""
    v = F.lit(value) if isinstance(value, int) else value
    return F.sum(F.when(cond, v).otherwise(F.lit(0))).alias(alias)


def conditional_count(cond: Column, alias: str) -> Column:
    """A2: ``count(case when cond then 1 end)`` — nulls not counted."""
    return F.count(F.when(cond, F.lit(1))).alias(alias)


def first_by(value: Column | str, order: Column, alias: str) -> Column:
    """Deterministic 'first': value at the MINIMUM of ``order``.

    ``order`` may be a struct column for composite orders:
    ``first_by(col("x"), F.struct("date", "tiebreak"), "x_first")``.
    """
    v = F.col(value) if isinstance(value, str) else value
    return F.min_by(v, order).alias(alias)


def last_by(value: Column | str, order: Column, alias: str) -> Column:
    """Deterministic 'last': value at the MAXIMUM of ``order``."""
    v = F.col(value) if isinstance(value, str) else value
    return F.max_by(v, order).alias(alias)


_FNS = {
    "sum": F.sum,
    "mean": F.mean,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "count_distinct": F.count_distinct,
    "collect_set": F.collect_set,
    "stddev": F.stddev_samp,
}


@dataclass
class AggSpec:
    """A declarative wide-aggregation table (A1).

    Each row: ``(expr, fn, alias)`` where ``expr`` is a Column or
    column name, ``fn`` one of the registered aggregate function names,
    and ``alias`` the output column.  ``select_exprs`` lets a spec
    carry pre-aggregation derived columns (the reference's
    unit-conversion aggregates, A3).
    """

    keys: Sequence[str]
    aggs: list[tuple[Column | str, str, str]] = field(default_factory=list)
    extra: list[Column] = field(default_factory=list)

    def add(self, expr: Column | str, fn: str, alias: str) -> "AggSpec":
        if fn not in _FNS:
            raise ValueError(f"unknown agg fn {fn!r}; known: {sorted(_FNS)}")
        self.aggs.append((expr, fn, alias))
        return self

    def add_expr(self, col: Column) -> "AggSpec":
        """Attach a pre-built aggregate Column (conditional_sum, first_by...)."""
        self.extra.append(col)
        return self

    def columns(self) -> list[Column]:
        out: list[Column] = []
        for expr, fn, alias in self.aggs:
            c = F.col(expr) if isinstance(expr, str) else expr
            out.append(_FNS[fn](c).alias(alias))
        out.extend(self.extra)
        return out

    def apply(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.keys).agg(*self.columns())


def wide_agg(df: DataFrame, spec: AggSpec) -> DataFrame:
    """Run an :class:`AggSpec` (single shuffle on ``spec.keys``)."""
    return spec.apply(df)


def grouped(df: DataFrame, keys: Sequence[str]) -> GroupedData:
    return df.groupBy(*keys)
