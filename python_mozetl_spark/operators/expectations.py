"""Data-quality expectation checks (the Deequ / dbt-test shape).

A 100 TB pipeline gates every load on declarative constraints — null
fraction, key uniqueness, accepted domains, value ranges, referential
integrity — and the naive implementation runs one job per rule.  Here
the suite compiles to the MINIMUM number of jobs the rule mix allows:

- all row-local rules (not-null / accepted-values / in-range) become
  conditional aggregates in ONE partial+final hash agg over ONE scan,
  however many rules there are;
- key-uniqueness rides the same agg as ``count - count(distinct
  struct(keys))`` (one expand, same exchange);
- referential integrity is a broadcast LEFT ANTI count against the
  dimension side — the only rule that needs a join, and the dim is the
  small side by construction.

The report is one row per rule: (rule, metric, passed) where metric is
the violating fraction (duplicate fraction for uniqueness) rounded to
6dp and ``passed`` applies the rule's tolerance (default: zero
violations).  Deterministic, so the whole report is oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class NotNull:
    column: str
    tolerance: float = 0.0

    @property
    def name(self) -> str:
        return f"not_null({self.column})"

    def violation(self) -> Column:
        return F.col(self.column).isNull()


@dataclass(frozen=True)
class AcceptedValues:
    column: str
    values: tuple
    tolerance: float = 0.0

    @property
    def name(self) -> str:
        return f"accepted_values({self.column})"

    def violation(self) -> Column:
        return ~F.col(self.column).isin(*self.values) | F.col(self.column).isNull()


@dataclass(frozen=True)
class InRange:
    column: str
    lo: float
    hi: float
    tolerance: float = 0.0

    @property
    def name(self) -> str:
        return f"in_range({self.column})"

    def violation(self) -> Column:
        c = F.col(self.column)
        return c.isNull() | (c < self.lo) | (c > self.hi)


@dataclass(frozen=True)
class Unique:
    columns: tuple
    tolerance: float = 0.0

    @property
    def name(self) -> str:
        return f"unique({','.join(self.columns)})"


@dataclass(frozen=True)
class RefIntegrity:
    column: str
    dim: DataFrame = field(compare=False)
    dim_column: str = ""
    tolerance: float = 0.0

    @property
    def name(self) -> str:
        return f"ref_integrity({self.column}->{self.dim_column})"


def run_expectations(df: DataFrame, rules: list) -> DataFrame:
    """Evaluate the rule list; returns (rule, metric, passed, ord).

    Plan shape — ONE scan, ONE agg, no unions, however many rules:
    each referential rule first becomes ROW-local via a broadcast
    left join against its (deduped) dimension keys with a presence
    marker, then every rule contributes a conditional-sum (or
    count-distinct) column to a single partial+final hash agg, and the
    one-row result explodes into the per-rule report.  ``ord``
    preserves the declared rule order for stable comparison.
    """
    if not rules:  # an empty suite silently "passing" is a footgun
        raise ValueError("run_expectations needs at least one rule")
    staged = df
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    metric_of: list[tuple] = []  # (rule, metric-expr builder input)
    for i, r in enumerate(rules):
        if isinstance(r, (NotNull, AcceptedValues, InRange)):
            aggs.append(
                F.sum(F.when(r.violation(), 1).otherwise(0)).alias(f"__v{i}")
            )
            metric_of.append((r, "frac"))
        elif isinstance(r, Unique):
            aggs.append(
                F.count_distinct(F.struct(*r.columns)).alias(f"__v{i}")
            )
            metric_of.append((r, "dup"))
        elif isinstance(r, RefIntegrity):
            marker = f"__ref{i}"
            dim_keys = (
                r.dim.select(F.col(r.dim_column).alias(r.column))
                .distinct()
                .withColumn(marker, F.lit(1))
            )
            staged = staged.join(F.broadcast(dim_keys), r.column, "left")
            aggs.append(
                F.sum(
                    F.when(F.col(marker).isNull(), 1).otherwise(0)
                ).alias(f"__v{i}")
            )
            metric_of.append((r, "frac"))
        else:  # pragma: no cover - guard against silent rule drops
            raise TypeError(f"unknown expectation: {r!r}")
    base = staged.agg(*aggs)

    n = F.col("__n").cast("double")
    entries = []
    for i, (r, kind) in enumerate(metric_of):
        if kind == "dup":
            metric = F.round((F.col("__n") - F.col(f"__v{i}")) / n, 6)
        else:
            metric = F.round(F.col(f"__v{i}") / n, 6)
        entries.append(
            F.struct(
                F.lit(r.name).alias("rule"),
                metric.alias("metric"),
                (metric <= r.tolerance).alias("passed"),
                F.lit(i).cast("long").alias("ord"),
            )
        )
    return base.select(
        F.explode(F.array(*entries)).alias("e")
    ).select("e.rule", "e.metric", "e.passed", "e.ord")
