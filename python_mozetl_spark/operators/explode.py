"""Explode/flatten operators (SURVEY.md §2.4 E1-E6).

The reference's workhorse pattern.  Two deliberate upgrades over it:

- E4's "explode, then union a null-branch back in" (two scans + a
  union; mozetl/clientsdaily/rollup.py:86-97,
  mozetl/search/aggregates.py:275-284) is ``explode_outer`` + default —
  ONE operator, one scan, no union, no second shuffle.
- E3's "UDF that turns a map into array<struct>"
  (mozetl/search/aggregates.py:190-205) is the built-in
  ``map_entries`` — stays in whole-stage codegen.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_entries(
    df: DataFrame,
    array_col: str | Column,
    alias: str = "entry",
    keep: list[str] | None = None,
    outer: bool = False,
) -> DataFrame:
    """E1/E2: explode array<struct>, keeping ``keep`` parent columns."""
    col = F.col(array_col) if isinstance(array_col, str) else array_col
    fn = F.explode_outer if outer else F.explode
    cols = [F.col(c) for c in keep] if keep else [F.col(c) for c in df.columns]
    return df.select(*cols, fn(col).alias(alias))


def explode_map(
    df: DataFrame,
    map_col: str | Column,
    key_alias: str = "key",
    value_alias: str = "value",
    keep: list[str] | None = None,
    outer: bool = False,
) -> DataFrame:
    """E3: explode a map column into (key, value) rows via map_entries."""
    col = F.col(map_col) if isinstance(map_col, str) else map_col
    fn = F.explode_outer if outer else F.explode
    cols = [F.col(c) for c in keep] if keep else []
    return df.select(*cols, fn(F.map_entries(col)).alias("__e")).select(
        *[c for c in (keep or [])],
        F.col("__e.key").alias(key_alias),
        F.col("__e.value").alias(value_alias),
    )


def explode_with_default(
    df: DataFrame,
    array_col: str,
    alias: str,
    defaults: Mapping[str, Column],
    keep: list[str] | None = None,
) -> DataFrame:
    """E4: null-preserving explode with per-field defaults.

    Rows whose array is null/empty survive as one row with ``defaults``
    substituted (e.g. zero-search clients get count=0) — replaces the
    reference's explode + where-null + union dance with a single
    ``explode_outer`` + conditional default.

    Defaults apply ONLY to the synthesized null-array row (exploded
    struct itself null), never to null FIELDS of real elements — a
    corrupt element with a null field stays null so downstream
    validity guards (e.g. ``count > -1``) still see and drop it.
    """
    out = explode_entries(df, array_col, alias=alias, keep=keep, outer=True)
    repl = {
        f"{alias}_{field}": F.when(F.col(alias).isNull(), default).otherwise(
            F.col(f"{alias}.{field}")
        )
        for field, default in defaults.items()
    }
    return out.withColumns(repl)


def self_fanout(
    df: DataFrame,
    array_col: str,
    left_alias: str = "left",
    right_alias: str = "right",
    keep: list[str] | None = None,
) -> DataFrame:
    """E5: ordered pair generation within a list (reference ``key_all``,
    mozetl/taar/taar_lite_guidguid.py:123-130): each element keyed
    against every *other* element.  Pure double-explode — no join, no
    shuffle; output size is sum(len²) so cap list sizes upstream.
    """
    cols = [F.col(c) for c in (keep or [])]
    return (
        df.select(*cols, F.explode(array_col).alias(left_alias), F.col(array_col).alias("__arr"))
        .select(*cols, F.col(left_alias), F.explode("__arr").alias(right_alias))
        .where(F.col(left_alias) != F.col(right_alias))
    )
