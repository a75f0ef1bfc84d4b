"""Config-driven frame conversion — the reusable per-column
cleaning-table pattern.

Re-expresses the reference's ``DataFrameConfig`` / ``convert_pings``
(mozetl/basic/transform.py:12-67): there, a table of (name, path,
cleaning_func, type) drives an RDD ``map`` that extracts each ping
path and applies a row-at-a-time Python cleaner, swallowing per-cell
exceptions to null.  Here the same declaration compiles to ONE
``select`` of JVM expressions:

- ``path`` is a nested dot-path (``meta.event_type``) resolved by
  Catalyst — pairs with ``sources.read_json_pings`` for raw pings;
- ``dtype`` casts with ``try_cast`` semantics, so an uncastable cell
  nulls out exactly like the reference's except-to-None (instead of
  failing the task);
- ``clean`` is an optional Column→Column transform (use ``F.try_*``
  functions for cleaners that can fail per-cell);
- ``row_filter`` is the ping_filter twin, pushed down by Catalyst.

The whole config stays data (a list of specs), so jobs can share and
compose cleaning tables — but the execution is whole-stage-codegen'd,
never per-row Python.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ColumnSpec:
    """One output column: where it comes from, its type, how to clean it."""

    name: str
    path: str | None = None  # defaults to name; supports nested dot-paths
    dtype: str | None = None  # Spark SQL type string; try_cast semantics
    clean: Callable[[Column], Column] | None = None


@dataclass(frozen=True)
class FrameConfig:
    """The conversion table: column specs plus an optional row filter
    (the reference's ``ping_filter``)."""

    columns: tuple[ColumnSpec, ...]
    row_filter: Column | str | None = None


def convert_frame(df: DataFrame, config: FrameConfig) -> DataFrame:
    """Apply a :class:`FrameConfig` as one declarative select."""
    out = []
    for spec in config.columns:
        col = F.expr(spec.path or spec.name)
        if spec.dtype is not None:
            col = col.try_cast(spec.dtype)
        if spec.clean is not None:
            col = spec.clean(col)
        out.append(col.alias(spec.name))
    converted = df.select(*out)
    if config.row_filter is not None:
        flt = config.row_filter
        converted = converted.where(F.expr(flt) if isinstance(flt, str) else flt)
    return converted
