"""Hardware report: longitudinal → latest-valid → distribution.

Mirrors mozetl/hardware_report/summarize_json.py — the reference's most
RDD-heavy job (per-row Python over longitudinal arrays, :157-348,
driver-side collapse/normalize :351-469).  Re-expressed as pure
DataFrame ops over the longitudinal layout (one row per client, each
field an array ordered newest-first, FIXTURES.md §7):

1. latest-valid extraction: the index of the newest ping that passes
   validity checks, applied with ``element_at`` — higher-order
   functions, no explode, no Python;
2. dimension counting: one groupBy;
3. collapse-below-threshold → 'Other' (A13 operator);
4. share normalization (A14 operator).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.operators import collapse_small_groups, normalize_shares


def latest_valid_index(validity: Column) -> Column:
    """1-based index of the first true element (arrays are ordered
    newest-first), null if none — the reference's backwards scan
    (summarize_json.py:217-287) as array_position."""
    return F.array_position(validity, True)


def extract_latest_valid(
    longitudinal: DataFrame,
    dims: dict[str, Column],
    validity: Column,
) -> DataFrame:
    """One row per client with scalar dimension values taken from the
    newest valid ping.  ``dims`` maps output name → array column;
    ``validity`` is an array<boolean> aligned with them."""
    idx = latest_valid_index(validity)
    out = longitudinal.withColumn("__i", idx).where(F.col("__i") > 0)
    return out.select(
        "client_id",
        *[F.element_at(arr, F.col("__i").cast("int")).alias(name)
          for name, arr in dims.items()],
    )


def dimension_report(
    clients: DataFrame,
    dim: str,
    threshold: int = 3,
    other_label: str = "Other",
) -> DataFrame:
    """count per dimension value → collapse small groups → shares."""
    counts = clients.groupBy(dim).agg(F.count(F.lit(1)).alias("n"))
    collapsed = collapse_small_groups(
        counts, dim, F.col("n"), threshold=threshold, other_label=other_label
    )
    return normalize_shares(collapsed, "n", alias="share")
