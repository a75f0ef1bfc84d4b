"""Graphics hardware dashboard — validation + count pyramids.

Re-expresses mozetl/graphics/graphics_telemetry_dashboard.py:151-292:
the per-ping Python ``validate`` dict mutation becomes a when/otherwise
projection (P9 → declarative), and the countByKey/reduceByKey pyramids
(:256-292) become groupBy counts with top-N + "Other" collapse — the
A10/A13 operators.

All string surgery (OS normalization, vendor merge, device keys) is
built-in expression composition: executor-side, codegen-eligible, no
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.operators import normalize_shares, top_n_groups


def validate_pings(pings: DataFrame) -> DataFrame:
    """OS normalization + adapter extraction + validity flag
    (dashboard.py:151-207).  Input columns: os_name, os_version,
    os_service_pack_major, build_version, adapters
    array<struct<vendorID,deviceID,driverVersion,driverVendor>>."""
    name = F.coalesce(F.col("os_name"), F.lit("w"))
    version = F.coalesce(F.col("os_version"), F.lit("0"))
    spmaj = F.coalesce(F.col("os_service_pack_major").cast("string"), F.lit("0"))
    win_ver = F.concat_ws(".", version, spmaj)
    os_norm = (
        F.when(name == "Linux", F.struct(
            F.lit("Linux").alias("os"), F.lit("Linux").alias("os_name_n"),
            F.lit(None).cast("string").alias("os_version_n")))
        .when(name == "Windows_NT", F.struct(
            F.concat(F.lit("Windows-"), win_ver).alias("os"),
            F.lit("Windows").alias("os_name_n"), win_ver.alias("os_version_n")))
        .when(name == "Darwin", F.struct(
            F.concat(F.lit("Darwin-"), version).alias("os"),
            F.lit("Darwin").alias("os_name_n"), version.alias("os_version_n")))
        .otherwise(F.struct(
            F.concat_ws("-", name, version).alias("os"),
            name.alias("os_name_n"), version.alias("os_version_n")))
    )
    adapter = F.element_at(F.col("adapters"), 1)
    unknown = lambda c: F.coalesce(c, F.lit("Unknown"))  # noqa: E731
    raw_vendor = unknown(adapter.vendorID)
    vendor = F.when(
        raw_vendor == "Intel Open Source Technology Center", F.lit("0x8086")
    ).otherwise(raw_vendor)
    with_cols = pings.withColumns(
        {
            "OS": os_norm.getField("os"),
            "OSName": os_norm.getField("os_name_n"),
            "OSVersion": os_norm.getField("os_version_n"),
            "FxVersion": F.split(F.col("build_version"), r"\.").getItem(0),
            "vendorID": vendor,
            "deviceID": F.concat_ws("/", vendor, unknown(adapter.deviceID)),
            "driverVersion": F.concat_ws(
                "/", vendor, unknown(adapter.driverVersion)
            ),
            "valid": F.col("build_version").isNotNull()
            & (F.size(F.coalesce(F.col("adapters"),
                                 F.array().cast("array<struct<vendorID:string,"
                                                "deviceID:string,driverVersion:string,"
                                                "driverVendor:string>>"))) > 0)
            & adapter.isNotNull(),
        }
    )
    return with_cols.where(F.col("valid"))


def count_pyramid(valid: DataFrame, dim: str, top_n: int = 10,
                  other_label: str = "Other") -> DataFrame:
    """Share-of-population per dimension value, top-N + Other — one
    groupBy + one window, replacing the driver countByKey + python
    sort (:266-292)."""
    counts = valid.groupBy(dim).agg(F.count(F.lit(1)).alias("n"))
    collapsed = top_n_groups(
        counts, dim, F.col("n"), top_n=top_n, other_label=other_label
    )
    return normalize_shares(collapsed, "n", alias="share")


def run_graphics_dashboard(
    pings: DataFrame, dims: tuple[str, ...] = ("OS", "vendorID", "deviceID")
) -> dict[str, DataFrame]:
    """Per-dimension share tables — the dashboard's JSON series."""
    valid = validate_pings(pings)
    return {d: count_pyramid(valid, d) for d in dims}
