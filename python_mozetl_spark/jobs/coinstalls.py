"""Addon coinstallation graph (TAAR-lite).

Mirrors mozetl/taar/taar_lite_guidguid.py:83-199: valid-addon filter →
``key_all`` self-fanout → pair counts → per-addon coinstall map.  The
reference's row-UDF tuple packer (:162-165) is ``struct()``; the
whole job is explode + groupBy, no RDDs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.operators import self_fanout


def valid_addons(addons: Column, whitelist: Column | None = None) -> Column:
    """Validity predicate (taar_lite_guidguid.py:29-46): user-facing,
    signed, non-system extensions."""
    pred = (
        lambda a: (~F.coalesce(a.is_system, F.lit(False)))
        & (~F.coalesce(a.app_disabled, F.lit(False)))
        & (~F.coalesce(a.user_disabled, F.lit(False)))
        & (~F.coalesce(a.foreign_install, F.lit(False)))
        & (a.type == "extension")
        & (a.signed_state == 2)
    )
    out = F.filter(addons, pred)
    if whitelist is not None:
        out = F.filter(out, lambda a: F.array_contains(whitelist, a.addon_id))
    return out


def run_coinstall_graph(
    clients: DataFrame,
    addons_col: str = "active_addons",
    whitelist: list[str] | None = None,
) -> DataFrame:
    """addon → [(coinstalled_addon, count)...] sorted desc by count.

    One explode fanout + one groupBy(pair) + one groupBy(addon); output
    is the small model artifact the reference JSON-dumps.
    """
    wl = F.array(*[F.lit(g) for g in whitelist]) if whitelist else None
    guids = clients.select(
        F.transform(
            valid_addons(F.col(addons_col), wl), lambda a: a.addon_id
        ).alias("guids")
    ).where(F.size("guids") >= 2)
    pairs = self_fanout(guids, "guids", "addon", "coinstall")
    counts = pairs.groupBy("addon", "coinstall").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.groupBy("addon").agg(
        F.reverse(
            F.array_sort(
                F.collect_list(F.struct(F.col("n"), F.col("coinstall")))
            )
        ).alias("coinstalls")
    )


def run_install_ranking(clients: DataFrame,
                        addons_col: str = "active_addons") -> DataFrame:
    """Addon install ranking (taar_lite_guidranking.py:22-39): install
    count per addon guid over clients with ≥1 addon.  One explode +
    one count aggregation, replacing the reference's SQL-string path."""
    return (
        clients.where(F.size(F.col(addons_col)) > 0)
        .select(F.explode(F.col(addons_col)).alias("addon"))
        .groupBy(F.col("addon.addon_id").alias("addon_guid"))
        .agg(F.count(F.lit(1)).alias("install_count"))
    )
