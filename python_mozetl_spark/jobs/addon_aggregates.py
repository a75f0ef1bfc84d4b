"""Addon aggregates job.

Re-expresses mozetl/addon_aggregates/addon_aggregates.py:64-163: explode
``active_addons``, derive indicator columns (self-install / shield /
foreign / system / web-extension), aggregate per (client, channel,
app_version, locale) with epoch-day → 'yyyyMMdd' date conversion.

Scale notes vs the reference:
- the reference loops ``for sample_id in range(100)`` writing one
  repartition(1) output per slice (:195-202); here one pipeline ends in
  ``write.partitionBy("sample_id")`` and Spark parallelizes the slices.
- epoch-day conversion uses ``timestamp_seconds`` (TZ-safe, SURVEY
  §7.3) instead of session-TZ-dependent ``from_unixtime``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MS_FIELDS = [
    "client_id",
    "normalized_channel",
    "app_version",
    "locale",
    "sample_id",
    "profile_creation_date",
]

ADDON_FIELDS = [
    "addon.addon_id",
    "addon.foreign_install",
    "addon.is_system",
    "addon.is_web_extension",
    "addon.install_day",
]

# addon_id patterns excluded from "self-installed"
# (addon_aggregates.py:101-107)
_NOT_SELF_PATTERNS = ["%mozilla%", "%cliqz%", "%@unified-urlbar%"]


def explode_addons(main_summary: DataFrame) -> DataFrame:
    """One row per (ping, addon); app_version truncated to major."""
    return (
        main_summary.select(
            *MS_FIELDS, F.explode("active_addons").alias("addon")
        )
        .select(*MS_FIELDS, *ADDON_FIELDS)
        .withColumn("app_version", F.substring("app_version", 1, 2))
    )


def addon_indicator_columns(df: DataFrame) -> DataFrame:
    """0/1 indicator columns for each addon category."""
    excluded = F.lit(False)
    for p in _NOT_SELF_PATTERNS:
        excluded = excluded | F.col("addon_id").like(p)
    self_install = (
        F.col("addon_id").isNotNull()
        & ~F.col("is_system")
        & ~F.col("foreign_install")
        & ~excluded
    )
    as01 = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return (
        df.withColumn("is_self_install", as01(self_install))
        .withColumn(
            "is_shield_addon", as01(F.col("addon_id").like("%@shield.mozilla%"))
        )
        .withColumn("is_foreign_install", as01(F.col("foreign_install")))
        .withColumn("is_system", as01(F.col("is_system")))
        .withColumn("is_web_extension", as01(F.col("is_web_extension")))
    )


def _epoch_day_to_yyyymmdd(day: F.Column) -> F.Column:
    """Epoch-day int → 'yyyyMMdd' string via pure DATE arithmetic —
    no timestamp in the middle, so the session timezone can NEVER
    shift the rendered day (``timestamp_seconds`` + ``date_format``
    renders in the session zone; date_add of a date does not)."""
    return F.date_format(
        F.date_add(F.lit("1970-01-01").cast("date"), day.cast("int")), "yyyyMMdd"
    )


def aggregate_addons(df: DataFrame) -> DataFrame:
    """Per (client, channel, version, locale): indicator sums + first
    self-install date + profile creation date."""
    return (
        df.distinct()
        .groupBy("client_id", "normalized_channel", "app_version", "locale")
        .agg(
            F.sum("is_self_install").alias("n_self_installed_addons"),
            F.sum("is_shield_addon").alias("n_shield_addons"),
            F.sum("is_foreign_install").alias("n_foreign_installed_addons"),
            F.sum("is_system").alias("n_system_addons"),
            F.sum("is_web_extension").alias("n_web_extensions"),
            F.min(
                F.when(
                    F.col("is_self_install") == 1,
                    _epoch_day_to_yyyymmdd(F.col("install_day")),
                )
            ).alias("first_addon_install_date"),
            _epoch_day_to_yyyymmdd(F.min("profile_creation_date")).alias(
                "profile_creation_date"
            ),
        )
    )


def run_addon_aggregates(main_summary: DataFrame) -> DataFrame:
    """Full pipeline: explode → indicators → per-client aggregate.
    Write with ``write_partitioned_parquet(..., partition_by=
    ("submission_date_s3", "sample_id"))`` — one job, not 100."""
    return aggregate_addons(addon_indicator_columns(explode_addons(main_summary)))
