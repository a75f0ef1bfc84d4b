"""search_aggregates / search_clients_daily: one parameterized rollup.

The reference proves these are a single pipeline with two parameter
sets (mozetl/search/aggregates.py:368-388 differ only in grouping
columns).  Composition: explode search_counts + ad-click maps →
when-chain type classifier → groupBy → pivot on type.

Upgrades over the reference:
- map columns explode via built-in ``map_entries`` (E3) instead of the
  Python UDFs at aggregates.py:190-205 — stays in codegen;
- zero-search clients via ``explode_outer`` (E4) instead of the
  explode + where-null union (aggregates.py:275-284);
- the follow-on addon version lookup (UDF at aggregates.py:182-187) is
  a higher-order ``filter(...)[0]`` expression (F1);
- absent ad-click columns are declared via ``ensure_columns`` instead
  of try/except AnalysisException (aggregates.py:255-273).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.jobs.clients_daily import SEARCH_SOURCES
from python_mozetl_spark.operators import pivot_agg
from python_mozetl_spark.sources import ensure_columns

MAX_CLIENT_SEARCH_COUNT = 10_000  # outlier guard, aggregates.py:42

SEARCH_TYPES = ["organic", "tagged-sap", "tagged-follow-on", "sap",
                "ad-click", "search-with-ads", "unknown"]

_MAP_COLUMNS = {
    "scalar_parent_browser_search_ad_clicks": "ad-click:",
    "scalar_parent_browser_search_with_ads": "search-with-ads:",
}


_SC_TYPE = "array<struct<engine:string,source:string,count:bigint>>"


def _map_to_rows(col: str, prefix: str) -> Column:
    """map<engine,count> → array<struct<engine,source,count>> with the
    prefix baked into source (built-in replacement for the reference's
    get_ad_click_count UDF).  Null map ⇒ empty array (concat() would
    otherwise null the whole combined array)."""
    rows = F.transform(
        F.map_entries(F.col(col)),
        lambda e: F.struct(
            e.key.alias("engine"),
            F.concat(F.lit(prefix), e.key).alias("source"),
            e.value.alias("count"),
        ),
    )
    return F.coalesce(rows, F.array().cast(_SC_TYPE))


def explode_search_counts(df: DataFrame) -> DataFrame:
    """Exploded (engine, source, count) rows: search_counts array plus
    the two ad-click map columns, zero-search rows preserved.
    Reference: aggregates.py:208-284."""
    df = ensure_columns(
        df,
        {
            "scalar_parent_browser_search_ad_clicks": "map<string,bigint>",
            "scalar_parent_browser_search_with_ads": "map<string,bigint>",
        },
    )
    combined = F.concat(
        F.coalesce(F.col("search_counts"), F.array().cast(_SC_TYPE)),
        *[_map_to_rows(c, p) for c, p in _MAP_COLUMNS.items()],
    )
    keep = [c for c in df.columns if c not in
            ("search_counts", *_MAP_COLUMNS)]
    exploded = df.select(*keep, F.explode_outer(combined).alias("sc")).select(
        *keep,
        F.col("sc.engine").alias("engine"),
        F.col("sc.source").alias("source"),
        F.coalesce(F.col("sc.count"), F.lit(0)).alias("count"),
    )
    return exploded.where(
        (F.col("count") >= 0) & (F.col("count") < MAX_CLIENT_SEARCH_COUNT)
    )


def add_derived_columns(df: DataFrame) -> DataFrame:
    """source → type classifier (the recursive when-chain at
    aggregates.py:287-322) + follow-on addon version via higher-order
    filter (no UDF)."""
    src = F.col("source")
    typ = (
        F.when(src.isNull(), "sap")
        .when(src.startswith("in-content:sap:"), "tagged-sap")
        .when(src.startswith("in-content:sap-follow-on:"), "tagged-follow-on")
        .when(src.startswith("in-content:organic:"), "organic")
        .when(src.startswith("ad-click:"), "ad-click")
        .when(src.startswith("search-with-ads:"), "search-with-ads")
        .when(src.startswith("follow-on:"), "tagged-follow-on")
        .when(src.startswith("sap:"), "tagged-sap")
        .when(src.isin(*SEARCH_SOURCES), "sap")
        .otherwise("unknown")
    )
    out = df.withColumn("type", typ)
    if "active_addons" in df.columns:
        followon = F.filter(
            F.col("active_addons"),
            lambda a: a.addon_id == "followonsearch@mozilla.com",
        )
        out = out.withColumn(
            "addon_version",
            F.when(F.size(followon) > 0, followon[0].version),
        )
    return out


def agg_search_data(
    df: DataFrame, grouping_cols: Sequence[str]
) -> DataFrame:
    """groupBy(grouping + type) → pivot(type).sum(count) — the shared
    core (aggregates.py:129-177).  Explicit pivot domain; hyphen→
    underscore aliases as in the reference."""
    exploded = add_derived_columns(explode_search_counts(df))
    return pivot_agg(
        exploded,
        list(grouping_cols),
        "type",
        SEARCH_TYPES,
        F.sum("count"),
    )


def run_search_aggregates(df: DataFrame) -> DataFrame:
    """Engine-level rollup (aggregates.py:108-126): engine must be
    present."""
    out = agg_search_data(df, ["submission_date_s3", "engine", "source"])
    return out.where(F.col("engine").isNotNull())


def run_search_clients_daily(df: DataFrame) -> DataFrame:
    """Client-level parameterization (aggregates.py:368-377)."""
    return agg_search_data(
        df, ["client_id", "submission_date_s3", "engine", "source"]
    )
