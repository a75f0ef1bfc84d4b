"""clients_daily: per-client-per-day wide rollup.

Mirrors the reference flagship (mozetl/clientsdaily/rollup.py:26-133 +
the 90-aggregator table in mozetl/clientsdaily/fields.py:35-213), with
three deliberate upgrades (SURVEY.md §7):

- search extraction uses ``explode_with_default`` — ONE scan, no
  null-branch union, no rejoin shuffle for the zero-search path
  (reference does explode + where-null + union + join back:
  rollup.py:86-98);
- the per-source conditional sums ride along INTO the day rollup, so
  the whole job is: scan → explode → groupBy(document) → join →
  groupBy(client, day) with exactly the reference's two agg shuffles
  but one fewer scan;
- ``first()`` aggregates are deterministic ``first_by`` under an
  explicit (submission_date, document_id) order.

The aggregate table is data (AggSpec), so experiments_daily is the
same job with one more key (reference experimentsdaily/rollup.py:18-27).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.operators import (
    AggSpec,
    conditional_sum,
    explode_with_default,
    first_by,
    wide_agg,
)
from python_mozetl_spark.sources import ensure_columns

# Columns the rollup consumes that may be absent from older partitions
# (schema drift, reference: rollup.py:104-122 injects STRING(NULL);
# ensure_columns is the first-class version, SURVEY.md §7.3).
OPTIONAL_COLUMNS: dict[str, str] = {
    "search_counts": "array<struct<engine:string,source:string,count:bigint>>",
    "active_ticks": "bigint",
    "subsession_length": "bigint",
    "places_bookmarks_count": "bigint",
    "scalar_parent_browser_engagement_total_uri_count": "bigint",
    "country": "string",
    "city": "string",
    "locale": "string",
    "os": "string",
    "channel": "string",
    "app_version": "string",
}

SEARCH_SOURCES = ["searchbar", "urlbar", "abouthome", "newtab", "contextmenu",
                  "system", "activitystream", "webextension", "alias"]


def extract_search_counts(df: DataFrame) -> DataFrame:
    """Per-document search totals incl. per-source columns.

    Reference: extract_search_counts (rollup.py:26-99).  Null/empty
    search_counts arrays yield count=0 rows (E4 null-preserving
    explode) instead of the reference's union-of-null-branch.
    Corruption guard: count > -1 (rollup.py:53).
    """
    exploded = explode_with_default(
        df.select("document_id", "search_counts"),
        "search_counts",
        alias="sc",
        defaults={"count": F.lit(0).cast("long")},
        keep=["document_id"],
    ).select(
        "document_id",
        F.col("sc.source").alias("source"),
        F.col("sc_count").alias("count"),
    )
    cleaned = exploded.where(
        F.col("count").isNotNull()
        & (F.col("count") > -1)
        & (F.col("source").isNull() | F.col("source").isin(SEARCH_SOURCES))
    )
    per_source = [
        conditional_sum(F.col("source") == s, F.col("count"), f"search_count_{s}")
        for s in SEARCH_SOURCES
    ]
    return cleaned.groupBy("document_id").agg(
        F.sum("count").alias("search_count_all"), *per_source
    )


def default_agg_spec(keys: Sequence[str] = ("client_id", "activity_date")) -> AggSpec:
    """The clients_daily aggregate table (subset of fields.py:35-213),
    expressed as data.  Callers extend with ``spec.add(...)``."""
    order = F.struct(F.col("submission_date_s3"), F.col("document_id"))
    spec = (
        AggSpec(keys=list(keys))
        .add("document_id", "count_distinct", "pings_aggregated_by_this_row")
        .add("active_ticks", "sum", "active_ticks_sum")
        .add("subsession_length", "sum", "subsession_length_sum")
        .add("places_bookmarks_count", "mean", "places_bookmarks_count_mean")
        .add(
            "scalar_parent_browser_engagement_total_uri_count",
            "sum",
            "scalar_parent_browser_engagement_total_uri_count_sum",
        )
        .add("search_count_all", "sum", "search_count_all_sum")
    )
    # hours conversions (A3, fields.py:43-47,186-190)
    spec.add_expr(
        F.sum(F.col("active_ticks") / (3600.0 / 5)).alias("active_hours_sum")
    )
    spec.add_expr(
        F.sum(F.col("subsession_length") / 3600.0).alias("subsession_hours_sum")
    )
    # deterministic "first" dimensions (SURVEY §7.3)
    for dim in ["country", "city", "locale", "os", "channel", "app_version"]:
        spec.add_expr(first_by(dim, order, dim))
    return spec


def run_clients_daily(
    main_summary: DataFrame,
    spec: AggSpec | None = None,
) -> DataFrame:
    """Full pipeline: activity-date derivation → search extraction →
    rejoin → wide rollup.  Reference: main_etl (rollup.py:149-199).
    """
    with_day = ensure_columns(main_summary, OPTIONAL_COLUMNS).withColumn(
        "activity_date", F.substring(F.col("subsession_start_date"), 1, 10)
    )
    search = extract_search_counts(with_day)
    joined = with_day.join(search, "document_id", "left")
    spec = spec or default_agg_spec()
    return wide_agg(joined, spec)
