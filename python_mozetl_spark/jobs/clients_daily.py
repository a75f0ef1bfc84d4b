"""clients_daily: per-client-per-day wide rollup — the reference's
flagship table, at FULL aggregator parity.

Mirrors mozetl/clientsdaily/rollup.py:26-133 plus the complete
90-aggregator catalog in mozetl/clientsdaily/fields.py:35-213, with
four deliberate upgrades (SURVEY.md §7):

- search extraction uses ``explode_with_default`` — ONE scan, no
  null-branch union, no rejoin shuffle for the zero-search path
  (reference does explode + where-null + union + join back:
  rollup.py:86-98);
- the per-source conditional sums ride along INTO the day rollup, so
  the whole job is: scan → explode → groupBy(document) → join →
  groupBy(client, day) with exactly the reference's two agg shuffles
  but one fewer scan;
- every ``first()`` aggregate is a deterministic ``first_by`` under
  an explicit (submission_date_s3, document_id) total order — the
  reference's ``first(ignorenulls=True)`` is scan-order-dependent
  and irreproducible across retries (SURVEY §7.3);
- profile dates use timezone-free epoch-day arithmetic instead of
  ``from_unixtime`` (fields.py:128-136), so results don't depend on
  the session timezone.

The catalog is DATA (module-level field lists feeding :class:`AggSpec`),
so experiments_daily is the same job with one more key (reference
experimentsdaily/rollup.py:18-27), and :func:`clients_daily_oracle_sql`
generates the DuckDB twin for the correctness gate FROM THE SAME
LISTS — one source of truth for both engines.

Scale shape: two hash exchanges total (document_id for search,
(client_id, activity_date) for the rollup) regardless of how many
aggregates ride the catalog — Catalyst plans all ~100 as one
partial+final hash aggregate pair.  At 100 TB the input is
date-partitioned so each day's rollup prunes to its partition, and
the (client, day) key space is uniform (client_id is a uuid) — no
skew, no salting needed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.operators import (
    AggSpec,
    conditional_sum,
    explode_with_default,
    first_by,
    wide_agg,
)
from python_mozetl_spark.sources import ensure_columns

SEARCH_SOURCES = ["searchbar", "urlbar", "abouthome", "newtab", "contextmenu",
                  "system", "activitystream", "webextension", "alias"]

# ---------------------------------------------------------------------------
# The aggregator catalog (fields.py:35-213), transcribed as data.
# ---------------------------------------------------------------------------

#: long columns summed as ``{col}_sum`` (fields.py agg_sum rows)
SUM_FIELDS = [
    "aborts_content", "aborts_gmplugin", "aborts_plugin",
    "crashes_detected_content", "crashes_detected_gmplugin",
    "crashes_detected_plugin", "crash_submit_attempt_content",
    "crash_submit_attempt_main", "crash_submit_attempt_plugin",
    "crash_submit_success_content", "crash_submit_success_main",
    "crash_submit_success_plugin", "devtools_toolbox_opened_count",
    "plugin_hangs", "plugins_infobar_allow", "plugins_infobar_block",
    "plugins_infobar_shown", "plugins_notification_shown", "push_api_notify",
    "scalar_parent_browser_engagement_tab_open_event_count",
    "scalar_parent_browser_engagement_total_uri_count",
    "scalar_parent_browser_engagement_unfiltered_uri_count",
    "scalar_parent_browser_engagement_window_open_event_count",
    "scalar_parent_devtools_copy_full_css_selector_opened",
    "scalar_parent_devtools_copy_unique_css_selector_opened",
    "scalar_parent_devtools_toolbar_eyedropper_opened",
    "scalar_parent_dom_contentprocess_troubled_due_to_memory",
    "scalar_parent_navigator_storage_estimate_count",
    "scalar_parent_navigator_storage_persist_count",
    "scalar_parent_storage_sync_api_usage_extensions_using",
    "scalar_parent_webrtc_nicer_stun_retransmits",
    "scalar_parent_webrtc_nicer_turn_401s",
    "scalar_parent_webrtc_nicer_turn_403s",
    "scalar_parent_webrtc_nicer_turn_438s",
    "shutdown_kill", "ssl_handshake_result_failure",
    "ssl_handshake_result_success", "sync_count_desktop",
    "sync_count_mobile", "web_notification_shown",
    # engine supersets: the reference only ships the hour CONVERSIONS of
    # these (fields.py:43-47,186-201); raw-unit sums kept for consumers
    "active_ticks", "subsession_length", "total_time",
]

#: columns averaged as ``{col}_mean`` (fields.py agg_mean rows); the
#: unique-domains scalar is deliberately BOTH mean and max (fields.py:150-152)
MEAN_FIELDS = [
    "active_addons_count", "first_paint", "places_bookmarks_count",
    "places_pages_count", "session_restored",
    "scalar_parent_browser_engagement_unique_domains_count",
]

#: columns max'd as ``{col}_max`` (fields.py agg_max rows)
MAX_FIELDS = [
    "scalar_parent_browser_engagement_max_concurrent_tab_count",
    "scalar_parent_browser_engagement_max_concurrent_window_count",
    "scalar_parent_browser_engagement_unique_domains_count",
]

#: dimension columns taken deterministically from the first ping of the
#: day (fields.py agg_first rows), output name == input name
FIRST_STR_FIELDS = [
    "app_build_id", "app_display_version", "app_name", "app_version",
    "channel", "default_search_engine",
    "default_search_engine_data_load_path", "default_search_engine_data_name",
    "default_search_engine_data_origin",
    "default_search_engine_data_submission_url", "distribution_id",
    "env_build_arch", "env_build_id", "env_build_version", "flash_version",
    "locale", "normalized_channel", "os", "os_version", "sample_id",
    "scalar_parent_aushelper_websense_reg_version",
    "scalar_parent_services_sync_fxa_verification_method", "search_cohort",
    "vendor", "active_experiment_branch", "active_experiment_id",
]
FIRST_LONG_FIELDS = [
    "install_year", "memory_mb", "os_service_pack_major",
    "os_service_pack_minor", "timezone_offset", "windows_build_number",
    "windows_ubr",
]
FIRST_BOOL_FIELDS = [
    "addon_compatibility_check_enabled", "blocklist_enabled", "e10s_enabled",
    "is_default_browser", "is_wow64", "scalar_parent_telemetry_os_shutting_down",
    "sync_configured", "telemetry_enabled",
]
FIRST_FIELDS = FIRST_STR_FIELDS + FIRST_LONG_FIELDS + FIRST_BOOL_FIELDS

#: geo dimensions gated on a valid country (fields.py:56-76): the
#: inner value falls back to '??', the whole expr NULLs out when the
#: country is missing/unknown.  (name, inner_column)
GEO_CONDITIONAL_FIELDS = [
    ("city", "city"),
    ("geo_subdivision1", "geo_subdivision1"),
    ("geo_subdivision2", "geo_subdivision2"),
]

# Columns the rollup consumes that may be absent from older partitions
# (schema drift; reference rollup.py:104-122 injects STRING(NULL) via
# try/except — ensure_columns is the declarative version, SURVEY §7.3).
OPTIONAL_COLUMNS: dict[str, str] = {
    "search_counts": "array<struct<engine:string,source:string,count:bigint>>",
    "subsession_counter": "bigint",
    "subsession_length": "bigint",
    "active_ticks": "bigint",
    "total_time": "bigint",
    "profile_creation_date": "bigint",
    "country": "string",
    **{c: "bigint" for c in SUM_FIELDS + MEAN_FIELDS + MAX_FIELDS},
    **{c: "string" for c in FIRST_STR_FIELDS},
    **{c: "bigint" for c in FIRST_LONG_FIELDS},
    **{c: "boolean" for c in FIRST_BOOL_FIELDS},
    **{name: "string" for name, _ in GEO_CONDITIONAL_FIELDS},
}

_EPOCH = "1970-01-01"


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


def _valid_country() -> Column:
    return F.col("country").isNotNull() & (F.col("country") != "??")


def full_agg_spec(keys: Sequence[str] = ("client_id", "activity_date")) -> AggSpec:
    """The COMPLETE clients_daily aggregate catalog (fields.py:35-213)
    as one :class:`AggSpec` — callers extend with ``spec.add(...)``
    (experiments_daily adds its key and ``experiment_branch`` first).

    Float-valued outputs (means, hour conversions) are rounded to 6dp
    inside the spec so the table is bit-stable across partition
    orders and engines.
    """
    order = F.struct(F.col("submission_date_s3"), F.col("document_id"))
    spec = AggSpec(keys=list(keys))
    spec.add("document_id", "count_distinct", "pings_aggregated_by_this_row")
    for c in SUM_FIELDS:
        spec.add(c, "sum", f"{c}_sum")
    for c in MEAN_FIELDS:
        spec.add_expr(F.round(F.avg(c), 6).alias(f"{c}_mean"))
    for c in MAX_FIELDS:
        spec.add(c, "max", f"{c}_max")
    # unit conversions (fields.py:43-47,180-201)
    spec.add_expr(
        F.round(F.sum(F.col("active_ticks") / (3600.0 / 5)), 6).alias("active_hours_sum")
    )
    spec.add_expr(
        F.round(F.sum(F.col("subsession_length") / 3600.0), 6).alias(
            "subsession_hours_sum"
        )
    )
    spec.add_expr(
        F.round(F.sum(F.col("total_time") / 3600.0), 6).alias("total_hours_sum")
    )
    spec.add_expr(
        F.sum(
            F.when(F.col("subsession_counter") == 1, F.lit(1)).otherwise(F.lit(0))
        ).alias("sessions_started_on_this_day")
    )
    # deterministic firsts
    for dim in FIRST_FIELDS:
        spec.add_expr(first_by(dim, order, dim))
    # geo gated on a valid country (fields.py:56-76)
    for name, inner in GEO_CONDITIONAL_FIELDS:
        spec.add_expr(
            first_by(
                F.when(_valid_country(), F.coalesce(F.col(inner), F.lit("??"))),
                order,
                name,
            )
        )
    spec.add_expr(
        first_by(F.when(_valid_country(), F.col("country")), order, "country")
    )
    # profile dates: tz-free epoch-day arithmetic (vs fields.py:128-136)
    pcd_date = F.date_add(
        F.lit(_EPOCH).cast("date"), F.col("profile_creation_date").cast("int")
    )
    spec.add_expr(
        first_by(
            F.datediff(F.to_date(F.col("activity_date")), pcd_date),
            order,
            "profile_age_in_days",
        )
    )
    spec.add_expr(
        first_by(F.date_format(pcd_date, "yyyy-MM-dd"), order, "profile_creation_date")
    )
    # search sums over the rejoined per-document totals (fields.py:172-178)
    spec.add("search_count_all", "sum", "search_count_all_sum")
    for s in SEARCH_SOURCES:
        spec.add(f"search_count_{s}", "sum", f"search_count_{s}_sum")
    return spec


# Backwards-compatible name: earlier rounds exposed a ~16-field subset
# under this name; the full catalog replaced it in round 5.
default_agg_spec = full_agg_spec


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
    spec = spec or full_agg_spec()
    return wide_agg(joined, spec)


def clients_daily_oracle_sql(
    parquet_path: str,
    keys: Sequence[str] = ("client_id", "activity_date"),
    extra_ms_cols: str = "",
    ms_where: str = "",
) -> str:
    """DuckDB twin of :func:`run_clients_daily` + :func:`full_agg_spec`,
    generated from the SAME catalog lists — the correctness gate's
    oracle for the ``clients_daily_rollup`` registry query, and (with
    the 3-part key + an ``experiment_id`` projection) for
    ``experiments_daily_rollup``: the reference's point that the two
    rollups are ONE parameterized operator holds for the oracle too.

    Firsts are expressed as ``max(CASE WHEN rn = 1 THEN col END)``
    over a (submission_date_s3, document_id)-ranked window — the exact
    relational meaning of ``min_by`` under that total order.

    ``extra_ms_cols`` appends projections to the base CTE (e.g.
    ``", active_experiment_id AS experiment_id"``); ``ms_where`` adds a
    WHERE clause to it.
    """
    src_list = ", ".join(f"'{s}'" for s in SEARCH_SOURCES)
    per_source_cols = ",\n    ".join(
        f"sum(CASE WHEN source = '{s}' THEN cnt ELSE 0 END) AS search_count_{s}"
        for s in SEARCH_SOURCES
    )
    aggs: list[str] = [
        "CAST(count(DISTINCT document_id) AS BIGINT) AS pings_aggregated_by_this_row"
    ]
    aggs += [f"CAST(sum({c}) AS BIGINT) AS {c}_sum" for c in SUM_FIELDS]
    aggs += [f"round(avg({c}), 6) AS {c}_mean" for c in MEAN_FIELDS]
    aggs += [f"max({c}) AS {c}_max" for c in MAX_FIELDS]
    aggs += [
        "round(sum(active_ticks / (3600.0/5)), 6) AS active_hours_sum",
        "round(sum(subsession_length / 3600.0), 6) AS subsession_hours_sum",
        "round(sum(total_time / 3600.0), 6) AS total_hours_sum",
        "CAST(sum(CASE WHEN subsession_counter = 1 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS sessions_started_on_this_day",
    ]
    aggs += [f"max(CASE WHEN rn = 1 THEN {c} END) AS {c}" for c in FIRST_FIELDS]
    for name, inner in GEO_CONDITIONAL_FIELDS:
        aggs.append(
            f"max(CASE WHEN rn = 1 THEN (CASE WHEN country IS NOT NULL AND"
            f" country <> '??' THEN coalesce({inner}, '??') END) END) AS {name}"
        )
    aggs.append(
        "max(CASE WHEN rn = 1 THEN (CASE WHEN country IS NOT NULL AND"
        " country <> '??' THEN country END) END) AS country"
    )
    pcd = f"(DATE '{_EPOCH}' + CAST(profile_creation_date AS INTEGER))"
    aggs += [
        f"max(CASE WHEN rn = 1 THEN date_diff('day', {pcd},"
        f" CAST(activity_date AS DATE)) END) AS profile_age_in_days",
        f"max(CASE WHEN rn = 1 THEN strftime({pcd}, '%Y-%m-%d') END)"
        " AS profile_creation_date",
    ]
    aggs.append("CAST(sum(search_count_all) AS BIGINT) AS search_count_all_sum")
    aggs += [
        f"CAST(sum(search_count_{s}) AS BIGINT) AS search_count_{s}_sum"
        for s in SEARCH_SOURCES
    ]
    agg_sql = ",\n  ".join(aggs)
    key_sql = ", ".join(keys)
    return f"""
WITH ms AS (
  SELECT *, substr(subsession_start_date, 1, 10) AS activity_date{extra_ms_cols}
  FROM read_parquet('{parquet_path}') {ms_where}),
expl AS (
  SELECT document_id, u.source AS source, u."count" AS cnt
  FROM (SELECT document_id, unnest(search_counts) AS u FROM ms)
  UNION ALL
  SELECT document_id, CAST(NULL AS VARCHAR), 0 FROM ms
  WHERE search_counts IS NULL OR len(search_counts) = 0),
cleaned AS (
  SELECT * FROM expl
  WHERE cnt IS NOT NULL AND cnt > -1
    AND (source IS NULL OR source IN ({src_list}))),
search AS (
  SELECT document_id, sum(cnt) AS search_count_all,
    {per_source_cols}
  FROM cleaned GROUP BY document_id),
j AS (
  SELECT ms.*, s.search_count_all,
    {", ".join(f"s.search_count_{s}" for s in SEARCH_SOURCES)},
    row_number() OVER (PARTITION BY {key_sql}
                       ORDER BY submission_date_s3, document_id) AS rn
  FROM ms LEFT JOIN search s USING (document_id))
SELECT {key_sql},
  {agg_sql}
FROM j GROUP BY {key_sql}
"""
