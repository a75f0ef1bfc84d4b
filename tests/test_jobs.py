"""Job-parity tests on reference-shaped synthetic frames (the
snippet-factory strategy from the reference's own suite, SURVEY.md §5).
"""

import pytest
from pyspark.sql import functions as F

from python_mozetl_spark.jobs.clients_daily import (
    extract_search_counts,
    run_clients_daily,
)
from python_mozetl_spark.jobs.coinstalls import run_coinstall_graph
from python_mozetl_spark.jobs.search_aggregates import (
    add_derived_columns,
    explode_search_counts,
    run_search_aggregates,
)
from python_mozetl_spark.jobs.sync_bookmark import run_bookmark_validation
from tests.conftest import make_rows

MAIN_SUMMARY_SCHEMA = """
    client_id string, document_id string, submission_date_s3 string,
    subsession_start_date string, active_ticks long, subsession_length long,
    places_bookmarks_count long,
    scalar_parent_browser_engagement_total_uri_count long,
    country string, city string, locale string, os string, channel string,
    app_version string,
    search_counts array<struct<engine:string,source:string,count:bigint>>,
    active_addons array<struct<addon_id:string,version:string>>
"""

BASE = {
    "client_id": "c1",
    "document_id": "d1",
    "submission_date_s3": "20170101",
    "subsession_start_date": "2017-01-01 10:00",
    "active_ticks": 360,
    "subsession_length": 3600,
    "places_bookmarks_count": 10,
    "scalar_parent_browser_engagement_total_uri_count": 100,
    "country": "DE",
    "city": "Berlin",
    "locale": "de",
    "os": "windows",
    "channel": "release",
    "app_version": "54.0.1",
    "search_counts": [{"engine": "google", "source": "urlbar", "count": 4}],
    "active_addons": [{"addon_id": "followonsearch@mozilla.com", "version": "0.9.5"}],
}


@pytest.fixture()
def main_summary(spark):
    rows = make_rows(
        BASE,
        [
            {},  # c1/d1: 4 urlbar searches
            {
                "document_id": "d2",
                "search_counts": [
                    {"engine": "google", "source": "urlbar", "count": 2},
                    {"engine": "bing", "source": "searchbar", "count": 3},
                    {"engine": "corrupt", "source": "urlbar", "count": -5},
                ],
            },
            {"client_id": "c2", "document_id": "d3", "search_counts": None},
        ],
    )
    return spark.createDataFrame(rows, MAIN_SUMMARY_SCHEMA)


def test_extract_search_counts(main_summary):
    out = {r["document_id"]: r for r in extract_search_counts(main_summary).collect()}
    assert out["d1"]["search_count_all"] == 4
    assert out["d1"]["search_count_urlbar"] == 4
    # corrupt negative count dropped (P6 guard), remaining 2+3
    assert out["d2"]["search_count_all"] == 5
    assert out["d2"]["search_count_searchbar"] == 3
    # null search_counts ⇒ zero row preserved (E4), not dropped
    assert out["d3"]["search_count_all"] == 0


def test_run_clients_daily_rollup(main_summary):
    out = {r["client_id"]: r for r in run_clients_daily(main_summary).collect()}
    c1 = out["c1"]
    assert c1["activity_date"] == "2017-01-01"
    assert c1["pings_aggregated_by_this_row"] == 2
    assert c1["active_ticks_sum"] == 720
    assert c1["active_hours_sum"] == 1.0  # 720 ticks * 5s / 3600
    assert c1["search_count_all_sum"] == 9
    assert c1["country"] == "DE"  # deterministic first_by
    assert out["c2"]["search_count_all_sum"] == 0


def test_search_aggregates_classifier(spark):
    rows = [
        ("s1", None, "sap"),
        ("s2", "urlbar", "sap"),
        ("s3", "in-content:sap:google", "tagged-sap"),
        ("s4", "in-content:sap-follow-on:google", "tagged-follow-on"),
        ("s5", "in-content:organic:none", "organic"),
        ("s6", "follow-on:x", "tagged-follow-on"),
        ("s7", "ad-click:google", "ad-click"),
        ("s8", "weird-source", "unknown"),
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], ["id", "source"]
    )
    out = {r["id"]: r["type"] for r in add_derived_columns(df).collect()}
    assert out == {r[0]: r[2] for r in rows}


def test_explode_search_counts_with_ad_maps(spark):
    df = spark.createDataFrame(
        [
            (
                "c1",
                "20170101",
                [{"engine": "google", "source": "urlbar", "count": 4}],
                {"google": 2},
                None,
            )
        ],
        """client_id string, submission_date_s3 string,
           search_counts array<struct<engine:string,source:string,count:bigint>>,
           scalar_parent_browser_search_ad_clicks map<string,bigint>,
           scalar_parent_browser_search_with_ads map<string,bigint>""",
    )
    out = explode_search_counts(df)
    rows = {(r["source"], r["count"]) for r in out.collect()}
    assert ("urlbar", 4) in rows
    assert ("ad-click:google", 2) in rows  # map exploded via map_entries


def test_search_aggregates_pivot(spark):
    df = spark.createDataFrame(
        [
            (
                "c1",
                "20170101",
                [
                    {"engine": "google", "source": "urlbar", "count": 4},
                    {"engine": "google", "source": "in-content:organic:none", "count": 7},
                ],
            )
        ],
        """client_id string, submission_date_s3 string,
           search_counts array<struct<engine:string,source:string,count:bigint>>""",
    )
    out = run_search_aggregates(df).collect()
    by_src = {r["source"]: r for r in out}
    assert by_src["urlbar"]["sap"] == 4
    assert by_src["in-content:organic:none"]["organic"] == 7


def test_missing_ad_click_columns_tolerated(spark):
    # schema drift: ad-click columns entirely absent (ensure_columns path)
    df = spark.createDataFrame(
        [("c1", "20170101", [{"engine": "g", "source": "urlbar", "count": 1}])],
        """client_id string, submission_date_s3 string,
           search_counts array<struct<engine:string,source:string,count:bigint>>""",
    )
    assert explode_search_counts(df).count() == 1


def test_sync_bookmark_lateral_view(spark):
    rows = [
        {
            "app_build_id": "b1",
            "app_version": "54",
            "app_display_version": "54.0",
            "app_channel": "release",
            "uid": "u1",
            "device_id": "dev1",
            "when": 1000,
            "submission_date_s3": "20170101",
            "failure_reason": None,
            "engines": [
                {
                    "name": "bookmarks",
                    "status": "ok",
                    "validation": {
                        "checked": 10,
                        "problems": [{"name": "orphans", "count": 3}],
                    },
                },
                {"name": "history", "status": "ok", "validation": None},
            ],
        },
        {
            "app_build_id": "b1",
            "app_version": "54",
            "app_display_version": "54.0",
            "app_channel": "release",
            "uid": "u2",
            "device_id": "dev2",
            "when": 2000,
            "submission_date_s3": "20170101",
            "failure_reason": None,
            "engines": [
                {"name": "bookmarks", "status": "ok",
                 "validation": {"checked": 5, "problems": []}},
            ],
        },
    ]
    schema = """
        app_build_id string, app_version string, app_display_version string,
        app_channel string, uid string, device_id string, when long,
        submission_date_s3 string, failure_reason struct<name:string>,
        engines array<struct<name:string, status:string,
            validation:struct<checked:long,
                problems:array<struct<name:string,count:long>>>>>
    """
    df = spark.createDataFrame(rows, schema)
    problems, totals = run_bookmark_validation(spark, df)
    p = problems.collect()
    # history engine filtered out; OUTER explode keeps the no-problems row
    assert {r["engine_name"] for r in p} == {"bookmarks"}
    assert {r["problem_name"] for r in p} == {"orphans", None}
    tot = totals.first()
    assert tot["distinct_uids"] == 2
    assert tot["total_bookmark_validations"] == 2
    assert tot["total_problems"] == 3


def test_coinstall_graph(spark):
    addons = lambda *ids: [
        {
            "addon_id": i,
            "is_system": False,
            "app_disabled": False,
            "user_disabled": False,
            "foreign_install": False,
            "type": "extension",
            "signed_state": 2,
        }
        for i in ids
    ]
    schema = """active_addons array<struct<addon_id:string,is_system:boolean,
        app_disabled:boolean,user_disabled:boolean,foreign_install:boolean,
        type:string,signed_state:long>>"""
    df = spark.createDataFrame(
        [(addons("a", "b"),), (addons("a", "b", "c"),)], schema
    )
    out = {r["addon"]: r["coinstalls"] for r in run_coinstall_graph(df).collect()}
    a = [(c["coinstall"], c["n"]) for c in out["a"]]
    assert a == [("b", 2), ("c", 1)]  # sorted desc by count


def test_clients_daily_schema_drift(spark):
    # every optional column absent: job must still run with typed nulls
    tiny = spark.createDataFrame(
        [("c1", "d1", "20170101", "2017-01-01 10:00")],
        """client_id string, document_id string, submission_date_s3 string,
           subsession_start_date string""",
    )
    r = run_clients_daily(tiny).first()
    assert r["activity_date"] == "2017-01-01"
    assert r["search_count_all_sum"] == 0
    assert r["country"] is None


def test_full_clients_daily_catalog_size_and_families(spark):
    """Catalog-shrink guard: the round-5 full transcription of
    fields.py:35-213 must stay complete — ~100 aggregate expressions
    across every family, and the generated oracle must name every
    output alias."""
    from python_mozetl_spark.jobs.clients_daily import (
        FIRST_FIELDS,
        MAX_FIELDS,
        MEAN_FIELDS,
        SUM_FIELDS,
        clients_daily_oracle_sql,
        full_agg_spec,
    )

    spec = full_agg_spec()
    n_aggs = len(spec.aggs) + len(spec.extra)
    assert n_aggs >= 100, n_aggs
    assert len(SUM_FIELDS) >= 40 and len(FIRST_FIELDS) >= 40
    assert len(MEAN_FIELDS) == 6 and len(MAX_FIELDS) == 3
    sql = clients_daily_oracle_sql("/tmp/x.parquet")
    for alias in ["pings_aggregated_by_this_row", "active_hours_sum",
                  "sessions_started_on_this_day", "profile_age_in_days",
                  "geo_subdivision2", "search_count_alias_sum",
                  "scalar_parent_browser_engagement_unique_domains_count_mean"]:
        assert alias in sql, alias
    # key parameterization (experiments_daily reuse)
    sql3 = clients_daily_oracle_sql(
        "/tmp/x.parquet", keys=("experiment_id", "client_id", "activity_date")
    )
    assert "PARTITION BY experiment_id, client_id, activity_date" in sql3
