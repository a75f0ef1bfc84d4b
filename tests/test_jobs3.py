"""BHR, graphics dashboard, and profile-export job parity tests."""

import json

import pytest
from pyspark.sql import functions as F


PING_SCHEMA = (
    "build_id string, os_name string, "
    "modules array<struct<debug_name:string,breakpad_id:string>>, "
    "hangs array<struct<thread:string,duration:long,"
    "stack:array<struct<module_index:int,offset:string>>>>"
)


def _pings(spark):
    mods = [{"debug_name": "xul.pdb", "breakpad_id": "ABC"},
            {"debug_name": "ntdll.pdb", "breakpad_id": "DEF"}]
    rows = [
        ("20240115093000", "Windows_NT", mods, [
            {"thread": "Gecko", "duration": 500,
             "stack": [{"module_index": 0, "offset": "0x10"},
                       {"module_index": 1, "offset": "0x20"}]},
            {"thread": "Gecko", "duration": 700,
             "stack": [{"module_index": 0, "offset": "0x10"},
                       {"module_index": 1, "offset": "0x20"}]},
            {"thread": "Gecko", "duration": 50,  # below lower bound
             "stack": [{"module_index": 0, "offset": "0x10"}]},
            {"thread": "Other", "duration": 900,  # wrong thread
             "stack": [{"module_index": 0, "offset": "0x10"}]},
            {"thread": "Gecko", "duration": 400,
             "stack": [{"module_index": 99, "offset": "0x30"}]},  # bad index
        ]),
    ]
    return spark.createDataFrame(rows, PING_SCHEMA)


def test_bhr_hang_aggregates(spark):
    from python_mozetl_spark.jobs.bhr import run_bhr_collection

    out = run_bhr_collection(_pings(spark), sample_fraction=1.0).collect()
    by_stack = {tuple((f["module"], f["offset"]) for f in r["stack"]): r
                for r in out}
    key = (("xul.pdb\\ABC", "0x10"), ("ntdll.pdb\\DEF", "0x20"))
    assert by_stack[key]["total_hang_ms"] == 1200.0
    assert by_stack[key]["hang_count"] == 2
    assert by_stack[key]["build_date"] == "20240115"
    # out-of-range module index resolves to null module, hang still kept
    bad = (((None, "0x30")),)
    assert ((None, "0x30"),) in by_stack
    assert by_stack[((None, "0x30"),)]["hang_count"] == 1
    del bad


def test_bhr_symbolicate(spark):
    from python_mozetl_spark.jobs.bhr import (
        explode_hangs,
        hang_aggregates,
        resolve_stacks,
        symbolicate,
    )

    agg = hang_aggregates(resolve_stacks(explode_hangs(_pings(spark))))
    symbols = spark.createDataFrame(
        [("xul.pdb\\ABC", "nsThread::Run")], "module string, symbol string"
    )
    got = {r["module"]: r["resolved_symbol"]
           for r in symbolicate(agg, symbols).collect()}
    assert got["xul.pdb\\ABC"] == "nsThread::Run"
    assert got["ntdll.pdb\\DEF"] == "ntdll.pdb\\DEF"  # unresolved keeps raw


GFX_SCHEMA = (
    "os_name string, os_version string, os_service_pack_major int, "
    "build_version string, "
    "adapters array<struct<vendorID:string,deviceID:string,"
    "driverVersion:string,driverVendor:string>>"
)


def test_graphics_validate_and_pyramid(spark):
    from python_mozetl_spark.jobs.graphics_dashboard import (
        run_graphics_dashboard,
        validate_pings,
    )

    adapter = [{"vendorID": "0x8086", "deviceID": "0x1916",
                "driverVersion": "20.1", "driverVendor": None}]
    intel_osc = [{"vendorID": "Intel Open Source Technology Center",
                  "deviceID": "0x3e92", "driverVersion": None,
                  "driverVendor": "mesa"}]
    rows = [
        ("Windows_NT", "10.0", 1, "109.0.1", adapter),
        ("Windows_NT", "10.0", 1, "109.0.1", adapter),
        ("Linux", "5.10", None, "110.0", intel_osc),
        ("Darwin", "22.1", None, "110.0", adapter),
        ("Windows_NT", "10.0", 1, None, adapter),     # no build → invalid
        ("Windows_NT", "10.0", 1, "109.0.1", None),   # no adapters → invalid
    ]
    df = spark.createDataFrame(rows, GFX_SCHEMA)
    valid = validate_pings(df)
    got = {r["OS"]: r for r in valid.collect()}
    assert set(got) == {"Windows-10.0.1", "Linux", "Darwin-22.1"}
    assert got["Windows-10.0.1"]["FxVersion"] == "109"
    assert got["Linux"]["OSVersion"] is None
    # Intel OSC vendor merged to 0x8086; device key is vendor/device
    assert got["Linux"]["vendorID"] == "0x8086"
    assert got["Linux"]["deviceID"] == "0x8086/0x3e92"
    # driverVersion null → Unknown
    assert got["Linux"]["driverVersion"] == "0x8086/Unknown"

    shares = run_graphics_dashboard(df, dims=("OSName",))["OSName"]
    by = {r["OSName"]: r["share"] for r in shares.collect()}
    assert by["Windows"] == pytest.approx(0.5)
    assert by["Linux"] == pytest.approx(0.25)


def test_top_n_groups_collapse(spark):
    from python_mozetl_spark.operators import top_n_groups

    df = spark.createDataFrame(
        [("a", 50), ("b", 30), ("c", 10), ("d", 5), ("e", 5)], ["g", "n"]
    )
    out = {r["g"]: r["n"] for r in
           top_n_groups(df, "g", F.col("n"), top_n=2).collect()}
    assert out == {"a": 50, "b": 30, "Other": 20}


def test_profile_export_latest_and_json(spark):
    from python_mozetl_spark.jobs.profile_export import export_profiles

    rows = [
        ("c1", "2024-01-02", 100, "de"),
        ("c1", "2024-01-05", 200, "de"),   # latest → exported
        ("c2", "not-a-date", 300, "en"),   # invalid date → dropped
        ("", "2024-01-01", 400, "fr"),     # empty client → dropped
    ]
    df = spark.createDataFrame(
        rows,
        "client_id string, subsession_start_date string, "
        "subsession_length long, locale string",
    )
    out = export_profiles(df).collect()
    assert len(out) == 1
    payload = json.loads(out[0]["json_payload"])
    assert out[0]["client_id"] == "c1"
    assert payload["subsession_start_date"] == "2024-01-05"
    assert payload["subsession_length"] == 200


def test_weekly_trend_sunday_aligned_and_incremental(spark):
    from datetime import datetime

    from python_mozetl_spark.jobs.graphics_trends import (
        run_weekly_trends,
        weekly_trend,
    )

    rows = [
        # 2024-01-07 is a Sunday
        ("2024-01-07 00:00:01", "click"),
        ("2024-01-10 12:00:00", "click"),
        ("2024-01-13 23:59:59", "view"),   # same Sun-Sat week
        ("2024-01-14 00:00:01", "click"),  # next week (Sunday again)
        ("2024-01-06 10:00:00", "click"),  # previous week (Saturday)
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    weeks = weekly_trend(df).collect()
    starts = {str(r["week_start"]) for r in weeks}
    assert starts == {
        "2023-12-31 00:00:00", "2024-01-07 00:00:00", "2024-01-14 00:00:00"
    }  # all Sundays
    wk1 = {r["event_type"]: r["total"] for r in weeks
           if str(r["week_start"]) == "2024-01-07 00:00:00"}
    assert wk1 == {"click": 2, "view": 1}

    # incremental: first run as of mid-January drops the incomplete week
    cache = run_weekly_trends(df, None, datetime(2024, 1, 16))
    assert {str(r["week_start"]) for r in cache.collect()} == {
        "2023-12-31 00:00:00", "2024-01-07 00:00:00"
    }
    # second run later: completed week merges in; re-aggregated weeks
    # REPLACE, not duplicate
    cache2 = run_weekly_trends(df, cache, datetime(2024, 1, 22))
    rows2 = cache2.collect()
    assert {str(r["week_start"]) for r in rows2} == {
        "2023-12-31 00:00:00", "2024-01-07 00:00:00", "2024-01-14 00:00:00"
    }
    assert len(rows2) == len({(str(r["week_start"]), r["event_type"])
                              for r in rows2})


def test_shield_privacy_prefs_union(spark):
    from python_mozetl_spark.jobs.shield import run_privacy_prefs

    rows = [
        ("c1", "20240101", "pref-flip-privacy",
         {"name": "toggle", "value": "on"}, None),
        ("c1", "20240101", "pref-flip-privacy", None, "enrolled"),
        ("c2", "20240101", "other-study",
         {"name": "toggle", "value": "off"}, None),  # wrong study
    ]
    df = spark.createDataFrame(
        rows,
        "client_id string, submission_date string, study_name string, "
        "event struct<name:string,value:string>, state string",
    )
    out = run_privacy_prefs(df).collect()
    assert len(out) == 2
    by_type = {r["ping_type"]: r for r in out}
    assert by_type["event"]["event"] == "toggle"
    assert by_type["state"]["state"] == "enrolled"


def test_clean_corpus_statuses(spark):
    from python_mozetl_spark.jobs.dedup_pipeline import clean_corpus

    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again today"),
        (1, "  The   quick brown fox jumps over the lazy dog again and again today "),
        (2, "the quick brown fox jumps over the lazy dog again and again tonight"),
        (3, "completely different text about spark query engines and shuffles"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["status"], r["canonical_id"])
           for r in clean_corpus(docs, threshold=0.5).collect()}
    assert got[0] == ("kept", 0)
    assert got[1] == ("exact_dup", 0)   # ws/case canonicalization
    assert got[2] == ("near_dup", 0)    # one-word edit, cluster rep 0
    assert got[3] == ("kept", 3)
