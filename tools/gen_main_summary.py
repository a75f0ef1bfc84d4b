"""Generate the committed main_summary fixture parquet.

Deterministic (seeded) synthetic main_summary pings shaped like
FIXTURES.md §1 / the reference's test conftest
(tests/test_search_aggregates.py:108-158, main_summary.v4 subset) —
the input the clients_daily flagship rollup consumes.  Parquet (not
NDJSON) so Spark and DuckDB read IDENTICAL types with zero schema
strings on either side.

Edge cases planted on purpose:

- null / empty / corrupt (count=-5) / unknown-source search_counts;
- '??' and NULL country, NULL city/geo_subdivision (the conditional
  geo firsts, fields.py:56-76);
- one document_id duplicated across two submission dates (exercises
  countDistinct == pings_aggregated_by_this_row);
- per-field NULL injection on sum/mean columns (sum skips nulls);
- multi-day clients, multi-ping days, subsession_counter=1 vs >1.

Run: python tools/gen_main_summary.py  → fixtures/main_summary.parquet
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "main_summary.parquet")

SOURCES = ["searchbar", "urlbar", "abouthome", "newtab", "contextmenu",
           "system", "activitystream", "webextension", "alias"]
ENGINES = ["google", "ddg", "bing", "yandex"]
COUNTRIES = ["DE", "US", "FR", "??", None, "BR", "IN", "GB"]
CITIES = ["Berlin", "Portland", None, "Paris", "Recife", None]
LOCALES = ["de", "en-US", "fr", "pt-BR", None]
OSES = ["Windows_NT", "Darwin", "Linux"]
CHANNELS = ["release", "beta", "nightly", "esr"]
DAYS = ["2017-01-01", "2017-01-02", "2017-01-03", "2017-01-05"]

SUM_COLS = [
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
]
MEAN_COLS = [
    "active_addons_count", "first_paint", "places_bookmarks_count",
    "places_pages_count", "session_restored",
    "scalar_parent_browser_engagement_unique_domains_count",
]
MAX_COLS = [
    "scalar_parent_browser_engagement_max_concurrent_tab_count",
    "scalar_parent_browser_engagement_max_concurrent_window_count",
]
STR_FIRST_COLS = {
    "app_build_id": ["20170101000000", "20170202000000"],
    "app_display_version": ["54.0.1", "55.0"],
    "app_name": ["Firefox"],
    "app_version": ["54.0.1", "55.0"],
    "default_search_engine": ENGINES,
    "default_search_engine_data_load_path": ["jar:[app]/omni.ja!browser/google.xml", None],
    "default_search_engine_data_name": ["Google", "DuckDuckGo", None],
    "default_search_engine_data_origin": ["default", "verified", None],
    "default_search_engine_data_submission_url": ["https://www.google.com/search", None],
    "distribution_id": [None, None, "mint-001"],
    "env_build_arch": ["x86-64", "aarch64"],
    "env_build_id": ["20170101000000"],
    "env_build_version": ["54.0.1"],
    "flash_version": [None, "25.0.0.127"],
    "normalized_channel": CHANNELS,
    "scalar_parent_aushelper_websense_reg_version": [None, None, "8.3"],
    "scalar_parent_services_sync_fxa_verification_method": [None, "email"],
    "search_cohort": [None, None, "acohort"],
    "vendor": ["Mozilla"],
    "active_experiment_branch": [None, "control", "variant"],
    "active_experiment_id": [None, "exp-aurora-1"],
}
LONG_FIRST_COLS = {
    "install_year": (2014, 2017),
    "memory_mb": (2048, 16384),
    "os_service_pack_major": (0, 2),
    "os_service_pack_minor": (0, 1),
    "timezone_offset": (-480, 120),
    "windows_build_number": (7601, 15063),
    "windows_ubr": (0, 1000),
}
BOOL_FIRST_COLS = [
    "addon_compatibility_check_enabled", "blocklist_enabled", "e10s_enabled",
    "is_default_browser", "is_wow64", "sync_configured", "telemetry_enabled",
    "scalar_parent_telemetry_os_shutting_down",
]

#: (addon_id, type, signed_state, is_system) — covers every indicator
#: branch of addon_aggregates + the coinstall validity predicate
ADDON_POOL = [
    ("uBlock0@raymondhill.net", "extension", 2, False),
    ("tree-style-tab@example.org", "extension", 2, False),
    ("darkreader@example.net", "extension", 2, False),
    ("vimium@example.io", "extension", 2, False),
    ("screenshots@mozilla.org", "extension", 2, True),   # %mozilla% excluded
    ("study1@shield.mozilla.org", "extension", 2, False),  # shield
    ("helper@cliqz.com", "extension", 2, False),         # %cliqz% excluded
    ("compact-theme@example.com", "theme", 2, False),    # not an extension
    ("legacy-bar@example.com", "extension", 0, False),   # unsigned
    ("sysmon@example.com", "extension", 2, True),        # system addon
]


def gen_rows() -> list[dict]:
    rng = random.Random(20250813)
    rows: list[dict] = []
    doc_serial = 0
    for ci in range(60):
        client = f"client-{ci:03d}"
        n_days = rng.choice([1, 1, 2, 2, 3, 4])
        for day in rng.sample(DAYS, n_days):
            for ping in range(rng.choice([1, 1, 2, 2, 3, 6])):
                doc_serial += 1
                doc = f"doc-{doc_serial:05d}"
                # submission may lag activity by 0-2 days
                sub = day.replace("-", "")
                if rng.random() < 0.3:
                    sub = f"201701{min(int(sub[-2:]) + rng.choice([1, 2]), 28):02d}"
                r: dict = {
                    "client_id": client,
                    "document_id": doc,
                    "sample_id": str(ci % 100),
                    "submission_date_s3": sub,
                    "subsession_start_date": f"{day} {rng.randrange(24):02d}:00",
                    "subsession_counter": rng.choice([1, 1, 1, 2, 3]),
                    "subsession_length": rng.randrange(0, 7200),
                    "active_ticks": rng.randrange(0, 3600),
                    "total_time": rng.randrange(0, 9000),
                    "profile_creation_date": (
                        None if rng.random() < 0.05 else rng.randrange(15000, 17150)
                    ),
                    "country": rng.choice(COUNTRIES),
                    "city": rng.choice(CITIES),
                    "geo_subdivision1": rng.choice([None, None, "BE", "OR"]),
                    "geo_subdivision2": rng.choice([None, None, None, "X1"]),
                    "locale": rng.choice(LOCALES),
                    "os": rng.choice(OSES),
                    "os_version": rng.choice(["10.0", "6.1", "4.4"]),
                    "channel": rng.choice(CHANNELS),
                }
                for c in SUM_COLS:
                    r[c] = None if rng.random() < 0.08 else rng.randrange(0, 7)
                for c in MEAN_COLS:
                    r[c] = None if rng.random() < 0.10 else rng.randrange(0, 120)
                for c in MAX_COLS:
                    r[c] = None if rng.random() < 0.10 else rng.randrange(1, 40)
                for c, vals in STR_FIRST_COLS.items():
                    r[c] = rng.choice(vals)
                for c, (lo, hi) in LONG_FIRST_COLS.items():
                    r[c] = None if rng.random() < 0.15 else rng.randrange(lo, hi)
                for c in BOOL_FIRST_COLS:
                    r[c] = rng.choice([True, False, None])
                # active_addons: independent per-ping RNG so adding this
                # column did NOT perturb the draw sequence of the other
                # columns (the committed fixture's other values are stable)
                rng_a = random.Random(doc_serial * 7919)
                addons = []
                for aid, typ, signed, system in rng_a.sample(ADDON_POOL,
                                                             rng_a.randrange(0, 5)):
                    addons.append({
                        "addon_id": aid,
                        "blocklisted": rng_a.choice([False, False, None]),
                        "name": aid.split("@")[0],
                        "user_disabled": rng_a.choice([False, False, True, None]),
                        "app_disabled": rng_a.choice([False, False, True, None]),
                        "version": f"{rng_a.randrange(1, 9)}.0",
                        "scope": 1,
                        "type": typ,
                        "foreign_install": rng_a.choice([False, False, True, None]),
                        "has_binary_components": False,
                        "install_day": (None if rng_a.random() < 0.1
                                        else rng_a.randrange(15000, 17100)),
                        "update_day": rng_a.randrange(16000, 17150),
                        "signed_state": signed,
                        "is_system": system,
                        "is_web_extension": rng_a.choice([True, False, None]),
                        "multiprocess_compatible": rng_a.choice([True, False]),
                    })
                r["active_addons"] = addons if addons or rng_a.random() < 0.8 else None
                # search_counts: null / empty / valid / corrupt / unknown-source
                shape = rng.random()
                if shape < 0.15:
                    r["search_counts"] = None
                elif shape < 0.22:
                    r["search_counts"] = []
                else:
                    sc = []
                    for _ in range(rng.randrange(1, 4)):
                        src = rng.choice(SOURCES + ["in-content:sap:x", None])
                        cnt = rng.choice([-5, None] + [1, 2, 3, 4, 8])
                        sc.append(
                            {"engine": rng.choice(ENGINES), "source": src, "count": cnt}
                        )
                    r["search_counts"] = sc
                rows.append(r)
    # duplicate one document_id under a later submission date: the
    # countDistinct ping count must not double-count it
    dup = dict(rows[3])
    dup["submission_date_s3"] = "20170128"
    rows.append(dup)
    return rows


def schema() -> pa.schema:
    fields = [
        ("client_id", pa.string()), ("document_id", pa.string()),
        ("sample_id", pa.string()), ("submission_date_s3", pa.string()),
        ("subsession_start_date", pa.string()),
        ("subsession_counter", pa.int64()), ("subsession_length", pa.int64()),
        ("active_ticks", pa.int64()), ("total_time", pa.int64()),
        ("profile_creation_date", pa.int64()),
        ("country", pa.string()), ("city", pa.string()),
        ("geo_subdivision1", pa.string()), ("geo_subdivision2", pa.string()),
        ("locale", pa.string()), ("os", pa.string()), ("os_version", pa.string()),
        ("channel", pa.string()),
        ("search_counts", pa.list_(pa.struct([
            ("engine", pa.string()), ("source", pa.string()), ("count", pa.int64()),
        ]))),
        ("active_addons", pa.list_(pa.struct([
            ("addon_id", pa.string()), ("blocklisted", pa.bool_()),
            ("name", pa.string()), ("user_disabled", pa.bool_()),
            ("app_disabled", pa.bool_()), ("version", pa.string()),
            ("scope", pa.int64()), ("type", pa.string()),
            ("foreign_install", pa.bool_()),
            ("has_binary_components", pa.bool_()),
            ("install_day", pa.int64()), ("update_day", pa.int64()),
            ("signed_state", pa.int64()), ("is_system", pa.bool_()),
            ("is_web_extension", pa.bool_()),
            ("multiprocess_compatible", pa.bool_()),
        ]))),
    ]
    fields += [(c, pa.int64()) for c in SUM_COLS + MEAN_COLS + MAX_COLS]
    fields += [(c, pa.string()) for c in STR_FIRST_COLS]
    fields += [(c, pa.int64()) for c in LONG_FIRST_COLS]
    fields += [(c, pa.bool_()) for c in BOOL_FIRST_COLS]
    return pa.schema(fields)


def main() -> None:
    rows = gen_rows()
    sch = schema()
    table = pa.Table.from_pylist(rows, schema=sch)
    pq.write_table(table, os.path.abspath(OUT))
    print(f"wrote {table.num_rows} rows x {len(sch)} cols to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
