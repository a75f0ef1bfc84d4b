"""Round-10 verdict tasks: CLI invocation tests for the round-9
dispatch paths (bhr_collection --profile-output, taar_amowhitelist,
taar_ensemble), each writing real output to tmp, and the
profile_winnow stage-chain lockstep pin."""

import json

import pytest

from tests.test_jobs3 import _pings


def test_cli_bhr_profile_output_dispatch(spark, tmp_path):
    """bhr_collection --profile-output end-to-end: pings parquet in,
    aggregates parquet + assembled Gecko profile JSON out, symbol map
    applied through --symbols-json (reference
    bhr_collection.py profile job surface)."""
    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point

    src = str(tmp_path / "pings")
    _pings(spark).write.parquet(src)
    sym_path = tmp_path / "symbols.json"
    sym_path.write_text(json.dumps({"xul.pdb\\ABC": "XulMain"}))
    out_dir, prof_dir = str(tmp_path / "agg"), tmp_path / "profile"
    res = CliRunner().invoke(
        entry_point,
        [
            "bhr_collection",
            "--input", src,
            "--output", out_dir,
            "--profile-output", str(prof_dir),
            "--symbols-json", str(sym_path),
            "--sample-fraction", "1.0",
            "--master", "local[2]",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert spark.read.parquet(out_dir).count() > 0
    prof = json.loads((prof_dir / "hangs_main.json").read_text())
    # documented thread shape: struct-of-arrays tables, consistent
    # lengths, interned strings, the symbolicated frame present
    threads = {t["name"]: t for t in prof["threads"]}
    assert "Gecko" in threads
    g = threads["Gecko"]
    for tbl in ("funcTable", "stackTable", "annotationsTable", "sampleTable"):
        assert g[tbl]["length"] == len(
            next(iter(v for k, v in g[tbl].items() if k != "length"))
        )
    assert "XulMain" in g["stringArray"]
    assert len(set(g["stringArray"])) == len(g["stringArray"])


def test_cli_taar_ensemble_dispatch(spark, tmp_path):
    """taar_ensemble end-to-end: training parquet with per-recommender
    score columns in, ensemble_weight_daily.json artifact out
    (reference taar_ensemble.py:417-499 surface)."""
    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point

    rows = [(float(i % 2), 0.9 if i % 2 else 0.1, 0.5) for i in range(40)]
    src = str(tmp_path / "training")
    spark.createDataFrame(
        rows, "label double, collab double, locale double"
    ).write.parquet(src)
    out_dir = tmp_path / "out"
    res = CliRunner().invoke(
        entry_point,
        [
            "taar_ensemble",
            "--input", src,
            "--output", str(out_dir),
            "--feature-col", "collab",
            "--feature-col", "locale",
            "--k-folds", "2",
            "--master", "local[2]",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    art = json.loads((out_dir / "ensemble_weight_daily.json").read_text())
    w = art["ensemble_weights"]
    assert set(w) == {"collab", "locale"}
    # collab perfectly separates the label; the uninformative constant
    # column cannot carry a larger coefficient
    assert w["collab"] > 0
    assert w["collab"] > abs(w["locale"])


def test_cli_amowhitelist_min_rating_flag(spark, tmp_path):
    """taar_amowhitelist with a raised --min-rating: the 4.5-rated
    addon falls out of the whitelist but stays featured — the flag
    actually reaches the accumulator logic (the r09 test covers the
    default path)."""
    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point
    from tests.test_r09 import _amo_dump

    dump_path = tmp_path / "extended_addons_database.json"
    dump_path.write_text(json.dumps(_amo_dump()))
    out_dir = tmp_path / "out"
    res = CliRunner().invoke(
        entry_point,
        [
            "taar_amowhitelist",
            "--input", str(dump_path),
            "--output", str(out_dir),
            "--min-rating", "4.8",
            "--as-of", "2024-06-01",
            "--master", "local[2]",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    wl = json.loads((out_dir / "whitelist_addons_database.json").read_text())
    featured = json.loads(
        (out_dir / "featured_addons_database.json").read_text()
    )
    assert wl == {}  # good@a's 4.5 no longer clears the bar
    assert set(featured) == {"good@a", "young@a"}  # featured ignores it


def test_profile_winnow_stage_chain_matches_impl(spark):
    """The diagnostics tool's replicated stage chain
    (tools/profile_winnow.py) stays in lockstep with the real
    pipeline (ext/dedup.py:883): its candidate frame must contain
    every output pair of winnow_copy_pairs, and its full-pipeline
    stage IS winnow_copy_pairs."""
    import tools.profile_winnow as pw

    frames = pw._stage_frames(spark, "/root/testdata/sf0.001")
    out_pairs = {
        (r["id_a"], r["id_b"]) for r in frames["s5_full"]().collect()
    }
    assert out_pairs  # fixture genuinely exercises the pair stage
    cand_pairs = {
        (r["id_a"], r["id_b"]) for r in frames["s4_candidates"]().collect()
    }
    assert out_pairs <= cand_pairs
    # stage counts are sane: pruning never grows a frame
    assert frames["s2_pruned"]().count() <= frames["s1_fingerprints"]().count()


# --------------------------------------------------------------------
# K7 closure: the email alert sink (sinks/alerts.py) — reference
# check_output.py semantics + send_ses MIME shape, delivery seam
# injectable, spool-file artifact as the default.
# --------------------------------------------------------------------


def test_most_recent_change_reference_semantics():
    from python_mozetl_spark.sinks.alerts import (
        dated_values_from_artifact,
        most_recent_change,
    )

    data = dated_values_from_artifact(
        [
            {"date": "2024-01-01", "big_move": 0.20, "steady": 0.50,
             "tiny_base": 0.005, "vanishes": 0.30},
            {"date": "2024-01-08", "big_move": 0.30, "steady": 0.51,
             "tiny_base": 0.05, "appears": 0.40},
        ]
    )
    assert set(data) == {20240101, 20240108}
    ch = most_recent_change(data, min_change=0.3, min_value=0.01,
                            missing_val=0.01)
    # 0.20 -> 0.30 = +50%: flagged; steady +2%: not; tiny_base moved
    # 10x but its base is below min_value: not; vanishes reads as
    # missing_val on the new side (-96.7%): flagged; appears has base
    # = missing_val (>= min_value) and +3900%: flagged
    assert set(ch) == {"big_move", "vanishes", "appears"}
    assert ch["big_move"]["change"] == pytest.approx(0.5)
    assert ch["vanishes"]["new_value"] == 0.01
    assert ch["appears"]["old_value"] == 0.01
    # fewer than two snapshots -> nothing to compare
    assert most_recent_change({20240101: {"a": 1.0}}) == {}
    with pytest.raises(ValueError):
        most_recent_change(data, missing_val=0.0)


def test_render_change_report_format_and_order():
    from python_mozetl_spark.sinks.alerts import render_change_report

    body = render_change_report(
        {
            "up": {"change": 0.5, "old_value": 0.2, "new_value": 0.3},
            "down": {"change": -0.4, "old_value": 0.5, "new_value": 0.3},
        }
    )
    # sorted by SIGNED change: the drop renders first (reference
    # _make_report sorts ascending); shares scale to percent
    assert body.splitlines() == [
        "down: Last week = 50.00%, This week = 30.00%",
        "up: Last week = 20.00%, This week = 30.00%",
    ]
    counts = render_change_report(
        {"P1": {"change": 0.5, "old_value": 120, "new_value": 180}},
        scale=1.0,
        unit="",
    )
    assert counts == "P1: Last week = 120.00, This week = 180.00"


def test_alert_email_mime_shape_and_delivery_seam(tmp_path):
    from email import message_from_string

    from python_mozetl_spark.sinks.alerts import (
        build_alert_email,
        deliver_alert,
    )

    att = tmp_path / "report.json"
    att.write_text('{"x": 1}')
    msg = build_alert_email(
        "alerts@localhost", "Checks", "body text", "ops@localhost",
        attachment_path=str(att),
    )
    parsed = message_from_string(msg.as_string())
    assert parsed["Subject"] == "Checks"
    assert parsed["From"] == "alerts@localhost"
    assert parsed["To"] == "ops@localhost"
    parts = list(parsed.walk())
    assert any(p.get_content_type() == "text/plain" for p in parts)
    assert any(p.get_filename() == "report.json" for p in parts)

    # spool path: .eml lands, idempotent for identical content
    p1 = deliver_alert(msg, spool_dir=str(tmp_path / "spool"))
    p2 = deliver_alert(msg, spool_dir=str(tmp_path / "spool"))
    assert p1 == p2 and p1.endswith(".eml")
    assert "body text" in open(p1).read()

    # transport seam: raw string in, reference error contract honored
    seen = []
    out = deliver_alert(msg, transport=lambda raw: seen.append(raw) or "ok")
    assert out == "ok" and "Subject: Checks" in seen[0]
    with pytest.raises(RuntimeError, match="Error sending email"):
        deliver_alert(msg, transport=lambda raw: {"ErrorResponse": 1})
    with pytest.raises(ValueError):
        deliver_alert(msg)


def test_alert_on_change_flags_end_to_end(spark, tmp_path):
    from python_mozetl_spark.operators.metrics import snapshot_change_flags
    from python_mozetl_spark.sinks.alerts import alert_on_change_flags
    from pyspark.sql import functions as F

    rows = [("P1", 2024)] * 2 + [("P1", 2025)] * 5 + [("P2", 2024)] * 4 + [
        ("P2", 2025)
    ] * 4
    df = spark.createDataFrame(rows, "prio string, yr int")
    flags = snapshot_change_flags(
        df, ["prio"], F.col("yr") == 2024, F.col("yr") == 2025, threshold=0.3
    )
    path = alert_on_change_flags(
        flags, ["prio"], "alerts@localhost", "ops@localhost",
        "priority drift", spool_dir=str(tmp_path),
    )
    body = open(path).read()
    assert "P1: Last week = 2.00, This week = 5.00" in body
    assert "P2" not in body  # unchanged priority never renders

    # the reference gate: nothing flagged -> nothing sent
    calm = snapshot_change_flags(
        df.where("prio = 'P2'"), ["prio"],
        F.col("yr") == 2024, F.col("yr") == 2025, threshold=0.3,
    )
    assert alert_on_change_flags(
        calm, ["prio"], "a@localhost", "b@localhost", "calm",
        spool_dir=str(tmp_path),
    ) is None


def test_cli_report_check_dispatch(tmp_path):
    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point

    artifact = tmp_path / "weekly.json"
    artifact.write_text(json.dumps([
        {"date": "2024-01-01", "intel": 0.60, "amd": 0.40},
        {"date": "2024-01-08", "intel": 0.20, "amd": 0.80},
    ]))
    spool = tmp_path / "spool"
    res = CliRunner().invoke(
        entry_point,
        ["report_check", "--input", str(artifact), "--spool", str(spool),
         "--min-change", "0.3"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    eml = res.output.strip().splitlines()[-1]
    body = open(eml).read()
    assert "intel: Last week = 60.00%, This week = 20.00%" in body
    assert "amd: Last week = 40.00%, This week = 80.00%" in body

    # below-threshold artifact: the gate holds, nothing spools
    artifact.write_text(json.dumps([
        {"date": "2024-01-01", "intel": 0.50},
        {"date": "2024-01-08", "intel": 0.52},
    ]))
    res2 = CliRunner().invoke(
        entry_point,
        ["report_check", "--input", str(artifact), "--spool",
         str(tmp_path / "spool2"), "--min-change", "0.3"],
        catch_exceptions=False,
    )
    assert res2.exit_code == 0
    assert "nothing sent" in res2.output


# --------------------------------------------------------------------
# AMO crawler closure: the catalog-assembly logic engine-side
# (sources/amo_catalog.py), the wire call injectable.
# --------------------------------------------------------------------


def _amo_api(flaky_once=None):
    """Dict-backed fake AMO API: 2 search pages (guids a@x, b@x, c@x),
    versions for a (1 page), b (3 pages — last page carries the first
    release), c always failing; optionally one URL that fails ONCE."""
    s = "https://amo.test/search/?q=1"
    vf = "https://amo.test/addons/{guid}/versions/"
    payloads = {
        s: {"page_count": 2, "results": []},
        s + "&page=1": {"page_count": 2, "results": [
            {"guid": "a@x", "name": {"en": "A"}},
            {"guid": "b@x", "name": {"en": "B"}},
        ]},
        s + "&page=2": {"page_count": 2, "results": [
            {"guid": "c@x", "name": {"en": "C"}},
        ]},
        vf.format(guid="a%40x"): {"page_count": 1, "results": [
            {"files": [{"created": "2021-07-07"}]},
            {"files": [{"created": "2020-01-01"}]},
        ]},
        vf.format(guid="b%40x"): {"page_count": 3, "results": []},
        vf.format(guid="b%40x") + "?page=3": {"page_count": 3, "results": [
            {"files": [{"created": "2019-05-05"}]},
        ]},
    }
    calls = {"n": {}, "flaked": False}

    def fetch(url):
        calls["n"][url] = calls["n"].get(url, 0) + 1
        if url == flaky_once and not calls["flaked"]:
            calls["flaked"] = True
            raise OSError("transient")
        if "c%40x" in url:
            raise OSError("always down")
        return payloads[url]

    return s, vf, fetch, calls


def test_build_addon_catalog_crawl_semantics():
    from python_mozetl_spark.sources.amo_catalog import build_addon_catalog

    s, vf, fetch, calls = _amo_api(flaky_once="https://amo.test/search/?q=1&page=2")
    catalog = build_addon_catalog(fetch, search_uri=s, versions_uri_fmt=vf)
    # a: single version page, LAST entry is the first release
    assert catalog["a@x"]["first_create_date"] == "2020-01-01"
    # b: multi-page — the crawl walks to ?page=3 for the date
    assert catalog["b@x"]["first_create_date"] == "2019-05-05"
    # c: version lookup failed (even after the retry pass) -> dropped,
    # the reference's keep-only-dated filter
    assert "c@x" not in catalog
    # the flaky page recovered on the retry-once pass
    assert calls["n"]["https://amo.test/search/?q=1&page=2"] == 2
    # raw search record fields ride through untouched
    assert catalog["a@x"]["name"] == {"en": "A"}


def test_marshal_addon_typed_subset():
    from python_mozetl_spark.sources.amo_catalog import marshal_addon

    rec = {
        "guid": "a@x",
        "weekly_downloads": "1200",
        "ratings": {"average": "4.5", "count": 10},
        "tags": [1, "two"],
        "name": {"en": "A"},
        "categories": {"firefox": ["x", 2]},
        "current_version": {"files": [
            {"id": "7", "is_webextension": True, "platform": "all"},
        ]},
        "first_create_date": "2020-01-01",
        "unlisted_field": "dropped",
    }
    m = marshal_addon(rec)
    assert m["weekly_downloads"] == 1200
    assert m["ratings"] == {"average": 4.5, "count": 10.0}
    assert m["tags"] == ["1", "two"]
    assert m["categories"] == {"firefox": ["x", "2"]}
    f = m["current_version"]["files"][0]
    assert f == {"id": 7, "is_webextension": True, "platform": "all"}
    assert "status" not in f          # absent stays absent (Undefined)
    assert "unlisted_field" not in m  # only declared fields survive
    assert "default_locale" not in m


def test_cli_taar_amodump_dispatch(tmp_path, monkeypatch):
    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point
    from python_mozetl_spark.sources import side_input

    s, vf, fetch, _ = _amo_api()
    monkeypatch.setattr(side_input, "side_input_from_json", fetch)
    out_dir = tmp_path / "amo"
    res = CliRunner().invoke(
        entry_point,
        ["taar_amodump", "--output", str(out_dir), "--date", "20240101",
         "--search-uri", s, "--versions-uri-fmt", vf],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "2 addons" in res.output
    current = json.loads(
        (out_dir / "extended_addons_database.json").read_text()
    )
    dated = json.loads(
        (out_dir / "extended_addons_database.20240101.json").read_text()
    )
    assert current == dated
    assert set(current) == {"a@x", "b@x"}
    assert current["b@x"]["first_create_date"] == "2019-05-05"
