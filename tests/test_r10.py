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
