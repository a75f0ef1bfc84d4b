"""Round-9 regression tests.

ADVICE r08 items: NULL-text parity through the span-dedup helper,
the Mann-Whitney degenerate-pool oracle guard, and the mg-audit
temp-dir cleanup; plus the round's task pins (minhash one-shot size
gate, SemDeDup auto-k grading, amowhitelist job, streaming oracle
rows).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


# ----------------------------------------------------------------------
# ADVICE r08 #1: NULL text must flow through the span-dedup pair as a
# zero-token doc on BOTH engines (the helper coalesces tokens to an
# empty array; the oracles coalesce text to '').
# ----------------------------------------------------------------------

def _span_fixture(spark):
    boiler = " ".join(f"b{i}" for i in range(10))
    return spark.createDataFrame(
        [
            (1, boiler + " unique one tail"),
            (2, boiler + " other words here"),
            (3, None),
            (4, "short doc"),
        ],
        "doc_id int, text string",
    )


def test_span_coverage_null_text(spark):
    from python_mozetl_spark.ext.dedup import duplicated_span_coverage

    rows = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_coverage(
            _span_fixture(spark), "doc_id", "text", n=8
        ).collect()
    }
    assert set(rows) == {1, 2, 3, 4}  # NULL-text doc not dropped
    assert rows[3] == {
        "doc_id": 3,
        "n_toks": 0,
        "dup_grams": 0,
        "covered_toks": 0,
        "dup_frac": 0.0,
    }
    assert rows[1]["dup_grams"] > 0  # the shared boilerplate is seen


def test_span_cut_null_text(spark):
    from python_mozetl_spark.ext.dedup import cut_duplicated_spans

    rows = {
        r["doc_id"]: r.asDict()
        for r in cut_duplicated_spans(
            _span_fixture(spark), "doc_id", "text", n=8
        ).collect()
    }
    assert rows[3] == {
        "doc_id": 3,
        "n_toks": 0,
        "kept_toks": 0,
        "kept_text": "",
    }
    # contract with the coverage operator holds for every doc
    from python_mozetl_spark.ext.dedup import duplicated_span_coverage

    cov = {
        r["doc_id"]: r["covered_toks"]
        for r in duplicated_span_coverage(
            _span_fixture(spark), "doc_id", "text", n=8
        ).collect()
    }
    for did, r in rows.items():
        assert cov[did] == r["n_toks"] - r["kept_toks"]


def test_span_oracles_null_text_parity():
    """The doc_span_cut / doc_dup_span_coverage DuckDB oracles agree
    with the Spark semantics on NULL text: a zero-token doc, never a
    NULL-propagated row."""
    import duckdb

    from python_mozetl_spark.plans.queries import REGISTRY

    con = duckdb.connect()
    boiler = " ".join(f"b{i}" for i in range(10))
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        f"(1, '{boiler} unique one tail'), "
        f"(2, '{boiler} other words here'), "
        "(3, NULL), (4, 'short doc')) t(doc_id, text)"
    )
    cov = con.execute(REGISTRY["doc_dup_span_coverage"].oracle).fetchdf()
    cut = con.execute(REGISTRY["doc_span_cut"].oracle).fetchdf()
    crow = cov[cov.doc_id == 3].iloc[0]
    assert (crow.n_toks, crow.dup_grams, crow.covered_toks) == (0, 0, 0)
    krow = cut[cut.doc_id == 3].iloc[0]
    assert (krow.n_toks, krow.kept_toks, krow.kept_text) == (0, 0, "")


# ----------------------------------------------------------------------
# ADVICE r08 #2: degenerate (all-tied) value pools give sigma2 <= 0 —
# both the Spark operator and the DuckDB oracle must emit NULL z.
# ----------------------------------------------------------------------

def test_mannwhitney_degenerate_parity(spark):
    import duckdb

    from python_mozetl_spark.operators.metrics import mannwhitney_drift
    from python_mozetl_spark.plans.queries import REGISTRY

    df = spark.createDataFrame(
        [("a", 7.0), ("a", 7.0), ("b", 7.0), ("b", 7.0)],
        "event_type string, value double",
    )
    got = {
        r["event_type"]: r.asDict()
        for r in mannwhitney_drift(df, "event_type", "value").collect()
    }
    assert got["a"]["z_score"] is None
    assert got["b"]["z_score"] is None

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        "('a', 7.0), ('a', 7.0), ('b', 7.0), ('b', 7.0)"
        ") t(event_type, value)"
    )
    odf = con.execute(REGISTRY["event_value_mannwhitney"].oracle).fetchdf()
    assert odf["z_score"].isna().all()
    # u_stat still defined and equal on both sides
    ou = dict(zip(odf.event_type, odf.u_stat))
    for g in ("a", "b"):
        assert got[g]["u_stat"] == pytest.approx(ou[g])


# ----------------------------------------------------------------------
# ADVICE r08 #3: side-effectful builds are flagged, and the mg audit
# cleans its pid-scoped temp root after materializing.
# ----------------------------------------------------------------------

def test_side_effect_queries_flagged():
    from python_mozetl_spark.plans.queries import REGISTRY

    flagged = {n for n, q in REGISTRY.items() if q.side_effect}
    assert {
        "stream_mg_bound_audit",
        "stream_histogram_quantiles",
        "stream_cm_counters",
    } <= flagged
    # every side-effect query is a streaming-run query by construction
    for n in flagged:
        assert n.startswith("stream_")


def test_mg_audit_cleans_temp_root(spark):
    import glob
    import os
    import tempfile

    from python_mozetl_spark.plans.queries import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    out = REGISTRY["stream_mg_bound_audit"].build(spark, sf_dir)
    assert out.count() >= 1
    leftovers = glob.glob(
        os.path.join(
            tempfile.gettempdir(),
            f"python_mozetl_spark_mg_audit_{os.getpid()}_*",
        )
    )
    assert leftovers == []


# ----------------------------------------------------------------------
# Task 7: the minhash one-shot localCheckpoint path is size-gated —
# past the envelope the caller must pass a persisted signature table.
# ----------------------------------------------------------------------

def _minhash_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base + " tail"),
            (3, "completely different words in this document body"),
        ],
        "doc_id int, text string",
    )


def test_minhash_one_shot_gate_raises(spark, tmp_path):
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs

    # the gate measures source-file bytes, so the oversized input
    # must be a file scan (in-memory relations have no files and pass
    # through ungated)
    path = str(tmp_path / "docs.parquet")
    _minhash_docs(spark).write.parquet(path)
    df = spark.read.parquet(path)
    with pytest.raises(ValueError, match="persist"):
        minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=16, bands=8,
            one_shot_max_bytes=1,
        ).collect()


def test_minhash_persisted_signatures_bypass_gate_and_match(spark, tmp_path):
    from python_mozetl_spark.ext.dedup import (
        minhash_lsh_pairs,
        minhash_signature_table,
    )

    df = _minhash_docs(spark)
    one_shot = sorted(
        r.asDict()
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=16, bands=8
        ).collect()
    )
    sig_path = str(tmp_path / "sigs.parquet")
    minhash_signature_table(
        df, "doc_id", "text", num_hashes=16
    ).write.parquet(sig_path)
    # a 1-byte budget would trip the one-shot path; the persisted
    # signatures path never consults it
    persisted = sorted(
        r.asDict()
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=16, bands=8,
            signatures=spark.read.parquet(sig_path),
            one_shot_max_bytes=1,
        ).collect()
    )
    assert persisted == one_shot and len(one_shot) >= 1


# ----------------------------------------------------------------------
# Task 6: AMO whitelist accumulators as one DataFrame pass + the two
# previously-missing CLI dispatches (taar_amowhitelist, taar_ensemble).
# ----------------------------------------------------------------------

def _amo_dump():
    webext = {"files": [{"is_webextension": True}]}
    legacy = {"files": [{"is_webextension": False}]}
    return {
        "good@a": {  # passes everything, also featured
            "is_featured": True,
            "ratings": {"average": 4.5},
            "first_create_date": "2020-01-01",
            "current_version": webext,
        },
        "lowrate@a": {  # rating below the bar
            "is_featured": False,
            "ratings": {"average": 2.0},
            "first_create_date": "2020-01-01",
            "current_version": webext,
        },
        "young@a": {  # created inside the min-age window
            "is_featured": True,
            "ratings": {"average": 5.0},
            "first_create_date": "2024-05-20",
            "current_version": webext,
        },
        "legacy@a": {  # not a webextension
            "is_featured": False,
            "ratings": {"average": 5.0},
            "first_create_date": "2020-01-01",
            "current_version": legacy,
        },
        "nofiles@a": {  # current version has no files
            "is_featured": False,
            "ratings": {"average": 5.0},
            "first_create_date": "2020-01-01",
            "current_version": {"files": []},
        },
        "pioneer-opt-in@mozilla.org": {  # explicitly excluded
            "is_featured": False,
            "ratings": {"average": 5.0},
            "first_create_date": "2020-01-01",
            "current_version": webext,
        },
        "nodate@a": {  # missing create date: dropped, not a crash
            "is_featured": False,
            "ratings": {"average": 5.0},
            "first_create_date": None,
            "current_version": webext,
        },
    }


def test_amo_whitelist_accumulators(spark):
    import datetime as dt

    from python_mozetl_spark.jobs.amo_whitelist import run_amo_whitelist

    wl, feat, featwl = run_amo_whitelist(
        spark, _amo_dump(), as_of=dt.date(2024, 6, 1)
    )
    assert set(wl) == {"good@a"}
    assert set(feat) == {"good@a", "young@a"}  # featured ignores criteria
    assert set(featwl) == {"good@a"}
    assert wl["good@a"]["ratings"]["average"] == 4.5  # full record kept


def test_amo_whitelist_min_age_boundary(spark):
    import datetime as dt

    from python_mozetl_spark.jobs.amo_whitelist import run_amo_whitelist

    dump = _amo_dump()
    # exactly min_age days old on the anchor -> create_date == cutoff
    # -> kept (reference: create_date <= latest_create_date)
    dump["edge@a"] = {
        "is_featured": False,
        "ratings": {"average": 3.0},
        "first_create_date": "2024-04-02",
        "current_version": {"files": [{"is_webextension": True}]},
    }
    wl, _, _ = run_amo_whitelist(spark, dump, as_of=dt.date(2024, 6, 1))
    assert "edge@a" in wl


def test_cli_lists_taar_commands():
    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point

    out = CliRunner().invoke(entry_point, ["--help"]).output
    assert "taar_amowhitelist" in out
    assert "taar_ensemble" in out


def test_cli_amowhitelist_roundtrip(spark, tmp_path):
    import json

    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point

    dump_path = tmp_path / "extended_addons_database.json"
    dump_path.write_text(json.dumps(_amo_dump()))
    out_dir = tmp_path / "out"
    res = CliRunner().invoke(
        entry_point,
        [
            "taar_amowhitelist",
            "--input", str(dump_path),
            "--output", str(out_dir),
            "--as-of", "2024-06-01",
            "--master", "local[2]",
        ],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    wl = json.loads((out_dir / "whitelist_addons_database.json").read_text())
    featwl = json.loads((out_dir / "featured_whitelist_addons.json").read_text())
    assert set(wl) == {"good@a"} and set(featwl) == {"good@a"}


# ----------------------------------------------------------------------
# Task 3: embedding_semantic_dedup_hi now grades the scale-safe auto-k
# configuration; the fixed-k=8 operating point (scale-UNSAFE — the x10
# curve's OOM contrast row) lives here as a pytest instead.
# ----------------------------------------------------------------------

def test_semantic_dedup_fixed_k8_matches_oracle(spark):
    import os

    import duckdb

    from python_mozetl_spark.ext.similarity import semantic_dedup
    from python_mozetl_spark.plans.queries import _lloyd_oracle, _semdedup_tail, t

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    got = sorted(
        (r["vec_id"], r["cluster"], r["kept"])
        for r in semantic_dedup(
            t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
            k=8, iters=2, threshold=0.95,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.execute(
            _lloyd_oracle(k=8, iters=2, tail=_semdedup_tail(0.95))
        ).fetchall()
    )
    assert got == want


def test_semantic_dedup_hi_registry_row_is_auto_k():
    from python_mozetl_spark.plans.queries import REGISTRY

    q = REGISTRY["embedding_semantic_dedup_hi"]
    assert "kk AS" in q.oracle  # k derived from COUNT, not a literal
    assert "ceil(count(*) / 250.0)" in q.oracle


# ----------------------------------------------------------------------
# Task 4: the tfidf candidate-volume observable shares the pair
# query's candidate construction, and prefix x prefix loses nothing.
# ----------------------------------------------------------------------

def test_tfidf_candidate_stats_bounds_output(spark):
    from python_mozetl_spark.ext.search import (
        tfidf_candidate_stats,
        tfidf_cosine_pairs,
    )

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta"),
            (3, "alpha beta gamma epsilon"),
            (4, "zeta eta theta iota"),
            (5, "completely different words here"),
        ],
        "doc_id int, text string",
    )
    stats = tfidf_candidate_stats(df, "doc_id", "text", threshold=0.8).collect()[0]
    pairs = tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.8).collect()
    assert stats["n_docs"] == 5
    # candidates are a superset of emitted pairs (100% recall) and a
    # subset of all pairs (the filter prunes something on this corpus)
    assert len(pairs) <= stats["n_candidates"] <= 10
    # the exact duplicate pair must be found
    assert any(r["id_a"] == 1 and r["id_b"] == 2 for r in pairs)


# ----------------------------------------------------------------------
# BHR hang-profile assembly (jobs/bhr_profile.py): the last declared
# reference-logic gap — interned struct-of-arrays output, prune
# collapse, per-date accumulation — closed and pinned.
# ----------------------------------------------------------------------

def _hang_rows():
    hot = [("main", "xul.pdb"), ("paint", "xul.pdb")]
    cold = [("main", "xul.pdb"), ("rare_leaf", "ntdll.pdb")]
    return [
        {"thread": "Gecko", "build_date": "20240115", "platform": "Windows",
         "stack": hot, "hang_ms": 990.0, "hang_count": 9.0},
        {"thread": "Gecko", "build_date": "20240116", "platform": "Windows",
         "stack": hot, "hang_ms": 500.0, "hang_count": 4.0},
        {"thread": "Gecko", "build_date": "20240115", "platform": "Windows",
         "stack": cold, "hang_ms": 5.0, "hang_count": 1.0},
        {"thread": "Gecko_Child", "build_date": "20240115", "platform": "Windows",
         "stack": hot, "hang_ms": 100.0, "hang_count": 1.0},
        {"thread": "Gecko", "build_date": "20240115", "platform": "Windows",
         "stack": hot, "hang_ms": 0.0, "hang_count": 1.0},  # dropped
    ]


def _walk_stack(thread, stack_id):
    """Reconstruct (func, lib) pairs root-first from the rendered
    prefix-chain tables."""
    st, ft, sa = thread["stackTable"], thread["funcTable"], thread["stringArray"]
    out = []
    while stack_id not in (None, 0):
        func = ft["name"][st["func"][stack_id]]
        lib_id = ft["lib"][st["func"][stack_id]]
        lib = None if lib_id is None else thread["libs"][lib_id]["debugName"]
        out.append((sa[func], lib))
        stack_id = st["prefix"][stack_id]
    return out[::-1]


def test_bhr_profile_interning_roundtrip():
    from python_mozetl_spark.jobs.bhr_profile import assemble_hang_profile

    prof = assemble_hang_profile(
        _hang_rows(), usage_hours_by_date={"20240115": 12.5}, uuid="u-1"
    )
    assert prof["usageHoursByDate"] == {"20240115": 12.5}
    assert prof["uuid"] == "u-1"
    threads = {t["name"]: t for t in prof["threads"]}
    assert set(threads) == {"Gecko", "Gecko_Child"}
    assert threads["Gecko"]["processType"] == "default"
    assert threads["Gecko_Child"]["processType"] == "tab"

    g = threads["Gecko"]
    # struct-of-arrays contract
    for tbl in ("funcTable", "stackTable", "annotationsTable", "sampleTable"):
        assert g[tbl]["length"] == len(next(iter(
            v for k, v in g[tbl].items() if k != "length"
        )))
    # the hot stack reconstructs exactly; the cold subtree collapsed
    # to "(other)" under its hot parent (5/1495 < 1% of root)
    stacks = {
        tuple(_walk_stack(g, g["sampleTable"]["stack"][i]))
        for i in range(g["sampleTable"]["length"])
    }
    assert (("main", "xul.pdb"), ("paint", "xul.pdb")) in stacks
    assert (("main", "xul.pdb"), ("(other)", "ntdll.pdb")) in stacks
    assert not any("rare_leaf" in str(s) for s in stacks)
    # per-date accumulation: two dates for the hot sample
    dates = {d["date"]: d for d in g["dates"]}
    assert set(dates) == {"20240115", "20240116"}
    hot_i = g["sampleTable"]["stack"].index(
        next(iter(
            i for i in range(g["stackTable"]["length"])
            if tuple(_walk_stack(g, i)) == (("main", "xul.pdb"), ("paint", "xul.pdb"))
        ))
    )
    assert dates["20240115"]["sampleHangMs"][hot_i] == 990.0
    assert dates["20240115"]["sampleHangCount"][hot_i] == 9.0
    assert dates["20240116"]["sampleHangMs"][hot_i] == 500.0
    # every string interned exactly once
    assert len(set(g["stringArray"])) == len(g["stringArray"])


def test_bhr_profile_minimal_and_split_modes():
    from python_mozetl_spark.jobs.bhr_profile import assemble_hang_profile

    split = assemble_hang_profile(_hang_rows(), split_threads=True)
    assert isinstance(split, list)
    assert {p["name"] for p in split} == {"Gecko", "Gecko_Child"}
    assert all(len(p["threads"]) == 1 for p in split)

    minimal = assemble_hang_profile(_hang_rows(), minimal_sample_table=True)
    threads = {t["name"]: t for t in minimal["threads"]}
    g = threads["Gecko"]
    assert set(g["sampleTable"]) == {"stack", "platform", "length"}
    # minimal mode emits the REAL platform column (reference renderer
    # mislabels runnable indices as platform — documented divergence)
    assert all(
        g["stringArray"][sid] == "Windows" for sid in g["sampleTable"]["platform"]
    )
    assert all("sampleHangMs" not in d for d in g["dates"])
    # Gecko_Child samples skipped in minimal mode
    assert threads["Gecko_Child"]["sampleTable"]["length"] == 0


def test_bhr_profile_from_spark_aggregates(spark):
    from python_mozetl_spark.jobs.bhr import run_bhr_collection
    from python_mozetl_spark.jobs.bhr_profile import (
        assemble_hang_profile,
        profile_rows_from_aggregates,
    )
    from tests.test_jobs3 import _pings

    agg = run_bhr_collection(_pings(spark), sample_fraction=1.0)
    rows = profile_rows_from_aggregates(
        agg, symbol_map={"xul.pdb\\ABC": "XulMain"}
    )
    prof = assemble_hang_profile(rows, uuid="e2e")
    g = next(t for t in prof["threads"] if t["name"] == "Gecko")
    assert "XulMain" in g["stringArray"]       # symbolicated frame
    assert "0x20" in g["stringArray"]          # unsymbolicated offset
    assert any(lib["debugName"] == "xul.pdb" for lib in g["libs"])
    assert g["sampleTable"]["length"] >= 2


def test_temperature_mix_budget_and_smoothing(spark):
    """α<1 temperature mixing: rare sources upsampled, dominant ones
    cut, total doc-epochs ≈ budget, and the materialized multiset is
    retry-stable (md5-keyed, not rand())."""
    from python_mozetl_spark.ext.mixing import temperature_mix

    # 900 'big' docs vs 100 'small' — α=0.5 pushes the mix toward
    # 3:1 (sqrt(9):sqrt(1)) from the raw 9:1
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mix(df, "source", "doc_id", alpha=0.5)
    got = [(r["doc_id"], r["epoch"]) for r in out.collect()]
    n_big = sum(1 for i, _ in got if i < 900)
    n_small = sum(1 for i, _ in got if i >= 900)
    # exact expectations: w_big = 1000*(30/40)/900 = 0.833̄ (one
    # fractional epoch), w_small = 1000*(10/40)/100 = 2.5 (two full
    # epochs + half)
    assert n_small >= 200  # the two full epochs
    assert 200 + 20 <= n_small <= 200 + 80  # + ~50% fractional epoch
    assert 900 * 0.75 <= n_big <= 900 * 0.92  # ~83% keep, hash spread
    assert abs((n_big + n_small) - 1000) <= 60  # budget ≈ Σn_i
    again = [(r["doc_id"], r["epoch"]) for r in
             temperature_mix(df, "source", "doc_id", alpha=0.5).collect()]
    assert sorted(got) == sorted(again)

    # α=1 is a no-op mix: every weight exactly 1.0 — identity corpus
    ident = temperature_mix(df, "source", "doc_id", alpha=1.0)
    assert sorted(r["doc_id"] for r in ident.collect()) == list(range(1000))

    # explicit budget halves the corpus
    half = temperature_mix(df, "source", "doc_id", alpha=1.0, budget=500.0)
    assert 400 <= half.count() <= 600


def test_winnow_prefix_pairs_match_brute_force(spark):
    """Prefix-filtered winnow pairing == brute force on a corpus built
    to stress the filter: a boilerplate 8-gram block shared by EVERY
    doc (the hot bucket the prefix drops from the join), copy families
    with overlap straddling the threshold, and sub-threshold docs."""
    import hashlib
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    boiler = "the quick brown fox jumps over the lazy dog " * 8
    rows = []
    # family A: 3 near-identical long docs (well over 50 shared fps)
    base = boiler + "".join(f"alpha{i:04d} " for i in range(120))
    rows += [(0, base), (1, base + "tail zero"), (2, "head one " + base)]
    # family B: 2 docs sharing ONLY the boilerplate (+ distinct bodies)
    rows += [
        (3, boiler + "".join(f"beta{i:04d} " for i in range(120))),
        (4, boiler + "".join(f"gam{i:05d} " for i in range(120))),
    ]
    # short doc under the 50-fingerprint floor
    rows += [(5, "tiny doc")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def fps(text, k=8, window=4):
        hs = [
            int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:15], 16)
            for i in range(len(text) - k + 1)
        ]
        if not hs:
            return set()
        if len(hs) < window:
            return {min(hs)}
        return {min(hs[j:j + window]) for j in range(len(hs) - window + 1)}

    sets = {i: fps(t) for i, t in rows}
    want = sorted(
        (a, b, len(sets[a] & sets[b]))
        for a in sets for b in sets
        if a < b and len(sets[a]) >= 50 and len(sets[b]) >= 50
        and len(sets[a] & sets[b]) >= 50
    )
    got = sorted(
        map(tuple, winnow_copy_pairs(df, "doc_id", "text").collect())
    )
    assert got == want
    assert {(a, b) for a, b, _ in want} >= {(0, 1), (0, 2), (1, 2)}
    # the fixture really exercises the hot bucket: docs 3 and 4 share
    # boilerplate fingerprints (a nonempty sub-threshold overlap) yet
    # must not pair
    assert 0 < len(sets[3] & sets[4]) < 50
    assert (3, 4) not in {(a, b) for a, b, _ in got}


def test_unimax_mix_waterfilling(spark):
    """UniMax: uniform budget with per-source epoch cap — the
    waterfilling level redistributes a capped source's surplus."""
    from python_mozetl_spark.ext.mixing import unimax_mix

    # a=600, b=300, c=100 docs; cap=2, budget=Σn=1000.
    # caps asc: c=200, b=600, a=1200 → level u=(1000-200)/2=400:
    # c capped at 2.0 epochs (exactly 200 rows), b gets w=400/300,
    # a gets w=400/600.
    rows = ([(i, "a") for i in range(600)]
            + [(i + 600, "b") for i in range(300)]
            + [(i + 900, "c") for i in range(100)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = [(r["doc_id"], r["epoch"]) for r in
           unimax_mix(df, "source", "doc_id", epoch_cap=2.0).collect()]
    n_a = sum(1 for i, _ in out if i < 600)
    n_b = sum(1 for i, _ in out if 600 <= i < 900)
    n_c = sum(1 for i, _ in out if i >= 900)
    assert n_c == 200                      # exactly two full epochs
    assert 300 + 60 <= n_b <= 300 + 140    # 1 full + ~1/3 fractional
    assert 340 <= n_a <= 460               # ~2/3 fractional epoch
    assert abs((n_a + n_b + n_c) - 1000) <= 60
    # retry-stable (md5-keyed)
    again = [(r["doc_id"], r["epoch"]) for r in
             unimax_mix(df, "source", "doc_id", epoch_cap=2.0).collect()]
    assert sorted(out) == sorted(again)

    # budget beyond Σ caps: every source capped, spend falls short —
    # deterministic full replication, no fractional epochs
    full = unimax_mix(df, "source", "doc_id", epoch_cap=2.0, budget=5000.0)
    assert full.count() == 2000

    # cap=1, default budget: identity corpus (w == 1.0 exactly)
    ident = unimax_mix(df, "source", "doc_id", epoch_cap=1.0)
    assert sorted(r["doc_id"] for r in ident.collect()) == list(range(1000))

    # degenerate inputs raise instead of silently emitting the full
    # capped corpus (a negative budget finds no feasible segment and
    # would otherwise fall into the all-capped branch)
    with pytest.raises(ValueError, match="budget"):
        unimax_mix(df, "source", "doc_id", epoch_cap=2.0, budget=-1.0)
    with pytest.raises(ValueError, match="epoch_cap"):
        unimax_mix(df, "source", "doc_id", epoch_cap=0.0)
