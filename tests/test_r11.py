"""Round-11 tests: the hash_fn production seam (VERDICT r10 task 2)
and the three ADVICE fixes (c-prefix clamp, AMO guid double-decode,
funnel NULL-ts feed).

The seam contract under test: ``hash_fn="md5"`` (graded default)
stays bit-identical across Spark/DuckDB; ``hash_fn="xxhash64"`` is
the JVM-native production path, and on a separated corpus (true
copies share long blocks, non-copies share nothing) BOTH paths emit
the same pair set — the winnowing detection guarantee and the
exact-Jaccard verify are hash-agnostic.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


# --------------------------------------------------------------------
# functions/hashing.py: gram_hash_int64 / base_hash_array seam
# --------------------------------------------------------------------


def test_gram_hash_seam_md5_matches_legacy_and_xxh64_is_native(spark):
    from python_mozetl_spark.functions import hashing as H

    df = spark.createDataFrame([("abc",), ("winnow",)], "s string")
    got = df.select(
        H.md5_int64(F.col("s")).alias("legacy"),
        H.gram_hash_int64(F.col("s"), "md5").alias("seam_md5"),
        H.gram_hash_int64(F.col("s"), "xxhash64").alias("seam_xx"),
        F.xxhash64(F.col("s")).alias("native_xx"),
    ).collect()
    for r in got:
        assert r.legacy == r.seam_md5
        assert r.seam_xx == r.native_xx


def test_gram_hash_seam_rejects_unknown_fn():
    from python_mozetl_spark.functions import hashing as H

    with pytest.raises(ValueError, match="hash_fn"):
        H.gram_hash_int64(F.col("s"), "sha1")
    with pytest.raises(ValueError, match="hash_fn"):
        H.base_hash_array(F.col("s"), "sha1")


def test_base_hash_array_xxh64_stays_in_mersenne_range(spark):
    from python_mozetl_spark.functions import hashing as H

    df = spark.createDataFrame(
        [(["a b c", "c d e", "x y z"],)], "sh array<string>"
    )
    row = df.select(
        H.base_hash_array(F.col("sh"), "xxhash64").alias("h")
    ).collect()[0]
    # pmod keeps the permutation-family inputs in [0, P), like md5
    assert all(0 <= v < H.MINHASH_P for v in row.h)


# --------------------------------------------------------------------
# winnow: production hash path emits the same pair set on a
# separated corpus; borderline n_shared counts may differ (documented)
# --------------------------------------------------------------------


@pytest.fixture(scope="module")
def winnow_corpus(spark):
    rng = random.Random(1101)
    rows = []
    doc_id = 0
    # 6 copy pairs: each shares a 600-char block, unique 200-char flanks
    for i in range(6):
        block = _rand_text(rng, 600)
        rows.append((doc_id, _rand_text(rng, 200) + block))
        rows.append((doc_id + 1, block + _rand_text(rng, 200)))
        doc_id += 2
    # 8 unrelated docs
    for _ in range(8):
        rows.append((doc_id, _rand_text(rng, 800)))
        doc_id += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_winnow_hash_seam_pair_set_equality(winnow_corpus):
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    def pairs(hash_fn):
        df = winnow_copy_pairs(
            winnow_corpus, "doc_id", "text",
            k=8, window=4, min_shared=40, hash_fn=hash_fn,
        )
        return sorted(
            (r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()
        )

    md5_pairs = pairs("md5")
    # exactly the 6 planted copy pairs, nothing from the unrelated tail
    assert md5_pairs == [(2 * i, 2 * i + 1) for i in range(6)]
    assert pairs("xxhash64") == md5_pairs


def test_winnow_fingerprints_xxh64_detects_shared_block(spark):
    # the winnowing guarantee is hash-agnostic: a shared substring of
    # length >= window + k - 1 yields >= 1 shared fingerprint
    from python_mozetl_spark.ext.dedup import winnow_fingerprints

    rng = random.Random(7)
    shared = _rand_text(rng, 11)  # k=8, window=4 -> guarantee length
    df = spark.createDataFrame(
        [(0, _rand_text(rng, 50) + shared),
         (1, shared + _rand_text(rng, 50))],
        "doc_id bigint, text string",
    )
    fp = winnow_fingerprints(df, "doc_id", "text", k=8, window=4,
                             hash_fn="xxhash64")
    inter = (
        fp.groupBy("fp").agg(F.countDistinct("doc_id").alias("n"))
        .where(F.col("n") == 2).count()
    )
    assert inter >= 1


# --------------------------------------------------------------------
# ADVICE r10: min_prefix_hits must be clamped to min_shared — a
# min_shared=1 caller keeps pairs whose exact overlap is 1, instead
# of silently requiring c=2.. shared prefix buckets
# --------------------------------------------------------------------


def test_winnow_min_prefix_hits_clamped_to_min_shared(spark):
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    rng = random.Random(42)
    shared = _rand_text(rng, 11)  # one guaranteed shared fingerprint
    df = spark.createDataFrame(
        [(0, _rand_text(rng, 60) + shared + _rand_text(rng, 60)),
         (1, _rand_text(rng, 60) + shared + _rand_text(rng, 60)),
         (2, _rand_text(rng, 130))],
        "doc_id bigint, text string",
    )

    def low_overlap_pairs(c):
        return sorted(
            (r.id_a, r.id_b)
            for r in winnow_copy_pairs(
                df, "doc_id", "text", k=8, window=4,
                min_shared=1, min_prefix_hits=c,
            ).collect()
        )

    base = low_overlap_pairs(1)
    assert (0, 1) in base
    # unclamped, c=2/c=5 would demand 2/5 distinct shared prefix
    # buckets and drop the overlap-1 pair; the clamp keeps recall
    assert low_overlap_pairs(2) == base
    assert low_overlap_pairs(5) == base


# --------------------------------------------------------------------
# minhash: candidate generation varies with hash_fn, the exact-verify
# output does not (same fixture, same pair set)
# --------------------------------------------------------------------


def test_minhash_hash_seam_pair_set_equality(spark):
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs

    rng = random.Random(2026)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    doc_id = 0
    for i in range(5):
        words = [rng.choice(vocab) for _ in range(40)]
        near = list(words)
        near[-1] = rng.choice(vocab)  # one-word edit: Jaccard ~ 0.85+
        rows.append((doc_id, " ".join(words)))
        rows.append((doc_id + 1, " ".join(near)))
        doc_id += 2
    for _ in range(6):
        rows.append((doc_id, " ".join(rng.choice(vocab) for _ in range(40))))
        doc_id += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def pairs(hash_fn):
        out = minhash_lsh_pairs(df, "doc_id", "text", threshold=0.8,
                                hash_fn=hash_fn)
        return sorted(
            (r.id_a, r.id_b, r.jaccard) for r in out.collect()
        )

    md5_pairs = pairs("md5")
    assert len(md5_pairs) >= 5  # the planted near-dupes all survive
    assert pairs("xxhash64") == md5_pairs


# --------------------------------------------------------------------
# ADVICE r10: AMO guid with a literal percent-escape must not be
# double-decoded (last_page_urls holds the RAW guid)
# --------------------------------------------------------------------


def test_amo_guid_with_literal_percent_not_double_decoded():
    from python_mozetl_spark.sources.amo_catalog import build_addon_catalog

    guid = "a%40x@y"  # quote() -> a%2540x%40y; unquote(raw) corrupts
    s = "https://amo.test/search/?q=1"
    vf = "https://amo.test/addons/{guid}/versions/"
    payloads = {
        s: {"page_count": 1, "results": []},
        s + "&page=1": {"page_count": 1, "results": [
            {"guid": guid, "name": {"en": "P"}},
        ]},
        vf.format(guid="a%2540x%40y"): {"page_count": 1, "results": [
            {"files": [{"created": "2022-02-02"}]},
        ]},
    }
    catalog = build_addon_catalog(
        lambda url: payloads[url], search_uri=s, versions_uri_fmt=vf
    )
    assert catalog[guid]["first_create_date"] == "2022-02-02"


# --------------------------------------------------------------------
# Hardware dashboard end-to-end (VERDICT r10 task 6): the reference's
# hardware_dashboard.py chain — report generation → weekly JSON
# artifact append → check_output alert — driven through the repo's
# three pieces in one test: hardware_report CLI, write_json_artifact,
# report_check CLI spooling an .eml on a planted >30% share change.
# --------------------------------------------------------------------


def test_hardware_dashboard_end_to_end_alert(spark, tmp_path):
    import email
    import json

    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point
    from python_mozetl_spark.sinks.writers import write_json_artifact

    runner = CliRunner()
    artifact = tmp_path / "hwsurvey-weekly.json"
    records = []
    # week 1: 10 win / 10 mac; week 2: 16 win / 4 mac — win's share
    # moves 0.5 -> 0.8 (+60%), mac 0.5 -> 0.2 (-60%): both clear the
    # 30% check, and mac's n=4 clears the collapse threshold (3)
    weeks = [
        ("2024-01-07", ["win"] * 10 + ["mac"] * 10),
        ("2024-01-14", ["win"] * 16 + ["mac"] * 4),
    ]
    for date, oses in weeks:
        src = str(tmp_path / f"clients_{date}")
        spark.createDataFrame(
            [(f"c{i}", v) for i, v in enumerate(oses)],
            "client_id string, os string",
        ).write.parquet(src)
        out = str(tmp_path / f"report_{date}")
        res = runner.invoke(
            entry_point,
            ["hardware_report", "--input", src, "--output", out,
             "--dimension", "os", "--master", "local[2]"],
            catch_exceptions=False,
        )
        assert res.exit_code == 0, res.output
        shares = {
            f"os_{r['os']}": r["share"]
            for r in spark.read.parquet(f"{out}/os").collect()
        }
        # artifact append — the reference publishes one record per week
        records.append({"date": date, **shares})
        write_json_artifact(records, str(artifact))

    assert {r["date"] for r in json.loads(artifact.read_text())} == {
        "2024-01-07", "2024-01-14",
    }

    spool = tmp_path / "spool"
    res = runner.invoke(
        entry_point,
        ["report_check", "--input", str(artifact), "--spool", str(spool),
         "--min-change", "0.3"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    eml_path = res.output.strip().splitlines()[-1]
    msg = email.message_from_string(open(eml_path).read())
    body = msg.get_payload(0).get_payload()
    # both planted movers render with the reference's share formatting
    assert "os_win: Last week = 50.00%, This week = 80.00%" in body
    assert "os_mac: Last week = 50.00%, This week = 20.00%" in body
    assert msg["Subject"] == "Report Validation Checks"


def test_hardware_dashboard_quiet_week_sends_nothing(spark, tmp_path):
    # same chain, no planted change: the check stays silent (the
    # reference only emails when a metric moves)
    import json

    from click.testing import CliRunner

    from python_mozetl_spark.cli import entry_point

    artifact = tmp_path / "hwsurvey-weekly.json"
    artifact.write_text(json.dumps([
        {"date": "2024-01-07", "os_win": 0.5, "os_mac": 0.5},
        {"date": "2024-01-14", "os_win": 0.52, "os_mac": 0.48},
    ]))
    spool = tmp_path / "spool"
    res = CliRunner().invoke(
        entry_point,
        ["report_check", "--input", str(artifact), "--spool", str(spool),
         "--min-change", "0.3"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    assert "nothing sent" in res.output
    assert not spool.exists() or not list(spool.iterdir())


# --------------------------------------------------------------------
# the hash seam threads coherently through the whole MinHash family:
# incremental ingestion and cross-corpus decontamination on xxhash64
# produce the same verified pair sets as md5 (exact-Jaccard verify)
# --------------------------------------------------------------------


def test_incremental_and_cross_corpus_seam_consistency(spark):
    from python_mozetl_spark.ext.dedup import (
        cross_corpus_lsh_filter,
        incremental_lsh_pairs,
        minhash_lsh_pairs,
        minhash_signature_table,
    )

    rng = random.Random(7331)
    vocab = [f"w{i}" for i in range(200)]

    def doc(words):
        return " ".join(words)

    base_words = [[rng.choice(vocab) for _ in range(30)] for _ in range(6)]
    base_rows = [(i, doc(w)) for i, w in enumerate(base_words)]
    # new batch: one near-dup of base doc 0, one unrelated
    near = list(base_words[0])
    near[-1] = rng.choice(vocab)
    new_rows = [(100, doc(near)),
                (101, doc([rng.choice(vocab) for _ in range(30)]))]

    for fn in ("md5", "xxhash64"):
        base_df = spark.createDataFrame(base_rows, "doc_id bigint, text string")
        new_df = spark.createDataFrame(new_rows, "doc_id bigint, text string")
        sigs = minhash_signature_table(base_df, "doc_id", "text", hash_fn=fn)
        pairs, _ = incremental_lsh_pairs(
            sigs, new_df, "doc_id", "text", threshold=0.8, hash_fn=fn
        )
        got = sorted((r.id_a, r.id_b) for r in pairs.collect())
        # full-corpus truth restricted to pairs touching the increment
        full = minhash_lsh_pairs(
            base_df.unionByName(new_df), "doc_id", "text",
            threshold=0.8, hash_fn=fn,
        )
        exp = sorted(
            (r.id_a, r.id_b)
            for r in full.collect()
            if r.id_a >= 100 or r.id_b >= 100
        )
        assert got == exp and (0, 100) in got, fn

        contaminated = cross_corpus_lsh_filter(
            base_df, new_df, "doc_id", "text", threshold=0.8, hash_fn=fn
        )
        assert [r.doc_id for r in contaminated.collect()] == [0], fn


# ----------------------------------------------------------------------
# sf0.1-sweep cross-engine-parity fixes: the full sweep at 10x the
# certification SF caught three engine splits invisible at sf0.01 —
# a decimal-tie rounding split (doc_quality), summation-order drift
# crossing a rounding boundary (pricing_metrics_long/pricing_summary),
# and DuckDB's rounding BIGINT cast vs Spark's truncating
# unix_timestamp on a RANGE-frame bound (user_trailing_7d_value).
# These pin the fixed behaviors on crafted boundary fixtures.
# ----------------------------------------------------------------------

def _run_oracle(sql: str, tables: dict[str, str]) -> "pd.DataFrame":
    import duckdb

    con = duckdb.connect()
    for name, path in tables.items():
        # Spark writes a part-file directory; glob it for DuckDB
        con.execute(
            f"CREATE VIEW {name} AS SELECT * "
            f"FROM read_parquet('{path}/*.parquet')"
        )
    return con.execute(sql).df()


def test_doc_quality_exact_tie_rounds_identically(spark, tmp_path):
    """A doc engineered onto the 6dp rounding tie (score = 0.6771875
    exactly: n=40 tokens, 2 stopwords, 189 token chars) must round the
    same way on both engines — the integer half-up formulation gives
    0.677188 on each, where double round() split them (the measured
    sf0.1 failure, doc 3582)."""
    from python_mozetl_spark.plans.queries import REGISTRY

    toks = ["the", "and"] + ["abcde"] * 31 + ["wxyz"] * 7
    assert len(toks) == 40 and sum(len(t) for t in toks) == 189
    doc = [(1, " ".join(toks), "en", "web")]
    df = spark.createDataFrame(doc, "doc_id int, text string, lang string, source string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    q = REGISTRY["doc_quality"]
    got = q.build(spark, str(tmp_path)).collect()[0]
    assert got["n_tokens"] == 40
    assert got["stopword_ratio"] == 0.05
    assert got["mean_token_len"] == 4.725
    assert got["quality_score"] == 0.677188  # half-up at the exact tie

    ora = _run_oracle(
        q.oracle, {"documents": str(tmp_path / "documents.parquet")}
    ).iloc[0]
    assert float(ora["quality_score"]) == got["quality_score"]
    assert float(ora["stopword_ratio"]) == got["stopword_ratio"]
    assert float(ora["mean_token_len"]) == got["mean_token_len"]


def test_trailing_7d_frame_bound_truncates_fractional_seconds(spark, tmp_path):
    """An event 604800.6 s after another: Spark's unix_timestamp
    TRUNCATES both to seconds (gap 604801 -> outside the frame); the
    oracle must floor() epoch too — DuckDB's bare BIGINT cast ROUNDS
    the .6 up and pulled the event into the frame (the measured sf0.1
    failure, one row in 100k)."""
    import datetime as dt

    from python_mozetl_spark.plans.queries import REGISTRY

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0, 600000)
    t1 = t0 + dt.timedelta(seconds=604800, microseconds=600000)
    rows = [
        (1, 7, "click", t0, 10.0),
        (2, 7, "click", t1, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp_ntz, value double"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    q = REGISTRY["user_trailing_7d_value"]
    got = {r["event_id"]: r for r in q.build(spark, str(tmp_path)).collect()}
    # truncation: floor(t0)=...00, floor(t1)=...01 -> gap 604801 > 604800
    assert got[2]["trail_7d_events"] == 1 and got[2]["trail_7d_value"] == 5.0

    ora = _run_oracle(q.oracle, {"events": str(tmp_path / "events.parquet")})
    ora_by_id = {int(r["event_id"]): r for _, r in ora.iterrows()}
    assert int(ora_by_id[2]["trail_7d_events"]) == 1
    assert float(ora_by_id[2]["trail_7d_value"]) == 5.0


def test_pricing_money_sums_are_order_free(spark, tmp_path):
    """The decimal money sums must be exact regardless of partition
    order: 0.01-granular prices that drift under double summation sum
    to the exact cent total through the decimal path on BOTH engines."""
    from python_mozetl_spark.plans.queries import REGISTRY

    n = 10000
    rows = [
        (i, i % 3, 1, float(1 + (i % 7)), 100.01 + (i % 100) / 100.0,
         0.01 * (i % 5), 0.02, "A" if i % 2 else "R", "F",
         __import__("datetime").datetime(2000, 1, 1 + i % 28))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp_ntz",
    )
    # many small partitions = a summation order no single-threaded
    # engine would use
    df.repartition(37).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    q = REGISTRY["pricing_summary"]
    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in q.build(spark, str(tmp_path)).collect()
    }
    ora = _run_oracle(q.oracle, {"lineitem": str(tmp_path / "lineitem.parquet")})
    for _, r in ora.iterrows():
        g = got[(r["l_returnflag"], r["l_linestatus"])]
        for c in ("sum_base_price", "sum_disc_price", "sum_charge",
                  "avg_price", "avg_disc"):
            assert float(r[c]) == g[c], c
