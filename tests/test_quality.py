"""Corpus-quality gates: repetition stats, decontamination, PII
scrubbing, int8 quantization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from python_mozetl_spark.ext.quality import (
    decontaminate,
    ngram_occurrence_stats,
    repetition_stats,
)
from python_mozetl_spark.ext.similarity import brute_force_topk, quantized_topk
from python_mozetl_spark.functions.text import pii_counts, scrub_pii
from python_mozetl_spark.functions.vectors import quantize_int8


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # "a a a a b" → top_token 4/5; bigrams: aa aa aa ab → top 3/4,
            # dup 3/4
            (1, "a a a a b"),
            # all-distinct tokens → top_token 1/6, no repeated bigram
            (2, "u v w x y z"),
            # single token → no bigrams at all
            (3, "solo"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in repetition_stats(df, "doc_id", "text").collect()
    }
    r1 = rows[1]
    assert r1["n_tokens"] == 5
    assert r1["top_token_frac"] == pytest.approx(0.8)
    assert r1["top_bigram_frac"] == pytest.approx(0.75)
    assert r1["dup_bigram_frac"] == pytest.approx(0.75)
    assert r1["keep"] is False
    r2 = rows[2]
    assert r2["top_token_frac"] == pytest.approx(round(1 / 6, 6))
    assert r2["dup_bigram_frac"] == 0.0
    # 1/6 > 0.10 default top-token threshold: still dropped
    assert r2["keep"] is False
    r3 = rows[3]
    assert r3["n_tokens"] == 1
    assert r3["top_bigram_frac"] == 0.0 and r3["dup_bigram_frac"] == 0.0


def test_ngram_occurrence_stats_short_doc_absent(spark):
    df = spark.createDataFrame([(1, "only two"), (2, "x")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           ngram_occurrence_stats(df, "doc_id", "text", 2).collect()}
    assert got[1]["total"] == 1 and got[1]["top"] == 1
    assert 2 not in got  # too short for bigrams → absent by contract


def test_decontaminate_planted_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    train = spark.createDataFrame(
        [
            # shares "quick brown fox jumps" and "brown fox jumps over"
            (1, "a quick brown fox jumps over walls daily"),
            (2, "completely unrelated text with no overlap here at all"),
            # shares exactly one 4-gram ("over the lazy dog")
            (3, "start pad over the lazy dog ends"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["n_shared"]
           for r in decontaminate(train, bench, "doc_id", "text", n=4).collect()}
    assert got == {1: 2, 3: 1}  # doc 2 clean → absent


def test_scrub_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            ("reach me at jo.doe+x@mail.example.org or 415-555-0199 "
             "from 192.168.001.42 thanks",),
            ("no pii here",),
            # an IP glued to punctuation still matches via \b
            ("ips: 10.0.0.1, 10.0.0.2.",),
        ],
        ["text"],
    )
    c = pii_counts("text")
    out = df.select(
        scrub_pii("text").alias("s"),
        c["email"].alias("e"), c["ipv4"].alias("i"), c["phone"].alias("p"),
    ).collect()
    assert out[0]["s"] == (
        "reach me at [EMAIL] or [PHONE] from [IPV4] thanks"
    )
    assert (out[0]["e"], out[0]["i"], out[0]["p"]) == (1, 1, 1)
    assert out[1]["s"] == "no pii here"
    assert (out[1]["e"], out[1]["i"], out[1]["p"]) == (0, 0, 0)
    assert out[2]["s"] == "ips: [IPV4], [IPV4]."
    assert out[2]["i"] == 2


def test_pii_email_not_double_counted_as_phone(spark):
    # digits-only local part would match the phone pattern if the email
    # pass didn't run first
    df = spark.createDataFrame([("mail 415-555-0199@example.com end",)], ["text"])
    c = pii_counts("text")
    r = df.select(scrub_pii("text").alias("s"), c["email"].alias("e"),
                  c["phone"].alias("p")).collect()[0]
    assert r["e"] == 1 and r["p"] == 0
    assert r["s"] == "mail [EMAIL] end"


def test_quantize_int8_range_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5]), (2, [0.0, 0.0, 0.0])], ["id", "v"]
    )
    got = {r["id"]: r["q"] for r in
           df.select("id", quantize_int8(F.col("v")).alias("q")).collect()}
    # scale = 127/2: [63.5→64 HALF_UP, -127, 31.75→32]
    assert got[1] == [64, -127, 32]
    assert got[2] == [0, 0, 0]


def test_unigram_logprob_hand_computed(spark):
    import math

    from python_mozetl_spark.ext.quality import unigram_logprob

    # corpus: a a a b  → P(a)=3/4, P(b)=1/4
    df = spark.createDataFrame([(1, "a a"), (2, "a b")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           unigram_logprob(df, "doc_id", "text").collect()}
    assert got[1]["logprob"] == pytest.approx(round(math.log(0.75), 6))
    assert got[2]["logprob"] == pytest.approx(
        round((math.log(0.75) + math.log(0.25)) / 2, 6)
    )
    assert got[1]["n_tokens"] == 2


def test_sliding_window_chunks_boundaries(spark):
    from python_mozetl_spark.ext.packing import sliding_window_chunks

    toks_120 = " ".join(f"t{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, "a b c"), (2, toks_120), (3, "")], ["doc_id", "text"]
    )
    out = sliding_window_chunks(df, "doc_id", "text", window=64, stride=48)
    rows = sorted(
        out.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"])
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc → one full-coverage chunk
    assert len(by_doc[1]) == 1
    assert by_doc[1][0]["n_chunk_tokens"] == 3
    assert by_doc[1][0]["chunk_text"] == "a b c"
    # 120 tokens, window 64, stride 48 → ceil((120-64)/48)=2 extra → 3 chunks
    assert [r["begin_token"] for r in by_doc[2]] == [0, 48, 96]
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [64, 64, 24]
    assert by_doc[2][1]["chunk_text"].split(" ")[0] == "t48"
    # every token index covered, overlap only between neighbors
    covered = set()
    for r in by_doc[2]:
        covered |= set(range(r["begin_token"], r["begin_token"] + r["n_chunk_tokens"]))
    assert covered == set(range(120))
    # empty doc dropped
    assert 3 not in by_doc


def test_repetition_stats_plan_is_shuffle_free(spark):
    from tests.test_plans import _formatted_plan

    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    plan = _formatted_plan(repetition_stats(df, "doc_id", "text"))
    # per-document metrics: no Exchange, no join — embarrassingly parallel
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_decontaminate_benchmark_side_is_broadcast(spark):
    from tests.test_plans import _formatted_plan

    train = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    bench = spark.createDataFrame([(2, "b c d e f")], ["doc_id", "text"])
    plan = _formatted_plan(decontaminate(train, bench, "doc_id", "text", n=4))
    assert "BroadcastHashJoin" in plan


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from python_mozetl_spark.ext.quality import tfidf_top_terms

    # 2 docs; "rare" only in doc 1 (idf=ln 2), "both" in both (idf=0)
    df = spark.createDataFrame(
        [(1, "rare rare both"), (2, "both other")], ["doc_id", "text"]
    )
    got = {(r["doc_id"], r["rank"]): r for r in
           tfidf_top_terms(df, "doc_id", "text", k=2).collect()}
    assert got[(1, 1)]["term"] == "rare"
    assert got[(1, 1)]["tfidf"] == pytest.approx(round(2 * math.log(2), 6))
    # doc 1 rank 2: "both" with tfidf 0
    assert got[(1, 2)]["term"] == "both" and got[(1, 2)]["tfidf"] == 0.0
    assert got[(2, 1)]["term"] == "other"


def test_quantized_topk_high_recall_vs_exact(spark):
    import random

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.where(F.col("vec_id") < 10)
    exact = brute_force_topk(df, q, k=5).select("query_id", "neighbor_id")
    quant = quantized_topk(df, q, k=5).select("query_id", "neighbor_id")
    n_exact = exact.count()
    overlap = exact.intersect(quant).count()
    assert n_exact == 50
    # int8 quantization should preserve nearly all of the exact top-5
    assert overlap / n_exact >= 0.9


def test_token_entropy_known_values(spark):
    import math

    from python_mozetl_spark.ext.quality import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),      # single token type: H = 0
            (2, "a b"),          # uniform over 2: H = ln 2
            (3, "a a b"),        # H = -(2/3)ln(2/3) - (1/3)ln(1/3)
            (4, ""),             # empty: H = 0, n = 0
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in token_entropy(df, "doc_id", "text").collect()}
    assert got[1]["entropy"] == 0.0 and got[1]["n_tokens"] == 4
    assert got[2]["entropy"] == pytest.approx(round(math.log(2), 6))
    h3 = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert got[3]["entropy"] == pytest.approx(round(h3, 6))
    assert got[4]["entropy"] == 0.0 and got[4]["n_tokens"] == 0


def test_gopher_rules_hand_computed(spark):
    from python_mozetl_spark.ext.quality import gopher_rules

    df = spark.createDataFrame(
        [
            # 5 words, mwl 1.0, one '#' symbol, 'x' alpha-less? all
            # alpha except '#'; stopword 'the' present once
            (1, "the a b c d"),
            # symbols: two '#' and one '...' over 4 words -> 3/4
            (2, "ok# now# then... end"),
            # digits only -> alpha_frac 0
            (3, "123 456"),
            (4, None),
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in gopher_rules(
            df,
            "doc_id",
            "text",
            min_words=2,
            max_words=10,
            min_mean_word_len=1.0,
            max_mean_word_len=10.0,
            max_symbol_ratio=0.5,
            min_alpha_frac=0.5,
            min_stopwords=1,
        ).collect()
    }
    r1 = rows[1]
    assert r1["n_words"] == 5
    assert r1["mean_word_len"] == pytest.approx(7 / 5)
    assert r1["symbol_ratio"] == 0.0
    assert r1["alpha_frac"] == 1.0
    # 'the' and 'a' are both stopwords
    assert r1["n_stopwords"] == 2
    assert r1["keep_flag"] == 1
    r2 = rows[2]
    assert r2["symbol_ratio"] == pytest.approx(0.75)
    assert r2["r_symbols"] == 0 and r2["keep_flag"] == 0
    r3 = rows[3]
    assert r3["alpha_frac"] == 0.0
    assert r3["r_alpha"] == 0 and r3["r_stopwords"] == 0
    # NULL text: empty-token metrics, not NULL/crash
    r4 = rows[4]
    assert r4["n_words"] == 0
    assert r4["mean_word_len"] == 0.0
    assert r4["keep_flag"] == 0


def test_gopher_rules_plan_is_shuffle_free(spark):
    from python_mozetl_spark.ext.quality import gopher_rules
    from tests.test_plans import _formatted_plan

    df = spark.createDataFrame([(1, "a b a")], ["doc_id", "text"])
    plan = _formatted_plan(gopher_rules(df, "doc_id", "text"))
    assert "Exchange" not in plan
    assert "Join" not in plan
