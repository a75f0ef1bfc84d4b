"""Inverted-index / phrase-search operators (ext/search.py)."""

from __future__ import annotations

from python_mozetl_spark.ext.search import (
    index_terms,
    phrase_match,
    phrase_search,
    positional_postings,
)

from tests.conftest import assert_df_equals, df_rows


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_positional_postings_zero_based(spark):
    out = positional_postings(_docs(spark, [(1, "a b a")]), "doc_id", "text")
    assert_df_equals(
        out,
        [
            {"term": "a", "doc_id": 1, "pos": 0},
            {"term": "b", "doc_id": 1, "pos": 1},
            {"term": "a", "doc_id": 1, "pos": 2},
        ],
    )


def test_index_terms_stats(spark):
    df = _docs(spark, [(1, "a a b"), (2, "a c"), (3, "c")])
    assert_df_equals(
        index_terms(df, "doc_id", "text"),
        [
            {"term": "a", "df_count": 2, "tf_total": 3, "top_tf": 2},
            {"term": "b", "df_count": 1, "tf_total": 1, "top_tf": 1},
            {"term": "c", "df_count": 2, "tf_total": 2, "top_tf": 1},
        ],
    )


def test_phrase_search_counts_all_match_positions(spark):
    df = _docs(
        spark,
        [
            (1, "x y z x y"),   # "x y" twice
            (2, "y x"),         # reversed: no match
            (3, "x q y"),       # not adjacent: no match
            (4, "x y"),         # exactly the phrase
        ],
    )
    expected = [
        {"doc_id": 1, "n_matches": 2},
        {"doc_id": 4, "n_matches": 1},
    ]
    assert_df_equals(phrase_search(df, "doc_id", "text", ["x", "y"]), expected)
    # the index-free within-row twin returns the same rows
    assert_df_equals(phrase_match(df, "doc_id", "text", ["x", "y"]), expected)


def test_phrase_three_terms_and_short_docs(spark):
    df = _docs(
        spark,
        [
            (1, "a b c"),
            (2, "a b"),      # shorter than the phrase
            (3, "a b c a b c"),
            (4, ""),         # empty doc must not error
        ],
    )
    expected = [
        {"doc_id": 1, "n_matches": 1},
        {"doc_id": 3, "n_matches": 2},
    ]
    assert_df_equals(phrase_search(df, "doc_id", "text", ["a", "b", "c"]), expected)
    assert_df_equals(phrase_match(df, "doc_id", "text", ["a", "b", "c"]), expected)


def test_phrase_overlapping_matches(spark):
    # "a a a" contains "a a" at positions 0 and 1 (overlap allowed)
    df = _docs(spark, [(1, "a a a")])
    expected = [{"doc_id": 1, "n_matches": 2}]
    assert_df_equals(phrase_search(df, "doc_id", "text", ["a", "a"]), expected)
    assert_df_equals(phrase_match(df, "doc_id", "text", ["a", "a"]), expected)


def test_phrase_twins_agree_on_corpus(spark):
    from python_mozetl_spark.plans.queries import t

    d = t(spark, "/root/testdata/sf0.001", "documents")
    a = df_rows(phrase_search(d, "doc_id", "text", ["table", "hash"]))
    b = df_rows(phrase_match(d, "doc_id", "text", ["table", "hash"]))
    assert a == b and len(a) > 0


def test_tfidf_cosine_pairs_equals_brute_force(spark):
    """Prefix filtering must be 100%-recall: compare against a numpy
    brute-force TF-IDF cosine over a deterministic synthetic corpus
    with real weight variety (rare + common terms, repeats)."""
    import math

    from python_mozetl_spark.ext.search import tfidf_cosine_pairs

    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for d in range(40):
        # deterministic pseudo-random token draw, rare terms for high d
        toks = [vocab[(d * 7 + i * i) % (3 + d % 17)] for i in range(5 + d % 9)]
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    # numpy-free brute force in plain python
    from collections import Counter

    tf = {d: Counter(t.split()) for d, t in rows}
    n = float(len(rows))
    dft = Counter()
    for c in tf.values():
        for tok in c:
            dft[tok] += 1
    u = {}
    for d, c in tf.items():
        w = {tok: cnt * (math.log((n + 1) / (dft[tok] + 1)) + 1)
             for tok, cnt in c.items()}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        u[d] = {tok: x / nrm for tok, x in w.items()}
    expected = {}
    thr = 0.7
    docs = sorted(u)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            dot = sum(ua * u[b].get(tok, 0.0) for tok, ua in u[a].items())
            if round(dot, 6) >= thr:
                expected[(a, b)] = round(dot, 6)

    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            df, "doc_id", "text", threshold=thr
        ).collect()
    }
    assert got == expected and len(expected) > 0


def test_tfidf_cosine_pairs_plan(spark):
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs
    from tests.test_plans import _formatted_plan

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")], ["doc_id", "text"]
    )
    plan = _formatted_plan(
        tfidf_cosine_pairs(df, "doc_id", "text", stage=False)
    )
    # the df table rides a broadcast join; nothing falls back to a
    # cartesian product (stage=False keeps the pre-checkpoint lineage
    # visible)
    assert "BroadcastHashJoin" in plan
    assert "Cartesian" not in plan


def test_tfidf_verify_keys_seam_equal(spark):
    """The xxhash64 verify-key path (round 11 seam) must emit the
    identical pair set AND rounded cosines as the token-string path —
    the key representation only changes what map_zip_with compares,
    never which entries align (same corpus as the brute-force test, so
    real weight variety rides the check)."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs

    vocab = [f"w{i}" for i in range(20)]
    rows = []
    for d in range(40):
        toks = [vocab[(d * 7 + i * i) % (3 + d % 17)] for i in range(5 + d % 9)]
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def run(keys):
        return {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in tfidf_cosine_pairs(
                df, "doc_id", "text", threshold=0.7, verify_keys=keys
            ).collect()
        }

    tok, h64 = run("token"), run("xxhash64")
    # cosines compared to one 6dp ulp, NOT exactly — the key
    # representation also changes the dot-product FOLD ORDER (maps
    # sort by hash instead of token), so a true cosine sitting exactly
    # on a 6dp rounding boundary may legitimately land one ulp apart
    # between the paths (round-12 ADVICE).  The SAME ulp shift on a
    # boundary pair can flip its `rounded >= threshold` membership, so
    # exact pair-SET equality is only an invariant AWAY from the
    # threshold: a pair present in exactly one set must sit within one
    # 6dp ulp of the threshold in the set that holds it (round-13
    # ADVICE closure — this fixture happens to agree exactly, but that
    # is not an invariant worth pinning as a hard assert)
    ulp = 1e-6 + 1e-12
    thr = 0.7
    assert len(tok) > 0 and len(h64) > 0
    for pair in set(tok) ^ set(h64):
        c = tok.get(pair, h64.get(pair))
        assert abs(c - thr) <= ulp, (pair, c)
    for pair in set(tok) & set(h64):
        assert abs(tok[pair] - h64[pair]) <= ulp

    import pytest

    with pytest.raises(ValueError, match="verify_keys"):
        tfidf_cosine_pairs(df, "doc_id", "text", verify_keys="md5")
