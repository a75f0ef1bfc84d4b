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
