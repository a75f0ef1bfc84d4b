"""Third review pass (xhigh, dedup/similarity core): each crash or
silent-degradation finding pinned by the input that exposed it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_minhash_lsh_survives_short_docs(spark):
    """Docs with < shingle_k tokens have empty shingle sets: they used
    to collide into identical NULL-minhash band keys (quadratic wasted
    fanout) and then crash the verify with ANSI DIVIDE_BY_ZERO."""
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "foo bar"), (3, "ok"),
         (4, "a much longer document with many tokens in it"),
         (5, "a much longer document with many tokens in it")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(4, 5)]


def test_cross_corpus_lsh_survives_short_docs(spark):
    from python_mozetl_spark.ext.dedup import cross_corpus_lsh_filter

    train = spark.createDataFrame(
        [(1, "hi there"), (2, "the quick brown fox jumps over the dog")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "ok bye"), (101, "the quick brown fox jumps over the dog")],
        "doc_id long, text string",
    )
    hits = cross_corpus_lsh_filter(train, bench, "doc_id", "text").collect()
    assert [r["doc_id"] for r in hits] == [2]


def test_banding_parameters_validated(spark):
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs

    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=40)
    with pytest.raises(ValueError, match="divide"):
        minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=5)


def test_semantic_dedup_survives_zero_vector(spark):
    from python_mozetl_spark.ext.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [1.0, 0.1]), (4, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, "vec_id", "embedding", k=2, iters=1,
                         threshold=0.95).collect()
    assert len(out) == 4  # zero vector scores 0.0 cosine, no crash
    assert all(r["kept"] for r in out if r["vec_id"] == 2)


def test_ngram_bitmap_strategy_tolerates_null_text(spark):
    from python_mozetl_spark.ext.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "abcdefgh"), (3, None)],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.8, strategy="bitmap"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_exact_duplicates_keeps_null_text_rows(spark):
    from python_mozetl_spark.ext.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           exact_duplicates(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3}  # NULL-text rows not dropped
    assert out[2]["n_dups"] == 2 and out[2]["keeper_id"] == 2
    assert out[3]["keeper_id"] == 2


def test_near_dup_matmul_empty_corpus(spark, tmp_path):
    from python_mozetl_spark.ext.similarity import embedding_near_dup_pairs

    p = str(tmp_path / "empty")
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    ).write.parquet(p)
    out = embedding_near_dup_pairs(
        spark.read.parquet(p), strategy="matmul"
    ).collect()
    assert out == []


def test_ivf_and_pandas_topk_cross_table_exclude_self_off(spark):
    import numpy as np
    import pandas as pd

    from python_mozetl_spark.ext.similarity import (
        _topk,
        cosine_topk_pandas,
        ivf_topk,
        quantized_topk,
    )

    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = ivf_topk(corpus, queries, cents, k=1, nprobe=2,
                   exclude_self=False).collect()
    assert got[0]["neighbor_id"] == 7
    got_q = quantized_topk(corpus, queries, k=1, exclude_self=False).collect()
    assert got_q[0]["neighbor_id"] == 7
    qpdf = pd.DataFrame({"vec_id": [7], "embedding": [[1.0, 0.0]]})
    got_p = _topk(
        cosine_topk_pandas(corpus, qpdf, k=1, exclude_self=False), 1
    ).collect()
    assert got_p[0]["neighbor_id"] == 7
