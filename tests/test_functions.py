import hashlib

import numpy as np
from pyspark.sql import functions as F

from python_mozetl_spark.functions import (
    char_ngrams,
    cosine_similarity,
    fingerprint_md5,
    md5_int64,
    minhash_exprs,
    tokens,
    word_shingles,
)
from python_mozetl_spark.functions.text import predicted_lang, quality_metrics


def one(spark, text):
    return spark.createDataFrame([(text,)], ["text"])


def test_tokens_empty_and_whitespace(spark):
    df = one(spark, "  a  b   c ")
    assert df.select(tokens("text").alias("t")).first()["t"] == ["a", "b", "c"]
    assert one(spark, "").select(F.size(tokens("text")).alias("n")).first()["n"] == 0


def test_word_shingles_boundaries(spark):
    df = one(spark, "a b c d")
    assert df.select(word_shingles("text", 3).alias("s")).first()["s"] == [
        "a b c",
        "b c d",
    ]
    # fewer tokens than k ⇒ empty
    assert one(spark, "a b").select(word_shingles("text", 3).alias("s")).first()[
        "s"
    ] == []


def test_char_ngrams(spark):
    assert one(spark, "abcd").select(char_ngrams("text", 3).alias("g")).first()[
        "g"
    ] == ["abc", "bcd"]


def test_fingerprint_matches_python_md5(spark):
    raw = "  The   Quick  Brown FOX "
    canon = "the quick brown fox"
    got = one(spark, raw).select(fingerprint_md5("text").alias("f")).first()["f"]
    assert got == hashlib.md5(canon.encode()).hexdigest()


def test_md5_int64_matches_python(spark):
    got = spark.range(1).select(md5_int64(F.lit("hello")).alias("h")).first()["h"]
    expected = int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert got == expected


def test_minhash_deterministic_and_permutation_invariant(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["c", "b", "a"])], ["id", "sh"]
    )
    out = df.select("id", *minhash_exprs(F.col("sh"), 4)).collect()
    rows = {r["id"]: [r[f"mh_{j}"] for j in range(4)] for r in out}
    assert rows[1] == rows[2]  # set semantics: order never matters


def test_quality_metrics_values(spark):
    m = quality_metrics("text")
    row = one(spark, "the cat the dog").select(
        *[v.alias(k) for k, v in m.items()]
    ).first()
    assert row["n_tokens"] == 4
    assert row["n_unique_tokens"] == 3
    assert row["stopword_ratio"] == 0.5
    assert row["mean_token_len"] == 3.0


def test_predicted_lang(spark):
    assert one(spark, "the cat and the dog of york").select(
        predicted_lang("text").alias("l")
    ).first()["l"] == "en"
    assert one(spark, "el perro y la casa de que").select(
        predicted_lang("text").alias("l")
    ).first()["l"] == "es"
    assert one(spark, "zzz qqq").select(predicted_lang("text").alias("l")).first()[
        "l"
    ] == "und"


def test_cosine_similarity_matches_numpy(spark):
    a = [1.0, 2.0, 3.0]
    b = [-1.0, 0.5, 2.0]
    df = spark.createDataFrame([(a, b)], ["a", "b"])
    got = df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("c")
    ).first()["c"]
    exp = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert abs(got - exp) < 1e-12
    # zero vector ⇒ 0.0, no division error (ANSI-safe)
    z = spark.createDataFrame([(a, [0.0, 0.0, 0.0])], ["a", "b"])
    assert z.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).first()[
        "c"
    ] == 0.0
