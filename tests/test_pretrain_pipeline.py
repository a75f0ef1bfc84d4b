"""End-to-end pretraining prep (jobs/pretrain_pipeline.py): every
status path exercised on one crafted fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from python_mozetl_spark.jobs.pretrain_pipeline import prepare_pretraining_corpus

BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four"
)
BENCH_TEXT = (
    "held out benchmark prompt with its own distinct wording that "
    "training must never contain verbatim or nearly verbatim at all"
)


def test_pipeline_status_matrix(spark):
    docs = spark.createDataFrame(
        [
            (1, BASE),                                   # kept
            (2, BASE),                                   # exact_dup of 1
            (3, BASE.replace("three four", "nine ten")), # near_dup of 1
            (4, "spam " * 30),                           # low_quality (repetition)
            (5, "tiny doc"),                             # low_quality (min tokens)
            (6, BENCH_TEXT + " padding words here"),     # contaminated
            # needs >= 18 tokens: with all-unique bigrams the top-bigram
            # share is 1/(n-1), which only clears the 0.06 gate at n >= 18
            (7, "a perfectly ordinary unrelated document about spark "
                "catalyst plans joins aggregates windows shuffles exchanges "
                "broadcasts partitions codegen pushdown pruning ok"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, BENCH_TEXT)], ["doc_id", "text"])
    out = prepare_pretraining_corpus(docs, bench).collect()
    got = {r["doc_id"]: r for r in out}
    assert len(got) == 7
    assert got[1]["status"] == "kept"
    assert got[2]["status"] == "exact_dup"
    assert got[3]["status"] == "near_dup"
    assert got[4]["status"] == "low_quality"
    assert got[5]["status"] == "low_quality"
    assert got[6]["status"] == "contaminated"
    assert got[7]["status"] == "kept"
    # split only for kept; shard/pos only for kept train
    for r in out:
        if r["status"] != "kept":
            assert r["split"] is None and r["shard"] is None and r["pos"] is None
        else:
            assert r["split"] in {"train", "val", "test"}
            if r["split"] == "train":
                assert r["shard"] is not None and r["pos"] is not None
            else:
                assert r["shard"] is None and r["pos"] is None


def test_pipeline_kept_set_shrinks_monotonically(spark):
    from python_mozetl_spark.plans.queries import t as load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    bench_srcs = ["src15", "src16", "src17", "src18", "src19"]
    corpus = d.where(~F.col("source").isin(bench_srcs))
    out = prepare_pretraining_corpus(
        corpus, d.where(F.col("source").isin(bench_srcs))
    )
    by_status = {r["status"]: r["n"] for r in
                 out.groupBy("status").agg(F.count("*").alias("n")).collect()}
    assert sum(by_status.values()) == corpus.count()
    assert by_status.get("kept", 0) > 0
