"""Dense-corpus calibration probe for the anchor_arity="auto" gate
(round-13 optimization session 4; SCALE.md §6m has the findings).

Generates a 35k-doc fixture with the sf0.1 documents SHAPE (31-word
vocabulary, 7-87 words/doc uniform word salad, ~4% near-dup mutations,
~0.2% exact copies) — 7x the bench corpus, which on a saturated
fingerprint domain puts Sum s(s-1)/2 over prefix buckets at ~49x the
sf0.1 27.3M, i.e. ~1.3e9: just past WINNOW_ARITY_GATE_MIN_ENUM1.

Measures, with the graded winnow configuration (k=8, window=4,
min_shared=50, c=8, max_bucket=500, spread_pairs=256, xxhash64 — the
gate-probe convention):

1. enum1  = Sum s(s-1)/2 over arity-1 (per-fingerprint) prefix buckets
2. rows2  = Sum p(p-1)/2 over docs (the gate's arity-2 cost proxy)
3. enum2  = Sum s(s-1)/2 over the COMPOSITE (fp_i, fp_j) buckets —
            the term the rows2 proxy ignores, and the one that decides
            whether arity 2 can actually win on a dense corpus
4. the gate decision + reason via gate_report
5. (optional, --walls) one timed noop run per arity

Round 14: the probe additionally runs the REAL gate (gate_report) so
the decision printed is the shipping rule, not a reproduction — the
round-14 rule charges arity 2 its own enumeration volume
(rows2 + enum2_est < enum1).  ``DENSE_N_DOCS`` scales the fixture:
at 70k docs enum1 ~ 4x the 35k reading ~ 3.2e9, past the 1e9 floor,
which is the "dense corpus the floor no longer protects" case VERDICT
r13 item 4 names.

Usage: python tools/dense_gate_probe.py [--walls]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

N_DOCS = int(os.environ.get("DENSE_N_DOCS", "35000"))
FIX = os.environ.get("DENSE_FIX_DIR", f"/tmp/densefix{N_DOCS}")

K, WINDOW, MIN_SHARED, MAX_BUCKET, C = 8, 4, 50, 500, 8
HASH_FN = "xxhash64"


def make_fixture(spark):
    if os.path.exists(os.path.join(FIX, "_SUCCESS_MARK")):
        return
    rng = np.random.RandomState(42)
    vocab = [
        "batch", "part", "spark", "line", "column", "order", "small",
        "sort", "fast", "value", "scan", "a", "hash", "slow", "group",
        "agg", "filter", "query", "big", "key", "window", "row",
        "table", "stream", "merge", "data", "join", "shuffle", "plan",
        "stage", "task",
    ]
    docs = []
    texts = []
    for i in range(N_DOCS):
        r = rng.rand()
        if i > 100 and r < 0.002:
            t = texts[rng.randint(0, i)]  # exact copy
        elif i > 100 and r < 0.042:
            base = texts[rng.randint(0, i)].split(" ")
            for _ in range(2):  # 2-word mutation
                base[rng.randint(0, len(base))] = vocab[rng.randint(0, 31)]
            t = " ".join(base)
        else:
            n_words = rng.randint(7, 88)
            t = " ".join(vocab[j] for j in rng.randint(0, 31, n_words))
        texts.append(t)
        docs.append((i, t))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    df.repartition(8).write.mode("overwrite").parquet(
        os.path.join(FIX, "documents.parquet")
    )
    open(os.path.join(FIX, "_SUCCESS_MARK"), "w").write("ok")


def main():
    from pyspark.sql import Window, functions as F

    from python_mozetl_spark.session import get_session, tune_session
    from python_mozetl_spark.ext.dedup import (
        winnow_copy_pairs,
        winnow_prefix_frames,
    )

    walls = "--walls" in sys.argv
    spark = get_session(app_name="dense_gate_calibration")
    tune_session(spark)
    spark.sparkContext.setLogLevel("ERROR")
    make_fixture(spark)
    d = spark.read.parquet(os.path.join(FIX, "documents.parquet"))
    print(json.dumps({"fixture_docs": d.count()}))

    # the three volume observables off ONE shared staged chain
    frames = winnow_prefix_frames(
        d, "doc_id", "text", k=K, window=WINDOW, min_shared=MIN_SHARED,
        min_prefix_hits=C, hash_fn=HASH_FN,
    )
    prefix = frames.prefix
    t0 = time.time()

    def pair_sum(keyed):
        total = (
            prefix.groupBy(keyed.alias("__k"))
            .agg(F.count(F.lit(1)).alias("__s"))
            .agg(F.coalesce(F.sum(F.col("__s") * (F.col("__s") - 1)), F.lit(0)))
            .first()[0]
        )
        return int(total) // 2

    enum1 = pair_sum(F.col("fp"))
    rows2 = pair_sum(F.col("doc_id"))
    # composite-bucket enumerations: build the arity-2 key frame the
    # same way winnow_copy_pairs does and aggregate its bucket sizes
    left = prefix.select(
        "doc_id", F.col("fp").alias("__f1"), F.col("__rn").alias("__r1")
    )
    right = prefix.select(
        "doc_id", F.col("fp").alias("__f2"), F.col("__rn").alias("__r2")
    )
    comp = (
        left.join(right, "doc_id")
        .where(F.col("__r1") < F.col("__r2"))
        .select(F.xxhash64("__f1", "__f2").alias("__bk"))
    )
    enum2 = int(
        comp.groupBy("__bk")
        .agg(F.count(F.lit(1)).alias("__s"))
        .agg(F.coalesce(F.sum(F.col("__s") * (F.col("__s") - 1)), F.lit(0)))
        .first()[0]
    ) // 2
    n_buckets1 = prefix.select("fp").distinct().count()
    # the REAL gate decision (round 14: rows2 + sampled enum2 < enum1,
    # past the floor), sharing the same staged frames
    rep: dict = {}
    winnow_copy_pairs(
        d, "doc_id", "text", k=K, window=WINDOW, min_shared=MIN_SHARED,
        max_bucket=MAX_BUCKET, hash_fn=HASH_FN, anchor_arity="auto",
        gate_report=rep, frames=frames, min_prefix_hits=C,
    )
    print(json.dumps({
        "n_docs": N_DOCS,
        "enum1": enum1, "rows2": rows2, "enum2": enum2,
        "n_arity1_buckets": n_buckets1,
        "gate_picked": rep["anchor_arity"], "gate_reason": rep["reason"],
        "gate_enum2_est": rep["arity2_enum_est"],
        "pre_r14_rule_would_pick": 2
        if (rows2 < enum1 and enum1 >= 1_000_000_000)
        else 1,
        "observables_wall_s": round(time.time() - t0, 1),
    }))

    if walls:
        for arity in (1, 2):
            t0 = time.time()
            spark.sparkContext.setJobDescription(f"dense wall arity {arity}")
            winnow_copy_pairs(
                d, "doc_id", "text", k=K, window=WINDOW,
                min_shared=MIN_SHARED, max_bucket=MAX_BUCKET,
                spread_pairs=256, hash_fn=HASH_FN, anchor_arity=arity,
            ).write.format("noop").mode("overwrite").save()
            print(json.dumps({f"arity{arity}_wall_s": round(time.time() - t0, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
