"""Round-6 additions: md5-Bernoulli sampling determinism contract,
the snapshot change detector, and the new graded round-trips."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_hash_bernoulli_partitioning_invariant(spark):
    """THE contract df.sample(seed) cannot give: identical membership
    under any partitioning (U4/U6 determinism, VERDICT r05 item 7)."""
    from python_mozetl_spark.operators.sample import hash_bernoulli_sample

    base = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_bernoulli_sample(base.repartition(1), "k", 0.2).collect()}
    b = {r["k"] for r in hash_bernoulli_sample(base.repartition(17, "k"), "k", 0.2).collect()}
    c = {r["k"] for r in hash_bernoulli_sample(base.coalesce(3), "k", 0.2).collect()}
    assert a == b == c
    assert 0.15 < len(a) / 5000 < 0.25  # plausibly Bernoulli(0.2)


def test_hash_bernoulli_fractions_nest(spark):
    from python_mozetl_spark.operators.sample import hash_bernoulli_sample

    base = spark.range(0, 5000).withColumnRenamed("id", "k")
    small = {r["k"] for r in hash_bernoulli_sample(base, "k", 0.05).collect()}
    big = {r["k"] for r in hash_bernoulli_sample(base, "k", 0.30).collect()}
    assert small <= big  # the 5% sample is a subset of the 30% sample


def test_hash_bernoulli_salt_decorrelates(spark):
    from python_mozetl_spark.operators.sample import hash_bernoulli_sample

    base = spark.range(0, 5000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_bernoulli_sample(base, "k", 0.2, salt="s1").collect()}
    b = {r["k"] for r in hash_bernoulli_sample(base, "k", 0.2, salt="s2").collect()}
    assert a != b
    # independent draws: overlap ≈ 4% of the population, not 20%
    assert len(a & b) < 0.10 * 5000


def test_snapshot_change_flags_absent_dimension_alerts(spark):
    from python_mozetl_spark.operators.metrics import snapshot_change_flags

    df = spark.createDataFrame(
        [("a", 1)] * 10 + [("a", 2)] * 10      # stable: no alert
        + [("b", 1)] * 10 + [("b", 2)] * 20    # +100%: alert
        + [("c", 2)] * 5,                      # new dimension: alert
        "dim string, week int",
    )
    out = {r["dim"]: r for r in snapshot_change_flags(
        df, ["dim"], F.col("week") == 1, F.col("week") == 2
    ).collect()}
    assert out["a"]["alert"] is False and out["a"]["pct_change"] == 0.0
    assert out["b"]["alert"] is True and out["b"]["pct_change"] == 1.0
    assert out["c"]["alert"] is True and out["c"]["pct_change"] is None
    assert out["c"]["n_prev"] == 0 and out["c"]["n_cur"] == 5


def test_side_input_from_json_path_and_frame(spark, tmp_path):
    """S7 adapter: driver-side JSON side input as object or DataFrame."""
    import json

    from python_mozetl_spark.sources import side_input_from_json

    p = tmp_path / "whitelist.json"
    p.write_text(json.dumps([{"addon_id": "a", "rank": 1},
                             {"addon_id": "b", "rank": 2}]))
    obj = side_input_from_json(str(p))
    assert [d["addon_id"] for d in obj] == ["a", "b"]
    df = side_input_from_json(str(p), spark, schema="addon_id string, rank bigint")
    assert df.count() == 2 and df.columns == ["addon_id", "rank"]


def test_snapshot_change_flags_vanished_dimension_alerts(spark):
    from python_mozetl_spark.operators.metrics import snapshot_change_flags

    df = spark.createDataFrame(
        [("gone", 1)] * 8, "dim string, week int"
    )
    row = snapshot_change_flags(
        df, ["dim"], F.col("week") == 1, F.col("week") == 2
    ).collect()[0]
    assert row["n_cur"] == 0 and row["pct_change"] == -1.0
    assert row["alert"] is True


def test_snapshot_change_flags_ignores_other_periods(spark):
    """A dimension present only OUTSIDE both snapshots must not emit a
    spurious (0, 0, alert) row — the operator filters internally."""
    from python_mozetl_spark.operators.metrics import snapshot_change_flags

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("elsewhere", 7)], "dim string, week int"
    )
    rows = snapshot_change_flags(
        df, ["dim"], F.col("week") == 1, F.col("week") == 2
    ).collect()
    assert {r["dim"] for r in rows} == {"a"}


def test_hash_bernoulli_threshold_not_truncated(spark):
    """round(), not int(): 0.3*1e6 is 299999.99... in floats, and
    truncation would exclude bucket 299999 in violation of the
    documented exact predicate."""
    from python_mozetl_spark.operators.sample import hash_bernoulli_sample

    base = spark.range(0, 20000).withColumnRenamed("id", "k")
    ours = {r["k"] for r in hash_bernoulli_sample(base, "k", 0.3, salt="t").collect()}
    import hashlib

    exact = {
        k for k in range(20000)
        if int(hashlib.md5(f"t|{k}".encode()).hexdigest()[:15], 16) % 1_000_000
        < 300_000
    }
    assert ours == exact


def test_semantic_dedup_keeps_one_representative(spark):
    """SemDeDup semantics: a planted duplicate neighborhood keeps its
    lowest-id member; dissimilar vectors all survive; every input row
    comes back exactly once."""
    from python_mozetl_spark.ext.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),   # ~dup of 1
        (3, [0.998, -0.01, 0.0]),  # ~dup of 1
        (4, [0.0, 1.0, 0.0]),
        (5, [0.0, 0.0, 1.0]),
        (6, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, "vec_id", "embedding", k=2, iters=2, threshold=0.95
    ).collect()
    assert len(out) == 6  # row-preserving
    kept = {r["vec_id"] for r in out if r["kept"]}
    assert 1 in kept and 2 not in kept and 3 not in kept
    assert {4, 5, 6} <= kept


def test_bigram_perplexity_matches_python_mirror(spark):
    """Add-k bigram LM ppl equals a literal python computation on a
    tiny corpus (fluent repeated phrasing scores lower than a doc of
    rare transitions)."""
    import math
    from collections import Counter

    from python_mozetl_spark.ext.quality import bigram_perplexity

    texts = {1: "a b a b a b", 2: "a b a b c d", 3: "x"}
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bigram_perplexity(df, "doc_id", "text").collect()}

    occ = []
    for t in texts.values():
        w = t.split()
        occ += list(zip(w, w[1:]))
    c12, c1 = Counter(occ), Counter(w1 for w1, _ in occ)
    V = len({w2 for _, w2 in occ})
    for did, t in texts.items():
        w = t.split()
        bgs = list(zip(w, w[1:]))
        if not bgs:
            assert did not in got  # <2 tokens: no score row
            continue
        mean = sum(
            math.log((c12[b] + 0.5) / (c1[b[0]] + 0.5 * V)) for b in bgs
        ) / len(bgs)
        assert got[did]["n_bigrams"] == len(bgs)
        assert got[did]["ppl"] == round(math.exp(-mean), 4)
    assert got[1]["ppl"] < got[2]["ppl"]  # repetition = fluent = low ppl


def test_compact_parquet_refuses_nested_paths(spark, tmp_path):
    from python_mozetl_spark.sinks.writers import compact_parquet

    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="disjoint"):
        compact_parquet(spark, src, src + "/compacted")  # dst inside src
    with pytest.raises(ValueError, match="disjoint"):
        compact_parquet(spark, src, str(tmp_path))  # dst is src's parent
