"""Second round-6 review pass: semantic fixes pinned by the exact
failures the findings described."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_asof_join_excludes_tied_right_row(spark):
    """Strict precedence: a right row at EXACTLY the left row's
    (order, tiebreak) must not be matched."""
    from python_mozetl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 100, 1)], "user string, ts long, tb int"
    )
    right = spark.createDataFrame(
        [("u", 100, 1, 9.9), ("u", 50, 0, 5.5)],
        "user string, ts long, tb int, value double",
    )
    row = asof_join(
        left, right, on=["user"], order="ts", tiebreak="tb",
        payload=["value"],
    ).collect()[0]
    # the tied (ts=100, tb=1) right row is ignored; the strictly
    # earlier one wins
    assert row["prev_value"] == 5.5


def test_asof_join_strictly_earlier_still_matches(spark):
    from python_mozetl_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("u", 100, 5)], "user string, ts long, tb int"
    )
    right = spark.createDataFrame(
        [("u", 100, 4, 7.7)], "user string, ts long, tb int, value double"
    )
    row = asof_join(
        left, right, on=["user"], order="ts", tiebreak="tb",
        payload=["value"],
    ).collect()[0]
    # same ts but lower tiebreak = strictly preceding lexicographically
    assert row["prev_value"] == 7.7


def test_funnel_counts_emits_zero_rows_for_unreached_steps(spark):
    from python_mozetl_spark.operators.timeseries import funnel_counts

    df = spark.createDataFrame(
        [("u1", 1, "view"), ("u1", 2, "cart"), ("u2", 1, "view")],
        "user string, ts long, etype string",
    )
    rows = {r["step"]: r for r in funnel_counts(
        df, "user", "ts", "etype", ["view", "cart", "buy"]
    ).collect()}
    assert set(rows) == {"view", "cart", "buy"}  # one row per step
    assert rows["view"]["n_users"] == 2
    assert rows["cart"]["n_users"] == 1
    assert rows["buy"]["n_users"] == 0  # present, zero — not absent


def test_funnel_counts_all_steps_zero_when_no_events_match(spark):
    from python_mozetl_spark.operators.timeseries import funnel_counts

    df = spark.createDataFrame(
        [("u1", 1, "other")], "user string, ts long, etype string"
    )
    rows = funnel_counts(df, "user", "ts", "etype", ["a", "b"]).collect()
    assert sorted((r["step_idx"], r["n_users"]) for r in rows) == [(1, 0), (2, 0)]


def test_kmv_overlap_truncated_group_at_exactly_k_estimates(spark):
    """A pooled union of exactly k hashes from a TRUNCATED sketch must
    use the estimator, not claim exactness."""
    from python_mozetl_spark.ext.sketches import kmv_overlap

    k = 8
    # group A: many distinct keys (truncated sketch); group B: subset
    # of A's keys so the pooled union stays at exactly k
    rows = [("A", f"k{i}") for i in range(200)]
    rows += [("B", f"k{i}") for i in range(200)]  # same keys: union == k
    df = spark.createDataFrame(rows, "g string, key string")
    out = kmv_overlap(df, "key", "g", k=k).collect()[0]
    # true union is 200; the exact branch would have said k=8
    assert out["est_union"] > k
    # sanity: estimator should be in the right ballpark (within 3x)
    assert 60 < out["est_union"] < 700


def test_kmv_overlap_exact_when_both_groups_small(spark):
    from python_mozetl_spark.ext.sketches import kmv_overlap

    rows = [("A", f"k{i}") for i in range(5)]
    rows += [("B", f"k{i}") for i in range(3, 9)]  # union = 9, inter = 2
    df = spark.createDataFrame(rows, "g string, key string")
    out = kmv_overlap(df, "key", "g", k=64).collect()[0]
    assert out["est_union"] == 9.0
    assert out["est_inter"] == 2.0


def test_brute_force_topk_cross_table_keeps_id_collisions(spark):
    from python_mozetl_spark.ext.similarity import brute_force_topk

    queries = spark.createDataFrame(
        [(7, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    corpus = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    self_excl = brute_force_topk(corpus, queries, k=1).collect()
    assert self_excl[0]["neighbor_id"] == 8  # self-search default
    cross = brute_force_topk(
        corpus, queries, k=1, exclude_self=False
    ).collect()
    # distinct tables sharing an id namespace: the colliding id is a
    # legitimate (here: best) neighbor
    assert cross[0]["neighbor_id"] == 7
