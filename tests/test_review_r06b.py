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


def test_landfill_telemetry_version_from_content(spark):
    """doc_version mirrors the reference's payload detection: ver /
    version / deviceinfo -> '3' / v, '1' fallthrough, '0' unparseable."""
    from python_mozetl_spark.jobs.landfill import parse_uri

    uuid = "12345678-1234-1234-1234-1234567890ab"
    cases = [
        ('{"ver": 4}', "4"),
        ('{"version": "1.0"}', "1.0"),
        ('{"deviceinfo": {"Version": "x"}}', "3"),
        ('{"v": 2}', "2"),
        ("{}", "1"),
        ("not json", "0"),
        (None, "0"),
    ]
    rows = [
        (f"/submit/telemetry/{uuid}/main/Firefox/54", c) for c, _ in cases
    ]
    df = spark.createDataFrame(rows, "uri string, content string")
    got = [r["doc_version"] for r in parse_uri(df).collect()]
    assert got == [want for _, want in cases]


def test_merge_sink_recovers_from_mid_swap_crash(spark, tmp_path):
    """A sealed swap that never re-pointed (crash between seal and
    rename) must be recovered — and an UNsealed swap discarded — so no
    crash window truncates the table."""
    import os
    import shutil

    from python_mozetl_spark.streaming import merge_stream_to_parquet

    table = str(tmp_path / "table")
    src = str(tmp_path / "src")
    schema = "k int, v string, version int, deleted boolean"
    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 0)], "k int, v string, version int"
    ).write.parquet(table)
    spark.createDataFrame([(3, "c", 1, False)], schema).write.parquet(src)

    # simulate the worst crash: table dir destroyed, sealed swap holds
    # the committed state
    swap = table + ".swap"
    shutil.copytree(table, swap)
    open(os.path.join(swap, "_COMMITTED"), "w").close()
    shutil.rmtree(table)

    q = merge_stream_to_parquet(
        spark.readStream.schema(schema).parquet(src),
        table, ["k"], "version", delete_col="deleted",
        checkpoint=str(tmp_path / "ckpt"), available_now=True,
    )
    q.awaitTermination(120)
    state = sorted(
        (r["k"], r["v"]) for r in spark.read.parquet(table).collect()
    )
    # pre-crash keys survived (recovered from the sealed swap) AND the
    # new batch merged — the old code would have truncated to [(3,'c')]
    assert state == [(1, "a"), (2, "b"), (3, "c")]


def test_running_totals_stream_string_key(spark, tmp_path):
    """The state schema derives the key type from the input — a
    hardcoded `long` used to kill every non-long-keyed stream."""
    import os

    from python_mozetl_spark.streaming import running_totals_stream

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("alice", 1.0), ("alice", 2.0), ("bob", 5.0)],
        "user_id string, value double",
    ).write.parquet(src)
    stream = spark.readStream.schema("user_id string, value double").parquet(src)
    q = (
        running_totals_stream(stream)
        .writeStream.format("memory")
        .queryName("rt_str_key")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rt_str_key").collect()
    got = {}
    for r in rows:  # update mode: last emission per key wins
        got[r["user_id"]] = r["sum_value"]
    assert got == {"alice": 3.0, "bob": 5.0}


def test_lr_curves_one_empty_side_keeps_grid(spark):
    from python_mozetl_spark.jobs.similarity_model import lr_curves

    pairs = spark.createDataFrame(
        [("inter", 0.1), ("inter", 0.5), ("inter", 0.9)],
        "label string, score double",
    )
    out = lr_curves(spark, pairs, num_pdf_points=10).collect()
    assert len(out) == 10  # grid survives the empty intra side
    assert all(r["num_density"] == 0.0 for r in out)
    assert any(r["den_density"] > 0 for r in out)


def test_ensemble_stack_replays_each_row_k_minus_1_times(spark):
    from python_mozetl_spark.jobs.ensemble import fit_ensemble_weights

    df = spark.createDataFrame(
        [(float(i % 2), float(i), 1.0 - (i % 2)) for i in range(40)],
        "label double, s1 double, s2 double",
    )
    # weights must come from a stack of 40*(k-1) rows; smoke both paths
    w4 = fit_ensemble_weights(df, ["s1", "s2"], k_folds=4)
    w1 = fit_ensemble_weights(df, ["s1", "s2"], k_folds=1)
    assert set(w4) == {"s1", "s2"} and set(w1) == {"s1", "s2"}


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
