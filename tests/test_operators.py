from pyspark.sql import functions as F

from python_mozetl_spark.operators import (
    AggSpec,
    asof_join,
    capped_random_per_key,
    collapse_small_groups,
    explode_map,
    explode_with_default,
    first_by,
    last_by,
    latest_per_key,
    mod_sample,
    normalize_shares,
    pivot_agg,
    running_agg,
    self_fanout,
    sessionize,
    top_n_per_group,
    wide_agg,
    with_group_count,
)
from python_mozetl_spark.operators.pivot import manual_pivot
from tests.conftest import assert_df_equals, df_rows

from python_mozetl_spark.plans.queries import _PINGS_PATH


def test_latest_per_key(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 3, "y"), ("a", 2, "z"), ("b", 9, "w")],
        ["k", "ord", "v"],
    )
    out = latest_per_key(df, ["k"], ["ord"], descending=True)
    assert_df_equals(
        out, [{"k": "a", "ord": 3, "v": "y"}, {"k": "b", "ord": 9, "v": "w"}]
    )


def test_latest_per_key_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 1, 20), ("a", 1, 30)], ["k", "ord", "tie"]
    )
    out = latest_per_key(df, ["k"], ["ord", "tie"], descending=True)
    assert df_rows(out) == [{"k": "a", "ord": 1, "tie": 30}]


def test_top_n_per_group(spark):
    df = spark.createDataFrame(
        [("a", i) for i in range(10)] + [("b", 5)], ["k", "v"]
    )
    out = top_n_per_group(df, ["k"], [F.col("v").desc()], n=3, descending=False)
    got = df_rows(out)
    assert [r for r in got if r["k"] == "a"] == [
        {"k": "a", "v": 7},
        {"k": "a", "v": 8},
        {"k": "a", "v": 9},
    ]
    assert {"k": "b", "v": 5} in got


def test_with_group_count_and_running(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], ["k", "v"])
    out = with_group_count(df, ["k"])
    assert {r["k"]: r["group_count"] for r in out.collect()} == {"a": 2, "b": 1}
    ran = running_agg(df, ["k"], ["v"], F.sum("v"), "cum")
    assert {(r["k"], r["v"]): r["cum"] for r in ran.collect()} == {
        ("a", 1): 1,
        ("a", 2): 3,
        ("b", 3): 3,
    }


def test_explode_with_default_null_preserving(spark):
    # E4: rows with null arrays survive with the default (zero-search
    # client semantics, mozetl/clientsdaily/rollup.py:86-97)
    df = spark.createDataFrame(
        [("d1", [{"engine": "g", "count": 4}]), ("d2", None)],
        "id string, counts array<struct<engine:string,count:long>>",
    )
    out = explode_with_default(
        df, "counts", "c", {"count": F.lit(0)}, keep=["id"]
    ).select("id", "c_count")
    assert_df_equals(out, [{"id": "d1", "c_count": 4}, {"id": "d2", "c_count": 0}])


def test_explode_map(spark):
    df = spark.createDataFrame(
        [("a", {"x": 1, "y": 2})], "id string, m map<string,long>"
    )
    out = explode_map(df, "m", keep=["id"])
    assert sorted(df_rows(out), key=lambda r: r["key"]) == [
        {"id": "a", "key": "x", "value": 1},
        {"id": "a", "key": "y", "value": 2},
    ]


def test_self_fanout_pairs(spark):
    # E5: taar_lite key_all — each element against every other
    df = spark.createDataFrame([("c1", ["a", "b", "c"])], ["id", "addons"])
    out = self_fanout(df, "addons", keep=["id"])
    pairs = {(r["left"], r["right"]) for r in out.collect()}
    assert pairs == {
        ("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "b"),
    }


def test_agg_spec_wide(spark):
    df = spark.createDataFrame(
        [("c1", "d1", 5, 1), ("c1", "d1", 7, 2), ("c2", "d1", 1, 3)],
        ["client", "day", "ticks", "seq"],
    )
    spec = (
        AggSpec(keys=["client", "day"])
        .add("ticks", "sum", "ticks_sum")
        .add("ticks", "mean", "ticks_mean")
        .add("ticks", "count_distinct", "ticks_distinct")
        .add_expr(first_by("ticks", F.col("seq"), "first_ticks"))
        .add_expr(last_by("ticks", F.col("seq"), "last_ticks"))
    )
    out = wide_agg(df, spec)
    rows = {r["client"]: r for r in out.collect()}
    assert rows["c1"]["ticks_sum"] == 12
    assert rows["c1"]["ticks_mean"] == 6.0
    assert rows["c1"]["first_ticks"] == 5  # deterministic, order by seq
    assert rows["c1"]["last_ticks"] == 7
    assert rows["c2"]["ticks_distinct"] == 1


def test_pivot_equivalence(spark):
    df = spark.createDataFrame(
        [("u1", "sap", 2), ("u1", "organic", 3), ("u2", "sap", 5)],
        ["user", "type", "count"],
    )
    a = pivot_agg(df, ["user"], "type", ["sap", "organic"], F.sum("count"))
    b = manual_pivot(df, ["user"], "type", ["sap", "organic"], F.col("count"))
    assert df_rows(a) == df_rows(b)
    assert {r["user"]: r["sap"] for r in a.collect()} == {"u1": 2, "u2": 5}


def test_collapse_small_groups(spark):
    pre = spark.createDataFrame(
        [("big", 100), ("tiny1", 3), ("tiny2", 2)], ["g", "n"]
    )
    out = collapse_small_groups(pre, "g", F.col("n"), threshold=10)
    assert_df_equals(out, [{"g": "big", "n": 100}, {"g": "Other", "n": 5}])


def test_normalize_shares(spark):
    pre = spark.createDataFrame([("a", 30.0), ("b", 70.0)], ["g", "v"])
    out = normalize_shares(pre, "v")
    assert {r["g"]: r["share"] for r in out.collect()} == {"a": 0.3, "b": 0.7}


def test_mod_sample_deterministic(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "k")
    out = mod_sample(df, "k", buckets=100, take=7)
    assert out.count() == 70
    assert out.agg(F.max(F.pmod("k", F.lit(100)))).first()[0] == 6


def test_capped_random_per_key_seeded(spark):
    df = spark.createDataFrame([("a", i) for i in range(50)], ["k", "v"])
    out1 = capped_random_per_key(df, ["k"], cap=5, seed=7)
    out2 = capped_random_per_key(df, ["k"], cap=5, seed=7)
    assert out1.count() == 5
    assert df_rows(out1) == df_rows(out2)  # seeded ⇒ reproducible


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [("u", "2024-01-01 00:00:00", 1), ("u", "2024-01-01 00:10:00", 2),
         ("u", "2024-01-01 01:10:00", 3)],
        ["k", "ts", "id"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sessionize(df, ["k"], "ts", gap_seconds=1800, tiebreak="id")
    assert {r["id"]: r["session_id"] for r in out.collect()} == {1: 1, 2: 1, 3: 2}


def test_asof_join_strict_precedence(spark):
    left = spark.createDataFrame(
        [(10, "u", 100), (11, "u", 50)], ["event_id", "user", "ts"]
    )
    right = spark.createDataFrame(
        [("u", 99, 1, 1.5), ("u", 100, 2, 2.5), ("u", 120, 3, 3.5)],
        ["user", "ts", "event_id", "value"],
    )
    out = asof_join(
        left, right, on=["user"], order="ts", tiebreak="event_id",
        payload=["event_id", "value"], prefix="prev_",
    )
    rows = {r["event_id"]: r for r in out.collect()}
    # left ts=100 (event 10): right ts=100 has event_id 2 < 10 ⇒ ordered
    # before ⇒ matched; right ts=120 excluded.
    assert rows[10]["prev_event_id"] == 2 and rows[10]["prev_value"] == 2.5
    # left ts=50: no preceding right row ⇒ nulls
    assert rows[11]["prev_event_id"] is None and rows[11]["prev_value"] is None


def test_read_table_pluggable_formats(spark, tmp_path):
    """S4: the same read_table entry point serves any registered
    DataSource format via its format string — parquet, json, orc —
    exactly how a warehouse connector would plug in."""
    from python_mozetl_spark.sources import read_json_pings, read_table

    src = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None)], ["id", "tag", "score"]
    )
    root = str(tmp_path)
    src.write.json(f"{root}/t.json")
    src.write.orc(f"{root}/t.orc")
    src.write.csv(f"{root}/t.csv")
    ddl = "id bigint, tag string, score double"
    via_json = read_table(spark, root, "t", format="json", schema=ddl)
    via_orc = read_table(spark, root, "t", format="orc")
    via_csv = read_table(spark, root, "t", format="csv", schema=ddl)
    want = {(1, "a", 2.5), (2, "b", None)}
    assert {tuple(r) for r in via_json.select("id", "tag", "score").collect()} == want
    assert {tuple(r) for r in via_orc.select("id", "tag", "score").collect()} == want
    assert {tuple(r) for r in via_csv.select("id", "tag", "score").collect()} == want

    # S5 scan of the committed ping fixture: explicit schema, no inference
    pings = read_json_pings(
        spark,
        _PINGS_PATH,
        "event_id bigint, meta struct<user_id: bigint, event_type: string>",
    )
    assert pings.schema.simpleString().startswith("struct<event_id:bigint,meta:")
    assert pings.where(F.col("meta.user_id").isNotNull()).count() > 500


def test_convert_frame_config_table(spark):
    """DataFrameConfig/convert_pings twin (mozetl/basic/transform.py:
    12-67): a declarative column table with nested paths, try_cast
    null-on-error cleaning, and a pushed-down row filter."""
    from python_mozetl_spark.operators import ColumnSpec, FrameConfig, convert_frame
    from python_mozetl_spark.sources import read_json_pings

    pings = read_json_pings(
        spark,
        _PINGS_PATH,
        "event_id bigint, ts_us bigint, "
        "meta struct<user_id: bigint, event_type: string>, "
        "value double, props string",
    )
    config = FrameConfig(
        columns=(
            ColumnSpec("event_id"),
            ColumnSpec("user_id", path="meta.user_id"),
            ColumnSpec("event_type", path="meta.event_type",
                       clean=lambda c: F.upper(c)),
            ColumnSpec("value", clean=lambda c: F.coalesce(c, F.lit(0.0))),
            # cleaning failure -> null, like the reference's except-to-None
            ColumnSpec("k", path="get_json_object(props, '$.k')", dtype="bigint"),
            ColumnSpec("bad", path="props", dtype="double"),
        ),
        row_filter=F.col("user_id").isNotNull(),
    )
    out = convert_frame(pings, config)
    assert out.columns == ["event_id", "user_id", "event_type", "value", "k", "bad"]
    rows = out.orderBy("event_id").limit(3).collect()
    assert rows[0]["event_type"] == rows[0]["event_type"].upper()
    assert all(r["bad"] is None for r in rows)  # uncastable JSON string -> null
    assert all(r["value"] is not None for r in rows)
    assert out.count() > 500


def test_robust_outlier_stats_flags_planted_outliers(spark):
    from python_mozetl_spark.operators.windows import robust_outlier_stats

    rows = [("g", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11, 9, 1000.0]]
    df = spark.createDataFrame(rows, ["g", "x"])
    r = robust_outlier_stats(df, "x", ["g"]).collect()[0]
    assert r["n"] == 10 and r["n_outliers"] == 1  # only the 1000
    assert r["med"] == 11.0 and r["lo"] < 9 and r["hi"] < 100


# ---------------------------------------------------------------------------
# round 4: MERGE upsert + SCD2 history (operators/merge.py)
# ---------------------------------------------------------------------------


def test_merge_upsert_update_insert_delete_passthrough(spark):
    from python_mozetl_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "val"]
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, False),   # update
            (3, None, 1, True),    # delete
            (4, "d", 1, False),    # insert
        ],
        ["k", "val", "v", "del"],
    )
    out = merge_upsert(base, changes, ["k"], "v", "del")
    assert_df_equals(out, [{"k": 1, "val": "a2"}, {"k": 2, "val": "b"},
                           {"k": 4, "val": "d"}])


def test_merge_upsert_last_wins_and_tombstone_priority(spark):
    from python_mozetl_spark.operators.merge import merge_upsert

    base = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "val"])
    changes = spark.createDataFrame(
        [
            (1, "v1", 1, False),
            (1, "v2", 5, False),   # highest version wins
            (1, "v3", 3, False),
            (2, "x", 7, False),    # version tie with a delete:
            (2, None, 7, True),    # the tombstone must win (no resurrect)
        ],
        ["k", "val", "v", "del"],
    )
    out = merge_upsert(base, changes, ["k"], "v", "del")
    assert_df_equals(out, [{"k": 1, "val": "v2"}])


def test_scd2_history_collapses_runs_and_closes_intervals(spark):
    from python_mozetl_spark.operators.merge import scd2_history

    df = spark.createDataFrame(
        [
            (1, 10, "A"), (1, 20, "A"),   # repeat collapses
            (1, 30, "B"), (1, 40, "A"),   # back to A = NEW interval
            (2, 10, "Z"),
        ],
        ["k", "seq", "status"],
    )
    out = scd2_history(df, ["k"], "seq", ["status"])
    assert_df_equals(
        out,
        [
            {"k": 1, "status": "A", "valid_from": 10, "valid_to": 30},
            {"k": 1, "status": "B", "valid_from": 30, "valid_to": 40},
            {"k": 1, "status": "A", "valid_from": 40, "valid_to": None},
            {"k": 2, "status": "Z", "valid_from": 10, "valid_to": None},
        ],
    )


def test_scd2_history_without_collapse_keeps_every_observation(spark):
    from python_mozetl_spark.operators.merge import scd2_history

    df = spark.createDataFrame(
        [(1, 10, "A"), (1, 20, "A")], ["k", "seq", "status"]
    )
    out = scd2_history(df, ["k"], "seq", ["status"], collapse_repeats=False)
    assert_df_equals(
        out,
        [
            {"k": 1, "status": "A", "valid_from": 10, "valid_to": 20},
            {"k": 1, "status": "A", "valid_from": 20, "valid_to": None},
        ],
    )


def test_agg_state_merge_equals_single_pass_exactly(spark):
    """Decimal-exact state: folding per-batch states re-aggregates to the
    SAME state a single pass over the union produces — bit-for-bit, the
    property incremental rollups rely on (operators/incremental.py)."""
    from python_mozetl_spark.operators.incremental import (
        agg_state,
        finalize_agg_state,
        merge_agg_states,
    )

    import pytest

    rows = [(i % 3, (i * 37) % 1001 - 200) for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "v"])
    batches = [
        df.where(F.pmod(df.v, F.lit(4)) == r) for r in range(4)
    ]  # uneven, disjoint, covering (pmod: negatives land in a batch too)
    merged = merge_agg_states(
        [agg_state(b, ["k"], ["v"]) for b in batches], ["k"], ["v"]
    )
    single = agg_state(df, ["k"], ["v"])
    assert df_rows(merged) == df_rows(single)
    fin = finalize_agg_state(merged, ["k"], ["v"])
    row = {r["k"]: r for r in df_rows(fin)}
    import statistics

    vals = [v for k, v in rows if k == 1]
    assert row[1]["v_n"] == len(vals)
    assert float(row[1]["v_sum"]) == sum(vals)
    assert row[1]["v_mean"] == pytest.approx(statistics.fmean(vals))
    assert row[1]["v_std"] == pytest.approx(statistics.stdev(vals))
    assert row[1]["v_min"] == min(vals) and row[1]["v_max"] == max(vals)


def test_agg_state_single_batch_merge_is_identity(spark):
    from python_mozetl_spark.operators.incremental import (
        agg_state,
        merge_agg_states,
    )

    df = spark.createDataFrame([(1, 5), (1, 7), (2, 9)], ["k", "v"])
    st = agg_state(df, ["k"], ["v"])
    assert df_rows(merge_agg_states([st], ["k"], ["v"])) == df_rows(st)


def test_blocked_link_pairs_blocks_and_verifies(spark):
    """Linkage candidates form only WITHIN a block, each unordered pair
    once, and the levenshtein verify gates the output
    (operators/linkage.py:blocked_link_pairs)."""
    from python_mozetl_spark.operators.linkage import blocked_link_pairs

    df = spark.createDataFrame(
        [
            (1, "B1", "acme corp"),
            (2, "B1", "acme core"),   # dist 1 from id 1
            (3, "B1", "zzz totally different"),
            (4, "B2", "acme corp"),   # identical text, OTHER block: no pair
            (5, None, "acme corp"),   # null block key -> its own block
        ],
        ["id", "blk", "name"],
    )
    out = blocked_link_pairs(df, "id", ["blk"], "name", max_dist=2)
    rows = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    assert rows == {(1, 2): 1}


def test_blocked_link_pairs_chunked_equals_unchunked(spark):
    """The bounded_bucket_pairs guard rail is transparent: forcing the
    chunk-grid path (max_block below the block size) yields the same
    link set."""
    from python_mozetl_spark.operators.linkage import blocked_link_pairs

    rows = [(i, "K", f"name number {i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "blk", "name"])
    big = sorted(
        map(tuple, blocked_link_pairs(df, "id", ["blk"], "name", 3).collect())
    )
    chunked = sorted(
        map(
            tuple,
            blocked_link_pairs(df, "id", ["blk"], "name", 3, max_block=3).collect(),
        )
    )
    assert big == chunked and len(big) > 0


def test_run_expectations_rule_semantics(spark):
    """Each expectation kind measures what it claims and applies its
    tolerance (operators/expectations.py)."""
    from python_mozetl_spark.operators.expectations import (
        AcceptedValues,
        InRange,
        NotNull,
        RefIntegrity,
        Unique,
        run_expectations,
    )

    df = spark.createDataFrame(
        [
            (1, "a", 5.0, 10),
            (2, "a", 50.0, 10),   # out of range
            (3, "zz", 5.0, 11),   # bad value, dangling ref
            (3, None, None, 10),  # dup key, nulls
        ],
        ["k", "v", "x", "fk"],
    )
    dim = spark.createDataFrame([(10,), (12,)], ["dk"])
    out = {
        r["rule"]: (r["metric"], r["passed"])
        for r in run_expectations(
            df,
            [
                NotNull("v"),
                Unique(("k",)),
                AcceptedValues("v", ("a", "b"), tolerance=0.5),
                InRange("x", 0, 10),
                RefIntegrity("fk", dim, "dk"),
            ],
        ).collect()
    }
    assert out["not_null(v)"] == (0.25, False)
    assert out["unique(k)"] == (0.25, False)
    # null + 'zz' violate accepted_values, but tolerance 0.5 passes it
    assert out["accepted_values(v)"] == (0.5, True)
    assert out["in_range(x)"] == (0.5, False)   # 50.0 and the null
    assert out["ref_integrity(fk->dk)"] == (0.25, False)


def test_run_expectations_single_scan_plan(spark):
    """However many rules, the fact side is scanned once: rules compile
    into one agg over one (broadcast-joined) frame, no unions."""
    from python_mozetl_spark.operators.expectations import (
        InRange,
        NotNull,
        Unique,
        run_expectations,
    )

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("x")
    )
    rep = run_expectations(
        df, [NotNull("k"), Unique(("k",)), InRange("x", 0, 6), NotNull("x")]
    )
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert rep.count() == 4


def test_snapshot_diff_classifies_and_roundtrips(spark):
    """I/D/U classification with changed-column attribution, and the
    CDC contract: applying the recovered feed to the old snapshot
    reconstructs the new one (operators/merge.py:snapshot_diff)."""
    from python_mozetl_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0)],
        ["k", "s", "p"],
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.5), (4, None, 4.0), (5, "e", 5.0)],
        ["k", "s", "p"],
    )
    d = snapshot_diff(old, new, ["k"], ["s", "p"])
    rows = {r["k"]: (r["change"], r["changed_cols"]) for r in d.collect()}
    assert rows == {
        2: ("U", ["s", "p"]),
        3: ("D", []),
        5: ("I", []),
    }  # k=1 unchanged, k=4 null-safely unchanged -> absent

    # round-trip: old - deleted - updated + (new rows for I/U keys) == new
    feed_keys = d.where(F.col("change") != "D").select("k")
    dropped = d.select("k")
    rebuilt = old.join(dropped, "k", "left_anti").unionByName(
        new.join(feed_keys, "k", "left_semi")
    )
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_run_expectations_rejects_empty_suite(spark):
    import pytest

    from python_mozetl_spark.operators.expectations import run_expectations

    with pytest.raises(ValueError, match="at least one rule"):
        run_expectations(spark.range(3), [])


def test_run_expectations_on_empty_frame_reports_zero_metrics(spark):
    """Zero-row input: metrics are null-safe (0/0 -> null metric) and
    the report still carries every rule."""
    from python_mozetl_spark.operators.expectations import (
        NotNull,
        run_expectations,
    )

    df = spark.range(1).where("id < 0")
    out = run_expectations(df, [NotNull("id")]).collect()
    assert len(out) == 1 and out[0]["rule"] == "not_null(id)"
