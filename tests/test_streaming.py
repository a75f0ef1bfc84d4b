"""Structured Streaming twins: run the SAME transformation on a file
stream (availableNow trigger → memory sink) and verify it matches the
batch result — the one-definition-two-modes property."""

import tempfile

from pyspark.sql import functions as F

from python_mozetl_spark.streaming import daily_rollup_stream, session_window_stream


def _events(spark):
    rows = [
        (1, "2024-01-01 00:05:00", 100, "click", 1.0),
        (2, "2024-01-01 00:10:00", 100, "click", 2.0),
        (3, "2024-01-02 00:00:30", 100, "view", 3.0),
        (4, "2024-01-01 23:59:00", 200, "click", 4.0),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _run_stream(spark, src_dir, transform, name):
    batch_df = spark.read.parquet(src_dir)
    stream_df = spark.readStream.schema(batch_df.schema).parquet(src_dir)
    q = (
        transform(stream_df)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_daily_rollup_stream_matches_batch(spark):
    with tempfile.TemporaryDirectory() as d:
        _events(spark).write.mode("overwrite").parquet(d)
        got = _run_stream(spark, d, daily_rollup_stream, "daily_rollup_t")
        rows = {(str(r["day"]), r["event_type"]): r for r in got.collect()}
        assert rows[("2024-01-01 00:00:00", "click")]["n_events"] == 3
        assert rows[("2024-01-01 00:00:00", "click")]["sum_value"] == 7.0
        assert rows[("2024-01-02 00:00:00", "view")]["n_events"] == 1
        # batch equivalence: same transform, batch DataFrame
        batch = daily_rollup_stream(spark.read.parquet(d))
        assert sorted(
            [tuple(r) for r in batch.collect()]
        ) == sorted([tuple(r) for r in got.collect()])


def test_sliding_rollup_stream_matches_batch(spark):
    from python_mozetl_spark.streaming import sliding_rollup_stream

    with tempfile.TemporaryDirectory() as d:
        _events(spark).write.mode("overwrite").parquet(d)
        got = _run_stream(spark, d, sliding_rollup_stream, "sliding_rollup_t")
        rows = {(str(r["win_start"]), r["event_type"]): r for r in got.collect()}
        # events 1+2 (00:05, 00:10) land in BOTH [23:30,00:30) and [00:00,01:00)
        assert rows[("2023-12-31 23:30:00", "click")]["n_events"] == 2
        assert rows[("2024-01-01 00:00:00", "click")]["n_events"] == 2
        # event 4 (23:59) → windows starting 23:00 and 23:30
        assert rows[("2024-01-01 23:30:00", "click")]["n_events"] == 1
        # batch equivalence: same transform, batch DataFrame
        batch = sliding_rollup_stream(spark.read.parquet(d))
        assert sorted([tuple(r) for r in batch.collect()]) == sorted(
            [tuple(r) for r in got.collect()]
        )


def test_session_window_stream(spark):
    with tempfile.TemporaryDirectory() as d:
        _events(spark).write.mode("overwrite").parquet(d)
        got = _run_stream(spark, d, session_window_stream, "session_t")
        rows = {(r["user_id"], str(r["session_start"])): r["n_events"]
                for r in got.collect()}
        # events 1+2 within 30min gap → one session of 2
        assert rows[(100, "2024-01-01 00:05:00")] == 2
        assert rows[(100, "2024-01-02 00:00:30")] == 1
        assert rows[(200, "2024-01-01 23:59:00")] == 1


def test_stateful_running_totals_across_microbatches(spark):
    import glob
    import os

    from python_mozetl_spark.streaming import (
        batch_running_totals,
        running_totals_stream,
    )

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        _events(spark).write.mode("overwrite").parquet(src)
        n_files = len(glob.glob(os.path.join(src, "*.parquet")))
        batch_df = spark.read.parquet(src)
        stream_df = (
            spark.readStream.schema(batch_df.schema)
            .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
            .parquet(src)
        )
        q = (
            running_totals_stream(stream_df)
            .writeStream.format("memory")
            .queryName("running_totals_t")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert n_files > 1  # the statefulness actually spanned batches
        # memory sink in update mode appends every emission; totals only
        # grow, so the max-n_events emission per key is the converged one
        emitted = spark.table("running_totals_t").collect()
        final = {}
        for r in emitted:
            cur = final.get(r["user_id"], (-1, 0.0))
            if r["n_events"] > cur[0]:
                final[r["user_id"]] = (r["n_events"], r["sum_value"])
        expect = {
            r["user_id"]: (r["n_events"], r["sum_value"])
            for r in batch_running_totals(_events(spark)).collect()
        }
        assert final == expect


def test_weekly_trend_same_definition_streams(spark):
    # the trends transformation is mode-agnostic: same function, file
    # stream + watermark, equals the batch result
    import os

    from python_mozetl_spark.jobs.graphics_trends import weekly_trend

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        _events(spark).write.mode("overwrite").parquet(src)
        batch = weekly_trend(spark.read.parquet(src))
        stream_df = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            weekly_trend(stream_df.withWatermark("ts", "10 days"))
            .writeStream.format("memory")
            .queryName("weekly_trend_t")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(tuple(map(str, r)) for r in
                     spark.table("weekly_trend_t").collect())
        want = sorted(tuple(map(str, r)) for r in batch.collect())
        assert got == want and len(got) > 0


def test_dedup_stream_drops_in_stream_duplicates(spark):
    from python_mozetl_spark.streaming import dedup_stream

    rows = [
        (1, "2024-01-01 00:05:00", "fp_a"),
        (2, "2024-01-01 00:06:00", "fp_a"),  # dup of fp_a within watermark
        (3, "2024-01-01 00:07:00", "fp_b"),
        (4, "2024-01-01 01:00:00", "fp_a"),  # still within 1-day watermark
    ]
    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(rows, ["rec_id", "ts", "fingerprint"]).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        df.write.mode("overwrite").parquet(d)
        stream_df = spark.readStream.schema(df.schema).parquet(d)
        q = (
            dedup_stream(stream_df, ["fingerprint"])
            .writeStream.format("memory")
            .queryName("dedup_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("dedup_t").collect()
        fps = sorted(r["fingerprint"] for r in got)
        assert fps == ["fp_a", "fp_b"]  # one survivor per key
        # batch twin: same keep-one-per-key cardinality
        batch = spark.read.parquet(d).dropDuplicates(["fingerprint"])
        assert batch.count() == len(got)


def test_enrich_stream_static_broadcast_join(spark):
    import os

    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "passive")], ["event_type", "category"]
    )
    from python_mozetl_spark.streaming import enrich_stream

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        _events(spark).write.mode("overwrite").parquet(src)
        stream_df = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            enrich_stream(stream_df, dim, ["event_type"])
            .writeStream.format("memory")
            .queryName("enrich_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r["event_id"], r["category"]) for r in spark.table("enrich_t").collect()
        )
        batch = sorted(
            (r["event_id"], r["category"])
            for r in enrich_stream(spark.read.parquet(src), dim, ["event_type"]).collect()
        )
        assert got == batch and got[0][1] is not None


def test_interval_join_stream_matches_batch_twin(spark):
    """Stream-stream inner interval join (watermarks on both sides)
    equals the identical join run in batch mode — clicks paired with
    views by the same user within 1 hour."""
    import os

    from python_mozetl_spark.streaming import interval_join_stream

    rows = [
        (1, "2024-01-01 00:05:00", 100, "click", 1.0),
        (2, "2024-01-01 00:40:00", 100, "view", 2.0),  # within 1h of click 1
        (3, "2024-01-01 02:00:00", 100, "view", 3.0),  # outside 1h
        (4, "2024-01-01 00:30:00", 200, "view", 4.0),  # other user
        (5, "2024-01-01 00:20:00", 200, "click", 5.0),
        (6, "2024-01-01 00:50:00", 200, "view", 6.0),  # within 1h of click 5
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with tempfile.TemporaryDirectory() as d:
        clicks_dir, views_dir = os.path.join(d, "c"), os.path.join(d, "v")
        df.where(F.col("event_type") == "click").write.parquet(clicks_dir)
        df.where(F.col("event_type") == "view").write.parquet(views_dir)
        schema = df.schema

        def join_of(c, v):
            return interval_join_stream(
                c, v, "user_id", max_delay="1 hour", watermark="3 hours"
            ).select("l_event_id", "r_event_id")

        q = (
            join_of(
                spark.readStream.schema(schema).parquet(clicks_dir),
                spark.readStream.schema(schema).parquet(views_dir),
            )
            .writeStream.format("memory")
            .queryName("ivj_t")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(tuple(r) for r in spark.table("ivj_t").collect())
        batch = sorted(
            tuple(r)
            for r in join_of(
                spark.read.parquet(clicks_dir), spark.read.parquet(views_dir)
            ).collect()
        )
        assert got == batch == [(1, 2), (5, 4), (5, 6)]


def test_streaming_funnel_matches_batch_across_out_of_order_batches(spark):
    import glob
    import os

    from python_mozetl_spark.operators.timeseries import funnel_counts
    from python_mozetl_spark.streaming import funnel_depth_stream

    steps = ["view", "click", "purchase"]
    rows = [
        # u100 completes all three; the PURCHASE lands in an earlier
        # file than the view half the time (out-of-order across batches)
        (1, "2024-01-01 01:00:00", 100, "view", 0.0),
        (2, "2024-01-01 02:00:00", 100, "click", 0.0),
        (3, "2024-01-01 03:00:00", 100, "purchase", 0.0),
        # u200: click before view -> depth 1 only
        (4, "2024-01-01 00:30:00", 200, "click", 0.0),
        (5, "2024-01-01 01:30:00", 200, "view", 0.0),
        # u300: view only
        (6, "2024-01-01 04:00:00", 300, "view", 0.0),
        # noise event type ignored
        (7, "2024-01-01 05:00:00", 100, "error", 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        # one file per event, shuffled: forces multi-batch out-of-order
        for i, eid in enumerate([3, 6, 1, 4, 7, 2, 5]):
            df.where(F.col("event_id") == eid).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        assert len(glob.glob(os.path.join(src, "*.parquet"))) == 7
        stream_df = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            funnel_depth_stream(stream_df, steps)
            .writeStream.format("memory")
            .queryName("funnel_t")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.table("funnel_t").collect()
        final = {}
        for r in emitted:  # depth is monotone per user: keep the max
            final[r["user_id"]] = max(final.get(r["user_id"], 0), r["depth"])
        assert final == {100: 3, 200: 1, 300: 1}
        # ladder form equals the batch operator
        batch = {
            r["step_idx"]: r["n_users"]
            for r in funnel_counts(df, "user_id", "ts", "event_type", steps).collect()
        }
        ladder = {
            k: sum(1 for v in final.values() if v >= k) for k in (1, 2, 3)
        }
        assert ladder == batch


def test_exactly_once_merge_sink_replay(spark):
    """At-least-once batch delivery + idempotent keyed MERGE =
    exactly-once table state: re-delivering every micro-batch (fresh
    checkpoint over the same source) leaves the table bit-identical."""
    from python_mozetl_spark.streaming import (
        idempotent_merge_batch,
        merge_stream_to_parquet,
    )

    schema = "k int, v string, version int, deleted boolean"

    def table_state(table):
        return sorted(
            (r["k"], r["v"], r["version"])
            for r in spark.read.parquet(table).collect()
        )

    with tempfile.TemporaryDirectory() as d:
        table, src = f"{d}/table", f"{d}/src"
        spark.createDataFrame(
            [(1, "a", 0), (2, "b", 0)], "k int, v string, version int"
        ).write.parquet(table)
        changes = spark.createDataFrame(
            [
                (2, "b2", 1, False),   # update
                (3, "c", 1, False),    # insert
                (1, None, 1, True),    # tombstone delete
                (3, "c9", 1, False),   # same-version duplicate: hash tiebreak
            ],
            schema,
        )
        changes.write.parquet(src)

        def run(ckpt):
            q = merge_stream_to_parquet(
                spark.readStream.schema(schema).parquet(src),
                table,
                ["k"],
                "version",
                delete_col="deleted",
                checkpoint=ckpt,
                available_now=True,
            )
            q.awaitTermination(120)

        run(f"{d}/ckpt1")
        first = table_state(table)
        assert [(k, v) for k, v, _ in first] == [(2, "b2"), (3, first[1][1])]
        assert first[1][1] in ("c", "c9")  # deterministic hash winner
        # full replay: new checkpoint re-delivers every batch
        run(f"{d}/ckpt2")
        assert table_state(table) == first
        # and a third direct double-application of the same batch frame
        fn = idempotent_merge_batch(
            lambda s: s.read.parquet(table),
            lambda df_out: (
                df_out.select("k", "v", "version")
                .write.mode("overwrite")
                .parquet(table + ".swap2"),
                spark.read.parquet(table + ".swap2")
                .write.mode("overwrite")
                .parquet(table),
            ),
            ["k"],
            "version",
            delete_col="deleted",
        )
        fn(changes, 7)
        fn(changes, 7)
        assert table_state(table) == first


def test_streaming_histogram_quantiles_matches_batch_sketch(spark):
    """The streaming quantile sketch converges to the batch sketch: the
    histogram fold is exact integer merge, so each key's final
    emission equals batch_histogram_quantiles over all input
    (streaming/sketch.py)."""
    import glob
    import os

    from python_mozetl_spark.streaming import (
        batch_histogram_quantiles,
        histogram_quantiles_stream,
    )

    rows = [
        (f"t{i % 3}", ((i * 7919) % 100003) + 1) for i in range(3000)
    ]
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        df = spark.createDataFrame(rows, ["event_type", "cents"]).repartition(5)
        df.write.mode("overwrite").parquet(src)
        n_files = len(glob.glob(os.path.join(src, "*.parquet")))
        assert n_files > 1  # statefulness must span micro-batches
        stream_df = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            histogram_quantiles_stream(stream_df)
            .writeStream.format("memory")
            .queryName("hist_quantiles_t")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.table("hist_quantiles_t").collect()
        final = {}
        for r in emitted:  # n only grows; max-n emission is converged
            if r["n"] >= final.get(r["event_type"], (-1,))[0]:
                final[r["event_type"]] = (r["n"], r["p50"], r["p90"], r["p99"])
        expect = {
            r["event_type"]: (r["n"], r["p50"], r["p90"], r["p99"])
            for r in batch_histogram_quantiles(
                spark.createDataFrame(rows, ["event_type", "cents"])
            ).collect()
        }
        assert final == expect


def test_streaming_cm_sketch_matches_batch(spark):
    """The streaming Count-Min counter table converges to the batch
    sketch: counters are pure sums, so the complete-mode emission
    after all micro-batches equals cm_sketch over all input."""
    import glob
    import os

    from python_mozetl_spark.ext.sketches import cm_sketch
    from python_mozetl_spark.streaming import cm_sketch_stream

    rows = [(f"u{i % 23}",) for i in range(500)]
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        df = spark.createDataFrame(rows, ["user"]).repartition(4)
        df.write.mode("overwrite").parquet(src)
        assert len(glob.glob(os.path.join(src, "*.parquet"))) > 1
        stream_df = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            cm_sketch_stream(stream_df, "user", width=16, depth=3)
            .writeStream.format("memory")
            .queryName("cm_stream_t")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r["d"], r["bucket"]): r["cnt"]
            for r in spark.table("cm_stream_t").collect()
        }
        exp = {
            (r["d"], r["bucket"]): r["cnt"]
            for r in cm_sketch(
                spark.createDataFrame(rows, ["user"]), "user", width=16, depth=3
            ).collect()
        }
        assert got == exp


def test_streaming_zscore_anomalies_matches_batch(spark):
    """The stateful anomaly monitor converges to the batch operator
    even when a day's total is SPLIT across micro-batches and days
    arrive out of order: the per-key daily series folds exactly."""
    import datetime
    import glob
    import os

    from python_mozetl_spark.operators.timeseries import rolling_zscore_anomalies
    from python_mozetl_spark.streaming import zscore_anomalies_stream

    base = datetime.datetime(2024, 1, 1, 6, 0, 0)
    rows = []
    for k in ("a", "b"):
        for d in range(14):
            # two partial contributions per day (splits across batches)
            v = 10.0 if not (d == 9 and k == "a") else 500.0  # planted spike
            rows.append((k, base + datetime.timedelta(days=d), v))
            rows.append((k, base + datetime.timedelta(days=d, hours=3), 2.0))
    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt = os.path.join(tmp, "src"), os.path.join(tmp, "ckpt")
        df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
        df.repartition(5).write.parquet(src)
        assert len(glob.glob(os.path.join(src, "*.parquet"))) > 1
        stream_df = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            zscore_anomalies_stream(stream_df, "event_type", "ts", "value")
            .writeStream.format("memory")
            .queryName("zanom_t")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.table("zanom_t").collect()
        # update semantics: last emission batch per key wins; since the
        # memory sink has no batch ids per row, recompute from batch op
        # and check the final set appears and contains the spike
        exp = {
            (r["event_type"], r["day"], r["day_value"], r["zscore"])
            for r in rolling_zscore_anomalies(
                df, "event_type", "ts", "value"
            ).collect()
        }
        got = {
            (r["event_type"], r["day"], r["day_value"], r["zscore"])
            for r in emitted
        }
        assert exp  # the planted spike is an anomaly in the batch op
        assert exp <= got  # final emissions include the converged set
        # nothing emitted for a key/day that the fully-fed batch op
        # does not flag EXCEPT transient flags from prefix states --
        # those must be earlier-day-window artifacts, never the spike
        # day with a different value
        spike = [t for t in exp if t[1].day == 10]
        assert spike and all(t in got for t in spike)


def test_stateful_decayed_totals_across_microbatches(spark):
    """The incremental re-decay state converges to the batch twin's
    per-key decayed sum regardless of micro-batch splits, including a
    late (out-of-order) event in a later file."""
    import glob
    import os

    from datetime import datetime as dt

    from python_mozetl_spark.streaming import (
        batch_decayed_totals,
        decayed_totals_stream,
    )

    rows = [
        # user 1: spread over 2 weeks + a LATE event written last
        (1, dt(2024, 1, 1, 12), 10.0),
        (1, dt(2024, 1, 8, 12), 10.0),
        (1, dt(2024, 1, 15, 12), 10.0),
        (1, dt(2024, 1, 4, 12), 6.0),    # late arrival
        # user 2: single event; value NULL row must be ignored
        (2, dt(2024, 1, 10), 4.0),
        (2, dt(2024, 1, 11), None),
    ]
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        batch = spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        )
        batch.repartition(4).write.mode("overwrite").parquet(src)
        n_files = len(glob.glob(os.path.join(src, "*.parquet")))
        stream_df = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            decayed_totals_stream(stream_df, half_life_days=7.0)
            .writeStream.format("memory")
            .queryName("decayed_totals_t")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert n_files > 1
        final = {}
        for r in spark.table("decayed_totals_t").collect():
            cur = final.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                final[r["user_id"]] = (
                    r["n_events"], r["ref_epoch"], r["decayed_value"]
                )
        expect = {
            r["user_id"]: (r["n_events"], r["ref_epoch"], r["decayed_value"])
            for r in batch_decayed_totals(
                spark.read.parquet(src), half_life_days=7.0
            ).collect()
        }
        assert final == expect
        assert final[1][0] == 4 and final[2][0] == 1


def test_streaming_mg_heavy_hitters_guarantee(spark):
    """Across micro-batches, every value with true count >
    n_shard/(k+1) survives in its shard's final counters, and every
    counter is a lower bound within n_shard/(k+1) of the truth."""
    import glob
    import os
    from collections import Counter

    from python_mozetl_spark.streaming import mg_heavy_hitters_stream

    # skewed stream: a few heavy values + a long tail
    vals = (["hh1"] * 300 + ["hh2"] * 200 + ["mid"] * 40
            + [f"t{i}" for i in range(200)])
    rows = [(i, v) for i, v in enumerate(vals)]
    with tempfile.TemporaryDirectory() as d:
        src, ckpt = os.path.join(d, "src"), os.path.join(d, "ckpt")
        batch = spark.createDataFrame(rows, "i long, v string")
        batch.repartition(5).write.mode("overwrite").parquet(src)
        assert len(glob.glob(os.path.join(src, "*.parquet"))) > 1
        stream_df = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        k, shards = 4, 8
        q = (
            mg_heavy_hitters_stream(stream_df, "v", k=k, num_shards=shards)
            .writeStream.format("memory")
            .queryName("mg_hh_t")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        emitted = spark.table("mg_hh_t").collect()
        # final emission per shard = the one with the largest n_shard
        final_n, final_rows = {}, {}
        for r in emitted:
            if r["n_shard"] >= final_n.get(r["shard"], -1):
                if r["n_shard"] > final_n.get(r["shard"], -1):
                    final_rows[r["shard"]] = {}
                final_n[r["shard"]] = r["n_shard"]
                if r["value"] is not None:  # NULL = no-survivor sentinel
                    final_rows[r["shard"]][r["value"]] = r["count_lb"]
        # truth per shard, replaying the same md5 routing
        from python_mozetl_spark.functions import hashing as H
        from pyspark.sql import functions as F

        routed = (
            batch.select(
                "v",
                (H.md5_int64(F.concat_ws("|", F.lit("mgs"), F.col("v")))
                 % shards).cast("int").alias("shard"),
            ).collect()
        )
        truth, n_shard = {}, Counter()
        for r in routed:
            truth.setdefault(r["shard"], Counter())[r["v"]] += 1
            n_shard[r["shard"]] += 1
        for sh, counts in truth.items():
            bound = n_shard[sh] / (k + 1)
            got = final_rows.get(sh, {})
            assert final_n.get(sh) == n_shard[sh]
            for v, c in counts.items():
                if c > bound:
                    assert v in got, (sh, v, c, bound)
                if v in got:
                    assert c - bound <= got[v] <= c, (sh, v, got[v], c)
        # the two planted heavy hitters must always survive
        all_survivors = {v for rows_ in final_rows.values() for v in rows_}
        assert {"hh1", "hh2"} <= all_survivors
