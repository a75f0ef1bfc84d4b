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
