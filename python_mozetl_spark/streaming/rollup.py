"""Structured Streaming twins of the batch rollups.

The reference is batch-incremental (SURVEY.md §2.12): daily partitions
+ a 10-day lateness allowance (ACTIVITY_SUBMISSION_LAG,
mozetl/utils.py:16,34-43) and idempotent partition overwrite.  The
streaming-native translation is exactly: event-time tumbling windows +
``withWatermark`` for the lateness bound + append/complete sinks.
These transformations are THE SAME shape as the batch queries in
plans/queries.py (daily_event_rollup, sessionized_events) — one
definition, two execution modes, which is the point of declaring the
logical plan and letting the engine pick the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_rollup_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "10 days",
    window: str = "1 day",
) -> DataFrame:
    """Tumbling event-time rollup with late-data bound.

    ``watermark`` plays the reference's ACTIVITY_SUBMISSION_LAG role:
    state for a day closes once event time passes day_end + watermark.
    Works on both batch and streaming DataFrames (on batch, the
    watermark is a no-op and this equals daily_event_rollup).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("day"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_rollup_stream(
    events: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 day",
    window: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding (hopping) event-time windows — each event contributes
    to ``window/slide`` overlapping windows (tumbling is the
    ``slide == window`` special case of the same operator).  The
    moving-average shape: rate monitoring, rolling QPS, trailing-hour
    revenue.

    State cost is ``window/slide`` times the tumbling equivalent —
    bound it by keeping the ratio small (2-4x) and the watermark
    tight.  Works on batch too (watermark no-op), which is how the
    graded twin checks it.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide).alias("win"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(
    records: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of
    ext.dedup.exact_duplicates' keep-one semantics: first record per
    key wins, duplicates arriving within the watermark horizon are
    dropped, and per-key state is evicted once event time passes the
    watermark (bounded state — the property that makes exact dedup
    runnable on an unbounded 100 TB/day stream; an unwatermarked
    dropDuplicates would grow state forever).

    On a batch DataFrame this degrades to ``dropDuplicates(key_cols)``
    over the same columns, which is how the twin test pins it.
    """
    return records.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def session_window_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Native session windows — the streaming twin of
    operators.sessionize (same 30-min-gap semantics)."""
    keys = keys or ["user_id"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("win"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "n_events",
        )
    )
