"""Graphics telemetry trends — weekly incremental aggregates.

Re-expresses mozetl/graphics/graphics_telemetry_trends.py:233-427: the
reference walks backwards one Sunday-aligned week at a time, appending
to a JSON cache, dropping the trailing incomplete week and re-querying
it next run.  The Spark-native translation:

- the weekly chunking is ONE tumbling-window aggregation
  (`F.window(ts, "1 week", startTime="3 days")` — the 3-day offset
  aligns the 1970-01-01-Thursday epoch origin to Sunday starts, the
  reference's most_recent_sunday, :262-294);
- the cache loop becomes an idempotent merge: new weeks replace
  same-start weeks in the existing table (anti-join + union), the
  trailing incomplete week is dropped by an ``as_of`` bound exactly as
  prepare() pops it (:363-377);
- the same transformation runs under Structured Streaming with a
  watermark for the continuous version (streaming/rollup.py pattern).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 1970-01-01 is a Thursday; +3 days puts tumbling-week starts on Sunday.
_SUNDAY_ALIGN = "3 days"


def weekly_trend(
    df: DataFrame,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    value: str | None = None,
) -> DataFrame:
    """Sunday-aligned weekly counts (and value sums) per dimension."""
    aggs = [F.count(F.lit(1)).alias("total")]
    if value is not None:
        aggs.append(F.round(F.sum(value), 2).alias("sum_value"))
    return (
        df.groupBy(
            F.window(F.col(ts_col), "1 week", startTime=_SUNDAY_ALIGN).alias("w"),
            *dims,
        )
        .agg(*aggs)
        .select(
            F.col("w.start").alias("week_start"),
            F.col("w.end").alias("week_end"),
            *dims,
            *[a_name for a_name in (["total"] + (["sum_value"] if value else []))],
        )
    )


def drop_incomplete_week(trend: DataFrame, as_of) -> DataFrame:
    """Remove the trailing week that ``as_of`` falls inside — the
    reference's incomplete-datapoint pop (:363-377); it gets recomputed
    complete on the next run."""
    return trend.where(F.col("week_end") <= F.lit(as_of))


def merge_trend_cache(existing: DataFrame, fresh: DataFrame,
                      dims: Sequence[str] = ("event_type",)) -> DataFrame:
    """Idempotent cache update: fresh weeks REPLACE same-start weeks
    (left_anti on week_start + union) — re-running a period never
    duplicates it, the overwrite-by-partition model (K1/§2.12)."""
    keep = existing.join(
        fresh.select("week_start").distinct(), "week_start", "left_anti"
    )
    return keep.unionByName(fresh).orderBy("week_start", *dims)


def run_weekly_trends(
    events: DataFrame,
    existing: DataFrame | None,
    as_of,
    ts_col: str = "ts",
    dims: Sequence[str] = ("event_type",),
    value: str | None = None,
) -> DataFrame:
    """Full incremental run: aggregate → drop incomplete tail → merge."""
    fresh = drop_incomplete_week(weekly_trend(events, ts_col, dims, value), as_of)
    if existing is None:
        return fresh.orderBy("week_start", *dims)
    return merge_trend_cache(existing, fresh, dims)
