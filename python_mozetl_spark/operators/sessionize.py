"""Sessionization — gap-based session assignment over an event stream.

Not in the reference (its "sessions" arrive pre-cut as subsessions);
added as a first-class operator because event pipelines need it.  Pure
window composition: flag gap-starts with ``lag``, running-sum the flags
into session ids — one shuffle on the key.  The streaming twin is
``F.session_window`` in streaming/rollup.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign a per-key session index (1-based, in time order).

    A new session starts when the gap to the previous event is
    > ``gap_seconds``.  ``tiebreak`` makes ordering total when
    timestamps can tie.
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak)] if tiebreak else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    # ntz → ltz (UTC session) → long truncates to whole epoch seconds.
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    new_flag = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_flag).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("bigint"),
    )


def session_attribution(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session conversion attribution: one row per session with
    its FIRST-touch and LAST-touch-before-conversion channel and the
    session's total conversion value.

    Marketing-analytics composition over :func:`sessionize`: the
    deterministic ``min_by``/``max_by`` pair picks the touch events
    (non-conversion events ordered by (ts, tiebreak)); conversions
    aggregate conditionally.  One key shuffle total — the session
    window and the session agg share the same partitioning, so
    Catalyst reuses the exchange.

    Output: keys..., session_id, first_touch, last_touch, n_events,
    conv_count, conv_value (sessions with no conversion keep 0 /
    nulls are kept — the caller filters).
    """
    s = sessionize(df, keys, ts_col, gap_seconds, tiebreak, "session_id")
    is_conv = F.col(type_col) == conversion_type
    # min/max over an ordered struct: aggregate-NULL-skipping is
    # guaranteed (unlike min_by with a NULL ordering key), and struct
    # comparison is lexicographic in Spark and DuckDB alike.
    touch = F.when(
        ~is_conv,
        F.struct(
            F.col(ts_col).alias("ts"),
            *([F.col(tiebreak).alias("tb")] if tiebreak else []),
            F.col(type_col).alias("ty"),
        ),
    )
    return s.groupBy(*keys, "session_id").agg(
        F.min(touch).getField("ty").alias("first_touch"),
        F.max(touch).getField("ty").alias("last_touch"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(is_conv.cast("bigint")).cast("bigint").alias("conv_count"),
        F.coalesce(
            F.sum(F.when(is_conv, F.col(value_col))), F.lit(0.0)
        ).alias("conv_value"),
    )
