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
