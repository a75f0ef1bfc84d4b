"""As-of join — an operator the reference lacks (SURVEY.md §2.5 notes
"not present"), added because event-time pipelines need it.

Semantics: for each left row, attach the payload of the latest right
row with the same key whose (order, tiebreak) precedes the left row's
strictly (lexicographic).  Implemented as union + IGNORE NULLS last()
over one ordered window — ONE shuffle on the key, no range join, no
per-key driver loop.  This is the 100 TB-safe formulation: a naive
``left.join(right, right.ts <= left.ts)`` is a quadratic range join;
the window formulation is linear in partition size after one sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    order: str,
    tiebreak: str,
    payload: Sequence[str],
    prefix: str = "prev_",
) -> DataFrame:
    """Attach ``prefix+payload`` columns from the most recent preceding
    ``right`` row (same ``on`` keys, ordered by (order, tiebreak)).

    Left rows with no preceding right row get nulls.  Rows from
    ``right`` never appear in the output.
    """
    on = list(on)
    lcols = left.columns
    l = left.select(*lcols, F.lit(1).alias("__is_left"))
    r = right.select(
        *on,
        F.col(order),
        F.col(tiebreak),
        *[F.col(c) for c in payload if c not in on + [order, tiebreak]],
        F.lit(0).alias("__is_left"),
    )
    # Align schemas: left gets null payload carriers, right gets null
    # for left-only columns.
    payload_marked = [f"__p_{c}" for c in payload]
    l = l.withColumns({p: F.lit(None).cast(right.schema[c].dataType)
                       for p, c in zip(payload_marked, payload)})
    r2 = r.withColumns({p: F.col(c) for p, c in zip(payload_marked, payload)})
    lonly = [c for c in lcols if c not in on + [order, tiebreak]]
    r2 = r2.withColumns({c: F.lit(None).cast(left.schema[c].dataType) for c in lonly})
    unioned = l.unionByName(r2.select(*l.columns))

    # Order LEFT rows before right rows at identical (order, tiebreak):
    # the frame ends 1 PRECEDING, so a right row tied with the left row
    # then falls AFTER it and is NOT matched — strict precedence.
    # (Ascending __is_left had it backwards: the tied right row sorted
    # first, landed inside the preceding frame, and was matched.)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(order), F.col(tiebreak), F.col("__is_left").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    filled = unioned.withColumns(
        {
            f"{prefix}{c}": F.last(F.col(p), ignorenulls=True).over(w)
            for p, c in zip(payload_marked, payload)
        }
    )
    return filled.where(F.col("__is_left") == 1).select(
        *lcols, *[f"{prefix}{c}" for c in payload]
    )
