"""Streaming joins (SURVEY §2.12 extension).

The reference enriches batch facts with dimension tables and pairs
fact streams by key+time windows (its batch-incremental shape); the
Structured Streaming natives are:

- :func:`enrich_stream` — stream-static join: every micro-batch joins
  against the current dimension snapshot, dimension broadcast exactly
  like the batch star joins (J4).
- :func:`interval_join_stream` — stream-stream inner join on an
  equi-key plus an event-time range; BOTH sides carry watermarks so
  Spark can bound the join state (buffered rows are evicted once
  event time passes watermark + range width).  Without the watermarks
  a stream-stream join buffers forever — the unbounded-state hazard
  this module exists to encode.

Both are mode-agnostic: on batch inputs the watermark step is skipped
(batch has no state to bound) and the IDENTICAL join runs — the
one-definition-two-modes property the twin tests pin, and the same
shape as the batch `order_burst_interval_join` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame, dim: DataFrame, keys: list[str], how: str = "left"
) -> DataFrame:
    """Stream-static dimension enrichment with an explicit broadcast
    of the static side (at 100 TB/day the stream never shuffles for a
    dimension lookup)."""
    return stream.join(F.broadcast(dim), keys, how)


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_delay: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join of two event streams on ``key_col`` where the right event
    lands within ``[left_ts, left_ts + max_delay]`` — the
    click→conversion attribution shape.

    ``how="leftOuter"`` gives the UNCONVERTED-clicks variant: a left
    row with no right match is emitted with NULL right columns, but —
    the Structured Streaming contract worth stating — only once the
    watermark passes ``left_ts + max_delay``, because until then a
    matching right event could still arrive.  Outer results therefore
    trail the watermark by the range width; a drained finite stream
    (availableNow) emits them only if a LATER micro-batch advances the
    watermark past the row's horizon (the twin test pins exactly this
    with sentinel batches).  Same state bound as the inner form: both
    sides buffer watermark + range width.

    Output columns are prefix-renamed so the same pair of frames can
    carry identical column names (both sides are usually the same
    event schema).
    """
    l_side, r_side = left, right
    if l_side.isStreaming:
        l_side = l_side.withWatermark(left_ts, watermark)
    if r_side.isStreaming:
        r_side = r_side.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key_col}") == F.col(f"r.{key_col}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    out = [F.col(f"l.{c}").alias(f"{left_prefix}{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(f"{right_prefix}{c}") for c in right.columns
    ]
    return l_side.alias("l").join(r_side.alias("r"), cond, how).select(*out)
