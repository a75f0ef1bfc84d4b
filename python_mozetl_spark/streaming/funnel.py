"""Streaming ordered-funnel tracking — the Structured Streaming twin of
``operators/timeseries.py:funnel_counts``.

Per-user state is the CAPPED step-event buffer (earliest
``max_events_per_step`` events per step level — the same prefix the
batch greedy walk consumes), re-folded on every update.  Keeping the
buffer rather than just (depth, last_ts) makes the operator robust to
OUT-OF-ORDER arrival across micro-batches: a late step-1 event that
predates the current match can still deepen the funnel, exactly as it
would in batch.  Greedy depth is monotone in the event set (adding an
event can only move matches earlier or extend them), so BELOW THE CAP
each user's emitted depth only grows and the final emission equals
the batch answer once all input is processed — pytest pins this twin
equality across forced multi-batch runs.  At or above the cap both
twins are approximate (see ``funnel_counts`` CAP SEMANTICS), and the
streaming side additionally admits depth regressions: a late-arriving
EARLIER event can evict a previously-matched event from the capped
buffer, re-folding to a shallower walk.

Scale: state is O(|users| × steps × cap) — sharded by the grouping key
across the cluster's state store; per batch one shuffle on the user
key plus O(batch) Arrow-batched python work.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def funnel_depth_stream(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_events_per_step: int = 1000,
) -> DataFrame:
    """Per-user funnel depth updates (``outputMode("update")``): one
    ``(user, depth)`` row per user per batch in which the user appears.

    The output schema carries the INPUT's user-column type (any
    orderable Spark type works as a grouping key), and timestamps are
    normalized to int64 ns-or-native ticks once, by the input column's
    Arrow dtype — the stream's schema is fixed, so every micro-batch
    folds the same unit into state.
    """
    step_idx = {s: i + 1 for i, s in enumerate(steps)}
    user_type = events.schema[user_col].dataType.simpleString()

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ts_buf, s_buf = ([], []) if not state.exists else (
            list(state.get[0]),
            list(state.get[1]),
        )
        buf = list(zip(ts_buf, s_buf))
        for pdf in pdfs:
            hits = pdf[pdf[type_col].isin(step_idx)]
            # int64 ticks: ordering and strict comparisons are what the
            # walk needs, not wall-clock rendering.  datetime64 columns
            # normalize to ns explicitly (not a silent astype) so the
            # stored unit can't drift from numeric inputs' native unit.
            ts_vals = hits[ts_col]
            if pd.api.types.is_datetime64_any_dtype(ts_vals):
                ts_vals = ts_vals.astype("datetime64[ns]").astype("int64")
            else:
                ts_vals = ts_vals.astype("int64")
            for tsv, et in zip(ts_vals, hits[type_col]):
                buf.append((int(tsv), step_idx[et]))
        buf.sort()  # (ts, step): lower step first at ties, like array_sort
        capped, per_step = [], {}
        for tsv, s in buf:
            c = per_step.get(s, 0)
            if c < max_events_per_step:
                capped.append((tsv, s))
                per_step[s] = c + 1
        depth, at = 0, None
        for tsv, s in capped:
            if s == depth + 1 and (at is None or tsv > at):
                depth, at = depth + 1, tsv
        state.update(([t for t, _ in capped], [s for _, s in capped]))
        yield pd.DataFrame({user_col: [key[0]], "depth": [depth]})

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=f"{user_col} {user_type}, depth integer",
        stateStructType="ts array<long>, s array<int>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
