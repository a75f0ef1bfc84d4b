"""Arbitrary-stateful streaming: per-key running accumulators.

The reference's graphics trends job keeps an incremental JSON cache of
weekly aggregates, re-read and extended every run
(mozetl/graphics/graphics_telemetry_trends.py:233-294,337-427).  The
streaming-native translation is arbitrary stateful processing: per-key
state that survives micro-batches, updated as events arrive —
``applyInPandasWithState`` (Arrow-batched, state is a tiny tuple per
key, scales with |keys| not |events|).

On a 1000-executor cluster the state store shards by the grouping key;
the per-batch work is one shuffle on that key plus O(batch) updates.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals_stream(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Running (n_events, sum_value) per key across all micro-batches.

    Each batch emits the UPDATED cumulative totals for keys seen in
    that batch (update semantics); state never expires (the trend-cache
    model).  Use ``outputMode("update")``.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "sum_value": [round(total, 2)]}
        )

    # derive the key's output type from the INPUT schema (a hardcoded
    # `long` broke every non-long key at Arrow conversion)
    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """The batch twin: what the stream's state converges to after all
    input is processed."""
    from pyspark.sql import functions as F

    return events.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
    )
