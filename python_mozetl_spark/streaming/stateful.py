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


def decayed_totals_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: float = 7.0,
) -> DataFrame:
    """Per-key exponentially time-decayed running value — the
    streaming twin of ``operators/timeseries.py:decayed_sum``: each
    event contributes ``value * 0.5 ** (age_days / half_life)`` with
    age measured from the KEY'S newest event seen so far.

    State is (ref_epoch, total_at_ref, n) per key; on every batch the
    prior total is re-decayed to the new reference instant and the
    batch's events fold in at their own ages.  Because
    ``decay(a+b) = decay(a)·decay(b)``, this incremental form is
    EXACTLY the batch formula regardless of how events split across
    micro-batches — late (out-of-order) events fold in with their
    true age, no watermark needed (they can only under-age the
    reference, never corrupt it).  Use ``outputMode("update")``.

    Emits ``(key, n_events, ref_epoch, decayed_value)`` for keys seen
    in each batch; state scales with |keys|, not |events|.
    """
    hl = float(half_life_days)

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        ref, total, n = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            pdf = pdf[pdf[value_col].notna() & pdf[ts_col].notna()]
            if not len(pdf):
                continue
            # whole-second truncation — the batch twin's epoch recipe
            s = pdf[ts_col].astype("datetime64[s]").astype("int64").to_numpy()
            v = pdf[value_col].to_numpy(dtype=float)
            new_ref = max(ref, int(s.max()))
            total = total * 0.5 ** ((new_ref - ref) / 86400.0 / hl) if n else 0.0
            total += float((v * 0.5 ** ((new_ref - s) / 86400.0 / hl)).sum())
            n += len(pdf)
            ref = new_ref
        state.update((ref, total, n))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_events": [n],
                "ref_epoch": [ref],
                "decayed_value": [round(total, 4)],
            }
        )

    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, n_events long, ref_epoch long, "
            "decayed_value double"
        ),
        stateStructType="ref long, total double, n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_decayed_totals(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    half_life_days: float = 7.0,
) -> DataFrame:
    """The batch twin: what ``decayed_totals_stream``'s state
    converges to — per-key decayed sum referenced to the KEY'S newest
    event (`decayed_sum` uses the corpus-global instant instead)."""
    from pyspark.sql import functions as F

    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    e = (
        events.where(F.col(value_col).isNotNull() & F.col(ts_col).isNotNull())
        .select(F.col(key_col), epoch.alias("__s"), F.col(value_col).alias("__v"))
        .localCheckpoint(eager=False)  # two consumers: ref + the weighted agg
    )
    ref = e.groupBy(key_col).agg(F.max("__s").alias("__ref"))
    w = F.pow(
        F.lit(0.5),
        (F.col("__ref") - F.col("__s")) / 86400.0 / float(half_life_days),
    )
    return (
        e.join(ref, key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("__ref").alias("ref_epoch"),
            F.round(F.sum(F.col("__v") * w), 4).alias("decayed_value"),
        )
    )
