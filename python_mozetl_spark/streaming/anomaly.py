"""Streaming rolling z-score anomaly detection — the stateful twin of
``operators/timeseries.py:rolling_zscore_anomalies``.

Per key, the state is the trailing daily series itself (two parallel
arrays: epoch day → running total), bounded by ``retain_days``; each
micro-batch folds its partial day totals into the series — so a day
split across batches, or arriving LATE, still converges to the same
total the batch operator computes — and re-emits the key's CURRENT
anomaly set (update semantics: the latest emission per key is
authoritative).  After all input is consumed the final emissions equal
the batch operator over everything seen, as long as the data span fits
``retain_days`` — the equality the batch-twin test pins across
out-of-order micro-batches.

State per key is ≤ ``retain_days`` (day, total) entries regardless of
event volume — the monitor-forever shape.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _score(
    days: list[int],
    totals: list[float],
    window_days: int,
    z_thresh: float,
    min_periods: int,
    precision: int,
) -> tuple[list[int], list[float], list[float]]:
    """Trailing-window z-scores over the OBSERVED daily series (row
    frame, same semantics as the batch window).  Returns the anomalous
    (day, day_value, zscore) triples."""
    order = np.argsort(days)
    d = np.asarray(days)[order]
    v = np.asarray(totals, dtype="float64")[order]
    s = pd.Series(v)
    roll = s.rolling(window=window_days, min_periods=1)
    mu, sd, n = roll.mean().to_numpy(), roll.std(ddof=1).to_numpy(), roll.count().to_numpy()
    ok = (n >= min_periods) & np.isfinite(sd) & (sd > 0)
    z = np.zeros_like(v)
    z[ok] = np.round((v[ok] - mu[ok]) / sd[ok], precision)
    hit = ok & (np.abs(z) > z_thresh)
    return (
        d[hit].tolist(),
        np.round(v[hit], precision).tolist(),
        z[hit].tolist(),
    )


def zscore_anomalies_stream(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    window_days: int = 7,
    z_thresh: float = 2.0,
    min_periods: int = 3,
    precision: int = 6,
    retain_days: int = 370,
) -> DataFrame:
    """Running anomaly flags per key; emit-on-update.  Output schema
    matches the batch operator: (key, day DATE, day_value, zscore) —
    each emission is the key's full current anomaly set."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        series: dict[int, float] = {}
        if state.exists:
            sd_days, sd_totals = state.get
            series = dict(zip(sd_days, sd_totals))
        for pdf in pdfs:
            ts = pdf[ts_col]
            if ts.dtype == object or str(ts.dtype).startswith("datetime"):
                day = ts.astype("datetime64[ns]").dt.floor("D").astype("int64") // 86_400_000_000_000
            else:  # already numeric epoch-ns
                day = ts.astype("int64") // 86_400_000_000_000
            for dy, val in zip(day.tolist(), pdf[value_col].tolist()):
                series[dy] = series.get(dy, 0.0) + float(val)
        if series:
            horizon = max(series) - retain_days
            series = {d: t for d, t in series.items() if d > horizon}
        state.update((list(series.keys()), list(series.values())))
        days, vals, zs = _score(
            list(series.keys()), list(series.values()),
            window_days, z_thresh, min_periods, precision,
        )
        yield pd.DataFrame(
            {
                key_col: [key[0]] * len(days),
                "day": pd.to_datetime(pd.Series(days, dtype="int64") * 86_400_000_000_000).dt.date,
                "day_value": pd.Series(vals, dtype="float64"),
                "zscore": pd.Series(zs, dtype="float64"),
            }
        )

    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=(
            f"{key_col} {key_type}, day date, day_value double, zscore double"
        ),
        stateStructType="days array<long>, totals array<double>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
