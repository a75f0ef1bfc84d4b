"""Streaming quantiles: the log-bucket histogram sketch as per-key
stream state.

Why this exists: percentile monitoring over an unbounded stream cannot
sort, and the classic streaming digests (t-digest, KLL) make the state
float-order-dependent.  The log-bucket histogram
(ext/sketches.py:log_histogram) is MERGEABLE with pure-integer state,
so the streaming fold is exact sketch algebra: each micro-batch's
bucket counts SUM into the per-key state dict, and the read-out after
any batch equals the batch sketch over everything seen so far — the
equality the batch-twin test pins.

State per key is the live bucket set (≤ ~2k entries at subbits=5
whatever the value range), stored as two parallel long arrays.  The
bucket function here is the same integer formula as the batch/SQL
sides (bit-length + shifts, NumPy-vectorized over each Arrow batch).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _bucket_lo_np(v: np.ndarray, subbits: int) -> np.ndarray:
    """Vectorized twin of ext/sketches.py:log_bucket (non-negative
    int64 input).  float log2 seeds the bit length; two integer
    corrections pin the boundary cases exactly."""
    v = v.astype(np.int64)
    pos = v > 0
    bl = np.zeros_like(v)
    bl[pos] = np.floor(np.log2(v[pos])).astype(np.int64) + 1
    one = np.int64(1)
    bl = np.where(pos & (np.left_shift(one, bl) <= v), bl + 1, bl)
    bl = np.where(pos & (bl > 0) & (np.left_shift(one, bl - 1) > v), bl - 1, bl)
    shift = np.maximum(0, bl - (subbits + 1))
    return np.left_shift(np.right_shift(v, shift), shift)


def _quantile_row(
    key_col: str,
    key: object,
    hist: dict[int, int],
    qs: Sequence[float],
) -> pd.DataFrame:
    n = sum(hist.values())
    out: dict[str, list] = {key_col: [key], "n": [n]}
    items = sorted(hist.items())
    for q in qs:
        target = -(-q * n // 1)  # ceil
        cum, est = 0, items[-1][0] if items else 0
        for lo, c in items:
            cum += c
            if cum >= target:
                est = lo
                break
        out[f"p{int(round(q * 100))}"] = [est]
    return pd.DataFrame(out)


def histogram_quantiles_stream(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "cents",
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    subbits: int = 5,
) -> DataFrame:
    """Running per-key quantile estimates; emit-on-update semantics.

    After every micro-batch each touched key emits its current
    (n, p50, p90, p99) — identical to the batch sketch over the full
    prefix, because histogram merge is exact integer addition.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        hist: dict[int, int] = {}
        if state.exists:
            b, c = state.get
            hist = dict(zip(b, c))
        for pdf in pdfs:
            los, cnts = np.unique(
                _bucket_lo_np(pdf[value_col].to_numpy(), subbits),
                return_counts=True,
            )
            for lo, c in zip(los.tolist(), cnts.tolist()):
                hist[lo] = hist.get(lo, 0) + c
        state.update((list(hist.keys()), list(hist.values())))
        yield _quantile_row(key_col, key[0], hist, qs)

    qcols = ", ".join(f"p{int(round(q * 100))} long" for q in qs)
    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=f"{key_col} {key_type}, n long, {qcols}",
        stateStructType="buckets array<long>, counts array<long>",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_histogram_quantiles(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "cents",
    qs: Sequence[float] = (0.5, 0.9, 0.99),
    subbits: int = 5,
) -> DataFrame:
    """The batch twin: what every key's stream emission converges to
    once all input is processed (same sketch, same read-out)."""
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.sketches import (
        histogram_quantiles,
        log_histogram,
    )

    est = histogram_quantiles(
        log_histogram(df, value_col, [key_col], subbits), list(qs), [key_col]
    )
    agg = [
        F.max(
            F.when(F.col("q") == float(q), F.col("est"))
        ).alias(f"p{int(round(q * 100))}")
        for q in qs
    ]
    return est.groupBy(key_col).agg(F.max("n").alias("n"), *agg)


def cm_sketch_stream(
    events: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Streaming Count-Min sketch: the counter table ``(d, bucket,
    cnt)`` maintained as a NATIVE streaming aggregation (complete
    mode) — no custom state needed, because CM counters are pure sums:
    each row fans out to its ``depth`` addressed counters
    (ext/sketches.py:cm_bucket_structs, the same md5 addressing as the
    batch build) and the state store does the merge.

    After any prefix of micro-batches the emitted table equals the
    batch ``cm_sketch`` over the same prefix (exact integer sums —
    the batch-twin test pins it).  State is ≤ width×depth rows
    regardless of stream volume; the classic monitor-forever shape.
    """
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.sketches import cm_bucket_structs

    fanned = events.select(
        F.explode(cm_bucket_structs(key_col, width, depth)).alias("__db")
    )
    return fanned.groupBy(
        F.col("__db.d").alias("d"), F.col("__db.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


def mg_heavy_hitters_stream(
    events,
    col: str,
    k: int = 8,
    num_shards: int = 16,
    salt: str = "mgs",
):
    """Sharded streaming Misra-Gries frequent items: each value
    routes to shard ``md5(salt|value) % num_shards`` — a value lives
    in exactly ONE shard, so its shard count IS its global count —
    and each shard keeps at most ``k`` MG counters as
    ``applyInPandasWithState`` state across micro-batches.

    Contract (the MG guarantee, carried over batches): after any
    prefix of the stream, every value with true count
    > n_shard/(k+1) survives in its shard's counters, and each
    counter c_v satisfies ``true - n_shard/(k+1) <= c_v <= true``.
    Counters are NOT merge-order-invariant (reductions happen at
    micro-batch boundaries), so this operator is pytest-guaranteed
    against the bound — exactly like the batch
    ``ext/sketches.py:mg_candidates`` it extends — not hash-graded.

    Emits, per batch per shard touched, the current survivors:
    ``(shard, value, count_lb, n_shard)``.  Use
    ``outputMode("update")``; state per shard is <= k (value, count)
    pairs — |shards| x k counters total at any scale.
    """
    from pyspark.sql import functions as F

    from python_mozetl_spark.functions import hashing as H

    import json

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # counters ride a JSON string: an MG reduction can legally
        # empty the set, and empty-ARRAY state columns do not survive
        # the store round-trip (the shard would silently restart)
        if state.exists:
            js, n = state.get
            counters = pd.Series(json.loads(js), dtype="int64")
        else:
            counters, n = pd.Series(dtype="int64"), 0
        for b in pdfs:
            vc = b[col].dropna().value_counts()
            n += int(vc.sum())
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        counters = counters.astype("int64")
        state.update(
            (json.dumps({str(v): int(c) for v, c in counters.items()}), n)
        )
        # always emit >= 1 row per touched shard — a reduction can
        # empty the survivors, and downstream still needs to see the
        # advanced n_shard (value NULL marks the no-survivor state)
        vals_out = [str(v) for v in counters.index] or [None]
        cnts_out = [int(c) for c in counters] or [0]
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(vals_out),
                "value": vals_out,
                "count_lb": cnts_out,
                "n_shard": [n] * len(vals_out),
            }
        )

    shard = (
        H.md5_int64(F.concat_ws("|", F.lit(salt), F.col(col).cast("string")))
        % num_shards
    ).cast("int")
    return (
        # cast to string BEFORE the stateful fold: state counters
        # round-trip through JSON with string keys, so a native-typed
        # batch index (42 vs "42") would split counts across batches
        # and void the MG bound.  Matches the shard-routing cast.
        events.where(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias(col), shard.alias("shard"))
        .groupBy("shard")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "shard int, value string, count_lb long, n_shard long"
            ),
            stateStructType="js string, n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
