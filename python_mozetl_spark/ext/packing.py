"""Sequence packing for LLM training data.

The concat-and-chunk operation: documents are laid end-to-end in a
deterministic order and sliced into fixed-capacity context windows
("chunks"); a document spanning a boundary contributes tokens to both
neighboring chunks.  This is how training pipelines fill context
windows without padding waste — and it is pure window algebra:

    cumsum of token counts → a doc occupies the half-open token
    interval [cumsum − n, cumsum) → it intersects chunks
    floor((cumsum−n)/cap) .. floor((cumsum−1)/cap) → explode that
    chunk range, clip the interval to each chunk.

One window over the ordering + one explode — no Python, no state.

Scale note: the cumsum needs a total order; a single global window is
one partition.  Pass ``shard_col`` to pack within shards instead
(standard practice — shards are written to separate files anyway), and
the window partitions by shard: fully parallel, same semantics per
shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    tokens_col: str,
    order_col: str,
    cap: int,
    shard_col: str | None = None,
) -> DataFrame:
    """(shard?, chunk_id, <order_col>, n_tokens, chunk_tokens,
    begin_offset) — one row per (document, chunk) intersection.

    ``chunk_tokens`` is how many of the doc's tokens land in that
    chunk; every chunk's total is exactly ``cap`` except the final
    partial chunk per shard.  Zero-token docs are dropped (they occupy
    no interval).
    """
    shard_keys = [shard_col] if shard_col else []
    w = Window.partitionBy(*shard_keys).orderBy(order_col)
    n = F.col(tokens_col).cast("bigint")
    d = (
        docs.where(n > 0)
        .withColumn("__end", F.sum(n).over(w))
        .withColumn("__begin", F.col("__end") - n)
    )
    first_chunk = F.floor(F.col("__begin") / cap)
    last_chunk = F.floor((F.col("__end") - 1) / cap)
    exploded = d.select(
        *shard_keys,
        F.col(order_col),
        n.alias("n_tokens"),
        F.col("__begin"),
        F.col("__end"),
        F.explode(F.sequence(first_chunk, last_chunk)).alias("chunk_id"),
    )
    chunk_lo = F.col("chunk_id") * cap
    chunk_hi = chunk_lo + cap
    return exploded.select(
        *shard_keys,
        "chunk_id",
        order_col,
        "n_tokens",
        (F.least(F.col("__end"), chunk_hi) - F.greatest(F.col("__begin"), chunk_lo))
        .cast("bigint")
        .alias("chunk_tokens"),
        (F.greatest(F.col("__begin"), chunk_lo) - chunk_lo)
        .cast("bigint")
        .alias("begin_offset"),
    )
