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
    # ROWS frame, not the default RANGE: with RANGE, tied order_col
    # values are frame PEERS and would share one cumsum — overlapping
    # token intervals, chunks over cap.  ROWS gives every row its own
    # prefix regardless of ties (tie order within equal keys is then
    # partition-order-dependent; use a unique order_col when chunk
    # assignment itself must be reproducible).
    w = (
        Window.partitionBy(*shard_keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
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


def sliding_window_chunks(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Within-document overlapping token windows — the RAG/indexing
    chunker (complement of :func:`pack_sequences`, which packs ACROSS
    documents; this slides WITHIN one).

    Chunk ``j`` covers tokens ``[j*stride, min(j*stride+window, n))``;
    ``num_chunks = 1 + ceil(max(0, n-window)/stride)`` so the tail is
    always covered and a doc shorter than ``window`` is one chunk.
    Zero-token docs are dropped.

    Returns ``(id_col, chunk_idx, begin_token, n_chunk_tokens,
    chunk_text)``.  One projection + one explode, embarrassingly
    parallel — no shuffle, no window function, no Python.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        # stride > window leaves token gaps uncovered AND emits empty
        # tail chunks (begin >= n) — never what a chunker should do
        raise ValueError("stride must be <= window (gapless coverage)")
    from python_mozetl_spark.functions.text import tokens

    staged = docs.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    ).withColumn("__n", F.size("__toks").cast("bigint"))
    n = F.col("__n")
    num_chunks = 1 + F.floor(
        (F.greatest(n - window, F.lit(0)) + (stride - 1)) / stride
    ).cast("bigint")
    exploded = staged.where(n > 0).select(
        id_col,
        "__toks",
        "__n",
        F.explode(F.sequence(F.lit(0).cast("bigint"), num_chunks - 1)).alias(
            "chunk_idx"
        ),
    )
    begin = F.col("chunk_idx") * stride
    end = F.least(begin + window, F.col("__n"))
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        begin.cast("bigint").alias("begin_token"),
        (end - begin).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(
            F.slice(F.col("__toks"), (begin + 1).cast("int"), (end - begin).cast("int")),
            " ",
        ).alias("chunk_text"),
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    len_col: str,
    bucket_bounds: list[int],
    batch_size: int,
    shards: int = 1,
    salt: str = "lenbatch",
) -> DataFrame:
    """Length-bucketed batch assignment — the padding-efficiency step
    of a training dataloader, pushed into the engine: rows are bucketed
    by length band, sorted by (length, id) within the bucket, and cut
    into fixed-size batches so each batch pads only to ITS OWN max
    length, not the corpus max.

    ``bucket_bounds`` are ascending upper bounds; lengths >= the last
    bound land in a final overflow bucket.  Returns the input plus
    ``bucket`` (int index), ``batch`` (0-based within bucket), and
    ``batch_pos`` — plus ``shard`` when ``shards > 1`` (batch ids are
    then unique within (bucket, shard)).

    Everything is deterministic (sort key is (length, id)), so batch
    membership is reproducible and oracle-checkable.

    Scale shape: ONE exchange on the bucket key + per-bucket sort —
    the same cost profile as ``shuffle_shards``.  A handful of buckets
    over 100 TB makes hot partitions: pass ``shards > 1`` to sub-shard
    each bucket by ``md5(salt‖id) mod shards`` (batches then form
    within (bucket, shard) — same padding bound, ``shards``× the
    parallelism, still deterministic).
    """
    from python_mozetl_spark.functions import hashing as H

    if sorted(bucket_bounds) != list(bucket_bounds) or not bucket_bounds:
        raise ValueError("bucket_bounds must be non-empty ascending")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    length = F.col(len_col).cast("bigint")
    bucket = F.lit(len(bucket_bounds))  # overflow bucket
    for i, bound in reversed(list(enumerate(bucket_bounds))):
        bucket = F.when(length < bound, F.lit(i)).otherwise(bucket)
    out = df.withColumn("bucket", bucket.cast("int"))
    part_keys = ["bucket"]
    if shards > 1:
        shard = (
            H.md5_int64(
                F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))
            )
            % shards
        ).cast("int")
        out = out.withColumn("shard", shard)
        part_keys.append("shard")
    w = Window.partitionBy(*part_keys).orderBy(length, F.col(id_col))
    out = (
        out.withColumn("__rn", F.row_number().over(w) - 1)
        .withColumn("batch", (F.col("__rn") / batch_size).cast("bigint"))
        .withColumn("batch_pos", (F.col("__rn") % batch_size).cast("int"))
        .drop("__rn")
    )
    # with shards > 1 the shard column STAYS in the output: batch ids
    # are only unique within (bucket, shard)
    return out
