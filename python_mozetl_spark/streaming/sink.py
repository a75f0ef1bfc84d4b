"""Exactly-once streaming table sink: ``foreachBatch`` + idempotent
keyed MERGE.

Structured Streaming's ``foreachBatch`` gives at-least-once batch
delivery: after a failure the SAME micro-batch (same ``batch_id``,
same rows) can be re-delivered.  Composing it with
``operators/merge.py:merge_upsert`` — last-wins per key under an
explicit version order — makes replay a NO-OP: merging identical
change rows into a table that already absorbed them leaves the table
bit-identical, so at-least-once delivery + idempotent merge =
exactly-once TABLE STATE.  This is the streaming twin of the
reference's overwrite-by-partition idempotency model
(mozetl/graphics_telemetry_trends.py incremental backfill; SURVEY
§2.12) and of the K6 idempotent ``foreachPartition`` contract
(sinks/writers.py:134).

Scale shape: each micro-batch pays one merge-key co-partitioned join
pair against the base table (see merge_upsert's plan notes) plus one
atomic overwrite of the table path.  For 100 TB tables the same
composition targets a partition-pruned base (merge only the touched
date/key partitions — dynamic partition overwrite), keeping per-batch
work O(batch + touched partitions), not O(table).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from python_mozetl_spark.operators.merge import merge_upsert


def idempotent_merge_batch(
    read_base: Callable[[SparkSession], DataFrame],
    write_base: Callable[[DataFrame], None],
    key_cols: list[str],
    version_col: str,
    delete_col: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch(fn)`` callable that MERGEs each
    micro-batch into a keyed table.

    ``read_base`` / ``write_base`` abstract the table storage (parquet
    path, warehouse table, ...) so tests and production share the
    merge logic.  ``write_base`` MUST be atomic-overwrite (write temp +
    swap, or Spark's overwrite save-mode): a replayed batch then
    converges to the same state instead of appending.

    The returned callable is what exactly-once needs from the sink
    side; pair it with a checkpointLocation so the engine also skips
    fully-committed batches on restart.
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base = read_base(spark)
        merged = merge_upsert(
            base, batch_df, key_cols, version_col, delete_col=delete_col
        )
        write_base(merged)

    return fn


def merge_stream_to_parquet(
    changes: DataFrame,
    table_path: str,
    key_cols: list[str],
    version_col: str,
    delete_col: str | None = None,
    checkpoint: str | None = None,
    base_schema: str | None = None,
    available_now: bool = False,
):
    """Wire a change stream into a parquet table with exactly-once
    MERGE semantics: ``writeStream.foreachBatch(idempotent merge)``.

    ``base_schema`` (DDL) describes the table when it does not exist
    yet (first batch bootstraps an empty base).  ``available_now``
    drains the currently-available input then stops (the batch-twin /
    test trigger).  Returns the started ``StreamingQuery``.
    """
    out_cols = [c for c in changes.columns if c != delete_col]
    swap = table_path + ".swap"
    marker = os.path.join(swap, "_COMMITTED")

    # Publish protocol (local/posix FS — an object store needs a real
    # commit service or a table format): the merged result is FULLY
    # written to the swap dir, a _COMMITTED marker seals it, and only
    # then does the table dir get replaced by an atomic rename.  Every
    # crash window is recoverable: before the marker, the old table is
    # intact (incomplete swap is discarded); after it, the sealed swap
    # IS the table and read_base re-points it.  The previous scheme —
    # a second non-atomic Spark overwrite of table_path, plus a
    # blanket except->empty-base in read_base — could silently
    # TRUNCATE the table to one micro-batch after a mid-overwrite
    # crash or any transient read failure.

    def _recover() -> None:
        if os.path.exists(marker):
            if os.path.exists(table_path):
                shutil.rmtree(table_path)
            os.rename(swap, table_path)
            os.remove(os.path.join(table_path, "_COMMITTED"))

    def read_base(spark: SparkSession) -> DataFrame:
        _recover()
        if not os.path.exists(table_path):
            # genuinely new table — NOT a failed read (those raise)
            schema = base_schema or ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in changes.schema.fields
                if f.name != delete_col
            )
            return spark.createDataFrame([], schema)
        return spark.read.parquet(table_path)

    def write_base(df: DataFrame) -> None:
        if os.path.exists(swap):
            shutil.rmtree(swap)  # leftover UNsealed swap: discard
        df.select(*out_cols).write.mode("overwrite").parquet(swap)
        with open(marker, "w", encoding="utf-8"):
            pass  # seal: from here the swap is the table of record
        if os.path.exists(table_path):
            shutil.rmtree(table_path)
        os.rename(swap, table_path)
        os.remove(os.path.join(table_path, "_COMMITTED"))

    writer = changes.writeStream.foreachBatch(
        idempotent_merge_batch(
            read_base, write_base, key_cols, version_col, delete_col
        )
    ).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
