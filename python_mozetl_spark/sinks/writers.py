"""Sinks (SURVEY.md §2.2 K1-K5).

Design stance for scale: output-file sizing is a *sink policy*, not
scattered ``coalesce``/``repartition(1)`` calls (reference:
mozetl/clientsdaily/rollup.py:127-146,
mozetl/addon_aggregates/addon_aggregates.py:195-202).  We use
``spark.sql.files.maxRecordsPerFile`` + optional repartition-by-
partition-columns, which parallelises the write and still bounds file
sizes; AQE coalescing handles the small-output case.  The reference's
per-sample_id python loop (100 sequential writes/day) becomes a single
``partitionBy`` write that Spark parallelises.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    target_files: int | None = None,
) -> None:
    """K1: partitioned parquet write with explicit sizing policy.

    ``target_files`` repartitions on the partition columns (or to a
    fixed count) before writing — the scalable version of the
    reference's coalesce(25)/repartition(1) habits.
    """
    if target_files:
        if partition_by:
            df = df.repartition(target_files, *partition_by)
        else:
            df = df.repartition(target_files)
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_partitioned_json(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """K2: partitioned JSON write (reference: landfill/sampler.py:148-156)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)


def write_json_artifact(obj: object, path: str, datestamp: str | None = None) -> None:
    """K5: small model/artifact JSON sink — current + datestamped copy
    (reference: taar/taar_utils.py:61-87).  Driver-side by design: only
    for post-``collect()`` artifacts far below driver memory.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(obj, fh, sort_keys=True)
    if datestamp:
        root, ext = os.path.splitext(path)
        with open(f"{root}.{datestamp}{ext}", "w", encoding="utf-8") as fh:
            json.dump(obj, fh, sort_keys=True)
