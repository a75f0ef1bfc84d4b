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
    sort_by: list[str] | None = None,
) -> None:
    """K1: partitioned parquet write with explicit sizing policy.

    ``target_files`` repartitions on the partition columns (or to a
    fixed count) before writing — the scalable version of the
    reference's coalesce(25)/repartition(1) habits.

    ``sort_by`` clusters the layout for parquet data skipping: with
    ``target_files`` (and no hive partitioning) the frame is
    repartitionByRange'd on the sort key — files then own DISJOINT key
    ranges — and every task sorts within its partition, so row-group
    min/max stats are tight.  A later range- or point-filtered scan
    skips whole files/row groups instead of reading them — the
    poor-man's Z-order, and the single highest-leverage layout knob
    for a 100 TB table queried by time or key range.
    """
    if target_files:
        if partition_by:
            df = df.repartition(target_files, *partition_by)
        elif sort_by:
            df = df.repartitionByRange(target_files, *sort_by)
        else:
            df = df.repartition(target_files)
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
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


def write_csv_export(df: DataFrame, path: str, max_rows: int = 1_000_000) -> None:
    """K4: driver CSV export with an explicit size guard.

    The reference collects the whole frame and warns about driver memory
    (mozetl/utils.py:46-66); here the guard is enforced: refuse beyond
    ``max_rows`` — large exports belong in distributed ``df.write.csv``.

    SINGLE-pass guard: collect ``limit(max_rows + 1)`` and check the
    overflow row — one job over the frame instead of a count() job plus
    a collect job, and the driver never holds more than max_rows + 1.
    """
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"CSV export exceeds the driver guard ({max_rows} rows); "
            "use df.write.csv for large outputs"
        )
    pdf.to_csv(path, index=False)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 16,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+ optionally sorted) parquet table for co-located
    fact-fact joins: two tables bucketed on the same key with the same
    bucket count join WITHOUT a shuffle (and without the sort, if
    sorted).  This is the persisted analogue of repartitioning both
    sides — pay the shuffle once at write time, reuse it every query.

    At 100 TB this is the strategy for repeatedly-joined fact tables
    (e.g. lineitem⋈orders by orderkey): bucket count chosen so each
    bucket file lands in the 256MB–1GB band the reference targets
    (clientsdaily/rollup.py:142-146).
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def foreach_partition_sink(df: DataFrame, writer_factory, batch_size: int = 200) -> None:
    """K6: external-store sink as foreachPartition — the idiomatic
    replacement for the reference's batch-writes-inside-rdd.reduce
    (mozetl/taar/taar_dynamo.py:178-296), which double-writes on task
    retry.  ``writer_factory()`` is called once per partition ON THE
    EXECUTOR and must return a callable ``write(batch: list[Row])``
    with IDEMPOTENT semantics (e.g. keyed upsert / overwrite-by-pkey):
    Spark may re-execute partitions, so at-least-once delivery is the
    contract here, exactly-once only through idempotency.
    """

    def handle(it):
        write = writer_factory()
        batch = []
        for row in it:
            batch.append(row)
            if len(batch) >= batch_size:
                write(batch)
                batch = []
        if batch:
            write(batch)

    df.foreachPartition(handle)


def zorder_key(cols: list[str], bits: int = 16):
    """Morton (Z-order) key: the bits of ``cols`` interleaved, column 0
    in the lowest lane.  PURE integer bit algebra built from
    shiftright/&/shiftleft terms — codegen'd JVM expressions, and the
    same formula is expressible in any SQL engine (the
    ``part_zorder_keys`` graded query pins it against DuckDB).

    Inputs must already be non-negative ints below ``2**bits`` —
    Z-order is a LAYOUT key, so callers bucket/scale real values first
    (e.g. epoch-day, id % 2^k, price decile).  ``bits`` defaults to 16,
    which fits up to 3 columns in a signed 64-bit long (3×16 = 48 ≤ 63);
    for 4 columns pass ``bits=15`` (4×15 = 60).  Overflow raises.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")
    terms = []
    for lane, c in enumerate(cols):
        for b in range(bits):
            terms.append(
                f"shiftleft(shiftright(CAST({c} AS BIGINT), {b}) & 1, "
                f"{b * n + lane})"
            )
    return F.expr(" + ".join(terms))


def write_zorder_parquet(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    bits: int = 16,
    target_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """K1 layout variant: MULTI-dimensional clustering for data
    skipping.

    ``sort_by`` range-clustering (above) gives tight min/max stats on
    ONE leading key; a table queried by several independent predicates
    (day AND customer, part AND supplier) leaves the second key
    scattered across every file.  Z-ordering sorts by the interleaved
    Morton key instead, so each output file owns a small HYPER-RECTANGLE
    of the key space and parquet row-group stats stay tight on EVERY
    interleaved dimension at once — point/range scans on any of them
    skip most files.  The write is one repartitionByRange + in-task
    sort on the key, identical cost shape to the linear-sort path.
    """
    keyed = df.withColumn("__z", zorder_key(zorder_by, bits))
    keyed = keyed.repartitionByRange(target_files, "__z").sortWithinPartitions(
        "__z"
    )
    keyed.drop("__z").write.mode(mode).parquet(path)


def plan_compaction(
    files: list[tuple[str, int]], target_bytes: int
) -> list[list[str]]:
    """First-fit-decreasing bin packing of data files into rewrite
    groups of ~``target_bytes`` — the planning half of small-file
    compaction.  Driver-side on the FILE LIST (metadata-sized: one
    entry per file, never data-sized); files already >= target stay
    alone and need no rewrite.
    """
    bins: list[tuple[int, list[str]]] = []
    for path, size in sorted(files, key=lambda f: (-f[1], f[0])):
        for i, (used, members) in enumerate(bins):
            if used + size <= target_bytes:
                bins[i] = (used + size, members + [path])
                break
        else:
            bins.append((size, [path]))
    return [members for _, members in bins]


def compact_parquet(
    spark,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> list[int]:
    """Rewrite a directory of small parquet files into ~target-sized
    files — the table-maintenance pass every long-lived 100 TB table
    needs (streaming sinks and fine-grained partitioning both
    accumulate kilobyte files whose per-file open/footer cost
    eventually dominates scans).

    Each planned group is read as its own file-list scan and written
    as ONE file (``coalesce(1)`` — correct here BY CONSTRUCTION
    because a group is at most ``target_bytes``, the executor-sized
    unit; never use coalesce(1) on unbounded data).  Groups rewrite
    independently — on a cluster, in parallel via the scheduler; the
    driver loop only issues the jobs.  Returns per-group file counts.
    """
    import glob as _glob
    import os as _os

    src_real = _os.path.realpath(src_dir)
    dst_real = _os.path.realpath(dst_dir)
    # the first group writes mode("overwrite"): compacting in place (or
    # into an ancestor, whose overwrite deletes src) destroys source
    # files before later groups are read; dst NESTED INSIDE src is also
    # wrong — a later recursive read of src would see every row twice
    if (
        src_real == dst_real
        or src_real.startswith(dst_real + _os.sep)
        or dst_real.startswith(src_real + _os.sep)
    ):
        raise ValueError(
            "compact_parquet: dst_dir must be a fresh directory disjoint "
            f"from src_dir (src={src_dir!r}, dst={dst_dir!r})"
        )
    files = [
        (p, _os.path.getsize(p))
        for p in sorted(_glob.glob(_os.path.join(src_dir, "*.parquet")))
    ]
    if not files:
        raise ValueError(f"no parquet files under {src_dir}")
    groups = plan_compaction(files, target_bytes)
    for i, group in enumerate(groups):
        (
            spark.read.parquet(*group)
            .coalesce(1)
            .write.mode("append" if i else "overwrite")
            .parquet(dst_dir)
        )
    return [len(g) for g in groups]


def write_parquet_with_stats(
    df: DataFrame,
    path: str,
    stat_exprs: dict[str, "Column"],
    mode: str = "overwrite",
) -> dict:
    """Partitioned write + dataset statistics in ONE job via the
    ``Observation`` API: the stats accumulate on the exact rows the
    write consumed (no second scan, no write/stat race on a changing
    source) — the one-pass audit trail a 100 TB pipeline wants after
    every materialization.

    ``stat_exprs`` maps stat name -> aggregate Column (count/sum/min/
    max/null-counts...).  Returns the observed dict.
    """
    from pyspark.sql import Observation

    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in stat_exprs.items()])
    observed.write.mode(mode).parquet(path)
    return obs.get
