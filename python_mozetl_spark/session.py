"""SparkSession factory.

Replaces the per-job boilerplate in the reference
(mozetl/clientsdaily/rollup.py:190-193, mozetl/bhr_collection/bhr_collection.py:515-518)
with one factory that bakes in the settings a 100 TB deployment wants:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting,
  dynamic broadcast conversion) — supersedes the reference's manual
  ``spark.sql.shuffle.partitions = defaultParallelism`` tuning.
- Arrow on for any pandas interchange (Pandas UDFs, toPandas).
- Session timezone pinned UTC — the reference's tests are TZ-sensitive
  (SURVEY.md §7.3, SPARK-17971); pinning removes a whole bug class.
- ``_SUCCESS`` markers suppressed (reference: rollup.py:191-193).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # Local-mode driver heap: Spark's 1g default is sized for a driver
    # that only coordinates, but local[N] puts every executor thread in
    # the driver JVM — 32 task threads against 1g OOM-killed the sf0.1
    # full sweep (doc_winnow_copy_pairs; fine at 8g).  Applied only at
    # JVM launch (a no-op on an existing session) and irrelevant on a
    # real cluster where executors carry their own memory.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # Adaptive execution: coalesce post-shuffle partitions, split skewed
    # ones, convert to broadcast joins at runtime.  This is the main
    # lever that makes one set of configs work from sf0.001 to 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-accelerated pandas interchange for the few Pandas-UDF paths.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic date/timestamp semantics everywhere.
    "spark.sql.session.timeZone": "UTC",
    # Sink hygiene: no _SUCCESS markers (reference K8).
    "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
    # Cap single-task input at 128 MB so a 100 TB scan parallelises.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # ...and FLOOR the split count at the core count (set per-session in
    # get_session from the actual core count — a literal here would
    # under-split >32-core machines and over-split small ones).  At
    # 100 TB the 128 MB cap dominates and the floor is inert; it only
    # bites when files < cores x openCost, exactly when splitting is
    # free.
    "spark.sql.files.openCostInBytes": "65536",
    # Read TIMESTAMP(NANOS) parquet columns as raw nanosecond longs
    # (Spark has no nanos timestamp type); sources.read_table converts
    # them to timestamp_ntz via exact integer division.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _core_count(master: str) -> int:
    """Parallelism implied by the master URL: ``local[N]`` → N,
    ``local[*]``/cluster masters → the machine's core count (on a real
    cluster ``tune_session`` re-floors from ``defaultParallelism``)."""
    if master.startswith("local[") and master.endswith("]"):
        inner = master[len("local[") : -1]
        if inner.isdigit():
            return max(1, int(inner))
    return os.cpu_count() or 8


def get_session(
    app_name: str = "python_mozetl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``shuffle_partitions`` defaults to ``max(32, cores)`` locally
    (measured: 2×cores costs ~30% on the sf0.1 bench — scheduling
    overhead beats granularity at this scale); on a real cluster set
    it ≈ 2-3× total cores, or leave AQE to coalesce from a high
    ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    conf["spark.sql.files.minPartitionNum"] = str(_core_count(master))
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    else:
        # scale with the master instead of a hardcoded 32 (which halved
        # post-shuffle parallelism on >32-core masters); floor at 32 so
        # small local sessions keep AQE coalescing headroom.  NOT
        # 2x cores: measured 12.7 s vs 9.8 s on the sf0.1 bench — at
        # local scale the extra task scheduling outweighs the finer
        # granularity, and AQE only partially coalesces it back.
        conf.setdefault(
            "spark.sql.shuffle.partitions",
            str(max(32, _core_count(master))),
        )
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


_BYTE_SUFFIX = {"b": 1, "k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}


def _parse_bytes(v: str) -> int:
    """Spark byte-size conf string → bytes ("134217728b", "128m", "1g")."""
    s = str(v).strip().lower()
    for suf in ("kb", "mb", "gb", "tb"):
        if s.endswith(suf):
            return int(float(s[:-2])) * _BYTE_SUFFIX[suf[0]]
    if s and s[-1] in _BYTE_SUFFIX:
        return int(float(s[:-1])) * _BYTE_SUFFIX[s[-1]]
    return int(float(s))


def spread(df, min_parallelism: int | None = None):
    """Round-robin repartition a DataFrame up to the session's
    parallelism — but only when its current partition count is below
    it.  Use before CPU-heavy per-row stages (tokenize/hash/sketch
    pipelines): a small parquet file is a single row group and
    therefore ONE task no matter how the scan is split, which
    serializes the whole downstream chain; one tiny shuffle buys
    full-core execution.  On a real multi-executor input (partitions
    >= cores) this is a no-op, so it cannot add a shuffle at scale.

    The partition estimate is PLANNING-TIME only (input file count +
    Catalyst size estimate vs maxPartitionBytes) — no ``.rdd``
    conversion, no job.  Non-scan frames (no input files) pass through
    untouched: anything downstream of a shuffle already runs at
    ``spark.sql.shuffle.partitions`` ≥ core parallelism, and forcing a
    count would require exactly the plan→RDD conversion this avoids."""
    spark = df.sparkSession
    target = min_parallelism or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df
    max_pb = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    )
    est = max(len(files), plan_size_bytes(df) // max(max_pb, 1))
    if est < target:
        return df.repartition(target)
    return df


def plan_size_bytes(df) -> int:
    """Catalyst's planning-time size estimate for a DataFrame (bytes),
    derived from source file sizes with column pruning — NO job runs.
    This is what the ext/ strategy gates consult before deciding to
    collect anything: on a 100 TB input the estimate fails the budget
    immediately, without the full pre-scan a count()/sum() stats job
    would cost.  Conservative (file-size based), so gates pair it with
    a hard post-collect check."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def source_file_bytes(df) -> int | None:
    """Total on-disk size of the DataFrame's source files, or None when
    the frame has no file-backed source (local relations, generated
    data).  The robust size signal for envelope gates: Catalyst's
    ``sizeInBytes`` turns into a default-row-size guess (or the
    Long.MaxValue sentinel) as soon as a repartition/shuffle sits
    between the gate and the scan, while the source file listing —
    already computed for planning — is exact whatever the plan shape.
    Metadata-only (one FileStatus per file via the Hadoop FS); no job
    runs.  Ignores partition pruning, so it over-counts for heavily
    filtered frames — the right direction for a safety gate."""
    files = df.inputFiles()
    if not files:
        return None
    sc = df.sparkSession.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    total = 0
    for f in files:
        path = jvm.org.apache.hadoop.fs.Path(f)
        total += path.getFileSystem(conf).getFileStatus(path).getLen()
    return total


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine defaults to an existing session.

    Used when the caller (e.g. the verification driver) owns the
    session: only touches confs that are legal to set at runtime.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set(
        "spark.sql.files.minPartitionNum",
        str(spark.sparkContext.defaultParallelism),
    )
    spark.conf.set("spark.sql.files.openCostInBytes", "65536")
    return spark
