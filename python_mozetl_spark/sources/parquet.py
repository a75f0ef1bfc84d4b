"""Parquet sources.

Re-expresses the reference's scan patterns (SURVEY.md §2.1 S1/S2):

- S1 "parquet + mergeSchema" → :func:`read_table` with
  ``merge_schema=True``.
- S2 "partition pruning by path construction"
  (mozetl/search/aggregates.py:344-352) → :func:`read_partitioned`:
  read the table ROOT and apply a partition-column predicate, letting
  Catalyst do static partition pruning.  Path-append pruning defeats
  schema evolution and dynamic pruning; predicate pruning does not.
- the defensive-optional-column pattern
  (mozetl/clientsdaily/rollup.py:104-122, try/except AnalysisException
  at mozetl/search/aggregates.py:255-273) → :func:`ensure_columns`,
  a first-class helper instead of scattered try/except.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_table(
    spark: SparkSession,
    root: str,
    name: str | None = None,
    merge_schema: bool = False,
    columns: list[str] | None = None,
    format: str = "parquet",
    schema: str | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """Read a table through Spark's pluggable DataSource API (S1/S4);
    optionally project immediately.

    ``format`` is any registered source ("parquet", "json", "orc",
    "csv", a connector's short name...) — the reference swaps storage
    backends the same way (bhr_collection.py:534-555 parquet vs json);
    here it is literally the format string.  ``schema`` (DDL string)
    skips inference — REQUIRED for json/csv at scale, where inference
    is a full extra pass over the data.  ``options`` passes
    format-specific reader options (e.g. ``{"header": "true"}``).

    Early projection is redundant with Catalyst column pruning but keeps
    intent visible (reference habit: rollup.py:47 "two_columns").
    """
    path = f"{root}/{name}.{format}" if name else root
    reader = spark.read.format(format)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if columns:
        df = df.select(*columns)
    return df


def read_json_pings(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Schema-ful newline-delimited JSON scan (S5) — the reference's
    raw ping ingestion (mozetl/main.py:10-24,
    mozetl/landfill/sampler.py:49-55) re-expressed as a declarative
    source: an explicit schema means NO inference pass, malformed rows
    land in nulls instead of failing the scan (PERMISSIVE), and
    Catalyst prunes unreferenced JSON fields at parse time.
    """
    return spark.read.schema(schema).json(path)


def read_partitioned(
    spark: SparkSession,
    root: str,
    partition_predicate: Column | None = None,
    merge_schema: bool = True,
) -> DataFrame:
    """Read a partitioned table root and prune via predicate.

    At 100 TB the partition predicate (e.g.
    ``col("submission_date_s3") == "20260813"``) must prune at planning
    time — verify ``PartitionFilters`` is populated in
    ``df.explain("formatted")``, not a post-scan Filter.
    """
    df = read_table(spark, root, merge_schema=merge_schema)
    if partition_predicate is not None:
        df = df.where(partition_predicate)
    return df


def ensure_columns(df: DataFrame, columns: Mapping[str, str]) -> DataFrame:
    """Add any missing columns as typed NULL literals.

    ``columns`` maps name → Spark SQL type string ("string", "bigint",
    "array<struct<engine:string,count:bigint>>", ...).  Replaces the
    reference's try/except-AnalysisException schema-drift tolerance
    with an explicit declaration (SURVEY.md §7.3).
    """
    existing = {f.name.lower() for f in df.schema.fields}
    to_add = {
        name: dtype for name, dtype in columns.items() if name.lower() not in existing
    }
    if not to_add:
        return df
    return df.withColumns(
        {name: F.lit(None).cast(dtype) for name, dtype in to_add.items()}
    )
