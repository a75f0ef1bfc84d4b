"""Missing-symbols crash report.

Re-expresses mozetl/symbolication/modules_with_missing_symbols.py:63-105
as pure DataFrame ops (the reference drops to an RDD
map/filter/reduceByKey pyramid after the explode):

crash rows → explode module list → dropDuplicates(uuid, module) →
validity filter (missing symbols, not a known module, not deleted) →
groupBy (filename, version, debug_id, debug_file) count →
per-filename version rollup sorted by count.

No RDDs: the three reduceByKey stages are two hash aggregations, the
sortBy is an orderBy, and the nested [(version, count)] value is
``collect_list(struct)`` (A8).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_modules(crashes: DataFrame, modules_col: str = "modules") -> DataFrame:
    """One row per distinct (crash uuid, module struct)."""
    return (
        crashes.select("uuid", F.explode(modules_col).alias("module"))
        .dropDuplicates(["uuid", "module"])
        .select("module.*", "uuid")
    )


def missing_symbol_modules(
    modules: DataFrame, known_modules: Sequence[str] = ()
) -> DataFrame:
    """Validity filter: symbols missing, module not already known,
    filename not a deleted mapping."""
    known = [m.lower() for m in known_modules]
    df = modules.where(
        F.col("missing_symbols")
        & ~F.col("filename").contains("(deleted)")
    )
    if known:
        df = df.where(~F.lower("filename").isin(known))
    return df


def module_version_counts(modules: DataFrame) -> DataFrame:
    """Crash count per (filename, version, debug_id, debug_file)."""
    return modules.groupBy(
        "filename", "version", "debug_id", "debug_file"
    ).agg(F.count(F.lit(1)).alias("n_crashes"))


def run_missing_symbols_report(
    crashes: DataFrame,
    known_modules: Sequence[str] = (),
    min_count: int = 0,
) -> DataFrame:
    """Per filename: total crashes + per-version breakdown sorted by
    count desc — the report the reference assembles driver-side."""
    counts = module_version_counts(
        missing_symbol_modules(explode_modules(crashes), known_modules)
    ).where(F.col("n_crashes") > min_count)
    return (
        counts.groupBy("filename")
        .agg(
            F.sum("n_crashes").alias("total_crashes"),
            F.reverse(
                F.array_sort(
                    F.collect_list(
                        F.struct("n_crashes", "version", "debug_id", "debug_file")
                    )
                )
            ).alias("versions"),
        )
        .orderBy(F.col("total_crashes").desc(), "filename")
    )
