"""Background Hang Reporter (BHR) collection — Spark-side aggregation.

Re-expresses mozetl/bhr_collection/bhr_collection.py:593-796 without
RDDs: the per-ping Python flatMap pyramid (process_hangs →
map_to_hang_data → reduceByKey) becomes explode + higher-order frame
resolution + one hash aggregation; the module symbolication
leftOuterJoin (:839-886 — the file's own DF rewrite of its RDD
version) is a plain left join on the exploded distinct module set.

The sequential Gecko-profile assembly (UniqueKeyedTable interning,
:43-185) is driver-side format conversion — it consumes the SMALL
aggregated frame this module produces, never raw pings.  Since round
9 it is implemented in ``jobs/bhr_profile.py`` (a fresh dictionary
encoder rendering the same struct-of-arrays document), closing the
last declared reference-logic gap.

Default bounds mirror the reference: hang duration ∈ [128, 65536) ms,
stack length 1..299 (:632-637, 772-775).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_hangs(pings: DataFrame) -> DataFrame:
    """One row per hang with build_date (build_id[:8]), platform and
    the ping's module table carried alongside."""
    return pings.select(
        F.substring(F.col("build_id"), 1, 8).alias("build_date"),
        F.col("os_name").alias("platform"),
        F.col("modules"),
        F.explode("hangs").alias("hang"),
    )


def resolve_stacks(hangs: DataFrame) -> DataFrame:
    """Resolve each frame's module index against the ping's module
    table: frame (module_index, offset) → ('debug_name\\breakpad_id',
    offset); out-of-range / null indices → null module (the reference's
    process_frame, :621-628).  Pure ``transform`` — executor-side JVM,
    no Python per row."""
    modules = F.col("modules")
    frame_module = (
        lambda fr: F.when(
            fr.module_index.isNotNull()
            & (fr.module_index >= 0)
            & (fr.module_index < F.size(modules)),
            F.concat_ws(
                "\\",
                F.element_at(modules, fr.module_index + 1).debug_name,
                F.element_at(modules, fr.module_index + 1).breakpad_id,
            ),
        )
    )
    return hangs.withColumn(
        "stack",
        F.transform(
            F.col("hang.stack"),
            lambda fr: F.struct(
                frame_module(fr).alias("module"), fr.offset.alias("offset")
            ),
        ),
    )


def hang_aggregates(
    resolved: DataFrame,
    thread_filter: str = "Gecko",
    lower_bound_ms: int = 128,
    upper_bound_ms: int = 65536,
    max_stack: int = 300,
) -> DataFrame:
    """Validity bounds + the one shuffle: per (stack, thread,
    build_date, platform) total hang time and hang count.  Grouping is
    on the resolved stack array directly (Spark hashes complex keys);
    at 100 TB this is a single wide hash-agg keyed by stack signature —
    no driver-side dict merging."""
    bounded = resolved.where(
        (F.col("hang.thread") == thread_filter)
        & (F.col("hang.duration") >= lower_bound_ms)
        & (F.col("hang.duration") < upper_bound_ms)
        & (F.size("stack") > 0)
        & (F.size("stack") < max_stack)
    )
    return bounded.groupBy(
        "stack", F.col("hang.thread").alias("thread"), "build_date", "platform"
    ).agg(
        F.sum(F.col("hang.duration").cast("double")).alias("total_hang_ms"),
        F.count(F.lit(1)).alias("hang_count"),
    )


def symbolicate(aggregates: DataFrame, symbol_map: DataFrame) -> DataFrame:
    """Left-join frame modules to their symbol table (module →
    symbol); unresolved modules keep the raw 'debug\\breakpad' string.
    symbol_map: (module string, symbol string) — broadcastable."""
    frames = (
        aggregates.select(F.explode("stack").alias("frame"))
        .select(F.col("frame.module").alias("module"))
        .where(F.col("module").isNotNull())
        .distinct()
    )
    resolved = frames.join(F.broadcast(symbol_map), "module", "left").select(
        "module", F.coalesce("symbol", "module").alias("resolved_symbol")
    )
    return resolved


def run_bhr_collection(
    pings: DataFrame,
    thread_filter: str = "Gecko",
    sample_fraction: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Full Spark-side pipeline: sample (the reference's 50% hash-mod
    push-down, :529-545 → seeded ``sample``) → explode → resolve →
    aggregate.  Output is the small frame the driver-side profile
    assembler consumes."""
    if sample_fraction < 1.0:
        pings = pings.sample(fraction=sample_fraction, seed=seed)
    return hang_aggregates(
        resolve_stacks(explode_hangs(pings)), thread_filter=thread_filter
    )
