"""Shield study prefs job.

Re-expresses mozetl/shield/privacy_prefs.py:27-88: event pings and
state pings extracted from the same study-ping stream with different
projections, unioned, written per submission date.  The reference's
two RDD transform passes + positional ``union`` become two projections
of one scan + ``unionByName`` (U1, the safe variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SHIELD_STUDY = "pref-flip-privacy"


def transform_event_pings(pings: DataFrame) -> DataFrame:
    """One row per study event."""
    return (
        pings.where(F.col("study_name") == SHIELD_STUDY)
        .where(F.col("event").isNotNull())
        .select(
            "client_id",
            "submission_date",
            F.col("event.name").alias("event"),
            F.col("event.value").alias("event_value"),
            F.lit(None).cast("string").alias("state"),
            F.lit("event").alias("ping_type"),
        )
    )


def transform_state_pings(pings: DataFrame) -> DataFrame:
    """One row per state snapshot."""
    return (
        pings.where(F.col("study_name") == SHIELD_STUDY)
        .where(F.col("state").isNotNull())
        .select(
            "client_id",
            "submission_date",
            F.lit(None).cast("string").alias("event"),
            F.lit(None).cast("string").alias("event_value"),
            F.col("state"),
            F.lit("state").alias("ping_type"),
        )
    )


def run_privacy_prefs(pings: DataFrame) -> DataFrame:
    """Event + state rows, schema-aligned union."""
    return transform_event_pings(pings).unionByName(transform_state_pings(pings))


def run_system_check(df: DataFrame, columns=("memory_mb", "cpu_cores",
                                             "subsession_length")) -> DataFrame:
    """system_check smoke job (mozetl/system_check.py:50-70): describe()
    over the health columns of one sampled day — A12."""
    return df.select(*[c for c in columns if c in df.columns]).describe()
