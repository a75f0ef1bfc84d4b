"""Per-client profile export (TAAR-dynamo extract).

Re-expresses mozetl/taar/taar_dynamo.py:118-133,322-394: row validation
(parseable date, non-empty client_id), latest-subsession-per-client
dedup (W1), and the keyed JSON payload the reference produced by
zipping an RDD of keys with a ``toJSON`` RDD (:375-394, J9) — here one
``to_json(struct(...))`` column, no RDD alignment hazard.

The DynamoDB push itself is `sinks.writers.foreach_partition_sink`
with an idempotent keyed-upsert writer (K6); this module only builds
the frame.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.operators import latest_per_key

DEFAULT_PAYLOAD_COLUMNS = (
    "city",
    "subsession_start_date",
    "subsession_length",
    "locale",
    "os",
    "places_bookmarks_count",
    "active_addons",
)


def valid_profiles(df: DataFrame) -> DataFrame:
    """Row validation (taar_dynamo.py:118-133): non-empty client_id and
    a date that actually parses."""
    return df.where(
        F.col("client_id").isNotNull()
        & (F.col("client_id") != "")
        # try_to_date: malformed dates → NULL → filtered, instead of the
        # ANSI cast error a plain to_date raises mid-job
        & F.try_to_date(F.substring("subsession_start_date", 1, 10)).isNotNull()
    )


def export_profiles(
    df: DataFrame,
    payload_columns: Sequence[str] = DEFAULT_PAYLOAD_COLUMNS,
    sample_rate: float | None = None,
    seed: int = 42,
    order_columns: Sequence[str] = ("subsession_start_date",),
) -> DataFrame:
    """(client_id, json_payload) for each client's latest subsession.

    Pass a unique tiebreaker in ``order_columns`` (e.g. document_id)
    when subsession timestamps can collide within a client — W1 needs a
    total order to be retry-deterministic (SURVEY §7.3).
    """
    cleaned = valid_profiles(df)
    if sample_rate is not None:
        cleaned = cleaned.sample(fraction=sample_rate, seed=seed)
    latest = latest_per_key(
        cleaned, keys=["client_id"], order_by=list(order_columns)
    )
    cols = [c for c in payload_columns if c in latest.columns]
    return latest.select(
        "client_id",
        F.to_json(F.struct(*cols)).alias("json_payload"),
    )
