"""AMO add-on whitelist filtering (TAAR).

Re-expresses mozetl/taar/taar_amowhitelist.py:40-160: the three
accumulators walked over the AMO extended-add-ons dump — whitelist
(min rating + min age + webextension + not Pioneer), featured, and
featured∩whitelist — become ONE DataFrame pass computing two boolean
flag columns; each output list is a filter over the flags.

Departures (SURVEY §7.3 side-input discipline):

- the S3 JSON dump read/write becomes a driver-side side input
  (sources/side_input.py) + ``sinks.writers.write_json_artifact`` —
  the dump is kilobytes-to-MBs, the canonical broadcastable side
  input, and the FLAG computation is the part that belongs to the
  engine (at 100 TB the same flags frame broadcast-joins against
  telemetry instead of collecting);
- the reference pins "now" with ``datetime.today()``
  (taar_amowhitelist.py:71-73), making runs irreproducible; ``as_of``
  is an explicit parameter;
- a missing/unparseable ``first_create_date`` crashes the reference
  (``parse(None)``); here it fails the age test instead (NULL
  comparison → not whitelisted) — a data error should drop the addon,
  not the job.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PIONEER_GUID = "pioneer-opt-in@mozilla.org"
MIN_RATING = 3.0
MIN_AGE = 60

# the dump fields the accumulators actually consult
# (taar_amowhitelist.py:57-97)
_DUMP_SCHEMA = (
    "guid string, is_featured boolean, "
    "ratings struct<average: double>, "
    "first_create_date string, "
    "current_version struct<files: array<struct<is_webextension: boolean>>>"
)


def amo_dump_frame(spark: SparkSession, dump: dict) -> DataFrame:
    """{guid: addon_data} dump (the AMO extended_addons_database
    shape) → one row per addon with the whitelist-relevant fields."""
    rows = [{**(data or {}), "guid": guid} for guid, data in dump.items()]
    return spark.createDataFrame(rows, _DUMP_SCHEMA)


def amo_whitelist_flags(
    addons: DataFrame,
    as_of: _dt.date,
    min_rating: float = MIN_RATING,
    min_age: int = MIN_AGE,
) -> DataFrame:
    """(guid, featured, whitelisted, featured_whitelisted) — the three
    accumulators (taar_amowhitelist.py:53-111) as one projection.

    Whitelist = not Pioneer, has files in the current version, first
    file is a webextension, average rating >= ``min_rating``, created
    at least ``min_age`` days before ``as_of``.
    """
    cutoff = as_of - _dt.timedelta(days=min_age)
    files = F.col("current_version.files")
    whitelisted = (
        (F.col("guid") != PIONEER_GUID)
        & (F.coalesce(F.size(files), F.lit(0)) > 0)
        & F.coalesce(files[0]["is_webextension"], F.lit(False))
        & (F.coalesce(F.col("ratings.average"), F.lit(0.0)) >= min_rating)
        & (
            F.to_date("first_create_date")
            <= F.lit(cutoff.strftime("%Y-%m-%d")).cast("date")
        )
    )
    featured = F.coalesce(F.col("is_featured"), F.lit(False))
    return addons.select(
        "guid",
        featured.alias("featured"),
        whitelisted.alias("whitelisted"),
        (featured & whitelisted).alias("featured_whitelisted"),
    )


def run_amo_whitelist(
    spark: SparkSession,
    dump: dict,
    as_of: _dt.date,
    min_rating: float = MIN_RATING,
    min_age: int = MIN_AGE,
) -> tuple[dict, dict, dict]:
    """The AMOTransformer.transform contract
    (taar_amowhitelist.py:113-167): returns the (whitelist, featured,
    featured_whitelist) {guid: addon_data} dicts ready for the three
    JSON artifacts."""
    flags = amo_whitelist_flags(
        amo_dump_frame(spark, dump), as_of, min_rating, min_age
    ).collect()  # bounded: one row per catalog addon (a side input)
    out: tuple[dict, dict, dict] = ({}, {}, {})
    for r in flags:
        for d, flag in zip(out, ("whitelisted", "featured", "featured_whitelisted")):
            if r[flag]:
                d[r["guid"]] = dump[r["guid"]]
    return out
