"""Landfill sampler: raw submission triage.

Mirrors mozetl/landfill/sampler.py:49-156 — parse the submission URI
into (namespace, doc_type, doc_version, doc_id), whitelist metadata
keys, keep ≤N docs per (namespace, doc_type, doc_version), write
partitioned JSON.  The reference's per-row Python parser (:84-111)
becomes regex/when column expressions; the cap is the W2 operator.

URI forms (sampler.py docstring):
  telemetry: /submit/<ns>/<doc_id>/<doc_type>/<appName>/...
  generic:   /submit/<ns>/<doc_type>/<doc_version>/<doc_id>
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from python_mozetl_spark.operators import top_n_per_group
from python_mozetl_spark.sinks import write_partitioned_json

META_WHITELIST = [
    "Content-Length", "Date", "Host", "Timestamp", "Type", "User-Agent",
    "X-PingSender-Version", "args", "protocol",
]

_UUID = r"[0-9a-fA-F-]{36}"


def _part(i: int) -> Column:
    # F.get (not getItem): NULL on out-of-range — malformed URIs must
    # not abort the job under ANSI mode (Spark 4 default).
    return F.get(F.split(F.col("uri"), "/"), i)


def _telemetry_version(content: Column) -> Column:
    """Document version from the telemetry payload itself, mirroring
    sampler.py:58-81 _detect_telemetry_version: unparseable → "0",
    then ver / version / deviceinfo→"3" / v, else "1".  JVM-side:
    ``get_json_object(content, '$')`` probes parseability (NULL on
    invalid JSON), the field probes read the same keys the reference
    checks.  (Key-present-but-null counts as absent here — the one
    deliberate simplification of the `in content` checks.)"""
    ver = F.get_json_object(content, "$.ver")
    version = F.get_json_object(content, "$.version")
    deviceinfo = F.get_json_object(content, "$.deviceinfo")
    v = F.get_json_object(content, "$.v")
    return (
        F.when(content.isNull() | F.get_json_object(content, "$").isNull(), "0")
        .when(ver.isNotNull(), ver)
        .when(version.isNotNull(), version)
        .when(deviceinfo.isNotNull(), F.lit("3"))
        .when(v.isNotNull(), v)
        .otherwise("1")
    )


def parse_uri(df: DataFrame) -> DataFrame:
    """Split the submit URI into typed columns; malformed URIs (too few
    segments) are dropped, mirroring the reference's log-and-skip
    (sampler.py:84-111).

    Telemetry form is recognized by a UUID in position 3 (doc_id before
    doc_type) and derives ``doc_version`` from the PAYLOAD (the
    reference's _detect_telemetry_version — e.g. "4" for main pings),
    so per-version sampling quotas and output partitions match the
    mirror; the generic form carries an explicit version in the URI.
    """
    is_telemetry = _part(3).rlike(f"^{_UUID}$")
    parsed = df.withColumns(
        {
            "namespace": _part(2),
            "doc_id": F.when(is_telemetry, _part(3)).otherwise(_part(5)),
            "doc_type": F.when(is_telemetry, _part(4)).otherwise(_part(3)),
            "doc_version": F.when(
                is_telemetry, _telemetry_version(F.col("content"))
            ).otherwise(_part(4)),
        }
    )
    return parsed.where(
        F.col("namespace").isNotNull()
        & F.col("doc_type").isNotNull()
        & F.col("doc_id").isNotNull()
    )


def whitelist_meta(df: DataFrame, meta_col: str = "meta") -> DataFrame:
    """Project the metadata struct onto the whitelisted keys only
    (sampler.py:113-126; dropped keys like X-Forwarded-For must not
    survive — privacy)."""
    fields = [
        F.col(f"`{meta_col}`.`{k}`").alias(k.replace("-", "_"))
        for k in META_WHITELIST
    ]
    return df.withColumn(meta_col, F.struct(*fields))


def run_landfill_sample(
    raw: DataFrame,
    per_group: int = 1000,
    output_path: str | None = None,
) -> DataFrame:
    """raw(uri, meta, content) → sampled, whitelisted docs.

    Cap = deterministic-enough arrival order in the reference; here the
    W2 operator under (doc_id) order for reproducibility.
    """
    parsed = whitelist_meta(parse_uri(raw))
    sampled = top_n_per_group(
        parsed,
        ["namespace", "doc_type", "doc_version"],
        ["doc_id"],
        n=per_group,
        descending=False,
    ).select("namespace", "doc_type", "doc_version", "doc_id", "meta", "content")
    if output_path:
        write_partitioned_json(
            sampled, output_path, partition_by=["namespace", "doc_type", "doc_version"]
        )
    return sampled
