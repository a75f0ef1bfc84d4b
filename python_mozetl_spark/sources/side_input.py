"""Driver-side JSON side inputs (S7/S8).

The reference's HTTP-driven sources — the AMO add-on catalog crawl
(mozetl/taar/taar_amodump.py:78-234), the editorial whitelist fetch
(mozetl/taar/taar_update_whitelist.py:28-43), the GPU device database
(mozetl/hardware_report/summarize_json.py:143-154) — are driver-side
``requests`` loops over small reference documents, not cluster work.
SURVEY.md §7.3 keeps the crawling out-of-engine; this module is the
thin adapter that closes the family: fetch ONCE on the driver, then
hand the document to Spark as a broadcast-ready object or a DataFrame,
which is the S8 consumption path every query actually touches.

At 100 TB the rule stands: a side input a driver can hold (catalogs,
whitelists, device DBs — kilobytes to a few MB) is fetched once and
broadcast; anything bigger belongs in a real table, not a side input.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def side_input_from_json(
    url_or_path: str,
    spark: SparkSession | None = None,
    schema: str | None = None,
    timeout: float = 30.0,
    max_bytes: int = 64 * 1024 * 1024,
) -> Any | DataFrame:
    """Load a small JSON document from a local path or an HTTP(S) URL
    on the DRIVER.

    Returns the parsed object by default — ready for
    ``spark.sparkContext.broadcast`` or a ``F.lit``/``isin`` literal
    (the S8 pattern).  With ``spark`` and ``schema`` (DDL string), the
    document (a list of records, or one record) becomes a DataFrame —
    the broadcast-dim-join pattern (J4).

    Only ``http``/``https`` URLs are fetched (a bare ``://`` test
    would hand ``file:``/``ftp:``/``data:`` URLs to urllib's handler
    zoo), and the response body is capped at ``max_bytes`` — a side
    input is by definition something the driver can hold; anything
    bigger belongs in a real table.
    """
    from urllib.parse import urlparse

    scheme = urlparse(url_or_path).scheme
    if scheme in ("http", "https"):
        import urllib.request

        with urllib.request.urlopen(url_or_path, timeout=timeout) as resp:
            body = resp.read(max_bytes + 1)
            if len(body) > max_bytes:
                raise ValueError(
                    f"side input exceeds max_bytes={max_bytes}: {url_or_path}"
                )
            obj = json.loads(body)
    elif "://" in url_or_path:
        raise ValueError(
            f"unsupported side-input scheme {scheme!r} (http/https or a "
            f"local path): {url_or_path}"
        )
    else:
        with open(url_or_path, encoding="utf-8") as fh:
            obj = json.load(fh)
    if schema is None:
        return obj
    if spark is None:
        raise ValueError("schema given but no SparkSession to build the frame")
    rows = obj if isinstance(obj, list) else [obj]
    return spark.createDataFrame(rows, schema)
