"""The AMO extended-addon-database builder — the reference's crawler
logic with only the wire call injectable.

The reference assembles ``extended_addons_database.json`` by paging
the addons search API, then resolving each addon's FIRST version's
create date through a second round of per-addon version requests
(taar/taar_amodump.py:78-234).  Its HTTP mechanics (requests_toolbelt
thread pools, one retry pass over the exceptions, skip-on-error per
record) are wire-level concerns; everything else — the paging
arithmetic, the guid-keyed merge, the last-version-page resolution,
``first_create_date`` extraction, the keep-only-dated filter, and the
typed field marshal — is catalog logic and lives here:

- :func:`build_addon_catalog` runs the two crawl rounds against an
  injectable ``fetch(url) -> parsed JSON`` callable (a deployment
  wraps its HTTP client — ``sources.side_input.side_input_from_json``
  is a conforming default for http(s) URLs; tests pass a dict-backed
  fake).  Failed URLs are retried ONCE, then skipped, exactly the
  reference's exception-pool pass; per-record parse errors skip the
  record (taar_amodump.py:112-117, 183-199).
- :func:`marshal_addon` extracts the reference's ``AMOAddonInfo``
  typed subset (taar_amodump.py:52-76) from a raw API record —
  explicit field coercions instead of the reflective JSONSchema
  walker, same output shape.

The assembled dict feeds ``jobs/amo_whitelist.py`` (the accumulator
logic behind the ``taar_amowhitelist`` CLI) and broadcasts as the S8
side-input.  Catalog size is ~10^4 records × ~1 KB — a driver object
by definition; no SparkSession is involved.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Mapping
from urllib.parse import quote

# the reference's own PUBLIC API endpoint constants, verbatim
# (taar_amodump.py:20-21, 128-129) — the only URLs in the package;
# both are overridable per call and per CLI flag
DEFAULT_SEARCH_URI = (
    "https://addons.mozilla.org/api/v3/addons/search/"
    "?app=firefox&sort=created&type=extension"
)
DEFAULT_VERSIONS_URI_FMT = (
    "https://addons.mozilla.org/api/v3/addons/addon/{guid}/versions/"
)

Fetch = Callable[[str], Mapping]


def _fetch_all(
    urls: Iterable[str], fetch: Fetch
) -> dict[str, Mapping]:
    """Fetch every URL, retrying failures ONCE (the reference's
    from_exceptions pass) and skipping second failures — returns
    {url: parsed} for the successes."""
    out: dict[str, Mapping] = {}
    failed: list[str] = []
    for url in urls:
        try:
            out[url] = fetch(url)
        except Exception:
            failed.append(url)
    for url in failed:
        try:
            out[url] = fetch(url)
        except Exception:
            continue  # skipped, like the reference's second-pass drop
    return out


def build_addon_catalog(
    fetch: Fetch,
    search_uri: str = DEFAULT_SEARCH_URI,
    versions_uri_fmt: str = DEFAULT_VERSIONS_URI_FMT,
) -> dict[str, dict]:
    """Assemble the guid-keyed extended addon database
    (reference ``AMODatabase.fetch_addons``, taar_amodump.py:90-98).

    Round 1: page 1 of ``search_uri`` carries ``page_count``; every
    page's ``results`` records merge into the map keyed by ``guid``.
    Round 2: each addon's versions endpoint carries its own
    ``page_count`` — the LAST page's last result's first file's
    ``created`` is the addon's ``first_create_date``
    (taar_amodump.py:120-199: results are created-ascending pages, so
    the last entry of the last page is the FIRST release).  Addons
    whose version lookup failed carry no date and are dropped, the
    reference's final filter (taar_amodump.py:93-97).
    """
    first = fetch(search_uri)
    page_count = int(first["page_count"])
    page_urls = [
        f"{search_uri}&page={i}" for i in range(1, page_count + 1)
    ]
    addon_map: dict[str, dict] = {}
    for page in _fetch_all(page_urls, fetch).values():
        for record in page.get("results", []):
            try:
                addon_map[record["guid"]] = dict(record)
            except Exception:
                continue  # skip unparseable records, as the reference does

    # versions round 1: learn each addon's last version page
    v_urls = {
        versions_uri_fmt.format(guid=quote(guid, safe="")): guid
        for guid in addon_map
    }
    last_page_urls: dict[str, str] = {}
    for url, jdata in _fetch_all(v_urls, fetch).items():
        try:
            pc = int(jdata["page_count"])
            last = f"{url}?page={pc}" if pc > 1 else url
            last_page_urls[last] = v_urls[url]
        except Exception:
            continue

    # versions round 2: the last page's final entry is the first release
    for url, jdata in _fetch_all(last_page_urls, fetch).items():
        try:
            results = jdata["results"]
            created = results[-1]["files"][0]["created"]
            # last_page_urls maps url -> the RAW guid (quote() was only
            # applied to the URL string), so no unquote here: decoding a
            # raw guid containing a literal %XX sequence would corrupt it
            # and silently drop the addon from the catalog
            guid = last_page_urls[url]
            if guid in addon_map:
                addon_map[guid]["first_create_date"] = created
        except Exception:
            continue

    return {
        guid: rec
        for guid, rec in addon_map.items()
        if "first_create_date" in rec
    }


def marshal_addon(record: Mapping) -> dict:
    """The reference's ``AMOAddonInfo`` typed extraction
    (taar_amodump.py:52-76 + ``marshal``): keep only the declared
    fields, coerced to their declared types; absent keys stay absent
    (the ``Undefined`` convention) rather than becoming None."""
    out: dict = {}

    def put(key, conv):
        if key in record:
            out[key] = conv(record[key])

    put("guid", str)
    put("default_locale", str)
    put("weekly_downloads", int)
    put("tags", lambda v: [str(x) for x in v])
    for mapping_key in ("description", "name", "summary"):
        put(mapping_key, lambda v: {str(k): str(x) for k, x in v.items()})
    put(
        "categories",
        lambda v: {str(k): [str(x) for x in xs] for k, xs in v.items()},
    )
    put("ratings", lambda v: {str(k): float(x) for k, x in v.items()})
    if "current_version" in record:
        cv = record["current_version"] or {}
        file_convs = {
            "id": int,
            "platform": str,
            "status": str,
            "is_webextension": bool,
        }
        out["current_version"] = {
            "files": [
                # absent keys stay absent per field, the reference's
                # Undefined convention applied one level down
                {k: conv(f[k]) for k, conv in file_convs.items() if k in f}
                for f in (cv.get("files") or [])
            ]
        }
    if "first_create_date" in record:
        out["first_create_date"] = str(record["first_create_date"])
    return out
