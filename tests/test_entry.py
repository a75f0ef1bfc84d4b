"""Driver-contract smoke tests."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF_SMOKE = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() > 0


def test_every_oracle_has_query():
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 39


def test_all_queries_run_at_smoke_sf(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.columns, name
        df.limit(1).collect()


def test_driver_window_covers_every_query_at_least_once():
    """The correctness driver grades only the FIRST 50 registry
    entries.  Invariants: the window is exactly 50 and is the dict
    prefix; and every registry query either sits in this round's
    window or already has a driver-green row in a committed
    CORRECTNESS file — i.e. nothing is ever silently ungraded."""
    import glob
    import json

    from python_mozetl_spark.plans.queries import _DRIVER_WINDOW, REGISTRY

    assert len(_DRIVER_WINDOW) == 50
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW
    graded = set(_DRIVER_WINDOW)
    for f in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        graded |= set(json.load(open(f)))
    missing = set(REGISTRY) - graded
    assert not missing, (
        f"queries with NO driver row ever and not in this round's "
        f"window: {sorted(missing)} — front them in _DRIVER_WINDOW"
    )


def test_coverage_md_registry_count_is_current():
    """COVERAGE.md's registry count is marker-derived, never
    hand-typed: every `N <!-- len(REGISTRY) -->` marker must equal the
    live registry size (run tools/sync_counts.py after adding a
    query)."""
    import re

    from python_mozetl_spark.plans.queries import REGISTRY

    text = open("/root/repo/COVERAGE.md").read()
    counts = re.findall(r"(\d+) <!-- len\(REGISTRY\) -->", text)
    assert counts, "COVERAGE.md lost its registry-count markers"
    assert all(int(c) == len(REGISTRY) for c in counts), (
        f"stale COVERAGE.md count {counts} != {len(REGISTRY)} — "
        "run python tools/sync_counts.py"
    )
