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
