"""The certification harness (tools/check.py) is itself load-bearing
evidence since round 7 — these tests pin its compare semantics and the
completeness-footer contract so the r6 evidence gap cannot silently
reopen."""

from __future__ import annotations

import importlib.util
import sys

import pandas as pd


def _load_check():
    spec = importlib.util.spec_from_file_location(
        "check", "/root/repo/tools/check.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


check = _load_check()


def test_canon_sorts_order_insensitively_and_formats_floats():
    a = pd.DataFrame({"x": [2.0, 1.0], "y": ["b", "a"]})
    b = pd.DataFrame({"y": ["a", "b"], "x": [1.0, 2.0]})
    assert check.canon(a).equals(check.canon(b))
    c = pd.DataFrame({"x": [float("inf"), float("nan"), None]})
    vals = set(check.canon(c)["x"])
    assert "inf" in vals and "␀" in vals


def test_nonscalar_cols_catches_late_list_cells():
    df = pd.DataFrame({"ok": [1, 2], "bad": [None, [1, 2]]})
    assert check.nonscalar_cols(df) == ["bad"]
    assert check.nonscalar_cols(pd.DataFrame({"ok": ["a", "b"]})) == []


def test_compare_flags_row_count_columns_and_values():
    base = pd.DataFrame({"k": [1, 2], "v": [10.0, 20.0]})
    assert check.compare("q", base, base.copy()) == []
    assert any(
        "row count" in p
        for p in check.compare("q", base, base.iloc[:1].copy())
    )
    renamed = base.rename(columns={"v": "w"})
    assert any("columns differ" in p for p in check.compare("q", base, renamed))
    altered = base.copy()
    altered.loc[0, "v"] = 11.0
    assert any("differing rows" in p for p in check.compare("q", base, altered))
    listy = pd.DataFrame({"k": [1], "v": [[1, 2]]})
    assert any("non-scalar" in p for p in check.compare("q", listy, listy))


class _FakeCtx:
    def setLogLevel(self, lvl):
        pass


class _FakeSpark:
    sparkContext = _FakeCtx()


class _FakeCursor:
    def __init__(self, df):
        self._df = df

    def fetchdf(self):
        return self._df


class _FakeCon:
    def execute(self, sql):
        return _FakeCursor(pd.DataFrame({"n": [1]}))


class _OkResult:
    def toPandas(self):
        return pd.DataFrame({"n": [1]})


def _wire(monkeypatch, queries, oracles):
    class FakeEntry:
        pass

    FakeEntry.queries = staticmethod(lambda: queries)
    FakeEntry.oracle_sql = staticmethod(lambda: oracles)
    monkeypatch.setattr(check, "load_entry", lambda: FakeEntry)
    monkeypatch.setattr(check, "duck_con", lambda sf: _FakeCon())
    monkeypatch.setattr(
        "python_mozetl_spark.session.get_session", lambda **kw: _FakeSpark()
    )


def test_unknown_filter_name_fails(monkeypatch, capsys):
    """A typo'd filter must not report success for a run that verified
    nothing."""
    _wire(monkeypatch, {}, {})
    monkeypatch.setattr(sys, "argv", ["check.py", "/tmp/none", "no_such_query"])
    rc = check.main()
    out = capsys.readouterr().out
    assert rc == 1
    assert "unknown query name" in out and "no_such_query" in out


def test_full_sweep_footer_counts_registry_and_fails_on_error(
    monkeypatch, capsys
):
    """Unfiltered sweeps emit one row per registry query, a crashing
    query becomes its FAIL row (not a truncation), and the footer
    states N of M with M = the registry size — the r6 lesson."""

    def ok(spark, sf):
        return _OkResult()

    def boom(spark, sf):
        raise RuntimeError("synthetic crash")

    _wire(monkeypatch, {"good": ok, "bad": boom}, {"good": "SELECT 1 AS n"})
    monkeypatch.setattr(sys, "argv", ["check.py", "/tmp/none"])
    rc = check.main()
    out = capsys.readouterr().out
    assert rc == 1  # the crash fails the sweep
    assert "PASS good" in out and "FAIL bad" in out
    assert "FULL registry" in out
    assert "2 of 2 registry queries graded" in out


def test_filtered_sweep_is_marked_partial(monkeypatch, capsys):
    def ok(spark, sf):
        return _OkResult()

    _wire(monkeypatch, {"good": ok, "other": ok}, {"good": "SELECT 1 AS n"})
    monkeypatch.setattr(sys, "argv", ["check.py", "/tmp/none", "good"])
    rc = check.main()
    out = capsys.readouterr().out
    assert rc == 0
    assert "PARTIAL" in out and "NOT a certification" in out
    assert "1 of 2 registry queries" in out
