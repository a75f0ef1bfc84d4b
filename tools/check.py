"""Local mirror of the driver's correctness gate.

Runs every query in __spark_entry__.queries() at a given SF, runs its
oracle_sql() twin in DuckDB over the same parquet, and compares
row-count, column names, and order-insensitive values.

Usage: python tools/check.py [sf_dir] [query ...]

Certification contract (round 7, after the r6 evidence gap): an
UNFILTERED run is the only output admissible as a full-registry
certification.  It enumerates the whole registry, emits EXACTLY ONE
result line per registered query (a crash mid-query becomes that
query's FAIL row, not a silent truncation), and its footer states
``N of M registry queries`` with M = len(REGISTRY) — the footer
hard-fails (nonzero exit + a FAIL line naming every absent query) if
any registered query produced no row.  A filtered run prints a
``PARTIAL`` banner and footer so it can never be mistaken for (or
concatenated into) a certification.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd


def load_entry():
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry

    return entry


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    from python_mozetl_spark.plans.queries import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values for order-insensitive compare
    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "␀"
        if isinstance(v, float):
            # ±inf formats fine via f-string; the old int(v) equality
            # probe raised OverflowError on it and aborted the sweep
            return f"{v:.6f}" if math.isfinite(v) else str(v)
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)

    out = df.apply(lambda col: col.map(cell))
    out = out.sort_values(by=list(out.columns)).reset_index(drop=True)
    return out


def nonscalar_cols(df: pd.DataFrame) -> list[str]:
    """Columns holding list/array/dict cells.  The DRIVER's canonicalizer
    sorts RAW pandas cells (``sort_values`` over object columns) and dies
    with ``TypeError: unhashable type`` on any such cell — round 5 shipped
    two queries that passed here but err'd in the driver because this
    mirror stringified before sorting.  Mirror the driver: any complex-
    typed output column is a FAIL."""
    bad = []
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            # scan EVERY cell: a column NULL for its first rows but
            # list-typed further down would still crash the driver
            for v in col:
                if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
                    bad.append(c)
                    break
    return bad


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    bad = sorted(set(nonscalar_cols(spark_df)) | set(nonscalar_cols(duck_df)))
    if bad:
        problems.append(
            f"non-scalar output columns {bad}: the driver's "
            "canonicalizer cannot sort list/array cells — serialize them "
            "(array_join / fixed-precision ints) in the graded query"
        )
        return problems
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"
        )
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        idx = list(a.index[neq])[:3]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].to_dict()}")
            problems.append(f"row {i}:  duck={b.loc[i].to_dict()}")
        problems.append(f"{int(neq.sum())} differing rows")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    entry = load_entry()
    from python_mozetl_spark.session import get_session

    spark = get_session(app_name="check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    queries = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(queries)
    if unknown:
        # a typo'd filter must not report "0 fail" success for a run
        # that verified nothing
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        return 1
    registry_total = len(queries)
    if only:
        print(
            f"PARTIAL sweep: {len(only)} of {registry_total} registry "
            "queries (filtered run — NOT a certification)"
        )
    n_pass = n_fail = n_weak = 0
    graded: set[str] = set()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        graded.add(name)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows={len(sdf)} (no oracle) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            print(f"FAIL {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"   {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(sdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    # completeness assertion — the r6 certification lesson: a sweep
    # that silently covers less than the registry must not be able to
    # print a success footer.  Every registered query (or, filtered,
    # every requested one) must have produced exactly one row above.
    expected = only if only else set(queries)
    absent = sorted(expected - graded)
    for name in absent:
        print(f"FAIL {name}: no result row emitted (incomplete sweep)")
        n_fail += 1
    kind = "PARTIAL (filtered — not a certification)" if only else "FULL registry"
    print(
        f"\n{kind}: {n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail "
        f"— {len(graded)} of {registry_total} registry queries graded"
    )
    if not only and len(graded) != registry_total:
        print(
            f"FAIL certification incomplete: {registry_total - len(graded)} "
            "registry queries have no result row"
        )
        return 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
