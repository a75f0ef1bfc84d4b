"""Capture .explain("formatted") output for registry queries.

Writes plans/r13/<query>_<tag>.txt for each named query (default: the
bench headline set), so plan-shape claims in OPTIMIZATION_r13.md are
checkable without running Spark.

Usage: python tools/capture_plans.py <tag> [query ...]
  tag     suffix for the files (e.g. "before", "after")
  query   registry names; default = the bench set
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    from python_mozetl_spark.plans.queries import REGISTRY
    from python_mozetl_spark.session import get_session

    names = sys.argv[2:] or [n for n, q in REGISTRY.items() if q.bench]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", os.environ.get("PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
    spark.stop()


if __name__ == "__main__":
    main()
