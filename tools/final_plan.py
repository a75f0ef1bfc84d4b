"""Run a registry query to the noop sink and print its EXECUTED plan.

explain() before execution shows the initial AQE plan
(isFinalPlan=false) — exchange/stage reuse decisions only appear in
the final adaptive plan after the query has run.  This prints that,
so recompute-vs-reuse questions (e.g. does AQE dedupe the identical
branch subtrees under a Union?) are answered by evidence.

Usage: python tools/final_plan.py <query> [out_path]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else None
    from python_mozetl_spark.plans.queries import REGISTRY
    from python_mozetl_spark.session import get_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="final_plan")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[name].build(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if out:
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out}")
    else:
        print(plan)
    spark.stop()


if __name__ == "__main__":
    main()
