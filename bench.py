"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed four times: a warm-up (JIT/codegen/page-cache)
and THREE timed runs, reporting the per-query MEDIAN — single runs at
sf0.1 carry 30%+ scheduler jitter (doc_minhash_pairs drifted 2.07→2.77 s
between identical runs in round 1), so medians are what make
round-over-round comparison signal.  The timed action is a full
materialization (``df.write.format("noop")``) so the measured cost is
the whole plan, not a partial collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_mozetl_spark.plans.queries import REGISTRY  # noqa: E402
from python_mozetl_spark.session import get_session  # noqa: E402


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [name for name, q in REGISTRY.items() if q.bench]
    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm-up
        runs = []
        for _ in range(3):
            t0 = time.time()
            q.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[1], 3)  # median of 3

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    run()
