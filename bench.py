"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Variance engineering (rounds 1-5 showed the per-invocation total
drifting 9.4-15.9 s on an identical tree, with the drift landing on
whichever query ran first or inherited a GC debt):

- GLOBAL warm pass first: every headline query runs once before ANY
  timing, so JVM/JIT/codegen ramp and page-cache fill are paid outside
  the timed window instead of by the first query's runs.
- Forced full GC before each query's timed runs: heap debt accrued by
  query N was previously being attributed to query N+1 (a stop-the-
  world collection landing mid-run inflated that query 2x).
- MEDIAN OF 5 timed runs per query (was 3): at sf0.1 a single run
  carries 30%+ scheduler jitter; the wider sample tightens the median.

The timed action is a full materialization (``df.write.format("noop")``)
so the measured cost is the whole plan, not a partial collect.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from python_mozetl_spark.plans.queries import REGISTRY  # noqa: E402
from python_mozetl_spark.session import get_session  # noqa: E402


def _cpu_ticks() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat, or None off-Linux.

    Round 14: the round-13 driver-vs-builder gap on the staged queries
    was finally attributed to HOST-level CPU steal (measured spiking to
    20-26% on this guest while loadavg read ~0 and the canary drifted
    only mildly) — identical winnow runs read 5.6 s at low steal and
    13-14 s inside a steal window.  The canary alone cannot separate
    "slow tree" from "stolen CPU", so the bench records the steal
    fraction across its own wall as a second box-state gauge.
    """
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
        steal = vals[7] if len(vals) > 7 else 0
        return steal, sum(vals)
    except Exception:
        return None


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # parse the scale factor from a trailing sf<number> path segment
    # ONLY — substring matching broke on any path merely containing
    # "sf" (e.g. .../transfer/data)
    m = re.search(r"sf(\d+(?:\.\d+)?)/?$", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_session(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    def materialize(name: str) -> None:
        REGISTRY[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    names = [name for name, q in REGISTRY.items() if q.bench]
    ticks0 = _cpu_ticks()
    t_warm = time.time()
    for name in names:  # global warm pass — see module docstring
        materialize(name)
    # box canary (round 13): the warm pass is the one cross-round
    # constant-shape workload every bench invocation already pays, so
    # its wall doubles as a BOX-STATE reading — three rounds running,
    # the driver's BENCH artifact needed same-tree repo-side re-runs
    # to decide "regression or loaded box" (r8 minhash, r12 total).
    # BASELINE.md "canary rule": compare a round's canary to the
    # anchor round's before comparing walls; a high canary means the
    # box was busy — compare per-query RATIOS to the canary instead.
    box_canary = round(time.time() - t_warm, 3)
    timings: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in names:
        spark._jvm.System.gc()  # don't bill query N for query N-1's heap debt
        runs = []
        for _ in range(5):
            t0 = time.time()
            materialize(name)
            runs.append(time.time() - t0)
        timings[name] = round(sorted(runs)[2], 3)  # median of 5
        # keep the spread the median throws away: a 11-vs-15 s reading
        # is only interpretable next to its own min/max (BASELINE.md
        # "variance rule")
        spread[name] = {
            "median": timings[name],
            "min": round(min(runs), 3),
            "max": round(max(runs), 3),
        }

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spread,
        "box_canary": box_canary,
        "sf": sf,
    }
    ticks1 = _cpu_ticks()
    if ticks0 and ticks1 and ticks1[1] > ticks0[1]:
        out["cpu_steal_pct"] = round(
            100.0 * (ticks1[0] - ticks0[0]) / (ticks1[1] - ticks0[1]), 2
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    run()
