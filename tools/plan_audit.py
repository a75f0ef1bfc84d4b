"""Registry-wide plan audit (round 13): build EVERY registry query and
scan its formatted physical plan for waste signatures, without
executing anything (planning only; queries with planning-time gates
may run their bounded probe collects).

Flags per query:
- n_exchange / n_sort / n_window: raw operator counts in the tree
- spread_bcast: a RoundRobinPartitioning Exchange sitting DIRECTLY
  under a BroadcastExchange (a shuffle whose only consumer is a
  driver collect — the embedding_topk bug class)
- n_python: BatchEvalPython / ArrowEvalPython / MapInPandas /
  PythonMapInArrow nodes (row-UDF smell if BatchEvalPython)
- batch_eval: specifically BatchEvalPython (pickled row-at-a-time)

Usage: python tools/plan_audit.py [sf_dir] > audit.txt
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from python_mozetl_spark.plans.queries import REGISTRY
    from python_mozetl_spark.session import get_session

    spark = get_session(app_name="plan_audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, q in REGISTRY.items():
        try:
            df = q.build(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — audit must cover all
            rows.append((name, -1, -1, -1, False, -1, f"ERR {e}"))
            continue
        tree = plan.split("\n\n", 1)[0]
        n_ex = len(re.findall(r"\bExchange\b", tree))
        n_sort = len(re.findall(r"\bSort\b", tree))
        n_win = len(re.findall(r"\bWindow\b", tree))
        n_py = len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|PythonMapInArrow|"
                r"MapInArrow|FlatMapGroupsInPandas",
                tree,
            )
        )
        batch_eval = "BatchEvalPython" in tree
        # RoundRobin Exchange directly under a BroadcastExchange: the
        # detail section lists operators in tree order; use the tree
        # text's "BroadcastExchange (i)" then next line "Exchange (j)"
        spread_bcast = bool(
            re.search(r"BroadcastExchange \(\d+\)\n\s*:?\s*\+- Exchange", tree)
        ) and "RoundRobinPartitioning" in plan
        rows.append(
            (name, n_ex, n_sort, n_win, spread_bcast, n_py,
             "BATCH_EVAL" if batch_eval else "")
        )
    rows.sort(key=lambda r: -r[1])
    print(f"{'query':42s} ex sort win py  flags")
    for name, n_ex, n_sort, n_win, sb, n_py, note in rows:
        flags = " ".join(
            x for x in (("SPREAD>BCAST" if sb else ""), note) if x
        )
        print(f"{name:42s} {n_ex:2d} {n_sort:3d} {n_win:3d} {n_py:2d}  {flags}")
    spark.stop()


if __name__ == "__main__":
    main()
