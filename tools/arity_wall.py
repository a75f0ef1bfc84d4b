"""Full winnow WALLS for both anchor arities at one decade, plus the
auto-gate decision (round 14, VERDICT r13 item 7).

The r12/r13 record has the arity-2 story as OBSERVABLES (composite row
volume per decade, the x1000 gate flip) but only arity-1 walls: the
one attempted arity-2 wall (x100, r12) died on shuffle-temp disk
because it was co-run with the observables job.  This tool runs each
arm ALONE: warm count pass on the documents scan, then a single-rep
noop-sink wall per arity (the scale_x300 single-rep decade
convention — the decade exponent is the point, not a tight median),
then the gate probe (anchor_arity='auto', gate_report, frame not
materialized) so the decision is recorded next to the walls it
predicts.

x1000 (5M docs, ~27B composite rows) remains out of single-box scope
— the r12 x100 co-run already exhausted the box's shuffle disk at
2.1B rows, and this box has ~80 GB free; x100 run alone is the
largest decade BOTH arms sustain.  Usage::

    SPARK_GRAFT_DRIVER_MEM=48g python tools/arity_wall.py \
        --shuffle=128 x100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

K, WINDOW, MIN_SHARED, MAX_BUCKET, C = 8, 4, 50, 500, 8
HASH_FN = "xxhash64"


def main() -> None:
    from python_mozetl_spark.session import get_session

    args = sys.argv[1:]
    shuffle = None
    for a in list(args):
        if a.startswith("--shuffle="):
            shuffle = int(a.split("=", 1)[1])
            args.remove(a)
    tags = args or ["x100"]
    spark = get_session(app_name="arity_wall", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    from python_mozetl_spark.ext.dedup import winnow_copy_pairs
    from python_mozetl_spark.plans.queries import t

    for tag in tags:
        sf_dir = os.path.join(ROOT, "scalefix", tag)
        d = t(spark, sf_dir, "documents")
        d.count()  # warm the scan / page cache outside any timed wall
        out: dict = {"tag": tag, "hash_fn": HASH_FN,
                     "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
                     "shuffle_partitions": shuffle}
        for arity in (1, 2):
            spark.sparkContext.setJobDescription(
                f"arity_wall {tag} arity={arity}"
            )
            t0 = time.time()
            winnow_copy_pairs(
                d, "doc_id", "text", k=K, window=WINDOW,
                min_shared=MIN_SHARED, max_bucket=MAX_BUCKET,
                hash_fn=HASH_FN, anchor_arity=arity,
            ).write.format("noop").mode("overwrite").save()
            out[f"arity{arity}_wall_sec"] = round(time.time() - t0, 1)
            spark.sparkContext.setJobDescription(None)
        rep: dict = {}
        t0 = time.time()
        winnow_copy_pairs(
            d, "doc_id", "text", k=K, window=WINDOW,
            min_shared=MIN_SHARED, max_bucket=MAX_BUCKET,
            hash_fn=HASH_FN, anchor_arity="auto", gate_report=rep,
        )
        out["gate_sec"] = round(time.time() - t0, 1)
        out["gate"] = rep
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
