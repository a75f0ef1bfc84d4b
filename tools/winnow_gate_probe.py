"""Record the anchor_arity='auto' gate decision per decade (round 13,
VERDICT r12 task 1 done-criteria: "the x300 sweep row records which
side the gate chose and why").

The gate runs at PLAN-BUILD time — two count-shaped aggregates over
the localCheckpoint-staged prefix frame — so probing the decision
costs the fingerprint/window/prefix subtree once, NOT a full winnow
run (the x300 full run costs ~18 min; this probe reads the same two
observables the r12 regime attribution derived by hand from
``winnow_bucket_histogram``).

Prints one JSON line per tag: the two observables
(arity1_enumerations = Σ_buckets s(s−1)/2 over prefix buckets;
arity2_rows = Σ_docs p(p−1)/2), the arity chosen, the reason, and the
probe wall.  Production hash path (xxhash64), graded winnow
configuration.

Usage (x300 needs the scale_x300 heap/shuffle convention)::

    python tools/winnow_gate_probe.py x10 x30
    SPARK_GRAFT_DRIVER_MEM=96g python tools/winnow_gate_probe.py \
        --shuffle=128 x100 x300
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
    tags = args or ["x10", "x30"]
    spark = get_session(app_name="winnow_gate_probe",
                        shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    from python_mozetl_spark.ext.dedup import winnow_copy_pairs
    from python_mozetl_spark.plans.queries import t

    for tag in tags:
        sf_dir = os.path.join(ROOT, "scalefix", tag)
        d = t(spark, sf_dir, "documents")
        rep: dict = {}
        t0 = time.time()
        # the gate aggregates run inside the call; the returned pair
        # frame is deliberately NOT materialized — the decision and
        # its observables are the probe's whole output
        winnow_copy_pairs(
            d, "doc_id", "text", k=K, window=WINDOW,
            min_shared=MIN_SHARED, max_bucket=MAX_BUCKET,
            hash_fn=HASH_FN, anchor_arity="auto", gate_report=rep,
        )
        print(
            json.dumps(
                {
                    "tag": tag,
                    "hash_fn": HASH_FN,
                    "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
                    "gate_sec": round(time.time() - t0, 1),
                    **rep,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
