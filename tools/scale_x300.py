"""Fifth decade point (round 12): winnow + minhash at x300 (1.5M
docs) on the PRODUCTION hash path.

Why this exists: the r10 x100 envelope was md5-spill-bound (54M-row
hex fingerprints), so the fifth decade was unmeasurable; the round-11
``hash_fn`` seam removed that term (x100 winnow 259.5 s md5 vs
137.2 s xxh64), which makes x300 reachable — and the question it
answers is whether candidate EXACTNESS (the c=8 prefix-hit filter:
candidates ≈ true pairs at every measured decade) still holds where
no one has looked.

Runs, single rep each after a warm count pass (the decade exponent is
the point, not a tight median — a median-of-3 here costs ~an hour):

  - winnow_xxh64 wall + output rows (true pairs)
  - the winnow candidate observable at x300: raw bucket pair rows and
    c=8 candidates (the profile_winnow S4 chain on the xxh64 seam)
  - minhash_xxh64 wall + output rows

Heap: export SPARK_GRAFT_DRIVER_MEM=48g before invoking (the x100
convention).  Usage::

    SPARK_GRAFT_DRIVER_MEM=48g python tools/scale_x300.py [tag ...]

Default tag x300; pass x30/x100 to re-anchor the same observables on
the earlier decades in the same session (box-shift control).  Prints
one JSON line per tag for SCALE_CURVE_r12.json.
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


def _winnow(spark, sf_dir):
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs
    from python_mozetl_spark.plans.queries import t

    d = t(spark, sf_dir, "documents")
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return winnow_copy_pairs(
        d, "doc_id", "text", k=K, window=WINDOW, min_shared=MIN_SHARED,
        max_bucket=MAX_BUCKET, spread_pairs=shuffle_parts * 8,
        hash_fn=HASH_FN,
    )


def _minhash(spark, sf_dir):
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs
    from python_mozetl_spark.plans.queries import t

    d = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", threshold=0.8,
                             hash_fn=HASH_FN)


def _winnow_candidates(spark, sf_dir):
    """The profile_winnow S2..S4 chain on the production hash seam —
    (raw bucket pair rows, c=8 candidates)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.dedup import (
        bounded_bucket_pairs,
        winnow_fingerprints,
    )
    from python_mozetl_spark.plans.queries import t

    d = t(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, "doc_id", "text", k=K, window=WINDOW,
                              hash_fn=HASH_FN)
    w_doc = Window.partitionBy("doc_id")
    pruned = fps.withColumn("__m", F.count(F.lit(1)).over(w_doc)).where(
        F.col("__m") >= MIN_SHARED
    )
    ranked = pruned.withColumn(
        "__df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    )
    order = Window.partitionBy("doc_id").orderBy("__df", "fp")
    prefix = ranked.withColumn("__rn", F.row_number().over(order)).where(
        F.col("__rn") <= F.col("__m") - F.lit(MIN_SHARED) + F.lit(C)
    ).localCheckpoint(eager=False)
    raw = bounded_bucket_pairs(
        prefix.select(F.col("fp").alias("bucket"),
                      F.struct(F.col("doc_id")).alias("__p")),
        "bucket", "__p", "doc_id", max_bucket=MAX_BUCKET,
    ).select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    n_raw = raw.count()
    n_cand = (
        raw.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__hits"))
        .where(F.col("__hits") >= F.lit(C))
        .count()
    )
    return n_raw, n_cand


def main() -> None:
    from python_mozetl_spark.session import get_session

    args = sys.argv[1:]
    # --shuffle=N: at 1.5M docs the ~100M-row fingerprint exchanges
    # need more than the local default 32 post-shuffle partitions to
    # keep per-task sort/agg state inside the heap (the first 48 g
    # x300 attempt OOM'd mid-window at 32 partitions) — exactly the
    # knob a real cluster turns with corpus size (SCALE.md §8)
    shuffle = None
    for a in list(args):
        if a.startswith("--shuffle="):
            shuffle = int(a.split("=", 1)[1])
            args.remove(a)
    tags = args or ["x300"]
    spark = get_session(app_name="scale_x300", shuffle_partitions=shuffle)
    spark.sparkContext.setLogLevel("ERROR")

    for tag in tags:
        sf_dir = os.path.join(ROOT, "scalefix", tag)
        out: dict = {"tag": tag, "hash_fn": HASH_FN,
                     "heap": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")}
        for name, make in (("winnow_xxh64", _winnow),
                           ("minhash_xxh64", _minhash)):
            try:
                rows = make(spark, sf_dir).count()  # warm + row count
                spark._jvm.System.gc()
                t0 = time.time()
                make(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name] = {"sec": round(time.time() - t0, 1),
                             "rows": rows}
            except Exception as e:  # record, keep going
                out[name] = {"error": type(e).__name__}
            print(f"# {tag} {name}: {out[name]}", file=sys.stderr,
                  flush=True)
        try:
            n_raw, n_cand = _winnow_candidates(spark, sf_dir)
            out["winnow_candidates_c8"] = {
                "raw_bucket_pairs": n_raw, "candidates": n_cand,
            }
        except Exception as e:
            out["winnow_candidates_c8"] = {"error": type(e).__name__}
        print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
