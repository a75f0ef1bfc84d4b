"""Per-stage attribution of the doc_winnow_copy_pairs scale residual.

The round-9 prefix-filter rewrite (ext/dedup.py:883) left an
unattributed residual: x30/x10 wall ratio 3.55 vs 3.04x output-row
growth (VERDICT r09 "What's wrong").  This tool times the pipeline's
CUMULATIVE stage prefixes independently on the scalefix decades, so
successive differences attribute the wall time to a stage:

  S1  fingerprints      winnow_fingerprints(...)           (md5 pass)
  S2  + prune           per-doc count window, m >= T
  S3  + prefix          df window + rarest-first row_number
  S4  + candidates      bounded_bucket_pairs on prefix rows + dedup
  S5  full pipeline     winnow_copy_pairs (adds the array-verify)

Each stage frame is built FRESH (no shared localCheckpoints), so a
stage's wall time includes everything upstream of it and nothing
cached — the S2..S4 chains mirror the c-prefix chain in ext/dedup.py (winnow_copy_pairs)
(kept in lockstep by tests/test_r10.py::test_profile_winnow_stage_
chain_matches_impl, which pins S4's candidate count to the real
pipeline's).  Parameters match the graded doc_winnow_copy_pairs row
(k=8, window=4, min_shared=50, max_bucket=500).

Usage: ``python tools/profile_winnow.py [x10 x30 ...]`` — prints one
JSON line per scale tag with per-stage medians (of 3) and row counts.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

K, WINDOW, MIN_SHARED, MAX_BUCKET, C = 8, 4, 50, 500, 8


def _stage_frames(spark, sf_dir):
    """Fresh (S1..S5) frames — no caching shared across stages."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.dedup import (
        bounded_bucket_pairs,
        winnow_copy_pairs,
        winnow_fingerprints,
    )
    from python_mozetl_spark.plans.queries import t

    def fps_pruned():
        d = t(spark, sf_dir, "documents")
        fps = winnow_fingerprints(d, "doc_id", "text", k=K, window=WINDOW)
        w_doc = Window.partitionBy("doc_id")
        return fps.withColumn("__m", F.count(F.lit(1)).over(w_doc)).where(
            F.col("__m") >= MIN_SHARED
        )

    def prefix():
        ranked = fps_pruned().withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        order = Window.partitionBy("doc_id").orderBy("__df", "fp")
        return ranked.withColumn("__rn", F.row_number().over(order)).where(
            F.col("__rn") <= F.col("__m") - F.lit(MIN_SHARED) + F.lit(C)
        )

    def cand():
        return (
            bounded_bucket_pairs(
                prefix().select(
                    F.col("fp").alias("bucket"),
                    F.struct(F.col("doc_id")).alias("__p"),
                ),
                "bucket",
                "__p",
                "doc_id",
                max_bucket=MAX_BUCKET,
            )
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("__hits"))
            .where(F.col("__hits") >= F.lit(C))
            .select("id_a", "id_b")
        )

    d = t(spark, sf_dir, "documents")
    return {
        "s1_fingerprints": lambda: winnow_fingerprints(
            d, "doc_id", "text", k=K, window=WINDOW
        ),
        "s2_pruned": fps_pruned,
        "s3_prefix": prefix,
        "s4_candidates": cand,
        "s5_full": lambda: winnow_copy_pairs(
            t(spark, sf_dir, "documents"),
            "doc_id",
            "text",
            k=K,
            window=WINDOW,
            min_shared=MIN_SHARED,
            max_bucket=MAX_BUCKET,
        ),
    }


def main() -> None:
    tags = sys.argv[1:] or ["x10", "x30"]
    from python_mozetl_spark.session import get_session

    spark = get_session()
    for tag in tags:
        sf_dir = os.path.join(ROOT, "scalefix", tag)
        out = {"tag": tag}
        for name, make in _stage_frames(spark, sf_dir).items():
            walls, rows = [], None
            for _ in range(3):
                t0 = time.time()
                rows = make().count()
                walls.append(time.time() - t0)
            out[name] = {
                "sec": round(statistics.median(walls), 2),
                "min": round(min(walls), 2),
                "max": round(max(walls), 2),
                "rows": rows,
            }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
