"""Per-stage attribution of the doc_tfidf_cosine_pairs wall, plus an
order-balanced verify-key A/B.

The round-11 pre-attribution (SCALE_CURVE_r11 ``tfidf_stage_profile``)
put the wall at the VERIFY tier — attaching two per-doc weight maps to
every candidate pair and folding ``map_zip_with`` — and two
experiments settled what to do about it (SCALE.md §6g″/§6h): the L2AP
partial-dot candidate cut is VACUOUS at t=0.9 (the candidate set is
irreducible by prefix-depth bounds), so the per-pair CONSTANT got the
fix (xxhash64 map keys).  This tool keeps both observables re-runnable
per round:

  S1  candidates      tfidf_candidate_stats (the exact verify input)
  S2  docvec          postings → per-doc weight-map build (count)
  S3  full            tfidf_cosine_pairs end-to-end

and ``--ab`` runs the token/xxhash64 verify-key pair ORDER-BALANCED
(alternating AB/BA per round): a naive sequential A/B on this box read
a 2× win that was pure load confound — the first runner always pays
the heavier load while box load decays — so the balanced design is the
only comparison BASELINE.md accepts for seam deltas.

Usage::

    python tools/profile_tfidf.py [x10 x30 ...]        # stage medians
    python tools/profile_tfidf.py --ab [x10 x30 ...]   # verify-key A/B

Prints one JSON line per scale tag.  Threshold/configuration match the
graded ``doc_tfidf_cosine_pairs`` row (t=0.9, defaults otherwise).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

THRESHOLD = 0.9


def _stage_frames(spark, sf_dir):
    """Fresh stage frames — no caching shared across stages."""
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.search import (
        _tfidf_prefix_candidates,
        tfidf_candidate_stats,
        tfidf_cosine_pairs,
    )
    from python_mozetl_spark.plans.queries import t

    def candidates():
        d = t(spark, sf_dir, "documents")
        return tfidf_candidate_stats(d, "doc_id", "text", threshold=THRESHOLD)

    def docvec():
        d = t(spark, sf_dir, "documents")
        postings, _ = _tfidf_prefix_candidates(
            d, "doc_id", "text", THRESHOLD, True, True, 6
        )
        return postings.groupBy("__id").agg(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.xxhash64("__tok").alias("__h"), "__u")
                    )
                )
            ).alias("__m")
        )

    def full():
        d = t(spark, sf_dir, "documents")
        return tfidf_cosine_pairs(d, "doc_id", "text", threshold=THRESHOLD)

    return {"s1_candidates": candidates, "s2_docvec": docvec, "s3_full": full}


def _stage_sweep(spark, tags) -> None:
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


def _ab_sweep(spark, tags, rounds: int = 3) -> None:
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs
    from python_mozetl_spark.plans.queries import t

    for tag in tags:
        sf_dir = os.path.join(ROOT, "scalefix", tag)

        def run(keys: str) -> float:
            spark._jvm.System.gc()
            t0 = time.time()
            tfidf_cosine_pairs(
                t(spark, sf_dir, "documents"),
                "doc_id",
                "text",
                threshold=THRESHOLD,
                verify_keys=keys,
            ).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 2)

        run("token")  # warm both paths before any timed run
        run("xxhash64")
        res: dict[str, list[float]] = {"token": [], "xxhash64": []}
        for i in range(rounds):
            # alternate AB / BA so load drift cannot favour one side
            order = (
                ("token", "xxhash64") if i % 2 == 0 else ("xxhash64", "token")
            )
            for keys in order:
                res[keys].append(run(keys))
        print(
            json.dumps(
                {
                    "tag": tag,
                    "token": {
                        "runs": res["token"],
                        "med": round(statistics.median(res["token"]), 2),
                    },
                    "xxhash64": {
                        "runs": res["xxhash64"],
                        "med": round(statistics.median(res["xxhash64"]), 2),
                    },
                }
            ),
            flush=True,
        )


def _attach_sweep(spark, tags, rounds: int = 3) -> None:
    """Round-13 (VERDICT r12 task 3): measure the OVER-BUDGET attach
    regime.  The verify_attach='auto' gate flips to the shuffled
    attach exactly where the docvec table outgrows the broadcast
    budget — i.e. exactly the 100 TB shape — but r12 measured only the
    broadcast side past x10.  Order-balanced broadcast/shuffle A/B
    (same discipline as --ab: alternating AB/BA so box-load decay
    cannot favour one side) gives the cost curve the big-corpus path
    actually rides, per decade."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs
    from python_mozetl_spark.plans.queries import t

    for tag in tags:
        sf_dir = os.path.join(ROOT, "scalefix", tag)

        def run(mode: str) -> float:
            spark._jvm.System.gc()
            kw = {"verify_slabs": 2} if mode == "slab" else {}
            t0 = time.time()
            tfidf_cosine_pairs(
                t(spark, sf_dir, "documents"),
                "doc_id",
                "text",
                threshold=THRESHOLD,
                verify_attach=mode,
                **kw,
            ).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 2)

        modes = ("broadcast", "slab", "shuffle")
        for m in modes:  # warm every path before any timed run
            run(m)
        res: dict[str, list[float]] = {m: [] for m in modes}
        for i in range(rounds):
            # rotate the order each round so load drift cannot favour
            # any one mode (the 2-mode ABBA generalized)
            order = modes[i % len(modes):] + modes[: i % len(modes)]
            for mode in order:
                res[mode].append(run(mode))
        print(
            json.dumps(
                {
                    "tag": tag,
                    **{
                        m: {
                            "runs": res[m],
                            "med": round(statistics.median(res[m]), 2),
                        }
                        for m in modes
                    },
                }
            ),
            flush=True,
        )


def _slabcap_sweep(spark, tags, rounds: int = 3) -> None:
    """Round-14 (VERDICT r13 item 5): measure the slab regime PAST the
    verify_max_slabs=8 cap.  The cap's value was reasoned (B² union
    branches -> plan-size blowup), not measured; this forces
    B = 8/16/32/64 against the shuffled attach at the same decade,
    order-balanced like the other sweeps, so the cap (and the auto
    gate's slab->shuffle handoff point) is justified by numbers.
    Wall includes plan build time — the B² branch count taxes the
    DRIVER (analysis/optimization), which is exactly the cost the cap
    guards, so build+execute is the honest measurement."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs
    from python_mozetl_spark.plans.queries import t

    for tag in tags:
        sf_dir = os.path.join(ROOT, "scalefix", tag)

        def run(mode: str) -> float:
            spark._jvm.System.gc()
            kw: dict = {}
            attach = mode
            if mode.startswith("slab"):
                attach = "slab"
                kw["verify_slabs"] = int(mode[4:])
            t0 = time.time()
            tfidf_cosine_pairs(
                t(spark, sf_dir, "documents"),
                "doc_id",
                "text",
                threshold=THRESHOLD,
                verify_attach=attach,
                **kw,
            ).write.format("noop").mode("overwrite").save()
            return round(time.time() - t0, 2)

        modes = ("slab8", "slab16", "slab32", "slab64", "shuffle")
        for m in modes:  # warm every path before any timed run
            run(m)
        res: dict[str, list[float]] = {m: [] for m in modes}
        for i in range(rounds):
            order = modes[i % len(modes):] + modes[: i % len(modes)]
            for mode in order:
                res[mode].append(run(mode))
        print(
            json.dumps(
                {
                    "tag": tag,
                    **{
                        m: {
                            "runs": res[m],
                            "med": round(statistics.median(res[m]), 2),
                        }
                        for m in modes
                    },
                }
            ),
            flush=True,
        )


def main() -> None:
    args = [
        a for a in sys.argv[1:] if a not in ("--ab", "--attach", "--slabcap")
    ]
    rounds = 3
    for a in list(args):
        # --rounds=1: the scale_x300 single-rep convention for decade
        # exponents where a median-of-3 costs an hour
        if a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
            args.remove(a)
    tags = args or ["x10", "x30"]
    from python_mozetl_spark.session import get_session

    spark = get_session(app_name="profile_tfidf")
    spark.sparkContext.setLogLevel("ERROR")
    if "--ab" in sys.argv[1:]:
        _ab_sweep(spark, tags, rounds=rounds)
    elif "--attach" in sys.argv[1:]:
        _attach_sweep(spark, tags, rounds=rounds)
    elif "--slabcap" in sys.argv[1:]:
        _slabcap_sweep(spark, tags, rounds=rounds)
    else:
        _stage_sweep(spark, tags)


if __name__ == "__main__":
    main()
