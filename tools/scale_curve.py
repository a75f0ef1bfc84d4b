"""Measure the scale-decade curve for the dedup/similarity core.

Runs the headline dedup/similarity operators on the generator-matched
``scalefix/x1`` (5k docs / 2k vecs) and ``scalefix/x10`` (50k / 20k)
fixtures (tools/make_scale_fixture.py — Heaps-scaled vocabulary,
constant near-dup rate, so true pair volume grows ~linearly) and
reports median-of-3 wall time plus the x10/x1 growth ratio.  A ratio
near 10 is linear; near 100 is quadratic — the table lands in
BASELINE.md "Scale-decade evidence" and SCALE.md cites it.

Two SemDeDup rows on purpose: ``semantic_dedup_auto`` is the enforced
scale path (k = ceil(n / target_cluster_size), bounded per-cluster
fanout) — since round 9 also exactly the graded
``embedding_semantic_dedup_hi`` configuration — while
``semantic_dedup_fixed_k8`` is the retired fixed-k grading shape kept
as the measured CONTRAST row (fixed k means cluster size grows with
the corpus and within-cluster pair fanout grows quadratically; it
OOMs at x10).  The pair of rows is the measured argument for the
auto-k rule.

For ``doc_tfidf_cosine_pairs`` — the steepest wall-time curve in the
family (x10 ratio 6.01 in r08) — the sweep also measures the
CANDIDATE-PAIR count at both scales (ext/search.py:
tfidf_candidate_stats, the exact frame the verify joins consume):
wall time shows the symptom, candidate growth is the quantity that
decides whether the prefix filter is bending quadratic on this df
distribution.

Also runs the isolated doc_winnow_copy_pairs AND doc_minhash_pairs
microbenches at sf0.1 (median of 5) — the per-round regression
signals BASELINE.md pins instead of full-bench single readings
(VERDICT r07 task 8; r08 task 1 added minhash after its 2x artifact
breach).

Usage: ``python tools/scale_curve.py`` — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _semantic_dedup_auto(spark, sf_dir):
    from python_mozetl_spark.ext.similarity import semantic_dedup
    from python_mozetl_spark.plans.queries import t

    e = t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding", k=None, iters=2, threshold=0.95,
        target_cluster_size=250,
    )


def _winnow_xxh64(spark, sf_dir):
    # the PRODUCTION hash path (round 11): identical configuration to
    # the graded doc_winnow_copy_pairs but with the fingerprint digest
    # on gram_hash_int64's xxhash64 seam — no md5 hex round-trip.  The
    # graded query stays on md5 for DuckDB oracle parity; this row
    # measures what a real corpus run gets.
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs
    from python_mozetl_spark.plans.queries import t

    d = t(spark, sf_dir, "documents")
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return winnow_copy_pairs(
        d, "doc_id", "text", k=8, window=4, min_shared=50,
        max_bucket=500, spread_pairs=shuffle_parts * 8,
        hash_fn="xxhash64",
    )


def _minhash_xxh64(spark, sf_dir):
    # production hash path of the graded doc_minhash_pairs (the base
    # hash is one 32-bit-md5-mod-P per shingle, a small wall share, so
    # expect parity rather than a win — pinned to prove it)
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs
    from python_mozetl_spark.plans.queries import t

    d = t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", threshold=0.8,
                             hash_fn="xxhash64")


def _tfidf_token(spark, sf_dir):
    # the pre-r11 verify-key CONTRAST row: identical candidate
    # construction and threshold to the graded doc_tfidf_cosine_pairs,
    # but the verify maps keyed by the term STRING.  The graded query
    # defaults to xxhash64 keys since round 11 (the key never reaches
    # the output, so the hashed verify is oracle-safe — unlike
    # winnow's md5); this row pins the per-round delta the long-key
    # map_zip_with merge buys, per the attribution in SCALE_CURVE_r11
    # tfidf_stage_profile / tfidf_l2ap_aggregate_probe.
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs
    from python_mozetl_spark.plans.queries import t

    d = t(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(
        d, "doc_id", "text", threshold=0.9, verify_keys="token"
    )


def _semantic_dedup_fixed_k8(spark, sf_dir):
    # the retired fixed-k grading configuration (pre-r9
    # embedding_semantic_dedup_hi), kept as the OOM contrast row
    from python_mozetl_spark.ext.similarity import semantic_dedup
    from python_mozetl_spark.plans.queries import t

    e = t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, "vec_id", "embedding", k=8, iters=2, threshold=0.95
    )


def main() -> None:
    from python_mozetl_spark.plans.queries import REGISTRY
    from python_mozetl_spark.session import get_session

    spark = get_session(app_name="scale_curve")
    spark.sparkContext.setLogLevel("ERROR")

    def build(name, sf_dir):
        if name == "semantic_dedup_auto":
            return _semantic_dedup_auto(spark, sf_dir)
        if name == "semantic_dedup_fixed_k8":
            return _semantic_dedup_fixed_k8(spark, sf_dir)
        if name == "winnow_xxh64":
            return _winnow_xxh64(spark, sf_dir)
        if name == "minhash_xxh64":
            return _minhash_xxh64(spark, sf_dir)
        if name == "tfidf_token":
            return _tfidf_token(spark, sf_dir)
        return REGISTRY[name].build(spark, sf_dir)

    def timed(name: str, sf_dir: str, reps: int) -> tuple[float, int]:
        runs = []
        # warm pass doubles as the row count — no extra materialization
        rows = build(name, sf_dir).count()
        for _ in range(reps):
            spark._jvm.System.gc()
            t0 = time.time()
            build(name, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(time.time() - t0)
        return round(sorted(runs)[len(runs) // 2], 3), rows

    queries = [
        "doc_winnow_copy_pairs",
        "winnow_xxh64",
        "doc_minhash_pairs",
        "doc_tfidf_cosine_pairs",
        "tfidf_token",
        "doc_dup_components",
        "doc_span_cut",
        "doc_domain_quota",
        "semantic_dedup_auto",
        "semantic_dedup_fixed_k8",
    ]
    # measured once and pinned: fixed-k SemDeDup (the k=8 grading
    # configuration) OOMs the 128 GiB local box at x10 — 20k vectors /
    # 8 clusters = 2500-member clusters, ~3.1M within-cluster pairs
    # each carrying two 64-dim arrays.  That is the expected quadratic
    # fanout of a fixed k, and the measured argument for the ENFORCED
    # auto-k sizing rule (the semantic_dedup_auto row, k =
    # ceil(n/250), measures ~2.7x for 10x data).  Skipped here so the
    # sweep doesn't spend 13 minutes re-deriving the OOM each run.
    skip_x10 = {
        "semantic_dedup_fixed_k8":
            "OOM (java heap) — fixed k=8 quadratic within-cluster "
            "fanout; the enforced scale path is auto-k "
            "(semantic_dedup_auto row, = the graded "
            "embedding_semantic_dedup_hi since round 9)",
    }
    out: dict[str, dict] = {}
    for name in queries:
        try:
            t1, r1 = timed(name, os.path.join(ROOT, "scalefix", "x1"), 3)
        except Exception as e:  # record, keep sweeping
            out[name] = {"x1_error": f"{type(e).__name__}"}
            print(f"# {name}: x1 FAILED {type(e).__name__}",
                  file=sys.stderr, flush=True)
            continue
        if name in skip_x10:
            out[name] = {"x1_sec": t1, "x1_rows": r1,
                         "x10": skip_x10[name]}
            print(f"# {name}: {t1}s -> x10 {skip_x10[name]}",
                  file=sys.stderr, flush=True)
            continue
        try:
            t10, r10 = timed(name, os.path.join(ROOT, "scalefix", "x10"), 3)
        except Exception as e:
            out[name] = {"x1_sec": t1, "x1_rows": r1,
                         "x10_error": f"{type(e).__name__}"}
            print(f"# {name}: x10 FAILED {type(e).__name__}",
                  file=sys.stderr, flush=True)
            continue
        out[name] = {
            "x1_sec": t1,
            "x10_sec": t10,
            "ratio": round(t10 / t1, 2),
            "x1_rows": r1,
            "x10_rows": r10,
        }
        print(f"# {name}: {t1}s -> {t10}s  ratio {out[name]['ratio']}  "
              f"rows {r1} -> {r10}", file=sys.stderr, flush=True)

    # optional third decade point (x30 = 150k docs / 60k vecs;
    # generate with ``make_scale_fixture.py --x30``): the three
    # text-pair operators whose curves are steepest, plus the
    # flagship auto-k SemDeDup and the cheap linear rows for contrast
    if "--x30" in sys.argv[1:]:
        for name in ("doc_winnow_copy_pairs", "winnow_xxh64",
                     "doc_minhash_pairs",
                     "doc_tfidf_cosine_pairs", "tfidf_token",
                     "semantic_dedup_auto",
                     "doc_dup_components", "doc_span_cut"):
            try:
                t30, r30 = timed(name, os.path.join(ROOT, "scalefix", "x30"), 3)
            except Exception as e:
                out[name]["x30_error"] = f"{type(e).__name__}"
                print(f"# {name}: x30 FAILED {type(e).__name__}",
                      file=sys.stderr, flush=True)
                continue
            out[name]["x30_sec"] = t30
            out[name]["x30_rows"] = r30
            out[name]["ratio_30_10"] = round(t30 / out[name]["x10_sec"], 2)
            print(f"# {name}: x30 {t30}s  x30/x10 ratio "
                  f"{out[name]['ratio_30_10']}  rows {r30}",
                  file=sys.stderr, flush=True)

    # optional FOURTH decade point (x100 = 500k docs / 200k vecs;
    # generate with ``make_scale_fixture.py --x100``): the three
    # steepest curves only, SINGLE rep (the point is the decade
    # exponent, not a tight median — a full median-of-3 sweep at this
    # size costs ~an hour of box time); the warm count pass still
    # precedes the timed noop write, same as every other row
    if "--x100" in sys.argv[1:]:
        for name in ("doc_winnow_copy_pairs", "doc_tfidf_cosine_pairs",
                     "semantic_dedup_auto"):
            try:
                t100, r100 = timed(
                    name, os.path.join(ROOT, "scalefix", "x100"), 1
                )
            except Exception as e:
                out[name]["x100_error"] = f"{type(e).__name__}"
                print(f"# {name}: x100 FAILED {type(e).__name__}",
                      file=sys.stderr, flush=True)
                continue
            out[name]["x100_sec"] = t100
            out[name]["x100_rows"] = r100
            if "x30_sec" in out[name]:
                out[name]["ratio_100_30"] = round(
                    t100 / out[name]["x30_sec"], 2
                )
            print(f"# {name}: x100 {t100}s  rows {r100}",
                  file=sys.stderr, flush=True)

    # tfidf candidate-volume observable at both scales
    from python_mozetl_spark.plans.queries import t as _t
    from python_mozetl_spark.ext.search import tfidf_candidate_stats

    cand = {}
    cand_scales = ("x1", "x10", "x30") if "--x30" in sys.argv[1:] else ("x1", "x10")
    if "--x100" in sys.argv[1:]:
        cand_scales = cand_scales + ("x100",)
    for tag in cand_scales:
        d = _t(spark, os.path.join(ROOT, "scalefix", tag), "documents")
        row = tfidf_candidate_stats(d, "doc_id", "text", threshold=0.9).collect()[0]
        cand[tag] = {"n_docs": row["n_docs"],
                     "n_candidates": row["n_candidates"]}
        print(f"# tfidf candidates {tag}: {cand[tag]}",
              file=sys.stderr, flush=True)
    cand["ratio"] = round(
        cand["x10"]["n_candidates"] / max(cand["x1"]["n_candidates"], 1), 2
    )
    if "x30" in cand:
        cand["ratio_30_10"] = round(
            cand["x30"]["n_candidates"] / max(cand["x10"]["n_candidates"], 1), 2
        )
    if "x100" in cand and "x30" in cand:
        cand["ratio_100_30"] = round(
            cand["x100"]["n_candidates"] / max(cand["x30"]["n_candidates"], 1),
            2,
        )

    # isolated winnow + minhash microbenches at driver sf0.1
    # (median of 5) — the per-round regression pins.  The md5 rows
    # continue the graded-path series; the _xxh64 rows (round 11) pin
    # the production hash seam, same operator configuration.
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    wt, _ = timed("doc_winnow_copy_pairs", sf01, 5)
    mt, _ = timed("doc_minhash_pairs", sf01, 5)
    wtx, _ = timed("winnow_xxh64", sf01, 5)
    mtx, _ = timed("minhash_xxh64", sf01, 5)
    print(json.dumps({"scale_curve": out,
                      "tfidf_candidates": cand,
                      "winnow_isolated_sf0.1_sec": wt,
                      "minhash_isolated_sf0.1_sec": mt,
                      "winnow_isolated_xxh64_sf0.1_sec": wtx,
                      "minhash_isolated_xxh64_sf0.1_sec": mtx}))
    spark.stop()


if __name__ == "__main__":
    main()
