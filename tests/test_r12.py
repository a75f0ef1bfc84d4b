"""Round-12 tests: the tfidf verify-attach seam (size-gated broadcast
of the per-doc weight maps — VERDICT r11 task 1's wall, attacked at
the join strategy after the L2AP candidate cut was measured vacuous)
and the winnow hash-parity differential query (VERDICT r11 task 5).

Seam contract: ``verify_attach`` is pure physical strategy — the pair
set and rounded cosines are bit-identical across ``"auto"`` /
``"broadcast"`` / ``"shuffle"``; broadcast mode runs the whole verify
tier shuffle-free (two BroadcastHashJoins), shuffle mode keeps the
id-keyed exchanges (the 100 TB fallback when the map table exceeds
the byte budget).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _tfidf_corpus(spark):
    vocab = [f"w{i}" for i in range(25)]
    rows = []
    for d in range(50):
        toks = [vocab[(d * 7 + i * i) % (3 + d % 19)] for i in range(5 + d % 9)]
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_verify_attach_modes_identical(spark):
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs

    df = _tfidf_corpus(spark)

    def run(mode):
        return sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in tfidf_cosine_pairs(
                df, "doc_id", "text", threshold=0.7, verify_attach=mode
            ).collect()
        )

    auto, bc, sh = run("auto"), run("broadcast"), run("shuffle")
    assert auto == bc == sh and len(auto) > 0


def test_tfidf_verify_attach_rejects_unknown_mode(spark):
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs

    df = _tfidf_corpus(spark)
    with pytest.raises(ValueError, match="verify_attach"):
        tfidf_cosine_pairs(df, "doc_id", "text", verify_attach="replicate")


def test_tfidf_verify_attach_auto_budget_gate(spark):
    """auto = broadcast under the default budget, and flips to the
    shuffle shape when the budget cannot hold the postings estimate —
    same output either way (the gate is physical only)."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs

    df = _tfidf_corpus(spark)
    wide = tfidf_cosine_pairs(df, "doc_id", "text", threshold=0.7)
    tight = tfidf_cosine_pairs(
        df,
        "doc_id",
        "text",
        threshold=0.7,
        verify_broadcast_budget_bytes=1,  # nothing fits => shuffle
    )
    a = sorted(map(tuple, wide.collect()))
    b = sorted(map(tuple, tight.collect()))
    assert a == b and len(a) > 0


def test_tfidf_verify_attach_plan_shapes(spark):
    """Broadcast mode: the two map-attach joins are BroadcastHashJoins
    (the docvec side never shuffles onto the candidate pairs);
    shuffle mode: the attach joins stay shuffled (SortMergeJoin /
    ShuffledHashJoin) — physically different, semantically pinned
    equal by the tests above."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs
    from tests.test_plans import _formatted_plan

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")], ["doc_id", "text"]
    )
    bc_plan = _formatted_plan(
        tfidf_cosine_pairs(
            df, "doc_id", "text", stage=False, verify_attach="broadcast"
        )
    )
    sh_plan = _formatted_plan(
        tfidf_cosine_pairs(
            df, "doc_id", "text", stage=False, verify_attach="shuffle"
        )
    )
    # broadcast: df-table broadcast + two attach joins, no sort-merge
    # anywhere in the verify tier (the candidate join itself is
    # term-keyed sort-merge and sits before the dedup agg)
    assert bc_plan.count("BroadcastHashJoin") >= 3
    # shuffle mode keeps at least the two id-keyed attach exchanges
    assert sh_plan.count("BroadcastHashJoin") < bc_plan.count(
        "BroadcastHashJoin"
    )
    assert "Cartesian" not in bc_plan and "Cartesian" not in sh_plan


# --------------------------------------------------------------------
# winnow hash-parity hysteresis (the graded differential's invariant)
# --------------------------------------------------------------------


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def test_winnow_hash_parity_hysteresis_on_planted_corpus(spark):
    """The graded doc_winnow_hash_parity invariant, reproduced on a
    planted corpus: every pair STRICT (>= 50 shared fingerprints)
    under one hash path is LOOSE (>= 25) under the other — winnowing
    SELECTION is hash-dependent (per-pair counts differ by bounded
    noise), containment at 2x hysteresis is what must hold."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    rng = random.Random(1202)
    rows, doc_id = [], 0
    for _ in range(5):  # strong copy pairs (600-char shared block)
        block = _rand_text(rng, 600)
        rows.append((doc_id, _rand_text(rng, 150) + block))
        rows.append((doc_id + 1, block + _rand_text(rng, 150)))
        doc_id += 2
    for _ in range(6):  # unrelated
        rows.append((doc_id, _rand_text(rng, 700)))
        doc_id += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def pairs(hash_fn):
        p = winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=25,
            hash_fn=hash_fn,
        )
        return {(r.id_a, r.id_b): r.n_shared for r in p.collect()}

    md5p, xxp = pairs("md5"), pairs("xxhash64")
    strict_md5 = {k for k, n in md5p.items() if n >= 50}
    strict_xx = {k for k, n in xxp.items() if n >= 50}
    assert strict_md5 == {(2 * i, 2 * i + 1) for i in range(5)}
    assert strict_md5 <= set(xxp)  # md5-strict contained in xx-loose
    assert strict_xx <= set(md5p)  # xx-strict contained in md5-loose


def test_winnow_hash_parity_query_shape(spark):
    """The graded query returns the 1-row (n_pairs_md5, 0, 0) shape at
    the smoke SF — the two escape counts are the containment
    violations the oracle pins at zero."""
    from python_mozetl_spark.plans.queries import REGISTRY

    row = (
        REGISTRY["doc_winnow_hash_parity"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(row) == 1
    r = row[0]
    assert r["n_md5_escaped"] == 0 and r["n_xxh64_escaped"] == 0
    assert r["n_pairs_md5"] >= 0


def test_winnow_anchor_arity2_output_equal(spark):
    """anchor_arity=2 (composite (fp_i, fp_j) buckets — the
    sixth-decade scale path, SCALE.md §6k) must emit the identical
    (pair, n_shared) output as the graded arity-1 path: candidates
    are recall-complete by the C(c,2)-composite corollary of the
    c-prefix theorem and the exact array-intersect verify is shared."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    rng = random.Random(31)
    rows, did = [], 0
    for _ in range(5):
        b = _rand_text(rng, 600)
        rows.append((did, _rand_text(rng, 150) + b))
        rows.append((did + 1, b + _rand_text(rng, 150)))
        did += 2
    for _ in range(6):
        rows.append((did, _rand_text(rng, 700)))
        did += 1
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    def run(arity, hash_fn="md5"):
        return sorted(
            (r.id_a, r.id_b, r.n_shared)
            for r in winnow_copy_pairs(
                df, "doc_id", "text", k=8, window=4, min_shared=50,
                hash_fn=hash_fn, anchor_arity=arity,
            ).collect()
        )

    a1 = run(1)
    assert a1 == run(2) and len(a1) == 5
    # the production combination: xxh64 digest + composite anchors
    x1 = run(1, "xxhash64")
    assert x1 == run(2, "xxhash64") and len(x1) == 5


def test_winnow_anchor_arity2_requires_two_hits(spark):
    """c=1 leaves a qualifying pair with possibly ZERO shared
    composite buckets — the arity-2 path must refuse rather than
    silently lose recall (both via min_prefix_hits=1 and via the
    min_shared=1 clamp)."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    df = spark.createDataFrame([(0, "abcdefghijkl")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="anchor_arity=2"):
        winnow_copy_pairs(df, "doc_id", "text", min_prefix_hits=1,
                          anchor_arity=2)
    with pytest.raises(ValueError, match="anchor_arity=2"):
        winnow_copy_pairs(df, "doc_id", "text", min_shared=1,
                          anchor_arity=2)
    with pytest.raises(ValueError, match="anchor_arity"):
        winnow_copy_pairs(df, "doc_id", "text", anchor_arity=3)


def test_doc_quality_uses_integer_stopword_count(spark):
    """ADVICE r12: the integer stopword count flows straight from the
    metrics helper — pin the new key agrees with the ratio route on a
    boundary-ish corpus."""
    from python_mozetl_spark.functions.text import (
        quality_metrics_from_tokens,
        tokens,
    )

    df = spark.createDataFrame(
        [(1, "the of and a to in el la"), (2, "x y z"), (3, None)],
        ["id", "text"],
    )
    staged = df.select(
        "id",
        F.coalesce(
            tokens("text"), F.array().cast("array<string>")
        ).alias("__toks"),
        F.coalesce(F.col("text"), F.lit("")).alias("__txt"),
    )
    m = quality_metrics_from_tokens(F.col("__toks"), F.col("__txt"))
    got = staged.select(
        "id",
        m["n_stopwords"].alias("ns"),
        (m["stopword_ratio"] * F.greatest(m["n_tokens"], F.lit(1))).alias(
            "ratio_route"
        ),
    ).collect()
    for r in got:
        assert r["ns"] == round(r["ratio_route"])
