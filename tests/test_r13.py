"""Round-13 seams: the tfidf auto-gate calibration fixes (ADVICE r12)
and the composite-anchor winnow auto gate (VERDICT r12 tasks 1-2).

Seam contract mirrors test_r12: every gate here is pure physical
strategy — outputs are pinned identical across gate decisions, and the
gate's DECISION is pinned against hand-computed observables.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F


def _tfidf_corpus(spark):
    vocab = [f"tok{i}" for i in range(30)]
    rows = []
    for d in range(30):
        toks = [vocab[(d * 5 + i * i) % (4 + d % 13)] for i in range(6 + d % 7)]
        rows.append((d, " ".join(toks)))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_auto_unstaged_takes_shuffle(spark):
    """stage=False + verify_attach='auto' must NOT run a gate
    aggregate on unstaged lineage (it would re-run the tokenize/prefix
    subtree once extra) — it takes the scale-safe shuffle attach, so
    the plan matches the explicit shuffle mode and building it
    triggers no Spark job at all (round-13 ADVICE closure)."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs
    from tests.test_plans import _formatted_plan

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")], ["doc_id", "text"]
    )
    tracker = spark.sparkContext.statusTracker()
    jobs_before = len(tracker.getJobIdsForGroup() or [])
    auto_plan = _formatted_plan(
        tfidf_cosine_pairs(df, "doc_id", "text", stage=False)
    )
    assert len(tracker.getJobIdsForGroup() or []) == jobs_before
    sh_plan = _formatted_plan(
        tfidf_cosine_pairs(
            df, "doc_id", "text", stage=False, verify_attach="shuffle"
        )
    )

    def norm(plan: str) -> str:
        # erase per-build expression ids (#182, x_2, plan_id=7) — the
        # invariant is plan STRUCTURE equality, not id equality
        import re

        return re.sub(r"#\d+|x_\d+|plan_id=\d+", "", plan)

    assert norm(auto_plan) == norm(sh_plan)


def test_tfidf_auto_token_keys_budget_measures_key_bytes(spark):
    """With verify_keys='token' the auto gate charges measured key
    chars (rows*24 + chars*4), not a flat 32 B/entry: a budget sized
    between the two estimates must flip token-keyed auto to shuffle
    while the same budget keeps hashed-keyed auto broadcasting —
    output identical either way (round-13 ADVICE closure)."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs

    # long tokens: flat 32 B/entry badly under-estimates string keys
    vocab = [f"averyveryverylongtokenname{i:04d}" for i in range(12)]
    rows = []
    for d in range(24):
        toks = [vocab[(d + i * i) % (3 + d % 9)] for i in range(5 + d % 5)]
        rows.append((d, " ".join(toks)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    from python_mozetl_spark.ext.search import _tfidf_prefix_candidates

    postings, _ = _tfidf_prefix_candidates(
        df, "doc_id", "text", 0.7, True, True, 6
    )
    n, chars = postings.agg(
        F.count(F.lit(1)), F.sum(F.length("__tok"))
    ).first()
    flat, measured = n * 32, n * 24 + int(chars) * 4
    assert measured > flat  # the fixture exercises the gap
    budget = (flat + measured) // 2

    def run(keys, **kw):
        return sorted(
            map(
                tuple,
                tfidf_cosine_pairs(
                    df, "doc_id", "text", threshold=0.7,
                    verify_keys=keys, **kw,
                ).collect(),
            )
        )

    base = run("xxhash64")
    assert (
        run("token", verify_broadcast_budget_bytes=budget)
        == run("token")
        == base
    ) and len(base) > 0


def test_tfidf_slab_attach_output_identical(spark):
    """The slab attach (B² branch broadcast joins over budget-sized
    docvec slabs — the round-13 middle regime) must emit the
    bit-identical output of the broadcast and shuffle modes, at
    several slab counts and on both verify-key paths."""
    from python_mozetl_spark.ext.search import tfidf_cosine_pairs

    df = _tfidf_corpus(spark)

    def run(**kw):
        return sorted(
            map(
                tuple,
                tfidf_cosine_pairs(
                    df, "doc_id", "text", threshold=0.7, **kw
                ).collect(),
            )
        )

    base = run(verify_attach="broadcast")
    assert base == run(verify_attach="shuffle") and len(base) > 0
    for b in (2, 3, 5):
        assert run(verify_attach="slab", verify_slabs=b) == base
    assert run(verify_attach="slab", verify_slabs=2,
               verify_keys="token") == base


def test_tfidf_auto_picks_slab_in_middle_regime(spark):
    """auto with a budget between est/verify_max_slabs and est must
    take the slab attach with B = ceil(est/budget) — plan-pinned
    against the explicit slab mode — and fall back to shuffle when
    even verify_max_slabs slabs cannot hold the estimate."""
    from python_mozetl_spark.ext.search import (
        _tfidf_prefix_candidates,
        tfidf_cosine_pairs,
    )
    from tests.test_plans import _formatted_plan
    import re

    df = _tfidf_corpus(spark)
    postings, _ = _tfidf_prefix_candidates(
        df, "doc_id", "text", 0.7, True, True, 6
    )
    est = postings.count() * 32
    budget = est // 3 + 1  # => B = 3 <= max_slabs

    def norm(plan):
        # strip expression ids AND checkpoint RDD ids — structure,
        # not identity, is the invariant
        return re.sub(r"#\d+|x_\d+|plan_id=\d+|RDD\[\d+\]", "", plan)

    auto_plan = norm(_formatted_plan(tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.7,
        verify_broadcast_budget_bytes=budget,
    )))
    slab_plan = norm(_formatted_plan(tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.7,
        verify_attach="slab", verify_slabs=3,
    )))
    assert auto_plan == slab_plan and "Union" in auto_plan
    # beyond max_slabs the gate must refuse to slab
    sh_plan = norm(_formatted_plan(tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.7,
        verify_broadcast_budget_bytes=budget, verify_max_slabs=2,
    )))
    shuffle_plan = norm(_formatted_plan(tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.7, verify_attach="shuffle",
    )))
    assert sh_plan == shuffle_plan
    # output equality under the middle-regime budget
    a = sorted(map(tuple, tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.7,
        verify_broadcast_budget_bytes=budget,
    ).collect()))
    b = sorted(map(tuple, tfidf_cosine_pairs(
        df, "doc_id", "text", threshold=0.7,
    ).collect()))
    assert a == b and len(a) > 0

    with pytest.raises(ValueError, match="verify_slabs"):
        tfidf_cosine_pairs(df, "doc_id", "text",
                           verify_attach="slab", verify_slabs=1)


def _rand_text(rng: random.Random, n: int) -> str:
    return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz ") for _ in range(n))


def _winnow_fixture(spark, n_dup: int = 5, n_salad: int = 6):
    rng = random.Random(31)
    rows, did = [], 0
    for _ in range(n_dup):
        b = _rand_text(rng, 600)
        rows.append((did, _rand_text(rng, 150) + b))
        rows.append((did + 1, b + _rand_text(rng, 150)))
        did += 2
    for _ in range(n_salad):
        rows.append((did, _rand_text(rng, 700)))
        did += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_winnow_anchor_arity_auto_equals_manual(spark):
    """anchor_arity='auto' output == both manual arities on the
    duplicate-family fixture (the gate is physical only), on BOTH hash
    paths, and the gate_report records a decision consistent with its
    own two observables."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    df = _winnow_fixture(spark)

    def run(arity, hash_fn="md5", report=None):
        return sorted(
            (r.id_a, r.id_b, r.n_shared)
            for r in winnow_copy_pairs(
                df, "doc_id", "text", k=8, window=4, min_shared=50,
                hash_fn=hash_fn, anchor_arity=arity, gate_report=report,
            ).collect()
        )

    for hash_fn in ("md5", "xxhash64"):
        rep: dict = {}
        auto = run("auto", hash_fn, rep)
        assert auto == run(1, hash_fn) == run(2, hash_fn)
        assert len(auto) == 5
        assert rep["anchor_arity"] in (1, 2)
        assert rep["arity1_enumerations"] >= 0
        assert rep["arity2_rows"] >= 0
        expected = (
            2 if rep["arity2_rows"] < rep["arity1_enumerations"] else 1
        )
        assert rep["anchor_arity"] == expected


def test_winnow_anchor_arity_auto_gate_observables(spark, monkeypatch):
    """The gate's two observables equal hand-computed values on a tiny
    deterministic corpus: arity-1 enumerations = sum over prefix
    buckets of s(s-1)/2; arity-2 rows = sum over docs of p(p-1)/2 with
    p = m - T + c (every doc's prefix length after the m >= T prune).
    The absolute enum1 floor is zeroed so the pin stays a pure
    raw-comparison check (the floor has its own test below)."""
    monkeypatch.setenv("WINNOW_ARITY_GATE_MIN_ENUM1", "0")
    from python_mozetl_spark.ext.dedup import (
        winnow_copy_pairs,
        winnow_fingerprints,
    )

    df = _winnow_fixture(spark, n_dup=3, n_salad=3)
    T, c = 50, 8
    fps = winnow_fingerprints(df, "doc_id", "text", k=8, window=4)
    per_doc = {
        r.doc_id: r.m
        for r in fps.groupBy("doc_id").agg(F.count(F.lit(1)).alias("m")).collect()
        if r.m >= T
    }
    exp_rows2 = sum(
        (m - T + c) * (m - T + c - 1) // 2 for m in per_doc.values()
    )
    # arity-1 enumerations need the actual prefix membership: rarest
    # (df, fp)-ordered first m-T+c fingerprints per doc
    import collections

    rows = fps.where(
        F.col("doc_id").isin(*per_doc)
    ).collect()
    dfreq = collections.Counter(r.fp for r in rows)
    by_doc: dict = collections.defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r.fp)
    bucket = collections.Counter()
    for did, fs in by_doc.items():
        fs.sort(key=lambda f: (dfreq[f], f))
        for f in fs[: per_doc[did] - T + c]:
            bucket[f] += 1
    exp_enum1 = sum(s * (s - 1) // 2 for s in bucket.values())

    rep: dict = {}
    winnow_copy_pairs(
        df, "doc_id", "text", k=8, window=4, min_shared=T,
        anchor_arity="auto", gate_report=rep,
    ).collect()
    assert rep["arity1_enumerations"] == exp_enum1
    assert rep["arity2_rows"] == exp_rows2
    assert rep["anchor_arity"] == (2 if exp_rows2 < exp_enum1 else 1)


def test_winnow_anchor_arity_auto_c1_falls_back_to_arity1(spark):
    """auto with an effective c < 2 (min_shared=1 clamps c) cannot use
    composites (recall would break) — it must silently pick arity 1,
    not raise like an explicit anchor_arity=2 request does."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    df = spark.createDataFrame(
        [(0, "abcdefghijklmno"), (1, "abcdefghijklmno")],
        "doc_id bigint, text string",
    )
    rep: dict = {}
    out = sorted(
        (r.id_a, r.id_b)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=1,
            anchor_arity="auto", gate_report=rep,
        ).collect()
    )
    assert rep["anchor_arity"] == 1 and rep["reason"] == "c<2"
    assert out == [(0, 1)]


def test_winnow_anchor_arity_auto_picks_composite_in_its_regime(spark, monkeypatch):
    """A boilerplate-heavy corpus (every doc shares one hot block, so
    per-fingerprint buckets hold ~all docs while prefixes stay short
    because m barely clears T) must flip the gate to arity 2 — the
    regime §6k proved composite anchors win — and the output must
    still equal the forced arity-1 run.  The absolute enum1 floor is
    zeroed: this fixture demonstrates the COMPARISON mechanics; at its
    real 60-doc scale the floor would (correctly) hold arity 1."""
    monkeypatch.setenv("WINNOW_ARITY_GATE_MIN_ENUM1", "0")
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    rng = random.Random(7)
    # 140-char shared block => m barely clears T=50, so prefixes are
    # SHORT (p = m-T+c ~ 13, composite rows ~ C(13,2)*N) while every
    # shared fingerprint's bucket holds all N docs (enumerations
    # ~ #shared_prefix_buckets * C(N,2)) — composite wins with N
    block = _rand_text(rng, 140)
    rows = [(i, block + _rand_text(rng, 8)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    rep: dict = {}
    auto = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=50,
            anchor_arity="auto", gate_report=rep,
        ).collect()
    )
    assert rep["anchor_arity"] == 2 and rep["reason"] == "measured"
    assert rep["arity2_rows"] < rep["arity1_enumerations"]
    manual = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=50,
            anchor_arity=1,
        ).collect()
    )
    assert auto == manual and len(auto) > 0


def test_winnow_anchor_arity_auto_floor_holds_arity1(spark, monkeypatch):
    """The absolute enum1 floor (round-13 optimization session 3): on
    the same boilerplate fixture whose RAW comparison flips to arity 2
    (rows2 < enum1 — the test above), the default floor must hold
    arity 1 with reason='below-floor' because enum1 is far under 1e9 —
    the regime where the composite build's extra stages cost more than
    the whole arity-1 enumeration (measured 20.5 vs 4.2 s at sf0.1).
    Output is identical either way (the gate is physical-only)."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    monkeypatch.delenv("WINNOW_ARITY_GATE_MIN_ENUM1", raising=False)
    rng = random.Random(7)
    block = _rand_text(rng, 140)
    rows = [(i, block + _rand_text(rng, 8)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")

    rep: dict = {}
    floored = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=50,
            anchor_arity="auto", gate_report=rep,
        ).collect()
    )
    assert rep["anchor_arity"] == 1 and rep["reason"] == "below-floor"
    # the raw comparison WOULD have flipped — that is what the floor guards
    assert rep["arity2_rows"] < rep["arity1_enumerations"]
    assert rep["arity1_enumerations"] < 1_000_000_000
    # a floor the observables clear lets the comparison decide again
    monkeypatch.setenv(
        "WINNOW_ARITY_GATE_MIN_ENUM1", str(rep["arity1_enumerations"])
    )
    rep2: dict = {}
    unfloored = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=50,
            anchor_arity="auto", gate_report=rep2,
        ).collect()
    )
    assert rep2["anchor_arity"] == 2 and rep2["reason"] == "measured"
    assert floored == unfloored and len(floored) > 0


def test_winnow_anchor_arity_rejects_bad_values(spark):
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    df = spark.createDataFrame([(0, "abcdefghijkl")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="anchor_arity"):
        winnow_copy_pairs(df, "doc_id", "text", anchor_arity="AUTO")
    with pytest.raises(ValueError, match="anchor_arity"):
        winnow_copy_pairs(df, "doc_id", "text", anchor_arity=0)
