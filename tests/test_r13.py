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


def test_winnow_anchor_arity_auto_enum2_vetoes_dense_boilerplate(spark, monkeypatch):
    """A boilerplate corpus where every doc shares the SAME hot block
    is a dense corpus in miniature: the rows2 proxy says composites
    are cheaper (rows2 < enum1 — the pre-r14 gate picked arity 2
    here), but the shared fingerprints co-occur PAIRWISE in every
    prefix, so the composite buckets saturate exactly like the singles
    (enum2 ~ C(q,2)/q x enum1 > enum1 — the SCALE.md §6m
    miscalibration).  The round-14 third observable must veto the
    flip: arity 1, with the recorded estimate proving the veto bound.
    Floor zeroed — this pins the comparison mechanics."""
    monkeypatch.setenv("WINNOW_ARITY_GATE_MIN_ENUM1", "0")
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    rng = random.Random(7)
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
    assert rep["anchor_arity"] == 1 and rep["reason"] == "measured"
    # the rows2 proxy alone WOULD have flipped — that is the blind spot
    assert rep["arity2_rows"] < rep["arity1_enumerations"]
    # ... and the third observable is what vetoed it
    assert rep["arity2_enum_est"] is not None
    assert (
        rep["arity2_rows"] + rep["arity2_enum_est"]
        >= rep["arity1_enumerations"]
    )
    manual = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=50,
            anchor_arity=1,
        ).collect()
    )
    assert auto == manual and len(auto) > 0


def test_winnow_anchor_arity_auto_picks_composite_in_its_regime(spark, monkeypatch):
    """The regime where composite anchors GENUINELY win: every doc
    carries one hot shared block whose rarest-first tail puts a
    handful of shared fingerprints into each prefix, but the bulk of
    every prefix is doc-unique — so single-fp buckets hold all N docs
    (enum1 ~ q x C(N,2)) while almost every composite key involves a
    doc-unique fingerprint and lands in a singleton bucket (enum2 ~ 0).
    The gate must pick arity 2 on the full three-observable rule, the
    rate-1 estimate must EQUAL the hand-computed composite bucket sum,
    and the output must equal the forced arity-1 run.  Floor zeroed —
    comparison mechanics; at this absolute scale the floor would
    (correctly) hold arity 1."""
    monkeypatch.setenv("WINNOW_ARITY_GATE_MIN_ENUM1", "0")
    from python_mozetl_spark.ext.dedup import (
        winnow_copy_pairs,
        winnow_prefix_frames,
    )

    rng = random.Random(11)
    hot = _rand_text(rng, 55)
    rows = [(i, _rand_text(rng, 28) + hot) for i in range(300)]
    # a small true-duplicate family so the verify stage has pairs to
    # emit (the hot block alone is below the n_shared >= 20 verify
    # threshold); 3 copies barely move the gate observables
    rows += [(300 + j, rows[0][1]) for j in range(3)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kw = dict(k=8, window=4, min_shared=20, min_prefix_hits=4)

    # hand-compute the exact composite bucket sum from the prefix frame
    import collections

    prefix = winnow_prefix_frames(df, "doc_id", "text", **kw).prefix
    by_doc: dict = collections.defaultdict(list)
    for r in prefix.collect():
        by_doc[r.doc_id].append((r["__rn"], r.fp))
    comp = collections.Counter()
    for fs in by_doc.values():
        fs.sort()
        for i in range(len(fs)):
            for j in range(i + 1, len(fs)):
                comp[(fs[i][1], fs[j][1])] += 1
    exp_enum2 = sum(s * (s - 1) // 2 for s in comp.values())

    rep: dict = {}
    auto = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", anchor_arity="auto", gate_report=rep,
            **kw,
        ).collect()
    )
    assert rep["anchor_arity"] == 2 and rep["reason"] == "measured"
    # the rate-1 (unsampled) estimate is exact
    assert rep["arity2_enum_est"] == exp_enum2
    assert (
        rep["arity2_rows"] + rep["arity2_enum_est"]
        < rep["arity1_enumerations"]
    )
    manual = sorted(
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_copy_pairs(
            df, "doc_id", "text", anchor_arity=1, **kw,
        ).collect()
    )
    assert auto == manual and len(auto) > 0

    # force the SAMPLED path (budget far below rows2): the decision
    # must not change — on this fixture enum2 is orders of magnitude
    # under the enum1 - rows2 margin, so sampling noise cannot cross
    # the threshold (deterministic: hash-based doc sampling)
    monkeypatch.setenv("WINNOW_ARITY_GATE_ENUM2_SAMPLE_ROWS", "2000")
    rep2: dict = {}
    winnow_copy_pairs(
        df, "doc_id", "text", anchor_arity="auto", gate_report=rep2, **kw,
    )
    assert rep2["anchor_arity"] == 2 and rep2["reason"] == "measured"
    assert rep2["arity2_rows"] == rep["arity2_rows"]


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
    # below-floor short-circuits BEFORE paying the enum2 sample join
    assert rep["arity2_enum_est"] is None
    # a floor the observables clear lets the comparison decide again —
    # and on this boilerplate fixture the round-14 third observable
    # (composite buckets saturate like the singles) now vetoes the
    # rows2-only flip, so "measured" correctly lands on arity 1
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
    assert rep2["anchor_arity"] == 1 and rep2["reason"] == "measured"
    assert rep2["arity2_enum_est"] is not None
    assert floored == unfloored and len(floored) > 0


def test_winnow_anchor_arity_rejects_bad_values(spark):
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    df = spark.createDataFrame([(0, "abcdefghijkl")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="anchor_arity"):
        winnow_copy_pairs(df, "doc_id", "text", anchor_arity="AUTO")
    with pytest.raises(ValueError, match="anchor_arity"):
        winnow_copy_pairs(df, "doc_id", "text", anchor_arity=0)
