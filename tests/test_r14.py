"""Round-13-optimization pins: the winnow fingerprint kernel seam
(arrow vs expr bit-equality) and the staged/unstaged pair-stage
equivalence that the OPTIMIZATION_r13 restructure relies on."""

from __future__ import annotations

import pytest


@pytest.fixture
def fp_corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog " * 6),
        (2, "the quick brown fox jumps over the lazy dog " * 6),
        (3, "completely different text with its own character grams " * 5),
        (4, "exactly8"),  # one gram, one fingerprint (m < window)
        (5, "short"),  # < k chars: zero fingerprints
        (6, ""),  # empty
        (7, None),  # null text
        (8, "übergrößenträger straße " * 12),  # non-ASCII codepoints
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_winnow_fp_kernel_seam_bit_equal(fp_corpus):
    """The Arrow fingerprint kernel (hashlib md5 + NumPy rolling min)
    must produce the SAME fingerprint multiset per doc as the JVM
    expression kernel — hashlib md5 is bit-identical to Spark's, and
    the 60-bit truncation (digest[:8] >> 4) must equal
    conv(substring(md5hex, 1, 15), 16, 10).  Arrays may differ in
    element order only (first-occurrence vs ascending); every consumer
    is order-blind, so the pin compares sorted arrays."""
    from python_mozetl_spark.ext.dedup import _winnow_fp_arrays

    out = {}
    for impl in ("arrow", "expr"):
        out[impl] = {
            r[0]: sorted(r[1])
            for r in _winnow_fp_arrays(
                fp_corpus, "doc_id", "text", k=8, window=4, impl=impl
            ).collect()
        }
    assert set(out["arrow"]) == set(out["expr"])
    for doc_id in out["expr"]:
        assert out["arrow"][doc_id] == out["expr"][doc_id], doc_id
    # shape sanity: dup docs share all fingerprints, short docs degrade
    assert out["expr"][1] == out["expr"][2]
    assert len(out["expr"][4]) == 1
    assert out["expr"][5] == [] and out["expr"][6] == []
    assert out["expr"][7] == []


def test_winnow_fp_kernel_rejects_bad_impl(fp_corpus):
    from python_mozetl_spark.ext.dedup import _winnow_fp_arrays

    with pytest.raises(ValueError, match="impl"):
        _winnow_fp_arrays(fp_corpus, "doc_id", "text", impl="jvm")
    with pytest.raises(ValueError, match="md5"):
        _winnow_fp_arrays(
            fp_corpus, "doc_id", "text", hash_fn="xxhash64", impl="arrow"
        )


def test_winnow_pairs_staged_equals_unstaged(spark):
    """The r13-optimization staged path (array-domain checkpoint +
    staged prefix frame) and the unstaged path (pre-r13 exploded
    shape: count window + collect_list) must emit identical pairs —
    they share only the candidate/verify contract, not the plan."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    import random

    rng = random.Random(13)
    words = [f"w{rng.randrange(10**6):06d}" for _ in range(80)]
    base = " ".join(words)  # ~560 chars, high gram diversity
    rows = [(i, base + f" tail{i}") for i in range(6)] + [
        (
            10 + i,
            " ".join(f"u{rng.randrange(10**6):06d}" for _ in range(60)),
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {}
    for staged in (True, False):
        out[staged] = sorted(
            (r.id_a, r.id_b, r.n_shared)
            for r in winnow_copy_pairs(
                df, "doc_id", "text", k=8, window=4, min_shared=20,
                stage=staged,
            ).collect()
        )
    assert out[True] == out[False]
    assert len(out[True]) > 0


def _fp_plan_is_arrow(df) -> bool:
    """True when the fingerprint frame rides the Arrow kernel (an
    ArrowEvalPython node in the physical plan), False for the JVM
    expression kernel."""
    return "ArrowEvalPython" in df._jdf.queryExecution().executedPlan().toString()


def test_winnow_arrow_gate_doc_length(spark, tmp_path, monkeypatch):
    """impl='auto' doc-length gate (round 13): WINNOW_FP_IMPL
    overrides; otherwise small sources skip the probe and keep expr,
    and past the byte gate the length probe picks arrow iff the
    sampled average length clears WINNOW_ARROW_MIN_AVG_CHARS.  The
    gate is physical-only: both kernels are pinned bit-identical
    above, so only the plan may differ."""
    from python_mozetl_spark.ext.dedup import _winnow_fp_arrays

    monkeypatch.delenv("WINNOW_FP_IMPL", raising=False)
    short_p = str(tmp_path / "short.parquet")
    long_p = str(tmp_path / "long.parquet")
    spark.createDataFrame(
        [(i, f"short document number {i} with a few words") for i in range(8)],
        "doc_id bigint, text string",
    ).write.parquet(short_p)
    spark.createDataFrame(
        [(i, (f"w{i:03d} " * 600)) for i in range(8)],  # ~3000 chars/doc
        "doc_id bigint, text string",
    ).write.parquet(long_p)
    short_df = spark.read.parquet(short_p)
    long_df = spark.read.parquet(long_p)

    # default byte gate (256 MB) >> these fixtures: no probe, expr,
    # even for long docs
    assert not _fp_plan_is_arrow(_winnow_fp_arrays(long_df, "doc_id", "text"))

    # byte gate forced open: the length probe decides per corpus
    monkeypatch.setenv("WINNOW_ARROW_GATE_MIN_BYTES", "0")
    assert not _fp_plan_is_arrow(_winnow_fp_arrays(short_df, "doc_id", "text"))
    assert _fp_plan_is_arrow(_winnow_fp_arrays(long_df, "doc_id", "text"))

    # xxhash64 never probes (expr is the only kernel for it)
    assert not _fp_plan_is_arrow(
        _winnow_fp_arrays(long_df, "doc_id", "text", hash_fn="xxhash64")
    )

    # explicit env override beats the gate in both directions
    monkeypatch.setenv("WINNOW_FP_IMPL", "expr")
    assert not _fp_plan_is_arrow(_winnow_fp_arrays(long_df, "doc_id", "text"))
    monkeypatch.setenv("WINNOW_FP_IMPL", "arrow")
    assert _fp_plan_is_arrow(_winnow_fp_arrays(short_df, "doc_id", "text"))


def test_winnow_shared_frames_output_equal(spark):
    """winnow_copy_pairs(frames=...) — the round-13 parity-sharing seam
    — must emit exactly the pairs the per-run staged path emits, for
    BOTH arities: the shared WinnowPrefixFrames chain is the staged
    chain verbatim (pure code motion), and the arity branch consumes
    only the prefix/arr frames either way."""
    from python_mozetl_spark.ext.dedup import (
        winnow_copy_pairs,
        winnow_prefix_frames,
    )

    import random

    rng = random.Random(14)
    words = [f"w{rng.randrange(10**6):06d}" for _ in range(80)]
    base = " ".join(words)
    rows = [(i, base + f" tail{i}") for i in range(6)] + [
        (
            10 + i,
            " ".join(f"u{rng.randrange(10**6):06d}" for _ in range(60)),
        )
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kw = dict(k=8, window=4, min_shared=20)
    frames = winnow_prefix_frames(df, "doc_id", "text", **kw)
    for arity in (1, 2):
        shared = sorted(
            (r.id_a, r.id_b, r.n_shared)
            for r in winnow_copy_pairs(
                df, "doc_id", "text", anchor_arity=arity, frames=frames, **kw
            ).collect()
        )
        per_run = sorted(
            (r.id_a, r.id_b, r.n_shared)
            for r in winnow_copy_pairs(
                df, "doc_id", "text", anchor_arity=arity, **kw
            ).collect()
        )
        assert shared == per_run, arity
        assert len(shared) > 0, arity


def test_winnow_shared_frames_param_mismatch_raises(spark):
    """Frames built under one fingerprint configuration must be
    rejected by a consumer with a different one — silently pairing
    against the wrong fingerprints would corrupt the parity grade."""
    from python_mozetl_spark.ext.dedup import (
        winnow_copy_pairs,
        winnow_prefix_frames,
    )

    df = spark.createDataFrame(
        [(1, "abcdefghij klmnopqrst" * 4)], "doc_id bigint, text string"
    )
    frames = winnow_prefix_frames(df, "doc_id", "text", k=8, window=4, min_shared=20)
    with pytest.raises(ValueError, match="frames"):
        winnow_copy_pairs(
            df, "doc_id", "text", k=8, window=4, min_shared=25, frames=frames
        )
    with pytest.raises(ValueError, match="frames"):
        winnow_copy_pairs(
            df,
            "doc_id",
            "text",
            k=8,
            window=4,
            min_shared=20,
            hash_fn="xxhash64",
            frames=frames,
        )


def test_bucket_pairs_staged_equals_unstaged(spark):
    """bounded_bucket_pairs(stage=True) localCheckpoints the
    bucket-count window frame so the Exchange+Sort+Window chain runs
    once instead of once per consumer (round-13 optimization).  The
    pair multiset must be identical to the unstaged plan in BOTH
    branches: small buckets (cap above bucket size) and the chunk-grid
    (cap below), including the shared-bucket multiplicities
    candidate-counting callers rely on."""
    from collections import Counter

    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.dedup import bounded_bucket_pairs

    rows = [(b, i) for b in range(3) for i in range(7)] + [
        (9, i) for i in range(11)  # one larger bucket to straddle cap=3
    ]
    banded = spark.createDataFrame(rows, ["bucket", "id"]).select(
        "bucket", F.struct("id").alias("__p")
    )
    for cap in (10_000, 3):
        got = {}
        for staged in (True, False):
            out = bounded_bucket_pairs(
                banded, "bucket", "__p", "id", cap, stage=staged
            ).select(F.col("a.id").alias("x"), F.col("b.id").alias("y"))
            got[staged] = Counter((r["x"], r["y"]) for r in out.collect())
        assert got[True] == got[False], cap
        assert sum(got[True].values()) == 3 * 21 + 55  # C(7,2)x3 + C(11,2)


def test_bucket_pairs_dead_branch_prune(spark, monkeypatch):
    """Round-14 optimization: with stage=True a one-row probe aggregate
    over the checkpointed count frame prunes branches that can emit no
    row — on an all-small fixture the chunk-grid subtree (six
    exchanges over zero rows) must vanish from the plan, on an
    all-singleton fixture the result degenerates to an empty frame of
    the right schema, and output must equal the unpruned plan's in
    every case (SPARK_GRAFT_BUCKET_BRANCH_PRUNE=0 keeps the old
    both-branches shape)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.dedup import bounded_bucket_pairs

    rows = [(b, i) for b in range(3) for i in range(5)]
    banded = spark.createDataFrame(rows, ["bucket", "id"]).select(
        "bucket", F.struct("id").alias("__p")
    )

    def pairs(prune: bool, cap: int = 100):
        monkeypatch.setenv(
            "SPARK_GRAFT_BUCKET_BRANCH_PRUNE", "1" if prune else "0"
        )
        return bounded_bucket_pairs(
            banded, "bucket", "__p", "id", cap, stage=True
        )

    pruned, unpruned = pairs(True), pairs(False)
    plan_pruned = pruned._jdf.queryExecution().executedPlan().toString()
    plan_full = unpruned._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan_pruned  # dead chunk-grid branch gone
    assert "Union" in plan_full
    assert plan_pruned.count("Exchange") < plan_full.count("Exchange")

    def multiset(df):
        return Counter(
            (r["x"], r["y"])
            for r in df.select(
                F.col("a.id").alias("x"), F.col("b.id").alias("y")
            ).collect()
        )

    assert multiset(pruned) == multiset(unpruned)
    assert sum(multiset(pruned).values()) == 3 * 10  # C(5,2) x 3

    # all-oversized fixture: small branch pruned instead
    big_only = pairs(True, cap=3)
    assert multiset(big_only) == multiset(pairs(False, cap=3))
    assert sum(multiset(big_only).values()) == 3 * 10

    # all-singleton fixture: both branches pruned, empty result,
    # schema intact
    singles = spark.createDataFrame(
        [(b, b) for b in range(4)], ["bucket", "id"]
    ).select("bucket", F.struct("id").alias("__p"))
    monkeypatch.setenv("SPARK_GRAFT_BUCKET_BRANCH_PRUNE", "1")
    empty = bounded_bucket_pairs(singles, "bucket", "__p", "id", 100, stage=True)
    assert empty.columns == ["a", "b"]
    assert empty.count() == 0


def test_winnow_keyed_hitcount_spread_output_equal(spark):
    """Round-14 optimization: with spread_pairs set, winnow_copy_pairs
    repartitions the enumerated pair ids BY THE GROUPING KEYS at
    enumeration width before the hit-count aggregate (skipping the
    useless round-robin partial agg).  Output must equal the
    spread_pairs=None planner shape exactly."""
    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    base = " ".join(f"tok{i:04d} chunk{i * 7 % 97}" for i in range(60))
    docs = spark.createDataFrame(
        [
            (1, base + " tail one"),
            (2, base + " tail one"),
            (3, base + " different suffix wording"),
            (4, "entirely unrelated text with no overlap at all " * 4),
        ],
        "doc_id bigint, text string",
    )
    kw = dict(k=8, window=4, min_shared=20, max_bucket=500)
    got = {
        sp: sorted(
            tuple(r) for r in winnow_copy_pairs(
                docs, "doc_id", "text", spread_pairs=sp, **kw
            ).collect()
        )
        for sp in (None, 8)
    }
    assert got[None] == got[8]
    assert got[8], "fixture must produce at least one qualifying pair"
