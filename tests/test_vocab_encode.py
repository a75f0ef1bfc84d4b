"""BPE vocabulary induction (ext/vocab.py), BM25 (ext/search.py),
Count-Min (ext/sketches.py), Bloom prune (operators/bloom.py),
target encoding (operators/encode.py), session attribution
(operators/sessionize.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from python_mozetl_spark.ext.search import bm25_topk
from python_mozetl_spark.ext.sketches import cm_estimate, cm_sketch
from python_mozetl_spark.ext.vocab import (
    apply_merge,
    bpe_learn,
    encode_word,
    initial_symbols,
    pair_counts,
    word_freqs,
)
from python_mozetl_spark.operators.bloom import (
    bloom_build,
    bloom_contains,
    bloom_semi_join,
)
from python_mozetl_spark.operators.encode import (
    frequency_encode,
    loo_target_encode,
)
from python_mozetl_spark.operators.sessionize import session_attribution

from tests.conftest import assert_df_equals, df_rows


# ----------------------------------------------------------------- BPE


def test_pair_counts_weighted_with_eow(spark):
    df = spark.createDataFrame([("ab ab b",)], "text string")
    wf = word_freqs(df).select(initial_symbols("word").alias("syms"), "freq")
    assert_df_equals(
        pair_counts(wf),
        [
            {"a": "a", "b": "b", "pair_count": 2},   # within 'ab' ×2
            {"a": "b", "b": "</w>", "pair_count": 3},  # 'ab'×2 + 'b'×1
        ],
    )


def test_apply_merge_nonoverlapping_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a", "a", "</w>"],)], "syms array<string>")
    out = df.select(apply_merge(F.col("syms"), "a", "a").alias("syms"))
    assert df_rows(out) == [{"syms": ["aa", "aa", "</w>"]}]


def test_bpe_learn_matches_python_reference(spark):
    corpus = [
        ("the cat sat on the mat",),
        ("the bat and the cat",),
        ("that hat is the cat hat",),
    ]
    df = spark.createDataFrame(corpus, "text string")
    merges = bpe_learn(df, n_merges=6, checkpoint_every=2)
    assert len(merges) >= 3
    # counts strictly follow the greedy argmax: re-derive each step on
    # the driver with the pure-Python encoder and compare segmentations
    words = {w for (t,) in corpus for w in t.split()}
    wf = spark.createDataFrame([(w,) for w in sorted(words)], "word string")
    enc = wf.select("word", initial_symbols("word").alias("s"))
    for a, b, _ in merges:
        enc = enc.select("word", apply_merge(F.col("s"), a, b).alias("s"))
    for r in enc.collect():
        assert r["s"] == encode_word(r["word"], merges), r["word"]


def test_bpe_first_merge_is_global_argmax(spark):
    df = spark.createDataFrame([("aaab aaab ccc",)], "text string")
    merges = bpe_learn(df, n_merges=1)
    # pairs: (a,a)×2 per 'aaab' word ×2 occurrences = 4 — the max
    assert merges[0][:2] == ("a", "a") and merges[0][2] == 4


# ---------------------------------------------------------------- BM25


def test_bm25_scores_match_reference_formula(spark):
    rows = [(1, "x x y"), (2, "x z"), (3, "z z z"), (4, "y")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r["score"] for r in bm25_topk(
        df, "doc_id", "text", ["x", "y"], k=10
    ).collect()}

    def bm25(tf, dfq, dl, n=4, sumdl=9, k1=1.2, b=0.75):
        idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / (sumdl / n)))

    exp1 = round(bm25(2, 2, 3) + bm25(1, 2, 3), 6)   # doc1: x×2, y×1
    exp2 = round(bm25(1, 2, 2), 6)                   # doc2: x×1
    exp4 = round(bm25(1, 2, 1), 6)                   # doc4: y×1
    assert out == {1: exp1, 2: exp2, 4: exp4}        # doc3 has no query term


def test_bm25_limit_is_total_ordered(spark):
    df = spark.createDataFrame(
        [(i, "x") for i in range(30)], "doc_id int, text string"
    )
    got = [r["doc_id"] for r in bm25_topk(df, "doc_id", "text", ["x"], k=5).collect()]
    assert got == [0, 1, 2, 3, 4]  # equal scores -> id tiebreak


# ----------------------------------------------------------- Count-Min


def test_cm_never_underestimates_and_merges(spark):
    rows = [(f"k{i % 7}",) for i in range(100)]
    df = spark.createDataFrame(rows, "k string")
    sk = cm_sketch(df, "k", width=4, depth=3)  # tiny: force collisions
    exact = df.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    est = cm_estimate(sk, exact, "k", width=4, depth=3)
    for r in est.collect():
        assert r["cm_est"] >= r["exact"]
    # mergeability: sketch(A∪B) == counter-wise sum of sketch(A), sketch(B)
    a = df.limit(40)
    b = df.exceptAll(a)
    merged = (
        cm_sketch(a, "k", width=4, depth=3)
        .unionByName(cm_sketch(b, "k", width=4, depth=3))
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert df_rows(merged) == df_rows(cm_sketch(df, "k", width=4, depth=3))


def test_cm_exact_when_no_collisions(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    items = df.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    est = cm_estimate(cm_sketch(df, "k", width=512, depth=4), items, "k",
                      width=512, depth=4)
    for r in est.collect():
        assert r["cm_est"] == r["exact"]


# --------------------------------------------------------------- Bloom


def test_bloom_no_false_negatives_and_semi_join_exact(spark):
    dim = spark.createDataFrame([(i * 3,) for i in range(200)], "k bigint")
    fact = spark.createDataFrame([(i,) for i in range(600)], "k bigint")
    words = bloom_build(dim, "k", num_bits=1 << 12, num_hashes=5)
    assert len(words) == (1 << 12) // 64
    hit = bloom_contains(fact, "k", words)
    members = {r["k"] for r in hit.where(F.col("__bf_hit")).collect()}
    assert set(range(0, 600, 3)) <= members  # every true member passes
    out = bloom_semi_join(fact, "k", dim, "k")
    assert sorted(r["k"] for r in out.collect()) == list(range(0, 600, 3))


def test_bloom_rejects_unaligned_bits(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        bloom_build(df, "k", num_bits=100)


# ------------------------------------------------------------- Encode


def test_loo_excludes_own_row_and_nulls_singletons(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 30.0), (4, "b", 7.0)],
        "id int, cat string, y double",
    )
    out = {r["id"]: r["loo_enc"] for r in loo_target_encode(df, "cat", "y").collect()}
    assert out[1] == 25.0 and out[2] == 20.0 and out[3] == 15.0
    assert out[4] is None  # singleton category, unsmoothed


def test_loo_smoothing_pulls_toward_global_mean(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 100.0)],
        "id int, cat string, y double",
    )
    out = {r["id"]: r["loo_enc"] for r in
           loo_target_encode(df, "cat", "y", smoothing=1.0).collect()}
    g = (10 + 20 + 100) / 3
    assert out[1] == round((20 + g) / 2, 6)
    assert out[3] == round(g / 1, 6)  # singleton -> prior mean


def test_frequency_encode_counts_and_shares(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), ("a",)], "cat string")
    rows = {(r["cat"], r["cat_count"], r["cat_share"])
            for r in frequency_encode(df, "cat").collect()}
    assert rows == {("a", 3, 0.75), ("b", 1, 0.25)}


# -------------------------------------------------------- Attribution


def test_session_attribution_first_last_touch(spark):
    rows = [
        # user 1, one session: click -> view -> purchase(5.0)
        (1, 1, "2024-01-01 10:00:00", "click", 0.0),
        (2, 1, "2024-01-01 10:05:00", "view", 0.0),
        (3, 1, "2024-01-01 10:10:00", "purchase", 5.0),
        # user 1, later session (gap > 30 min): purchase only -> direct
        (4, 1, "2024-01-01 12:00:00", "purchase", 7.0),
        # user 2: no conversion
        (5, 2, "2024-01-01 10:00:00", "view", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = session_attribution(
        df, ["user_id"], "ts", "event_type", "value", "purchase",
        gap_seconds=1800, tiebreak="event_id",
    )
    assert_df_equals(
        out,
        [
            {"user_id": 1, "session_id": 1, "first_touch": "click",
             "last_touch": "view", "n_events": 3, "conv_count": 1,
             "conv_value": 5.0},
            {"user_id": 1, "session_id": 2, "first_touch": None,
             "last_touch": None, "n_events": 1, "conv_count": 1,
             "conv_value": 7.0},
            {"user_id": 2, "session_id": 1, "first_touch": "view",
             "last_touch": "view", "n_events": 1, "conv_count": 0,
             "conv_value": 0.0},
        ],
    )


# ------------------------------------------------- Ring negatives / CI


def test_ring_negative_samples_match_bisect_reference(spark):
    import bisect
    import hashlib

    from python_mozetl_spark.ext.mixing import ring_negative_samples

    ids = list(range(1, 61))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {
        (r["doc_id"], r["j"]): r["neg_id"]
        for r in ring_negative_samples(df, "doc_id", k=3, buckets=8).collect()
    }

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ring = sorted((h60(f"ring|{i}"), i) for i in ids)
    exp = {}
    for i in ids:
        for j in range(1, 4):
            t = h60(f"neg{j}|{i}")
            k = bisect.bisect_left(ring, (t,))
            nid = ring[k][1] if k < len(ring) else ring[0][1]  # wrap
            if nid != i:
                exp[(i, j)] = nid
    assert got == exp


def test_ring_negatives_stable_under_corpus_growth(spark):
    """Consistent-hashing property: adding ids only reassigns targets
    that land on the new ids' arcs — existing assignments either keep
    their negative or move to a NEW id, never to a different old id."""
    from python_mozetl_spark.ext.mixing import ring_negative_samples

    small = spark.createDataFrame([(i,) for i in range(30)], "doc_id bigint")
    grown = spark.createDataFrame([(i,) for i in range(40)], "doc_id bigint")
    a = {(r["doc_id"], r["j"]): r["neg_id"]
         for r in ring_negative_samples(small, "doc_id", k=2).collect()}
    b = {(r["doc_id"], r["j"]): r["neg_id"]
         for r in ring_negative_samples(grown, "doc_id", k=2).collect()}
    for key, old in a.items():
        if key in b and b[key] != old:
            assert b[key] >= 30, (key, old, b[key])


def test_proportion_ci_wilson_closed_form(spark):
    import math

    from python_mozetl_spark.operators.metrics import proportion_ci

    df = spark.createDataFrame(
        [("a", 1)] * 8 + [("a", 0)] * 2 + [("b", 1)], "g string, s int"
    )
    out = {r["g"]: r for r in proportion_ci(df, ["g"], "s").collect()}

    def wilson(succ, n, z=1.96):
        p = succ / n
        z2 = z * z
        denom = 1 + z2 / n
        center = p + z2 / (2 * n)
        margin = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        return round((center - margin) / denom, 6), round((center + margin) / denom, 6)

    lo, hi = wilson(8, 10)
    assert (out["a"]["ci_lo"], out["a"]["ci_hi"]) == (lo, hi)
    assert out["a"]["p"] == 0.8
    # degenerate slice p=1: interval stays inside [0, 1]
    lo1, hi1 = wilson(1, 1)
    assert (out["b"]["ci_lo"], out["b"]["ci_hi"]) == (lo1, hi1)
    assert 0.0 <= out["b"]["ci_lo"] and out["b"]["ci_hi"] <= 1.0


# ------------------------------------------------------------- Coreset


def test_kcenter_matches_python_greedy(spark):
    from python_mozetl_spark.ext.similarity import kcenter_coreset

    vecs = {i: [float(i % 5), float(i // 5)] for i in range(1, 16)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, embedding array<float>"
    )
    out = {r["vec_id"]: (r["center_id"], r["d2"])
           for r in kcenter_coreset(df, k=4).collect()}

    def d2(a, b):
        return round(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    sel = [min(vecs)]  # seed: lowest id
    for _ in range(3):
        far = max(
            (i for i in vecs),
            key=lambda i: (min(d2(vecs[i], vecs[c]) for c in sel), -i),
        )
        sel.append(far)
    exp = {}
    for i in vecs:
        ordd = [(d2(vecs[i], vecs[c]), ordn + 1, c) for ordn, c in enumerate(sel)]
        dd, _, c = min(ordd)
        exp[i] = (c, dd)
    assert out == exp


def test_kcenter_coverage_radius_shrinks(spark):
    """More centers can only shrink (never grow) the coverage radius."""
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.similarity import kcenter_coreset

    df = spark.createDataFrame(
        [(i, [float(i), float(3 * i % 7)]) for i in range(40)],
        "vec_id bigint, embedding array<float>",
    )
    r3 = kcenter_coreset(df, k=3).agg(F.max("d2")).collect()[0][0]
    r6 = kcenter_coreset(df, k=6).agg(F.max("d2")).collect()[0][0]
    assert r6 <= r3


# ------------------------------------------------------------- Neyman


def test_neyman_allocation_proportional_to_n_sigma(spark):
    from python_mozetl_spark.operators.sample import neyman_stratified_sample

    rows = (
        # stratum a: 40 rows, high spread; b: 40 rows, ~1/3 the spread;
        # c: 10 rows, zero spread (constant) -> zero allocation
        [(i, "a", float(100 * (i % 7))) for i in range(40)]
        + [(100 + i, "b", float(30 * (i % 7))) for i in range(40)]
        + [(200 + i, "c", 5.0) for i in range(10)]
    )
    df = spark.createDataFrame(rows, "id bigint, st string, v double")
    out = neyman_stratified_sample(df, "st", "v", "id", total_n=20).collect()
    by = {}
    for r in out:
        by[r["st"]] = by.get(r["st"], 0) + 1
    assert sum(by.values()) == 20
    assert by.get("c", 0) == 0          # sigma=0 -> no seats
    assert by["a"] > by["b"]            # higher sigma -> more seats
    # deterministic: second run picks the identical ids
    again = {r["id"] for r in
             neyman_stratified_sample(df, "st", "v", "id", total_n=20).collect()}
    assert again == {r["id"] for r in out}


def test_neyman_exact_budget_with_remainders(spark):
    from python_mozetl_spark.operators.sample import neyman_stratified_sample

    rows = [(i, f"s{i % 3}", float((i * 13) % 50)) for i in range(90)]
    df = spark.createDataFrame(rows, "id bigint, st string, v double")
    out = neyman_stratified_sample(df, "st", "v", "id", total_n=17).collect()
    assert len(out) == 17  # largest-remainder fills the budget exactly


# --------------------------------------------------------- Drift / chi2


def test_psi_zero_for_identical_distributions(spark):
    from pyspark.sql import functions as F

    from python_mozetl_spark.operators.metrics import psi_drift

    rows = [(float(v), cur) for v in range(100) for cur in (True, False)]
    df = spark.createDataFrame(rows, "v double, cur boolean")
    out = psi_drift(df, "cur", "v", lo=0.0, hi=100.0, n_bins=5).collect()
    assert len(out) == 5
    for r in out:
        assert r["psi_contrib"] == 0.0
        assert r["ref_share"] == r["cur_share"] == 0.2


def test_psi_detects_shift_and_clamps_overflow(spark):
    import math

    from python_mozetl_spark.operators.metrics import psi_drift

    rows = [(float(v % 10), False) for v in range(100)] + [
        (200.0, True) for _ in range(50)  # overflow -> clamps to top bin
    ]
    df = spark.createDataFrame(rows, "v double, cur boolean")
    out = {r["bin"]: r for r in
           psi_drift(df, "cur", "v", lo=0.0, hi=10.0, n_bins=5).collect()}
    assert out[4]["cur_share"] == 1.0        # everything clamped to bin 4
    exp = round((0.2 - 1.0) * math.log(0.2 / 1.0), 6)
    assert out[4]["psi_contrib"] == exp
    assert out[0]["psi_contrib"] is None     # empty on the current side


def test_chi_squared_matches_hand_computation(spark):
    from python_mozetl_spark.operators.metrics import chi_squared

    # 2x2 with a known statistic: [[10, 20], [30, 40]]
    rows = (
        [("x", "u")] * 10 + [("x", "v")] * 20
        + [("y", "u")] * 30 + [("y", "v")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_squared(df, "a", "b").collect()[0]
    n = 100
    exp = 0.0
    for o, ra, rb in [(10, 30, 40), (20, 30, 60), (30, 70, 40), (40, 70, 60)]:
        e = ra * rb / n
        exp += (o - e) ** 2 / e
    assert r["chi2"] == round(exp, 6)
    assert r["dof"] == 1 and r["n"] == 100


def test_chi_squared_reconstructs_zero_cells(spark):
    from python_mozetl_spark.operators.metrics import chi_squared

    # (y, v) never observed: the zero cell still contributes E
    rows = [("x", "u")] * 5 + [("x", "v")] * 5 + [("y", "u")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_squared(df, "a", "b").collect()[0]
    exp = 0.0
    for o, ra, rb in [(5, 10, 15), (5, 10, 5), (10, 10, 15), (0, 10, 5)]:
        e = ra * rb / 20
        exp += (o - e) ** 2 / e
    assert r["chi2"] == round(exp, 6)


# ------------------------------------------------------ State durations


def test_state_durations_caps_open_intervals(spark):
    from python_mozetl_spark.operators.merge import scd2_history, state_durations

    rows = [
        # key 1: A on [0,10), B on [10,25), A again on [25, open)
        (1, 0, "A"), (1, 10, "B"), (1, 25, "A"),
        # key 2: constant C from 5 (collapse_repeats folds the repeat)
        (2, 5, "C"), (2, 15, "C"),
    ]
    df = spark.createDataFrame(rows, "k int, v int, s string")
    hist = scd2_history(df, ["k"], "v", ["s"])
    out = {(r["k"], r["s"]): r for r in
           state_durations(hist, ["k"], ["s"], horizon=40).collect()}
    a = out[(1, "A")]
    assert a["total_duration"] == 10 + (40 - 25)
    assert a["n_intervals"] == 2 and a["is_current"]
    b = out[(1, "B")]
    assert b["total_duration"] == 15 and not b["is_current"]
    c = out[(2, "C")]
    assert c["total_duration"] == 35 and c["n_intervals"] == 1


def test_bpe_encode_matches_per_word_encoder(spark):
    from python_mozetl_spark.ext.vocab import bpe_encode, bpe_learn, encode_word

    corpus = [("the then there that aaa aaaa",), ("ab abab b the",)]
    df = spark.createDataFrame(corpus, "text string")
    m = bpe_learn(df, n_merges=5)
    for r in bpe_encode(df, "text", m).collect():
        exp = [t for w in r["text"].split() for t in encode_word(w, m)]
        assert r["bpe_tokens"] == exp


def test_bpe_encode_rejects_unsound_merge(spark):
    import pytest

    from python_mozetl_spark.ext.vocab import bpe_encode

    df = spark.createDataFrame([("x",)], "text string")
    with pytest.raises(ValueError):
        bpe_encode(df, "text", [("e</w>", "t", 1)])


# ------------------------------------------------------ Feature hashing


def test_hash_features_deterministic_sparse(spark):
    import hashlib

    from python_mozetl_spark.operators.encode import hash_features

    df = spark.createDataFrame([("u1", "click"), ("u2", "view")],
                               "user string, action string")
    out = {tuple(): None}
    rows = hash_features(df, ["user", "action"], dim=1000).collect()

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for r in rows:
        f = r["features"]
        assert len(f["indices"]) == len(f["values"]) <= 2
        assert f["indices"] == sorted(f["indices"])
        for c, v in (("user", r["user"]), ("action", r["action"])):
            idx = h(f"fh|{c}|{v}") % 1000
            sign = 1.0 if h(f"fhs|{c}|{v}") % 2 == 0 else -1.0
            assert idx in f["indices"]
            if len(f["indices"]) == 2:  # no collision: signs visible
                assert f["values"][f["indices"].index(idx)] == sign
    # determinism across invocations
    again = hash_features(df, ["user", "action"], dim=1000).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_hash_features_sums_collisions(spark):
    from python_mozetl_spark.operators.encode import hash_features

    # dim=1 forces every feature into index 0: values sum (±1 each)
    df = spark.createDataFrame([("a", "b", "c")], "x string, y string, z string")
    f = hash_features(df, ["x", "y", "z"], dim=1).collect()[0]["features"]
    assert f["indices"] == [0]
    assert f["values"][0] in (-3.0, -1.0, 1.0, 3.0)


# ------------------------------------------------- Edge-case hardening


def test_ring_negatives_sparse_ring_wrap_chain(spark):
    """3 docs across 64 mostly-empty buckets: targets landing in empty
    buckets must chain to the next non-empty bucket's first node, and
    targets past the last node must wrap to the global first."""
    import bisect
    import hashlib

    from python_mozetl_spark.ext.mixing import ring_negative_samples

    ids = [7, 101, 9001]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id bigint")
    got = {(r["doc_id"], r["j"]): r["neg_id"]
           for r in ring_negative_samples(df, "doc_id", k=4, buckets=64).collect()}

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    ring = sorted((h(f"ring|{i}"), i) for i in ids)
    exp = {}
    for i in ids:
        for j in range(1, 5):
            t = h(f"neg{j}|{i}")
            k = bisect.bisect_left(ring, (t,))
            nid = ring[k][1] if k < len(ring) else ring[0][1]
            if nid != i:
                exp[(i, j)] = nid
    assert got == exp


def test_cm_sketch_weighted(spark):
    from pyspark.sql import functions as F

    from python_mozetl_spark.ext.sketches import cm_estimate, cm_sketch

    rows = [("a", 5), ("a", 3), ("b", 10)]
    df = spark.createDataFrame(rows, "k string, w long")
    sk = cm_sketch(df, "k", width=256, depth=4, weight_col="w")
    items = df.groupBy("k").agg(F.sum("w").cast("bigint").alias("exact"))
    for r in cm_estimate(sk, items, "k", width=256, depth=4).collect():
        assert r["cm_est"] == r["exact"]  # no collisions at width 256


def test_loo_decimal_target_exact(spark):
    from pyspark.sql import functions as F

    from python_mozetl_spark.operators.encode import loo_target_encode

    df = spark.createDataFrame(
        [(1, "a", 10.25), (2, "a", 20.75), (3, "a", 30.00)],
        "id int, cat string, y double",
    ).withColumn("yd", F.col("y").cast("decimal(18,2)"))
    out = {r["id"]: r["loo_enc"]
           for r in loo_target_encode(df, "cat", "yd", round_to=4).collect()}
    assert out[1] == round((20.75 + 30.00) / 2, 4)
    assert out[2] == round((10.25 + 30.00) / 2, 4)
    assert out[3] == round((10.25 + 20.75) / 2, 4)


def test_kcenter_k_exceeds_corpus(spark):
    """k larger than the point count: selection stops covering every
    point exactly (each point its own center), distances all zero."""
    from python_mozetl_spark.ext.similarity import kcenter_coreset

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [5.0, 0.0]), (3, [0.0, 5.0])],
        "vec_id bigint, embedding array<float>",
    )
    out = kcenter_coreset(df, k=6).collect()
    assert len(out) == 3 and all(r["d2"] == 0.0 for r in out)


def test_ks_drift_hand_computed(spark):
    from python_mozetl_spark.operators.metrics import ks_drift

    # group A: {1, 2}; group B: {3, 4}; pooled: {1, 2, 3, 4}
    # at x=2: F_A=1.0, F_all=0.5 -> D_A = 0.5 (and symmetrically D_B
    # at x=2: F_B=0, F_all=0.5 -> 0.5)
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 3.0), ("B", 4.0), ("C", None)],
        ["g", "v"],
    )
    rows = {r["g"]: r for r in ks_drift(df, "g", "v").collect()}
    assert rows["A"]["ks_stat"] == 0.5 and rows["A"]["n_group"] == 2
    assert rows["B"]["ks_stat"] == 0.5
    # NULL-only group contributes no rows at all
    assert "C" not in rows


def test_ks_drift_identical_group_is_zero(spark):
    from python_mozetl_spark.operators.metrics import ks_drift

    # one group == pooled distribution -> D = 0
    df = spark.createDataFrame(
        [("A", float(v)) for v in (1, 2, 3)], ["g", "v"]
    )
    rows = ks_drift(df, "g", "v").collect()
    assert len(rows) == 1 and rows[0]["ks_stat"] == 0.0
