"""Property-based invariants (hypothesis) for the dedup/sketch core.

Each property runs a handful of randomized examples through real Spark
plans — examples are kept small and ``deadline=None`` because a Spark
round trip is milliseconds-to-seconds, not microseconds.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def sess(spark):
    return spark


@settings(**SETTINGS)
@given(
    members=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 40)), min_size=2, max_size=60
    ),
    cap=st.integers(2, 8),
)
def test_bounded_bucket_pairs_invariants(sess, members, cap):
    """For ANY bucket assignment and ANY cap: the pair multiset equals
    {each unordered within-bucket pair, once per shared bucket}."""
    from collections import Counter

    from python_mozetl_spark.ext.dedup import bounded_bucket_pairs

    rows = sorted(set(members))  # (bucket, id) unique per bucket
    banded = sess.createDataFrame(rows, ["bucket", "id"]).select(
        "bucket", F.struct("id").alias("__p")
    )
    got = Counter(
        (r["a"]["id"], r["b"]["id"])
        for r in bounded_bucket_pairs(banded, "bucket", "__p", "id", cap).collect()
    )
    want = Counter()
    by_bucket = {}
    for b, i in rows:
        by_bucket.setdefault(b, []).append(i)
    for ids in by_bucket.values():
        for x in ids:
            for y in ids:
                if x < y:
                    want[(x, y)] += 1
    assert got == want


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12
    )
)
def test_simhash_banding_equals_brute_force(sess, texts):
    """Pigeonhole guarantee holds on arbitrary text: banded pairs ==
    brute-force hamming scan (bands > max_hamming)."""
    from python_mozetl_spark.ext.dedup import simhash_near_pairs, simhash_signatures

    docs = sess.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    # rows with no tokens produce no signature; brute force over those present
    sig = {r["doc_id"]: r["simhash"] for r in
           simhash_signatures(docs, "doc_id", "text").collect()}
    brute = {
        (a, b)
        for a in sig
        for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 10
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=10, bits=60, bands=12
        ).collect()
    }
    assert got == brute


@settings(**SETTINGS)
@given(
    groups=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 500)), min_size=1, max_size=80
    ),
    k=st.integers(4, 16),
)
def test_kmv_merge_equals_direct(sess, groups, k):
    """KMV is exactly mergeable: pooling per-part k-min sets and
    re-taking the k smallest gives the same estimate as sketching the
    union directly — for any grouping and any k."""
    from pyspark.sql import Window as W

    from python_mozetl_spark.ext.sketches import kmv_distinct, kmv_hashes

    rows = [("g", g % 2, f"u{u}") for g, u in groups]
    df = sess.createDataFrame(rows, ["g", "part", "uid"])
    direct = kmv_distinct(df, "uid", ["g"], k=k).collect()[0]["est_distinct"]
    pooled_rows = (
        kmv_hashes(df, "uid", ["g", "part"], k=k)
        .select("g", "__h")
        .dropDuplicates(["g", "__h"])
        .withColumn("__rn", F.row_number().over(W.partitionBy("g").orderBy("__h")))
        .where(F.col("__rn") <= k)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.max("__h").alias("kth"))
        .collect()[0]
    )
    est = (
        float(pooled_rows["n"])
        if pooled_rows["n"] < k
        else (k - 1) / pooled_rows["kth"]
    )
    assert round(est, 4) == direct


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=0, max_size=40),
        min_size=1,
        max_size=6,
    )
)
def test_repetition_stats_equals_explode_agg_form(sess, docs):
    """The within-row sort-and-fold repetition metrics must equal the
    exploded (doc, gram)-aggregation form for ANY token multiset —
    pins the shuffle-free rewrite against the reference formulation."""
    from collections import Counter

    from python_mozetl_spark.ext.quality import repetition_stats

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = sess.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           repetition_stats(df, "doc_id", "text").collect()}
    for i, toks in enumerate(docs):
        uni = Counter(toks)
        bi = Counter(
            [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        )
        n, tb = sum(uni.values()), sum(bi.values())
        r = got[i]
        assert r["n_tokens"] == n
        assert r["top_token_frac"] == round(
            (max(uni.values()) if uni else 0) / max(n, 1), 6
        )
        assert r["top_bigram_frac"] == round(
            (max(bi.values()) if bi else 0) / max(tb, 1), 6
        )
        dup = sum(c for c in bi.values() if c > 1)
        assert r["dup_bigram_frac"] == round(dup / max(tb, 1), 6)


@settings(**SETTINGS)
@given(
    n_tokens=st.integers(0, 150),
    window=st.integers(1, 64),
    stride_frac=st.floats(0.25, 1.0),
)
def test_sliding_window_chunks_cover_every_token(sess, n_tokens, window, stride_frac):
    """For ANY (n, window, stride<=window): chunk intervals cover every
    token index, begin at multiples of stride, never exceed the window
    size, and reconstruct the document on stride==window."""
    from python_mozetl_spark.ext.packing import sliding_window_chunks

    stride = max(1, int(window * stride_frac))
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = sess.createDataFrame([(1, text)], ["doc_id", "text"])
    rows = sorted(
        sliding_window_chunks(df, "doc_id", "text", window, stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    if n_tokens == 0:
        assert rows == []
        return
    covered = set()
    for r in rows:
        assert r["begin_token"] == r["chunk_idx"] * stride
        assert 1 <= r["n_chunk_tokens"] <= window
        assert r["begin_token"] + r["n_chunk_tokens"] <= n_tokens
        covered |= set(
            range(r["begin_token"], r["begin_token"] + r["n_chunk_tokens"])
        )
    assert covered == set(range(n_tokens))
    if stride == window:  # tumbling special case: exact partition
        rebuilt = " ".join(r["chunk_text"] for r in rows)
        assert rebuilt == text


@settings(**SETTINGS)
@given(
    vec=st.lists(
        st.floats(-10, 10, allow_nan=False, width=32), min_size=1, max_size=24
    )
)
def test_quantize_int8_bounds_and_sign(sess, vec):
    """For ANY float vector: quantized values stay in [-127, 127], the
    max-|x| element maps to ±127, and signs are preserved."""
    from python_mozetl_spark.functions.vectors import quantize_int8

    df = sess.createDataFrame([(1, vec)], ["id", "v"])
    q = df.select(quantize_int8(F.col("v")).alias("q")).collect()[0]["q"]
    assert len(q) == len(vec)
    mx = max(abs(x) for x in vec)
    if mx == 0:
        assert all(x == 0 for x in q)
        return
    assert all(-127 <= x <= 127 for x in q)
    for x, qx in zip(vec, q):
        if abs(x) == mx:
            assert abs(qx) == 127
        if x > 0:
            assert qx >= 0
        elif x < 0:
            assert qx <= 0


# ---------------------------------------------------------------------------
# round 4: funnel fold == reference walk; batching invariants; pagerank mass
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(1, 4),            # user
            st.integers(0, 30),           # ts (seconds)
            st.integers(1, 3),            # step idx
        ),
        min_size=1,
        max_size=40,
    )
)
def test_funnel_fold_matches_reference_walk(sess, events):
    """The one-fold funnel equals a plain-python greedy walk on every
    random event set (including ties and out-of-order input)."""
    import datetime as dt

    from python_mozetl_spark.operators.timeseries import funnel_counts

    steps = ["s1", "s2", "s3"]
    rows = [
        (u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts), steps[s - 1], 0.0)
        for u, ts, s in events
    ]
    df = sess.createDataFrame(
        rows, "user_id int, ts timestamp_ntz, event_type string, value double"
    )
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(df, "user_id", "ts", "event_type", steps).collect()
    }
    # reference: greedy walk per user over (ts, step)-sorted events
    per_user = {}
    for u, ts, s in events:
        per_user.setdefault(u, []).append((ts, s))
    depths = []
    for seq in per_user.values():
        depth, at = 0, None
        for ts, s in sorted(seq):
            if s == depth + 1 and (at is None or ts > at):
                depth, at = depth + 1, ts
        depths.append(depth)
    # one row per step ALWAYS — unreached steps report 0, not absence
    expect = {k: sum(1 for d in depths if d >= k) for k in (1, 2, 3)}
    assert got == expect


@settings(**SETTINGS)
@given(
    lens=st.lists(st.integers(0, 200), min_size=1, max_size=60),
    batch=st.integers(1, 7),
)
def test_length_batches_partition_and_bound(sess, lens, batch):
    """Batches partition the input; every batch is <= batch_size; the
    LAST batch per bucket is the only one allowed to be short."""
    from python_mozetl_spark.ext.packing import length_bucketed_batches

    df = sess.createDataFrame(list(enumerate(lens)), ["doc_id", "n"])
    out = length_bucketed_batches(df, "doc_id", "n", [50, 120], batch).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(range(len(lens)))
    groups = {}
    for r in out:
        groups.setdefault((r["bucket"], r["batch"]), []).append(r)
    for (b, k), rs in groups.items():
        assert len(rs) <= batch
        if len(rs) < batch:  # short => must be the bucket's last batch
            assert k == max(kk for (bb, kk) in groups if bb == b)
        # batch_pos is a permutation of 0..len-1
        assert sorted(r["batch_pos"] for r in rs) == list(range(len(rs)))


@settings(**SETTINGS)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    )
)
def test_pagerank_conserves_mass_on_symmetric_graphs(sess, edges):
    """On a symmetrized graph (no dangling vertices) the rank vector
    stays a probability distribution through every unrolled iteration."""
    from python_mozetl_spark.ext.graph import pagerank

    sym = list({(a, b) for a, b in edges} | {(b, a) for a, b in edges})
    df = sess.createDataFrame(sym, ["s", "d"])
    ranks = [r["rank"] for r in pagerank(df, "s", "d", iterations=2).collect()]
    assert all(r > 0 for r in ranks)
    assert abs(sum(ranks) - 1.0) < 1e-4


@settings(**SETTINGS)
@given(
    vals=st.lists(st.integers(0, 10**12), min_size=1, max_size=60),
    subbits=st.integers(2, 6),
)
def test_log_histogram_quantile_bounds_hold(sess, vals, subbits):
    """Property: for ANY non-negative ints and sub-bucket width, the
    sketch quantile never exceeds the exact order statistic and stays
    within 2^-subbits relative below it; bucket counts always sum to n
    (ext/sketches.py:log_histogram)."""
    import math

    from python_mozetl_spark.ext.sketches import (
        histogram_quantiles,
        log_histogram,
    )

    df = sess.createDataFrame([(v,) for v in vals], ["v"])
    hist = log_histogram(df, "v", subbits=subbits)
    assert sum(r["cnt"] for r in hist.collect()) == len(vals)
    out = {r["q"]: r["est"] for r in
           histogram_quantiles(hist, [0.5, 0.99]).collect()}
    sv = sorted(vals)
    for q in (0.5, 0.99):
        exact = sv[math.ceil(q * len(sv)) - 1]
        assert out[q] <= exact
        assert out[q] >= exact * (1 - 2.0 ** -subbits) - 1


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-10**6, 10**6)),
        min_size=1,
        max_size=50,
    ),
    nsplit=st.integers(2, 4),
)
def test_agg_state_merge_associative_any_partitioning(sess, rows, nsplit):
    """Property: however the rows are partitioned into batches, merged
    state equals the single-pass state bit-for-bit (decimal-exact
    components; operators/incremental.py)."""
    from python_mozetl_spark.operators.incremental import (
        agg_state,
        merge_agg_states,
    )
    from tests.conftest import df_rows

    df = sess.createDataFrame(rows, ["k", "v"])
    batches = [
        df.where(F.pmod(F.xxhash64("v"), F.lit(nsplit)) == i)
        for i in range(nsplit)
    ]
    merged = merge_agg_states(
        [agg_state(b, ["k"], ["v"]) for b in batches], ["k"], ["v"]
    )
    assert df_rows(merged) == df_rows(agg_state(df, ["k"], ["v"]))


@settings(**SETTINGS)
@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=40,
    )
)
def test_morton_key_is_injective_and_quadrant_monotonic(sess, pairs):
    """Property: the Z-order key is a bijection on the (x, y) grid —
    distinct points give distinct keys — and points sharing the high
    quadrant bits sort contiguously (the locality the layout relies
    on; sinks/writers.py:zorder_key)."""
    from python_mozetl_spark.sinks.writers import zorder_key

    df = sess.createDataFrame(list(pairs), ["x", "y"])
    out = df.select("x", "y", zorder_key(["x", "y"], bits=6).alias("z")).collect()
    zs = {(r["x"], r["y"]): r["z"] for r in out}
    assert len(set(zs.values())) == len(pairs)
    # quadrant prefix property: the top bit lanes dominate the order
    for (x, y), z in zs.items():
        quadrant = ((y >> 5) << 1) | (x >> 5)
        assert z >> 10 == quadrant


@settings(**SETTINGS)
@given(
    base=st.lists(
        st.tuples(st.integers(0, 30), st.text("ab", max_size=2)),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
def test_snapshot_diff_self_is_empty_and_detects_any_edit(sess, base):
    """Property: diff(x, x) is empty; flipping one row's value yields
    exactly one U row attributing that column
    (operators/merge.py:snapshot_diff)."""
    from python_mozetl_spark.operators.merge import snapshot_diff

    old = sess.createDataFrame(base, ["k", "s"])
    assert snapshot_diff(old, old, ["k"], ["s"]).count() == 0
    k0, s0 = base[0]
    edited = [(k0, s0 + "zz")] + base[1:]
    d = snapshot_diff(old, sess.createDataFrame(edited, ["k", "s"]),
                      ["k"], ["s"]).collect()
    assert len(d) == 1
    assert d[0]["k"] == k0 and d[0]["change"] == "U"
    assert d[0]["changed_cols"] == ["s"]


@settings(**SETTINGS)
@given(
    words=st.lists(st.text("abc", min_size=1, max_size=6), min_size=1,
                   max_size=12),
    merges=st.lists(
        st.tuples(st.text("abc", min_size=1, max_size=2),
                  st.text("abc", min_size=1, max_size=2)),
        max_size=3,
    ),
)
def test_bpe_apply_merge_equals_python_encoder(sess, words, merges):
    """Property: the distributed fold merge equals the sequential
    Python encoder for ANY word set and ANY merge sequence
    (ext/vocab.py:apply_merge vs encode_word)."""
    from python_mozetl_spark.ext.vocab import (
        apply_merge,
        encode_word,
        initial_symbols,
    )

    ms = [(a, b, 0) for a, b in merges]
    df = sess.createDataFrame([(w,) for w in set(words)], "word string")
    enc = df.select("word", initial_symbols("word").alias("s"))
    for a, b, _ in ms:
        enc = enc.select("word", apply_merge(F.col("s"), a, b).alias("s"))
    for r in enc.collect():
        assert r["s"] == encode_word(r["word"], ms), (r["word"], ms)


@settings(**SETTINGS)
@given(
    dim=st.lists(st.integers(0, 500), min_size=1, max_size=40, unique=True),
    extra=st.lists(st.integers(501, 900), max_size=20, unique=True),
)
def test_bloom_semi_join_equals_plain_semi_join(sess, dim, extra):
    """Property: bloom-pruned + exact-verified semi join is row-equal
    to the plain semi join for ANY key sets (no false negatives by
    construction; false positives removed by the verify)."""
    from python_mozetl_spark.operators.bloom import bloom_semi_join

    dim_df = sess.createDataFrame([(k,) for k in dim], "k bigint")
    fact = sess.createDataFrame([(k,) for k in dim + extra], "k bigint")
    got = sorted(r["k"] for r in
                 bloom_semi_join(fact, "k", dim_df, "k",
                                 num_bits=1 << 10, num_hashes=3).collect())
    assert got == sorted(dim)


@settings(**SETTINGS)
@given(
    keys=st.lists(st.integers(0, 9), min_size=1, max_size=60),
    width=st.integers(2, 8),
    depth=st.integers(1, 3),
)
def test_cm_estimate_upper_bounds_exact(sess, keys, width, depth):
    """Property: Count-Min never underestimates, for ANY key stream
    and ANY (width, depth)."""
    from python_mozetl_spark.ext.sketches import cm_estimate, cm_sketch

    df = sess.createDataFrame([(str(k),) for k in keys], "k string")
    sk = cm_sketch(df, "k", width=width, depth=depth)
    exact = df.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    for r in cm_estimate(sk, exact, "k", width=width, depth=depth).collect():
        assert r["cm_est"] >= r["exact"]


@settings(**SETTINGS)
@given(
    a_keys=st.sets(st.integers(0, 300), min_size=1, max_size=120),
    b_keys=st.sets(st.integers(0, 300), min_size=1, max_size=120),
    k=st.integers(4, 32),
)
def test_kmv_overlap_matches_python_mirror(sess, a_keys, b_keys, k):
    """Round-6 fix invariant, as a deterministic mirror of the md5
    algebra: est_union is the TRUE union exactly when BOTH groups have
    <= k distinct keys (a truncated side landing the pooled union at
    exactly k must use the estimator — the old `pooled <= k` test let
    it claim exactness); otherwise it equals (k-1)*2^60/h_k over the
    pooled sketch.  est_jaccard always equals the pooled-k-min form."""
    import hashlib

    from python_mozetl_spark.ext.sketches import kmv_overlap

    def h(key):
        return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)

    rows = [("A", f"x{v}") for v in a_keys] + [("B", f"x{v}") for v in b_keys]
    df = sess.createDataFrame(rows, "g string, key string")
    out = kmv_overlap(df, "key", "g", k=k).collect()[0]
    ha = sorted(h(f"x{v}") for v in a_keys)[:k]
    hb = sorted(h(f"x{v}") for v in b_keys)[:k]
    un = sorted(set(ha) | set(hb))
    pooled = un[:k]
    jac = sum(1 for x in pooled if x in set(ha) and x in set(hb)) / len(pooled)
    if len(a_keys) <= k and len(b_keys) <= k:
        uni = float(len(a_keys | b_keys))
    else:
        uni = (k - 1) * float(1 << 60) / pooled[k - 1]
    assert out["est_jaccard"] == round(jac, 6)
    assert out["est_union"] == round(uni, 2)
    assert out["est_inter"] == round(jac * uni, 2)


@settings(**SETTINGS)
@given(
    rights=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 5)),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    l_ts=st.integers(0, 20),
    l_tb=st.integers(0, 5),
)
def test_asof_join_matches_strict_reference(sess, rights, l_ts, l_tb):
    """asof_join == the brute-force 'latest right row strictly before
    (order, tiebreak)' on ANY input, including exact ties."""
    from python_mozetl_spark.operators.asof import asof_join

    left = sess.createDataFrame([("u", l_ts, l_tb)], "k string, ts long, tb long")
    right = sess.createDataFrame(
        [("u", ts, tb, float(ts * 100 + tb)) for ts, tb in rights],
        "k string, ts long, tb long, value double",
    )
    got = asof_join(
        left, right, on=["k"], order="ts", tiebreak="tb", payload=["value"]
    ).collect()[0]["prev_value"]
    preceding = [(ts, tb) for ts, tb in rights if (ts, tb) < (l_ts, l_tb)]
    want = (
        float(max(preceding)[0] * 100 + max(preceding)[1]) if preceding else None
    )
    assert got == want


# ---------------------------------------------------------------------------
# round 7 late: basket rules, decay, quantile bins, KL
# ---------------------------------------------------------------------------


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(1, 5), st.integers(0, 6)),
        min_size=1,
        max_size=40,
    ),
    min_count=st.integers(1, 3),
)
def test_basket_pair_lift_matches_bruteforce(sess, rows, min_count):
    """support/confidence/lift equal a plain-python brute force on any
    random basket set, for any min_count."""
    from python_mozetl_spark.operators.basket import basket_pair_lift

    df = sess.createDataFrame(rows, ["bk", "it"])
    got = {
        (r["item_a"], r["item_b"]): (
            r["n_ab"], r["support"], r["confidence"], r["lift"]
        )
        for r in basket_pair_lift(df, "bk", "it", min_count).collect()
    }
    baskets = {}
    for bk, it in set(rows):
        baskets.setdefault(bk, set()).add(it)
    n = len(baskets)
    from collections import Counter

    ic, pc = Counter(), Counter()
    for items in baskets.values():
        for it in items:
            ic[it] += 1
        for a in items:
            for b in items:
                if a < b:
                    pc[(a, b)] += 1
    want = {
        p: (
            c,
            round(c / n, 6),
            round(c / ic[p[0]], 6),
            round(c * n / (ic[p[0]] * ic[p[1]]), 6),
        )
        for p, c in pc.items()
        if c >= min_count
    }
    assert got == want


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 3),
            st.integers(0, 3_000_000),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_decayed_sum_matches_python_reference(sess, rows):
    import datetime as dt
    import math

    from python_mozetl_spark.operators.timeseries import decayed_sum

    base = dt.datetime(2024, 1, 1)
    data = [(k, base + dt.timedelta(seconds=s), v) for k, s, v in rows]
    df = sess.createDataFrame(data, "k long, ts timestamp, v double")
    got = {
        r["k"]: (r["n_events"], r["decayed_value"])
        for r in decayed_sum(df, "k", "ts", "v", half_life_days=2.0).collect()
    }
    ref_s = max(s for _, s, _ in rows)
    want = {}
    for k, s, v in rows:
        n, tot = want.get(k, (0, 0.0))
        want[k] = (n + 1, tot + v * 0.5 ** ((ref_s - s) / 86400.0 / 2.0))
    want = {k: (n, round(tot, 4)) for k, (n, tot) in want.items()}
    for k in want:
        assert got[k][0] == want[k][0]
        assert math.isclose(got[k][1], want[k][1], abs_tol=2e-4), (k, got[k], want[k])


@settings(**SETTINGS)
@given(
    vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=50),
    n_bins=st.integers(2, 8),
)
def test_quantile_bin_monotone_and_in_range(sess, vals, n_bins):
    """Bins are monotone non-decreasing in the value and always in
    [0, n_bins-1]; equal values always share a bin."""
    from python_mozetl_spark.operators.encode import quantile_bin

    df = sess.createDataFrame([(v,) for v in vals], "v double")
    out = sorted(
        ((r["v"], r["q"]) for r in quantile_bin(df, "v", n_bins, "q").collect())
    )
    assert all(0 <= q <= n_bins - 1 for _, q in out)
    for (v1, q1), (v2, q2) in zip(out, out[1:]):
        assert q1 <= q2
        if v1 == v2:
            assert q1 == q2


@settings(**SETTINGS)
@given(
    a=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=15),
    b=st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=15),
)
def test_unigram_kl_matches_python_reference(sess, a, b):
    """Smoothed KL >= 0 (Gibbs) and equals a plain-python mirror;
    == 0 whenever the count vectors match.  (The reverse implication
    is FALSE — e.g. both splits all one token at different lengths
    give identical smoothed distributions, hence KL = 0.)"""
    import math
    from collections import Counter

    from python_mozetl_spark.ext.quality import unigram_kl

    rows = [("train", " ".join(a)), ("eval", " ".join(b))]
    df = sess.createDataFrame(rows, "split string, text string")
    r = unigram_kl(df, "text", "split").collect()[0]
    ca, cb = Counter(b), Counter(a)  # eval vs train
    vocab = set(ca) | set(cb)
    v, ns, nr = len(vocab), sum(ca.values()), sum(cb.values())
    want = sum(
        (ca[w] + 1) / (ns + v)
        * math.log(((ca[w] + 1) / (ns + v)) / ((cb[w] + 1) / (nr + v)))
        for w in vocab
    )
    assert r["kl"] >= 0.0
    assert math.isclose(r["kl"], want, abs_tol=1e-6), (r["kl"], want)
    if Counter(a) == Counter(b):
        assert r["kl"] == 0.0


@settings(**SETTINGS)
@given(
    ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=60,
                 unique=True),
    n_domains=st.integers(1, 5),
    cap=st.integers(1, 8),
    parts=st.integers(1, 7),
)
def test_domain_quota_partitioning_invariant_and_capped(
    sess, ids, n_domains, cap, parts
):
    """The kept set is a pure function of (salt, ids): identical under
    any input partitioning, never exceeds cap per domain, and equals
    the python replay of the md5 rank."""
    import hashlib

    from python_mozetl_spark.ext.mixing import domain_quota

    rows = [(i, f"d{i % n_domains}") for i in ids]
    df = sess.createDataFrame(rows, "doc_id long, domain string")
    got = {
        (r["doc_id"], r["domain_rank"])
        for r in domain_quota(
            df.repartition(parts), "domain", "doc_id", cap=cap
        ).collect()
    }

    def h(i: int) -> int:
        return int(hashlib.md5(f"dq|{i}".encode()).hexdigest()[:15], 16)

    want = set()
    for d in {f"d{i % n_domains}" for i in ids}:
        members = sorted(
            (i for i in ids if f"d{i % n_domains}" == d),
            key=lambda i: (h(i), i),
        )
        want |= {(i, rk + 1) for rk, i in enumerate(members[:cap])}
    assert got == want


@settings(**SETTINGS)
@given(
    hashes=st.lists(
        st.integers(-(2**62), 2**62), min_size=0, max_size=40
    ),
    window=st.integers(1, 6),
)
def test_least_chain_minima_equals_slice_array_min(sess, hashes, window):
    """Round-11 equivalence pin: the allocation-free least(element_at)
    window-minima chain (ext/dedup.py:winnow_fingerprints) is
    bit-identical to array_min(slice(...)) for ANY bigint array
    (negatives included — the xxhash64 path) and ANY window, across
    all three size regimes (m >= window, 1 <= m < window, m == 0)."""
    df = sess.createDataFrame([(hashes,)], "h array<bigint>")
    m = F.size("h")
    n_windows = m - window + 1

    def _chain(j):
        e = F.element_at(F.col("h"), j)
        for off in range(1, window):
            e = F.least(e, F.element_at(F.col("h"), j + off))
        return e

    def _sel(win_min):
        return (
            F.when(
                n_windows >= 1,
                F.transform(F.sequence(F.lit(1), n_windows), win_min),
            )
            .when(m >= 1, F.array(F.array_min("h")))
            .otherwise(F.expr("CAST(array() AS array<bigint>)"))
        )

    row = df.select(
        _sel(lambda j: F.array_min(F.slice("h", j, window))).alias("old"),
        _sel(_chain).alias("new"),
    ).collect()[0]
    assert row["old"] == row["new"]


@settings(**SETTINGS)
@given(
    toks=st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\x00"
            ),
            max_size=6,
        ),
        min_size=0,
        max_size=12,
    ),
    k=st.integers(1, 5),
)
def test_join_k_equals_concat_ws_slice(sess, toks, k):
    """Round-11 equivalence pin: _join_k (functions/text.py) is
    bit-identical to concat_ws(" ", slice(toks, i+1, k)) for ANY
    token array without NULLs — empty strings and multibyte unicode
    included — whenever size(toks) >= k (the callers' guard)."""
    from python_mozetl_spark.functions.text import _join_k

    if len(toks) < k:
        return
    df = sess.createDataFrame([(toks,)], "t array<string>")
    n = F.size("t")
    idx = F.sequence(F.lit(0), n - k)
    row = df.select(
        F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice("t", i + 1, k))
        ).alias("old"),
        F.transform(idx, lambda i: _join_k(F.col("t"), i, k)).alias("new"),
    ).collect()[0]
    assert row["old"] == row["new"]


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    seed=st.integers(0, 10**6),
    min_shared=st.integers(1, 12),
    c=st.integers(1, 16),
)
def test_winnow_c_prefix_output_invariant_in_c(sess, seed, min_shared, c):
    """Round-11 retune safety net: winnow_copy_pairs output is
    INVARIANT in min_prefix_hits (the c-prefix theorem: any c <= T
    keeps 100% recall; the exact array_intersect verify kills any
    extra candidates) — for random corpora with planted copies, any
    (min_shared, c) pair must reproduce the c=1 pair set exactly,
    including c > min_shared (the clamp path)."""
    import random

    from python_mozetl_spark.ext.dedup import winnow_copy_pairs

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(12):
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(30))))
    # planted near-copies: shared long blocks guarantee shared grams
    for j, (src, _) in enumerate(docs[:3]):
        base = docs[src][1]
        docs.append((100 + j, base[: len(base) // 2] + " zz " + base[len(base) // 2 :]))
    df = sess.createDataFrame(docs, "doc_id bigint, text string")

    def pairs(c_val):
        return sorted(
            (r.id_a, r.id_b, r.n_shared)
            for r in winnow_copy_pairs(
                df, "doc_id", "text", k=8, window=4,
                min_shared=min_shared, max_bucket=500,
                min_prefix_hits=c_val,
            ).collect()
        )

    assert pairs(c) == pairs(1)
