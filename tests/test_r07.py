"""Round-7 additions: certification completeness, advisor hardenings
(guarded SemDeDup oracle, side-input scheme/size guard, deterministic
client dedup), and the new graded operators."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ------------------------------------------------------------------
# Advisor: side-input scheme restriction + size cap
# ------------------------------------------------------------------

def test_side_input_rejects_non_http_schemes(tmp_path):
    from python_mozetl_spark.sources import side_input_from_json

    p = tmp_path / "x.json"
    p.write_text('{"a": 1}')
    with pytest.raises(ValueError, match="scheme"):
        side_input_from_json(f"file://{p}")
    with pytest.raises(ValueError, match="scheme"):
        side_input_from_json("ftp://example.test/x.json")
    # plain local paths still work
    assert side_input_from_json(str(p)) == {"a": 1}


# ------------------------------------------------------------------
# Advisor: SemDeDup ORACLE zero-norm guard (the Spark side was already
# pinned; this proves the DuckDB twin now agrees on a zero vector)
# ------------------------------------------------------------------

def test_semdedup_oracle_zero_vector_parity(spark, tmp_path):
    import duckdb

    from python_mozetl_spark.ext.similarity import semantic_dedup
    from python_mozetl_spark.plans.queries import _lloyd_oracle, _semdedup_tail

    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),     # exact duplicate of 1 → dropped
        (3, [0.0, 0.0]),     # zero vector: cosine must be 0.0, KEPT
        (4, [0.0, 1.0]),
        (5, [0.0, 0.0]),     # second zero vector — zero×zero pair too
        (6, [0.6, 0.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "embeddings.parquet")
    df.coalesce(1).write.parquet(path)

    got = {
        r["vec_id"]: r["kept"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", k=2, iters=1, threshold=0.9
        ).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    oracle = con.execute(
        _lloyd_oracle(k=2, iters=1, tail=_semdedup_tail(0.9))
    ).fetchall()
    want = {vec_id: kept for vec_id, _cluster, kept in oracle}
    assert got == want
    assert got[3] and got[5]  # zero vectors survive on BOTH engines
    assert not got[2]


# ------------------------------------------------------------------
# JPEG/PNG header-only decode (round-7 task 5)
# ------------------------------------------------------------------

def test_decode_image_header_png_color_types():
    from python_mozetl_spark.ext.multimodal import (
        decode_image_header,
        encode_png_header,
    )

    for ct, ch in [(0, 1), (2, 3), (3, 1), (4, 2), (6, 4)]:
        d = decode_image_header(encode_png_header(123, 45, ct))
        assert d == {"codec": "png", "width": 123, "height": 45, "channels": ch}


def test_decode_image_header_jpeg_marker_walk():
    import struct

    from python_mozetl_spark.ext.multimodal import (
        decode_image_header,
        encode_jpeg_header,
    )

    blob = encode_jpeg_header(640, 480, 3)
    assert decode_image_header(blob) == {
        "codec": "jpeg", "width": 640, "height": 480, "channels": 3,
    }
    # extra segments BEFORE the SOF must be skipped by length, and a
    # progressive SOF2 must be recognized too
    com_body = b"a comment"
    com = b"\xff\xfe" + struct.pack(">H", len(com_body) + 2) + com_body
    base = encode_jpeg_header(9, 7, 1)
    sof0 = base[base.index(b"\xff\xc0"):]
    progressive = base[:2] + com + b"\xff" + b"\xff\xc2" + sof0[2:]
    d = decode_image_header(progressive)
    assert (d["width"], d["height"], d["channels"]) == (9, 7, 1)


def test_decode_image_header_bmp_ppm_and_unknown():
    import pytest as _pytest

    from python_mozetl_spark.ext.multimodal import (
        decode_image_header,
        encode_bmp,
    )

    d = decode_image_header(encode_bmp(5, 3, lambda x, y: 0))
    assert d == {"codec": "bmp", "width": 5, "height": 3, "channels": 3}
    d = decode_image_header(b"P6\n2 2\n255\n" + b"\x00" * 12)
    assert d == {"codec": "ppm", "width": 2, "height": 2, "channels": 3}
    with _pytest.raises(ValueError):
        decode_image_header(b"GIF89a......")
    with _pytest.raises(ValueError):
        decode_image_header(b"\xff\xd8\xff\xd9")  # jpeg with no SOF


def test_header_features_permissive_nulls(spark):
    from python_mozetl_spark.ext.multimodal import (
        encode_png_header,
        header_features,
    )

    rows = [(1, bytearray(encode_png_header(8, 4, 2))), (2, bytearray(b"junk"))]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r.asDict() for r in header_features(media).collect()}
    assert got[1]["codec"] == "png" and got[1]["width"] == 8
    assert got[2]["codec"] is None and got[2]["width"] is None


# ------------------------------------------------------------------
# SemDeDup scale policy: auto-k sizing keeps pair fanout bounded
# ------------------------------------------------------------------

def test_semantic_dedup_auto_k_bounds_fanout(spark):
    """k=None → k = ceil(n / target_cluster_size): growing the corpus
    grows the number of clusters, so the expected cluster size — and
    with it the within-cluster pair fanout — stays ~target, instead of
    pair work growing quadratically with the corpus."""
    import math

    from python_mozetl_spark.ext.similarity import lloyd_clusters, semantic_dedup

    def corpus(n):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % 97).cast("double"),
                (F.col("id") % 89).cast("double"),
            ).alias("embedding"),
        )

    target = 50
    for n in (200, 800):
        df = corpus(n)
        out = semantic_dedup(
            df, "vec_id", "embedding", k=None, iters=1,
            threshold=0.99, target_cluster_size=target,
        )
        rows = out.collect()
        assert len(rows) == n  # every vector decided exactly once
        k_expected = math.ceil(n / target)
        clusters = {r["cluster"] for r in rows}
        assert clusters <= set(range(k_expected))
        # the enforced bound: cluster count scales with n, so the mean
        # cluster size (pair-fanout driver) stays ~target
        assert len(clusters) == k_expected


def test_semantic_dedup_explicit_k_unchanged(spark):
    from python_mozetl_spark.ext.similarity import semantic_dedup

    df = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    out = semantic_dedup(df, "vec_id", "embedding", k=3, iters=1, threshold=0.999)
    assert out.count() == 30
    assert {r["cluster"] for r in out.collect()} <= {0, 1, 2}


# ------------------------------------------------------------------
# RRF fusion + contamination report (round-7 coverage widening)
# ------------------------------------------------------------------

def test_rrf_fuse_ranks_and_membership(spark):
    from python_mozetl_spark.ext.search import rrf_fuse

    lex = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank long")
    sem = spark.createDataFrame([(3, 1), (4, 2)], "doc_id long, rank long")
    out = {r["doc_id"]: r for r in rrf_fuse([lex, sem], "doc_id", k=60).collect()}
    assert out[3]["n_lists"] == 2 and out[1]["n_lists"] == 1
    # doc 3 (rank 3 + rank 1) beats doc 1 (rank 1 alone)
    assert out[3]["rrf_score"] > out[1]["rrf_score"]
    assert abs(out[3]["rrf_score"] - (1 / 63 + 1 / 61)) < 1e-6
    import pytest as _pytest
    with _pytest.raises(ValueError):
        rrf_fuse([], "doc_id")


def test_contamination_report_zero_gram_docs_survive(spark):
    from python_mozetl_spark.ext.quality import contamination_report

    train = spark.createDataFrame(
        [(1, "a b c d"), (2, "x"), (3, None), (4, "p q r")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(9, "b c d e")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           contamination_report(train, bench, "doc_id", "text", n=3).collect()}
    assert set(got) == {1, 2, 3, 4}          # nobody vanishes
    assert got[1]["n_grams"] == 2 and got[1]["n_dirty"] == 1  # 'b c d' dirty
    assert got[1]["dirty_frac"] == 0.5
    assert got[2]["n_grams"] == 0 and got[2]["dirty_frac"] == 0.0
    assert got[3]["n_grams"] == 0
    assert got[4]["n_dirty"] == 0


def test_dsir_prefers_target_like_docs(spark):
    """Importance weights rank pool docs that share the target's
    bigrams above docs that don't; selection is deterministic."""
    from python_mozetl_spark.ext.mixing import dsir_select

    target = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps high") for i in range(5)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [
            (1, "the quick brown fox runs"),        # target-like
            (2, "quick brown fox jumps again"),     # target-like
            (3, "zebra yak xylophone walrus vole"), # alien
            (4, "unrelated words entirely here"),   # alien
        ],
        "doc_id long, text string",
    )
    out = dsir_select(pool, target, "doc_id", "text", m=64, k=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert min(rows[1]["logw"], rows[2]["logw"]) > max(
        rows[3]["logw"], rows[4]["logw"]
    )
    # determinism: identical re-run, identical scores and ranks
    again = {r["doc_id"]: r for r in
             dsir_select(pool, target, "doc_id", "text", m=64, k=4).collect()}
    assert {d: (r["score"], r["rank"]) for d, r in rows.items()} == {
        d: (r["score"], r["rank"]) for d, r in again.items()
    }


# ------------------------------------------------------------------
# Property tests: header codecs round-trip for arbitrary dimensions
# ------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=65_535),
    h=st.integers(min_value=1, max_value=65_535),
    ct=st.sampled_from([0, 2, 3, 4, 6]),
)
def test_png_header_roundtrip_property(w, h, ct):
    from python_mozetl_spark.ext.multimodal import (
        _PNG_CHANNELS,
        decode_image_header,
        encode_png_header,
    )

    d = decode_image_header(encode_png_header(w, h, ct))
    assert d == {
        "codec": "png", "width": w, "height": h, "channels": _PNG_CHANNELS[ct],
    }


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=65_535),
    h=st.integers(min_value=1, max_value=65_535),
    nc=st.integers(min_value=1, max_value=4),
)
def test_jpeg_header_roundtrip_property(w, h, nc):
    from python_mozetl_spark.ext.multimodal import (
        decode_image_header,
        encode_jpeg_header,
    )

    d = decode_image_header(encode_jpeg_header(w, h, nc))
    assert d == {"codec": "jpeg", "width": w, "height": h, "channels": nc}


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(max_size=64))
def test_decode_image_header_never_hangs_on_junk(junk):
    """Arbitrary bytes either decode or raise ValueError/IndexError —
    never loop forever or return garbage silently (the PERMISSIVE
    wrapper in header_features catches exactly these)."""
    from python_mozetl_spark.ext.multimodal import decode_image_header

    try:
        d = decode_image_header(junk)
        assert set(d) == {"codec", "width", "height", "channels"}
    except (ValueError, IndexError, TypeError):
        pass
    except Exception as e:  # struct.error is allowed too
        assert type(e).__name__ == "error"


# ------------------------------------------------------------------
# Physical-plan pins for the round-7 operators
# ------------------------------------------------------------------

import os as _os

_SF_DIR = _os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_dsir_model_join_is_broadcast_and_no_cartesian(spark):
    from python_mozetl_spark.plans.queries import REGISTRY

    plan = _formatted_plan(REGISTRY["doc_dsir_selection"].build(spark, _SF_DIR))
    assert "BroadcastHashJoin" in plan      # model rides as a broadcast
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort


def test_contamination_benchmark_grams_broadcast(spark):
    from python_mozetl_spark.plans.queries import REGISTRY

    plan = _formatted_plan(
        REGISTRY["doc_contamination_report"].build(spark, _SF_DIR)
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_hybrid_rrf_fusion_is_takeordered(spark):
    from python_mozetl_spark.plans.queries import REGISTRY

    plan = _formatted_plan(REGISTRY["hybrid_search_rrf"].build(spark, _SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_triangle_edge_list_is_checkpoint_staged(spark):
    """The 90-scans regression guard: the oriented edge list must ride
    a materialized (checkpoint/RDD-scan) node, not re-derive the token
    self-join per wedge-join consumer."""
    from python_mozetl_spark.plans.queries import REGISTRY

    plan = _formatted_plan(REGISTRY["token_triangles"].build(spark, _SF_DIR))
    n_parquet_scans = plan.count("Scan parquet")
    assert n_parquet_scans <= 4, f"edge list no longer staged: {n_parquet_scans} scans"


def test_token_budget_select_overshoot_by_at_most_one(spark):
    from python_mozetl_spark.ext.mixing import token_budget_select

    df = spark.createDataFrame(
        [(1, 0.9, 10), (2, 0.8, 10), (3, 0.7, 10), (4, 0.6, 10)],
        "doc_id long, q double, n long",
    )
    sel = lambda b: sorted(
        r["doc_id"]
        for r in token_budget_select(df, "doc_id", "q", "n", b).collect()
    )
    assert sel(25) == [1, 2, 3]   # doc 3 starts at 20 < 25 (overshoots to 30)
    assert sel(20) == [1, 2]      # doc 3 starts exactly at budget: excluded
    assert sel(5) == [1]          # budget smaller than first doc: still 1 doc
    assert sel(0) == []
    # ties on quality break by id
    tied = spark.createDataFrame(
        [(5, 0.5, 10), (4, 0.5, 10)], "doc_id long, q double, n long"
    )
    got = token_budget_select(tied, "doc_id", "q", "n", 10).collect()
    assert [r["doc_id"] for r in got] == [4]


def test_gram_covariance_matches_numpy_any_partitioning(spark):
    """Partial-moment assembly must equal np.cov(bias=True) regardless
    of how rows land in Arrow batches (1 vs 8 partitions)."""
    import numpy as np

    from python_mozetl_spark.ext.similarity import gram_covariance

    rng = np.random.RandomState(7)
    X = rng.randn(40, 5)
    rows = [(i, [float(v) for v in X[i]]) for i in range(40)]
    want = np.cov(X, rowvar=False, bias=True)
    for nparts in (1, 8):
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).repartition(nparts)
        got = {
            (r["i"], r["j"]): r["cov"]
            for r in gram_covariance(df, "embedding").collect()
        }
        assert len(got) == 15
        for i in range(5):
            for j in range(i, 5):
                assert got[(i, j)] == round(want[i, j], 6) + 0.0, (i, j, nparts)


def test_gram_covariance_skips_null_vectors(spark):
    from python_mozetl_spark.ext.similarity import gram_covariance

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None), (3, [3.0, 6.0])],
        "vec_id long, embedding array<double>",
    )
    got = {(r["i"], r["j"]): r["cov"] for r in gram_covariance(df).collect()}
    # over {(1,2),(3,6)}: var_x=1, cov_xy=2, var_y=4 (biased-n)
    assert got == {(0, 0): 1.0, (0, 1): 2.0, (1, 1): 4.0}


def test_zscore_outliers_matches_numpy(spark):
    import numpy as np

    from python_mozetl_spark.ext.similarity import zscore_outliers

    rng = np.random.RandomState(3)
    X = rng.randn(30, 4)
    X[7] += 8.0  # planted outlier
    rows = [(i, [float(v) for v in X[i]]) for i in range(30)]
    # constant dimension must contribute 0, not divide by zero
    rows = [(i, v + [1.0]) for i, v in rows]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = zscore_outliers(df, k=3).collect()
    mu, var = X.mean(axis=0), X.var(axis=0)
    want = np.sqrt((((X - mu) ** 2) / var).sum(axis=1))
    order = sorted(range(30), key=lambda i: (-round(want[i], 6), i))[:3]
    assert [r["vec_id"] for r in got] == order
    assert got[0]["vec_id"] == 7
    assert [r["rank"] for r in got] == [1, 2, 3]
    for r in got:
        assert r["score"] == round(want[r["vec_id"]], 6) + 0.0


def test_unigram_kl_identical_splits_zero_and_asymmetry(spark):
    """KL of an identical distribution must be 0; a shifted split must
    be strictly positive; n_tokens/joint_vocab must be exact."""
    from python_mozetl_spark.ext.quality import unigram_kl

    rows = [
        ("train", "a b c a"),
        ("same", "a b c a"),
        ("shifted", "a a a a"),
    ]
    df = spark.createDataFrame(rows, "split string, text string")
    got = {r["split"]: r for r in unigram_kl(df, "text", "split").collect()}
    assert set(got) == {"same", "shifted"}
    assert got["same"]["kl"] == 0.0
    assert got["same"]["n_tokens"] == 4 and got["same"]["joint_vocab"] == 3
    assert got["shifted"]["kl"] > 0.0
    # joint vocab of (shifted, train) = {a, b, c}: b/c live only in train
    assert got["shifted"]["joint_vocab"] == 3
    # hand-check shifted KL: p=(5/7,1/7,1/7) vs q=(3/7,2/7,2/7)
    import math

    want = round(
        5 / 7 * math.log((5 / 7) / (3 / 7))
        + 2 * (1 / 7 * math.log((1 / 7) / (2 / 7))),
        6,
    )
    assert got["shifted"]["kl"] == want


def test_cross_split_contamination_planted_pair(spark):
    """A val vector identical to a train vector must be flagged; the
    rate denominator is the split size, and eval-eval pairs must NOT
    count as contamination."""
    from python_mozetl_spark.ext.mixing import split_assign
    from python_mozetl_spark.ext.similarity import cross_split_contamination

    ids = spark.createDataFrame([(i,) for i in range(60)], "vec_id long")
    by_split = {}
    for r in split_assign(ids, "vec_id").collect():
        by_split.setdefault(r["split"], []).append(r["vec_id"])
    tr, va = by_split["train"][0], by_split["val"][0]
    va2, va3 = by_split["val"][1], by_split["val"][2]
    rows = []
    for i in range(60):
        if i in (tr, va):
            v = [1.0, 0.0, 0.0]          # planted train<->val duplicate
        elif i in (va2, va3):
            v = [0.0, 1.0, 0.0]          # val<->val pair: must not count
        else:
            v = [0.0, 0.0, 0.0]          # zero vectors: guarded cosine 0
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["split"]: r
        for r in cross_split_contamination(df, threshold=0.9).collect()
    }
    assert got["val"]["contaminated"] == 1
    assert got["val"]["n_vectors"] == len(by_split["val"])
    assert got["val"]["rate"] == round(1 / len(by_split["val"]), 6)
    assert got["test"]["contaminated"] == 0


def test_basket_pair_lift_hand_computed(spark):
    """Support/confidence/lift on a hand-countable basket set,
    including duplicate (basket, item) rows collapsing and the
    min_count prune."""
    from python_mozetl_spark.operators.basket import basket_pair_lift

    rows = [
        (1, "a"), (1, "b"), (1, "b"),   # dup (1, b) must collapse
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "c"),
    ]
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {
        (r["item_a"], r["item_b"]): r
        for r in basket_pair_lift(df, "bk", "it", min_count=2).collect()
    }
    # only (a, b) survives min_count=2: n_ab=2, N=4, n_a=3, n_b=2
    assert set(got) == {("a", "b")}
    r = got[("a", "b")]
    assert r["n_ab"] == 2
    assert r["support"] == 0.5
    assert r["confidence"] == round(2 / 3, 6)
    assert r["lift"] == round(2 * 4 / (3 * 2), 6)


def test_quantile_bin_equal_frequency_and_tie_rule(spark):
    from python_mozetl_spark.operators.encode import quantile_bin

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    got = quantile_bin(df, "v", 4, "q").collect()
    pops = {}
    for r in got:
        pops[r["q"]] = pops.get(r["q"], 0) + 1
    # 100 values into quartiles: cutoffs 25.75/50.5/75.25 -> 25/25/25/25
    assert pops == {0: 25, 1: 25, 2: 25, 3: 25}
    # ties collapse: constant column -> everything in bin 0
    const = spark.createDataFrame([(1.0,)] * 10, "v double")
    assert {r["q"] for r in quantile_bin(const, "v", 4, "q").collect()} == {0}


def test_decayed_sum_half_life_arithmetic(spark):
    from datetime import datetime as dt

    from python_mozetl_spark.operators.timeseries import decayed_sum

    rows = [
        (1, dt(2024, 1, 8), 10.0),   # ref instant: weight 1
        (1, dt(2024, 1, 1), 10.0),   # exactly one half-life old: weight 0.5
        (2, dt(2024, 1, 8), None),   # NULL value: excluded entirely
        (2, dt(2024, 1, 1), 4.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {r["user_id"]: r for r in decayed_sum(df, "user_id", "ts", "value").collect()}
    assert got[1]["n_events"] == 2 and got[1]["decayed_value"] == 15.0
    assert got[2]["n_events"] == 1 and got[2]["decayed_value"] == 2.0


def test_cusum_changepoint_planted_level_shift(spark):
    """A clean level shift must place the changepoint at the last day
    of the old regime with the right before/after means."""
    from datetime import datetime as dt

    from python_mozetl_spark.operators.timeseries import cusum_changepoint

    rows = [("a", dt(2024, 1, d), 10.0) for d in range(1, 11)]   # level 10
    rows += [("a", dt(2024, 1, d), 30.0) for d in range(11, 21)]  # level 30
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    r = cusum_changepoint(df, "k", "ts", "value").collect()[0]
    assert r["cp_day"] == "2024-01-10"
    assert r["n_days"] == 20
    assert r["mean_before"] == 10.0 and r["mean_after"] == 30.0
    # |cusum| at the boundary: 10 days x |10 - 20| = 100
    assert r["cusum_max"] == 100.0


def test_theil_sen_ignores_single_outlier(spark):
    """y = 2d + 1 with one wild day: Theil-Sen recovers the true
    slope/intercept exactly (least squares would not)."""
    from datetime import datetime as dt

    from python_mozetl_spark.operators.timeseries import theil_sen_trend

    rows = []
    for d in range(1, 12):
        y = 2.0 * (19722 + d) + 3.0   # day_idx of 2024-01-0d is 19722+d
        if d == 6:
            y += 1000.0               # outlier
        rows.append(("a", dt(2024, 1, d), y))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    r = theil_sen_trend(df, "k", "ts", "value").collect()[0]
    assert r["n_days"] == 11
    assert r["slope"] == 2.0
    assert r["intercept"] == 3.0


def test_unpivot_metrics_roundtrip_and_cast(spark):
    from python_mozetl_spark.operators.pivot import unpivot_metrics

    df = spark.createDataFrame([("x", 1, 2.5), ("y", 3, 4.0)], "g string, a long, b double")
    out = unpivot_metrics(df, ["g"], ["a", "b"]).collect()
    got = {(r["g"], r["metric"]): r["value"] for r in out}
    assert got == {("x", "a"): 1.0, ("x", "b"): 2.5, ("y", "a"): 3.0, ("y", "b"): 4.0}
    assert len(out) == 4  # |rows| x |value_cols|


def test_mmr_select_matches_python_reference(spark):
    """The distributed greedy equals a plain-python mirror of the spec
    (rounded cosines, id tie-breaks, incremental max-sim), and the
    second pick must NOT be the duplicate of the first."""
    import numpy as np

    from python_mozetl_spark.ext.similarity import mmr_select

    vecs = {
        1: [1.0, 0.0, 0.0],
        2: [1.0, 0.0, 0.0],     # duplicate of 1 — diversity must skip it
        3: [0.8, 0.6, 0.0],
        4: [0.0, 1.0, 0.0],
        5: [0.0, 0.0, 1.0],
        6: [0.0, 0.0, 0.0],     # zero vector: guarded cosine 0.0
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = [
        (r["rank"], r["vec_id"], r["relevance"], r["score"])
        for r in mmr_select(df, k=4, lam=0.5).collect()
    ]

    def cos(a, b):
        na, nb = np.dot(a, a), np.dot(b, b)
        if na == 0 or nb == 0:
            return 0.0
        return round(float(np.dot(a, b) / np.sqrt(na * nb)), 6)

    cen = np.mean([v for v in vecs.values()], axis=0)
    rel = {i: cos(v, cen) for i, v in vecs.items()}
    msim = {i: 0.0 for i in vecs}
    remaining, want = set(vecs), []
    for rank in range(1, 5):
        scored = sorted(
            ((round(0.5 * rel[i] - 0.5 * msim[i], 6), i) for i in remaining),
            key=lambda t: (-t[0], t[1]),
        )
        s, i = scored[0]
        want.append((rank, i, rel[i], s))
        remaining.discard(i)
        for j in remaining:
            msim[j] = max(msim[j], cos(vecs[j], vecs[i]))
    assert got == want
    # the duplicate (id 2) must not be picked right after id 1
    picked = [i for _, i, _, _ in got]
    if picked[0] == 1:
        assert picked[1] != 2


def test_rfm_scores_hand_computed(spark):
    """Quartile scores and segment labels on a hand-countable order
    log: the most recent frequent customer is the champion, recency
    inverts, every customer keeps exactly one row."""
    from datetime import date

    from python_mozetl_spark.operators.encode import rfm_scores

    rows = []
    # c1: 8 orders, newest day, big spend -> champion
    for i in range(8):
        rows.append((1, date(2024, 1, 28 + (i % 2)), 100.0))
    # c2: 1 old cheap order -> hibernating
    rows.append((2, date(2024, 1, 1), 5.0))
    # c3: 4 mid orders, recent -> scores between
    for i in range(4):
        rows.append((3, date(2024, 1, 25), 20.0))
    # c4: 2 orders, old -> low R
    rows.append((4, date(2024, 1, 2), 50.0))
    rows.append((4, date(2024, 1, 3), 50.0))
    df = spark.createDataFrame(rows, "c long, d date, amt double")
    got = {r["c"]: r for r in rfm_scores(df, "c", "d", "amt").collect()}
    assert len(got) == 4
    assert got[1]["segment"] == "champion"
    assert got[1]["r_score"] == 4 and got[1]["f_score"] == 4
    assert got[2]["segment"] == "hibernating"
    assert got[2]["recency_days"] == 28
    assert got[1]["recency_days"] == 0
    assert got[2]["r_score"] == 1
    # monotonicity: more recent never scores lower R than less recent
    rs = sorted((r["recency_days"], r["r_score"]) for r in got.values())
    for (d1, s1), (d2, s2) in zip(rs, rs[1:]):
        assert s1 >= s2


def test_weekday_seasonality_perfect_and_flat(spark):
    """A perfectly weekly-periodic series reports r2 = 1; a constant
    series reports r2 = 0 with uniform shares."""
    from datetime import datetime as dt, timedelta

    from python_mozetl_spark.operators.timeseries import weekday_seasonality

    rows = []
    base = dt(2024, 1, 1)  # a Monday
    for d in range(28):
        day = base + timedelta(days=d)
        rows.append(("periodic", day, float(day.weekday() + 1)))
        rows.append(("flat", day, 5.0))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    got = {
        (r["k"], r["dow"]): r
        for r in weekday_seasonality(df, "k", "ts", "value").collect()
    }
    assert len(got) == 14
    for dow in range(7):
        assert got[("periodic", dow)]["seasonality_r2"] == 1.0
        assert got[("periodic", dow)]["mean_value"] == dow + 1.0
        assert got[("periodic", dow)]["n_days"] == 4
        assert got[("flat", dow)]["seasonality_r2"] == 0.0
        assert got[("flat", dow)]["share"] == round(1 / 7, 6)
