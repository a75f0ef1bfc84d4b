import hashlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from python_mozetl_spark.ext.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from python_mozetl_spark.ext.multimodal import (
    decode_image,
    documents_as_media,
    extract_features,
)
from python_mozetl_spark.ext.similarity import (
    brute_force_topk,
    bucketed_topk,
    cosine_topk_pandas,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "the quick brown fox jumps over the lazy dog again and again tonight"),  # near-dup of 0
    (2, "completely different text about spark query engines and shuffles"),
    (3, "  The   quick brown fox jumps over the lazy dog again and again today "),  # exact dup of 0 modulo ws/case
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_duplicates(docs):
    out = exact_duplicates(docs, "doc_id", "text")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["n_dups"] == 2 and rows[0]["keeper_id"] == 0
    assert rows[3]["n_dups"] == 2 and rows[3]["keeper_id"] == 0
    assert rows[2]["n_dups"] == 1


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.7
    assert (0, 3) in pairs  # exact-dup pair too
    assert not any(2 in p for p in pairs)


def test_simhash_near_pairs_equals_brute_force(spark, docs):
    # banded LSH with bands > max_hamming must equal the brute-force scan
    sig = {r["doc_id"]: r["simhash"] for r in
           simhash_signatures(docs, "doc_id", "text").collect()}
    brute = {
        (a, b)
        for a in sig for b in sig if a < b
        and bin(sig[a] ^ sig[b]).count("1") <= 16
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            docs, "doc_id", "text", max_hamming=16, bits=60, bands=20
        ).collect()
    }
    assert got == brute


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(20)],
        ["vec_id", "embedding"],
    )
    out = brute_force_topk(df, df.where(F.col("vec_id") == 0), k=3)
    got = [r["neighbor_id"] for r in out.orderBy("rank").collect()]
    v = vecs.astype(np.float64)
    sims = (v @ v[0]) / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    exp = list(np.argsort(np.round(sims, 4))[::-1][:3])
    assert got == [int(x) for x in exp]


def test_pandas_path_matches_exact_path(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        ["vec_id", "embedding"],
    )
    queries_pdf = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [list(vecs[1]), list(vecs[2])]}
    )
    exact = brute_force_topk(df, df.where(F.col("vec_id").isin(1, 2)), k=30)
    fast = cosine_topk_pandas(df, queries_pdf, k=30)
    e = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact.collect()}
    f = {(r["query_id"], r["neighbor_id"]): r["score"] for r in fast.collect()}
    assert e == f  # same rounded scores from both paths


def test_bucketed_topk_stays_in_bucket(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [1.0, 0.01], 1)],
        ["vec_id", "embedding", "label"],
    )
    out = bucketed_topk(df, "label", k=5).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in out} == {(0, 1), (1, 0)}


def test_bucketed_topk_chunked_kernel_and_cell_bound(spark):
    rng = np.random.RandomState(11)
    vecs = rng.randn(40, 6)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]], i % 2) for i in range(40)],
        ["vec_id", "embedding", "label"],
    )
    full = sorted(map(tuple, bucketed_topk(df, "label", k=3).collect()))
    chunked = sorted(
        map(tuple, bucketed_topk(df, "label", k=3, chunk_rows=3).collect())
    )
    assert full == chunked  # chunking is invisible in the result
    with pytest.raises(Exception, match="max_cell_rows"):
        bucketed_topk(df, "label", k=3, max_cell_rows=5).collect()


def test_embedding_near_dup_byte_gate_falls_back_to_join(spark):
    from python_mozetl_spark.ext.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(9)
    base = rng.standard_normal((12, 8))
    rows = [(i, base[i].tolist()) for i in range(12)]
    rows.append((50, (base[0] * 2.0).tolist()))  # cosine 1.0 with id 0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    matmul = sorted(
        map(tuple, embedding_near_dup_pairs(df, strategy="matmul").collect())
    )
    # auto with a 1-byte budget must route to the distributed join path
    forced = sorted(
        map(
            tuple,
            embedding_near_dup_pairs(df, strategy="auto", matmul_max_bytes=1).collect(),
        )
    )
    assert matmul == forced and (0, 50, 1.0) in matmul


def test_ngram_indicator_byte_gate_falls_back_to_prefix(spark):
    from python_mozetl_spark.ext.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bitmap = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.7, strategy="bitmap"
        ).collect()
    )
    # joint rows x vocab gate: 1-byte budget must fall back to prefix
    gated = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.7, indicator_max_bytes=1
        ).collect()
    )
    assert bitmap == gated and len(bitmap) > 0


def test_lsh_bucket_cap_preserves_pairs_on_skewed_fixture(spark):
    """A degenerate corpus (many identical docs -> one giant band
    bucket) must produce the SAME pair set whether buckets fit in one
    task array or get chunk-grid split (max_bucket smaller than the
    bucket)."""
    from python_mozetl_spark.ext.dedup import minhash_lsh_pairs, simhash_near_pairs

    rows = [(i, "the same boilerplate sentence repeated everywhere") for i in range(12)]
    rows += [(100 + i, f"unique document number {i} about topic {i}") for i in range(4)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    def pairset(max_bucket):
        return {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_pairs(
                docs, "doc_id", "text", threshold=0.9, max_bucket=max_bucket
            ).collect()
        }

    capped, uncapped = pairset(3), pairset(10_000)
    assert capped == uncapped
    assert {(a, b) for a in range(12) for b in range(12) if a < b} <= capped

    # when buckets actually overflow, the bucket-count window frame
    # must be computed ONCE for the small-bucket branch and both
    # grid-join sides.  Pre-r13 this leaned on AQE ReusedExchange
    # (pinned here as >= 3 reuses); since the r13 optimization the
    # one-shot path localCheckpoints the tagged frame
    # (bounded_bucket_pairs stage=True), so every consumer reads the
    # SAME materialized RDD — the signature checkpoint (banded + two
    # shingle join-backs) and the tagged checkpoint (small branch +
    # two grid sides) surface as ExistingRDD scans in the final plan,
    # and no window chain re-plan exists to reuse at all.
    capped_df = minhash_lsh_pairs(
        docs, "doc_id", "text", threshold=0.9, max_bucket=3
    )
    capped_df.collect()
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert plan.count("ExistingRDD") >= 4
    assert plan.count("Window") <= 1  # the count window, at most once

    def sim_pairset(max_bucket):
        return {
            (r["id_a"], r["id_b"])
            for r in simhash_near_pairs(
                docs, "doc_id", "text", max_hamming=3, max_bucket=max_bucket
            ).collect()
        }

    assert sim_pairset(3) == sim_pairset(10_000)


def test_srp_bucket_cap_preserves_pairs(spark):
    from python_mozetl_spark.ext.similarity import srp_near_dup_pairs

    rng = np.random.default_rng(13)
    dim = 8
    v = rng.standard_normal(dim)
    rows = [(i, (v * (1.0 + 0.001 * i)).tolist()) for i in range(10)]  # all cosine 1
    rows += [(100 + i, rng.standard_normal(dim).tolist()) for i in range(5)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def pairset(max_bucket):
        return {
            (r["id_a"], r["id_b"])
            for r in srp_near_dup_pairs(
                df, dim=dim, threshold=0.95, max_bucket=max_bucket
            ).collect()
        }

    capped = pairset(2)
    assert capped == pairset(10_000)
    assert {(a, b) for a in range(10) for b in range(10) if a < b} <= capped


def test_multimodal_features_deterministic(spark, docs):
    media = documents_as_media(docs.withColumn("doc_id", F.col("doc_id").cast("long")))
    out = {r["media_id"]: r for r in extract_features(media).collect()}
    text0 = DOCS[0][1]
    assert out[0]["n_bytes"] == len(text0.encode())
    assert out[0]["content_md5"] == hashlib.md5(text0.encode()).hexdigest()
    assert out[0]["head_hex"] == text0.encode()[:8].hex()


def test_decode_unknown_container_raises():
    # PNG needs zlib inflate — outside the dependency-free codec's
    # coverage, so it must fail loudly, not return garbage stats
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n")


def test_ngram_jaccard_pairs_finds_near_dup(docs):
    from python_mozetl_spark.ext.dedup import ngram_jaccard_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.8  # one-word edit
    assert not any(2 in p for p in pairs)


def test_ngram_jaccard_strategies_agree(spark):
    """The prefix-filter scale path and the dense-vocab bitmap/matmul
    path must produce identical pair sets (both claim exactness)."""
    from python_mozetl_spark.ext.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def run(strategy):
        return sorted(
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=0.7, strategy=strategy
            ).collect()
        )

    bitmap, prefix = run("bitmap"), run("prefix")
    assert bitmap == prefix
    assert len(bitmap) > 0  # planted near-dups exist at sf0.001


def test_spread_is_noop_on_well_partitioned_input(spark):
    import tempfile

    from python_mozetl_spark.session import spread

    # non-scan frames pass through untouched (planning-time policy:
    # anything post-shuffle already runs at shuffle.partitions, and
    # estimating them would force the .rdd conversion spread avoids)
    well = spark.range(1000).repartition(spark.sparkContext.defaultParallelism)
    assert spread(well) is well
    inmem = spark.range(1000).coalesce(1)
    assert spread(inmem) is inmem
    # a small single-file scan IS spread to full parallelism
    with tempfile.TemporaryDirectory() as d:
        spark.range(1000).coalesce(1).write.parquet(f"{d}/t")
        narrow = spark.read.parquet(f"{d}/t")
        assert (
            spread(narrow).rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism
        )


def test_srp_near_dup_matches_brute_force_on_planted_pairs(spark):
    from python_mozetl_spark.ext.similarity import (
        embedding_near_dup_pairs,
        srp_near_dup_pairs,
    )

    rng = np.random.default_rng(7)
    dim = 16
    base = rng.standard_normal((20, dim))
    rows = [(i, base[i].tolist()) for i in range(20)]
    # plant two near-identical copies of vector 0
    rows.append((100, (base[0] + 0.01 * rng.standard_normal(dim)).tolist()))
    rows.append((101, (base[0] * 1.5).tolist()))  # scaled: cosine 1.0
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(df, threshold=0.95).collect()
    }
    srp = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in srp_near_dup_pairs(df, dim=dim, threshold=0.95).collect()
    }
    assert (0, 100) in srp and (0, 101) in srp and (100, 101) in srp
    assert srp == brute  # exact recall at this threshold/band config


def _clustered_vectors(n_per=15, dim=8, n_clusters=3, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 3
    rows, idx = [], 0
    for c in range(n_clusters):
        for _ in range(n_per):
            rows.append((idx, (centers[c] + 0.3 * rng.standard_normal(dim)).tolist()))
            idx += 1
    return rows, centers


def test_ivf_topk_exact_when_probing_all_cells(spark):
    from python_mozetl_spark.ext.similarity import brute_force_topk, ivf_topk

    rows, centers = _clustered_vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.where(F.col("vec_id") < 5)
    exact = brute_force_topk(df, queries, k=3).collect()
    ivf = ivf_topk(df, queries, centers, k=3, nprobe=len(centers)).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    assert sorted([tuple(r) for r in ivf], key=lambda x: (x[0], x[3])) == sorted(
        [tuple(r) for r in exact], key=lambda x: (x[0], x[3])
    )
    del key


def test_ivf_topk_single_probe_high_recall_on_clustered_data(spark):
    from python_mozetl_spark.ext.similarity import brute_force_topk, ivf_topk

    rows, centers = _clustered_vectors()
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = df.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in brute_force_topk(df, queries, k=3).collect()}
    got = {(r["query_id"], r["neighbor_id"])
           for r in ivf_topk(df, queries, centers, k=3, nprobe=1).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8  # well-separated clusters: probe-1 nearly exact


def test_winnow_fingerprints_guarantee_and_edges(spark):
    """Winnowing guarantee: docs sharing a substring of length >=
    window + k - 1 share a fingerprint; short docs degrade to one/zero
    fingerprints; identical docs have identical fingerprint sets."""
    from python_mozetl_spark.ext.dedup import winnow_fingerprints

    shared = "a very long shared passage that is plenty of characters"
    rows = [
        (0, "prefix one " + shared + " suffix alpha"),
        (1, "totally different opening " + shared + " and closing"),
        (2, "no overlap with anything else at all here"),
        (3, "tiny"),  # < k chars -> no fingerprints
        (4, "exactly8"),  # one k-gram -> one fingerprint (global min)
        (5, "prefix one " + shared + " suffix alpha"),  # dup of 0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(df, "doc_id", "text", k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1]  # shared passage -> shared fingerprint
    assert not (by_doc[2] & by_doc[0])
    assert 3 not in by_doc
    assert len(by_doc[4]) == 1
    assert by_doc[5] == by_doc[0]  # identical docs, identical sets


def test_bounded_bucket_pairs_exactly_once_per_bucket(spark):
    """Pairs must appear exactly once per shared bucket (shared-bucket
    COUNTS depend on it), in both the small-bucket and chunk-grid
    paths."""
    from python_mozetl_spark.ext.dedup import bounded_bucket_pairs

    rows = [(b, i) for b in range(3) for i in range(7)]  # 3 buckets x 7 ids
    banded = spark.createDataFrame(rows, ["bucket", "id"]).select(
        "bucket", F.struct("id").alias("__p")
    )
    for cap in (10_000, 3):
        out = bounded_bucket_pairs(banded, "bucket", "__p", "id", cap).select(
            F.col("a.id").alias("x"), F.col("b.id").alias("y")
        )
        rows_out = [(r["x"], r["y"]) for r in out.collect()]
        assert all(x < y for x, y in rows_out)
        from collections import Counter

        counts = Counter(rows_out)
        # every unordered pair appears exactly once per bucket = 3 times
        assert set(counts.values()) == {3}, (cap, counts)
        assert len(counts) == 21  # C(7,2)


def test_kmv_sketch_accuracy_and_exact_below_k(spark):
    from python_mozetl_spark.ext.sketches import kmv_distinct

    rows = [("big", f"u{i}") for i in range(2000)]
    rows += [("small", f"v{i}") for i in range(20)] * 3  # dups collapse
    df = spark.createDataFrame(rows, ["g", "uid"])
    est = {r["g"]: r["est_distinct"] for r in
           kmv_distinct(df, "uid", ["g"], k=64).collect()}
    assert est["small"] == 20.0  # below k -> exact
    assert abs(est["big"] - 2000) / 2000 < 0.4  # ~3 sigma at k=64


def test_kmv_sketch_merges_exactly(spark):
    """k-min of a union == k-min of pooled per-part k-mins: merging
    day-level sketches must give bit-identical estimates to sketching
    the raw union."""
    from pyspark.sql import Window as W

    from python_mozetl_spark.ext.sketches import kmv_distinct, kmv_hashes

    rows = [("g", d, f"u{i}") for d in range(4) for i in range(300 + 50 * d)]
    df = spark.createDataFrame(rows, ["g", "day", "uid"])
    direct = kmv_distinct(df, "uid", ["g"], k=32).collect()[0]["est_distinct"]

    per_day = kmv_hashes(df, "uid", ["g", "day"], k=32)  # day-level sketches
    pooled = (
        per_day.select("g", "__h")
        .dropDuplicates(["g", "__h"])
        .withColumn("__rn", F.row_number().over(W.partitionBy("g").orderBy("__h")))
        .where(F.col("__rn") <= 32)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.max("__h").alias("kth"))
        .select(
            F.round(
                F.when(F.col("n") < 32, F.col("n").cast("double")).otherwise(
                    F.lit(31.0) / F.col("kth")
                ),
                4,
            ).alias("est")
        )
        .collect()[0]["est"]
    )
    assert pooled == direct


def test_hll_sketch_accuracy_and_union_merge(spark):
    from python_mozetl_spark.ext.sketches import hll_distinct, hll_merge

    rows = [("g", d, f"u{i}") for d in range(4) for i in range(500)]
    df = spark.createDataFrame(rows, ["g", "day", "uid"])
    est = hll_distinct(df, "uid", ["g"], lgk=12).collect()[0]["est_distinct"]
    assert abs(est - 500) / 500 < 0.05
    sketches = df.groupBy("g", "day").agg(
        F.hll_sketch_agg(F.col("uid"), F.lit(12)).alias("sk")
    )
    merged = hll_merge(sketches, "sk", ["g"]).collect()[0]["est_distinct"]
    assert merged == est  # same keys per day -> union estimate identical


def test_sample_frames_fanout_and_determinism(spark, docs):
    from python_mozetl_spark.ext.multimodal import documents_as_media, sample_frames

    media = documents_as_media(docs.withColumn("doc_id", F.col("doc_id").cast("long")))
    out = sample_frames(media, frame_bytes=16, every_n=2).collect()
    text0 = DOCS[0][1].encode()
    n_frames0 = (len(text0) + 15) // 16
    rows0 = sorted(r for r in out if r["media_id"] == 0)
    assert [r["frame_idx"] for r in rows0] == list(range(0, n_frames0, 2))
    assert rows0[0]["frame_md5"] == hashlib.md5(text0[:16]).hexdigest()
    assert all(r["frame_bytes"] <= 16 for r in out)


def test_connected_components_chains_and_islands(spark):
    from python_mozetl_spark.ext.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (20, 21), (21, 20)],
        ["id_a", "id_b"],
    )
    got = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    # the distributed min-label loop (gate disabled) must agree with
    # the driver union-find fast path exactly
    loop = {
        r["vertex"]: r["component"]
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    assert loop == got


def test_pack_sequences_invariants(spark):
    from python_mozetl_spark.ext.packing import pack_sequences

    rows = [(i, 1 + (i * 37) % 90) for i in range(40)] + [(100, 0)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tok"])
    out = pack_sequences(df, "n_tok", "doc_id", cap=128).collect()
    assert not any(r["doc_id"] == 100 for r in out)  # zero-token doc dropped
    # every chunk full except the last; per-doc chunk_tokens sums to n_tok
    by_chunk = {}
    by_doc = {}
    for r in out:
        by_chunk[r["chunk_id"]] = by_chunk.get(r["chunk_id"], 0) + r["chunk_tokens"]
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["chunk_tokens"]
    last = max(by_chunk)
    assert all(v == 128 for c, v in by_chunk.items() if c != last)
    assert 0 < by_chunk[last] <= 128
    total = sum(n for _, n in rows)
    assert sum(by_doc.values()) == total
    assert by_doc == {i: n for i, n in rows if n > 0}


def test_pack_sequences_tied_order_still_packs_exactly(spark):
    """ROWS-frame regression: tied order_col values must each get their
    own cumsum prefix, not a shared RANGE-peer total."""
    from python_mozetl_spark.ext.packing import pack_sequences

    # 6 docs, ALL with the same order key, 50 tokens each -> 300 tokens
    df = spark.createDataFrame([(7, 50)] * 6, ["k", "n_tok"])
    out = pack_sequences(df, "n_tok", "k", cap=128).collect()
    by_chunk = {}
    for r in out:
        by_chunk[r["chunk_id"]] = by_chunk.get(r["chunk_id"], 0) + r["chunk_tokens"]
    assert by_chunk[0] == 128 and by_chunk[1] == 128 and by_chunk[2] == 44
    assert sum(r["chunk_tokens"] for r in out) == 300


def test_sliding_window_chunks_rejects_gapped_stride(spark):
    import pytest as _pt

    from python_mozetl_spark.ext.packing import sliding_window_chunks

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pt.raises(ValueError):
        sliding_window_chunks(df, "doc_id", "text", window=10, stride=50)


def test_weighted_mix_epochs_and_determinism(spark):
    from python_mozetl_spark.ext.mixing import weighted_mix

    rows = [(i, "a" if i < 40 else ("b" if i < 80 else "c")) for i in range(120)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = weighted_mix(df, "source", "doc_id", {"a": 2.0, "b": 0.5})
    got = [(r["doc_id"], r["epoch"]) for r in out.collect()]
    a_rows = [g for g in got if g[0] < 40]
    b_rows = [g for g in got if 40 <= g[0] < 80]
    assert len(a_rows) == 80  # exactly 2 full epochs
    assert sorted({e for _, e in a_rows}) == [0, 1]
    assert 8 <= len(b_rows) <= 32  # ~50% of 40, deterministic hash
    assert not any(g[0] >= 80 for g in got)  # weight-0 source dropped
    again = [(r["doc_id"], r["epoch"]) for r in
             weighted_mix(df, "source", "doc_id", {"a": 2.0, "b": 0.5}).collect()]
    assert sorted(got) == sorted(again)  # retry-stable


def test_shuffle_shards_determinism_and_balance(spark):
    from python_mozetl_spark.ext.mixing import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(400)], ["doc_id"])
    a = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shards(df, "doc_id", 4).collect()}
    b = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shards(df, "doc_id", 4).collect()}
    assert a == b  # retry-stable: identical across runs
    by_shard = {}
    for _, s, p in a:
        by_shard.setdefault(s, []).append(p)
    # all 4 shards populated, roughly balanced (binomial fluctuation)
    assert set(by_shard) == {0, 1, 2, 3}
    assert all(50 <= len(v) <= 150 for v in by_shard.values())
    # positions are exactly 0..len-1 within each shard
    for v in by_shard.values():
        assert sorted(v) == list(range(len(v)))
    # a different salt produces a different permutation
    c = {(r["doc_id"], r["shard"], r["pos"])
         for r in shuffle_shards(df, "doc_id", 4, salt="other").collect()}
    assert c != a


def test_mg_candidates_superset_guarantee_on_skewed_stream(spark):
    """Misra-Gries candidate union must contain EVERY value with count
    > n/(k+1) regardless of partitioning — the property heavy_hitters'
    exactness rests on."""
    from python_mozetl_spark.ext.sketches import mg_candidates

    # zipf-ish: value i appears 400//(i+1) times, shuffled deterministically
    import hashlib

    rows = []
    for i in range(50):
        rows += [f"v{i}"] * (400 // (i + 1))
    # deterministic shuffle: Python's str hash is salted per process
    rows.sort(key=lambda s: hashlib.md5(s.encode()).hexdigest())
    df = spark.createDataFrame([(v,) for v in rows], ["tok"]).repartition(7)
    n, k = len(rows), 10
    cands = {r["tok"] for r in mg_candidates(df, "tok", k).collect()}
    from collections import Counter

    true = Counter(rows)
    for v, c in true.items():
        if c > n / (k + 1):
            assert v in cands, f"{v} (count {c}) missed at n/(k+1)={n/(k+1):.1f}"
    # and it actually prunes: far fewer candidates than distinct values
    assert len(cands) < len(true)


def test_heavy_hitters_exact_vs_brute_force(spark):
    from collections import Counter

    from python_mozetl_spark.ext.sketches import heavy_hitters

    rows = ["a"] * 50 + ["b"] * 30 + ["c"] * 15 + [f"x{i}" for i in range(25)]
    df = spark.createDataFrame([(v,) for v in rows], ["tok"]).repartition(5)
    got = {(r["tok"], r["cnt"]) for r in
           heavy_hitters(df, "tok", min_frac=0.1).collect()}
    n = len(rows)
    true = Counter(rows)
    want = {(v, c) for v, c in true.items() if c >= -(-n * 0.1 // 1)}
    assert got == want


def test_mg_candidates_rejects_non_string(spark):
    import pytest as _pt

    from python_mozetl_spark.ext.sketches import mg_candidates

    df = spark.createDataFrame([(1,)], ["tok"])
    with _pt.raises(ValueError, match="string column"):
        mg_candidates(df, "tok", 4)


def test_heavy_hitters_exact_boundary_not_lost_to_fp(spark):
    """0.1 * 120 = 12.000000000000002 in binary FP: a value occurring
    exactly 12/120 times sits exactly ON the threshold and must be
    kept (rational integer compare, not float ceil)."""
    from python_mozetl_spark.ext.sketches import heavy_hitters

    rows = ["edge"] * 12 + [f"f{i}" for i in range(108)]
    df = spark.createDataFrame([(v,) for v in rows], ["tok"]).repartition(3)
    got = {r["tok"]: r["cnt"] for r in
           heavy_hitters(df, "tok", min_frac=0.1).collect()}
    assert got == {"edge": 12}


# ---------------------------------------------------------------------------
# round 4: split assignment, length batching, cross-corpus LSH filter
# ---------------------------------------------------------------------------


def test_split_assign_partitions_and_determinism(spark):
    from python_mozetl_spark.ext.mixing import split_assign

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, "doc_id")
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    # md5 is uniform: 80/10/10 within binomial tolerance
    assert 1400 <= counts["train"] <= 1750
    # pure function of id: same rows on recompute, and growth-stable —
    # a subset keeps its assignments
    sub = split_assign(df.where(F.col("doc_id") < 500), "doc_id")
    full = {r["doc_id"]: r["split"] for r in out.where(F.col("doc_id") < 500).collect()}
    for r in sub.collect():
        assert full[r["doc_id"]] == r["split"]


def test_split_assign_rejects_bad_weights(spark):
    from python_mozetl_spark.ext.mixing import split_assign

    df = spark.range(10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        split_assign(df, "doc_id", splits=[("a", 0.5), ("b", 0.2)])


def test_length_bucketed_batches_shape(spark):
    from python_mozetl_spark.ext.packing import length_bucketed_batches

    rows = [(i, ln) for i, ln in enumerate([5, 7, 9, 12, 15, 30, 31, 100])]
    df = spark.createDataFrame(rows, ["doc_id", "n"])
    out = length_bucketed_batches(df, "doc_id", "n", [10, 50], batch_size=2)
    got = {r["doc_id"]: r for r in out.collect()}
    # bucket 0: lens 5,7,9 -> batches [5,7],[9]; bucket 1: 12,15,30,31;
    # bucket 2 (overflow): 100
    assert [got[i]["bucket"] for i in range(8)] == [0, 0, 0, 1, 1, 1, 1, 2]
    assert (got[0]["batch"], got[0]["batch_pos"]) == (0, 0)
    assert (got[1]["batch"], got[1]["batch_pos"]) == (0, 1)
    assert (got[2]["batch"], got[2]["batch_pos"]) == (1, 0)
    assert got[7]["batch"] == 0
    # ordering within bucket is by (len, id): doc 5 (len 30) before doc 6
    assert (got[5]["batch"], got[5]["batch_pos"]) == (1, 0)
    assert (got[6]["batch"], got[6]["batch_pos"]) == (1, 1)


def test_length_bucketed_batches_sharded_is_deterministic_and_bounded(spark):
    from python_mozetl_spark.ext.packing import length_bucketed_batches

    df = spark.range(300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97).alias("n")
    )
    out = length_bucketed_batches(df, "doc_id", "n", [50], batch_size=8, shards=4)
    assert "shard" in out.columns
    # every (bucket, shard, batch) group has <= batch_size members and
    # assignment is stable across recomputation
    sizes = out.groupBy("bucket", "shard", "batch").count().collect()
    assert all(r["count"] <= 8 for r in sizes)
    a = sorted((r["doc_id"], r["bucket"], r["shard"], r["batch"]) for r in out.collect())
    b = sorted((r["doc_id"], r["bucket"], r["shard"], r["batch"]) for r in out.collect())
    assert a == b


def test_cross_corpus_lsh_filter_matches_brute_force(spark):
    from python_mozetl_spark.ext.dedup import cross_corpus_lsh_filter
    from python_mozetl_spark.functions.text import word_shingles

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base, "train"),
        (2, base + " extra", "train"),          # near-dup of bench doc 11
        (3, "completely different text about spark plans", "train"),
    ]
    bench_rows = [
        (11, base + " extra", "bench"),          # exact dup of train 2
        (12, "unrelated benchmark prompt entirely", "bench"),
    ]
    df = spark.createDataFrame(rows + bench_rows, ["doc_id", "text", "side"])
    train = df.where(F.col("side") == "train")
    bench = df.where(F.col("side") == "bench")
    out = cross_corpus_lsh_filter(train, bench, "doc_id", "text", threshold=0.8)
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 2 is identical to bench 11 (jaccard 1.0); doc 1 shares most
    # shingles with 11 but misses the trailing ones
    assert 2 in got and got[2]["max_jaccard"] == 1.0 and got[2]["n_bench_dups"] == 1
    assert 3 not in got
    # brute-force cross check on the same fixture
    sh_t = train.select("doc_id", word_shingles("text").alias("sh"))
    sh_b = bench.select(F.col("doc_id").alias("bid"), word_shingles("text").alias("shb"))
    brute = (
        sh_t.crossJoin(sh_b)
        .withColumn(
            "j",
            F.size(F.array_intersect("sh", "shb")).cast("double")
            / (F.size("sh") + F.size("shb") - F.size(F.array_intersect("sh", "shb"))),
        )
        .where(F.col("j") >= 0.8)
        .groupBy("doc_id")
        .count()
    )
    assert {r["doc_id"] for r in brute.collect()} == set(got)


def test_cross_corpus_lsh_filter_shuffle_fallback_same_result(spark):
    from python_mozetl_spark.ext.dedup import cross_corpus_lsh_filter
    from python_mozetl_spark.plans.queries import t as load

    d = load(spark, "/root/testdata/sf0.001", "documents")
    bench_srcs = ["src15", "src16", "src17", "src18", "src19"]
    train = d.where(~F.col("source").isin(bench_srcs))
    bench = d.where(F.col("source").isin(bench_srcs))
    a = cross_corpus_lsh_filter(train, bench, "doc_id", "text", broadcast_bench=True)
    b = cross_corpus_lsh_filter(train, bench, "doc_id", "text", broadcast_bench=False)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pagerank_matches_reference_loop(spark):
    from python_mozetl_spark.ext.graph import pagerank

    # weighted symmetric triangle with one heavier edge
    edges = [("a", "b", 2.0), ("b", "a", 2.0),
             ("b", "c", 1.0), ("c", "b", 1.0),
             ("a", "c", 1.0), ("c", "a", 1.0)]
    df = spark.createDataFrame(edges, ["s", "d", "w"])
    got = {r["vertex"]: r["rank"] for r in
           pagerank(df, "s", "d", weight="w", iterations=3).collect()}

    # plain-python reference of the same recurrence
    nodes = ["a", "b", "c"]
    out_w = {"a": 3.0, "b": 3.0, "c": 2.0}
    r = {v: 1 / 3 for v in nodes}
    for _ in range(3):
        inflow = {v: 0.0 for v in nodes}
        for s, d, w in edges:
            inflow[d] += (w / out_w[s]) * r[s]
        r = {v: 0.15 / 3 + 0.85 * inflow[v] for v in nodes}
    for v in nodes:
        assert got[v] == pytest.approx(round(r[v], 6), abs=1e-6)
    # symmetric graph, no dangling mass: ranks stay a distribution
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_bigram_lm_known_probabilities(spark):
    from python_mozetl_spark.plans.queries import REGISTRY  # noqa: F401  (query form tested at sf)
    from pyspark.sql import Window  # noqa: F401

    # corpus: "a b", "a b", "a c" -> P(b|a)=2/3, P(c|a)=1/3
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"]
    )
    from python_mozetl_spark.functions import text as T

    grams = df.select(T.tokens("text").alias("__toks")).select(
        F.explode(T.all_shingles_from_tokens(F.col("__toks"), 2)).alias("gram")
    )
    counts = {r["gram"]: r["count"] for r in grams.groupBy("gram").count().collect()}
    assert counts == {"a b": 2, "a c": 1}


def test_weighted_sample_deterministic_and_weight_biased(spark):
    import hashlib
    import math

    from python_mozetl_spark.operators.sample import weighted_sample

    rows = [(i, 1000 if i < 10 else 1) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    out = weighted_sample(df, "doc_id", "w", k=10, salt="t")
    ids = sorted(r["doc_id"] for r in out.collect())
    # recompute is identical
    ids2 = sorted(r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=10, salt="t").collect())
    assert ids == ids2
    # 10 docs carry 1000x the weight of the other 490; expect most of
    # the top-10 to be heavy (each heavy doc ~95% likely above any
    # given light doc)
    assert sum(1 for i in ids if i < 10) >= 7
    # key formula matches the python-side md5 construction exactly
    # (at the 6dp precision the operator compares at — raw ln ulps
    # differ across libms, which is why the key is rounded)
    r0 = out.orderBy("__wkey").first()
    h = int(hashlib.md5(f"t|{r0['doc_id']}".encode()).hexdigest()[:15], 16)
    u = (h % 1_000_000 + 0.5) / 1_000_000
    assert r0["__wkey"] == round(-math.log(u) / r0["w"], 6)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from python_mozetl_spark.operators.sample import weighted_sample

    df = spark.createDataFrame([(1, 0), (2, -5), (3, 10)], ["doc_id", "w"])
    got = [r["doc_id"] for r in weighted_sample(df, "doc_id", "w", k=10).collect()]
    assert got == [3]


def test_decode_image_bmp_ppm_paths():
    """The dependency-free codec: BMP stride padding, 32-bit alpha
    exclusion, top-down orientation, P6 comments — each a distinct
    byte-layout trap."""
    import struct

    from python_mozetl_spark.ext.multimodal import decode_image, encode_bmp

    # 3x2 gradient: stride = 12 for w=3 (9 data + 3 pad bytes/row)
    bmp = encode_bmp(3, 2, lambda x, y: 10 * y + x)
    d = decode_image(bmp)
    assert (d["width"], d["height"], d["channels"], d["n_pixels"]) == (3, 2, 3, 6)
    # channel bytes: rows y=0: 0,1,2; y=1: 10,11,12 → sum*3 channels
    assert d["pixel_sum"] == 3 * (0 + 1 + 2 + 10 + 11 + 12)

    # top-down BMP (negative height) must decode identically
    neg = bytearray(bmp)
    struct.pack_into("<i", neg, 22, -2)
    # rows are stored flipped, but the stats are orientation-invariant
    assert decode_image(bytes(neg))["pixel_sum"] == d["pixel_sum"]

    # 32-bit BGRA: alpha byte (0xFF) must NOT leak into pixel_sum
    def bmp32(width, height, val):
        stride = width * 4
        px = bytes()
        for _ in range(height):
            px += bytes((val, val, val, 0xFF)) * width
        hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
        info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 32, 0,
                           len(px), 2835, 2835, 0, 0)
        return hdr + info + px

    d32 = decode_image(bmp32(2, 2, 7))
    assert d32["pixel_sum"] == 7 * 3 * 4 and d32["channels"] == 3

    # P6 with a header comment
    ppm = b"P6\n# synthetic\n2 1\n255\n" + bytes((1, 2, 3, 4, 5, 6))
    dp = decode_image(ppm)
    assert (dp["width"], dp["height"], dp["pixel_sum"]) == (2, 1, 21)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_image(b"GIF89a....")
    with _pytest.raises(ValueError):
        decode_image(b"P5\n2 1\n255\n" + bytes(2))  # grayscale pgm: not P6


def test_synth_decode_roundtrip_matches_formula(spark, docs):
    from python_mozetl_spark.ext.multimodal import decode_features, synth_doc_bmps

    docs = docs.withColumn("n_chars", F.length("text"))
    out = {r["media_id"]: r for r in decode_features(synth_doc_bmps(docs)).collect()}
    for r in docs.select("doc_id", "n_chars").collect():
        got = out[r["doc_id"]]
        w, h, base = r["n_chars"] % 16 + 1, r["doc_id"] % 8 + 1, r["doc_id"] * 37 % 256
        assert got["width"] == w and got["height"] == h
        assert got["pixel_sum"] == 3 * h * sum((base + x) % 256 for x in range(w))


def test_log_histogram_quantile_error_bound_and_merge(spark):
    """The sketch's two contracts (ext/sketches.py:log_histogram): the
    quantile estimate is within 2^-subbits relative of (and never
    above) the exact order statistic, and merging per-batch histograms
    equals the single-pass histogram exactly."""
    from python_mozetl_spark.ext.sketches import (
        histogram_quantiles,
        log_histogram,
        merge_histograms,
    )

    vals = [((i * 7919) % 100003) + 1 for i in range(2000)]  # skewed-ish longs
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    hist = log_histogram(df, "v")
    out = {
        r["q"]: r["est"]
        for r in histogram_quantiles(hist, [0.5, 0.9, 0.99]).collect()
    }
    import math

    sv = sorted(vals)
    for q in (0.5, 0.9, 0.99):
        exact = sv[math.ceil(q * len(sv)) - 1]
        est = out[q]
        assert est <= exact
        assert est >= exact * (1 - 2 ** -5) - 1

    halves = [df.where(F.col("v") % 2 == 0), df.where(F.col("v") % 2 == 1)]
    merged = merge_histograms([log_histogram(h, "v") for h in halves])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, hist.collect())
    )


def test_duplicated_span_coverage_interval_union(spark):
    """Planted boilerplate: a 6-token run shared by two docs yields
    three duplicated 4-gram windows whose interval UNION (not sum) is
    the covered length; a unique doc stays at zero
    (ext/dedup.py:duplicated_span_coverage)."""
    from python_mozetl_spark.ext.dedup import duplicated_span_coverage

    shared = "s1 s2 s3 s4 s5 s6"
    df = spark.createDataFrame(
        [
            (1, shared + " u1 u2"),       # 8 toks, dup windows at pos 1-3
            (2, "v1 " + shared),          # 7 toks, dup windows at pos 2-4
            (3, "x1 x2 x3 x4 x5"),        # unique
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicated_span_coverage(df, n=4).collect()}
    assert out[1]["dup_grams"] == 3 and out[1]["covered_toks"] == 6
    assert out[1]["dup_frac"] == 0.75
    assert out[2]["dup_grams"] == 3 and out[2]["covered_toks"] == 6
    assert out[2]["dup_frac"] == round(6 / 7, 4)
    assert out[3]["dup_grams"] == 0 and out[3]["covered_toks"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_duplicated_span_coverage_within_doc_repeat_not_dup(spark):
    """A gram repeated only WITHIN one document is not cross-doc
    duplication (min==max over the gram hash)."""
    from python_mozetl_spark.ext.dedup import duplicated_span_coverage

    df = spark.createDataFrame(
        [(1, "r1 r2 r3 r4 z r1 r2 r3 r4"), (2, "q1 q2 q3 q4 q5")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in duplicated_span_coverage(df, n=4).collect()}
    assert out[1]["dup_grams"] == 0 and out[2]["dup_grams"] == 0


def test_lloyd_clusters_deterministic_and_separates_planted_blobs(spark):
    """Fixed-init Lloyd's finds two well-separated planted blobs and is
    run-to-run deterministic (ext/similarity.py:lloyd_clusters)."""
    from python_mozetl_spark.ext.similarity import lloyd_clusters

    rng = np.random.RandomState(5)
    a = rng.randn(10, 4) * 0.05 + np.array([5.0, 0, 0, 0])
    b = rng.randn(10, 4) * 0.05 + np.array([-5.0, 0, 0, 0])
    rows = [(i, [float(x) for x in a[i]]) for i in range(10)]
    rows += [(10 + i, [float(x) for x in b[i]]) for i in range(10)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out1 = {r["vec_id"]: r["cluster"] for r in
            lloyd_clusters(df, k=2, iters=2).collect()}
    out2 = {r["vec_id"]: r["cluster"] for r in
            lloyd_clusters(df, k=2, iters=2).collect()}
    assert out1 == out2
    blob_a = {out1[i] for i in range(10)}
    blob_b = {out1[10 + i] for i in range(10)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_lloyd_clusters_empty_cluster_keeps_position(spark):
    """A centroid that captures no members keeps its previous position
    instead of crashing or going null (the coalesce branch mirrored in
    the SQL oracle)."""
    from python_mozetl_spark.ext.similarity import lloyd_clusters

    # ids 0,1,2 init the 3 centroids; every point is nearest centroid 0
    # or 1 after the first update, starving centroid 2
    rows = [(i, [float(i % 2), 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = lloyd_clusters(df, k=3, iters=2)
    assert out.count() == 8
    assert {r["cluster"] for r in out.collect()} <= {0, 1, 2}


def test_kmv_overlap_exact_below_k_and_estimates_above(spark):
    """KMV overlap algebra (ext/sketches.py:kmv_overlap): below k the
    pooled sketch is the exact union, so jaccard/union/intersection
    are exact; above k the estimates land within the sketch's standard
    error of the planted truth."""
    from python_mozetl_spark.ext.sketches import kmv_overlap

    # exact regime: two groups of 30/40 with 20 shared, k=64
    rows = [("a", f"u{i}") for i in range(30)]
    rows += [("b", f"u{i}") for i in range(10, 50)]
    df = spark.createDataFrame(rows, ["g", "u"])
    r = kmv_overlap(df, "u", "g", k=64).collect()[0]
    assert r["est_union"] == 50.0
    assert r["est_jaccard"] == round(20 / 50, 6)
    assert r["est_inter"] == 20.0

    # estimate regime: 2000/2000 with 1000 shared (true union 3000,
    # jaccard 1/3); k=256 -> se ~ 1/sqrt(254) ~ 6%
    big = [("a", f"x{i}") for i in range(2000)]
    big += [("b", f"x{i}") for i in range(1000, 3000)]
    r = kmv_overlap(spark.createDataFrame(big, ["g", "u"]), "u", "g", k=256)
    row = r.collect()[0]
    assert abs(row["est_union"] - 3000) / 3000 < 0.2
    assert abs(row["est_jaccard"] - 1 / 3) < 0.1


def test_weighted_log_histogram_equals_expanded_rows(spark):
    """A weighted histogram is exactly the row-per-unit expansion:
    same buckets, same counts, same quantile read-out
    (ext/sketches.py:log_histogram weight_col)."""
    from python_mozetl_spark.ext.sketches import (
        histogram_quantiles,
        log_histogram,
    )

    rows = [(5, 3), (70, 2), (900, 4), (901, 1)]
    wdf = spark.createDataFrame(rows, ["v", "w"])
    edf = spark.createDataFrame(
        [(v,) for v, w in rows for _ in range(w)], ["v"]
    )
    wh = log_histogram(wdf, "v", weight_col="w")
    eh = log_histogram(edf, "v")
    assert sorted(map(tuple, wh.collect())) == sorted(map(tuple, eh.collect()))
    wq = sorted(map(tuple, histogram_quantiles(wh, [0.5, 0.9]).collect()))
    eq = sorted(map(tuple, histogram_quantiles(eh, [0.5, 0.9]).collect()))
    assert wq == eq


def test_decode_audio_wav_paths():
    """RIFF chunk walking: roundtrip, odd-size pad alignment, unknown
    chunks skipped, stereo counted per channel, non-PCM rejected."""
    import struct

    import pytest

    from python_mozetl_spark.ext.multimodal import decode_audio, encode_wav

    samples = [0, 100, -100, 2047, -2048, 7]
    d = decode_audio(encode_wav(16000, samples))
    assert d == {
        "sample_rate": 16000, "channels": 1, "n_samples": 6,
        "sum_abs": sum(abs(s) for s in samples),
        "peak": 2048,
    }

    # hand-build: LIST chunk with ODD size (pad byte) BEFORE fmt/data,
    # stereo 16-bit
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    data = struct.pack("<4h", 10, -20, 30, -40)  # 2 frames x 2 channels
    odd = b"x" * 3
    blob = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", len(odd)) + odd + b"\x00"  # pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    d2 = decode_audio(blob)
    assert d2 == {"sample_rate": 8000, "channels": 2, "n_samples": 2,
                  "sum_abs": 100, "peak": 40}

    with pytest.raises(ValueError):
        decode_audio(b"OggS" + b"\x00" * 40)
    ulaw = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)  # mu-law
    with pytest.raises(ValueError):
        decode_audio(
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(ulaw)) + ulaw
            + b"data" + struct.pack("<I", 0)
        )


def test_audio_features_permissive_nulls(spark):
    from python_mozetl_spark.ext.multimodal import audio_features, encode_wav

    rows = [
        (1, encode_wav(8000, [5, -5])),
        (2, b"not audio at all"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in audio_features(df).collect()}
    assert out[1]["sum_abs"] == 10 and out[1]["sample_rate"] == 8000
    assert out[2]["sum_abs"] is None and out[3]["peak"] is None


def test_incremental_lsh_equals_full_run(spark):
    """Incremental near-dup maintenance: (base-run pairs) + (increment
    pairs touching a new doc) == full-corpus pairs, with the old x old
    re-pairing provably absent from the increment."""
    from python_mozetl_spark.ext.dedup import (
        incremental_lsh_pairs,
        minhash_lsh_pairs,
        minhash_signature_table,
    )

    base_txt = "the quick brown fox jumps over the lazy dog again and again"
    rows_old = [
        (1, base_txt),
        (2, base_txt + " tail"),                # near-dup of 1 (old x old)
        (3, "completely different words here about spark plans"),
    ]
    rows_new = [
        (4, base_txt),                          # near-dup of 1 and 2 (new x old)
        (5, "completely different words here about spark plans ok"),  # ~3
        (6, base_txt),                          # dup of 1/2/4 (new x new with 4)
    ]
    old = spark.createDataFrame(rows_old, "doc_id bigint, text string")
    new = spark.createDataFrame(rows_new, "doc_id bigint, text string")
    full = spark.createDataFrame(rows_old + rows_new, "doc_id bigint, text string")

    kw = dict(threshold=0.5, num_hashes=16, bands=8)
    base_pairs = {(r["id_a"], r["id_b"])
                  for r in minhash_lsh_pairs(old, "doc_id", "text", **kw).collect()}
    sigs = minhash_signature_table(old, "doc_id", "text", num_hashes=16)
    inc_pairs_df, combined = incremental_lsh_pairs(
        sigs, new, "doc_id", "text", **kw
    )
    inc_pairs = {(r["id_a"], r["id_b"]) for r in inc_pairs_df.collect()}
    full_pairs = {(r["id_a"], r["id_b"])
                  for r in minhash_lsh_pairs(full, "doc_id", "text", **kw).collect()}

    assert base_pairs | inc_pairs == full_pairs
    assert all(a >= 4 or b >= 4 for a, b in inc_pairs)  # no old x old
    assert base_pairs & inc_pairs == set()
    # the returned signature table serves the NEXT increment
    assert combined.count() == 6 and "mh_0" in combined.columns


def test_leakage_safe_split_clusters_never_straddle(spark):
    from python_mozetl_spark.ext.mixing import leakage_safe_split, split_assign

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 11)], ["doc_id", "text"]
    )
    # two clusters: {1,2,3} (transitively via 1-2, 2-3) and {7,8};
    # the rest are singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    rows = {r["doc_id"]: r for r in
            leakage_safe_split(docs, pairs, "doc_id").collect()}
    assert len(rows) == 10
    # whole cluster shares the min-id representative AND its split
    assert {rows[i]["rep_id"] for i in (1, 2, 3)} == {1}
    assert len({rows[i]["split"] for i in (1, 2, 3)}) == 1
    assert {rows[i]["rep_id"] for i in (7, 8)} == {7}
    assert len({rows[i]["split"] for i in (7, 8)}) == 1
    # singletons: own rep, and the split equals plain split_assign on
    # their own id (growth-stability contract preserved)
    plain = {r["doc_id"]: r["split"]
             for r in split_assign(docs, "doc_id").collect()}
    for i in (4, 5, 6, 9, 10):
        assert rows[i]["rep_id"] == i
        assert rows[i]["split"] == plain[i]
