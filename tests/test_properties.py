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
