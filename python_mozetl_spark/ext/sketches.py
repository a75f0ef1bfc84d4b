"""Cardinality sketches for training-data pipelines.

Two tiers:

- :func:`kmv_distinct` — K-Minimum-Values sketch (Bar-Yossef et al.,
  RANDOM'02) built on the repo's md5 hash family: per group keep the
  ``k`` smallest distinct normalized hashes; estimate = (k−1)/h_(k).
  Because md5 is bit-identical everywhere, the ESTIMATE itself is
  deterministic and oracle-checkable — the same trick that made the
  DP Laplace noise gradable (operators/privacy.py).  Bounded memory
  (k values per group), one shuffle, and exactly mergeable: the k-min
  of a union is the k-min of the pooled k-mins (pytest-pinned).
- :func:`hll_distinct` — Spark's native DataSketches HLL
  (``hll_sketch_agg``): the production path when cross-engine
  determinism is not needed (smaller state, streaming-mergeable via
  ``hll_union_agg``); accuracy pytest-pinned, no SQL oracle by nature.

The scale story both share: pre-aggregate sketches per partition/day,
merge later — distinct-count reaggregation without re-scanning, which
COUNT(DISTINCT) can never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from python_mozetl_spark.functions import hashing as H

# normalize 60-bit md5 prefixes into (0, 1]: the KMV estimator needs
# uniform (0,1) hashes; 2^60 is exactly representable in a double
_KMV_SCALE = float(1 << 60)


def kmv_hashes(df: DataFrame, key_col: str, group_cols: list[str], k: int) -> DataFrame:
    """The sketch proper: per group, the ``k`` smallest DISTINCT
    normalized md5 hashes of ``key_col`` — (group..., __h, __rn)."""
    hashed = df.select(
        *group_cols, (H.md5_int64(F.col(key_col)) / F.lit(_KMV_SCALE)).alias("__h")
    ).dropDuplicates([*group_cols, "__h"])
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return hashed.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") <= k)


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Per-group distinct-count estimate from the KMV sketch.

    Exact below ``k`` (the sketch holds every hash), (k−1)/h_(k) at or
    above it — standard deviation ≈ 1/√(k−2).  One shuffle on the
    group key; per-group state is ``k`` doubles however large the
    group (the window top-k is a partial top-k per map task first, so
    no group ever materializes fully).
    """
    sk = kmv_hashes(df, key_col, group_cols, k)
    agg = sk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("__n"), F.max("__h").alias("__kth")
    )
    est = (
        F.when(F.col("__n") < k, F.col("__n").cast("double"))
        .otherwise(F.lit(float(k - 1)) / F.col("__kth"))
    )
    return agg.select(*group_cols, F.round(est, 4).alias(estimate_col))


def hll_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    lgk: int = 12,
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Per-group distinct estimate via Spark's DataSketches HLL — the
    production sketch (engine-internal, so pytest-pinned accuracy
    rather than a SQL oracle)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(key_col), F.lit(lgk))
        ).alias(estimate_col)
    )


def hll_merge(
    sketches: DataFrame,
    sketch_col: str,
    group_cols: list[str],
    estimate_col: str = "est_distinct",
) -> DataFrame:
    """Merge pre-aggregated HLL sketch blobs (e.g. one per day) up to a
    coarser grouping — the reaggregation path: distinct counts over any
    date range without touching raw data."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias(estimate_col)
    )


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries frequent-item candidates.

    Each partition maintains at most ``k`` counters over its stream of
    values (batch-merged: add a batch's value_counts, then subtract
    the (k+1)-th largest counter from all and drop non-positives —
    each reduction subtracts at most its decrement from any item's
    true partition count, total error ≤ n_p/(k+1)).  The UNION of the
    per-partition survivor sets is therefore a SUPERSET of every value
    with global count > n/(k+1): if an item fell out everywhere, its
    count would be ≤ Σ n_p/(k+1) = n/(k+1) (pigeonhole over
    partitions).  Output: distinct candidate values, ≤ k per
    partition.

    This is the candidate-pruning half of :func:`heavy_hitters`; on
    its own it is approximate and partitioning-dependent (so it is
    pytest-guaranteed, not oracle-graded).
    """
    return (
        _mg_scan(df, col, k)
        .where(F.col(col).isNotNull())
        .select(col)
        .distinct()
    )


def _mg_scan(df: DataFrame, col: str, k: int) -> DataFrame:
    """One pass emitting, per partition, the MG survivor values (rows
    with ``__part_n`` null) plus ONE partition-total row (``col`` null,
    ``__part_n`` = partition row count) — so candidate pruning and the
    global total come out of the same scan."""
    import pandas as pd

    if k < 1:
        raise ValueError("k must be >= 1")
    if dict(df.dtypes).get(col) != "string":
        raise ValueError("mg_candidates expects a string column "
                         "(cast first; the sketch schema is static)")

    def run(batches):
        counters = pd.Series(dtype="int64")
        n_part = 0
        for b in batches:
            n_part += len(b)
            vc = b[col].dropna().value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > k:
                cut = counters.nlargest(k + 1).iloc[-1]
                counters = counters - cut
                counters = counters[counters > 0]
        vals = [str(v) for v in counters.index]
        yield pd.DataFrame(
            {col: vals + [None], "__part_n": [None] * len(vals) + [n_part]}
        )

    return df.select(col).mapInPandas(run, f"{col} string, __part_n long")


def heavy_hitters(
    df: DataFrame,
    col: str,
    min_frac: float,
    k_margin: int = 4,
) -> DataFrame:
    """EXACT heavy hitters at scale: all values of ``col`` occurring in
    at least ``min_frac`` of rows, via two passes —

    1. Misra-Gries candidate pruning with ``k = k_margin·⌈1/min_frac⌉``
       counters per partition (superset guarantee: nothing at or above
       the threshold can be missed, since min_frac·n > n/(k+1));
    2. exact counts of the CANDIDATES only (broadcast semi-join) and
       the threshold filter.

    TWO scans of ``df`` total: the global row count rides on pass 1
    (one partition-total row per partition from the same mapInPandas;
    the tiny sketch output — ≤ (k+1)·partitions rows — is persisted so
    candidates and total don't re-trigger the scan).  The threshold
    compare is exact integer arithmetic (``cnt·den ≥ num·n`` with
    ``num/den = Fraction(min_frac)``), not float ``ceil`` — FP excess
    in ``0.1·120 = 12.000000000000002`` must not drop a value sitting
    exactly on the boundary.

    The output is exact and partitioning-independent — the oracle is a
    plain group-count filter — while pass 2's aggregation cardinality
    is bounded by candidates × partitions instead of |vocabulary|
    (the difference between counting 30 candidate tokens and
    billion-hapax web vocab at 100 TB).

    Returns ``(col, cnt)``.
    """
    from fractions import Fraction

    if not (0 < min_frac <= 1):
        raise ValueError("min_frac must be in (0, 1]")
    frac = Fraction(str(min_frac))
    num, den = frac.numerator, frac.denominator
    k = k_margin * (den // num + 1)
    # persist the tiny sketch output (≤ (k+1)·partitions rows) so the
    # candidate branch and the total branch share ONE scan of df; the
    # cache lives until evicted/app end — the cost of two-pass truth
    # with a lazily-consumed result
    sketch = _mg_scan(df, col, k).persist()
    cands = sketch.where(F.col(col).isNotNull()).select(col).distinct()
    total = sketch.agg(F.sum("__part_n").cast("bigint").alias("__n"))
    return (
        df.join(F.broadcast(cands), col)
        .groupBy(col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cnt") * den >= F.lit(num) * F.col("__n"))
        .drop("__n")
    )


# --------------------------------------------------------------------------
# Log-bucketed histogram quantiles (mergeable, integer-exact)
# --------------------------------------------------------------------------
# The production shape for quantiles over 100 TB: exact percentiles
# (A12's percentile()) need a full sort or a per-group collect of the
# whole column; a t-digest/KLL sketch is mergeable but its bucket
# boundaries depend on float accumulation order, so two engines (or two
# runs) disagree in the last ulp and the result is not oracle-checkable.
# This sketch keeps the mergeable histogram shape but makes the bucket
# function PURE INTEGER: for a non-negative long v,
#
#   L      = bit_length(v)            (length of the binary string)
#   shift  = max(0, L - (subbits+1))
#   bucket = (v >> shift) << shift    (zero the low bits)
#
# Values below 2^(subbits+1) are their own bucket (exact region);
# above it each octave splits into 2^subbits sub-buckets, so the
# bucket lower bound under-estimates v by at most 2^-subbits
# relative (3.1% at the default subbits=5).  bit_length via the
# binary-string length and the shifts are exact integer ops in Spark
# (bin/shiftright/shiftleft) AND DuckDB (printf('%b'), >>, <<), which
# is what lets the graded query hash-match cross-engine.
#
# State per group is at most 32*64 + 64 buckets — O(1) however large
# the group; histograms merge by SUMMING counts on the bucket key
# (associative + commutative, so partial aggregation and cross-batch
# reaggregation are free), and the quantile read-out is a window
# cumsum over the |buckets|-sized frame.


def log_bucket(value_col: str, subbits: int = 5):
    """The bucket lower bound of a non-negative integral column, as a
    Column expression (codegen-able, no Python)."""
    L = f"length(bin({value_col}))"
    shift = f"greatest(0, {L} - {subbits + 1})"
    return F.expr(f"shiftleft(shiftright({value_col}, {shift}), {shift})")


def log_histogram(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    subbits: int = 5,
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group bucket histogram: (group..., bucket_lo, cnt).

    One partial+final hash-agg pair on (group, bucket) — the map-side
    combine collapses each partition to its live buckets before the
    exchange, so shuffle volume is bucket-bounded, not row-bounded.
    Requires ``value_col`` >= 0 (money-in-cents, counts, latencies).

    ``weight_col`` makes it a WEIGHTED histogram (each row counts
    ``weight`` times; e.g. value = doc length bucket, weight = token
    count): quantiles then cut the weighted mass.  Weights must be
    non-negative integers to keep the state exact-mergeable — a
    weighted histogram equals the expanded row-per-unit histogram
    (pytest-pinned).
    """
    group_cols = list(group_cols or [])
    cnt = (
        F.sum(weight_col).cast("long")
        if weight_col
        else F.count(F.lit(1))
    )
    return (
        df.select(
            *group_cols,
            log_bucket(value_col, subbits).alias("bucket_lo"),
            *([weight_col] if weight_col else []),
        )
        .groupBy(*group_cols, "bucket_lo")
        .agg(cnt.alias("cnt"))
    )


def merge_histograms(
    hists: list[DataFrame], group_cols: list[str] | None = None
) -> DataFrame:
    """Sum counts on the bucket key: the cross-batch / cross-shard
    reaggregation path (exact — integer counts, integer buckets)."""
    group_cols = list(group_cols or [])
    merged = hists[0]
    for h in hists[1:]:
        merged = merged.unionByName(h)
    return merged.groupBy(*group_cols, "bucket_lo").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def histogram_quantiles(
    hist: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile read-out: (group..., q, est) where ``est`` is the lower
    bound of the first bucket whose cumulative count reaches
    ``ceil(q * N)`` — the rank-based lower quantile, under-estimating
    the exact order statistic by < 2^-subbits relative.

    Runs entirely on the bucket-sized frame: one cumsum window + one
    min-aggregate per (group, q); the raw stream never re-enters.
    """
    group_cols = list(group_cols or [])
    w = Window.partitionBy(*group_cols).orderBy("bucket_lo")
    tot = Window.partitionBy(*group_cols)
    cum = hist.select(
        *group_cols,
        "bucket_lo",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(tot).alias("n"),
    )
    qf = F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q")
    hit = cum.select(*group_cols, "bucket_lo", "cum", "n", qf).where(
        F.col("cum") >= F.ceil(F.col("q") * F.col("n"))
    )
    return hit.groupBy(*group_cols, "q").agg(
        F.min("bucket_lo").alias("est"), F.first("n").alias("n")
    )


def kmv_overlap(
    df: DataFrame, key_col: str, group_col: str, k: int = 64
) -> DataFrame:
    """Pairwise set-OVERLAP estimates between groups from KMV sketch
    algebra (Beyer et al., SIGMOD'07) — jaccard / distinct-union /
    distinct-intersection per group pair without ever shuffling the
    raw key sets against each other.

    Per group: the k smallest distinct md5 hashes (same sketch as
    :func:`kmv_distinct`, kept as exact integers).  Per pair: pool the
    two sketches, keep the k smallest of the distinct union — a valid
    KMV sketch of the union — then
    ``jaccard ≈ |pooled ∩ both sketches| / |pooled|`` and
    ``union ≈ (k−1)·2^60 / h_k`` (exact counts when BOTH groups'
    sketches hold their whole sets — tracked via a per-group distinct
    count, because a pooled union of exactly k hashes is ambiguous on
    size alone).  Because the hash family is md5, every estimate is
    deterministic and oracle-checkable.

    Scale shape: one raw-stream exchange (the per-group top-k window);
    the pair join runs on |groups| k-length arrays.
    """
    hashed = df.select(
        F.col(group_col), H.md5_int64(F.col(key_col)).alias("__h")
    ).dropDuplicates([group_col, "__h"])
    # distinct-count tag rides the SAME group exchange as the top-k
    # window: it discriminates "sketch holds the whole set" (exact)
    # from "sketch truncated at k" — a pooled union of exactly k
    # hashes is ambiguous on size alone
    w = Window.partitionBy(group_col).orderBy("__h")
    wcnt = Window.partitionBy(group_col)
    sk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .withColumn("__nd", F.count(F.lit(1)).over(wcnt))
        .where(F.col("__rn") <= k)
        .groupBy(group_col)
        .agg(
            F.sort_array(F.collect_list("__h")).alias("__hs"),
            F.max("__nd").alias("__nd"),
        )
    )
    pairs = sk.alias("a").join(
        sk.alias("b"), F.col(f"a.{group_col}") < F.col(f"b.{group_col}")
    )
    un = F.array_sort(F.array_union(F.col("a.__hs"), F.col("b.__hs")))
    pooled = F.when(F.size(un) > k, F.slice(un, 1, k)).otherwise(un)
    staged = pairs.select(
        F.col(f"a.{group_col}").alias("group_a"),
        F.col(f"b.{group_col}").alias("group_b"),
        F.col("a.__hs").alias("__ha"),
        F.col("b.__hs").alias("__hb"),
        pooled.alias("__ku"),
        F.size(un).alias("__nu"),
        ((F.col("a.__nd") <= k) & (F.col("b.__nd") <= k)).alias("__exact"),
    )
    both = F.filter(
        F.col("__ku"),
        lambda x: F.array_contains("__ha", x) & F.array_contains("__hb", x),
    )
    jac = F.size(both) / F.size("__ku").cast("double")
    # exact only when BOTH sides' sketches hold their whole sets (then
    # the pooled distinct union is the true union count); a truncated
    # side whose pooled union lands at exactly k must fall through to
    # the estimator (nu < k implies both exact, so __ku has k elements
    # whenever the estimator branch runs)
    union_est = F.when(
        F.col("__exact"), F.col("__nu").cast("double")
    ).otherwise(
        F.lit(float(k - 1) * float(1 << 60))
        / F.element_at("__ku", k).cast("double")
    )
    return staged.select(
        "group_a",
        "group_b",
        F.round(jac, 6).alias("est_jaccard"),
        F.round(union_est, 2).alias("est_union"),
        F.round(jac * union_est, 2).alias("est_inter"),
    )


def cm_bucket_structs(key_col: str, width: int, depth: int):
    """The CM addressing expression shared by the batch build, the
    point-query probe, and the streaming twin: ``depth`` structs
    ``(d, bucket)`` with ``bucket = md5('cm{d}|' || key) % width``."""
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    H.md5_int64(F.col(key_col).cast("string"), salt=f"cm{d}|")
                    % width
                ).alias("bucket"),
            )
            for d in range(depth)
        ]
    )


def cm_sketch(
    df: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005) of the
    frequency distribution of ``key_col``: counter rows
    ``(d, bucket, cnt)`` — ``depth`` independent md5-salted hash rows
    of ``width`` counters each.

    Built pre-aggregated: one corpus-wide hash agg on the key (exact
    per-key counts, map-side partials), then the depth-fanout runs on
    the |distinct keys| frame — never ×depth on the raw stream.  The
    sketch is width×depth rows regardless of data size and is exactly
    mergeable (counter-wise sum), so shards/days can sketch
    independently and merge later — same reaggregation story as KMV.

    md5-salted hashing keeps every counter deterministic and
    oracle-checkable cross-engine.
    """
    counts = df.groupBy(F.col(key_col).alias("__k")).agg(
        (F.count(F.lit(1)) if weight_col is None else F.sum(weight_col))
        .cast("bigint")
        .alias("__c")
    )
    fanned = counts.select(
        "__c", F.explode(cm_bucket_structs("__k", width, depth)).alias("__db")
    )
    return fanned.groupBy(
        F.col("__db.d").alias("d"), F.col("__db.bucket").alias("bucket")
    ).agg(F.sum("__c").cast("bigint").alias("cnt"))


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    key_col: str,
    width: int = 64,
    depth: int = 4,
) -> DataFrame:
    """Point-query the Count-Min sketch for each row of ``items``:
    adds ``cm_est`` = min over the ``depth`` rows of the addressed
    counter (≥ true count always; equality whp for heavy keys).

    The items side fans out ×depth, LEFT-joins the width×depth sketch
    (broadcast — it is constant-sized), and min-reduces back: the
    sketch never re-touches the raw corpus.  A sparse sketch stores
    only touched counters; an absent (d, bucket) row is an implicit 0,
    so missing counters coalesce to 0 before the min — an unseen key
    correctly estimates 0 instead of vanishing from the output (or a
    partial miss inflating the min over only the present counters).
    """
    from pyspark.sql.functions import broadcast

    fanned = items.select(
        *items.columns,
        F.explode(cm_bucket_structs(key_col, width, depth)).alias("__db"),
    ).select(*items.columns, F.col("__db.d").alias("__d"), F.col("__db.bucket").alias("__b"))
    joined = fanned.join(
        broadcast(sketch),
        (F.col("__d") == F.col("d")) & (F.col("__b") == F.col("bucket")),
        "left",
    )
    return joined.groupBy(*items.columns).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0)))
        .cast("bigint")
        .alias("cm_est")
    )
