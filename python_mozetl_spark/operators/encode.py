"""Categorical feature encoding for distributed ML feature pipelines.

Leave-one-out target encoding: replace a categorical column with the
mean of the target over all OTHER rows of the same category —
``(Σ_cat y − y_row) / (n_cat − 1)`` — optionally smoothed toward the
global mean with a pseudo-count prior
(``(Σ_cat − y + a·ȳ) / (n_cat − 1 + a)``).  Excluding the row itself
prevents the target-leakage that plain mean encoding suffers at train
time (Micci-Barreca, SIGKDD Explorations 2001).

Spark-first shape, chosen over the window formulation on purpose:

- per-category sums/counts are ONE hash agg (map-side partials) whose
  output is |categories| rows, then a broadcast join back onto the
  fact — the raw stream crosses zero exchanges when the fact is
  consumed as-is (agg reads the same scan; Catalyst schedules it as a
  tiny side job).  A ``Window.partitionBy(cat)`` twin would instead
  full-shuffle AND sort the fact on a low-cardinality key — the
  classic skew trap this module avoids.
- all arithmetic is exact-integer counts + one float division per
  row, rounded at the output — deterministic cross-engine.

Frequency encoding (category → occurrence count / share) rides the
same agg for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def loo_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    out_col: str = "loo_enc",
    smoothing: float = 0.0,
    round_to: int = 6,
) -> DataFrame:
    """Add ``out_col``: leave-one-out mean of ``target_col`` within
    ``cat_col`` (smoothed toward the global mean when
    ``smoothing`` > 0).  Singleton categories yield NULL unsmoothed
    (no other rows to average) and the prior mean when smoothed.

    Row-count preserving: a NULL category is its own group (groupBy
    keeps NULL keys; the join-back is null-safe), so encoding never
    drops rows.
    """
    stats = df.groupBy(cat_col).agg(
        F.sum(target_col).alias("__sum"),
        F.count(F.lit(1)).cast("bigint").alias("__n"),
    ).withColumnRenamed(cat_col, "__cat")
    enc = df.join(
        broadcast(stats), F.col(cat_col).eqNullSafe(F.col("__cat"))
    ).drop("__cat")
    num = F.col("__sum") - F.col(target_col)
    den = (F.col("__n") - 1).cast("double")
    if smoothing > 0.0:
        gstats = df.agg(
            (F.sum(target_col) / F.count(F.lit(1))).alias("__gmean")
        )
        enc = enc.crossJoin(broadcast(gstats))
        num = num + F.lit(smoothing) * F.col("__gmean")
        den = den + F.lit(smoothing)
        drop = ["__sum", "__n", "__gmean"]
    else:
        drop = ["__sum", "__n"]
    out = enc.withColumn(
        out_col,
        F.when(den > 0, F.round(num / den, round_to)),
    )
    return out.drop(*drop)


def frequency_encode(
    df: DataFrame,
    cat_col: str,
    count_col: str = "cat_count",
    share_col: str = "cat_share",
    round_to: int = 6,
) -> DataFrame:
    """Add the category's occurrence count and corpus share — the
    cheap ordinal-free encoding for high-cardinality categoricals.
    Row-count preserving: NULL categories count as their own group
    (null-safe join-back)."""
    stats = df.groupBy(cat_col).agg(
        F.count(F.lit(1)).cast("bigint").alias(count_col)
    ).withColumnRenamed(cat_col, "__cat")
    total = df.agg(F.count(F.lit(1)).cast("bigint").alias("__tot"))
    return (
        df.join(broadcast(stats), F.col(cat_col).eqNullSafe(F.col("__cat")))
        .drop("__cat")
        .crossJoin(broadcast(total))
        .withColumn(
            share_col,
            F.round(F.col(count_col).cast("double") / F.col("__tot"), round_to),
        )
        .drop("__tot")
    )


def hash_features(
    df: DataFrame,
    cols: list[str],
    dim: int = 1 << 18,
    out_col: str = "features",
    salt: str = "fh",
) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML'09): fixed-``dim``
    sparse feature vectors from arbitrary categoricals — no vocabulary
    pass, no fit/transform state, unbounded-cardinality-safe.

    Each column contributes index ``md5(salt|col|value) % dim`` with a
    ±1 sign from one extra hash bit (sign hashing keeps collision
    noise zero-mean).  Output is a sorted sparse struct
    ``(indices array<int>, values array<double>)`` with collisions
    within a row summed — the shape a downstream LR/GBM trainer
    consumes.

    Pure codegen expression per row (md5 + arithmetic + one within-row
    sort/fold); zero shuffles, zero driver state — at 100 TB feature
    extraction rides the scan exactly like tokenization does.
    """
    from python_mozetl_spark.functions import hashing as H

    pairs = F.array(
        *[
            F.struct(
                (
                    H.md5_int64(
                        F.concat_ws(
                            "|", F.lit(salt), F.lit(c),
                            F.col(c).cast("string"),
                        )
                    )
                    % dim
                ).cast("int").alias("i"),
                F.when(
                    H.md5_int64(
                        F.concat_ws(
                            "|", F.lit(salt + "s"), F.lit(c),
                            F.col(c).cast("string"),
                        )
                    )
                    % 2
                    == 0,
                    F.lit(1.0),
                )
                .otherwise(F.lit(-1.0))
                .alias("v"),
            )
            for c in cols
        ]
    )
    # sort by index, then fold adjacent equal indices (collision sum)
    folded = F.aggregate(
        F.array_sort(pairs),
        F.expr(
            "named_struct('idx', cast(array() as array<int>), "
            "'val', cast(array() as array<double>))"
        ),
        lambda acc, x: F.when(
            (F.size(acc["idx"]) > 0)
            & (F.element_at(acc["idx"], -1) == x["i"]),
            F.struct(
                acc["idx"].alias("idx"),
                F.concat(
                    F.slice(acc["val"], 1, F.size(acc["val"]) - 1),
                    F.array(F.element_at(acc["val"], -1) + x["v"]),
                ).alias("val"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["idx"], F.array(x["i"])).alias("idx"),
                F.concat(acc["val"], F.array(x["v"])).alias("val"),
            )
        ),
    )
    return df.withColumn(
        out_col,
        F.struct(
            folded["idx"].alias("indices"), folded["val"].alias("values")
        ),
    )


def quantile_bin(
    df: DataFrame,
    value_col: str,
    n_bins: int = 10,
    bin_col: str = "bin",
) -> DataFrame:
    """Equal-frequency (quantile) binning — the scale-correct
    alternative to ``ntile()``: an NTILE window forces a GLOBAL sort
    through one partition, while this computes the n_bins-1 exact
    interpolated cutoffs in a single aggregate (Spark ``percentile``
    == DuckDB ``quantile_cont``), broadcasts the ONE-row cutoff
    array, and assigns ``bin = #cutoffs strictly below value`` with
    a within-row codegen expression.  Values exactly on a cutoff go
    to the LOWER bin; bins are 0-indexed.

    Unlike ntile, bin population is driven by the value
    distribution (heavy ties collapse into one bin) — the property
    feature pipelines actually want from a quantile transform.
    """
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    # df feeds both the cutoff aggregate and the binning pass — stage
    # it so the upstream plan runs once (SCALE.md §6b)
    df = df.localCheckpoint(eager=False)
    qs = ", ".join(str(i / n_bins) for i in range(1, n_bins))
    cuts = df.agg(
        F.expr(f"percentile({value_col}, array({qs}))").alias("__cuts")
    )
    return (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(
            bin_col,
            # NULL values get a NULL bin: the lambda `value > c` is
            # NULL for NULL values, so an unguarded size(filter(...))
            # would silently drop them into bin 0 while the cutoffs
            # themselves ignore NULLs
            F.when(
                F.col(value_col).isNotNull(),
                F.expr(
                    f"size(filter(__cuts, c -> {value_col} > c))"
                ).cast("int"),
            ),
        )
        .drop("__cuts")
    )


def rfm_scores(
    df: DataFrame,
    customer_col: str,
    ts_col: str,
    amount_col: str,
    n_bins: int = 4,
) -> DataFrame:
    """RFM (Recency / Frequency / Monetary) segmentation — the
    classic customer-value grid, built by composing three
    :func:`quantile_bin` passes over the per-customer rollup.

    Scores are 1..n_bins with n_bins best: recent buyers, frequent
    buyers, big spenders.  Recency is days from the customer's last
    order to the corpus' newest order (broadcast 1-row frame, no
    driver collect); its bin is inverted so "most recent" scores
    highest.  Segment labels follow a fixed rule grid on the R/F
    axes (monetary reported, not segmented on): champion
    (R,F both high), loyal (F high), recent (R high), hibernating
    (both low) — deterministic, engine-portable.

    Scale shape: ONE keyed hash agg collapses the order stream to a
    per-customer row; the three quantile passes each cost one tiny
    cutoff aggregate + a broadcast array comparison on the rollup
    frame (no global sort anywhere — the reason ntile-based RFM
    implementations die at scale).
    """
    half = (n_bins + 1) // 2
    per = df.groupBy(customer_col).agg(
        F.max(F.to_date(ts_col)).alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.sum(amount_col), 4).alias("monetary"),
    )
    ref = per.agg(F.max("__last").alias("__ref"))  # 1 row
    base = (
        per.crossJoin(broadcast(ref))
        .withColumn("recency_days", F.datediff("__ref", "__last").cast("bigint"))
        .drop("__last", "__ref")
    )
    binned = quantile_bin(
        quantile_bin(
            quantile_bin(base, "recency_days", n_bins, "__rb"),
            "frequency",
            n_bins,
            "__fb",
        ),
        "monetary",
        n_bins,
        "__mb",
    )
    r, fq, m = (
        (F.lit(n_bins) - F.col("__rb")).cast("int"),  # recent = low days = high score
        (F.col("__fb") + 1).cast("int"),
        (F.col("__mb") + 1).cast("int"),
    )
    return binned.select(
        customer_col,
        "recency_days",
        "frequency",
        "monetary",
        r.alias("r_score"),
        fq.alias("f_score"),
        m.alias("m_score"),
        F.when((r > half) & (fq > half), F.lit("champion"))
        .when(fq > half, F.lit("loyal"))
        .when(r > half, F.lit("recent"))
        .otherwise(F.lit("hibernating"))
        .alias("segment"),
    )
