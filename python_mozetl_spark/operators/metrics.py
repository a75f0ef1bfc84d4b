"""Sliced evaluation metrics with uncertainty — the "is this segment
actually worse?" layer of an experimentation/eval pipeline.

:func:`proportion_ci` computes per-group success proportions with the
Wilson score interval (Wilson, JASA 1927) — the interval of choice for
small/skewed slices where the normal approximation breaks (never
leaves [0, 1], sane at p→0/1).

One hash agg per call (exact integer n/successes with map-side
partials); the interval arithmetic is a fixed closed-form double
expression over those integers, so results are deterministic
cross-engine at output rounding.  The distributed-AUC twin for ranking
metrics is plans/queries.py:doc_length_auc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def proportion_ci(
    df: DataFrame,
    group_cols: list[str],
    success_col: str,
    z: float = 1.96,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ``(n, successes, p, ci_lo, ci_hi)`` with the Wilson
    score interval at critical value ``z`` (1.96 ≈ 95%).

    ``success_col`` must be a 0/1-valued (or boolean) column.
    """
    z2 = z * z
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(success_col).cast("bigint")).cast("bigint").alias("successes"),
    )
    n = F.col("n").cast("double")
    p = F.col("successes").cast("double") / n
    denom = 1.0 + F.lit(z2) / n
    center = p + F.lit(z2) / (2.0 * n)
    margin = F.lit(z) * F.sqrt(
        p * (1.0 - p) / n + F.lit(z2) / (4.0 * n * n)
    )
    return agg.select(
        *group_cols,
        "n",
        "successes",
        F.round(p, round_to).alias("p"),
        F.round((center - margin) / denom, round_to).alias("ci_lo"),
        F.round((center + margin) / denom, round_to).alias("ci_hi"),
    )


def psi_drift(
    df: DataFrame,
    split_col,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index between the two sides of a boolean
    ``split_col`` (reference=false vs current=true) over fixed-width
    bins of ``value_col`` — THE production data-drift monitor
    (PSI < 0.1 stable, > 0.25 action).

    Fixed [lo, hi) bin edges (under/overflow clamp to the edge bins)
    make the binning pure integer arithmetic; shares and the
    ``(p−q)·ln(p/q)`` contribution are one double expression per bin
    row.  Bins empty on EITHER side contribute NULL (ln(0) — callers
    choosing the eps-smoothing convention can coalesce); total PSI is
    the sum over non-null rows.

    One (split, bin) hash agg over the raw stream; everything after is
    |bins|-row frames with unpartitioned windows.

    NULL ``value_col`` rows are excluded before binning — Spark's
    ``greatest(0, floor(NULL))`` would otherwise silently route them
    into bin 0 and distort both sides' shares.
    """
    split = split_col if not isinstance(split_col, str) else F.col(split_col)
    df = df.where(F.col(value_col).isNotNull())
    width = (hi - lo) / n_bins
    bin_idx = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0),
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
        ),
    )
    counts = df.groupBy(
        bin_idx.alias("bin"), split.cast("boolean").alias("__cur")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__c"))
    from pyspark.sql import Window

    wall = Window.partitionBy("__cur")
    shared = counts.withColumn("__tot", F.sum("__c").over(wall)).select(
        "bin",
        F.when(~F.col("__cur"), F.col("__c").cast("double") / F.col("__tot"))
        .alias("__p"),
        F.when(F.col("__cur"), F.col("__c").cast("double") / F.col("__tot"))
        .alias("__q"),
    )
    per_bin = shared.groupBy("bin").agg(
        F.max("__p").alias("__p"), F.max("__q").alias("__q")
    )
    contrib = F.when(
        (F.col("__p") > 0) & (F.col("__q") > 0),
        (F.col("__p") - F.col("__q")) * F.log(F.col("__p") / F.col("__q")),
    )
    return per_bin.select(
        "bin",
        F.round(F.coalesce("__p", F.lit(0.0)), round_to).alias("ref_share"),
        F.round(F.coalesce("__q", F.lit(0.0)), round_to).alias("cur_share"),
        F.round(contrib, round_to).alias("psi_contrib"),
    )


def snapshot_change_flags(
    df: DataFrame,
    key_cols: list[str],
    prev_pred: Column,
    cur_pred: Column,
    threshold: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Report-to-report change detection (the reference gates its
    hardware report on this before publishing —
    mozetl/hardware_report/check_output.py:17-38: any dimension whose
    value moved more than ``threshold`` relative to the previous
    snapshot raises an alert instead of shipping).

    Both snapshots are counted in ONE conditional aggregation over the
    combined frame (no snapshot self-join, one hash-agg exchange);
    ``pct_change`` is NULL and ``alert`` true for dimensions absent
    from the previous snapshot.  Rows matching NEITHER predicate are
    excluded up front, so a dimension present only in other periods
    cannot surface as a spurious (0, 0, alert) row.  Only the alert
    DELIVERY (SES email, K7) stays out-of-engine.
    """
    df = df.where(prev_pred | cur_pred)
    agg = df.groupBy(*key_cols).agg(
        F.count(F.when(prev_pred, 1)).cast("bigint").alias("n_prev"),
        F.count(F.when(cur_pred, 1)).cast("bigint").alias("n_cur"),
    )
    pct = (F.col("n_cur") - F.col("n_prev")) / F.col("n_prev").cast(
        "double"
    )
    return agg.select(
        *key_cols,
        "n_prev",
        "n_cur",
        F.when(F.col("n_prev") > 0, F.round(pct, round_to)).alias(
            "pct_change"
        ),
        F.when(F.col("n_prev") == 0, F.lit(True))
        .otherwise(F.abs(pct) > threshold)
        .alias("alert"),
    )


def chi_squared(
    df: DataFrame,
    col_a: str,
    col_b: str,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-squared test of independence between two
    categoricals: one (a, b) contingency agg over the raw stream, then
    row/column/grand totals as unpartitioned window sums over the
    |A|×|B| contingency frame (never a second pass over the data).

    Returns one row ``(chi2, dof, n)`` — all derived from exact
    integer counts, so deterministic cross-engine.  Compare chi2 to
    the critical value for ``dof`` externally (no p-value: that needs
    the incomplete gamma, which is not reproducible-by-construction
    across engines).
    """
    from pyspark.sql import Window

    obs = df.groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("__o"))
    wa, wb, wall = (
        Window.partitionBy("__a"),
        Window.partitionBy("__b"),
        Window.partitionBy(),
    )
    # NOTE: observed-zero cells missing from the contingency frame have
    # E>0 and contribute E to chi2; reconstruct them by crossing the
    # distinct margins so the statistic is the textbook one.
    cells = (
        obs.select("__a").distinct()
        .crossJoin(obs.select("__b").distinct())
        .join(obs, ["__a", "__b"], "left")
        .withColumn("__o", F.coalesce("__o", F.lit(0)))
    )
    t = (
        cells.withColumn("__ra", F.sum("__o").over(wa))
        .withColumn("__rb", F.sum("__o").over(wb))
        .withColumn("__n", F.sum("__o").over(wall))
    )
    e = F.col("__ra").cast("double") * F.col("__rb").cast("double") / F.col(
        "__n"
    ).cast("double")
    term = (F.col("__o").cast("double") - e) * (
        F.col("__o").cast("double") - e
    ) / e
    return t.select("__a", "__b", "__o", "__n", term.alias("__t")).agg(
        F.round(F.sum("__t"), round_to).alias("chi2"),
        (
            (F.count_distinct(F.col("__a")) - 1)
            * (F.count_distinct(F.col("__b")) - 1)
        ).cast("bigint").alias("dof"),
        F.max("__n").alias("n"),
    )


def ks_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group two-sample Kolmogorov-Smirnov statistic against the
    POOLED distribution: ``D_g = sup_x |ECDF_g(x) - ECDF_all(x)|`` —
    the distribution-shape drift test PSI's fixed binning can miss
    (:func:`psi_drift` is the binned-share companion).

    Both ECDFs are step functions jumping only at observed values, so
    the sup equals the max absolute difference evaluated at the pooled
    distinct points.  Output: ``(group, n_group, ks_stat)``.

    Scale shape: one (group, value) hash agg + one per-value hash agg,
    then a groups × pooled-points grid whose per-group window — the
    ONLY sort — computes BOTH cumulatives (the pooled per-value counts
    ride every group's partition, so the global cumsum is re-derived
    inside each group's window and no partition-less global window
    ever exists; groups are independent tasks).  Each task sorts the
    pooled point set, which is exact-KS's inherent cost — on an
    unbounded 100 TB value domain, pre-bin values through
    ext/sketches.py's log-histogram (KS on binned ECDFs, the standard
    monitoring form); the grid is G x |points| either way, with G
    small by construction.
    """
    from pyspark.sql import Window

    ev = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
    ).where(F.col(value_col).isNotNull())
    gv = ev.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__c_gv"))
    pooled = ev.groupBy("__v").agg(F.count(F.lit(1)).alias("__c_all"))
    groups = ev.groupBy("__g").agg(F.count(F.lit(1)).alias("__n_g"))
    n_tot = ev.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    grid = (
        pooled.crossJoin(F.broadcast(groups))
        .join(gv, ["__g", "__v"], "left")
        .crossJoin(F.broadcast(n_tot))
        .select(
            "__g",
            "__v",
            "__n_g",
            "__n",
            F.coalesce("__c_gv", F.lit(0)).alias("__c_gv"),
            "__c_all",
        )
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    diff = F.abs(
        F.sum("__c_gv").over(w).cast("double") / F.col("__n_g")
        - F.sum("__c_all").over(w).cast("double") / F.col("__n")
    )
    return (
        grid.select("__g", "__n_g", diff.alias("__d"))
        .groupBy("__g", "__n_g")
        .agg(F.round(F.max("__d"), round_to).alias("ks_stat"))
        .select(
            F.col("__g").alias(group_col),
            F.col("__n_g").cast("bigint").alias("n_group"),
            "ks_stat",
        )
    )


def mannwhitney_drift(
    df: DataFrame,
    group_col: str,
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group two-sample Mann-Whitney U test of each group's values
    against the REST of the corpus — the rank-based (median/location)
    drift test completing the family: :func:`ks_drift` is
    shape-sensitive, :func:`psi_drift` bin-share-sensitive, this one
    detects location shift with no distributional assumption.

    Classic definition with average ranks for ties:
    ``U_g = R_g − n_g(n_g+1)/2`` where ``R_g`` is the group's rank-sum
    in the combined sample, plus the normal approximation
    ``z = (U − n₁n₂/2) / σ`` with the standard tie-corrected
    ``σ² = n₁n₂/12 · ((n+1) − Σ(t³−t)/(n(n−1)))`` — all deterministic
    closed-form arithmetic, so the full statistic is oracle-checkable.

    Scale shape: ranks NEVER use a global sort — the average rank of a
    distinct value is ``(#values below) + (ties+1)/2``, computable
    from the pooled per-value counts with the same per-group grid
    window as :func:`ks_drift` (the pooled cumsum re-derives inside
    each group's partition; groups are independent tasks).  The tie
    term is one 1-row aggregate, broadcast.
    """
    from pyspark.sql import Window

    ev = (
        df.select(
            F.col(group_col).alias("__g"), F.col(value_col).alias("__v")
        )
        .where(F.col(value_col).isNotNull())
        # FIVE consumers (gv, pooled, groups, n, ties-via-pooled):
        # stage so the source scans once (SCALE.md §6b)
        .localCheckpoint(eager=False)
    )
    gv = ev.groupBy("__g", "__v").agg(F.count(F.lit(1)).alias("__c_gv"))
    pooled = ev.groupBy("__v").agg(F.count(F.lit(1)).alias("__c_all"))
    groups = ev.groupBy("__g").agg(F.count(F.lit(1)).alias("__n_g"))
    n_tot = ev.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    ties = pooled.groupBy().agg(
        F.sum(
            F.col("__c_all").cast("double") * F.col("__c_all") * F.col("__c_all")
            - F.col("__c_all")
        ).alias("__tie")
    )
    grid = (
        pooled.crossJoin(F.broadcast(groups))
        .join(gv, ["__g", "__v"], "left")
        .select(
            "__g",
            "__v",
            "__n_g",
            F.coalesce("__c_gv", F.lit(0)).alias("__c_gv"),
            "__c_all",
        )
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rank_v = (
        F.coalesce(F.sum("__c_all").over(w), F.lit(0)).cast("double")
        + (F.col("__c_all") + 1) / 2.0
    )
    rsum = (
        grid.select("__g", "__n_g", (F.col("__c_gv") * rank_v).alias("__r"))
        .groupBy("__g", "__n_g")
        .agg(F.sum("__r").alias("__rg"))
        .crossJoin(F.broadcast(n_tot))
        .crossJoin(F.broadcast(ties))
    )
    n1 = F.col("__n_g").cast("double")
    n2 = (F.col("__n") - F.col("__n_g")).cast("double")
    n = F.col("__n").cast("double")
    u = F.col("__rg") - n1 * (n1 + 1) / 2.0
    sigma2 = n1 * n2 / 12.0 * ((n + 1) - F.col("__tie") / (n * (n - 1)))
    z = F.when(sigma2 > 0, (u - n1 * n2 / 2.0) / F.sqrt(sigma2))
    return rsum.select(
        F.col("__g").alias(group_col),
        F.col("__n_g").cast("bigint").alias("n_group"),
        F.round(u, 1).alias("u_stat"),
        F.round(z, round_to).alias("z_score"),
    )
