"""Event-stream time-series analytics: calendar gap-fill, ordered
funnels, and cohort retention.

The reference aggregates event streams per-day/per-client
(mozetl/clientsdaily/rollup.py, mozetl/engagement/* shapes) but leaves
calendar densification, funnel-step matching, and cohort-offset
retention to downstream SQL consumers; a telemetry-descended engine
should own them.  All three are built-in-function compositions — no
Python UDFs, no driver-side loops.

Scale shapes (100 TB events):

- :func:`gapfill_daily` shuffles the raw stream ONCE on
  ``(key, day)`` for the per-day aggregate; the calendar grid is
  derived from the much smaller per-key bounds frame and re-joins on
  the same ``(key, day)`` hash, so the heavy side shuffles exactly
  once.  Grid fanout is bounded by the calendar span, not the event
  count.
- :func:`funnel_counts` reduces each user to ONE sorted array of
  (ts, step-index) pairs over only the step event-types (filter pushed
  to the scan), then walks the array with one fold — a single shuffle
  whose payload is the filtered per-user step events.  Use the
  default ``max_events_per_user`` cap to bound degenerate bot users:
  capped users keep their EARLIEST events per step level, which is
  exactly what the greedy walk consumes.
- :func:`retention_cohorts` is two hash aggregations and one
  co-partitioned join on the user key — cohort assignment is a
  min-aggregate, not a window over the raw stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gapfill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    precision: int = 2,
) -> DataFrame:
    """Per-key daily rollup densified over each key's own [min-day,
    max-day] span: days with no events appear with ``n_events = 0`` and
    ``sum_value = 0.0``.

    Returns ``(key_col, day, n_events, sum_value)``.

    The gap-fill unit is the day grid per key (``sequence`` + explode
    over the per-key bounds), NOT a window scan over raw events — at
    100 TB the grid frame is |keys| × span rows regardless of event
    volume, and the left join back to the daily aggregate reuses the
    (key, day) partitioning the aggregate just produced.
    """
    daily = (
        df.select(
            F.col(key_col), F.to_date(ts_col).alias("day"), F.col(value_col)
        )
        .groupBy(key_col, "day")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(F.sum(value_col), precision).alias("sum_value"),
        )
    )
    grid = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(
            key_col,
            F.explode(F.expr("sequence(__d0, __d1, interval 1 day)")).alias("day"),
        )
    )
    return grid.join(daily, [key_col, "day"], "left").select(
        key_col,
        "day",
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
    )


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    max_events_per_user: int = 10_000,
) -> DataFrame:
    """Ordered-funnel completion: how many users performed
    ``steps[0]``, then ``steps[1]`` STRICTLY AFTER it, then
    ``steps[2]`` strictly after that, …

    Returns one row per step: ``(step_idx, step, n_users)`` with
    ``step_idx`` 1-based; ``n_users`` is non-increasing by
    construction.

    Greedy earliest-match semantics (the standard funnel definition):
    a user completes step *k+1* iff some ``steps[k+1]`` event is
    strictly later than the EARLIEST timestamp at which the user
    completed step *k*.  Greedy-earliest is optimal here — matching a
    later step-*k* event can only shrink the remaining window — so one
    forward walk over the time-sorted events decides every step.

    Implementation: filter to step types only (pushed to the scan),
    reduce each user to one sorted (ts, step_idx) array (per-user cap
    keeps the earliest ``max_events_per_user`` PER STEP LEVEL), fold
    the array once to the deepest completed step, then one tiny
    aggregation over per-user depths.  Single shuffle over filtered
    events; no joins, no windows over the raw stream.

    CAP SEMANTICS: results are exact only for users below the cap.  A
    user with more than ``max_events_per_user`` events of step *k* can
    lose a qualifying LATE step-*k* event to truncation when every
    kept one precedes their step-*k-1* match, under-reporting their
    depth.  The default cap (10k step events of one type for one user)
    makes this a bot-traffic regime; raise it if that regime matters.
    """
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be non-empty and distinct")
    step_map = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i + 1))]
    )
    events = df.select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        step_map[F.col(type_col)].alias("__step"),
    ).where(F.col("__step").isNotNull())
    # cap: keep each user's earliest events per step level so degenerate
    # users stay bounded without changing the greedy walk's outcome
    # below the cap
    from pyspark.sql import Window

    # ONE explicit exchange on the user key: hash(user) satisfies both
    # the (user, step) window's ClusteredDistribution AND the
    # downstream groupBy(user), so the filtered stream shuffles once
    # instead of twice (plan-pinned in tests/test_plans.py)
    events = events.repartition(F.col(user_col))
    w = Window.partitionBy(user_col, "__step").orderBy("__ts")
    events = (
        events.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_events_per_user)
        .drop("__rn")
    )
    per_user = events.groupBy(user_col).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("__ts").alias("ts"), F.col("__step").alias("s")))
        ).alias("__seq")
    )
    # fold: depth = deepest step completed so far; an event advances the
    # walk iff it is the next step (depth+1).  Events at equal
    # timestamps sort deterministically (ts, then step), and "strictly
    # after" holds because array_sort puts the lower step first at ties
    # and the walk only ever advances one level per element.
    # the accumulator's timestamp must match the INPUT's flavor
    # (timestamp vs timestamp_ntz) or the fold's merge type mismatches
    ts_type = per_user.schema["__seq"].dataType.elementType["ts"].dataType
    init = F.struct(
        F.lit(0).cast("int").alias("depth"),
        F.lit(None).cast(ts_type).alias("at"),
    )

    def step_fn(acc, e):
        advance = (e["s"] == acc["depth"] + 1) & (
            acc["at"].isNull() | (e["ts"] > acc["at"])
        )
        return F.struct(
            F.when(advance, acc["depth"] + 1).otherwise(acc["depth"]).alias("depth"),
            F.when(advance, e["ts"]).otherwise(acc["at"]).alias("at"),
        )

    depths = per_user.select(
        F.aggregate("__seq", init, step_fn, lambda acc: acc["depth"]).alias("depth")
    )
    # one row per step with cumulative user counts: depth >= k.
    # The per-depth counts are right-joined onto a literal steps frame
    # so a step NO user reached — or a funnel with no qualifying users
    # at all — still emits its (step_idx, step, 0) row: the documented
    # "one row per step" contract, and what the min-timestamp-join
    # oracle produces (count over an empty chain is 0, not absent).
    ladder = F.array(*[F.lit(i + 1) for i in range(len(steps))])
    counts = (
        depths.select(F.explode(ladder).alias("step_idx"), "depth")
        .where(F.col("depth") >= F.col("step_idx"))
        .groupBy("step_idx")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    )
    base = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx int, step string"
    )
    return (
        base.join(counts, "step_idx", "left")
        .select(
            F.col("step_idx").cast("int").alias("step_idx"),
            "step",
            F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_users"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly cohort retention triangle: users are cohorted by the
    Monday-truncated week of their FIRST event; for every later week
    in which they appear, the (cohort_week, week_offset) cell counts
    them once.

    Returns ``(cohort_week, week_offset, n_users)`` — offset 0 is the
    cohort week itself, so its count is the cohort size.

    Two hash aggregations (per-user first week; distinct active
    (user, week)) plus one join co-partitioned on the user key; the
    raw stream shuffles once per aggregate, never through a window.
    """
    weeks = df.select(
        F.col(user_col), F.date_trunc("week", F.col(ts_col)).alias("week")
    ).distinct()
    cohorts = weeks.groupBy(user_col).agg(F.min("week").alias("cohort_week"))
    return (
        weeks.join(cohorts, user_col)
        .select(
            "cohort_week",
            (F.datediff(F.to_date("week"), F.to_date("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct(user_col).cast("bigint").alias("n_users"))
    )


def new_user_growth(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Daily new-user curve with cumulative total: ``(day, n_new,
    cum_users)``.  ``n_new`` counts users whose FIRST event falls on
    the day; ``cum_users`` is the running total — the standard
    growth-accounting view (cumulative distinct-to-date without a
    distinct-over-window, which no engine does cheaply).

    Scale shape: one per-user min aggregate over the raw stream, one
    day aggregate, then a running sum over the DAILY frame — the
    single-partition window touches |days| rows (calendar-bounded),
    never the event volume.
    """
    first = df.groupBy(user_col).agg(F.min(F.to_date(ts_col)).alias("day"))
    daily = first.groupBy("day").agg(F.count("*").cast("bigint").alias("n_new"))
    from pyspark.sql import Window

    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day", "n_new", F.sum("n_new").over(w).cast("bigint").alias("cum_users")
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    z_thresh: float = 2.0,
    min_periods: int = 3,
    precision: int = 6,
) -> DataFrame:
    """Per-key rolling z-score anomaly flags over DAILY totals: each
    (key, day) total is scored against the mean/stddev of its trailing
    ``window_days`` OBSERVED days (row frame over the daily series —
    absent days are not imputed; compose with :func:`gapfill_daily`
    first when calendar alignment matters).

    Returns anomalous rows only: ``(key, day, day_value, zscore)``
    where ``|z| > z_thresh``, with at least ``min_periods`` days in
    the frame and non-zero spread.  Sample stddev, matching SQL
    ``stddev_samp`` everywhere.

    Scale shape: one (key, day) hash agg over the raw stream, then one
    window over the per-key DAILY series — partition width is bounded
    by the calendar, not the event volume.
    """
    from pyspark.sql import Window

    daily = (
        df.select(F.col(key_col), F.to_date(ts_col).alias("day"), F.col(value_col))
        .groupBy(key_col, "day")
        .agg(F.sum(value_col).alias("day_value"))
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(-(window_days - 1), Window.currentRow)
    )
    scored = daily.select(
        key_col,
        "day",
        "day_value",
        F.avg("day_value").over(w).alias("__mu"),
        F.stddev_samp("day_value").over(w).alias("__sd"),
        F.count("*").over(w).alias("__n"),
    )
    return (
        scored.where(
            (F.col("__n") >= min_periods)
            & F.col("__sd").isNotNull()
            & (F.col("__sd") > 0)
        )
        .withColumn(
            "zscore",
            F.round((F.col("day_value") - F.col("__mu")) / F.col("__sd"), precision),
        )
        .where(F.abs(F.col("zscore")) > z_thresh)
        .select(
            key_col,
            "day",
            F.round("day_value", precision).alias("day_value"),
            "zscore",
        )
    )


def decayed_sum(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_days: float = 7.0,
    precision: int = 4,
) -> DataFrame:
    """Exponentially time-decayed value per key: each event
    contributes ``value * 0.5 ** (age_days / half_life_days)`` with
    age measured in whole epoch seconds from the corpus' newest
    event — the recency-weighted LTV / engagement score that a
    uniform trailing window (``running_agg``) can't express (old
    events fade smoothly instead of falling off a cliff).

    Returns ``(key, n_events, decayed_value)``; NULL values are
    excluded (they would silently skew n_events vs the sum).

    Scale shape: the projected (key, epoch, value) frame is staged
    once for its two consumers (global max + the keyed agg); the
    reference instant rides a broadcast 1-row frame (no driver
    collect); the decay weight is a per-row codegen expression and
    the whole thing is ONE keyed hash agg.  Whole-second epoch
    truncation keeps the exponent engine-portable.
    """
    epoch = F.col(ts_col).cast("timestamp_ltz").cast("long")
    e = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(key_col), epoch.alias("__s"), F.col(value_col).alias("__v"))
        .localCheckpoint(eager=False)
    )
    ref = e.agg(F.max("__s").alias("__ref"))  # 1 row
    w = F.pow(
        F.lit(0.5),
        (F.col("__ref") - F.col("__s")) / 86400.0 / float(half_life_days),
    )
    return (
        e.crossJoin(F.broadcast(ref))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum(F.col("__v") * w), precision).alias("decayed_value"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    precision: int = 4,
) -> DataFrame:
    """Per-key mean-shift changepoint via the classic CUSUM scan: for
    each key's DAILY value series, the changepoint is the day
    maximizing |cumulative sum of (x - series mean)| — the
    level-shift detector behind pipeline monitoring alerts
    (complementing ``rolling_zscore_anomalies``' pointwise spikes:
    CUSUM finds the sustained regime change a single-day z-score
    misses).

    Returns ``(key, n_days, cp_day, cusum_max, mean_before,
    mean_after)`` — before/after split inclusively at the
    changepoint day.  Argmax ties break earliest-day on the ROUNDED
    |cusum| (engine-portable ranking).

    Scale shape: the raw stream collapses to the (key, day) frame in
    one hash agg; everything after — the per-key mean, the running
    CUSUM, the argmax, the before/after means — runs on that
    calendar-bounded frame (per-key windows touch |days| rows, never
    event volume).  The daily frame is staged once for its two
    consumers.
    """
    from pyspark.sql import Window

    daily = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("k"), F.to_date(ts_col).alias("day")
        )
        .agg(F.sum(value_col).alias("x"))
        .localCheckpoint(eager=False)
    )
    wk = Window.partitionBy("k")
    run = Window.partitionBy("k").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = daily.select(
        "k",
        "day",
        "x",
        (F.sum("x").over(run) - F.count(F.lit(1)).over(run) * F.avg("x").over(wk))
        .alias("c"),
    )
    rk = Window.partitionBy("k").orderBy(
        F.round(F.abs("c"), 6).desc(), F.col("day")
    )
    cp = (
        cusum.withColumn("__r", F.row_number().over(rk))
        .where(F.col("__r") == 1)
        .select("k", F.col("day").alias("cp_day"), F.col("c").alias("cmax"))
    )
    return (
        daily.join(F.broadcast(cp), "k")
        .groupBy("k", "cp_day", "cmax")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(
                F.avg(F.when(F.col("day") <= F.col("cp_day"), F.col("x"))),
                precision,
            ).alias("mean_before"),
            F.round(
                F.avg(F.when(F.col("day") > F.col("cp_day"), F.col("x"))),
                precision,
            ).alias("mean_after"),
        )
        .select(
            F.col("k").alias(key_col),
            "n_days",
            F.date_format("cp_day", "yyyy-MM-dd").alias("cp_day"),
            F.round(F.abs("cmax"), precision).alias("cusum_max"),
            "mean_before",
            "mean_after",
        )
    )


def theil_sen_trend(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    precision: int = 6,
) -> DataFrame:
    """Per-key robust (Theil-Sen) trend over the daily value series:
    slope = MEDIAN of all pairwise day-to-day slopes, intercept =
    median of ``x - slope * day_idx`` — the outlier-resistant
    companion to the least-squares ``regr_slope`` trend (one wild
    day moves the LS fit, not the pairwise median).

    Returns ``(key, n_days, slope, intercept)``; ``day_idx`` is the
    epoch-day index, so the intercept is the robust level at day 0
    of the epoch (comparable across keys).

    Scale shape: the raw stream collapses to the (key, day) frame in
    one hash agg; the pairwise self-join fans out quadratically in
    the DAY count — calendar-bounded (30 days -> <= 435 pairs per
    key), never event volume; medians are exact interpolated
    percentiles per key.  The daily frame is staged once for its
    two consumers (pair join sides + intercept residuals).
    """
    daily = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("k"),
            F.datediff(F.to_date(ts_col), F.to_date(F.lit("1970-01-01"))).alias("d"),
        )
        .agg(F.sum(value_col).alias("x"))
        .localCheckpoint(eager=False)
    )
    a = daily.select("k", F.col("d").alias("da"), F.col("x").alias("xa"))
    b = daily.select("k", F.col("d").alias("db"), F.col("x").alias("xb"))
    slopes = (
        a.join(b, "k")
        .where(F.col("da") < F.col("db"))
        .groupBy("k")
        .agg(
            F.expr("percentile((xb - xa) / (db - da), 0.5)").alias("slope")
        )
    )
    return (
        daily.join(F.broadcast(slopes), "k")
        .groupBy("k", "slope")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.expr("percentile(x - slope * d, 0.5)").alias("__icept"),
        )
        .select(
            F.col("k").alias(key_col),
            "n_days",
            F.round("slope", precision).alias("slope"),
            F.round("__icept", precision).alias("intercept"),
        )
    )


def weekday_seasonality(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    precision: int = 4,
) -> DataFrame:
    """Per-key day-of-week seasonality profile: for every (key, dow)
    cell the mean and share of daily value, plus the key's
    seasonality strength — the R² of the DOW-means model
    (``SS_between / SS_total`` over the daily series) — the "is this
    metric weekly-periodic" diagnostic that decides whether alerts
    should compare same-weekday baselines (cf. cusum_changepoint /
    rolling_zscore_anomalies) or plain trailing means.

    ``dow`` is 0=Monday..6=Sunday (Spark ``weekday`` == DuckDB
    ``isodow - 1``).  Returns ``(key, dow, n_days, mean_value,
    share, seasonality_r2)``; a constant series reports r2 = 0.

    Scale shape: the raw stream collapses to the calendar-bounded
    (key, day) frame in one hash agg; both windows partition on the
    key (days-per-key rows, never event volume); the output distinct
    collapses identical windowed rows.
    """
    from pyspark.sql import Window

    daily = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"), F.to_date(ts_col).alias("day"))
        .agg(F.sum(value_col).alias("x"))
        .select("k", F.expr("weekday(day)").alias("dow"), "x")
    )
    wkd = Window.partitionBy("k", "dow")
    wk = Window.partitionBy("k")
    c = daily.select(
        "k",
        "dow",
        "x",
        F.avg("x").over(wkd).alias("dmean"),
        F.avg("x").over(wk).alias("gmean"),
        F.sum("x").over(wkd).alias("dsum"),
        F.sum("x").over(wk).alias("gsum"),
        F.count(F.lit(1)).over(wkd).alias("nd"),
    )
    sq = lambda col: col * col  # noqa: E731
    r = c.select(
        "k",
        "dow",
        "dmean",
        "dsum",
        "gsum",
        "nd",
        F.sum(sq(F.col("dmean") - F.col("gmean"))).over(wk).alias("ssb"),
        F.sum(sq(F.col("x") - F.col("gmean"))).over(wk).alias("sst"),
    )
    return r.select(
        F.col("k").alias(key_col),
        F.col("dow").cast("int").alias("dow"),
        F.col("nd").cast("bigint").alias("n_days"),
        F.round("dmean", precision).alias("mean_value"),
        F.round(F.col("dsum") / F.col("gsum"), 6).alias("share"),
        F.round(
            F.when(F.col("sst") > 0, F.col("ssb") / F.col("sst")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("seasonality_r2"),
    ).distinct()
