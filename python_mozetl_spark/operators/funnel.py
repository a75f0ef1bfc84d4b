"""Ordered-funnel and cohort-retention analytics over an event log.

The reference's event-style jobs aggregate per-day / per-client event
counts (e.g. ``mozetl/engagement/churn/churn.py``'s usage rollups and
``mozetl/search/search_rollups.py``); a funnel — "how many users did
A, then B *after* A, then C after that" — is the sequential companion
those rollups can't express with plain group-bys.  Both operators here
are single-scan, Spark-first designs:

- :func:`funnel` folds each user's time-sorted event array with a
  higher-order ``aggregate`` lambda (whole-stage codegen, no Python),
  so ONE exchange on the user key replaces the classic k-way
  self-join chain (which scans the corpus once per stage and shuffles
  k times).  Semantics match the join chain exactly: a stage counts
  only if its event is STRICTLY later than the previous stage's
  matching event (ties on the same timestamp do not advance).
- :func:`cohort_retention` groups users by the week of their first
  event and reports, per (cohort week, week offset), how many are
  active — the classic retention triangle.  Two exchanges total (user
  min-ts, then (cohort, offset) distinct-count); cohort sizes join
  back broadcast (one row per cohort week, bounded by the calendar).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    precision: int = 6,
) -> DataFrame:
    """Strict-order funnel: stage i counts users whose earliest
    ``stages[i]`` event is strictly after the event that satisfied
    stage i-1.  Returns ``(stage_idx, stage, users, conversion)``
    with ``stage_idx = 0 / stage = 'all'`` as the all-users base;
    ``conversion`` is users / previous-stage users (base row = 1.0).

    Equivalent to the SQL join chain ``s_i = min(ts) WHERE type =
    stage_i AND ts > s_{i-1}.t`` — but computed in ONE corpus scan:
    per-user sorted event array folded left with a codegen'd lambda
    tracking (stage reached, its timestamp).
    """
    k = len(stages)
    stages_sql = "array(" + ", ".join(f"'{s}'" for s in stages) + ")"
    per_user = (
        df.groupBy(user_col)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col(type_col).isin(list(stages)),
                        F.struct(
                            F.col(ts_col).alias("ts"), F.col(type_col).alias("et")
                        ),
                    )
                )
            ).alias("ev")
        )
        .select(
            F.expr(
                f"""
                aggregate(
                  ev,
                  named_struct('stg', 0, 't', CAST(NULL AS {dict(df.dtypes)[ts_col]})),
                  (acc, e) -> IF(
                    acc.stg < {k}
                      AND e.et = element_at({stages_sql}, acc.stg + 1)
                      AND (acc.stg = 0 OR e.ts > acc.t),
                    named_struct('stg', acc.stg + 1, 't', e.ts),
                    acc)
                ).stg
                """
            ).alias("stg")
        )
    )
    # users reaching >= s: each user emits rows 0..stg (k+1 max), so the
    # second exchange carries <= (k+1) x |users| tiny rows into a k+1-group agg.
    reached = (
        per_user.select(F.explode(F.expr("sequence(0, stg)")).alias("stage_idx"))
        .groupBy("stage_idx")
        .agg(F.count(F.lit(1)).alias("users"))
    )
    stage_name = F.when(F.col("stage_idx") == 0, F.lit("all"))
    for i, s in enumerate(stages):
        stage_name = stage_name.when(F.col("stage_idx") == i + 1, F.lit(s))
    # k+1 rows: the single-partition lag window is bounded by the stage
    # count, not the data.
    w = F.expr("lag(users) OVER (ORDER BY stage_idx)")
    return (
        reached.select(
            "stage_idx",
            stage_name.alias("stage"),
            F.col("users").cast("bigint").alias("users"),
            w.alias("__prev"),
        )
        .select(
            "stage_idx",
            "stage",
            "users",
            F.coalesce(
                F.round(F.col("users") / F.col("__prev"), precision), F.lit(1.0)
            ).alias("conversion"),
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    precision: int = 6,
) -> DataFrame:
    """Weekly cohort retention triangle: cohort = ISO week (Monday
    truncation) of the user's first event; a user is active in offset
    w if they have any event in cohort_week + w weeks.  Returns
    ``(cohort_week, week_offset, active_users, retention)`` where
    retention = active / cohort size (offset 0 is 1.0 by construction
    — every user is active in their first week).
    """
    # `first` feeds both the activity join and the cohort sizes — stage
    # it so the corpus scan + user agg run once (SCALE.md §6b).
    first = (
        df.groupBy(user_col)
        .agg(F.min(ts_col).alias("__t0"))
        .localCheckpoint(eager=False)
    )
    active = (
        df.join(first, user_col)
        .select(
            # dates travel as strings — cross-engine canonical form
            F.date_format(F.date_trunc("week", "__t0"), "yyyy-MM-dd").alias(
                "cohort_week"
            ),
            (
                F.datediff(
                    F.date_trunc("week", ts_col).cast("date"),
                    F.date_trunc("week", "__t0").cast("date"),
                )
                / 7
            )
            .cast("int")
            .alias("week_offset"),
            F.col(user_col),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct(user_col).alias("active_users"))
    )
    sizes = first.groupBy(
        F.date_format(F.date_trunc("week", "__t0"), "yyyy-MM-dd").alias(
            "cohort_week"
        )
    ).agg(F.countDistinct(user_col).alias("__size"))
    return (
        active.join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("active_users").cast("bigint").alias("active_users"),
            F.round(F.col("active_users") / F.col("__size"), precision).alias(
                "retention"
            ),
        )
    )
