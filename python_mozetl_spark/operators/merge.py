"""Batch MERGE (upsert + tombstone delete) and SCD2 history building —
the two incremental-ETL verbs every warehouse pipeline needs and plain
Spark tables lack (Delta/Iceberg implement MERGE INTO; this is the
engine-level DataFrame algebra with identical semantics).

The reference's closest shape is the graphics-trends incremental
backfill (idempotent anti-join merge, jobs/graphics_trends.py); these
generalize it to keyed upserts and validity-interval dimension
history.

Scale shapes:

- :func:`merge_upsert` is one co-partitioned join pair on the merge
  key: changes are reduced to last-wins per key (hash agg), the base
  anti-joins the change keys, surviving changes union in.  Both
  shuffles are on the SAME key, so AQE plans them as one exchange per
  side; the base never shuffles on anything but the merge key.
- :func:`scd2_history` is one window (key, order) pass: ``lead``
  closes each version's validity interval.  Optionally collapses
  consecutive duplicates first (the run-length dedup every CDC feed
  needs) with ``lag`` on the same window — same single exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE ``changes`` into ``base``: per merge key the change row
    with the highest ``version_col`` wins (ties break toward keeping a
    delete, then deterministically by a hash of the remaining value
    columns — so two fully-identical change rows pick the same winner
    across retries and partitionings); keys absent from ``changes``
    pass through; winning rows with ``delete_col`` true are
    tombstones — the key disappears.  Output schema = base schema
    (minus nothing; ``delete_col`` is dropped if present).

    Works on append-only storage: writing the result partitioned by
    the merge-key hash gives the classic copy-on-write MERGE.
    """
    # final tiebreaker: hash of the non-key payload — row_number is
    # otherwise nondeterministic across retries when (key, version,
    # delete) collide on rows that differ only in value columns
    meta = set(key_cols) | {version_col} | ({delete_col} if delete_col else set())
    value_cols = [c for c in changes.columns if c not in meta]
    tiebreak = (
        [F.xxhash64(*[F.col(c) for c in value_cols]).asc()] if value_cols else []
    )
    last = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        *(
            [F.col(delete_col).desc()] if delete_col else []
        ),  # at version ties a tombstone wins: deletes must not resurrect
        *tiebreak,
    )
    winners = (
        changes.withColumn("__rn", F.row_number().over(last))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    if delete_col is not None:
        survivors = winners.where(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    else:
        survivors = winners
    kept_base = base.join(
        winners.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    return kept_base.unionByName(survivors.select(*base.columns))


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_cols: list[str],
    collapse_repeats: bool = True,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history: one row per
    (key, version) with ``valid_from`` = its ``order_col`` and
    ``valid_to`` = the next version's (NULL for the current version —
    the open interval).

    With ``collapse_repeats`` (default), consecutive observations with
    identical ``value_cols`` merge into one validity interval — the
    run-length dedup a CDC feed needs so repeated snapshots don't
    fragment history.  Both passes share ONE (key, order) window
    exchange.
    """
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    out = df.select(*key_cols, order_col, *value_cols)
    if collapse_repeats:
        changed: Column = F.lit(False)
        for v in value_cols:
            prev = F.lag(v).over(w)
            changed = changed | ~F.col(v).eqNullSafe(prev)
        first = F.lag(order_col).over(w).isNull()
        # window expressions must be projected before they can filter
        out = (
            out.withColumn("__chg", first | changed)
            .where(F.col("__chg"))
            .drop("__chg")
        )
    return out.select(
        *key_cols,
        *value_cols,
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(
            Window.partitionBy(*key_cols).orderBy(order_col)
        ).alias("valid_to"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Change-data-capture between two snapshots of a keyed table:
    one row per difference — ``change`` 'I' (key only in ``new``),
    'D' (only in ``old``), 'U' (present in both, any compare column
    null-safely different) with the changed column names in declared
    order; unchanged keys are dropped.

    The complement of :func:`merge_upsert`: merge APPLIES a change
    feed, diff RECOVERS one — the pair round-trips (pytest-pinned),
    which is how warehouse snapshots publish incremental feeds without
    the writer cooperating.  One shuffle per side on the key (the full
    outer join); comparisons are row-local; nothing collects.
    """
    om = old.select(
        *key_cols, *compare_cols, F.lit(1).alias("__po")
    ).alias("o")
    nm = new.select(
        *key_cols, *compare_cols, F.lit(1).alias("__pn")
    ).alias("n")
    cond = None
    for k in key_cols:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    j = om.join(nm, cond, "full_outer")
    diffs = [
        ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols
    ]
    any_diff = diffs[0]
    for d in diffs[1:]:
        any_diff = any_diff | d
    change = (
        F.when(F.col("o.__po").isNull(), "I")
        .when(F.col("n.__pn").isNull(), "D")
        .when(any_diff, "U")
    )
    changed = F.when(
        change == "U",
        F.filter(
            F.array(
                *[
                    F.when(d, F.lit(c))
                    for c, d in zip(compare_cols, diffs)
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return (
        j.withColumn("change", change)
        .where(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k)
                for k in key_cols
            ],
            "change",
            changed.alias("changed_cols"),
        )
    )


def state_durations(
    history: DataFrame,
    key_cols: list[str],
    state_cols: list[str],
    horizon,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Time-in-state analytics over SCD2 validity intervals: per
    (key, state) the total closed duration, interval count, and
    whether the state currently holds (open interval).

    The :func:`scd2_history` companion — "how long has each customer
    spent in each status" is the question SCD2 exists to answer.  Open
    intervals (``valid_to`` NULL) are capped at ``horizon`` (a literal
    in the same units as the interval bounds: the as-of point of the
    analysis).  One hash agg over the history frame — which is already
    change-row-sized, not fact-sized.

    Durations are ``valid_to - valid_from`` in the bound columns'
    native units (numeric versions, epoch seconds, days — caller's
    choice at history-build time).
    """
    dur = F.coalesce(F.col(valid_to), F.lit(horizon)) - F.col(valid_from)
    return history.groupBy(*key_cols, *state_cols).agg(
        F.sum(dur).cast("bigint").alias("total_duration"),
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.max(F.col(valid_to).isNull()).alias("is_current"),
    )
