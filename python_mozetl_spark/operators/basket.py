"""Association-rule mining (market-basket analysis).

The reference's co-occurrence jobs stop at raw pair counts
(``mozetl/taar/taar_lite_guidguid.py:70-95`` builds the addon
coinstall graph as plain ``{guid: {coinstall: count}}`` maps); this
module adds the statistical layer on top — support, confidence, and
lift — which is what turns co-occurrence counts into actionable
"customers who bought A also bought B" rules.

Scale design: the basket relation (one distinct (basket, item) row)
is localCheckpoint-staged once for its three consumers (pair
enumeration, per-item counts, basket count; SCALE.md §6b).  Per-item
counts are attached to the basket rows BEFORE the within-basket
self-join, so the pair aggregation carries them for free and no
post-enumeration re-shuffle of the (quadratic-side) pair frame
exists; the basket total rides a broadcast 1-row frame (no driver
collect).  Within-basket pair fanout is quadratic in BASKET SIZE —
bounded for retail-shaped data (TPC-H orders hold <= ~13 items); for
unbounded baskets (e.g. user session histories), pre-cap baskets or
route enumeration through ``ext.dedup.bounded_bucket_pairs``.
Support pruning (``min_count``) happens at the pair aggregate,
before any ratio arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    precision: int = 6,
) -> DataFrame:
    """Frequent item PAIRS with association statistics.

    Returns ``(item_a, item_b, n_ab, support, confidence, lift)``
    for every unordered pair co-occurring in >= ``min_count``
    baskets, where (with N = number of distinct baskets)::

        support    = n_ab / N
        confidence = n_ab / n_a          (P(b | a), a = smaller item)
        lift       = n_ab * N / (n_a * n_b)

    lift > 1 means the pair co-occurs more than independence
    predicts.  All ratios are plain double arithmetic over exact
    counts — deterministic and engine-portable.
    """
    b = (
        df.select(
            F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = b.agg(F.countDistinct("__bk").cast("double").alias("__n"))  # 1 row
    ic = b.groupBy("__it").agg(F.count(F.lit(1)).alias("__c"))
    # carry each item's basket count into the pairs; staged because
    # BOTH self-join sides consume it (otherwise the b⋈ic join runs
    # twice — ReusedExchange does not cover the join itself)
    bc = b.join(ic, "__it").localCheckpoint(eager=False)
    left = bc.select(
        F.col("__bk"), F.col("__it").alias("item_a"), F.col("__c").alias("__ca")
    )
    right = bc.select(
        F.col("__bk"), F.col("__it").alias("item_b"), F.col("__c").alias("__cb")
    )
    pairs = (
        left.join(right, "__bk")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b", "__ca", "__cb")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    n_ab = F.col("n_ab").cast("double")
    return pairs.crossJoin(F.broadcast(n)).select(
        "item_a",
        "item_b",
        F.col("n_ab").cast("bigint").alias("n_ab"),
        F.round(n_ab / F.col("__n"), precision).alias("support"),
        F.round(n_ab / F.col("__ca"), precision).alias("confidence"),
        F.round(
            n_ab * F.col("__n") / (F.col("__ca").cast("double") * F.col("__cb")),
            precision,
        ).alias("lift"),
    )
