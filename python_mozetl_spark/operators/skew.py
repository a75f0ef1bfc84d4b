"""Skew-mitigated joins: key salting.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
DEFAULT_CONF) splits oversized partitions at runtime and is the first
line of defense.  Salting is the explicit fallback for the cases AQE
can't fix: a single hot KEY (AQE splits partitions, but one key's rows
still hash to one partition's sort/agg group), or a skewed
shuffle-hash/bucketed join where AQE skew handling doesn't apply.

``salted_join``: the big (skewed) side gets a random-but-deterministic
salt in [0, salt); the small side is replicated ``salt`` times; the
join key becomes (key, salt), spreading each hot key over ``salt``
partitions.  Semantics are EXACTLY an inner/left equi-join — pinned by
tests against the plain join.

Replication multiplies the small side by ``salt``: keep it to
dimension-sized tables (if the small side fits a broadcast, use
``broadcast()`` instead — salting is for the mid-sized right side that
is too big to broadcast but small enough to replicate 8-32x).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on column ``on``, salted.

    ``big`` rows are salted with a deterministic per-row hash (md5 of
    the whole row would be overkill; ``monotonically_increasing_id``'s
    low bits are stable within a plan and spread evenly), the small
    side is exploded across all ``salt`` values, and the join runs on
    ``(on, salt)`` — a hot key's rows now land on ``salt`` partitions
    instead of one.

    ``how`` may be ``inner`` or ``left`` (left preserves unmatched big
    rows; the salt spreads those too).  Output columns = big's columns
    then small's non-key columns, exactly like ``big.join(small, on,
    how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    overlap = (set(big.columns) & set(small.columns)) - {on}
    if overlap:
        # plain join() would return both copies; the post-join select
        # here cannot disambiguate them — make the caller rename
        raise ValueError(
            f"salted_join: shared non-key columns {sorted(overlap)}; "
            "rename them on one side first"
        )
    if "__salt" in big.columns or "__salt" in small.columns:
        raise ValueError("salted_join: '__salt' column name is reserved")
    b = big.withColumn(
        "__salt", (F.monotonically_increasing_id() % salt).cast("int")
    )
    s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out_cols = big.columns + [c for c in small.columns if c != on]
    return b.join(s, [on, "__salt"], how).select(*out_cols)
