"""Salted-join equivalence: salting must not change join semantics."""

from __future__ import annotations

import pytest

from python_mozetl_spark.operators.skew import salted_join


@pytest.fixture()
def skewed(spark):
    # one hot key (90% of rows) + a long tail — the distribution AQE's
    # partition splitting can't fully fix for hash aggregation on key
    big = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(k, k * 1000) for k in range(2, 102)],
        ["k", "v"],
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 60)], ["k", "name"]
    )
    return big, small


def test_salted_inner_equals_plain_join(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt=8).select("k", "v", "name")
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    assert salted.count() == plain.count()


def test_salted_left_preserves_unmatched(spark, skewed):
    big, small = skewed
    plain = big.join(small, "k", "left").select("k", "v", "name")
    salted = salted_join(big, small, "k", salt=8, how="left").select(
        "k", "v", "name"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # unmatched keys (>= 60) survive with null name
    assert salted.where("name IS NULL").count() == plain.where(
        "name IS NULL"
    ).count() > 0


def test_salted_join_rejects_bad_args(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        salted_join(big, small, "k", how="full")
    with pytest.raises(ValueError):
        salted_join(big, small, "k", salt=0)


def test_salted_join_rejects_overlapping_columns(spark):
    big = spark.createDataFrame([(1, "x")], ["k", "v"])
    small = spark.createDataFrame([(1, "y", "d")], ["k", "v", "name"])
    with pytest.raises(ValueError, match="shared non-key"):
        salted_join(big, small, "k")
