"""Dense-vector expressions over ``array<float|double>`` columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the
arithmetic JVM-side; for very wide vectors or large batch scoring the
Pandas-UDF path in ext/similarity.py trades JVM codegen for NumPy BLAS.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision; 0.0 when either norm is 0
    (ANSI-safe — no division by zero)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))
