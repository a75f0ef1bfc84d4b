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


def quantize_int8(vec: Column) -> Column:
    """Symmetric max-abs int8 scalar quantization:
    ``q_i = round(127 * x_i / max_j |x_j|)`` (zero vector → zeros).

    4× memory cut for float32 corpora — the standard first compression
    step before ANN at scale.  Deterministic and oracle-checkable: the
    float→double widening is exact, the double arithmetic is IEEE-
    identical across engines, and ``round`` is HALF_UP (away from
    zero) in both Spark and DuckDB; all downstream dot products are
    exact integer sums.
    """
    mx = F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
    return F.when(
        mx > 0,
        F.transform(
            vec,
            lambda x: F.round(x.cast("double") * 127.0 / mx, 0).cast("int"),
        ),
    ).otherwise(F.transform(vec, lambda x: F.lit(0)))
