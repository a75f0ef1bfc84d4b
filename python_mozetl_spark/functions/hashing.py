"""Hashing expressions shared by dedup operators.

The MinHash family here is built on ``md5`` specifically because md5 is
bit-identical across engines (Spark, DuckDB, Python hashlib), which
makes every sketch deterministically reproducible and oracle-checkable.
``xxhash64`` is faster JVM-side but engine-specific; swap it in when
cross-engine checkability is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 15 hex chars = 60 bits — always fits a signed BIGINT, so the same
# `conv` trick works in DuckDB (`('0x'||substr(md5(s),1,15))::BIGINT`).
_HEX_CHARS = 15


def md5_int64(col: Column, salt: str | None = None) -> Column:
    """First 60 bits of md5(salt || value) as a non-negative BIGINT."""
    c = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(c), 1, _HEX_CHARS), 16, 10).cast("bigint")


def minhash_exprs(shingles: Column, num_hashes: int) -> list[Column]:
    """MinHash signature: for hash j, min over shingles of
    md5(j || ':' || shingle).  Returns ``num_hashes`` BIGINT columns.

    Expressed with ``array_min``/``transform`` — whole-stage-codegen
    eligible, no UDF, no explode (the explode-based formulation
    shuffles |shingles|×num_hashes rows; this one shuffles nothing).
    """
    out = []
    for j in range(num_hashes):
        hashed = F.transform(
            shingles,
            lambda s, j=j: F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}:"), s)), 1, _HEX_CHARS), 16, 10
            ).cast("bigint"),
        )
        out.append(F.array_min(hashed).alias(f"mh_{j}"))
    return out


def band_key(minhash_cols: list[str], band: int, rows_per_band: int) -> Column:
    """LSH band key: concatenation of one band's minhash values."""
    start = band * rows_per_band
    parts = [F.col(c).cast("string") for c in minhash_cols[start : start + rows_per_band]]
    return F.concat_ws("_", F.lit(str(band)), *parts)


def simhash_expr(toks: Column, bits: int = 60) -> Column:
    """SimHash: per-bit majority vote over md5-hashed tokens, packed
    into a BIGINT.  ``bits`` ≤ 60 so the DuckDB mirror stays in BIGINT
    range.  Pure higher-order-function composition.
    """
    hashed = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, _HEX_CHARS), 16, 10).cast("bigint"),
    )
    acc = F.lit(0).cast("bigint")
    for b in range(bits):
        votes = F.aggregate(
            hashed,
            F.lit(0).cast("bigint"),
            lambda a, h, b=b: a
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        acc = acc + F.when(votes > 0, F.lit(2 ** b).cast("bigint")).otherwise(F.lit(0))
    return acc
