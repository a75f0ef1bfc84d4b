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


# Mersenne prime 2^31-1 for the universal-hash family: with base
# hashes < P and coefficients < P the product stays under 2^62, inside
# signed-BIGINT range in both Spark and DuckDB.
MINHASH_P = (1 << 31) - 1


def base_hash_array(shingles: Column) -> Column:
    """Per-shingle base hash in [0, P): first 32 md5 bits mod P.

    This is the ONLY cryptographic-hash pass of the MinHash family —
    one md5 per shingle total, not one per (shingle, hash-function).
    """
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        % F.lit(MINHASH_P),
    )


def _minhash_coeffs(j: int) -> tuple[int, int]:
    """Deterministic (a, b) for hash function j, a != 0 (mod P)."""
    a = (j * 2654435761 + 2654435769) % (MINHASH_P - 1) + 1
    b = (j * 40503 + 12345) % MINHASH_P
    return a, b


def minhash_from_base(base_hashes: Column, num_hashes: int) -> list[Column]:
    """MinHash signature from a base-hash array: hash j is
    min over shingles of (a_j * h + b_j) mod P — pure arithmetic,
    no further hashing.  Returns ``num_hashes`` BIGINT columns.

    Expressed with ``array_min``/``transform`` — JVM-side, no UDF, no
    explode (the explode-based formulation shuffles
    |shingles|×num_hashes rows; this one shuffles nothing).
    """
    def permute(a: int, b: int):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    out = []
    for j in range(num_hashes):
        a, b = _minhash_coeffs(j)
        permuted = F.transform(base_hashes, permute(a, b))
        out.append(F.array_min(permuted).alias(f"mh_{j}"))
    return out


def minhash_exprs(shingles: Column, num_hashes: int) -> list[Column]:
    """MinHash signature straight from a shingle array (convenience
    composition of base_hash_array + minhash_from_base).

    NOTE: embedding this in a single projection duplicates the md5
    transform per hash function; for hot paths stage the base-hash
    array through its own projection (see ext/dedup.py) so the md5
    pass runs once.
    """
    return minhash_from_base(base_hash_array(shingles), num_hashes)


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
