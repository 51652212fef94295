"""Deterministic cross-engine hashing primitives.

The whole dedup family (MinHash-LSH, SimHash, fingerprints) is built on ONE
primitive that produces bit-identical values in Spark and DuckDB:

    hash60(s) = int(md5(s)[:15], 16)        # 60-bit unsigned, fits BIGINT

Spark:  conv(substr(md5(s), 1, 15), 16, 10)::bigint
DuckDB: ('0x' || substr(md5(s), 1, 15))::BIGINT

(xxhash64/hash() are engine-specific and NOT portable; md5 is.)

Seeded families are derived as hash60(seed || ':' || s).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from ..constants import HASH64_HEX_CHARS


def hash60_expr(col: Column, seed: int | None = None) -> Column:
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, HASH64_HEX_CHARS), 16, 10).cast("long")


def hash60_sql(expr: str, seed: int | None = None) -> str:
    s = expr if seed is None else f"('{seed}:' || {expr})"
    return f"(('0x' || substr(md5({s}), 1, {HASH64_HEX_CHARS}))::BIGINT)"


D38 = "decimal(38,0)"
_P = None  # set below to avoid import cycle noise


def mulmod_hash_expr(h: Column, a: int, b: int) -> Column:
    """(a·h + b) mod (2^61−1) computed exactly in DECIMAL(38,0); ``h`` is a
    60-bit hash value (long). Bit-identical to the DuckDB HUGEINT twin."""
    from ..constants import MINHASH_PRIME

    hd = h.cast(D38)
    return (
        (F.lit(str(a)).cast(D38) * hd + F.lit(str(b)).cast(D38))
        % F.lit(str(MINHASH_PRIME)).cast(D38)
    ).cast("long")


def mulmod_hash_sql(h: str, a: int, b: int) -> str:
    from ..constants import MINHASH_PRIME

    return f"CAST(((({h})::HUGEINT) * {a} + {b}) % {MINHASH_PRIME} AS BIGINT)"


def md5_hex_expr(col: Column) -> Column:
    return F.md5(col)


def md5_hex_sql(expr: str) -> str:
    return f"md5({expr})"
