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


def hash52_expr(col: Column, seed: int | None = None) -> Column:
    """52-bit md5 hash (13 hex chars). Every value is EXACTLY representable
    as an IEEE double, so (h + 1) / 2^52 is a bit-identical uniform in
    (0, 1] on both engines — the 60-bit variant would round long→double
    first and the two engines' rounded doubles, while equal, would carry
    less entropy than the hash. Use for anything that feeds libm."""
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("long")


def hash52_sql(expr: str, seed: int | None = None) -> str:
    s = expr if seed is None else f"('{seed}:' || {expr})"
    return f"(('0x' || substr(md5({s}), 1, 13))::BIGINT)"


def hash56_expr(col: Column, seed: int | None = None) -> Column:
    """56-bit md5 hash (14 hex chars) — the h2 of the Kirsch-Mitzenmacher
    MinHash family; 56 bits keep i·h2 (i < 32) inside signed-64."""
    s = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(s), 1, 14), 16, 10).cast("long")


def hash56_sql(expr: str, seed: int | None = None) -> str:
    s = expr if seed is None else f"('{seed}:' || {expr})"
    return f"(('0x' || substr(md5({s}), 1, 14))::BIGINT)"


def md5_split_exprs(col: Column) -> tuple[Column, Column]:
    """(h1, h2) Kirsch-Mitzenmacher base hashes from ONE md5 digest:
    h1 = hex chars 1-15 (60 bits), h2 = hex chars 16-29 (56 bits). Disjoint
    halves of a single digest are independent hash values, so one md5 per
    shingle replaces the two seeded calls (hashing is the dominant cost of
    the signature stage; whole-stage codegen's subexpression elimination
    computes the shared md5 once)."""
    d = F.md5(col)
    h1 = F.conv(F.substring(d, 1, HASH64_HEX_CHARS), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 16, 14), 16, 10).cast("long")
    return h1, h2


def md5_split_sql(digest_expr: str) -> tuple[str, str]:
    """DuckDB twin of ``md5_split_exprs`` over an already-computed digest
    column/expression (stage the ``md5(s)`` list once; inlining it would
    recompute the digest inside every one of the num_hashes transforms)."""
    return (
        f"(('0x' || substr({digest_expr}, 1, {HASH64_HEX_CHARS}))::BIGINT)",
        f"(('0x' || substr({digest_expr}, 16, 14))::BIGINT)",
    )


def km_hash_expr(h1: Column, h2: Column, i: int) -> Column:
    """g_i = (h1 + i·h2) mod (2^61−1), pure int64: h1 < 2^60, i·h2 < 32·2^56
    < 2^61, and the sum of the two residues < 2^62 — no overflow, no
    decimal. Two md5 calls replace ``num_hashes`` seeded md5s (the
    measured alternatives: 32 seeded md5s ≈ 2× slower; exact (a·h+b) mod p
    in DECIMAL(38,0) ≈ 3-4× slower than an extra md5)."""
    from ..constants import MINHASH_PRIME

    if i == 0:
        return h1  # h1 < 2^60 < P, so g_0 = h1 mod P = h1
    p = F.lit(MINHASH_PRIME)
    return (h1 + (F.lit(i) * h2) % p) % p


def km_hash_sql(h1: str, h2: str, i: int) -> str:
    from ..constants import MINHASH_PRIME

    if i == 0:
        return h1
    return f"(({h1} + (({i} * {h2}) % {MINHASH_PRIME})) % {MINHASH_PRIME})"


def md5_hex_expr(col: Column) -> Column:
    return F.md5(col)


def md5_hex_sql(expr: str) -> str:
    return f"md5({expr})"
