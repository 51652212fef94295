"""Deduplication family.

- ``dedup_keep_first``  — the reference's operator (cleaner.py:106-121):
  dedupe on NORMALIZED key columns, keep the first occurrence in ingest
  order. ``dropDuplicates`` is not order-stable, so this is a
  ``row_number()`` window over the normalized key ordered by the explicit
  ingest-order id.
- ``dedup_exact``       — exact dedup at scale: group by content hash, keep
  min-id representative (EXT, LLM-pipeline surface).
- ``minhash_signatures`` / ``dedup_minhash_lsh`` — MinHash+LSH near-dup:
  token k-shingles → n MinHash values (seeded md5 family, cross-engine
  deterministic, see functions/hashing.py) → band keys → candidate pairs via
  a self-equi-join on band key → exact Jaccard verify on shingle sets.
  Scale shape: the band join shuffles on (band_idx, band_hash) — the classic
  LSH bucket join; no O(n²) stage anywhere.
- ``simhash_signatures`` / ``dedup_simhash`` — 32-bit SimHash + banded
  Hamming candidate join.
- ``dedup_ngram_jaccard`` — n-gram Jaccard verify over LSH candidates (the
  verify stage exposed standalone).

All computation is native Column expressions (higher-order array functions);
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from ..constants import (
    MINHASH_BANDS,
    MINHASH_NUM_HASHES,
    MINHASH_ROWS_PER_BAND,
    MINHASH_SHINGLE_K,
    SIMHASH_BITS,
)
from ..functions.hashing import hash60_expr
from ..functions.text import clean_text_expr
from ..functions.textstats import tokens_expr


# ---------------------------------------------------------------------------
# Reference operator: keep-first dedup on normalized (title, url)
# ---------------------------------------------------------------------------

def dedup_keep_first(
    df: DataFrame,
    key_cols: tuple[str, ...] = ("title", "url"),
    order_col: str = "record_id",
) -> DataFrame:
    """Keep the first row (by ``order_col``) per normalized key. Pass-through
    if any key column is absent (cleaner.py:113-114)."""
    if any(c not in df.columns for c in key_cols):
        return df
    norm = [clean_text_expr(F.col(c)).alias(f"_norm_{c}") for c in key_cols]
    w = Window.partitionBy(*[f"_norm_{c}" for c in key_cols]).orderBy(F.col(order_col).asc())
    out = (
        df.select("*", *norm)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", *[f"_norm_{c}" for c in key_cols])
    )
    return out


# ---------------------------------------------------------------------------
# EXT: exact dedup by content hash (group-by, no window needed)
# ---------------------------------------------------------------------------

def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the min-id row per exact (cleaned) text. Returns (id, n_copies)
    per surviving representative. One shuffle on the text hash."""
    clean = clean_text_expr(F.col(text_col)).alias("_clean")
    return (
        df.select(F.col(id_col), clean)
        .groupBy("_clean")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingles_expr(clean: Column, k: int = MINHASH_SHINGLE_K) -> Column:
    """Distinct token k-gram shingles of cleaned text (space-joined)."""
    toks = tokens_expr(clean)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - k)  # empty when n < k
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(k)])
    )
    return F.when(n >= k, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def minhash_signature_expr(shingles: Column, num_hashes: int = MINHASH_NUM_HASHES) -> Column:
    """array<long> of length ``num_hashes``: min over shingles of the seeded
    60-bit hash; MAXLONG sentinel when the shingle set is empty."""
    def hasher(seed: int):
        # NB: a plain `lambda s, seed=seed:` would have arity 2 and PySpark
        # would bind the second param to the array INDEX — closure instead
        return lambda s: hash60_expr(s, seed=seed)

    sigs = [
        F.coalesce(
            F.array_min(F.transform(shingles, hasher(seed))),
            F.lit(2**62).cast("long"),
        )
        for seed in range(num_hashes)
    ]
    return F.array(*sigs)


def minhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    clean = clean_text_expr(F.col(text_col))
    return df.select(
        F.col(id_col).alias("id"),
        shingles_expr(clean).alias("shingles"),
    ).withColumn("sig", minhash_signature_expr(F.col("shingles")))


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    bands: int = MINHASH_BANDS,
    rows_per_band: int = MINHASH_ROWS_PER_BAND,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard) with exact-Jaccard verify
    over LSH band candidates.

    Plan shape: signatures → explode to (band_idx, band_key, id) → self-join
    on band key (shuffle hash join on the bucket key — the only shuffle that
    grows with data) → distinct candidate pairs → verify via shingle-set
    intersection/union sizes.
    """
    sigs = minhash_signatures(df, text_col, id_col).where(F.size("shingles") > 0)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("id", F.explode(band_structs).alias("band")).select(
        "id", F.col("band.band_idx").alias("band_idx"), F.col("band.band_key").alias("band_key")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )

    sh = sigs.select("id", "shingles")
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "shingles": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "shingles": "sh_b"}), "id_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")).cast("long"))
        .withColumn(
            "n_union",
            (F.size("sh_a") + F.size("sh_b") - F.col("n_inter")).cast("long"),
        )
        .withColumn("jaccard", F.round(F.col("n_inter") / F.col("n_union"), 6))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_expr(clean: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over the distinct token set: bit j is 1 iff the count of
    tokens with hash-bit j set exceeds half the token count. Kept at 32 bits
    so every intermediate fits signed-64 in both engines."""
    toks = F.array_distinct(tokens_expr(clean))
    n = F.size(toks)
    hashes = F.transform(toks, lambda t: hash60_expr(t))
    def bit_pred(j: int):
        # closure, not default-arg: keep the HOF lambda arity at 1
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    bit_cols = []
    for j in range(bits):
        ones = F.size(F.filter(hashes, bit_pred(j)))
        bit_cols.append(F.when(ones * 2 > n, F.lit(2**j).cast("long")).otherwise(F.lit(0).cast("long")))
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return F.when(n > 0, total).otherwise(F.lit(0).cast("long"))


def simhash_signatures(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    clean = clean_text_expr(F.col(text_col))
    return df.select(F.col(id_col).alias("id"), simhash_expr(clean).alias("simhash"))


def hamming_expr(a: Column, b: Column, bits: int = SIMHASH_BITS) -> Column:
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def dedup_simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int,
    bits: int = SIMHASH_BITS,
    chunks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Banded: split the signature into ``chunks`` equal bit-chunks; any pair
    within distance ``chunks - 1`` shares at least one exact chunk
    (pigeonhole), so candidates come from equi-joins on (chunk_idx, chunk
    value) — no cross join.
    """
    assert max_hamming < chunks, "pigeonhole guarantee requires max_hamming < chunks"
    sig = simhash_signatures(df, text_col, id_col)
    width = bits // chunks
    mask = (1 << width) - 1
    chunk_structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("chunk_idx"),
                F.shiftright(F.col("simhash"), c * width).bitwiseAND(F.lit(mask)).alias("chunk_val"),
            )
            for c in range(chunks)
        ]
    )
    chunked = sig.select("id", "simhash", F.explode(chunk_structs).alias("ch")).select(
        "id", "simhash", F.col("ch.chunk_idx").alias("chunk_idx"), F.col("ch.chunk_val").alias("chunk_val")
    )
    a = chunked.alias("a")
    b = chunked.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
        .withColumn("hamming", hamming_expr(F.col("sim_a"), F.col("sim_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return pairs
