"""Arbitrary-length repeated-substring discovery — the suffix-grain
upgrade of the fixed-8-token span dedup (Lee et al., "Deduplicating
Training Data Makes Language Models Better" works at this grain; the
span queries in plans/llm_ops.py are its bounded-window stand-in).

Two formulations, both token-grain over cleaned text:

``lrs_capped_sorted`` — longest repeated substring CAPPED at ``cap``
tokens, via capped-suffix sort + adjacent-LCP. Classic suffix-array
property, kept exact under the cap: the longest repeated prefix of any
two suffixes is attained either by two EQUAL capped suffixes (count ≥ 2)
or by an ADJACENT pair of distinct capped suffixes in sorted order.
Spark-first shape: the distinct-suffix table is range-partitioned and
sorted on the suffix string, within-partition adjacency comes from a
``lag`` window over the partition id, and the O(nparts) cross-partition
boundary pairs are collected (K-bounded) and compared driver-side — the
frame is cut to an EAGER LOCAL CHECKPOINT first so the boundary-collect
job and the window job see the SAME physical range assignment
(RangePartitioner re-samples per job; pipeline.py round-4 fix, same
discipline). Every candidate pair's LCP is a sound witness (two
positions sharing an ℓ-prefix IS a repeated ℓ-substring), and sorted
adjacency guarantees the max is witnessed, so the answer is exact and
independent of both the partition boundaries and the engine's collation
(max-over-all-pairs is order-free). Cost: O(cap · N) span rows through
one sort — the cap bounds the blowup; this is the SQL-expressible form
(DuckDB oracle mirrors it with a plain window sort).

Exactness precondition (adjacency-witnesses-the-max): suffixes are
compared as SPACE-joined strings, and string-lex order agrees with
token-grain suffix order only while every token character sorts above
the U+0020 separator. A token containing a C0 control char (regex
``\\s`` does not strip e.g. ``\\x01``, so cleaning can let one through)
can sort BETWEEN two occurrences of a longer repeat and hide it from
the adjacent-pair scan — the reported repeat is then still a true
repeated substring (every emitted pair is a sound witness), just not
provably the longest. Whitespace-tokenized natural text satisfies the
precondition; the uncapped probe formulation below has no such
precondition (it never orders suffixes) and is the scale path anyway.
Both engines use binary collation, so the oracle computes the
IDENTICAL function either way — the caveat bounds the math claim, not
the cross-engine match.

``longest_repeated_substring`` — UNCAPPED, via exponential + binary
search on the span length L: "some L-token span occurs ≥ 2 times" is
monotone in L, and each probe is one linear pass hashing every L-span
(xxhash64) into a count-≥2 existence check with map-side partial
aggregation — O(N) shuffle rows of constant width per probe,
O(log L_max) probes, no sort at all. A final pass at the found L
re-groups on the ACTUAL substring (hash-free) to pick the
lexicographically-smallest winner and its count, which also certifies
against xxhash64 collisions (~n²/2⁶⁴; on the certify-miss path the
search re-runs with the exact predicate). This is the 100 TB scale path:
no global sort, probes touch hashes only, and the doc→token arrays are
materialized once behind an eager checkpoint instead of re-tokenizing
the corpus per probe.

A distributed suffix ARRAY (prefix-doubling / DC3) was considered and
rejected for Spark: it needs O(log n) repartitionByRange global-sort
rounds with per-round checkpoints (the components.py lineage
discipline), and its only advantage over the probe form — the full LCP
array — isn't needed for the repeated-substring queries this engine
serves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

LRS_CAP = 30  # tokens; the capped query reports min(true LRS, LRS_CAP)


def _lcp_tokens(a, b):
    """Column: number of leading equal tokens of two string arrays."""
    z = F.zip_with(a, b, lambda x, y: F.coalesce(x == y, F.lit(False)))
    first_false = F.array_position(z, F.lit(False))
    return F.when(first_false == 0, F.least(F.size(a), F.size(b))).otherwise(
        first_false - 1
    )


def _lcp_py(a: list, b: list) -> int:
    n = 0
    for x, y in zip(a, b):
        if x != y:
            break
        n += 1
    return n


def lrs_capped_sorted(
    toks_df: DataFrame, toks_col: str = "toks", cap: int = LRS_CAP, nparts: int = 32
) -> DataFrame:
    """1-row (lrs_len, lrs_text): the longest token-substring occurring at
    ≥2 positions corpus-wide, capped at ``cap`` tokens; ties broken by
    lexicographically-smallest text. Empty input → empty result."""
    spark = toks_df.sparkSession
    # empty-doc guard: F.sequence(1, 0) yields [1, 0] (descending), not []
    sfx = toks_df.where(F.size(toks_col) > 0).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks_col)),
                lambda i: F.concat_ws(" ", F.slice(F.col(toks_col), i, cap)),
            )
        ).alias("sstr")
    )
    dist = sfx.groupBy("sstr").agg(F.count(F.lit(1)).alias("c"))
    ranged = (
        dist.repartitionByRange(nparts, F.col("sstr").asc())
        .sortWithinPartitions("sstr")
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    toks = F.split(F.col("sstr"), " ")

    # within-partition adjacency (sorted): LCP with the previous suffix
    w = W.partitionBy("_pid").orderBy("sstr")
    adj = (
        ranged.withColumn("prev", F.lag("sstr").over(w))
        .where(F.col("prev").isNotNull())
        .withColumn("lcp", _lcp_tokens(toks, F.split(F.col("prev"), " ")))
        .where(F.col("lcp") > 0)
        .select(
            F.col("lcp").cast("long").alias("l"),
            F.concat_ws(" ", F.slice(toks, 1, F.col("lcp"))).alias("sub"),
        )
    )
    # duplicate capped suffixes: the whole (≤cap)-token suffix repeats
    # (read off the checkpointed frame, not the pre-checkpoint span
    # pipeline, so the spans are tokenized exactly once)
    dups = ranged.where(F.col("c") >= 2).select(
        F.size(toks).cast("long").alias("l"), F.col("sstr").alias("sub")
    )
    # cross-partition boundary pairs: first/last suffix of each partition
    # (≤ 2·nparts rows — K-bounded collect, same class as the pipeline's
    # partition-offset subtotals), LCP'd driver-side. Comparing every
    # adjacent pair of this tiny sorted set covers last(p)↔first(q) for
    # consecutive non-empty partitions; the extra within-partition pairs
    # it also compares are sound (any pair's LCP witnesses a repeat) and
    # can never exceed the true max.
    wd = W.partitionBy("_pid").orderBy(F.col("sstr").desc())
    edge_rows = sorted(
        r["sstr"]
        for r in ranged.withColumn("rn", F.row_number().over(w))
        .withColumn("rnd", F.row_number().over(wd))
        .where((F.col("rn") == 1) | (F.col("rnd") == 1))
        .select("sstr")
        .collect()
    )
    bnd = []
    for prev, cur in zip(edge_rows, edge_rows[1:]):
        l = _lcp_py(prev.split(" "), cur.split(" "))
        if l > 0:
            bnd.append((l, " ".join(cur.split(" ")[:l])))
    bnd_df = spark.createDataFrame(bnd, "l long, sub string")
    return (
        adj.unionByName(dups)
        .unionByName(bnd_df)
        .orderBy(F.col("l").desc(), F.col("sub").asc())
        .limit(1)
        .select(F.col("l").cast("long").alias("lrs_len"), F.col("sub").alias("lrs_text"))
    )


def _span_strs(toks_df: DataFrame, toks_col: str, length: int) -> DataFrame:
    t = F.col(toks_col)
    return toks_df.where(F.size(t) >= length).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (length - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, length)),
            )
        ).alias("s")
    )


def longest_repeated_substring(
    toks_df: DataFrame, toks_col: str = "toks", max_len: int | None = None
) -> DataFrame:
    """1-row (lrs_len, lrs_text, n_occurrences): the longest token-substring
    occurring at ≥2 positions corpus-wide, UNCAPPED; ties broken by
    lexicographically-smallest text. Exponential + binary search on hashed
    spans; the winner pass re-groups on the actual substring (certifying
    against hash collisions — certify-miss re-runs the search exact)."""
    spark = toks_df.sparkSession
    toks_df = toks_df.select(toks_col).localCheckpoint(eager=True)
    empty = spark.createDataFrame(
        [], "lrs_len long, lrs_text string, n_occurrences long"
    )
    bound_row = toks_df.agg(F.max(F.size(toks_col)).alias("m")).collect()[0]
    max_doc = int(bound_row["m"] or 0)
    if max_len is not None:
        max_doc = min(max_doc, max_len)
    if max_doc == 0:
        return empty

    def has_repeat(length: int, exact: bool) -> bool:
        s = _span_strs(toks_df, toks_col, length)
        key = F.col("s") if exact else F.xxhash64("s").alias("s")
        return (
            s.select(key)
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .limit(1)
            .count()
            > 0
        )

    def search(exact: bool) -> int:
        if not has_repeat(1, exact):
            return 0
        lo, hi = 1, 2  # invariant: repeat at lo; probe hi
        while hi <= max_doc and has_repeat(hi, exact):
            lo, hi = hi, hi * 2
        hi = min(hi, max_doc + 1)  # first known-false (or just past max)
        while hi - lo > 1:
            mid = (lo + hi) // 2
            if has_repeat(mid, exact):
                lo = mid
            else:
                hi = mid
        return lo

    best = search(exact=False)
    if best == 0:
        return empty
    winner = (
        _span_strs(toks_df, toks_col, best)
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .orderBy(F.asc("s"))
        .limit(1)
        .collect()
    )
    if not winner:  # xxhash64 collision inflated the hash predicate
        best = search(exact=True)
        if best == 0:
            return empty
        winner = (
            _span_strs(toks_df, toks_col, best)
            .groupBy("s")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .orderBy(F.asc("s"))
            .limit(1)
            .collect()
        )
    return spark.createDataFrame(
        [(best, winner[0]["s"], int(winner[0]["c"]))],
        "lrs_len long, lrs_text string, n_occurrences long",
    )
