"""Distributed BPE vocabulary learning (Sennrich et al. 2016; the
word-frequency formulation used by SentencePiece / HuggingFace trainers).

The reference has no tokenizer surface (its cleaner is a single-table
pandas pass, cleaner.py:1-5) — EXT scope, the tokenizer-training step of
an LLM data pipeline.

Scale shape (100 TB): the ONLY corpus-sized work is one tokenize →
explode → word-count aggregation (map-side partial combine, shuffle on
the word key); everything after runs on a DETERMINISTIC TOP-V word
vocabulary (``TakeOrderedAndProject``, count-desc/word-asc total order),
so each of the K merge rounds touches a V-bounded frame no matter how
large the corpus is. Per round: one pair-count aggregation over the
exploded symbol frame (windows partitioned per word — partition size =
word length, never corpus-sized), one 1-row argmax collect (the
sanctioned bounded-scalar class), one merge-apply + re-collect, and an
eager localCheckpoint to keep lineage flat across rounds (the
components.py / pagerank.py iteration discipline).

Cross-engine exactness: pair counts are integer sums of word counts —
exact under any reduction order; the argmax orders by
(count DESC, x ASC, y ASC) — a total order over ASCII-safe binary string
comparison, identical in Spark (UTF8 byte order) and DuckDB (codepoint).

Greedy non-overlap counting, declaratively: occurrences of a pair
(x, y) with x != y can never overlap (an overlap at i, i+1 forces
s[i+1] = y = x), so every match counts. For x == y, matches overlap
exactly inside maximal runs of x, and left-to-right greedy merging
selects every other match: a match at position i is greedily selected
iff the run of x's ENDING at i has odd length. That trailing-run length
is ``row_number()`` within the (word, run) partition, where runs are the
classic gaps-and-islands grouping — so the entire greedy semantics is
window algebra, bit-identical in both engines, with no sequential scan.

Merge application drops position i+1 for each selected match at i,
replaces s[i] with x||y, and rebuilds the symbol array order-stably
(array_sort over (pos, sym) structs / ``list(... ORDER BY pos)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

END_MARK = "</w>"


def _explode_syms(vocab: DataFrame) -> DataFrame:
    """(word, wcount, syms) -> one row per symbol position with the
    next symbol and the trailing-run row number (greedy parity input)."""
    e = vocab.select(
        "word", "wcount", F.posexplode("syms").alias("pos", "sym")
    )
    w = Window.partitionBy("word").orderBy("pos")
    e = e.withColumn("nxt", F.lead("sym").over(w)).withColumn(
        "_b",
        F.when(F.col("sym") == F.lag("sym").over(w), F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    e = e.withColumn(
        "_grp", F.sum("_b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    run_w = Window.partitionBy("word", "_grp").orderBy("pos")
    return e.withColumn("trail", F.row_number().over(run_w)).drop("_b", "_grp")


def _greedy_pair_counts(e: DataFrame) -> DataFrame:
    """Weighted greedy-non-overlapping pair counts over the exploded
    symbol frame, for ALL pairs at once (see module doc for the parity
    rule)."""
    sel = F.when(
        F.col("sym") == F.col("nxt"), F.col("trail") % 2 == 1
    ).otherwise(F.col("nxt").isNotNull())
    return (
        e.where(sel)
        .groupBy(F.col("sym").alias("x"), F.col("nxt").alias("y"))
        .agg(F.sum("wcount").alias("pair_count"))
    )


def _apply_merge(e: DataFrame, x: str, y: str) -> DataFrame:
    """Apply one merge (x, y) to the exploded frame and rebuild the
    per-word symbol arrays."""
    if x == y:
        sel = (
            (F.col("sym") == F.lit(x))
            & (F.col("nxt") == F.lit(y))
            & (F.col("trail") % 2 == 1)
        )
    else:
        sel = (F.col("sym") == F.lit(x)) & (F.col("nxt") == F.lit(y))
    w = Window.partitionBy("word").orderBy("pos")
    m = e.withColumn("_sel", sel).withColumn(
        "_drop", F.coalesce(F.lag("_sel").over(w), F.lit(False))
    )
    out = m.where(~F.col("_drop")).select(
        "word",
        "wcount",
        "pos",
        F.when(F.col("_sel"), F.concat("sym", "nxt"))
        .otherwise(F.col("sym"))
        .alias("sym"),
    )
    return out.groupBy("word", "wcount").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "sym"))),
            lambda s: s["sym"],
        ).alias("syms")
    )


def bpe_learn(
    spark: SparkSession, words: DataFrame, n_merges: int
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a (word, wcount) frequency
    table. Returns one row per learned merge:
    (it, x, y, merged, pair_count), ordered by iteration.

    The per-round argmax is a bounded 1-row collect; everything else
    stays distributed over the V-bounded vocabulary.
    """
    vocab = words.select(
        "word",
        "wcount",
        F.concat(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            ),
            F.array(F.lit(END_MARK)),
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for it in range(1, n_merges + 1):
        e = _explode_syms(vocab)
        best = (
            _greedy_pair_counts(e)
            .orderBy(F.desc("pair_count"), F.asc("x"), F.asc("y"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        bx, by, bc = best[0]["x"], best[0]["y"], int(best[0]["pair_count"])
        merges.append((it, bx, by, bx + by, bc))
        vocab = _apply_merge(e, bx, by).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "it int, x string, y string, merged string, pair_count bigint"
    ).orderBy("it")


def bpe_encode_expr(syms: F.Column, merges: list[tuple[str, str]]) -> F.Column:
    """Apply a learned merge list to a symbol array as ONE Column fold —
    no shuffle, no Python: outer ``aggregate`` over the K-row merge
    literal, inner ``aggregate`` over the word's symbols building the
    merged array left-to-right (replace-last when the pair matches). The
    value-fold is exactly the greedy non-overlap semantics of the learn
    side (x == y parity falls out naturally: after a merge the last
    element is x||y, which no longer equals x). One pass per rank is
    exact for self-consistent merge tables: a rank-j merge can only
    create pairs whose components were born at rank ≤ j, and any learned
    pair containing them has rank > j."""
    merges_lit = F.array(
        *[
            F.struct(F.lit(x).alias("x"), F.lit(y).alias("y"))
            for x, y in merges
        ]
    )

    def one_pass(acc_syms, x, y):
        return F.aggregate(
            acc_syms,
            F.array().cast("array<string>"),
            # F.get returns null out-of-range, so the empty-acc case falls
            # through to append without an explicit size guard
            lambda acc, s: F.when(
                (F.get(acc, F.size(acc) - 1) == x) & (s == y),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1),
                    F.array(F.concat(x, y)),
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )

    return F.aggregate(
        merges_lit, syms, lambda acc, m: one_pass(acc, m["x"], m["y"])
    )


def word_syms_expr(word: F.Column) -> F.Column:
    """chars + the end-of-word marker — the learn side's initial symbols."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
        F.array(F.lit(END_MARK)),
    )


def _chain_parts(words_sql: str, n_merges: int) -> list[str]:
    """The learn recurrence as a list of CTE fragments (shared by the
    learn oracle and the encode oracle)."""
    parts = [
        f"WITH words AS MATERIALIZED ({words_sql}),",
        "v0 AS MATERIALIZED (SELECT word, wcount,"
        " list_transform(generate_series(1, length(word)),"
        " i -> substr(word, i, 1)) || ['" + END_MARK + "'] AS syms"
        " FROM words),",
    ]
    for k in range(1, n_merges + 1):
        p = k - 1
        parts.append(
            f"""e{k} AS MATERIALIZED (
  SELECT word, wcount, pos, sym,
         lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt,
         row_number() OVER (PARTITION BY word, grp ORDER BY pos) AS trail
  FROM (SELECT word, wcount, pos, sym,
               sum(b) OVER (PARTITION BY word ORDER BY pos) AS grp
        FROM (SELECT word, wcount,
                     unnest(generate_series(1, len(syms))) AS pos,
                     unnest(syms) AS sym,
                     unnest(list_transform(generate_series(1, len(syms)),
                       i -> CASE WHEN i > 1 AND syms[i] = syms[i-1]
                                 THEN 0 ELSE 1 END)) AS b
              FROM v{p}) raw)),
best{k} AS MATERIALIZED (
  SELECT sym AS x, nxt AS y, CAST(sum(wcount) AS BIGINT) AS pair_count
  FROM e{k}
  WHERE CASE WHEN sym = nxt THEN trail % 2 = 1 ELSE nxt IS NOT NULL END
  GROUP BY 1, 2 ORDER BY pair_count DESC, x ASC, y ASC LIMIT 1),
bc{k} AS MATERIALIZED (
  SELECT coalesce(max(x), '') AS x, coalesce(max(y), '') AS y FROM best{k}),
v{k} AS MATERIALIZED (
  SELECT word, wcount, list(sym2 ORDER BY pos) AS syms
  FROM (SELECT e.word, e.wcount, e.pos,
               CASE WHEN e.sym = bc.x AND e.nxt = bc.y
                         AND (bc.x <> bc.y OR e.trail % 2 = 1)
                    THEN e.sym || e.nxt ELSE e.sym END AS sym2,
               coalesce(lag(e.sym = bc.x AND e.nxt = bc.y
                            AND (bc.x <> bc.y OR e.trail % 2 = 1))
                        OVER (PARTITION BY e.word ORDER BY e.pos),
                        FALSE) AS dropped
        FROM e{k} e, bc{k} bc) m
  WHERE NOT dropped GROUP BY word, wcount),"""
        )
    return parts


def bpe_oracle_sql(words_sql: str, n_merges: int) -> str:
    """DuckDB twin: the identical recurrence unrolled as MATERIALIZED
    CTEs (inlined CTEs expand the round chain exponentially — each
    round's vocab is referenced twice, the pagerank.py lesson).
    ``words_sql`` must select (word, wcount)."""
    parts = _chain_parts(words_sql, n_merges)
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS it, x, y, x || y AS merged, pair_count FROM best{k}"
        for k in range(1, n_merges + 1)
    )
    # strip the trailing comma of the last CTE
    body = "\n".join(parts).rstrip()
    assert body.endswith(","), body[-40:]
    body = body[:-1]
    return f"{body}\n{unions}\nORDER BY it"


def bpe_encode_oracle_sql(
    learn_words_sql: str, all_words_sql: str, n_merges: int, topk: int
) -> str:
    """DuckDB twin of learn-then-encode: the learn chain's bc{k} merge
    rows drive K unrolled encode CTEs, each applying one merge to every
    word's symbol list with the IDENTICAL left-to-right value-fold
    (list_reduce over singleton-wrapped symbols; DuckDB's reduce has no
    init value, so the first singleton IS the init). An exhausted learn
    (bc{k} = ('','')) can never match a non-empty symbol, so spent
    rounds are no-ops on both engines."""
    parts = _chain_parts(learn_words_sql, n_merges)
    parts.append(f"wall AS MATERIALIZED ({all_words_sql}),")
    parts.append(
        "enc0 AS MATERIALIZED (SELECT word, wcount,"
        " list_transform(generate_series(1, length(word)),"
        " i -> substr(word, i, 1)) || ['" + END_MARK + "'] AS syms"
        " FROM wall),"
    )
    for k in range(1, n_merges + 1):
        parts.append(
            f"""enc{k} AS MATERIALIZED (
  SELECT word, wcount,
    list_reduce(list_transform(syms, s -> [s]),
      (acc, b) -> CASE WHEN acc[-1] = bc.x AND b[1] = bc.y
                  THEN acc[1:len(acc)-1] || [bc.x || bc.y]
                  ELSE acc || b END) AS syms
  FROM enc{k - 1}, bc{k} bc),"""
        )
    body = "\n".join(parts).rstrip()
    assert body.endswith(","), body[-40:]
    body = body[:-1]
    return f"""{body}
SELECT piece, CAST(sum(wcount) AS BIGINT) AS n_occurrences,
       CAST(count(DISTINCT word) AS BIGINT) AS n_words
FROM (SELECT word, wcount, unnest(syms) AS piece FROM enc{n_merges}) x
GROUP BY piece ORDER BY n_occurrences DESC, piece ASC LIMIT {topk}"""
