"""Salted two-stage aggregation — the manual skew-mitigation pattern.

A hot grouping key concentrates its rows on one reducer. Salting splits
each key into ``salt_buckets`` sub-keys, aggregates partially per
(key, salt), then combines per key: two small shuffles instead of one
skewed one.

When to reach for it (and when not):

- plain ``count``/``sum``/``min``/``max`` group-bys already get map-side
  partial aggregation (HashAggregate → Exchange → HashAggregate), which
  neutralizes most aggregation skew for free — check ``.explain`` first;
- salting earns its keep where partial aggregation can't: high-cardinality
  state per group (``collect_list``, exact ``count_distinct`` re-expressed
  as two-level groupBy), skewed JOIN keys (salt one side, explode the
  other), or AQE disabled/ineffective;
- the salt must vary WITHIN a key: here it's a hash of the full row, so
  it is deterministic (no ``rand()`` — reruns and retries bucket
  identically) yet spreads a hot key's rows across buckets.

The decomposable aggregates supported here (count / sum / min / max) are
exactly re-combinable, so results are identical to the unsalted form —
which is what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: dict[str, Column] | None = None,
    count_alias: str = "n_rows",
    salt_buckets: int = 32,
) -> DataFrame:
    """groupBy(keys) with count + sums, executed as salted two-stage
    aggregation. ``sum_cols`` maps output name → row-level expression to
    sum (cast sums to DECIMAL for order-independent exactness)."""
    sum_cols = sum_cols or {}
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))

    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(
            F.count(F.lit(1)).alias("_pn"),
            *[expr.alias(f"_ps_{name}") for name, expr in
              ((n, F.sum(e)) for n, e in sum_cols.items())],
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("_pn").alias(count_alias),
            *[F.sum(f"_ps_{name}").alias(name) for name in sum_cols],
        )
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot join keys would overload single
    reducers: the skewed side gets a deterministic row-hash salt appended
    to the key, the ``other`` side is replicated across all ``salt_buckets``
    sub-keys (explode of a literal range — a narrow ``salt_buckets``-fold
    blowup of the SMALL side only), and the join runs on (key, salt), so a
    hot key's rows spread over ``salt_buckets`` reducers.

    Trade-off ledger: pay |other| × salt_buckets replication to split the
    skewed side's per-key reducer load by salt_buckets. Worth it only when
    ``other`` is too big to broadcast yet small relative to the skewed
    side, and AQE's skew-join split (which handles oversized PARTITIONS,
    not single oversized KEYS in a partition) hasn't already solved it.
    Results are exactly the plain join's — which is what the oracle twin
    checks."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets))
    left = skewed.withColumn("_salt", salt)
    right = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return left.join(right, [on, "_salt"]).drop("_salt")


def estimate_top_key_share(
    df: DataFrame, on: str, sample_fraction: float = 0.02, seed: int = 42
) -> float:
    """Estimate the share of rows held by the hottest join key, from one
    cheap pass: column-pruned scan of ``on`` only, Bernoulli sample, tiny
    groupBy. Deterministic (seeded) so plan choice is stable across runs
    and retries. Returns 0.0 for an empty sample.

    At 100 TB this reads one column of the fact table once — O(N) but far
    cheaper than the shuffle it protects; if the table is scanned anyway,
    amortize by caching or persist the histogram alongside table stats."""
    s = df.select(on).sample(fraction=sample_fraction, seed=seed)
    row = (
        s.groupBy(on)
        .count()
        .agg(F.sum("count").alias("tot"), F.max("count").alias("top"))
        .first()
    )
    if row is None or not row["tot"]:
        return 0.0
    return float(row["top"]) / float(row["tot"])


def auto_skew_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    salt_buckets: int = 8,
    hot_key_threshold: float = 0.2,
    sample_fraction: float = 0.02,
    seed: int = 42,
) -> DataFrame:
    """Equi-join that picks its own skew mitigation: sample the left side's
    key histogram and use ``salted_join`` when the hottest key holds at
    least ``hot_key_threshold`` of the rows, else the plain join (letting
    Catalyst/AQE pick broadcast or shuffled hash as usual).

    Why a guard instead of always salting: salting costs a
    ``salt_buckets``-fold replication of ``other`` and disables broadcast
    planning, so it must be reserved for genuine single-hot-key skew — the
    one regime AQE's skew split cannot fix (it splits oversized partitions,
    not one oversized key inside a partition; measured 17.3 s plain vs
    7.0 s salted at 50M rows with a 50% hot key, tools/stress_skew.py).
    Both branches produce identical results, so correctness is
    plan-independent."""
    share = estimate_top_key_share(skewed, on, sample_fraction, seed)
    if share >= hot_key_threshold:
        return salted_join(skewed, other, on, salt_buckets=salt_buckets)
    return skewed.join(other, on)
