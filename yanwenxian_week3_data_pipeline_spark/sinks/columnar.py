"""Columnar / delimited sinks and their matching readers — the EXT
source/sink surface (SURVEY.md §2.1: the reference ships JSON only and
lists CSV/Parquet export as future work, prompt-log.md:291).

``write_partitioned_parquet`` is the lakehouse output shape for the 100 TB
path:

- hive-style ``partitionBy`` directories so downstream readers get
  partition PRUNING (a filter on the partition column never touches the
  other directories' files);
- optional ``sort_within_partitions`` so each file is internally ordered —
  parquet min/max row-group statistics then let even non-partition
  predicates skip row groups;
- ``target_file_partitions`` repartitions by the partition columns before
  the write, collapsing the output to ~one file per partition value
  instead of (#tasks × #values) small files — the classic small-files
  failure mode of naive partitioned writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_within_partitions: list[str] | None = None,
    target_file_partitions: bool = True,
    mode: str = "overwrite",
    rebalance: bool = False,
    compression: str | None = None,
) -> None:
    """``rebalance=True`` swaps the hard ``repartition`` for the AQE
    REBALANCE hint: same one-file-per-partition-value goal, but a HOT
    partition value is split into multiple advisory-sized files instead of
    one task writing (and one reader later scanning) a monster file — the
    skew-safe form of the small-files fix. Requires AQE (on in
    session.py); file-split granularity follows
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes``."""
    out = df
    if target_file_partitions:
        out = out.hint("rebalance", *partition_by) if rebalance else out.repartition(*partition_by)
    if sort_within_partitions:
        out = out.sortWithinPartitions(*sort_within_partitions)
    writer = out.write.mode(mode).partitionBy(*partition_by)
    if compression:
        # zstd ≈ 25-40% smaller than the snappy default on text-heavy
        # columns at similar scan speed — at 100 TB that IS the storage
        # bill; measured in tools/storage_audit.py
        writer = writer.option("compression", compression)
    writer.parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    """Delimited export (splittable, header per file). Types flatten to
    text — a lossy interchange format; parquet is the fidelity path."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    """Schema-ON-READ csv: an explicit DDL schema, never inference — an
    inference pass reads the whole input once before the real job, and
    silently mistypes columns on dirty data."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .csv(path)
    )


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC export (columnar, splittable, predicate-pushdown-capable like
    parquet — the interchange format for Hive-era lakes). Types round-trip
    with full fidelity, unlike CSV."""
    df.write.mode(mode).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_evolved_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: ``mergeSchema=true`` unions the footers of
    every file under ``path`` into one widened schema; files written before
    a column existed surface it as null. This is a FOOTER-ONLY merge
    (additive evolution — new nullable columns, compatible type widening);
    it is off by default because footer-merging ten million files costs a
    driver-side listing pass — production lakes record the merged schema in
    a table format's metadata instead. Pair with ``union_by_name`` for the
    in-memory equivalent."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def union_by_name(dfs: list[DataFrame]) -> DataFrame:
    """Column-NAME-aligned union across schema versions
    (``unionByName(allowMissingColumns=True)``): each frame's missing
    columns fill with nulls, the in-memory twin of the mergeSchema read.
    Positional ``union`` would silently mis-align columns across schema
    versions — the classic batch-append corruption."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int,
    sort_by: list[str] | None = None,
) -> int:
    """Compact a small-files parquet directory in place: read, coalesce to
    ``ceil(total_rows / target_rows_per_file)`` output files (optionally
    re-sorted so min/max row-group stats stay selective), write to a
    sibling temp dir, then swap via two renames. Returns the new file count.

    The two-rename swap is NOT crash-atomic (POSIX cannot atomically
    replace a non-empty directory): a crash between the renames leaves the
    data in ``<path>__compact_<hex>.old``, and concurrent readers can
    observe a missing path during the window. Production systems do this
    compaction under a table format's metadata commit (Iceberg/Delta) or a
    metastore partition swap — this operator is the file-level kernel of
    that pattern.

    The maintenance op every long-running ingest needs: streaming /
    per-batch writers accrete thousands of KB-sized files, and at 100 TB
    the NameNode/listing and per-file open costs dominate scans long before
    the bytes do. Run per partition directory in production so the swap
    stays partition-local."""
    import math
    import shutil
    import uuid
    from pathlib import Path

    df = spark.read.parquet(path)
    total = df.count()
    n_files = max(1, math.ceil(total / target_rows_per_file))
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    tmp = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(tmp)
    p, t = Path(path), Path(tmp)
    bak = Path(f"{tmp}.old")
    p.rename(bak)
    t.rename(p)
    shutil.rmtree(bak)
    return len([f for f in p.glob("*.parquet")])


def write_training_shards(
    df: DataFrame,
    path: str,
    records_per_shard: int,
    shuffle_seed: int | None = None,
) -> int:
    """Write a training corpus as bounded-size parquet shards
    (``maxRecordsPerFile`` caps each file at ``records_per_shard`` rows;
    range-partition remainders may be smaller), optionally in a seeded
    deterministic shuffle order (sort by a seeded hash — reproducible
    across runs, unlike a random() sort). Returns the shard-file count.

    The seeded ``orderBy`` is a total sort (sample + range exchange + sort);
    at 100 TB prefer ``repartitionByRange`` on the hash followed by
    ``sortWithinPartitions`` if the global order across shard boundaries
    doesn't matter — same determinism, no final merge."""
    out = df
    if shuffle_seed is not None:
        from pyspark.sql import functions as F

        cols = [F.col(c).cast("string") for c in df.columns]
        # secondary sort on the values themselves: a deterministic total
        # order even when distinct rows collide on the hash. Fully duplicate
        # rows still tie, but they are interchangeable — any arrangement of
        # identical rows yields identical shard contents.
        out = df.orderBy(F.xxhash64(F.lit(str(shuffle_seed)), *cols), *cols)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", records_per_shard)
        .parquet(path)
    )
    from pathlib import Path

    return len(list(Path(path).glob("*.parquet")))


def _morton_expr(x, y, bits: int = 16):
    """Interleave the low ``bits`` of two bucket ids (Morton / Z-curve).
    Pure Column bit-ops — JVM-side, codegen'd."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered along a Z-curve over two numeric columns:
    min-max bucket each column to ``bits`` bits (two scalar aggregates,
    broadcast), interleave into a Morton code, range-partition + sort on it.

    Why at 100 TB: a single-column sort gives perfect parquet min/max
    pruning on that column and NONE on any other; the Z-curve trades a
    little of the first column's locality for bounded min/max spans on
    BOTH, so row-group statistics prune scans filtered on either column.
    This is the file-level kernel of Delta/Iceberg ``OPTIMIZE ZORDER BY``.
    """
    from pyspark.sql import functions as F

    stats = df.agg(
        F.min(col_x).alias("xmin"), F.max(col_x).alias("xmax"),
        F.min(col_y).alias("ymin"), F.max(col_y).alias("ymax"),
    ).collect()[0]
    if stats.xmin is None:  # empty input: write the empty dataset and stop
        df.write.mode("overwrite").parquet(path)
        return
    span = (1 << bits) - 1

    def bucket(c, lo, hi):
        rng = max(float(hi) - float(lo), 1e-12)
        return ((F.col(c).cast("double") - F.lit(float(lo))) / F.lit(rng) * span).cast("long")

    z = _morton_expr(bucket(col_x, stats.xmin, stats.xmax), bucket(col_y, stats.ymin, stats.ymax), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
