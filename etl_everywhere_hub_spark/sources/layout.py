"""Physical table layout for scale (SURVEY §4 / 100 TB posture).

The reference's single-record Lambda never faces layout choices; at
100 TB they decide whether every join re-shuffles the fact table.
Two levers, both pure Spark:

- **Bucketing**: persist a table pre-hash-partitioned (and sorted) on
  its join key. Two tables bucketed on the same key with the same
  bucket count sort-merge-join with ZERO exchanges — the shuffle is
  paid once at write time and amortized over every subsequent join.
  This is the "co-located join" story for a fact table joined daily.
- **Hive-style partitioned writes**: directory-encode a low-cardinality
  column so predicates on it prune whole directories at planning time
  (`PartitionFilters` in the scan, before any I/O).

Both are metadata-driven: Catalyst picks them up from the catalog /
file layout with no query-side changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` bucketed (and sorted) by ``keys`` as a catalog
    table. ``path`` makes it an external table (tests use a tmpdir);
    bucketing metadata lives in the session catalog either way — the
    in-memory catalog suffices, no Hive metastore required.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str, how: str = "inner"
) -> DataFrame:
    """Join two same-key same-bucket-count tables shuffle-free.

    The merge hint pins sort-merge (a broadcast plan would be legal but
    re-introduces a broadcast exchange; at 100 TB neither side of a
    fact-fact join broadcasts). With matching bucket layouts Catalyst
    emits an SMJ with no Exchange on either side.
    """
    return spark.table(left_table).hint("merge").join(spark.table(right_table), on=on, how=how)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """Hive-style directory-partitioned parquet write. Predicates on
    ``partition_cols`` become planning-time ``PartitionFilters`` —
    directories never listed, files never opened."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_sized(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    partition_cols: list[str] | None = None,
) -> None:
    """Size-governed parquet write — the small-files defense at scale.

    REBALANCE (an AQE hint, honored at write time) first evens out
    partition sizes (splitting skewed ones, coalescing tiny ones), then
    ``maxRecordsPerFile`` caps each output file, so a 100 TB write
    yields uniformly-sized files instead of one file per upstream
    partition (a 16k-partition shuffle would otherwise write 16k files
    per directory — metadata poison for every later scan)."""
    writer = (
        df.hint("rebalance")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def zorder_key(x_col, y_col, bits: int = 9):
    """Morton/Z-order interleave of two non-negative integer grid
    coordinates (Column expressions) into one sort key — the
    multi-dimensional clustering lever (Delta OPTIMIZE ZORDER, Hudi
    space-filling curves) expressed as pure codegen bit arithmetic.

    Sorting/range-partitioning a table by z co-locates rows that are
    close in BOTH dimensions, so parquet row-group min/max stats (and
    hive partitions on a z prefix) prune 2-D box queries — a 1-D sort
    on x prunes only x. The z range [z(x1,y1), z(x2,y2)] is a proven
    SUPERSET of any box [x1..x2]x[y1..y2]: Morton order is monotone
    under componentwise dominance (at the highest differing bit of
    the interleaved words, the dominating point has 1 vs 0), so a
    z-range prefilter plus the exact box residual loses nothing.
    """
    from pyspark.sql import functions as F

    xi = x_col.cast("long")
    yi = y_col.cast("long")
    z = F.lit(0).cast("long")
    for b in range(bits):
        z = z + F.shiftleft(F.shiftright(xi, b).bitwiseAND(F.lit(1)), 2 * b)
        z = z + F.shiftleft(
            F.shiftright(yi, b).bitwiseAND(F.lit(1)), 2 * b + 1
        )
    return z


def write_zordered(
    df: DataFrame, path: str, x_col: str, y_col: str, bits: int = 9, n_files: int = 8
) -> None:
    """Write parquet range-partitioned and sorted by the z key: each
    output file covers a compact z interval, so its parquet footer
    min/max on ``z`` prunes 2-D box queries at scan time."""
    from pyspark.sql import functions as F

    (
        df.withColumn("z", zorder_key(F.col(x_col), F.col(y_col), bits))
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )
