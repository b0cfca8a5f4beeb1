"""Distributed footer catalog sweep + stats-based file pruning —
round 12.

Why this belongs in the engine: q372/q374 proved the per-file tail
decode (sources/parquet_meta.py, sources/orc_meta.py); THIS module is
the operator a planner actually calls — sweep a directory tree of
parquet files with one tail range-read per file, land the per-column
statistics in a DataFrame, and prune a file list against a predicate
WITHOUT any data-page read. It is deltalite's add-stats pruning
(sources/deltalite.py) generalized to tables that have no log — the
"someone handed me a directory of parquet" case every lake has.

Mechanics:
- ``sweep_parquet_footers``: binaryFile-style listing (paths only;
  content is NOT shipped — the task re-opens the file and reads only
  the TAIL, read_footer_tail's range-request shape), decode per
  Arrow batch, one output row per (file, row group, column) with
  num_values / null_count and min/max in BOTH a lexical rendering
  and exact longs for integer physical types. Bytes moved:
  O(files x footer-KBs).
- ``prune_files``: conservative overlap filter on the stats
  DataFrame — a file survives unless its [min, max] provably
  excludes the probe (missing stats -> keep; the result-preserving
  rule deltalite's pruner follows). Row-group granularity falls out
  of the same frame (filter on row_group instead of aggregating).

Correctness story (tests/test_catalog_sweep.py + q378): on a
PARTITIONED write, each leaf file holds exactly one partition value,
so per-file stats restate relationally as group-by aggregates — the
oracle proves the sweep. Pruning is proven the strong way: every
file the pruner DROPS is re-read in full and shown to contain zero
matching rows (conservativeness), and the pruner must drop a
nonzero count on a range-clustered fixture (usefulness).

Scale posture: the sweep is one map-only job over the file list —
at a million files it is the metadata plane of SCALE.md §2r; the
stats DataFrame is small (files × columns rows) and can itself be
cached/broadcast to plan many probes.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def sweep_parquet_footers(spark: SparkSession, root: str) -> DataFrame:
    """One row per (file, row_group, column): footer-decoded stats.
    ``root`` is a directory or glob of parquet files; listing uses
    Spark's binaryFile source for its recursive glob semantics but
    selects ONLY paths — file bytes never enter the plan; each task
    re-opens its files and reads just the tail."""
    import pandas as pd

    paths = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select("path")
    )

    def decode(batches):
        from etl_everywhere_hub_spark.sources.parquet_meta import (
            footer_stats,
            read_footer_tail,
        )

        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                local = path.replace("file:", "", 1)
                for s in footer_stats(read_footer_tail(local)):
                    # plain ints AND signed sized-int annotations
                    # (INTEGER(n,signed)) order as longs; unsigned
                    # 64-bit would mis-order under a signed decode,
                    # so it stays render-only (conservative: the
                    # pruner keeps files with NULL min/max)
                    lg = s["logical"]
                    is_int = s["type"] in ("INT32", "INT64") and (
                        lg is None
                        or (lg.startswith("INTEGER(")
                            and lg.endswith(",signed)"))
                    )
                    rows.append((
                        local, s["row_group"], s["path"], s["type"],
                        s["num_values"], s["null_count"],
                        None if s["min"] is None else str(s["min"]),
                        None if s["max"] is None else str(s["max"]),
                        s["min"] if is_int and s["min"] is not None
                        else None,
                        s["max"] if is_int and s["max"] is not None
                        else None,
                    ))
            yield pd.DataFrame(rows, columns=[
                "file", "row_group", "column", "ptype", "num_values",
                "null_count", "min_render", "max_render",
                "min_long", "max_long",
            ])

    schema = (
        "file string, row_group int, column string, ptype string, "
        "num_values long, null_count long, min_render string, "
        "max_render string, min_long long, max_long long"
    )
    # repartition the (tiny) path list so tail reads fan out even
    # when the listing arrives as one split
    return paths.repartition(32).mapInPandas(decode, schema)


def prune_files(stats: DataFrame, column: str, lo, hi) -> DataFrame:
    """Files that MAY contain rows with ``column`` in [lo, hi] —
    conservative: a file is dropped only when EVERY row group's
    stats provably exclude the range; files without usable stats for
    the column are kept (result-preserving, the deltalite rule).
    Returns a one-column ``file`` DataFrame."""
    col_stats = stats.filter(F.col("column") == column)
    overlaps = col_stats.filter(
        F.col("min_long").isNull() | F.col("max_long").isNull()
        | ((F.col("max_long") >= F.lit(lo))
           & (F.col("min_long") <= F.lit(hi)))
    ).select("file").distinct()
    # files that have NO stats row for the column at all: keep
    all_files = stats.select("file").distinct()
    with_col = col_stats.select("file").distinct()
    statless = all_files.join(with_col, "file", "left_anti")
    return overlaps.union(statless).distinct()
