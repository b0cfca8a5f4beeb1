"""Catalog sweep + stats pruning (sources/catalog_sweep.py): the
distributed tail-read operator over directory trees of parquet,
proven conservative (every pruned file re-read in full contains zero
matches) AND useful (a range-clustered fixture must actually drop
files)."""
from __future__ import annotations

import pytest

from etl_everywhere_hub_spark.sources.catalog_sweep import (
    prune_files,
    sweep_parquet_footers,
)


@pytest.fixture(scope="module")
def clustered(spark, tmp_path_factory):
    """16 range-clustered files: repartitionByRange on k gives each
    file a disjoint key band — the layout stats pruning exists for."""
    root = str(tmp_path_factory.mktemp("clustered"))
    df = spark.range(64_000).selectExpr(
        "id as k", "id % 997 as v", "concat('s', id % 50) as s")
    df.repartitionByRange(16, "k").write.mode("overwrite").parquet(root)
    return root


def test_sweep_matches_data(spark, clustered):
    stats = sweep_parquet_footers(spark, clustered).cache()
    ks = stats.filter(stats.column == "k").collect()
    assert len({r.file for r in ks}) == 16
    assert sum(r.num_values for r in ks) == 64_000
    assert min(r.min_long for r in ks) == 0
    assert max(r.max_long for r in ks) == 63_999
    # range clustering -> per-file bands are disjoint
    bands = sorted((r.min_long, r.max_long) for r in ks)
    for (lo1, hi1), (lo2, _hi2) in zip(bands, bands[1:]):
        assert hi1 < lo2
    # string columns carry renders, no longs
    ss = stats.filter(stats.column == "s").first()
    assert ss.min_long is None and ss.min_render.startswith("s")


def test_prune_is_useful_and_conservative(spark, clustered):
    stats = sweep_parquet_footers(spark, clustered).cache()
    kept = [r.file for r in
            prune_files(stats, "k", 10_000, 12_000).collect()]
    assert 0 < len(kept) <= 2          # usefulness: 16 -> at most 2
    # conservativeness: every DROPPED file truly has zero matches
    all_files = [r.file for r in stats.select("file")
                 .distinct().collect()]
    dropped = sorted(set(all_files) - set(kept))
    assert dropped
    for f in dropped:
        n = spark.read.parquet(f).filter(
            "k between 10000 and 12000").count()
        assert n == 0, f
    # and the kept files contain ALL the matches
    total = spark.read.parquet(clustered).filter(
        "k between 10000 and 12000").count()
    got = sum(spark.read.parquet(f).filter(
        "k between 10000 and 12000").count() for f in kept)
    assert got == total == 2001


def test_prune_keeps_statless_columns(spark, clustered):
    stats = sweep_parquet_footers(spark, clustered)
    # a column with no stats rows at all -> every file kept
    kept = prune_files(stats, "nosuch_col", 0, 1).count()
    assert kept == 16


def test_partitioned_layout_sweep(spark, tmp_path):
    """partitionBy leaves: each file holds one partition value, so
    per-file stats aggregate to the relational group-by — the q378
    oracle mechanism, pinned here at test scale."""
    root = str(tmp_path / "bydate")
    df = spark.range(5_000).selectExpr(
        "id as k", "cast(id % 4 as string) as part")
    df.repartition("part").write.partitionBy("part").parquet(root)
    stats = sweep_parquet_footers(spark, root)
    ks = stats.filter(stats.column == "k").collect()
    by_part = {}
    for r in ks:
        part = [seg for seg in r.file.split("/")
                if seg.startswith("part=")][0][5:]
        agg = by_part.setdefault(part, [0, None, None])
        agg[0] += r.num_values
        agg[1] = r.min_long if agg[1] is None else min(agg[1],
                                                       r.min_long)
        agg[2] = r.max_long if agg[2] is None else max(agg[2],
                                                       r.max_long)
    want = {
        str(p): [sum(1 for i in range(5_000) if i % 4 == p),
                 p, 4996 + p if p < 4 else None]
        for p in range(4)
    }
    for p in range(4):
        w = want[str(p)]
        w[2] = max(i for i in range(5_000) if i % 4 == p)
        assert by_part[str(p)] == w, p
