"""Physical layout tests (sources/layout.py): the write-time levers
that remove run-time shuffles at 100 TB, asserted on the plan."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_everywhere_hub_spark.plans import explain as X
from etl_everywhere_hub_spark.sources import layout


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_is_shuffle_free(spark, sf_dir, tmp_path, no_broadcast):
    """Same key, same bucket count → sort-merge join with ZERO
    exchanges; and the co-located result equals the plain join."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    layout.write_bucketed(li, "li_b", ["l_orderkey"], 8, path=str(tmp_path / "li"))
    layout.write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_b",
        ["l_orderkey"],
        8,
        path=str(tmp_path / "o"),
    )
    j = layout.colocated_join(spark, "li_b", "o_b", on="l_orderkey")
    assert X.exchange_count(j) == 0, X.physical_plan(j)[:2000]
    plain = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert j.count() == plain
    spark.sql("DROP TABLE li_b")
    spark.sql("DROP TABLE o_b")


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """A predicate on the partition column must become a planning-time
    PartitionFilter (directories pruned before I/O), and the pruned
    read must equal the unpruned filter."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    path = str(tmp_path / "events_by_type")
    layout.write_partitioned(e, path, ["event_type"])
    pruned = spark.read.parquet(path).filter(F.col("event_type") == "error")
    assert "event_type" in X.partition_filters(pruned), X.formatted_plan(pruned)[:2000]
    assert pruned.count() == e.filter(F.col("event_type") == "error").count()


def test_relational_hot_paths_have_no_python(spark, sf_dir):
    """Queries expressible in built-ins must compile to JVM-only plans
    (no BatchEvalPython / ArrowEvalPython nodes) — q66's trig included."""
    from etl_everywhere_hub_spark.queries import REGISTRY

    for name in ["q01_pricing_summary", "q17_revenue_by_nation", "q66_declination"]:
        df = REGISTRY[name].spark(spark, sf_dir)
        assert not X.has_python_eval(df), name


def test_sized_write_caps_file_records(spark, sf_dir, tmp_path):
    """write_sized must split output so no file exceeds
    maxRecordsPerFile — the small-files/huge-files hygiene knob."""
    import glob

    from etl_everywhere_hub_spark.sources.layout import write_sized

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    out = str(tmp_path / "sized")
    write_sized(orders, out, max_records_per_file=400)
    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= n // 400, files
    for f in files:
        assert spark.read.parquet(f).count() <= 400, f


def test_zorder_write_prunes_box_query(spark, sf_dir, tmp_path):
    """Z-order clustering must make 2-D box queries file-prunable:
    after write_zordered, the box's z interval must intersect only a
    minority of file footers' [min_z, max_z] (parquet min/max stats —
    what the reader's row-group skip consumes), while an unclustered
    layout spreads every file across the full z range (nothing
    prunes). Correctness: the z-prefiltered box read equals the
    direct box filter — the dominance-monotonicity superset proof."""
    import glob

    import pyarrow.parquet as pq

    from etl_everywhere_hub_spark.sources.layout import write_zordered, zorder_key

    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    pts = c.select(
        F.col("c_custkey").alias("id"),
        ((F.col("c_custkey") % 48) * 2 + (F.col("c_custkey") % 7))
        .cast("long")
        .alias("xi"),
        ((F.col("c_custkey") % 96) * 4 + (F.col("c_custkey") % 11))
        .cast("long")
        .alias("yi"),
    )
    zpath = str(tmp_path / "z")
    write_zordered(pts, zpath, "xi", "yi", bits=9, n_files=8)
    flat = str(tmp_path / "flat")
    pts.withColumn("z", zorder_key(F.col("xi"), F.col("yi"), 9)).repartition(
        8
    ).write.parquet(flat)

    def z_of(x, y):
        z = 0
        for b in range(9):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    zlo, zhi = z_of(16, 80), z_of(48, 160)

    def files_hit(path):
        hit = tot = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            zs = [
                (md.row_group(i).column(c).statistics.min,
                 md.row_group(i).column(c).statistics.max)
                for i in range(md.num_row_groups)
                for c in range(md.num_columns)
                if md.row_group(i).column(c).path_in_schema == "z"
            ]
            lo, hi = min(a for a, _ in zs), max(b for _, b in zs)
            tot += 1
            hit += int(not (hi < zlo or lo > zhi))
        return hit, tot

    z_hit, z_tot = files_hit(zpath)
    f_hit, f_tot = files_hit(flat)
    assert z_hit <= z_tot // 2, (z_hit, z_tot)     # clustered: most files skip
    assert f_hit == f_tot, (f_hit, f_tot)          # unclustered: nothing skips

    got = (
        spark.read.parquet(zpath)
        .filter(F.col("z").between(zlo, zhi))
        .filter(F.col("xi").between(16, 48) & F.col("yi").between(80, 160))
        .count()
    )
    want = pts.filter(
        F.col("xi").between(16, 48) & F.col("yi").between(80, 160)
    ).count()
    assert got == want


def test_orc_roundtrip_matches_parquet_source(spark, sf_dir, tmp_path):
    """ORC sink/source parity: writing the lineitem fixture as ORC and
    reading it back yields bit-identical rows and schema (ORC is the
    second columnar format Spark ships natively; a lakehouse migration
    path should not change a single value). Timestamp columns survive
    with UTC semantics because the session timezone is pinned."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = str(tmp_path / "lineitem_orc")
    li.write.format("orc").mode("overwrite").save(out)
    back = spark.read.format("orc").load(out)
    assert back.schema == li.schema
    fp = lambda df: (  # noqa: E731 — order-free content fingerprint
        df.select(F.md5(F.to_json(F.struct(*sorted(df.columns)))).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.conv(F.substring("h", 1, 15), 16, 10).cast("decimal(38,0)")).alias("s"))
        .collect()[0]
    )
    assert fp(back) == fp(li)
