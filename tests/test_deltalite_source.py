"""Deltalite Python DataSource tests (sources/deltalite_source.py):
listing-free batch reads with time travel, the version-offset
streaming source (resume exactly-once, append-only contract,
skipChangeCommits, OPTIMIZE transparency), partition-column
re-attachment."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from etl_everywhere_hub_spark.sources.deltalite import DeltaliteTable
from etl_everywhere_hub_spark.sources.deltalite_source import (
    register_deltalite_source,
)


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="dls_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture()
def table(spark, tdir):
    register_deltalite_source(spark)
    t = DeltaliteTable(spark, os.path.join(tdir, "t"))
    t.create(
        spark.createDataFrame([(1, 10, "a"), (2, 20, "b")], ["k", "v", "seg"]),
        partition_by=["seg"],
    )
    t.append(spark.createDataFrame([(3, 30, "a")], ["k", "v", "seg"]))
    return t


def _run(spark, tp, ckpt, sink, **opts):
    reader = spark.readStream.format("deltalite").option("path", tp)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_batch_read_and_time_travel(spark, table):
    df = spark.read.format("deltalite").option("path", table.path).load()
    assert sorted((r.k, r.v, r.seg) for r in df.collect()) == [
        (1, 10, "a"), (2, 20, "b"), (3, 30, "a"),
    ]
    # partition column typed per metadata and populated from hive dirs
    assert dict(df.dtypes)["seg"] == "string"
    v0 = (
        spark.read.format("deltalite")
        .option("path", table.path)
        .option("versionAsOf", "0")
        .load()
    )
    assert v0.count() == 2


def test_stream_reads_then_resumes_exactly_once(spark, table, tdir):
    ckpt, sink = os.path.join(tdir, "ck"), os.path.join(tdir, "sink")
    _run(spark, table.path, ckpt, sink)
    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    # no new commits -> a resumed run adds nothing
    _run(spark, table.path, ckpt, sink)
    assert spark.read.parquet(sink).count() == 3
    # one append -> exactly its rows arrive
    table.append(spark.createDataFrame([(4, 40, "b")], ["k", "v", "seg"]))
    _run(spark, table.path, ckpt, sink)
    got = sorted((r.k, r.v) for r in spark.read.parquet(sink).collect())
    assert got == [(1, 10), (2, 20), (3, 30), (4, 40)]


def test_stream_append_only_contract(spark, table, tdir):
    table.delete("k = 1")
    with pytest.raises(Exception, match="append-only"):
        _run(
            spark, table.path,
            os.path.join(tdir, "ck2"), os.path.join(tdir, "s2"),
        )
    # skipChangeCommits skips the delete commit WHOLE: k=1 still
    # visible (it arrived in an earlier append), k=5 not lost
    table.append(spark.createDataFrame([(5, 50, "a")], ["k", "v", "seg"]))
    _run(
        spark, table.path,
        os.path.join(tdir, "ck3"), os.path.join(tdir, "s3"),
        skipChangeCommits="true",
    )
    got = sorted(r.k for r in spark.read.parquet(os.path.join(tdir, "s3")).collect())
    assert got == [1, 2, 3, 5]


def test_stream_skips_optimize_commits(spark, table, tdir):
    table.optimize(target_file_bytes=1 << 20)
    ckpt, sink = os.path.join(tdir, "ck4"), os.path.join(tdir, "s4")
    _run(spark, table.path, ckpt, sink)
    # compaction contributed no rows (dataChange: false)
    assert spark.read.parquet(sink).count() == 3


def test_stream_starting_version(spark, table, tdir):
    _run(
        spark, table.path,
        os.path.join(tdir, "ck5"), os.path.join(tdir, "s5"),
        startingVersion="1",
    )
    got = sorted(r.k for r in spark.read.parquet(os.path.join(tdir, "s5")).collect())
    assert got == [3]  # only the append commit


def test_batch_equals_table_read(spark, table):
    a = spark.read.format("deltalite").option("path", table.path).load()
    b = table.read()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # and both agree with the aggregate
    assert (
        a.agg(F.sum("v")).collect()[0][0]
        == b.agg(F.sum("v")).collect()[0][0]
        == 60
    )
