"""ORC tail reader (sources/orc_meta.py): postscript/footer/stripe
stats decoded from Spark-native ORC files under all five writable
codecs, cross-checked against pyarrow.orc (an independent reader) and
against the data itself; multi-stripe + null + negative-min (sint64
zigzag) fixtures via pyarrow's ORC writer."""
from __future__ import annotations

import glob

import pytest

from etl_everywhere_hub_spark.sources.orc_meta import (
    orc_tail,
    read_orc_tail,
)

CODECS = ["none", "zlib", "snappy", "zstd", "lz4"]


@pytest.mark.parametrize("codec", CODECS)
def test_spark_written_orc_all_codecs(spark, tmp_path, codec):
    """Spark's native ORC writer is the foreign encoder; our tail
    decode must recover rows, stripes, column names, and exact
    int/string statistics (including SUM — ORC's extra over parquet)
    under every codec, each routed through the repo's own from-spec
    codec modules."""
    import pyarrow.orc as po

    n = 3000
    df = spark.range(n).selectExpr(
        "id as k", "cast(id * 7 % 101 - 50 as long) as v",
        "concat('w', lpad(cast(id % 20 as string), 2, '0')) as s")
    out = str(tmp_path / codec)
    df.coalesce(1).write.option("compression", codec).orc(out)
    f = glob.glob(out + "/part-*.orc")[0]
    t = orc_tail(read_orc_tail(f))
    assert t["codec"] == ("NONE" if codec == "none" else codec.upper())
    assert t["num_rows"] == n
    assert sum(s["num_rows"] for s in t["stripes"]) == n
    assert t["columns"] == {0: "<root>", 1: "k", 2: "v", 3: "s"}
    ks, vs, ss = (t["file_stats"][i] for i in (1, 2, 3))
    assert (ks["min"], ks["max"], ks["sum"]) == (0, n - 1,
                                                 n * (n - 1) // 2)
    # negative minimum: the sint64 zigzag trap — a plain varint read
    # would return a huge positive number here
    assert vs["min"] == -50 and vs["max"] == 50
    assert vs["sum"] == sum(i * 7 % 101 - 50 for i in range(n))
    assert ss["min"] == "w00" and ss["max"] == "w19"
    assert ss["sum"] == 3 * n          # total string length
    assert not ks["has_null"]
    # independent reader agreement
    o = po.ORCFile(f)
    assert o.nrows == n and o.nstripes == len(t["stripes"])
    assert o.compression.upper().replace("UNCOMPRESSED", "NONE") \
        == t["codec"] or t["codec"] == "NONE"


def test_multi_stripe_nulls_and_per_stripe_tightening(tmp_path):
    """pyarrow's ORC writer (second foreign encoder) with a small
    stripe size: per-stripe statistics must align with the stripe
    walk, count non-null only (ORC's numberOfValues semantics), and
    tighten vs the file-global range — the stripe-pruning story."""
    import pyarrow as pa
    import pyarrow.orc as po

    n = 200_000
    tbl = pa.table({
        "k": pa.array(
            [None if i % 11 == 0 else i for i in range(n)],
            type=pa.int64()),
    })
    f = str(tmp_path / "ms.orc")
    po.write_table(tbl, f, stripe_size=64 * 1024)
    t = orc_tail(read_orc_tail(f))
    assert len(t["stripes"]) > 1
    assert t["num_rows"] == n
    ks = t["file_stats"][1]
    non_null = n - len(range(0, n, 11))
    assert ks["num_values"] == non_null and ks["has_null"]
    assert ks["min"] == 1 and ks["max"] == n - 1
    assert len(t["stripe_stats"]) == len(t["stripes"])
    rows_so_far = 0
    seen = 0
    for stripe, cols in zip(t["stripes"], t["stripe_stats"]):
        st = cols[1]
        lo, hi = rows_so_far, rows_so_far + stripe["num_rows"] - 1
        assert lo <= st["min"] <= st["max"] <= hi
        seen += st["num_values"]
        rows_so_far += stripe["num_rows"]
    assert seen == non_null
    # a middle stripe cannot contain key 1 — pruning is real
    mid = t["stripe_stats"][len(t["stripe_stats"]) // 2][1]
    assert mid["min"] > 1


def test_double_stats_and_tail_errors(spark, tmp_path):
    df = spark.range(100).selectExpr("cast(id as double) / 4 as d")
    out = str(tmp_path / "dbl")
    df.coalesce(1).write.option("compression", "zlib").orc(out)
    f = glob.glob(out + "/part-*.orc")[0]
    t = orc_tail(read_orc_tail(f))
    ds = t["file_stats"][1]
    assert ds["min"] == 0.0 and ds["max"] == 99 / 4
    assert abs(ds["sum"] - sum(i / 4 for i in range(100))) < 1e-9
    with pytest.raises(ValueError, match="not ORC"):
        orc_tail(b"\x00" * 64)
    with pytest.raises(ValueError, match="widen the tail"):
        orc_tail(read_orc_tail(f)[-20:])
    with pytest.raises(ValueError, match="shorter than"):
        orc_tail(b"OR")
