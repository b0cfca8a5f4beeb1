"""Hadoop SequenceFile (multimodal/seqfile.py) pinned BOTH DIRECTIONS
against Spark's own JVM Hadoop stack: saveAsSequenceFile output
decodes exactly (Text and IntWritable, uncompressed + block
DefaultCodec/SnappyCodec/Lz4Codec), and sc.sequenceFile reads this
writer's files back under every codec the JVM side supports.
ZStandardCodec is env-blocked on the JVM (libhadoop built without
zstd) — ours-to-ours roundtrip covers it, the skip states the
recipe."""
from __future__ import annotations

import glob
import os

import pytest

from etl_everywhere_hub_spark.multimodal.seqfile import (
    BYTES_W,
    DEFAULT_CODEC,
    GZIP_CODEC,
    LZ4_CODEC,
    SNAPPY_CODEC,
    TEXT,
    ZSTD_CODEC,
    read_vint,
    seqfile_header,
    seqfile_records,
    seqfile_resync,
    seqfile_write,
    write_vint,
)

PAIRS = [("k%04d" % i, "value %d payload padding" % i)
         for i in range(3000)]


# ------------------------------------------------------------- VInt

def test_vint_known_encodings_and_roundtrip():
    """Hadoop WritableUtils encodings: one byte down to -112; 128 is
    the first two-byte positive (first byte -113 = 0x8F); -129 the
    first two-byte negative (first byte -121 = 0x87, body ~v)."""
    assert write_vint(127) == b"\x7f"
    assert write_vint(-112) == b"\x90"
    assert write_vint(128) == b"\x8f\x80"
    assert write_vint(-129) == b"\x87\x80"
    for v in list(range(-300, 300)) + [2**31, -(2**31), 2**62,
                                       -(2**62), 2**63 - 1, -(2**63)]:
        enc = write_vint(v)
        got, pos = read_vint(enc, 0)
        assert got == v and pos == len(enc), v
    with pytest.raises(ValueError, match="truncated VInt"):
        read_vint(b"", 0)
    with pytest.raises(ValueError, match="truncated VInt body"):
        read_vint(b"\x8f", 0)


# ------------------------------------------------- JVM foreign pins

def test_jvm_plain_text_we_read(spark, tmp_path):
    """saveAsSequenceFile without codec: Text/Text records with the
    JVM's own periodic sync escapes interleaved — our walk verifies
    each one."""
    sc = spark.sparkContext
    out = str(tmp_path / "plain")
    sc.parallelize(PAIRS, 1).saveAsSequenceFile(out)
    data = open(glob.glob(out + "/part-*")[0], "rb").read()
    hdr = seqfile_header(data)
    assert (hdr["key_class"], hdr["value_class"]) == (TEXT, TEXT)
    assert not hdr["record_compressed"] and not hdr["block_compressed"]
    recs = seqfile_records(data)
    assert [(k, v) for _, k, v in recs] == PAIRS
    # the JVM wrote real sync escapes into a file this size
    assert data.count(b"\xff\xff\xff\xff" + hdr["sync"]) > 0


def test_jvm_int_writables_we_read(spark, tmp_path):
    sc = spark.sparkContext
    out = str(tmp_path / "ints")
    sc.parallelize([(i, i * 7 - 50) for i in range(200)], 1) \
        .saveAsSequenceFile(out)
    data = open(glob.glob(out + "/part-*")[0], "rb").read()
    assert seqfile_header(data)["key_class"].endswith("IntWritable")
    recs = seqfile_records(data)
    assert [(k, v) for _, k, v in recs] == [
        (i, i * 7 - 50) for i in range(200)]


@pytest.mark.parametrize("codec", [DEFAULT_CODEC, SNAPPY_CODEC,
                                   LZ4_CODEC])
def test_jvm_block_compressed_we_read(spark, tmp_path, codec):
    """The JVM writes BLOCK-compressed files for these codecs (its
    default for saveAsSequenceFile with a codec class); every one of
    the four per-block buffers routes through the repo's own
    from-spec codec modules on our side."""
    sc = spark.sparkContext
    out = str(tmp_path / codec.rsplit(".", 1)[-1])
    sc.parallelize(PAIRS, 1).saveAsSequenceFile(out, codec)
    data = open(glob.glob(out + "/part-*")[0], "rb").read()
    hdr = seqfile_header(data)
    assert hdr["block_compressed"] and hdr["codec"] == codec
    recs = seqfile_records(data)
    assert [(k, v) for _, k, v in recs] == PAIRS


@pytest.mark.parametrize("name,kw", [
    ("plain", {}),
    ("rec_zlib", {"codec": DEFAULT_CODEC}),
    ("blk_zlib", {"codec": DEFAULT_CODEC, "block": True,
                  "block_records": 200}),
    ("rec_gzip", {"codec": GZIP_CODEC}),
    ("blk_snappy", {"codec": SNAPPY_CODEC, "block": True,
                    "block_records": 200}),
    ("blk_lz4", {"codec": LZ4_CODEC, "block": True,
                 "block_records": 200}),
])
def test_jvm_reads_what_we_write(spark, tmp_path, name, kw):
    """The reverse pin: sc.sequenceFile (the JVM Hadoop reader)
    consumes this writer's files — including our RECORD-compressed
    mode, which the JVM writer no longer defaults to but its reader
    must (and does) accept."""
    sc = spark.sparkContext
    d = str(tmp_path / name)
    os.makedirs(d)
    with open(d + "/part-00000", "wb") as fh:
        fh.write(seqfile_write(PAIRS[:800], TEXT, TEXT, **kw))
    assert sc.sequenceFile(d).collect() == PAIRS[:800]


def test_zstd_ours_to_ours_and_jvm_boundary(spark, tmp_path):
    """Hadoop's ZStandardCodec needs a native libhadoop built with
    zstd, absent here (checked live) — so the JVM pin for this one
    codec is env-blocked; ours-to-ours roundtrip (our zstd frames
    both directions) covers the format. Recipe: on a cluster with
    native zstd, rerun test_jvm_reads_what_we_write with
    ZSTD_CODEC."""
    blob = seqfile_write(PAIRS[:300], TEXT, TEXT, codec=ZSTD_CODEC,
                         block=True, block_records=100)
    recs = seqfile_records(blob)
    assert [(k, v) for _, k, v in recs] == PAIRS[:300]
    blob2 = seqfile_write(PAIRS[:50], TEXT, TEXT, codec=ZSTD_CODEC)
    assert [(k, v) for _, k, v in seqfile_records(blob2)] == PAIRS[:50]
    jvm = spark._jvm
    codec = jvm.org.apache.hadoop.io.compress.ZStandardCodec
    blocked = not jvm.org.apache.hadoop.util.NativeCodeLoader \
        .isNativeCodeLoaded()
    assert blocked or codec is not None  # document the live check


# ------------------------------------------------ split + loudness

def test_resync_resume_matches_tail(spark, tmp_path):
    """The split mechanism end-to-end on a JVM-written file: drop a
    worker at an arbitrary midpoint, seqfile_resync scans to the next
    sync escape, and the resumed walk yields exactly the records the
    full walk attributes past that point."""
    sc = spark.sparkContext
    out = str(tmp_path / "resync")
    sc.parallelize(PAIRS, 1).saveAsSequenceFile(out)
    data = open(glob.glob(out + "/part-*")[0], "rb").read()
    hdr = seqfile_header(data)
    full = seqfile_records(data)
    mid = len(data) // 2
    at = seqfile_resync(data, mid, hdr["sync"])
    resumed = seqfile_records(data, start=at)
    want = [(k, v) for off, k, v in full if off >= at]
    assert [(k, v) for _, k, v in resumed] == want
    assert 0 < len(resumed) < len(full)
    # block files resync too (the consumed escape is the block leader)
    blob = seqfile_write(PAIRS[:900], TEXT, TEXT, codec=DEFAULT_CODEC,
                         block=True, block_records=300)
    bh = seqfile_header(blob)
    at2 = seqfile_resync(blob, len(blob) // 2, bh["sync"])
    res2 = seqfile_records(blob, start=at2)
    full2 = seqfile_records(blob)
    assert [(k, v) for _, k, v in res2] == \
        [(k, v) for off, k, v in full2 if off >= at2 - 20]
    # past the last sync: no resume point in range
    assert seqfile_resync(data, len(data) - 4, hdr["sync"]) == len(data)


def test_corruption_and_unknowns_are_loud():
    blob = bytearray(seqfile_write(PAIRS[:2500], TEXT, TEXT,
                                   sync_interval=500))
    hdr = seqfile_header(bytes(blob))
    at = bytes(blob).index(b"\xff\xff\xff\xff" + hdr["sync"])
    blob[at + 8] ^= 0x01
    with pytest.raises(ValueError, match="sync marker mismatch"):
        seqfile_records(bytes(blob))
    with pytest.raises(ValueError, match="missing SEQ magic"):
        seqfile_header(b"NOTSEQ" + bytes(16))
    with pytest.raises(ValueError, match="unsupported version"):
        seqfile_header(b"SEQ\x04" + bytes(16))
    good = seqfile_write(PAIRS[:5], TEXT, TEXT)
    with pytest.raises(ValueError, match="truncated record"):
        seqfile_records(good[:-3])
    with pytest.raises(ValueError, match="unsupported writable"):
        seqfile_write([(1, 2)], "org.example.Custom", TEXT)
    with pytest.raises(ValueError, match="requires a codec"):
        seqfile_write([], TEXT, TEXT, block=True)


def test_bytes_writable_and_metadata_roundtrip():
    pairs = [(b"\x00\xffkey%d" % i, b"\xfe" * i) for i in range(40)]
    blob = seqfile_write(pairs, BYTES_W, BYTES_W,
                         metadata={"origin": "unit", "n": "40"})
    hdr = seqfile_header(blob)
    assert hdr["metadata"] == {"origin": "unit", "n": "40"}
    assert [(k, v) for _, k, v in seqfile_records(blob)] == pairs


def test_empty_values_every_codec_both_modes():
    """Round-12 review regression: the lz4 empty-block framing
    double-emitted a chunk header its own decoder rejected; every
    codec must round-trip empty values in record AND block modes."""
    pairs = [("k", ""), ("k2", "v"), ("k3", "")]
    from etl_everywhere_hub_spark.multimodal.seqfile import ZSTD_CODEC
    for codec in (None, DEFAULT_CODEC, GZIP_CODEC, SNAPPY_CODEC,
                  LZ4_CODEC, ZSTD_CODEC):
        modes = [(False, 0)] if codec is None else [(False, 0),
                                                   (True, 1)]
        for block, br in modes:
            blob = seqfile_write(pairs, codec=codec, block=block,
                                 block_records=max(br, 1))
            assert [(k, v) for _, k, v in seqfile_records(blob)] \
                == pairs, (codec, block)


def test_lz4_truncation_is_valueerror():
    """Round-12 review regression: truncated lz4 framing must raise
    ValueError (the module's contract), never struct.error."""
    from etl_everywhere_hub_spark.multimodal.seqfile import (
        _hadoop_lz4_compress,
        _hadoop_lz4_decompress,
    )
    blob = _hadoop_lz4_compress(b"payload " * 200, block=256)
    for cut in (2, 6, len(blob) - 3):
        with pytest.raises(ValueError, match="truncated lz4"):
            _hadoop_lz4_decompress(blob[:cut])


def test_zlib_preset_dictionary_refuses():
    """Round-12 review regression: the seqfile zlib path (now the
    shared deflate.zlib_unwrap) must refuse FDICT streams loudly."""
    from etl_everywhere_hub_spark.multimodal.deflate import zlib_unwrap
    # header with FDICT set and a valid FCHECK: 0x78 0x7D has
    # (0x78*256+0x7D) % 31 == 0 and bit 0x20 set
    hdr = None
    for flg in range(256):
        if flg & 0x20 and (0x78 * 256 + flg) % 31 == 0:
            hdr = bytes([0x78, flg])
            break
    assert hdr is not None
    with pytest.raises(ValueError, match="preset dictionary"):
        zlib_unwrap(hdr + b"\x00" * 16)
