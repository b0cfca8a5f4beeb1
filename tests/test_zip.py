"""ZIP archive walk (multimodal/ziparchive.py) pinned BOTH DIRECTIONS
against stdlib zipfile (the in-container foreign implementation):
stored + deflated + unicode names + ZIP64 (per-entry extras AND the
saturated-EOCD path), directory-only listing vs per-member decode,
and a loud corruption matrix."""
from __future__ import annotations

import io
import struct
import zipfile

import pytest

from etl_everywhere_hub_spark.multimodal.ziparchive import (
    zip_entries,
    zip_extract_all,
    zip_member,
    zip_write,
)

MEMBERS = [
    ("a/b.txt", b"hello world " * 200),
    ("data.jsonl", b'{"x":1}\n{"x":2}\n'),
    ("unicode-é中.txt", "café 中文".encode()),
    ("incompressible.bin", bytes(range(256)) * 4),
]


def test_stdlib_reads_our_writer():
    for compress in (True, False):
        blob = zip_write(MEMBERS, compress=compress)
        zf = zipfile.ZipFile(io.BytesIO(blob))
        assert zf.testzip() is None          # stdlib verifies CRCs
        assert [(n, zf.read(n)) for n in zf.namelist()] == MEMBERS
        # determinism (house rule)
        assert zip_write(MEMBERS, compress=compress) == blob


def test_we_read_stdlib_mixed_methods():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        for n, b in MEMBERS:
            z.writestr(n, b)
        z.writestr("stored.bin", b"\x00\xff" * 100,
                   compress_type=zipfile.ZIP_STORED)
        z.writestr("dir/", b"")
    data = buf.getvalue()
    entries = zip_entries(data)
    assert {e["method"] for e in entries if not e["is_dir"]} == \
        {"stored", "deflate"}
    assert [e["name"] for e in entries if e["is_dir"]] == ["dir/"]
    got = zip_extract_all(data)
    assert got == MEMBERS + [("stored.bin", b"\x00\xff" * 100)]


def test_random_access_per_member_slice():
    """The central-directory scale story: decode ONE member from a
    slice covering only [offset, offset+header+csize) plus the
    directory — a range-read, not the archive."""
    blob = zip_write(MEMBERS)
    entries = zip_entries(blob)
    e = entries[1]
    end = e["offset"] + 30 + len(e["name"].encode()) + \
        e["compressed_size"]
    sliced = blob[:end]          # the later members' bytes absent
    assert zip_member(sliced, e) == MEMBERS[1][1]


def test_zip64_per_entry_extra():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        with z.open("big.txt", "w", force_zip64=True) as f:
            f.write(b"payload " * 1000)
    data = buf.getvalue()
    (e,) = zip_entries(data)
    assert e["uncompressed_size"] == 8000
    assert zip_member(data, e) == b"payload " * 1000


def test_zip64_saturated_eocd():
    """> 65535 entries forces the ZIP64 EOCD + locator path."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as z:
        for i in range(65600):
            z.writestr("f%05d" % i, b"x")
    data = buf.getvalue()
    entries = zip_entries(data)
    assert len(entries) == 65600
    assert zip_member(data, entries[-1]) == b"x"


def test_corruption_matrix_is_loud():
    blob = bytearray(zip_write(MEMBERS))
    entries = zip_entries(bytes(blob))
    # flip a compressed payload byte -> CRC catches it (or the
    # inflate itself chokes; silence is the only wrong answer)
    e = entries[0]
    at = e["offset"] + 30 + len(e["name"].encode()) + 5
    bad = bytearray(blob)
    bad[at] ^= 0xFF
    with pytest.raises(ValueError):
        zip_member(bytes(bad), e)
    # CRC field itself tampered in the directory
    e2 = dict(e, crc32=e["crc32"] ^ 1)
    with pytest.raises(ValueError, match="CRC-32 mismatch"):
        zip_member(bytes(blob), e2)
    # directory/local name disagreement refuses (zip-smuggling shape)
    e3 = dict(entries[1], name="a/b.txt")
    with pytest.raises(ValueError, match="refusing inconsistent"):
        zip_member(bytes(blob), e3)
    with pytest.raises(ValueError, match="no End of Central"):
        zip_entries(b"PK\x03\x04" + bytes(64))
    # a directory entry claiming an alien method (93 = zstd per
    # APPNOTE) while the local header says deflate refuses on the
    # mismatch — and a consistent-but-unimplemented method refuses
    # as unsupported (both loud, never a garbage decode)
    eu = dict(entries[0], method=93)
    with pytest.raises(ValueError, match="method mismatch"):
        zip_member(bytes(blob), eu)


def test_bzip2_and_lzma_methods_via_stdlib():
    """ZIP methods 12 and 14 route to the repo's own bzip2 and LZMA
    decoders; stdlib zipfile is the foreign encoder for both. The
    LZMA member carries the APPNOTE 5.8 props header, and the decode
    is bounded by the directory's uncompressed size (the optional
    end-of-stream marker never needs consuming)."""
    payload = b"lzma payload data " * 300 + bytes(range(256))
    for comp, name in [(zipfile.ZIP_BZIP2, "bzip2"),
                       (zipfile.ZIP_LZMA, "lzma")]:
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", comp) as z:
            z.writestr("m.bin", payload)
            z.writestr("empty.bin", b"")
        e, e2 = zip_entries(buf.getvalue())
        assert e["method"] == name
        assert zip_member(buf.getvalue(), e) == payload
        assert zip_member(buf.getvalue(), e2) == b""


def test_truncated_member_and_eocd_comment():
    blob = zip_write(MEMBERS)
    entries = zip_entries(blob)
    with pytest.raises(ValueError, match="truncated member"):  # header cut
        zip_member(blob[:entries[-1]["offset"] + 40], entries[-1])
    # EOCD followed by an archive comment still parses
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("c.txt", b"with comment")
        z.comment = b"trailing archive comment bytes"
    data = buf.getvalue()
    assert zip_extract_all(data) == [("c.txt", b"with comment")]


def test_no_multimodal_submodule_shadows_a_builtin():
    """Importing a package submodule binds its name in the package
    namespace, so a submodule named after a builtin silently shadows
    that builtin for every function defined in __init__.py — the
    round-12 'zip.py' bug (frame_sampling/resize_images crashed with
    "'module' object is not callable" once multimodal.zip had been
    imported anywhere in the process). The module is now
    ziparchive.py; this pins the whole class of failure."""
    import builtins
    import pkgutil

    import etl_everywhere_hub_spark.multimodal as mm

    for info in pkgutil.iter_modules(mm.__path__):
        assert not hasattr(builtins, info.name), (
            f"multimodal submodule {info.name!r} shadows builtins.{info.name}"
        )
