"""ustar (POSIX.1-1988 tar) member walk, dependency-free — round 12.

Why this belongs in the engine: the corpus drops that ship as
compressed TARBALLS — OpenWebText is literally millions of text
files in .tar.xz parts — need a member walk after the codec layer
(multimodal/xz.py) before any text op can run. The format is the
512-byte-block ustar layout from POSIX.1-1988 (the "magic ustar"
header everybody emits); stdlib ``tarfile`` is the FOREIGN encoder
every fixture is pinned against (tests/test_xz.py), same posture as
bz2/lzma.

Implemented from the public header layout: the 512-byte header
(name/mode/uid/gid/size/mtime/chksum/typeflag/linkname/magic/
version/uname/gname/devmajor/devminor/prefix fields at their fixed
offsets), octal number parsing with NUL/space termination, the
checksum rule (byte sum with the chksum field read as 8 spaces,
stored as octal), prefix+name joining, content padding to the block
size, and the two-zero-block terminator. Regular files only —
anything else raises loudly (a corpus tarball holding symlinks or
devices is a pipeline bug upstream, not something to silently
skip).

Scale posture: the member walk returns byte offsets inside the
DECODED stream, so a distributed reader can hand (shard, member)
units to workers; the walk itself is O(#members) header reads.
"""
from __future__ import annotations

_BLOCK = 512


def _octal(field: bytes, what: str) -> int:
    s = field.split(b"\0", 1)[0].strip(b" \0")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ValueError(f"tar: bad octal in {what}: {field!r}") from exc


def _cstr(field: bytes) -> str:
    return field.split(b"\0", 1)[0].decode("utf-8")


def tar_members(data: bytes) -> list:
    """Walk a tar archive: [{name, size, offset, data}] for every
    regular-file member, after verifying each header checksum, the
    ustar magic, and the two-zero-block terminator."""
    out = []
    pos = 0
    n = len(data)
    while True:
        if pos + _BLOCK > n:
            raise ValueError("tar: archive ends without terminator blocks")
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\0" * _BLOCK:
            # terminator: a second zero block must follow
            if data[pos + _BLOCK : pos + 2 * _BLOCK] != b"\0" * _BLOCK:
                raise ValueError("tar: lone zero block (need two)")
            return out
        magic = hdr[257:263]
        if magic not in (b"ustar\0", b"ustar "):
            raise ValueError(f"tar: bad magic {magic!r} at byte {pos}")
        want = _octal(hdr[148:156], "chksum")
        got = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if got != want:
            raise ValueError(
                f"tar: header checksum mismatch at byte {pos} "
                f"(got {got}, header says {want})"
            )
        typeflag = hdr[156:157]
        size = _octal(hdr[124:136], "size")
        name = _cstr(hdr[0:100])
        prefix = _cstr(hdr[345:500])
        if prefix:
            name = prefix + "/" + name
        if typeflag not in (b"0", b"\0"):
            raise ValueError(
                f"tar: non-regular member {name!r} (typeflag {typeflag!r}) "
                "— corpus tarballs hold files only"
            )
        body_start = pos + _BLOCK
        if body_start + size > n:
            raise ValueError(f"tar: member {name!r} truncated")
        out.append(
            {
                "name": name,
                "size": size,
                "offset": body_start,
                "data": data[body_start : body_start + size],
            }
        )
        pos = body_start + ((size + _BLOCK - 1) // _BLOCK) * _BLOCK
