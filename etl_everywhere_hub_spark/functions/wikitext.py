"""Wikipedia-dump page fixtures + wikitext stripping — round 12.

The companion to multimodal/bzip2.py: a Wikipedia multistream dump
is independent bzip2 streams each holding a run of ``<page>``
elements (title / ns / id / revision / text). This module builds
spec-shaped fixtures (pages, streams, whole multistream shards —
compressed with stdlib ``bz2``, i.e. libbzip2 as a FOREIGN encoder)
and provides the wikitext → plain-text strip both as a Python
reference and as a pure-Column regexp chain (the engine path: after
``from_xml`` recovers the raw markup JVM-side, the strip stays
JVM-side too — zero Python in the hot path past the bz2 decode).

Strip rules implemented (the subset the fixtures exercise, applied
in an order that is confluent for them):
- ``== Heading ==`` lines lose their markers,
- ``[[target|label]]`` → label, ``[[target]]`` → target,
- bold ``'''x'''`` then italics ``''x''`` markers drop.

Fixture geometry (shared by the builder, the oracle SQL in q363 and
tests — change one, change all): per document with text length L,
k = 1 + doc_id % 3 streams; stream j compresses at level
1 + (doc_id + j) % 9 and holds 1 + (doc_id + j) % 2 pages; page p
rotates six L//6 text chunks by rot = (2j + p) % 6 into slices
A..F and wraps them in markup that also carries raw ``&``, ``<``,
``>`` — so XML entity escaping is load-bearing: one wrong codepoint
anywhere (bz2, XML, entities, strip) changes the stripped md5.
"""
from __future__ import annotations

import bz2

from pyspark.sql import Column
from pyspark.sql import functions as F


def xml_escape(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _slices(text: str, rot: int) -> list:
    L = len(text)
    out = []
    for i in range(6):
        c = (i + rot) % 6
        out.append(text[c * L // 6 : (c + 1) * L // 6])
    return out


def build_wikitext(mid: int, j: int, p: int, text: str) -> str:
    """The page's RAW markup (pre-escaping)."""
    a, b, c, d, e, f = _slices(text, (2 * j + p) % 6)
    sp = mid % 7 + p
    return (
        f"== Section {sp} ==\n"
        f"'''{a}''' and ''{b}'' link [[Target {sp}|{c}]] "
        f"plain [[{d}]]&{e} <{f}>"
    )


def strip_wikitext(s: str) -> str:
    """Python reference for the Column chain below."""
    import re

    s = re.sub(r"(?m)^== (.*) ==$", r"\1", s)
    s = re.sub(r"\[\[([^\]|]*)\|([^\]]*)\]\]", r"\2", s)
    s = re.sub(r"\[\[([^\]]*)\]\]", r"\1", s)
    return s.replace("'''", "").replace("''", "")


def strip_wikitext_col(col: Column) -> Column:
    """JVM-side strip: three regexp_replace + two literal replaces,
    whole-stage-codegen friendly, no UDF."""
    s = F.regexp_replace(col, r"(?m)^== (.*) ==$", r"$1")
    s = F.regexp_replace(s, r"\[\[([^\]|]*)\|([^\]]*)\]\]", r"$2")
    s = F.regexp_replace(s, r"\[\[([^\]]*)\]\]", r"$1")
    s = F.replace(s, F.lit("'''"), F.lit(""))
    return F.replace(s, F.lit("''"), F.lit(""))


def build_wiki_page(mid: int, j: int, p: int, text: str) -> str:
    raw = build_wikitext(mid, j, p, text)
    page_id = mid * 100 + j * 10 + p
    return (
        "<page>\n"
        f"  <title>Doc {mid} part {j}.{p}</title>\n"
        "  <ns>0</ns>\n"
        f"  <id>{page_id}</id>\n"
        "  <revision>\n"
        f"    <id>{page_id + 7777}</id>\n"
        f'    <text bytes="{len(raw)}">{xml_escape(raw)}</text>\n'
        "  </revision>\n"
        "</page>"
    )


def build_wiki_shard(mid: int, text: str) -> tuple:
    """(multistream blob, [per-stream (level, n_pages, xml)]) for one
    document — each stream independently libbzip2-compressed, back to
    back: the Wikipedia multistream layout."""
    k = 1 + mid % 3
    streams = []
    blob = bytearray()
    for j in range(k):
        level = 1 + (mid + j) % 9
        n_pages = 1 + (mid + j) % 2
        xml = "\n".join(
            build_wiki_page(mid, j, p, text) for p in range(n_pages)
        ) + "\n"
        blob += bz2.compress(xml.encode(), level)
        streams.append((level, n_pages, xml))
    return bytes(blob), streams


def build_wiki_index(blob: bytes) -> bytes:
    """The dump's COMPANION INDEX, exactly as Wikimedia publishes it
    (``...-multistream-index.txt.bz2``): one ``offset:page_id:title``
    line per page, where offset is the byte position of the bzip2
    stream CONTAINING the page — the seek table a distributed reader
    fans out on without decompressing anything it doesn't need.
    Built here by walking the shard with the engine's own decoder,
    so the offsets are decode-verified, then bz2-compressed like the
    real artifact. Titles may contain ':' (real ones do); parsers
    must split on the FIRST TWO colons only."""
    from etl_everywhere_hub_spark.multimodal.bzip2 import bzip2_streams

    lines = []
    for st in bzip2_streams(blob):
        xml = st["data"].decode()
        pos = 0
        while True:
            t0 = xml.find("<title>", pos)
            if t0 < 0:
                break
            t1 = xml.index("</title>", t0)
            title = xml[t0 + 7 : t1]
            i0 = xml.index("<id>", t1)
            i1 = xml.index("</id>", i0)
            page_id = int(xml[i0 + 4 : i1])
            lines.append(f"{st['offset']}:{page_id}:{title}")
            pos = xml.index("</page>", i1)
    return bz2.compress(("\n".join(lines) + "\n").encode(), 9)


def parse_wiki_index(data: bytes) -> list:
    """[(stream_offset, page_id, title)] from an index file —
    splitting each line on the first two colons ONLY (titles contain
    colons in every real dump)."""
    from etl_everywhere_hub_spark.multimodal.bzip2 import decompress

    out = []
    for line in decompress(data).decode().splitlines():
        off, pid, title = line.split(":", 2)
        out.append((int(off), int(pid), title))
    return out
