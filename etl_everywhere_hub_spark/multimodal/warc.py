"""WARC (ISO 28500) record codec over gzip members — round 11.

The on-disk unit of real web-crawl corpora (Common Crawl, IA): a
``.warc.gz`` file is a CONCATENATION OF GZIP MEMBERS, one WARC record
per member, so readers can split at member boundaries and inflate
records independently — the property a distributed ingest fans out
on. This module implements, over multimodal/deflate.py:

- record grammar (ISO 28500 §4): ``WARC/1.0`` version line, CRLF
  header block (``WARC-Type``, ``WARC-Record-ID``, ``WARC-Date``,
  ``WARC-Target-URI``, ``Content-Length``, ...), CRLFCRLF separator,
  exactly Content-Length payload bytes, CRLFCRLF record terminator.
  Parse errors are loud (bad version line, missing Content-Length,
  truncated payload, missing terminator) — no silent resync.
- ``build_warc_gz`` / ``read_warc_gz``: member-per-record framing
  with per-record member offsets surfaced, the split points.

Scale shape: q353 runs the walk worker-side per Arrow batch; only
scalar record metadata leaves the worker. At crawl scale the member
offsets feed byte-range splits exactly like the MP4 keyframe ranges
(multimodal/mp4.py)."""

from __future__ import annotations

from etl_everywhere_hub_spark.multimodal.deflate import (
    gunzip_members,
    gzip_member,
)

_CRLF = b"\r\n"


def build_warc_record(
    rtype: str,
    payload: bytes,
    record_id: str,
    date: str = "2020-01-01T00:00:00Z",
    uri: str | None = None,
    extra_headers: list | None = None,
) -> bytes:
    """One uncompressed WARC/1.0 record with deterministic headers."""
    headers = [
        ("WARC-Type", rtype),
        ("WARC-Record-ID", f"<urn:uuid:{record_id}>"),
        ("WARC-Date", date),
    ]
    if uri is not None:
        headers.append(("WARC-Target-URI", uri))
    headers.extend(extra_headers or [])
    headers.append(("Content-Length", str(len(payload))))
    head = b"WARC/1.0" + _CRLF
    head += b"".join(
        f"{k}: {v}".encode("latin-1") + _CRLF for k, v in headers
    )
    return head + _CRLF + payload + _CRLF + _CRLF


def parse_warc_record(data: bytes, pos: int = 0) -> tuple:
    """Parse one record at ``pos``; returns (record dict, end pos).
    The dict: type, record_id, date, uri, headers (all, ordered),
    payload, offset."""
    start = pos
    eol = data.find(_CRLF, pos)
    if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
        raise ValueError("missing WARC version line")
    version = data[pos:eol].decode("latin-1")
    if version not in ("WARC/1.0", "WARC/1.1"):
        raise ValueError(f"unsupported WARC version {version!r}")
    pos = eol + 2
    headers: list = []
    while True:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("header block truncated")
        if eol == pos:  # blank line: end of headers
            pos += 2
            break
        line = data[pos:eol].decode("latin-1")
        if ":" not in line:
            raise ValueError(f"malformed header line {line!r}")
        k, _, v = line.partition(":")
        headers.append((k.strip(), v.strip()))
        pos = eol + 2
    hmap = {k.lower(): v for k, v in headers}
    if "content-length" not in hmap:
        raise ValueError("record missing Content-Length")
    n = int(hmap["content-length"])
    if pos + n + 4 > len(data):
        raise ValueError("payload truncated")
    payload = data[pos : pos + n]
    if data[pos + n : pos + n + 4] != _CRLF + _CRLF:
        raise ValueError("missing record terminator")
    return (
        {
            "type": hmap.get("warc-type"),
            "record_id": hmap.get("warc-record-id"),
            "date": hmap.get("warc-date"),
            "uri": hmap.get("warc-target-uri"),
            "headers": headers,
            "payload": payload,
            "offset": start,
        },
        pos + n + 4,
    )


def parse_warc_records(data: bytes) -> list:
    out = []
    pos = 0
    while pos < len(data):
        rec, pos = parse_warc_record(data, pos)
        out.append(rec)
    return out


def build_warc_gz(records: list, btype_cycle: tuple = (2, 1, 0)) -> bytes:
    """Member-per-record .warc.gz (the Common Crawl layout); block
    strategies cycle so fixtures exercise every inflate path."""
    return b"".join(
        gzip_member(rec, btype=btype_cycle[i % len(btype_cycle)])
        for i, rec in enumerate(records)
    )


def read_warc_gz(data: bytes) -> list:
    """Walk members, inflate each, parse exactly one record per
    member (the layout contract — a member holding 0 or 2+ records
    raises, catching writers that broke splittability). Each record
    carries its member byte range for split planning."""
    out = []
    for m in gunzip_members(data):
        recs = parse_warc_records(m["payload"])
        if len(recs) != 1:
            raise ValueError(
                f"member at {m['member_start']} holds {len(recs)} records"
                " (expected exactly 1 — file is not record-splittable)"
            )
        rec = recs[0]
        rec["member_start"] = m["member_start"]
        rec["member_end"] = m["member_end"]
        out.append(rec)
    return out
