"""Charset sniffing/transcoding tests (functions/charset.py): BOM
precedence over lying declarations, meta prescan forms, WHATWG label
normalization (iso-8859-1 → windows-1252), the five cp1252 C1 patch
cells, strict error behavior, and the bytes-first extract path."""

from __future__ import annotations

import pytest

from etl_everywhere_hub_spark.functions.charset import (
    decode_bytes,
    decode_html_bytes,
    extract_text_bytes,
    normalize_label,
    sniff_charset,
)


def test_bom_sniffing_and_binding():
    assert sniff_charset(b"\xef\xbb\xbfhello") == ("utf-8", 3, "bom")
    assert sniff_charset(b"\xff\xfeh\x00") == ("utf-16le", 2, "bom")
    assert sniff_charset(b"\xfe\xff\x00h") == ("utf-16be", 2, "bom")
    # a UTF-8 BOM beats a lying windows-1252 meta (Encoding §4.2)
    doc = "﻿".encode("utf-8") + (
        b'<meta charset="windows-1252"><p>caf\xc3\xa9</p>'
    )
    text, enc, src = decode_html_bytes(doc)
    assert enc == "utf-8" and src == "bom"
    assert "café" in text and "﻿" not in text  # BOM consumed


def test_meta_prescan_forms():
    cases = [
        b'<meta charset="utf-8">',
        b"<meta charset=utf-8>",
        b"<META CHARSET='UTF-8'>",
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=utf-8">',
        b'<meta\n  http-equiv=Content-Type content="text/html;charset=utf-8">',
    ]
    for head in cases:
        assert sniff_charset(head + b"<p>x</p>")[0] == "utf-8", head
    # http-equiv that is NOT Content-Type does not declare a charset
    assert sniff_charset(
        b'<meta http-equiv="refresh" content="1; url=a?charset=utf-8">'
    ) == ("windows-1252", 0, "default")
    # prescan window is 1024 bytes: a later meta is invisible
    far = b" " * 1100 + b'<meta charset="utf-8">'
    assert sniff_charset(far)[2] == "default"
    # unknown label: keep scanning, later valid meta wins
    two = b'<meta charset="klingon"><meta charset="utf-8">'
    assert sniff_charset(two)[0] == "utf-8"


def test_label_normalization():
    # the web-reality mappings the Encoding Standard mandates
    for label in ("ISO-8859-1", "latin1", "ascii", "us-ascii", "cp1252"):
        assert normalize_label(label) == "windows-1252", label
    assert normalize_label(" utf8 ") == "utf-8"
    assert normalize_label("Shift_JIS") == "shift_jis"
    assert normalize_label("unicode") == "utf-16le"
    with pytest.raises(ValueError, match="unknown encoding label"):
        normalize_label("ebcdic-ancient")


def test_windows1252_whatwg_cells():
    # stdlib-defined cells
    assert decode_bytes(b"\x80\x93\xe9", "windows-1252") == "€“é"
    # the five cells IANA cp1252 leaves undefined → C1 controls
    assert decode_bytes(bytes([0x81, 0x8D, 0x8F, 0x90, 0x9D]),
                        "windows-1252") == "\x81\x8d\x8f\x90\x9d"
    # stdlib strict decode would have raised on those
    with pytest.raises(UnicodeDecodeError):
        bytes([0x81]).decode("cp1252")


def test_strict_errors_not_replacement():
    with pytest.raises(UnicodeDecodeError):
        decode_bytes(b"\xff\xfe\xfd", "utf-8")


def test_extract_text_bytes_end_to_end():
    html = '<p>café &amp; crème</p><script>x<1</script>'
    for enc, prefix in [
        ("utf-8", b'<meta charset="utf-8">'),
        ("cp1252", b'<meta charset="iso-8859-1">'),
    ]:
        raw = prefix + html.encode(enc)
        text, used, src = extract_text_bytes(raw)
        assert text == "café & crème", (enc, text)
        assert src == "meta"
    # utf-16 with BOM, no meta
    raw16 = "﻿".encode("utf-16-le") + html.encode("utf-16-le")
    text, used, src = extract_text_bytes(raw16)
    assert text == "café & crème" and used == "utf-16le" and src == "bom"
    # undeclared defaults to windows-1252
    raw = "plain café".encode("cp1252")
    text, used, src = extract_text_bytes(raw)
    assert text == "plain café" and src == "default"
