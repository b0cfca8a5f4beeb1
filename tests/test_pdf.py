"""PDF extraction tests (multimodal/pdf.py): object lexer corners,
all five filters + chains + PNG predictors, classic/stream/update
cross-reference modes, object streams, font encodings (WinAnsi /
Standard / Differences), text operators, exact-recovery contract,
and error paths."""

from __future__ import annotations

import pytest

from etl_everywhere_hub_spark.multimodal.pdf import (
    Name,
    PdfDocument,
    Ref,
    _a85_decode,
    _a85_encode,
    _ahx_decode,
    _flate_decode,
    _flate_encode,
    _Lexer,
    _lit_string,
    _parse_object,
    _png_unpredict,
    _rl_decode,
    _rl_encode,
    build_pdf,
    extract_pdf_text,
    inverse_encoder,
    make_decoder,
    pdf_info,
)

PARAS = [
    "First paragraph with (parens), \\ backslash and 'quotes'.",
    'Second: "double" quotes, digits 0123456789 and tails.',
    "Third paragraph is deliberately much longer " * 5,
]


# ------------------------------------------------------------ lexer
def test_lexer_objects():
    lex = _Lexer(b"<< /A#20B (str) /N 4 /R 7 0 R /Arr [1 2.5 true null] >>")
    lex.next_token()  # <<
    # rebuild the dict via _parse_object from the start
    lex.pos = 0
    d = _parse_object(lex)
    assert d["A B"] == b"str"
    assert d["N"] == 4 and d["R"] == Ref(7, 0)
    assert d["Arr"] == [1, 2.5, True, None]


def test_literal_string_escapes():
    cases = [
        (rb"(a\nb\tc)", b"a\nb\tc"),
        (rb"(par \(inner\) done)", b"par (inner) done"),
        (b"(nested (balanced) ok)", b"nested (balanced) ok"),
        (rb"(\101\102\x)", b"ABx"),  # octal + unknown-escape drop
        (rb"(\0427)", b"\x227"),  # 3-digit octal stops at 3
        (b"(line\\\ncontinued)", b"linecontinued"),
        (b"(cr\rnorm)", b"cr\nnorm"),  # EOL normalization
    ]
    for raw, want in cases:
        lex = _Lexer(raw)
        assert _parse_object(lex) == want, raw


def test_hex_string_odd_digit():
    assert _parse_object(_Lexer(b"<48 65 6C6C 6F2>")) == b"Hello "


def test_lit_string_builder_roundtrip():
    payload = bytes(range(256))
    for agg in (0, 1, 2, 5):
        enc = _lit_string(payload, agg, 3)
        assert _parse_object(_Lexer(enc)) == payload, agg


# ----------------------------------------------------------- filters
def test_filter_roundtrips():
    data = b"The rain in Spain stays mainly in the plain." * 20 + bytes(
        range(256)
    )
    assert _flate_decode(_flate_encode(data)) == data
    assert _ahx_decode(data.hex().upper().encode() + b">") == data
    assert _a85_decode(_a85_encode(data)) == data
    assert _rl_decode(_rl_encode(data)) == data


def test_a85_z_shorthand_and_partial():
    assert _a85_decode(b"z~>") == b"\x00\x00\x00\x00"
    # 'z' inside a group is corrupt
    with pytest.raises(ValueError, match="'z' inside"):
        _a85_decode(b"!z~>")
    with pytest.raises(ValueError, match="missing EOD"):
        _a85_decode(b"!!!!")


def test_png_predictors_all_types():
    # rows: filter byte + 4 data bytes; reconstruct each type
    rows = bytes([0, 1, 2, 3, 4]) + bytes([1, 1, 1, 1, 1]) + bytes(
        [2, 1, 1, 1, 1]
    ) + bytes([3, 4, 4, 4, 4]) + bytes([4, 1, 1, 1, 1])
    out = _png_unpredict(rows, 1, 8, 4)
    assert len(out) == 20
    assert out[:4] == bytes([1, 2, 3, 4])  # none
    assert out[4:8] == bytes([1, 2, 3, 4])  # sub: 1,1+1,...no: 1,2,3,4
    with pytest.raises(ValueError, match="unknown PNG filter"):
        _png_unpredict(bytes([9, 0, 0, 0, 0]), 1, 8, 4)


# --------------------------------------------------------- encodings
def test_winansi_and_standard_decoders():
    win = make_decoder("WinAnsiEncoding")
    assert win(0x41) == "A" and win(0xE9) == "é" and win(0x80) == "€"
    std = make_decoder("StandardEncoding")
    assert std(0x41) == "A"
    assert std(0x27) == "’" and std(0xA9) == "'"  # quoteright vs quotesingle
    assert std(0x60) == "‘" and std(0xC1) == "`"
    with pytest.raises(ValueError, match="undefined"):
        std(0x7F)


def test_differences_and_inverse():
    diffs = [65, Name("bullet"), Name("emdash")]
    dec = make_decoder("WinAnsiEncoding", diffs)
    assert dec(65) == "•" and dec(66) == "—" and dec(67) == "C"
    inv = inverse_encoder("WinAnsiEncoding", diffs)
    assert inv["•"] == 65 and inv["—"] == 66
    # 'A' lost its WinAnsi cell to the difference; it has no other code
    assert "A" not in inv or inv["A"] != 65
    # every encodable char roundtrips
    for ch, code in inv.items():
        assert dec(code) == ch


def test_standard_inverse_covers_ascii():
    inv = inverse_encoder("StandardEncoding")
    for ch in map(chr, range(0x20, 0x7F)):
        assert ch in inv, ch
        assert make_decoder("StandardEncoding")(inv[ch]) == ch


# --------------------------------------------------- whole documents
@pytest.mark.parametrize("mode", ["classic", "stream", "update"])
@pytest.mark.parametrize("salt", [0, 1, 2, 3])
def test_roundtrip_modes(mode, salt):
    pdf = build_pdf(PARAS, xref_mode=mode, op_salt=salt, aggressive_every=3)
    assert extract_pdf_text(pdf) == "".join(PARAS)


def test_update_shadows_decoy():
    pdf = build_pdf(PARAS, xref_mode="update")
    # the base revision (up to the first %%EOF) really shows the decoy
    base = pdf[: pdf.index(b"%%EOF\n") + 6]
    assert "DECOY" in extract_pdf_text(base)
    # ...and the incremental update shadows it completely
    assert "DECOY" not in extract_pdf_text(pdf)
    assert extract_pdf_text(pdf) == "".join(PARAS)


def test_every_filter_mode():
    for f in ("plain", "flate", "ahx", "a85", "rl", "chain", "lzw",
              "lzwchain"):
        pdf = build_pdf(["only one page here"], filter_cycle=(f,))
        assert extract_pdf_text(pdf) == "only one page here", f
        info = pdf_info(pdf)
        assert info["n_pages"] == 1


def test_xref_stream_uses_objstm_and_predictor():
    pdf = build_pdf(PARAS, xref_mode="stream")
    info = pdf_info(pdf)
    assert info["has_objstm"]
    doc = PdfDocument(pdf)
    # packed objects resolve through the ObjStm path
    entry_kinds = {e[0] for e in doc.xref.values()}
    assert "objstm" in entry_kinds and "ofs" in entry_kinds


def test_line_sep_mode():
    pdf = build_pdf(["alpha", "beta"], filter_cycle=("plain",))
    exact = extract_pdf_text(pdf)
    assert exact == "alphabeta"
    shaped = extract_pdf_text(pdf, line_sep="\n")
    # line moves and the page boundary introduce separators, and the
    # text survives in order
    assert shaped.replace("\n", "") == "alphabeta"
    assert "\n" in shaped


def test_standard_font_specials_roundtrip():
    # chars whose Standard codes differ from ASCII ride through the
    # inverse-encode/decode pair
    text = "it's a 'quoted' ~ test ` with specials"
    pdf = build_pdf([text], op_salt=1)  # salt 1 starts on F2 (Standard)
    assert extract_pdf_text(pdf) == text


def test_inherited_resources():
    # odd pages omit /Resources and inherit from /Pages (§7.7.3.4)
    pdf = build_pdf(["page one", "page two inherits"], filter_cycle=("plain",))
    assert extract_pdf_text(pdf) == "page onepage two inherits"


# -------------------------------------------------------- error paths
def test_error_paths():
    with pytest.raises(ValueError, match="%PDF-"):
        PdfDocument(b"not a pdf")
    pdf = build_pdf(["x"])
    with pytest.raises(ValueError, match="startxref"):
        PdfDocument(pdf[: pdf.rindex(b"startxref")])
    # unsupported filter raises loudly (same byte length keeps offsets)
    bad = pdf.replace(b"/FlateDecode", b"/DCTDecode\x20\x20")
    with pytest.raises(ValueError, match="unsupported filter"):
        extract_pdf_text(bad)


def test_lzw_earlychange_zero():
    # EarlyChange=0 (§7.4.4.2): the width bump defers by one code;
    # build such a stream with a deferred-bump encoder twin and pin
    # the DecodeParms dispatch
    from etl_everywhere_hub_spark.multimodal.pdf import _lzw_decode
    from etl_everywhere_hub_spark.multimodal.tiff import lzw_encode_tiff

    data = bytes(range(256)) * 40  # forces width growth through 9->12
    enc = lzw_encode_tiff(data)
    assert _lzw_decode(enc, early_change=True) == data
    # the early-change stream mis-decodes (or errors) under the
    # deferred rule — the two variants are genuinely different codes
    try:
        assert _lzw_decode(enc, early_change=False) != data
    except ValueError:
        pass


def test_unencodable_char_raises():
    with pytest.raises(ValueError, match="not encodable"):
        build_pdf(["中文 chinese"], filter_cycle=("plain",))


def test_show_before_tf_raises():
    content = b"BT (oops) Tj ET"
    pdf = build_pdf(["x"], filter_cycle=("plain",))
    doc = PdfDocument(pdf)
    from etl_everywhere_hub_spark.multimodal.pdf import _interpret_text

    with pytest.raises(ValueError, match="before Tf"):
        _interpret_text(content, {}, "")


def test_type0_identity_h_tounicode():
    from etl_everywhere_hub_spark.multimodal.pdf import (
        build_tounicode,
        parse_tounicode,
    )

    # the builder's CMap covers bfrange-increment (a-z), the
    # array-destination bfrange, and chunked bfchar; the parser must
    # invert it exactly
    charset = set("The quick brown Fox! 0123 éß€")
    inv, cmap = build_tounicode(charset)
    fwd = parse_tounicode(cmap)
    for ch, code in inv.items():
        assert fwd[code] == ch, ch
    # lowercase rides the incrementing bfrange block
    assert inv["a"] == 0xE000 and inv["z"] == 0xE019
    # a document whose pieces land on F4 recovers exactly (salt 3
    # starts the font cycle on F4)
    text = "Type zero fonts carry the crawl's actual PDFs."
    pdf = build_pdf([text], op_salt=3)
    assert extract_pdf_text(pdf) == text


def test_type0_error_paths():
    from etl_everywhere_hub_spark.multimodal.pdf import (
        _font_decoder,
        parse_tounicode,
    )

    pdf = build_pdf(["abc"], op_salt=3)
    doc = PdfDocument(pdf)
    fdict = doc.resolve(doc.pages()[0]["resources"]["Font"])
    dec = _font_decoder(doc, fdict["F4"])
    with pytest.raises(ValueError, match="odd-length"):
        dec(b"\xe0")
    with pytest.raises(ValueError, match="not in ToUnicode"):
        dec(b"\xff\xff")
    # bfrange array length mismatch is loud
    with pytest.raises(ValueError, match="array length"):
        parse_tounicode(
            b"1 beginbfrange <E000> <E002> [<0041> <0042>] endbfrange"
        )
