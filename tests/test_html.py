"""HTML tokenizer/extractor tests (functions/html.py): entity forms,
rawtext (script/style) skipping, comments/CDATA/doctype, attribute
quoting, link extraction, builder roundtrips, error paths."""

from __future__ import annotations

import pytest

from etl_everywhere_hub_spark.functions.html import (
    build_html,
    decode_entities,
    encode_entities,
    extract_links,
    extract_text,
    tokenize,
)


def test_entity_decode_forms():
    assert decode_entities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;") == (
        "a & b <c> \"d\" 'e'"
    )
    assert decode_entities("&#65;&#x42;&#x63;") == "ABc"
    # malformed stays literal
    for bad in ["a & b", "&;", "&unknown;", "&#xzz;", "&#99999999;", "&amp"]:
        assert decode_entities(bad) == bad, bad
    assert decode_entities("&nbsp;") == "\xa0"  # spec U+00A0, not SP


def test_entity_encode_decode_roundtrip():
    s = "mixed & <tags> with 'quotes' and \"d\" plus text"
    for k in (0, 1, 2, 5):
        assert decode_entities(encode_entities(s, aggressive_every=k)) == s


def test_script_style_content_never_parses():
    html = "<p>A</p><script>if (1<2) document.write('<p>X</p>');</script><p>B</p>"
    assert extract_text(html) == "AB"
    html2 = "<style>p > a { content: '<b>no</b>'; }</style><i>C</i>"
    assert extract_text(html2) == "C"
    # case-insensitive close
    assert extract_text("<SCRIPT>1<2</ScRiPt>ok") == "ok"


def test_comments_cdata_doctype():
    html = "<!DOCTYPE html><!-- c1 -- bait --><p>T</p><!-- <p>fake</p> -->"
    assert extract_text(html) == "T"
    kinds = [k for k, _ in tokenize(html)]
    assert kinds == ["doctype", "comment", "open", "text", "close", "comment"]
    assert extract_text("<![CDATA[raw <not a tag>]]>x") == "raw <not a tag>x"


def test_attribute_quoting_variants():
    evs = list(tokenize("<a href=\"u&amp;1\" id='i' checked data-x=raw>t</a>"))
    tag, attrs, selfc = evs[0][1]
    d = dict(attrs)
    assert tag == "a" and not selfc
    assert d["href"] == "u&1"  # entity-decoded attribute
    assert d["id"] == "i" and d["checked"] == "" and d["data-x"] == "raw"


def test_self_closing_and_block_separator():
    html = "<p>one</p><br/><p>two</p>"
    assert extract_text(html) == "onetwo"
    # adjacent block boundaries (</p><br/><p>) collapse to ONE separator
    assert extract_text(html, separator="\n") == "\none\ntwo\n"


def test_extract_links():
    html = (
        '<a href="/x">first</a> mid '
        '<a href="/y"><b>bo</b>ld</a>'
        "<a href='/z'>un<a href=/w>nested</a>"
    )
    links = extract_links(html)
    assert ("/x", "first") in links
    assert ("/y", "bold") in links  # nested markup flattens
    # nested <a> closes the previous one (browser-like recovery)
    assert ("/z", "un") in links and ("/w", "nested") in links


def test_error_paths():
    with pytest.raises(ValueError, match="unterminated comment"):
        list(tokenize("<!-- never closed"))
    with pytest.raises(ValueError, match="unterminated tag"):
        list(tokenize("<p never closed"))
    with pytest.raises(ValueError, match="raw content"):
        list(tokenize("<script>never closed"))
    with pytest.raises(ValueError, match="empty tag"):
        list(tokenize("<>x"))
    with pytest.raises(ValueError, match="CDATA"):
        list(tokenize("<![CDATA[never"))


def test_gt_inside_quoted_attribute():
    # HTML5 §13.2.5.36: '>' inside a quoted attribute value does not
    # end the tag (ADVICE r11 — previously leaked `b">` into text)
    html = '<a href="a>b">link</a> tail'
    assert extract_text(html) == "link tail"
    assert extract_links(html) == [("a>b", "link")]
    # single-quoted, and '>' in an unquoted context after '='
    assert extract_text("<p title='x>y'>T</p>") == "T"
    # doctype with quoted public identifier containing '>'
    evs = list(tokenize('<!DOCTYPE html PUBLIC "a>b"><i>Q</i>'))
    assert evs[0][0] == "doctype" and 'a>b' in evs[0][1]
    # a quote NOT after '=' is an ordinary char, not a quoted span
    assert extract_text("<p data-x>it's</p>") == "it's"


def test_lenient_mode_recovers_malformed():
    # extract_text/_links default lenient: truncated crawl documents
    # must not raise (ADVICE r11)
    assert extract_text("before<p never closed") == "before"
    assert extract_text("ok<!-- trailing comment") == "ok"
    assert extract_text("x<script>dangling") == "x"
    assert extract_text("a<>b") == "a<>b"
    assert extract_text("c<![CDATA[tail") == "ctail"
    assert extract_links('pre <a href="/k">anch') == [("/k", "anch")]
    # strict mode still raises for callers that want the error
    with pytest.raises(ValueError):
        extract_text("before<p never closed", lenient=False)


def test_build_html_exact_text_recovery():
    text = "The quick & brown <fox> jumps 'over' the \"lazy\" dog 123"
    for k in (0, 3, 7):
        html = build_html(
            [text[:20], text[20:]],
            links=[("http://e.com/a", "LNK")],
            title="",
            aggressive_every=k,
        )
        assert extract_text(html) == text + "LNK"
        assert extract_links(html) == [("http://e.com/a", "LNK")]


def test_url_normalization_cases(spark):
    from pyspark.sql import functions as F

    from etl_everywhere_hub_spark.functions.url import (
        normalize_url_col,
        url_host_col,
    )

    cases = [
        ("HTTP://ExAmPle.COM:80/a/./b/../c?z=1&a=2#frag",
         "http://example.com/a/c?a=2&z=1"),
        ("https://X.org:443/", "https://x.org/"),
        ("https://x.org:8443/p?q=1", "https://x.org:8443/p?q=1"),
        ("http://h.com", "http://h.com/"),  # empty path -> '/'
        ("http://h.com/a/b/c/../../d/./e", "http://h.com/a/d/e"),
        ("http://h.com/p?", "http://h.com/p"),  # empty query dropped
        ("http://h.com:8080/x#y#z", "http://h.com:8080/x"),
        ("https://A.b.C.d/UP/case?Q=V", "https://a.b.c.d/UP/case?Q=V"),
    ]
    df = spark.createDataFrame(cases, ["raw", "want"])
    out = df.select(
        "raw", "want",
        normalize_url_col(F.col("raw")).alias("got"),
        url_host_col(F.col("raw")).alias("host"),
    ).collect()
    for r in out:
        assert r.got == r.want, (r.raw, r.got, r.want)
    # normalization is idempotent
    out2 = df.select(
        normalize_url_col(normalize_url_col(F.col("raw"))).alias("twice"),
        F.col("want"),
    ).collect()
    for r in out2:
        assert r.twice == r.want
