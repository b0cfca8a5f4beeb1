"""HTML text extraction, dependency-free — round 11.

The step between crawl ingestion (multimodal/warc.py) and every text
operator in this engine (quality scoring q37, dedup q41, LM scoring
q116, ...): real corpora arrive as HTML, and the tokens the text
pipeline sees are whatever the extractor recovers. No bs4/lxml in the
container, so the tokenizer is implemented from the WHATWG/HTML4
grammar the way the codec modules are built from their specs:

- tag tokenizer: open/close/self-closing tags with quoted (single,
  double) and unquoted attribute values, ``<!-- -->`` comments
  (including ``--`` inside text), ``<![CDATA[ ]]>`` sections,
  ``<!DOCTYPE>`` declarations;
- RAWTEXT elements: ``<script>``/``<style>`` content is skipped to
  the matching case-insensitive close tag, exactly like browsers —
  a ``<`` inside script text must NOT open a tag;
- character references: named (the XML5 + nbsp core set), decimal
  ``&#NN;`` and hex ``&#xNN;`` forms, decoded ONLY when well-formed
  (a bare ``&`` stays literal, as lenient parsers do);
- extraction: ``extract_text`` concatenates text nodes outside
  script/style/comments with a configurable block separator;
  ``extract_links`` returns (href, anchor text) pairs with nested
  markup inside the anchor flattened.

Builders (``build_html``) construct spec-valid fixture documents so
the parser is pinned against hand-built streams (house codec-module
contract), and q355 proves EXACT text recovery through the entity/
tag/noise gauntlet with an md5 the oracle can state in closed form.

Scale shape: extraction is a per-document map (mapInPandas over Arrow
batches, q355) — embarrassingly parallel, no state, only scalar
metadata and extracted text leave the worker."""

from __future__ import annotations

NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
}
_REV_ENTITIES = {v: k for k, v in NAMED_ENTITIES.items()}

RAWTEXT_TAGS = ("script", "style")


def decode_entities(s: str) -> str:
    """Decode named/decimal/hex character references; malformed
    references (bare '&', unknown name, unterminated) stay literal."""
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        semi = s.find(";", i + 1)
        if semi < 0 or semi == i + 1 or semi - i > 12:
            out.append(c)
            i += 1
            continue
        body = s[i + 1 : semi]
        if body.startswith("#"):
            num = body[1:]
            try:
                cp = int(num[1:], 16) if num[:1] in ("x", "X") else int(num)
            except ValueError:
                out.append(c)
                i += 1
                continue
            if not (0 < cp <= 0x10FFFF):
                out.append(c)
                i += 1
                continue
            out.append(chr(cp))
        elif body in NAMED_ENTITIES:
            out.append(NAMED_ENTITIES[body])
        else:
            out.append(c)
            i += 1
            continue
        i = semi + 1
    return "".join(out)


def encode_entities(s: str, aggressive_every: int = 0) -> str:
    """Encode the five XML specials; with ``aggressive_every=k`` every
    k-th remaining character is ALSO encoded, cycling named → decimal
    → hex forms (fixture generator: exercises all decoder arms)."""
    out = []
    forms = 0
    for idx, ch in enumerate(s):
        if ch in _REV_ENTITIES and ch != " ":
            out.append(f"&{_REV_ENTITIES[ch]};")
        elif aggressive_every and idx % aggressive_every == 0:
            forms += 1
            if ch in _REV_ENTITIES:
                out.append(f"&{_REV_ENTITIES[ch]};")
            elif forms % 2:
                out.append(f"&#{ord(ch)};")
            else:
                out.append(f"&#x{ord(ch):x};")
        else:
            out.append(ch)
    return "".join(out)


def _parse_attrs(s: str) -> list:
    """Attribute string → [(name, value)]; handles double/single/
    unquoted values and bare boolean attributes."""
    attrs = []
    i, n = 0, len(s)
    while i < n:
        while i < n and s[i] in " \t\r\n/":
            i += 1
        if i >= n:
            break
        j = i
        while j < n and s[j] not in " \t\r\n=/>":
            j += 1
        name = s[i:j].lower()
        if not name:
            i = j + 1
            continue
        i = j
        while i < n and s[i] in " \t\r\n":
            i += 1
        if i < n and s[i] == "=":
            i += 1
            while i < n and s[i] in " \t\r\n":
                i += 1
            if i < n and s[i] in "\"'":
                q = s[i]
                end = s.find(q, i + 1)
                if end < 0:
                    end = n
                attrs.append((name, decode_entities(s[i + 1 : end])))
                i = end + 1
            else:
                j = i
                while j < n and s[j] not in " \t\r\n":
                    j += 1
                attrs.append((name, decode_entities(s[i:j])))
                i = j
        else:
            attrs.append((name, ""))
    return attrs


def _find_tag_end(html: str, start: int, bare_quotes: bool = False) -> int:
    """Index of the '>' closing the tag opened at ``html[start] ==
    '<'``, skipping quoted attribute values — per the HTML5 tokenizer
    (WHATWG §13.2.5.36/38), a '>' inside ``href="a>b"`` does NOT end
    the tag. A quote begins a quoted span only directly after '='
    (optionally whitespace-separated), matching the spec's
    before-attribute-value state; quotes elsewhere in the tag are
    ordinary characters. ``bare_quotes=True`` (the ``<!`` declaration
    path) instead treats ANY quote as opening a quoted literal —
    DOCTYPE public/system identifiers are quoted without '='.
    Returns -1 if no closing '>' exists."""
    i, n = start + 1, len(html)
    while i < n:
        c = html[i]
        if c == ">":
            return i
        if bare_quotes and c in "\"'":
            q = html.find(c, i + 1)
            if q < 0:
                return -1
            i = q + 1
            continue
        if c == "=":
            j = i + 1
            while j < n and html[j] in " \t\r\n":
                j += 1
            if j < n and html[j] in "\"'":
                q = html.find(html[j], j + 1)
                if q < 0:
                    return -1
                i = q + 1
                continue
            i = j
            continue
        i += 1
    return -1


def tokenize(html: str, lenient: bool = False):
    """Yield (kind, payload) events: ('text', str) — entity-decoded;
    ('open', (tag, attrs, self_closing)); ('close', tag);
    ('comment', str); ('cdata', str); ('doctype', str).
    Script/style content is emitted as ONE ('rawtext', (tag, str))
    event, never tokenized. A '>' inside a quoted attribute value
    does not end the tag (see _find_tag_end).

    ``lenient=True`` (what the crawl-facing extract_* wrappers use)
    recovers from unterminated constructs the way browsers do —
    comment/CDATA/rawtext run to EOF, a dangling '<tag' or '<>'
    becomes literal text — instead of raising ValueError and failing
    the worker task on one malformed document."""
    i, n = 0, len(html)
    while i < n:
        lt = html.find("<", i)
        if lt < 0:
            if i < n:
                yield ("text", decode_entities(html[i:]))
            return
        if lt > i:
            yield ("text", decode_entities(html[i:lt]))
        if html.startswith("<!--", lt):
            end = html.find("-->", lt + 4)
            if end < 0:
                if lenient:
                    yield ("comment", html[lt + 4 :])
                    return
                raise ValueError("unterminated comment")
            yield ("comment", html[lt + 4 : end])
            i = end + 3
            continue
        if html.startswith("<![CDATA[", lt):
            end = html.find("]]>", lt + 9)
            if end < 0:
                if lenient:
                    yield ("cdata", html[lt + 9 :])
                    return
                raise ValueError("unterminated CDATA section")
            yield ("cdata", html[lt + 9 : end])
            i = end + 3
            continue
        if html.startswith("<!", lt):
            end = _find_tag_end(html, lt, bare_quotes=True)
            if end < 0:
                if lenient:
                    yield ("doctype", html[lt + 2 :])
                    return
                raise ValueError("unterminated declaration")
            yield ("doctype", html[lt + 2 : end])
            i = end + 1
            continue
        end = _find_tag_end(html, lt)
        if end < 0:
            if lenient:
                # HTML5 "EOF in tag" parse error: discard the partial
                # tag, emit nothing
                return
            raise ValueError("unterminated tag")
        inner = html[lt + 1 : end]
        if inner.startswith("/"):
            yield ("close", inner[1:].strip().lower())
            i = end + 1
            continue
        self_closing = inner.rstrip().endswith("/")
        if self_closing:
            inner = inner.rstrip()[:-1]
        k = 0
        while k < len(inner) and inner[k] not in " \t\r\n":
            k += 1
        tag = inner[:k].lower()
        if not tag:
            if lenient:
                # '<>' / '< p>' — browsers emit the '<' as text
                yield ("text", decode_entities(html[lt : end + 1]))
                i = end + 1
                continue
            raise ValueError(f"empty tag at offset {lt}")
        attrs = _parse_attrs(inner[k:])
        if tag in RAWTEXT_TAGS and not self_closing:
            # browsers scan raw content to the case-insensitive close
            low = html.lower()
            close = low.find(f"</{tag}", end + 1)
            if close < 0:
                if lenient:
                    yield ("open", (tag, attrs, False))
                    yield ("rawtext", (tag, html[end + 1 :]))
                    yield ("close", tag)
                    return
                raise ValueError(f"unterminated <{tag}> raw content")
            gt = html.find(">", close)
            if gt < 0:
                if lenient:
                    gt = n - 1
                else:
                    raise ValueError(f"unterminated </{tag}> tag")
            yield ("open", (tag, attrs, False))
            yield ("rawtext", (tag, html[end + 1 : close]))
            yield ("close", tag)
            i = gt + 1
            continue
        yield ("open", (tag, attrs, self_closing))
        i = end + 1


# block-level elements whose boundaries become separators
BLOCK_TAGS = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table section article "
    "header footer blockquote pre".split()
)


def extract_text(html: str, separator: str = "", lenient: bool = True) -> str:
    """Concatenate text nodes (entity-decoded), skipping script/style
    raw content and comments; ``separator`` is inserted at block-tag
    boundaries (default '' — exact concatenation, the q355 md5
    contract). Lenient by default: real crawl HTML is routinely
    truncated mid-tag, and one malformed document must not fail the
    worker task (pass lenient=False to re-enable strict errors)."""
    parts: list = []
    for kind, payload in tokenize(html, lenient=lenient):
        if kind == "text":
            parts.append(payload)
        elif kind == "cdata":
            parts.append(payload)
        elif separator and kind in ("open", "close"):
            tag = payload[0] if kind == "open" else payload
            if tag in BLOCK_TAGS and (not parts or parts[-1] != separator):
                parts.append(separator)
    return "".join(parts)


def extract_links(html: str, lenient: bool = True) -> list:
    """(href, anchor_text) per <a href=...>; nested markup inside the
    anchor flattens into the text, nested <a> is treated as a new
    anchor (browser-like recovery). Lenient by default, like
    extract_text."""
    links = []
    cur_href = None
    cur_text: list = []
    for kind, payload in tokenize(html, lenient=lenient):
        if kind == "open" and payload[0] == "a":
            if cur_href is not None:
                links.append((cur_href, "".join(cur_text)))
            attrs = dict(payload[1])
            cur_href = attrs.get("href", "")
            cur_text = []
        elif kind == "close" and payload == "a":
            if cur_href is not None:
                links.append((cur_href, "".join(cur_text)))
            cur_href = None
            cur_text = []
        elif kind == "text" and cur_href is not None:
            cur_text.append(payload)
    if cur_href is not None:
        links.append((cur_href, "".join(cur_text)))
    return links


def build_html(
    paragraphs: list,
    links: list | None = None,
    title: str = "t",
    aggressive_every: int = 0,
    noise: bool = True,
) -> str:
    """Fixture builder: paragraphs become entity-encoded <p> nodes;
    ``links`` as (href, text) <a> elements; with ``noise`` a doctype,
    comments (with '--' bait), a script (with '<p>' bait that must
    NOT parse), a style block, CDATA-free declarations and attribute
    quoting variants are interleaved — everything extract_text must
    ignore or survive."""
    out = []
    if noise:
        out.append("<!DOCTYPE html>")
        out.append("<!-- leading comment with -- double dash bait -->")
    out.append(f'<html lang=en data-x="1">')
    out.append(f"<head><title>{encode_entities(title)}</title>")
    if noise:
        out.append(
            "<script type='text/javascript'>if (1<2) { document.write("
            "'<p>NOT REAL TEXT</p>'); }</script>"
        )
        out.append("<style>p > a { color: red; }</style>")
    out.append("</head><body>")
    for i, p in enumerate(paragraphs):
        enc = encode_entities(p, aggressive_every=aggressive_every)
        out.append(f"<p id=par{i} class='c {i}'>{enc}</p>")
        if noise and i == 0:
            out.append("<!-- mid comment <p>fake</p> -->")
    for href, text in links or []:
        out.append(
            f'<a href="{encode_entities(href)}">{encode_entities(text)}</a>'
        )
    out.append("</body></html>")
    return "".join(out)
