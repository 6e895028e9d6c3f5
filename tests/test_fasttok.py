"""Differential test: fasttok.FastHTMLParser vs stdlib html.parser.

Replays every reference fixture body (the same corpus the conformance
suite locks byte-equality on) plus a corpus of adversarial fragments
through both tokenizers and asserts identical event streams — tag
names, attribute lists, data payloads AND data char offsets (the
observable the boilerplate span stage consumes).
"""

from __future__ import annotations

from html.parser import HTMLParser as StdParser

import pytest

from unfurl_ray.html.fasttok import FastHTMLParser
from unfurl_ray.sources.fixtures import fixture_urls, load_pages


class _Rec:
    """Event recorder mixed into either parser base."""

    def _init_events(self):
        self.events = []

    def handle_starttag(self, tag, attrs):
        self.events.append(("start", tag, tuple(attrs)))

    def handle_startendtag(self, tag, attrs):
        self.events.append(("startend", tag, tuple(attrs)))

    def handle_endtag(self, tag):
        self.events.append(("end", tag))

    def handle_data(self, data):
        self.events.append(("data", data, self._off()))

    def handle_comment(self, data):
        self.events.append(("comment", data))

    def handle_decl(self, decl):
        self.events.append(("decl", decl))

    def handle_pi(self, data):
        self.events.append(("pi", data))

    def unknown_decl(self, data):
        self.events.append(("unknown_decl", data))

    def error(self, message):
        pass


class _FastRec(_Rec, FastHTMLParser):
    def __init__(self):
        FastHTMLParser.__init__(self, convert_charrefs=True)
        self._init_events()

    def _off(self):
        return self._data_offset


class _StdRec(_Rec, StdParser):
    def __init__(self):
        StdParser.__init__(self, convert_charrefs=True)
        self._init_events()
        self._fed = ""
        self._line_starts = None

    def feed(self, data):
        self._fed = data
        super().feed(data)

    def _off(self):
        # char offset from stdlib line/col (the pre-fasttok span path)
        if self._line_starts is None:
            starts = [0]
            i = self._fed.find("\n")
            while i >= 0:
                starts.append(i + 1)
                i = self._fed.find("\n", i + 1)
            self._line_starts = starts
        line, col = self.getpos()
        if line - 1 < len(self._line_starts):
            return self._line_starts[line - 1] + col
        return -1


def _stream(cls, text):
    p = cls()
    try:
        p.feed(text)
        p.close()
        return ("ok", p.events)
    except Exception as exc:  # raise parity matters: error column
        return ("raise", type(exc).__name__, p.events)


def _assert_same(text, label):
    fast = _stream(_FastRec, text)
    std = _stream(_StdRec, text)
    if fast != std:
        fe = fast[-1] if fast[0] != "ok" else fast[1]
        se = std[-1] if std[0] != "ok" else std[1]
        for i, (a, b) in enumerate(zip(fe, se)):
            assert a == b, f"{label}: event {i}: fast={a!r} std={b!r}"
        assert fast == std, (
            f"{label}: status/tail differ: fast={fast[0]},{len(fe)}ev "
            f"std={std[0]},{len(se)}ev"
        )


FRAGMENTS = [
    "",
    "plain text only",
    "a &amp; b &notareal; &#65; &#x41; &#xZZ; & c",
    "5 < 6 > 3 <3 <<p>> <",
    "<p>unclosed",
    "<p",
    "<p ",
    "<p a",
    "<p a=",
    "<p a='x",
    '<p a="x',
    "<p a=x",
    "<p/",
    "<p />text",
    "<p / >text",
    "<p a/b=c>x</p>",
    "<p =x>y",
    "<p 'a'=b>y",
    "<div class=\"a'b\" id='c\"d' bare data-x = 'y'>t</div>",
    "<DIV CLASS=UP>t</DIV>",
    "<a-b.c:d_e@f>x</a-b.c:d_e@f>",
    "<a\x00b>x",
    "<script>var a = '</scr' + 'ipt>';</script>after",
    "<script>no close tag",
    "<SCRIPT>x</SCRIPT>y",
    "<script >x</script >y",
    "<style>p < q { }</style>done",
    "<script><!-- <p> --></script>z",
    "<!-- unterminated comment",
    "<!-- c1 --><!-- c2 --!>tail",
    "<!---->empty",
    "<!-- a -- b -->c",
    "<!DOCTYPE html>x",
    "<!doctype html public 'x'>y",
    "<!DOCTYPE",
    "<!bogus decl>x",
    "<!>x",
    "<![CDATA[ raw < > & ]]>x",
    "<![CDATA[ unterminated",
    "<![if gt IE 7]>x<![endif]>y",
    "<![unknownkw here]]>y",
    "<![",
    "<![x",
    "<?php echo '>' ?>x",
    "<?pi unterminated",
    "</>x",
    "</ p>x",
    "</p attr='v'>x",
    "</unclosed",
    "</ >x",
    "</#bogus>x",
    "<p>a</p \n >b",
    "text &At the end &am",
    "trailing amp &",
    "trailing lt <",
    "<p>&nbsp;&NBSP;&nbspX</p>",
    "<meta charset=utf-8><meta name=description content='d &amp; e'>",
    "<br/><br /><br//>",
    "<p><span>nested <b>bold</b> tail</span> end</p>",
    "< p>not a tag</ p>",
    "<1notatag>x",
    "a<b>c<d>e</d>f</b>g",
    "line1\nline2<p>\nline3 &gt; ok\n</p>\nline4",
    "\n\n<div>\n  multi\n  line\n</div>\n",
    "<p> unicode ws</p>",
    "<td nowrap>x</td>",
    "<img src=x.png alt='a>b'>tail",
    "<a href='#' onclick='if (a<b) f()'>t</a>",
    # fused attr-path equivalence probes
    "<p a=\"x\" =\"y\">t",
    "<p ='y'>t",
    "<p a==b>t",
    "<p a= b>t",
    "<p a = 'x' >t",
    "<p a='x'b='y'>t",
    "<p a=b c>t",
    "<p a=b/>t",
    "<p a=b />t",
    "<p a=b/c>t",
    "<p a=>t",
    "<p a= >t",
    "<p a=''>t",
    "<p a=\"\">t",
    "<input value=a=b>t",
    "<p a='&amp;' b=&amp; c=x&ampy>t",
    "<p a b c>t",
    "<p a/b>t",
    "<p/a=b>t",
    "<meta name=viewport content=\"width=device-width, initial-scale=1\">",
    "<p \"q\"=v>t",
    "<p 'q'>t",
    "<p a='x\">y'>t",
    "<p a=\"x'>\" b='y'>t",
]


def test_fragments_differential():
    for frag in FRAGMENTS:
        _assert_same(frag, f"fragment {frag[:40]!r}")


def test_fixture_corpus_differential():
    pages = load_pages(fixture_urls())
    checked = 0
    for page in pages:
        body = page.get("body")
        if isinstance(body, bytes):
            body = body.decode("utf-8", errors="replace")  # pipeline rule
        if not body:
            continue
        _assert_same(body, page.get("url", "?"))
        checked += 1
    assert checked >= 100, f"only {checked} fixture bodies compared"


@pytest.mark.parametrize("doc", [
    "<html><head><title>a &amp; b</title></head>"
    "<body><p>some words here for a block</p></body></html>",
])
def test_offsets_are_char_offsets(doc):
    p = _FastRec()
    p.feed(doc)
    for ev in p.events:
        if ev[0] == "data":
            start = ev[2]
            assert doc[start] == ev[1][0] or "&" in doc[start:start + len(ev[1]) + 8]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _soup = st.lists(
        st.sampled_from(
            list("<>&;/!?-='\"abcdXYZ \n\t#[]%1289\x00é ")
            + ["<!--", "-->", "</", "/>", "<script>", "</script>",
               "<![CDATA[", "]]>", "&amp;", "&#65;", "<p ", "<meta "]
        ),
        min_size=0,
        max_size=60,
    ).map("".join)

    @given(_soup)
    @settings(max_examples=400, deadline=None)
    def test_fuzz_differential(doc):
        _assert_same(doc, f"fuzz {doc[:40]!r}")
except ImportError:  # pragma: no cover
    pass
