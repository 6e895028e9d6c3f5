"""Fast feed-once HTML tokenizer, event-compatible with ``html.parser``.

The extraction hot path spends >50% of its CPU inside stdlib
``HTMLParser.goahead`` (profiled: 2.16 s of a 4.16 s / 4096-row batch),
most of it in line/column position bookkeeping (``updatepos``), the
multi-regex start-tag scan, and per-chunk buffer management that only
matters for incremental feeding.  Our pipeline always feeds one whole
document then closes, so this module reimplements the *observable*
tokenizer semantics of CPython's ``html.parser`` (handler callbacks,
tolerant grammar, CDATA content elements, bogus-comment recovery,
EOF recovery) in a single pass with:

- direct char-offset tracking (``_data_offset``) instead of
  line/column ``updatepos`` — the boilerplate span stage needs char
  offsets anyway and previously re-derived them from line starts;
- a one-regex fast path for attribute-less start/end tags (the vast
  majority of tags in real documents);
- charref decoding skipped when a text run contains no ``&``.

Grammar regexes are kept byte-identical to the stdlib's tolerant
patterns so edge-case tokenization (broken attributes, ``--!>``
comments, ``<![CDATA[``, unterminated tags at EOF) matches the
behavior the conformance fixtures lock in.  ``convert_charrefs=True``
is the only supported mode (what MetaHandler uses).

A differential pytest (tests/test_fasttok.py) replays every reference
fixture body plus adversarial fragments through this parser and the
stdlib one and asserts identical event streams and data offsets.
"""

from __future__ import annotations

import re
from html import unescape

# stdlib-equivalent tolerant grammars (html/parser.py + _markupbase.py);
# kept textually identical so tokenization of malformed markup agrees.
_tagfind = re.compile(r'([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*')
_attrfind = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*')
_locatestarttagend = re.compile(r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""", re.VERBOSE)
_endtagfind = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_commentclose = re.compile(r'--\s*>')
_markedsectionclose = re.compile(r']\s*]\s*>')
_msmarkedsectionclose = re.compile(r']\s*>')
_declname = re.compile(r'[a-zA-Z][-_.a-zA-Z0-9]*\s*')

# fast path: start tag with no attributes at all: <name>, <name/>, <name  >
# possessive name quantifier: the name charset overlaps \s (\x0b is a
# legal stdlib name char AND regex whitespace), so a backtracking name
# could silently re-carve name-chars into separators and diverge from
# the stdlib parse — possessive means match-the-stdlib-carve or fail
_simple_start = re.compile(r'<([a-zA-Z][^\t\n\r\f />\x00]*+)\s*+(/?)>')

# fast path: whole start tag with only "well-behaved" attributes —
# whitespace-separated, single '=', quoted or bare values.  Anything
# this regex can't match (attr glued to a closing quote, '==', a value
# starting with a quote char or '=', '/' between attrs, unterminated
# quotes) falls through to the stdlib-shaped slow path, so the two
# parses agree wherever this one fires (differential-fuzz pinned).
# Every quantifier is possessive: no backtracking re-carves, and the
# attr finditer below is guaranteed to split group(2) the same way.
_fast_full = re.compile(
    r'<([a-zA-Z][^\t\n\r\f />\x00]*+)'
    r'((?:\s++[^\s/>][^\s/=>]*+'
    r'(?:\s*+=\s*+(?:\'[^\']*+\'|"[^"]*+"|[^>\s\'"=][^>\s]*+|))?+)*+)'
    r'\s*+(/?)>')
_fast_attr = re.compile(
    r'\s++([^\s/>][^\s/=>]*+)'
    r'(?:\s*+=\s*+(\'[^\']*+\'|"[^"]*+"|[^>\s\'"=][^>\s]*+|))?+')

_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ATTR_STOP = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")


class FastHTMLParser:
    """Drop-in handler base for feed-once + close() parsing.

    Subclasses override ``handle_starttag / handle_startendtag /
    handle_endtag / handle_data / handle_comment / handle_decl /
    handle_pi / unknown_decl`` exactly as with ``html.parser``.  During
    a ``handle_data`` call, ``self._data_offset`` holds the char offset
    of the (undecoded) data run in the fed document — the replacement
    for ``getpos()`` line/col arithmetic.
    """

    CDATA_CONTENT_ELEMENTS = ("script", "style")

    def __init__(self, *, convert_charrefs: bool = True):
        if not convert_charrefs:
            raise ValueError("FastHTMLParser only supports convert_charrefs=True")
        self.convert_charrefs = True
        self.reset()

    def reset(self) -> None:
        self.rawdata = ""
        self.lasttag = "???"
        self.cdata_elem: str | None = None
        self._cdata_close: re.Pattern | None = None
        self._data_offset = -1

    def feed(self, data: str) -> None:
        # whole-document parse: equivalent to stdlib feed()+close() for
        # a single feed (goahead(0) breaks only at incomplete constructs
        # near EOF, which goahead(1) then finishes with the same events)
        self._run(data)

    def close(self) -> None:
        pass

    def getpos(self):  # compat shim; offsets come from _data_offset
        return (1, self._data_offset)

    # -- main loop -----------------------------------------------------------

    def _run(self, text: str) -> None:
        n = len(text)
        i = 0
        handle_data = self.handle_data
        find = text.find
        while i < n:
            if self.cdata_elem is not None:
                m = self._cdata_close.search(text, i)
                if m is None:
                    # unterminated <script>/<style>: stdlib drops the tail
                    return
                j = m.start()
                if i < j:
                    self._data_offset = i
                    handle_data(text[i:j])  # raw: no charref decoding
                # the close pattern is a subset of endtagfind: emit endtag
                self.handle_endtag(self.cdata_elem)
                self.cdata_elem = None
                self._cdata_close = None
                i = m.end()
                continue
            j = find("<", i)
            if j < 0:
                j = n
            if i < j:
                seg = text[i:j]
                self._data_offset = i
                handle_data(unescape(seg) if "&" in seg else seg)
            i = j
            if i == n:
                break
            c = text[i + 1: i + 2]
            if c in _LETTERS:
                k = self._parse_starttag(text, i, n)
            elif c == "/":
                k = self._parse_endtag(text, i)
            elif text.startswith("<!--", i):
                k = self._parse_comment(text, i)
            elif c == "?":
                k = self._parse_pi(text, i)
            elif c == "!":
                k = self._parse_html_declaration(text, i)
            else:
                # literal '<' (incl. '<' as the very last char: stdlib
                # emits it from the end-of-input flush)
                self._data_offset = i
                handle_data("<")
                i += 1
                continue
            if k < 0:
                # EOF recovery (stdlib goahead end=1): swallow to the
                # next '>', else next '<', else one char, as data
                k = find(">", i + 1)
                if k < 0:
                    k = find("<", i + 1)
                    if k < 0:
                        k = i + 1
                else:
                    k += 1
                seg = text[i:k]
                self._data_offset = i
                handle_data(unescape(seg) if "&" in seg else seg)
            i = k

    # -- constructs ------------------------------------------------------------

    def _set_cdata_mode(self, elem: str) -> None:
        self.cdata_elem = elem.lower()
        self._cdata_close = re.compile(
            r"</\s*%s\s*>" % self.cdata_elem, re.I)

    def _parse_starttag(self, text: str, i: int, n: int) -> int:
        m = _simple_start.match(text, i)
        if m is not None:
            tag = m.group(1)
            tag = tag if tag.islower() else tag.lower()
            self.lasttag = tag
            if m.group(2):
                self.handle_startendtag(tag, [])
            else:
                self.handle_starttag(tag, [])
                if tag in self.CDATA_CONTENT_ELEMENTS:
                    self._set_cdata_mode(tag)
            return m.end()

        m = _fast_full.match(text, i)
        if m is not None:
            tag = m.group(1)
            tag = tag if tag.islower() else tag.lower()
            self.lasttag = tag
            attrs: list[tuple[str, str | None]] = []
            for am in _fast_attr.finditer(m.group(2)):
                name, value = am.group(1), am.group(2)
                if value is None:
                    pass
                elif value[:1] in "'\"":
                    value = value[1:-1]
                    if "&" in value:
                        value = unescape(value)
                elif value and "&" in value:
                    value = unescape(value)
                attrs.append(
                    (name if name.islower() else name.lower(), value))
            if m.group(3):
                self.handle_startendtag(tag, attrs)
            else:
                self.handle_starttag(tag, attrs)
                if tag in self.CDATA_CONTENT_ELEMENTS:
                    self._set_cdata_mode(tag)
            return m.end()

        # stdlib check_for_whole_start_tag
        m = _locatestarttagend.match(text, i)
        j = m.end()
        nxt = text[j: j + 1]
        if nxt == ">":
            endpos = j + 1
        elif nxt == "/":
            if text.startswith("/>", j):
                endpos = j + 2
            else:
                return -1  # buffer boundary at EOF
        elif nxt == "":
            return -1  # end of input
        elif nxt in _ATTR_STOP:
            return -1  # end of input in or before attribute value
        else:
            endpos = j if j > i else i + 1

        # stdlib parse_starttag body
        attrs: list[tuple[str, str | None]] = []
        tm = _tagfind.match(text, i + 1)
        k = tm.end()
        tag = tm.group(1).lower()
        self.lasttag = tag
        while k < endpos:
            am = _attrfind.match(text, k)
            if am is None:
                break
            attrname, rest, attrvalue = am.group(1, 2, 3)
            if not rest:
                attrvalue = None
            elif (attrvalue[:1] == "'" == attrvalue[-1:]
                  or attrvalue[:1] == '"' == attrvalue[-1:]):
                attrvalue = attrvalue[1:-1]
            if attrvalue:
                attrvalue = unescape(attrvalue)
            attrs.append((attrname.lower(), attrvalue))
            k = am.end()

        end = text[k:endpos].strip()
        if end not in (">", "/>"):
            self._data_offset = i
            self.handle_data(text[i:endpos])  # raw, per stdlib
            return endpos
        if end.endswith("/>"):
            self.handle_startendtag(tag, attrs)
        else:
            self.handle_starttag(tag, attrs)
            if tag in self.CDATA_CONTENT_ELEMENTS:
                self._set_cdata_mode(tag)
        return endpos

    def _parse_endtag(self, text: str, i: int) -> int:
        # NOTE: only called outside cdata mode (cdata close is handled
        # in _run); mirrors stdlib parse_endtag with cdata_elem None
        gt = text.find(">", i + 1)
        if gt < 0:
            return -1
        gtpos = gt + 1
        m = _endtagfind.match(text, i)
        if m is not None:
            self.handle_endtag(m.group(1).lower())
            return m.end()
        nm = _tagfind.match(text, i + 2)
        if nm is None:
            if text[i: i + 3] == "</>":
                return i + 3
            return self._parse_bogus_comment(text, i)
        tagname = nm.group(1).lower()
        gtpos = text.find(">", nm.end()) + 1  # always found: see above
        self.handle_endtag(tagname)
        return gtpos

    def _parse_bogus_comment(self, text: str, i: int) -> int:
        pos = text.find(">", i + 2)
        if pos == -1:
            return -1
        self.handle_comment(text[i + 2: pos])
        return pos + 1

    def _parse_comment(self, text: str, i: int) -> int:
        m = _commentclose.search(text, i + 4)
        if m is None:
            return -1
        self.handle_comment(text[i + 4: m.start()])
        return m.end()

    def _parse_pi(self, text: str, i: int) -> int:
        pos = text.find(">", i + 2)
        if pos == -1:
            return -1
        self.handle_pi(text[i + 2: pos])
        return pos + 1

    def _parse_html_declaration(self, text: str, i: int) -> int:
        # '<!--' was dispatched before this point
        if text.startswith("<![", i):
            return self._parse_marked_section(text, i)
        if text[i: i + 9].lower() == "<!doctype":
            gtpos = text.find(">", i + 9)
            if gtpos == -1:
                return -1
            self.handle_decl(text[i + 2: gtpos])
            return gtpos + 1
        return self._parse_bogus_comment(text, i)

    def _parse_marked_section(self, text: str, i: int) -> int:
        # _markupbase.parse_marked_section with report=1
        if i + 3 >= len(text):
            return -1  # stdlib _scan_name end-of-buffer
        nm = _declname.match(text, i + 3)
        if nm is None:
            # raise parity with _markupbase._scan_name: observable via
            # the per-row error column
            raise AssertionError(
                "expected name token at %r" % text[i: i + 20])
        s = nm.group()
        if i + 3 + len(s) == len(text):
            return -1  # end of buffer
        name = s.strip().lower()
        if name in {"temp", "cdata", "ignore", "include", "rcdata"}:
            m = _markedsectionclose.search(text, i + 3)
        elif name in {"if", "else", "endif"}:
            m = _msmarkedsectionclose.search(text, i + 3)
        else:
            # raise parity with _markupbase.parse_marked_section
            raise AssertionError(
                "unknown status keyword %r in marked section"
                % text[i + 3: nm.end()])
        if m is None:
            return -1
        self.unknown_decl(text[i + 3: m.start()])
        return m.end()

    # -- default (overridable) handlers ---------------------------------------

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        self.handle_endtag(tag)

    def handle_starttag(self, tag, attrs):
        pass

    def handle_endtag(self, tag):
        pass

    def handle_data(self, data):
        pass

    def handle_comment(self, data):
        pass

    def handle_decl(self, decl):
        pass

    def handle_pi(self, data):
        pass

    def unknown_decl(self, data):
        pass

    def error(self, message):
        pass
