"""Main-content extraction: boilerplate stripping via text/link density.

The north_rule adds a DOM-heuristic main-content pass (Readability /
Boilerpipe style — Kohlschütter et al., "Boilerplate Detection using
Shallow Text Features", WSDM 2010) on top of the reference's metadata
extraction.  This is a from-scratch implementation over the same
tolerant stdlib tokenizer the metaparser uses:

- block-level elements delimit text blocks;
- ``script/style/noscript/template/svg`` content is dropped;
- container roles (``nav/header/footer/aside/form/menu``) mark their
  whole subtree boilerplate;
- a block is *content* when it has enough words and a low link density
  (words inside <a> / total words);
- emitted per block: text, char span into the source, word/link stats.

Pure function of the input string -> runs inside stateless
``map_batches`` tasks; the compiled regexes live at module level
(loaded once per worker process).

``ContentCollector`` holds the per-document state behind plain
``starttag/endtag/data`` events so ONE tokenization pass can drive it
alongside the metadata handler (engine/plugin.py combined path) — the
HTML is megabytes per turn and tokenizing it twice was ~30% of the
extract stage's CPU.
"""

from __future__ import annotations

import re

BLOCK_TAGS = frozenset(
    "p div td th li dd dt h1 h2 h3 h4 h5 h6 article section pre "
    "blockquote main figcaption summary center".split()
)
DROP_TAGS = frozenset("script style noscript template svg iframe".split())
BOILER_TAGS = frozenset("nav header footer aside form menu button".split())
VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

MIN_WORDS = 8
MAX_LINK_DENSITY = 0.33

_WORDS = re.compile(r"\S+")
_WS = re.compile(r"\s+")


class _Block:
    __slots__ = ("parts", "start", "end", "link_words", "boiler")

    def __init__(self, boiler: bool):
        self.parts: list[str] = []
        self.start = -1
        self.end = -1
        self.link_words = 0
        self.boiler = boiler


class ContentCollector:
    """Parser-agnostic block state; drive with starttag/endtag/data.

    ``data`` takes the char offset of the data run (or -1 unknown) so
    the caller owns position bookkeeping (it differs per tokenizer).
    """

    def __init__(self):
        self.blocks: list[_Block] = []
        self._drop = 0
        self._boiler = 0
        self._link = 0
        self._stack: list[str] = []
        self._current: _Block | None = None

    def _open_block(self):
        self._current = _Block(self._boiler > 0)
        self.blocks.append(self._current)

    def _close_block(self):
        self._current = None

    def starttag(self, tag: str):
        if tag in DROP_TAGS:
            if tag not in VOID:
                self._drop += 1
            return
        if tag in BOILER_TAGS:
            self._boiler += 1
            self._stack.append(tag)
            self._close_block()
            return
        if tag == "a":
            self._link += 1
            self._stack.append(tag)
            return
        if tag in BLOCK_TAGS:
            self._close_block()
            self._open_block()
        if tag not in VOID:
            self._stack.append(tag)

    def endtag(self, tag: str):
        if tag in DROP_TAGS:
            if self._drop > 0:
                self._drop -= 1
            return
        if tag in BOILER_TAGS:
            if self._boiler > 0:
                self._boiler -= 1
            self._close_block()
        elif tag == "a":
            if self._link > 0:
                self._link -= 1
        elif tag in BLOCK_TAGS:
            self._close_block()
        if self._stack and tag in self._stack:
            while self._stack and self._stack.pop() != tag:
                pass

    def data(self, data: str, pos: int):
        if self._drop > 0:
            return
        stripped = data.strip()
        if not stripped:
            return
        if self._current is None:
            self._open_block()
        block = self._current
        if block.start < 0:
            block.start = pos
        if pos >= 0:
            block.end = pos + len(data)
        block.parts.append(data)
        if self._link > 0:
            block.link_words += len(_WORDS.findall(data))
        if self._boiler > 0:
            block.boiler = True

    def wants_data(self) -> bool:
        """True when a data run could contribute (skip offset math else)."""
        return self._drop == 0


import os

if os.environ.get("UNFURL_RAY_STDLIB_HTMLPARSER"):
    from html.parser import HTMLParser
else:
    from unfurl_ray.html.fasttok import FastHTMLParser as HTMLParser


class _ContentHandler(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.collector = ContentCollector()
        self._line_starts: list[int] | None = None

    _fed = ""

    def feed(self, data):
        self._fed = data
        super().feed(data)

    def _offset(self) -> int:
        off = getattr(self, "_data_offset", None)
        if off is not None:
            return off  # fast parser tracks char offsets directly
        if self._line_starts is None:
            text = self.rawdata if not self._fed else self._fed
            starts = [0]
            find = text.find
            i = find("\n")
            while i >= 0:
                starts.append(i + 1)
                i = find("\n", i + 1)
            self._line_starts = starts
        line, col = self.getpos()
        if line - 1 < len(self._line_starts):
            return self._line_starts[line - 1] + col
        return -1

    def handle_starttag(self, tag, attrs):
        self.collector.starttag(tag)

    def handle_endtag(self, tag):
        self.collector.endtag(tag)

    def handle_data(self, data):
        if self.collector.wants_data() and data.strip():
            self.collector.data(data, self._offset())


def finish_blocks(collector: ContentCollector) -> list[dict]:
    """Classify collected blocks -> stats dicts (content + boilerplate)."""
    out = []
    for block in collector.blocks:
        text = _WS.sub(" ", "".join(block.parts)).strip()
        if not text:
            continue
        words = len(_WORDS.findall(text))
        link_density = block.link_words / words if words else 0.0
        is_content = (
            not block.boiler
            and words >= MIN_WORDS
            and link_density <= MAX_LINK_DENSITY
        )
        out.append(
            {
                "text": text,
                "start": block.start,
                "end": block.end,
                "words": words,
                "link_density": round(link_density, 4),
                "is_content": is_content,
            }
        )
    return out


def extract_blocks(html_text: str) -> list[dict]:
    """All text blocks with stats (content + boilerplate, classified)."""
    handler = _ContentHandler()
    try:
        handler.feed(html_text)
        handler.close()
    except Exception:
        return []
    return finish_blocks(handler.collector)


def blocks_to_main(blocks: list[dict]) -> tuple[str, list[dict]]:
    """Content blocks -> (main_text, spans)."""
    content = [b for b in blocks if b["is_content"]]
    main_text = "\n".join(b["text"] for b in content)
    spans = [
        {"start": b["start"], "end": b["end"], "kind": "main_text"}
        for b in content
        if b["start"] >= 0
    ]
    return main_text, spans


def extract_main_text(html_text: str) -> tuple[str, list[dict]]:
    """Main text + spans.  Returns ("", []) for non-HTML/empty input."""
    return blocks_to_main(extract_blocks(html_text))
