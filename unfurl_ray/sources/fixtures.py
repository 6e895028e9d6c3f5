"""Reference conformance-corpus reader.

Reads the fixture HTTP cache of the reference test harness
(/root/reference/packages/test/fixtures — layout per
test/src/index.ts:174-237: one directory per ``filenamify(url)`` with
``meta.json`` + raw ``body``; secondary requests in
``filenamify("accept:<mime>")`` subdirectories) and the jest snapshot
goldens, producing plain Python/Arrow-friendly structures:

- ``load_pages()``      -> list of page dicts (url, status, headers, body)
- ``FixtureSideTable``  -> offline secondary-request resolver
- ``parse_snapshots()`` -> {url: golden dict} from a .snap file

Used by tests and by the fixture->parquet build step; never imported in
the hot path.
"""

from __future__ import annotations

import json
import math
import re
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

REFERENCE_FIXTURES = Path("/root/reference/packages/test/fixtures")
SNAP_DIR = Path("/root/reference/packages")

_RESERVED = re.compile(r'[<>:"/\\|?*\x00-\x1f]+')


def filenamify(value: str) -> str:
    """Port of ``filenamify@4`` defaults: reserved chars -> ``!``,
    runs collapsed, trimmed, truncated to 100 chars."""
    name = _RESERVED.sub("!", value)
    name = re.sub(r"!{2,}", "!", name).strip("!")
    return name[:100]


def build_filename(url: str, accept: str | None = None) -> str:
    """test/src/index.ts:174-182 ``buildFilename``."""
    if accept:
        return f"{filenamify(url)}/{filenamify(f'accept:{accept}')}"
    return filenamify(url)


def _read_page_dir(path: Path) -> dict | None:
    meta_path = path / "meta.json"
    body_path = path / "body"
    if not meta_path.is_file():
        return None
    meta = json.loads(meta_path.read_text())
    body = body_path.read_bytes() if body_path.is_file() else None
    return {
        "url": meta["url"],
        "status": meta["status"],
        "headers": meta.get("headers") or {},
        "body": body,
    }


class FixtureSideTable:
    """Offline resolver for secondary requests (oEmbed, @context docs)."""

    def __init__(self, fixture_dir: Path = REFERENCE_FIXTURES):
        self.fixture_dir = Path(fixture_dir)
        self._cache: dict[str, dict | None] = {}

    def get_page(self, url: str, accept: str | None = None) -> dict | None:
        name = build_filename(url, accept)
        if name in self._cache:
            return self._cache[name]
        page = None
        path = self.fixture_dir / name
        if path.is_dir():
            page = _read_page_dir(path)
        if page is None and accept:
            # The reference falls back to the no-accept cache entry only
            # on a live fetch; offline we try the plain dir too.
            plain = self.fixture_dir / build_filename(url)
            sub = None
            if plain.is_dir():
                for child in plain.iterdir():
                    if child.is_dir() and child.name.startswith("accept!"):
                        sub = child
                        break
            if sub is not None:
                page = _read_page_dir(sub)
        self._cache[name] = page
        return page


def fixture_urls() -> list[str]:
    """The 118 FIXTURE_URLS (test/src/index.ts:11-162), parsed out of the
    reference source so the order matches the snapshot naming."""
    src = (SNAP_DIR / "test/src/index.ts").read_text()
    # Wait for the literal array between FIXTURE_URLS = [ ... ];
    m = re.search(r"FIXTURE_URLS[^=]*=\s*\[(.*?)\];", src, re.S)
    if not m:
        return []
    return re.findall(r'"([^"]+)"', m.group(1))


def load_pages(urls: list[str] | None = None) -> list[dict]:
    """Primary pages for each fixture URL (follows the cache layout)."""
    table = FixtureSideTable()
    pages = []
    for url in urls if urls is not None else fixture_urls():
        page = table.get_page(url)
        if page is not None:
            pages.append({**page, "request_url": url})
    return pages


# -- jest snapshot parsing --------------------------------------------------

_SNAP_ENTRY = re.compile(
    r"exports\[`(?P<name>[^`]+)`\] = `\n(?P<body>.*?)\n`;", re.S
)
_DATE_LITERAL = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{3}Z$")


def _template_unescape(text: str) -> str:
    """Undo JS template-literal escapes (`\\`` -> `` ` ``, ``\\\\`` -> ``\\``)."""
    out = []
    i = 0
    n = len(text)
    while i < n:
        ch = text[i]
        if ch == "\\" and i + 1 < n and text[i + 1] in ("`", "\\", "$"):
            out.append(text[i + 1])
            i += 2
        else:
            out.append(ch)
            i += 1
    return "".join(out)


class _SnapParser:
    """Char-based parser for jest pretty-format v1 literals:
    ``Object {...}``, ``Array [...]``, quoted strings (may span lines,
    with ``\\"`` escapes), bare Date/NaN/undefined/number scalars."""

    def __init__(self, text: str):
        self.text = text
        self.pos = 0

    def parse(self) -> Any:
        self._ws()
        return self._value()

    def _ws(self):
        while self.pos < len(self.text) and self.text[self.pos] in " \t\n\r":
            self.pos += 1

    def _value(self) -> Any:
        t = self.text
        p = self.pos
        if t.startswith("Object {", p):
            self.pos = p + 8
            return self._object()
        if t.startswith("Array [", p):
            self.pos = p + 7
            return self._array()
        if t.startswith('"', p):
            return self._string()
        return self._bare()

    def _object(self) -> dict:
        out: dict = {}
        while True:
            self._ws()
            if self.pos >= len(self.text):
                return out
            if self.text[self.pos] == "}":
                self.pos += 1
                return out
            if self.text[self.pos] == ",":
                self.pos += 1
                continue
            key = self._string() if self.text[self.pos] == '"' else self._bare()
            self._ws()
            if self.pos < len(self.text) and self.text[self.pos] == ":":
                self.pos += 1
            self._ws()
            out[key] = self._value()

    def _array(self) -> list:
        out: list = []
        while True:
            self._ws()
            if self.pos >= len(self.text):
                return out
            if self.text[self.pos] == "]":
                self.pos += 1
                return out
            if self.text[self.pos] == ",":
                self.pos += 1
                continue
            out.append(self._value())

    def _string(self) -> str:
        t = self.text
        i = self.pos + 1
        out = []
        while i < len(t):
            ch = t[i]
            if ch == "\\" and i + 1 < len(t):
                nxt = t[i + 1]
                mapping = {"n": "\n", "r": "\r", "t": "\t", '"': '"',
                           "\\": "\\", "b": "\b", "f": "\f"}
                if nxt == "u" and i + 5 < len(t):
                    out.append(chr(int(t[i + 2: i + 6], 16)))
                    i += 6
                    continue
                out.append(mapping.get(nxt, nxt))
                i += 2
                continue
            if ch == '"':
                self.pos = i + 1
                return "".join(out)
            out.append(ch)
            i += 1
        self.pos = i
        return "".join(out)

    def _bare(self) -> Any:
        t = self.text
        i = self.pos
        while i < len(t) and t[i] not in ",\n}]":
            i += 1
        token = t[self.pos: i].strip()
        self.pos = i
        if token in ("undefined", "null"):
            return None
        if token == "NaN":
            return float("nan")
        if token == "true":
            return True
        if token == "false":
            return False
        if _DATE_LITERAL.match(token):
            return datetime.strptime(
                token, "%Y-%m-%dT%H:%M:%S.%fZ"
            ).replace(tzinfo=timezone.utc)
        try:
            if "." in token or "e" in token or "E" in token:
                return float(token)
            return int(token)
        except ValueError:
            return token


def parse_snapshots(snap_path: Path) -> dict[str, Any]:
    """Parse a ``__snapshots__/index.spec.ts.snap`` into {url: golden}."""
    text = Path(snap_path).read_text()
    out: dict[str, Any] = {}
    for m in _SNAP_ENTRY.finditer(text):
        name = m.group("name")
        um = re.match(r".* should read (.*) 1$", name)
        url = um.group(1) if um else name
        parser = _SnapParser(_template_unescape(m.group("body")))
        out[url] = parser.parse()
    return out


def html_snapshots() -> dict[str, Any]:
    return parse_snapshots(
        SNAP_DIR / "unfurl-html/src/__snapshots__/index.spec.ts.snap"
    )


def exif_snapshots() -> dict[str, Any]:
    return parse_snapshots(
        SNAP_DIR / "unfurl-exif/src/__snapshots__/index.spec.ts.snap"
    )


def exiftool_snapshots() -> dict[str, Any]:
    return parse_snapshots(
        SNAP_DIR / "unfurl-exiftool/src/__snapshots__/index.spec.ts.snap"
    )


def scrub_nan(value: Any) -> Any:
    """NaN -> 'NaN' markers for comparison-friendly equality."""
    if isinstance(value, dict):
        return {k: scrub_nan(v) for k, v in value.items()}
    if isinstance(value, list):
        return [scrub_nan(v) for v in value]
    if isinstance(value, float) and math.isnan(value):
        return "NaN"
    return value
