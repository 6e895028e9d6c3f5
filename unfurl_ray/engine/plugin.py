"""Per-record scrape composition (the reference's middleware chain).

The reference composes plugins as a right-fold middleware chain where
the base handler emits ``{type: "link", url}`` (unfurl/src/index.ts:
171-188).  Here the chain is a plain content-type router — each plugin
inspects the record and either handles it or defers — executed *per
row inside a Ray ``map_batches`` UDF* (the engine never schedules one
task per record).

Secondary fetches (oEmbed bodies, JSON-LD remote contexts) resolve
against an offline side table (`dict` lookup) that the Ray pipeline
broadcasts once via ``ray.put`` / actor state — mirroring the
fixture-cached ``request`` of the reference's test harness
(test/src/index.ts:174-237) and its memoized context loader.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from unfurl_ray.content.boilerplate import (
    ContentCollector,
    blocks_to_main,
    extract_blocks,
    finish_blocks,
)
from unfurl_ray.content.mime import content_type
from unfurl_ray.core.values import to_array
from unfurl_ray.html.extract import assemble_website
from unfurl_ray.html.jsonld import normalize_jsonld
from unfurl_ray.html.metaparser import MetaHandler, parse_html

CONTENT_TYPE_JSON = "application/json"
CONTENT_TYPE_OEMBED = "application/json+oembed"

# A side-table "page": status, headers (dict), body (str)
SidePage = dict
# url -> SidePage; the accept parameter selects the sub-entry when the
# side table stores per-accept variants under "accept:<mime>" keys.
SideTable = dict


def side_request(
    side_table: SideTable | None, url: str, accept: str | None = None
) -> SidePage | None:
    """Resolve a secondary request against the offline side table.

    Accepts either a plain dict (url -> page, optionally with
    ``accept:<mime>`` sub-entries) or any object exposing
    ``get_page(url, accept)`` (e.g. the fixture-corpus resolver).
    """
    if not side_table:
        return None
    if hasattr(side_table, "get_page"):
        return side_table.get_page(url, accept)
    entry = side_table.get(url)
    if entry is None:
        return None
    if accept and isinstance(entry, dict) and f"accept:{accept}" in entry:
        return entry[f"accept:{accept}"]
    return entry


def get_oembed(
    side_table: SideTable | None, alternate: list[dict]
) -> dict | None:
    """oEmbed lookup with the reference's gates (unfurl-html/src/index.ts:92-122):
    first ``application/json+oembed`` alternate; accept json; result only
    when status 200 and mime in {json, json+oembed}; non-object or
    malformed JSON swallowed."""
    oembed_link = None
    for alt in alternate:
        if alt.get("type") == CONTENT_TYPE_OEMBED:
            oembed_link = alt
            break
    if not oembed_link:
        return None
    page = side_request(side_table, oembed_link["href"], CONTENT_TYPE_JSON)
    if not page:
        return None
    mime = content_type(page.get("headers"))
    if page.get("status") == 200 and mime in (CONTENT_TYPE_JSON,
                                              CONTENT_TYPE_OEMBED):
        try:
            data = json.loads(page.get("body") or "")
        except (ValueError, RecursionError):
            return None
        if isinstance(data, dict):
            return data
    return None


class ContextLoader:
    """JSON-LD remote-context cache over the offline side table.

    Mirrors the memoized document loader (unfurl-html/src/index.ts:
    146-172): accept ``application/ld+json``; status 200 + JSON/ld+json
    content-type; body parsed as JSON; anything else an empty document.
    One instance lives per extraction actor (state in ``__init__``,
    SURVEY.md §2.4 T1) so contexts resolve once per actor, not per row.
    """

    def __init__(self, side_table: SideTable | None):
        self.side_table = side_table
        self._cache: dict[str, Any] = {}

    def get(self, url: str) -> Any:
        if url in self._cache:
            return self._cache[url]
        doc = None
        page = side_request(self.side_table, url, "application/ld+json")
        if isinstance(page, dict):
            mime = content_type(page.get("headers"))
            if page.get("status") == 200 and mime in (
                CONTENT_TYPE_JSON, "application/ld+json"
            ):
                try:
                    parsed = json.loads(page.get("body") or "")
                except (ValueError, RecursionError):
                    parsed = None
                if isinstance(parsed, dict):
                    doc = parsed
        self._cache[url] = doc
        return doc

    def __bool__(self) -> bool:
        return True


def scrape_html(
    url: str,
    status: int,
    mime: str,
    body_text: str,
    side_table: SideTable | None = None,
    context_loader: dict[str, Any] | None = None,
) -> dict | None:
    """The HTML plugin (unfurl-html/src/index.ts:41-87). None = defer."""
    if mime != "text/html":
        return None
    metadata = parse_html(body_text, url)
    if metadata is None:
        return {"type": "website", "url": url}
    merged = (
        to_array(metadata.jsonld)
        + to_array(metadata.rdfa)
        + to_array(metadata.microdata)
    )
    if context_loader is None:
        context_loader = ContextLoader(side_table)
    graph = normalize_jsonld(merged, url, context_loader)
    oembed = get_oembed(side_table, metadata.alternate) if status == 200 else None
    return assemble_website(url, mime, metadata, graph, oembed)


class MetaContentHandler(MetaHandler):
    """MetaHandler + main-content blocks in ONE tokenization pass.

    The metadata and boilerplate extractors both run the stdlib
    tokenizer over the same (potentially multi-MB) payload; fusing them
    halves tokenizer work in the hot ``ExtractTurns`` stage.  Metadata
    semantics are exactly ``MetaHandler``'s (every event delegates via
    super() first); content events mirror ``_ContentHandler``'s —
    ``handle_startendtag`` maps to starttag+endtag, matching the
    HTMLParser default dispatch the standalone handler relies on.
    """

    def __init__(self, url: str):
        super().__init__(url)
        self.content = ContentCollector()
        self._line_starts: list[int] | None = None
        self._fed_text = ""

    def feed(self, data):
        self._fed_text = data
        super().feed(data)

    def _offset(self) -> int:
        if self._line_starts is None:
            text = self._fed_text or self.rawdata
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
        super().handle_starttag(tag, attrs)
        self.content.starttag(tag)

    def handle_startendtag(self, tag, attrs):
        super().handle_startendtag(tag, attrs)
        self.content.starttag(tag)
        self.content.endtag(tag)

    def handle_endtag(self, tag):
        super().handle_endtag(tag)
        self.content.endtag(tag)

    def handle_data(self, data):
        super().handle_data(data)
        if self.content.wants_data() and data.strip():
            self.content.data(data, self._offset())


def scrape_html_with_content(
    url: str,
    status: int,
    mime: str,
    body_text: str,
    side_table: SideTable | None = None,
    context_loader: dict[str, Any] | None = None,
) -> tuple[dict | None, str, list[dict]]:
    """Single-pass variant of ``scrape_html`` + ``extract_main_text``.

    Returns ``(record_or_None, main_text, spans)``; record None means
    the mime gate deferred (non-HTML).  Degradation parity: a parse
    error still yields the bare website record, and main content is
    re-attempted standalone (the metadata callbacks may raise on input
    the content pass would survive).
    """
    if mime != "text/html":
        return None, "", []
    handler = MetaContentHandler(url)
    try:
        handler.feed(body_text)
        metadata = handler.result()
        blocks = finish_blocks(handler.content)
    except Exception:
        metadata = None
        blocks = extract_blocks(body_text)  # rare: content-only retry
    main_text, spans = blocks_to_main(blocks)
    if metadata is None:
        return {"type": "website", "url": url}, main_text, spans
    merged = (
        to_array(metadata.jsonld)
        + to_array(metadata.rdfa)
        + to_array(metadata.microdata)
    )
    if context_loader is None:
        context_loader = ContextLoader(side_table)
    graph = normalize_jsonld(merged, url, context_loader)
    oembed = get_oembed(side_table, metadata.alternate) if status == 200 else None
    record = assemble_website(url, mime, metadata, graph, oembed)
    return record, main_text, spans


Plugin = Callable[..., "dict | None"]


def scrape_page(
    url: str,
    status: int,
    headers: dict | None,
    body: str | bytes,
    side_table: SideTable | None = None,
    context_loader: dict[str, Any] | None = None,
    plugins: tuple[str, ...] = ("html",),
) -> dict:
    """Run the plugin chain over one page record; fall back to Link.

    Per the reference's composition order (last plugin runs first), but
    expressed as a router: each enabled plugin gets a chance in order,
    the base emits ``{type: "link", url}``.
    """
    mime = content_type(headers)
    if isinstance(body, bytes):
        text_body: str | None = None
    else:
        text_body = body

    for name in plugins:
        if name == "html":
            if text_body is None and isinstance(body, bytes):
                text_body = body.decode("utf-8", errors="replace")
            result = scrape_html(
                url, status, mime, text_body or "", side_table, context_loader
            )
            if result is not None:
                return result
        elif name == "exif":
            from unfurl_ray.content.exif import scrape_exif
            raw = body if isinstance(body, bytes) else body.encode()
            result = scrape_exif(url, mime, raw)
            if result is not None:
                return result
        elif name == "filemeta":
            from unfurl_ray.content.filemeta import scrape_filemeta
            raw = body if isinstance(body, bytes) else body.encode()
            result = scrape_filemeta(url, mime, raw)
            if result is not None:
                return result
    return {"type": "link", "url": url}
