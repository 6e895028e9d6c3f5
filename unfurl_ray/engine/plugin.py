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

    Accepts a plain dict (url -> page, optionally with
    ``accept:<mime>`` sub-entries), any object exposing
    ``get_page(url, accept)`` (e.g. the fixture-corpus resolver), or a
    ``request(url, accept)`` callable (the reference's ``Request``,
    unfurl/src/index.ts:17 — what plugins receive as ``input.request``).
    """
    if not side_table:
        return None
    if hasattr(side_table, "get_page"):
        return side_table.get_page(url, accept)
    if callable(side_table) and not isinstance(side_table, dict):
        return side_table(url, accept)
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


_JSONLD_CONTEXT_REL = "http://www.w3.org/ns/json-ld#context"


def _jsonld_context_link(header: str) -> "str | None":
    """First Link-header entry carrying the JSON-LD alternate-context
    relation (RFC 8288 comma-separated ``<url>; param=value`` form).

    Entries without a matching ``rel`` are ignored — returns None when
    no entry names the context relation."""
    import re

    # split only at commas that START a new `<url>` entry: RFC 8288
    # allows commas inside quoted parameter values and inside URLs,
    # so a naive split would shear 'title="a, b"' mid-entry
    for part in re.split(r",(?=\s*<)", header):
        seg = part.strip()
        if not seg.startswith("<") or ">" not in seg:
            continue
        url = seg[1: seg.index(">")]
        params = seg[seg.index(">") + 1:]
        m = re.search(r'rel\s*=\s*("([^"]*)"|([^;\s]+))', params)
        if not m:
            continue
        rels = (m.group(2) if m.group(2) is not None
                else m.group(3) or "").split()
        if _JSONLD_CONTEXT_REL in rels:
            return url
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
        self._loading: set[str] = set()

    def get(self, url: str) -> Any:
        if url in self._cache:
            return self._cache[url]
        if url in self._loading:  # Link-header cycle guard
            return None
        self._loading.add(url)
        try:
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
                    # the reference forwards the Link header as the
                    # remote document's contextUrl (unfurl-html/src/
                    # index.ts:160-162); per the JSON-LD alternate-
                    # context rule ONLY a link whose rel is the
                    # json-ld#context relation supplies the @context —
                    # an unrelated Link (rel=preload etc.) must not
                    # silently substitute the page's own body
                    from unfurl_ray.core.values import to_value

                    link = to_value(
                        (page.get("headers") or {}).get("link")
                    )
                    if isinstance(link, str) and link.strip():
                        target = _jsonld_context_link(link)
                        if target:
                            linked = self.get(target)
                            if isinstance(linked, dict):
                                doc = linked
            self._cache[url] = doc
        finally:
            self._loading.discard(url)
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
        off = getattr(self, "_data_offset", None)
        if off is not None:
            return off  # fast parser tracks char offsets directly
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


# -- user-extension plugin API ----------------------------------------------
#
# Faithful to the reference's middleware model (unfurl/src/index.ts:19-26):
#
#     Plugin = (input, next) => Promise<Unfurl>
#     Input  = { page, request, scrape }
#
# A plugin either handles the page, delegates via ``next(input)``, or
# wraps ``next``'s result; ``input.scrape`` lets it recursively scrape a
# sub-resource fetched through ``input.request``.


class PageInput:
    """The reference's ``Input`` (unfurl/src/index.ts:19-23): the page
    record plus ``request`` / ``scrape`` handles so a plugin can make
    secondary fetches and recurse into the scraper.

    ``context_loader`` is engine-side cache threading — the reference
    gets the same per-scraper JSON-LD cache by memoizing its document
    loader on the ``request`` identity (unfurl-html/src/index.ts:146).
    """

    __slots__ = ("page", "request", "scrape", "context_loader")

    def __init__(self, page: SidePage, request: Callable,
                 scrape: Callable, context_loader: Any = None):
        self.page = page
        self.request = request
        self.scrape = scrape
        self.context_loader = context_loader


Next = Callable[[PageInput], dict]
Plugin = Callable[[PageInput, Next], dict]


def _page_text(page: SidePage) -> str:
    body = page.get("body") or ""
    if isinstance(body, bytes):
        return body.decode("utf-8", errors="replace")
    return body


def _page_bytes(page: SidePage) -> bytes:
    body = page.get("body") or b""
    return body if isinstance(body, bytes) else body.encode()


def html_plugin(inp: PageInput, next_fn: Next) -> dict:
    """Built-in HTML plugin as reference-shaped middleware
    (unfurl-html/src/index.ts:41-87): defer to ``next`` on non-HTML."""
    page = inp.page
    mime = content_type(page.get("headers"))
    if mime != "text/html":
        return next_fn(inp)
    result = scrape_html(
        page["url"], page.get("status", 200), mime, _page_text(page),
        side_table=inp.request, context_loader=inp.context_loader,
    )
    return result if result is not None else next_fn(inp)


def exif_plugin(inp: PageInput, next_fn: Next) -> dict:
    from unfurl_ray.content.exif import scrape_exif

    page = inp.page
    result = scrape_exif(
        page["url"], content_type(page.get("headers")), _page_bytes(page)
    )
    return result if result is not None else next_fn(inp)


def filemeta_plugin(inp: PageInput, next_fn: Next) -> dict:
    from unfurl_ray.content.filemeta import scrape_filemeta

    page = inp.page
    result = scrape_filemeta(
        page["url"], content_type(page.get("headers")), _page_bytes(page)
    )
    return result if result is not None else next_fn(inp)


PLUGIN_REGISTRY: dict[str, Plugin] = {
    "html": html_plugin,
    "exif": exif_plugin,
    "filemeta": filemeta_plugin,
}


def register_plugin(name: str, fn: Plugin) -> None:
    """Register a user plugin under ``name`` for use in any stage's
    ``plugins`` tuple (names resolve through this registry)."""
    PLUGIN_REGISTRY[name] = fn


def make_request(side_table: SideTable | None) -> Callable:
    """Side table -> the reference's ``Request`` callable shape."""
    if (callable(side_table) and not isinstance(side_table, dict)
            and not hasattr(side_table, "get_page")):
        return side_table
    return lambda url, accept=None: side_request(side_table, url, accept)


def compose_scraper(
    plugins: "list[Plugin]",
    request: Callable,
    context_loader: Any = None,
) -> Callable[[SidePage], dict]:
    """The reference's ``scraper()`` composition (unfurl/src/index.ts:
    171-188): a left reduce wraps each plugin around the accumulated
    ``next``, so the LAST plugin in the list is the outermost
    middleware and runs FIRST; the base handler emits
    ``{type: "link", url}``.  The returned ``scrape`` hands itself to
    every plugin via ``input.scrape`` (recursion support).
    """
    def base(inp: PageInput) -> dict:
        return {"type": "link", "url": inp.page.get("url")}

    next_fn: Next = base
    for plugin in plugins:
        def wrap(p: Plugin, nxt: Next) -> Next:
            return lambda inp: p(inp, nxt)

        next_fn = wrap(plugin, next_fn)

    def scrape(page: SidePage) -> dict:
        return next_fn(PageInput(page, request, scrape, context_loader))

    return scrape


def resolve_plugins(plugins) -> "list[Plugin]":
    return [
        PLUGIN_REGISTRY[p] if isinstance(p, str) else p for p in plugins
    ]


def scrape_page(
    url: str,
    status: int,
    headers: dict | None,
    body: str | bytes,
    side_table: SideTable | None = None,
    context_loader: dict[str, Any] | None = None,
    plugins: tuple = ("html",),
) -> dict:
    """Run the plugin chain over one page record; fall back to Link.

    ``plugins`` entries are registry names or ``Plugin`` callables.
    This entry point's tuple order is first-chance-first, so it
    right-folds the REVERSED list (the reference's ``plugins`` array is
    outermost-LAST; use ``compose_scraper`` directly for that order).
    """
    scrape = compose_scraper(
        list(reversed(resolve_plugins(plugins))),
        make_request(side_table),
        context_loader,
    )
    return scrape(
        {"url": url, "status": status, "headers": headers, "body": body}
    )
