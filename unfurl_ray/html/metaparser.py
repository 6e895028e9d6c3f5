"""Tolerant HTML -> metadata-bucket parser.

From-scratch reimplementation of the *observable* behavior of the
``htmlmetaparser`` + ``htmlparser2`` pair the reference delegates to
(unfurl-html/src/index.ts:212-225; deps pinned at
/root/reference/package-lock.json:11840,11848), built on stdlib
``html.parser`` (error-tolerant, HTML5 charref decoding).

Produces the ``Result`` buckets the reference consumes (SURVEY.md §1.2):

- ``html``     — <title>, <meta name=description/keywords/author/...>,
                 <link rel=canonical>
- ``twitter``  — <meta name|property="twitter:*"> (repeats -> arrays)
- ``sailthru`` — <meta name="sailthru.*">
- ``applinks`` — <meta property="al:*">
- ``icons``    — <link rel=icon|shortcut icon|apple-touch-icon[-precomposed]>
                 (hrefs resolved absolute, deduped by href)
- ``alternate``— <link rel=alternate> ({type, href} resolved)
- ``jsonld``   — raw parsed <script type="application/ld+json"> bodies
- ``rdfa``     — expanded-form JSON-LD nodes from RDFa attributes
                 (property/prefix/typeof), with a built-in prefix table
                 so bare ``og:`` works without a ``prefix=`` declaration
                 (evidence: the xkcd/208 fixture declares no prefix)
- ``microdata``— expanded-form JSON-LD nodes from itemscope/itemprop

RDFa and microdata nodes are emitted **already in expanded JSON-LD
form** (full-IRI keys, ``{"@value": ...}`` / ``{"@id": ...}`` wrappers)
so that the downstream graph-normalization step (html/jsonld.py) only
needs real context processing for the ``jsonld`` bucket.
"""

from __future__ import annotations

import json
import os
import re

from unfurl_ray.core.url import to_url

if os.environ.get("UNFURL_RAY_STDLIB_HTMLPARSER"):
    # escape hatch + differential-test reference: the stdlib tokenizer
    # the fast one reimplements (tests/test_fasttok.py compares them)
    from html.parser import HTMLParser
else:
    from unfurl_ray.html.fasttok import FastHTMLParser as HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

ICON_RELS = frozenset(
    ["icon", "shortcut icon", "apple-touch-icon", "apple-touch-icon-precomposed"]
)

# Meta names copied verbatim into the `html` bucket.  Only the first
# seven are read downstream (SURVEY.md §1.2); the rest are common names
# kept for API completeness.
HTML_META_NAMES = frozenset(
    [
        "description", "keywords", "author", "language",
        "apple-mobile-web-app-title", "application-name", "generator",
        "creator", "publisher", "robots", "viewport", "theme-color",
        "date", "copyright",
    ]
)

# Built-in RDFa prefix table: W3C RDFa 1.1 initial context plus the OGP
# vertical namespaces.  ``og:`` without a prefix declaration must still
# expand (xkcd/208 fixture evidence); ``cc:`` binds to the https form
# (unfurl-html/src/index.ts:397 reads https://creativecommons.org/ns#).
BUILTIN_PREFIXES: dict[str, str] = {
    "og": "http://ogp.me/ns#",
    "fb": "http://ogp.me/ns/fb#",
    "article": "http://ogp.me/ns/article#",
    "book": "http://ogp.me/ns/book#",
    "books": "http://ogp.me/ns/books#",
    "music": "http://ogp.me/ns/music#",
    "video": "http://ogp.me/ns/video#",
    "profile": "http://ogp.me/ns/profile#",
    "website": "http://ogp.me/ns/website#",
    "cc": "https://creativecommons.org/ns#",
    "dc": "http://purl.org/dc/terms/",
    "dct": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "schema": "http://schema.org/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "gr": "http://purl.org/goodrelations/v1#",
    "ctag": "http://commontag.org/ns#",
    "rev": "http://purl.org/stuff/rev#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
}

_PREFIX_DECL = re.compile(r"([A-Za-z][\w.-]*):\s+(\S+)")
_WS = re.compile(r"\s+")
# JS /\s/ additionally matches U+FEFF (Python's doesn't).
_JS_WS = re.compile(r"[\s﻿]+")


def normalize_ws(value: str) -> str:
    """Collapse runs of (JS-definition) whitespace to single spaces and
    trim — applied to every extracted meta/text value, matching the
    reference parser's output (franz.com fixture: multi-line meta
    content collapses; atom.io: U+3000 ideographic spaces collapse)."""
    return _JS_WS.sub(" ", value).strip()


def set_bucket(bucket: dict, key: str, value) -> None:
    """Last occurrence wins (ideas.ted.com fixture: a later
    property="twitter:site" overwrites an earlier name="twitter:site")."""
    bucket[key] = value


# Built-in oEmbed provider registry.  Evidence: the instagram fixture's
# body contains no oembed link at all, yet the reference's fixture cache
# recorded a request to https://api.instagram.com/oembed?type=json&url=…;
# likewise soundcloud (whose body only declares text/json+oembed) hit
# https://soundcloud.com/oembed?type=json&url=… — so the parser the
# reference delegates to synthesizes endpoints for known providers.
# Only fixture-evidenced providers are included.
OEMBED_PROVIDERS: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^https?://(?:www\.)?instagram\.com/p/[^/]+"),
     "https://api.instagram.com/oembed"),
    (re.compile(r"^https?://(?:www\.)?soundcloud\.com/[^/]+/[^/]+"),
     "https://soundcloud.com/oembed"),
]


def _encode_uri_component(value: str) -> str:
    from urllib.parse import quote
    return quote(value, safe="-_.!~*'()")


def _merge_expanded(node: dict, key: str, values: list) -> None:
    node.setdefault(key, []).extend(values)


class Result:
    """Parsed metadata buckets (the reference's ``htmlmetaparser.Result``)."""

    __slots__ = ("html", "twitter", "sailthru", "applinks", "icons",
                 "alternate", "jsonld", "rdfa", "microdata")

    def __init__(self):
        self.html: dict = {}
        self.twitter: dict = {}
        self.sailthru: dict = {}
        self.applinks: dict = {}
        self.icons: list[dict] = []
        self.alternate: list[dict] = []
        self.jsonld: list = []
        self.rdfa: list[dict] = []
        self.microdata: list[dict] = []


class _Collector:
    """Accumulates text until its element closes."""

    __slots__ = ("depth", "parts", "finish")

    def __init__(self, depth: int, finish):
        self.depth = depth
        self.parts: list[str] = []
        self.finish = finish


class _Item:
    """An open microdata item (itemscope)."""

    __slots__ = ("depth", "node")

    def __init__(self, depth: int, node: dict):
        self.depth = depth
        self.node = node


# tags _element dispatches on, and attributes that activate its
# RDFa / microdata branches on any other tag — everything else is a
# provable no-op (see _element body)
_ELEMENT_TAGS = frozenset(("title", "meta", "link", "base", "script"))
_ELEMENT_ATTRS = frozenset(
    ("prefix", "vocab", "property", "itemscope", "itemprop"))


class MetaHandler(HTMLParser):
    """Single-pass streaming handler; feed() then call result()."""

    def __init__(self, url: str):
        super().__init__(convert_charrefs=True)
        self.url = url
        self.res = Result()
        self._depth = 0
        self._collectors: list[_Collector] = []
        self._icon_hrefs: set[str] = set()
        # RDFa state: prefix scopes + one merged node per subject.
        self._prefix_stack: list[tuple[int, dict[str, str]]] = []
        self._vocab_stack: list[tuple[int, str]] = []
        self._rdfa_nodes: dict[str, dict] = {}
        # Microdata state.
        self._item_stack: list[_Item] = []
        self._md_vocab_stack: list[tuple[int, str]] = []
        # <script type="application/ld+json"> capture.
        self._jsonld_collect: _Collector | None = None
        self._in_jsonld_script = False

    # -- tree bookkeeping ---------------------------------------------------

    def handle_starttag(self, tag, attrs):
        void = tag in VOID_ELEMENTS
        if not void:
            self._depth += 1
        if not attrs:
            if tag in _ELEMENT_TAGS:
                self._element(tag, {}, void)
            return
        attrd = dict(reversed(attrs))  # first occurrence wins
        for k, v in attrd.items():
            if v is None:
                attrd[k] = ""
        # _element is a no-op unless the tag is dispatched or an
        # RDFa/microdata trigger attribute is present — skip the call
        # for the typical <div class=...> / <a href=...> element
        if tag in _ELEMENT_TAGS or not _ELEMENT_ATTRS.isdisjoint(attrd):
            self._element(tag, attrd, void)

    def handle_startendtag(self, tag, attrs):
        if not attrs:
            if tag in _ELEMENT_TAGS:
                self._element(tag, {}, True)
            return
        attrd = dict(reversed(attrs))
        for k, v in attrd.items():
            if v is None:
                attrd[k] = ""
        if tag in _ELEMENT_TAGS or not _ELEMENT_ATTRS.isdisjoint(attrd):
            self._element(tag, attrd, True)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        if self._depth > 0:
            self._close_to(self._depth - 1)
            self._depth -= 1
        if tag == "script":
            self._in_jsonld_script = False

    def close(self):
        super().close()
        self._close_to(-1)

    def _close_to(self, depth: int) -> None:
        while self._collectors and self._collectors[-1].depth > depth:
            col = self._collectors.pop()
            col.finish("".join(col.parts))
        while self._prefix_stack and self._prefix_stack[-1][0] > depth:
            self._prefix_stack.pop()
        while self._vocab_stack and self._vocab_stack[-1][0] > depth:
            self._vocab_stack.pop()
        while self._item_stack and self._item_stack[-1].depth > depth:
            item = self._item_stack.pop()
            if not self._item_stack or "@__pending" not in item.node:
                pass
        while self._md_vocab_stack and self._md_vocab_stack[-1][0] > depth:
            self._md_vocab_stack.pop()

    def handle_data(self, data):
        if self._in_jsonld_script and self._jsonld_collect is not None:
            self._jsonld_collect.parts.append(data)
            return
        for col in self._collectors:
            col.parts.append(data)

    # -- element dispatch ---------------------------------------------------

    def _element(self, tag: str, attrs: dict[str, str], void: bool) -> None:
        depth = self._depth if not void else self._depth + 1
        if "prefix" in attrs:
            scope = dict(self._current_prefixes())
            for m in _PREFIX_DECL.finditer(attrs["prefix"]):
                scope[m.group(1)] = m.group(2)
            self._prefix_stack.append((self._depth, scope))
        if "vocab" in attrs:
            self._vocab_stack.append((self._depth, attrs["vocab"].strip()))

        if tag == "title":
            if not void and "title" not in self.res.html:
                self._collectors.append(
                    _Collector(self._depth, self._finish_title)
                )
        elif tag == "meta":
            self._meta(attrs)
        elif tag == "link":
            self._link(attrs)
        elif tag == "base":
            href = attrs.get("href")
            if href:
                resolved = to_url(href, self.url)
                if resolved:
                    self.url = resolved
        elif tag == "script":
            stype = (attrs.get("type") or "").split(";", 1)[0].strip().lower()
            if stype == "application/ld+json" and not void:
                self._in_jsonld_script = True
                self._jsonld_collect = _Collector(
                    self._depth, self._finish_jsonld
                )
                self._collectors.append(self._jsonld_collect)

        # RDFa on non-meta elements (a/link with property, or text content).
        if tag != "meta" and "property" in attrs and "content" not in attrs:
            self._rdfa_element(tag, attrs, void)

        # Microdata.
        if "itemscope" in attrs:
            self._microdata_scope(tag, attrs, void)
        elif "itemprop" in attrs and self._item_stack:
            self._microdata_prop(tag, attrs, void)

    def _finish_title(self, text: str) -> None:
        self.res.html.setdefault("title", normalize_ws(text))

    def _finish_jsonld(self, text: str) -> None:
        self._jsonld_collect = None
        try:
            data = json.loads(text)
        except (ValueError, RecursionError):
            return
        if isinstance(data, list):
            self.res.jsonld.extend(data)
        elif data is not None:
            self.res.jsonld.append(data)

    # -- <meta> -------------------------------------------------------------

    def _meta(self, attrs: dict[str, str]) -> None:
        raw_content = attrs.get("content")
        name = attrs.get("name")
        prop = attrs.get("property")
        if raw_content is None or (name is None and prop is None):
            return
        content = normalize_ws(raw_content)

        # name= and property= route independently — a single tag can
        # feed both (adactio fixture: name="twitter:image"
        # property="og:image").
        if name is not None:
            key = name.strip()
            lkey = key.lower()
            if lkey.startswith("twitter:"):
                set_bucket(self.res.twitter, key[8:], content)
            elif lkey.startswith("sailthru."):
                set_bucket(self.res.sailthru, key[9:], content)
            elif lkey.startswith("al:"):
                set_bucket(self.res.applinks, key[3:], content)
            elif lkey in HTML_META_NAMES:
                # html bucket is last-wins (franz.com fixture: the later
                # of two description metas is the one extracted).
                self.res.html[lkey] = content
        if prop is not None:
            key = prop.strip()
            lkey = key.lower()
            if lkey.startswith("twitter:"):
                if name is None:
                    set_bucket(self.res.twitter, key[8:], content)
            elif lkey.startswith("al:"):
                set_bucket(self.res.applinks, key[3:], content)
            else:
                iri = self._expand_curie(key)
                if iri:
                    node = self._subject_node()
                    _merge_expanded(node, iri, [{"@value": content}])

    # -- <link> -------------------------------------------------------------

    def _link(self, attrs: dict[str, str]) -> None:
        # rel matching is case-SENSITIVE like the reference parser
        # (cnn.com fixture: rel="Shortcut Icon" is NOT an icon there).
        rel = (attrs.get("rel") or "").strip()
        href = attrs.get("href")
        if not rel or not href:
            return
        rel = _WS.sub(" ", rel)
        resolved = to_url(href, self.url)
        if rel == "canonical":
            if resolved:
                self.res.html.setdefault("canonical", resolved)
        elif rel in ICON_RELS:
            if resolved:
                # Duplicate hrefs merge attrs into the first entry in
                # place (airbnb fixture: a later sized link fills in the
                # sizes of an earlier size-less one; xkcd: two rels, one
                # icon).
                existing = None
                if resolved in self._icon_hrefs:
                    for icon in self.res.icons:
                        if icon["href"] == resolved:
                            existing = icon
                            break
                if existing is None:
                    existing = {"href": resolved}
                    self._icon_hrefs.add(resolved)
                    self.res.icons.append(existing)
                if attrs.get("type"):
                    existing["type"] = attrs["type"]
                if attrs.get("sizes"):
                    existing["sizes"] = attrs["sizes"]
        elif rel == "alternate":
            if resolved:
                alt: dict = {"href": resolved}
                if attrs.get("type"):
                    alt["type"] = attrs["type"]
                if attrs.get("media"):
                    alt["media"] = attrs["media"]
                if attrs.get("hreflang"):
                    alt["hreflang"] = attrs["hreflang"]
                self.res.alternate.append(alt)

    # -- RDFa ---------------------------------------------------------------

    def _current_prefixes(self) -> dict[str, str]:
        return self._prefix_stack[-1][1] if self._prefix_stack else BUILTIN_PREFIXES

    def _current_vocab(self) -> str | None:
        return self._vocab_stack[-1][1] if self._vocab_stack else None

    def _expand_curie(self, value: str) -> str | None:
        """CURIE/term -> IRI; unknown bare terms need an active @vocab."""
        if not value or value.startswith("@"):
            return None
        if ":" in value:
            prefix, local = value.split(":", 1)
            if prefix in ("http", "https") or local.startswith("//"):
                return value
            base = self._current_prefixes().get(prefix)
            return base + local if base else None
        vocab = self._current_vocab()
        return vocab + value if vocab else None

    def _subject_node(self, subject: str | None = None) -> dict:
        sid = subject if subject is not None else ""
        node = self._rdfa_nodes.get(sid)
        if node is None:
            node = {}
            if sid:
                node["@id"] = sid
            self._rdfa_nodes[sid] = node
            self.res.rdfa.append(node)
        return node

    def _rdfa_element(self, tag: str, attrs: dict[str, str], void: bool) -> None:
        iri = self._expand_curie((attrs.get("property") or "").strip())
        if not iri:
            return
        node = self._subject_node(
            to_url(attrs["about"], self.url) if attrs.get("about") else None
        )
        href = attrs.get("href") or attrs.get("src") or attrs.get("resource")
        if href:
            resolved = to_url(href, self.url)
            if resolved:
                _merge_expanded(node, iri, [{"@id": resolved}])
            return
        if attrs.get("datetime"):
            _merge_expanded(node, iri, [{"@value": attrs["datetime"]}])
            return
        if not void:
            def finish(text: str, node=node, iri=iri):
                _merge_expanded(node, iri, [{"@value": normalize_ws(text)}])
            self._collectors.append(_Collector(self._depth, finish))

    # -- microdata ----------------------------------------------------------

    @staticmethod
    def _vocab_of(itemtype: str) -> str:
        cut = max(itemtype.rfind("/"), itemtype.rfind("#"))
        return itemtype[: cut + 1] if cut >= 0 else itemtype

    def _microdata_scope(self, tag: str, attrs: dict[str, str], void: bool) -> None:
        depth = self._depth if not void else self._depth + 1
        node: dict = {}
        types = _WS.split(attrs.get("itemtype", "").strip()) if attrs.get("itemtype") else []
        types = [t for t in types if t]
        if types:
            node["@type"] = types
            self._md_vocab_stack.append((self._depth, self._vocab_of(types[0])))
        if attrs.get("itemid"):
            resolved = to_url(attrs["itemid"], self.url)
            if resolved:
                node["@id"] = resolved

        itemprop = attrs.get("itemprop")
        if itemprop and self._item_stack:
            parent = self._item_stack[-1].node
            for name in _WS.split(itemprop.strip()):
                if name:
                    _merge_expanded(parent, self._md_prop_iri(name), [node])
        else:
            self.res.microdata.append(node)
        self._item_stack.append(_Item(self._depth if not void else self._depth, node))
        if void:
            self._item_stack.pop()

    def _md_prop_iri(self, name: str) -> str:
        if name.startswith(("http://", "https://")):
            return name
        vocab = (
            self._md_vocab_stack[-1][1]
            if self._md_vocab_stack
            else "http://schema.org/"
        )
        return vocab + name

    def _microdata_prop(self, tag: str, attrs: dict[str, str], void: bool) -> None:
        item = self._item_stack[-1].node
        names = [n for n in _WS.split(attrs["itemprop"].strip()) if n]
        if not names:
            return

        value: dict | None = None
        if tag == "meta":
            value = {"@value": attrs.get("content", "")}
        elif tag in ("a", "area", "link"):
            resolved = to_url(attrs.get("href"), self.url)
            value = {"@value": resolved} if resolved else None
        elif tag in ("img", "audio", "video", "source", "track", "embed", "iframe"):
            resolved = to_url(attrs.get("src"), self.url)
            value = {"@value": resolved} if resolved else None
        elif tag == "object":
            resolved = to_url(attrs.get("data"), self.url)
            value = {"@value": resolved} if resolved else None
        elif tag == "time" and attrs.get("datetime"):
            value = {"@value": attrs["datetime"]}
        elif tag == "data" and attrs.get("value"):
            value = {"@value": attrs["value"]}
        elif "content" in attrs:
            value = {"@value": attrs["content"]}

        if value is not None:
            for name in names:
                _merge_expanded(item, self._md_prop_iri(name), [value])
            return
        if void:
            for name in names:
                _merge_expanded(item, self._md_prop_iri(name), [{"@value": ""}])
            return

        iris = [self._md_prop_iri(n) for n in names]

        def finish(text: str, item=item, iris=iris):
            val = {"@value": normalize_ws(text)}
            for iri in iris:
                _merge_expanded(item, iri, [val])

        self._collectors.append(_Collector(self._depth, finish))

    def result(self) -> Result:
        self.close()
        for pattern, endpoint in OEMBED_PROVIDERS:
            if pattern.match(self.url):
                self.res.alternate.append(
                    {
                        "type": "application/json+oembed",
                        "href": endpoint + "?type=json&url="
                        + _encode_uri_component(self.url),
                    }
                )
                break
        return self.res

    def error(self, message):  # pragma: no cover - py<3.10 compat hook
        pass


def parse_html(text: str, url: str) -> Result | None:
    """Parse HTML into metadata buckets; parse failure -> None.

    Mirrors the reference's contract (unfurl-html/src/index.ts:212-225):
    a parser error yields ``undefined`` and the caller degrades to a bare
    ``{type: "website", url}``.
    """
    handler = MetaHandler(url)
    try:
        handler.feed(text)
        return handler.result()
    except Exception:
        return None
