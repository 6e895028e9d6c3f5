"""The 14 extraction getters + Website snippet assembly.

Faithful reimplementation of the getters in unfurl-html/src/index.ts
(§2.8 of SURVEY.md), including the JS-truthiness corner cases: helpers
that always return arrays (``jsonLdValueArray``) make some fallback
branches unreachable (e.g. og video:tag tags, twitter image *append*),
and we preserve that by using explicit JS truthiness throughout.

``None`` stands for JS ``undefined``; records are plain dicts.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable

from unfurl_ray.core.entities import decode
from unfurl_ray.core.url import to_url
from unfurl_ray.core.values import (
    copy_props,
    first_of,
    js_number,
    to_array,
    to_number,
    to_date,
    to_string,
    to_twitter_handle,
)
from unfurl_ray.html.metaparser import Result

OG = "http://ogp.me/ns#"
ARTICLE = "http://ogp.me/ns/article#"
SCHEMA = "http://schema.org/"
DC = "http://purl.org/dc/terms/"
CC = "https://creativecommons.org/ns#"


def js_truthy(value: Any) -> bool:
    """JS truthiness: [] and {} are truthy; '' / 0 / NaN / None are not."""
    if value is None or value is False:
        return False
    if isinstance(value, str):
        return value != ""
    if isinstance(value, (int, float)):
        return value != 0 and not (isinstance(value, float) and math.isnan(value))
    return True


class ExtractOptions:
    """Bundle of extraction inputs (unfurl-html/src/index.ts:127-132)."""

    __slots__ = ("url", "metadata", "graph", "oembed")

    def __init__(
        self,
        url: str,
        metadata: Result | None,
        graph: list[dict] | None,
        oembed: dict | None,
    ):
        self.url = url
        self.metadata = metadata
        self.graph = graph
        self.oembed = oembed

    # Bucket accessors (None-safe like TS optional chaining).
    def html(self, key: str) -> Any:
        return self.metadata.html.get(key) if self.metadata else None

    def twitter(self, key: str) -> Any:
        return self.metadata.twitter.get(key) if self.metadata else None

    def sailthru(self, key: str) -> Any:
        return self.metadata.sailthru.get(key) if self.metadata else None

    def applinks(self, key: str) -> Any:
        return self.metadata.applinks.get(key) if self.metadata else None

    def oe(self, key: str) -> Any:
        return self.oembed.get(key) if self.oembed else None


# -- JSON-LD graph accessors (unfurl-html/src/index.ts:302-341) -------------

def jsonld_value(node: dict) -> str | None:
    val = node.get("@value")
    if not js_truthy(val):
        return None
    return _js_string(val)


def _js_string(value: Any) -> str:
    if isinstance(value, str):
        return value
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, float):
        if value.is_integer() and abs(value) < 2**21:
            return str(int(value))
        return repr(value)
    return str(value)


def jsonld_key(key: str, node: dict) -> list | None:
    val = node.get(key)
    return val if isinstance(val, list) else None


def jsonld_is_of_type(type_iri: str, node: dict) -> bool:
    return type_iri in (node.get("@type") or [])


def jsonld_id_string(values: list | None) -> str | None:
    for v in values or []:
        vid = v.get("@id") if isinstance(v, dict) else None
        if js_truthy(vid):
            return vid
    return None


def jsonld_value_string(values: list | None) -> str | None:
    for v in values or []:
        if isinstance(v, dict):
            s = jsonld_value(v)
            if js_truthy(s):
                return decode(s)
    return None


def jsonld_value_array(values: list | None) -> list[str]:
    """Always a list — mirrors the JS helper whose [] result is truthy."""
    out = []
    for v in values or []:
        if isinstance(v, dict):
            s = jsonld_value(v)
            if js_truthy(s):
                out.append(decode(s))
    return out


def graph_first(
    graph: list[dict] | None, map_fn: Callable[[dict], Any]
) -> Any:
    return first_of(graph, map_fn)


# -- getters ----------------------------------------------------------------

def get_canonical_url(o: ExtractOptions) -> str | None:
    """unfurl-html/src/index.ts:371-384."""
    return (
        to_url(o.html("canonical"), o.url)
        or to_url(o.twitter("url"), o.url)
        or to_url(
            jsonld_value_string(
                graph_first(o.graph, lambda x: jsonld_key(OG + "url", x))
            ),
            o.url,
        )
        or to_url(o.applinks("web:url"), o.url)
        or to_url(to_string(o.oe("url")), o.url)
    )


def get_author(o: ExtractOptions) -> dict:
    """unfurl-html/src/index.ts:389-410."""
    name = (
        o.html("author")
        or jsonld_value_string(
            graph_first(
                o.graph,
                lambda x: (
                    jsonld_key(ARTICLE + "author", x)
                    or jsonld_key(CC + "attributionName", x)
                    or first_of(
                        jsonld_key(SCHEMA + "author", x),
                        lambda a: jsonld_key(SCHEMA + "name", a)
                        if isinstance(a, dict)
                        else None,
                    )
                ),
            )
        )
        or decode(to_string(o.oe("author_name")))
        or o.sailthru("author")
        or None
    )
    return {
        "name": name if js_truthy(name) else None,
        "url": to_string(o.oe("author_url")),
        "twitterHandle": to_twitter_handle(_scalar(o.twitter("creator"))),
    }


_COMMA_SPLIT = re.compile(r" *, *")


def get_tags(o: ExtractOptions) -> list[str]:
    """unfurl-html/src/index.ts:415-434 (og video:tag branch is dead code
    in the reference because jsonLdValueArray always yields an array)."""
    html_keywords = _scalar(o.html("keywords"))
    if js_truthy(html_keywords):
        return _COMMA_SPLIT.split(html_keywords.strip())
    schema_keywords = jsonld_value_array(
        graph_first(o.graph, lambda x: jsonld_key(SCHEMA + "keywords", x))
    )
    if len(schema_keywords) == 1:
        return _COMMA_SPLIT.split(schema_keywords[0])
    return schema_keywords


def get_provider(o: ExtractOptions) -> dict:
    """unfurl-html/src/index.ts:439-451."""
    name = (
        jsonld_value_string(
            graph_first(o.graph, lambda x: jsonld_key(OG + "site_name", x))
        )
        or decode(to_string(o.oe("provider_name")))
        or o.html("apple-mobile-web-app-title")
        or None
    )
    return {
        "name": name if js_truthy(name) else None,
        "url": to_string(o.oe("provider_url")),
        "twitterHandle": to_twitter_handle(_scalar(o.twitter("site"))),
    }


def get_headline(o: ExtractOptions) -> str | None:
    """unfurl-html/src/index.ts:456-472."""
    return (
        decode(to_string(o.oe("title")))
        or jsonld_value_string(
            graph_first(
                o.graph,
                lambda x: jsonld_key(OG + "title", x)
                or jsonld_key(DC + "title", x),
            )
        )
        or _truthy_or_none(o.sailthru("title"))
        or _truthy_or_none(_scalar(o.twitter("title")))
        or _truthy_or_none(_scalar(o.twitter("text:title")))
        or _truthy_or_none(o.html("title"))
    )


def get_description(o: ExtractOptions) -> str | None:
    """unfurl-html/src/index.ts:477-492."""
    return (
        jsonld_value_string(
            graph_first(
                o.graph,
                lambda x: jsonld_key(SCHEMA + "description", x)
                or jsonld_key(OG + "description", x),
            )
        )
        or decode(to_string(o.oe("summary")))
        or _truthy_or_none(o.sailthru("description"))
        or _truthy_or_none(_scalar(o.twitter("description")))
        or _truthy_or_none(_scalar(o.html("description")))
    )


_SIZE_WS = re.compile(r"\s+")


def get_icon(o: ExtractOptions) -> list[dict]:
    """unfurl-html/src/index.ts:497-514 — preserves the quirks: JS
    ``Number('']`` and unicode ``×`` produce NaN, and the broken unary
    comparator makes the "sort" a no-op so the LAST size wins."""
    icons = []
    meta_icons = to_array(o.metadata.icons if o.metadata else None)
    for icon in meta_icons:
        width = height = None
        sizes = icon.get("sizes")
        if js_truthy(sizes):
            pairs = [
                [js_number(p) for p in s.split("x")[:2]]
                for s in _SIZE_WS.split(sizes)
            ]
            # .sort((x) => x[0]) with a unary comparator returns NaN-ish
            # comparisons that V8 treats as 0 -> stable no-op; .pop()
            # takes the last entry.
            if pairs:
                last = pairs[-1]
                width = _nanint(last[0]) if len(last) > 0 else None
                height = _nanint(last[1]) if len(last) > 1 else None

        icons.append(
            {
                "type": "image",
                "url": icon.get("href"),
                "encodingFormat": icon.get("type"),
                "width": width,
                "height": height,
            }
        )
    return icons


def _nanint(num: float) -> float | int:
    if isinstance(num, float) and math.isnan(num):
        return num
    if isinstance(num, float) and num.is_integer() and abs(num) < 2**53:
        return int(num)
    return num


def _scalar(value: Any) -> Any:
    """Bucket values may be arrays when a meta key repeats; the reference
    types them ``string`` and reads them directly — a repeated scalar key
    keeps its first occurrence there, so take the first element."""
    if isinstance(value, list):
        return value[0] if value else None
    return value


def _truthy_or_none(value: Any) -> Any:
    return value if js_truthy(value) else None


def _add_media(items: list[dict], new_item: dict, append: bool) -> None:
    """Dedup-by-url merge (unfurl-html/src/index.ts:534-545)."""
    for item in items:
        if item.get("url") == new_item.get("url"):
            copy_props(item, {k: v for k, v in new_item.items() if v is not None})
            return
    if append and (js_truthy(new_item.get("url")) or
                   js_truthy(new_item.get("secureUrl"))):
        items.append(new_item)


def get_image(o: ExtractOptions) -> list[dict]:
    """unfurl-html/src/index.ts:519-632."""
    def g(key: str) -> list[str]:
        return jsonld_value_array(
            graph_first(o.graph, lambda x: jsonld_key(OG + key, x))
        )

    ogp_images = jsonld_value_array(
        graph_first(
            o.graph,
            lambda x: jsonld_key(OG + "image", x)
            or jsonld_key(OG + "image:url", x),
        )
    )
    twitter_images = to_array(o.twitter("image"))
    sailthru_image = o.sailthru("image.full")
    images: list[dict] = []

    def add_images(urls, secure_urls, types, alts, widths, heights, append):
        secure_urls = secure_urls or []
        types = types or []
        alts = alts or []
        widths = widths or []
        heights = heights or []
        for i, raw_url in enumerate(urls):
            secure = to_url(_idx(secure_urls, i), o.url)
            url = to_url(raw_url, o.url) or secure
            if not js_truthy(url):
                continue
            _add_media(
                images,
                {
                    "type": "image",
                    "url": url,
                    "secureUrl": secure,
                    "encodingFormat": _idx(types, i),
                    "description": _idx(alts, i),
                    "width": to_number(_idx(widths, i)),
                    "height": to_number(_idx(heights, i)),
                },
                append,
            )

    if js_truthy(sailthru_image):
        url = to_url(sailthru_image, o.url)
        if js_truthy(url):
            _add_media(images, {"type": "image", "url": url}, True)

    # ogp_images is always a list (JS []-truthy): append branch active.
    add_images(
        ogp_images,
        g("image:secure_url"),
        g("image:type"),
        None,
        g("image:width"),
        g("image:height"),
        True,
    )

    # twitter images never *append* in the reference (append gate
    # `!ogpImages` is always false) — they only merge extra props
    # into images already found by og/sailthru.
    add_images(
        twitter_images,
        None,
        None,
        to_array(o.twitter("image:alt")),
        to_array(o.twitter("image:width")),
        to_array(o.twitter("image:height")),
        False,
    )

    return images


def _idx(arr: list | None, i: int) -> Any:
    if arr is None:
        return None
    return arr[i] if i < len(arr) else None


def get_audio(o: ExtractOptions) -> list[dict]:
    """unfurl-html/src/index.ts:637-689."""
    def g(key: str) -> list[str]:
        return jsonld_value_array(
            graph_first(o.graph, lambda x: jsonld_key(OG + key, x))
        )

    ogp_audios = jsonld_value_array(
        graph_first(
            o.graph,
            lambda x: jsonld_key(OG + "audio", x)
            or jsonld_key(OG + "audio:url", x),
        )
    )
    audios: list[dict] = []
    secure_urls = g("audio:secure_url")
    types = g("audio:type")
    for i, raw_url in enumerate(ogp_audios):
        secure = to_url(_idx(secure_urls, i), o.url)
        url = to_url(raw_url, o.url) or secure
        if not js_truthy(url):
            continue
        _add_media(
            audios,
            {
                "type": "audio",
                "url": url,
                "secureUrl": secure,
                "encodingFormat": _idx(types, i),
            },
            True,
        )
    return audios


def get_video(o: ExtractOptions) -> list[dict]:
    """unfurl-html/src/index.ts:694-799."""
    def g(key: str) -> list[str]:
        return jsonld_value_array(
            graph_first(o.graph, lambda x: jsonld_key(OG + key, x))
        )

    ogp_videos = jsonld_value_array(
        graph_first(
            o.graph,
            lambda x: jsonld_key(OG + "video", x)
            or jsonld_key(OG + "video:url", x),
        )
    )
    videos: list[dict] = []
    secure_urls = g("video:secure_url")
    types = g("video:type")
    widths = g("video:width")
    heights = g("video:height")
    for i, raw_url in enumerate(ogp_videos):
        secure = to_url(_idx(secure_urls, i), o.url)
        url = to_url(raw_url, o.url) or secure
        if not js_truthy(url):
            continue
        _add_media(
            videos,
            {
                "type": "video",
                "url": url,
                "secureUrl": secure,
                "encodingFormat": _idx(types, i),
                "width": to_number(_idx(widths, i)),
                "height": to_number(_idx(heights, i)),
            },
            True,
        )

    if _scalar(o.twitter("card")) == "player":
        embed_url = to_url(_scalar(o.twitter("player")), o.url)
        width = to_number(_scalar(o.twitter("player:width")))
        height = to_number(_scalar(o.twitter("player:height")))
        stream_url = to_url(_scalar(o.twitter("player:stream")), o.url)
        stream_format = _scalar(o.twitter("player:stream:content_type"))
        if js_truthy(embed_url) and js_truthy(width) and js_truthy(height):
            _add_media(
                videos,
                {
                    "type": "video",
                    "url": embed_url,
                    "encodingFormat": "text/html",
                    "width": width,
                    "height": height,
                },
                True,
            )
        if js_truthy(stream_url):
            _add_media(
                videos,
                {
                    "type": "video",
                    "url": stream_url,
                    "encodingFormat": stream_format,
                    "width": width,
                    "height": height,
                },
                True,
            )
    return videos


# -- apps (unfurl-html/src/index.ts:804-1001) -------------------------------

def _twitter_app(o: ExtractOptions, suffix: str, device: str | None,
                 os_name: str) -> dict | None:
    url = _scalar(o.twitter(f"app:url:{suffix}"))
    app_id = _scalar(o.twitter(f"app:id:{suffix}"))
    name = _scalar(o.twitter(f"app:name:{suffix}"))
    if js_truthy(app_id) and js_truthy(name) and js_truthy(url):
        app = {"os": os_name, "id": app_id, "name": name, "url": url}
        if device:
            app = {"device": device, **app}
        return app
    return None


def _applinks_app(o: ExtractOptions, prefix: str, id_key: str,
                  device: str | None, os_name: str) -> dict | None:
    url = _scalar(o.applinks(f"{prefix}:url"))
    app_id = _scalar(o.applinks(f"{prefix}:{id_key}"))
    name = _scalar(o.applinks(f"{prefix}:app_name"))
    if js_truthy(app_id) and js_truthy(name) and js_truthy(url):
        app = {"os": os_name, "id": app_id, "name": name, "url": url}
        if device:
            app = {"device": device, **app}
        return app
    return None


def get_apps(o: ExtractOptions) -> list[dict]:
    """Fixed probe order; twitter:app:* beats al:* per platform."""
    probes = [
        _twitter_app(o, "iphone", "iPhone", "iOS")
        or _applinks_app(o, "iphone", "app_store_id", "iPhone", "iOS"),
        _twitter_app(o, "ipad", "iPad", "iOS")
        or _applinks_app(o, "ipad", "app_store_id", "iPad", "iOS"),
        _applinks_app(o, "ios", "app_store_id", None, "iOS"),
        _twitter_app(o, "googleplay", None, "Android")
        or _applinks_app(o, "android", "package", None, "Android"),
        _applinks_app(o, "windows", "app_id", "PC", "Windows"),
        _applinks_app(o, "windows_phone", "app_id", "Mobile", "Windows"),
        _applinks_app(o, "windows_universal", "app_id", None, "Windows"),
    ]
    return [p for p in probes if p]


def get_language(o: ExtractOptions) -> str | None:
    """unfurl-html/src/index.ts:1006-1012 (NOT from <html lang>)."""
    return (
        jsonld_value_string(
            graph_first(o.graph, lambda x: jsonld_key(OG + "locale", x))
        )
        or _truthy_or_none(_scalar(o.html("language")))
    )


# -- mainEntity / embed -----------------------------------------------------

def jsonld_to_image(o: ExtractOptions, node: dict) -> dict | None:
    """unfurl-html/src/index.ts:1025-1042 (keeps the Ted.com hack)."""
    if not isinstance(node, dict):
        return None
    url = jsonld_id_string(jsonld_key(SCHEMA + "url", node))
    if js_truthy(url) and not url.startswith(o.url):
        height = to_number(
            jsonld_value_string(jsonld_key(SCHEMA + "height", node))
        )
        width = to_number(
            jsonld_value_string(jsonld_key(SCHEMA + "width", node))
        )
        return {"type": "image", "url": url, "height": height, "width": width}
    return None


def jsonld_to_person(o: ExtractOptions, node: dict) -> dict | None:
    """unfurl-html/src/index.ts:1047-1063."""
    if not isinstance(node, dict):
        return None
    name = jsonld_value_string(jsonld_key(SCHEMA + "name", node))
    if js_truthy(name):
        image = None
        for logo in jsonld_key(SCHEMA + "logo", node) or []:
            candidate = jsonld_to_image(o, logo)
            if js_truthy(candidate):
                image = candidate
                break
        return {"name": name, "image": image}
    return None


def get_main_entity(o: ExtractOptions) -> dict | None:
    """unfurl-html/src/index.ts:1068-1138."""
    graph = o.graph or []
    ogp = next((x for x in graph if jsonld_key(OG + "type", x)), {})
    article = next(
        (x for x in graph if jsonld_is_of_type(SCHEMA + "NewsArticle", x)), {}
    )
    ogp_type = jsonld_value_string(jsonld_key(OG + "type", ogp))

    if article.get("@type") or ogp_type == "article":
        images = []
        for img in jsonld_key(SCHEMA + "image", article) or []:
            candidate = jsonld_to_image(o, img)
            if js_truthy(candidate):
                images.append(candidate)
        author = next(
            (
                p
                for p in (
                    jsonld_to_person(o, a)
                    for a in jsonld_key(SCHEMA + "author", article) or []
                )
                if js_truthy(p)
            ),
            None,
        )
        publisher = next(
            (
                p
                for p in (
                    jsonld_to_person(o, a)
                    for a in jsonld_key(SCHEMA + "publisher", article) or []
                )
                if js_truthy(p)
            ),
            None,
        )
        section = jsonld_value_string(
            jsonld_key(SCHEMA + "articleSection", article)
            if jsonld_key(SCHEMA + "articleSection", article) is not None
            else jsonld_key(ARTICLE + "section", ogp)
        )
        date_published = to_date(
            jsonld_value_string(
                jsonld_key(SCHEMA + "datePublished", article)
                if jsonld_key(SCHEMA + "datePublished", article) is not None
                else jsonld_key(ARTICLE + "published_time", ogp)
            )
        )
        date_expires = to_date(
            jsonld_value_string(jsonld_key(ARTICLE + "expiration_time", ogp))
        )
        date_modified = to_date(
            jsonld_value_string(
                jsonld_key(SCHEMA + "dateModified", article)
                if jsonld_key(SCHEMA + "dateModified", article) is not None
                else jsonld_key(ARTICLE + "modified_time", ogp)
            )
        )
        return {
            "type": "article",
            "image": images,
            "author": author,
            "publisher": publisher,
            "headline": jsonld_value_string(
                jsonld_key(SCHEMA + "headline", article)
            ),
            "section": section,
            "datePublished": date_published,
            "dateExpires": date_expires,
            "dateModified": date_modified,
        }
    return None


def get_embed(o: ExtractOptions) -> dict | None:
    """unfurl-html/src/index.ts:1140-1170."""
    twitter_type = _scalar(o.twitter("card"))
    oembed_type = o.oe("type")
    html = to_string(o.oe("html"))

    if oembed_type in ("video", "rich") and js_truthy(html):
        return {
            "type": "rich",
            "html": html,
            "width": to_number(o.oe("width")),
            "height": to_number(o.oe("height")),
        }
    if twitter_type in ("photo", "gallery") or oembed_type == "photo":
        url = to_url(to_string(o.oe("url")), o.url)
        if js_truthy(url):
            return {
                "type": "image",
                "url": url,
                "width": to_number(o.oe("width")),
                "height": to_number(o.oe("height")),
            }
    return None


def assemble_website(
    url: str,
    encoding_format: str,
    metadata: Result | None,
    graph: list[dict] | None,
    oembed: dict | None,
) -> dict:
    """Build the Website snippet (unfurl-html/src/index.ts:66-84)."""
    o = ExtractOptions(url, metadata, graph, oembed)
    return {
        "type": "website",
        "url": url,
        "encodingFormat": encoding_format,
        "icon": get_icon(o),
        "image": get_image(o),
        "video": get_video(o),
        "audio": get_audio(o),
        "mainEntity": get_main_entity(o),
        "embed": get_embed(o),
        "canonicalUrl": get_canonical_url(o),
        "headline": get_headline(o),
        "description": get_description(o),
        "provider": get_provider(o),
        "author": get_author(o),
        "tags": get_tags(o),
        "language": get_language(o),
        "apps": get_apps(o),
    }
