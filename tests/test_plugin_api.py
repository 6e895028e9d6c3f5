"""User-extension plugin API: registry, next-composition, recursion.

Mirrors the reference's middleware contract (unfurl/src/index.ts:19-26
``Plugin = (input, next) => Promise<Unfurl>`` and the right-fold
composition at :171-188 where the LAST plugin in the options list is
the outermost middleware), plus the Link-header context URL forwarding
of the JSON-LD document loader (unfurl-html/src/index.ts:160-162).
"""

from unfurl_ray.engine.plugin import (
    ContextLoader,
    PLUGIN_REGISTRY,
    compose_scraper,
    make_request,
    register_plugin,
    scrape_page,
)

HTML = (
    '<html><head><title>T</title>'
    '<meta property="og:title" content="OG Title"></head>'
    "<body><p>hi</p></body></html>"
)


def _page(url, body, mime="text/html", status=200, headers=None):
    h = {"content-type": mime}
    h.update(headers or {})
    return {"url": url, "status": status, "headers": h, "body": body}


def test_base_handler_emits_link():
    scrape = compose_scraper([], make_request(None))
    out = scrape(_page("https://x.test/", "zzz", mime="text/plain"))
    assert out == {"type": "link", "url": "https://x.test/"}


def test_last_plugin_runs_first():
    order = []

    def p1(inp, nxt):
        order.append("p1")
        return nxt(inp)

    def p2(inp, nxt):
        order.append("p2")
        return nxt(inp)

    scrape = compose_scraper([p1, p2], make_request(None))
    scrape(_page("https://x.test/", "", mime="text/plain"))
    # reference reduce: plugins=[p1, p2] -> p2 wraps p1 -> p2 first
    assert order == ["p2", "p1"]


def test_plugin_wraps_next_result():
    def tagger(inp, nxt):
        out = nxt(inp)
        return {**out, "tags": (out.get("tags") or []) + ["wrapped"]}

    register_plugin("tagger", tagger)
    try:
        out = scrape_page(
            "https://x.test/", 200, {"content-type": "text/html"}, HTML,
            plugins=("tagger", "html"),
        )
    finally:
        del PLUGIN_REGISTRY["tagger"]
    assert out["type"] == "website"
    assert out["headline"] == "OG Title"
    assert out["tags"][-1] == "wrapped"


def test_plugin_recursive_scrape_via_side_table():
    """A plugin fetches a sub-resource with input.request and recurses
    into input.scrape — the reference's ``scrape`` handle in Input."""
    side = {
        "https://x.test/inner": {
            "status": 200,
            "headers": {"content-type": "text/html"},
            "body": HTML.replace("OG Title", "Inner Title"),
        }
    }

    def embedder(inp, nxt):
        out = nxt(inp)
        # guard: don't recurse while scraping the sub-resource itself
        if out.get("type") != "website" or \
                inp.page["url"] == "https://x.test/inner":
            return out
        sub = inp.request("https://x.test/inner")
        if sub:
            inner = inp.scrape(
                {**sub, "url": "https://x.test/inner"}
            )
            out = {**out, "mainEntity": inner}
        return out

    out = scrape_page(
        "https://x.test/", 200, {"content-type": "text/html"}, HTML,
        side_table=side, plugins=(embedder, "html"),
    )
    assert out["headline"] == "OG Title"
    assert out["mainEntity"]["type"] == "website"
    assert out["mainEntity"]["headline"] == "Inner Title"


def test_builtins_resolve_through_registry():
    for name in ("html", "exif", "filemeta"):
        assert name in PLUGIN_REGISTRY
    out = scrape_page(
        "https://x.test/", 200, {"content-type": "text/html"}, HTML,
        plugins=("html",),
    )
    assert out["type"] == "website"


def test_context_loader_follows_link_header():
    """A context page whose Link header names the real context doc:
    the linked document supplies the @context
    (unfurl-html/src/index.ts:160-162 contextUrl forwarding)."""
    real = {"@context": {"name": "http://schema.org/name"}}
    side = {
        "https://ctx.test/doc": {
            "status": 200,
            "headers": {
                "content-type": "application/ld+json",
                "link": '<https://ctx.test/real>; '
                        'rel="http://www.w3.org/ns/json-ld#context"',
            },
            "body": "{}",
        },
        "https://ctx.test/real": {
            "status": 200,
            "headers": {"content-type": "application/ld+json"},
            "body": '{"@context": {"name": "http://schema.org/name"}}',
        },
    }
    loader = ContextLoader(side)
    assert loader.get("https://ctx.test/doc") == real
    # cached: second get returns the same resolved doc
    assert loader.get("https://ctx.test/doc") == real
    # a page with no link header still resolves to its own body
    assert loader.get("https://ctx.test/real") == real


def test_context_loader_link_cycle_guard():
    rel = 'rel="http://www.w3.org/ns/json-ld#context"'
    side = {
        "https://a.test/": {
            "status": 200,
            "headers": {"content-type": "application/ld+json",
                        "link": f"<https://b.test/>; {rel}"},
            "body": "{}",
        },
        "https://b.test/": {
            "status": 200,
            "headers": {"content-type": "application/ld+json",
                        "link": f"<https://a.test/>; {rel}"},
            "body": "{}",
        },
    }
    loader = ContextLoader(side)
    out = loader.get("https://a.test/")  # must terminate
    assert out == {} or out is None


def test_context_loader_ignores_unrelated_link_rel():
    """A context page carrying an unrelated Link (rel=preload) keeps
    its OWN body — only rel=json-ld#context substitutes the doc."""
    side = {
        "https://ctx.test/doc": {
            "status": 200,
            "headers": {
                "content-type": "application/ld+json",
                "link": '<https://cdn.test/font.woff2>; rel="preload"',
            },
            "body": '{"@context": {"x": "http://schema.org/x"}}',
        },
    }
    loader = ContextLoader(side)
    assert loader.get("https://ctx.test/doc") == {
        "@context": {"x": "http://schema.org/x"}
    }
