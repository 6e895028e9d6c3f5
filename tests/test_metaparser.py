"""Metaparser bucket-behavior tests (semantics derived from fixtures)."""

from unfurl_ray.html.metaparser import parse_html


def test_basic_buckets():
    html = """
    <html><head prefix="og: http://ogp.me/ns#">
      <title>My &amp; Title</title>
      <meta name="description" content="first">
      <meta name="description" content="second">
      <meta name="twitter:card" content="summary">
      <meta name="sailthru.title" content="st">
      <meta property="al:ios:url" content="app://x">
      <meta property="og:title" content="OG Title">
      <link rel="canonical" href="/canon">
      <link rel="icon" href="/fav.ico" type="image/x-icon">
      <link rel="icon" href="/fav.ico">
      <link rel="alternate" type="application/json+oembed" href="/oembed">
    </head><body></body></html>
    """
    res = parse_html(html, "http://example.com/page")
    assert res.html["title"] == "My & Title"
    assert res.html["description"] == "second"  # last wins
    assert res.twitter["card"] == "summary"
    assert res.sailthru["title"] == "st"
    assert res.applinks["ios:url"] == "app://x"
    assert res.html["canonical"] == "http://example.com/canon"
    assert len(res.icons) == 1  # deduped by href
    assert res.icons[0]["type"] == "image/x-icon"
    assert res.alternate[0]["href"] == "http://example.com/oembed"
    assert res.rdfa[0]["http://ogp.me/ns#title"] == [{"@value": "OG Title"}]


def test_og_without_prefix_declaration():
    # xkcd/208 evidence: og: binds via the built-in table
    res = parse_html(
        '<meta property="og:image" content="http://x/i.png">', "http://x/"
    )
    assert res.rdfa[0]["http://ogp.me/ns#image"] == [
        {"@value": "http://x/i.png"}
    ]


def test_rel_case_sensitive():
    # cnn evidence: rel="Shortcut Icon" is not an icon
    res = parse_html(
        '<link rel="Shortcut Icon" href="/f.ico">', "http://x/"
    )
    assert res.icons == []


def test_meta_name_and_property_both_route():
    # adactio evidence: one tag can feed twitter AND rdfa buckets
    res = parse_html(
        '<meta name="twitter:image" property="og:image" content="/i.jpg">',
        "http://x/",
    )
    assert res.twitter["image"] == "/i.jpg"
    assert res.rdfa[0]["http://ogp.me/ns#image"] == [{"@value": "/i.jpg"}]


def test_whitespace_normalized():
    res = parse_html(
        '<meta name="description" content="a\r\n b　c">', "http://x/"
    )
    assert res.html["description"] == "a b c"


def test_jsonld_script_and_broken_json():
    res = parse_html(
        '<script type="application/ld+json">{"@type": "Thing"}</script>'
        '<script type="application/ld+json">{broken</script>',
        "http://x/",
    )
    assert res.jsonld == [{"@type": "Thing"}]


def test_microdata():
    res = parse_html(
        '<div itemscope itemtype="http://schema.org/Article">'
        '<h1 itemprop="headline">Hi there</h1>'
        '<a itemprop="keywords" href="/tag/a">A</a></div>',
        "http://x/",
    )
    node = res.microdata[0]
    assert node["@type"] == ["http://schema.org/Article"]
    assert node["http://schema.org/headline"] == [{"@value": "Hi there"}]
    assert node["http://schema.org/keywords"] == [{"@value": "http://x/tag/a"}]


def test_oembed_provider_registry():
    res = parse_html("<html></html>", "https://www.instagram.com/p/ABC/")
    assert any(
        a["type"] == "application/json+oembed"
        and a["href"].startswith("https://api.instagram.com/oembed?type=json")
        for a in res.alternate
    )


def test_broken_html_tolerated():
    res = parse_html("<html><head><title>ok</title><div<<<", "http://x/")
    assert res is not None and res.html.get("title") == "ok"
