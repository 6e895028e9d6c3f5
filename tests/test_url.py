"""WHATWG URL resolver parity tests (SURVEY.md §2.3 F6)."""

import pytest

from unfurl_ray.core.url import resolve_url, to_url


CASES = [
    ("", "http://example.com", "http://example.com/"),
    ("/logo.png", "http://ogp.me/", "http://ogp.me/logo.png"),
    ("http://ogp.me", "http://x/", "http://ogp.me/"),  # origin gains /
    ("https://x.com:443/a", "http://x/", "https://x.com/a"),  # default port
    ("http://a.com:8080/", "http://x/", "http://a.com:8080/"),
    ("//cdn.com/x", "https://a.com/b", "https://cdn.com/x"),
    ("b/c", "http://a/d/e", "http://a/d/b/c"),
    ("../up", "http://a/d/e/f", "http://a/d/up"),
    ("?q=1", "http://a/d/e", "http://a/d/e?q=1"),
    ("#frag", "http://a/d/e?x=2", "http://a/d/e?x=2#frag"),
    ("HTTP://EXAMPLE.com/Path", "http://x/", "http://example.com/Path"),
    ("http://a\\b/c", "http://x/", "http://a/b/c"),  # backslash = slash
    ("/a b", "http://x.com", "http://x.com/a%20b"),
    ("/a%2Fb", "http://x.com", "http://x.com/a%2Fb"),  # keep escapes
    ("mailto:foo@bar.com", "http://x/", "mailto:foo@bar.com"),
    ("./", "http://a/b/c", "http://a/b/"),
    ("https://me:pw@h.com/x", "http://x/", "https://me:pw@h.com/x"),
    ("http://a.com/?q=a b", "http://x/", "http://a.com/?q=a%20b"),
]


@pytest.mark.parametrize("value,base,expected", CASES)
def test_resolve(value, base, expected):
    assert resolve_url(value, base) == expected


def test_to_url_falsy_and_invalid():
    assert to_url(None, "http://x/") is None
    assert to_url("", "http://x/") is None
    assert to_url("http://[bad", "http://x/") is None
