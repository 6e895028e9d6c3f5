"""WHATWG-URL-compatible resolver (subset).

The reference resolves every extracted URL with ``new URL(value, base)
.toString()`` (unfurl-html/src/index.ts:283-285).  WHATWG serialization
differs from ``urllib.parse.urljoin`` in ways that are visible in the
reference's snapshots: origins gain a trailing ``/``, default ports are
dropped, hosts are lowercased/IDNA-encoded, backslashes act as slashes
in special schemes, tabs/newlines are stripped, and each component has
its own percent-encode set.  This module implements the subset of the
WHATWG URL Standard (https://url.spec.whatwg.org/) that real-world web
metadata exercises.
"""

from __future__ import annotations

import re

SPECIAL_PORTS = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}
SPECIAL_SCHEMES = set(SPECIAL_PORTS) | {"file"}

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.-]*):")

# Percent-encode sets per https://url.spec.whatwg.org/#percent-encoded-bytes
_C0 = "".join(chr(c) for c in range(0x20)) + "\x7f"
_FRAGMENT_SET = set(_C0 + ' "<>`')
_QUERY_SET = set(_C0 + ' "<>#')
_SPECIAL_QUERY_SET = _QUERY_SET | {"'"}
_PATH_SET = _QUERY_SET | set("?`{}")
_USERINFO_SET = _PATH_SET | set("/:;=@[\\]^|")


def _pct_encode(value: str, enc_set: set) -> str:
    out = []
    for ch in value:
        if ch in enc_set or ord(ch) > 0x7E:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


class UrlError(ValueError):
    pass


class WhatwgUrl:
    """Parsed URL with WHATWG serialization."""

    __slots__ = ("scheme", "username", "password", "host", "port",
                 "path", "query", "fragment", "opaque_path")

    def __init__(self):
        self.scheme = ""
        self.username = ""
        self.password = ""
        self.host: str | None = None
        self.port: int | None = None
        self.path: list[str] = []
        self.query: str | None = None
        self.fragment: str | None = None
        self.opaque_path: str | None = None

    @property
    def special(self) -> bool:
        return self.scheme in SPECIAL_SCHEMES

    def serialize(self) -> str:
        out = [self.scheme, ":"]
        if self.host is not None:
            out.append("//")
            if self.username or self.password:
                out.append(self.username)
                if self.password:
                    out.append(":" + self.password)
                out.append("@")
            out.append(self.host)
            if self.port is not None:
                out.append(f":{self.port}")
        if self.opaque_path is not None:
            out.append(self.opaque_path)
        else:
            if self.host is None and len(self.path) >= 2 and self.path[0] == "":
                out.append("/.")
            out.append("/".join(self.path) if self.path else "")
        if self.query is not None:
            out.append("?" + self.query)
        if self.fragment is not None:
            out.append("#" + self.fragment)
        return "".join(out)


def _idna_host(host: str, special: bool) -> str:
    host = host.strip()
    if not special:
        return _pct_encode(host, set(_C0 + ' #/:<>?@[\\]^|"'))
    # Percent-decode first (hosts arrive percent-encoded sometimes).
    if "%" in host:
        try:
            host = re.sub(
                b"%([0-9A-Fa-f]{2})".decode(),
                lambda m: chr(int(m.group(1), 16)),
                host,
            )
        except ValueError:
            pass
    if host.startswith("[") and host.endswith("]"):
        return host.lower()
    host = host.lower()
    if any(ord(c) > 0x7E for c in host):
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError as exc:
            raise UrlError(f"invalid host {host!r}") from exc
    if any(c in host for c in ' #/:<>?@[]\\^|"'):
        raise UrlError(f"forbidden host code point in {host!r}")
    return host


def _split_authority(auth: str) -> tuple[str, str, str, int | None]:
    username = password = ""
    if "@" in auth:
        userinfo, auth = auth.rsplit("@", 1)
        if ":" in userinfo:
            username, password = userinfo.split(":", 1)
        else:
            username = userinfo
        username = _pct_encode(username, _USERINFO_SET)
        password = _pct_encode(password, _USERINFO_SET)
    port: int | None = None
    host = auth
    if auth.startswith("["):
        close = auth.find("]")
        host = auth[: close + 1]
        rest = auth[close + 1:]
        if rest.startswith(":"):
            port_s = rest[1:]
            port = int(port_s) if port_s else None
    elif ":" in auth:
        host, port_s = auth.rsplit(":", 1)
        if port_s:
            if not port_s.isdigit():
                raise UrlError(f"invalid port {port_s!r}")
            port = int(port_s)
    return host, username, password, port


def _normalize_slashes(s: str, special: bool) -> str:
    return s.replace("\\", "/") if special else s


_SINGLE_DOT = {".", "%2e", "%2E"}
_DOUBLE_DOT = {"..", ".%2e", ".%2E", "%2e.", "%2E.",
               "%2e%2e", "%2E%2E", "%2e%2E", "%2E%2e"}


def _parse_path(path_str: str, special: bool) -> list[str]:
    """Path segments with dot-normalization; result always starts with ''."""
    segments = path_str.split("/")
    out: list[str] = [""]
    n = len(segments)
    for i, seg in enumerate(segments):
        last = i == n - 1
        if seg in _SINGLE_DOT:
            if last:
                out.append("")
            continue
        if seg in _DOUBLE_DOT:
            if len(out) > 1:
                out.pop()
            if last:
                out.append("")
            continue
        if seg == "" and i == 0:
            continue
        out.append(_pct_encode(seg, _PATH_SET))
    return out


def parse_url(input_url: str, base: WhatwgUrl | None = None) -> WhatwgUrl:
    """Parse ``input_url`` against an optional base (WHATWG basic URL parser)."""
    s = input_url.strip(_C0 + " ")
    s = s.replace("\t", "").replace("\n", "").replace("\r", "")

    url = WhatwgUrl()
    m = _SCHEME_RE.match(s)
    scheme = m.group(1).lower() if m else None
    if scheme is not None and (base is None or scheme != base.scheme
                               or not _looks_relative_special(s, scheme)):
        url.scheme = scheme
        rest = s[len(scheme) + 1:]
        return _parse_after_scheme(url, rest)
    if base is None:
        raise UrlError(f"relative URL {input_url!r} without base")
    # Same-scheme special URLs like "https:/foo" are treated as relative.
    if scheme is not None and scheme == base.scheme and base.special:
        s = s[len(scheme) + 1:]
    return _parse_relative(s, base)


def _looks_relative_special(s: str, scheme: str) -> bool:
    """'https:foo' with a special base of the same scheme is relative."""
    rest = s[len(scheme) + 1:]
    return scheme in SPECIAL_SCHEMES and not rest.replace("\\", "/").startswith("//")


def _parse_after_scheme(url: WhatwgUrl, rest: str) -> WhatwgUrl:
    special = url.special
    rest = _normalize_slashes(rest, special) if special else rest
    if special:
        rest = re.sub(r"^/+", "//", rest) if rest.startswith("/") else rest
    if rest.startswith("//") or (special and rest and not rest.startswith("/")
                                 and url.scheme != "file"):
        if rest.startswith("//"):
            rest = rest[2:]
        auth_end = len(rest)
        for i, ch in enumerate(rest):
            if ch in "/?#":
                auth_end = i
                break
        authority, tail = rest[:auth_end], rest[auth_end:]
        if authority == "" and url.scheme != "file":
            raise UrlError("empty host")
        host, user, pwd, port = _split_authority(authority)
        url.host = _idna_host(host, special)
        if url.host == "" and special and url.scheme != "file":
            raise UrlError("empty host")
        url.username, url.password = user, pwd
        if port is not None and port != SPECIAL_PORTS.get(url.scheme):
            if not 0 <= port <= 65535:
                raise UrlError("port out of range")
            url.port = port
        _parse_path_query_fragment(url, tail)
        return url
    if rest.startswith("/"):
        url.host = None
        _parse_path_query_fragment(url, rest)
        return url
    # Opaque path (mailto:, data:, javascript: ...)
    frag = query = None
    if "#" in rest:
        rest, frag = rest.split("#", 1)
    if "?" in rest:
        rest, query = rest.split("?", 1)
    url.opaque_path = _pct_encode(rest, set(_C0))
    url.query = _pct_encode(query, _QUERY_SET) if query is not None else None
    url.fragment = _pct_encode(frag, _FRAGMENT_SET) if frag is not None else None
    return url


def _parse_path_query_fragment(url: WhatwgUrl, tail: str) -> None:
    special = url.special
    tail = _normalize_slashes(tail, special)
    frag = query = None
    if "#" in tail:
        tail, frag = tail.split("#", 1)
    if "?" in tail:
        tail, query = tail.split("?", 1)
    if tail.startswith("/"):
        tail = tail[1:]
    url.path = _parse_path(tail, special) if (tail or url.host is not None) else [""]
    if url.host is not None and not url.path:
        url.path = [""]
    if url.host is not None and url.path == [""]:
        url.path = ["", ""]
    qset = _SPECIAL_QUERY_SET if special else _QUERY_SET
    url.query = _pct_encode(query, qset) if query is not None else None
    url.fragment = _pct_encode(frag, _FRAGMENT_SET) if frag is not None else None


def _parse_relative(s: str, base: WhatwgUrl) -> WhatwgUrl:
    url = WhatwgUrl()
    url.scheme = base.scheme
    special = url.special
    s = _normalize_slashes(s, special)
    if s.startswith("//"):
        return _parse_after_scheme(url, s)
    url.host, url.port = base.host, base.port
    url.username, url.password = base.username, base.password
    if s == "":
        url.path = list(base.path)
        url.query = base.query
        return url
    if s.startswith("#"):
        url.path = list(base.path)
        url.query = base.query
        url.fragment = _pct_encode(s[1:], _FRAGMENT_SET)
        return url
    if s.startswith("?"):
        url.path = list(base.path)
        tail = s[1:]
        frag = None
        if "#" in tail:
            tail, frag = tail.split("#", 1)
        qset = _SPECIAL_QUERY_SET if special else _QUERY_SET
        url.query = _pct_encode(tail, qset)
        url.fragment = _pct_encode(frag, _FRAGMENT_SET) if frag is not None else None
        return url
    if s.startswith("/"):
        _parse_path_query_fragment(url, s)
        return url
    # Relative path: drop last segment of base, then resolve.
    frag = query = None
    if "#" in s:
        s, frag = s.split("#", 1)
    if "?" in s:
        s, query = s.split("?", 1)
    base_path = list(base.path[:-1]) if base.path else [""]
    merged = "/".join(base_path[1:]) + "/" + s if len(base_path) > 1 else s
    url.path = _parse_path(merged, special)
    if url.host is not None and len(url.path) == 1:
        url.path = ["", ""]
    qset = _SPECIAL_QUERY_SET if special else _QUERY_SET
    url.query = _pct_encode(query, qset) if query is not None else None
    url.fragment = _pct_encode(frag, _FRAGMENT_SET) if frag is not None else None
    return url


def resolve_url(value: str, base_url: str) -> str:
    """``new URL(value, base).toString()`` — raises UrlError when invalid."""
    base = parse_url(base_url)
    return parse_url(value, base).serialize()


def to_url(value: str | None, base_url: str) -> str | None:
    """Falsy -> None; else WHATWG-resolve (unfurl-html/src/index.ts:283-285).

    The reference lets URL parse errors propagate and fail the scrape;
    real fixture data never triggers that, so here invalid URLs degrade
    to None (documented divergence, safer at 10^12-row scale).
    """
    if not value:
        return None
    try:
        return resolve_url(value, base_url)
    except (UrlError, ValueError):
        return None
