"""Property-based tests (hypothesis) for the JS-semantics kernels.

The reference has no property tests (SURVEY.md §5); these guard OUR
reimplementations of `Number()`, `new Date()`, the WHATWG URL resolver
and canonical JSON against regressions — each property is an invariant
the snapshot corpus can't exercise exhaustively.
"""

from __future__ import annotations

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from unfurl_ray.core.canonical import canonical_json, scrub
from unfurl_ray.core.url import to_url
from unfurl_ray.core.values import js_number, to_date, to_number


@given(st.integers(min_value=-(2**53), max_value=2**53))
def test_js_number_integers_roundtrip(n):
    assert js_number(str(n)) == n


@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_js_number_repr_roundtrip(x):
    # JS Number(String(x)) is identity for finite doubles; repr() is
    # Python's shortest round-trip form which JS also accepts
    assert js_number(repr(x)) == x


@given(st.text(alphabet=" \t\n\r", max_size=5))
def test_js_number_whitespace_only_is_zero(ws):
    # JS quirk: Number("")/Number(" ") -> 0
    assert js_number(ws) == 0


@given(st.sampled_from(["abc", "1,2", "--1", "0x", "1e", ".", "+-1"]))
def test_js_number_garbage_is_nan(s):
    assert math.isnan(js_number(s))


@given(st.integers(0, 0xFFFFFF))
def test_js_number_hex(n):
    assert js_number(hex(n)) == n


@given(
    st.datetimes(min_value=__import__("datetime").datetime(1900, 1, 1),
                 max_value=__import__("datetime").datetime(2199, 12, 31)),
)
def test_to_date_no_tz_is_utc(dt):
    # SURVEY F5: ISO strings without timezone are forced UTC
    iso = dt.strftime("%Y-%m-%dT%H:%M:%S")
    parsed = to_date(iso)
    assert parsed is not None
    assert parsed.utcoffset().total_seconds() == 0
    assert parsed.replace(tzinfo=None) == dt.replace(microsecond=0)


_URL_SAFE = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7A
    ),
    min_size=1,
    max_size=12,
)


@given(_URL_SAFE, _URL_SAFE)
def test_url_resolution_idempotent(host, path):
    base = f"https://{host}.example/{path}"
    resolved = to_url(base, "https://other.example/")
    assert resolved is not None
    # resolving an already-resolved URL against any base is identity
    assert to_url(resolved, "https://third.example/x/y") == resolved


@given(_URL_SAFE)
def test_url_relative_resolves_under_base(seg):
    out = to_url(seg, "https://example.com/dir/page")
    assert out == f"https://example.com/dir/{seg}"


_JSONISH = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**53), max_value=2**53)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=4)
    | st.dictionaries(st.text(max_size=8), children, max_size=4),
    max_leaves=20,
)


@settings(max_examples=200)
@given(_JSONISH)
def test_canonical_json_is_valid_json_and_deterministic(value):
    s = canonical_json(value)
    assert s == canonical_json(value)
    parsed = json.loads(s)

    def norm(v):
        # canonical form integer-folds floats and drops None dict values
        if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
            return int(v)
        if isinstance(v, dict):
            return {k: norm(x) for k, x in sorted(v.items())
                    if x is not None}
        if isinstance(v, list):
            return [norm(x) for x in v if x is not None]
        return v

    assert parsed == norm(scrub(value))


@given(st.text(max_size=50))
def test_canonical_json_string_escaping_roundtrips(s):
    assert json.loads(canonical_json(s)) == s
