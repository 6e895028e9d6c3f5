"""JS-semantics kernel unit tests (SURVEY.md §2.3 F1-F13)."""

import math
from datetime import datetime, timezone

from unfurl_ray.core.values import (
    js_date,
    js_number,
    parse_number,
    to_array,
    to_date,
    to_number,
    to_twitter_handle,
    to_value,
)


def test_js_number_quirks():
    assert js_number("") == 0  # Number("") -> 0
    assert js_number("  42  ") == 42
    assert js_number("0x1A") == 26
    assert js_number("1e3") == 1000
    assert js_number(".5") == 0.5
    assert js_number("Infinity") == math.inf
    assert math.isnan(js_number("12px"))
    assert math.isnan(js_number("72×72"))  # unicode multiply sign


def test_parse_number_non_finite():
    assert parse_number("Infinity") is None
    assert parse_number("nope") is None
    assert parse_number("300") == 300
    assert parse_number("300.5") == 300.5


def test_to_number_types():
    assert to_number(5) == 5
    assert to_number("5") == 5
    assert to_number(None) is None
    assert to_number(True) is None  # booleans are not numbers here


def test_to_date_forces_utc_on_no_tz():
    # unfurl-html/src/index.ts:271-274
    d = to_date("2016-06-15T07:21:02")
    assert d == datetime(2016, 6, 15, 7, 21, 2, tzinfo=timezone.utc)
    d = to_date("2016-06-15T07:21:02.500")
    assert d.microsecond == 500000


def test_to_date_with_offset():
    d = to_date("2016-08-16T17:00:00+02:00")
    assert d == datetime(2016, 8, 16, 15, 0, tzinfo=timezone.utc)


def test_to_date_date_only_is_utc_midnight():
    assert js_date("2016-08-16") == datetime(2016, 8, 16, tzinfo=timezone.utc)


def test_to_date_invalid():
    assert to_date("not a date") is None
    assert to_date(123) is None


def test_to_array_and_value():
    assert to_array(None) == []
    assert to_array("") == []  # JS falsy
    assert to_array("x") == ["x"]
    assert to_array(["a", "b"]) == ["a", "b"]
    assert to_value(["a", "b"]) == "a"
    assert to_value("a") == "a"


def test_twitter_handle():
    assert to_twitter_handle("@foo") == "foo"
    assert to_twitter_handle("foo") == "foo"
    assert to_twitter_handle(None) is None
