"""JavaScript value-coercion kernels.

The reference's extraction semantics lean on JS coercion quirks
(``Number("")`` is 0, ISO datetimes without a timezone are forced UTC,
etc.).  These helpers reproduce the *observable* behavior of the tiny
pure functions in the reference (cited per function), so extracted
values hash-match the reference's snapshot fixtures.

All functions use ``None`` where the reference uses ``undefined``.
"""

from __future__ import annotations

import math
import re
from datetime import datetime, timedelta, timezone
from typing import Any

NAN = float("nan")


def to_array(value: Any) -> list:
    """Scalar -> [x]; None/falsy -> []; list stays a list.

    Mirrors unfurl-html/src/index.ts:230-233 (``toArray``): JS truthiness
    gates the scalar wrap, so ``""`` and ``0`` also become ``[]``.
    """
    if isinstance(value, list):
        return value
    return [value] if value else []


def to_value(value: Any) -> Any:
    """List -> first element (or None if empty); scalar passes through.

    Mirrors unfurl-html/src/index.ts:238-240 (``toValue``).
    """
    if isinstance(value, list):
        return value[0] if value else None
    return value


def to_string(value: Any) -> str | None:
    """Return value only if it is a string (unfurl-html/src/index.ts:245-247)."""
    return value if isinstance(value, str) else None


_JS_HEX = re.compile(r"^[+-]?0[xX][0-9a-fA-F]+$")
_JS_OCT = re.compile(r"^0[oO][0-7]+$")
_JS_BIN = re.compile(r"^0[bB][01]+$")
_JS_DEC = re.compile(
    r"^[+-]?(?:\d+\.?\d*|\.\d+)(?:[eE][+-]?\d+)?$"
)
_JS_INF = re.compile(r"^[+-]?Infinity$")


def js_number(value: str) -> float:
    """Reproduce JS ``Number(string)`` coercion.

    Whitespace-trimmed; empty string -> 0; hex/oct/bin literals; decimal
    with optional exponent; ``Infinity``; anything else -> NaN.
    """
    s = value.strip(" \t\n\r\f\v   ﻿")
    if s == "":
        return 0.0
    if _JS_DEC.match(s):
        return float(s)
    if _JS_HEX.match(s):
        neg = s.startswith("-")
        if s[0] in "+-":
            s = s[1:]
        v = float(int(s, 16))
        return -v if neg else v
    if _JS_OCT.match(s):
        return float(int(s, 8))
    if _JS_BIN.match(s):
        return float(int(s, 2))
    if _JS_INF.match(s):
        return -math.inf if s.startswith("-") else math.inf
    return NAN


def parse_number(value: str) -> float | int | None:
    """``Number(value)``; non-finite -> None (unfurl-html/src/index.ts:252-255).

    Integral results are returned as int so canonical JSON prints ``300``
    not ``300.0`` (JS has a single number type; jest prints integral
    floats without a decimal point).
    """
    num = js_number(value)
    if not math.isfinite(num):
        return None
    return _intify(num)


def _intify(num: float) -> float | int:
    if isinstance(num, float) and num.is_integer() and abs(num) < 2**53:
        return int(num)
    return num


def to_number(value: Any) -> float | int | None:
    """number passes through; string -> parse_number; else None.

    Mirrors unfurl-html/src/index.ts:260-263 (``toNumber``).
    """
    if isinstance(value, bool):
        return None
    if isinstance(value, (int, float)):
        return _intify(value)
    if isinstance(value, str):
        return parse_number(value)
    return None


_ISO_NO_TZ = re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d*)?$")

# new Date() acceptance grammar (subset exercised by real-world metadata):
# ISO 8601 with offsets, date-only forms, and a few RFC-2822-ish shapes.
_ISO_FULL = re.compile(
    r"^(\d{4})-(\d{2})(?:-(\d{2}))?"
    r"(?:[T ](\d{2}):(\d{2})(?::(\d{2})(?:\.(\d+))?)?"
    r"\s*(Z|z|[+-]\d{2}:?\d{2})?)?$"
)
_US_DATE = re.compile(r"^(\d{1,2})/(\d{1,2})/(\d{4})$")

_MONTHS = {
    m.lower(): i + 1
    for i, m in enumerate(
        ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
         "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    )
}
_TEXT_DATE = re.compile(
    r"^(?:\w{3},?\s+)?"                      # optional weekday
    r"(?:(\d{1,2})\s+(\w{3,9})|(\w{3,9})\.?\s+(\d{1,2}))(?:,)?\s+(\d{4})"
    r"(?:\s+(\d{2}):(\d{2})(?::(\d{2}))?)?"
    r"(?:\s*(GMT|UTC|Z|[+-]\d{4}))?$"
)


def _tz(offset: str | None) -> timezone:
    if not offset or offset in ("Z", "z", "GMT", "UTC"):
        return timezone.utc
    sign = 1 if offset[0] == "+" else -1
    digits = offset[1:].replace(":", "")
    hours, minutes = int(digits[:2]), int(digits[2:4])
    return timezone(sign * timedelta(hours=hours, minutes=minutes))


def js_date(value: str) -> datetime | None:
    """Parse a string the way JS ``new Date(value)`` accepts it (subset).

    Returns a timezone-aware UTC datetime or None for invalid dates.
    Date-only ISO forms are UTC midnight (ES2020 spec); datetime forms
    without offset are treated as UTC here because the one caller
    (``to_date``) pre-appends ``Z`` to no-TZ ISO datetimes anyway
    (unfurl-html/src/index.ts:271-274).
    """
    s = value.strip()
    if not s:
        return None
    m = _ISO_FULL.match(s)
    if m:
        y, mo, d, hh, mm, ss, frac, off = m.groups()
        try:
            micro = int(float("0." + frac) * 1_000_000) if frac else 0
            dt = datetime(
                int(y), int(mo), int(d or 1),
                int(hh or 0), int(mm or 0), int(ss or 0), micro,
                tzinfo=_tz(off),
            )
            return dt.astimezone(timezone.utc)
        except ValueError:
            return None
    m = _US_DATE.match(s)
    if m:
        mo, d, y = m.groups()
        try:
            return datetime(int(y), int(mo), int(d), tzinfo=timezone.utc)
        except ValueError:
            return None
    m = _TEXT_DATE.match(s)
    if m:
        d1, mon1, mon2, d2, y, hh, mm, ss, off = m.groups()
        mon = (mon1 or mon2 or "")[:3].lower()
        day = d1 or d2
        if mon in _MONTHS:
            try:
                dt = datetime(
                    int(y), _MONTHS[mon], int(day),
                    int(hh or 0), int(mm or 0), int(ss or 0),
                    tzinfo=_tz(off),
                )
                return dt.astimezone(timezone.utc)
            except ValueError:
                return None
    return None


def to_date(value: Any) -> datetime | None:
    """string -> datetime; no-TZ ISO datetimes forced UTC; invalid -> None.

    Mirrors unfurl-html/src/index.ts:268-278 (``toDate``).
    """
    if not isinstance(value, str):
        return None
    if _ISO_NO_TZ.match(value):
        return js_date(value + "Z")
    return js_date(value)


def copy_props(target: dict, data: dict) -> dict:
    """Merge non-None values of data onto target (unfurl-html/src/index.ts:290-297)."""
    for key, val in data.items():
        if val is not None:
            target[key] = val
    return target


def first(iterable) -> Any:
    """First truthy element (unfurl-html/src/index.ts:353-355 ``first``)."""
    for item in iterable:
        if item:
            return item
    return None


def first_of(values, map_fn) -> Any:
    """First truthy mapped value (unfurl-html/src/index.ts:360-366 ``firstOf``)."""
    if not values:
        return None
    for item in values:
        mapped = map_fn(item)
        if mapped:
            return mapped
    return None


def to_twitter_handle(value: str | None) -> str | None:
    """Strip one leading ``@`` (unfurl-html/src/index.ts:1017-1020)."""
    if value is None:
        return None
    return value[1:] if value.startswith("@") else value
