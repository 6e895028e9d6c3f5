"""Canonical JSON serialization of Unfurl records.

One stable string form per extracted record so that golden-file
comparison (vs the reference's jest snapshots) and cross-run hashing are
byte-deterministic:

- keys sorted; ``None`` (JS ``undefined``) values dropped recursively;
- ``datetime`` -> ISO-8601 milliseconds UTC (``2016-06-15T07:21:02.000Z``,
  matching JS ``Date`` serialization in the snapshots);
- ``NaN`` -> the string literal ``NaN`` (jest prints bare NaN);
- integral numbers print without a decimal point (JS number semantics);
- empty lists are kept (the reference emits ``tags: []`` etc.).
"""

from __future__ import annotations

import math
from datetime import datetime, timezone
from typing import Any


def scrub(value: Any) -> Any:
    """Drop None entries recursively; keep empty lists; pass scalars."""
    if isinstance(value, dict):
        return {k: scrub(v) for k, v in value.items() if v is not None}
    if isinstance(value, list):
        return [scrub(v) for v in value if v is not None]
    return value


def _serialize(value: Any, out: list[str]) -> None:
    if value is None:
        out.append("null")
    elif value is True:
        out.append("true")
    elif value is False:
        out.append("false")
    elif isinstance(value, str):
        out.append(_json_string(value))
    elif isinstance(value, int):
        out.append(str(value))
    elif isinstance(value, float):
        if math.isnan(value):
            out.append('"NaN"')
        elif math.isinf(value):
            out.append('"Infinity"' if value > 0 else '"-Infinity"')
        elif value.is_integer() and abs(value) < 2**53:
            out.append(str(int(value)))
        else:
            out.append(repr(value))
    elif isinstance(value, datetime):
        out.append('"' + format_js_date(value) + '"')
    elif isinstance(value, dict):
        out.append("{")
        items = sorted(value.items())
        for i, (k, v) in enumerate(items):
            if i:
                out.append(",")
            out.append(_json_string(str(k)))
            out.append(":")
            _serialize(v, out)
        out.append("}")
    elif isinstance(value, (list, tuple)):
        out.append("[")
        for i, v in enumerate(value):
            if i:
                out.append(",")
            _serialize(v, out)
        out.append("]")
    else:
        raise TypeError(f"unserializable type {type(value)!r}")


# C-accelerated escaper: short escapes for \" \\ \n \r \t \b \f,
# \uXXXX for other control chars, non-ASCII passthrough — identical to
# the hand-rolled per-char loop it replaced (hot path: ~16% of extract)
from json.encoder import encode_basestring as _json_string


def format_js_date(dt: datetime) -> str:
    """JS ``Date.toISOString()``: millisecond precision, ``Z`` suffix."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    dt = dt.astimezone(timezone.utc)
    ms = dt.microsecond // 1000
    return dt.strftime("%Y-%m-%dT%H:%M:%S") + f".{ms:03d}Z"


def canonical_json(record: Any) -> str:
    """Serialize a scrubbed record to its canonical JSON string."""
    out: list[str] = []
    _serialize(scrub(record), out)
    return "".join(out)
