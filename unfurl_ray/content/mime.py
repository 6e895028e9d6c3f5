"""MIME extraction from content-type headers.

Mirrors unfurl/src/index.ts:193-207 (``extractMime`` / ``contentType``).
"""

from __future__ import annotations

from typing import Any


def extract_mime(content_type_value: str) -> str:
    """Strip ``;params``, trim, lowercase (unfurl/src/index.ts:193-195)."""
    return content_type_value.split(";", 1)[0].strip().lower()


def content_type(headers: dict[str, Any] | None) -> str:
    """Pull the mime from a header multimap (unfurl/src/index.ts:200-207).

    Header values may be a string or a list of strings (first wins).
    """
    if not headers:
        return ""
    header = headers.get("content-type")
    if isinstance(header, (list, tuple)):
        header = header[0] if header else ""
    return extract_mime(header or "")
