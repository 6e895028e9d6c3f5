"""HTML entity decoding.

The reference decodes entities twice: once inside the streaming HTML
tokenizer (``decodeEntities: true``, unfurl-html/src/index.ts:223) and
once more for strings pulled from oEmbed / JSON-LD (``decodeHTML`` from
``entities@2.2.0``, unfurl-html/src/index.ts:346-348).  Python's
``html.unescape`` implements the same HTML5 named-character-reference
table (including legacy no-semicolon forms) and numeric references, so
it is behavior-compatible for the corpus.
"""

from __future__ import annotations

import html


def decode_entities(value: str) -> str:
    """Decode all HTML character references in ``value``."""
    if "&" not in value:
        return value
    return html.unescape(value)


def decode(value: str | None) -> str | None:
    """Truthy-gated decode (unfurl-html/src/index.ts:346-348 ``decode``)."""
    return decode_entities(value) if value else None
