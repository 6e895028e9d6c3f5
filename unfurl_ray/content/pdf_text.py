"""PDF main-text extraction (north_rule "PDF/layout parse" axis).

From-scratch, stdlib-only reader of PDF content streams:

- locates ``stream ... endstream`` objects; inflates ``/FlateDecode``
  streams with zlib (uncompressed streams pass through);
- tokenizes text-showing operators inside ``BT ... ET`` text objects:
  ``(literal) Tj``, ``' ``, ``" ``, and ``[array] TJ`` (kerning numbers
  skipped), honoring PDF literal-string escapes (\\n, \\(, octal, line
  continuations) and hex strings ``<...>``;
- emits one text block per BT/ET group with the byte span of the group
  in the raw payload (lineage back into the source column), mirroring
  the HTML boilerplate extractor's (text, start, end) contract.

Not implemented (documented): font /ToUnicode CMap remapping (text in
symbolic fonts extracts as raw codes) and positional layout
reconstruction — blocks follow stream order, which matches reading
order for linearly-authored PDFs.  The reference delegates PDF work to
an exiftool subprocess (unfurl-exiftool/src/index.ts:6-93, metadata
only); text extraction is an engine extension.
"""

from __future__ import annotations

import re
import zlib

_STREAM = re.compile(rb"stream\r?\n")
_FLATE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_BT_ET = re.compile(rb"BT(.*?)ET", re.S)
_WS = re.compile(r"\s+")

_OCTAL = re.compile(rb"\\([0-7]{1,3})")
_STRING_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape_literal(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i: i + 1]
        if c == b"\\" and i + 1 < n:
            nxt = raw[i + 1: i + 2]
            if nxt in _STRING_ESCAPES:
                out += _STRING_ESCAPES[nxt]
                i += 2
                continue
            m = _OCTAL.match(raw, i)
            if m:
                out.append(int(m.group(1), 8) & 0xFF)
                i = m.end()
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and raw[i: i + 1] == b"\n":
                    i += 1
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _scan_string(body: bytes, i: int) -> tuple[bytes | None, int]:
    """Parse one string token at ``i`` (literal or hex); (None, i+1) if
    not a string start."""
    n = len(body)
    c = body[i]
    if c == 0x28:  # (
        depth = 1
        j = i + 1
        start = j
        while j < n and depth:
            cj = body[j]
            if cj == 0x5C:  # backslash
                j += 2
                continue
            if cj == 0x28:
                depth += 1
            elif cj == 0x29:
                depth -= 1
            j += 1
        return _unescape_literal(body[start: j - 1]), j
    if c == 0x3C and body[i + 1: i + 2] != b"<":  # < but not <<
        j = body.find(b">", i + 1)
        if j < 0:
            return None, n
        hx = re.sub(rb"\s", b"", body[i + 1: j])
        if len(hx) % 2:
            hx += b"0"
        try:
            return bytes.fromhex(hx.decode("ascii")), j + 1
        except ValueError:
            return None, j + 1
    return None, i + 1


def _iter_strings(body: bytes):
    """Yield the bytes of each *show operation*, in stream order.

    ``(..) Tj`` / ``'`` / ``"`` each yield one string; a ``[..] TJ``
    kerning array yields its string pieces CONCATENATED (the numbers
    between them are glyph offsets inside one logical run).  Separate
    show operations are later joined with spaces — the standard
    text-extractor reading of one show per line/word run.
    """
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == 0x5B:  # [ ... ] TJ array: glue the pieces
            j = i + 1
            pieces = []
            while j < n and body[j] != 0x5D:
                s, j2 = _scan_string(body, j)
                if s is not None:
                    pieces.append(s)
                j = j2 if j2 > j else j + 1
            if pieces:
                yield b"".join(pieces)
            i = j + 1
        else:
            s, j = _scan_string(body, i)
            if s is not None:
                yield s
            i = j if j > i else i + 1


def _decode_stream(raw: bytes, header: bytes) -> bytes | None:
    if _FLATE.search(header):
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    return raw


def extract_pdf_blocks(data: bytes) -> list[dict]:
    """All text blocks: (text, start, end) — spans are byte offsets of
    the enclosing BT..ET group in the raw payload (compressed streams
    get the span of the whole stream object)."""
    blocks: list[dict] = []
    if not data.startswith(b"%PDF"):
        return blocks
    pos = 0
    while True:
        m = _STREAM.search(data, pos)
        if not m:
            break
        # dict header: walk back to the opening << of this object
        header = data[max(0, m.start() - 512): m.start()]
        end = data.find(b"endstream", m.end())
        if end < 0:
            break
        raw = data[m.end(): end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith(b"\n") or raw.endswith(b"\r"):
            raw = raw[:-1]
        decoded = _decode_stream(raw, header)
        pos = end + 9
        if decoded is None:
            continue
        inflated = decoded is not raw
        for bt in _BT_ET.finditer(decoded):
            parts = [
                s.decode("latin-1") for s in _iter_strings(bt.group(1))
            ]
            text = _WS.sub(" ", " ".join(parts)).strip()
            if not text:
                continue
            if inflated:
                start, endoff = m.end(), end  # whole stream object
            else:
                start = m.end() + bt.start()
                endoff = m.end() + bt.end()
            blocks.append({"text": text, "start": start, "end": endoff})
    return blocks


def extract_pdf_text(data: bytes) -> tuple[str, list[dict]]:
    """Main text + spans for a PDF payload ("" for non-PDF bytes)."""
    blocks = extract_pdf_blocks(data)
    main_text = "\n".join(b["text"] for b in blocks)
    spans = [
        {"start": b["start"], "end": b["end"], "kind": "pdf_text"}
        for b in blocks
    ]
    return main_text, spans
