"""Subprocess-free file-metadata path (the reference's exiftool plugin).

Mirrors the mime routing and record shapes of
unfurl-exiftool/src/index.ts:6-93:

- ``application/pdf`` -> Document: headline/author/creator/producer +
  CreationDate/ModDate from the PDF Info dictionary (indirect refs and
  UTF-16 hex strings resolved), with the reference stack's *reversed*
  timezone-offset quirk preserved (ucdavis fixture: 14:05:18-07:00 is
  recorded as 07:05:18Z, i.e. offset added instead of subtracted).
- ``image/*`` -> Image: file dimensions, camera dict incl. exiftool's
  ``Megapixels`` composite (printed %.1f when >=1 else %.3f, then
  JS-Number'd) and "Horizontal (normal)"-style orientation names.
- ``video/*`` -> ``{type: "video", encodingFormat}``.
- anything else -> defer (base emits a Link).

The reference shells out to a persistent exiftool subprocess; the
sandbox has none, so parsing is pure Python.  In the Ray pipeline this
stage runs on an actor pool so a real-exiftool backend could hold its
subprocess open per actor (SURVEY.md §2.4 T2).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from unfurl_ray.content.exif import (
    ORIENT_EXIFTOOL,
    parse_exif_tiff,
    sniff_image,
)

_INFO_KEYS = {
    "Title": "headline",
    "Author": "author",
    "Creator": "creator",
    "Producer": "producer",
    "CreationDate": "dateCreated",
    "ModDate": "dateModified",
}

_PDF_DATE = re.compile(
    r"D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
    r"(?:([+\-Zz])(\d{2})?'?(\d{2})?)?"
)


def _pdf_date(raw: str) -> datetime | None:
    m = _PDF_DATE.match(raw)
    if not m:
        return None
    y, mo, d, hh, mm, ss, sign, oh, om = m.groups()
    try:
        dt = datetime(
            int(y), int(mo or 1), int(d or 1),
            int(hh or 0), int(mm or 0), int(ss or 0), tzinfo=timezone.utc,
        )
        if sign in ("+", "-") and oh:
            delta = timedelta(hours=int(oh), minutes=int(om or 0))
            # Reference quirk: the offset is ADDED to the local time
            # instead of subtracted (exif-date parity, ucdavis fixture).
            dt = dt + delta if sign == "+" else dt - delta
        return dt
    except ValueError:
        return None


def _pdf_literal_string(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C and i + 1 < len(raw):  # backslash escape
            nxt = raw[i + 1]
            mapping = {0x6E: "\n", 0x72: "\r", 0x74: "\t", 0x62: "\b",
                       0x66: "\f", 0x28: "(", 0x29: ")", 0x5C: "\\"}
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal escape
                digits = raw[i + 1: i + 4]
                j = 0
                while j < len(digits) and 0x30 <= digits[j] <= 0x37:
                    j += 1
                out.append(chr(int(digits[:j], 8)))
                i += 1 + j
                continue
        out.append(chr(c))
        i += 1
    text = "".join(out)
    # A UTF-16BE BOM may arrive via octal escapes (\376\377...).
    if text[:2] == "\xfe\xff":
        return text[2:].encode("latin-1", "replace").decode(
            "utf-16-be", errors="replace"
        )
    return text


def _pdf_hex_string(raw: bytes) -> str:
    hexdigits = re.sub(rb"[^0-9A-Fa-f]", b"", raw)
    if len(hexdigits) % 2:
        hexdigits += b"0"
    data = bytes.fromhex(hexdigits.decode())
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace")
    return data.decode("latin-1")


_STRING_VALUE = re.compile(
    rb"\s*(?:\(((?:\\.|[^\\)])*)\)|<([^>]*)>)", re.S
)
_INDIRECT = re.compile(rb"\s*(\d+)\s+(\d+)\s+R\b")


def _resolve_string(data: bytes, at: int, depth: int = 0) -> str | None:
    """Parse a PDF string value at offset, following indirect refs."""
    m = _STRING_VALUE.match(data, at)
    if m:
        if m.group(1) is not None:
            return _pdf_literal_string(m.group(1))
        return _pdf_hex_string(m.group(2))
    if depth < 2:
        m = _INDIRECT.match(data, at)
        if m:
            num, gen = m.group(1), m.group(2)
            om = re.search(
                rb"(?:^|[\r\n])" + num + rb"\s+" + gen + rb"\s+obj\b",
                data,
            )
            if om:
                return _resolve_string(data, om.end(), depth + 1)
    return None


def parse_pdf_info(data: bytes) -> dict:
    """Extract Title/Author/Creator/Producer/dates from raw PDF bytes."""
    out: dict = {}
    for key, field in _INFO_KEYS.items():
        kb = b"/" + key.encode()
        pos = 0
        while field not in out:
            at = data.find(kb, pos)
            if at < 0:
                break
            pos = at + len(kb)
            nxt = data[pos: pos + 1]
            if nxt.isalnum():  # e.g. /CreationDate vs /CreationDateFoo
                continue
            value = _resolve_string(data, pos)
            if value is None:
                continue
            if field.startswith("date"):
                parsed = _pdf_date(value)
                if parsed:
                    out[field] = parsed
            else:
                value = value.strip()
                if value:
                    out[field] = value
    return out


def _megapixels(width: int, height: int) -> float | int:
    """exiftool's Megapixels PrintConv: %.1f when >=1, else %.3f; then
    coerced through JS ``Number`` (6.0 -> 6)."""
    mp = width * height / 1e6
    printed = f"{mp:.1f}" if mp >= 1 else f"{mp:.3f}"
    num = float(printed)
    return int(num) if num.is_integer() else num


def _exiftool_date(value: str | None) -> datetime | None:
    """EXIF ``YYYY:MM:DD HH:MM:SS`` (naive -> UTC)."""
    if not value:
        return None
    try:
        return datetime.strptime(
            value[:19], "%Y:%m:%d %H:%M:%S"
        ).replace(tzinfo=timezone.utc)
    except ValueError:
        return None


def scrape_filemeta(url: str, mime: str, body: bytes) -> dict | None:
    """Route by mime like the reference's exiftool plugin; None = defer."""
    if mime == "application/pdf":
        info = parse_pdf_info(body)
        record: dict = {"type": "document", "url": url,
                        "encodingFormat": "application/pdf"}
        if "headline" in info:
            record["headline"] = info["headline"]
        for person_key in ("author", "creator", "producer"):
            if person_key in info:
                record[person_key] = {"name": info[person_key]}
        for date_key in ("dateCreated", "dateModified"):
            if date_key in info:
                record[date_key] = info[date_key]
        return record
    if mime.startswith("image/"):
        meta = sniff_image(body)
        if not meta:
            return {"type": "image", "url": url}
        exif = meta.get("exif") or {}
        width, height = meta.get("width"), meta.get("height")
        camera: dict = {}
        for key in ("make", "model", "lensMake", "lensModel", "software"):
            if exif.get(key):
                camera[key] = exif[key]
        if width and height:
            camera["megapixels"] = _megapixels(width, height)
        orientation = exif.get("orientation")
        if isinstance(orientation, int) and orientation in ORIENT_EXIFTOOL:
            camera["orientation"] = ORIENT_EXIFTOOL[orientation]
        subsec = exif.get("subsec_original")
        date_created = (
            _exiftool_date(exif.get("date_original")) if subsec else None
        )
        return {
            "type": "image",
            "url": url,
            "encodingFormat": meta.get("format", mime),
            "dateModified": _exiftool_date(exif.get("modify_date")),
            "dateCreated": date_created,
            "width": width,
            "height": height,
            "camera": camera,
        }
    if mime.startswith("video/"):
        return {"type": "video", "url": url, "encodingFormat": mime}
    return None
