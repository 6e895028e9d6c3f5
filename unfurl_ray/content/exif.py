"""In-process image metadata (the reference's unfurl-exif plugin).

Mirrors unfurl-exif/src/index.ts:5-53: only ``image/*`` records are
handled; at most a 131072-byte prefix is inspected (:21); the record is

- ``encodingFormat``: XMP ``format`` value ?? content-type header (:28)
- ``width/height``: the *file* dimensions (JPEG SOF / PNG IHDR), not the
  EXIF Pixel[XY]Dimension tags (:33-34; flickr fixture evidence)
- ``camera``: always-present dict of make/model/lensMake/lensModel/
  software/orientation, with exifreader's TIFF-style orientation
  descriptions ("top-left", ...) (:35-42)
- ``dateCreated/dateModified``: XMP dates only, no-TZ forced UTC (:29-32,49-53)
- any parse failure (including formats exifreader@3 can't read: WebP,
  GIF, or a JPEG with no EXIF/XMP at all) degrades to ``{type: "image",
  url}`` (:44-46)

Pure-Python binary parsing (no exifreader/Pillow in the sandbox).
"""

from __future__ import annotations

import re
import struct
from datetime import datetime

MAX_PREFIX = 131072  # unfurl-exif/src/index.ts:21

EXIF_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0131: "software",
    0x0112: "orientation",
    0x0132: "modify_date",
    0x9003: "date_original",
    0x9291: "subsec_original",
    0xA433: "lensMake",
    0xA434: "lensModel",
}

# exifreader's TIFF orientation descriptions (exif suite).
ORIENT_TIFF = {
    1: "top-left", 2: "top-right", 3: "bottom-right", 4: "bottom-left",
    5: "left-top", 6: "right-top", 7: "right-bottom", 8: "left-bottom",
}

# exiftool's orientation descriptions (exiftool suite).
ORIENT_EXIFTOOL = {
    1: "Horizontal (normal)", 2: "Mirror horizontal", 3: "Rotate 180",
    4: "Mirror vertical", 5: "Mirror horizontal and rotate 270 CW",
    6: "Rotate 90 CW", 7: "Mirror horizontal and rotate 90 CW",
    8: "Rotate 270 CW",
}


def parse_exif_tiff(data: bytes) -> dict:
    """Parse a TIFF/EXIF blob (after the JPEG APP1 ``Exif\\0\\0`` header)."""
    out: dict = {}
    if len(data) < 8:
        return out
    endian = data[:2]
    if endian == b"II":
        fmt = "<"
    elif endian == b"MM":
        fmt = ">"
    else:
        return out

    def u16(off):
        return struct.unpack_from(fmt + "H", data, off)[0]

    def u32(off):
        return struct.unpack_from(fmt + "I", data, off)[0]

    def read_ifd(offset, depth=0):
        if offset + 2 > len(data) or depth > 4:
            return
        count = u16(offset)
        for i in range(count):
            entry = offset + 2 + i * 12
            if entry + 12 > len(data):
                return
            tag = u16(entry)
            typ = u16(entry + 2)
            n = u32(entry + 4)
            if tag == 0x8769:  # EXIF sub-IFD pointer
                read_ifd(u32(entry + 8), depth + 1)
                continue
            if tag not in EXIF_TAGS:
                continue
            name = EXIF_TAGS[tag]
            if typ == 2:  # ASCII
                voff = u32(entry + 8) if n > 4 else entry + 8
                raw = data[voff: voff + n].split(b"\x00", 1)[0]
                out[name] = raw.decode("ascii", errors="replace").strip()
            elif typ == 3:  # SHORT
                out[name] = u16(entry + 8)
            elif typ == 4:  # LONG
                out[name] = u32(entry + 8)

    try:
        read_ifd(u32(4))
    except (struct.error, IndexError):
        pass
    return out


_XMP_TAG = re.compile(
    rb'(?:xmp:|)(ModifyDate|DateCreated|CreateDate|format)'
    rb'(?:>([^<]+)<|="([^"]+)")'
)


def parse_xmp(data: bytes) -> dict:
    """Tiny XMP scan for the four values unfurl-exif consumes."""
    out: dict = {}
    for m in _XMP_TAG.finditer(data):
        key = m.group(1).decode()
        val = (m.group(2) or m.group(3) or b"").decode("utf-8", "replace")
        out.setdefault(key, val)
    return out


def sniff_image(data: bytes) -> dict | None:
    """File-format sniff + dimensions + EXIF/XMP tag scan."""
    if data[:3] == b"\xff\xd8\xff":
        return _parse_jpeg(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        out = {"format": "image/png", "kind": "png", "has_meta": True}
        if len(data) >= 24 and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            out.update(width=w, height=h)
        return out
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _parse_webp(data)
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return {"width": w, "height": h, "format": "image/gif",
                "kind": "gif", "has_meta": False}
    return None


def _parse_jpeg(data: bytes) -> dict:
    out: dict = {"format": "image/jpeg", "kind": "jpeg", "has_meta": False}
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9 or marker == 0xDA:
            break
        if i + 4 > n:
            break
        seglen = struct.unpack(">H", data[i + 2: i + 4])[0]
        if seglen < 2:
            break
        if marker == 0xE1:
            if data[i + 4: i + 10] == b"Exif\x00\x00":
                out["exif"] = parse_exif_tiff(data[i + 10: i + 2 + seglen])
                out["has_meta"] = True
            elif data[i + 4: i + 8] == b"http":
                out["xmp"] = parse_xmp(data[i + 4: i + 2 + seglen])
                out["has_meta"] = True
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            if i + 9 <= n:
                h, w = struct.unpack(">HH", data[i + 5: i + 9])
                out.setdefault("height", h)
                out.setdefault("width", w)
        i += 2 + seglen
    return out


def _parse_webp(data: bytes) -> dict:
    out: dict = {"format": "image/webp", "kind": "webp", "has_meta": False}
    chunk = data[12:16]
    if chunk == b"VP8X" and len(data) >= 30:
        out.update(width=int.from_bytes(data[24:27], "little") + 1,
                   height=int.from_bytes(data[27:30], "little") + 1)
    elif chunk == b"VP8 " and len(data) >= 30:
        w, h = struct.unpack("<HH", data[26:30])
        out.update(width=w & 0x3FFF, height=h & 0x3FFF)
    elif chunk == b"VP8L" and len(data) >= 25:
        bits = struct.unpack("<I", data[21:25])[0]
        out.update(width=(bits & 0x3FFF) + 1,
                   height=((bits >> 14) & 0x3FFF) + 1)
    return out


def xmp_date(value: str | None) -> datetime | None:
    """unfurl-exif/src/index.ts:49-53: append Z when no TZ suffix."""
    if not value:
        return None
    from unfurl_ray.core.values import js_date
    if re.search(r"(?:Z|[+-]\d\d:\d\d)$", value):
        return js_date(value)
    return js_date(value + "Z")


def scrape_exif(url: str, mime: str, body: bytes) -> dict | None:
    """The exifreader-parity plugin: image/* -> Image; else defer."""
    if not mime.startswith("image/"):
        return None
    meta = sniff_image(body[:MAX_PREFIX])
    if not meta or not meta.get("has_meta") or meta.get("kind") not in (
        "jpeg", "png"
    ):
        return {"type": "image", "url": url}
    exif = meta.get("exif") or {}
    xmp = meta.get("xmp") or {}
    camera = {}
    for key in ("make", "model", "lensMake", "lensModel", "software"):
        if exif.get(key):
            camera[key] = exif[key]
    orientation = exif.get("orientation")
    if isinstance(orientation, int) and orientation in ORIENT_TIFF:
        camera["orientation"] = ORIENT_TIFF[orientation]
    return {
        "type": "image",
        "url": url,
        "encodingFormat": xmp.get("format") or mime,
        "dateModified": xmp_date(xmp.get("ModifyDate")),
        "dateCreated": xmp_date(xmp.get("DateCreated"))
        or xmp_date(xmp.get("CreateDate")),
        "width": meta.get("width"),
        "height": meta.get("height"),
        "camera": camera,
    }
