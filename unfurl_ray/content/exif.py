"""In-process image metadata (EXIF path).

Mirrors the behavior of unfurl-exif/src/index.ts:5-53: only
``image/*`` records are handled, at most a 131072-byte prefix is
inspected, parse failures degrade to a bare ``{type: "image", url}``.

The sandbox has no exifreader/Pillow, so tag decoding is a pure-Python
parser for the formats the corpus exercises (JPEG APP1/EXIF dimensions
and camera tags, PNG IHDR, WebP VP8X/VP8/VP8L headers, GIF).  Anything
it cannot decode yields the degraded record — same contract as the
reference's catch-all (unfurl-exif/src/index.ts:44-46).
"""

from __future__ import annotations

import struct
from datetime import datetime, timezone

MAX_PREFIX = 131072  # unfurl-exif/src/index.ts:21

_EXIF_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0131: "software",
    0x0112: "orientation",
    0xA002: "pixel_x",
    0xA003: "pixel_y",
    0x9003: "date_original",
    0x0132: "date_modified",
    0xA433: "lensMake",
    0xA434: "lensModel",
}

_ORIENTATIONS = {
    1: "Horizontal (normal)", 2: "Mirror horizontal", 3: "Rotate 180",
    4: "Mirror vertical", 5: "Mirror horizontal and rotate 270 CW",
    6: "Rotate 90 CW", 7: "Mirror horizontal and rotate 90 CW",
    8: "Rotate 270 CW",
}


def _parse_exif_tiff(data: bytes) -> dict:
    """Parse a TIFF/EXIF blob (the part after the JPEG APP1 Exif header)."""
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

    def read_ifd(offset, out):
        if offset + 2 > len(data):
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
                read_ifd(u32(entry + 8), out)
                continue
            if tag not in _EXIF_TAGS:
                continue
            name = _EXIF_TAGS[tag]
            if typ == 2:  # ASCII
                voff = u32(entry + 8) if n > 4 else entry + 8
                raw = data[voff: voff + n].split(b"\x00", 1)[0]
                out[name] = raw.decode("ascii", errors="replace").strip()
            elif typ == 3:  # SHORT
                out[name] = u16(entry + 8)
            elif typ == 4:  # LONG
                out[name] = u32(entry + 8)

    try:
        read_ifd(u32(4), out)
    except (struct.error, IndexError):
        pass
    return out


def _exif_date(value: str) -> datetime | None:
    """EXIF ``YYYY:MM:DD HH:MM:SS`` -> UTC datetime (exif-date parity)."""
    try:
        return datetime.strptime(value, "%Y:%m:%d %H:%M:%S").replace(
            tzinfo=timezone.utc
        )
    except (ValueError, TypeError):
        return None


def parse_image_meta(data: bytes) -> dict | None:
    """Sniff + parse dimensions and EXIF camera tags; None if unknown."""
    if data[:3] == b"\xff\xd8\xff":
        return _parse_jpeg(data)
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        if len(data) >= 24 and data[12:16] == b"IHDR":
            w, h = struct.unpack(">II", data[16:24])
            return {"width": w, "height": h, "format": "image/png"}
        return {"format": "image/png"}
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return _parse_webp(data)
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return {"width": w, "height": h, "format": "image/gif"}
    return None


def _parse_jpeg(data: bytes) -> dict:
    out: dict = {"format": "image/jpeg"}
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
        if i + 4 > n:
            break
        seglen = struct.unpack(">H", data[i + 2: i + 4])[0]
        if marker == 0xE1 and data[i + 4: i + 10] == b"Exif\x00\x00":
            out.update(_parse_exif_tiff(data[i + 10: i + 2 + seglen]))
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            if i + 9 <= n:
                h, w = struct.unpack(">HH", data[i + 5: i + 9])
                out.setdefault("height", h)
                out.setdefault("width", w)
            break
        i += 2 + seglen
    return out


def _parse_webp(data: bytes) -> dict:
    out: dict = {"format": "image/webp"}
    chunk = data[12:16]
    if chunk == b"VP8X" and len(data) >= 30:
        w = int.from_bytes(data[24:27], "little") + 1
        h = int.from_bytes(data[27:30], "little") + 1
        out.update(width=w, height=h)
    elif chunk == b"VP8 " and len(data) >= 30:
        w, h = struct.unpack("<HH", data[26:30])
        out.update(width=w & 0x3FFF, height=h & 0x3FFF)
    elif chunk == b"VP8L" and len(data) >= 25:
        bits = struct.unpack("<I", data[21:25])[0]
        out.update(width=(bits & 0x3FFF) + 1,
                   height=((bits >> 14) & 0x3FFF) + 1)
    return out


def scrape_exif(url: str, mime: str, body: bytes) -> dict | None:
    """The EXIF plugin: image/* -> Image record; else defer (None)."""
    if not mime.startswith("image/"):
        return None
    meta = parse_image_meta(body[:MAX_PREFIX])
    if not meta:
        return {"type": "image", "url": url}
    camera = {}
    for key in ("make", "model", "lensMake", "lensModel", "software"):
        if meta.get(key):
            camera[key] = meta[key]
    orientation = meta.get("orientation")
    if isinstance(orientation, int) and orientation in _ORIENTATIONS:
        camera["orientation"] = _ORIENTATIONS[orientation]
    width = meta.get("pixel_x") or meta.get("width")
    height = meta.get("pixel_y") or meta.get("height")
    if width and height:
        camera_mp = round(width * height / 1_000_000, 1)
        if camera:
            camera["megapixels"] = camera_mp
    record = {
        "type": "image",
        "url": url,
        "encodingFormat": meta.get("format", mime),
        "width": width,
        "height": height,
        "camera": camera or None,
        "dateCreated": _exif_date(meta.get("date_original", "")),
        "dateModified": _exif_date(meta.get("date_modified", "")),
    }
    return record
