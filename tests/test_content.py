"""Binary content parsers: EXIF/PNG/WebP sniffing, PDF metadata."""

import struct
from datetime import datetime, timezone

from unfurl_ray.content.exif import sniff_image, scrape_exif
from unfurl_ray.content.filemeta import (
    _megapixels,
    _pdf_date,
    parse_pdf_info,
    scrape_filemeta,
)
from unfurl_ray.content.mime import content_type, extract_mime


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))


def test_extract_mime():
    assert extract_mime("text/HTML; charset=utf-8") == "text/html"
    assert content_type({"content-type": ["text/html", "x"]}) == "text/html"
    assert content_type({}) == ""
    assert content_type(None) == ""


def test_png_sniff():
    meta = sniff_image(_png(640, 480))
    assert meta["format"] == "image/png"
    assert (meta["width"], meta["height"]) == (640, 480)


def test_gif_and_webp_sniff():
    gif = b"GIF89a" + struct.pack("<HH", 10, 20) + b"\x00" * 10
    assert sniff_image(gif)["width"] == 10
    vp8x = (b"RIFF" + b"\x00" * 4 + b"WEBP" + b"VP8X" + b"\x00" * 8
            + (99).to_bytes(3, "little") + (49).to_bytes(3, "little"))
    meta = sniff_image(vp8x)
    assert (meta["width"], meta["height"]) == (100, 50)


def test_exif_degrades_on_webp():
    # exifreader@3 parity: webp -> bare {type, url}
    body = b"RIFF\x00\x00\x00\x00WEBPVP8 " + b"\x00" * 30
    assert scrape_exif("http://x/a.webp", "image/webp", body) == {
        "type": "image", "url": "http://x/a.webp"
    }


def test_exif_defers_non_image():
    assert scrape_exif("http://x/", "text/html", b"<html>") is None


def test_pdf_date_reversed_offset_quirk():
    # ucdavis fixture evidence: 14:05:18-07:00 -> 07:05:18Z
    d = _pdf_date("D:20191031140518-07'00'")
    assert d == datetime(2019, 10, 31, 7, 5, 18, tzinfo=timezone.utc)
    assert _pdf_date("D:20150319190350Z00'00'") == datetime(
        2015, 3, 19, 19, 3, 50, tzinfo=timezone.utc
    )


def test_pdf_info_literal_and_indirect():
    pdf = (b"%PDF-1.4\n1 0 obj\n(My Title)\nendobj\n"
           b"trailer << /Title 1 0 R /Author (Jane \\(J\\)) >>")
    info = parse_pdf_info(pdf)
    assert info["headline"] == "My Title"
    assert info["author"] == "Jane (J)"


def test_pdf_utf16_hex_string():
    text = "Hi"
    hexstr = (b"\xfe\xff" + text.encode("utf-16-be")).hex().encode()
    pdf = b"%PDF /Title <" + hexstr + b">"
    assert parse_pdf_info(pdf)["headline"] == "Hi"


def test_filemeta_routes():
    assert scrape_filemeta("u", "video/mp4", b"")["type"] == "video"
    assert scrape_filemeta("u", "text/html", b"") is None
    rec = scrape_filemeta("u", "image/png", _png(773, 484))
    assert rec["width"] == 773
    assert rec["camera"]["megapixels"] == 0.374


def test_megapixels_exiftool_format():
    assert _megapixels(2448, 2448) == 6       # %.1f -> "6.0" -> 6
    assert _megapixels(773, 484) == 0.374     # %.3f
    assert _megapixels(1536, 1024) == 1.6


def test_combined_single_pass_parity():
    """Fused meta+content parse == separate passes, across the corpus."""
    from unfurl_ray.content.boilerplate import extract_main_text
    from unfurl_ray.core.canonical import canonical_json
    from unfurl_ray.engine.plugin import (
        scrape_html, scrape_html_with_content,
    )
    from unfurl_ray.sources.fixtures import FixtureSideTable, load_pages

    side = FixtureSideTable()
    checked = 0
    for p in load_pages():
        if p["body"] is None:
            continue
        mime = content_type(p["headers"])
        if mime != "text/html":
            continue
        body = p["body"]
        text = body.decode("utf-8", errors="replace") if isinstance(
            body, bytes) else body
        want = scrape_html(p["url"], p["status"], mime, text, side)
        want_main, want_spans = extract_main_text(text)
        got, got_main, got_spans = scrape_html_with_content(
            p["url"], p["status"], mime, text, side
        )
        assert canonical_json(got) == canonical_json(want), p["url"]
        assert got_main == want_main, p["url"]
        assert got_spans == want_spans, p["url"]
        checked += 1
    assert checked > 80


def test_pdf_text_extraction():
    from unfurl_ray.content.pdf_text import (
        extract_pdf_blocks, extract_pdf_text,
    )
    from unfurl_ray.sources.transcripts import _pdf_payload

    pdf = _pdf_payload("Doc 1: hello world", "lorem ipsum " * 10)
    data = pdf.encode("latin-1")
    text, spans = extract_pdf_text(data)
    assert text.startswith("Doc 1: hello world")
    assert "lorem ipsum" in text
    assert spans and spans[0]["kind"] == "pdf_text"
    s = spans[0]
    assert b"Tj" in data[s["start"]:s["end"]]
    assert extract_pdf_text(b"not a pdf") == ("", [])

    # literal-string escapes, hex strings, octal
    raw = (b"%PDF-1.4\n<< /Length 62 >>\nstream\n"
           b"BT (a\\(b\\)c) Tj <48454C4C4F> Tj (\\101\\n) Tj ET"
           b"\nendstream\n%%EOF")
    blocks = extract_pdf_blocks(raw)
    assert blocks and blocks[0]["text"] == "a(b)c HELLO A"


def test_pdf_text_flate_stream():
    import zlib
    from unfurl_ray.content.pdf_text import extract_pdf_text

    content = b"BT (compressed text payload here) Tj ET"
    comp = zlib.compress(content)
    raw = (b"%PDF-1.4\n<< /Filter /FlateDecode /Length "
           + str(len(comp)).encode() + b" >>\nstream\n" + comp
           + b"\nendstream\n%%EOF")
    text, spans = extract_pdf_text(raw)
    assert text == "compressed text payload here"
    assert spans[0]["start"] > 0  # whole-stream span for inflated data


def test_pdf_tj_array_glues_kerning_pieces():
    from unfurl_ray.content.pdf_text import extract_pdf_blocks

    raw = (b"%PDF-1.4\n<< /Length 48 >>\nstream\n"
           b"BT [(Hel) -20 (lo)] TJ (world) Tj ET"
           b"\nendstream\n%%EOF")
    blocks = extract_pdf_blocks(raw)
    assert blocks[0]["text"] == "Hello world"
