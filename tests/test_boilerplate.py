from unfurl_ray.content.boilerplate import extract_blocks, extract_main_text


HTML = """
<html><body>
<nav><a href="/">Home</a> <a href="/about">About</a></nav>
<article>
 <p>This is the real content paragraph with plenty of words to pass
 the minimum word threshold easily for extraction.</p>
 <p>short</p>
 <p>A second substantial paragraph of body text continues the article
 with even more meaningful words here.</p>
</article>
<footer>Copyright links <a href="/x">x</a> <a href="/y">y</a></footer>
<script>var x = "not content at all";</script>
</body></html>
"""


def test_main_text_keeps_content_drops_boilerplate():
    main, spans = extract_main_text(HTML)
    assert "real content paragraph" in main
    assert "second substantial paragraph" in main
    assert "short" not in main          # too few words
    assert "Home" not in main           # nav boilerplate
    assert "Copyright" not in main      # footer boilerplate
    assert "not content" not in main    # script dropped
    assert len(spans) == 2
    for span in spans:
        assert HTML[span["start"]:span["end"]].strip() != ""


def test_link_density_filter():
    linky = (
        "<p>" + " ".join(
            f'<a href="/{i}">link word {i}</a>' for i in range(10)
        ) + "</p>"
    )
    blocks = extract_blocks(linky)
    assert blocks and not blocks[0]["is_content"]


def test_empty_and_plain():
    assert extract_main_text("") == ("", [])
