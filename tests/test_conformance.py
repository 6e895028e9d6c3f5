"""Reference conformance: every available fixture snapshot must match
byte-for-byte (canonical JSON) across all three plugin suites.

This is the engine's equivalent of the reference's jest snapshot tests
(SURVEY.md §5): 118 URLs x {html, exif, exiftool}.  Fixtures whose body
the reference itself ships as missing (.MISSING_LARGE_BLOBS) or that
have no golden snapshot are skipped explicitly.
"""

import pytest

from unfurl_ray.core.canonical import canonical_json
from unfurl_ray.engine.plugin import scrape_page
from unfurl_ray.sources.fixtures import (
    FixtureSideTable,
    exif_snapshots,
    exiftool_snapshots,
    fixture_urls,
    html_snapshots,
    scrub_nan,
)

SIDE = FixtureSideTable()
URLS = fixture_urls()

SUITES = {
    "html": (html_snapshots(), ("html",)),
    "exif": (exif_snapshots(), ("exif",)),
    "exiftool": (exiftool_snapshots(), ("filemeta",)),
}


@pytest.mark.parametrize("suite", list(SUITES))
def test_full_suite(suite):
    snaps, plugins = SUITES[suite]
    checked = 0
    failures = []
    for url in URLS:
        page = SIDE.get_page(url)
        want = snaps.get(url)
        if page is None or want is None or page["body"] is None:
            continue  # missing blob / no golden — documented skips
        got = scrape_page(
            page["url"], page["status"], page["headers"], page["body"],
            side_table=SIDE, plugins=plugins,
        )
        if canonical_json(got) != canonical_json(scrub_nan(want)):
            failures.append(url)
        checked += 1
    assert checked >= 115, f"only {checked} fixtures checked"
    assert not failures, f"{len(failures)} mismatches: {failures[:5]}"
