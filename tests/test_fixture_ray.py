"""The conformance corpus through the *Ray* engine (ExtractPages actor
pool + broadcast side table), not just the pure-Python scrape path."""

import json

import pyarrow as pa

from unfurl_ray.core.canonical import canonical_json
from unfurl_ray.sources.fixtures import (
    FixtureSideTable,
    fixture_urls,
    html_snapshots,
    load_pages,
    scrub_nan,
)


import pytest

from unfurl_ray.sources.fixtures import exif_snapshots, exiftool_snapshots


@pytest.mark.parametrize(
    "plugins,snap_fn",
    [(("html",), html_snapshots),
     (("exif",), exif_snapshots),
     (("filemeta",), exiftool_snapshots)],
    ids=["html", "exif", "exiftool"],
)
def test_extract_pages_matches_snapshots(ray_session, plugins, snap_fn):
    import ray
    import ray.data as rd

    from unfurl_ray.engine.stages import ExtractPages

    pages = [p for p in load_pages() if p["body"] is not None]
    table = pa.table(
        {
            "url": pa.array([p["url"] for p in pages]),
            "status": pa.array([p["status"] for p in pages], pa.int32()),
            "headers_json": pa.array(
                [json.dumps(p["headers"]) for p in pages]
            ),
            "body": pa.array([p["body"] for p in pages], pa.large_binary()),
        }
    )
    side_ref = ray.put(FixtureSideTable())
    out = (
        rd.from_arrow(table)
        .map_batches(
            ExtractPages,
            fn_constructor_kwargs={"side_table_ref": side_ref,
                                   "plugins": plugins},
            batch_format="pyarrow",
            batch_size=16,
            concurrency=2,
            num_cpus=1,
        )
        .to_pandas()
    )
    snaps = snap_fn()
    by_url = dict(zip(out["url"], out["unfurl_json"]))
    matched = checked = 0
    for url, want in snaps.items():
        # snapshots key by request url; pages store the final
        # (post-redirect) url, preserved as request_url by load_pages
        page = next((p for p in pages if p["request_url"] == url), None)
        if page is None:
            continue
        checked += 1
        if by_url.get(page["url"]) == canonical_json(scrub_nan(want)):
            matched += 1
    assert checked > 100
    assert matched == checked
