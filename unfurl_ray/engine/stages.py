"""Ray Data stages for the extraction pipeline.

The hot path is ``map_batches(ExtractTurns, batch_format="pyarrow",
zero_copy_batch=True, concurrency=N)`` — an actor pool because the
stage holds state built once per actor (broadcast side table fetched
via ``ray.get`` in ``__init__``, JSON-LD context cache, compiled
tables), per SURVEY.md §2.4 T1.  Batches arrive as zero-copy Arrow
tables; the per-row work (HTML parse -> buckets -> graph -> getters)
is inherently per-document, so the row loop lives inside the batch UDF
while all column assembly stays Arrow-native.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from unfurl_ray.core.canonical import canonical_json
from unfurl_ray.engine.plugin import (
    ContextLoader,
    scrape_html_with_content,
    scrape_page,
)

SPAN_TYPE = pa.list_(
    pa.struct(
        [("start", pa.int32()), ("end", pa.int32()), ("kind", pa.string())]
    )
)


def sniff_mime(text: str) -> str:
    """Transcript turns carry no content-type header; route by shape.

    Mirrors the reference's mime gate semantics (unfurl-html gate at
    src/index.ts:47): HTML-looking payloads -> text/html, a leading
    ``%PDF`` -> application/pdf, anything else -> text/plain (which the
    chain degrades to a Link, like the reference's base handler).
    """
    head = text.lstrip()[:256].lower()
    if not head:
        return "text/plain"
    if head.startswith("%pdf"):
        return "application/pdf"
    if head.startswith("<!doctype") or head.startswith("<html"):
        return "text/html"
    if head.startswith("<") and any(
        t in head
        for t in ("<meta", "<title", "<link", "<head", "<body", "<div",
                  "<p>", "<p ", "<article", "<script", "<span", "<h1")
    ):
        return "text/html"
    return "text/plain"


class ExtractTurns:
    """Actor-pool batch UDF: transcript turns -> per-turn extraction.

    Input columns: at least ``text``; ``conv_id/turn_idx/role/tool/ts``
    pass through when present.  Output adds:

    - ``mime``          routed content type
    - ``unfurl_type``   website/link/image/document/video
    - ``unfurl_json``   canonical JSON of the full Unfurl record
    - ``headline/description/canonical_url/language`` hoisted scalars
    - ``main_text``     boilerplate-stripped content text
    - ``spans``         char spans of content blocks in ``text``
    - ``n_images/n_icons/n_videos`` small ints for metrics
    """

    def __init__(
        self,
        side_table_ref: Any = None,
        plugins: tuple[str, ...] = ("html", "filemeta"),
        url_column: str | None = None,
        keep_columns: tuple[str, ...] = (
            "conv_id", "turn_idx", "role", "tool", "ts",
        ),
    ):
        if side_table_ref is not None:
            import ray
            if isinstance(side_table_ref, ray.ObjectRef):
                self.side_table = ray.get(side_table_ref)
            else:
                self.side_table = side_table_ref
        else:
            self.side_table = None
        # One context cache per actor — resolves each remote @context
        # once across every batch this actor processes.
        self.context_loader = ContextLoader(self.side_table)
        self.plugins = plugins
        self.url_column = url_column
        self.keep_columns = keep_columns

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        if self.url_column and self.url_column in batch.column_names:
            urls = batch.column(self.url_column).to_pylist()
        elif "conv_id" in batch.column_names and "turn_idx" in batch.column_names:
            conv = batch.column("conv_id").to_pylist()
            idx = batch.column("turn_idx").to_pylist()
            urls = [f"turn://{c}/{i}" for c, i in zip(conv, idx)]
        else:
            urls = [f"row://{i}" for i in range(len(texts))]

        mimes, types, jsons = [], [], []
        headlines, descriptions, canonicals, languages = [], [], [], []
        main_texts, spans_col = [], []
        n_images, n_icons, n_videos = [], [], []
        errors = []

        for url, text in zip(urls, texts):
            text = text or ""
            err = None
            try:
                mime = sniff_mime(text)
                if mime == "text/html" and "html" in self.plugins:
                    # fused parse: metadata buckets + content blocks in
                    # one tokenization of the (possibly multi-MB) payload
                    record, main_text, spans = scrape_html_with_content(
                        url, 200, mime, text,
                        side_table=self.side_table,
                        context_loader=self.context_loader,
                    )
                else:
                    record = scrape_page(
                        url,
                        200,
                        {"content-type": mime},
                        text,
                        side_table=self.side_table,
                        context_loader=self.context_loader,
                        plugins=self.plugins,
                    )
                    if mime == "application/pdf":
                        from unfurl_ray.content.pdf_text import (
                            extract_pdf_text,
                        )

                        main_text, spans = extract_pdf_text(
                            text.encode("latin-1", errors="replace")
                        )
                    else:
                        main_text, spans = ("", [])
            except Exception as exc:  # never fail a row (SURVEY §4):
                # emit the degraded record + error column; at 10^12
                # turns one pathological payload must not kill its
                # whole partition
                mime = "application/octet-stream"
                record = {"type": "link", "url": url}
                main_text, spans = ("", [])
                err = f"{type(exc).__name__}: {exc}"[:500]
            errors.append(err)
            mimes.append(mime)
            types.append(record.get("type", "link"))
            jsons.append(canonical_json(record))
            headlines.append(record.get("headline"))
            descriptions.append(record.get("description"))
            canonicals.append(record.get("canonicalUrl"))
            languages.append(record.get("language"))
            main_texts.append(main_text)
            spans_col.append(spans)
            n_images.append(len(record.get("image") or []))
            n_icons.append(len(record.get("icon") or []))
            n_videos.append(len(record.get("video") or []))

        arrays = {
            name: batch.column(name)
            for name in self.keep_columns
            if name in batch.column_names
        }
        arrays.update(
            mime=pa.array(mimes, pa.string()),
            unfurl_type=pa.array(types, pa.string()),
            unfurl_json=pa.array(jsons, pa.large_string()),
            headline=pa.array(headlines, pa.string()),
            description=pa.array(descriptions, pa.string()),
            canonical_url=pa.array(canonicals, pa.string()),
            language=pa.array(languages, pa.string()),
            main_text=pa.array(main_texts, pa.large_string()),
            spans=pa.array(spans_col, SPAN_TYPE),
            n_images=pa.array(n_images, pa.int32()),
            n_icons=pa.array(n_icons, pa.int32()),
            n_videos=pa.array(n_videos, pa.int32()),
            error=pa.array(errors, pa.string()),
        )
        return pa.table(arrays)


class ExtractPages:
    """Batch UDF for page-shaped rows (url, status, headers?, body).

    Used by the fixture-corpus pipeline and any crawl-style input whose
    rows mirror the reference's ``Page`` record (unfurl/src/index.ts:3-8).
    """

    def __init__(
        self,
        side_table_ref: Any = None,
        plugins: tuple[str, ...] = ("html",),
    ):
        if side_table_ref is not None:
            import ray
            if isinstance(side_table_ref, ray.ObjectRef):
                self.side_table = ray.get(side_table_ref)
            else:
                self.side_table = side_table_ref
        else:
            self.side_table = None
        self.context_loader = ContextLoader(self.side_table)
        self.plugins = plugins

    def __call__(self, batch: pa.Table) -> pa.Table:
        import json as _json

        urls = batch.column("url").to_pylist()
        statuses = (
            batch.column("status").to_pylist()
            if "status" in batch.column_names
            else [200] * len(urls)
        )
        headers = (
            [_json.loads(h) if h else {}
             for h in batch.column("headers_json").to_pylist()]
            if "headers_json" in batch.column_names
            else [{} for _ in urls]
        )
        bodies = batch.column("body").to_pylist()

        types, jsons, errors = [], [], []
        for url, status, hdrs, body in zip(urls, statuses, headers, bodies):
            try:
                record = scrape_page(
                    url, status, hdrs, body or b"",
                    side_table=self.side_table,
                    context_loader=self.context_loader,
                    plugins=self.plugins,
                )
                err = None
            except Exception as exc:  # never fail a row (SURVEY §4)
                record = {"type": "link", "url": url}
                err = f"{type(exc).__name__}: {exc}"[:500]
            types.append(record.get("type", "link"))
            jsons.append(canonical_json(record))
            errors.append(err)
        return pa.table(
            {
                "url": batch.column("url"),
                "unfurl_type": pa.array(types, pa.string()),
                "unfurl_json": pa.array(jsons, pa.large_string()),
                "error": pa.array(errors, pa.string()),
            }
        )
