"""Deterministic synthetic transcript generator.

Builds the BASELINE.json ``input_hint`` table — ``(conv_id:string,
turn_idx:int32, role:string, text:string, tool:string, ts:timestamp)``
— from the driver's ``documents`` table, entirely inside Ray Data
(``map_batches`` over the documents, no driver-side loops), fully
deterministic per ``doc_id`` (no RNG state, resumable at any scale).

Each turn's ``text`` is an HTML payload drawn from template families
mirroring the reference fixture patterns (FIXTURES.md §A: og-basic,
twitter-card/player, applinks, jsonld-article, microdata, icons+oembed,
sailthru, html-only, plain/edge), wrapping the document's words.  Rows
come out in a deterministic *shuffled global order* (hash order) so the
``(conv_id, turn_idx)`` ordering shuffle is actually exercised.
"""

from __future__ import annotations

import pyarrow as pa

ROLES = ["user", "assistant", "tool"]
TURNS_PER_CONV = 8  # avg; actual count varies per conv via hash
BASE_TS = 1_700_000_000_000_000  # us epoch


def _mix(x: int) -> int:
    """64-bit splitmix-style deterministic hash."""
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
    return (x ^ (x >> 31)) % (1 << 64)


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
    )


def _payload(kind: int, doc_id: int, title: str, desc: str, body: str) -> str:
    """One HTML payload per template family; deterministic in doc_id."""
    t, d, b = _esc(title), _esc(desc), _esc(body)
    url = f"https://example.org/doc/{doc_id}"
    img = f"https://img.example.org/{doc_id}.png"
    main = (
        f"<article><h1>{t}</h1><p>{b}</p>"
        f"<p>Second paragraph with enough words to count as content "
        f"for document {doc_id} in the synthetic corpus today.</p></article>"
        f"<nav><a href='/a'>one</a> <a href='/b'>two</a></nav>"
    )
    if kind == 0:  # og-basic (with prefix attr half the time)
        prefix = ' prefix="og: http://ogp.me/ns#"' if doc_id % 2 else ""
        return (
            f'<!DOCTYPE html><html><head{prefix}><title>{t}</title>'
            f'<meta property="og:title" content="{t}">'
            f'<meta property="og:type" content="website">'
            f'<meta property="og:url" content="{url}">'
            f'<meta property="og:image" content="{img}">'
            f'<meta property="og:image:width" content="300">'
            f'<meta property="og:image:height" content="200">'
            f'<meta property="og:description" content="{d}">'
            f"</head><body>{main}</body></html>"
        )
    if kind == 1:  # twitter-card player
        return (
            f'<html><head><title>{t}</title>'
            f'<meta name="twitter:card" content="player">'
            f'<meta name="twitter:title" content="{t}">'
            f'<meta name="twitter:description" content="{d}">'
            f'<meta name="twitter:player" content="{url}/embed">'
            f'<meta name="twitter:player:width" content="640">'
            f'<meta name="twitter:player:height" content="360">'
            f'<meta name="twitter:site" content="@example">'
            f"</head><body>{main}</body></html>"
        )
    if kind == 2:  # applinks + twitter app precedence
        return (
            f'<html><head><title>{t}</title>'
            f'<meta property="al:ios:url" content="ex://doc/{doc_id}">'
            f'<meta property="al:ios:app_store_id" content="42">'
            f'<meta property="al:ios:app_name" content="Example">'
            f'<meta property="al:android:url" content="ex://doc/{doc_id}">'
            f'<meta property="al:android:package" content="org.example">'
            f'<meta property="al:android:app_name" content="Example">'
            f'<meta property="al:web:url" content="{url}">'
            f"</head><body>{main}</body></html>"
        )
    if kind == 3:  # jsonld-article
        return (
            f'<html><head><title>{t}</title>'
            f'<script type="application/ld+json">'
            f'{{"@context": "http://schema.org", "@type": "NewsArticle",'
            f' "headline": "{t}",'
            f' "description": "{d}",'
            f' "datePublished": "2023-11-0{doc_id % 9 + 1}T12:00:00",'
            f' "author": {{"@type": "Person", "name": "Author {doc_id % 50}"}},'
            f' "keywords": "alpha, beta, gamma"}}'
            f"</script></head><body>{main}</body></html>"
        )
    if kind == 4:  # microdata
        return (
            f'<html><head><title>{t}</title></head><body>'
            f'<div itemscope itemtype="http://schema.org/Article">'
            f'<h1 itemprop="headline">{t}</h1>'
            f'<span itemprop="author" itemscope '
            f'itemtype="http://schema.org/Person">'
            f'<meta itemprop="name" content="Author {doc_id % 50}"></span>'
            f"<p>{b}</p></div>{main}</body></html>"
        )
    if kind == 5:  # icons + canonical + sizes quirks
        return (
            f'<html><head><title>{t}</title>'
            f'<link rel="canonical" href="{url}">'
            f'<link rel="icon" href="/favicon.ico" type="image/x-icon">'
            f'<link rel="apple-touch-icon" sizes="76x76" href="/icon76.png">'
            f'<link rel="apple-touch-icon" sizes="any" href="/icon.svg">'
            f'<meta name="description" content="{d}">'
            f"</head><body>{main}</body></html>"
        )
    if kind == 6:  # sailthru
        return (
            f'<html><head><title>{t}</title>'
            f'<meta name="sailthru.title" content="{t}">'
            f'<meta name="sailthru.description" content="{d}">'
            f'<meta name="sailthru.author" content="Author {doc_id % 50}">'
            f'<meta name="sailthru.image.full" content="{img}">'
            f"</head><body>{main}</body></html>"
        )
    if kind == 7:  # html-only
        return (
            f'<html lang="xx"><head><title>{t}</title>'
            f'<meta name="description" content="{d}">'
            f'<meta name="keywords" content="spark, ray, arrow">'
            f'<meta name="author" content="Author {doc_id % 50}">'
            f'<meta name="language" content="en">'
            f"</head><body>{main}</body></html>"
        )
    if kind == 8:  # PDF turn (north_rule PDF/layout axis)
        return _pdf_payload(title, body)
    # kind 9: plain text (mime-gate fallback) or empty
    if doc_id % 7 == 0:
        return ""
    return body


def _pdf_payload(title: str, body: str) -> str:
    """Minimal single-page PDF (ASCII, uncompressed content stream) so
    the PDF text-extraction path runs per turn; one Tj per line."""
    def pdf_esc(s: str) -> str:
        return (
            s.replace("\\", "").replace("(", "").replace(")", "")
            .encode("ascii", errors="ignore").decode("ascii")
        )

    lines = [pdf_esc(title)] + [
        pdf_esc(body[i: i + 60]) for i in range(0, min(len(body), 300), 60)
    ]
    content = "BT /F1 12 Tf 72 720 Td " + " T* ".join(
        f"({ln}) Tj" for ln in lines if ln.strip()
    ) + " ET"
    stream = f"<< /Length {len(content)} >>\nstream\n{content}\nendstream"
    return (
        "%PDF-1.4\n"
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
        "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
        f"4 0 obj {stream} endobj\n"
        f"5 0 obj << /Title ({pdf_esc(title)}) >> endobj\n"
        "trailer << /Root 1 0 R /Info 5 0 R >>\n%%EOF\n"
    )


def transcripts_from_documents(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """documents batch -> transcript rows (``repeat`` turns per doc row).

    conv_id groups ~TURNS_PER_CONV virtual docs; a small set of hot
    conv_ids (hash % 97 == 0 -> conv-hot-<k>) gives Zipf-ish skew so
    salted repartition is exercised at scale.  ``repeat`` amplifies the
    row count deterministically (bench scaling runs) — each copy gets a
    distinct virtual doc_id, so output is identical to a bigger corpus.
    """
    raw_ids = batch.column("doc_id").to_pylist()
    raw_texts = batch.column("text").to_pylist()
    doc_texts = (
        (rid * repeat + r, t)
        for rid, t in zip(raw_ids, raw_texts)
        for r in range(repeat)
    )

    conv_ids, turn_idxs, roles, payloads, tools, tss = [], [], [], [], [], []
    shuffle_keys = []
    for doc_id, text in doc_texts:
        text = text or ""
        h = _mix(doc_id)
        # hot-conv assignment uses the SQL-expressible multiplicative
        # hash (same as q_hash_sample) so per-conv stats can be
        # oracle-checked: (doc_id * 2654435761) mod 2^64
        hot_h = (doc_id * 2654435761) % (1 << 64)
        if hot_h % 97 == 0:  # hot conversations (skew)
            conv = f"conv-hot-{hot_h % 3}"
            turn = doc_id % 100_000
        else:
            conv = f"conv-{doc_id // TURNS_PER_CONV:08d}"
            turn = doc_id % TURNS_PER_CONV
        words = text.split()
        title = f"Doc {doc_id}: " + " ".join(words[:5])
        desc = " ".join(words[5:25]) or "empty description"
        kind = h % 10
        conv_ids.append(conv)
        turn_idxs.append(turn)
        roles.append(ROLES[doc_id % 3])
        payloads.append(_payload(kind, doc_id, title, desc, text))
        tools.append("browser" if doc_id % 3 == 2 else "")
        tss.append(BASE_TS + doc_id * 1_000_000)
        shuffle_keys.append(_mix(doc_id + 7) % (1 << 32))

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(payloads, pa.large_string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(tss, pa.timestamp("us")),
            # deterministic pseudo-shuffle key: global row order is
            # hash order, so (conv_id, turn_idx) ordering needs a real
            # shuffle downstream.
            "shuffle_key": pa.array(shuffle_keys, pa.uint32()),
        }
    )


def build_transcripts(sf_dir: str, shuffled: bool = True, repeat: int = 1):
    """documents.parquet -> transcript Dataset (lazy, Ray-native)."""
    import ray.data as rd

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    if repeat > 1:
        # One small parquet file reads as one block; split it so the
        # repeat-amplified generation runs on every core.
        ds = ds.repartition(64)
    ds = ds.map_batches(
        transcripts_from_documents,
        fn_kwargs={"repeat": repeat},
        batch_format="pyarrow",
    )
    if shuffled:
        ds = ds.sort("shuffle_key")
    return ds.drop_columns(["shuffle_key"])
