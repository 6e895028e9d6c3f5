"""Sliding-window document chunking.

Long documents must be split into overlapping fixed-size token windows
before embedding / training — every retrieval and pretraining pipeline
has this step between cleaning and tokenization.

Scale shape: pure ``map_batches`` flat emission — no shuffle, no state,
no driver data. Output size is input size x (window / stride); size
``batch_size`` down when chunking multi-MB documents so a single output
block stays under the target block size.

Token rule (shared with the DuckDB oracle and the repo's other text
ops, e.g. vocab_spectrum): explicit ASCII whitespace class
``[ \\t\\n\\f\\r]+`` with empty tokens dropped.  NOT ``\\s`` — Python's
ASCII ``\\s`` includes ``\\v`` while RE2/DuckDB's does not, so the two
engines would tokenize differently on vertical tabs.
"""

from __future__ import annotations

import re

import pyarrow as pa

from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _WS  # shared token contract


def _tokens(text: str) -> list[str]:
    return [t for t in _WS.split(text) if t]


def chunk_by_tokens(ds, text_col: str, id_col: str, window: int,
                    stride: int):
    """Split each document into windows of ``window`` tokens starting
    every ``stride`` tokens (overlap = window - stride).

    One output row per (doc, start) with ``start in range(0, n_tokens,
    stride)`` — the tail chunk is short rather than dropped, so every
    token appears in at least one chunk. Empty documents emit nothing.

    Output columns: ``{id_col}, chunk_id, n_tokens, chunk_text``.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_id, out_cid, out_n, out_txt = [], [], [], []
        for i, text in zip(ids, texts):
            toks = _tokens(text or "")
            n = len(toks)
            for start in range(0, n, stride):
                piece = toks[start:start + window]
                out_id.append(i)
                out_cid.append(start // stride)
                out_n.append(len(piece))
                out_txt.append(" ".join(piece))
        return pa.table(
            {
                id_col: pa.array(out_id, pa.int64()),
                "chunk_id": pa.array(out_cid, pa.int64()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "chunk_text": pa.array(out_txt, pa.string()),
            }
        )

    return ds.map_batches(chunk, batch_format="pyarrow")
