"""Multi-format transcript ingest.

The flagship contract (BASELINE.json ``input_hint``) names a Parquet
table, but a user switching from the reference also lands transcript
dumps as JSONL or CSV.  ``read_transcripts`` normalizes any of the
three into the same Dataset schema — (conv_id:string, turn_idx:int32,
role:string, text:string, tool:string, ts:timestamp[us]) — so every
downstream stage (ExtractTurns, ordering shuffle, checkpointed sink)
is format-agnostic.  Reads stay streaming (``ray.data.read_*``) with
a vectorized per-batch schema-normalize pass; nothing is collected.
"""

from __future__ import annotations

import pyarrow as pa

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _normalize(batch: pa.Table) -> pa.Table:
    """Cast/order columns to the canonical transcript schema.  JSON
    readers produce int64 turn_idx and string timestamps; CSV readers
    may produce either — normalize all of it vectorized."""
    import pyarrow.compute as pc

    cols = {}
    for field in SCHEMA:
        col = batch.column(field.name)
        if field.name == "ts" and pa.types.is_string(col.type):
            col = pc.strptime(col, format="%Y-%m-%d %H:%M:%S", unit="us")
        cols[field.name] = pc.cast(col, field.type)
    return pa.table(cols)


def read_transcripts(path: str, format: str = "parquet"):
    """Streaming read of a transcript table in parquet/jsonl/csv form,
    normalized to the canonical schema (see module docstring)."""
    import ray.data as rd

    if format == "parquet":
        ds = rd.read_parquet(path)
    elif format in ("json", "jsonl"):
        ds = rd.read_json(path)
    elif format == "csv":
        ds = rd.read_csv(path)
    else:
        raise ValueError(f"unsupported transcript format: {format!r}")
    return ds.map_batches(_normalize, batch_format="pyarrow")
