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

import pandas as pd
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
            # accept the common encodings, not one hard-coded format:
            # space/'T' separators, optional fractional seconds, and
            # a final pandas fallback for anything mixed
            col = None
            raw = batch.column(field.name)
            for fmt in (
                "%Y-%m-%d %H:%M:%S", "%Y-%m-%dT%H:%M:%S",
                "%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%dT%H:%M:%S.%f",
            ):
                try:
                    col = pc.strptime(raw, format=fmt, unit="us")
                    break
                except pa.ArrowInvalid:
                    continue
            if col is None:
                parsed = pd.to_datetime(
                    raw.to_pandas(), format="mixed", utc=False
                )
                col = pa.Array.from_pandas(
                    parsed, type=pa.timestamp("us")
                )
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


def read_jsonl_tolerant(path: str, columns: list[str],
                        dtypes: dict[str, str]):
    """Dirty-tolerant JSONL ingest: raw text lines stream in, each
    batch parses VECTORIZED (one pandas ``read_json(lines=True)``
    call); only when a batch contains malformed lines does it fall
    back to per-line isolation — the quarantine cost is paid on the
    rare bad path, never the hot one (same row-isolating idea as
    ops/robust.quarantine_map).  Returns rows with ``_corrupt=False``
    for parsed lines and one ``_corrupt=True`` row (original line in
    ``_raw``) per bad line, so callers can route rejects to a dead
    letter sink instead of crashing a 100 TB job."""
    import io

    import ray.data as rd

    def parse(batch: pd.DataFrame) -> pa.Table:
        lines = batch["text"].tolist()
        good = None
        bad: list[str] = []
        try:
            good = pd.read_json(
                io.StringIO("\n".join(lines)), lines=True,
                dtype=dtypes,
            )
        except ValueError:
            rows = []
            for ln in lines:
                try:
                    rows.append(
                        pd.read_json(io.StringIO(ln), lines=True,
                                     dtype=dtypes)
                    )
                except ValueError:
                    bad.append(ln)
            good = (
                pd.concat(rows, ignore_index=True)
                if rows else pd.DataFrame(columns=columns)
            )
        out = pd.DataFrame(
            {c: good[c] if c in good else pd.Series(dtype=dtypes[c])
             for c in columns}
        )
        out["_corrupt"] = False
        out["_raw"] = ""
        if bad:
            rej = pd.DataFrame({c: pd.Series(
                [None] * len(bad)).astype(dtypes[c], errors="ignore")
                for c in columns})
            rej["_corrupt"] = True
            rej["_raw"] = bad
            out = pd.concat([out, rej], ignore_index=True)
        for c, t in dtypes.items():
            try:
                out[c] = out[c].astype(t)
            except (TypeError, ValueError):
                pass
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return rd.read_text(path).map_batches(
        parse, batch_format="pandas"
    )
