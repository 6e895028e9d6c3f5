"""Poison-pill isolation for per-batch UDFs.

At 100 TB a handful of malformed rows WILL appear, and one raising row
must not kill a week-long job or silently drop its whole batch.
``quarantine_map`` runs the vectorized happy path per batch and, only
when a batch raises, bisects it to isolate the raising rows — cost
O(bad_rows x log batch_size) extra UDF calls, zero overhead on clean
batches.  Failed rows come through WITH their passthrough columns and
the exception type, so the quarantine partition can be audited and
re-driven later; clean rows are indistinguishable from a plain
map_batches.
"""

from __future__ import annotations

import pandas as pd


def quarantine_map(ds, fn, id_cols: list[str],
                   out_schema: dict[str, str],
                   error_col: str = "error", status_col: str = "status"):
    """Apply ``fn`` (pandas batch -> pandas batch, 1:1 rows, must keep
    ``id_cols``) with row-level fault isolation.

    ``out_schema`` maps every fn output column to its pandas dtype
    (use nullable 'Int64'/'Float64' for columns that are null on
    quarantined rows) — an explicit contract so an all-error batch
    emits the same block schema as a clean one.  Output = out_schema
    columns + ``status`` ('ok' | 'error') + ``error`` (the exception
    CLASS NAME — stable across runs; messages may embed row values and
    stay out of the contract).  Quarantined rows carry their
    ``id_cols`` and nulls elsewhere.
    """

    def isolate(batch: pd.DataFrame) -> list[tuple[pd.DataFrame, str]]:
        """Return [(result | id-only frame, exception name)] pieces."""
        try:
            out = fn(batch)
            if len(out) != len(batch):
                raise ValueError(
                    "quarantine_map requires a 1:1 row mapping; got "
                    f"{len(out)} rows from {len(batch)}"
                )
            return [(out, "")]
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            if len(batch) == 1:
                return [(batch[id_cols].copy(), type(exc).__name__)]
            mid = len(batch) // 2
            return isolate(batch.iloc[:mid]) + isolate(batch.iloc[mid:])

    cols = list(out_schema)

    def run(batch: pd.DataFrame) -> pd.DataFrame:
        pieces = []
        for frame, exc_name in isolate(batch):
            frame = frame.reindex(columns=cols)
            frame[status_col] = "error" if exc_name else "ok"
            frame[error_col] = exc_name
            pieces.append(frame)
        out = pd.concat(pieces, ignore_index=True)
        for c, dt in out_schema.items():
            out[c] = out[c].astype(dt)
        return out

    return ds.map_batches(run, batch_format="pandas")
