"""Incremental materialized-aggregate maintenance and order-invariant
table checksums — the "keep a 100 TB rollup fresh without recomputing
it" pair.

``update_aggregate`` merges a raw delta into an existing aggregate
snapshot in ONE bucketed shuffle: the delta pre-reduces per batch to
partial rows shaped exactly like the snapshot, the union co-partitions
by key hash, and each bucket folds with a vectorized groupby-sum.
Only ADDITIVE aggregates (sum / count) are maintainable this way;
min/max need the base rows on retraction and are refused.

``table_checksum`` folds an order-invariant checksum (sum of per-row
60-bit md5 prefixes mod the Mersenne prime 2^61 - 1) so two
independently-produced outputs (fresh vs resumed run, N- vs 4N-node
cluster) can be compared with one scalar per side — each batch ships
a single int64 partial, the driver folds them, and modular reduction
commutes with the fold so block boundaries never matter.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MERSENNE_61 = (1 << 61) - 1


from unfurl_ray.ops.relational import _arrow  # shared helper


def update_aggregate(snapshot_ds, delta_ds, keys: list[str],
                     aggs: dict[str, tuple[str, str]],
                     n_buckets: int = 64):
    """Return the refreshed aggregate Dataset.

    ``snapshot_ds``: the stored aggregate (columns: keys + the agg
    output columns).  ``delta_ds``: RAW new rows.  ``aggs``:
    out_col -> (in_col, fn), fn in {sum, count} — additive only.
    """
    for out_col, (_in, fn) in aggs.items():
        if fn not in ("sum", "count"):
            raise ValueError(
                f"{out_col}: only additive aggregates (sum/count) are "
                "incrementally maintainable; recompute for " + fn
            )
    out_cols = list(aggs)

    def delta_partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(keys, as_index=False, sort=False)
        merged = None
        for out_col, (in_col, fn) in aggs.items():
            if fn == "count":
                piece = g.size().rename(columns={"size": out_col})
            else:
                piece = g[in_col].sum().rename(
                    columns={in_col: out_col}
                )
            merged = piece if merged is None else merged.merge(
                piece, on=keys
            )
        return _arrow(merged[keys + out_cols])

    def shape_snapshot(batch: pd.DataFrame) -> pa.Table:
        return _arrow(batch[keys + out_cols])

    def bucketize(batch: pd.DataFrame) -> pa.Table:
        batch["_b"] = (
            pd.util.hash_pandas_object(batch[keys], index=False)
            .to_numpy() % np.uint64(n_buckets)
        ).astype(np.int64)
        return _arrow(batch)

    def fold(group: pd.DataFrame) -> pa.Table:
        out = (
            group.drop(columns=["_b"])
            .groupby(keys, as_index=False, sort=False)[out_cols]
            .sum()
        )
        return _arrow(out)

    unioned = snapshot_ds.map_batches(
        shape_snapshot, batch_format="pandas"
    ).union(delta_ds.map_batches(delta_partial, batch_format="pandas"))
    return (
        unioned.map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(fold, batch_format="pandas")
    )


def row_checksum_partial(texts: list[str]) -> int:
    """Fold one batch's row strings into a single mod-2^61-1 partial."""
    total = 0
    for s in texts:
        total += int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
    return total % MERSENNE_61


def table_checksum(ds, row_string_fn) -> tuple[int, int]:
    """(checksum, n_rows) of ``ds`` under the canonical row encoding
    produced by ``row_string_fn(batch: pd.DataFrame) -> list[str]``.
    Order-invariant: any block layout / row order gives the same
    scalar."""
    def partial(batch: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "c": pa.array(
                    [row_checksum_partial(row_string_fn(batch))],
                    pa.int64(),
                ),
                "n": pa.array([len(batch)], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # Python-int fold: an int64 sum of ~2^61-sized partials overflows
    c = sum(int(x) for x in parts["c"]) % MERSENNE_61
    return c, int(parts["n"].sum())
