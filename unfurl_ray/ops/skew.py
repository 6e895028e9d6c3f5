"""Skew mitigation: salted repartition of hot keys.

A grouped operation on ``conv_id`` with Zipf-skewed turn counts
bottlenecks on the hottest key.  Standard fix (SURVEY.md §4): salt hot
keys into ``n_salt`` sub-keys before the shuffle, run the per-group
work per (key, salt), then merge the sub-results.

Used by per-conversation grouped stages; the global ``sort`` path does
NOT need this (range partitioning splits hot runs across blocks).
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa


def add_salt(ds, key_col: str, hot_keys: set, n_salt: int = 8,
             order_col: str | None = None):
    """Append a ``salt`` column: 0 for cold keys, hash(order) % n for hot."""
    hot = set(hot_keys)

    def salt(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        if order_col and order_col in batch.column_names:
            orders = batch.column(order_col).to_pylist()
        else:
            orders = range(len(keys))
        salts = [
            (zlib.crc32(f"{o}".encode()) % n_salt) if k in hot else 0
            for k, o in zip(keys, orders)
        ]
        return batch.append_column("salt", pa.array(salts, pa.int32()))

    return ds.map_batches(salt, batch_format="pyarrow")


def find_hot_keys(ds, key_col: str, threshold: int) -> set:
    """Count per key (pre-aggregated) and return keys above threshold.

    The count shuffle moves one row per key per batch — cheap even at
    scale; run once, reuse the hot set across stages.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.groupby(key_col, as_index=False).size()

    from ray.data.aggregate import Sum

    counts = (
        ds.select_columns([key_col])
        .map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .aggregate(Sum("size", alias_name="n"))
        .to_pandas()
    )
    return set(counts.loc[counts["n"] >= threshold, key_col])
