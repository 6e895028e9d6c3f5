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
    # bucketed merge, not Ray's builtin aggregate: key count grows
    # with the data and the builtin reduce combines per key in Python
    # (measured 40 s for 150k keys; see relational.bucketed_aggregate)
    from unfurl_ray.ops.relational import bucketed_aggregate

    counts = bucketed_aggregate(
        ds.select_columns([key_col]), [key_col],
        {"n": (key_col, "count")},
    ).to_pandas()
    return set(counts.loc[counts["n"] >= threshold, key_col])


def skew_join(left_ds, right_ds, on: str, right_on: str,
              hot_threshold: int, num_partitions: int = 8,
              concurrency: int = 8):
    """Hybrid skew-safe INNER join.

    A hash join routes ALL rows of a key to one partition, so one
    Zipf-hot key (a bot user, a viral document) serializes the whole
    stage.  Here keys whose LEFT frequency >= ``hot_threshold`` join
    via broadcast — their right rows ship once per actor and the hot
    rows stay spread across their original blocks — while cold keys
    take the ordinary hash-partitioned ``Dataset.join``.  Output rows
    are exactly the inner join's either way.

    Costs: hot detection is one (key, n) stub shuffle
    (``find_hot_keys``, reusable across stages); the broadcast piece
    is |hot keys| x right-rows-per-key — dim-like right sides by
    assumption (document if yours is not).
    """
    import ray

    from unfurl_ray.ops.relational import _arrow

    hot = find_hot_keys(left_ds, on, hot_threshold)

    def split(ds, col, keep_hot: bool):
        # typed Arrow out: a pandas block that filters to empty loses
        # its schema and the downstream acero join fails with "no
        # match for key field"
        def f(batch: pd.DataFrame) -> pa.Table:
            mask = batch[col].isin(hot)
            return _arrow(batch[mask] if keep_hot else batch[~mask])

        return ds.map_batches(f, batch_format="pandas")

    # right rows of hot keys -> one driver table, one ray.put
    hot_right = split(right_ds, right_on, True).to_pandas()
    if right_on != on:
        hot_right = hot_right.rename(columns={right_on: on})
    ref = ray.put(hot_right)

    class HotProbe:
        def __init__(self, r):
            self.small = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            return _arrow(batch.merge(self.small, on=on, how="inner"))

    hot_joined = split(left_ds, on, True).map_batches(
        HotProbe,
        fn_constructor_kwargs={"r": ref},
        batch_format="pandas",
        concurrency=(1, concurrency),
    )
    # bucketed hash join, not Dataset.join: the filtered cold sides
    # can leave hash partitions empty, which Dataset.join rejects with
    # ArrowInvalid (see relational.bucketed_hash_join)
    from unfurl_ray.ops.relational import bucketed_hash_join

    cold_joined = bucketed_hash_join(
        split(left_ds, on, False),
        split(right_ds, right_on, False),
        on=on, right_on=right_on,
        n_buckets=max(8, num_partitions),
    )
    out_cols = hot_right.columns.tolist()
    left_cols = [
        c for c in left_ds.schema().names if c not in out_cols
    ]
    cols = [on] + [c for c in out_cols if c != on] + left_cols

    def norm(batch: pd.DataFrame) -> pa.Table:
        # the hash join keeps both key columns when names differ;
        # they're equal on an inner join, so drop the right one
        if right_on != on:
            batch = batch.drop(columns=[right_on], errors="ignore")
        return _arrow(batch[cols])

    return hot_joined.map_batches(norm, batch_format="pandas").union(
        cold_joined.map_batches(norm, batch_format="pandas")
    )
