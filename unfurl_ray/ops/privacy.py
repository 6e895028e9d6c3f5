"""Dataset-level privacy operators (column combination suppression).

``pii_scrub_batch`` (ops/textstats.py) redacts WITHIN a text column;
this module handles the complementary risk: quasi-identifier column
COMBINATIONS rare enough to re-identify a row.  k-anonymity demands
every released (col1, .., colN) tuple appear at least k times.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def k_anonymize(ds, quasi_cols: list[str], k: int,
                sentinel: str = "*"):
    """Suppress quasi-identifier tuples seen fewer than ``k`` times:
    every ``quasi_cols`` value of a rare tuple's rows is replaced by
    ``sentinel`` (full-tuple suppression — partial generalization
    would need a taxonomy).  Adds ``group_n``, the tuple's original
    frequency, for auditability.

    Scale shape: tuple frequencies via ``bucketed_aggregate`` (one
    histogram row per distinct tuple crosses the shuffle), then a
    hash join back to the rows — the rare SET is never driver-side or
    broadcast, so a long tail of millions of rare tuples costs one
    co-partitioned join, same as percent_rank_by.

    NULL quasi-identifier values are mapped to a reserved category
    first — otherwise pandas' groupby (dropna) and the null-rejecting
    equi-join would silently DELETE null-keyed rows, which are often
    the rarest and most identifying ones; as a real category they are
    counted and suppressed like any other tuple.
    """
    from unfurl_ray.ops.relational import _arrow, bucketed_aggregate

    NULL_CAT = "\x00null"

    def null_cat(batch: pd.DataFrame) -> pa.Table:
        # emit ARROW: this side feeds the Ray-native hash join, where
        # pandas blocks pay a shuffle-side conversion and break
        # schema-dedup hashing ("Failed to hash the schemas" spam)
        for c in quasi_cols:
            batch[c] = batch[c].fillna(NULL_CAT)
        return _arrow(batch)

    ds = ds.map_batches(
        null_cat, batch_format="pandas"
    ).materialize()  # consumed twice: histogram + probe side
    hist = bucketed_aggregate(
        ds, quasi_cols, {"group_n": (quasi_cols[0], "count")}
    )
    joined = ds.join(
        hist, join_type="inner", num_partitions=8,
        on=tuple(quasi_cols),
    )

    def suppress(batch: pd.DataFrame) -> pd.DataFrame:
        rare = (batch["group_n"] < k).to_numpy()
        out = batch.copy()
        for c in quasi_cols:
            vals = out[c].to_numpy(dtype=object, copy=True)
            vals[rare] = sentinel
            vals[vals == NULL_CAT] = None  # frequent nulls stay null
            out[c] = vals
        out["group_n"] = out["group_n"].astype("int64")
        return out

    return joined.map_batches(suppress, batch_format="pandas")


def pseudonymize(ds, cols: list[str], salt: str,
                 out_len: int = 16):
    """Deterministic keyed pseudonymization of identifier columns:
    each value maps to ``sha256(salt|value)[:out_len]`` — stable
    across runs/joins (the same user pseudonymizes identically
    everywhere, so referential structure survives) yet irreversible
    without the salt.  Pure per-row map, zero shuffle; hashing runs
    once per DISTINCT value per batch and broadcasts back through a
    pandas map (ids repeat heavily in event streams)."""
    import hashlib

    def scrub(batch: pd.DataFrame) -> pd.DataFrame:
        for c in cols:
            v = batch[c]
            uniq = v.dropna().unique()
            table = {
                u: hashlib.sha256(
                    f"{salt}|{u}".encode()
                ).hexdigest()[:out_len]
                for u in uniq
            }
            batch[c] = v.map(table)
        return batch

    return ds.map_batches(scrub, batch_format="pandas")
