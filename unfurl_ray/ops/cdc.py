"""Change-data-capture merge: apply an upsert/delete change stream
onto a base snapshot, latest version per key wins.

The merge is one bucket-co-partitioned shuffle: base rows enter at
version 0, change rows at their change version; rows hash-bucket by
key, and each bucket resolves keys vectorized (sort by (key, ver),
keep the last row per key, drop deletes).  No key's full history ever
exceeds its own change count, and the shuffle carries only the merged
columns — the natural MERGE INTO shape for periodic snapshot+delta
compaction at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

OP_UPSERT = "upsert"
OP_DELETE = "delete"


from unfurl_ray.ops.relational import _arrow  # shared helper


def apply_changes(base_ds, changes_ds, key_col: str,
                  payload_cols: list[str], op_col: str = "op",
                  ver_col: str = "ver", n_buckets: int = 64):
    """Merge ``changes_ds`` (columns: key, payload..., op_col in
    {'upsert','delete'}, ver_col int >= 1) onto ``base_ds`` (columns:
    key, payload...).  Returns the post-merge snapshot Dataset with
    (key, payload...) — per key the HIGHEST version wins; ties within
    a version resolve to the row whose payload tuple sorts last
    (deterministic under re-delivery).
    """
    cols = [key_col] + payload_cols

    def shape_base(batch: pd.DataFrame) -> pa.Table:
        out = batch[cols].copy()
        out["_ver"] = np.int64(0)
        out["_del"] = False
        out["_b"] = (
            pd.util.hash_pandas_object(out[key_col], index=False)
            .to_numpy() % np.uint64(n_buckets)
        ).astype(np.int64)
        return _arrow(out)

    def shape_changes(batch: pd.DataFrame) -> pa.Table:
        out = batch[cols].copy()
        out["_ver"] = batch[ver_col].to_numpy(dtype=np.int64)
        out["_del"] = (batch[op_col] == OP_DELETE).to_numpy()
        out["_b"] = (
            pd.util.hash_pandas_object(out[key_col], index=False)
            .to_numpy() % np.uint64(n_buckets)
        ).astype(np.int64)
        return _arrow(out)

    def resolve(group: pd.DataFrame) -> pa.Table:
        # _del in the sort key makes the delete-vs-upsert tie at an
        # equal (_ver, payload) deterministic (delete wins) instead of
        # depending on shuffle block arrival order
        g = group.sort_values(
            [key_col, "_ver"] + payload_cols + ["_del"]
        )
        last = g.drop_duplicates(subset=[key_col], keep="last")
        alive = last[~last["_del"]]
        return _arrow(alive[cols])

    unioned = base_ds.map_batches(
        shape_base, batch_format="pandas"
    ).union(
        changes_ds.map_batches(shape_changes, batch_format="pandas")
    )
    return unioned.groupby("_b").map_groups(
        resolve, batch_format="pandas"
    )


def scd2_history(changes_ds, key_col: str, payload_cols: list[str],
                 op_col: str = "op", ver_col: str = "ver",
                 n_buckets: int = 64):
    """Slowly-changing-dimension (type 2) history from a change
    stream: every upsert becomes a row valid from its version until
    the key's NEXT change (any op; NULL = still current) — the
    audit/history twin of ``apply_changes``' latest-wins snapshot.

    One key-bucketed shuffle; inside a bucket the lead() is a
    vectorized shift over the (key, ver)-sorted frame — group size is
    a hash bucket, never one key's full history in a dedicated
    group.  SQL twin: ``lead(ver) OVER (PARTITION BY key ORDER BY
    ver)`` with non-upserts filtered AFTER the window.
    """
    cols = [key_col] + payload_cols

    def bucketize(batch: pd.DataFrame) -> pa.Table:
        out = batch[cols + [op_col, ver_col]].copy()
        out["_b"] = (
            pd.util.hash_pandas_object(out[key_col], index=False)
            .to_numpy() % np.uint64(n_buckets)
        ).astype(np.int64)
        return _arrow(out)

    def history(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([key_col, ver_col]).reset_index(
            drop=True
        )
        keys = g[key_col].to_numpy()
        vers = g[ver_col].to_numpy(dtype=np.int64)
        nxt = np.empty(len(g), dtype=np.float64)
        nxt[:-1] = vers[1:]
        nxt[-1] = np.nan
        same = np.empty(len(g), dtype=np.bool_)
        same[:-1] = keys[:-1] == keys[1:]
        same[-1] = False
        nxt[~same] = np.nan
        out = g[cols].copy()
        out["valid_from"] = vers
        out["valid_to"] = nxt  # float64 with NaN = still current
        keep = (g[op_col] == OP_UPSERT).to_numpy()
        out = out[keep].reset_index(drop=True)
        out["valid_to"] = out["valid_to"].astype("Int64")
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        changes_ds.map_batches(bucketize, batch_format="pandas")
        .groupby("_b")
        .map_groups(history, batch_format="pandas")
    )
