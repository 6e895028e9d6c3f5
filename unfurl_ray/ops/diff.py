"""Snapshot diffing: what changed between two corpus versions.

Re-crawls and incremental ingests need "added / removed / changed"
deltas to avoid reprocessing 100 TB for a 0.1 % change.  The diff is
content-based (a fingerprint column, e.g. md5 of the normalized text),
so moved bytes with equal content do not count as changes.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def dataset_diff(old_ds, new_ds, id_col: str, fp_col: str,
                 num_partitions: int = 8):
    """Full-outer join of (id, fingerprint) projections, classified:
    ``added`` (id only in new), ``removed`` (id only in old),
    ``changed`` (both, different fingerprint).  Unchanged rows are
    dropped INSIDE the classify map, so the output is delta-sized.

    Scale shape: both sides are narrow 2-column projections before the
    join shuffle — the payload never moves; size ``num_partitions`` by
    bytes of the projections.
    """
    def proj(name_id: str, name_fp: str):
        def run(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    name_id: batch.column(id_col).cast(pa.int64()),
                    name_fp: batch.column(fp_col),
                }
            )
        return run

    old_p = old_ds.map_batches(proj(id_col, "_ofp"),
                               batch_format="pyarrow")
    new_p = new_ds.map_batches(proj("_rid", "_nfp"),
                               batch_format="pyarrow")
    joined = old_p.join(
        new_p, join_type="full_outer", num_partitions=num_partitions,
        on=(id_col,), right_on=("_rid",),
    )

    def classify(batch: pd.DataFrame) -> pa.Table:
        # Ray's outer join coalesces the key into the LEFT column name
        ids = batch[id_col].astype("Int64")
        ofp, nfp = batch["_ofp"], batch["_nfp"]
        added = ofp.isna()
        removed = nfp.isna()
        changed = ~added & ~removed & (ofp != nfp)
        status = pd.Series("unchanged", index=batch.index)
        status[added] = "added"
        status[removed] = "removed"
        status[changed] = "changed"
        keep = added | removed | changed
        return pa.table(
            {
                id_col: pa.array(
                    ids[keep].astype("int64").to_numpy(), pa.int64()
                ),
                "status": pa.array(status[keep].to_numpy(), pa.string()),
            }
        )

    return joined.map_batches(classify, batch_format="pandas")
