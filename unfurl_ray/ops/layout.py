"""Bucketed on-disk layout: pick ONE partitioning key and reuse it.

The single most effective shuffle-elimination at 100 TB is to
materialize a table ONCE hive-partitioned by a hash bucket of its join
key; every later join / dedup / groupby on that key then runs
bucket-local — one task per bucket reading only its own directories on
each side, no all-to-all exchange ever again.  (Same principle as the
IVF index in ops/similarity.py: pay one partitioned write, prune all
later I/O.)

The bucket function is the multiplicative hash pack_shards uses
(Knuth's 2654435761 on int64 keys) — both sides of a join MUST be
written with the same ``n_buckets`` and key dtype for co-location.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def bucket_of(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        return (
            ids.astype(np.uint64) * np.uint64(2654435761)
        ) % np.uint64(n_buckets)


def write_bucketed(ds, key_col: str, path: str, n_buckets: int = 32):
    """Materialize ``ds`` under ``path`` hive-partitioned by
    ``bucket = hash(key) % n_buckets``.  One shuffle-equivalent write;
    afterwards every key-equal operation is bucket-local.  Size
    ``n_buckets`` so one bucket of the LARGER table fits a worker.
    """
    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["bucket"] = bucket_of(
            batch[key_col].to_numpy(), n_buckets
        ).astype(np.int64)
        return out

    ds.map_batches(add_bucket, batch_format="pandas").write_parquet(
        path, partition_cols=["bucket"]
    )
    return path


def _read_bucket(path: str, bucket: int) -> pa.Table | None:
    """Read one bucket directory (hive layout) as a pyarrow Table."""
    import pyarrow.dataset as pds

    d = os.path.join(path, f"bucket={bucket}")
    if not os.path.isdir(d):
        return None
    return pds.dataset(d, format="parquet").to_table()


def bucketed_join(path_a: str, path_b: str, key_col: str,
                  n_buckets: int, how: str = "inner",
                  suffix: str = "_r"):
    """Co-located join over two layouts written with ``write_bucketed``
    on the same key + bucket count: ONE task per bucket reads only its
    own directory on each side and joins locally — no shuffle, no
    broadcast, each task's memory bounded by its bucket.  Returns a
    ``ray.data.Dataset`` of the joined rows.
    """
    import pyarrow.dataset as pds
    import ray.data as rd

    def joined_schema() -> pa.Schema:
        """Expected join schema (mirrors pandas merge suffix rules) so
        empty buckets still emit TYPED Arrow — a schemaless empty
        pandas block breaks downstream unions."""
        sa = pds.dataset(path_a, format="parquet",
                         partitioning="hive").schema
        sb = pds.dataset(path_b, format="parquet",
                         partitioning="hive").schema
        fields = [f for f in sa if f.name != "bucket"]
        a_names = {f.name for f in fields}
        for f in sb:
            if f.name in ("bucket", key_col):
                continue
            name = f.name + suffix if f.name in a_names else f.name
            fields.append(pa.field(name, f.type))
        return pa.schema(fields)

    empty = pa.table(
        {f.name: pa.array([], f.type) for f in joined_schema()}
    )

    def join_bucket(batch: pd.DataFrame) -> pa.Table:
        out = []
        for b in batch["bucket"]:
            ta = _read_bucket(path_a, int(b))
            if ta is None:
                continue
            tb = _read_bucket(path_b, int(b))
            da = ta.to_pandas().drop(columns=["bucket"], errors="ignore")
            if tb is None:
                # a left join must keep left rows even when the right
                # side wrote no bucket directory at all
                if how != "left":
                    continue
                db = pd.DataFrame(
                    {
                        f.name: pd.Series(dtype=f.type.to_pandas_dtype())
                        for f in empty.schema
                        if f.name == key_col or f.name not in da.columns
                    }
                )
            else:
                db = tb.to_pandas().drop(
                    columns=["bucket"], errors="ignore"
                )
            out.append(
                da.merge(db, on=key_col, how=how, suffixes=("", suffix))
            )
        if not out:
            return empty
        merged = pd.concat(out, ignore_index=True)
        # enforce the derived schema: left-join NA fills upcast int
        # columns to float64 in pandas; from_pandas with an explicit
        # schema maps NaN back to typed nulls so blocks stay uniform
        return pa.Table.from_pandas(
            merged[empty.column_names], schema=empty.schema,
            preserve_index=False,
        ).replace_schema_metadata(None)

    buckets = rd.from_pandas(
        pd.DataFrame({"bucket": np.arange(n_buckets, dtype=np.int64)})
    ).repartition(n_buckets)
    return buckets.map_batches(join_bucket, batch_format="pandas")


def write_jsonl_shards(ds, out_dir: str, id_col: str = "doc_id",
                       n_buckets: int = 8):
    """JSONL egress: write the dataset as ``out_dir/part-BBBBB.jsonl``
    (one file per hash bucket of ``id_col``, rows sorted by id inside)
    and return the manifest (bucket, n_rows, n_bytes, skipped) —
    the hand-off format external tokenizers / labeling tools expect.

    Deterministic + resumable like write_packed_shards: bucket
    membership is a pure function of the id, files land tmp+rename,
    and a re-run SKIPS buckets whose file already exists.  The groupby
    is the one payload co-locating shuffle an export needs; the JSON
    encoding is pandas' C serializer, not a Python loop.
    """
    os.makedirs(out_dir, exist_ok=True)

    def add_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["_bucket"] = bucket_of(
            batch[id_col].to_numpy(), n_buckets
        ).astype(np.int64)
        return out

    def write_one(group: pd.DataFrame) -> pa.Table:
        b = int(group["_bucket"].iloc[0])
        g = (
            group.drop(columns=["_bucket"])
            .sort_values(id_col)
            .reset_index(drop=True)
        )
        path = os.path.join(out_dir, f"part-{b:05d}.jsonl")
        skipped = os.path.exists(path)
        if not skipped:
            tmp = path + ".tmp"
            g.to_json(tmp, orient="records", lines=True,
                      force_ascii=False)
            os.rename(tmp, path)
        return pa.table(
            {
                "bucket": pa.array([b], pa.int64()),
                "n_rows": pa.array([len(g)], pa.int64()),
                "n_bytes": pa.array(
                    [os.stat(path).st_size], pa.int64()
                ),
                "skipped": pa.array([skipped], pa.bool_()),
            }
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(write_one, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
