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


# -- z-order (Morton) layout for multi-dimensional pruning ------------------

def _spread16(v: np.ndarray) -> np.ndarray:
    """Interleave zeros between the low 16 bits of each value
    (vectorized Morton bit-spreading)."""
    v = v.astype(np.uint64) & np.uint64(0xFFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x33333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x55555555)
    return v


def zorder_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """32-bit Morton code of two 16-bit quantized dimensions: nearby
    (a, b) points get nearby codes, so a RANGE of codes covers a 2-D
    box with bounded overshoot."""
    return _spread16(a) | (_spread16(b) << np.uint64(1))


def _quant16(v: np.ndarray, lo: float, hi: float) -> np.ndarray:
    """Monotone map of values in [lo, hi] onto the 16-bit grid.
    Monotonicity is what makes box queries sound: an original-space
    box maps to a quantized-space box that covers every point's
    quantized image (the exact per-batch filter removes overshoot)."""
    span = max(float(hi) - float(lo), 1.0)
    q = np.floor(
        (np.clip(v.astype(np.float64), lo, hi) - lo) / span * 65535.0
    )
    return q.astype(np.uint64)


def write_zordered(ds, dim_a: str, dim_b: str, path: str,
                   cell_bits: int = 10,
                   bounds: tuple[float, float, float, float] | None = None):
    """Materialize ``ds`` hive-partitioned by z-order CELL of
    (dim_a, dim_b) — the multi-dimensional analogue of write_bucketed:
    one partitioned write, then every 2-D box query reads ONLY the
    cells its box intersects (file-level pruning, no row-group-stat
    reliance).  Each dim is normalized to its observed [min, max]
    before Morton coding (persisted in ``_zmeta.json`` under the
    layout so reads quantize identically); ``cell_bits`` = number of
    HIGH z bits that name a cell directory (2^cell_bits dirs max).

    ``bounds`` = (a_lo, a_hi, b_lo, b_hi) skips the bounds pass — at
    design scale pass known domain bounds; otherwise a pruned 2-column
    aggregate computes them (the lazy upstream runs twice: once for
    bounds, once for the write).

    Cites the same pay-once/prune-forever rationale as the IVF index
    (ops/similarity.py) and the bucketed join above.
    """
    import json

    if cell_bits % 2 or not 2 <= cell_bits <= 30:
        # odd cell_bits make non-square cells whose short side falls
        # below the enumeration step in zcells_for_box — cells could
        # be silently skipped
        raise ValueError("cell_bits must be even, in [2, 30]")
    if bounds is None:
        from ray.data.aggregate import Max, Min

        agg = ds.aggregate(Min(dim_a), Max(dim_a), Min(dim_b), Max(dim_b))
        bounds = (
            agg[f"min({dim_a})"], agg[f"max({dim_a})"],
            agg[f"min({dim_b})"], agg[f"max({dim_b})"],
        )
    a_lo, a_hi, b_lo, b_hi = (float(x) for x in bounds)
    shift = np.uint64(32 - cell_bits)

    def add_cell(batch: pd.DataFrame) -> pd.DataFrame:
        z = zorder_key(
            _quant16(batch[dim_a].to_numpy(), a_lo, a_hi),
            _quant16(batch[dim_b].to_numpy(), b_lo, b_hi),
        )
        batch["zcell"] = (z >> shift).astype(np.int64)
        return batch

    ds.map_batches(add_cell, batch_format="pandas").write_parquet(
        path, partition_cols=["zcell"]
    )
    meta = {
        "dim_a": dim_a, "dim_b": dim_b, "cell_bits": cell_bits,
        "a_lo": a_lo, "a_hi": a_hi, "b_lo": b_lo, "b_hi": b_hi,
    }
    tmp = os.path.join(path, "_zmeta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, os.path.join(path, "_zmeta.json"))
    return meta


def zcells_for_box(qa_lo: int, qa_hi: int, qb_lo: int, qb_hi: int,
                   cell_bits: int = 10) -> list[int]:
    """All z cells intersecting the inclusive QUANTIZED box —
    enumerated from the box's own corner codes, never the full cell
    space: walk the (coarse) quantized grid covered by the box and
    collect the cells its points map to.  Cost is O(box area in
    coarse cells), metadata only."""
    shift = np.uint64(32 - cell_bits)
    # coarse step: one cell spans at least 2^(shift/2) in each dim, so
    # stepping by half that visits every intersecting cell
    step = max(1, int(1 << (int(shift) // 2)) // 2)
    avals = np.arange(qa_lo, qa_hi + 1, step, dtype=np.uint64)
    avals = np.unique(np.concatenate([avals, [np.uint64(qa_hi)]]))
    bvals = np.arange(qb_lo, qb_hi + 1, step, dtype=np.uint64)
    bvals = np.unique(np.concatenate([bvals, [np.uint64(qb_hi)]]))
    aa, bb = np.meshgrid(avals, bvals)
    z = zorder_key(aa.ravel(), bb.ravel())
    return sorted(np.unique(z >> shift).astype(int))


def read_zordered_box(path: str,
                      a_lo: float, a_hi: float, b_lo: float, b_hi: float,
                      columns: list[str]):
    """Dataset over ONLY the z cells intersecting the box, with the
    exact box filter applied per batch (cells overshoot the box;
    rows outside it are dropped vectorized).  Dim names, bounds and
    cell_bits come from the layout's own ``_zmeta.json``.  Returns
    (dataset, n_cells_read, n_cells_total)."""
    import glob as _glob
    import json

    import pyarrow.compute as pc
    import ray.data as rd

    with open(os.path.join(path, "_zmeta.json")) as f:
        meta = json.load(f)
    dim_a, dim_b = meta["dim_a"], meta["dim_b"]
    cell_bits = meta["cell_bits"]
    qa = _quant16(np.array([a_lo, a_hi]), meta["a_lo"], meta["a_hi"])
    qb = _quant16(np.array([b_lo, b_hi]), meta["b_lo"], meta["b_hi"])
    cells = set(
        zcells_for_box(int(qa[0]), int(qa[1]), int(qb[0]), int(qb[1]),
                       cell_bits)
    )
    have = {
        int(os.path.basename(d).split("=")[1]): d
        for d in _glob.glob(os.path.join(path, "zcell=*"))
    }
    hit = [have[c] for c in sorted(cells & set(have))]
    files = [
        f for d in hit
        for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))
    ]
    if not files:
        return None, 0, len(have)
    # the exact filter needs both dims — project them in even when
    # the caller didn't request them, and drop them again after
    read_cols = list(dict.fromkeys(list(columns) + [dim_a, dim_b]))
    ds = rd.read_parquet(files, columns=read_cols)

    def exact(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column(dim_a), pa.scalar(a_lo)),
                pc.less_equal(batch.column(dim_a), pa.scalar(a_hi)),
            ),
            pc.and_(
                pc.greater_equal(batch.column(dim_b), pa.scalar(b_lo)),
                pc.less_equal(batch.column(dim_b), pa.scalar(b_hi)),
            ),
        )
        return batch.filter(m).select(list(columns))

    return (
        ds.map_batches(exact, batch_format="pyarrow"),
        len(hit), len(have),
    )


# -- small-file compaction (layout maintenance) ------------------------------

def compact_layout(path: str, target_bytes: int = 128 << 20):
    """Rewrite every hive partition directory's small parquet files
    into ~``target_bytes`` files — the maintenance pass that keeps a
    long-lived 100 TB layout readable after many incremental writes
    (thousands of KB-sized files per partition destroy read
    throughput and scheduler fan-out).

    One Ray task per partition directory; inside, a single pyarrow
    read + row-group-sized write.  Crash-safe commit protocol: pieces
    land ``compact-IIIII-of-NNNNN.parquet`` via tmp+rename, and the
    partition counts as committed only when ALL ``N`` pieces exist
    (the piece count is in every filename) — a resume that finds a
    complete set finishes deleting the originals; an INCOMPLETE set
    (crash mid-pieces) is discarded and the partition recompacts from
    the still-present originals, so no crash point loses or
    double-counts rows.  Returns the manifest (dir, files_before,
    files_after, n_rows, skipped) as a pandas DataFrame.
    """
    import glob as _glob

    import pyarrow.parquet as pq
    import ray.data as rd

    dirs = sorted(
        d for d in _glob.glob(os.path.join(path, "*=*"))
        if os.path.isdir(d)
    )

    def compact_dir(batch: pd.DataFrame) -> pa.Table:
        out = []
        for d in batch["dir"]:
            originals = sorted(
                f for f in _glob.glob(os.path.join(d, "*.parquet"))
                if not os.path.basename(f).startswith("compact-")
            )
            done = sorted(
                _glob.glob(os.path.join(d, "compact-*.parquet"))
            )
            expected = (
                int(os.path.basename(done[0]).split("-of-")[1][:5])
                if done else 0
            )
            if done and len(done) == expected:
                # full piece set present = committed; finish deletion
                for f in originals:
                    os.remove(f)
                tbl_rows = sum(
                    pq.read_metadata(f).num_rows for f in done
                )
                out.append((d, len(originals), len(done), tbl_rows, True))
                continue
            if done:
                # crash mid-pieces: originals are still intact (they
                # only delete after a FULL set) — discard the partial
                # attempt and recompact from scratch
                for f in done:
                    os.remove(f)
            if len(originals) <= 1:
                n = (
                    pq.read_metadata(originals[0]).num_rows
                    if originals else 0
                )
                out.append((d, len(originals), len(originals), n, True))
                continue
            tbl = pa.concat_tables(
                [pq.read_table(f) for f in originals]
            )
            n_out = max(
                1, int(np.ceil(tbl.nbytes / float(target_bytes)))
            )
            rows_per = int(np.ceil(tbl.num_rows / n_out))
            for i in range(n_out):
                piece = tbl.slice(i * rows_per, rows_per)
                final = os.path.join(
                    d, f"compact-{i:05d}-of-{n_out:05d}.parquet"
                )
                tmp = final + ".tmp"
                pq.write_table(piece, tmp)
                os.rename(tmp, final)  # piece commit; set commits at N
            for f in originals:
                os.remove(f)
            out.append((d, len(originals), n_out, tbl.num_rows, False))
        return pa.table(
            {
                "dir": pa.array([r[0] for r in out], pa.string()),
                "files_before": pa.array(
                    [r[1] for r in out], pa.int64()
                ),
                "files_after": pa.array(
                    [r[2] for r in out], pa.int64()
                ),
                "n_rows": pa.array([r[3] for r in out], pa.int64()),
                "skipped": pa.array([r[4] for r in out], pa.bool_()),
            }
        )

    if not dirs:
        return pd.DataFrame(
            columns=[
                "dir", "files_before", "files_after", "n_rows",
                "skipped",
            ]
        )
    return (
        rd.from_items([{"dir": d} for d in dirs])
        .repartition(len(dirs))
        .map_batches(compact_dir, batch_format="pandas")
        .to_pandas()
        .sort_values("dir")
        .reset_index(drop=True)
    )


# -- sorted-run merge (LSM-style ordered ingest) -----------------------------

def merge_sorted_runs(run_paths: list[str], key_col: str,
                      out_path: str, target_bytes: int = 256 << 20):
    """Merge K sorted runs (directories of parquet files, each file a
    contiguous ``key_col`` range — the flagship writer's output shape)
    into ONE sorted run WITHOUT a global re-sort shuffle: incremental
    ingest appends small sorted runs, and this is the LSM-style
    compaction that folds them together.

    Planning is metadata-only: every file's (min, max, bytes) comes
    from parquet FOOTER statistics; output range boundaries are cut
    where cumulative bytes reach ``target_bytes``.  One Ray task per
    output range reads ONLY the overlapping files of each run
    (footer-pruned), filters to the range, sorts locally (pieces are
    range-bounded, so a task holds ~target_bytes, never a run), and
    commits ``merge-NNNNN.parquet`` via tmp+rename — a re-run skips
    committed ranges, same protocol as compact_layout.  Path-sorted
    readers of ``out_path`` see globally ordered rows.

    Returns the manifest (range_id, lo, n_rows, n_files_read,
    skipped).
    """
    import glob as _glob

    import pyarrow.parquet as pq
    import ray.data as rd

    paths = [
        f for rp in run_paths
        for f in sorted(_glob.glob(os.path.join(rp, "*.parquet")))
    ]

    def footer_stats(batch: pd.DataFrame) -> pa.Table:
        """Footer (min, max, bytes) per file — runs as Ray tasks so
        the metadata scan parallelizes over the file count instead of
        looping on the driver (matters at millions of run files)."""
        out = []
        for f in batch["file"]:
            md = pq.read_metadata(f)
            lo = hi = None
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(i).path_in_schema
                    == key_col
                )
                if col.statistics is None:
                    raise ValueError(
                        f"{f}: no footer stats on {key_col}"
                    )
                s = col.statistics
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            out.append((f, int(lo), int(hi), os.path.getsize(f)))
        return pa.table(
            {
                "file": pa.array([r[0] for r in out], pa.string()),
                "lo": pa.array([r[1] for r in out], pa.int64()),
                "hi": pa.array([r[2] for r in out], pa.int64()),
                "bytes": pa.array([r[3] for r in out], pa.int64()),
            }
        )

    files: list[dict] = []
    if paths:
        import ray.data as _rd

        stats_df = (
            _rd.from_items([{"file": f} for f in paths])
            .map_batches(footer_stats, batch_format="pandas")
            .to_pandas()
        )
        files = stats_df.to_dict("records")
    if not files:
        return pd.DataFrame(
            columns=["range_id", "lo", "n_rows", "n_files_read",
                     "skipped"]
        )
    files.sort(key=lambda r: (r["lo"], r["hi"]))
    total = sum(r["bytes"] for r in files)
    n_ranges = max(1, int(np.ceil(total / float(target_bytes))))
    # boundaries at file mins, cut by cumulative bytes
    global_lo = min(r["lo"] for r in files)
    cuts, acc, per = [], 0, total / n_ranges
    for r in files[1:]:
        acc += r["bytes"]
        # a cut equal to global_lo (overlapping runs sharing their
        # min key) would create an empty zero-width first range
        if acc >= per and r["lo"] not in cuts and r["lo"] != global_lo:
            cuts.append(r["lo"])
            acc = 0
    bounds = (
        [global_lo]
        + sorted(set(cuts))
        + [max(r["hi"] for r in files) + 1]
    )
    os.makedirs(out_path, exist_ok=True)

    # plan per-range file hit lists HERE (driver, metadata-only) so a
    # task receives only its own file paths, not the global file list
    ranges = [
        {
            "range_id": i,
            "lo": bounds[i],
            "hi": bounds[i + 1],
            "files": [
                r["file"] for r in files
                if r["lo"] < bounds[i + 1] and r["hi"] >= bounds[i]
            ],
        }
        for i in range(len(bounds) - 1)
    ]

    def merge_range(batch: pd.DataFrame) -> pa.Table:
        import pyarrow.compute as pc

        out = []
        for _, row in batch.iterrows():
            i, lo, hi = (
                int(row["range_id"]), int(row["lo"]), int(row["hi"])
            )
            final = os.path.join(out_path, f"merge-{i:05d}.parquet")
            if os.path.exists(final):
                out.append(
                    (i, lo, pq.read_metadata(final).num_rows, 0, True)
                )
                continue
            hit = list(row["files"])
            if not hit:
                # defensive: a range no file overlaps (can't happen
                # with the planner above, but a crash must not follow)
                out.append((i, lo, 0, 0, False))
                continue
            pieces = []
            for f in hit:
                t = pq.read_table(f)
                k = t.column(key_col)
                m = pc.and_(
                    pc.greater_equal(k, pa.scalar(lo)),
                    pc.less(k, pa.scalar(hi)),
                )
                pieces.append(t.filter(m))
            tbl = pa.concat_tables(pieces)
            order = pc.sort_indices(tbl.column(key_col))
            tbl = tbl.take(order)
            tmp = final + ".tmp"
            pq.write_table(tbl, tmp)
            os.rename(tmp, final)  # commit point
            out.append((i, lo, tbl.num_rows, len(hit), False))
        return pa.table(
            {
                "range_id": pa.array(
                    [r[0] for r in out], pa.int64()
                ),
                "lo": pa.array([r[1] for r in out], pa.int64()),
                "n_rows": pa.array([r[2] for r in out], pa.int64()),
                "n_files_read": pa.array(
                    [r[3] for r in out], pa.int64()
                ),
                "skipped": pa.array([r[4] for r in out], pa.bool_()),
            }
        )

    return (
        rd.from_items(ranges)
        .repartition(len(ranges))
        .map_batches(merge_range, batch_format="pandas")
        .to_pandas()
        .sort_values("range_id")
        .reset_index(drop=True)
    )


# -- versioned snapshots (time travel) ---------------------------------------

def _manifest_dir(path: str) -> str:
    return os.path.join(path, "_manifests")


def _versions(path: str) -> list[int]:
    import glob as _glob

    return sorted(
        int(os.path.basename(m)[1:-5])
        for m in _glob.glob(os.path.join(_manifest_dir(path), "v*.json"))
    )


def versioned_write(ds, path: str, mode: str = "append") -> int:
    """Snapshot-versioned table write (single-writer): data files land
    under ``path/data/`` with a per-version prefix, then one manifest
    JSON (the full live-file list for that version) commits via
    tmp+rename — readers never see a half-written version, and every
    older version stays readable until ``vacuum``.  ``mode='append'``
    carries the previous manifest's files forward; ``'overwrite'``
    starts the list fresh (files stay on disk for time travel).
    Returns the new version number."""
    import glob as _glob
    import json

    os.makedirs(_manifest_dir(path), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    vs = _versions(path)
    v = (vs[-1] + 1) if vs else 1

    stage = os.path.join(path, f"_stage_v{v}")
    # a crashed attempt at this same version may have left files in
    # the stage; reusing them would commit duplicate rows
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    for f in _glob.glob(os.path.join(path, "data", f"v{v}-*.parquet")):
        os.remove(f)  # crashed attempt's partially renamed files
    ds.write_parquet(stage)
    files = []
    for i, f in enumerate(sorted(_glob.glob(os.path.join(stage, "*")))):
        dst = os.path.join(path, "data", f"v{v}-{i:05d}.parquet")
        os.rename(f, dst)
        files.append(os.path.relpath(dst, path))
    os.rmdir(stage)

    if mode == "append" and vs:
        with open(
            os.path.join(_manifest_dir(path), f"v{vs[-1]}.json")
        ) as fh:
            files = json.load(fh)["files"] + files
    tmp = os.path.join(_manifest_dir(path), f"v{v}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": v, "files": files}, fh)
    os.rename(tmp, os.path.join(_manifest_dir(path), f"v{v}.json"))
    return v


def versioned_read(path: str, version: int | None = None,
                   columns: list[str] | None = None):
    """Dataset over exactly the files a manifest pins (latest version
    when ``version`` is None) — time travel is just reading an older
    manifest."""
    import json

    import ray.data as rd

    v = version if version is not None else _versions(path)[-1]
    with open(os.path.join(_manifest_dir(path), f"v{v}.json")) as fh:
        files = json.load(fh)["files"]
    return rd.read_parquet(
        [os.path.join(path, f) for f in files], columns=columns
    )


def vacuum_versions(path: str, keep: int = 2) -> dict:
    """Delete data files referenced ONLY by manifests older than the
    newest ``keep`` versions (and those manifests) — the GC that
    bounds time-travel storage.  Metadata-only planning."""
    import glob as _glob
    import json

    vs = _versions(path)
    kept, dropped = vs[-keep:], vs[:-keep]
    live = set()
    for v in kept:
        with open(
            os.path.join(_manifest_dir(path), f"v{v}.json")
        ) as fh:
            live.update(json.load(fh)["files"])
    removed = 0
    for f in _glob.glob(os.path.join(path, "data", "*.parquet")):
        if os.path.relpath(f, path) not in live:
            os.remove(f)
            removed += 1
    for v in dropped:
        os.remove(os.path.join(_manifest_dir(path), f"v{v}.json"))
    return {
        "kept_versions": kept, "dropped_versions": dropped,
        "files_removed": removed,
    }
