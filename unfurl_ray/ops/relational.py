"""Relational building blocks, Ray-Data-first.

Patterns per ray_guide "Joins and lookups" / "Aggregation at scale":

- broadcast hash join (small side via ``ray.put``, probe in map_batches)
- semi / anti join via broadcast key set
- partial pre-aggregation before the groupby shuffle
- event-time tumbling windows + gap sessionization via
  ``groupby(key).map_groups`` over ts-sorted groups
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class BroadcastJoin:
    """map_batches UDF: merge a broadcast pandas DataFrame onto batches.

    The small side is shipped to the object store ONCE (``ray.put`` on
    the driver); each actor fetches it in ``__init__`` — never per
    batch (SURVEY.md §2.5 J1 mapping).
    """

    def __init__(self, small_ref: Any, on: str, how: str = "inner",
                 suffix: str = "_r"):
        import ray

        self.small = (
            ray.get(small_ref)
            if isinstance(small_ref, ray.ObjectRef)
            else small_ref
        )
        self.on = on
        self.how = how
        self.suffix = suffix

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(
            self.small, on=self.on, how=self.how, suffixes=("", self.suffix)
        )


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "inner",
                   concurrency: int = 4):
    import ray

    ref = ray.put(small_df)
    return ds.map_batches(
        BroadcastJoin,
        fn_constructor_kwargs={"small_ref": ref, "on": on, "how": how},
        batch_format="pandas",
        concurrency=(1, concurrency),
    )


class KeyFilter:
    """Semi/anti join: broadcast key set, vectorized isin per batch."""

    def __init__(self, keys_ref: Any, on: str, anti: bool = False):
        import ray

        keys = (
            ray.get(keys_ref)
            if isinstance(keys_ref, ray.ObjectRef)
            else keys_ref
        )
        self.keys = set(keys)
        self.on = on
        self.anti = anti

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mask = batch[self.on].isin(self.keys)
        return batch[~mask] if self.anti else batch[mask]


def semi_join(ds, keys, on: str, anti: bool = False, concurrency: int = 4):
    import ray

    ref = ray.put(list(keys))
    return ds.map_batches(
        KeyFilter,
        fn_constructor_kwargs={"keys_ref": ref, "on": on, "anti": anti},
        batch_format="pandas",
        concurrency=(1, concurrency),
    )


def pre_aggregate(ds, keys: list[str], aggs: dict[str, tuple[str, str]]):
    """Partial-aggregate inside map_batches, then a small groupby.

    ``aggs``: out_col -> (in_col, fn) with fn in {sum, count, min, max}.
    The shuffle then moves one row per key per batch instead of every
    input row — the difference between shuffling 100 TB and ~GBs.
    Means must be finished downstream as sum/count.
    """
    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby(keys, as_index=False, sort=False)
        pieces = {}
        for out_col, (in_col, fn) in aggs.items():
            if fn == "count":
                pieces[out_col] = g.size().rename(columns={"size": out_col})
            else:
                pieces[out_col] = getattr(g[in_col], fn)().rename(
                    columns={in_col: out_col}
                )
        merged = None
        for piece in pieces.values():
            merged = piece if merged is None else merged.merge(piece, on=keys)
        # Arrow into the shuffle: pandas blocks pay a Python per-row
        # sort cost inside Ray's aggregate (measured ~1.6 ms/row on
        # multi-key blocks); partials are usually tiny, but windowed
        # keys can make them large
        return pa.Table.from_pandas(
            merged, preserve_index=False
        ).replace_schema_metadata(None)

    from ray.data.aggregate import Max, Min, Sum

    partials = ds.map_batches(partial, batch_format="pandas")
    finishers = []
    for out_col, (_in, fn) in aggs.items():
        if fn in ("sum", "count"):
            finishers.append(Sum(out_col, alias_name=out_col))
        elif fn == "min":
            finishers.append(Min(out_col, alias_name=out_col))
        elif fn == "max":
            finishers.append(Max(out_col, alias_name=out_col))
    return partials.groupby(keys).aggregate(*finishers)



def _arrow(df: pd.DataFrame) -> pa.Table:
    """Typed Arrow block (pandas metadata stripped): blocks that feed a
    groupby/union must be Arrow — pandas blocks pay a per-row Python
    sort cost in the shuffle and can't unify empty schemas."""
    return pa.Table.from_pandas(
        df, preserve_index=False
    ).replace_schema_metadata(None)


def _ts_us(series: pd.Series) -> pd.Series:
    """Timestamp series of any datetime64 unit -> int64 microseconds."""
    dtype = str(series.dtype)
    vals = series.astype("int64")
    if "[ns" in dtype:
        return vals // 1_000
    if "[ms" in dtype:
        return vals * 1_000
    if "[s]" in dtype:
        return vals * 1_000_000
    return vals  # [us] or already-numeric microseconds


def tumbling_window(ds, ts_col: str, key_col: str, width_s: int,
                    value_col: str | None = None):
    """Per (key, window) count/avg via vectorized bucketing + pre-agg."""
    def bucket(batch: pd.DataFrame) -> pd.DataFrame:
        win = (_ts_us(batch[ts_col]) // (width_s * 1_000_000)) * width_s
        out = batch.copy()
        out["window_start"] = pd.to_datetime(win, unit="s")
        return out

    bucketed = ds.map_batches(bucket, batch_format="pandas")
    aggs = {"n_events": (key_col, "count")}
    if value_col:
        aggs["sum_value"] = (value_col, "sum")
    return pre_aggregate(bucketed, [key_col, "window_start"], aggs)


def sessionize(ds, ts_col: str, key_col: str, gap_s: int):
    """Gap-based sessions per key, skew-safe in two phases.

    Phase 1 (``map_batches``): each batch collapses its own events into
    per-key session FRAGMENTS (key, n_events, start, end) — a fragment
    is a maximal gap-connected run within the batch.  Phase 2
    (``groupby(key).map_groups``): fragments interval-merge (a fragment
    joins the running session when its start is within ``gap_s`` of the
    session's max end), which yields exactly the event-level sessions:
    fragment intervals cover their events and internal gaps are all
    <= gap, so two fragments chain iff some pair of their events does.

    The shuffle therefore carries session STUBS, never events — a key
    holding many blocks' worth of events (a bot user, a hot tenant)
    contributes one stub per (batch, session-run), not one row per
    event, so no group scales with a key's event count.
    """
    gap_us = gap_s * 1_000_000

    def fragments(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values([key_col, ts_col])
        ts = _ts_us(g[ts_col]).to_numpy()
        keys = g[key_col].to_numpy()
        n = len(g)
        new = np.ones(n, dtype=bool)
        if n > 1:
            new[1:] = ~(
                (keys[1:] == keys[:-1]) & ((ts[1:] - ts[:-1]) <= gap_us)
            )
        agg = g.assign(_fid=np.cumsum(new)).groupby("_fid", sort=True)
        return _arrow(pd.DataFrame(
            {
                key_col: agg[key_col].first().to_numpy(),
                "n_events": agg.size().to_numpy().astype("int64"),
                "session_start": agg[ts_col].min().to_numpy(),
                "session_end": agg[ts_col].max().to_numpy(),
            }
        ))

    def merge_fragments(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["session_start", "session_end"])
        start = _ts_us(g["session_start"]).to_numpy()
        end = _ts_us(g["session_end"]).to_numpy()
        n = len(g)
        sid = np.zeros(n, dtype=np.int64)
        run_end = end[0]
        cur = 0
        for i in range(1, n):  # O(fragments), not O(events)
            if start[i] - run_end <= gap_us:
                run_end = max(run_end, end[i])
            else:
                cur += 1
                run_end = end[i]
            sid[i] = cur
        agg = g.assign(_sid=sid).groupby("_sid", sort=True)
        return pd.DataFrame(
            {
                key_col: g[key_col].iloc[0],
                "session_idx": np.arange(agg.ngroups, dtype="int64"),
                "n_events": agg["n_events"].sum().to_numpy()
                .astype("int64"),
                "session_start": agg["session_start"].min().to_numpy(),
                "session_end": agg["session_end"].max().to_numpy(),
            }
        )

    frags = ds.map_batches(fragments, batch_format="pandas")
    return frags.groupby(key_col).map_groups(
        merge_fragments, batch_format="pandas"
    )


def merge_intervals(ds, key_col: str, start_col: str, end_col: str):
    """Per-key INTERVAL UNION (gaps-and-islands): overlapping or
    touching ``[start, end]`` intervals merge into islands; returns
    one row per key with ``n_islands`` and ``covered_us`` (total
    length of the union).  The question behind "total listened time",
    "machine uptime", "effective on-call coverage".

    Skew-safe like ``sessionize``: interval union is associative, so
    phase 1 merges each batch's intervals into per-key island
    FRAGMENTS (vectorized: grouped cummax of the running end, island
    breaks where ``start > previous running max``), and phase 2
    re-merges only the fragment stubs per key — a key with 10^9
    intervals ships islands-per-batch rows, never intervals.  Both
    columns are int64 microseconds (callers convert timestamps
    first); merge condition is ``start <= running_end`` — touching
    intervals coalesce, matching the SQL windowed twin's
    ``s > pmax`` island break."""

    def fragments(batch: pd.DataFrame) -> pa.Table:
        g = batch.sort_values([key_col, start_col, end_col])
        s = g[start_col].to_numpy(dtype=np.int64)
        e = g[end_col].to_numpy(dtype=np.int64)
        kid = (
            g[key_col] != g[key_col].shift()
        ).cumsum()  # contiguous key run ids, C-level
        pmax = (
            pd.Series(e).groupby(kid.to_numpy()).cummax()
            .groupby(kid.to_numpy()).shift(1)
        )
        new = pmax.isna().to_numpy() | (s > pmax.to_numpy())
        gid = np.cumsum(new)  # keys partition islands globally
        agg = g.assign(_g=gid, _s=s, _e=e).groupby("_g", sort=True)
        return pa.table(
            {
                key_col: pa.array(
                    agg[key_col].first().to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
                "_is": pa.array(
                    agg["_s"].min().to_numpy(), pa.int64()
                ),
                "_ie": pa.array(
                    agg["_e"].max().to_numpy(), pa.int64()
                ),
            }
        )

    def merge_fragments(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["_is", "_ie"])
        s = g["_is"].to_numpy()
        e = g["_ie"].to_numpy()
        covered = np.int64(0)
        n_islands = 0
        run_end = None
        for i in range(len(g)):  # O(fragments), not O(intervals)
            if run_end is not None and s[i] <= run_end:
                run_end = max(run_end, e[i])
            else:
                if run_end is not None:
                    covered += run_end - run_start
                n_islands += 1
                run_start, run_end = s[i], e[i]
        covered += run_end - run_start
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_islands": np.array([n_islands], dtype=np.int64),
                "covered_us": np.array([covered], dtype=np.int64),
            }
        )

    frags = ds.map_batches(fragments, batch_format="pandas")
    return frags.groupby(key_col).map_groups(
        merge_fragments, batch_format="pandas"
    )


def asof_join_partitioned(left_ds, right_ds, key_col: str, left_ts: str,
                          right_ts: str, bucket_s: int,
                          left_keep: list[str], right_keep: list[str],
                          dtypes: dict[str, str] | None = None,
                          n_merge_buckets: int | None = None):
    """Backward as-of join that range-partitions BOTH sides by
    (key, time bucket) — the scale path when the right side is too
    large to broadcast (the broadcast variant re-ships the whole right
    table; see pipelines.q_asof_join).

    Shape (no driver-side data, no broadcast of either side):

    1. bucket both sides by ``floor(ts / bucket_s)``;
    2. RIGHT MAXIMA: the latest right row per (key, bucket) PER BATCH
       (map_batches only — no shuffle; the per-key carry merge below
       tolerates one partial-max row per batch per bucket);
    3. CARRIES: per key, forward-fill the maxima across the LEFT's
       buckets so every left bucket gets the latest right row from any
       EARLIER bucket (one carry row per populated left bucket; the
       per-key group holds at most one row per (bucket, batch),
       bounded by block count × time_range / bucket_s, never by
       event count);
    4. union left rows, in-bucket right rows and carries, groupby
       (key, bucket), ``pd.merge_asof`` within each group.

    Only TWO shuffles total (the carry groupby over tiny summary rows
    and the final (key, bucket) co-partition); steps 2–3 deliberately
    skip exact global dedupes whose only effect would be shrinking the
    already-tiny carry summaries.

    Duplicate right rows per (key, ts) are allowed and resolved
    deterministically: the row whose ``right_keep`` tuple sorts LAST
    wins (so a caller wanting max-payload semantics only needs a cheap
    per-batch partial dedupe, not a global shuffle; a pre-deduped
    right side — the broadcast path's contract — behaves identically).
    Output: ``left_keep`` columns + ``right_keep`` columns (NA when no
    right row precedes).

    ``dtypes`` maps any ``left_keep``/``right_keep`` column to the
    pandas NULLABLE dtype used when the other side's rows fill it with
    NA (default ``Int64``) — every block in the union must convert to
    the same Arrow type or the shuffle can't unify schemas.
    """
    bucket_us = bucket_s * 1_000_000
    dtypes = dict(dtypes or {})

    def _na(n: int, col: str) -> pd.array:
        return pd.array([pd.NA] * n, dtype=dtypes.get(col, "Int64"))

    # every block in the unions must carry payload columns in the SAME
    # (nullable) dtype, or the streaming executor logs a schema-change
    # warning per block and Arrow unification does per-block casts
    def _norm(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
        for c in cols:
            df[c] = df[c].astype(dtypes.get(c, "Int64"))
        return df

    # internal int64-microsecond right timestamp so stubs/carries never
    # need to reproduce the caller's datetime dtype
    def bucket_right(batch: pd.DataFrame) -> pd.DataFrame:
        rts = _ts_us(batch[right_ts]).to_numpy()
        out = _norm(batch[[key_col] + right_keep].copy(), right_keep)
        out["_rts"] = rts
        out["_bucket"] = rts // bucket_us
        return out

    def partial_maxima(batch: pd.DataFrame) -> pd.DataFrame:
        b = bucket_right(batch)
        idx = b.groupby([key_col, "_bucket"])["_rts"].idxmax()
        return b.loc[idx]

    # per-BATCH maxima only: cross-batch duplicates per (key, bucket)
    # are resolved inside carries_per_key (sort + searchsorted picks
    # the max-_rts row of the latest earlier bucket), so no shuffle is
    # needed here
    maxima = right_ds.map_batches(partial_maxima, batch_format="pandas")

    mx_cols = [key_col] + right_keep + ["_rts", "_bucket"]

    # per-batch-distinct (key, bucket) pairs present on the left;
    # cross-batch duplicates are fine — carries_per_key unique()s them
    def left_buckets(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                key_col: batch[key_col],
                "_bucket": (
                    _ts_us(batch[left_ts]).to_numpy() // bucket_us
                ),
            }
        ).drop_duplicates()
        return out

    stub_keys = left_ds.map_batches(left_buckets, batch_format="pandas")

    def shape_stub(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key_col, "_bucket"]].copy()
        for c in right_keep:
            out[c] = _na(len(out), c)
        out["_rts"] = np.int64(-1)  # never surfaces (stub rows only
        # contribute their bucket id in carries_per_key)
        out["_is_stub"] = True
        return _arrow(out[mx_cols + ["_is_stub"]])

    def shape_maxima(batch: pd.DataFrame) -> pa.Table:
        out = batch[mx_cols].copy()
        out["_is_stub"] = False
        return _arrow(out)

    def carries_per_key(group: pd.DataFrame) -> pd.DataFrame:
        # sort by (_bucket, _rts): with per-batch partial maxima a
        # bucket may appear once per source batch, and the row just
        # before a strictly-later bucket is then the max-_rts row of
        # the latest earlier bucket — exactly the carry we want
        mx = (
            group[~group["_is_stub"]]
            .sort_values(["_bucket", "_rts"] + right_keep)
            .reset_index(drop=True)
        )
        sb = group.loc[group["_is_stub"], "_bucket"].unique()
        if mx.empty or len(sb) == 0:
            return _arrow(mx.iloc[0:0].drop(columns=["_is_stub"]))
        # latest maxima row from any STRICTLY earlier bucket
        pos = np.searchsorted(mx["_bucket"].to_numpy(), sb, "left") - 1
        keep = pos >= 0
        out = mx.iloc[pos[keep]].copy()
        out["_bucket"] = sb[keep]
        return _arrow(out.drop(columns=["_is_stub"]))

    carries = (
        maxima.map_batches(shape_maxima, batch_format="pandas")
        .union(stub_keys.map_batches(shape_stub, batch_format="pandas"))
        .groupby(key_col)
        .map_groups(carries_per_key, batch_format="pandas")
    )

    # one union'd table: left rows + in-bucket right rows + carries,
    # co-partitioned by (key, bucket)
    all_cols = ([key_col, "_bucket", "_side", "_ts"]
                + left_keep + right_keep)

    def shape_left(batch: pd.DataFrame) -> pd.DataFrame:
        lts = _ts_us(batch[left_ts]).to_numpy()
        out = _norm(batch[[key_col] + left_keep].copy(), left_keep)
        out["_bucket"] = lts // bucket_us
        out["_side"] = np.int32(0)
        out["_ts"] = lts
        for c in right_keep:
            out[c] = _na(len(out), c)
        return _arrow(out[all_cols])

    def shape_right(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key_col, "_bucket"] + right_keep].copy()
        out["_side"] = np.int32(1)
        out["_ts"] = batch["_rts"].to_numpy()
        for c in left_keep:
            out[c] = _na(len(out), c)
        return _arrow(out[all_cols])

    unioned = (
        left_ds.map_batches(shape_left, batch_format="pandas")
        .union(
            right_ds.map_batches(bucket_right, batch_format="pandas")
            .union(carries)
            .map_batches(shape_right, batch_format="pandas")
        )
    )

    out_cols = left_keep + right_keep

    def _cast_out(df: pd.DataFrame) -> pd.DataFrame:
        for c in out_cols:
            df[c] = df[c].astype(dtypes.get(c, "Int64"))
        return df[out_cols]

    # shuffle granularity is DECOUPLED from the (key, bucket) merge
    # semantics (the map_groups-dispatch rule, see ops/dedup.py): one
    # Python group per (key, bucket) cell cost 22 s at 1.5k keys x 15
    # buckets; instead hash cells onto ~TARGET-row shuffle buckets and
    # let merge_asof(by=[key, bucket]) separate cells VECTORIZED inside
    if n_merge_buckets is None:
        n_merge_buckets = 256  # callers with cheap counts should size
        # this to ~20k union rows per bucket (floor 16)

    def add_sb(batch: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(
            batch[[key_col, "_bucket"]], index=False
        ).to_numpy()
        batch["_sb"] = (h % np.uint64(n_merge_buckets)).astype(np.int64)
        return _arrow(batch)

    def merge_bucket(group: pd.DataFrame) -> pd.DataFrame:
        by = [key_col, "_bucket"]
        lefts = (
            group[group["_side"] == 0]
            .sort_values("_ts")[["_ts"] + by + left_keep]
        )
        if lefts.empty:
            out = lefts.copy()
            for c in right_keep:
                out[c] = _na(0, c)
            return _cast_out(out)
        # merge_asof takes the LAST row among equal _ts per by-cell, so
        # the stable (_ts, payload) sort makes the greatest right_keep
        # tuple win — the documented duplicate-resolution rule
        rights = (
            group[group["_side"] == 1]
            .sort_values(["_ts"] + right_keep)[["_ts"] + by + right_keep]
        )
        if rights.empty:
            out = lefts.copy()
            for c in right_keep:
                out[c] = _na(len(out), c)
            return _cast_out(out)
        merged = pd.merge_asof(
            lefts, rights, on="_ts", by=by, direction="backward"
        )
        return _cast_out(merged)

    return (
        unioned.map_batches(add_sb, batch_format="pandas")
        .groupby("_sb")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def hopping_window(ds, ts_col: str, key_col: str, width_s: int,
                   step_s: int, value_col: str | None = None):
    """Overlapping (hopping) windows: each event lands in
    ``width_s / step_s`` windows; assignment is a vectorized batch
    flat-map (replicate rows per window), then the same partial
    pre-aggregation as the tumbling path — events:windows fan-out
    happens inside the batch, only pre-aggregated (key, window) rows
    hit the shuffle.
    """
    if width_s % step_s:
        raise ValueError("width_s must be a multiple of step_s")
    k = width_s // step_s

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        us = _ts_us(batch[ts_col]).to_numpy()
        step_us = step_s * 1_000_000
        last_start = (us // step_us) * step_s  # seconds
        reps = pd.concat([batch] * k, ignore_index=True)
        starts = np.concatenate(
            [last_start - i * step_s for i in range(k)]
        )
        reps["window_start"] = pd.to_datetime(starts, unit="s")
        return reps[starts >= 0]

    assigned = ds.map_batches(assign, batch_format="pandas")
    aggs = {"n_events": (key_col, "count")}
    if value_col:
        aggs["sum_value"] = (value_col, "sum")
    return pre_aggregate(assigned, [key_col, "window_start"], aggs)


def topk_per_group(ds, key_col: str, order_col: str, k: int,
                   tiebreak_col: str | None = None):
    """Top-k rows per key: per-batch partial top-k (only k rows per key
    per batch survive) then a global per-key top-k on the small
    remainder — no full shuffle of the input."""
    sort_cols = [order_col] + ([tiebreak_col] if tiebreak_col else [])
    ascending = [False] + ([True] if tiebreak_col else [])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            batch.sort_values(sort_cols, ascending=ascending)
            .groupby(key_col, as_index=False)
            .head(k)
        )

    pruned = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return (
        pruned.sort_values([key_col] + sort_cols,
                           ascending=[True] + ascending)
        .groupby(key_col, as_index=False)
        .head(k)
        .reset_index(drop=True)
    )


def group_quantile_disc(ds, key_col: str, value_col: str, q: float):
    """Exact discrete quantile per key (the element at
    ``ceil(q * n) - 1`` of the sorted values — DuckDB
    ``quantile_disc`` semantics, probed across sizes; the
    floor(q*(n-1)) rule coincides ONLY at q=0.5), via
    groupby().map_groups.

    Partitioning assumption: one key's values fit in one group;
    pre-bucket (e.g. by value range) for pathological keys.
    """
    def quant(group: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(group[value_col].to_numpy())
        idx = max(int(np.ceil(q * len(vals))) - 1, 0)
        return pd.DataFrame(
            {key_col: [group[key_col].iloc[0]],
             "quantile_value": [vals[idx]],
             "n": [len(vals)]}
        )

    return ds.groupby(key_col).map_groups(quant, batch_format="pandas")


def pack_shards(ds, weight_col: str, budget: int,
                id_col: str = "doc_id", n_buckets: int = 8):
    """Assign rows to training-output shards by cumulative weight
    (token budget) — the "pack documents into ~N-token files" step of
    a training-data pipeline, deterministic across runs and cluster
    sizes.

    Rows hash-bucket by id (buckets are independent packing streams —
    size ``n_buckets`` to the corpus so one bucket's ROWS fit a
    worker; the shuffle carries only (id, bucket, weight), never the
    payload).  Within a bucket, rows pack in id order; a row starting
    at cumulative offset c lands in shard c // budget, so every shard
    holds ~budget weight (the boundary row may spill past it — the
    offset-split rule, chosen over greedy fit because it is a pure
    window function: exactly SQL-expressible and splittable).

    Output: (id, bucket, weight, shard_idx, shard_offset); a writer
    can then ``groupby(bucket, shard_idx)`` to emit one file per
    shard, resumably.
    """
    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        from unfurl_ray.ops.layout import bucket_of

        ids = batch[id_col].to_numpy()
        out = batch[[id_col, weight_col]].copy()
        out["bucket"] = bucket_of(ids, n_buckets).astype(np.int64)
        return _arrow(out)

    def pack(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(id_col).reset_index(drop=True)
        w = g[weight_col].to_numpy(dtype=np.int64)
        start = np.concatenate(([0], np.cumsum(w)[:-1]))
        g["shard_idx"] = start // budget
        g["shard_offset"] = start - g["shard_idx"] * budget
        # typed Arrow even for empty groups: a schemaless empty pandas
        # block breaks downstream unions/joins
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )


def lag_rolling(ds, key_col: str, ts_col: str, value_col: str,
                id_col: str, roll_n: int = 3,
                bucket_s: int = 86_400, n_shards: int | None = None):
    """Per-key ordered window functions: LAG time-delta and a trailing
    ``roll_n``-row rolling max over the (ts, id)-sorted key stream —
    skew-safe on the shared ``keyed_cell_scan`` engine.  No key's full
    stream ever lands in one group: rows shard by (key, time-bucket)
    cell and each cell closes from its own rows plus a carry of the
    last ``roll_n - 1`` rows of the key's earlier cells, exchanged
    once.  A shard group is bounded by event rate x ``bucket_s``,
    never by key cardinality.

    Both outputs are exact (an int64 difference and a copy of an
    input double), so the DuckDB twin hash-matches bit-for-bit with
    no rounding.  ``ds`` is consumed twice (candidate pass + row
    pass) and materialized here — pass a PRUNED projection.

    Output: (id, key, delta_us, roll_max) with delta_us = -1 for the
    first event of a key (COALESCE'd identically in the oracle).
    """
    bucket_us = int(bucket_s) * 1_000_000
    w = max(1, roll_n - 1)

    def project(batch: pd.DataFrame) -> pa.Table:
        ts = _ts_us(batch[ts_col]).to_numpy()
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_tb": pa.array(ts // bucket_us, pa.int64()),
                "_ord": pa.array(ts, pa.int64()),
                "_v": pa.array(
                    batch[value_col].to_numpy(dtype=np.float64),
                    pa.float64(),
                ),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas").materialize()
    if n_shards is None:
        n_shards = max(32, rows.count() // 200_000)

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "delta_us": pa.array([], pa.int64()),
            "roll_max": pa.array([], pa.float64()),
        }
    )

    def apply_cell(cell: pd.DataFrame, carry) -> pa.Table:
        m = 0 if carry is None else len(carry)
        ts = cell["_ord"].to_numpy()
        v = cell["_v"].to_numpy()
        if m:
            ts = np.concatenate([carry["_ord"].to_numpy(), ts])
            v = np.concatenate([carry["_v"].to_numpy(), v])
        delta = np.empty(len(ts), dtype=np.int64)
        delta[0] = -1
        delta[1:] = ts[1:] - ts[:-1]
        roll = (
            pd.Series(v).rolling(roll_n, min_periods=1).max().to_numpy()
        )
        return pa.table(
            {
                id_col: pa.array(
                    cell[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    cell[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "delta_us": pa.array(delta[m:], pa.int64()),
                "roll_max": pa.array(roll[m:], pa.float64()),
            }
        )

    return keyed_cell_scan(
        rows, key_col, id_col,
        _tail_candidates(key_col, id_col, w),
        _tail_carries(key_col, id_col, w),
        apply_cell, empty_out, n_shards,
    )


def time_weighted_avg(ds, key_col: str, ts_col: str, value_col: str,
                      id_col: str):
    """Per-key time-weighted average over an irregular event stream
    (TWAP): each value is weighted by the interval until the key's
    NEXT event, so a value that stood for an hour counts 60x one that
    stood for a minute.  The last event of a key carries no weight,
    and keys with a single event are dropped — the same rows a
    ``lead()``-window twin's ``WHERE dt IS NOT NULL`` keeps.

    Skew-safe on ``keyed_cell_scan``: the weighted sum is additive
    over consecutive pairs, and every pair's RIGHT element owns it —
    each (key, time-bucket) cell emits one partial (num, den, n) row
    from its own pairs plus the one bridging pair from a 1-row tail
    carry, and a tiny per-key ``bucketed_aggregate`` folds the
    partials.  No key's stream ever groups.  Interval sums are exact
    int64 microseconds; the float64 numerator folds in a different
    order than a single-pass sum, so callers round(6) after the
    division exactly as before.  ``ds`` is consumed twice and
    materialized here — pass a PRUNED projection.

    Output: (key, twap, span_us, n_intervals), one row per key with
    >= 2 events (all-simultaneous keys dropped like the twin's
    HAVING).
    """
    bucket_us = 86_400 * 1_000_000

    def project(batch: pd.DataFrame) -> pa.Table:
        ts = _ts_us(batch[ts_col]).to_numpy()
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_tb": pa.array(ts // bucket_us, pa.int64()),
                "_ord": pa.array(ts, pa.int64()),
                "_v": pa.array(
                    batch[value_col].to_numpy(dtype=np.float64),
                    pa.float64(),
                ),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas").materialize()
    n_shards = max(32, rows.count() // 200_000)

    empty_partial = pa.table(
        {
            key_col: pa.array([], pa.int64()),
            "_num": pa.array([], pa.float64()),
            "_den": pa.array([], pa.int64()),
            "_n": pa.array([], pa.int64()),
        }
    )

    def apply_cell(cell: pd.DataFrame, carry) -> pa.Table:
        ts = cell["_ord"].to_numpy()
        v = cell["_v"].to_numpy()
        if carry is not None and len(carry):
            ts = np.concatenate([carry["_ord"].to_numpy()[-1:], ts])
            v = np.concatenate([carry["_v"].to_numpy()[-1:], v])
        if len(ts) < 2:
            return None
        dt = ts[1:] - ts[:-1]
        return pa.table(
            {
                key_col: pa.array(
                    [int(cell[key_col].iloc[0])], pa.int64()
                ),
                "_num": pa.array(
                    [float(np.sum(v[:-1] * dt))], pa.float64()
                ),
                "_den": pa.array([int(dt.sum())], pa.int64()),
                "_n": pa.array([len(dt)], pa.int64()),
            }
        )

    partials = keyed_cell_scan(
        rows, key_col, id_col,
        _tail_candidates(key_col, id_col, 1),
        _tail_carries(key_col, id_col, 1),
        apply_cell, empty_partial, n_shards,
    )
    folded = bucketed_aggregate(
        partials, [key_col],
        {"_num": ("_num", "sum"), "_den": ("_den", "sum"),
         "_n": ("_n", "sum")},
    )

    def finish(batch: pd.DataFrame) -> pa.Table:
        b = batch[batch["_den"] > 0]
        den = b["_den"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                key_col: pa.array(
                    b[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "twap": pa.array(
                    b["_num"].to_numpy(dtype=np.float64) / den,
                    pa.float64(),
                ),
                "span_us": pa.array(den, pa.int64()),
                "n_intervals": pa.array(
                    b["_n"].to_numpy(dtype=np.int64), pa.int64()
                ),
            }
        )

    return folded.map_batches(finish, batch_format="pandas")


def ntile_by(ds, part_col: str, order_col: str, id_col: str, k: int):
    """Distributed exact NTILE(k) OVER (PARTITION BY part ORDER BY
    order, id) — without ever putting one partition's rows in one
    worker.

    Rank decomposes as rank = offset[(part, order_val)] + position
    among the partition's rows SHARING the order value: the
    (part, order_val) histogram is tiny (it collapses duplicates), so
    it is aggregated distributed, cumulated on the driver, and
    broadcast via ``ray.put``; the per-tie position comes from a
    ``groupby(part, order_val)`` whose granularity is one ORDER VALUE
    per group, not one partition — skew appears only if a single
    (part, order_val) pair dominates the corpus.  Bucket then follows
    from rank alone via the exact NTILE rule: the FIRST n%k buckets
    get ceil(n/k) rows, the rest floor(n/k) — note this front-loads
    the remainder, unlike ``rank*k//n`` which spreads it evenly.

    Output: input columns + ``bucket`` (1-based, like SQL NTILE).
    """
    import ray

    # bucketed_aggregate, not Ray's builtin count(): the histogram's
    # key count grows with distinct order values and the builtin
    # reduce combines per key in Python (~40 s / 150k keys — see
    # bucketed_aggregate's docstring measurement)
    hist = (
        bucketed_aggregate(
            ds.select_columns([part_col, order_col]),
            [part_col, order_col], {"count()": (order_col, "count")},
        )
        .to_pandas()
        .sort_values([part_col, order_col])
        .reset_index(drop=True)
    )
    counts = hist["count()"].to_numpy(dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    part_first = ~hist[part_col].duplicated().to_numpy()
    # offset within the partition: global cumsum minus the partition's
    # own starting cumsum (broadcast per partition via ffill)
    part_base = pd.Series(
        np.where(part_first, starts, np.nan)
    ).ffill().to_numpy(dtype=np.int64)
    offsets = {
        (p, o): int(s - b)
        for p, o, s, b in zip(
            hist[part_col], hist[order_col], starts, part_base
        )
    }
    totals = hist.groupby(part_col)["count()"].sum().to_dict()
    side = ray.put((offsets, totals))

    def bucketize(group: pd.DataFrame) -> pa.Table:
        # map_groups has no actor __init__ to fetch broadcasts in, so
        # memo the deserialized side table per worker process — one
        # ray.get per worker, not one per group
        offs, tots = _broadcast_fetch(side)
        g = group.sort_values(id_col).reset_index(drop=True)
        part = g[part_col].iloc[0]
        base = offs[(part, g[order_col].iloc[0])]
        rank = base + np.arange(len(g), dtype=np.int64)
        n = int(tots[part])
        q, m = n // k, n % k
        head = m * (q + 1)  # ranks below this sit in the big buckets
        if q == 0:  # fewer rows than buckets: one row per bucket
            g["bucket"] = rank + 1
        else:
            g["bucket"] = np.where(
                rank < head, rank // (q + 1), m + (rank - head) // q
            ) + 1
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    return ds.groupby([part_col, order_col]).map_groups(
        bucketize, batch_format="pandas"
    )


_BROADCAST_CACHE: dict[str, Any] = {}


def _broadcast_fetch(ref):
    """Per-worker-process memo for ``ray.put`` side tables consumed by
    plain-function stages (map_groups has no actor ``__init__``)."""
    import ray

    key = ref.hex()
    if key not in _BROADCAST_CACHE:
        _BROADCAST_CACHE.clear()  # one live side table per worker
        _BROADCAST_CACHE[key] = ray.get(ref)
    return _BROADCAST_CACHE[key]


def rollup_aggregate(ds, keys: list[str],
                     aggs: dict[str, tuple[str, str]],
                     all_label: str = "ALL"):
    """GROUP BY ROLLUP(keys...) in ONE shuffle.

    Each batch fans out one PARTIAL row per rollup level (all keys,
    then each prefix with trailing keys collapsed to ``all_label``,
    down to the grand total), pre-aggregated inside the batch — so the
    shuffle carries (#levels x distinct key tuples per batch) stub
    rows, never input rows, and every level shares the single groupby.
    Keys must be string-typed (the collapsed levels are labeled).
    ``aggs`` follows ``pre_aggregate``: out_col -> (in_col, fn) with
    fn in {sum, count, min, max}; finish means downstream.
    """
    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        pieces = []
        for level in range(len(keys), -1, -1):
            b = batch.copy()
            for k in keys[level:]:
                b[k] = all_label
            g = b.groupby(keys, as_index=False, sort=False)
            merged = None
            for out_col, (in_col, fn) in aggs.items():
                if fn == "count":
                    piece = g.size().rename(columns={"size": out_col})
                else:
                    piece = getattr(g[in_col], fn)().rename(
                        columns={in_col: out_col}
                    )
                merged = (
                    piece if merged is None
                    else merged.merge(piece, on=keys)
                )
            pieces.append(merged)
        return _arrow(pd.concat(pieces, ignore_index=True))

    from ray.data.aggregate import Max, Min, Sum

    finishers = []
    for out_col, (_in, fn) in aggs.items():
        if fn in ("sum", "count"):
            finishers.append(Sum(out_col, alias_name=out_col))
        elif fn == "min":
            finishers.append(Min(out_col, alias_name=out_col))
        elif fn == "max":
            finishers.append(Max(out_col, alias_name=out_col))
    return (
        ds.map_batches(fan_out, batch_format="pandas")
        .groupby(keys)
        .aggregate(*finishers)
    )


def write_packed_shards(ds, weight_col: str, budget: int, out_dir: str,
                        id_col: str = "doc_id", n_buckets: int = 8):
    """Terminal sink for ``pack_shards``: write each shard as ONE
    parquet file under ``out_dir/bucket=B/shard_SSSSS.parquet`` and
    return the manifest (bucket, shard_idx, n_rows, weight, skipped).

    Resumable by construction: the offset-split rule makes shard
    membership a pure function of the bucket's sorted (id, weight)
    stream, so a re-run recomputes identical shards and SKIPS files
    that already exist (crash-safe via tmp+rename).  Unlike
    ``pack_shards`` this shuffle necessarily carries the payload —
    that is the one co-locating move any engine must make to emit
    shard files; size ``n_buckets`` so one bucket's rows fit a worker.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)

    def bucketize(batch: pd.DataFrame) -> pa.Table:
        from unfurl_ray.ops.layout import bucket_of

        out = batch.copy()
        out["bucket"] = bucket_of(
            batch[id_col].to_numpy(), n_buckets
        ).astype(np.int64)
        return _arrow(out)

    def write_bucket(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(id_col).reset_index(drop=True)
        b = int(g["bucket"].iloc[0])
        w = g[weight_col].to_numpy(dtype=np.int64)
        start = np.concatenate(([0], np.cumsum(w)[:-1]))
        shard = start // budget
        bdir = os.path.join(out_dir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        rows = {"bucket": [], "shard_idx": [], "n_rows": [],
                "weight": [], "skipped": []}
        for s in np.unique(shard):
            sub = g[shard == s].drop(columns=["bucket"])
            path = os.path.join(bdir, f"shard_{int(s):05d}.parquet")
            skipped = os.path.exists(path)
            if not skipped:
                tmp = path + ".tmp"
                pq.write_table(
                    pa.Table.from_pandas(sub, preserve_index=False)
                    .replace_schema_metadata(None),
                    tmp,
                )
                os.rename(tmp, path)
            rows["bucket"].append(b)
            rows["shard_idx"].append(int(s))
            rows["n_rows"].append(len(sub))
            rows["weight"].append(int(sub[weight_col].sum()))
            rows["skipped"].append(skipped)
        return pa.table(
            {
                "bucket": pa.array(rows["bucket"], pa.int64()),
                "shard_idx": pa.array(rows["shard_idx"], pa.int64()),
                "n_rows": pa.array(rows["n_rows"], pa.int64()),
                "weight": pa.array(rows["weight"], pa.int64()),
                "skipped": pa.array(rows["skipped"], pa.bool_()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(write_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values(["bucket", "shard_idx"])
        .reset_index(drop=True)
    )


def distinct_count_by(ds, key_col: str, value_col: str,
                      out_col: str = "n_distinct"):
    """Exact COUNT(DISTINCT value) per key, two-level: batches
    pre-distinct locally, the shuffle carries each (key, value) pair
    once per batch, the groupby collapses pairs, and a second tiny
    pre-agg counts per key.  No per-key value set ever materializes in
    one place — memory is bounded by distinct pairs per batch."""
    # ARROW blocks into the pair groupby: Ray's sort-based aggregate
    # costs ~1.6 ms/row on pandas blocks with multi-column keys
    # (Python-level comparisons) vs ~μs on Arrow — measured 17.6 s ->
    # 2 s at 100k events
    def local_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by([key_col, value_col]).aggregate([])

    pairs = (
        ds.map_batches(local_distinct, batch_format="pyarrow")
        .groupby([key_col, value_col])
        .count()
        .drop_columns(["count()"])
    )
    return pre_aggregate(
        pairs, [key_col], {out_col: (value_col, "count")}
    )


def pivot_counts(ds, key_col: str, pivot_col: str, categories: list[str]):
    """Crosstab: one row per key, one count column per category of
    ``pivot_col`` (categories fixed up front — at scale you name the
    columns you want, you don't discover them in the same pass).
    Fan-out happens vectorized inside each batch; the shuffle carries
    one partial row per key per batch with len(categories) int columns.
    """
    cols = {c: f"n_{c}" for c in categories}

    def partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(key_col, as_index=False, sort=False)
        out = g.size().rename(columns={"size": "_total"})
        for cat, out_col in cols.items():
            hits = (
                batch[batch[pivot_col] == cat]
                .groupby(key_col, as_index=False, sort=False)
                .size()
                .rename(columns={"size": out_col})
            )
            out = out.merge(hits, on=key_col, how="left")
        out = out.drop(columns=["_total"]).fillna(0)
        for out_col in cols.values():
            out[out_col] = out[out_col].astype("int64")
        # hash-bucket the merge shuffle: Ray's Aggregate pays a Python
        # per-key combine in its reduce (measured 3.2 s/reducer at
        # 1500 keys x 5 sums); a bucketed map_groups merges each
        # bucket with ONE vectorized pandas groupby-sum instead
        out["_bucket"] = (
            pd.util.hash_array(out[key_col].to_numpy())
            % np.uint64(32)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        summed = (
            group.drop(columns=["_bucket"])
            .groupby(key_col, as_index=False, sort=False)
            .sum()
        )
        return pa.Table.from_pandas(
            summed, preserve_index=False
        ).replace_schema_metadata(None)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def range_join(ds, intervals: pd.DataFrame, value_col: str,
               lo_col: str = "lo", hi_col: str = "hi",
               concurrency: int = 8):
    """Range (interval) join: each row matches every interval with
    ``lo <= value < hi`` — many-to-many, overlapping intervals
    included.  The interval table is the broadcast small side (one
    ``ray.put``, fetched in actor ``__init__``); the probe is one
    vectorized mask per interval per batch, so cost is
    O(batch x intervals) with no shuffle.  Interval tables are small
    by nature (tiers, buckets, SLA bands); thousands of
    NON-overlapping intervals should switch to np.searchsorted binning
    — noted in-line, same broadcast shape.
    """
    import ray

    class RangeProbe:
        def __init__(self, ref):
            self.iv = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            v = batch[value_col].to_numpy()
            out = []
            for _, row in self.iv.iterrows():
                mask = (v >= row[lo_col]) & (v < row[hi_col])
                if mask.any():
                    hit = batch[mask].copy()
                    for c in self.iv.columns:
                        hit[c] = row[c]
                    out.append(hit)
            if not out:
                empty = batch.head(0).copy()
                for c in self.iv.columns:
                    empty[c] = pd.Series(dtype=self.iv[c].dtype)
                return empty
            return pd.concat(out, ignore_index=True)

    ref = ray.put(intervals)
    return ds.map_batches(
        RangeProbe,
        fn_constructor_kwargs={"ref": ref},
        batch_format="pandas",
        concurrency=(1, concurrency),
    )


def bucketed_aggregate(ds, keys: list[str],
                       aggs: dict[str, tuple[str, str]],
                       n_buckets: int = 64):
    """``pre_aggregate`` for HIGH-CARDINALITY keys.

    Ray's builtin ``groupby().aggregate()`` reduce combines per key in
    Python — measured ~40 s for 150k int keys on 600k rows, regardless
    of block format.  Same per-batch partial as ``pre_aggregate``, but
    the shuffle key is ``hash(keys) % n_buckets`` and each bucket
    merges with ONE vectorized pandas groupby — 40 s -> ~2 s on the
    same input.  Use pre_aggregate when keys are few (its output
    feeds Ray-native aggregates cleanly); use this when key count
    grows with the data (ids, content hashes, vocabulary).
    ``aggs``: out_col -> (in_col, fn), fn in {sum, count, min, max};
    means finish downstream.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}

    def partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.groupby(keys, as_index=False, sort=False)
        merged = None
        for out_col, (in_col, fn) in aggs.items():
            if fn == "count":
                piece = g.size().rename(columns={"size": out_col})
            else:
                piece = getattr(g[in_col], fn)().rename(
                    columns={in_col: out_col}
                )
            merged = piece if merged is None else merged.merge(
                piece, on=keys
            )
        merged["_bucket"] = (
            pd.util.hash_pandas_object(merged[keys], index=False)
            .to_numpy() % np.uint64(n_buckets)
        ).astype(np.int64)
        return _arrow(merged)

    spec = {
        out_col: merge_fn[fn] for out_col, (_in, fn) in aggs.items()
    }

    def merge_bucket(group: pd.DataFrame) -> pa.Table:
        out = (
            group.drop(columns=["_bucket"])
            .groupby(keys, as_index=False, sort=False)
            .agg(spec)
        )
        return _arrow(out)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def bucketed_hash_join(left_ds, right_ds, on: str, right_on: str,
                       n_buckets: int = 32, how: str = "inner"):
    """Hash join (``how`` in inner/left/outer) as one
    bucket-co-partitioned shuffle: both sides tag, pad to a shared
    schema with TYPED nulls, union, group by ``hash(key) %
    n_buckets``, and each bucket merges with one vectorized pandas
    join.  Outer variants stay one shuffle: a key's rows from BOTH
    sides land in the same bucket, so unmatched rows are visible
    locally and null-pad there — no second pass.

    Exists because ``Dataset.join`` fails with ArrowInvalid when a
    hash partition receives zero rows from one side (sparse key
    spaces, filtered inputs) and because its per-partition acero calls
    inherit the builtin-aggregate sensitivity to partition count.
    Size ``n_buckets`` so one bucket of the LARGER side fits a worker.
    """
    def _arrow_schema(ds) -> pa.Schema:
        full = ds.schema()
        if full is None:
            raise ValueError(
                "bucketed_hash_join: side has no resolvable schema "
                "(it executed to zero blocks) — pad the empty side "
                "with a typed empty table or filter earlier"
            )
        sch = full.base_schema
        if isinstance(sch, pa.Schema):
            return sch
        # PandasBlockSchema (upstream stage emitted pandas blocks)
        def typ(t):
            try:
                return pa.from_numpy_dtype(t)
            except (pa.ArrowNotImplementedError, TypeError):
                return pa.string()  # object dtype

        return pa.schema(
            [pa.field(n, typ(t)) for n, t in zip(sch.names, sch.types)]
        )

    lschema = _arrow_schema(left_ds)
    rfields = [
        pa.field(on if f.name == right_on else f.name, f.type)
        for f in _arrow_schema(right_ds)
    ]
    lnames = {f.name for f in lschema}
    clash = {f.name for f in rfields if f.name in lnames} - {on}
    if clash:  # keep padding simple: rename before joining
        raise ValueError(f"non-key column name collision: {clash}")
    unified = list(lschema) + [f for f in rfields if f.name != on]
    target = pa.schema(unified + [pa.field("_side", pa.int8())])

    def pad(side: int, key: str):
        def f(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = []
            for fld in target:
                if fld.name == "_side":
                    cols.append(
                        pa.array(np.full(n, side, dtype=np.int8()),
                                 pa.int8())
                    )
                elif fld.name == on and side == 1:
                    cols.append(batch.column(key).cast(fld.type))
                elif fld.name in batch.column_names and (
                    (side == 0) == (fld.name in lnames)
                ):
                    cols.append(batch.column(fld.name).cast(fld.type))
                else:
                    cols.append(pa.nulls(n, fld.type))
            return pa.table(dict(zip([f.name for f in target], cols)))

        return f

    def bucket(batch: pa.Table) -> pa.Table:
        key = batch.column(on).to_pandas()
        b = (
            pd.util.hash_array(key.to_numpy()) % np.uint64(n_buckets)
        ).astype(np.int64)
        return batch.append_column("_bucket", pa.array(b, pa.int64()))

    unioned = (
        left_ds.map_batches(pad(0, on), batch_format="pyarrow")
        .union(right_ds.map_batches(pad(1, right_on),
                                    batch_format="pyarrow"))
        .map_batches(bucket, batch_format="pyarrow")
    )

    lcols = [f.name for f in lschema]
    rcols = [on] + [f.name for f in unified if f.name not in lnames]

    def _int_mapper(t):
        # nullable Int64 at the Arrow->pandas boundary: the UNION
        # null-pads every non-key column on one side, so a plain
        # to_pandas() promotes int64 to float64 and corrupts values
        # above 2^53 (ids, 64-bit fingerprints) BEFORE any cast
        # inside the merge fn could save them
        return pd.Int64Dtype() if pa.types.is_integer(t) else None

    def merge_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group.column("_side")
        lrows = group.filter(pc.equal(side, 0)).select(
            lcols
        ).to_pandas(types_mapper=_int_mapper)
        rrows = group.filter(pc.equal(side, 1)).select(
            rcols
        ).to_pandas(types_mapper=_int_mapper)
        merged = lrows.merge(rrows, on=on, how=how)
        # pd.NA converts to typed Arrow nulls per unified field; no
        # float round-trip happens for integer columns on any path
        return pa.table(
            {
                f.name: pa.array(
                    merged[f.name], type=f.type, from_pandas=True
                )
                for f in unified
            }
        )

    return unioned.groupby("_bucket").map_groups(
        merge_bucket, batch_format="pyarrow"
    )


def rolling_range_window(ds, key_col: str, ts_col: str, value_col: str,
                         id_col: str, width_s: int,
                         n_shards: int | None = None):
    """Per-key time-RANGE rolling window — for every row, the COUNT
    and exact integer SUM (``floor(value*100)`` cents) of the key's
    rows with ``ts`` in ``[t - W, t]`` — with NO one-key-per-group
    assumption (the skew-safe sibling of ``lag_rolling``; SQL twin is
    ``... OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN W
    PRECEDING AND CURRENT ROW)``).

    Skew decomposition: a row at time ``t`` can only be preceded
    within ``W`` by rows in its own width-``W`` time bucket or the
    one before, so each row is shipped to its own bucket plus a
    carried copy to the NEXT bucket.  Grouping on ``(key,
    time_bucket)`` then co-locates every window, and a group holds at
    most two W-widths of ONE key's stream — bounded by event rate x
    window width, never by key cardinality.  A bot user with 10^9
    events shards across its time buckets instead of landing in one
    worker.

    Shuffle granularity: groups are hash-sharded (``hash(key,
    bucket) % n_shards``, auto-sized to ~TARGET rows/shard) so Ray
    pays one map_groups dispatch per shard, not per (key, bucket)
    cell; the per-cell window math runs vectorized inside the shard
    (prefix sums + searchsorted per cell).

    Sum exactness: values are floored to int64 cents BEFORE summing,
    so the result is order-independent and hash-matches the DuckDB
    twin bit-for-bit (double summation would round differently under
    a different addition order).
    """
    w_us = int(width_s) * 1_000_000
    if n_shards is None:
        n_shards = max(32, (ds.count() * 2) // 200_000)

    def fan_out(batch: pd.DataFrame) -> pa.Table:
        ts = _ts_us(batch[ts_col]).to_numpy()
        cents = np.floor(
            batch[value_col].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        ids = batch[id_col].to_numpy(dtype=np.int64)
        keys = batch[key_col].to_numpy(dtype=np.int64)
        b = ts // w_us
        n = len(batch)
        own = np.concatenate(
            [np.ones(n, dtype=np.bool_), np.zeros(n, dtype=np.bool_)]
        )
        keys2 = np.concatenate([keys, keys])
        bucket2 = np.concatenate([b, b + 1])
        shard = (
            pd.util.hash_array(keys2 * np.int64(1_000_003) + bucket2)
            % np.uint64(n_shards)
        ).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(np.concatenate([ids, ids]), pa.int64()),
                key_col: pa.array(keys2, pa.int64()),
                "_ts": pa.array(np.concatenate([ts, ts]), pa.int64()),
                "_cents": pa.array(
                    np.concatenate([cents, cents]), pa.int64()
                ),
                "_bucket": pa.array(bucket2, pa.int64()),
                "_own": pa.array(own, pa.bool_()),
                "_shard": pa.array(shard, pa.int64()),
            }
        )

    def windows_in_shard(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([key_col, "_bucket", "_ts", id_col])
        keys = g[key_col].to_numpy()
        bucket = g["_bucket"].to_numpy()
        ts = g["_ts"].to_numpy()
        cents = g["_cents"].to_numpy()
        own = g["_own"].to_numpy()
        ids = g[id_col].to_numpy()
        # (key, bucket) cell boundaries on the sorted stream
        cell_change = np.empty(len(g), dtype=np.bool_)
        cell_change[0] = True
        cell_change[1:] = (keys[1:] != keys[:-1]) | (
            bucket[1:] != bucket[:-1]
        )
        starts = np.flatnonzero(cell_change)
        ends = np.append(starts[1:], len(g))
        out_id, out_key, out_cnt, out_sum = [], [], [], []
        for s, e in zip(starts, ends):
            t = ts[s:e]
            c = cents[s:e]
            mine = own[s:e]
            if not mine.any():
                continue
            csum = np.concatenate([[0], np.cumsum(c)])
            tq = t[mine]
            lo = np.searchsorted(t, tq - w_us, side="left")
            hi = np.searchsorted(t, tq, side="right")
            out_id.append(ids[s:e][mine])
            out_key.append(keys[s:e][mine])
            out_cnt.append((hi - lo).astype(np.int64))
            out_sum.append(csum[hi] - csum[lo])
        if not out_id:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    key_col: pa.array([], pa.int64()),
                    "cnt_w": pa.array([], pa.int64()),
                    "sum_cents_w": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                key_col: pa.array(np.concatenate(out_key), pa.int64()),
                "cnt_w": pa.array(np.concatenate(out_cnt), pa.int64()),
                "sum_cents_w": pa.array(
                    np.concatenate(out_sum), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(fan_out, batch_format="pandas")
        .groupby("_shard")
        .map_groups(windows_in_shard, batch_format="pandas")
    )


def percent_rank_by(ds, key_col: str, value_col: str,
                    out_col: str = "pr", ndigits: int = 6,
                    num_partitions: int = 8,
                    broadcast_threshold: int = 2_000_000):
    """Exact SQL ``percent_rank() OVER (PARTITION BY key ORDER BY
    value)`` — (rows strictly smaller) / (n - 1) — without ever
    grouping a key's ROWS together: the shuffle carries the (key,
    value) HISTOGRAM (one row per distinct value per key), the per-key
    cumsum runs over that histogram, and the tiny mapping joins back
    to the rows by (key, value).

    Skew contract: a group is bounded by the key's DISTINCT-value
    count, not its row count — safe for discretized scores (rounded
    floats, integer bins) under any row skew.  For unbounded-precision
    values, bin first.

    ``ds`` is consumed twice (histogram + the mapping join's probe
    side) and is materialized here so its upstream runs once — pass a
    PRUNED projection (key, value, ids only), not wide rows.
    """
    ds = ds.materialize()
    hist = bucketed_aggregate(
        ds, [key_col, value_col], {"cnt": (value_col, "count")}
    )

    def cum(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(value_col)
        counts = g["cnt"].to_numpy(dtype=np.int64)
        n = counts.sum()
        before = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pr = (
            np.round(before / (n - 1), ndigits)
            if n > 1 else np.zeros(len(g))
        )
        return pa.table(
            {
                key_col: pa.array(g[key_col].to_numpy()),
                value_col: pa.array(g[value_col].to_numpy()),
                out_col: pa.array(pr, pa.float64()),
            }
        )

    mapping = hist.groupby(key_col).map_groups(
        cum, batch_format="pandas"
    ).materialize()
    return _mapping_join(
        ds, mapping, [key_col, value_col],
        broadcast_threshold, num_partitions,
    )


def _mapping_join(ds, mapping, on_cols: list[str],
                  broadcast_threshold: int, num_partitions: int):
    """Attach a histogram-sized mapping to its rows: when the mapping
    (distinct key tuples, not rows) fits a worker heap, broadcast it
    once via ray.put — or pickle it straight into task closures below
    100k rows, skipping the actor-pool spin-up — and map-side merge;
    past the threshold fall back to the hash join.  Shared by
    percent_rank_by / cume_dist_by."""
    n_map = mapping.count()
    if n_map <= broadcast_threshold:
        mp_df = mapping.to_pandas()
        if n_map <= 100_000:
            def lookup(batch: pd.DataFrame) -> pa.Table:
                return _arrow(
                    batch.merge(mp_df, on=on_cols, how="inner")
                )

            return ds.map_batches(lookup, batch_format="pandas")
        import ray as _ray

        ref = _ray.put(mp_df)

        class MapLookup:
            def __init__(self):
                self.mp = _ray.get(ref)

            def __call__(self, batch: pd.DataFrame) -> pa.Table:
                return _arrow(
                    batch.merge(self.mp, on=on_cols, how="inner")
                )

        return ds.map_batches(
            MapLookup, batch_format="pandas", concurrency=(1, 8)
        )
    return ds.join(
        mapping, join_type="inner", num_partitions=num_partitions,
        on=tuple(on_cols),
    )


def cume_dist_by(ds, key_col: str, value_col: str,
                 out_col: str = "cd", ndigits: int = 6,
                 num_partitions: int = 8,
                 broadcast_threshold: int = 2_000_000):
    """Exact SQL ``cume_dist() OVER (PARTITION BY key ORDER BY
    value)`` — (rows <= value) / n — on percent_rank_by's histogram
    decomposition: the shuffle carries the (key, value) histogram,
    the per-key cumsum runs over it, and the tiny mapping attaches
    back via ``_mapping_join``.  Same skew contract: a group is
    bounded by the key's DISTINCT-value count; bin unbounded-precision
    values first.
    """
    ds = ds.materialize()
    hist = bucketed_aggregate(
        ds, [key_col, value_col], {"cnt": (value_col, "count")}
    )

    def cum(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(value_col)
        counts = g["cnt"].to_numpy(dtype=np.int64)
        n = counts.sum()
        le = np.cumsum(counts)
        cd = np.round(le / n, ndigits)
        return pa.table(
            {
                key_col: pa.array(g[key_col].to_numpy()),
                value_col: pa.array(g[value_col].to_numpy()),
                out_col: pa.array(cd, pa.float64()),
            }
        )

    mapping = hist.groupby(key_col).map_groups(
        cum, batch_format="pandas"
    ).materialize()
    return _mapping_join(
        ds, mapping, [key_col, value_col],
        broadcast_threshold, num_partitions,
    )


def funnel_counts(ds, key_col: str, ts_col: str, type_col: str,
                  steps: list[str]) -> pd.DataFrame:
    """Ordered-funnel analysis: how many keys performed step[0], then
    step[1] STRICTLY AFTER their first step[0], then step[2] after
    that first qualifying step[1], ... (first-touch semantics).

    Scale shape, per step: one bucketed min-aggregate over the
    filtered events (histogram-sized output: one row per surviving
    key) and one hash join of the next step's events against that
    mapping — no per-key event streams are ever grouped, so a bot key
    with 10^9 events costs its share of batch work, nothing more.
    The tiny (key, first_ts) mapping is materialized per step because
    it feeds both the join and the count.
    """
    frontier = None  # Dataset[(key, _t)] of keys alive at this step
    counts: list[int] = []
    for i, step in enumerate(steps):
        stage = ds.map_batches(
            lambda b, s=step: b.filter(
                pc.equal(b.column(type_col), pa.scalar(s))
            ),
            batch_format="pyarrow",
        )
        if i > 0:
            # bucketed_hash_join, not Dataset.join: funnel tails can
            # leave hash partitions empty on one side (ArrowInvalid)
            stage = bucketed_hash_join(
                stage, frontier, on=key_col, right_on=key_col,
                n_buckets=16,
            ).map_batches(
                lambda b: b.filter(
                    pc.greater(b.column(ts_col), b.column("_t"))
                ).drop_columns(["_t"]),
                batch_format="pyarrow",
            )
        frontier = bucketed_aggregate(
            stage, [key_col], {"_t": (ts_col, "min")}
        ).materialize()
        counts.append(frontier.count())
    return pd.DataFrame({"step": steps, "n_users": counts})


def zscore_by(ds, key_col: str, value_col: str, out_col: str = "z",
              ndigits: int = 6):
    """Grouped z-score normalization: (v - mean_g) / stddev_pop_g.

    Two passes, no row shuffle: pass 1 pre-aggregates (sum, sumsq,
    count) per key — one tiny row per key crosses the wire — and the
    moments table broadcasts back into a stateless map (keys here are
    categorical; for key counts too large to broadcast, join like
    percent_rank_by instead).  Zero-variance groups emit NaN, matching
    SQL division by a zero stddev -> NULL... cast side note: DuckDB
    returns NULL, we emit NaN; the oracle canon unifies them.
    """
    def with_sq(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch[[key_col, value_col]].copy()
        v = batch[value_col].to_numpy(dtype=np.float64)
        out["_v2"] = v * v
        return out

    moments = pre_aggregate(
        ds.map_batches(with_sq, batch_format="pandas"),
        [key_col],
        {"_s": (value_col, "sum"), "_s2": ("_v2", "sum"),
         "_n": (value_col, "count")},
    ).to_pandas()
    moments["_mean"] = moments["_s"] / moments["_n"]
    var = moments["_s2"] / moments["_n"] - moments["_mean"] ** 2
    moments["_std"] = np.sqrt(np.maximum(var, 0.0))
    side = moments[[key_col, "_mean", "_std"]]

    def apply_z(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.merge(side, on=key_col, how="left")
        std = out["_std"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (out[value_col].to_numpy() - out["_mean"].to_numpy()) / std
        out[out_col] = np.round(z, ndigits)
        return out.drop(columns=["_mean", "_std"])

    # categorical-key moments ride the task closure (bytes); a large
    # key space should use broadcast_join (ray.put once) instead
    return ds.map_batches(apply_z, batch_format="pandas")


def transition_counts(ds, key_col: str, ts_col: str, type_col: str,
                      id_col: str):
    """First-order Markov transition counts over each key's
    (ts, id)-ordered event stream — the sequence statistic behind
    next-event models and curriculum ordering.

    Per-key map_groups pre-aggregates transitions INSIDE the group
    (the shuffle output is at most |types|^2 rows per key, the global
    reduce is tiny).  Same partitioning contract as lag_rolling: one
    key's stream in one group; project to (id, key, ts, type) first so
    the shuffle carries no payload.
    """
    def trans(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([ts_col, id_col])
        t = g[type_col].to_numpy()
        if len(t) < 2:
            return pa.table(
                {"src": pa.array([], pa.string()),
                 "dst": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        pairs = (
            pd.DataFrame({"src": t[:-1], "dst": t[1:]})
            .groupby(["src", "dst"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.table(
            {
                "src": pa.array(pairs["src"], pa.string()),
                "dst": pa.array(pairs["dst"], pa.string()),
                "n": pa.array(pairs["n"].to_numpy(), pa.int64()),
            }
        )

    per_key = ds.groupby(key_col).map_groups(
        trans, batch_format="pandas"
    )
    return pre_aggregate(per_key, ["src", "dst"], {"n": ("n", "sum")})


def windowed_pair_join(ds, key_col: str, ts_col: str, id_col: str,
                       type_col: str, left_type: str, right_type: str,
                       width_s: int, n_merge_buckets: int = 64):
    """Event-time stream-stream join: all (left, right) pairs with the
    same key and ``0 < right.ts - left.ts <= width_s`` — "click within
    an hour AFTER a view".  Differs from the as-of join (ALL pairs,
    not the latest) and from range_join (no broadcast side).

    Shape: lefts land in their time bucket (floor(ts / width)); rights
    replicate to their own AND the previous bucket, so every valid
    pair co-locates in the left's bucket exactly once — a 2x fan-out
    of one side instead of any per-key stream grouping.  (key, bucket)
    cells then hash onto ~fixed shuffle buckets and each group joins
    its cells vectorized (the same dispatch-decoupling as the as-of
    merge).  Per-group memory is bounded by the pair count of its
    cells — the true output size, irreducible for an all-pairs join.
    """
    width_us = width_s * 1_000_000

    def shape(batch: pd.DataFrame) -> pa.Table:
        us = _ts_us(batch[ts_col]).to_numpy()
        b = us // width_us
        t = batch[type_col].to_numpy()
        base = pd.DataFrame(
            {
                key_col: batch[key_col].to_numpy(),
                "_ts": us,
                id_col: batch[id_col].to_numpy(),
                "_bucket": b,
            }
        )
        lefts = base[t == left_type].copy()
        lefts["_side"] = np.int8(0)
        rights = base[t == right_type]
        r0 = rights.copy()
        r0["_side"] = np.int8(1)
        r1 = rights.copy()
        r1["_bucket"] = r1["_bucket"] - 1  # reach lefts one bucket back
        r1["_side"] = np.int8(1)
        out = pd.concat([lefts, r0, r1], ignore_index=True)
        h = pd.util.hash_pandas_object(
            out[[key_col, "_bucket"]], index=False
        ).to_numpy()
        out["_sb"] = (h % np.uint64(n_merge_buckets)).astype(np.int64)
        return _arrow(out)

    def join_cells(group: pd.DataFrame) -> pa.Table:
        on = [key_col, "_bucket"]
        lefts = group[group["_side"] == 0]
        rights = group[group["_side"] == 1]
        empty = pa.table(
            {"left_id": pa.array([], pa.int64()),
             "right_id": pa.array([], pa.int64())}
        )
        if lefts.empty or rights.empty:
            return empty
        pairs = lefts[on + ["_ts", id_col]].merge(
            rights[on + ["_ts", id_col]], on=on,
            suffixes=("_l", "_r"),
        )
        dt = pairs["_ts_r"] - pairs["_ts_l"]
        keep = pairs[(dt > 0) & (dt <= width_us)]
        return pa.table(
            {
                "left_id": pa.array(
                    keep[f"{id_col}_l"].to_numpy(), pa.int64()
                ),
                "right_id": pa.array(
                    keep[f"{id_col}_r"].to_numpy(), pa.int64()
                ),
            }
        )

    return (
        ds.map_batches(shape, batch_format="pandas")
        .groupby("_sb")
        .map_groups(join_cells, batch_format="pandas")
    )


def hist_median_by(hist, key_col: str, value_col: str, cnt_col: str,
                   out_col: str, n_buckets: int = 32):
    """Exact per-key discrete median (DuckDB ``quantile_disc(0.5)``:
    the element at ``floor(0.5 * (n-1))`` of the sorted values) from a
    (key, value, count) HISTOGRAM dataset — group size is bounded by a
    key's DISTINCT-value count, never its row count.

    Keys hash onto ``n_buckets`` shuffle buckets; inside a bucket the
    rank selection is one vectorized pass (sort + per-key cumsum +
    boolean pick), no Python loop per key.
    """
    def pick(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([key_col, value_col]).reset_index(
            drop=True
        )
        cnt = g[cnt_col].to_numpy(dtype=np.int64)
        grp = g.groupby(key_col, sort=False)
        n = grp[cnt_col].transform("sum").to_numpy(dtype=np.int64)
        cum = grp[cnt_col].cumsum().to_numpy(dtype=np.int64)
        before = cum - cnt  # values strictly below this row
        target = (n - 1) // 2  # floor(0.5 * (n-1))
        hit = (before <= target) & (target < cum)
        out = g.loc[hit, [key_col, value_col]].rename(
            columns={value_col: out_col}
        )
        out["n"] = n[hit]
        return _arrow(out)

    def bucketize(batch: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch[key_col], index=False
        ).to_numpy()
        batch["_mb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return _arrow(batch)

    return (
        hist.map_batches(bucketize, batch_format="pandas")
        .groupby("_mb")
        .map_groups(pick, batch_format="pandas")
    )


def mad_outliers_by(ds, key_col: str, value_col: str,
                    z: float = 3.0, n_buckets: int = 64):
    """Robust per-key outlier profile: discrete median, MAD (median
    absolute deviation) and the count of rows with
    ``|v - median| > z * MAD``, over values discretized to integer
    CENTS (``floor(value * 100)``) so every comparison is exact
    integer arithmetic on both the Ray and SQL sides.

    Scale shape: two histogram rounds (value histogram -> median;
    absolute-deviation histogram -> MAD) + one counting pass.  Every
    shuffle carries (key, cents, count) histogram rows — bounded by
    distinct cents per key — and the per-key median/MAD tables are
    broadcast once via ``ray.put`` (they hold ONE row per key; for
    key cardinalities past worker memory, swap the broadcast for
    ``bucketed_hash_join``).  No key's raw rows are ever grouped.
    Output: key, median, mad, n, n_outliers (medians back in value
    units).
    """
    import ray as _ray

    def to_cents(batch: pd.DataFrame) -> pa.Table:
        out = pd.DataFrame(
            {
                key_col: batch[key_col],
                "_c": np.floor(
                    batch[value_col].to_numpy(dtype=np.float64) * 100.0
                ).astype(np.int64),
            }
        )
        return _arrow(out)

    cents = ds.map_batches(to_cents, batch_format="pandas")
    cents = cents.materialize()  # consumed 3x (hist, dev hist, count)

    hist = bucketed_aggregate(
        cents, [key_col, "_c"], {"cnt": ("_c", "count")},
        n_buckets=n_buckets,
    )
    med = hist_median_by(hist, key_col, "_c", "cnt", "_med")
    med_ref = _ray.put(med.to_pandas()[[key_col, "_med", "n"]])

    class Dev:
        def __init__(self):
            self.med = _ray.get(med_ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            m = batch.merge(self.med, on=key_col, how="inner")
            m["_ad"] = np.abs(
                m["_c"].to_numpy() - m["_med"].to_numpy()
            )
            return _arrow(m[[key_col, "_ad"]])

    dev = cents.map_batches(Dev, batch_format="pandas",
                            concurrency=(1, 8))
    dev_hist = bucketed_aggregate(
        dev, [key_col, "_ad"], {"cnt": ("_ad", "count")},
        n_buckets=n_buckets,
    )
    mad = hist_median_by(dev_hist, key_col, "_ad", "cnt", "_mad")
    stats = med.to_pandas().merge(
        mad.to_pandas()[[key_col, "_mad"]], on=key_col
    )
    stats_ref = _ray.put(stats)

    class Count:
        def __init__(self):
            self.st = _ray.get(stats_ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            m = batch.merge(self.st, on=key_col, how="inner")
            # z * MAD in integer cents; > keeps the comparison exact
            # (z * int is a float, but both sides compute it as
            # double * int64 -> double compare)
            out_mask = (
                np.abs(m["_c"].to_numpy() - m["_med"].to_numpy())
                > z * m["_mad"].to_numpy()
            )
            part = (
                m.loc[out_mask]
                .groupby(key_col, as_index=False)
                .size()
                .rename(columns={"size": "n_outliers"})
            )
            if part.empty:
                # typed empty: from_pandas would infer a null-typed
                # key column and poison downstream schema unification
                ktype = (
                    pa.string()
                    if batch[key_col].dtype == object
                    else pa.from_numpy_dtype(batch[key_col].dtype)
                )
                return pa.table(
                    {
                        key_col: pa.array([], ktype),
                        "n_outliers": pa.array([], pa.int64()),
                    }
                )
            return _arrow(part)

    outl = pre_aggregate(
        cents.map_batches(Count, batch_format="pandas",
                          concurrency=(1, 8)),
        [key_col], {"n_outliers": ("n_outliers", "sum")},
    ).to_pandas()

    out = stats.merge(outl, on=key_col, how="left")
    out["n_outliers"] = (
        out["n_outliers"].fillna(0).astype("int64")
    )
    out["median"] = out["_med"].to_numpy() / 100.0
    out["mad"] = out["_mad"].to_numpy() / 100.0
    return out[[key_col, "median", "mad", "n", "n_outliers"]]


def _cell_shard(keys: np.ndarray, buckets: np.ndarray,
                n_shards: int) -> np.ndarray:
    """Shard id for a (key, time-bucket) CELL — the ONE hash that
    keyed_prefix_scan and _ewma_anchored both use to co-locate event
    rows with their carry stubs; rows and stubs must never disagree."""
    return (
        pd.util.hash_array(
            keys * np.int64(1_000_003) + buckets
        ) % np.uint64(n_shards)
    ).astype(np.int64)


def _key_shard_col(batch: pd.DataFrame, key_col: str,
                   n: int) -> pd.DataFrame:
    """Attach the per-KEY shard column for the cell-prefix pass."""
    batch["_kshard"] = (
        pd.util.hash_array(batch[key_col].to_numpy())
        % np.uint64(n)
    ).astype(np.int64)
    return batch


def keyed_prefix_scan(rows, key_col: str, id_col: str,
                      value_cols: list[str], finish, empty_out,
                      n_shards: int):
    """Generic skew-safe per-key PREFIX SCAN — the shared engine under
    ``running_total`` (int cents) and ``ewma_by`` (float weights).

    ``rows``: a MATERIALIZED Dataset with numeric columns
    ``[id_col, key_col, "_ts", "_tb", *value_cols, *extras]``
    (``_tb`` = time bucket).  For every row it computes
    ``cum_<v>`` = the per-key running sum of ``v`` in
    ``(_tb, _ts, id)`` order, with NO one-key-per-group assumption:

    1. per-batch partials collapse to ONE row per (key, _tb) cell
       (``bucketed_aggregate``); a key-sharded pass turns the tiny
       cell table into per-key EXCLUSIVE prefixes over bucket order —
       the carry each cell inherits from all earlier buckets;
    2. the rows and their cells' carry stubs hash onto the SAME
       ``hash(key, _tb)`` shards in one union-groupby; inside a shard
       each cell sorts ``(_ts, id)``, cumsums locally, adds its carry.

    A shard group holds one bucket-width of a key's stream plus one
    stub per cell — bounded by event rate x bucket width, never by
    key cardinality.  ``finish(m)`` receives a DataFrame with
    ``[id, key, "_tb", "_ts", *extras, cum_<v>...]`` in row order and
    returns the final Arrow table; ``empty_out`` is the typed empty
    result for shards with no own rows.
    """
    import pyarrow as _pa

    fields = {
        f.name: f.type.to_pandas_dtype()
        for f in rows.schema().base_schema
    }
    extras = [
        c for c in fields
        if c not in (id_col, key_col, "_tb") and c not in value_cols
    ]  # includes "_ts"
    off_cols = [f"_off{i}" for i in range(len(value_cols))]

    cells = bucketed_aggregate(
        rows, [key_col, "_tb"],
        {o: (v, "sum") for o, v in zip(off_cols, value_cols)},
    )

    def key_prefix(group: pd.DataFrame) -> pa.Table:
        """Exclusive per-key prefix over the (small) cell table: one
        stub row per cell -> the carry from all earlier buckets."""
        g = group.sort_values([key_col, "_tb"])
        keys = g[key_col].to_numpy()
        new = np.empty(len(g), dtype=np.bool_)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(g)))
        n = len(g)
        cols = {
            id_col: pa.array(np.full(n, -1, dtype=np.int64), pa.int64()),
            key_col: pa.array(keys, pa.int64()),
            "_tb": pa.array(g["_tb"].to_numpy(), pa.int64()),
        }
        for c in extras:
            cols[c] = pa.array(np.zeros(n, dtype=fields[c]))
        for v, o in zip(value_cols, off_cols):
            cv = g[o].to_numpy(dtype=fields[v])
            if np.issubdtype(cv.dtype, np.integer):
                excl = np.cumsum(cv) - cv
                off = excl - np.repeat(excl[starts], lens)
            else:
                # per-key exclusive cumsum, segment by segment: one
                # key's huge exp-scale partials must not absorb the
                # next key's small ones (see scan_shard note)
                off = np.empty_like(cv)
                for s0, ln in zip(starts, lens):
                    seg = np.cumsum(cv[s0:s0 + ln])
                    off[s0:s0 + ln] = seg - cv[s0:s0 + ln]
            cols[v] = pa.array(np.zeros(n, dtype=fields[v]))
            cols[o] = pa.array(off)
        cols["_is_off"] = pa.array(np.ones(n, dtype=np.bool_), pa.bool_())
        cols["_shard"] = pa.array(
            _cell_shard(keys, g["_tb"].to_numpy(), n_shards), pa.int64()
        )
        return pa.table(cols)

    offsets = (
        cells.map_batches(
            _key_shard_col, batch_format="pandas",
            fn_kwargs={"key_col": key_col,
                       "n": max(32, n_shards // 4)},
        )
        .groupby("_kshard")
        .map_groups(key_prefix, batch_format="pandas")
    )

    def tag_rows(batch: pd.DataFrame) -> pa.Table:
        keys = batch[key_col].to_numpy()
        buckets = batch["_tb"].to_numpy()
        n = len(batch)
        cols = {
            id_col: pa.array(
                batch[id_col].to_numpy(dtype=np.int64), pa.int64()
            ),
            key_col: pa.array(keys, pa.int64()),
            "_tb": pa.array(buckets, pa.int64()),
        }
        for c in extras:
            cols[c] = pa.array(batch[c].to_numpy(dtype=fields[c]))
        for v, o in zip(value_cols, off_cols):
            cols[v] = pa.array(batch[v].to_numpy(dtype=fields[v]))
            cols[o] = pa.array(np.zeros(n, dtype=fields[v]))
        cols["_is_off"] = pa.array(
            np.zeros(n, dtype=np.bool_), pa.bool_()
        )
        cols["_shard"] = pa.array(_cell_shard(keys, buckets, n_shards), pa.int64())
        return pa.table(cols)

    unioned = rows.map_batches(tag_rows, batch_format="pandas").union(
        offsets
    )

    def scan_shard(group: pd.DataFrame) -> pa.Table:
        own = group[~group["_is_off"]].sort_values(
            [key_col, "_tb", "_ts", id_col]
        )
        if len(own) == 0:
            return empty_out
        keys = own[key_col].to_numpy()
        buckets = own["_tb"].to_numpy()
        new = np.empty(len(own), dtype=np.bool_)
        new[0] = True
        new[1:] = (keys[1:] != keys[:-1]) | (buckets[1:] != buckets[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(own)))
        carry = group[group["_is_off"]][[key_col, "_tb"] + off_cols]
        m = own[[id_col, key_col, "_tb"] + extras].merge(
            carry, on=[key_col, "_tb"], how="left", sort=False
        )
        for v, o in zip(value_cols, off_cols):
            arr = own[v].to_numpy(dtype=fields[v])
            if np.issubdtype(arr.dtype, np.integer):
                # exact in int64: global cumsum + start offsets
                csum = np.cumsum(arr)
                cum = csum - np.repeat(
                    csum[starts] - arr[starts], lens
                )
            else:
                # floats: cumsum PER SEGMENT — a global cumsum whose
                # earlier segments hold large-magnitude values (ewma's
                # exp weights) absorbs the next segment's small values
                # and the start-offset subtraction cancels them to 0
                cum = np.empty_like(arr)
                for s0, ln in zip(starts, lens):
                    cum[s0:s0 + ln] = np.cumsum(arr[s0:s0 + ln])
            m[f"cum_{v}"] = cum + m[o].fillna(0).to_numpy(
                dtype=fields[v]
            )
        return finish(m)

    return unioned.groupby("_shard").map_groups(
        scan_shard, batch_format="pandas"
    )


def running_total(ds, key_col: str, ts_col: str, value_col: str,
                  id_col: str, bucket_s: int = 86_400,
                  n_shards: int | None = None):
    """Per-key RUNNING count + exact integer-cents sum — SQL twin
    ``sum(cents) OVER (PARTITION BY key ORDER BY ts, id ROWS
    UNBOUNDED PRECEDING)`` — on the shared ``keyed_prefix_scan``
    engine (see its docstring for the skew decomposition).  Int64
    cents keep every sum order-independent, so the DuckDB twin
    hash-matches bit-for-bit.

    ``ds`` is consumed twice (cell pass + row pass) and is
    materialized here so its upstream runs once — pass a PRUNED
    projection (id, key, ts, value only).
    """
    bucket_us = int(bucket_s) * 1_000_000

    def project(batch: pd.DataFrame) -> pa.Table:
        ts = _ts_us(batch[ts_col]).to_numpy()
        n = len(batch)
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_ts": pa.array(ts, pa.int64()),
                "_one": pa.array(np.ones(n, dtype=np.int64), pa.int64()),
                "_cents": pa.array(
                    np.floor(
                        batch[value_col].to_numpy(dtype=np.float64)
                        * 100.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "_tb": pa.array(ts // bucket_us, pa.int64()),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas").materialize()
    if n_shards is None:
        n_shards = max(32, (rows.count()) // 200_000)

    def finish(m: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                id_col: pa.array(
                    m[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    m[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "cum_n": pa.array(
                    m["cum__one"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "cum_cents": pa.array(
                    m["cum__cents"].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "cum_n": pa.array([], pa.int64()),
            "cum_cents": pa.array([], pa.int64()),
        }
    )
    return keyed_prefix_scan(
        rows, key_col, id_col, ["_one", "_cents"], finish, empty_out,
        n_shards,
    )


def keyed_cell_scan(rows, key_col: str, id_col: str, candidates,
                    make_carries, apply_cell, empty_out,
                    n_shards: int):
    """Generic skew-safe per-key ORDERED-STREAM scan with a small
    carry packet exchanged once per (key, time-bucket) cell — the
    NON-ADDITIVE sibling of ``keyed_prefix_scan``, shared by the
    lag/throttle/late/attribution/rolling-median family.  No key's
    full stream ever lands in one group: a shard group holds one
    bucket-width of one key's rows plus an O(1) carry, bounded by
    event rate x bucket width, never by key cardinality (the
    ``rolling_range_window`` contract).

    ``rows``: MATERIALIZED narrow Dataset with columns
    ``[id_col, key_col, "_tb", "_ord", *op value cols]`` (``_tb`` =
    cell bucket, ``_ord`` = in-cell order scalar; both int64).
    Three passes:

    1. ``candidates(batch)`` reduces each batch to the per-(key,
       _tb) rows that could matter to LATER cells (a w-row tail, an
       argmax, a last-match) — same schema, a few rows per cell per
       batch; correctness needs only that every row of the TRUE
       per-cell summary survives its own batch's reduction;
    2. a key-sharded pass folds each key's candidates in (_tb, _ord,
       id) order and ``make_carries(per-kshard candidate df)`` emits
       one carry packet per RECEIVING cell (rows tagged ``_tb`` =
       the target cell) = everything that cell needs from all
       earlier cells;
    3. rows and carries co-shuffle on ``hash(key, _tb)``;
       ``apply_cell(own_sorted_df, carry_sorted_df)`` closes each
       cell vectorized and returns a pyarrow Table (or None).
    """
    schema = rows.schema().base_schema
    names = schema.names

    # FINE-GRAINED shard value spaces (not the partition count): Ray's
    # sort range-partitions by sampled boundaries, so partition count
    # and balance come from the DATA, while equal shard values — whole
    # cells / whole keys — never split.  A coarse space (e.g. 32
    # values) risks empty range partitions (schema-less pandas blocks
    # inside the sort -> executor schema warnings); a fine space keeps
    # every sampled range occupied.  ``n_shards`` still scales the
    # space with input size so cells spread at any scale.
    kshard_space = max(65_536, n_shards * 64)
    shard_space = max(65_536, n_shards * 256)

    def synth(group: pd.DataFrame) -> pa.Table:
        out = None
        if len(group):
            g = group.sort_values(
                [key_col, "_tb", "_ord", id_col]
            ).reset_index(drop=True)
            out = make_carries(g)
        if out is None or len(out) == 0:
            arrs = {f.name: pa.array([], f.type) for f in schema}
            n = 0
            shard = np.array([], dtype=np.int64)
        else:
            arrs = {
                f.name: pa.array(out[f.name], f.type) for f in schema
            }
            n = len(out)
            shard = _cell_shard(
                out[key_col].to_numpy(dtype=np.int64),
                out["_tb"].to_numpy(dtype=np.int64),
                shard_space,
            )
        t = pa.table(arrs)
        return t.append_column(
            "_is_off", pa.array(np.ones(n, dtype=np.bool_), pa.bool_())
        ).append_column("_shard", pa.array(shard, pa.int64()))

    def cand_arrow(batch: pd.DataFrame) -> pa.Table:
        # Arrow into the shuffle: empty sort partitions keep their
        # schema (pandas blocks can't unify empty schemas — _arrow)
        return _arrow(
            _key_shard_col(candidates(batch), key_col, kshard_space)
        )

    # sort + whole-block map instead of groupby().map_groups: the
    # same co-location guarantee (map_groups is itself sort +
    # batch_size=None map), but empty partitions return a TYPED empty
    # table — map_groups' zero-group generator emits schema-less
    # blocks that trip the executor's schema-unification warning
    carries = (
        rows.map_batches(cand_arrow, batch_format="pandas")
        .sort("_kshard")
        .map_batches(synth, batch_format="pandas", batch_size=None)
    )

    def tag(batch: pd.DataFrame) -> pa.Table:
        t = pa.table(
            {f.name: pa.array(batch[f.name], f.type) for f in schema}
        )
        n = len(batch)
        shard = _cell_shard(
            batch[key_col].to_numpy(dtype=np.int64),
            batch["_tb"].to_numpy(dtype=np.int64),
            shard_space,
        )
        return t.append_column(
            "_is_off",
            pa.array(np.zeros(n, dtype=np.bool_), pa.bool_()),
        ).append_column("_shard", pa.array(shard, pa.int64()))

    unioned = rows.map_batches(tag, batch_format="pandas").union(
        carries
    )

    def scan_shard(group: pd.DataFrame) -> pa.Table:
        if len(group) == 0:
            return empty_out
        own = group[~group["_is_off"]].sort_values(
            [key_col, "_tb", "_ord", id_col]
        )
        if len(own) == 0:
            return empty_out
        carry = group[group["_is_off"]].sort_values(
            [key_col, "_tb", "_ord", id_col]
        )
        carry_map = {
            kt: sub[names]
            for kt, sub in carry.groupby([key_col, "_tb"], sort=False)
        }
        keys = own[key_col].to_numpy()
        buckets = own["_tb"].to_numpy()
        change = np.empty(len(own), dtype=np.bool_)
        change[0] = True
        change[1:] = (keys[1:] != keys[:-1]) | (
            buckets[1:] != buckets[:-1]
        )
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(own))
        pieces = []
        for s, e in zip(starts, ends):
            cell = own.iloc[s:e]
            c = carry_map.get((keys[s], buckets[s]))
            t = apply_cell(cell, c)
            if t is not None and len(t):
                pieces.append(t)
        if not pieces:
            return empty_out
        return pa.concat_tables(pieces)

    return unioned.sort("_shard").map_batches(
        scan_shard, batch_format="pandas", batch_size=None
    )


def _tail_candidates(key_col: str, id_col: str, w: int):
    """Per-batch reducer for tail-carry ops: keep each (key, _tb)
    cell's LAST ``w`` rows under the (_ord, id) order — any row of
    the true cell tail is within its own batch's last ``w``."""
    def cand(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values([key_col, "_tb", "_ord", id_col])
        pos = g.groupby(
            [key_col, "_tb"], sort=False
        ).cumcount(ascending=False)
        return g[pos < w]

    return cand


def _tail_carries(key_col: str, id_col: str, w: int):
    """Per-key carry synthesis for tail ops: walking each key's
    cells in _tb order, the carry into cell c is the last ``w`` rows
    of everything earlier — re-tagged with ``_tb = c``."""
    def make(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _k, sub in g.groupby(key_col, sort=False):
            tbs = sub["_tb"].to_numpy()
            cell_start = np.flatnonzero(
                np.concatenate(([True], tbs[1:] != tbs[:-1]))
            )
            if len(cell_start) < 2:
                continue
            cell_end = np.append(cell_start[1:], len(sub))
            tail = None
            for i in range(len(cell_start) - 1):
                seg = sub.iloc[cell_start[i]:cell_end[i]]
                tail = (
                    seg if tail is None
                    else pd.concat([tail, seg])
                ).tail(w)
                packet = tail.copy()
                packet["_tb"] = tbs[cell_start[i + 1]]
                outs.append(packet)
        if not outs:
            return g.iloc[0:0]
        return pd.concat(outs, ignore_index=True)

    return make

def grouping_sets_aggregate(ds, keys: list[str],
                            sets: list[list[str]],
                            aggs: dict[str, tuple[str, str]],
                            all_label: str = "ALL"):
    """GROUP BY GROUPING SETS / CUBE in ONE shuffle — the general
    sibling of ``rollup_aggregate`` above (same fan-out-then-share-
    the-groupby shape): each batch emits one PARTIAL row per grouping
    set with the set's absent keys collapsed to ``all_label``,
    pre-aggregated inside the batch, so the shuffle carries
    (#sets x distinct key tuples per batch) stub rows, never input
    rows.  Keys must be string-typed.  Pass
    ``sets=[[...all subsets...]]`` for CUBE (use ``cube_sets``)."""
    set_keys = [frozenset(s) for s in sets]

    def fan_out(batch: pd.DataFrame) -> pd.DataFrame:
        pieces = []
        for s in set_keys:
            b = batch.copy()
            for k in keys:
                if k not in s:
                    b[k] = all_label
            g = b.groupby(keys, as_index=False, sort=False)
            merged = None
            for out_col, (in_col, fn) in aggs.items():
                if fn == "count":
                    piece = g.size().rename(columns={"size": out_col})
                else:
                    piece = getattr(g[in_col], fn)().rename(
                        columns={in_col: out_col}
                    )
                merged = (
                    piece if merged is None
                    else merged.merge(piece, on=keys)
                )
            pieces.append(merged)
        return _arrow(pd.concat(pieces, ignore_index=True))

    from ray.data.aggregate import Max, Min, Sum

    finishers = []
    for out_col, (_in, fn) in aggs.items():
        if fn in ("sum", "count"):
            finishers.append(Sum(out_col, alias_name=out_col))
        elif fn == "min":
            finishers.append(Min(out_col, alias_name=out_col))
        elif fn == "max":
            finishers.append(Max(out_col, alias_name=out_col))
    return (
        ds.map_batches(fan_out, batch_format="pandas")
        .groupby(keys)
        .aggregate(*finishers)
    )


def cube_sets(keys: list[str]) -> list[list[str]]:
    """All 2^k grouping sets of ``keys`` (CUBE)."""
    from itertools import combinations

    return [
        list(c)
        for r in range(len(keys), -1, -1)
        for c in combinations(keys, r)
    ]


def align_union(datasets, fill=None):
    """UNION ALL BY NAME across Datasets with HETEROGENEOUS schemas —
    the schema-evolution case (a crawl whose later shards grew
    columns).  Ray's ``union`` requires identical schemas; this
    computes the unified schema (name -> first seen Arrow type,
    conflicts promoted via ``pa.unify_schemas``), then pads each
    dataset per batch with typed nulls — a zero-shuffle map on every
    branch.  Column order follows first appearance across inputs."""
    import pyarrow as pa

    schemas = [ds.schema().base_schema for ds in datasets]
    fields: dict[str, pa.Field] = {}
    for s in schemas:
        for f in s:
            if f.name in fields and not fields[f.name].type.equals(
                f.type
            ):
                fields[f.name] = pa.field(
                    f.name,
                    pa.unify_schemas(
                        [
                            pa.schema([fields[f.name]]),
                            pa.schema([pa.field(f.name, f.type)]),
                        ],
                        promote_options="permissive",
                    ).field(0).type,
                )
            elif f.name not in fields:
                fields[f.name] = f
    unified = pa.schema(list(fields.values()))

    def pad(batch: pa.Table) -> pa.Table:
        cols = []
        for f in unified:
            if f.name in batch.column_names:
                cols.append(batch.column(f.name).cast(f.type))
            else:
                cols.append(pa.nulls(batch.num_rows, f.type))
        return pa.table(dict(zip(unified.names, cols)))

    padded = [
        ds.map_batches(pad, batch_format="pyarrow") for ds in datasets
    ]
    out = padded[0]
    for nxt in padded[1:]:
        out = out.union(nxt)
    return out


def ewma_by(ds, key_col: str, ts_col: str, value_col: str,
            id_col: str, tau_s: float, bucket_s: int = 86_400,
            n_shards: int | None = None, ndigits: int = 6):
    """Per-key irregular-time EWMA at every row —
    ``s_i = v_i + exp(-(t_i - t_{i-1})/tau) * s_{i-1}`` — via the
    identity ``s_i = exp(-(t_i - t0)/tau) * cumsum(v_j *
    exp((t_j - t0)/tau))``: the decayed state IS a per-key prefix sum
    of time-weighted values, so it runs on the shared
    ``keyed_prefix_scan`` engine with float weights.  ``t0`` is the
    per-KEY minimum timestamp (first event), keeping ``exp``
    arguments bounded by the key's own time span / tau.

    Floats fold in a fixed engine order but a different association
    than the SQL window twin; results round to ``ndigits`` so the
    compare is stable.  No one-key-per-group assumption.
    """
    tau_us = float(tau_s) * 1e6
    bucket_us = int(bucket_s) * 1_000_000

    def project(batch: pd.DataFrame) -> pa.Table:
        ts = _ts_us(batch[ts_col]).to_numpy()
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_ts": pa.array(ts, pa.int64()),
                "_v": pa.array(
                    batch[value_col].to_numpy(dtype=np.float64),
                    pa.float64(),
                ),
                "_tb": pa.array(ts // bucket_us, pa.int64()),
            }
        )

    raw = ds.map_batches(project, batch_format="pandas").materialize()
    if n_shards is None:
        n_shards = max(32, raw.count() // 200_000)

    # per-key t0 (first event) — tiny table, broadcast to weighting
    t0 = bucketed_aggregate(
        raw, [key_col],
        {"_t0": ("_ts", "min"), "_t1": ("_ts", "max")},
    ).to_pandas()
    # exp((t - t0)/tau) overflows float64 past ~709*tau — and a CELL
    # SUM of such weights overflows far earlier (a burst of large
    # values near the span end multiplies e^{span/tau} by the burst
    # mass), so the reroute threshold is 80, not 700: t0-path weights
    # then cap at e^80 ~ 5.5e34, leaving ~1e273 of summing headroom.
    # Keys past it take the per-bucket-anchored carry path
    # (_ewma_anchored) where every exp argument is bounded by one
    # bucket width; short-span keys keep the t0 identity, which is
    # the exact structural twin of the SQL-window oracle.
    span = (t0["_t1"] - t0["_t0"]).to_numpy(dtype=np.float64)
    over_mask = span / tau_us > 80.0
    long_part = None
    if over_mask.any():
        over_keys = t0.loc[over_mask, key_col].to_numpy(
            dtype=np.int64
        )
        long_part = _ewma_anchored(
            _filter_keys(raw, key_col, over_keys, keep=True),
            key_col, id_col, tau_us, n_shards, ndigits,
        )
        if bool(over_mask.all()):
            return long_part
        raw = _filter_keys(
            raw, key_col, over_keys, keep=False
        ).materialize()
        t0 = t0.loc[~over_mask]
    import ray

    t0_ref = ray.put(
        pd.Series(
            t0["_t0"].to_numpy(dtype=np.int64),
            index=t0[key_col].to_numpy(dtype=np.int64),
        )
    )

    class Weight:
        """Attach w = v * exp((t - t0_key)/tau) once per row."""

        def __init__(self, ref):
            self.t0 = _broadcast_fetch(ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            keys = batch[key_col].to_numpy()
            ts = batch["_ts"].to_numpy()
            # vectorized hash lookup (C); a join replaces the
            # broadcast when key cardinality outgrows one worker
            t0v = self.t0.reindex(keys).to_numpy(dtype=np.int64)
            w = batch["_v"].to_numpy() * np.exp(
                (ts - t0v) / tau_us
            )
            return pa.table(
                {
                    id_col: pa.array(
                        batch[id_col].to_numpy(), pa.int64()
                    ),
                    key_col: pa.array(keys, pa.int64()),
                    "_ts": pa.array(ts, pa.int64()),
                    "_w": pa.array(w, pa.float64()),
                    "_tb": pa.array(batch["_tb"].to_numpy(), pa.int64()),
                    "_t0": pa.array(t0v, pa.int64()),
                }
            )

    weighted = raw.map_batches(
        Weight, batch_format="pandas", concurrency=(1, 8),
        fn_constructor_args=(t0_ref,),
    ).materialize()

    def finish(m: pd.DataFrame) -> pa.Table:
        ewma = m["cum__w"].to_numpy() * np.exp(
            -(m["_ts"].to_numpy() - m["_t0"].to_numpy()) / tau_us
        )
        return pa.table(
            {
                id_col: pa.array(
                    m[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    m[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "ewma": pa.array(np.round(ewma, ndigits), pa.float64()),
            }
        )

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "ewma": pa.array([], pa.float64()),
        }
    )
    short_part = keyed_prefix_scan(
        weighted, key_col, id_col, ["_w"], finish, empty_out, n_shards
    )
    if long_part is None:
        return short_part
    return short_part.union(long_part)


def _filter_keys(ds, key_col: str, keys: np.ndarray, keep: bool):
    """Membership filter on an int64 key column against a (small)
    key array shipped once via ``ray.put`` — the overflow-key set is
    a handful of bot/system streams, never corpus-sized."""
    import ray

    ref = ray.put(np.sort(keys.astype(np.int64)))

    class Member:
        def __init__(self, ref, keep):
            self.keys = _broadcast_fetch(ref)
            self.keep = keep

        def __call__(self, batch: pa.Table) -> pa.Table:
            col = batch.column(key_col).to_numpy(zero_copy_only=False)
            hit = np.isin(col, self.keys, assume_unique=False)
            return batch.filter(
                pa.array(hit if self.keep else ~hit)
            )

    return ds.map_batches(
        Member, batch_format="pyarrow", concurrency=(1, 8),
        fn_constructor_args=(ref, keep),
    )


def _ewma_anchored(raw, key_col: str, id_col: str, tau_us: float,
                   n_shards: int, ndigits: int):
    """EWMA for keys whose time span exceeds float64's ~709*tau exp
    range: anchor weights at each row's own TIME-BUCKET start instead
    of the key's t0, and carry the decayed state between buckets —
    ``C_b = (C_{b-1} + P_{b-1}) * exp(-(T_b - T_{b-1})/tau)`` where
    ``P_b`` is the bucket's partial sum of bucket-anchored weights.
    Every exp argument is then bounded by one bucket width / tau
    (buckets are sized to 80*tau below), so no intermediate can
    overflow however long the stream runs; between-bucket gaps only
    ever *underflow* to 0, which is the mathematically correct
    fully-decayed state.

    Same skew-safe cell decomposition as ``keyed_prefix_scan``: the
    carry recurrence runs over the tiny (key, bucket) CELL table
    (rows = active key-days, not events), and events only ever sort
    within their own ``hash(key, bucket)`` shard.
    """
    eff = max(1, int(80.0 * tau_us))  # bucket width: exp arg <= 80

    def reweight(batch: pd.DataFrame) -> pa.Table:
        ts = batch["_ts"].to_numpy()
        tb = ts // eff
        w = batch["_v"].to_numpy() * np.exp(
            (ts - tb * eff) / tau_us
        )
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
                "_ts": pa.array(ts, pa.int64()),
                "_tb": pa.array(tb, pa.int64()),
                "_w": pa.array(w, pa.float64()),
            }
        )

    rows = raw.map_batches(
        reweight, batch_format="pandas"
    ).materialize()

    cells = bucketed_aggregate(
        rows, [key_col, "_tb"], {"_p": ("_w", "sum")}
    )

    def key_carry(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([key_col, "_tb"])
        keys = g[key_col].to_numpy()
        tb = g["_tb"].to_numpy()
        p = g["_p"].to_numpy(dtype=np.float64)
        carry = np.zeros(len(g), dtype=np.float64)
        # loop over CELLS (active key-buckets), never over events
        for i in range(1, len(g)):
            if keys[i] == keys[i - 1]:
                carry[i] = (carry[i - 1] + p[i - 1]) * np.exp(
                    -float(tb[i] - tb[i - 1]) * eff / tau_us
                )
        return pa.table(
            {
                id_col: pa.array(
                    np.full(len(g), -1, dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(keys, pa.int64()),
                "_ts": pa.array(
                    np.zeros(len(g), dtype=np.int64), pa.int64()
                ),
                "_tb": pa.array(tb, pa.int64()),
                "_w": pa.array(carry, pa.float64()),
                "_is_off": pa.array(
                    np.ones(len(g), dtype=np.bool_), pa.bool_()
                ),
                "_shard": pa.array(_cell_shard(keys, tb, n_shards), pa.int64()),
            }
        )

    offsets = (
        cells.map_batches(
            _key_shard_col, batch_format="pandas",
            fn_kwargs={"key_col": key_col,
                       "n": max(32, n_shards // 4)},
        )
        .groupby("_kshard")
        .map_groups(key_carry, batch_format="pandas")
    )

    def tag(batch: pd.DataFrame) -> pa.Table:
        keys = batch[key_col].to_numpy()
        tb = batch["_tb"].to_numpy()
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(), pa.int64()
                ),
                key_col: pa.array(keys, pa.int64()),
                "_ts": pa.array(batch["_ts"].to_numpy(), pa.int64()),
                "_tb": pa.array(tb, pa.int64()),
                "_w": pa.array(batch["_w"].to_numpy(), pa.float64()),
                "_is_off": pa.array(
                    np.zeros(len(batch), dtype=np.bool_), pa.bool_()
                ),
                "_shard": pa.array(_cell_shard(keys, tb, n_shards), pa.int64()),
            }
        )

    unioned = rows.map_batches(tag, batch_format="pandas").union(
        offsets
    )

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "ewma": pa.array([], pa.float64()),
        }
    )

    def scan_shard(group: pd.DataFrame) -> pa.Table:
        own = group[~group["_is_off"]].sort_values(
            [key_col, "_tb", "_ts", id_col]
        )
        if len(own) == 0:
            return empty_out
        keys = own[key_col].to_numpy()
        tb = own["_tb"].to_numpy()
        w = own["_w"].to_numpy(dtype=np.float64)
        new = np.empty(len(own), dtype=np.bool_)
        new[0] = True
        new[1:] = (keys[1:] != keys[:-1]) | (tb[1:] != tb[:-1])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(own)))
        # cumsum PER SEGMENT (loop over cells, vectorized within):
        # a global cumsum + start-offset subtraction catastrophically
        # cancels when an earlier cell holds e^{~80}-scale weights —
        # the next cell's small values are absorbed and come back 0
        cum = np.empty_like(w)
        for s0, ln in zip(starts, lens):
            cum[s0:s0 + ln] = np.cumsum(w[s0:s0 + ln])
        carry = group[group["_is_off"]][[key_col, "_tb", "_w"]]
        m = own[[id_col, key_col, "_tb", "_ts"]].merge(
            carry, on=[key_col, "_tb"], how="left", sort=False,
            suffixes=("", "_c"),
        )
        c = m["_w"].fillna(0.0).to_numpy(dtype=np.float64)
        ewma = np.exp(
            -(m["_ts"].to_numpy() - m["_tb"].to_numpy() * eff)
            / tau_us
        ) * (cum + c)
        return pa.table(
            {
                id_col: pa.array(
                    m[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    m[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "ewma": pa.array(np.round(ewma, ndigits), pa.float64()),
            }
        )

    return unioned.groupby("_shard").map_groups(
        scan_shard, batch_format="pandas"
    )


def hist_quantile_disc_by(hist, key_col: str, value_col: str,
                          cnt_col: str, qs: list[float],
                          n_buckets: int = 32):
    """Exact per-key DISCRETE quantiles (DuckDB ``quantile_disc(q)``
    = inverse CDF: the element at ``ceil(q * n) - 1``; coincides with
    ``floor(q * (n-1))`` only at q=0.5) for several ``qs`` at once,
    from a (key, value, count) histogram — the multi-q generalization
    of ``hist_median_by`` (same bounded-by-distinct-values shuffle,
    same vectorized rank pick).  Output: one row per key with columns
    ``q_<q written without the dot>`` per quantile plus ``n``."""
    names = [f"q_{str(q).replace('.', '')}" for q in qs]

    def pick(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([key_col, value_col]).reset_index(
            drop=True
        )
        cnt = g[cnt_col].to_numpy(dtype=np.int64)
        grp = g.groupby(key_col, sort=False)
        n = grp[cnt_col].transform("sum").to_numpy(dtype=np.int64)
        cum = grp[cnt_col].cumsum().to_numpy(dtype=np.int64)
        before = cum - cnt
        keys = g[key_col].to_numpy()
        new = np.empty(len(g), dtype=np.bool_)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        out = g.loc[new, [key_col]].reset_index(drop=True)
        out["n"] = n[new]
        for q, name in zip(qs, names):
            target = np.maximum(
                np.ceil(n * q).astype(np.int64) - 1, 0
            )
            hit = (before <= target) & (target < cum)
            out[name] = g.loc[hit, value_col].to_numpy()
        return _arrow(out)

    def bucketize(batch: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch[key_col], index=False
        ).to_numpy()
        batch["_mb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return _arrow(batch)

    return (
        hist.map_batches(bucketize, batch_format="pandas")
        .groupby("_mb")
        .map_groups(pick, batch_format="pandas")
    )


def grouped_quantile_cont(ds, key_col: str, value_col: str,
                          qs: list[float], ndigits: int = 6,
                          n_buckets: int = 32):
    """Exact per-key CONTINUOUS (interpolated) quantiles — DuckDB
    ``quantile_cont(v, q)``: with r = q * (n - 1), the result is
    v[floor(r)] + (v[ceil(r)] - v[floor(r)]) * frac over the sorted
    values.  Same decomposition as ``hist_quantile_disc_by``: one
    distributed ``bucketed_aggregate`` collapses the stream to a
    per-(key, value) histogram (shuffle bounded by distinct values,
    never a key's row count), then a vectorized rank pick per
    key-hash bucket finds BOTH bracketing order statistics and
    interpolates.  Results round to ``ndigits`` (the interpolation
    expression may differ from the twin's by 1 ulp).

    Output: one row per key with ``n`` plus ``q_<q sans dot>`` per
    quantile.
    """
    hist = bucketed_aggregate(
        ds, [key_col, value_col], {"_cnt": (value_col, "count")}
    )
    names = [f"q_{str(q).replace('.', '')}" for q in qs]

    def pick(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([key_col, value_col]).reset_index(
            drop=True
        )
        cnt = g["_cnt"].to_numpy(dtype=np.int64)
        grp = g.groupby(key_col, sort=False)
        n = grp["_cnt"].transform("sum").to_numpy(dtype=np.int64)
        cum = grp["_cnt"].cumsum().to_numpy(dtype=np.int64)
        before = cum - cnt
        v = g[value_col].to_numpy(dtype=np.float64)
        keys = g[key_col].to_numpy()
        new = np.empty(len(g), dtype=np.bool_)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        out = g.loc[new, [key_col]].reset_index(drop=True)
        out["n"] = n[new]
        for q, name in zip(qs, names):
            r = q * (n - 1).astype(np.float64)
            lo_rank = np.floor(r).astype(np.int64)
            hi_rank = np.ceil(r).astype(np.int64)
            lo_hit = (before <= lo_rank) & (lo_rank < cum)
            hi_hit = (before <= hi_rank) & (hi_rank < cum)
            lo = v[lo_hit.nonzero()[0]]
            hi = v[hi_hit.nonzero()[0]]
            frac = (r - lo_rank)[new]
            out[name] = np.round(lo + (hi - lo) * frac, ndigits)
        return _arrow(out)

    def bucketize(batch: pd.DataFrame) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch[key_col], index=False
        ).to_numpy()
        batch["_mb"] = (h % np.uint64(n_buckets)).astype(np.int64)
        return _arrow(batch)

    return (
        hist.map_batches(bucketize, batch_format="pandas")
        .groupby("_mb")
        .map_groups(pick, batch_format="pandas")
    )


def global_row_number(ds, sort_cols: list[str], out_col: str = "rn",
                      start: int = 1):
    """Stable global row numbers over a total order — the distributed
    ``row_number() OVER (ORDER BY ...)``, zipWithIndex-shaped: one
    range-partitioning sort, then per-block offsets computed from a
    #blocks-row summary pass (first-key + count per block) and looked
    up BY KEY, not by block id — the offset table is O(#blocks) on
    the driver and broadcasts once.

    Contract: ``sort_cols`` must be a UNIQUE key (append the row id
    as the last column) — uniqueness is what lets a block's first-row
    key identify its global rank range.  Both passes map whole blocks
    (``batch_size=None``) of the SAME materialized sorted dataset, so
    the block decomposition is identical by construction."""
    import ray

    sorted_ds = ds.sort(sort_cols).materialize()

    def head_row(batch: pa.Table) -> pa.Table:
        t = batch.select(sort_cols).slice(0, 1)
        return t.append_column("_n", pa.array([len(batch)], pa.int64()))

    heads = sorted_ds.map_batches(
        head_row, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values(sort_cols).reset_index(drop=True)
    offsets = np.concatenate(
        [[0], heads["_n"].to_numpy(np.int64).cumsum()[:-1]]
    ) + np.int64(start)
    table = {
        tuple(row): int(off)
        for row, off in zip(
            heads[sort_cols].itertuples(index=False, name=None),
            offsets,
        )
    }
    table_ref = ray.put(table)

    class Number:
        def __init__(self):
            self.table = ray.get(table_ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            first = tuple(batch.iloc[0][sort_cols])
            off = self.table[first]
            out = batch.copy()
            out[out_col] = np.arange(
                off, off + len(batch), dtype=np.int64
            )
            return _arrow(out)

    return sorted_ds.map_batches(
        Number, batch_format="pandas", batch_size=None,
        concurrency=(1, 8),
    )


def sorted_neighborhood_join(ds, key_expr, window: int = 5,
                             max_dist: int = 4,
                             id_column: str = "doc_id") -> pd.DataFrame:
    """Sorted Neighborhood Method (Hernandez & Stolfo 1995) candidate
    join: sort by a blocking key, compare each row to the next
    ``window`` rows in rank order, keep pairs within Levenshtein
    ``max_dist`` on the key.  The classic entity-resolution
    complement to q-gram blocking — catches near-keys that share no
    q-gram prefix but sort adjacently.

    Distributed shape: ``global_row_number`` (one sort + a #blocks
    summary), then every row fans out to rank buckets ``rn//window``
    and ``rn//window - 1`` so any pair within ``window`` co-locates;
    pairs are generated only in the bucket owning the smaller rank,
    so no cross-bucket dedup pass is needed.  The shuffle carries
    (id, short key, rn) rows — never documents."""
    from unfurl_ray.ops.dedup import _lev_leq

    keyed = ds.map_batches(
        lambda b: key_expr(b), batch_format="pyarrow"
    )
    numbered = global_row_number(keyed, ["s", id_column])

    def fan_out(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy()
        g = rn // window
        both = pa.concat_tables(
            [
                batch.append_column("_g", pa.array(g, pa.int64())),
                batch.append_column("_g", pa.array(g - 1, pa.int64())),
            ]
        )
        return both

    def pairs_in_bucket(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("rn", kind="mergesort")
        bucket = int(g["_g"].iloc[0])
        rn = g["rn"].to_numpy(np.int64)
        ids = g[id_column].to_numpy(np.int64)
        keys = g["s"].to_numpy()
        out_a, out_b, out_d = [], [], []
        for i in range(len(g)):
            if rn[i] // window != bucket:
                continue  # the copy fanned down owns no pairs here
            for j in range(i + 1, len(g)):
                if rn[j] == rn[i]:
                    continue  # the same row's two fan-out copies
                if rn[j] - rn[i] > window:
                    break
                d = _lev_leq(keys[i], keys[j], max_dist)
                if d <= max_dist:
                    a, b = int(ids[i]), int(ids[j])
                    out_a.append(min(a, b))
                    out_b.append(max(a, b))
                    out_d.append(d)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    out = (
        numbered.map_batches(fan_out, batch_format="pyarrow")
        .groupby("_g")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def unpivot(ds, id_cols: list[str], value_cols: list[str],
            name_col: str = "name", value_col: str = "value"):
    """UNPIVOT / melt: wide columns -> (id..., name, value) long rows.
    Purely batch-local (each output row derives from one input row),
    so it composes with any upstream without a shuffle; the fan-out
    is len(value_cols) x rows, vectorized as one concat per column."""

    def melt(batch: pd.DataFrame) -> pa.Table:
        long = batch.melt(
            id_vars=id_cols, value_vars=value_cols,
            var_name=name_col, value_name=value_col,
        )
        return _arrow(long)

    return ds.map_batches(melt, batch_format="pandas")


def collapse_runs(ds, key_col: str, val_col: str, order_cols: list[str],
                  ts_col: str | None = None):
    """Distributed run-length encoding (gaps-and-islands collapse):
    maximal runs of consecutive equal ``val_col`` per ``key_col`` under
    the total order ``order_cols`` -> one row per run
    ``(key, val, run_len, start_ts, end_ts)``.  The repeated-action
    collapse a transcript/event pipeline uses to spot tool-call loops,
    stuck agents and bot bursts.

    Distributed shape (the ``global_row_number`` layout): ONE
    range-partitioning sort on ``(key,) + order_cols`` (a unique key —
    required, as in ``global_row_number``), then two whole-block map
    passes over the SAME materialized sorted dataset: a #blocks-row
    head summary assigns each block an ordinal by its first-row key,
    and a second pass RLE-encodes each block vectorized (boundary =
    key change | value change).  Runs are block-local, so each block's
    FIRST and LAST runs may continue across block edges: those edge
    stubs (exactly <= 2 per block) come back to the driver, are
    stitched by ordinal adjacency + (key, val) equality — a chain
    through single-run blocks keeps merging — and union back with the
    untouched interior runs.  The driver never holds more than
    O(#blocks) rows; events move only in the sort."""
    import ray

    ts_col = ts_col or order_cols[0]
    sort_cols = [key_col] + list(order_cols)
    sorted_ds = ds.sort(sort_cols).materialize()

    def head_row(batch: pa.Table) -> pa.Table:
        t = batch.select(sort_cols).slice(0, 1)
        return t.append_column("_n", pa.array([len(batch)], pa.int64()))

    heads = sorted_ds.map_batches(
        head_row, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values(sort_cols).reset_index(drop=True)
    ordinal = {
        tuple(row): i
        for i, row in enumerate(
            heads[sort_cols].itertuples(index=False, name=None)
        )
    }
    ord_ref = ray.put(ordinal)

    class BlockRLE:
        def __init__(self):
            self.ordinal = ray.get(ord_ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            blk = self.ordinal[tuple(batch.iloc[0][sort_cols])]
            k = batch[key_col].to_numpy()
            v = batch[val_col].to_numpy()
            new = np.ones(len(batch), dtype=bool)
            new[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
            rid = np.cumsum(new) - 1
            g = batch.assign(_rid=rid).groupby("_rid", sort=True)
            runs = pd.DataFrame(
                {
                    key_col: g[key_col].first(),
                    val_col: g[val_col].first(),
                    "run_len": g.size().astype("int64"),
                    "start_ts": g[ts_col].first(),
                    "end_ts": g[ts_col].last(),
                }
            ).reset_index(drop=True)
            n = len(runs)
            runs["_blk"] = np.int64(blk)
            runs["_first"] = np.arange(n) == 0
            runs["_last"] = np.arange(n) == n - 1
            return _arrow(runs)

    runs = sorted_ds.map_batches(
        BlockRLE, batch_format="pandas", batch_size=None,
        concurrency=(1, 8),
    ).materialize()

    helper = ["_blk", "_first", "_last"]
    interior = runs.filter(
        expr="_first == False and _last == False"
    ).drop_columns(helper)

    edges = runs.filter(
        expr="_first == True or _last == True"
    ).to_pandas().sort_values(["_blk", "_first"], ascending=[True, False])

    out_rows: list[dict] = []
    for row in edges.to_dict("records"):
        prev = out_rows[-1] if out_rows else None
        if (
            prev is not None
            and prev["_last"]
            and row["_first"]
            and prev["_blk"] + 1 == row["_blk"]
            and prev[key_col] == row[key_col]
            and prev[val_col] == row[val_col]
        ):
            prev["run_len"] += row["run_len"]
            prev["end_ts"] = row["end_ts"]
            # the chain continues past this block only if this run
            # also closed it
            prev["_blk"] = row["_blk"]
            prev["_last"] = row["_last"]
        else:
            out_rows.append(dict(row))

    stitched = pd.DataFrame(out_rows).drop(columns=helper) if out_rows \
        else pd.DataFrame(
            {c: pd.Series([], dtype=d)
             for c, d in zip(
                 [key_col, val_col, "run_len", "start_ts", "end_ts"],
                 ["int64", "object", "int64",
                  "datetime64[us]", "datetime64[us]"])}
        )
    # round-tripping rows through Python re-infers ns timestamps;
    # restore the source dtypes so the union is schema-stable
    for c in stitched.columns:
        if len(edges) and stitched[c].dtype != edges[c].dtype:
            stitched[c] = stitched[c].astype(edges[c].dtype)
    return interior.union(ray.data.from_arrow(_arrow(stitched)))


def weighted_quantile(ds, value_col: str, weight_col: str,
                      q: float = 0.5) -> dict:
    """Exact weighted quantile: the smallest value v with cumulative
    weight(<= v) >= q * total_weight — weighted median for q = 0.5
    (token-budget medians, cost-weighted SLOs).

    Selection-by-prefix, not a global collect: the (value, weight)
    HISTOGRAM (one row per distinct value, pre-aggregated per batch)
    range-sorts once; a #blocks-row head pass gives the driver each
    block's weight subtotal, which identifies the single OWNER block
    whose range crosses the target; one more whole-block pass has the
    owner emit the answer row vectorized and everyone else emit
    nothing.  Driver state: O(#blocks) heads + 3 scalars.

    With non-integral weights the driver's block subtotals (Arrow
    sum) and the owner block's in-block numpy cumsum can differ in
    the last ulp, so the target may land one row past the owner's
    range; the owner then emits nothing and the driver retries on the
    next block — exact for any weights, at worst one extra pass in
    that pathological case.

    Returns ``{"value": v, "cum_weight": w<=v, "total_weight": W}``."""
    hist = bucketed_aggregate(
        ds.select_columns([value_col, weight_col]),
        [value_col], {"w": (weight_col, "sum")},
    ).sort(value_col).materialize()

    heads = block_heads(hist, value_col, ["w"])
    total = float(heads["w"].sum())
    if total <= 0 or len(heads) == 0:
        return {"value": float("nan"), "cum_weight": 0.0,
                "total_weight": total}
    target = q * total
    ends = heads["w"].to_numpy(np.float64).cumsum()
    k = int(np.searchsorted(ends, target))  # first block reaching it
    k = min(k, len(ends) - 1)

    def pick_pass(owner: float, off: float, last: bool) -> pd.DataFrame:
        # three scalars: pickle into the task closure, no object store
        def pick(batch: pd.DataFrame) -> pa.Table:
            empty = pa.table(
                {
                    "value": pa.array([], pa.float64()),
                    "cum_weight": pa.array([], pa.float64()),
                }
            )
            if len(batch) == 0:
                return empty
            o, base, tgt = owner, off, target
            if float(batch[value_col].iloc[0]) != o:
                return empty
            cw = base + batch["w"].to_numpy(np.float64).cumsum()
            i = int(np.searchsorted(cw, tgt))
            if i == len(cw):
                if not last:
                    return empty  # ulp overflow: next block owns it
                i = len(cw) - 1
            return pa.table(
                {
                    "value": pa.array(
                        [float(batch[value_col].iloc[i])], pa.float64()
                    ),
                    "cum_weight": pa.array(
                        [float(cw[i])], pa.float64()
                    ),
                }
            )

        return hist.map_batches(
            pick, batch_format="pandas", batch_size=None
        ).to_pandas()

    row = pick_pass(
        float(heads[value_col].iloc[k]),
        float(ends[k] - heads["w"].iloc[k]),
        last=k == len(ends) - 1,
    )
    if len(row) == 0 and k + 1 < len(ends):
        row = pick_pass(
            float(heads[value_col].iloc[k + 1]), float(ends[k]),
            last=k + 1 == len(ends) - 1,
        )
    return {
        "value": float(row["value"].iloc[0]),
        "cum_weight": float(row["cum_weight"].iloc[0]),
        "total_weight": total,
    }


def grouped_weighted_quantile(ds, key_col: str, value_col: str,
                              weight_col: str, q: float = 0.5):
    """Exact weighted quantile PER GROUP: smallest value with
    cumulative weight >= q * group total — per-source token-budget
    medians, per-segment cost SLOs.

    The shuffle carries the (key, value, weight-sum) HISTOGRAM
    (bucketed pre-aggregated, one row per distinct (key, value),
    never input rows); each key's histogram then selects its quantile
    with ONE vectorized cumsum+searchsorted inside map_groups.
    Partitioning assumption: one key's DISTINCT values fit one group
    — the same contract as ``group_quantile_disc``; use the global
    ``weighted_quantile`` owner-block layout per key when a single
    key's value space outgrows a worker."""
    hist = bucketed_aggregate(
        ds.select_columns([key_col, value_col, weight_col]),
        [key_col, value_col], {"w": (weight_col, "sum")},
    )

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(value_col)
        cw = g["w"].to_numpy(np.float64).cumsum()
        tot = float(cw[-1])
        if tot <= 0:
            return pd.DataFrame(
                {
                    key_col: [g[key_col].iloc[0]],
                    "wq_value": [np.nan],
                    "total_weight": [0.0],
                }
            )
        i = min(int(np.searchsorted(cw, q * tot)), len(cw) - 1)
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "wq_value": [float(g[value_col].iloc[i])],
                "total_weight": [tot],
            }
        )

    return hist.groupby(key_col).map_groups(
        pick, batch_format="pandas"
    )


def pareto_frontier_2d(ds, x_col: str, y_col: str):
    """2-D Pareto frontier (maximize both axes): keep rows whose
    ``y_col`` strictly exceeds every y at strictly larger ``x_col`` —
    the quality-vs-coverage tradeoff curve a curation pass selects
    along.  Ties in x are NOT mutually dominating (both survive if
    they beat the higher-x maximum); dominance is strict on x.

    Shape: the input collapses to the per-distinct-x max-y histogram
    (bucketed pre-aggregated shuffle, never rows); the exclusive
    prefix-max over descending x finishes on the driver over the
    DISTINCT-x table and broadcasts as two sorted arrays; one
    vectorized probe per batch keeps survivors.  Driver state:
    O(distinct x) — the same contract as ``percent_rank_by``'s
    broadcast mapping."""
    hist = bucketed_aggregate(
        ds.select_columns([x_col, y_col]),
        [x_col], {"my": (y_col, "max")},
    ).to_pandas().sort_values(x_col, ascending=False).reset_index(
        drop=True
    )
    my = hist["my"].to_numpy(np.float64)
    # pm[i] = max y over all STRICTLY larger x (exclusive prefix max
    # in descending-x order)
    pm = np.concatenate(
        [[-np.inf], np.maximum.accumulate(my)[:-1]]
    )
    xs = hist[x_col].to_numpy(np.float64)[::-1]  # ascending for probe
    pm_asc = pm[::-1].copy()

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(
            xs, batch[x_col].to_numpy(np.float64)
        )
        thr = pm_asc[idx]
        return batch[batch[y_col].to_numpy(np.float64) > thr]

    return ds.map_batches(keep, batch_format="pandas")


def block_heads(sorted_ds, key_col: str,
                sum_cols: list[str]) -> pd.DataFrame:
    """One summary row per block of a materialized range-sorted
    histogram: the block's FIRST key plus its per-column sums
    (float64) — the O(#blocks) driver summary behind the owner-block
    / offset-fold family (roc_auc, ks_test, gini, weighted_quantile).
    Empty sort partitions contribute nothing; callers key their
    offset tables by the first-key value, which is unique because
    the histogram has one row per distinct key."""
    import pyarrow.compute as pc

    def head(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    key_col: pa.array([], pa.float64()),
                    **{
                        c: pa.array([], pa.float64())
                        for c in sum_cols
                    },
                }
            )
        return pa.table(
            {
                key_col: batch.column(key_col).slice(0, 1)
                .cast(pa.float64()),
                **{
                    c: pa.array(
                        [
                            float(
                                pc.sum(batch.column(c)).as_py() or 0
                            )
                        ],
                        pa.float64(),
                    )
                    for c in sum_cols
                },
            }
        )

    return (
        sorted_ds.map_batches(
            head, batch_format="pyarrow", batch_size=None
        )
        .to_pandas()
        .sort_values(key_col)
        .reset_index(drop=True)
    )


def throttle_events(ds, key_col: str, ts_col: str, id_col: str,
                    min_gap_us: int):
    """Rapid-repeat event filter: drop a row when it lands within
    ``min_gap_us`` of the key's PREVIOUS raw event (SQL ``lag()``
    semantics — each event compares to its immediate predecessor, so
    the op stays hash-checkable; a true debounce, comparing to the
    previous KEPT event, is the same pass with a per-group scan and
    no SQL twin).  First event of a key always survives.

    Skew-safe on ``keyed_cell_scan``: each event needs only its
    immediate predecessor, so cells close from their own (ts,
    id)-sorted rows plus a 1-row tail carry.  No key's stream ever
    groups; shuffle carries only (id, key, ts).  ``ds`` is consumed
    twice and materialized here — pass a PRUNED projection.

    Output: (id, key) of surviving events.
    """
    bucket_us = 86_400 * 1_000_000

    def project(batch: pd.DataFrame) -> pa.Table:
        ts = _ts_us(batch[ts_col]).to_numpy()
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_tb": pa.array(ts // bucket_us, pa.int64()),
                "_ord": pa.array(ts, pa.int64()),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas").materialize()
    n_shards = max(32, rows.count() // 200_000)

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
        }
    )

    def apply_cell(cell: pd.DataFrame, carry) -> pa.Table:
        m = 0 if carry is None else 1
        ts = cell["_ord"].to_numpy()
        if m:
            ts = np.concatenate([carry["_ord"].to_numpy()[-1:], ts])
        keep = np.empty(len(ts), dtype=bool)
        keep[0] = True
        keep[1:] = (ts[1:] - ts[:-1]) >= min_gap_us
        keep = keep[m:]
        return pa.table(
            {
                id_col: pa.array(
                    cell[id_col].to_numpy(np.int64)[keep], pa.int64()
                ),
                key_col: pa.array(
                    cell[key_col].to_numpy(np.int64)[keep], pa.int64()
                ),
            }
        )

    return keyed_cell_scan(
        rows, key_col, id_col,
        _tail_candidates(key_col, id_col, 1),
        _tail_carries(key_col, id_col, 1),
        apply_cell, empty_out, n_shards,
    )


def sequence_ngrams(ds, key_col: str, ts_col: str, id_col: str,
                    token_col: str, n: int = 3):
    """Frequent behavioural paths: consecutive ``n``-gram counts of a
    per-key ordered token stream (event types, page ids, ...).

    Same partitioning contract as ``lag_rolling``: one
    ``groupby(key).map_groups`` pass sorts each key's stream by
    (ts, id) and emits its n-gram partial Counter — one (gram parts,
    count) row per distinct n-gram per key crosses the shuffle — then
    ``bucketed_aggregate`` folds the global counts.

    Output: (g1..gn, n) one row per distinct n-gram.
    """
    from collections import Counter

    cols = [f"g{i + 1}" for i in range(n)]

    def fold(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values([ts_col, id_col])
        toks = g[token_col].to_numpy()
        c: Counter = Counter(
            tuple(toks[i: i + n]) for i in range(len(toks) - n + 1)
        )
        data = {
            col: pa.array([k[i] for k in c], pa.string())
            for i, col in enumerate(cols)
        }
        data["n"] = pa.array(list(c.values()), pa.int64())
        return pa.table(data)

    partials = ds.groupby(key_col).map_groups(
        fold, batch_format="pandas"
    )
    return bucketed_aggregate(partials, cols, {"n": ("n", "sum")})


def late_event_split(ds, key_col: str, ts_col: str, id_col: str,
                     allowed_lateness_us: int,
                     id_bucket_bits: int = 18):
    """Per-key watermark tagging (the streaming late-data rule, batch
    replay): process the key's events in ARRIVAL order (ascending
    ``id_col``), hold a watermark = max event time seen so far minus
    ``allowed_lateness_us``, and flag events whose time falls behind
    it — the rows a streaming window would drop or side-output.

    Skew-safe on ``keyed_cell_scan`` with ARRIVAL-ORDER cells
    (``_tb = id >> 18``): the carry into a cell is the key's single
    max-event-time row over all earlier cells — a running-cummax
    prefix, synthesized vectorized (per-cell argmax candidates ->
    shift + cummax per key).  Inside a cell the watermark continues
    with ``np.maximum.accumulate``.  First arrival of a key is never
    late.  No key's stream ever groups; ``ds`` is consumed twice and
    materialized here — pass a PRUNED projection.

    Output: (id, key, late 0/1) — join back or filter downstream.
    """
    def project(batch: pd.DataFrame) -> pa.Table:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_tb": pa.array(ids >> id_bucket_bits, pa.int64()),
                "_ord": pa.array(
                    np.zeros(len(ids), dtype=np.int64), pa.int64()
                ),
                "_ts": pa.array(
                    _ts_us(batch[ts_col]).to_numpy(), pa.int64()
                ),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas").materialize()
    n_shards = max(32, rows.count() // 200_000)

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        # per (key, cell): the batch's max-_ts row — any row of the
        # true cell argmax survives its own batch's reduction
        g = batch.sort_values("_ts")
        return g.groupby([key_col, "_tb"], sort=False).tail(1)

    def make_carries(g: pd.DataFrame) -> pd.DataFrame:
        # g is (key, _tb, _ord, id)-sorted candidates; collapse to one
        # max-_ts row per cell, then carry into cell c = the key's
        # running cummax over strictly earlier cells (shift + cummax)
        cells = (
            g.sort_values("_ts")
            .groupby([key_col, "_tb"], sort=False)
            .tail(1)
            .sort_values([key_col, "_tb"])
            .reset_index(drop=True)
        )
        cm = cells.groupby(key_col, sort=False)["_ts"].cummax()
        prev_max = cm.groupby(cells[key_col], sort=False).shift(1)
        mask = prev_max.notna().to_numpy()
        out = cells[mask].copy()
        out["_ts"] = prev_max[mask].to_numpy(dtype=np.int64)
        return out

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "late": pa.array([], pa.int64()),
        }
    )

    def apply_cell(cell: pd.DataFrame, carry) -> pa.Table:
        ts = cell["_ts"].to_numpy()
        wm0 = (
            np.int64(-(2 ** 62)) if carry is None or not len(carry)
            else carry["_ts"].to_numpy().max()
        )
        prev_max = np.maximum.accumulate(
            np.concatenate(([wm0], ts))
        )[:-1]
        late = (ts < prev_max - allowed_lateness_us).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(
                    cell[id_col].to_numpy(np.int64), pa.int64()
                ),
                key_col: pa.array(
                    cell[key_col].to_numpy(np.int64), pa.int64()
                ),
                "late": pa.array(late, pa.int64()),
            }
        )

    return keyed_cell_scan(
        rows, key_col, id_col, candidates, make_carries,
        apply_cell, empty_out, n_shards,
    )


def resample_linear(ds, key_col: str, ts_col: str, value_col: str,
                    bucket_s: int = 86_400):
    """Regularize an irregular per-key series onto a fixed grid with
    LINEAR interpolation (the numeric sibling of LOCF resampling):
    per key, bucket timestamps to grid units, average within a unit,
    then fill every unit strictly between the key's first and last
    observation as v = pv + (nv - pv) * (t - pt) / (nt - pt) — the
    exact expression a SQL twin's two ASOF joins produce, so
    round(6) hash-matches (np.interp uses a different float form and
    is deliberately NOT used).

    Skew-safe in two stages: a distributed ``bucketed_aggregate``
    first collapses the raw events to per-(key, unit) sums/counts —
    so the only per-key group is over UNIT rows, bounded by the
    key's observation span / ``bucket_s``, never by its event count
    (a bot key with 10^9 events in a year is 365 unit rows).  The
    per-unit mean is sum/count of a distributed fold; the twin's
    AVG tolerates the order difference under round(6).

    Output: (key, unit, v, observed 0/1).
    """
    bucket_us = int(bucket_s) * 1_000_000

    def project(batch: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_u": pa.array(
                    _ts_us(batch[ts_col]).to_numpy() // bucket_us,
                    pa.int64(),
                ),
                "_v": pa.array(
                    batch[value_col].to_numpy(dtype=np.float64),
                    pa.float64(),
                ),
            }
        )

    units = bucketed_aggregate(
        ds.map_batches(project, batch_format="pandas"),
        [key_col, "_u"],
        {"_vsum": ("_v", "sum"), "_n": ("_v", "count")},
    )

    def fold(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("_u")
        u = g["_u"].to_numpy(np.int64)
        v = (
            g["_vsum"].to_numpy(np.float64)
            / g["_n"].to_numpy(np.float64)
        )
        grid = np.arange(u[0], u[-1] + 1, dtype=np.int64)
        # index of the previous observation for every grid unit
        prev = np.searchsorted(u, grid, side="right") - 1
        observed = u[prev] == grid
        pt, pv = u[prev], v[prev]
        nxt = np.minimum(prev + 1, len(u) - 1)
        nt, nv = u[nxt], v[nxt]
        with np.errstate(invalid="ignore", divide="ignore"):
            interp = pv + (nv - pv) * (grid - pt) / (nt - pt)
        out_v = np.where(observed, pv, interp)
        key = int(g[key_col].iloc[0])
        return pa.table(
            {
                key_col: pa.array(
                    np.full(len(grid), key, dtype=np.int64), pa.int64()
                ),
                "unit": pa.array(grid, pa.int64()),
                "v": pa.array(out_v, pa.float64()),
                "observed": pa.array(
                    observed.astype(np.int64), pa.int64()
                ),
            }
        )

    return units.groupby(key_col).map_groups(
        fold, batch_format="pandas"
    )


def trimmed_mean_by(ds, key_col: str, value_col: str, id_col: str,
                    trim: float = 0.1):
    """Per-key trimmed mean (robust location): drop the lowest and
    highest ``floor(trim * n)`` rows under the (value, id) total
    order, average the rest — the rank-based definition, so a SQL
    row_number twin is exact row-for-row.

    Skew-safe via the winsorize histogram pattern: the sum over the
    kept rank range depends only on VALUES (the id tiebreak decides
    WHICH tied rows drop, never the sum), so a distributed
    ``bucketed_aggregate`` collapses the stream to a per-(key, value)
    histogram and one vectorized pass per key-hash bucket picks the
    rank-range overlap of every distinct value — no key's rows ever
    group, only its distinct values.  ``id_col`` is kept for
    signature parity with the rank-based twin.

    Output: (key, trimmed_mean, n_kept, n).
    """
    hist = bucketed_aggregate(
        ds, [key_col, value_col],
        {"_cnt": (value_col, "count")},
    ).materialize()
    key_type = hist.schema().base_schema.field(key_col).type
    empty_out = pa.table(
        {
            key_col: pa.array([], key_type),
            "trimmed_mean": pa.array([], pa.float64()),
            "n_kept": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def pick(group: pd.DataFrame) -> pa.Table:
        if len(group) == 0:
            return empty_out
        g = group.sort_values([key_col, value_col]).reset_index(
            drop=True
        )
        cnt = g["_cnt"].to_numpy(dtype=np.int64)
        grp = g.groupby(key_col, sort=False)
        n = grp["_cnt"].transform("sum").to_numpy(dtype=np.int64)
        cum = grp["_cnt"].cumsum().to_numpy(dtype=np.int64)
        before = cum - cnt
        k = np.floor(trim * n).astype(np.int64)
        # rows kept per distinct value = overlap of its rank range
        # [before, cum) with the kept range [k, n - k)
        kept = np.maximum(
            0,
            np.minimum(cum, n - k) - np.maximum(before, k),
        )
        v = g[value_col].to_numpy(dtype=np.float64)
        keys = g[key_col].to_numpy()
        new = np.empty(len(g), dtype=np.bool_)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        gid = np.cumsum(new) - 1
        ksum = np.bincount(gid, weights=kept * v)
        n_kept = np.bincount(gid, weights=kept).astype(np.int64)
        out = g.loc[new, [key_col]].reset_index(drop=True)
        return pa.table(
            {
                key_col: pa.array(out[key_col]),
                "trimmed_mean": pa.array(
                    ksum / n_kept, pa.float64()
                ),
                "n_kept": pa.array(n_kept, pa.int64()),
                "n": pa.array(n[new], pa.int64()),
            }
        )

    def bucketize(batch: pd.DataFrame) -> pa.Table:
        # fine-grained key-hash space + sort/whole-block map (not
        # groupby().map_groups): empty range partitions return a
        # TYPED empty — see keyed_cell_scan's shard-space note
        h = pd.util.hash_pandas_object(
            batch[key_col], index=False
        ).to_numpy()
        batch["_mb"] = (h % np.uint64(65_536)).astype(np.int64)
        return _arrow(batch)

    return (
        hist.map_batches(bucketize, batch_format="pandas")
        .sort("_mb")
        .map_batches(pick, batch_format="pandas", batch_size=None)
    )


def last_touch_attribution(ds, key_col: str, id_col: str,
                           type_col: str, target: str,
                           id_bucket_bits: int = 18):
    """Last-touch conversion attribution: every ``target`` event is
    credited to the key's most recent PRECEDING non-target event
    (arrival order = ``id_col`` — globally unique, so the credit is
    deterministic; timestamp ties cannot flip it).  Targets with no
    preceding touch are dropped, mirroring an ASOF-join twin's inner
    join.

    Skew-safe on ``keyed_cell_scan`` with arrival-order cells
    (``_tb = id >> 18``): the carry into a cell is the key's single
    most-recent non-target row over all earlier cells.  Candidates
    keep, per cell, its last non-target row plus its last row overall
    (the presence marker — a cell of pure target rows must still
    receive a carry); synthesis is a vectorized per-key shift + ffill
    over the cell table.  Inside a cell the forward-fill continues
    locally.  No key's stream ever groups; ``ds`` is consumed twice
    and materialized here — pass a PRUNED projection.

    Output: (id, key, touch) one row per attributed target event.
    """
    def project(batch: pd.DataFrame) -> pa.Table:
        ids = batch[id_col].to_numpy(dtype=np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_tb": pa.array(ids >> id_bucket_bits, pa.int64()),
                "_ord": pa.array(
                    np.zeros(len(ids), dtype=np.int64), pa.int64()
                ),
                "_ty": pa.array(
                    batch[type_col].astype(str), pa.string()
                ),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas").materialize()
    n_shards = max(32, rows.count() // 200_000)

    def candidates(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.sort_values(id_col)
        grp = [key_col, "_tb"]
        last_nt = g[g["_ty"] != target].groupby(grp, sort=False).tail(1)
        presence = g.groupby(grp, sort=False).tail(1)
        return pd.concat(
            [last_nt, presence]
        ).drop_duplicates(subset=[id_col])

    def make_carries(g: pd.DataFrame) -> pd.DataFrame:
        # one row per present cell: its last non-target (NaN if none)
        cells = g[[key_col, "_tb"]].drop_duplicates().reset_index(
            drop=True
        )
        nt = g[g["_ty"] != target]
        last_nt = nt.groupby([key_col, "_tb"], sort=False).tail(1)
        m = cells.merge(
            last_nt[[key_col, "_tb", id_col, "_ty"]],
            on=[key_col, "_tb"], how="left", sort=False,
        )
        # carry into cell c = ffill(shift(last-nt per cell)) per key
        grp = m.groupby(key_col, sort=False)
        carry = grp[[id_col, "_ty"]].shift(1)
        carry = carry.groupby(m[key_col], sort=False).ffill()
        mask = carry["_ty"].notna().to_numpy()
        out = m[mask].copy()
        out[id_col] = carry[id_col][mask].to_numpy(dtype=np.int64)
        out["_ty"] = carry["_ty"][mask].to_numpy()
        out["_ord"] = np.zeros(mask.sum(), dtype=np.int64)
        return out

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "touch": pa.array([], pa.string()),
        }
    )

    def apply_cell(cell: pd.DataFrame, carry) -> pa.Table:
        types = cell["_ty"].to_numpy()
        is_t = types == target
        init = (
            None if carry is None or not len(carry)
            else carry["_ty"].iloc[-1]
        )
        s = pd.Series(
            np.where(is_t, None, types), dtype=object
        ).ffill().to_numpy()
        if init is not None:
            s = np.where(pd.isna(s), init, s)
        keep = is_t & pd.notna(s)
        return pa.table(
            {
                id_col: pa.array(
                    cell[id_col].to_numpy(np.int64)[keep], pa.int64()
                ),
                key_col: pa.array(
                    cell[key_col].to_numpy(np.int64)[keep], pa.int64()
                ),
                "touch": pa.array(
                    s[keep].astype(str), pa.string()
                ),
            }
        )

    return keyed_cell_scan(
        rows, key_col, id_col, candidates, make_carries,
        apply_cell, empty_out, n_shards,
    )


def first_last_by(ds, key_col: str, ts_col: str, id_col: str,
                  value_col: str):
    """Per-key FIRST and LAST observation under the (ts, id) total
    order — the combiner-friendly argmin/argmax: each batch keeps
    only its per-key candidate rows (2 per key per batch), the
    shuffle moves candidates, and one tiny per-key fold picks the
    winners.  No key's stream is ever grouped — the standard
    first_value/last_value window collapsed to an aggregation.

    Output: (key, first_ts, first_value, last_ts, last_value).
    """
    def partial(batch: pd.DataFrame) -> pa.Table:
        g = batch.sort_values([ts_col, id_col])
        first = g.groupby(key_col, sort=False).head(1)
        last = g.groupby(key_col, sort=False).tail(1)
        out = pd.concat([first, last], ignore_index=True)
        return pa.table(
            {
                key_col: pa.array(
                    out[key_col].to_numpy(np.int64), pa.int64()
                ),
                "_ts": pa.array(
                    _ts_us(out[ts_col]).to_numpy(), pa.int64()
                ),
                id_col: pa.array(
                    out[id_col].to_numpy(np.int64), pa.int64()
                ),
                value_col: pa.array(
                    out[value_col].to_numpy(np.float64), pa.float64()
                ),
            }
        )

    def pick(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["_ts", id_col]).reset_index(drop=True)
        return pa.table(
            {
                key_col: pa.array(
                    [int(g[key_col].iloc[0])], pa.int64()
                ),
                "first_ts": pa.array([int(g["_ts"].iloc[0])],
                                     pa.int64()),
                "first_value": pa.array(
                    [float(g[value_col].iloc[0])], pa.float64()
                ),
                "last_ts": pa.array([int(g["_ts"].iloc[-1])],
                                    pa.int64()),
                "last_value": pa.array(
                    [float(g[value_col].iloc[-1])], pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(pick, batch_format="pandas")
    )


def rolling_median_by(ds, key_col: str, ts_col: str, id_col: str,
                      value_col: str, window: int = 5):
    """Per-key trailing ``window``-row median (robust smoother) over
    the (ts, id)-sorted stream — pandas' vectorized rolling median
    (min_periods=1, so the frame shrinks at the stream head exactly
    like the SQL window's ROWS BETWEEN n PRECEDING AND CURRENT ROW).

    Skew-safe on ``keyed_cell_scan``: each row's frame reaches back
    only ``window - 1`` rows, so cells close from their own (ts,
    id)-sorted rows plus a ``window - 1``-row tail carry.  The median
    is an exact value pick / two-value midpoint, deterministic under
    any decomposition, so the twin stays hash-exact unrounded.  No
    key's stream ever groups; ``ds`` is consumed twice and
    materialized here — pass a PRUNED projection.

    Output: (id, key, roll_median).
    """
    bucket_us = 86_400 * 1_000_000
    w = max(1, window - 1)

    def project(batch: pd.DataFrame) -> pa.Table:
        ts = _ts_us(batch[ts_col]).to_numpy()
        return pa.table(
            {
                id_col: pa.array(
                    batch[id_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                key_col: pa.array(
                    batch[key_col].to_numpy(dtype=np.int64), pa.int64()
                ),
                "_tb": pa.array(ts // bucket_us, pa.int64()),
                "_ord": pa.array(ts, pa.int64()),
                "_v": pa.array(
                    batch[value_col].to_numpy(dtype=np.float64),
                    pa.float64(),
                ),
            }
        )

    rows = ds.map_batches(project, batch_format="pandas").materialize()
    n_shards = max(32, rows.count() // 200_000)

    empty_out = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            key_col: pa.array([], pa.int64()),
            "roll_median": pa.array([], pa.float64()),
        }
    )

    def apply_cell(cell: pd.DataFrame, carry) -> pa.Table:
        m = 0 if carry is None else len(carry)
        v = cell["_v"].to_numpy()
        if m:
            v = np.concatenate([carry["_v"].to_numpy(), v])
        med = (
            pd.Series(v).rolling(window, min_periods=1)
            .median()
            .to_numpy(np.float64)
        )
        return pa.table(
            {
                id_col: pa.array(
                    cell[id_col].to_numpy(np.int64), pa.int64()
                ),
                key_col: pa.array(
                    cell[key_col].to_numpy(np.int64), pa.int64()
                ),
                "roll_median": pa.array(med[m:], pa.float64()),
            }
        )

    return keyed_cell_scan(
        rows, key_col, id_col,
        _tail_candidates(key_col, id_col, w),
        _tail_carries(key_col, id_col, w),
        apply_cell, empty_out, n_shards,
    )


def interval_overlap_join(left_ds, right_ds, key_col: str,
                          start_col: str, end_col: str, cell_us: int,
                          n_merge_buckets: int = 64,
                          max_cells: int = 4096):
    """Interval x interval overlap join: all (left, right) pairs with
    the same key whose half-open int64-microsecond intervals
    ``[start, end)`` overlap (``l.start < r.end AND r.start <
    l.end``).  Differs from range_join (point-in-interval with a
    broadcast side) and from windowed_pair_join (point streams with a
    fixed lag window): BOTH sides here are interval sets of arbitrary
    width and neither broadcasts.

    Shape: each interval fragments to every ``cell_us``-wide time
    cell it touches (vectorized repeat/arange, bounded by
    ``max_cells`` per interval); (key, cell) cells hash onto ~fixed
    shuffle buckets and each bucket joins its cells with one
    vectorized pandas merge.  A pair overlapping in several shared
    cells is emitted ONLY in its canonical cell
    ``max(l.start, r.start) // cell_us`` — dedup is a vectorized
    predicate, never a distinct shuffle.  Per-group memory is
    bounded by the pair count of its cells (the true output size).
    Size ``cell_us`` near the typical interval width: wider cells cut
    the fragment fan-out, narrower cells cut the per-cell pair count.

    Returns (key, s_l, e_l, s_r, e_r) int64-microsecond pair rows.
    """
    def _shape(side: int):
        def shape(batch: pd.DataFrame) -> pa.Table:
            s = batch[start_col].to_numpy(dtype=np.int64)
            e = batch[end_col].to_numpy(dtype=np.int64)
            keep = e > s
            s, e = s[keep], e[keep]
            keys = batch[key_col].to_numpy()[keep]
            c0 = s // cell_us
            c1 = (e - 1) // cell_us
            n = (c1 - c0 + 1).astype(np.int64)
            if len(n) and int(n.max()) > max_cells:
                raise ValueError(
                    f"interval spans {int(n.max())} cells "
                    f"> max_cells={max_cells}; widen cell_us"
                )
            total = int(n.sum())
            rep = np.repeat(np.arange(len(n)), n)
            # offset of each fragment within its interval's cell run
            off = np.arange(total) - np.repeat(np.cumsum(n) - n, n)
            out = pd.DataFrame(
                {
                    key_col: keys[rep],
                    "_cell": c0[rep] + off,
                    "_s": s[rep],
                    "_e": e[rep],
                    "_side": np.full(total, side, np.int8),
                }
            )
            h = pd.util.hash_pandas_object(
                out[[key_col, "_cell"]], index=False
            ).to_numpy()
            out["_sb"] = (h % np.uint64(n_merge_buckets)).astype(
                np.int64
            )
            return _arrow(out)

        return shape

    def join_cells(group: pd.DataFrame) -> pa.Table:
        on = [key_col, "_cell"]
        lefts = group[group["_side"] == 0]
        rights = group[group["_side"] == 1]
        empty = pa.table(
            {
                key_col: pa.array([], pa.int64()),
                "s_l": pa.array([], pa.int64()),
                "e_l": pa.array([], pa.int64()),
                "s_r": pa.array([], pa.int64()),
                "e_r": pa.array([], pa.int64()),
            }
        )
        if lefts.empty or rights.empty:
            return empty
        pairs = lefts[on + ["_s", "_e"]].merge(
            rights[on + ["_s", "_e"]], on=on, suffixes=("_l", "_r"),
        )
        smax = np.maximum(
            pairs["_s_l"].to_numpy(), pairs["_s_r"].to_numpy()
        )
        emin = np.minimum(
            pairs["_e_l"].to_numpy(), pairs["_e_r"].to_numpy()
        )
        keep = pairs[
            (smax < emin)
            & (smax // cell_us == pairs["_cell"].to_numpy())
        ]
        return pa.table(
            {
                key_col: pa.array(
                    keep[key_col].to_numpy(), pa.int64()
                ),
                "s_l": pa.array(keep["_s_l"].to_numpy(), pa.int64()),
                "e_l": pa.array(keep["_e_l"].to_numpy(), pa.int64()),
                "s_r": pa.array(keep["_s_r"].to_numpy(), pa.int64()),
                "e_r": pa.array(keep["_e_r"].to_numpy(), pa.int64()),
            }
        )

    tagged = left_ds.map_batches(
        _shape(0), batch_format="pandas"
    ).union(right_ds.map_batches(_shape(1), batch_format="pandas"))
    return tagged.groupby("_sb").map_groups(
        join_cells, batch_format="pandas"
    )
