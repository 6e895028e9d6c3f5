"""Mergeable sketches: HyperLogLog distinct count, Bloom filter.

Both are the scale path for operations whose exact form needs a wide
shuffle or a big broadcast:

- ``hll_distinct``: approximate COUNT(DISTINCT key) — each batch folds
  its keys into a 2^p-register sketch, register maxima merge
  associatively (tiny: 4 KiB at p=12), so the "shuffle" is a reduce of
  fixed-size arrays regardless of input size.  Standard bias-corrected
  estimator (Flajolet et al., HLL; small-range linear counting).
- ``BloomFilter``: bit-array membership with k hashes — broadcast a
  filter over the small side of a semi-join and prefilter probe rows
  inside ``map_batches``; survivors are exact-checked, so the join
  result stays EXACT while the expensive exact structure only sees
  the ~fp-rate fraction of rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash64(values: "pa.Array | list") -> np.ndarray:
    """Deterministic 64-bit hashes, vectorized end to end.

    Numeric/bool/datetime columns hash as raw numpy arrays; everything
    else is stringified once and hashed as an object array.  Both paths
    go through ``pandas.util.hash_array`` (keyed siphash with a fixed
    default key — stable across processes and nodes) followed by a
    vectorized splitmix64 finalizer for avalanche; no Python-per-row
    work remains on the HLL fold / Bloom probe hot path.
    """
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        arr = values.to_numpy(zero_copy_only=False)
    elif isinstance(values, np.ndarray):
        arr = values
    elif isinstance(values, pd.Series):
        arr = values.to_numpy()
    else:
        arr = np.asarray(list(values))
    if arr.dtype == object or arr.dtype.kind in "USV":
        arr = np.array([str(v) for v in arr], dtype=object)
    elif arr.dtype.kind in "iub":
        # normalize dtype families so equal values hash equally: an
        # int32 build side vs an int64 probe side must not produce
        # Bloom false negatives (which would silently DROP rows from
        # the exact semi join)
        arr = arr.astype(np.int64)
    elif arr.dtype.kind == "f":
        arr = arr.astype(np.float64)
    h = pd.util.hash_array(arr, categorize=False).astype(np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        h = h + np.uint64(0x9E3779B97F4A7C15)
        h ^= h >> np.uint64(30)
        h = h * np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h = h * np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


# -- HyperLogLog ------------------------------------------------------------

# leading-zero count per byte value (exact, table-driven)
_LZ8 = np.array(
    [8] + [7 - int(v).bit_length() + 1 for v in range(1, 256)],
    dtype=np.uint8,
)


def hll_fold(values, p: int = 12) -> np.ndarray:
    """Fold values into a fresh 2^p-register sketch (uint8 registers).

    Fully vectorized: siphash-based ``_hash64``, then leading-zero rank
    via a byte-wise table (view the shifted hash as 8 big-endian bytes,
    find the first nonzero byte, add its per-byte lz) — exact and with
    no per-bit loop.
    """
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        rest = h << np.uint64(p)
    b = rest.byteswap().view(np.uint8).reshape(-1, 8)  # big-endian bytes
    nz = b != 0
    first = nz.argmax(axis=1)
    lz = first * 8 + _LZ8[b[np.arange(len(b)), first]]
    rank = (lz + 1).astype(np.uint8)
    rank[rest == 0] = 64 - p + 1
    np.clip(rank, None, 64 - p + 1, out=rank)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting small-range fix
    return float(est)


def hll_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate COUNT(DISTINCT column): per-batch fold, then a
    TREE-merge of the 4 KiB sketches (coalesce sketch rows into a few
    blocks, OR-merge per block in workers) so the driver only ever
    merges <=8 sketches — at 100 TB the fold emits ~one sketch per
    input block and a flat driver loop over all of them would pull
    hundreds of thousands of blobs through one process."""
    def fold(batch: pa.Table) -> pa.Table:
        regs = hll_fold(batch.column(column), p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    def merge_block(batch: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for blob in batch.column("sketch").to_pylist():
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8),
                       out=regs)
        return pa.table(
            {"sketch": pa.array([regs.tobytes()], pa.binary())}
        )

    parts = (
        ds.select_columns([column])
        .map_batches(fold, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge_block, batch_size=None, batch_format="pyarrow")
        .to_pandas()
    )
    merged = np.zeros(1 << p, dtype=np.uint8)
    for blob in parts["sketch"]:
        merged = hll_merge(merged, np.frombuffer(blob, dtype=np.uint8))
    return hll_estimate(merged)


# -- Bloom filter -----------------------------------------------------------

class BloomFilter:
    """Fixed-size bit-array Bloom filter, k derived from target fp rate."""

    def __init__(self, n_items: int, fp_rate: float = 0.01):
        n_items = max(1, n_items)
        m = int(-n_items * np.log(fp_rate) / (np.log(2) ** 2)) + 1
        self.m = m
        self.k = max(1, int(round(m / n_items * np.log(2))))
        self.bits = np.zeros((m + 63) // 64, dtype=np.uint64)

    def _positions(self, values) -> np.ndarray:
        h = _hash64(values)
        h1 = h & np.uint64(0xFFFFFFFF)
        h2 = h >> np.uint64(32)
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + ks * h2[None, :]) % np.uint64(self.m))

    def add(self, values) -> None:
        pos = self._positions(values).ravel()
        # bitwise_or.at: plain fancy `|=` drops all but one update per
        # duplicate word index (classic numpy scatter pitfall)
        np.bitwise_or.at(
            self.bits,
            (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains(self, values) -> np.ndarray:
        pos = self._positions(values)
        bit = (
            self.bits[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bit.all(axis=0).astype(bool)


def bloom_semi_join(ds, keys, on: str, fp_rate: float = 0.01,
                    anti: bool = False, concurrency: int = 4):
    """EXACT semi/anti join with a Bloom prefilter.

    The filter (broadcast once) rejects most non-matching rows inside
    the batch; Bloom *positives* are then exact-checked against the key
    set, so false positives never reach the output.  At scale the exact
    set can live in a shared actor or spill-backed store while the
    Bloom stays in every worker's memory.
    """
    import ray

    key_list = list(keys)
    bloom = BloomFilter(len(key_list), fp_rate)
    if key_list:
        bloom.add(key_list)
    state_ref = ray.put((bloom, set(key_list)))

    class Probe:
        def __init__(self):
            self.bloom, self.exact = ray.get(state_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            maybe = self.bloom.contains(batch[on].to_numpy())
            hit = maybe.copy()
            if maybe.any():
                # exact-check ONLY the Bloom positives (vectorized isin
                # masked to the ~fp-rate surviving fraction)
                hit[maybe] = batch.loc[maybe, on].isin(self.exact)
            return batch[~hit] if anti else batch[hit]

    return ds.map_batches(
        Probe, batch_format="pandas", concurrency=(1, concurrency)
    )


# -- Mergeable quantile sketch ----------------------------------------------

def _q_compress(vals: np.ndarray, weights: np.ndarray,
                m: int) -> "tuple[np.ndarray, np.ndarray]":
    """Compress a weighted value multiset to <= m rank-strided points.

    Sort by value, then pick the element whose cumulative weight first
    reaches each of m evenly spaced rank targets — a mergeable
    epsilon-approximate quantile summary with rank error ~ total/(2m)
    per compression level (two levels end to end here).
    """
    order = np.argsort(vals, kind="stable")
    vals, weights = vals[order], weights[order]
    if len(vals) <= m:
        return vals, weights
    total = float(weights.sum())
    cum = np.cumsum(weights)
    targets = (np.arange(m) + 0.5) * (total / m)
    idx = np.clip(np.searchsorted(cum, targets, side="left"),
                  0, len(vals) - 1)
    return vals[idx], np.full(m, total / m)


def quantile_query(vals: np.ndarray, weights: np.ndarray,
                   q: float) -> float:
    if len(vals) == 0:  # all-null input folds to an empty sketch
        return float("nan")
    cum = np.cumsum(weights)
    total = cum[-1]
    idx = min(int(np.searchsorted(cum, q * total, side="left")),
              len(vals) - 1)
    return float(vals[idx])


def approx_quantiles(ds, column: str, qs=(0.5, 0.95, 0.99),
                     m: int = 2048) -> dict:
    """Approximate quantiles of a column via mergeable sketches.

    Scale shape mirrors ``hll_distinct``: each batch folds its values
    into a <=m-point rank-strided summary (~16 KiB), summaries
    TREE-merge (coalesce sketch rows into a few blocks, merge per
    block) so the driver only ever merges a handful of sketches —
    no sort of the data, no driver materialization, rank error
    ~1/(2m) per level regardless of input size.
    """
    def fold(batch: pa.Table) -> pa.Table:
        v = batch.column(column).to_numpy(zero_copy_only=False)
        v = v[~pd.isna(v)].astype(np.float64)
        vals, w = _q_compress(v, np.ones(len(v)), m)
        return pa.table(
            {
                "vals": pa.array([vals.tobytes()], pa.binary()),
                "weights": pa.array([w.tobytes()], pa.binary()),
            }
        )

    def merge_block(batch: pa.Table) -> pa.Table:
        vs = np.concatenate(
            [np.frombuffer(b, dtype=np.float64)
             for b in batch.column("vals").to_pylist()]
        )
        ws = np.concatenate(
            [np.frombuffer(b, dtype=np.float64)
             for b in batch.column("weights").to_pylist()]
        )
        vals, w = _q_compress(vs, ws, m)
        return pa.table(
            {
                "vals": pa.array([vals.tobytes()], pa.binary()),
                "weights": pa.array([w.tobytes()], pa.binary()),
            }
        )

    merged = (
        ds.select_columns([column])
        .map_batches(fold, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge_block, batch_size=None,
                     batch_format="pyarrow")
        .to_pandas()
    )
    if merged.empty:
        return {q: float("nan") for q in qs}
    vals = np.concatenate(
        [np.frombuffer(b, dtype=np.float64) for b in merged["vals"]]
    )
    w = np.concatenate(
        [np.frombuffer(b, dtype=np.float64) for b in merged["weights"]]
    )
    if len(vals) == 0:
        return {q: float("nan") for q in qs}
    vals, w = _q_compress(vals, w, m)
    return {q: quantile_query(vals, w, q) for q in qs}


def grouped_approx_quantiles(ds, key_col: str, value_col: str,
                             qs=(0.5, 0.95), m: int = 512):
    """Approximate quantiles PER KEY via sketch-merge groupby.

    Unlike ``relational.group_quantile_disc`` (exact, but assumes one
    key's values fit in one group), this folds each batch into one
    <=m-point summary PER KEY it contains, then groupby(key) merges
    summaries — the shuffle carries sketches, never values, so a key
    with 10^10 rows costs the same as one with 10^3.

    Returns a Dataset of (key, q_<quantile>...) rows.
    """
    def fold(batch: pd.DataFrame) -> pd.DataFrame:
        out_keys, out_vals, out_ws = [], [], []
        for key, grp in batch.groupby(key_col, sort=False):
            v = grp[value_col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            vals, w = _q_compress(v, np.ones(len(v)), m)
            out_keys.append(key)
            out_vals.append(vals.tobytes())
            out_ws.append(w.tobytes())
        return pd.DataFrame(
            {key_col: out_keys, "vals": out_vals, "weights": out_ws}
        )

    def merge_key(group: pd.DataFrame) -> pd.DataFrame:
        vs = np.concatenate(
            [np.frombuffer(b, dtype=np.float64) for b in group["vals"]]
        )
        ws = np.concatenate(
            [np.frombuffer(b, dtype=np.float64)
             for b in group["weights"]]
        )
        vals, w = _q_compress(vs, ws, m)
        row = {key_col: [group[key_col].iloc[0]]}
        for q in qs:
            row[f"q_{q}"] = [quantile_query(vals, w, q)]
        return pd.DataFrame(row)

    return (
        ds.select_columns([key_col, value_col])
        .map_batches(fold, batch_format="pandas")
        .groupby(key_col)
        .map_groups(merge_key, batch_format="pandas")
    )


# -- heavy hitters (SpaceSaving-style truncated counters) --------------------

def _hh_truncate(counts: dict, capacity: int) -> tuple[dict, int]:
    """Keep the ``capacity`` largest counters; the error bound is the
    largest DROPPED count (any dropped item could have had up to that
    many occurrences within this summary)."""
    if len(counts) <= capacity:
        return counts, 0
    items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    kept = dict(items[:capacity])
    err = items[capacity][1]
    return kept, err


def _hh_merge(a: tuple[dict, int], b: tuple[dict, int],
              capacity: int) -> tuple[dict, int]:
    """Merge two truncated summaries: counts add, errors add (each
    side's dropped mass can hide at most its own error per item)."""
    ca, ea = a
    cb, eb = b
    merged = dict(ca)
    for k, v in cb.items():
        merged[k] = merged.get(k, 0) + v
    kept, err = _hh_truncate(merged, capacity)
    return kept, err + ea + eb


def heavy_hitters(ds, column: str, k: int = 20, capacity: int | None = None):
    """Approximate top-k most frequent values with error bounds, for
    item domains too large to groupby (trillions of distinct shingles
    / URLs / domains).  Per batch: one vectorized ``value_counts``
    truncated to ``capacity`` counters (SpaceSaving-style — the
    largest dropped count is the summary's error).  Summaries are a
    few KB each and tree-merge: ``repartition(8)`` -> per-block merge
    -> <=8 summaries on the driver (the approx_quantiles pattern, NOT
    one blob per input block).  Returns a DataFrame (value, count_min,
    count_max) for the top k by count_min; an item's true count lies
    in [count_min, count_max], and any item whose true count exceeds
    the k-th count_min + total error must appear (Misra-Gries-style
    bound — make ``capacity`` >> k to keep the error small).

    For domains that DO fit a shuffle, prefer the exact partial-count
    groupby (q_bigram_counts shape) — this sketch trades exactness for
    a hard cap on state.
    """
    import json

    import pyarrow as pa

    if capacity is None:
        capacity = max(8 * k, 256)

    def fold(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch.column(column).to_pylist())
        vc = s.value_counts()
        counts, err = _hh_truncate(
            {str(k_): int(v) for k_, v in vc.items()}, capacity
        )
        return pa.table(
            {
                "summary": pa.array([json.dumps(counts)], pa.large_string()),
                "err": pa.array([err], pa.int64()),
            }
        )

    def merge_block(batch: pa.Table) -> pa.Table:
        acc: tuple[dict, int] = ({}, 0)
        for blob, err in zip(
            batch.column("summary").to_pylist(),
            batch.column("err").to_pylist(),
        ):
            acc = _hh_merge(acc, (json.loads(blob), int(err)), capacity)
        return pa.table(
            {
                "summary": pa.array([json.dumps(acc[0])], pa.large_string()),
                "err": pa.array([acc[1]], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(fold, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge_block, batch_format="pyarrow", batch_size=None)
        .to_pandas()  # <= 8 rows
    )
    acc: tuple[dict, int] = ({}, 0)
    for blob, err in zip(parts["summary"], parts["err"]):
        acc = _hh_merge(acc, (json.loads(blob), int(err)), capacity)
    counts, err = acc
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        {
            "value": [t[0] for t in top],
            "count_min": pd.Series([t[1] for t in top], dtype="int64"),
            "count_max": pd.Series([t[1] + err for t in top],
                                   dtype="int64"),
        }
    )


def grouped_hll_distinct(ds, key_col: str, value_col: str,
                         p: int = 12) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT value) PER KEY — the sketch scale
    path paired with ``relational.distinct_count_by``'s exact one:
    exact pair-collapse shuffles every distinct (key, value) pair;
    this shuffles one 4 KiB sketch per (batch, key) regardless of how
    many distinct values a key holds.  Same shape as
    ``grouped_approx_quantiles``: per-batch fold keyed by group, then
    a sketch OR-merge per key in ``groupby(key).map_groups``.
    """
    def fold(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key_col: batch.column(key_col).to_pandas(),
                value_col: batch.column(value_col).to_pandas(),
            }
        )
        keys, blobs = [], []
        for k, sub in df.groupby(key_col, sort=False):
            keys.append(k)
            blobs.append(hll_fold(sub[value_col].to_numpy(), p).tobytes())
        return pa.table(
            {
                key_col: pa.array(keys),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    def merge_key(group: pd.DataFrame) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for blob in group["sketch"]:
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8),
                       out=regs)
        return pa.table(
            {
                key_col: pa.array([group[key_col].iloc[0]]),
                "n_distinct_est": pa.array(
                    [float(hll_estimate(regs))], pa.float64()
                ),
            }
        )

    out = (
        ds.select_columns([key_col, value_col])
        .map_batches(fold, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(merge_key, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)


def hll_sketch_of(ds, column: str, p: int = 12) -> np.ndarray:
    """The merged HLL register array of a Dataset column (same
    fold + tree-merge as ``hll_distinct``, returning the SKETCH so
    callers can compose set operations)."""
    def fold(batch: pa.Table) -> pa.Table:
        regs = hll_fold(batch.column(column), p)
        return pa.table(
            {"sketch": pa.array([regs.tobytes()], pa.binary())}
        )

    def merge_block(batch: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for blob in batch.column("sketch").to_pylist():
            np.maximum(regs, np.frombuffer(blob, dtype=np.uint8),
                       out=regs)
        return pa.table(
            {"sketch": pa.array([regs.tobytes()], pa.binary())}
        )

    parts = (
        ds.select_columns([column])
        .map_batches(fold, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge_block, batch_size=None,
                     batch_format="pyarrow")
        .to_pandas()
    )
    merged = np.zeros(1 << p, dtype=np.uint8)
    for blob in parts["sketch"]:
        merged = hll_merge(merged, np.frombuffer(blob, dtype=np.uint8))
    return merged


def hll_set_ops(ds_a, ds_b, column: str, p: int = 12) -> dict:
    """Distinct-set algebra from two mergeable sketches: |A|, |B|,
    |A ∪ B| (register max — exact sketch union) and |A ∩ B| via
    inclusion-exclusion.  The audience-overlap question answered with
    two streaming passes and 4 KiB of driver state per side; the
    intersection estimate inherits BOTH sketches' error, so small
    overlaps of large sets are noisy (documented HLL limitation)."""
    a = hll_sketch_of(ds_a, column, p)
    b = hll_sketch_of(ds_b, column, p)
    na = hll_estimate(a)
    nb = hll_estimate(b)
    nu = hll_estimate(hll_merge(a, b))
    return {
        "n_a": na, "n_b": nb, "n_union": nu,
        "n_intersect": max(0.0, na + nb - nu),
    }


def sliding_distinct_hll(ds, ts_col: str, id_col: str,
                         window: int = 7, p: int = 14,
                         day_us: int = 86_400_000_000) -> pd.DataFrame:
    """Approximate ``window``-day rolling distinct (the scale path for
    the exact q_sliding_mau pair shuffle): per-batch fold ONE HLL per
    event-day present in the batch, tree-merge per day (a groupby
    whose groups are DAYS, each holding one 2^p-byte blob per input
    batch — never raw events), then union the sliding windows over
    the tiny day->sketch table in one vectorized pass.  HLL union is
    register-max, so the W-day estimate is ``estimate(max over the
    member days' registers)`` — no re-fold, no second pass over data.

    The exact variant ships one (window_day, id) pair per distinct
    pair through a shuffle — at 10^9 distinct ids x W days that IS
    the bottleneck; here the shuffle payload is ``days x batches``
    sketches of 2^p bytes and the error is ~1.04/sqrt(2^p) (0.8 % at
    p=14).  Any datetime64 unit normalizes to microseconds first."""
    from unfurl_ray.ops.relational import _ts_us

    m = 1 << p

    def fold_days(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:  # filtered upstreams emit empty blocks
            return pa.table(
                {
                    "d": pa.array([], pa.int64()),
                    "sketch": pa.array([], pa.binary()),
                }
            )
        d = (
            _ts_us(batch[ts_col]).to_numpy() // day_us
        ).astype(np.int64)
        ids = batch[id_col].to_numpy()
        order = np.argsort(d, kind="stable")
        d_s, ids_s = d[order], ids[order]
        starts = np.flatnonzero(
            np.concatenate([[True], d_s[1:] != d_s[:-1]])
        )
        bounds = np.append(starts, len(d_s))
        days, blobs = [], []
        for i, s0 in enumerate(starts):
            days.append(int(d_s[s0]))
            blobs.append(
                hll_fold(ids_s[s0:bounds[i + 1]], p).tobytes()
            )
        return pa.table(
            {
                "d": pa.array(days, pa.int64()),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    def merge_day(group: pd.DataFrame) -> pa.Table:
        regs = np.zeros(m, dtype=np.uint8)
        for blob in group["sketch"]:
            np.maximum(
                regs, np.frombuffer(blob, dtype=np.uint8), out=regs
            )
        return pa.table(
            {
                "d": pa.array(
                    [int(group["d"].iloc[0])], pa.int64()
                ),
                "sketch": pa.array([regs.tobytes()], pa.binary()),
            }
        )

    per_day = (
        ds.map_batches(fold_days, batch_format="pandas")
        .groupby("d")
        .map_groups(merge_day, batch_format="pandas")
        .to_pandas()
    )
    if len(per_day) == 0:
        return pd.DataFrame({"wd": pd.Series([], dtype="int64"),
                             "estimate": pd.Series([], dtype="float64")})
    per_day = per_day.sort_values("d").reset_index(drop=True)
    d_lo, d_hi = int(per_day["d"].iloc[0]), int(per_day["d"].iloc[-1])
    n_days = d_hi - d_lo + 1
    mat = np.zeros((n_days, m), dtype=np.uint8)
    idx = per_day["d"].to_numpy(dtype=np.int64) - d_lo
    for row, blob in zip(idx, per_day["sketch"]):
        mat[row] = np.frombuffer(blob, dtype=np.uint8)
    # sliding union: W shifted register-max passes over (days x 2^p)
    acc = mat.copy()
    for off in range(1, window):
        np.maximum(acc[off:], mat[:-off or None], out=acc[off:])
    return pd.DataFrame(
        {
            "wd": np.arange(d_lo, d_hi + 1, dtype=np.int64),
            "estimate": [hll_estimate(acc[i]) for i in range(n_days)],
        }
    )


# -- Count-Min sketch ---------------------------------------------------------

_CM_SEEDS = np.array(
    [0xA076_1D64_78BD_642F, 0xE703_7ED1_A0B4_28DB,
     0x8EBC_6AF0_9C88_C6E3, 0x5899_65CC_7537_4CC3,
     0x1D8E_4E27_C47D_124F, 0xEB44_ACCA_B455_D165],
    dtype=np.uint64,
)


def cm_fold(values, width: int = 4096, depth: int = 4) -> np.ndarray:
    """Fold values into a fresh depth x width Count-Min sketch
    (Cormode & Muthukrishnan 2005).  Fully vectorized: one
    ``_hash64`` pass, then per-row splitmix remixes with fixed odd
    seeds and ``np.bincount`` per row — no Python per-value work.
    int64 counters; merge is elementwise ADD (associative), so the
    sketch is a fixed-size commutative monoid like the HLL
    registers."""
    if not 1 <= depth <= len(_CM_SEEDS):
        raise ValueError(
            f"depth must be in [1, {len(_CM_SEEDS)}] "
            "(fixed seed table)"
        )
    cm = np.zeros((depth, width), dtype=np.int64)
    if len(values) == 0:
        return cm
    h = _hash64(values)
    for d in range(depth):
        with np.errstate(over="ignore"):
            g = (h ^ _CM_SEEDS[d]) * np.uint64(0x9E3779B97F4A7C15)
            g ^= g >> np.uint64(29)
            g = g * np.uint64(0xBF58476D1CE4E5B9)
            g ^= g >> np.uint64(32)
        idx = (g % np.uint64(width)).astype(np.int64)
        cm[d] += np.bincount(idx, minlength=width)
    return cm


def cm_query(cm: np.ndarray, values) -> np.ndarray:
    """Point-estimate counts: min over the depth rows.  Guarantees
    est >= true and, with prob >= 1 - (1/2)^depth-ish,
    est <= true + e * N / width (N = total folded count)."""
    depth, width = cm.shape
    if depth > len(_CM_SEEDS):
        raise ValueError(
            f"sketch depth {depth} exceeds the fixed seed table "
            f"({len(_CM_SEEDS)})"
        )
    h = _hash64(values)
    est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        with np.errstate(over="ignore"):
            g = (h ^ _CM_SEEDS[d]) * np.uint64(0x9E3779B97F4A7C15)
            g ^= g >> np.uint64(29)
            g = g * np.uint64(0xBF58476D1CE4E5B9)
            g ^= g >> np.uint64(32)
        idx = (g % np.uint64(width)).astype(np.int64)
        np.minimum(est, cm[d, idx], out=est)
    return est


def count_min_sketch(ds, column: str, width: int = 4096,
                     depth: int = 4) -> tuple[np.ndarray, int]:
    """Distributed Count-Min over ``column``: per-batch vectorized
    fold, then the HLL-style TREE merge (repartition to <=8 blocks,
    elementwise-ADD per block in workers) so the driver only ever
    sums <=8 sketches — the exchange is fixed-size (depth x width x
    8 B) regardless of input rows, the approximate dual of the exact
    ``heavy_hitters`` space-saving fold.

    Returns ``(sketch, n_total)``."""
    def fold(batch: pa.Table) -> pa.Table:
        cm = cm_fold(batch.column(column), width, depth)
        return pa.table(
            {
                "sketch": pa.array([cm.tobytes()], pa.binary()),
                "n": pa.array([len(batch)], pa.int64()),
            }
        )

    def merge_block(batch: pa.Table) -> pa.Table:
        cm = np.zeros(depth * width, dtype=np.int64)
        for blob in batch.column("sketch").to_pylist():
            cm += np.frombuffer(blob, dtype=np.int64)
        n = int(
            pa.compute.sum(batch.column("n")).as_py() or 0
        )
        return pa.table(
            {
                "sketch": pa.array([cm.tobytes()], pa.binary()),
                "n": pa.array([n], pa.int64()),
            }
        )

    parts = (
        ds.select_columns([column])
        .map_batches(fold, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge_block, batch_size=None,
                     batch_format="pyarrow")
        .to_pandas()
    )
    cm = np.zeros(depth * width, dtype=np.int64)
    for blob in parts["sketch"]:
        cm = cm + np.frombuffer(blob, dtype=np.int64)
    return cm.reshape(depth, width), int(parts["n"].sum())


def cm_join_size(cm_a: np.ndarray, cm_b: np.ndarray) -> int:
    """Equi-join cardinality estimate from two Count-Min sketches
    built with the SAME width/depth/seeds: |A join B on k| =
    sum_k f_A(k) * f_B(k), estimated as the MIN over depth rows of
    the row dot products (AGMS/Count-Min inner-product estimator,
    Cormode & Muthukrishnan 2005 s4.2).  One-sided like the point
    estimate: est >= true, and est <= true + e * N_a * N_b / width
    whp — the shuffle-free join-size probe a planner runs before
    choosing broadcast vs shuffle join."""
    assert cm_a.shape == cm_b.shape
    dots = (
        cm_a.astype(np.float64) * cm_b.astype(np.float64)
    ).sum(axis=1)
    return int(dots.min())
