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
    """Deterministic 64-bit hashes for arbitrary scalars (xxhash-free:
    two rounds of splitmix over a string-hash seed)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    import zlib

    out = np.empty(len(values), dtype=np.uint64)
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        for i, v in enumerate(values):
            b = repr(v).encode()
            h = np.uint64(zlib.crc32(b)) << np.uint64(32) | np.uint64(
                zlib.adler32(b)
            )
            # splitmix64 finalizer
            h = (h + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(2**64 - 1)
            h ^= h >> np.uint64(30)
            h = (h * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(2**64 - 1)
            h ^= h >> np.uint64(27)
            h = (h * np.uint64(0x94D049BB133111EB)) & np.uint64(2**64 - 1)
            h ^= h >> np.uint64(31)
            out[i] = h
    return out


# -- HyperLogLog ------------------------------------------------------------

def hll_fold(values, p: int = 12) -> np.ndarray:
    """Fold values into a fresh 2^p-register sketch (uint8 registers)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) & np.uint64(2**64 - 1)
    # rank = position of leftmost 1-bit in the remaining 64-p bits (+1)
    rank = np.zeros(len(h), dtype=np.uint8)
    remaining = rest
    found = np.zeros(len(h), dtype=bool)
    for bit in range(64 - p):
        top = (remaining >> np.uint64(63)).astype(bool)
        newly = top & ~found
        rank[newly] = bit + 1
        found |= top
        remaining = (remaining << np.uint64(1)) & np.uint64(2**64 - 1)
    rank[~found] = 64 - p + 1
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
    """Approximate COUNT(DISTINCT column): per-batch fold, driver merge
    of 4 KiB sketches (no key shuffle at any scale)."""
    def fold(batch: pa.Table) -> pa.Table:
        regs = hll_fold(batch.column(column), p)
        return pa.table({"sketch": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.select_columns([column]).map_batches(
        fold, batch_format="pyarrow"
    ).to_pandas()
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
            vals = batch[on].tolist()
            maybe = self.bloom.contains(vals)
            hit = np.array(
                [m and v in self.exact for m, v in zip(maybe, vals)],
                dtype=bool,
            )
            return batch[~hit] if anti else batch[hit]

    return ds.map_batches(
        Probe, batch_format="pandas", concurrency=concurrency
    )
