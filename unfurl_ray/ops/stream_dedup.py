"""Incremental exact dedup against a persistent SHARDED index.

This is the one dedup semantics a Dataset pipeline can't express: a
shared MUTABLE seen-set that must survive across pipeline runs (daily
crawl ingests deduping against all history).  Per the repo's design
rule, raw ``@ray.remote`` actors appear only here — a key-range-sharded
set of index actors; everything around them stays ``map_batches``.

Guarantees: exactly-one admission per content hash across every batch
and every run ingested through the same index (each shard actor
serializes its calls, so concurrent batches race only for WHICH
duplicate survives, never whether one does).  Cross-run order is the
caller's: ingest day 1 fully before day 2 and day 2's duplicates of
day 1 are dropped deterministically.

Scale: one shard holds ~48 B per unique 16-byte digest (Python set
overhead included); shards place independently, so capacity grows with
``n_shards`` across a cluster.  Past ~10^9 uniques per node, front the
set with a Bloom filter and spill exact digests to disk — noted, not
implemented here.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray


@ray.remote
class _DedupShard:
    """Seen-set for one hash shard; calls are serialized by the actor."""

    def __init__(self) -> None:
        self.seen: set[bytes] = set()

    def check_and_add(self, digests: list[bytes]) -> list[bool]:
        out = []
        for d in digests:
            if d in self.seen:
                out.append(False)
            else:
                self.seen.add(d)
                out.append(True)
        return out

    def size(self) -> int:
        return len(self.seen)


class ShardedDedupIndex:
    """Persistent cross-run exact-dedup index over ``n_shards`` actors."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [_DedupShard.remote() for _ in range(n_shards)]

    def filter_new(self, ds, text_col: str = "text"):
        """Keep only rows whose content hash is NEW to the index (and
        admit them).  One round-trip per (batch, touched shard); the
        batch ships digests, never text."""
        shards = self.shards
        n_shards = self.n_shards

        def probe(batch: pd.DataFrame) -> pd.DataFrame:
            digests = [
                hashlib.md5((t or "").encode()).digest()
                for t in batch[text_col]
            ]
            shard_of = np.frombuffer(
                b"".join(d[:1] for d in digests), dtype=np.uint8
            ) % n_shards if digests else np.array([], dtype=np.uint8)
            keep = np.zeros(len(batch), dtype=bool)
            futures, idx_per_shard = [], []
            for s in range(n_shards):
                idx = np.flatnonzero(shard_of == s)
                if len(idx) == 0:
                    continue
                futures.append(
                    shards[s].check_and_add.remote(
                        [digests[i] for i in idx]
                    )
                )
                idx_per_shard.append(idx)
            for idx, new in zip(idx_per_shard, ray.get(futures)):
                # first occurrence inside the batch wins its duplicates
                keep[idx] = new
            return batch[keep]

        return ds.map_batches(probe, batch_format="pandas")

    def sizes(self) -> list[int]:
        return ray.get([s.size.remote() for s in self.shards])
