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
import pyarrow as pa

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
            # typed Arrow out: empty pandas object columns break Ray's
            # block size estimator (and schema unification)
            import pyarrow as _pa

            return _pa.Table.from_pandas(
                batch[keep], preserve_index=False
            ).replace_schema_metadata(None)

        # MATERIALIZED: probe mutates persistent actor state, so a
        # lazy re-execution (second consumption, task retry after the
        # job) would see its own admissions as duplicates and drop
        # everything — the admitted snapshot must be pinned once
        return ds.map_batches(probe, batch_format="pandas").materialize()

    def sizes(self) -> list[int]:
        return ray.get([s.size.remote() for s in self.shards])


@ray.remote
class _BandShard:
    """Band-key registry for one LSH shard; serialized by the actor."""

    def __init__(self) -> None:
        self.keys: set[int] = set()

    def probe(self, keys: list[int]) -> list[bool]:
        return [k in self.keys for k in keys]

    def add(self, keys: list[int]) -> None:
        self.keys.update(keys)

    def size(self) -> int:
        return len(self.keys)


class ShardedNearDupIndex:
    """Incremental cross-run NEAR-dup filter: the streaming sibling of
    the batch MinHash+LSH pipeline (ops/dedup.py), against a persistent
    band-key index — a daily ingest drops documents near-identical to
    ANY previously admitted doc, not just byte-equal ones.

    Uses the exact same signatures/banding as the batch path
    (``minhash_band_rows``): a doc whose ``>= min_hits`` band keys are
    already registered is a near-dup and is dropped; otherwise the doc
    is admitted and its band keys register.  Probe and admit are two
    actor round-trips, so two *concurrently in-flight* near-dup docs
    can both admit (same race window the exact index documents for
    WHICH duplicate survives); sequential batches/runs are
    deterministic.  Precision follows LSH: band collisions are
    Jaccard-likely, not verified — pair with the batch verify stage
    when exactness matters.
    """

    def __init__(self, n_shards: int = 8, min_hits: int = 1):
        self.n_shards = n_shards
        self.min_hits = min_hits
        self.shards = [_BandShard.remote() for _ in range(n_shards)]

    def filter_new(self, ds, text_col: str = "text",
                   id_col: str = "doc_id"):
        from unfurl_ray.ops.dedup import N_BANDS, minhash_band_rows

        shards = self.shards
        n_shards = self.n_shards
        min_hits = self.min_hits

        def probe(batch: pd.DataFrame) -> pd.DataFrame:
            import pyarrow as pa

            if len(batch) == 0:
                return batch
            rows = minhash_band_rows(
                pa.Table.from_pandas(
                    batch[[id_col, text_col]], preserve_index=False
                ),
                column=text_col, id_column=id_col,
            ).to_pandas()
            # one global 64-bit key per (band_id, band_hash)
            with np.errstate(over="ignore"):
                key = (
                    rows["band_hash"].to_numpy().astype(np.uint64)
                    * np.uint64(1_000_003)
                    + rows["band_id"].to_numpy().astype(np.uint64)
                )
            shard_of = (key % np.uint64(n_shards)).astype(np.int64)
            known = np.zeros(len(rows), dtype=bool)
            futures, idxs = [], []
            for s in range(n_shards):
                idx = np.flatnonzero(shard_of == s)
                if len(idx):
                    futures.append(
                        shards[s].probe.remote(
                            key[idx].astype(np.int64).tolist()
                        )
                    )
                    idxs.append(idx)
            for idx, hit in zip(idxs, ray.get(futures)):
                known[idx] = hit
            # within-batch first-doc-wins: a band key seen earlier in
            # THIS batch counts as a hit for later docs too
            dup_in_batch = pd.Series(key).duplicated().to_numpy()
            hits = (
                pd.DataFrame(
                    {
                        "doc": rows[id_col].to_numpy(),
                        "k": known | dup_in_batch,
                    }
                )
                .groupby("doc", sort=False)["k"]
                .sum()
            )
            admitted_docs = set(
                hits[hits < min_hits].index.tolist()
            )
            keep_mask = batch[id_col].isin(admitted_docs).to_numpy()
            # register ONLY admitted docs' band keys, once each
            reg = rows[id_col].isin(admitted_docs).to_numpy()
            reg &= ~dup_in_batch
            futures = []
            for s in range(n_shards):
                idx = np.flatnonzero((shard_of == s) & reg)
                if len(idx):
                    futures.append(
                        shards[s].add.remote(
                            key[idx].astype(np.int64).tolist()
                        )
                    )
            ray.get(futures)
            # within a batch the first member of a near-dup cluster
            # wins (later members hit its band keys via dup_in_batch);
            # only across CONCURRENTLY in-flight batches can a pair
            # both admit — the race window documented on the class
            return pa.Table.from_pandas(
                batch[keep_mask], preserve_index=False
            ).replace_schema_metadata(None)

        # MATERIALIZED for the same reason as ShardedDedupIndex: the
        # probe's admissions are side effects; re-running the lazy
        # graph would drop every previously admitted doc
        return ds.map_batches(probe, batch_format="pandas").materialize()

    def sizes(self) -> list[int]:
        return ray.get([s.size.remote() for s in self.shards])
