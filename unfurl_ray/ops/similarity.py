"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: brute-force cosine top-k — the baseline.  The query
  matrix is broadcast once (``ray.put`` -> actor ``__init__``), each
  batch does one numpy matmul, partial top-k per batch, merged at the
  end (small result).  No shuffle of the corpus.
- ``knn_ivf``: IVF-style scale path — k-means-ish coarse centroids
  (deterministic seed), assign each vector to its nearest centroid in a
  vectorized ``map_batches``, then probe only the closest ``nprobe``
  partitions.  The centroid table is tiny and broadcast; the corpus
  stays partitioned by centroid (hash groupby), so a query touches a
  fraction of the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _as_matrix(col) -> np.ndarray:
    """list<float> Arrow column -> (n, d) float32 matrix (zero-copyish)."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    try:
        return np.vstack(arr.to_numpy(zero_copy_only=False))
    except ValueError:
        return np.array(arr.to_pylist(), dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    m = m.astype(np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteKnn:
    """Actor-pool stage: per-batch cosine top-k against broadcast queries."""

    def __init__(self, query_ref, k: int = 10):
        import ray

        queries = (
            ray.get(query_ref)
            if isinstance(query_ref, ray.ObjectRef)
            else query_ref
        )
        self.q = _normalize(np.asarray(queries))  # (nq, d)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch.column("embedding")))
        sims = m @ self.q.T  # (n, nq)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            top = min(self.k, len(col))
            idx = np.argpartition(-col, top - 1)[:top]
            out_q.extend([qi] * top)
            out_id.extend(ids[idx].tolist())
            out_sim.extend(col[idx].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(np.round(out_sim, 6), pa.float64()),
            }
        )


def knn_brute(ds, queries: np.ndarray, k: int = 10):
    """Dataset(vec_id, embedding) x queries -> top-k per query.

    Per-batch partial top-k (the only data crossing the wire is
    nq*k rows per batch), merged with a tiny global top-k.
    """
    import ray

    query_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        BruteKnn,
        fn_constructor_kwargs={"query_ref": query_ref, "k": k},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=4,
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "cosine", "vec_id"],
                             ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def kmeans_centroids(ds, n_centroids: int = 16, iters: int = 5,
                     sample: int = 4096) -> np.ndarray:
    """Deterministic small k-means on a sample (driver-side: the sample
    and centroid table are tiny; assignment stays distributed)."""
    rows = ds.select_columns(["embedding"]).limit(sample).to_pandas()
    m = _normalize(np.array(rows["embedding"].tolist(), dtype=np.float64))
    rng = np.random.default_rng(42)
    centroids = m[rng.choice(len(m), size=min(n_centroids, len(m)),
                             replace=False)]
    for _ in range(iters):
        sims = m @ centroids.T
        assign = sims.argmax(axis=1)
        for c in range(len(centroids)):
            members = m[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    centroids[c] = v / n
    return centroids


class IvfAssign:
    def __init__(self, centroid_ref):
        import ray

        c = (
            ray.get(centroid_ref)
            if isinstance(centroid_ref, ray.ObjectRef)
            else centroid_ref
        )
        self.centroids = np.asarray(c)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch.column("embedding")))
        assign = (m @ self.centroids.T).argmax(axis=1).astype(np.int32)
        return batch.append_column("centroid_id", pa.array(assign))


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4):
    """IVF scale path: coarse-quantize, then search only nprobe lists."""
    import ray

    centroids = kmeans_centroids(ds, n_centroids)
    centroid_ref = ray.put(centroids)
    assigned = ds.map_batches(
        IvfAssign,
        fn_constructor_kwargs={"centroid_ref": centroid_ref},
        batch_format="pyarrow",
        concurrency=4,
    )
    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(q @ centroids.T), axis=1)[:, :nprobe]
    wanted = sorted({int(c) for row in probe_lists for c in row})
    subset = assigned.filter(
        expr=f"centroid_id in {wanted}"
    ) if hasattr(assigned, "filter") else assigned
    return knn_brute(subset.drop_columns(["centroid_id"]), queries, k)


class CosinePairs:
    """Actor-pool stage: near-duplicate pairs by embedding cosine.

    The full normalized corpus (id + matrix) is broadcast once via
    ``ray.put`` and each batch matmuls its rows against it, emitting
    only pairs ``vec_a < vec_b`` with ``cosine >= threshold`` — so the
    N^2 similarity matrix never materializes and only matches cross the
    wire.  This is the exact baseline; at corpus sizes where the
    broadcast no longer fits (>~10M x d floats per node), swap the
    probe side for the IVF partitioning of ``knn_ivf`` (or LSH bucket
    groupby a la MinHash) and take the same pair-emission kernel
    within buckets.
    """

    def __init__(self, corpus_ref, threshold: float):
        import ray

        ids, mat = (
            ray.get(corpus_ref)
            if isinstance(corpus_ref, ray.ObjectRef)
            else corpus_ref
        )
        self.ids = ids
        self.mat = mat  # already normalized (n, d)
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("vec_id").to_pylist(), dtype=np.int64)
        m = _normalize(_as_matrix(batch.column("embedding")))
        sims = m @ self.mat.T  # (batch, corpus)
        rows, cols = np.nonzero(sims >= self.threshold)
        a = ids[rows]
        b = self.ids[cols]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cosine": pa.array(
                    np.round(sims[rows, cols][keep], 4), pa.float64()
                ),
            }
        )


def cosine_pair_dedup(ds, threshold: float = 0.45, concurrency: int = 4):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine>=t)."""
    import ray

    corpus = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = corpus["vec_id"].to_numpy(dtype=np.int64)
    mat = _normalize(np.array(corpus["embedding"].tolist()))
    corpus_ref = ray.put((ids, mat))
    return ds.map_batches(
        CosinePairs,
        fn_constructor_kwargs={
            "corpus_ref": corpus_ref, "threshold": threshold,
        },
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=concurrency,
    )
