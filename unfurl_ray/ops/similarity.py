"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: brute-force cosine top-k — the baseline.  The tiny
  query matrix ships by value into the actor pool's constructor, each
  batch does one numpy matmul, partial top-k per batch, merged at the
  end (small result).  No shuffle of the corpus.
- ``cosine_pairs_bucketed``: near-dup pairs without any corpus
  broadcast (centroid-LSH fan-out + within-bucket exact pairs).
- ``knn_ivf`` / ``IvfIndex``: IVF scale path — k-means-ish coarse
  centroids (deterministic seed), assign each vector to its nearest
  centroid in a vectorized ``map_batches``, materialize the corpus
  ONCE as parquet hive-partitioned by ``centroid_id``, then a search
  reads only the closest ``nprobe`` partition directories (pruned at
  the read — a query touches nprobe/n_centroids of the bytes).
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


def _strip_schema_metadata(batch: pa.Table) -> pa.Table:
    """Parquet files written by pandas carry a b'pandas' schema-metadata
    dict that makes ``hash(schema)`` raise, so every batch-sliced stage
    downstream logs Ray's "Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'" warning per worker.
    Dropping the metadata is zero-copy and silences it at the source."""
    return batch.replace_schema_metadata(None)


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
        # rank on the ROUNDED cosine with vec_id tiebreak — the same
        # total order the merge step and the SQL oracle use, so the
        # per-batch partial top-k can never cut a row the global
        # ordering would keep
        sims = np.round(m @ self.q.T, 6)  # (n, nq)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            top = min(self.k, len(col))
            order = np.lexsort((ids, -col))[:top]
            out_q.extend([qi] * top)
            out_id.extend(ids[order].tolist())
            out_sim.extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_sim, pa.float64()),
            }
        )


def knn_brute(ds, queries: np.ndarray, k: int = 10,
              concurrency: int = 4):
    """Dataset(vec_id, embedding) x queries -> top-k per query.

    Per-batch partial top-k (the only data crossing the wire is
    nq*k rows per batch), merged with a tiny global top-k.
    """
    # the query matrix is tiny (nq x d): pass it BY VALUE so it inlines
    # into the actor spec — an ObjectRef constructor arg triggers Ray's
    # actor-restart warning (ray#53727) and buys nothing at this size
    partials = ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None,
    ).map_batches(
        BruteKnn,
        fn_constructor_kwargs={
            "query_ref": np.asarray(queries, dtype=np.float64), "k": k,
        },
        batch_format="pyarrow",
        batch_size=4096,
        # autoscaling pool (min 1): a FIXED pool sized to the CPU
        # count reserves every core and deadlocks the upstream read
        # task pool on small clusters
        concurrency=(1, concurrency),
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
    rows = (
        ds.select_columns(["vec_id", "embedding"]).limit(sample)
        .to_pandas()
        # parallel reads return blocks in nondeterministic order; pin
        # the sample order so the seeded init picks the same rows
        .sort_values("vec_id")
    )
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


def _assign_centroids(batch: pa.Table, centroids=None) -> pa.Table:
    m = _normalize(_as_matrix(batch.column("embedding")))
    assign = (m @ centroids.T).argmax(axis=1).astype(np.int32)
    return batch.append_column("centroid_id", pa.array(assign))


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


class IvfIndex:
    """Materialized IVF index: the corpus written ONCE as parquet
    hive-partitioned by ``centroid_id``; a search reads ONLY its
    ``nprobe`` partition directories (partition-pruned I/O, not a
    full-dataset filter scan).  At 100 TB the build is a single
    assignment pass + partitioned write, amortized over every query.
    """

    def __init__(self, path: str, centroids: np.ndarray):
        self.path = path
        self.centroids = np.asarray(centroids)

    @classmethod
    def build(cls, ds, path: str, n_centroids: int = 16) -> "IvfIndex":
        import os
        import shutil

        # a rebuild must replace, not append to, an existing index —
        # but only ever delete something that IS a prior index (or an
        # empty dir): a caller pointing index_path at an unrelated
        # populated directory must not lose its contents
        if os.path.isdir(path):
            entries = os.listdir(path)
            is_index = "centroids.npy" in entries or any(
                e.startswith("centroid_id=") for e in entries
            )
            if entries and not is_index:
                raise ValueError(
                    f"refusing to overwrite {path!r}: exists and does "
                    "not look like an IVF index (no centroids.npy / "
                    "centroid_id=* partitions)"
                )
        shutil.rmtree(path, ignore_errors=True)
        centroids = kmeans_centroids(ds, n_centroids)
        # assignment as plain TASKS, not a fixed actor pool: a pool
        # sized to the CPU count would reserve every core and starve
        # the downstream Write task pool into a deadlock; the centroid
        # matrix is tiny and ships via fn_kwargs (one object-store put)
        assigned = ds.map_batches(
            _assign_centroids,
            fn_kwargs={"centroids": centroids},
            batch_format="pyarrow",
        )
        # hive layout path/centroid_id=<c>/...; the partition column
        # lives in the path, so list files carry only (vec_id, embedding)
        assigned.write_parquet(path, partition_cols=["centroid_id"])
        np.save(os.path.join(path, "centroids.npy"), centroids)
        return cls(path, centroids)

    @classmethod
    def load(cls, path: str) -> "IvfIndex":
        import os

        return cls(path, np.load(os.path.join(path, "centroids.npy")))

    def append(self, ds) -> "IvfIndex":
        """Incremental index maintenance: assign NEW vectors to the
        EXISTING centroids and write them into the same hive
        partitions as additional files — no re-clustering, no rewrite
        of the resident corpus; searches see old + new immediately
        (partition dirs are multi-file).  Pair with
        ops/layout.compact_layout when appends accumulate small
        files.  Centroid drift under heavy appends is the documented
        trade: rebuild when recall decays."""
        assigned = ds.map_batches(
            _assign_centroids,
            fn_kwargs={"centroids": self.centroids},
            batch_format="pyarrow",
        )
        assigned.write_parquet(self.path, partition_cols=["centroid_id"])
        return self

    def probe_partitions(self, queries: np.ndarray,
                         nprobe: int) -> list[int]:
        q = _normalize(np.asarray(queries, dtype=np.float64))
        lists = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        return sorted({int(c) for row in lists for c in row})

    def search(self, queries: np.ndarray, k: int = 10, nprobe: int = 4):
        """Top-k per query over only the probed partitions' files."""
        import os

        import ray.data as rd

        wanted = self.probe_partitions(queries, nprobe)
        files = sorted(
            os.path.join(d, f)
            for d in (
                os.path.join(self.path, f"centroid_id={c}") for c in wanted
            )
            if os.path.isdir(d)
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
        subset = rd.read_parquet(files, columns=["vec_id", "embedding"])
        return knn_brute(subset, queries, k)


def knn_ivf(ds, queries: np.ndarray, k: int = 10, n_centroids: int = 16,
            nprobe: int = 4, index_path: str | None = None):
    """IVF scale path: build (or reuse) the partitioned index, then
    search only the ``nprobe`` probed partitions.  Pass ``index_path``
    to keep the index for later searches (the point of IVF); without
    one, a throwaway index is built under /tmp and removed after the
    search instead of leaking a full corpus copy per call."""
    import os
    import shutil
    import tempfile

    if index_path and os.path.exists(
        os.path.join(index_path, "centroids.npy")
    ):
        return IvfIndex.load(index_path).search(queries, k=k, nprobe=nprobe)
    tmp = None
    if not index_path:
        index_path = tmp = tempfile.mkdtemp(prefix="ivf_index_")
    try:
        index = IvfIndex.build(ds, index_path, n_centroids)
        return index.search(queries, k=k, nprobe=nprobe)
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)


class CosinePairs:
    """Actor-pool stage: near-duplicate pairs by embedding cosine.

    The full normalized corpus (id + matrix) is broadcast once via
    ``ray.put`` and each batch matmuls its rows against it, emitting
    only pairs ``vec_a < vec_b`` with ``cosine >= threshold`` — so the
    N^2 similarity matrix never materializes and only matches cross the
    wire.  This is the exact baseline; at corpus sizes where the
    broadcast no longer fits (>~10M x d floats per node), use
    ``cosine_pairs_bucketed`` — the same pair-emission kernel within
    centroid-LSH buckets, no broadcast.
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


def cosine_pairs_bucketed(ds, threshold: float = 0.45,
                          n_centroids: int = 16, assign_top: int = 2,
                          chunk: int = 1024, dedup: bool = True):
    """Embedding-cosine near-dup pairs WITHOUT broadcasting the corpus
    — the scale path for corpora too big for ``cosine_pair_dedup``'s
    exact broadcast baseline.

    Each vector fans out to its ``assign_top`` nearest coarse
    centroids (inside the batch), buckets shuffle by centroid, and
    pairs are emitted within buckets with EXACT cosine — so precision
    is exact; only pairs whose vectors share no probed bucket are
    missed (recall rises with ``assign_top``).  The shuffle moves each
    embedding ``assign_top`` times and no node ever holds the corpus;
    bucket size is governed by ``n_centroids`` (scale it with the
    corpus so buckets stay ~corpus/n_centroids).
    """
    import pandas as pd

    from ray.data.aggregate import Min

    centroids = kmeans_centroids(ds, n_centroids)

    def fanout(batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch.column("embedding")))
        top = np.argsort(-(m @ centroids.T), axis=1)[:, :assign_top]
        n = len(m)
        rep = batch.take(pa.array(np.repeat(np.arange(n), assign_top)))
        return rep.append_column(
            "bucket", pa.array(top.ravel().astype(np.int32))
        )

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy(np.int64)
        m = _normalize(np.array(group["embedding"].tolist()))
        out_a, out_b, out_c = [], [], []
        # row-chunked matmul bounds memory at chunk x bucket floats
        for s in range(0, len(ids), chunk):
            sims = m[s: s + chunk] @ m.T
            rows, cols = np.nonzero(sims >= threshold)
            a = ids[rows + s]
            b = ids[cols]
            keep = a < b
            out_a.append(a[keep])
            out_b.append(b[keep])
            out_c.append(sims[rows, cols][keep])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else [],
                "vec_b": np.concatenate(out_b) if out_b else [],
                "cosine": np.round(
                    np.concatenate(out_c) if out_c else [], 4
                ),
            }
        )

    pairs = (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(fanout, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
    )
    if not dedup:
        # a pair found in several shared buckets repeats; callers that
        # dedup downstream anyway (pagerank's per-shard edge unique)
        # skip this corpus-pair-table shuffle
        return pairs
    # a pair found in several shared buckets dedupes with a tiny
    # groupby over the (small) pair table
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(
        Min("cosine", alias_name="cosine")
    )


def cosine_pair_dedup(ds, threshold: float = 0.45, concurrency: int = 4):
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b, cosine>=t)."""
    import ray

    corpus = ds.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = corpus["vec_id"].to_numpy(dtype=np.int64)
    mat = _normalize(np.array(corpus["embedding"].tolist()))
    corpus_ref = ray.put((ids, mat))
    return ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None,
    ).map_batches(
        CosinePairs,
        fn_constructor_kwargs={
            "corpus_ref": corpus_ref, "threshold": threshold,
        },
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=(1, concurrency),
    )


# --- embedding compression: scalar quantization + PCA ----------------

def _dim_minmax(ds, column: str = "embedding") -> tuple[np.ndarray,
                                                        np.ndarray]:
    """Per-dimension (min, max) over the corpus — per-batch partials
    (two d-length rows each), tree-merged via repartition so the
    driver reduces a handful of rows, never one per batch."""
    def fold(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(column))
        return pa.table(
            {
                "mn": pa.array([m.min(axis=0).tobytes()], pa.binary()),
                "mx": pa.array([m.max(axis=0).tobytes()], pa.binary()),
            }
        )

    def merge_block(batch: pa.Table) -> pa.Table:
        mns = np.stack(
            [np.frombuffer(b, dtype=np.float32)
             for b in batch.column("mn").to_pylist()]
        )
        mxs = np.stack(
            [np.frombuffer(b, dtype=np.float32)
             for b in batch.column("mx").to_pylist()]
        )
        return pa.table(
            {
                "mn": pa.array([mns.min(axis=0).tobytes()], pa.binary()),
                "mx": pa.array([mxs.max(axis=0).tobytes()], pa.binary()),
            }
        )

    parts = (
        ds.map_batches(fold, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge_block, batch_format="pyarrow")
        .to_pandas()
    )
    mn = np.stack([np.frombuffer(b, np.float32) for b in parts["mn"]])
    mx = np.stack([np.frombuffer(b, np.float32) for b in parts["mx"]])
    return mn.min(axis=0), mx.max(axis=0)


class _Quantize:
    """map_batches UDF: int8 scalar quantization against broadcast
    per-dimension (min, max) ranges (fetched once per actor)."""

    def __init__(self, ranges_ref, column: str, id_col: str):
        import ray

        mn, mx = (
            ray.get(ranges_ref)
            if isinstance(ranges_ref, ray.ObjectRef)
            else ranges_ref
        )
        # float64 throughout: the SQL oracle promotes FLOAT to DOUBLE
        self.mn = mn.astype(np.float64)
        span = mx.astype(np.float64) - self.mn
        span[span == 0] = 1.0
        self.span = span
        self.column = column
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(self.column)).astype(np.float64)
        # half-up rounding (floor(x+0.5)) matches the DuckDB twin
        code = np.floor((m - self.mn) / self.span * 255.0 + 0.5)
        code = np.clip(code, 0.0, 255.0).astype(np.int64) - 128
        q = code.astype(np.int8)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "qvec": pa.array(list(q), pa.list_(pa.int8())),
                "q_sum": pa.array(code.sum(axis=1), pa.int64()),
                "q_l1": pa.array(
                    np.abs(code).sum(axis=1), pa.int64()
                ),
            }
        )


def quantize_embeddings(ds, column: str = "embedding",
                        id_col: str = "vec_id", concurrency: int = 8):
    """Int8 scalar quantization of an embedding column (4x smaller
    than float32; the standard first compression step before ANN
    indexing at corpus scale).

    Two streaming passes: (1) per-dimension min/max via tree-merged
    partials, (2) quantize per batch against the broadcast ranges.
    Emits the int8 vectors plus integer digests (q_sum, q_l1) that
    make the op hash-checkable without list-typed compare."""
    import ray

    mn, mx = _dim_minmax(ds, column)
    ref = ray.put((mn, mx))
    return ds.map_batches(
        _Quantize,
        fn_constructor_kwargs={"ranges_ref": ref, "column": column,
                               "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def _moments(ds, column: str = "embedding"):
    """Streaming (n, sum, X'X) partials, tree-merged — the driver sees
    a handful of (d + d*d)-float blocks, never the corpus."""
    def fold(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(column)).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0).tobytes()], pa.binary()),
                "xx": pa.array([(m.T @ m).tobytes()], pa.binary()),
            }
        )

    def merge_block(batch: pa.Table) -> pa.Table:
        n = int(pa.compute.sum(batch.column("n")).as_py())
        s = np.sum(
            [np.frombuffer(b, np.float64)
             for b in batch.column("s").to_pylist()], axis=0,
        )
        xx = np.sum(
            [np.frombuffer(b, np.float64)
             for b in batch.column("xx").to_pylist()], axis=0,
        )
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s.tobytes()], pa.binary()),
                "xx": pa.array([xx.tobytes()], pa.binary()),
            }
        )

    parts = (
        ds.map_batches(fold, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge_block, batch_format="pyarrow")
        .to_pandas()
    )
    n = int(parts["n"].sum())
    s = np.sum([np.frombuffer(b, np.float64) for b in parts["s"]],
               axis=0)
    xx = np.sum([np.frombuffer(b, np.float64) for b in parts["xx"]],
                axis=0)
    d = len(s)
    return n, s, xx.reshape(d, d)


def pca_fit(ds, column: str = "embedding", k: int = 2) -> dict:
    """Top-k principal components from distributed moments.

    Covariance = X'X/n - mean mean' accumulates as mergeable partials
    (one matmul per batch); only the d x d Gram matrix reaches the
    driver, where a d x d eigendecomposition is O(d^3) — independent
    of corpus size.  Sign convention: each component's
    largest-|loading| entry is made positive (deterministic across
    numerical libraries)."""
    n, s, xx = _moments(ds, column)
    mean = s / n
    cov = xx / n - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]
    for j in range(comps.shape[1]):
        i = np.argmax(np.abs(comps[:, j]))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    return {"mean": mean, "components": comps,
            "explained_variance": w[order], "n": n}


class _PcaProject:
    def __init__(self, model_ref, column: str, id_col: str):
        import ray

        model = (
            ray.get(model_ref)
            if isinstance(model_ref, ray.ObjectRef)
            else model_ref
        )
        self.mean = model["mean"]
        self.comps = model["components"]
        self.column = column
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch.column(self.column)).astype(np.float64)
        proj = (m - self.mean) @ self.comps
        cols = {self.id_col: batch.column(self.id_col)}
        for j in range(proj.shape[1]):
            cols[f"pc{j + 1}"] = pa.array(proj[:, j], pa.float64())
        return pa.table(cols)


def pca_project(ds, model: dict, column: str = "embedding",
                id_col: str = "vec_id", concurrency: int = 8):
    """Project embeddings onto fitted components (broadcast model,
    one matmul per batch)."""
    import ray

    ref = ray.put(model)
    return ds.map_batches(
        _PcaProject,
        fn_constructor_kwargs={"model_ref": ref, "column": column,
                               "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def kmeans_fit(ds, k: int = 8, iters: int = 4,
               column: str = "embedding", id_col: str = "vec_id",
               concurrency: int = 8) -> np.ndarray:
    """Full-corpus distributed Lloyd's (spherical k-means on normalized
    vectors) — unlike ``kmeans_centroids`` above, which fits on a
    driver-side sample, every iteration here is ONE streaming pass over
    the whole dataset.

    Init is deterministic and shuffle-free: the k smallest ids via a
    per-batch partial bottom-k + driver merge (same pattern as
    ``BruteKnn``'s partial top-k).  Each iteration broadcasts the
    centroid matrix (``ray.put``, fetched in actor ``__init__``) and
    emits per-batch PARTIAL SUMS — a (k x d) float64 matrix and k
    counts, ~4 KB per batch — so the reduce moves k rows per batch,
    never a vector.  Empty clusters keep their previous centroid.
    The projected input is materialized once: an iterative algorithm
    re-consumes its input ``iters`` times, and a lazy Dataset would
    re-run the upstream read per pass.
    """
    proj = ds.select_columns([id_col, column]).materialize()

    def bottomk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy()
        take = np.argsort(ids)[:k]
        return batch.take(pa.array(take))

    seed = (
        proj.map_batches(bottomk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(id_col)
        .head(k)
    )
    centroids = _normalize(
        np.array(seed[column].tolist(), dtype=np.float64)
    )

    import ray

    # plain ray.remote tasks over the materialized block refs — each
    # Lloyd pass previously ran a full Dataset execution PLUS a
    # groupby("cid") shuffle just to merge ~4 KB of per-batch partials
    # (k rows each); direct tasks skip the per-pass scheduling and the
    # driver folds the tiny partials itself.  Block order is fixed by
    # to_arrow_refs, so the float fold order is deterministic (the old
    # shuffle merge folded in arrival order).
    block_refs = proj.to_arrow_refs()

    @ray.remote
    def _psums(block: pa.Table, cents: np.ndarray):
        if block.num_rows == 0 or column not in block.column_names:
            d0 = cents.shape[1]
            return (np.zeros((len(cents), d0)),
                    np.zeros(len(cents), dtype=np.int64))
        m = _normalize(_as_matrix(block.column(column))
                       .astype(np.float64))
        assign = (m @ cents.T).argmax(axis=1)
        sums = np.zeros((len(cents), m.shape[1]), dtype=np.float64)
        counts = np.zeros(len(cents), dtype=np.int64)
        for c in range(len(cents)):  # k iterations, vectorized sum
            members = assign == c
            n = int(members.sum())
            if n:
                sums[c] = m[members].sum(axis=0)
                counts[c] = n
        return sums, counts

    for _ in range(iters):
        outs = ray.get(
            [_psums.remote(b, centroids) for b in block_refs]
        )
        sums = np.sum([o[0] for o in outs], axis=0)
        counts = np.sum([o[1] for o in outs], axis=0)
        new = centroids.copy()
        for c in np.flatnonzero(counts > 0):
            nrm = np.linalg.norm(sums[c])
            if nrm > 0:
                new[c] = sums[c] / nrm
        centroids = new
    return centroids


class _ClusterTopM:
    """Per-batch partial: the m rows closest to their own centroid,
    per cluster — the driver merge then sees at most m * k * n_blocks
    stub rows (id, cluster, sim), never an embedding."""

    def __init__(self, centroids, column: str, id_col: str, m: int):
        self.c = np.asarray(centroids)
        self.column = column
        self.id_col = id_col
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch.column(self.column))
                       .astype(np.float64))
        sims = m @ self.c.T
        assign = sims.argmax(axis=1)
        best = sims[np.arange(len(m)), assign]
        ids = batch.column(self.id_col).to_numpy()
        keep_ids, keep_cl, keep_sim = [], [], []
        for c in np.unique(assign):
            members = np.flatnonzero(assign == c)
            # stable (sim desc, id asc) order via lexsort
            order = members[np.lexsort((ids[members], -best[members]))]
            top = order[: self.m]
            keep_ids.append(ids[top])
            keep_cl.append(np.full(len(top), c, dtype=np.int64))
            keep_sim.append(best[top])
        return pa.table(
            {
                self.id_col: pa.array(np.concatenate(keep_ids),
                                      pa.int64()),
                "cluster": pa.array(np.concatenate(keep_cl), pa.int64()),
                "sim": pa.array(np.concatenate(keep_sim), pa.float64()),
            }
        )


def kmeans_diversity_sample(ds, centroids: np.ndarray, m: int = 10,
                            column: str = "embedding",
                            id_col: str = "vec_id") -> pd.DataFrame:
    """Cluster-balanced coreset: the m vectors nearest their own
    centroid, per cluster — the standard diversity-sampling step after
    k-means curation.  Partial per-batch top-m keeps the driver merge
    at stub rows only (same decomposition as ``knn_brute``)."""
    # stateless + tiny closure (k x d centroid matrix by value):
    # a plain task pool — an actor pool buys nothing here and pays
    # spin-up on every call (measured 3.3 s for a 50k-row pass)
    stubs = ds.map_batches(
        _ClusterTopM(centroids, column, id_col, m),
        batch_format="pyarrow",
    ).to_pandas()
    out = (
        stubs.sort_values(["cluster", "sim", id_col],
                          ascending=[True, False, True])
        .groupby("cluster", as_index=False)
        .head(m)
        .reset_index(drop=True)
    )
    return out


# -- product quantization (PQ) ANN -------------------------------------------

def pq_train(ds, m: int = 16, n_centroids: int = 64, sample: int = 4096,
             iters: int = 10) -> np.ndarray:
    """Train PQ sub-codebooks on a deterministic sample (Jegou et al.,
    "Product Quantization for Nearest Neighbor Search", TPAMI 2011).

    Vectors are L2-normalized, split into ``m`` contiguous subspaces,
    and each subspace gets an independent k-means (squared-L2 Lloyd,
    seeded) codebook.  The sample + codebooks are tiny driver-side
    objects (m * n_centroids * d/m floats) — the standard coarse-model
    training shape (same contract as kmeans_centroids above).
    Returns ``(m, n_centroids, d//m)`` float64.
    """
    if n_centroids > 256:
        raise ValueError(
            "n_centroids > 256 would overflow the uint8 PQ codes"
        )
    rows = (
        ds.select_columns(["vec_id", "embedding"]).limit(sample)
        .to_pandas().sort_values("vec_id")
    )
    X = _normalize(np.array(rows["embedding"].tolist(), dtype=np.float64))
    d = X.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    books = np.zeros((m, n_centroids, sub), dtype=np.float64)
    for j in range(m):
        Xj = X[:, j * sub: (j + 1) * sub]
        rng = np.random.default_rng(42 + j)
        kk = min(n_centroids, len(Xj))
        c = Xj[rng.choice(len(Xj), size=kk, replace=False)].copy()
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for ci in range(kk):
                members = Xj[assign == ci]
                if len(members):
                    c[ci] = members.mean(axis=0)
        books[j, :kk] = c
        if kk < n_centroids:
            books[j, kk:] = c[0]  # degenerate tail duplicates
    return books


class PqEncode:
    """Actor-pool encoder: vectors -> m uint8 codes (one binary col)."""

    def __init__(self, books_ref):
        import ray

        b = (
            ray.get(books_ref)
            if isinstance(books_ref, ray.ObjectRef)
            else books_ref
        )
        self.books = np.asarray(b)
        # precompute ||c||^2 per subspace for the argmin
        self.c2 = (self.books ** 2).sum(axis=2)  # (m, n_centroids)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            batch.column("vec_id").to_pylist(), dtype=np.int64
        )
        X = _normalize(_as_matrix(batch.column("embedding")))
        m, _, sub = self.books.shape
        codes = np.zeros((len(X), m), dtype=np.uint8)
        for j in range(m):
            Xj = X[:, j * sub: (j + 1) * sub]
            # argmin ||x - c||^2 = argmin c^2 - 2 x.c  (x^2 constant)
            scores = self.c2[j][None, :] - 2.0 * (Xj @ self.books[j].T)
            codes[:, j] = scores.argmin(axis=1).astype(np.uint8)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "pq_code": pa.array(
                    [c.tobytes() for c in codes], pa.binary()
                ),
            }
        )


class _PqScan:
    """ADC scan: per-batch partial top-k from codes alone (no vectors)."""

    def __init__(self, books_ref, queries, k):
        import ray

        b = (
            ray.get(books_ref)
            if isinstance(books_ref, ray.ObjectRef)
            else books_ref
        )
        books = np.asarray(b)
        q = _normalize(np.asarray(queries, dtype=np.float64))
        m, nc, sub = books.shape
        # lookup tables: (nq, m, n_centroids) of q_j . c
        self.tables = np.einsum(
            "qmd,mcd->qmc", q.reshape(len(q), m, sub), books
        )
        self.k = k
        self.m = m

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = np.asarray(
            batch.column("vec_id").to_pylist(), dtype=np.int64
        )
        code_bytes = batch.column("pq_code").to_pylist()
        codes = np.frombuffer(
            b"".join(code_bytes), dtype=np.uint8
        ).reshape(len(ids), self.m)
        nq = self.tables.shape[0]
        out_q, out_id, out_s = [], [], []
        cols = np.arange(self.m)
        for qi in range(nq):
            # sum_j table[qi, j, code_j] — vectorized gather
            s = self.tables[qi][cols[None, :], codes].sum(axis=1)
            s = np.round(s, 6)
            top = min(self.k, len(s))
            order = np.lexsort((ids, -s))[:top]
            out_q.extend([qi] * top)
            out_id.extend(ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int32()),
                "vec_id": pa.array(out_id, pa.int64()),
                "score": pa.array(out_s, pa.float64()),
            }
        )


def knn_pq(ds, queries: np.ndarray, k: int = 10, m: int = 16,
           n_centroids: int = 64, concurrency: int = 4) -> "pd.DataFrame":
    """PQ-compressed ANN top-k: train sub-codebooks on a sample, encode
    the corpus to m bytes/vector (a 32x compression of the 64-dim
    float32 input), then answer queries from CODES ALONE via
    asymmetric-distance lookup tables — the memory-scale path when
    even the IVF lists are too large to hold uncompressed.  Per-batch
    partial top-k merged driver-side, same total order contract as
    knn_brute (rounded score, vec_id tiebreak)."""
    import pandas as pd
    import ray

    # codebooks are tiny (m*n_centroids*d/m floats ~ tens of KB):
    # pass BY VALUE so they inline into the actor spec (an ObjectRef
    # constructor arg triggers Ray's actor-restart warning, ray#53727)
    books = pq_train(ds, m=m, n_centroids=n_centroids)
    books_ref = books
    codes = ds.map_batches(
        _strip_schema_metadata, batch_format="pyarrow", batch_size=None,
    ).map_batches(
        PqEncode,
        fn_constructor_kwargs={"books_ref": books_ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )
    partials = codes.map_batches(
        _PqScan,
        fn_constructor_kwargs={
            "books_ref": books_ref,
            "queries": np.asarray(queries, dtype=np.float64),
            "k": k,
        },
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, concurrency),
    ).to_pandas()
    return (
        partials.sort_values(
            ["query_id", "score", "vec_id"],
            ascending=[True, False, True],
        )
        .groupby("query_id", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )


def label_centroid_separation(ds, label_col: str = "label",
                              column: str = "embedding") -> "object":
    """Clustering-quality audit of a labeled embedding table: per
    label, the member count and the mean cosine of members to their
    OWN label centroid (the intra-cluster cohesion half of a
    silhouette; near 1 = tight cluster, near 0 = noise).

    Two streaming passes, kmeans_fit's partial-sum shape: pass 1
    folds per-batch (label -> sum vector, count) partials — a
    (labels x d) matrix per batch, never a row vector — into
    centroids on the driver (labels are few; the 100 TB contract is
    label-cardinality << corpus, e.g. source/language/cluster ids);
    pass 2 broadcasts the centroid matrix once via ``ray.put`` and
    folds per-batch (label -> sum cosine, count) partials.

    Returns a pandas DataFrame (label, n, mean_cos), label-sorted.
    """
    import pandas as pd
    import ray

    proj = ds.select_columns([label_col, column]).materialize()

    def sum_partial(batch: pa.Table) -> pa.Table:
        labels = batch.column(label_col).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        X = np.vstack(
            batch.column(column).to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), X.shape[1]))
        np.add.at(sums, inv, X)
        cnt = np.bincount(inv, minlength=len(uniq))
        return pa.table(
            {
                "label": pa.array(uniq, pa.int64()),
                "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                "cnt": pa.array(cnt, pa.int64()),
            }
        )

    parts = proj.map_batches(
        sum_partial, batch_format="pyarrow"
    ).to_pandas()
    agg: dict[int, tuple[np.ndarray, int]] = {}
    for _, row in parts.iterrows():
        v = np.asarray(row["vsum"], dtype=np.float64)
        lab = int(row["label"])
        if lab in agg:
            agg[lab] = (agg[lab][0] + v, agg[lab][1] + int(row["cnt"]))
        else:
            agg[lab] = (v, int(row["cnt"]))
    labels_sorted = sorted(agg)
    cent = np.vstack(
        [agg[lab][0] / agg[lab][1] for lab in labels_sorted]
    )
    pos = {lab: i for i, lab in enumerate(labels_sorted)}
    cent_ref = ray.put((pos, cent))

    class CosPartial:
        def __init__(self, ref):
            self.pos, self.cent = ray.get(ref)
            self.cnorm = np.linalg.norm(self.cent, axis=1)

        def __call__(self, batch: pa.Table) -> pa.Table:
            labels = batch.column(label_col).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            X = np.vstack(
                batch.column(column).to_numpy(zero_copy_only=False)
            ).astype(np.float64)
            idx = np.array([self.pos[int(b)] for b in labels])
            c = self.cent[idx]
            cos = (X * c).sum(axis=1) / (
                np.linalg.norm(X, axis=1) * self.cnorm[idx]
            )
            uniq, inv = np.unique(labels, return_inverse=True)
            s = np.zeros(len(uniq))
            np.add.at(s, inv, cos)
            return pa.table(
                {
                    "label": pa.array(uniq, pa.int64()),
                    "cos_sum": pa.array(s, pa.float64()),
                    "cnt": pa.array(
                        np.bincount(inv, minlength=len(uniq)),
                        pa.int64(),
                    ),
                }
            )

    parts2 = proj.map_batches(
        CosPartial, batch_format="pyarrow",
        fn_constructor_args=(cent_ref,), concurrency=(1, 8),
    ).to_pandas()
    g = parts2.groupby("label", as_index=False).agg(
        {"cos_sum": "sum", "cnt": "sum"}
    )
    out = pd.DataFrame(
        {
            "label": g["label"].astype("int64"),
            "n": g["cnt"].astype("int64"),
            "mean_cos": g["cos_sum"] / g["cnt"],
        }
    )
    return out.sort_values("label").reset_index(drop=True)
