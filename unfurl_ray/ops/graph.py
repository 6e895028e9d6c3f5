"""Distributed graph ops: duplicate-cluster connected components.

A near-dup pipeline at scale ends with *clustering*, not pairs: LSH /
fingerprint buckets emit candidate edges, and the connected components
of that graph are the duplicate clusters (one representative kept per
component).  This module provides the Ray-Data-native pieces:

- ``chunk_fingerprint_rows``: position-aligned substring fingerprints
  per document (SQL-expressible, so the whole chain is oracle-checkable
  end to end — unlike MinHash, whose permutations have no SQL twin).
- ``fingerprint_edges``: LSH-style bucket join — docs sharing a
  fingerprint become edges.  groupby(fingerprint) moves only
  (fingerprint, doc_id) rows, never text.
- ``connected_components``: iterative min-label propagation — the
  standard distributed CC used by Spark GraphX / Pregel — over
  co-partitioned graph-shard ACTORS (hash(node) -> shard owns the
  node's out-edges and label).  The edge graph shuffles once at
  setup; each round is then pure actor-to-actor ref exchange (no
  Dataset execution), and pointer jumping (label <- label[label],
  one extra exchange) makes rounds O(log diameter).  Dup clusters
  are near-cliques, so 2-4 rounds in practice (``max_iters`` guards
  pathological inputs); convergence = zero labels changed.
- ``assign_components``: map the corpus to its cluster representative.
  The label table is O(docs-that-have-a-duplicate); it broadcasts via
  one ``ray.put`` as sorted int64 arrays and each task probes with a
  vectorized ``searchsorted``.  Above ``broadcast_limit`` rows it
  switches to a bucketed left hash join on doc_id (same output, one
  more shuffle of id/label rows).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def chunk_fingerprint_rows(batch: pa.Table, column: str = "text",
                           id_column: str = "doc_id",
                           chunk_size: int = 64,
                           n_buckets: int | None = None) -> pa.Table:
    """Explode each doc into (id, fingerprint) rows: md5 of each
    position-aligned ``chunk_size``-char slice of the raw text.  Docs
    sharing any aligned chunk (copied prefixes, exact dups, shared
    boilerplate blocks) land in the same bucket.  SQL twin:
    ``md5(substr(text, 64*g+1, 64))`` over ``g in range(ceil(len/64))``.

    With ``n_buckets`` an ``fb`` shuffle-bucket column rides along,
    computed from the digest's first 4 bytes while the digest is in
    hand — equal to ``int(hexdigest[:8], 16) % n_buckets`` but with no
    second per-row pass downstream.
    """
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(column).to_pylist()
    out_ids, out_f, out_b = [], [], []
    for doc_id, text in zip(ids, texts):
        if not text:
            continue
        for start in range(0, len(text), chunk_size):
            digest = hashlib.md5(
                text[start: start + chunk_size].encode()
            ).digest()
            out_ids.append(doc_id)
            out_f.append(digest.hex())
            if n_buckets is not None:
                out_b.append(
                    int.from_bytes(digest[:4], "big") % n_buckets
                )
    cols = {
        id_column: pa.array(out_ids, pa.int64()),
        "f": pa.array(out_f, pa.string()),
    }
    if n_buckets is not None:
        cols["fb"] = pa.array(out_b, pa.int32())
    return pa.table(cols)


def fingerprint_edges(ds, column: str = "text", id_column: str = "doc_id",
                      chunk_size: int = 64, bucket_cap: int | None = None,
                      n_buckets: int | None = None):
    """Bucket join: docs sharing a fingerprint become directed-symmetric
    edges (u, v) AND (v, u).  Edges may repeat across fingerprints —
    min-label propagation is idempotent, so dedup would buy nothing and
    cost a shuffle.

    ``bucket_cap`` guards the quadratic blowup of a hot fingerprint
    (e.g. an empty-ish chunk shared by millions of docs): cap the
    bucket at the smallest ``cap`` doc_ids — they still chain every
    capped doc into one component transitively.  Default ``None``
    (exact) to stay byte-equal with the SQL oracle; set it at scale.
    """
    # shuffle-bucket count sized to the data (same rule as the MinHash
    # banding fix in ops/dedup.py): a FIXED count means group size
    # grows with the corpus; too many means one near-empty Python
    # dispatch per group.  ~1000 docs' worth of chunk rows per bucket.
    # (count() on a raw parquet read is metadata-only; callers passing
    # a transformed Dataset should materialize it first — q_curation
    # does.)
    if n_buckets is None:
        n_buckets = max(16, ds.count() // 1000)
    rows = ds.map_batches(
        lambda b: chunk_fingerprint_rows(
            b, column, id_column, chunk_size, n_buckets=n_buckets
        ),
        batch_format="pyarrow",
    )

    def pairs(group: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        ids = np.unique(group[id_column].to_numpy())
        if bucket_cap is not None:
            ids = ids[:bucket_cap]
        n = len(ids)
        if n < 2:
            empty = np.array([], dtype=np.int64)
            return empty, empty
        iu, iv = np.triu_indices(n, k=1)
        u, v = ids[iu], ids[iv]
        return np.concatenate([u, v]), np.concatenate([v, u])

    # one group per distinct fingerprint value would pay a Python
    # dispatch per group (the round-1 minhash pathology) — the rows
    # already carry a bounded digest-derived bucket column ``fb``
    # (computed alongside the md5 itself); group on that and
    # sub-group vectorized inside.
    def pairs_in_bucket(group: pd.DataFrame) -> pa.Table:
        # emit ARROW (even when empty, with a real schema): map_batches
        # passes empty blocks through without calling the UDF, so an
        # empty pandas block emitted here would survive any downstream
        # to-arrow normalization and crash arrow/pandas block unions.
        outs = [pairs(g) for _, g in group.groupby("f", sort=False)]
        us = np.concatenate([u for u, _ in outs]) if outs else \
            np.array([], dtype=np.int64)
        vs = np.concatenate([v for _, v in outs]) if outs else \
            np.array([], dtype=np.int64)
        return pa.table(
            {"u": pa.array(us, pa.int64()), "v": pa.array(vs, pa.int64())}
        )

    return rows.groupby("fb").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )


def connected_components(edges, num_partitions: int = 8,
                         max_iters: int = 32,
                         distributed: bool | None = None,
                         driver_edge_limit: int = 5_000_000,
                         pointer_jump: bool = True):
    """Min-label propagation CC over an edge Dataset [(u, v), both
    directions].  Returns (node, component) for every node that
    appears in the edge set; component = min node id reachable.

    Two paths, selected by edge count when ``distributed`` is None:

    - **driver union-find** (edges <= ``driver_edge_limit``): the dup
      graph of a typical corpus is orders of magnitude smaller than
      the corpus, and the label table is broadcast driver-side by
      ``assign_components`` anyway — so O(edges) on the driver is
      already the operating assumption.  Path-compressed union-find,
      exact same output.
    - **actor-sharded fixpoint** (big graphs / ``distributed=True``):
      ``num_partitions`` co-partitioned graph-shard actors (the same
      Pregel layout as ``pagerank``); every round is min-label
      propagation plus (with ``pointer_jump``, default) one label <-
      label[label] exchange, all actor-to-actor ref routing with no
      per-round Dataset execution or shuffle.  Pointer jumping makes
      rounds O(log diameter) — long dup CHAINS (A~B~C~...) converge
      too, not just the near-clique clusters (2-4 rounds) typical of
      dup graphs.  Partitioning assumption: one shard's edges (~16 B
      per edge) and node labels fit an actor heap — size
      ``num_partitions`` to the graph, never to the corpus."""
    # materialize the edge set up front: the auto-mode count, the
    # driver path's collect, and the shard bucketing all re-read
    # it — without this, each consumption re-executes the whole
    # upstream fingerprint/bucket pipeline
    edges = edges.materialize()
    if distributed is None:
        distributed = edges.count() > driver_edge_limit
    if not distributed:
        df = edges.to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for a, b in zip(df["u"].astype("int64"), df["v"].astype("int64")):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                # union by value: smaller id becomes the root, so the
                # representative IS the component min
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        nodes = sorted(set(df["u"].astype("int64"))
                       | set(df["v"].astype("int64")))
        return pd.DataFrame(
            {"node": pd.Series(nodes, dtype="int64"),
             "label": pd.Series([find(n) for n in nodes], dtype="int64")}
        )

    # actor-sharded fixpoint (same Pregel layout as pagerank): the
    # edge set hash-buckets by src ONCE, then every round is pure
    # actor-to-actor ref exchange — min-label propagation (2 RPC
    # waves) plus pointer jumping (3 waves: query owners of current
    # label values, answer, apply) — with NO Dataset execution, which
    # cost ~1 s of fixed scheduling per round in the join+groupby
    # formulation regardless of data size.  Convergence = zero labels
    # changed across a full round (overflow-proof, unlike a label
    # sum on billion-node graphs).
    import ray

    B = max(1, num_partitions)
    actors, counts = _spawn_shards(_CCShard, edges, B, "u", "v")
    if int(sum(counts)) == 0:
        return _collect_shards(
            actors, [], {"node": "int64", "label": "int64"}
        )

    for _ in range(max_iters):
        outs = [_fan(a, "propagate", B) for a in actors]
        changed = sum(ray.get(
            [
                actors[t].update.remote(*[outs[i][t] for i in range(B)])
                for t in range(B)
            ]
        ))
        if pointer_jump:
            # label <- label[label] turns O(diameter) convergence
            # into O(log diameter) — a 4096-node chain closes in ~11
            # rounds; labels only decrease, preserving monotonicity
            qs = [_fan(a, "label_queries", B) for a in actors]
            ans = [
                _fan(actors[t], "label_answers", B,
                     *[qs[i][t] for i in range(B)])
                for t in range(B)
            ]
            changed += sum(ray.get(
                [
                    actors[i].apply_jump.remote(
                        *[ans[t][i] for t in range(B)]
                    )
                    for i in range(B)
                ]
            ))
        if changed == 0:
            break

    refs = [
        a.labels_df.remote() for a, c in zip(actors, counts) if c > 0
    ]
    return _collect_shards(
        actors, refs, {"node": "int64", "label": "int64"}
    )


def assign_components(ds, labels, id_column: str = "doc_id",
                      out_column: str = "component",
                      broadcast_limit: int = 20_000_000):
    """Corpus -> (id, component): nodes in the label table get their
    component, everything else is its own singleton.

    Two paths, selected by label-table size: below ``broadcast_limit``
    rows the labels broadcast ONCE via ``ray.put`` as a pair of sorted
    int64 arrays (~16 B/row) and every batch probes with one
    vectorized ``searchsorted`` — all int64, no float promotion, no
    Python loop.  Above it (a dup set too big to hold per worker) the
    probe becomes one bucketed LEFT hash join on the id plus a
    vectorized null-fill — same output, one extra shuffle of
    (id, label) rows only, never payload."""
    import ray

    if isinstance(labels, pd.DataFrame):
        n_labels = len(labels)
    else:
        labels = labels.materialize()
        n_labels = labels.count()

    if n_labels > broadcast_limit:
        from unfurl_ray.ops.relational import _arrow, bucketed_hash_join

        if isinstance(labels, pd.DataFrame):
            labels = ray.data.from_arrow(
                _arrow(labels.astype({"node": "int64", "label": "int64"}))
            )

        def fill(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).cast(pa.int64())
            comp = pa.compute.coalesce(
                batch.column("label").cast(pa.int64()), ids
            )
            return pa.table({id_column: ids, out_column: comp})

        return bucketed_hash_join(
            ds.select_columns([id_column]), labels,
            on=id_column, right_on="node", how="left",
        ).map_batches(fill, batch_format="pyarrow")

    if not isinstance(labels, pd.DataFrame):
        labels = labels.to_pandas()
    nodes = labels["node"].to_numpy(dtype=np.int64)
    labs = labels["label"].to_numpy(dtype=np.int64)
    order = np.argsort(nodes, kind="stable")
    map_ref = ray.put((nodes[order], labs[order]))

    class Assign:
        def __init__(self):
            self.nodes, self.labs = ray.get(map_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(id_column).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            if len(self.nodes) and len(ids):
                pos = np.clip(
                    np.searchsorted(self.nodes, ids),
                    0, len(self.nodes) - 1,
                )
                comp = np.where(
                    self.nodes[pos] == ids, self.labs[pos], ids
                )
            else:
                comp = ids
            return pa.table(
                {
                    id_column: pa.array(ids, pa.int64()),
                    out_column: pa.array(comp, pa.int64()),
                }
            )

    return ds.select_columns([id_column]).map_batches(
        Assign, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )


def _node_bucket(ids: np.ndarray, n_buckets: int) -> np.ndarray:
    """Stable node -> bucket hash shared by every PageRank stage (the
    pandas siphash is deterministic across processes — the same
    property bucketed_aggregate already relies on)."""
    return (
        pd.util.hash_array(ids.astype(np.int64, copy=False))
        % np.uint64(n_buckets)
    ).astype(np.int64)


class _GraphShard:
    """Shared Pregel-layout base: a shard owns every out-edge of the
    nodes in its ``hash(node) % B`` bucket plus those nodes' iterated
    state.  The iteration loop is actor-to-actor ref exchange — NO
    Dataset execution per round, which is what made the Dataset
    formulations pay ~1 s of fixed scheduling per step regardless of
    data."""

    def __init__(self, bucket: int, n_buckets: int, src_col: str,
                 dst_col: str, edge_refs, dedup_edges: bool = False,
                 weight_col: str | None = None):
        import ray

        self.b, self.B = bucket, n_buckets
        dfs = [
            d for d in ray.get(list(edge_refs))
            if len(d) and src_col in d.columns
        ]
        w = None
        if dfs:
            src = np.concatenate(
                [d[src_col].to_numpy(dtype=np.int64) for d in dfs]
            )
            dst = np.concatenate(
                [d[dst_col].to_numpy(dtype=np.int64) for d in dfs]
            )
            if weight_col is not None:
                w = np.concatenate(
                    [d[weight_col].to_numpy(dtype=np.int64)
                     for d in dfs]
                )
            # robust to coalesced multi-bucket blocks
            keep = _node_bucket(src, n_buckets) == bucket
            src, dst = src[keep], dst[keep]
            if w is not None:
                w = w[keep]
        else:
            src = dst = np.array([], dtype=np.int64)
            if weight_col is not None:
                w = np.array([], dtype=np.int64)
        if dedup_edges and len(src):
            # an edge's bucket is a pure function of src, so every
            # duplicate of a (src, dst) pair lands on THIS shard —
            # per-shard unique equals a global edge dedup, letting
            # callers skip a corpus-wide pair-dedup shuffle upstream
            # (weighted variant: the lexsort puts the SMALLEST weight
            # first per pair, so dedup keeps the min-weight edge)
            order = (
                np.lexsort((dst, src)) if w is None
                else np.lexsort((w, dst, src))
            )
            src, dst = src[order], dst[order]
            if w is not None:
                w = w[order]
            first = np.ones(len(src), dtype=bool)
            first[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
            src, dst = src[first], dst[first]
            if w is not None:
                w = w[first]
        self._src, self._dst, self._w = src, dst, w
        self._tgt = _node_bucket(dst, n_buckets)

    def discover(self):
        """Unique dst per target bucket (num_returns=B fan-out)."""
        out = [
            np.unique(self._dst[self._tgt == t])
            for t in range(self.B)
        ]
        return out if self.B > 1 else out[0]

    def _register_nodes(self, incoming) -> np.ndarray:
        """Own node set = my srcs + dsts other shards discovered;
        precompute per-target (src position, dst code) plans so each
        step is pure bincount/reduceat."""
        parts = [self._src] + [np.asarray(x) for x in incoming]
        mine = np.unique(np.concatenate(parts))
        self.nodes = mine
        self.plan = []
        self.plan_w = []  # parallel per-edge weights (None unweighted)
        for t in range(self.B):
            m = self._tgt == t
            vals, codes = np.unique(self._dst[m], return_inverse=True)
            spos = np.searchsorted(mine, self._src[m])
            # group by dst code once so per-step folds are reduceat /
            # bincount over contiguous runs, not ufunc.at scatter
            order = np.argsort(codes, kind="stable")
            starts = np.searchsorted(
                codes[order], np.arange(len(vals))
            )
            self.plan.append((spos[order], starts, vals))
            self.plan_w.append(
                None if self._w is None else self._w[m][order]
            )
        return mine


class _PRShard(_GraphShard):
    """PageRank shard: rank state + per-step contribution bincounts."""

    def register(self, *incoming) -> int:
        mine = self._register_nodes(incoming)
        pos = np.searchsorted(mine, self._src)
        self.deg = np.bincount(
            pos, minlength=len(mine)
        ).astype(np.float64)
        del self._src, self._dst, self._tgt
        return len(mine)

    def init_rank(self, total: int) -> float:
        self.n = total
        r0 = 1.0 / total if total else 0.0
        self.w = np.where(self.deg > 0, r0 / self.deg, 0.0)
        return float(r0 * (self.deg == 0).sum())

    def contribs(self):
        """Per-target pre-aggregated (dst, sum) pairs — the only
        thing that moves between shards each step."""
        out = []
        for spos, starts, vals in self.plan:
            if len(vals) == 0:
                out.append((vals, np.array([], dtype=np.float64)))
            else:
                out.append(
                    (vals, np.add.reduceat(self.w[spos], starts))
                )
        return out if self.B > 1 else out[0]

    def update(self, damping: float, dangling: float, *parts):
        c = np.zeros(len(self.nodes))
        for vals, sums in parts:
            if len(vals):
                # vals unique within one part -> plain fancy add
                c[np.searchsorted(self.nodes, vals)] += sums
        self.rank = (1.0 - damping) / self.n + damping * (
            c + dangling / self.n
        )
        self.w = np.where(self.deg > 0, self.rank / self.deg, 0.0)
        return float(self.rank[self.deg == 0].sum())

    def ranks(self) -> pd.DataFrame:
        return pd.DataFrame({"node": self.nodes, "rank": self.rank})


class _CCShard(_GraphShard):
    """Connected-components shard: min-label propagation plus an
    optional pointer-jump exchange per round, all ref routing."""

    def register(self, *incoming) -> int:
        mine = self._register_nodes(incoming)
        self.label = mine.copy()
        del self._src, self._dst, self._tgt
        return len(mine)

    def propagate(self):
        """Per-target pre-aggregated (dst, min label[src]) pairs."""
        out = []
        for spos, starts, vals in self.plan:
            if len(vals) == 0:
                out.append((vals, vals))
            else:
                out.append(
                    (vals,
                     np.minimum.reduceat(self.label[spos], starts))
                )
        return out if self.B > 1 else out[0]

    def update(self, *parts) -> int:
        """Fold incoming per-dst minima; return #labels changed —
        the overflow-proof convergence scalar (a label SUM can wrap
        int64 on billion-node graphs)."""
        changed = 0
        for vals, mins in parts:
            if len(vals):
                pos = np.searchsorted(self.nodes, vals)
                new = np.minimum(self.label[pos], mins)
                changed += int((new < self.label[pos]).sum())
                self.label[pos] = new
        return changed

    def label_queries(self):
        """Pointer-jump phase 1: distinct label values, routed to the
        shard that owns each label's node (labels ARE node ids)."""
        uniq = np.unique(self.label)
        owner = _node_bucket(uniq, self.B)
        self._q = [uniq[owner == t] for t in range(self.B)]
        return self._q if self.B > 1 else self._q[0]

    def label_answers(self, *queries):
        """Pointer-jump phase 2: answer label[q] for each source
        shard's query array (num_returns=B fan-back)."""
        out = []
        for q in queries:
            q = np.asarray(q, dtype=np.int64)
            if len(q) == 0 or len(self.nodes) == 0:
                out.append(q)
                continue
            pos = np.clip(
                np.searchsorted(self.nodes, q), 0, len(self.nodes) - 1
            )
            out.append(
                np.where(self.nodes[pos] == q, self.label[pos], q)
            )
        return out if self.B > 1 else out[0]

    def apply_jump(self, *answers) -> int:
        """Pointer-jump phase 3: label <- label[label] via the
        answered map; labels only decrease, so convergence stays
        monotone.  Returns #labels changed."""
        old = np.concatenate([np.asarray(q) for q in self._q]) \
            if self._q else np.array([], dtype=np.int64)
        del self._q
        if len(old) == 0:
            return 0
        new = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in answers]
        )
        order = np.argsort(old, kind="stable")
        old, new = old[order], new[order]
        # every current label is in `old` (it came from unique(label))
        mapped = new[np.searchsorted(old, self.label)]
        changed = int((mapped < self.label).sum())
        self.label = np.minimum(self.label, mapped)
        return changed

    def labels_df(self) -> pd.DataFrame:
        return pd.DataFrame({"node": self.nodes, "label": self.label})


def pagerank(edges, damping: float = 0.85, n_iter: int = 10,
             src_col: str = "src", dst_col: str = "dst",
             n_buckets: int = 32, dedup_edges: bool = False):
    """PageRank on ``n_buckets`` co-partitioned graph-shard actors
    (the Pregel layout).  Returns a ``ray.data.Dataset`` of
    ``(node, rank)`` — collect it only at small scale; at scale take
    a distributed top-k instead.

    Setup is Ray Data: the edge set hash-buckets by src ONCE (one
    groupby shuffle — after it every out-edge of a node lives on its
    owner shard) and each shard actor loads its blocks from the
    object store.  Node discovery (dst-only nodes included) is one
    actor fan-out/fan-in, so no per-node structure ever touches the
    driver — the driver holds B actor handles, B x B contribution
    REFS per step, and two scalars (node count, dangling mass).

    Each power step: every shard emits per-target-bucket
    pre-aggregated (dst, contribution) arrays via ``num_returns=B``
    (data stays in the object store; the driver only routes refs),
    then every shard folds its B incoming parts, updates rank =
    (1-d)/n + d*(c + dangling/n), and returns its dangling-mass
    partial.  Per-step cost is 2B actor RPCs + the message arrays —
    no Dataset execution, no shuffle, the edge arrays never move
    after setup.  Size ``n_buckets`` so one shard's edges (~16 B per
    edge) fit an actor heap; shards spread across the cluster via
    SPREAD scheduling."""
    import ray

    actors, counts = _spawn_shards(
        _PRShard, edges, n_buckets, src_col, dst_col,
        dedup_edges=dedup_edges,
    )
    B = n_buckets
    n = int(sum(counts))
    if n == 0:
        return _collect_shards(
            actors, [], {"node": "int64", "rank": "float64"}
        )
    dangling = float(sum(ray.get(
        [a.init_rank.remote(n) for a in actors]
    )))

    for _ in range(n_iter):
        outs = [_fan(a, "contribs", B) for a in actors]
        dangling = float(sum(ray.get(
            [
                actors[t].update.remote(
                    damping, dangling, *[outs[i][t] for i in range(B)]
                )
                for t in range(B)
            ]
        )))

    refs = [
        a.ranks.remote() for a, c in zip(actors, counts) if c > 0
    ]
    return _collect_shards(
        actors, refs, {"node": "int64", "rank": "float64"}
    )


def _fan(a, method, B: int, *args):
    """Call an actor method with ``num_returns=B`` and normalize the
    B == 1 single-ref case to a list."""
    refs = getattr(a, method).options(num_returns=B).remote(*args)
    return [refs] if B == 1 else refs


def _spawn_shards(shard_cls, edges, B: int, src_col: str,
                  dst_col: str, dedup_edges: bool = False,
                  weight_col: str | None = None):
    """Shared graph-shard setup: hash-bucket the edge set by src ONCE
    (one groupby shuffle — after it every out-edge of a node lives on
    its owner shard), spawn B shard actors that load their blocks
    from the object store, and run the discover/register node
    exchange.  Returns (actors, per-shard node counts)."""
    import ray

    from unfurl_ray.ops.relational import _arrow

    edges = edges.materialize()

    def tag_src(batch: pa.Table) -> pa.Table:
        src = batch.column(src_col).to_numpy(zero_copy_only=False)
        cols = {
            src_col: batch.column(src_col).cast(pa.int64()),
            dst_col: batch.column(dst_col).cast(pa.int64()),
        }
        if weight_col is not None:
            cols[weight_col] = batch.column(weight_col).cast(pa.int64())
        cols["_eb"] = pa.array(_node_bucket(src, B), pa.int64())
        return pa.table(cols)

    keep_cols = [src_col, dst_col] + (
        [weight_col] if weight_col is not None else []
    )

    def drop_tag(group: pd.DataFrame) -> pa.Table:
        return _arrow(group[keep_cols])

    edges_b = (
        edges.map_batches(tag_src, batch_format="pyarrow")
        .groupby("_eb")
        .map_groups(drop_tag, batch_format="pandas")
        .materialize()
    )

    eb_refs = edges_b.to_pandas_refs()

    @ray.remote
    def _buckets_in(df: pd.DataFrame) -> np.ndarray:
        # sort-aggregates can emit EMPTY zero-column blocks
        if src_col not in df.columns or len(df) == 0:
            return np.array([], dtype=np.int64)
        return np.unique(
            _node_bucket(df[src_col].to_numpy(dtype=np.int64), B)
        )

    emap: dict[int, list] = {}
    for ref, bs in zip(eb_refs, ray.get(
            [_buckets_in.remote(r) for r in eb_refs])):
        for b in bs:
            emap.setdefault(int(b), []).append(ref)

    # num_cpus=0: all B shards MUST be schedulable at once (they
    # block on each other's messages every step — reserving a CPU
    # per shard deadlocks when B > cluster CPUs); their work is
    # short vectorized bursts, so logical-CPU oversubscription is
    # harmless.  SPREAD still balances them across nodes.
    remote_cls = ray.remote(shard_cls).options(
        num_cpus=0, scheduling_strategy="SPREAD"
    )
    actors = [
        remote_cls.remote(
            b, B, src_col, dst_col, emap.get(b, []), dedup_edges,
            weight_col,
        )
        for b in range(B)
    ]
    disc = [_fan(a, "discover", B) for a in actors]
    counts = ray.get(
        [
            actors[t].register.remote(*[disc[i][t] for i in range(B)])
            for t in range(B)
        ]
    )
    return actors, counts


def _collect_shards(actors, refs, empty_schema: dict):
    """Copy per-shard result frames out of actor-owned objects into a
    Dataset, then kill the actors."""
    import ray

    from unfurl_ray.ops.relational import _arrow

    if refs:
        out = (
            ray.data.from_pandas_refs(refs)
            .map_batches(_arrow, batch_format="pandas")
            .materialize()
        )
        # all-empty shard frames leave zero blocks (map_batches
        # skips empties) -> a schema-less Dataset; fall through to
        # the typed empty so callers can index columns (e.g. kcore
        # when the whole graph peels away)
        if out.count() == 0:
            refs = []
    if not refs:
        out = ray.data.from_pandas(
            pd.DataFrame(
                {c: pd.Series([], dtype=t)
                 for c, t in empty_schema.items()}
            )
        )
    for a in actors:
        ray.kill(a)
    return out


def triangle_count(edges, n_buckets: int = 64) -> int:
    """Exact triangle count over an undirected edge Dataset with
    columns ``(a, b)``, ``a < b``, unique rows.

    Degree-oriented wedge enumeration — the standard bound that makes
    this tractable on power-law graphs: every edge orients from its
    lower-(degree, id) endpoint to the higher one, each node emits
    the pairs of its ORIENTED neighbors (``C(d_out, 2)`` wedges, and
    orientation caps d_out at ~sqrt(m) on degenerate graphs where raw
    degree is unbounded), and a wedge closes a triangle iff its
    endpoint pair is itself an edge.  Each triangle is counted exactly
    once, at its lowest-rank vertex.

    Distributed shape: degrees via ``bucketed_aggregate`` (tiny:
    nodes x 1), the node->rank map broadcast once via ``ray.put``;
    wedges and edges co-shuffle on a hash of the canonical endpoint
    pair and each bucket counts closures with one vectorized
    ``isin`` — no all-pairs stage, no driver-side edge scan."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_aggregate,
    )

    edges = edges.materialize()

    def fan(batch: pd.DataFrame) -> pa.Table:
        nodes = np.concatenate(
            [batch["a"].to_numpy(), batch["b"].to_numpy()]
        )
        return pa.table({"node": pa.array(nodes, pa.int64())})

    deg = bucketed_aggregate(
        edges.map_batches(fan, batch_format="pandas"),
        ["node"], {"d": ("node", "count")},
    ).to_pandas()
    # rank = position under (degree, id): ties break by id so the
    # orientation is a strict total order
    deg = deg.sort_values(["d", "node"]).reset_index(drop=True)
    rank = pd.Series(
        np.arange(len(deg), dtype=np.int64),
        index=deg["node"].to_numpy(),
    )
    rank_ref = ray.put(rank)

    class Orient:
        def __init__(self, ref):
            self.rank = _broadcast_fetch(ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            a = batch["a"].to_numpy()
            b = batch["b"].to_numpy()
            ra = self.rank.reindex(a).to_numpy()
            rb = self.rank.reindex(b).to_numpy()
            lo = np.where(ra <= rb, a, b)
            hi = np.where(ra <= rb, b, a)
            return pa.table(
                {
                    "src": pa.array(lo, pa.int64()),
                    "dst": pa.array(hi, pa.int64()),
                }
            )

    oriented = edges.map_batches(
        Orient, batch_format="pandas", concurrency=(1, 8),
        fn_constructor_args=(rank_ref,),
    )

    def wedges(group: pd.DataFrame) -> pa.Table:
        us, vs = [], []
        for _, g in group.groupby("src", sort=False):
            nb = np.sort(g["dst"].to_numpy())
            k = len(nb)
            if k < 2:
                continue
            iu, iv = np.triu_indices(k, 1)
            us.append(nb[iu])
            vs.append(nb[iv])
        if not us:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "u": pa.array(np.concatenate(us), pa.int64()),
                "v": pa.array(np.concatenate(vs), pa.int64()),
            }
        )

    def shard_src(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_s"] = (
            pd.util.hash_array(batch["src"].to_numpy())
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return batch

    wedge_ds = (
        oriented.map_batches(shard_src, batch_format="pandas")
        .groupby("_s")
        .map_groups(wedges, batch_format="pandas")
    )

    # closure check: wedge (u, v) closes iff {min,max}(u, v) is an
    # edge; co-shuffle wedges and edges on the canonical pair hash.
    # (the packed int64 pair key below assumes node ids < 2^31)
    def tag(is_edge: bool):
        ca, cb = ("a", "b") if is_edge else ("u", "v")

        def f(batch: pd.DataFrame) -> pa.Table:
            x = batch[ca].to_numpy()
            y = batch[cb].to_numpy()
            lo = np.minimum(x, y)
            hi = np.maximum(x, y)
            return pa.table(
                {
                    "lo": pa.array(lo, pa.int64()),
                    "hi": pa.array(hi, pa.int64()),
                    "_e": pa.array(
                        np.full(len(batch), is_edge, dtype=np.bool_),
                        pa.bool_(),
                    ),
                    "_b": pa.array(
                        (
                            pd.util.hash_array(
                                lo * np.int64(1_000_003) + hi
                            ) % np.uint64(n_buckets)
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

        return f

    unioned = wedge_ds.map_batches(
        tag(False), batch_format="pandas"
    ).union(edges.map_batches(tag(True), batch_format="pandas"))

    def close(group: pd.DataFrame) -> pa.Table:
        e = group[group["_e"]]
        w = group[~group["_e"]]
        if len(e) == 0 or len(w) == 0:
            n = 0
        else:
            ek = e["lo"].to_numpy() * np.int64(1 << 32) + e["hi"].to_numpy()
            wk = w["lo"].to_numpy() * np.int64(1 << 32) + w["hi"].to_numpy()
            n = int(np.isin(wk, ek).sum())
        return pa.table({"n": pa.array([n], pa.int64())})

    parts = unioned.groupby("_b").map_groups(
        close, batch_format="pandas"
    ).to_pandas()
    return int(parts["n"].sum())


class _BFSShard(_GraphShard):
    """Multi-source BFS shard: hop-distance state, min(label+1)
    propagation — plain frontier expansion (NO pointer jumping: the
    jump rewrites labels through non-adjacent hops, which is correct
    for component ids but not for distances)."""

    _INF = np.iinfo(np.int64).max

    def register(self, *incoming) -> int:
        mine = self._register_nodes(incoming)
        self.hop = np.full(len(mine), self._INF, dtype=np.int64)
        del self._src, self._dst, self._tgt
        return len(mine)

    def seed(self, seeds: np.ndarray) -> int:
        """Set hop 0 for the seed ids this shard owns (the full seed
        array broadcasts to every shard; each keeps its own)."""
        seeds = np.asarray(seeds, dtype=np.int64)
        if len(self.nodes) == 0 or len(seeds) == 0:
            return 0
        pos = np.searchsorted(self.nodes, seeds)
        ok = pos < len(self.nodes)
        ok[ok] = self.nodes[pos[ok]] == seeds[ok]
        self.hop[pos[ok]] = 0
        return int(ok.sum())

    def propagate(self):
        out = []
        for spos, starts, vals in self.plan:
            if len(vals) == 0:
                out.append((vals, vals))
            else:
                m = np.minimum.reduceat(self.hop[spos], starts)
                out.append(
                    (vals, np.where(m == self._INF, m, m + 1))
                )
        return out if self.B > 1 else out[0]

    def update(self, *parts) -> int:
        changed = 0
        for vals, mins in parts:
            if len(vals):
                pos = np.searchsorted(self.nodes, vals)
                new = np.minimum(self.hop[pos], mins)
                changed += int((new < self.hop[pos]).sum())
                self.hop[pos] = new
        return changed

    def hops_df(self) -> pd.DataFrame:
        keep = self.hop < self._INF
        return pd.DataFrame(
            {
                "node": pd.Series(self.nodes[keep], dtype="int64"),
                "hops": pd.Series(self.hop[keep], dtype="int64"),
            }
        )


def bfs_hops(edges, seeds, max_hops: int = 3,
             num_partitions: int = 8) -> pd.DataFrame:
    """Multi-source BFS hop distances over an edge Dataset [(u, v),
    both directions]: (node, hops) for every node within ``max_hops``
    of any seed — k-hop neighborhood expansion (contamination blast
    radius around known-bad documents, dup-cluster fringes).

    Same Pregel layout as ``connected_components``: the edge set
    shuffles once into ``num_partitions`` shard actors, then exactly
    ``max_hops`` rounds of pre-aggregated (dst, min hop+1) ref
    exchange — or fewer if a round moves nothing.  BFS hop r is final
    after round r (min-propagation is monotone), so the round count
    is the radius, never the graph size.  Seeds not present in the
    edge set are ignored (isolated nodes have no edges here)."""
    import ray

    seeds = np.asarray(seeds, dtype=np.int64)
    B = max(1, num_partitions)
    actors, counts = _spawn_shards(_BFSShard, edges, B, "u", "v")
    if int(sum(counts)) == 0:
        out = _collect_shards(
            actors, [], {"node": "int64", "hops": "int64"}
        )
        return out.to_pandas()
    seed_ref = ray.put(seeds)
    ray.get([a.seed.remote(seed_ref) for a in actors])
    for _ in range(max_hops):
        outs = [_fan(a, "propagate", B) for a in actors]
        changed = sum(ray.get(
            [
                actors[t].update.remote(*[outs[i][t] for i in range(B)])
                for t in range(B)
            ]
        ))
        if changed == 0:
            break
    refs = [
        a.hops_df.remote() for a, c in zip(actors, counts) if c > 0
    ]
    out = _collect_shards(
        actors, refs, {"node": "int64", "hops": "int64"}
    ).to_pandas()
    if "node" not in out.columns:
        # every shard's reachable set was empty: all-empty pandas
        # blocks union to a schema-less frame
        out = pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "hops": pd.Series([], dtype="int64"),
            }
        )
    return (
        out.sort_values("node").reset_index(drop=True)
    )


class _KCoreShard(_GraphShard):
    """k-core peeling shard: alive/degree state; each round kills
    nodes with residual degree < k and emits per-target decrement
    counts from the newly-dead nodes' out-edges (the same
    pre-aggregated reduceat fold as PageRank contributions)."""

    def register(self, *incoming) -> int:
        mine = self._register_nodes(incoming)
        pos = np.searchsorted(mine, self._src)
        self.deg = np.bincount(pos, minlength=len(mine)).astype(
            np.int64
        )
        self.alive = np.ones(len(mine), dtype=bool)
        del self._src, self._dst, self._tgt
        return len(mine)

    def kill(self, k: int) -> int:
        """Mark this round's deaths; return how many died."""
        self._newly = self.alive & (self.deg < k)
        self.alive &= ~self._newly
        return int(self._newly.sum())

    def decrements(self):
        """Per-target (dst, #edges-from-newly-dead) — the degree
        decrement messages for this round."""
        newly = self._newly
        out = []
        for spos, starts, vals in self.plan:
            if len(vals) == 0:
                out.append((vals, vals))
            else:
                w = newly[spos].astype(np.float64)
                out.append(
                    (vals,
                     np.add.reduceat(w, starts).astype(np.int64))
                )
        return out if self.B > 1 else out[0]

    def apply(self, *parts) -> None:
        for vals, cnt in parts:
            if len(vals):
                pos = np.searchsorted(self.nodes, vals)
                self.deg[pos] -= cnt
        del self._newly

    def core_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": pd.Series(
                    self.nodes[self.alive], dtype="int64"
                ),
                "degree": pd.Series(
                    self.deg[self.alive], dtype="int64"
                ),
            }
        )


def kcore(edges, k: int, num_partitions: int = 8,
          max_iters: int = 10_000):
    """k-core of an edge Dataset [(u, v), both directions, no
    self-loops]: the maximal subgraph where every node keeps degree
    >= k — the density filter a dup-graph / citation-graph pipeline
    runs before community analysis (peels hangers-on, keeps the
    tightly-connected cores).  Returns a Dataset of (node, degree)
    for surviving nodes, degree = residual degree inside the core.

    Same Pregel layout as ``connected_components``: the edge set
    shuffles once into shard actors; each peeling round is (a) a
    local kill of alive nodes under degree k, (b) one pre-aggregated
    (dst, decrement) ref exchange from the newly-dead nodes' edges,
    (c) local degree updates.  Rounds = peeling depth (bounded by
    the degeneracy ordering length), each O(B^2) refs; converges
    when a round kills nothing, which is exact: residual degrees
    always equal true degrees within the remaining subgraph.

    NOTE: if the input has duplicate (u, v) rows they count as
    parallel edges; feed unique edges for simple-graph semantics."""
    import ray

    B = max(1, num_partitions)
    actors, counts = _spawn_shards(_KCoreShard, edges, B, "u", "v")
    if int(sum(counts)) == 0:
        return _collect_shards(
            actors, [], {"node": "int64", "degree": "int64"}
        )

    for _ in range(max_iters):
        died = sum(ray.get([a.kill.remote(k) for a in actors]))
        if died == 0:
            break
        outs = [_fan(a, "decrements", B) for a in actors]
        ray.get(
            [
                actors[t].apply.remote(*[outs[i][t] for i in range(B)])
                for t in range(B)
            ]
        )

    refs = [
        a.core_df.remote() for a, c in zip(actors, counts) if c > 0
    ]
    return _collect_shards(
        actors, refs, {"node": "int64", "degree": "int64"}
    )


def degree_assortativity(edges, n_buckets: int = 32):
    """Degree assortativity coefficient (Newman 2002): the Pearson
    correlation of (deg(u), deg(v)) over the DIRECTED edge list (each
    undirected edge contributes both orientations), answering "do
    hubs link to hubs?".

    Input: canonical undirected edges ``(a, b)``, a < b, unique rows.

    Distributed shape: degrees via ``bucketed_aggregate`` (one row per
    node), attached to each directed edge with TWO
    ``bucketed_hash_join`` passes — no driver- or broadcast-held
    O(nodes) structure, unlike ``triangle_count``'s rank map.  The
    correlation itself folds from per-batch integer sufficient stats
    (n, sx, sy, sxy, sxx, syy): one tiny row per block, summed as
    exact Python ints on the driver, so the closing float expression
    is computed from the same integers as the SQL twin's HUGEINT sums
    and hash-matches at round(6).

    Returns (n_directed, assortativity) as a one-row DataFrame.
    """
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, bucketed_hash_join,
    )

    edges = edges.materialize()

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    directed = edges.map_batches(both, batch_format="pyarrow")
    deg = bucketed_aggregate(
        directed.select_columns(["u"]).map_batches(
            lambda t: t.rename_columns(["node"]),
            batch_format="pyarrow",
        ),
        ["node"], {"deg": ("node", "count")},
    )

    def as_du(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["node" if c == "node" else "du" for c in t.column_names]
        )

    def as_dv(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["node" if c == "node" else "dv" for c in t.column_names]
        )

    deg = deg.materialize()
    with_du = bucketed_hash_join(
        directed, deg.map_batches(as_du, batch_format="pyarrow"),
        on="u", right_on="node", n_buckets=n_buckets,
    )
    with_both = bucketed_hash_join(
        with_du, deg.map_batches(as_dv, batch_format="pyarrow"),
        on="v", right_on="node", n_buckets=n_buckets,
    )

    def partial(batch: pd.DataFrame) -> pa.Table:
        x = batch["du"].to_numpy(dtype=np.int64)
        y = batch["dv"].to_numpy(dtype=np.int64)
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    parts = with_both.map_batches(
        partial, batch_format="pandas"
    ).to_pandas()
    n = int(parts["n"].sum())
    sx, sy = int(parts["sx"].sum()), int(parts["sy"].sum())
    sxy = int(parts["sxy"].sum())
    sxx, syy = int(parts["sxx"].sum()), int(parts["syy"].sum())
    denom = float(
        np.sqrt(float(n * sxx - sx * sx))
        * np.sqrt(float(n * syy - sy * sy))
    )
    # denom == 0 (e.g. a regular graph: every degree equal) leaves the
    # correlation undefined — NaN, matching the SQL twin's NULL divide.
    r = (n * sxy - sx * sy) / denom if denom else float("nan")
    return pd.DataFrame(
        {
            "n_directed": np.array([n], dtype=np.int64),
            "assortativity": np.array([r], dtype=np.float64),
        }
    )


def common_neighbor_scores(edges, top_k: int = 20,
                           n_buckets: int = 64,
                           max_degree: int | None = None):
    """Link prediction by neighborhood overlap: for every NON-adjacent
    node pair sharing at least one neighbor, the common-neighbor count
    and Jaccard similarity |N(x) & N(y)| / |N(x) | N(y)|; returns the
    global top ``top_k`` by (jaccard desc, x, y).

    Distributed shape: each node's adjacency list (one
    ``groupby(center)`` group) emits its C(deg, 2) canonical neighbor
    pairs — the classic wedge blowup; ``max_degree`` caps it by
    SKIPPING hub centers (an approximation, so the default is exact
    and the cap is the documented scale knob, like
    ``fingerprint_edges``' hot-bucket cap).  Pair counts fold via
    ``bucketed_aggregate``; already-adjacent pairs are removed with a
    one-shuffle composite-key anti-join (tag + union + per-bucket
    drop), degrees attach with two ``bucketed_hash_join`` passes, and
    the top-k closes with per-block partials (k rows per block, never
    the full pair set on the driver).
    """
    import ray as _ray  # noqa: F401  (parity with module siblings)

    from unfurl_ray.ops.relational import (
        _arrow, bucketed_aggregate, bucketed_hash_join,
    )

    edges = edges.materialize()

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c": pa.array(np.concatenate([a, b]), pa.int64()),
                "nb": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    directed = edges.map_batches(both, batch_format="pyarrow")

    def wedges(group: pd.DataFrame) -> pa.Table:
        xs, ys = [], []
        for _, g in group.groupby("c", sort=False):
            nb = np.sort(g["nb"].to_numpy())
            k = len(nb)
            if k < 2 or (max_degree is not None and k > max_degree):
                continue
            iu, iv = np.triu_indices(k, 1)
            xs.append(nb[iu])
            ys.append(nb[iv])
        if not xs:
            return pa.table(
                {
                    "x": pa.array([], pa.int64()),
                    "y": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "x": pa.array(np.concatenate(xs), pa.int64()),
                "y": pa.array(np.concatenate(ys), pa.int64()),
            }
        )

    pair_counts = bucketed_aggregate(
        directed.groupby("c").map_groups(
            wedges, batch_format="pandas"
        ),
        ["x", "y"], {"common": ("x", "count")},
        n_buckets=n_buckets,
    )

    # composite-key anti-join: drop (x, y) pairs that are edges
    def tag_pairs(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_side", pa.array(np.zeros(len(t), dtype=np.int8))
        )

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "x": t.column("a").cast(pa.int64()),
                "y": t.column("b").cast(pa.int64()),
                "common": pa.array(
                    np.zeros(len(t), dtype=np.int64)
                ),
                "_side": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        )

    tagged = pair_counts.map_batches(
        tag_pairs, batch_format="pyarrow"
    ).union(edges.map_batches(tag_edges, batch_format="pyarrow"))

    def bucket(batch: pd.DataFrame) -> pa.Table:
        batch["_bucket"] = (
            pd.util.hash_pandas_object(
                batch[["x", "y"]], index=False
            ).to_numpy() % np.uint64(n_buckets)
        ).astype(np.int64)
        return _arrow(batch)

    def drop_adjacent(group: pd.DataFrame) -> pa.Table:
        is_edge = group["_side"] == 1
        keys = pd.MultiIndex.from_frame(group.loc[is_edge, ["x", "y"]])
        cand = group.loc[~is_edge]
        keep = ~pd.MultiIndex.from_frame(cand[["x", "y"]]).isin(keys)
        return _arrow(cand.loc[keep, ["x", "y", "common"]])

    non_adjacent = (
        tagged.map_batches(bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(drop_adjacent, batch_format="pandas")
    )

    deg = bucketed_aggregate(
        directed.select_columns(["c"]).map_batches(
            lambda t: t.rename_columns(["node"]),
            batch_format="pyarrow",
        ),
        ["node"], {"deg": ("node", "count")},
    ).materialize()

    def as_dx(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["node" if c == "node" else "dx" for c in t.column_names]
        )

    def as_dy(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["node" if c == "node" else "dy" for c in t.column_names]
        )

    with_dx = bucketed_hash_join(
        non_adjacent, deg.map_batches(as_dx, batch_format="pyarrow"),
        on="x", right_on="node", n_buckets=n_buckets,
    )
    scored = bucketed_hash_join(
        with_dx, deg.map_batches(as_dy, batch_format="pyarrow"),
        on="y", right_on="node", n_buckets=n_buckets,
    )

    def block_topk(batch: pd.DataFrame) -> pa.Table:
        common = batch["common"].to_numpy(dtype=np.int64)
        dx = batch["dx"].to_numpy(dtype=np.int64)
        dy = batch["dy"].to_numpy(dtype=np.int64)
        out = pd.DataFrame(
            {
                "x": batch["x"].to_numpy(dtype=np.int64),
                "y": batch["y"].to_numpy(dtype=np.int64),
                "common": common,
                "jaccard": common / (dx + dy - common),
            }
        )
        out = out.sort_values(
            ["jaccard", "x", "y"], ascending=[False, True, True]
        ).head(top_k)
        return _arrow(out)

    best = scored.map_batches(
        block_topk, batch_format="pandas"
    ).to_pandas()
    return (
        best.sort_values(
            ["jaccard", "x", "y"], ascending=[False, True, True]
        )
        .head(top_k)
        .reset_index(drop=True)
    )


class _LPAShard(_GraphShard):
    """Label-propagation shard: community label per owned node; each
    step ships per-dst (label, count) histograms — bounded by the
    shard's edge count, like the k-core decrement exchange."""

    def register(self, *incoming) -> int:
        mine = self._register_nodes(incoming)
        self.label = mine.copy()
        return len(mine)

    def histograms(self):
        """Per-target (dst, label, count) triples of this shard's
        out-edge src labels (num_returns=B fan-out)."""
        out = []
        for spos, starts, vals in self.plan:
            if len(vals) == 0:
                empty = np.array([], dtype=np.int64)
                out.append((empty, empty, empty))
                continue
            runs = np.diff(np.append(starts, len(spos)))
            dstc = np.repeat(np.arange(len(vals)), runs)
            lab = self.label[spos]
            order = np.lexsort((lab, dstc))
            d_s, l_s = dstc[order], lab[order]
            new = np.ones(len(d_s), dtype=bool)
            new[1:] = (d_s[1:] != d_s[:-1]) | (l_s[1:] != l_s[:-1])
            starts2 = np.flatnonzero(new)
            cnt = np.diff(np.append(starts2, len(d_s)))
            out.append(
                (vals[d_s[starts2]], l_s[starts2],
                 cnt.astype(np.int64))
            )
        return out if self.B > 1 else out[0]

    def update(self, *parts) -> int:
        """Fold incoming per-dst label histograms; every node with
        neighbors adopts the most frequent neighbor label, ties to
        the SMALLEST label (the deterministic sync-LPA rule).
        Returns #labels changed."""
        ds_, ls_, cs_ = [], [], []
        for d, l, c in parts:
            if len(d):
                ds_.append(np.asarray(d, dtype=np.int64))
                ls_.append(np.asarray(l, dtype=np.int64))
                cs_.append(np.asarray(c, dtype=np.int64))
        if not ds_:
            return 0
        d = np.concatenate(ds_)
        l = np.concatenate(ls_)
        c = np.concatenate(cs_)
        # merge duplicate (dst, label) pairs across source shards
        order = np.lexsort((l, d))
        d, l, c = d[order], l[order], c[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
        starts = np.flatnonzero(new)
        tot = np.add.reduceat(c, starts)
        d, l = d[starts], l[starts]
        # winner per dst: max count, then min label — lexsort keys
        # read right-to-left, so sort by (dst, -count, label) and
        # take each dst run's FIRST row
        order = np.lexsort((l, -tot, d))
        d, l = d[order], l[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = d[1:] != d[:-1]
        w_dst, w_lab = d[first], l[first]
        pos = np.searchsorted(self.nodes, w_dst)
        changed = int((self.label[pos] != w_lab).sum())
        self.label[pos] = w_lab
        return changed

    def labels_df(self) -> pd.DataFrame:
        return pd.DataFrame(
            {"node": self.nodes, "community": self.label}
        )


def label_propagation(edges, max_iters: int = 10,
                      num_partitions: int = 8):
    """Community detection by synchronous label propagation (Raghavan
    2007) with the deterministic tie rule (most frequent neighbor
    label, ties to the smallest) — same shard-actor Pregel layout as
    ``connected_components``/``pagerank``: one setup shuffle, then
    actor-to-actor histogram exchange per round, no Dataset execution
    inside the loop.  Fixed ``max_iters`` bounds the oscillation sync
    LPA allows on bipartite structures; convergence = 0 changes.

    Input: canonical undirected edges ``(a, b)``; both orientations
    are fanned out here.  Output Dataset: (node, community).
    """
    import ray

    def both(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    directed = edges.map_batches(both, batch_format="pyarrow")
    B = num_partitions
    actors, counts = _spawn_shards(
        _LPAShard, directed, B, "u", "v", dedup_edges=True
    )
    for _ in range(max_iters):
        outs = [_fan(a, "histograms", B) for a in actors]
        changed = sum(
            ray.get(
                [
                    actors[t].update.remote(
                        *[outs[i][t] for i in range(B)]
                    )
                    for t in range(B)
                ]
            )
        )
        if changed == 0:
            break
    refs = [
        a.labels_df.remote() for a, c in zip(actors, counts) if c > 0
    ]
    return _collect_shards(
        actors, refs, {"node": "int64", "community": "int64"}
    )


def label_propagation_reference(edges_df: pd.DataFrame,
                                max_iters: int = 10) -> dict:
    """Driver-side sync-LPA with the identical deterministic rule —
    the parity oracle for ``label_propagation`` on small graphs."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for a, b in zip(edges_df["a"], edges_df["b"]):
        adj[int(a)].append(int(b))
        adj[int(b)].append(int(a))
    label = {n: n for n in adj}
    for _ in range(max_iters):
        new = {}
        changed = 0
        for n in adj:
            cnt = Counter(label[m] for m in adj[n])
            top = max(cnt.values())
            win = min(k for k, v in cnt.items() if v == top)
            new[n] = win
            changed += win != label[n]
        label = new
        if changed == 0:
            break
    return label


def local_clustering(edges, n_buckets: int = 64) -> pd.DataFrame:
    """Per-node local clustering coefficient over an undirected edge
    Dataset ``(a, b)``, ``a < b``, unique rows:
    ``coeff = 2 T(v) / (d(v) (d(v) - 1))``.

    Same degree-oriented wedge machinery as :func:`triangle_count`
    (each triangle enumerated exactly once at its lowest-rank
    vertex), except every closed wedge credits all THREE corners —
    the wedge rows carry their center alongside the endpoint pair,
    and each closure bucket scatters per-node partial counts before
    the tiny (node, t) fold.  The degree table and the final join
    are O(nodes) driver-side, the same bound triangle_count already
    accepts for its broadcast rank map."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_aggregate,
    )

    edges = edges.materialize()

    def fan(batch: pd.DataFrame) -> pa.Table:
        nodes = np.concatenate(
            [batch["a"].to_numpy(), batch["b"].to_numpy()]
        )
        return pa.table({"node": pa.array(nodes, pa.int64())})

    deg = bucketed_aggregate(
        edges.map_batches(fan, batch_format="pandas"),
        ["node"], {"d": ("node", "count")},
    ).to_pandas()
    deg = deg.sort_values(["d", "node"]).reset_index(drop=True)
    rank = pd.Series(
        np.arange(len(deg), dtype=np.int64),
        index=deg["node"].to_numpy(),
    )
    rank_ref = ray.put(rank)

    class Orient:
        def __init__(self, ref):
            self.rank = _broadcast_fetch(ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            a = batch["a"].to_numpy()
            b = batch["b"].to_numpy()
            ra = self.rank.reindex(a).to_numpy()
            rb = self.rank.reindex(b).to_numpy()
            lo = np.where(ra <= rb, a, b)
            hi = np.where(ra <= rb, b, a)
            return pa.table(
                {
                    "src": pa.array(lo, pa.int64()),
                    "dst": pa.array(hi, pa.int64()),
                }
            )

    oriented = edges.map_batches(
        Orient, batch_format="pandas", concurrency=(1, 8),
        fn_constructor_args=(rank_ref,),
    )

    def wedges(group: pd.DataFrame) -> pa.Table:
        us, vs, cs = [], [], []
        for src, g in group.groupby("src", sort=False):
            nb = np.sort(g["dst"].to_numpy())
            k = len(nb)
            if k < 2:
                continue
            iu, iv = np.triu_indices(k, 1)
            us.append(nb[iu])
            vs.append(nb[iv])
            cs.append(np.full(len(iu), src, dtype=np.int64))
        if not us:
            return pa.table(
                {
                    "u": pa.array([], pa.int64()),
                    "v": pa.array([], pa.int64()),
                    "c": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "u": pa.array(np.concatenate(us), pa.int64()),
                "v": pa.array(np.concatenate(vs), pa.int64()),
                "c": pa.array(np.concatenate(cs), pa.int64()),
            }
        )

    def shard_src(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_s"] = (
            pd.util.hash_array(batch["src"].to_numpy())
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return batch

    wedge_ds = (
        oriented.map_batches(shard_src, batch_format="pandas")
        .groupby("_s")
        .map_groups(wedges, batch_format="pandas")
    )

    def tag(is_edge: bool):
        ca, cb = ("a", "b") if is_edge else ("u", "v")

        def f(batch: pd.DataFrame) -> pa.Table:
            x = batch[ca].to_numpy()
            y = batch[cb].to_numpy()
            lo = np.minimum(x, y)
            hi = np.maximum(x, y)
            c = (
                batch["c"].to_numpy()
                if not is_edge
                else np.full(len(batch), -1, dtype=np.int64)
            )
            return pa.table(
                {
                    "lo": pa.array(lo, pa.int64()),
                    "hi": pa.array(hi, pa.int64()),
                    "c": pa.array(c, pa.int64()),
                    "_e": pa.array(
                        np.full(len(batch), is_edge, dtype=np.bool_),
                        pa.bool_(),
                    ),
                    "_b": pa.array(
                        (
                            pd.util.hash_array(
                                lo * np.int64(1_000_003) + hi
                            ) % np.uint64(n_buckets)
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            )

        return f

    unioned = wedge_ds.map_batches(
        tag(False), batch_format="pandas"
    ).union(edges.map_batches(tag(True), batch_format="pandas"))

    def close(group: pd.DataFrame) -> pa.Table:
        e = group[group["_e"]]
        w = group[~group["_e"]]
        if len(e) == 0 or len(w) == 0:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "t": pa.array([], pa.int64()),
                }
            )
        ek = e["lo"].to_numpy() * np.int64(1 << 32) + e["hi"].to_numpy()
        wk = w["lo"].to_numpy() * np.int64(1 << 32) + w["hi"].to_numpy()
        hit = w[np.isin(wk, ek)]
        corners = np.concatenate(
            [
                hit["c"].to_numpy(),
                hit["lo"].to_numpy(),
                hit["hi"].to_numpy(),
            ]
        )
        node, t = np.unique(corners, return_counts=True)
        return pa.table(
            {
                "node": pa.array(node.astype(np.int64), pa.int64()),
                "t": pa.array(t.astype(np.int64), pa.int64()),
            }
        )

    parts = unioned.groupby("_b").map_groups(
        close, batch_format="pandas"
    ).to_pandas()
    tri = parts.groupby("node", as_index=False)["t"].sum()
    out = deg.merge(tri, on="node", how="left")
    out["t"] = out["t"].fillna(0).astype("int64")
    out["d"] = out["d"].astype("int64")
    d = out["d"].to_numpy(np.float64)
    t = out["t"].to_numpy(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        coeff = np.where(d >= 2, 2.0 * t / (d * (d - 1.0)), 0.0)
    out["coeff"] = np.round(coeff, 6)
    return out.sort_values("node").reset_index(drop=True)


class _SSSPShard(_GraphShard):
    """Weighted single/multi-source shortest-path shard: Bellman-Ford
    relaxation with integer weights — per round each shard relaxes
    every out-edge of its nodes (dist[src] + w), pre-aggregates
    min per destination, and ships one (dst, candidate) pair per
    distinct dst per target shard.  Distances stay exact int64."""

    _INF = np.iinfo(np.int64).max

    def register(self, *incoming) -> int:
        mine = self._register_nodes(incoming)
        self.dist = np.full(len(mine), self._INF, dtype=np.int64)
        del self._src, self._dst, self._tgt
        return len(mine)

    def seed(self, seeds: np.ndarray) -> int:
        seeds = np.asarray(seeds, dtype=np.int64)
        if len(self.nodes) == 0 or len(seeds) == 0:
            return 0
        pos = np.searchsorted(self.nodes, seeds)
        ok = pos < len(self.nodes)
        ok[ok] = self.nodes[pos[ok]] == seeds[ok]
        self.dist[pos[ok]] = 0
        return int(ok.sum())

    def propagate(self):
        out = []
        for (spos, starts, vals), w in zip(self.plan, self.plan_w):
            if len(vals) == 0:
                out.append((vals, vals))
                continue
            d = self.dist[spos]
            cand = np.where(d == self._INF, self._INF, d + w)
            m = np.minimum.reduceat(cand, starts)
            out.append((vals, m))
        return out if self.B > 1 else out[0]

    def update(self, *parts) -> int:
        changed = 0
        for vals, mins in parts:
            if len(vals):
                pos = np.searchsorted(self.nodes, vals)
                new = np.minimum(self.dist[pos], mins)
                changed += int((new < self.dist[pos]).sum())
                self.dist[pos] = new
        return changed

    def dist_df(self) -> pd.DataFrame:
        keep = self.dist < self._INF
        return pd.DataFrame(
            {
                "node": pd.Series(self.nodes[keep], dtype="int64"),
                "dist": pd.Series(self.dist[keep], dtype="int64"),
            }
        )


def sssp(edges, seeds, weight_col: str = "w", max_iters: int = 64,
         num_partitions: int = 8) -> pd.DataFrame:
    """Multi-source weighted shortest paths over a DIRECTED edge
    Dataset ``(u, v, w)`` with non-negative integer weights (pass
    both directions for an undirected graph): distributed
    Bellman-Ford on the shared Pregel shard layout — one edge
    shuffle, then actor-to-actor pre-aggregated (dst, min
    candidate) exchange per round until a fixpoint (bounded by the
    shortest-path hop diameter, never |V|).  Parallel edges collapse
    to their MIN weight at shard load (``dedup_edges`` lexsort
    keeps the smallest weight per pair).

    Returns (node, dist) for every node reachable from any seed;
    exact int64 distances."""
    import ray

    seeds = np.asarray(seeds, dtype=np.int64)
    B = max(1, num_partitions)
    actors, counts = _spawn_shards(
        _SSSPShard, edges, B, "u", "v", dedup_edges=True,
        weight_col=weight_col,
    )
    if int(sum(counts)) == 0:
        out = _collect_shards(
            actors, [], {"node": "int64", "dist": "int64"}
        )
        return out.to_pandas()
    seed_ref = ray.put(seeds)
    ray.get([a.seed.remote(seed_ref) for a in actors])
    for _ in range(max_iters):
        outs = [_fan(a, "propagate", B) for a in actors]
        changed = sum(ray.get(
            [
                actors[t].update.remote(*[outs[i][t] for i in range(B)])
                for t in range(B)
            ]
        ))
        if changed == 0:
            break
    refs = [
        a.dist_df.remote() for a, c in zip(actors, counts) if c > 0
    ]
    out = _collect_shards(
        actors, refs, {"node": "int64", "dist": "int64"}
    ).to_pandas()
    if "node" not in out.columns:
        out = pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "dist": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("node").reset_index(drop=True)


class _HitsShard(_GraphShard):
    """HITS shard: hub/authority state on the shared Pregel layout.
    Each half-step is one B x B ref exchange: (a) authority folds the
    PR-shaped per-target (dst, sum hub[src]) contributions; (b) hub
    folds the owners' authority values served back along the SAME
    static request lists the register exchange already shipped — the
    edge arrays never move after setup."""

    def register(self, *incoming) -> int:
        mine = self._register_nodes(incoming)
        # positions of each requester's node list, kept in the
        # requester's (unique-sorted) order so auth_parts()[i] aligns
        # element-for-element with requester i's plan[t] vals
        self.req = [
            np.searchsorted(mine, np.asarray(x, dtype=np.int64))
            for x in incoming
        ]
        # per-target contiguous group sizes for the hub fold
        self.sizes = [
            np.diff(np.append(starts, len(spos)))
            for spos, starts, _vals in self.plan
        ]
        self.hub = np.ones(len(mine))
        self.auth = np.zeros(len(mine))
        del self._src, self._dst, self._tgt
        return len(mine)

    def auth_contribs(self):
        out = []
        for spos, starts, vals in self.plan:
            if len(vals) == 0:
                out.append((vals, np.array([], dtype=np.float64)))
            else:
                out.append(
                    (vals, np.add.reduceat(self.hub[spos], starts))
                )
        return out if self.B > 1 else out[0]

    def fold_auth(self, *parts) -> float:
        c = np.zeros(len(self.nodes))
        for vals, sums in parts:
            if len(vals):
                c[np.searchsorted(self.nodes, vals)] += sums
        self.auth = c
        return float((c * c).sum())

    def scale(self, which: str, norm: float) -> None:
        if norm > 0:
            if which == "auth":
                self.auth /= norm
            else:
                self.hub /= norm

    def auth_parts(self):
        out = [self.auth[pos] for pos in self.req]
        return out if self.B > 1 else out[0]

    def fold_hub(self, *parts) -> float:
        h = np.zeros(len(self.nodes))
        for t, part in enumerate(parts):
            spos, _starts, vals = self.plan[t]
            if len(vals):
                h += np.bincount(
                    spos,
                    weights=np.repeat(
                        np.asarray(part), self.sizes[t]
                    ),
                    minlength=len(self.nodes),
                )
        self.hub = h
        return float((h * h).sum())

    def result(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": self.nodes,
                "hub": self.hub,
                "authority": self.auth,
            }
        )


def hits(edges, n_iter: int = 20, src_col: str = "src",
         dst_col: str = "dst", n_buckets: int = 32,
         dedup_edges: bool = False):
    """HITS hubs/authorities by power iteration on ``n_buckets``
    co-partitioned graph-shard actors (the same Pregel layout as
    pagerank — edge set shuffles ONCE at setup, the driver holds only
    actor handles, per-step refs and the two L2-norm scalars).

    Per iteration: authority(v) = Σ hub(u) over in-edges folds from
    the PR-shaped pre-aggregated contribution exchange, then hub(u) =
    Σ authority(v) over out-edges folds from the owners serving
    authority values back along the static per-shard request lists
    (the reverse exchange; no reverse EDGE set is ever built).  Both
    vectors L2-normalize each step via a scalar fan-in, matching
    Kleinberg's formulation.  Returns (node, hub, authority)."""
    import math

    import ray

    actors, counts = _spawn_shards(
        _HitsShard, edges, n_buckets, src_col, dst_col,
        dedup_edges=dedup_edges,
    )
    B = n_buckets
    n = int(sum(counts))
    if n == 0:
        return _collect_shards(
            actors, [],
            {"node": "int64", "hub": "float64",
             "authority": "float64"},
        )

    for _ in range(n_iter):
        outs = [_fan(a, "auth_contribs", B) for a in actors]
        sq = ray.get(
            [
                actors[t].fold_auth.remote(
                    *[outs[i][t] for i in range(B)]
                )
                for t in range(B)
            ]
        )
        norm = math.sqrt(sum(sq))
        ray.get([a.scale.remote("auth", norm) for a in actors])
        aouts = [_fan(a, "auth_parts", B) for a in actors]
        sq = ray.get(
            [
                actors[i].fold_hub.remote(
                    *[aouts[t][i] for t in range(B)]
                )
                for i in range(B)
            ]
        )
        norm = math.sqrt(sum(sq))
        ray.get([a.scale.remote("hub", norm) for a in actors])

    refs = [
        a.result.remote() for a, c in zip(actors, counts) if c > 0
    ]
    return _collect_shards(
        actors, refs,
        {"node": "int64", "hub": "float64", "authority": "float64"},
    )


class _PPRShard(_PRShard):
    """Personalized-PageRank shard: restart (and dangling) mass is
    redistributed over the SEED set instead of uniformly."""

    def set_seeds(self, seeds) -> int:
        s = np.asarray(seeds, dtype=np.int64)
        pos = np.searchsorted(self.nodes, s)
        ok = pos < len(self.nodes)
        pos = pos[ok]
        hit = self.nodes[pos] == s[ok]
        self.seed_pos = pos[hit]
        return len(self.seed_pos)

    def init_ppr(self, n_seeds: int) -> float:
        self.n_seeds = n_seeds
        self.rank = np.zeros(len(self.nodes))
        if n_seeds:
            self.rank[self.seed_pos] = 1.0 / n_seeds
        self.w = np.where(self.deg > 0, self.rank / self.deg, 0.0)
        return float(self.rank[self.deg == 0].sum())

    def update_ppr(self, damping: float, dangling: float,
                   *parts) -> float:
        c = np.zeros(len(self.nodes))
        for vals, sums in parts:
            if len(vals):
                c[np.searchsorted(self.nodes, vals)] += sums
        self.rank = damping * c
        if self.n_seeds:
            boost = (
                (1.0 - damping) + damping * dangling
            ) / self.n_seeds
            self.rank[self.seed_pos] += boost
        self.w = np.where(self.deg > 0, self.rank / self.deg, 0.0)
        return float(self.rank[self.deg == 0].sum())


def personalized_pagerank(edges, seeds, damping: float = 0.85,
                          n_iter: int = 15, src_col: str = "src",
                          dst_col: str = "dst", n_buckets: int = 32,
                          dedup_edges: bool = False):
    """Personalized PageRank (random walk with restart to ``seeds``)
    on the shared Pregel shard layout — identical exchange pattern to
    ``pagerank`` (per-step: B x B pre-aggregated contribution refs +
    one dangling scalar), only the restart vector differs: teleport
    and dangling mass land uniformly on the seed set, giving
    seed-proximity scores.  ``seeds`` is a small broadcast list.
    Returns (node, rank)."""
    import ray

    actors, counts = _spawn_shards(
        _PPRShard, edges, n_buckets, src_col, dst_col,
        dedup_edges=dedup_edges,
    )
    B = n_buckets
    if int(sum(counts)) == 0:
        return _collect_shards(
            actors, [], {"node": "int64", "rank": "float64"}
        )
    seeds = np.asarray(sorted(set(int(s) for s in seeds)), np.int64)
    n_seeds = int(sum(ray.get(
        [a.set_seeds.remote(seeds) for a in actors]
    )))
    if n_seeds == 0:
        raise ValueError(
            "personalized_pagerank: no seed exists in the graph"
        )
    dangling = float(sum(ray.get(
        [a.init_ppr.remote(n_seeds) for a in actors]
    )))
    for _ in range(n_iter):
        outs = [_fan(a, "contribs", B) for a in actors]
        dangling = float(sum(ray.get(
            [
                actors[t].update_ppr.remote(
                    damping, dangling,
                    *[outs[i][t] for i in range(B)]
                )
                for t in range(B)
            ]
        )))
    refs = [
        a.ranks.remote() for a, c in zip(actors, counts) if c > 0
    ]
    return _collect_shards(
        actors, refs, {"node": "int64", "rank": "float64"}
    )
