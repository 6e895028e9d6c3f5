"""Distributed BPE tokenizer fitting.

Classic byte-pair-encoding training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units")
operates on the WORD HISTOGRAM, not the raw corpus: one corpus-sized
shuffle compresses the text to (word, count) rows, and every merge
iteration after that touches only the histogram — the same
pay-once/iterate-on-the-compressed-form shape as the BM25 stats table
(ops — see q_bm25) and the IVF index (ops/similarity.py).

Scale contract: the histogram is hash-partitioned by word and each
row keeps its word's symbol sequence as ONE Arrow list, so adjacency
never straddles a block boundary no matter how Ray re-batches.  Pair
counting and merge application are numpy over the flattened
list-array (values + offsets) — no Python loop over words.  Per
iteration the shuffle carries only per-batch (left, right, count)
partials, and the driver sees exactly one candidate row per batch
(per-batch top-1 before the fold), never the pair table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

END = "▁"  # end-of-word marker appended to every word


def _flat(batch: pa.Table):
    """Flatten the syms list column -> (values, word-index, lens)."""
    syms = batch.column("syms").combine_chunks()
    # flatten()/value_lengths() honor slices; raw .values/.offsets
    # would misalign on a sliced ListArray
    vals = np.asarray(syms.flatten().to_pandas(), dtype=object)
    lens = syms.value_lengths().to_numpy()
    widx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    return vals, widx, lens


def _pack(batch: pa.Table, vals: np.ndarray, lens: np.ndarray) -> pa.Table:
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    syms = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), pa.array(vals, pa.string())
    )
    return pa.table(
        {
            "word_id": batch.column("word_id"),
            "syms": syms,
            "cnt": batch.column("cnt"),
        }
    )


def _pair_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (left, right) -> weighted count partials."""
    empty = pa.table(
        {
            "left": pa.array([], pa.string()),
            "right": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
        }
    )
    if batch.num_rows == 0:
        return empty
    vals, widx, _lens = _flat(batch)
    if len(vals) < 2:
        return empty
    cnt = batch.column("cnt").to_numpy()
    same = widx[1:] == widx[:-1]
    if not same.any():
        return empty
    df = pd.DataFrame(
        {
            "left": vals[:-1][same],
            "right": vals[1:][same],
            "c": cnt[widx[:-1][same]],
        }
    )
    g = df.groupby(["left", "right"], as_index=False, sort=False)["c"].sum()
    return pa.Table.from_pandas(
        g, preserve_index=False
    ).replace_schema_metadata(None).cast(empty.schema)


def _batch_topk(batch: pa.Table, k: int = 128) -> pa.Table:
    """Top-k candidate rows per merged pair-count block (count desc,
    ties (left, right) ascending so the fold is total), plus a
    ``cut`` column: the count every UNREPORTED pair in this block is
    bounded by (the k-th count when truncated, else 0) — the driver
    needs it to prove batched merges equal the sequential ones."""
    if batch.num_rows == 0:
        return pa.table(
            {
                "left": pa.array([], pa.string()),
                "right": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
                "cut": pa.array([], pa.int64()),
            }
        )
    df = batch.to_pandas().sort_values(
        ["c", "left", "right"], ascending=[False, True, True]
    )
    cut = int(df["c"].iloc[k]) if len(df) > k else 0
    df = df.head(k)
    df["cut"] = np.int64(cut)
    return pa.Table.from_pandas(
        df, preserve_index=False
    ).replace_schema_metadata(None)


def _apply_merge(batch: pa.Table, a: str, b: str) -> pa.Table:
    """Replace every non-overlapping leftmost (a, b) adjacency with
    the merged symbol a+b, vectorized over the flattened lists."""
    if batch.num_rows == 0:
        return batch
    vals, widx, lens = _flat(batch)
    if len(vals) < 2:
        return batch
    match = (
        (vals[:-1] == a) & (vals[1:] == b) & (widx[1:] == widx[:-1])
    )
    p = np.flatnonzero(match)
    if len(p) == 0:
        return batch
    # greedy leftmost de-overlap: in each run of consecutive match
    # positions (aaa with merge (a,a)), keep even offsets only
    run_start = np.empty(len(p), dtype=np.bool_)
    run_start[0] = True
    run_start[1:] = p[1:] != p[:-1] + 1
    run_id = np.cumsum(run_start) - 1
    first = p[np.flatnonzero(run_start)][run_id]
    keep = p[((p - first) % 2) == 0]
    out = vals.copy()
    out[keep] = a + b
    mask = np.ones(len(vals), dtype=np.bool_)
    mask[keep + 1] = False
    new_lens = lens - np.bincount(widx[keep], minlength=len(lens))
    return _pack(batch, out[mask], new_lens)


def _explode_words(words) -> "tuple[np.ndarray, np.ndarray]":
    """Word sequence -> (flat symbol array, int32 list offsets): each
    word becomes its characters plus the END marker.  The ONE
    symbol-layout definition shared by fit (word_histogram) and apply
    (bpe_encode_counts) — int32 offsets cap a batch at 2^31 symbols."""
    lens = np.fromiter(
        (len(w) + 1 for w in words), dtype=np.int64, count=len(words)
    )
    flat = np.empty(int(lens.sum()), dtype=object)
    i = 0
    for w in words:  # one pass over UNIQUE words, not the corpus
        for ch in w:
            flat[i] = ch
            i += 1
        flat[i] = END
        i += 1
    offsets = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return flat, offsets


def word_histogram(ds, text_col: str, n_buckets: int = 64):
    """Corpus -> (word_id, syms, cnt) histogram Dataset: lowercase
    whitespace words, counted with one bucketed shuffle, each word
    exploded to its character symbols + the end marker."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    def words(batch: pd.DataFrame) -> pa.Table:
        w = (
            batch[text_col]
            .str.lower()
            .str.findall(r"\S+")
            .explode()
            .dropna()
        )
        return pa.table({"word": pa.array(w.to_numpy(), pa.string())})

    hist = bucketed_aggregate(
        ds.map_batches(words, batch_format="pandas"),
        ["word"], {"cnt": ("word", "count")}, n_buckets=n_buckets,
    )

    def explode(batch: pd.DataFrame) -> pa.Table:
        wl = batch["word"].tolist()
        flat, offsets = _explode_words(wl)
        syms = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), pa.array(flat, pa.string())
        )
        return pa.table(
            {
                "word_id": pa.array(
                    pd.util.hash_array(
                        batch["word"].to_numpy()
                    ).astype(np.int64),
                    pa.int64(),
                ),
                "syms": syms,
                "cnt": pa.array(
                    batch["cnt"].to_numpy(dtype=np.int64), pa.int64()
                ),
            }
        )

    return hist.map_batches(explode, batch_format="pandas")


def _apply_merges(batch: pa.Table, merges) -> pa.Table:
    """Apply several merges in rank order inside ONE map pass — k
    vectorized sweeps over the block, zero extra Ray rounds."""
    for a, b in merges:
        batch = _apply_merge(batch, a, b)
    return batch


def _sequential_prefix(cand: pd.DataFrame, cutoff: int,
                       limit: int) -> list:
    """Longest contiguous prefix of the sorted candidate window that
    PROVABLY equals the sequential Sennrich pick order.

    Facts used: merging (a, b) consumes exactly the "a b" adjacencies,
    so the only EXISTING pairs whose counts change are those ending at
    ``a`` (an "x a b" occurrence turns (x, a) into (x, ab)) or
    starting at ``b`` ("a b y" turns (b, y) into (ab, y)) — and those
    only DECREASE.  A pair like (a, y) with y != b or (x, b) with
    x != a is untouched: none of its occurrences overlap a merged
    adjacency.  Any NEW pair descending from the merge is bounded by
    the time-0 counts of that same touching set (every (x, ab)
    adjacency descends from an (x, a) one).  So candidate j is still
    the exact next argmax if its right symbol is no accepted merge's
    left, its left symbol is no accepted merge's right, and its count
    strictly exceeds both the accepted merges' new-pair bounds and
    the window cutoff (everything below the window).  Ties are unsafe
    (a decreased or new pair could tie with a better (left, right)
    string), hence strict inequality.  A candidate that MAY have
    decreased ends the prefix — it could still be the true argmax, so
    nothing after it is provable either.  The first candidate is the
    true argmax unconditionally."""
    chosen = []
    acc_lefts, acc_rights, acc_merged = set(), set(), set()
    bound = cutoff
    for row in cand.itertuples(index=False):
        a, b, c = str(row.left), str(row.right), int(row.c)
        s = a + b
        # collision channel: the merged STRING a+b can equal a symbol
        # that already exists at round start (e.g. 'ab'+'c' after an
        # earlier 'a'+'bc'), so pair keys containing it can INCREASE —
        # a candidate referencing any accepted merge's concatenation
        # (or re-creating the same concatenation) is therefore unsafe
        if chosen and (b in acc_lefts or a in acc_rights
                       or a in acc_merged or b in acc_merged
                       or s in acc_merged
                       or c <= bound):
            break
        chosen.append((a, b, c))
        acc_lefts.add(a)
        acc_rights.add(b)
        acc_merged.add(s)
        touching = cand.loc[
            (cand["right"] == a) | (cand["left"] == b)
            | (cand["right"] == s) | (cand["left"] == s), "c"
        ]
        tmax = int(touching.max()) if len(touching) else 0
        # 2x: a collision-merged key (x, a+b) combines its pre-existing
        # count with the occurrences inherited from (x, a); each term
        # is bounded by max(extended-touching window count, cutoff)
        bound = max(bound, 2 * max(cutoff, tmax))
        if len(chosen) >= limit:
            break
    return chosen


def bpe_fit(ds, text_col: str, n_merges: int,
            n_buckets: int = 64, topk: int = 128,
            driver_fold_rows: int = 5_000_000) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merge operations over ``ds[text_col]``.

    Returns a DataFrame (rank, left, right, pair_count) — the merge
    table a tokenizer would serialize.  Each ROUND batches as many
    merges as can be proven order-equal to the sequential algorithm
    (``_sequential_prefix``): per-batch vectorized pair partials ->
    global pair fold -> top-``topk`` window -> the driver takes the
    provable prefix and ONE ``map_batches`` pass applies the whole
    prefix in rank order.  Natural-language pair histograms are
    heavy-tailed, so rounds shrink from n_merges Ray executions
    toward n_merges / batch — with sequential fallback (batch of 1)
    whenever candidates interact.  The histogram is re-materialized
    per round so the next round reads the merged lists, not a
    re-executed lineage.

    The pair fold is size-adaptive: per-block partials are combiner
    output (one row per distinct adjacent symbol pair per block), so
    while the collected partial table stays under
    ``driver_fold_rows`` it folds with one driver-side groupby — one
    Ray execution per round, no shuffle.  The first round that
    exceeds the cap flips the fold to ``bucketed_aggregate``
    permanently (the distinct-pair table only grows with vocab), the
    same collect-small/shuffle-big split connected_components uses.
    """
    from unfurl_ray.ops.relational import bucketed_aggregate

    hist = word_histogram(ds, text_col, n_buckets).materialize()
    out = []
    # merges not yet folded into the materialized histogram: applied
    # LAZILY inside the next round's pair pass (a few extra numpy
    # sweeps per block beat a whole extra Ray execution per round),
    # compacted into a fresh materialization once the sweep count
    # would start to rival the saved execution
    pending: list = []
    driver_fold = True
    while len(out) < n_merges:
        if len(pending) >= 8:
            hist = hist.map_batches(
                lambda t, ms=tuple(pending): _apply_merges(t, ms),
                batch_format="pyarrow",
            ).materialize()
            pending = []
        stage = hist
        if pending:
            stage = hist.map_batches(
                lambda t, ms=tuple(pending): _apply_merges(t, ms),
                batch_format="pyarrow",
            )
        # materialized so the under/over-cap decision is a metadata
        # count — the over-cap round must NOT first pull the whole
        # oversized pair table onto the driver (nor re-execute the
        # lineage for the bucketed fold afterwards)
        partials = stage.map_batches(
            _pair_partial, batch_format="pyarrow"
        ).materialize()
        cand = None
        if driver_fold:
            if partials.count() > driver_fold_rows:
                driver_fold = False
            else:
                pdf = partials.to_pandas()
                agg = pdf.groupby(
                    ["left", "right"], as_index=False, sort=False
                )["c"].sum()
                cand = agg.sort_values(
                    ["c", "left", "right"],
                    ascending=[False, True, True],
                )
                cutoff = (
                    int(cand["c"].iloc[topk])
                    if len(cand) > topk else 0
                )
                cand = cand.head(topk)
        if cand is None:
            # the pair table is adjacency-bounded (distinct symbol
            # pairs) — few merge buckets suffice
            pairs = bucketed_aggregate(
                partials, ["left", "right"], {"c": ("c", "sum")},
                n_buckets=max(8, n_buckets // 4),
            )
            cand = pairs.map_batches(
                lambda t: _batch_topk(t, topk), batch_format="pyarrow"
            ).to_pandas()
            if cand.empty:
                break
            cutoff = int(cand["cut"].max())
            cand = cand.sort_values(
                ["c", "left", "right"], ascending=[False, True, True]
            )
            if len(cand) > topk:  # rows dropped by the global fold
                cutoff = max(cutoff, int(cand["c"].iloc[topk]))
                cand = cand.head(topk)
        if cand.empty:
            break
        chosen = _sequential_prefix(
            cand, cutoff, n_merges - len(out)
        )
        for a, b, c in chosen:
            out.append((len(out) + 1, a, b, c))
        pending.extend((a, b) for a, b, _ in chosen)
    return pd.DataFrame(
        out, columns=["rank", "left", "right", "pair_count"]
    )


def bpe_fit_reference(texts: list[str], n_merges: int) -> pd.DataFrame:
    """Single-process dict-based reference (the Sennrich pseudo-code)
    with the same tie-break — parity target for tests only."""
    from collections import Counter

    vocab = Counter()
    for t in texts:
        for w in t.lower().split():
            vocab[tuple(w) + (END,)] += 1
    out = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((rank, a, b, c))
        new_vocab = Counter()
        for syms, cnt in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == a
                    and syms[i + 1] == b
                ):
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_vocab[tuple(merged)] += cnt
        vocab = new_vocab
    return pd.DataFrame(
        out, columns=["rank", "left", "right", "pair_count"]
    )


def bpe_encode_counts(ds, text_col: str, id_col: str,
                      merges: pd.DataFrame):
    """APPLY a fitted merge table (the other half of the tokenizer
    story): per batch, the UNIQUE words tokenize once — the merge
    list replays in rank order as the same vectorized
    ``_apply_merge`` passes ``bpe_fit`` uses, over a word table
    whose rows are the batch's distinct words — and the resulting
    per-word token counts fan back to documents with one bincount.
    Token count = symbol-list length after all merges (the END
    marker fuses into the final token like Sennrich's ``</w>``).
    The merge table broadcasts ONCE via ``ray.put``; encode work per
    batch is O(unique words x merges), not O(corpus x merges).
    Returns (id, n_words, n_tokens) per document."""
    import ray

    from unfurl_ray.ops.relational import _broadcast_fetch

    mlist = [
        (str(a), str(b))
        for a, b in zip(merges["left"], merges["right"])
    ]
    ref = ray.put(mlist)

    class Encode:
        def __init__(self, mref):
            self.merges = _broadcast_fetch(mref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            n_docs = len(batch)
            ids = batch[id_col].to_numpy(dtype=np.int64)
            wl = (
                batch[text_col]
                .fillna("")
                .str.lower()
                .str.findall(r"\S+")
            )
            counts = wl.str.len().to_numpy(dtype=np.int64)
            doc_idx = np.repeat(
                np.arange(n_docs, dtype=np.int64), counts
            )
            flat_words = np.concatenate(
                [np.asarray(w, dtype=object) for w in wl]
            ) if counts.sum() else np.array([], dtype=object)
            if len(flat_words) == 0:
                return pa.table(
                    {
                        id_col: pa.array(ids, pa.int64()),
                        "n_words": pa.array(
                            np.zeros(n_docs, dtype=np.int64)
                        ),
                        "n_tokens": pa.array(
                            np.zeros(n_docs, dtype=np.int64)
                        ),
                    }
                )
            uniq, inv = np.unique(flat_words, return_inverse=True)
            flat, offsets = _explode_words(uniq)
            t = pa.table(
                {
                    "word_id": pa.array(
                        np.arange(len(uniq), dtype=np.int64),
                        pa.int64(),
                    ),
                    "syms": pa.ListArray.from_arrays(
                        pa.array(offsets, pa.int32()),
                        pa.array(flat, pa.string()),
                    ),
                    "cnt": pa.array(
                        np.ones(len(uniq), dtype=np.int64), pa.int64()
                    ),
                }
            )
            for a, b in self.merges:  # rank order
                t = _apply_merge(t, a, b)
            tok_per_word = (
                t.column("syms").combine_chunks()
                .value_lengths().to_numpy()
            )
            n_tokens = np.bincount(
                doc_idx, weights=tok_per_word[inv],
                minlength=n_docs,
            ).astype(np.int64)
            return pa.table(
                {
                    id_col: pa.array(ids, pa.int64()),
                    "n_words": pa.array(counts, pa.int64()),
                    "n_tokens": pa.array(n_tokens, pa.int64()),
                }
            )

    return ds.map_batches(
        Encode, batch_format="pandas", concurrency=(1, 8),
        fn_constructor_args=(ref,),
    )
