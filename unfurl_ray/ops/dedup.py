"""Deduplication operators (exact + near-dup families).

Ray-Data-first shapes (ray_guide "Aggregation at scale"):

- **exact**: vectorized content-hash column inside ``map_batches`` ->
  ``groupby(hash)`` keep-first.  The shuffle moves only (hash, doc_id,
  small cols), never the text payload, so it scales to 100 TB.
- **MinHash + LSH**: shingle -> minhash signature per doc (numpy, per
  batch) -> explode to (band_id, band_hash, band_bucket) rows ->
  groupby (band_id, band_bucket) -> candidate pairs -> exact-Jaccard
  verification.  Signatures are mergeable partials; the all-to-all
  exchange carries ~n_bands small ints per doc, fragmented across
  N_BANDS x N_BUCKETS groups so no group scales with the corpus.
- **SimHash**: 64-bit hyperplane-free charhash aggregate; near-dups =
  identical simhash buckets (or Hamming<=k via bit-rotation buckets).
- **n-gram Jaccard**: the verification kernel, also exposed directly.
- **embedding cosine**: see ops/similarity.py (near-dup = cos > tau).
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# MinHash parameters (classic 128 perms = 16 bands x 8 rows).
N_PERM = 128
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
# Shuffle granularity for LSH candidate generation: band rows group by
# a hash bucket of (band_id, band_hash), with the bucket COUNT sized to
# the corpus: ~TARGET_BUCKET_ROWS rows of 3 ints per map_groups group.
# Granularity is decoupled from semantics — same band_hash always lands
# in the same bucket, and the pairing inside a group sub-groups by
# (band_id, band_hash) vectorized — so the bucket count changes neither
# which pairs are emitted nor correctness, only (a) the per-group
# Python-dispatch overhead when buckets are too many (65k near-empty
# groups cost 8x at sf0.1) and (b) the group size when too few (one
# group per band = one row per corpus doc cannot fit a worker at
# 10^10 docs).
TARGET_BUCKET_ROWS = 20_000
MIN_BUCKETS = 16
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(42)
_PERM_A = _rng.integers(1, _MERSENNE, size=N_PERM, dtype=np.int64)
_PERM_B = _rng.integers(0, _MERSENNE, size=N_PERM, dtype=np.int64)


def normalize_words(text: str) -> list[str]:
    return [w.lower() for w in _WORD_RE.findall(text or "")]


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-word shingles -> stable hashes, without materializing shingle
    strings: crc32 per word (cached — vocab repeats heavily), then the
    k word-hashes of each shingle combine via a vectorized polynomial
    mix.  Deterministic across processes (crc32 + fixed constants)."""
    words = normalize_words(text)
    if not words:
        return np.zeros(1, dtype=np.int64)
    cache = _word_hash_cache
    wh = np.fromiter(
        (cache[w] if w in cache else cache.setdefault(
            w, zlib.crc32(w.encode())) for w in words),
        dtype=np.int64, count=len(words),
    )
    if len(cache) > 1_000_000:  # bound worker memory
        cache.clear()
    if len(words) < k:
        combined = np.int64(0)
        for i, h in enumerate(wh):
            combined = combined * np.int64(1_000_003) + h
        return np.unique(np.array([combined % _MERSENNE], dtype=np.int64))
    acc = np.zeros(len(words) - k + 1, dtype=np.int64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = acc * np.int64(1_000_003) + wh[j: len(words) - k + 1 + j]
    return np.unique(np.abs(acc) % _MERSENNE)


_word_hash_cache: dict = {}


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """N_PERM-wide MinHash signature (vectorized over shingles)."""
    h = shingle_hashes(text, k)
    # (n_shingles, N_PERM) permuted values via universal hashing.
    vals = (np.outer(h, _PERM_A) + _PERM_B) % _MERSENNE
    return vals.min(axis=0)


def add_content_hash(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized exact-dup key: crc64-ish of the raw content."""
    import hashlib

    texts = batch.column(column).to_pylist()
    hashes = [
        hashlib.md5((t or "").encode()).hexdigest() for t in texts
    ]
    return batch.append_column("content_hash", pa.array(hashes, pa.string()))


def exact_dedup(ds, column: str = "text", id_column: str = "doc_id"):
    """Keep the lowest-id row per exact content hash; adds dup_count.

    groupby moves only (hash, id) — drop the payload before the shuffle
    and rejoin by id downstream if the text is needed.
    """
    from unfurl_ray.ops.relational import bucketed_aggregate

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, column), batch_format="pyarrow"
    ).select_columns(["content_hash", id_column])

    # bucketed merge, not Ray's builtin aggregate OR per-hash
    # map_groups: hash count grows with the corpus, the builtin reduce
    # combines per key in Python (~40 s / 150k keys measured) and
    # per-group dispatch pays Python per hash — the hash-bucket
    # shuffle + one vectorized pandas groupby per bucket pays neither
    return bucketed_aggregate(
        hashed, ["content_hash"],
        {id_column: (id_column, "min"),
         "dup_count": (id_column, "count")},
    )


def minhash_band_rows(batch: pa.Table, column: str = "text",
                      id_column: str = "doc_id",
                      n_buckets: int = MIN_BUCKETS) -> pa.Table:
    """Explode each doc into N_BANDS (band_id, band_hash, band_bucket)
    rows; ``band_bucket`` is the shuffle key fragmenting the band rows
    across ``n_buckets`` map_groups groups (see TARGET_BUCKET_ROWS
    note above — granularity only, never semantics)."""
    ids = batch.column(id_column).to_pylist()
    texts = batch.column(column).to_pylist()
    out_ids, out_bands, out_hashes = [], [], []
    for doc_id, text in zip(ids, texts):
        sig = minhash_signature(text)
        for band in range(N_BANDS):
            chunk = sig[band * ROWS_PER_BAND: (band + 1) * ROWS_PER_BAND]
            band_hash = zlib.crc32(chunk.tobytes())
            out_ids.append(doc_id)
            out_bands.append(band)
            out_hashes.append(band_hash)
    return pa.table(
        {
            id_column: pa.array(out_ids, pa.int64()),
            "band_id": pa.array(out_bands, pa.int32()),
            "band_hash": pa.array(out_hashes, pa.int64()),
            "band_bucket": pa.array(
                [(h * 2654435761 + b) % n_buckets
                 for h, b in zip(out_hashes, out_bands)],
                pa.int32(),
            ),
        }
    )


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    a = set(shingle_hashes(text_a, k).tolist())
    b = set(shingle_hashes(text_b, k).tolist())
    if not a and not b:
        return 1.0
    inter = len(a & b)
    union = len(a | b)
    return inter / union if union else 0.0


def minhash_candidate_pairs(ds, column: str = "text",
                            id_column: str = "doc_id",
                            n_buckets: int | None = None):
    """LSH bucket join: docs sharing any band bucket become candidates.

    Returns a Dataset of (id_a, id_b) with id_a < id_b, deduped.

    ``n_buckets`` (auto): sized so a map_groups group holds about
    TARGET_BUCKET_ROWS (doc_id, band_id, band_hash) rows — neither
    65k near-empty groups paying a Python dispatch each (measured 8x
    at sf0.1) nor one group per band holding a row per corpus doc.
    The (band_id, band_hash) separation happens VECTORIZED inside the
    group, so the bucket count never changes which pairs come out.
    """
    if n_buckets is None:
        n_rows = ds.count() * N_BANDS  # parquet metadata count: cheap
        n_buckets = max(MIN_BUCKETS, n_rows // TARGET_BUCKET_ROWS)
    bands = ds.map_batches(
        lambda b: minhash_band_rows(b, column, id_column, n_buckets),
        batch_format="pyarrow",
    )

    from itertools import combinations

    def pairs_for_bucket(group: pd.DataFrame) -> pa.Table:
        # one call per shuffle bucket (~TARGET_BUCKET_ROWS rows); only
        # (band_id, band_hash) cells with >=2 docs can emit pairs —
        # filter those vectorized, then combine within each (rare)
        # duplicate cell.  Emits ARROW (typed even when empty): an
        # empty pandas block has no schema and poisons downstream
        # unions/joins (map_batches passes empty blocks through
        # without calling the UDF).
        out_a, out_b = [], []
        dup = group[group.duplicated(["band_id", "band_hash"],
                                     keep=False)]
        if not dup.empty:
            cap = 200  # hot-bucket guard: buckets this big at scale
            # mean a degenerate band -> cap the quadratic blowup
            for _, ids in dup.groupby(
                ["band_id", "band_hash"]
            )[id_column]:
                uniq = sorted(ids.unique())[:cap]
                for a, b in combinations(uniq, 2):
                    out_a.append(a)
                    out_b.append(b)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()),
             "id_b": pa.array(out_b, pa.int64())}
        )

    # pairs may repeat across bands; dedupe at the consumer (a pandas
    # drop_duplicates once collected beats a second Ray shuffle for a
    # candidate set that is tiny relative to the corpus)
    return bands.groupby("band_bucket").map_groups(
        pairs_for_bucket, batch_format="pandas"
    )


def minhash_dedup_pairs(ds, threshold: float = 0.8, column: str = "text",
                        id_column: str = "doc_id"):
    """Candidates -> verified near-dup pairs (exact n-gram Jaccard).

    Fully distributed verify — the corpus never crosses the driver:

    1. candidate PAIR table (small by LSH construction: band
       selectivity + the hot-bucket cap in ``pairs_for_band``) is the
       broadcast small side;
    2. one fused task-pool ``map_batches`` pass filters the corpus to
       candidate docs (broadcast key set) AND computes their exact
       shingle-hash sets — only O(candidates) rows leave the workers;
    3. pairs verify distributed against the broadcast shingle sets.
    """
    import ray.data as rd

    empty = pd.DataFrame(
        {"id_a": pd.Series(dtype="int64"),
         "id_b": pd.Series(dtype="int64"),
         "jaccard": pd.Series(dtype="float64")}
    )
    cand = (
        minhash_candidate_pairs(ds, column, id_column)
        .to_pandas()
        .drop_duplicates(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    if cand.empty:
        return empty
    need_ids = set(cand["id_a"]) | set(cand["id_b"])

    # ONE fused task-pool pass over the corpus: broadcast-key filter +
    # shingle computation in the same map (no actor spin-up, no second
    # scan); only O(candidates) rows come back
    def candidate_shingles(batch: pa.Table, need=None) -> pa.Table:
        ids = batch.column(id_column).to_numpy(zero_copy_only=False)
        mask = pd.Series(ids).isin(need).to_numpy()
        sub = batch.filter(pa.array(mask))
        texts = sub.column(column).to_pylist()
        return pa.table(
            {
                id_column: sub.column(id_column).cast(pa.int64()),
                "shingles": pa.array(
                    [shingle_hashes(t or "").tolist() for t in texts],
                    pa.list_(pa.int64()),
                ),
            }
        )

    cand_docs = (
        ds.select_columns([id_column, column])
        .map_batches(candidate_shingles, fn_kwargs={"need": need_ids},
                     batch_format="pyarrow")
        .to_pandas()  # O(candidates) rows, not the corpus
    )
    sets = {
        int(i): frozenset(s)
        for i, s in zip(cand_docs[id_column], cand_docs["shingles"])
    }
    # the shingle-set dict goes to the object store ONCE; each verify
    # actor fetches it in __init__ — a fn_kwargs dict would re-serialize
    # O(candidates x shingles) bytes into every task on near-dup-heavy
    # corpora (exactly the corpora this op targets)
    import ray

    sets_ref = ray.put(sets)

    class VerifyPairs:
        def __init__(self):
            self.sets = ray.get(sets_ref)
            self.threshold = threshold

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            jac = []
            for a, b in zip(batch["id_a"], batch["id_b"]):
                sa = self.sets.get(int(a), frozenset())
                sb = self.sets.get(int(b), frozenset())
                union = len(sa | sb)
                jac.append(len(sa & sb) / union if union else 1.0)
            out = batch.assign(jaccard=np.round(jac, 4))
            return out[out["jaccard"] >= self.threshold]

    # from_arrow with stripped pandas metadata: the metadata dict makes
    # block schemas unhashable and spams "Failed to hash the schemas"
    # per worker (same fix as the similarity stages)
    cand_tbl = pa.Table.from_pandas(
        cand, preserve_index=False
    ).replace_schema_metadata(None)
    out = (
        rd.from_arrow(cand_tbl)
        .map_batches(VerifyPairs, batch_format="pandas",
                     concurrency=(1, 4))
        .to_pandas()
    )
    if out.empty:
        return empty
    return (
        out.sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
        .astype({"id_a": "int64", "id_b": "int64"})
    )


# -- SimHash ----------------------------------------------------------------

def simhash64(text: str) -> int:
    """64-bit SimHash over word features.  The per-word hash is the
    first 8 bytes of md5 (big-endian): process-stable like the old
    crc mix, but ALSO SQL-expressible, so q_simhash is hash-checked
    against a DuckDB twin that recomputes the whole sketch."""
    words = normalize_words(text)
    if not words:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for w in words:
        bits = np.unpackbits(
            np.frombuffer(
                int(_simword_hash(w)).to_bytes(8, "big"), dtype=np.uint8
            )
        ).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


_simword_cache: dict = {}


def _simword_hash(w: str) -> int:
    h = _simword_cache.get(w)
    if h is None:
        import hashlib

        h = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
        _simword_cache[w] = h
        if len(_simword_cache) > 1_000_000:
            _simword_cache.clear()
    return h


def add_simhash(batch: pa.Table, column: str = "text") -> pa.Table:
    """Batch SimHash, vectorized across the whole batch: factorize the
    token stream, hash+unpack bits once per UNIQUE word, then one
    ``np.add.at`` scatter accumulates every doc's 64 bit-counts.
    Bit-identical to ``simhash64`` (same md5 word hash, msb-first)."""
    texts = batch.column(column).to_pylist()
    words_all, lens = [], []
    for t in texts:
        ws = normalize_words(t)
        words_all.extend(ws)
        lens.append(len(ws))
    n = len(texts)
    acc = np.zeros((n, 64), dtype=np.int32)
    if words_all:
        codes, uniques = pd.factorize(
            np.asarray(words_all, dtype=object), sort=False
        )
        uh = np.fromiter(
            (_simword_hash(w) for w in uniques),
            dtype=np.uint64, count=len(uniques),
        )
        bits = np.unpackbits(
            uh.astype(">u8").view(np.uint8).reshape(-1, 8), axis=1
        ).astype(np.int8)
        pm = bits * 2 - 1  # (n_unique, 64) in {-1, +1}
        # docs are contiguous in the token stream: one fast C reduce
        # per doc segment (np.add.at, reduceat and even cumsum are all
        # orders slower on a (n_words, 64) map on this numpy build)
        mat = pm[codes]
        pos = 0
        for i, ln in enumerate(lens):
            if ln:
                acc[i] = mat[pos: pos + ln].sum(axis=0)
                pos += ln
    packed = np.packbits((acc > 0).astype(np.uint8), axis=1)
    hashes = packed.view(">u8").ravel().astype(np.uint64)
    # int64 domain for Arrow: shift into signed range.
    signed = (hashes - np.uint64(1 << 63)).view(np.int64)
    return batch.append_column("simhash", pa.array(signed, pa.int64()))


class SnippetDedupCache:
    """Actor-pool stage: streaming near-duplicate snippet marking.

    Holds a bounded LRU of content fingerprints per actor (north_star:
    "snippet dedup caches" as actor state) and flags rows whose
    normalized text was already seen by THIS actor — an intentionally
    approximate, zero-shuffle streaming filter: each actor only sees
    its share of the stream, so cross-actor duplicates pass (use
    ``exact_dedup``'s content-hash groupby for the exact, global
    variant).  Routing batches by a key (e.g. hash-partitioned
    conv_id) makes per-key duplicates deterministic.
    """

    def __init__(self, column: str = "text", capacity: int = 100_000):
        from collections import OrderedDict

        self.column = column
        self.capacity = capacity
        self.seen: "OrderedDict[int, None]" = OrderedDict()

    def _fingerprint(self, text: str) -> int:
        import zlib

        norm = " ".join((text or "").split()).lower()
        return zlib.crc32(norm.encode())

    def __call__(self, batch: pa.Table) -> pa.Table:
        flags = []
        for text in batch.column(self.column).to_pylist():
            fp = self._fingerprint(text)
            if fp in self.seen:
                self.seen.move_to_end(fp)
                flags.append(True)
            else:
                self.seen[fp] = None
                if len(self.seen) > self.capacity:
                    self.seen.popitem(last=False)
                flags.append(False)
        return batch.append_column(
            "is_dup_snippet", pa.array(flags, pa.bool_())
        )


def snippet_dedup(ds, column: str = "text", capacity: int = 100_000,
                  concurrency: int = 1):
    """Attach the streaming snippet-dedup stage (stateful actor pool;
    concurrency=1 -> globally exact within stream order)."""
    return ds.map_batches(
        SnippetDedupCache,
        fn_constructor_kwargs={"column": column, "capacity": capacity},
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


# --- benchmark n-gram decontamination -------------------------------

class _NgramProbe:
    """map_batches UDF: flag docs sharing any word n-gram with the
    broadcast benchmark set (fetched once per actor in __init__)."""

    def __init__(self, grams_ref, n: int, id_col: str, text_col: str,
                 keep_cols: tuple = ()):
        import ray

        grams = (
            ray.get(grams_ref)
            if isinstance(grams_ref, ray.ObjectRef)
            else grams_ref
        )
        # pandas Index -> O(1) hashed membership, built once per actor
        self.grams = pd.Index(grams)
        self.n = n
        self.id_col = id_col
        self.text_col = text_col
        self.keep_cols = list(keep_cols)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, grams = _doc_ngrams(batch, self.n, self.id_col,
                                 self.text_col)
        n_rows = len(batch)
        hits = np.zeros(n_rows, dtype=np.int64)
        if len(grams):
            pairs = pd.DataFrame({"i": ids, "g": grams})
            pairs = pairs[pairs["g"].isin(self.grams)]
            # distinct contaminated n-grams per doc
            hc = pairs.drop_duplicates().groupby("i").size()
            hits[hc.index.to_numpy()] = hc.to_numpy()
        out = batch[[self.id_col, *self.keep_cols]].copy()
        out["n_hits"] = hits
        out["contaminated"] = hits > 0
        return out


def _doc_ngrams(batch: pd.DataFrame, n: int, id_col: str,
                text_col: str):
    """(row_idx, ngram_string) arrays for every word n-gram in the
    batch — vectorized: one token explode, n-1 shifted object-array
    concats, doc boundaries masked.  Tokenization = lowercase ASCII-
    whitespace split (the repo-wide SQL-parity tokenizer)."""
    from unfurl_ray.ops.textstats import _WORD_SPLIT_RE

    texts = batch[text_col].fillna("").str.lower()
    words_list = texts.map(_WORD_SPLIT_RE.findall)
    n_words = words_list.map(len).to_numpy(dtype=np.int64)
    if int(n_words.sum()) < n:
        return np.empty(0, np.int64), np.empty(0, object)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), n_words)
    words = np.concatenate(
        [np.asarray(ws, dtype=object) for ws in words_list if ws]
    )
    m = len(words) - n + 1
    if m <= 0:
        return np.empty(0, np.int64), np.empty(0, object)
    grams = words[:m].copy()
    for k in range(1, n):
        grams = grams + " "
        grams = grams + words[k:m + k]
    valid = doc_idx[:m] == doc_idx[n - 1:]
    return doc_idx[:m][valid], grams[valid]


def benchmark_ngrams(bench_ds, n: int = 3, text_col: str = "text",
                     id_col: str = "doc_id") -> np.ndarray:
    """Distinct word n-grams of a (small) benchmark Dataset.

    Per-batch distinct runs distributed; only the deduped gram strings
    reach the driver.  Benchmark sets (eval suites) are tiny relative
    to the corpus, so a driver set + one ``ray.put`` is the right
    broadcast shape; for huge reference sets swap in a Bloom filter
    (ops.sketch.BloomFilter) behind the same probe stage."""
    def distinct(batch: pd.DataFrame) -> pd.DataFrame:
        _, grams = _doc_ngrams(batch, n, id_col, text_col)
        return pd.DataFrame({"gram": pd.unique(grams)})

    parts = bench_ds.map_batches(distinct, batch_format="pandas")
    return pd.unique(parts.to_pandas()["gram"].to_numpy())


def ngram_decontaminate(docs_ds, bench_ds, n: int = 3,
                        id_col: str = "doc_id",
                        text_col: str = "text",
                        concurrency: int = 8,
                        keep_cols: tuple = ()):
    """Flag corpus docs that share any word n-gram with a benchmark
    set (training-data decontamination, Gopher/GPT-3 style — those use
    8-13-grams; n is a knob).

    Corpus streams through a vectorized membership probe; the
    benchmark gram set is broadcast ONCE via ``ray.put``.  Output:
    one row per corpus doc with the distinct-hit count."""
    import ray

    grams = benchmark_ngrams(bench_ds, n=n, text_col=text_col,
                             id_col=id_col)
    ref = ray.put(grams)
    return docs_ds.map_batches(
        _NgramProbe,
        fn_constructor_kwargs={"grams_ref": ref, "n": n,
                               "id_col": id_col, "text_col": text_col,
                               "keep_cols": keep_cols},
        batch_format="pandas",
        concurrency=(1, concurrency),
    )


def duplicate_ngram_spans(ds, n: int = 5, column: str = "text",
                          id_column: str = "doc_id",
                          n_buckets: int | None = None):
    """Exact substring-level dedup signal (the distributed core of
    suffix-array training-data dedup a la "Deduplicating Training
    Data Makes Language Models Better"): for every document, count
    the token positions whose ``n``-gram occurs MORE THAN ONCE in the
    whole corpus (including a second time in the same document).

    Stages:
      1. map_batches: tokenize (lowercase, whitespace — the same
         tokenizer as the vocab/bigram ops), hash each n-gram with
         md5 (the oracle contract, like ``fingerprint_batch``; a
         rolling 128-bit hash is the drop-in at scale), pre-collapse
         repeats within a doc, and emit (h, doc, cnt) tagged with
         ``hash(h) % n_buckets``.  The shuffle carries 16-byte gram
         keys + two ints per DISTINCT (gram, doc) — never the text.
      2. groupby(bucket): all copies of a gram land in one bucket
         (the bucket is a function of h), so one vectorized pandas
         transform finds grams with corpus count >= 2 and folds the
         per-doc duplicated-position counts.
      3. bucketed_aggregate(doc): sums the per-bucket partials into
         one row per affected document.

    No group ever holds a corpus-sized frame: buckets are auto-sized
    to ~TARGET rows, and a degenerate gram (e.g. a boilerplate
    sentence in every doc) costs its bucket one group of
    one-row-per-containing-doc — the same bound LSH banding accepts.
    """
    import hashlib
    import re
    from collections import Counter

    if n_buckets is None:
        # ~one shuffle row per distinct (gram, doc); tokens per doc
        # estimated from the first block's mean is overkill — a flat
        # per-doc estimate only changes group COUNT, not results
        n_buckets = max(32, (ds.count() * 256) // 200_000)

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as ws  # shared token contract

    def gram_rows(batch: pd.DataFrame) -> pa.Table:
        hs, docs, cnts = [], [], []
        for doc_id, text in zip(batch[id_column], batch[column]):
            toks = [t for t in ws.split((text or "").lower()) if t]
            if len(toks) < n:
                continue
            c = Counter(
                " ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)
            )
            for gram, k in c.items():
                hs.append(
                    hashlib.md5(gram.encode("utf-8")).hexdigest()[:16]
                )
                docs.append(doc_id)
                cnts.append(k)
        h_arr = pa.array(hs, pa.string())
        bucket = (
            pd.util.hash_array(np.asarray(hs, dtype=object))
            % np.uint64(n_buckets)
        ).astype(np.int64)
        return pa.table(
            {
                "h": h_arr,
                id_column: pa.array(docs, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
                "_bucket": pa.array(bucket, pa.int64()),
            }
        )

    def dup_partials(group: pd.DataFrame) -> pa.Table:
        total = group.groupby("h")["cnt"].transform("sum")
        dup = group[total >= 2]
        out = dup.groupby(id_column, as_index=False)["cnt"].sum()
        return pa.table(
            {
                id_column: pa.array(out[id_column], pa.int64()),
                "n_dup_grams": pa.array(out["cnt"], pa.int64()),
            }
        )

    from unfurl_ray.ops.relational import bucketed_aggregate

    partials = (
        ds.map_batches(gram_rows, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(dup_partials, batch_format="pandas")
    )
    return bucketed_aggregate(
        partials, [id_column], {"n_dup_grams": ("n_dup_grams", "sum")},
    )


# -- exact set-similarity self-join (prefix filtering) -----------------------

def _ws_words(text: str) -> list[str]:
    """The repo token contract: lowercase, ASCII-whitespace split,
    empties dropped (SQL twin: list_filter(string_split_regex(
    lower(text), '[ \\t\\n\\f\\r]+'), w -> w <> '')).  The regex is
    the ONE shared definition every token-contract site uses."""
    from unfurl_ray.ops.textstats import _WS_SPLIT_RE

    return [w for w in _WS_SPLIT_RE.split((text or "").lower()) if w]


def set_similarity_join(ds, threshold: float = 0.4, k: int = 3,
                        id_column: str = "doc_id", column: str = "text",
                        n_buckets: int = 64) -> "pd.DataFrame":
    """Exact Jaccard self-join over distinct k-word shingle sets —
    the EXACT counterpart to ``minhash_near_dup`` (probabilistic),
    distributed as prefix filtering (PPJoin-style; Xiao et al.,
    "Efficient Similarity Joins for Near Duplicate Detection", WWW'08).

    Semantics (SQL-twinned, q_setsim_join): a doc's set is its
    DISTINCT k-word shingles (the whitespace token contract joined by
    single spaces; docs with < k words have no shingles and cannot
    match).  Emits (doc_a, doc_b, jaccard) for doc_a < doc_b with
    jaccard >= threshold, threshold compared in exact integer
    arithmetic (i * den >= num * union) so no float boundary flaps.

    Scale shape — no stage ever holds the corpus:
    1. explode to (gram, doc_id), distinct per doc (local).
    2. gram-hash-bucket groupby: document frequency per gram computed
       vectorized INSIDE ~n_buckets groups (one shuffle; same
       granularity-only bucketing as the MinHash banding above).
    3. doc-hash-bucket groupby: per doc, order grams rare-first by
       (df, gram), keep the PPJoin prefix (n - ceil(t*n) + 1) —
       vectorized cumcount/transform, one shuffle.
    4. gram-bucket groupby over prefixes only: emit candidate pairs
       within each gram, pre-filtered by the size bound
       min(na,nb) >= t * max(na,nb); one shuffle, prefix-sized.
    5. verify: candidate doc ids are few — their full gram sets are
       collected once and the exact Jaccard evaluated vectorized.
    At 10^10 docs the candidate table is the output-scale object; a
    hot prefix gram can be salted the same way the MinHash band
    buckets are (granularity, not semantics).
    """
    import zlib
    from fractions import Fraction

    import pandas as pd

    frac = Fraction(threshold).limit_denominator(10**6)
    num, den = frac.numerator, frac.denominator

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        out_id, out_gram = [], []
        for doc_id, text in zip(ids, texts):
            ws = _ws_words(text)
            if len(ws) < k:
                continue
            grams = set(
                " ".join(ws[i: i + k]) for i in range(len(ws) - k + 1)
            )
            out_id.extend([doc_id] * len(grams))
            out_gram.extend(grams)
        buckets = [zlib.crc32(g.encode()) % n_buckets for g in out_gram]
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "gram": pa.array(out_gram, pa.string()),
                "_bucket": pa.array(buckets, pa.int32()),
            }
        )

    grams = ds.select_columns([id_column, column]).map_batches(
        explode, batch_format="pyarrow"
    )

    def df_in_bucket(group: pd.DataFrame) -> pa.Table:
        g = group[["doc_id", "gram"]].copy()
        g["df"] = g.groupby("gram")["gram"].transform("size")
        g["_dbucket"] = (
            g["doc_id"].to_numpy(np.int64) % np.int64(n_buckets)
        ).astype(np.int32)
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    with_df = grams.groupby("_bucket").map_groups(
        df_in_bucket, batch_format="pandas"
    )

    def prefixes_in_bucket(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(
            ["doc_id", "df", "gram"], kind="mergesort"
        ).reset_index(drop=True)
        n = g.groupby("doc_id")["doc_id"].transform("size").to_numpy(
            np.int64
        )
        rank = g.groupby("doc_id").cumcount().to_numpy(np.int64)
        # ceil(t*n) with exact integers: -(-num*n // den)
        ceil_tn = -((-(np.int64(num) * n)) // np.int64(den))
        plen = n - ceil_tn + 1
        keep = rank < plen
        out = g.loc[keep, ["gram", "doc_id"]].copy()
        out["n"] = n[keep]
        out["_bucket"] = [
            zlib.crc32(s.encode()) % n_buckets for s in out["gram"]
        ]
        out["_bucket"] = out["_bucket"].astype(np.int32)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    prefixes = with_df.groupby("_dbucket").map_groups(
        prefixes_in_bucket, batch_format="pandas"
    )

    def candidates_in_bucket(group: pd.DataFrame) -> pa.Table:
        out_a, out_b, out_na, out_nb = [], [], [], []
        g = group.sort_values(["gram", "doc_id"], kind="mergesort")
        for _, sub in g.groupby("gram", sort=False):
            if len(sub) < 2:
                continue
            ids = sub["doc_id"].to_numpy(np.int64)
            ns = sub["n"].to_numpy(np.int64)
            iu, il = np.triu_indices(len(ids), k=1)
            a, b = ids[iu], ids[il]
            na, nb = ns[iu], ns[il]
            lo = np.minimum(na, nb)
            hi = np.maximum(na, nb)
            keep = lo * den >= num * hi  # size bound for jaccard >= t
            out_a.append(a[keep]); out_b.append(b[keep])
            out_na.append(na[keep]); out_nb.append(nb[keep])
        if not out_a:
            return pa.table(
                {
                    "doc_a": pa.array([], pa.int64()),
                    "doc_b": pa.array([], pa.int64()),
                }
            )
        a = np.concatenate(out_a); b = np.concatenate(out_b)
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(a, b), pa.int64()),
                "doc_b": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    cand = (
        prefixes.groupby("_bucket")
        .map_groups(candidates_in_bucket, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()  # candidate-table-sized (output scale)
        .reset_index(drop=True)
    )
    if cand.empty:
        return pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            }
        )

    # verify: exact Jaccard over the candidate docs' full gram sets —
    # re-shingle ONLY the candidate docs from the source (the grams
    # lineage is unmaterialized; consuming it again would re-explode
    # the whole corpus), filtering with a vectorized is_in
    import pyarrow.compute as pc

    cand_ids = set(cand["doc_a"]) | set(cand["doc_b"])
    id_set = pa.array(sorted(cand_ids), pa.int64())

    def keep_cands(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_in(batch.column(id_column), value_set=id_set)
        )

    cand_docs = (
        ds.select_columns([id_column, column])
        .map_batches(keep_cands, batch_format="pyarrow")
        .to_pandas()
    )
    sets = {}
    for doc, text in zip(cand_docs[id_column], cand_docs[column]):
        ws = _ws_words(text)
        sets[int(doc)] = set(
            " ".join(ws[i: i + k]) for i in range(len(ws) - k + 1)
        ) if len(ws) >= k else set()
    rows_a, rows_b, rows_j = [], [], []
    for a, b in zip(cand["doc_a"], cand["doc_b"]):
        sa, sb = sets[a], sets[b]
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        if inter * den >= num * union:  # exact threshold test
            rows_a.append(a); rows_b.append(b)
            rows_j.append(
                np.floor(inter * 1e6 / union + 0.5) / 1e6
            )
    return (
        pd.DataFrame(
            {
                "doc_a": pd.Series(rows_a, dtype="int64"),
                "doc_b": pd.Series(rows_b, dtype="int64"),
                "jaccard": pd.Series(rows_j, dtype="float64"),
            }
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _lev_leq(a: str, b: str, k: int) -> int:
    """Banded Levenshtein: exact distance if <= k, else k+1.  Runs on
    CANDIDATE pairs only (output-scale), never the corpus."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > k:
        return k + 1
    # Ukkonen band: only cells |i - j| <= k can stay within budget
    prev = list(range(min(lb, k) + 1)) + [k + 1] * max(0, lb - k)
    for i in range(1, la + 1):
        cur = [k + 1] * (lb + 1)
        if i <= k:
            cur[0] = i
        lo = max(1, i - k)
        hi = min(lb, i + k)
        ca = a[i - 1]
        best = k + 1
        for j in range(lo, hi + 1):
            cost = 0 if ca == b[j - 1] else 1
            v = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            cur[j] = v
            if v < best:
                best = v
        if best > k:
            return k + 1
        prev = cur
    return prev[lb] if prev[lb] <= k else k + 1


def edit_distance_join(ds, k: int = 1, key_len: int = 24,
                       id_column: str = "doc_id", column: str = "text",
                       n_buckets: int = 64,
                       variant_cap: int | None = None) -> pd.DataFrame:
    """Exact edit-distance self-join (Levenshtein <= k on a derived
    short key) by FastSS deletion-neighborhood blocking (Bocek et al.
    2007, "Fast Similarity Search in Large Dictionaries") — a third
    algorithmic family next to PPJoin prefix filtering
    (``set_similarity_join``) and MinHash banding: exact like the
    former, but with a SHUFFLE-ONLY plan (no document-frequency
    pre-pass).

    Key contract (mirrored in the SQL twin): lowercase text,
    ``[ \\t\\n\\f\\r]`` runs collapsed to one space, trimmed, first
    ``key_len`` chars.  Completeness of the blocking for k=1:
    ed(a,b) <= 1 implies a and b share a member of their <=1-deletion
    neighborhoods (equal / substitution -> delete the differing
    position from both; insertion -> delete the inserted char).  For
    general k, <=k-deletion neighborhoods are complete likewise
    (delete the k edit positions from each side).  Soundness comes
    from the verify stage: exact banded Levenshtein on candidates.

    Scale shape: explode is a bounded x~(key_len choose <=k) fan-out
    of (id, short-key) rows; one groupby on a crc32 hash bucket of
    the variant; pairs generated per variant INSIDE the group and
    verified there (keys ride along, so no second join to fetch
    text); a final (doc_a, doc_b) groupby dedups pairs found via
    multiple shared variants.  ``variant_cap`` guards a degenerate
    hot variant (e.g. the empty key) at scale — default None keeps
    the oracle exact."""
    from itertools import combinations

    from ray.data.aggregate import Min

    _ws_run = re.compile(r"[ \t\n\f\r]+")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        texts = batch.column(column).to_pylist()
        out_id, out_v, out_s, out_b = [], [], [], []
        for doc_id, text in zip(ids, texts):
            s = _ws_run.sub(" ", (text or "").lower()).strip()[:key_len]
            seen = {s}
            for drop in range(1, k + 1):
                for pos in combinations(range(len(s)), drop):
                    v = "".join(
                        c for i, c in enumerate(s) if i not in pos
                    )
                    seen.add(v)
            for v in seen:
                out_id.append(doc_id)
                out_v.append(v)
                out_s.append(s)
                out_b.append(zlib.crc32(v.encode()) % n_buckets)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "v": pa.array(out_v, pa.string()),
                "s": pa.array(out_s, pa.string()),
                "_bucket": pa.array(out_b, pa.int32()),
            }
        )

    rows = ds.select_columns([id_column, column]).map_batches(
        explode, batch_format="pyarrow"
    )

    def pairs_in_bucket(group: pd.DataFrame) -> pa.Table:
        out_a, out_b, out_d = [], [], []
        emitted: set[tuple[int, int]] = set()
        for _, sub in group.groupby("v", sort=False):
            # a doc can reach the same variant via several deletions;
            # keep one row per doc
            sub = sub.drop_duplicates("doc_id")
            if variant_cap is not None and len(sub) > variant_cap:
                sub = sub.nsmallest(variant_cap, "doc_id")
            if len(sub) < 2:
                continue
            ids = sub["doc_id"].to_numpy(np.int64)
            keys = sub["s"].to_numpy()
            order = np.argsort(ids, kind="stable")
            ids, keys = ids[order], keys[order]
            for i, j in zip(*np.triu_indices(len(ids), k=1)):
                pair = (int(ids[i]), int(ids[j]))
                if pair in emitted:
                    continue
                emitted.add(pair)
                d = _lev_leq(keys[i], keys[j], k)
                if d <= k:
                    out_a.append(pair[0])
                    out_b.append(pair[1])
                    out_d.append(d)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    verified = rows.groupby("_bucket").map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # cross-bucket dedup: the same pair verified under variants that
    # hash to different buckets; dist is identical on every copy
    out = (
        verified.groupby(["doc_a", "doc_b"])
        .aggregate(Min("dist", alias_name="dist"))
        .to_pandas()
    )
    out["dist"] = out["dist"].astype("int64")
    return (
        out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def prefix_containment_dedup(ds, column: str = "text",
                             id_column: str = "doc_id",
                             block_chars: int = 24):
    """Prefix-containment dedup: drop every doc whose normalized text
    is a PROPER PREFIX of another doc's (truncated re-crawls, retry
    prefixes, boilerplate-extended copies), plus exact dups keeping
    the smallest id.  Returns ``(id, reason)`` rows for the dropped
    docs, reason in {'exact', 'prefix'}.

    Normalization matches ``edit_distance_join``'s key contract
    (lowercase, ``[ \\t\\n\\f\\r]`` runs -> one space, trim); docs
    shorter than ``block_chars`` after normalization are out of scope
    (a prefix relation implies equal first-``block_chars`` chars, the
    shuffle block key).

    Scale shape: one groupby on the 24-char block key (normalized
    text rides the shuffle ONCE, like exact dedup); in-group the sort
    order does the work — a string is a proper prefix of SOME group
    member iff it is a prefix of its immediate DISTINCT successor
    (any string sorting between s and an extension of s itself starts
    with s), so the check is one adjacent pass over unique strings,
    never pairs."""
    import re

    ws = re.compile(r"[ \t\n\f\r]+")

    def norm(batch: pd.DataFrame) -> pa.Table:
        s = (
            batch[column].fillna("").str.lower()
            .str.replace(ws, " ", regex=True).str.strip()
        )
        keep = s.str.len() >= block_chars
        return pa.table(
            {
                id_column: pa.array(
                    batch.loc[keep, id_column].to_numpy(np.int64),
                    pa.int64(),
                ),
                "s": pa.array(s[keep].to_numpy(), pa.large_string()),
                "blk": pa.array(
                    s[keep].str.slice(0, block_chars).to_numpy(),
                    pa.string(),
                ),
            }
        )

    def contained(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["s", id_column])
        s = g["s"].to_numpy()
        ids = g[id_column].to_numpy(np.int64)
        n = len(g)
        exact = np.zeros(n, dtype=bool)
        exact[1:] = s[1:] == s[:-1]
        su = pd.unique(s)
        is_pref = {
            a for a, b in zip(su[:-1], su[1:]) if b.startswith(a)
        }
        pref = np.fromiter(
            (x in is_pref for x in s), dtype=bool, count=n
        )
        drop = exact | pref
        reason = np.where(exact[drop], "exact", "prefix")
        return pa.table(
            {
                id_column: pa.array(ids[drop], pa.int64()),
                "reason": pa.array(reason, pa.string()),
            }
        )

    return (
        ds.map_batches(norm, batch_format="pandas")
        .groupby("blk")
        .map_groups(contained, batch_format="pandas")
    )


def frequency_cap(ds, column: str = "text", id_column: str = "doc_id",
                  k: int = 2, n_buckets: int = 64):
    """Keep at most ``k`` copies (lowest ids) per exact content hash —
    the dup-frequency cap curation step (full dedup deletes signal;
    capping bounds memorization pressure while keeping popular
    boilerplate represented).

    Same scale shape as ``exact_dedup``: the payload drops before the
    shuffle (only (content_hash, id) moves), each batch pre-prunes to
    its local k-smallest ids per hash, and the exchange is a hash-
    BUCKET groupby whose per-bucket cap is ONE vectorized pandas
    sort + groupby-head — never per-key Python dispatch, no bucket
    grows with the corpus (hashes spread uniformly)."""
    from unfurl_ray.ops.relational import _arrow

    hashed = ds.map_batches(
        lambda b: add_content_hash(b, column), batch_format="pyarrow"
    ).select_columns(["content_hash", id_column])

    def cap(frame: pd.DataFrame) -> pd.DataFrame:
        return (
            frame.sort_values(["content_hash", id_column])
            .groupby("content_hash", as_index=False)
            .head(k)
        )

    def partial(batch: pd.DataFrame) -> pa.Table:
        kept = cap(batch)
        kept["_bucket"] = (
            pd.util.hash_pandas_object(
                kept["content_hash"], index=False
            ).to_numpy() % np.uint64(n_buckets)
        ).astype(np.int64)
        return _arrow(kept)

    def cap_bucket(group: pd.DataFrame) -> pa.Table:
        return _arrow(cap(group.drop(columns=["_bucket"])))

    return (
        hashed.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(cap_bucket, batch_format="pandas")
    )
