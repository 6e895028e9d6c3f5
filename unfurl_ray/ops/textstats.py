"""Text-analysis operators over a documents table.

All vectorized ``map_batches`` stages (pandas/numpy kernels, compiled
regexes at module scope — loaded once per worker).  Each has a
``queries()`` entry with a DuckDB oracle — including the heuristics:
quality scoring mirrors the SQL's ASCII classes + half-up rounding,
and language-ID's stopword-argmax has an exact CASE-cascade twin.
"""

from __future__ import annotations

import hashlib
import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword splitter: words, numbers, punctuation runs.
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
_PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "zu", "den", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "de", "que"},
}


def token_count_batch(batch: pa.Table) -> pa.Table:
    """doc_id, n_tokens (whitespace), n_subtokens (BPE-ish regex).

    Both counts run as Arrow RE2 kernels (count_substring_regex) —
    no per-row Python regex in this hot path.  Note RE2's ``\\s`` is
    ASCII-only (U+00A0 etc. count as token chars), which matches the
    DuckDB oracle's regexp semantics exactly — Python's Unicode ``\\s``
    would not."""
    import pyarrow.compute as pc

    col = pc.fill_null(batch.column("text"), "")
    n_tok = pc.count_substring_regex(col, r"\S+")
    n_sub = pc.count_substring_regex(
        col, r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(n_tok, pa.int64()),
            "n_subtokens": pc.cast(n_sub, pa.int64()),
        }
    )


# ASCII character classes written out explicitly so the Python regex
# and the DuckDB/RE2 oracle regex are the SAME pattern text (RE2's \s
# and Python's unicode \s disagree on \v and U+00A0 etc.)
_WS_CLASS = " \t\n\f\r"
_WORD_SPLIT_RE = re.compile(rf"[^{_WS_CLASS}]+")
_PUNCT_ASCII_RE = re.compile(rf"[^A-Za-z0-9_{_WS_CLASS}]")


def _half_up(x, k: int):
    """Round half UP at k decimals via floor(x*10^k + 0.5)/10^k —
    the same float64 ops the SQL oracle runs, so results are
    bit-identical (numpy/pandas .round() is half-to-even, DuckDB
    round() is half-away; neither matches the other)."""
    import numpy as np

    scale = float(10 ** k)
    return np.floor(np.asarray(x, dtype=np.float64) * scale + 0.5) / scale


_ALL_STOP_ARR = pa.array(
    sorted(set().union(*STOPWORDS.values())), pa.string()
)


def _split_words(col: pa.Array, n_docs: int):
    """ASCII-whitespace word split as Arrow kernels: returns
    (flat lowercase words, parent doc indices, keep mask, per-doc
    word counts) — the same tokens ``_WORD_SPLIT_RE.findall`` yields
    per row, with no per-row Python.  The 4 non-space ASCII ws chars
    are normalized to spaces with PLAIN replaces and the split is a
    PLAIN single-space split (RE2 ``split_pattern_regex`` measured
    ~7x slower); runs of whitespace then yield empty fragments,
    filtered by the keep mask."""
    for ch in ("\t", "\n", "\f", "\r"):
        col = pc.replace_substring(col, pattern=ch, replacement=" ")
    lists = pc.split_pattern(col, pattern=" ")
    flat = pc.list_flatten(lists)
    parent = pc.list_parent_indices(lists).to_numpy(
        zero_copy_only=False
    )
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat_low = pc.utf8_lower(flat)
    n_words = np.bincount(parent[keep], minlength=n_docs).astype(
        np.int64
    )
    return flat_low, parent, keep, n_words


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    C4/Gopher-style cheap filters: mean word length, punctuation
    ratio, stopword hit ratio -> a [0,1] composite.  Every operation
    (ASCII tokenization, float64 ratios, half-up rounding) mirrors the
    DuckDB oracle exactly, so q_quality is hash-checked.  All counting
    runs as Arrow RE2 / is_in kernels + numpy bincounts — no per-row
    Python regex on the corpus path."""
    import numpy as np

    n = len(batch)
    col = pc.fill_null(pa.array(batch["text"], pa.string()), "")
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    flat_low, parent, keep, n_words = _split_words(col, n)
    nw1 = np.maximum(n_words, 1).astype(np.float64)
    mean_word_len = _half_up(n_chars / nw1, 3)
    punct = (
        pc.count_substring_regex(
            col, rf"[^A-Za-z0-9_{_WS_CLASS}]"
        )
        .to_numpy(zero_copy_only=False)
        .astype(np.float64)
    )
    punct_ratio = _half_up(punct / np.maximum(n_chars, 1.0), 4)
    is_stop = pc.is_in(
        flat_low, value_set=_ALL_STOP_ARR
    ).to_numpy(zero_copy_only=False)
    n_stop = np.bincount(
        parent[keep & is_stop], minlength=n
    ).astype(np.float64)
    stop_ratio = _half_up(n_stop / nw1, 4)
    score = _half_up(
        (np.minimum(n_words, 200) / 200.0) * 0.4
        + (1 - np.minimum(punct_ratio, 1.0)) * 0.2
        + np.minimum(stop_ratio, 0.5) * 2 * 0.4,
        4,
    )
    out = batch[["doc_id"]].copy()
    out["n_words"] = n_words
    out["mean_word_len"] = mean_word_len
    out["punct_ratio"] = punct_ratio
    out["stopword_ratio"] = stop_ratio
    out["quality"] = score
    return out


class LangId:
    """Stopword/character n-gram language-ID heuristic (actor pool:
    stopword value sets built once per actor).  Fully vectorized:
    Arrow split/is_in kernels + numpy bincount argmax over the
    first 200 words of each doc — no per-row Python.  Tie order is
    the STOPWORDS dict order (en first), matching the CASE-cascade
    oracle; zero hits -> "und"; any CJK char -> "zh"."""

    def __init__(self):
        self.langs = list(STOPWORDS)
        self.sets = [
            pa.array(sorted(STOPWORDS[lang]), pa.string())
            for lang in self.langs
        ]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        col = pc.fill_null(pa.array(batch["text"], pa.string()), "")
        flat_low, parent, keep, _nw = _split_words(col, n)
        # first-200-words cap: word ordinal within doc among kept
        # tokens (parent is nondecreasing, so starts come from
        # bincount offsets)
        kept_parent = parent[keep]
        counts = np.bincount(kept_parent, minlength=n)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        ordinal = (
            np.arange(len(kept_parent), dtype=np.int64)
            - starts[kept_parent]
        )
        in_cap = ordinal < 200
        cap_parent = kept_parent[in_cap]
        # filter in Arrow (no object-array round trip): project the
        # capped-token mask back onto the full flat index space
        mask_full = np.zeros(len(parent), dtype=bool)
        mask_full[np.flatnonzero(keep)[in_cap]] = True
        capped = pc.filter(flat_low, pa.array(mask_full))
        hits = np.zeros((len(self.langs), n), dtype=np.int64)
        for i, vs in enumerate(self.sets):
            m = pc.is_in(capped, value_set=vs).to_numpy(
                zero_copy_only=False
            )
            hits[i] = np.bincount(cap_parent[m], minlength=n)
        best = np.argmax(hits, axis=0)  # first max wins = dict order
        pred = np.asarray(self.langs, dtype=object)[best]
        pred[hits.max(axis=0) == 0] = "und"
        is_zh = pc.match_substring_regex(col, r"[一-鿿]").to_numpy(
            zero_copy_only=False
        )
        pred[is_zh] = "zh"
        pred[np.asarray(pc.utf8_length(col)) == 0] = "und"
        out = batch[["doc_id"]].copy()
        out["lang_pred"] = pred
        return out


def repetition_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Gopher-style repetition signals per document.

    ``dup_word_frac``  = 1 - distinct/total words (how much of the doc
    is re-used vocabulary), ``top_word_frac`` = occurrences of the most
    frequent word / total words, ``top_bigram_frac`` = occurrences of
    the most frequent word bigram / total bigram slots.  High values
    flag template/boilerplate docs for curation filters.

    Tokenization (lowercase, ASCII-whitespace split, empties dropped)
    and half-up rounding mirror the DuckDB oracle exactly, so
    q_repetition is hash-checked.  Fully vectorized: one explode +
    groupby per batch, cross-doc bigrams masked at doc boundaries —
    no per-document Python loop.
    """
    import numpy as np

    n = len(batch)
    col = pc.fill_null(pa.array(batch["text"], pa.string()), "")
    flat_low, parent, keep, n_words = _split_words(col, n)
    total = int(n_words.sum())
    dup_frac = np.zeros(n, dtype=np.float64)
    top_word = np.zeros(n, dtype=np.float64)
    top_bigram = np.zeros(n, dtype=np.float64)
    if total:
        doc_idx = parent[keep]
        all_words = flat_low.to_numpy(zero_copy_only=False)[keep]
        ex = pd.DataFrame({"i": doc_idx, "w": all_words})
        wc = ex.groupby(["i", "w"], sort=False).size()
        per_doc = wc.groupby(level="i")
        distinct = per_doc.size()
        top_c = per_doc.max()
        idx = distinct.index.to_numpy()
        nw = n_words[idx].astype(np.float64)
        dup_frac[idx] = 1.0 - distinct.to_numpy() / nw
        top_word[idx] = top_c.to_numpy() / nw
        # bigrams: adjacent pairs within a doc (mask doc boundaries)
        same = doc_idx[:-1] == doc_idx[1:]
        if same.any():
            bg = pd.DataFrame(
                {
                    "i": doc_idx[:-1][same],
                    "b": all_words[:-1][same] + " " + all_words[1:][same],
                }
            )
            bc = bg.groupby(["i", "b"], sort=False).size()
            top_bc = bc.groupby(level="i").max()
            bidx = top_bc.index.to_numpy()
            top_bigram[bidx] = top_bc.to_numpy() / (
                n_words[bidx].astype(np.float64) - 1.0
            )
    out = batch[["doc_id"]].copy()
    out["n_words"] = n_words
    out["dup_word_frac"] = _half_up(dup_frac, 4)
    out["top_word_frac"] = _half_up(top_word, 4)
    out["top_bigram_frac"] = _half_up(top_bigram, 4)
    return out


# RE2 patterns shared verbatim with the DuckDB oracle (both engines
# are RE2, so match spans are identical).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """Redact emails/phone numbers; emit per-doc counts + a scrubbed-
    text digest.

    The testdata corpus carries no contact strings, so the op appends
    a deterministic synthetic contact line derived from doc_id (the
    oracle appends the identical line in SQL) — the regex count and
    replace kernels therefore run against real matches, and the md5
    digest hash-checks the byte-exact redacted output.  Counting and
    replacing are Arrow RE2 kernels; only the md5 is per-row (cheap,
    and the oracle contract is md5-per-row)."""
    ids = batch.column("doc_id").to_pylist()
    base = pc.fill_null(batch.column("text"), "")
    contact = pa.array(
        [
            f" contact: user{i}@example.com or +1-555-{i % 10000:04d}"
            for i in ids
        ],
        pa.string(),
    )
    text = pc.binary_join_element_wise(base, contact, "")
    n_email = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
    n_phone = pc.cast(pc.count_substring_regex(text, PHONE_RE), pa.int64())
    scrubbed = pc.replace_substring_regex(
        pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    digests = [
        hashlib.md5(s.encode()).hexdigest() for s in scrubbed.to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_emails": n_email,
            "n_phones": n_phone,
            "scrubbed_md5": pa.array(digests, pa.string()),
        }
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Deterministic document fingerprints: md5 of normalized text
    (SQL-oracle-able) + a 64-bit rolling hash (Karp-Rabin over words)."""
    texts = batch.column("text").to_pylist()
    md5s, rollings = [], []
    for t in texts:
        t = t or ""
        norm = " ".join(t.split()).lower()
        md5s.append(hashlib.md5(norm.encode()).hexdigest())
        h = 0
        for w in norm.split():
            # crc32, not hash(): Python string hashing is salted per
            # process and would break cross-worker determinism.
            h = (h * 1000003 + zlib.crc32(w.encode())) % (1 << 61)
        rollings.append(h)
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint_md5": pa.array(md5s, pa.string()),
            "fingerprint_rolling": pa.array(rollings, pa.int64()),
        }
    )


_WS_SPLIT_RE = re.compile(r"[ \t\n\f\r]+")


def bm25_topk(ds, terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75):
    """Top-k documents for a bag-of-terms query under BM25 (Lucene
    idf: ``ln((N - df + 0.5) / (df + 0.5) + 1)``).

    ONE pass over the text: each batch tokenizes once and emits a
    compact per-doc row (doc_id, dl, tf per query term) — the corpus
    payload never crosses a shuffle again.  Corpus stats (N, sum dl,
    per-term df) fold from tiny per-batch partials on the driver;
    scoring is a second vectorized pass over the COMPACT table with
    the stats in the task closure (a handful of floats), and top-k
    merges per-batch partial top-ks.  Scores are half-up rounded to
    6 decimals before ranking so ties break identically in SQL.

    ``ds``: (doc_id, text).  Returns a pandas DataFrame
    (doc_id, bm25) of the k best, score-desc then doc_id.
    """
    import numpy as np

    terms = list(terms)

    def compact(batch: pd.DataFrame) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        dl = np.zeros(len(ids), np.int64)
        tf = {t: np.zeros(len(ids), np.int64) for t in terms}
        for i, text in enumerate(batch["text"]):
            ws = [
                w for w in _WS_SPLIT_RE.split((text or "").lower()) if w
            ]
            dl[i] = len(ws)
            for w in ws:
                if w in tf:
                    tf[w][i] += 1
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "dl": pa.array(dl, pa.int64()),
        }
        for j, t in enumerate(terms):
            cols[f"tf{j}"] = pa.array(tf[t], pa.int64())
        return pa.table(cols)

    compacted = ds.map_batches(
        compact, batch_format="pandas"
    ).materialize()

    def stats_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        row = {
            "n": pa.array([batch.num_rows], pa.int64()),
            "sum_dl": pa.array(
                [_pc.sum(batch.column("dl")).as_py() or 0], pa.int64()
            ),
        }
        for j in range(len(terms)):
            df_j = _pc.sum(
                _pc.cast(
                    _pc.greater(batch.column(f"tf{j}"), 0), pa.int64()
                )
            ).as_py() or 0
            row[f"df{j}"] = pa.array([df_j], pa.int64())
        return pa.table(row)

    st = (
        compacted.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )  # one tiny row per block reaches the driver
    n_docs, avgdl = int(st["n"]), st["sum_dl"] / max(int(st["n"]), 1)
    idf = np.array(
        [
            np.log((n_docs - st[f"df{j}"] + 0.5)
                   / (st[f"df{j}"] + 0.5) + 1.0)
            for j in range(len(terms))
        ]
    )

    def score_topk(batch: pd.DataFrame) -> pd.DataFrame:
        dl = batch["dl"].to_numpy(dtype=np.float64)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        s = np.zeros(len(batch), np.float64)
        for j in range(len(terms)):
            tf = batch[f"tf{j}"].to_numpy(dtype=np.float64)
            s += idf[j] * tf * (k1 + 1.0) / (tf + norm)
        s = np.floor(s * 1e6 + 0.5) / 1e6  # half-up, 6 decimals
        out = pd.DataFrame(
            {"doc_id": batch["doc_id"].to_numpy(), "bm25": s}
        )
        out = out[out["bm25"] > 0]
        return out.sort_values(
            ["bm25", "doc_id"], ascending=[False, True]
        ).head(k)

    parts = compacted.map_batches(
        score_topk, batch_format="pandas"
    ).to_pandas()  # <= k rows per block reach the driver
    return (
        parts.sort_values(["bm25", "doc_id"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def char_entropy_batch(batch: pd.DataFrame) -> pa.Table:
    """Shannon entropy (bits/char) of each document's character
    distribution — the classic low-diversity / mojibake pretraining
    filter signal.  Computed over UTF-8 bytes (== characters for the
    ASCII corpus; the SQL twin unnests characters).  Empty/null text
    scores 0.  Half-up rounded to 6 decimals to match the twin."""
    import numpy as np

    ids = batch["doc_id"].to_numpy()
    ent = np.zeros(len(ids), np.float64)
    for i, text in enumerate(batch["text"]):
        b = np.frombuffer((text or "").encode(), dtype=np.uint8)
        if len(b) == 0:
            continue
        counts = np.bincount(b)
        p = counts[counts > 0] / len(b)
        ent[i] = -(p * np.log2(p)).sum()
    ent = np.floor(ent * 1e6 + 0.5) / 1e6
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "entropy": pa.array(ent, pa.float64()),
        }
    )


def pmi_collocations(ds, column: str = "text", min_count: int = 5,
                     top_k: int = 20) -> pd.DataFrame:
    """Collocation discovery by pointwise mutual information:
    pmi(w1, w2) = ln( (c12 / N_bg) / ((c1 / N_u) * (c2 / N_u)) ),
    computed as one exact-integer ratio (c12 * N_u^2) / (N_bg * c1 * c2)
    so a SQL twin hash-matches at round(6).  ``min_count`` prunes the
    long tail BEFORE the degree joins (classic PMI-sparsity guard —
    a 1-count bigram of two 1-count words otherwise tops every list).

    Distributed shape: per-batch Counter partials for bigrams and
    unigrams (the combiner — one (gram, n) row per distinct gram per
    batch crosses the shuffle, never text), ``bucketed_aggregate``
    folds to vocabulary-sized tables, frequency filter, then two
    ``bucketed_hash_join`` passes attach word counts; totals fold
    from the count tables' own partial sums.  Top-k closes with
    per-block partials.

    Integer-exactness contract: c12 * N_u^2 and N_bg * c1 * c2 must
    stay below 2^53 for the float ratio to be exact — holds through
    ~10^8-token corpora per PMI shard; shard by language/source above
    that.
    """
    from collections import Counter

    from unfurl_ray.ops.relational import (
        _arrow, bucketed_aggregate, bucketed_hash_join,
    )

    def partial(batch: pa.Table) -> pa.Table:
        bg: Counter = Counter()
        uni: Counter = Counter()
        for text in batch.column(column).to_pylist():
            ws = [w for w in _WS_SPLIT_RE.split((text or "").lower())
                  if w]
            uni.update(ws)
            bg.update(zip(ws, ws[1:]))
        w1 = [a for a, _ in bg] + [w for w in uni]
        w2 = [b for _, b in bg] + ["" for _ in uni]
        n = [v for v in bg.values()] + [v for v in uni.values()]
        kind = [0] * len(bg) + [1] * len(uni)
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "n": pa.array(n, pa.int64()),
                "kind": pa.array(kind, pa.int8()),
            }
        )

    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["w1", "w2", "kind"], {"n": ("n", "sum")},
    ).materialize()

    import pyarrow.compute as pc

    def only(kind: int):
        def f(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t.column("kind"), kind))
        return f

    bigrams = counts.map_batches(only(0), batch_format="pyarrow")
    unigrams = counts.map_batches(only(1), batch_format="pyarrow")

    totals = {
        int(r["kind"]): int(r["n"])
        for r in counts.groupby("kind").sum("n").to_pandas().rename(
            columns={"sum(n)": "n"}
        ).to_dict("records")
    }
    n_bg, n_u = totals.get(0, 0), totals.get(1, 0)

    def freq_filter(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.greater_equal(t.column("n"), min_count)
        ).select(["w1", "w2", "n"])

    def as_c1(t: pa.Table) -> pa.Table:
        return pa.table(
            {"w1": t.column("w1"), "c1": t.column("n")}
        )

    def as_c2(t: pa.Table) -> pa.Table:
        return pa.table(
            {"w2": t.column("w1"), "c2": t.column("n")}
        )

    strong = bigrams.map_batches(freq_filter, batch_format="pyarrow")
    uni_mat = unigrams.materialize()
    j1 = bucketed_hash_join(
        strong, uni_mat.map_batches(as_c1, batch_format="pyarrow"),
        on="w1", right_on="w1",
    )
    j2 = bucketed_hash_join(
        j1, uni_mat.map_batches(as_c2, batch_format="pyarrow"),
        on="w2", right_on="w2",
    )

    def block_topk(batch: pd.DataFrame) -> pa.Table:
        c12 = batch["n"].to_numpy(np.int64)
        c1 = batch["c1"].to_numpy(np.int64)
        c2 = batch["c2"].to_numpy(np.int64)
        num = c12.astype(np.float64) * float(n_u) * float(n_u)
        den = float(n_bg) * c1.astype(np.float64) * c2.astype(
            np.float64
        )
        out = pd.DataFrame(
            {
                "w1": batch["w1"],
                "w2": batch["w2"],
                "n": c12,
                "pmi": np.log(num / den),
            }
        )
        out = out.sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True]
        ).head(top_k)
        return _arrow(out)

    best = j2.map_batches(
        block_topk, batch_format="pandas"
    ).to_pandas()
    return (
        best.sort_values(
            ["pmi", "w1", "w2"], ascending=[False, True, True]
        )
        .head(top_k)
        .reset_index(drop=True)
    )


def feature_hash_tf(ds, column: str = "text",
                    id_column: str = "doc_id",
                    n_buckets: int = 256):
    """The hashing trick: term-frequency vectors in a fixed
    ``n_buckets``-dim space, bucket = md5(token) first 8 hex digits
    mod n_buckets — md5, not Python hash(), so the featurization is
    deterministic across runs/workers AND SQL-twin-checkable (the
    same '0x' || substr(md5(tok), 1, 8) idiom as the fingerprint
    ops).  Emits sparse (doc_id, bucket, tf) rows; no vocabulary is
    ever built or shipped — the whole point of feature hashing at
    100 TB.

    Per-batch only (no shuffle): tokenize, hash with one Counter per
    doc, emit.  Downstream fits consume the sparse rows directly.
    """
    import hashlib
    from collections import Counter

    def featurize(batch: pa.Table) -> pa.Table:
        ids, buckets, tfs = [], [], []
        for doc_id, text in zip(
            batch.column(id_column).to_pylist(),
            batch.column(column).to_pylist(),
        ):
            ws = [w for w in _WS_SPLIT_RE.split((text or "").lower())
                  if w]
            c: Counter = Counter(
                int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                % n_buckets
                for w in ws
            )
            ids.extend([doc_id] * len(c))
            buckets.extend(c.keys())
            tfs.extend(c.values())
        return pa.table(
            {
                id_column: pa.array(ids, pa.int64()),
                "bucket": pa.array(buckets, pa.int64()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    return ds.map_batches(featurize, batch_format="pyarrow")


def g2_keyness(ds, column: str, group_col: str, group_a: str,
               min_count: int = 10, top_k: int = 20) -> pd.DataFrame:
    """Corpus keyness by log-likelihood ratio (Dunning's G2): which
    terms distinguish sub-corpus A (``group_col == group_a``) from
    the rest.  G2 = 2 * (a*ln(a/E1) + b*ln(b/E2)) with expected
    counts E_i = c_i * (a+b) / (c1+c2); zero-count sides contribute 0
    (the x*ln(x) -> 0 limit).  All count inputs are exact integers —
    E_i is a float ratio of exact ints — so a SQL twin hash-matches
    at round(6).

    Distributed shape: per-batch (term, side) Counter partials,
    ``bucketed_aggregate`` to the vocabulary-sized count table,
    per-bucket pivot + vectorized G2 with the two corpus totals as
    broadcast scalars, per-block top-k close.
    """
    from unfurl_ray.ops.relational import _arrow, bucketed_aggregate

    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        ca: Counter = Counter()
        cb: Counter = Counter()
        for text, grp in zip(
            batch.column(column).to_pylist(),
            batch.column(group_col).to_pylist(),
        ):
            ws = [w for w in _WS_SPLIT_RE.split((text or "").lower())
                  if w]
            (ca if grp == group_a else cb).update(ws)
        terms = list(ca.keys()) + list(cb.keys())
        sides = [0] * len(ca) + [1] * len(cb)
        ns = list(ca.values()) + list(cb.values())
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "side": pa.array(sides, pa.int8()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    counts = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["term", "side"], {"n": ("n", "sum")},
    ).materialize()

    totals = counts.groupby("side").sum("n").to_pandas()
    tot = dict(
        zip(totals["side"].astype(int), totals["sum(n)"].astype(int))
    )
    c1, c2 = tot.get(0, 0), tot.get(1, 0)

    def bucket(batch: pd.DataFrame) -> pa.Table:
        batch["_bucket"] = (
            pd.util.hash_pandas_object(batch["term"], index=False)
            .to_numpy() % np.uint64(64)
        ).astype(np.int64)
        return _arrow(batch)

    def g2_in_bucket(group: pd.DataFrame) -> pa.Table:
        piv = group.pivot_table(
            index="term", columns="side", values="n",
            aggfunc="sum", fill_value=0,
        )
        a = piv[0].to_numpy(np.int64) if 0 in piv else np.zeros(
            len(piv), dtype=np.int64
        )
        b = piv[1].to_numpy(np.int64) if 1 in piv else np.zeros(
            len(piv), dtype=np.int64
        )
        keep = (a + b) >= min_count
        a, b = a[keep], b[keep]
        terms = piv.index.to_numpy()[keep]
        e1 = c1 * (a + b).astype(np.float64) / float(c1 + c2)
        e2 = c2 * (a + b).astype(np.float64) / float(c1 + c2)
        with np.errstate(divide="ignore", invalid="ignore"):
            ta = np.where(a > 0, a * np.log(a / e1), 0.0)
            tb = np.where(b > 0, b * np.log(b / e2), 0.0)
        g2 = 2.0 * (ta + tb)
        out = pd.DataFrame(
            {"term": terms, "a": a, "b": b, "g2": g2}
        ).sort_values(["g2", "term"], ascending=[False, True]).head(
            top_k
        )
        return _arrow(out)

    best = (
        counts.map_batches(bucket, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(g2_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    return (
        best.sort_values(["g2", "term"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )


def compress_ratio_batch(batch: pa.Table, level: int = 6) -> pa.Table:
    """zlib compression ratio per document — the classic cheap
    redundancy signal (boilerplate/template docs compress far below
    prose; near-random noise compresses above it).  Pure map, no
    shuffle; zlib is C, so the per-doc loop is IO-shaped, like the
    md5 fingerprint loops.  Deterministic for a fixed level.

    Output: (doc_id, n_chars, n_compressed, ratio).
    """
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    nc, nz = [], []
    for t in texts:
        raw = (t or "").encode("utf-8")
        nc.append(len(raw))
        nz.append(len(zlib.compress(raw, level)))
    nc_a = np.array(nc, dtype=np.int64)
    nz_a = np.array(nz, dtype=np.int64)
    ratio = np.round(nz_a / np.maximum(nc_a, 1), 6)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_chars": pa.array(nc_a, pa.int64()),
            "n_compressed": pa.array(nz_a, pa.int64()),
            "ratio": pa.array(ratio, pa.float64()),
        }
    )


def hash_negatives(ds, k: int = 4, id_column: str = "doc_id"):
    """Deterministic negative sampling for contrastive pairs: each
    anchor gets ``k`` pseudo-random corpus negatives via the md5
    idiom (hash of "id-i" mod corpus size; self-collisions step to
    the next id) — reproducible across runs and cluster sizes, unlike
    RNG sampling, and SQL-twinned like the other md5 ops.

    Corpus-size scalar folds from per-batch counts; the sample
    itself is a pure map.  Requires dense ids 0..N-1 (the synthetic
    corpus contract; remap first otherwise).

    Output: (id, neg_rank, neg_id).
    """
    import hashlib

    ds = ds.materialize()
    n = ds.count()

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_column).to_pylist()
        out_id, out_r, out_n = [], [], []
        for doc_id in ids:
            for i in range(k):
                h = int(
                    hashlib.md5(
                        f"{doc_id}-{i}".encode()
                    ).hexdigest()[:8],
                    16,
                ) % n
                if h == doc_id:
                    h = (h + 1) % n
                out_id.append(doc_id)
                out_r.append(i)
                out_n.append(h)
        return pa.table(
            {
                id_column: pa.array(out_id, pa.int64()),
                "neg_rank": pa.array(out_r, pa.int64()),
                "neg_id": pa.array(out_n, pa.int64()),
            }
        )

    return ds.select_columns([id_column]).map_batches(
        sample, batch_format="pyarrow"
    )
