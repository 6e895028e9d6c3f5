"""Text-analysis operators over a documents table.

All vectorized ``map_batches`` stages (pandas/numpy kernels, compiled
regexes at module scope — loaded once per worker).  Each has a
``queries()`` entry; the SQL-expressible ones (token counts,
fingerprints) have DuckDB oracles, the heuristic ones (language-ID,
quality) are rows-only checks.
"""

from __future__ import annotations

import hashlib
import re
import zlib

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


def quality_score_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / punctuation / stopword-ratio quality features + score.

    C4/Gopher-style cheap filters: mean word length, punctuation ratio,
    stopword hit ratio, all-caps ratio -> a [0,1] composite.
    """
    texts = batch["text"].fillna("")
    n_chars = texts.str.len()
    words = texts.str.split()
    n_words = words.map(len)
    mean_word_len = (n_chars / n_words.clip(lower=1)).round(3)
    punct = texts.map(lambda t: len(_PUNCT_RE.findall(t)))
    punct_ratio = (punct / n_chars.clip(lower=1)).round(4)
    all_stop = set().union(*STOPWORDS.values())
    stop_ratio = words.map(
        lambda ws: round(
            sum(1 for w in ws if w.lower() in all_stop) / max(1, len(ws)), 4
        )
    )
    score = (
        (n_words.clip(0, 200) / 200) * 0.4
        + (1 - punct_ratio.clip(0, 1)) * 0.2
        + stop_ratio.clip(0, 0.5) * 2 * 0.4
    ).round(4)
    out = batch[["doc_id"]].copy()
    out["n_words"] = n_words.astype("int64")
    out["mean_word_len"] = mean_word_len
    out["punct_ratio"] = punct_ratio
    out["stopword_ratio"] = stop_ratio
    out["quality"] = score
    return out


class LangId:
    """Stopword/character n-gram language-ID heuristic (actor pool:
    tables compiled once per actor)."""

    def __init__(self):
        self.langs = list(STOPWORDS)
        self.tables = {k: v for k, v in STOPWORDS.items()}
        self.zh_re = re.compile(r"[一-鿿]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def classify(text: str) -> str:
            if not text:
                return "und"
            if self.zh_re.search(text):
                return "zh"
            words = [w.lower() for w in text.split()[:200]]
            best, best_hits = "en", -1
            for lang, stops in self.tables.items():
                hits = sum(1 for w in words if w in stops)
                if hits > best_hits:
                    best, best_hits = lang, hits
            return best if best_hits > 0 else "und"

        out = batch[["doc_id"]].copy()
        out["lang_pred"] = batch["text"].fillna("").map(classify)
        return out


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
