"""Deterministic distributed sampling operators.

Both operators replace ``Dataset.random_sample`` where training-data
pipelines need reproducibility: the "randomness" is an md5 of the row
id, so the same corpus yields the same sample on any cluster size, any
block layout, any run — and a DuckDB window-function twin can verify
the selection row for row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _unit_hash(ids) -> np.ndarray:
    """Deterministic u in (0, 1): first 8 md5 hex digits of str(id),
    shifted off 0 — the same expression the SQL twin uses:
    (CAST('0x' || substr(md5(id), 1, 8) AS UBIGINT) + 1) / (2^32 + 1).
    """
    vals = np.fromiter(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
         for i in ids),
        dtype=np.float64, count=len(ids),
    )
    return (vals + 1.0) / 4294967297.0


def weighted_sample_per_group(ds, key_col: str, id_col: str,
                              weight_col: str, k: int):
    """Weighted sample WITHOUT replacement, k rows per group —
    Efraimidis–Spirakis A-ES: the k largest ``ln(u) / w`` keys are
    distributed exactly as sequential weighted draws without
    replacement (u uniform in (0,1); here the deterministic id hash).

    Distributed shape: the sort key is computed per batch (stateless
    map), then ``topk_per_group`` keeps k rows per group per BATCH
    before the driver's tiny final merge — no shuffle of the corpus,
    no per-group materialization.  Key rounded to 9 decimals with an
    id tiebreak so numpy's log and DuckDB's ln can't disagree on
    selection order.
    """
    from unfurl_ray.ops.relational import topk_per_group

    def add_key(batch: pd.DataFrame) -> pd.DataFrame:
        u = _unit_hash(batch[id_col].to_numpy())
        w = batch[weight_col].to_numpy().astype(np.float64)
        if (w <= 0).any():
            # A-ES is defined only for w > 0: a negative weight would
            # silently TOP-rank its row; zero divides.  Fail loudly.
            bad = int((w <= 0).sum())
            raise ValueError(
                f"weighted_sample_per_group: {bad} row(s) with "
                f"non-positive {weight_col}; filter or clip first"
            )
        batch = batch.copy()
        batch["skey"] = np.round(np.log(u) / w, 9)
        return batch

    keyed = ds.map_batches(add_key, batch_format="pandas")
    return topk_per_group(
        keyed, key_col=key_col, order_col="skey", k=k,
        tiebreak_col=id_col,
    )


def mixture_sample(ds, key_col: str, id_col: str,
                   target_weights: dict[str, float], total: int):
    """Resample a corpus toward a target domain mixture: domain d gets
    ``round(total * target_weights[d])`` slots, filled by md5-rank —
    the op behind "train on 30 % web, 20 % code, ..." curation.

    Unlisted domains get zero slots.  Per-batch partial top-k (bounded
    by the largest quota) prunes before the driver merge, so the
    driver sees O(quota x batches) rows, never the corpus.
    """
    from unfurl_ray.ops.relational import topk_per_group

    quotas = {
        d: int(round(total * frac)) for d, frac in target_weights.items()
    }
    max_k = max(quotas.values(), default=0)

    def add_rank(batch: pa.Table) -> pa.Table:
        # Arrow in/out, typed even when the domain filter empties the
        # batch — empty object-dtype pandas blocks break Ray's block
        # size estimator and spam every task's log
        batch = batch.filter(
            pc.is_in(batch.column(key_col),
                     value_set=pa.array(list(quotas), pa.string()))
        )
        hs = [
            hashlib.md5(str(i).encode()).hexdigest()
            for i in batch.column(id_col).to_pylist()
        ]
        # topk_per_group keeps the LARGEST order_col; md5-rank selection
        # wants the smallest hashes, so rank on the hex complement
        return batch.append_column(
            "h", pa.array(hs, pa.string())
        ).append_column(
            "hneg", pa.array([_hex_complement(h) for h in hs], pa.string())
        )

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    top = topk_per_group(
        ranked, key_col=key_col, order_col="hneg", k=max_k,
        tiebreak_col=id_col,
    )
    out = (
        top.sort_values([key_col, "h"])
        .groupby(key_col, group_keys=False)
        .apply(lambda g: g.head(quotas[g[key_col].iloc[0]]))
        .reset_index(drop=True)
    )
    return out.drop(columns=["hneg"])


def _hex_complement(h: str) -> str:
    """15 - digit, per hex digit: maps ascending md5 order onto the
    descending order topk_per_group implements."""
    return format((1 << 128) - 1 - int(h, 16), "032x")


def group_split(ds, group_col: str, splits: list[tuple[str, int]],
                n_slots: int = 100):
    """Leakage-safe train/val/test assignment: every row of a GROUP
    (conversation, source domain, user) lands in the same split, so
    near-identical rows can never straddle the train/eval boundary.
    ``splits`` = [(label, n_slots_for_label), ...] summing to
    ``n_slots``; assignment is the same multiplicative uint64 hash as
    q_hash_sample (SQL twin: HUGEINT math), a pure per-row function —
    embarrassingly parallel, no shuffle, reproducible across runs and
    cluster sizes.
    """
    assert sum(n for _l, n in splits) == n_slots
    labels = np.empty(n_slots, dtype=object)
    i = 0
    for label, n in splits:
        labels[i:i + n] = label
        i += n

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[group_col].to_numpy()
        with np.errstate(over="ignore"):
            slot = (
                g.astype(np.uint64) * np.uint64(2654435761)
            ) % np.uint64(n_slots)
        batch["split"] = labels[slot.astype(np.int64)]
        return batch

    return ds.map_batches(assign, batch_format="pandas")
