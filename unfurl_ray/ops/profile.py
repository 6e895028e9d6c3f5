"""Table profiling — the ANALYZE pass a catalog runs before planning.

One projected read, two exchanges:

* scalar stats (count, nulls, native min/max, string-repr length sum)
  collapse per batch to ONE row per column — the shuffle carries
  #columns rows per batch, never data;
* exact distinct counts ride the distinct-(column, value) pair
  shuffle (the ``distinct_count_by`` shape): per-batch unique pairs
  -> bucketed count — the exchange is bounded by distinct values, not
  rows.

Min/max compare NATIVE values (numeric order for numbers,
lexicographic for strings) both inside each batch and in the driver
fold, so '10' < '9' lexicographic traps can't bite; only the final
report row stringifies.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def profile_table(ds, columns: list[str],
                  ndigits: int = 4) -> pd.DataFrame:
    """Per-column profile of ``ds``: (col, n, n_null, n_distinct,
    min_s, max_s, avg_len).  ``avg_len`` is the mean length of the
    value's string representation (NULLs excluded).  Note: integer
    and string columns stringify identically to SQL VARCHAR casts;
    float repr may differ from a SQL engine's formatting."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    ds = ds.materialize()

    def scalar_partial(batch: pd.DataFrame) -> pa.Table:
        rows = []
        for c in columns:
            col = batch[c]
            valid = col.dropna()
            s = valid.astype(str)
            numeric = pd.api.types.is_numeric_dtype(col)
            rows.append(
                (
                    c,
                    len(col),
                    int(col.isna().sum()),
                    valid.min() if len(valid) else None,
                    valid.max() if len(valid) else None,
                    int(s.str.len().sum()),
                    numeric,
                )
            )
        return pa.table(
            {
                "col": pa.array([r[0] for r in rows], pa.string()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "n_null": pa.array([r[2] for r in rows], pa.int64()),
                "min_s": pa.array(
                    [None if r[3] is None else str(r[3]) for r in rows],
                    pa.string(),
                ),
                "max_s": pa.array(
                    [None if r[4] is None else str(r[4]) for r in rows],
                    pa.string(),
                ),
                "len_sum": pa.array([r[5] for r in rows], pa.int64()),
                "numeric": pa.array([r[6] for r in rows], pa.bool_()),
            }
        )

    scal = (
        ds.map_batches(scalar_partial, batch_format="pandas")
        .to_pandas()
    )
    # per-batch partials are tiny (#columns rows each); fold on the
    # driver with NATIVE comparisons per column kind
    out = []
    for c, g in scal.groupby("col"):
        numeric = bool(g["numeric"].iloc[0])
        mins = g["min_s"].dropna()
        maxs = g["max_s"].dropna()
        if numeric:
            mn = (
                None if mins.empty
                else mins.iloc[
                    int(np.argmin(mins.astype(np.float64).to_numpy()))
                ]
            )
            mx = (
                None if maxs.empty
                else maxs.iloc[
                    int(np.argmax(maxs.astype(np.float64).to_numpy()))
                ]
            )
        else:
            mn = None if mins.empty else mins.min()
            mx = None if maxs.empty else maxs.max()
        out.append(
            {
                "col": c,
                "n": int(g["n"].sum()),
                "n_null": int(g["n_null"].sum()),
                "min_s": mn,
                "max_s": mx,
                "len_sum": int(g["len_sum"].sum()),
            }
        )
    prof = pd.DataFrame(out)

    def pair_partial(batch: pd.DataFrame) -> pa.Table:
        cols, vals = [], []
        for c in columns:
            u = batch[c].dropna().astype(str).unique()
            cols.append(np.full(len(u), c, dtype=object))
            vals.append(u)
        return pa.table(
            {
                "col": pa.array(
                    np.concatenate(cols), pa.string()
                ),
                "value": pa.array(
                    np.concatenate(vals), pa.string()
                ),
            }
        )

    pairs = bucketed_aggregate(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["col", "value"], {"_c": ("value", "count")},
    )
    dist = bucketed_aggregate(
        pairs, ["col"], {"n_distinct": ("value", "count")},
        n_buckets=8,
    ).to_pandas()

    prof = prof.merge(dist, on="col", how="left")
    prof["n_distinct"] = prof["n_distinct"].fillna(0).astype("int64")
    denom = (prof["n"] - prof["n_null"]).replace(0, np.nan)
    prof["avg_len"] = (prof["len_sum"] / denom).round(ndigits)
    return (
        prof[
            [
                "col", "n", "n_null", "n_distinct", "min_s",
                "max_s", "avg_len",
            ]
        ]
        .sort_values("col")
        .reset_index(drop=True)
    )


def corr_matrix(ds, columns: list[str], ndigits: int = 6) -> pd.DataFrame:
    """Pairwise Pearson correlation over ``columns`` in ONE projected
    pass: each batch collapses to (n, mean vector, centered co-moment
    matrix) — a p + p*p float payload regardless of batch size — and
    the driver folds the per-batch partials with Chan's pairwise
    update (Chan, Golub & LeVeque 1983), the numerically stable
    parallel form (raw Σx² moments cancel catastrophically at
    10^12-row scale; centered co-moments don't).  The shuffle-free
    shape: the only exchange is #batches tiny rows to the driver.

    Output: (col_a, col_b, corr) for col_a < col_b in column-list
    order, half-up rounded so the DuckDB ``corr()`` twin hashes equal.
    NULLs: rows with any NULL among ``columns`` are dropped (matching
    a SQL twin that filters ``col IS NOT NULL`` conjunctively —
    plain SQL ``corr(x, y)`` is pairwise-null, which differs on
    tables with scattered nulls; the TPC-H lineitem columns have
    none, and the contract is documented here for ones that do)."""
    from unfurl_ray.ops.textstats import _half_up

    p = len(columns)

    def partial(batch: pa.Table) -> pa.Table:
        x = np.column_stack(
            [
                batch.column(c).to_numpy(zero_copy_only=False)
                .astype(np.float64)
                for c in columns
            ]
        )
        x = x[~np.isnan(x).any(axis=1)]
        n = x.shape[0]
        if n == 0:
            mean = np.zeros(p)
            com = np.zeros((p, p))
        else:
            mean = x.mean(axis=0)
            d = x - mean
            com = d.T @ d
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "mean": pa.array([mean.tolist()],
                                 pa.list_(pa.float64())),
                "com": pa.array([com.ravel().tolist()],
                                pa.list_(pa.float64())),
            }
        )

    parts = ds.select_columns(columns).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()

    n_tot, mean_tot, com_tot = 0, np.zeros(p), np.zeros((p, p))
    for _, row in parts.iterrows():
        nb = int(row["n"])
        if nb == 0:
            continue
        mb = np.asarray(row["mean"], dtype=np.float64)
        cb = np.asarray(row["com"], dtype=np.float64).reshape(p, p)
        if n_tot == 0:
            n_tot, mean_tot, com_tot = nb, mb, cb
            continue
        delta = mb - mean_tot
        n_new = n_tot + nb
        com_tot = com_tot + cb + np.outer(delta, delta) * (
            n_tot * nb / n_new
        )
        mean_tot = mean_tot + delta * (nb / n_new)
        n_tot = n_new

    sd = np.sqrt(np.diag(com_tot))
    out_a, out_b, out_r = [], [], []
    for i in range(p):
        for j in range(i + 1, p):
            denom = sd[i] * sd[j]
            r = com_tot[i, j] / denom if denom > 0 else np.nan
            out_a.append(columns[i])
            out_b.append(columns[j])
            out_r.append(float(_half_up(np.float64(r), ndigits)))
    return (
        pd.DataFrame({"col_a": out_a, "col_b": out_b, "corr": out_r})
        .sort_values(["col_a", "col_b"])
        .reset_index(drop=True)
    )


def mutual_information(ds, x_col: str, y_col: str,
                       ndigits: int = 6) -> pd.DataFrame:
    """Mutual information (nats) between two categorical columns, plus
    both marginal entropies — the feature-dependence profile a
    curation pipeline uses to pick stratification keys and catch
    leaky features.

    Everything derives from the JOINT histogram: one pre-aggregated
    (x, y, n) count shuffle (|X| x |Y| rows, never events), then the
    identities ``MI = sum p_xy ln(p_xy / (p_x p_y))``,
    ``H(X) = -sum_xy p_xy ln(p_x)`` (the inner y-sum collapses the
    marginal) finish on the |X| x |Y| table — driver state is the
    joint histogram, which for categorical profiling is tiny by
    construction."""
    from unfurl_ray.ops.relational import pre_aggregate

    joint = pre_aggregate(
        ds, [x_col, y_col], {"n": (x_col, "count")}
    ).to_pandas()
    n = joint["n"].to_numpy(np.float64)
    tot = n.sum()
    nx = joint.groupby(x_col)["n"].transform("sum").to_numpy(np.float64)
    ny = joint.groupby(y_col)["n"].transform("sum").to_numpy(np.float64)
    p = n / tot
    mi = float((p * np.log(n * tot / (nx * ny))).sum())
    h_x = float(-(p * np.log(nx / tot)).sum())
    h_y = float(-(p * np.log(ny / tot)).sum())
    return pd.DataFrame(
        {
            "mi": [round(mi, ndigits)],
            "h_x": [round(h_x, ndigits)],
            "h_y": [round(h_y, ndigits)],
        }
    )
