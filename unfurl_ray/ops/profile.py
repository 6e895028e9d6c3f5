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


def ks_test(ds, value_col: str, group_col: str, group_a: str,
            group_b: str, ndigits: int = 6) -> dict:
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    ``value_col`` distributions of two groups — the distribution-drift
    gate (did this source/snapshot shift?) that KL-over-bins only
    approximates.

    D = max over distinct values v of |ECDF_a(v) - ECDF_b(v)|, exact
    under ties.  Same summary layout as ``roc_auc``: per-batch partial
    (value, n_a, n_b) counts -> one histogram shuffle (one row per
    DISTINCT value), ONE range sort, a #blocks-row head pass giving
    each block its exclusive cumulative (a, b) offsets, then each
    block folds its local max vectorized.  Driver state: O(#blocks)
    heads + per-block candidates; ties on D break to the SMALLEST
    value, matching an ``ORDER BY d DESC, v`` SQL twin.

    Returns ``{"ks_d", "at_value", "n_a", "n_b"}``."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch[group_col]
        keep = g.isin([group_a, group_b])
        v = batch.loc[keep, value_col].astype("float64")
        g = g[keep]
        a = (g == group_a).astype("int64")
        return pd.DataFrame({"v": v, "a": a, "b": 1 - a})

    from unfurl_ray.ops.relational import block_heads

    hist = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["v"], {"n_a": ("a", "sum"), "n_b": ("b", "sum")},
    ).sort("v").materialize()

    heads = block_heads(hist, "v", ["n_a", "n_b"])
    tot_a = int(heads["n_a"].sum())
    tot_b = int(heads["n_b"].sum())
    if tot_a == 0 or tot_b == 0:
        return {"ks_d": float("nan"), "at_value": float("nan"),
                "n_a": tot_a, "n_b": tot_b}
    off_a = np.concatenate(
        [[0], heads["n_a"].to_numpy(np.int64).cumsum()[:-1]]
    )
    off_b = np.concatenate(
        [[0], heads["n_b"].to_numpy(np.int64).cumsum()[:-1]]
    )
    # O(#blocks) offset table: pickles into each task closure — a
    # plain task map skips the actor-pool spin-up entirely
    off = {
        float(v): (int(oa), int(ob))
        for v, oa, ob in zip(heads["v"], off_a, off_b)
    }
    ta, tb = float(tot_a), float(tot_b)

    def fold(batch: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "d": pa.array([], pa.float64()),
                "v": pa.array([], pa.float64()),
            }
        )
        if len(batch) == 0:
            return empty
        oa, ob = off[float(batch["v"].iloc[0])]
        ca = oa + batch["n_a"].to_numpy(np.float64).cumsum()
        cb = ob + batch["n_b"].to_numpy(np.float64).cumsum()
        d = np.abs(ca / ta - cb / tb)
        i = int(d.argmax())  # first (smallest-v) argmax in block
        return pa.table(
            {
                "d": pa.array([float(d[i])], pa.float64()),
                "v": pa.array(
                    [float(batch["v"].iloc[i])], pa.float64()
                ),
            }
        )

    cand = hist.map_batches(
        fold, batch_format="pandas", batch_size=None
    ).to_pandas().sort_values(["d", "v"], ascending=[False, True])
    return {
        "ks_d": round(float(cand["d"].iloc[0]), ndigits),
        "at_value": float(cand["v"].iloc[0]),
        "n_a": tot_a,
        "n_b": tot_b,
    }


def _midrank_table(ds, col: str) -> pd.DataFrame:
    """(value, midrank) over the distinct values of ``col`` — the
    tie-averaged rank ``avg(row_number)`` collapses to.  Built from
    the (value, count) histogram: one pre-aggregated shuffle + one
    sort; ranks finish on the driver over the DISTINCT-value table
    (the same O(distinct) object the caller is about to broadcast, so
    no extra distributed pass buys anything).  Midranks are exact
    half-integers: off + (n + 1) / 2."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    h = bucketed_aggregate(
        ds.select_columns([col]), [col], {"n": (col, "count")}
    ).to_pandas().sort_values(col).reset_index(drop=True)
    n = h["n"].to_numpy(np.float64)
    off = np.concatenate([[0.0], n.cumsum()[:-1]])
    h["rank"] = off + (n + 1.0) / 2.0
    return h[[col, "rank"]]


def spearman_corr(ds, x_col: str, y_col: str, ndigits: int = 6,
                  broadcast_limit: int = 2_000_000) -> dict:
    """Exact Spearman rank correlation (midranks under ties) between
    two numeric columns — the monotone-dependence profile that
    Pearson misses on skewed quality signals.

    rho = Pearson over (midrank_x, midrank_y).  Shape: two DISTINCT-
    value histograms give the value->midrank maps; below
    ``broadcast_limit`` distinct values each map broadcasts ONCE via
    ``ray.put`` as sorted arrays and every batch substitutes ranks
    with one vectorized ``searchsorted``; above it the substitution
    becomes two bucketed LEFT hash joins on the value (rank tables
    only, never payload).  The moment fold then carries ONE
    (n, sx, sy, sxx, syy, sxy) row per batch.  Midranks are
    half-integers, so every sum term is an exact multiple of 0.25 —
    the sums are float-EXACT at oracle scales regardless of
    summation order, which is what lets a DuckDB twin hash-match.

    Returns ``{"rho": float, "n": int}``."""
    import ray

    pair = ds.select_columns([x_col, y_col])
    rx = _midrank_table(pair, x_col)
    ry = _midrank_table(pair, y_col)

    def _moment_row(u, v):
        return pa.table(
            {
                "n": pa.array([float(len(u))], pa.float64()),
                "sx": pa.array([u.sum()], pa.float64()),
                "sy": pa.array([v.sum()], pa.float64()),
                "sxx": pa.array([(u * u).sum()], pa.float64()),
                "syy": pa.array([(v * v).sum()], pa.float64()),
                "sxy": pa.array([(u * v).sum()], pa.float64()),
            }
        )

    if max(len(rx), len(ry)) <= broadcast_limit:
        xv = rx[x_col].to_numpy(np.float64)
        xr = rx["rank"].to_numpy(np.float64)
        yv = ry[y_col].to_numpy(np.float64)
        yr = ry["rank"].to_numpy(np.float64)
        small = max(len(rx), len(ry)) <= 100_000
        if small:
            # rank maps <= 100k rows pickle into each task closure
            # (a plain task map skips actor-pool spin-up)
            def moments(batch: pd.DataFrame) -> pa.Table:
                u = xr[np.searchsorted(
                    xv, batch[x_col].to_numpy(np.float64))]
                v = yr[np.searchsorted(
                    yv, batch[y_col].to_numpy(np.float64))]
                return _moment_row(u, v)

            parts = pair.map_batches(
                moments, batch_format="pandas"
            ).to_pandas()
        else:
            # larger maps go through the object store ONCE; the
            # actor class references only the ref, so the arrays
            # are not also pickled into its closure
            ref = ray.put((xv, xr, yv, yr))

            class Moments:
                def __init__(self):
                    self.m = ray.get(ref)

                def __call__(self, batch: pd.DataFrame) -> pa.Table:
                    mxv, mxr, myv, myr = self.m
                    u = mxr[np.searchsorted(
                        mxv, batch[x_col].to_numpy(np.float64))]
                    v = myr[np.searchsorted(
                        myv, batch[y_col].to_numpy(np.float64))]
                    return _moment_row(u, v)

            parts = pair.map_batches(
                Moments, batch_format="pandas", concurrency=(1, 8)
            ).to_pandas()
    else:
        from unfurl_ray.ops.relational import (
            _arrow, bucketed_hash_join,
        )

        rx_ds = ray.data.from_arrow(
            _arrow(rx.rename(columns={"rank": "_rx"}))
        )
        ry_ds = ray.data.from_arrow(
            _arrow(ry.rename(columns={"rank": "_ry"}))
        )
        joined = bucketed_hash_join(
            bucketed_hash_join(
                pair, rx_ds, on=x_col, right_on=x_col, how="left"
            ),
            ry_ds, on=y_col, right_on=y_col, how="left",
        )

        def fold(batch: pd.DataFrame) -> pa.Table:
            return _moment_row(
                batch["_rx"].to_numpy(np.float64),
                batch["_ry"].to_numpy(np.float64),
            )

        parts = joined.map_batches(
            fold, batch_format="pandas"
        ).to_pandas()

    n = float(parts["n"].sum())
    sx, sy = float(parts["sx"].sum()), float(parts["sy"].sum())
    sxx, syy = float(parts["sxx"].sum()), float(parts["syy"].sum())
    sxy = float(parts["sxy"].sum())
    # mirror the SQL twin's expression shape exactly: the inputs are
    # float-exact, so same-shape arithmetic gives bit-equal output
    rho = (n * sxy - sx * sy) / np.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    return {"rho": round(float(rho), ndigits), "n": int(n)}


def gini(ds, value_col: str, ndigits: int = 6) -> dict:
    """Exact Gini coefficient of a non-negative quantity — the
    source/shard concentration audit (how unevenly is token mass or
    spend spread?).

    Rank identity over the sorted DISTINCT-value histogram:
    G = 2 * sum_v v * (c_v * off_v + c_v * (c_v + 1) / 2)
          / (n * total) - (n + 1) / n,
    where off_v is the exclusive cumulative count — ties contribute
    their rank-run sum in closed form, so any tie order is exact.
    Same O(#blocks)-driver summary layout as ``roc_auc``: histogram
    shuffle -> one sort -> head-offset pass -> vectorized per-block
    fold.

    Returns ``{"gini", "n", "total"}``."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"v": batch[value_col].astype("float64"), "c": np.int64(1)}
        )

    from unfurl_ray.ops.relational import block_heads

    hist = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["v"], {"c": ("c", "sum")},
    ).sort("v").materialize()

    heads = block_heads(hist, "v", ["c"])
    n = int(heads["c"].sum())
    if n == 0:
        return {"gini": float("nan"), "n": 0, "total": 0.0}
    offs = np.concatenate(
        [[0], heads["c"].to_numpy(np.int64).cumsum()[:-1]]
    )
    # O(#blocks) offset table: pickles into each task closure — a
    # plain task map skips the actor-pool spin-up entirely
    off_map = {float(v): int(o) for v, o in zip(heads["v"], offs)}

    def fold(batch: pd.DataFrame) -> pa.Table:
        empty = pa.table(
            {
                "num": pa.array([], pa.float64()),
                "tot": pa.array([], pa.float64()),
            }
        )
        if len(batch) == 0:
            return empty
        off = off_map[float(batch["v"].iloc[0])]
        v = batch["v"].to_numpy(np.float64)
        c = batch["c"].to_numpy(np.float64)
        start = off + np.concatenate([[0.0], c.cumsum()[:-1]])
        num = float((v * (c * start + c * (c + 1.0) / 2.0)).sum())
        return pa.table(
            {
                "num": pa.array([num], pa.float64()),
                "tot": pa.array([float((v * c).sum())], pa.float64()),
            }
        )

    parts = hist.map_batches(
        fold, batch_format="pandas", batch_size=None
    ).to_pandas()
    num = float(parts["num"].sum())
    tot = float(parts["tot"].sum())
    nf = float(n)
    g = 2.0 * num / (nf * tot) - (nf + 1.0) / nf
    return {"gini": round(g, ndigits), "n": n, "total": tot}


def ecdf_normalize(ds, value_col: str, ref_ds, ref_col: str,
                   out_col: str = "ref_pct", ndigits: int = 6,
                   broadcast_limit: int = 2_000_000):
    """Score normalization against a REFERENCE distribution: append
    the fraction of reference values <= each row's value (the
    reference ECDF evaluated per row) — how quality/reward scores
    from one source are made comparable to another's.

    The reference collapses to its distinct-value cumulative
    histogram (bucketed pre-aggregated shuffle, never reference
    rows); below ``broadcast_limit`` distinct values it broadcasts as
    two sorted arrays and every batch evaluates with one vectorized
    ``searchsorted`` — exact integer-ratio outputs, so an ASOF-join
    SQL twin hashes equal.  Past the limit, range-partition both
    sides by value instead (compose ``asof_join_partitioned`` keyed
    on value buckets); the histogram for any real scoring column is
    far below it."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    h = bucketed_aggregate(
        ref_ds.select_columns([ref_col]), [ref_col],
        {"c": (ref_col, "count")},
    ).to_pandas()
    if len(h) == 0:
        raise ValueError(
            "ecdf_normalize: reference dataset is empty — the ECDF "
            "is undefined (every ref_pct would be 0/0)"
        )
    h = h.sort_values(ref_col).reset_index(drop=True)
    if len(h) > broadcast_limit:
        raise ValueError(
            "reference histogram exceeds broadcast_limit; "
            "range-partition by value (see docstring)"
        )
    vs = h[ref_col].to_numpy(np.float64)
    cum = h["c"].to_numpy(np.float64).cumsum()
    n = float(cum[-1])

    def norm(batch: pd.DataFrame) -> pd.DataFrame:
        idx = np.searchsorted(
            vs, batch[value_col].to_numpy(np.float64), side="right"
        )
        pct = np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0.0) / n
        out = batch.copy()
        out[out_col] = np.round(pct, ndigits)
        return out

    return ds.map_batches(norm, batch_format="pandas")


def bh_adjust(ds, p_col: str, id_col: str) -> "object":
    """Benjamini-Hochberg FDR adjustment of a p-value column — the
    multiple-testing correction applied after any per-group test
    battery (Welch/chi-square over thousands of segments).

    adj_i = min(1, min_{j >= i} p_(j) * m / j) over the ascending
    p-order.  Distributed suffix-min in three whole-block passes over
    ONE materialized (p, id) sort: a #blocks-row head pass gives each
    block its exclusive rank offset; a summary pass folds each
    block's min criterion; the driver suffix-mins the O(#blocks)
    summaries into per-block carries; the final pass emits each row's
    reversed cumulative min combined with its carry, vectorized.
    Driver state: O(#blocks).  Returns (id, p, rank, p_adj) rows."""
    import ray

    from unfurl_ray.ops.relational import _arrow

    pair = ds.select_columns([p_col, id_col])
    srt = pair.sort([p_col, id_col]).materialize()

    def head(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "p0": pa.array([], pa.float64()),
                    "i0": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "p0": batch.column(p_col).slice(0, 1)
                .cast(pa.float64()),
                "i0": batch.column(id_col).slice(0, 1)
                .cast(pa.int64()),
                "n": pa.array([len(batch)], pa.int64()),
            }
        )

    heads = srt.map_batches(
        head, batch_format="pyarrow", batch_size=None
    ).to_pandas().sort_values(["p0", "i0"]).reset_index(drop=True)
    m = int(heads["n"].sum())
    if m == 0:
        import ray as _ray

        return _ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "p_value": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                    "p_adj": pa.array([], pa.float64()),
                }
            )
        )
    offs = np.concatenate(
        [[0], heads["n"].to_numpy(np.int64).cumsum()[:-1]]
    )
    off_map = {
        (float(p), int(i)): int(o)
        for p, i, o in zip(heads["p0"], heads["i0"], offs)
    }

    def crit(batch: pd.DataFrame) -> np.ndarray:
        key = (
            float(batch[p_col].iloc[0]), int(batch[id_col].iloc[0])
        )
        rn = off_map[key] + np.arange(1, len(batch) + 1)
        return batch[p_col].to_numpy(np.float64) * float(m) / rn

    def summary(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "p0": pa.array([], pa.float64()),
                    "i0": pa.array([], pa.int64()),
                    "cmin": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "p0": pa.array(
                    [float(batch[p_col].iloc[0])], pa.float64()
                ),
                "i0": pa.array(
                    [int(batch[id_col].iloc[0])], pa.int64()
                ),
                "cmin": pa.array(
                    [float(crit(batch).min())], pa.float64()
                ),
            }
        )

    summ = srt.map_batches(
        summary, batch_format="pandas", batch_size=None
    ).to_pandas().sort_values(["p0", "i0"]).reset_index(drop=True)
    # carry[k] = min criterion over all blocks AFTER block k
    rev = summ["cmin"].to_numpy(np.float64)[::-1]
    suffix = np.minimum.accumulate(rev)[::-1]
    carries = np.concatenate([suffix[1:], [np.inf]])
    carry_map = {
        (float(p), int(i)): float(c)
        for p, i, c in zip(summ["p0"], summ["i0"], carries)
    }

    def finish(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "p_value": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                    "p_adj": pa.array([], pa.float64()),
                }
            )
        key = (
            float(batch[p_col].iloc[0]), int(batch[id_col].iloc[0])
        )
        c = crit(batch)
        # reversed cumulative min within the block, then the carry
        # from all later blocks
        local = np.minimum.accumulate(c[::-1])[::-1]
        adj = np.minimum(np.minimum(local, carry_map[key]), 1.0)
        rn = off_map[key] + np.arange(1, len(batch) + 1)
        return _arrow(
            pd.DataFrame(
                {
                    id_col: batch[id_col].astype("int64").to_numpy(),
                    "p_value": batch[p_col].to_numpy(np.float64),
                    "rank": rn.astype(np.int64),
                    "p_adj": adj,
                }
            )
        )

    return srt.map_batches(
        finish, batch_format="pandas", batch_size=None
    )


def grouped_gini(ds, key_col: str, value_col: str,
                 ndigits: int = 6):
    """Exact Gini coefficient PER GROUP — per-source concentration
    audit (is one shard's token mass dominated by a few documents?).

    Same rank identity as ``gini`` but the (key, value, count)
    histogram shuffle feeds one vectorized closed-form fold per key
    inside map_groups.  Partitioning assumption: one key's DISTINCT
    values fit one group (the ``group_quantile_disc`` contract)."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": batch[key_col],
                "v": batch[value_col].astype("float64"),
                "c": np.int64(1),
            }
        )

    hist = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["k", "v"], {"c": ("c", "sum")},
    )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("v")
        v = g["v"].to_numpy(np.float64)
        c = g["c"].to_numpy(np.float64)
        n = c.sum()
        tot = float((v * c).sum())
        start = np.concatenate([[0.0], c.cumsum()[:-1]])
        num = float((v * (c * start + c * (c + 1.0) / 2.0)).sum())
        gini_v = 2.0 * num / (n * tot) - (n + 1.0) / n
        return pd.DataFrame(
            {
                "k": [g["k"].iloc[0]],
                "gini": [round(gini_v, ndigits)],
                "n": [np.int64(n)],
                "total": [tot],
            }
        )

    return hist.groupby("k").map_groups(fold, batch_format="pandas")


def conditional_entropy(ds, x_col: str, y_col: str,
                        ndigits: int = 6) -> pd.DataFrame:
    """Conditional entropy H(Y|X) and the uncertainty coefficient
    U(Y|X) = MI / H(Y) — "how much of Y does knowing X explain",
    the normalized form of ``mutual_information`` used to rank
    candidate stratification keys on one scale.

    Same single (x, y, n) joint-histogram shuffle; identities
    ``H(Y|X) = H(Y) - MI`` finish on the tiny joint table."""
    from unfurl_ray.ops.relational import pre_aggregate

    joint = pre_aggregate(
        ds, [x_col, y_col], {"n": (x_col, "count")}
    ).to_pandas()
    n = joint["n"].to_numpy(np.float64)
    tot = n.sum()
    nx = joint.groupby(x_col)["n"].transform("sum").to_numpy(
        np.float64
    )
    ny = joint.groupby(y_col)["n"].transform("sum").to_numpy(
        np.float64
    )
    p = n / tot
    mi = float((p * np.log(n * tot / (nx * ny))).sum())
    h_y = float(-(p * np.log(ny / tot)).sum())
    return pd.DataFrame(
        {
            "h_y_given_x": [round(h_y - mi, ndigits)],
            "u_y_given_x": [round(mi / h_y, ndigits)],
        }
    )


def autocorrelation(ds, t_col: str, value_col: str,
                    max_lag: int = 7) -> pd.DataFrame:
    """Autocorrelation function of a pre-aggregated regular series at
    lags 1..max_lag: acf(k) = sum((x_t - m)(x_{t+k} - m)) /
    sum((x_t - m)^2), pairs with a missing t+k skipped (gap-tolerant,
    full-series denominator — the standard estimator).

    ``ds`` is the AGGREGATED (t, x) series — one row per time unit,
    the bounded axis (produce it with pre_aggregate /
    bucketed_aggregate; that shuffle is the distributed part).  The
    fold collects the series once (O(#time units), like
    kaplan_meier's histogram close) and computes all lags with one
    vectorized reindex per lag.

    Output: (lag, acf, n_pairs).
    """
    s = ds.to_pandas().sort_values(t_col).reset_index(drop=True)
    t = s[t_col].to_numpy(np.int64)
    x = s[value_col].to_numpy(np.float64)
    m = x.sum() / len(x)
    cx = x - m
    den = float((cx * cx).sum())
    by_t = pd.Series(cx, index=t)
    lags, acfs, pairs = [], [], []
    for k in range(1, max_lag + 1):
        nxt = by_t.reindex(t + k)
        mask = ~nxt.isna().to_numpy()
        lags.append(k)
        acfs.append(float((cx[mask] * nxt.to_numpy()[mask]).sum()) / den)
        pairs.append(int(mask.sum()))
    return pd.DataFrame(
        {
            "lag": np.array(lags, dtype=np.int64),
            "acf": np.array(acfs, dtype=np.float64),
            "n_pairs": np.array(pairs, dtype=np.int64),
        }
    )


def cross_correlation(ds, t_col: str, x_col: str, y_col: str,
                      max_lag: int = 3) -> pd.DataFrame:
    """Cross-correlation of two pre-aggregated regular series at lags
    -max_lag..max_lag: ccf(k) = sum((x_t - mx)(y_{t+k} - my)) /
    (sqrt(sum((x - mx)^2)) * sqrt(sum((y - my)^2))), gap-tolerant
    like ``autocorrelation`` (pairs with a missing t+k skipped,
    full-series normalizer).  Positive k: x leads y.

    ``ds`` is the AGGREGATED (t, x, y) series — one row per time
    unit; the fold collects the bounded axis once.

    Output: (lag, ccf, n_pairs).
    """
    s = ds.to_pandas().sort_values(t_col).reset_index(drop=True)
    t = s[t_col].to_numpy(np.int64)
    x = s[x_col].to_numpy(np.float64)
    y = s[y_col].to_numpy(np.float64)
    mx, my = x.sum() / len(x), y.sum() / len(y)
    cx, cy = x - mx, y - my
    den = float(np.sqrt((cx * cx).sum()) * np.sqrt((cy * cy).sum()))
    by_t = pd.Series(cy, index=t)
    lags, ccfs, pairs = [], [], []
    for k in range(-max_lag, max_lag + 1):
        nxt = by_t.reindex(t + k)
        mask = ~nxt.isna().to_numpy()
        lags.append(k)
        ccfs.append(
            float((cx[mask] * nxt.to_numpy()[mask]).sum()) / den
        )
        pairs.append(int(mask.sum()))
    return pd.DataFrame(
        {
            "lag": np.array(lags, dtype=np.int64),
            "ccf": np.array(ccfs, dtype=np.float64),
            "n_pairs": np.array(pairs, dtype=np.int64),
        }
    )


def benford_audit(ds, cents_col: str) -> pd.DataFrame:
    """First-digit Benford's-law audit of a positive integer amount
    column (pass cents, not floats — the leading digit is then exact
    on both sides of the oracle).  One ``pre_aggregate`` over the 9
    digit classes; expected counts N * log10(1 + 1/d) and chi-square
    terms close on the 9-row table.

    Output: (digit, n, expected, chi2_term) for digits 1..9.
    """
    from unfurl_ray.ops.relational import pre_aggregate

    def first_digit(batch: pd.DataFrame) -> pd.DataFrame:
        # decimal-string leading digit, not 10**floor(log10(v)):
        # log10 of exact powers of ten can land a hair below the
        # integer and shift the digit
        d = (
            batch[cents_col]
            .astype("int64")
            .astype(str)
            .str[0]
            .astype("int64")
        )
        return pd.DataFrame({"digit": d})

    hist = pre_aggregate(
        ds.map_batches(first_digit, batch_format="pandas"),
        ["digit"], {"n": ("digit", "count")},
    ).to_pandas().sort_values("digit").reset_index(drop=True)
    total = int(hist["n"].sum())
    d = hist["digit"].to_numpy(np.int64)
    exp = total * np.log10(1.0 + 1.0 / d)
    obs = hist["n"].to_numpy(np.int64)
    chi2 = (obs - exp) ** 2 / exp
    return pd.DataFrame(
        {
            "digit": d,
            "n": obs,
            "expected": exp,
            "chi2_term": chi2,
        }
    )


def kruskal_wallis(ds, key_col: str, value_col: str) -> pd.DataFrame:
    """Kruskal-Wallis one-way rank test (the nonparametric ANOVA):
    H = (12 / (N(N+1))) * sum R_i^2 / n_i - 3(N+1), tie-corrected by
    1 - sum(t^3 - t) / (N^3 - N).

    Distributed shape: ONE (key, value, count) histogram shuffle;
    midranks come from the pooled value histogram (exact
    half-integers, so every rank sum is exact in float64 and the SQL
    twin hash-matches), group rank sums are weighted folds over the
    same histogram, and the statistic closes on the #groups-row
    table.

    Output: one row (n, k_groups, h_stat).
    """
    from unfurl_ray.ops.relational import bucketed_aggregate

    h = bucketed_aggregate(
        ds, [key_col, value_col], {"c": (value_col, "count")}
    ).to_pandas()
    vh = (
        h.groupby(value_col)["c"].sum().sort_index()
    )
    cnt = vh.to_numpy(np.float64)
    off = np.concatenate([[0.0], cnt.cumsum()[:-1]])
    rank = pd.Series(off + (cnt + 1.0) / 2.0, index=vh.index)
    h["rank"] = rank.reindex(h[value_col]).to_numpy()
    g = h.groupby(key_col).apply(
        lambda s: pd.Series(
            {
                "ni": s["c"].sum(),
                "ri": (s["c"] * s["rank"]).sum(),
            }
        ),
        include_groups=False,
    )
    N = float(g["ni"].sum())
    tt = float((cnt ** 3 - cnt).sum())
    h_stat = (
        (12.0 / (N * (N + 1)))
        * float((g["ri"] ** 2 / g["ni"]).sum())
        - 3 * (N + 1)
    ) / (1 - tt / (N ** 3 - N))
    return pd.DataFrame(
        {
            "n": np.array([int(N)], dtype=np.int64),
            "k_groups": np.array([len(g)], dtype=np.int64),
            "h_stat": np.array([h_stat], dtype=np.float64),
        }
    )


def mann_whitney(ds, key_col: str, value_col: str,
                 group_a: str, group_b: str) -> pd.DataFrame:
    """Mann-Whitney U rank-sum test between two groups — the
    two-sample special case of :func:`kruskal_wallis` and the same
    distributed shape: ONE (group, value, count) histogram shuffle
    (pre-aggregated per batch), pooled midranks from the histogram
    (exact half-integers, so rank sums are exact in float64 and a
    SQL twin hash-matches), then the U statistic and tie-corrected
    normal approximation close on the driver over the
    distinct-value table.

    z uses the standard tie correction
    sigma^2 = n_a n_b / 12 * ((N + 1) - sum(t^3 - t) / (N (N - 1))).

    Output: one row (n_a, n_b, u_a, z).
    """
    from unfurl_ray.ops.relational import bucketed_aggregate

    h = bucketed_aggregate(
        ds, [key_col, value_col], {"c": (value_col, "count")}
    ).to_pandas()
    h = h[h[key_col].isin([group_a, group_b])]
    vh = h.groupby(value_col)["c"].sum().sort_index()
    cnt = vh.to_numpy(np.float64)
    off = np.concatenate([[0.0], cnt.cumsum()[:-1]])
    rank = pd.Series(off + (cnt + 1.0) / 2.0, index=vh.index)
    h = h.assign(rank=rank.reindex(h[value_col]).to_numpy())
    ga = h[h[key_col] == group_a]
    n_a = float(ga["c"].sum())
    n_b = float(h.loc[h[key_col] == group_b, "c"].sum())
    r_a = float((ga["c"] * ga["rank"]).sum())
    u_a = r_a - n_a * (n_a + 1.0) / 2.0
    N = n_a + n_b
    tt = float((cnt ** 3 - cnt).sum())
    sigma = np.sqrt(
        n_a * n_b / 12.0 * ((N + 1.0) - tt / (N * (N - 1.0)))
    )
    z = (u_a - n_a * n_b / 2.0) / sigma
    return pd.DataFrame(
        {
            "n_a": np.array([int(n_a)], dtype=np.int64),
            "n_b": np.array([int(n_b)], dtype=np.int64),
            "u_a": np.array([u_a], dtype=np.float64),
            "z": np.array([round(z, 6)], dtype=np.float64),
        }
    )
