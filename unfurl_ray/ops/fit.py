"""Distributed model fitting via sufficient statistics.

The OLS trend (pipelines.q_regression) showed the pattern: when a
model's update needs only fixed-size aggregates of the data, the
cluster ships k x k matrices, never rows.  Logistic regression by
IRLS/Newton is the same shape — each iteration every batch computes
its partial Hessian ``X'WX`` (k x k) and gradient ``X'(y - p)``
(k floats), the driver folds a handful of tiny partials, solves, and
broadcasts the next coefficient vector.  The training data is
materialized ONCE (projected feature columns only) and re-streamed
per iteration; nothing key-grouped, nothing skew-sensitive.

This is the quality-classifier primitive of an LLM data pipeline
(fastText-style filters): featurize documents vectorized, fit, score
everything with one more ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def logreg_irls(ds, x_cols: list[str], y_col: str,
                iters: int = 8, ridge: float = 1e-6) -> dict:
    """Fit ``P(y=1) = sigmoid(X beta)`` by Newton/IRLS.

    ``ds``: Dataset with numeric feature columns ``x_cols`` (include a
    constant column for an intercept) and a 0/1 ``y_col``.  Returns
    {"beta": np.ndarray, "n": int, "iters": int}.  ``ridge`` keeps the
    Hessian invertible under separable/collinear features —
    deterministic given deterministic input order per batch (sums are
    folded in float64; coefficient-level reproducibility is at ~1e-12,
    so round before hashing results).
    """
    import ray

    k = len(x_cols)
    rows = ds.select_columns(x_cols + [y_col]).materialize()
    beta = np.zeros(k, dtype=np.float64)

    def partials(batch: pd.DataFrame, ref=None) -> pa.Table:
        from unfurl_ray.ops.relational import _broadcast_fetch

        b = _broadcast_fetch(ref)
        X = batch[x_cols].to_numpy(dtype=np.float64)
        y = batch[y_col].to_numpy(dtype=np.float64)
        eta = X @ b
        p = 1.0 / (1.0 + np.exp(-eta))
        w = p * (1.0 - p)
        H = (X * w[:, None]).T @ X          # k x k
        g = X.T @ (y - p)                   # k
        return pa.table(
            {
                "H": pa.array([H.ravel().tolist()],
                              pa.list_(pa.float64())),
                "g": pa.array([g.tolist()], pa.list_(pa.float64())),
                "n": pa.array([len(y)], pa.int64()),
            }
        )

    n_total = 0
    for _ in range(iters):
        ref = ray.put(beta)
        parts = rows.map_batches(
            partials, batch_format="pandas", fn_kwargs={"ref": ref},
        ).to_pandas()
        H = np.zeros((k, k))
        g = np.zeros(k)
        for hrow, grow in zip(parts["H"], parts["g"]):
            H += np.asarray(hrow, dtype=np.float64).reshape(k, k)
            g += np.asarray(grow, dtype=np.float64)
        n_total = int(parts["n"].sum())
        beta = beta + np.linalg.solve(
            H + ridge * np.eye(k), g
        )
    return {"beta": beta, "n": n_total, "iters": iters}


def logreg_irls_reference(X: np.ndarray, y: np.ndarray,
                          iters: int = 8,
                          ridge: float = 1e-6) -> np.ndarray:
    """Single-process IRLS with the identical update — parity target
    for tests only."""
    k = X.shape[1]
    beta = np.zeros(k)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = p * (1.0 - p)
        H = (X * w[:, None]).T @ X + ridge * np.eye(k)
        beta = beta + np.linalg.solve(H, X.T @ (y - p))
    return beta


def logreg_score(ds, x_cols: list[str], beta: np.ndarray,
                 out_col: str = "p"):
    """Score every row with the fitted model — one vectorized pass."""
    b = np.asarray(beta, dtype=np.float64)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        X = batch[x_cols].to_numpy(dtype=np.float64)
        batch[out_col] = 1.0 / (1.0 + np.exp(-(X @ b)))
        return batch

    return ds.map_batches(score, batch_format="pandas")


def als_implicit(ds, user_col: str, item_col: str, rating_col: str,
                 n_items: int, k: int = 2, iters: int = 5,
                 lam: float = 0.1, n_shards: int = 32,
                 seed: int = 7) -> dict:
    """Rank-``k`` matrix factorization of a (user, item, rating)
    table by alternating least squares — the recommender / taste-
    vector primitive.

    One distributed pass per iteration: ratings are materialized ONCE
    hash-sharded by user; each shard task (a) solves every resident
    user's k x k normal equations against the broadcast item-factor
    matrix and (b) in the same pass emits the per-item sufficient
    statistics (``U'U`` and ``U'r`` per item) the ITEM update needs —
    the driver folds ``n_items`` tiny matrices, solves, and
    broadcasts the next ``V``.  Driver state is ``n_items x k``
    floats; user factors never centralize.  ``item_col`` must hold
    dense indices in ``[0, n_items)``; the per-user solve loops
    within a shard (each solve is k x k — vectorizing across users
    buys nothing at k <= 8).
    """
    import ray

    def shard(batch: pd.DataFrame) -> pd.DataFrame:
        batch["_shard"] = (
            pd.util.hash_array(batch[user_col].to_numpy())
            % np.uint64(n_shards)
        ).astype(np.int64)
        return batch

    rows = ds.map_batches(shard, batch_format="pandas").materialize()
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n_items, k)) * 0.1

    def shard_pass(group: pd.DataFrame, ref=None) -> pa.Table:
        from unfurl_ray.ops.relational import _broadcast_fetch

        Vb = _broadcast_fetch(ref)
        g = group.sort_values([user_col, item_col])
        users = g[user_col].to_numpy()
        items = g[item_col].to_numpy(dtype=np.int64)
        r = g[rating_col].to_numpy(dtype=np.float64)
        new = np.empty(len(g), dtype=np.bool_)
        new[0] = True
        new[1:] = users[1:] != users[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(g))
        H = np.zeros((n_items, k, k))
        b = np.zeros((n_items, k))
        sse, n = 0.0, 0
        eye = lam * np.eye(k)
        for s, e in zip(starts, ends):
            idx, rv = items[s:e], r[s:e]
            A = Vb[idx]
            u = np.linalg.solve(A.T @ A + eye, A.T @ rv)
            resid = rv - A @ u
            sse += float(resid @ resid)
            n += len(rv)
            uu = np.outer(u, u)
            for j, rj in zip(idx, rv):
                H[j] += uu
                b[j] += rj * u
        return pa.table(
            {
                "H": pa.array([H.ravel().tolist()],
                              pa.list_(pa.float64())),
                "b": pa.array([b.ravel().tolist()],
                              pa.list_(pa.float64())),
                "sse": pa.array([sse], pa.float64()),
                "n": pa.array([n], pa.int64()),
            }
        )

    rmse = float("nan")
    for _ in range(iters):
        ref = ray.put(V)
        parts = (
            rows.groupby("_shard")
            .map_groups(
                lambda gr, ref=ref: shard_pass(gr, ref=ref),
                batch_format="pandas",
            )
            .to_pandas()
        )
        H = np.zeros((n_items, k, k))
        b = np.zeros((n_items, k))
        for hrow, brow in zip(parts["H"], parts["b"]):
            H += np.asarray(hrow).reshape(n_items, k, k)
            b += np.asarray(brow).reshape(n_items, k)
        rmse = float(
            np.sqrt(parts["sse"].sum() / max(1, parts["n"].sum()))
        )
        for j in range(n_items):
            V[j] = np.linalg.solve(H[j] + lam * np.eye(k), b[j])
    return {"V": V, "rmse": rmse, "iters": iters}


def als_implicit_reference(rows: pd.DataFrame, user_col: str,
                           item_col: str, rating_col: str,
                           n_items: int, k: int = 2, iters: int = 5,
                           lam: float = 0.1,
                           seed: int = 7) -> dict:
    """Single-process ALS with the identical update order — parity
    target for tests only."""
    rng = np.random.default_rng(seed)
    V = rng.standard_normal((n_items, k)) * 0.1
    eye = lam * np.eye(k)
    rmse = float("nan")
    for _ in range(iters):
        H = np.zeros((n_items, k, k))
        b = np.zeros((n_items, k))
        sse, n = 0.0, 0
        for _u, g in rows.groupby(user_col, sort=True):
            idx = g[item_col].to_numpy(dtype=np.int64)
            rv = g[rating_col].to_numpy(dtype=np.float64)
            A = V[idx]
            u = np.linalg.solve(A.T @ A + eye, A.T @ rv)
            resid = rv - A @ u
            sse += float(resid @ resid)
            n += len(rv)
            uu = np.outer(u, u)
            for j, rj in zip(idx, rv):
                H[j] += uu
                b[j] += rj * u
        rmse = float(np.sqrt(sse / max(1, n)))
        for j in range(n_items):
            V[j] = np.linalg.solve(H[j] + lam * np.eye(k), b[j])
    return {"V": V, "rmse": rmse, "iters": iters}


def roc_auc(ds, score_col: str, label_col: str) -> dict:
    """Exact ROC AUC in the Mann-Whitney midrank form, distributed so
    the driver never holds the score histogram.

    AUC = sum over distinct scores s of
    ``n_pos(s) * (cum_neg(<s) + n_neg(s)/2) / (P*N)`` — the midrank
    identity, exact under ties.  Shape: per-batch partial (score,
    n_pos, n_neg) counts -> one tiny groupby shuffle (the histogram,
    one row per DISTINCT score, never per event), ONE range sort of
    the histogram, then the ``global_row_number`` summary layout:
    a #blocks-row head pass gives each block its exclusive
    cumulative-negative offset, and each block folds its contribution
    vectorized.  Driver state: O(#blocks) heads + partials, three
    scalars out.

    Returns ``{"auc": float, "n_pos": int, "n_neg": int}``."""
    import ray

    from unfurl_ray.ops.relational import bucketed_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        pos = batch[label_col].astype("int64")
        return pd.DataFrame(
            {
                "score": batch[score_col].astype("float64"),
                "pos": pos,
                "neg": 1 - pos,
            }
        )

    from unfurl_ray.ops.relational import block_heads

    hist = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["score"],
        {"n_pos": ("pos", "sum"), "n_neg": ("neg", "sum")},
    ).sort("score").materialize()

    heads = block_heads(hist, "score", ["n_pos", "n_neg"])
    n_pos = int(heads["n_pos"].sum())
    n_neg = int(heads["n_neg"].sum())
    if n_pos == 0 or n_neg == 0:
        return {"auc": float("nan"), "n_pos": n_pos, "n_neg": n_neg}
    neg_off = np.concatenate(
        [[0], heads["n_neg"].to_numpy(np.int64).cumsum()[:-1]]
    )
    off_ref = ray.put(
        dict(zip(heads["score"].to_numpy(), neg_off.astype(np.int64)))
    )

    class Fold:
        def __init__(self):
            self.off = ray.get(off_ref)

        def __call__(self, batch: pd.DataFrame) -> pa.Table:
            if len(batch) == 0:
                return pa.table({"part": pa.array([], pa.float64())})
            off = self.off[float(batch["score"].iloc[0])]
            npos = batch["n_pos"].to_numpy(np.float64)
            nneg = batch["n_neg"].to_numpy(np.float64)
            cum_before = np.concatenate([[0.0], nneg.cumsum()[:-1]])
            part = float(
                (npos * (off + cum_before + nneg / 2.0)).sum()
            )
            return pa.table({"part": pa.array([part], pa.float64())})

    parts = hist.map_batches(
        Fold, batch_format="pandas", batch_size=None,
        concurrency=(1, 8),
    ).to_pandas()
    auc = float(parts["part"].sum()) / (float(n_pos) * float(n_neg))
    return {"auc": auc, "n_pos": n_pos, "n_neg": n_neg}


def best_split(ds, feature_cols: list[str], target_col: str,
               gain_digits: int = 4, mean_digits: int = 2
               ) -> pd.DataFrame:
    """Histogram-based regression-tree split finding (the
    LightGBM/XGBoost approx-split primitive): the single
    variance-reducing split ``feature <= threshold`` across all
    candidate features.

    Scale shape: each input row melts to (feature, value, y) and
    ``pre_aggregate`` folds per-batch partial (n, sum_y) BEFORE the
    shuffle, so the exchange carries one row per (feature, DISTINCT
    value) per batch — never data rows.  The driver scans the final
    histogram (|features| x |distinct values|, bounded for
    discretized/low-cardinality features by construction — bin
    continuous features upstream, e.g. with ntile) with one cumsum
    per feature: gain(t) = S_l^2/n_l + S_r^2/n_r - S^2/n (the sumsq
    terms cancel in SSE reduction).

    ``mean_gain`` = gain / n is reported instead of raw gain: the raw
    value scales with sum(y)^2 and would swamp float-reproducibility
    tolerances; dividing by the (feature-independent) total preserves
    the argmax order.  Ties break by (feature, threshold)."""
    def melt(batch: pd.DataFrame) -> pd.DataFrame:
        y = batch[target_col].astype("float64")
        frames = [
            pd.DataFrame(
                {
                    "feature": f,
                    "value": batch[f].astype("float64"),
                    "y": y,
                }
            )
            for f in feature_cols
        ]
        return pd.concat(frames, ignore_index=True)

    from unfurl_ray.ops.relational import bucketed_aggregate

    hist = bucketed_aggregate(
        ds.map_batches(melt, batch_format="pandas"),
        ["feature", "value"],
        {"n": ("y", "count"), "s": ("y", "sum")},
    ).to_pandas().sort_values(["feature", "value"]).reset_index(
        drop=True
    )

    best = None
    for f, g in hist.groupby("feature", sort=True):
        n = g["n"].to_numpy(np.float64)
        s = g["s"].to_numpy(np.float64)
        np_, sp = n.sum(), s.sum()
        nl, sl = n.cumsum()[:-1], s.cumsum()[:-1]  # right side nonempty
        if len(nl) == 0:
            continue
        nr, sr = np_ - nl, sp - sl
        gain = (sl * sl / nl + sr * sr / nr - sp * sp / np_) / np_
        i = int(np.argmax(gain))
        cand = (
            -gain[i], f, float(g["value"].iloc[i]),
            float(sl[i] / nl[i]), float(sr[i] / nr[i]),
            int(nl[i]), int(nr[i]),
        )
        if best is None or cand < best:
            best = cand
    if best is None:
        return pd.DataFrame(
            {
                "feature": pd.Series([], dtype="object"),
                "threshold": pd.Series([], dtype="float64"),
                "mean_gain": pd.Series([], dtype="float64"),
                "left_mean": pd.Series([], dtype="float64"),
                "right_mean": pd.Series([], dtype="float64"),
                "n_left": pd.Series([], dtype="int64"),
                "n_right": pd.Series([], dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "feature": [best[1]],
            "threshold": [best[2]],
            "mean_gain": [round(-best[0], gain_digits)],
            "left_mean": [round(best[3], mean_digits)],
            "right_mean": [round(best[4], mean_digits)],
            "n_left": [np.int64(best[5])],
            "n_right": [np.int64(best[6])],
        }
    )


def _pav_runs(x0, x1, n, s):
    """Pool-adjacent-violators over a sorted run sequence.

    Inputs are parallel arrays of runs — (x_start, x_end, count,
    sum_y) — already ascending in x.  Returns the pooled runs as the
    same four arrays, each pool's fitted value being sum/count.
    Classic stack algorithm: amortized O(#runs); pooling two runs
    only needs their (n, s), which is what makes PAV mergeable."""
    xs, xe, ns, ss = [], [], [], []
    for i in range(len(n)):
        xs.append(float(x0[i]))
        xe.append(float(x1[i]))
        ns.append(float(n[i]))
        ss.append(float(s[i]))
        # pool while the new tail violates monotonicity
        while (
            len(ns) > 1
            and ss[-2] * ns[-1] >= ss[-1] * ns[-2]  # mean_prev >= mean
        ):
            ns[-2] += ns[-1]
            ss[-2] += ss[-1]
            xe[-2] = xe[-1]
            for a in (xs, xe, ns, ss):
                a.pop()
    return (
        np.asarray(xs), np.asarray(xe),
        np.asarray(ns), np.asarray(ss),
    )


def isotonic_fit(ds, x_col: str, y_col: str,
                 ndigits: int = 6) -> pd.DataFrame:
    """Distributed isotonic regression (least-squares monotone fit of
    y on x) — the non-parametric calibrator behind reward-model /
    quality-score calibration, where ``q_calibration``'s fixed deciles
    assume a bin width and PAV does not.

    Parallel PAV via mergeable run stacks: the (x, n, sum_y) DISTINCT-
    value histogram (pre-aggregated shuffle, never rows) range-sorts
    once; each block runs the stack PAV over its own rows and emits
    its pooled runs; the driver concatenates the per-block runs in x
    order and runs PAV once more over RUNS.  Correct because pooling
    depends only on each run's (n, sum): a solved segment's pooled
    runs are exactly the state the sequential stack would carry past
    that segment.  Driver state: O(total pooled runs) <= O(distinct x)
    worst case (strictly increasing data) — bin continuous scores
    upstream when distinct x is unbounded, as with ``best_split``.

    Returns one row per final pooled run: (x_start, x_end, n, rate)
    with rate = pooled mean of y, rounded to ``ndigits``."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "x": batch[x_col].astype("float64"),
                "y": batch[y_col].astype("float64"),
            }
        )

    hist = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["x"], {"n": ("x", "count"), "s": ("y", "sum")},
    ).sort("x").materialize()

    def block_pav(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "x0": pa.array([], pa.float64()),
                    "x1": pa.array([], pa.float64()),
                    "n": pa.array([], pa.float64()),
                    "s": pa.array([], pa.float64()),
                }
            )
        x = batch["x"].to_numpy(np.float64)
        x0, x1, n, s = _pav_runs(
            x, x,
            batch["n"].to_numpy(np.float64),
            batch["s"].to_numpy(np.float64),
        )
        return pa.table(
            {
                "x0": pa.array(x0, pa.float64()),
                "x1": pa.array(x1, pa.float64()),
                "n": pa.array(n, pa.float64()),
                "s": pa.array(s, pa.float64()),
            }
        )

    runs = hist.map_batches(
        block_pav, batch_format="pandas", batch_size=None
    ).to_pandas().sort_values("x0").reset_index(drop=True)
    x0, x1, n, s = _pav_runs(
        runs["x0"].to_numpy(), runs["x1"].to_numpy(),
        runs["n"].to_numpy(), runs["s"].to_numpy(),
    )
    return pd.DataFrame(
        {
            "x_start": x0,
            "x_end": x1,
            "n": n.astype(np.int64),
            "rate": np.round(s / n, ndigits),
        }
    )


def group_roc_auc(ds, key_col: str, score_col: str,
                  label_col: str, ndigits: int = 6):
    """Exact ROC AUC PER GROUP (midrank identity, ties-exact) — the
    per-segment model-quality audit (does the quality classifier hold
    up per language / per source?).

    The shuffle carries the (key, score, n_pos, n_neg) histogram
    (bucketed pre-aggregated, one row per distinct (key, score) pair,
    never events); each key then folds its AUC with one vectorized
    cumsum inside map_groups.  Partitioning assumption: one key's
    DISTINCT scores fit one group — the ``group_quantile_disc``
    contract; use the global ``roc_auc`` owner-block layout per key
    past that.  All sums are exact half-integer arithmetic, so a SQL
    window twin hashes equal."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        pos = batch[label_col].astype("int64")
        return pd.DataFrame(
            {
                "k": batch[key_col],
                "s": batch[score_col].astype("float64"),
                "pos": pos,
                "neg": 1 - pos,
            }
        )

    hist = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["k", "s"],
        {"n_pos": ("pos", "sum"), "n_neg": ("neg", "sum")},
    )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("s")
        npos = g["n_pos"].to_numpy(np.float64)
        nneg = g["n_neg"].to_numpy(np.float64)
        p, n = npos.sum(), nneg.sum()
        if p == 0 or n == 0:
            auc = np.nan
        else:
            cum_before = np.concatenate([[0.0], nneg.cumsum()[:-1]])
            auc = float(
                (npos * (cum_before + nneg / 2.0)).sum()
            ) / (p * n)
        return pd.DataFrame(
            {
                "k": [g["k"].iloc[0]],
                "auc": [round(auc, ndigits)],
                "n_pos": [np.int64(p)],
                "n_neg": [np.int64(n)],
            }
        )

    return hist.groupby("k").map_groups(fold, batch_format="pandas")


def grouped_isotonic_fit(ds, key_col: str, x_col: str, y_col: str,
                         ndigits: int = 6):
    """Isotonic regression PER GROUP (per-language / per-source
    calibration curves): least-squares monotone fit of y on x within
    each key.

    The (key, x, n, sum_y) histogram shuffle feeds ONE stack-PAV per
    key inside map_groups (each group is already whole, so no run
    merging is needed — the parallel-merge machinery of
    ``isotonic_fit`` is only for a single fit split across blocks).
    Partitioning assumption: one key's DISTINCT x values fit one
    group — the ``group_quantile_disc`` contract."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k": batch[key_col],
                "x": batch[x_col].astype("float64"),
                "y": batch[y_col].astype("float64"),
            }
        )

    hist = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["k", "x"], {"n": ("x", "count"), "s": ("y", "sum")},
    )

    def fold(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("x")
        x = g["x"].to_numpy(np.float64)
        x0, x1, n, s = _pav_runs(
            x, x,
            g["n"].to_numpy(np.float64),
            g["s"].to_numpy(np.float64),
        )
        return pd.DataFrame(
            {
                "k": g["k"].iloc[0],
                "x_start": x0,
                "x_end": x1,
                "n": n.astype(np.int64),
                "rate": np.round(s / n, ndigits),
            }
        )

    return hist.groupby("k").map_groups(fold, batch_format="pandas")


def naive_bayes_fit(ds, class_col: str, feature_cols: list[str],
                    alpha: float = 1.0) -> pd.DataFrame:
    """Categorical naive Bayes as pure counting: the model IS a
    grouped aggregation, so the fit is one melt + one bucketed count
    shuffle — no iterations, no row ever leaves its worker twice.

    Per batch each feature column melts to (feature, value, class)
    rows; ``bucketed_aggregate`` folds the counts; the closing table
    is O(sum of feature cardinalities x classes) — vocabulary-sized,
    the standard NB model size — so Laplace smoothing over the FULL
    value x class cross product (zero-count cells included) happens
    vectorized on the collected model table.

    Output rows: (feature, value, class, cnt, logp) with
    logp = ln(cnt + alpha) - ln(class_n + alpha * |values(feature)|),
    plus one ('__prior__', class, class, n, ln(n/N)) row per class.
    All inputs to the logs are exact integers (alpha folds in as a
    literal), so a SQL twin hash-matches at round(6).
    """
    from unfurl_ray.ops.relational import _arrow, bucketed_aggregate

    def melt(batch: pd.DataFrame) -> pa.Table:
        pieces = []
        cls = batch[class_col].astype(str)
        for f in feature_cols:
            pieces.append(
                pd.DataFrame(
                    {
                        "feature": f,
                        "value": batch[f].astype(str),
                        "class": cls,
                    }
                )
            )
        return _arrow(pd.concat(pieces, ignore_index=True))

    counts = bucketed_aggregate(
        ds.map_batches(melt, batch_format="pandas"),
        ["feature", "value", "class"], {"cnt": ("class", "count")},
    ).to_pandas()

    class_n = (
        counts[counts["feature"] == feature_cols[0]]
        .groupby("class")["cnt"].sum()
    )
    total = int(class_n.sum())

    # full cross product per feature: observed values x all classes
    frames = []
    for f, sub in counts.groupby("feature"):
        values = sub["value"].unique()
        nv = len(values)
        grid = pd.MultiIndex.from_product(
            [values, class_n.index], names=["value", "class"]
        ).to_frame(index=False)
        grid["feature"] = f
        grid = grid.merge(
            sub[["value", "class", "cnt"]], on=["value", "class"],
            how="left",
        )
        grid["cnt"] = grid["cnt"].fillna(0).astype(np.int64)
        grid["logp"] = np.log(
            grid["cnt"].to_numpy(np.float64) + alpha
        ) - np.log(
            class_n.reindex(grid["class"]).to_numpy(np.float64)
            + alpha * nv
        )
        frames.append(grid[["feature", "value", "class", "cnt", "logp"]])

    priors = pd.DataFrame(
        {
            "feature": "__prior__",
            "value": class_n.index,
            "class": class_n.index,
            "cnt": class_n.to_numpy(np.int64),
            "logp": np.log(class_n.to_numpy(np.float64))
            - np.log(float(total)),
        }
    )
    out = pd.concat(frames + [priors], ignore_index=True)
    return out.sort_values(
        ["feature", "value", "class"]
    ).reset_index(drop=True)


def kaplan_meier(ds, duration_col: str, event_col: str) -> pd.DataFrame:
    """Kaplan-Meier survival curve from (duration, event 0/1) rows:
    S(t) = prod over event times t_i <= t of (1 - d_i / n_i).

    Distributed shape: one ``bucketed_aggregate`` collapses the corpus
    to the (duration, deaths, observations) histogram — one row per
    DISTINCT duration, the bounded time axis — and the at-risk
    counts / cumulative product close vectorized on that tiny table.
    d_i and n_i are exact integers; the product accumulates in time
    order exactly like the SQL twin's ordered ``product()`` window,
    so round(6) hash-matches.

    Output: (t, n_risk, d, survival) at event times (d > 0) only —
    censoring-only times don't change S, per the KM estimator.
    """
    from unfurl_ray.ops.relational import bucketed_aggregate

    hist = bucketed_aggregate(
        ds, [duration_col],
        {"d": (event_col, "sum"), "c": (event_col, "count")},
    ).to_pandas().sort_values(duration_col).reset_index(drop=True)

    c = hist["c"].to_numpy(np.int64)
    total = int(c.sum())
    n_risk = total - np.concatenate(([0], np.cumsum(c)[:-1]))
    d = hist["d"].to_numpy(np.int64)
    keep = d > 0
    surv = np.cumprod(1.0 - d[keep] / n_risk[keep])
    return pd.DataFrame(
        {
            "t": hist.loc[keep, duration_col].to_numpy(np.int64),
            "n_risk": n_risk[keep].astype(np.int64),
            "d": d[keep],
            "survival": surv,
        }
    ).reset_index(drop=True)


def ols_fit(ds, y_col: str, x_cols: list[str],
            ridge: float = 0.0) -> pd.DataFrame:
    """Multi-feature least squares by normal equations — the
    one-pass, shuffle-free fit: each batch emits its (d+1)x(d+1)
    Gram partial X'X and moment vector X'y (flattened to one tiny
    row), the driver folds #blocks rows and solves.  ``ridge`` adds
    an L2 penalty on the non-intercept terms (closed form).

    Float partial sums mean the coefficients carry summation-order
    noise ~1e-12 relative — fine for a rows-only check + parity
    pytest, not for a hash-exact twin.

    Output: (term, coef) with term in ['intercept', *x_cols].
    """
    d = len(x_cols) + 1

    def partial(batch: pd.DataFrame) -> pa.Table:
        X = np.column_stack(
            [np.ones(len(batch))]
            + [batch[c].to_numpy(np.float64) for c in x_cols]
        )
        y = batch[y_col].to_numpy(np.float64)
        g = X.T @ X
        b = X.T @ y
        flat = np.concatenate([g.ravel(), b])
        return pa.table(
            {f"p{i}": pa.array([v], pa.float64())
             for i, v in enumerate(flat)}
        )

    parts = ds.map_batches(
        partial, batch_format="pandas"
    ).to_pandas()
    flat = parts.to_numpy(np.float64).sum(axis=0)
    G = flat[: d * d].reshape(d, d)
    b = flat[d * d:]
    if ridge:
        G = G + ridge * np.diag([0.0] + [1.0] * (d - 1))
    coef = np.linalg.solve(G, b)
    return pd.DataFrame(
        {"term": ["intercept"] + list(x_cols), "coef": coef}
    )


def naive_bayes_apply(ds, model: pd.DataFrame, feature_cols: list[str],
                      out_col: str = "predicted", alpha: float = 1.0):
    """Score a corpus with a fitted ``naive_bayes_fit`` model: per
    row, predicted class = argmax over classes of
    prior + sum of per-feature conditional logps, ties broken by
    ascending class name (the SQL row_number convention).

    The model is vocabulary-sized, so it ships in the task closure
    (pivoted to one value -> class-vector frame per feature) and each
    batch scores with one vectorized reindex per feature — model
    APPLY at 100 TB is a pure map, no shuffle.

    Adds ``out_col`` to the batch.  A feature value absent from the
    model (never seen at fit time) contributes the smoothed
    zero-count conditional ln(alpha) - ln(class_n + alpha * nv) for
    each class — the same cell ``naive_bayes_fit`` would have emitted
    for a zero-count (value, class) pair; ``alpha`` must match the
    fit's.  Because the model carries the FULL value x class grid per
    feature, a reindex miss is all-or-nothing per row, so the
    substitution is one vectorized row assignment.
    """
    classes = sorted(
        model.loc[model["feature"] == "__prior__", "class"]
    )
    prior_rows = (
        model[model["feature"] == "__prior__"].set_index("class")
    )
    prior = (
        prior_rows["logp"].reindex(classes).to_numpy(np.float64)
    )
    class_n = (
        prior_rows["cnt"].reindex(classes).to_numpy(np.float64)
    )
    tables = {}
    zero_logp = {}
    for f in feature_cols:
        sub = model[model["feature"] == f]
        tables[f] = sub.pivot(
            index="value", columns="class", values="logp"
        )[classes]
        nv = sub["value"].nunique()
        with np.errstate(divide="ignore"):
            zero_logp[f] = np.log(alpha) - np.log(
                class_n + alpha * nv
            )

    cls_arr = np.array(classes, dtype=object)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        total = np.tile(prior, (len(batch), 1))
        for f in feature_cols:
            m = (
                tables[f]
                .reindex(batch[f].astype(str))
                .to_numpy(np.float64)
            )
            miss = np.isnan(m[:, 0])
            if miss.any():
                m[miss] = zero_logp[f]
            total = total + m
        out = batch.copy()
        out[out_col] = cls_arr[np.argmax(total, axis=1)]
        return out

    return ds.map_batches(score, batch_format="pandas")


def gmm_fit(ds, value_col: str, k: int = 3, iters: int = 15):
    """Distributed EM for a 1-D Gaussian mixture: every iteration is
    ONE pass of plain Ray tasks over the materialized projected
    blocks (the kmeans_fit pattern — no per-pass Dataset scheduling),
    each block returning 3k+1 floats of E-step sufficient statistics
    (per-component responsibility sums, Σ r·x, Σ r·x², block
    log-likelihood); the driver folds them in deterministic block
    order and runs the closed-form M-step.  Init is deterministic
    and data-derived: one moments pass sets equally spaced means
    across ±1σ, shared variance, uniform weights.

    Returns (params DataFrame [component, weight, mean, var],
    log-likelihood history list)."""
    import ray

    proj = ds.select_columns([value_col]).materialize()
    block_refs = proj.to_arrow_refs()

    @ray.remote
    def _moments(block: pa.Table):
        if block.num_rows == 0 or value_col not in block.column_names:
            return 0.0, 0.0, 0
        x = block.column(value_col).to_numpy(zero_copy_only=False)
        x = x.astype(np.float64)
        return float(x.sum()), float((x * x).sum()), len(x)

    s1, s2, n = 0.0, 0.0, 0
    for a, b, c in ray.get([_moments.remote(r) for r in block_refs]):
        s1, s2, n = s1 + a, s2 + b, n + c
    if n == 0:
        raise ValueError("gmm_fit: empty input")
    mean = s1 / n
    var = max(s2 / n - mean * mean, 1e-12)
    sd = var ** 0.5
    mu = mean + sd * np.linspace(-1.0, 1.0, k)
    vr = np.full(k, var)
    w = np.full(k, 1.0 / k)

    @ray.remote
    def _estep(block: pa.Table, w, mu, vr):
        if block.num_rows == 0 or value_col not in block.column_names:
            kk = len(w)
            return (np.zeros(kk), np.zeros(kk), np.zeros(kk), 0.0)
        x = block.column(value_col).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)[:, None]
        logp = (
            -0.5 * ((x - mu) ** 2 / vr + np.log(2.0 * np.pi * vr))
            + np.log(w)
        )
        m = logp.max(axis=1, keepdims=True)
        p = np.exp(logp - m)
        tot = p.sum(axis=1, keepdims=True)
        r = p / tot
        ll = float((m[:, 0] + np.log(tot[:, 0])).sum())
        return (
            r.sum(axis=0),
            (r * x).sum(axis=0),
            (r * x * x).sum(axis=0),
            ll,
        )

    history = []
    for _ in range(iters):
        parts = ray.get(
            [_estep.remote(b, w, mu, vr) for b in block_refs]
        )
        R = np.zeros(k)
        RX = np.zeros(k)
        RX2 = np.zeros(k)
        ll = 0.0
        for r_, rx_, rx2_, l_ in parts:
            R += r_
            RX += rx_
            RX2 += rx2_
            ll += l_
        history.append(ll)
        nz = R > 0
        w = np.where(nz, R / n, w)
        mu = np.where(nz, RX / np.maximum(R, 1e-300), mu)
        vr = np.maximum(
            np.where(
                nz,
                RX2 / np.maximum(R, 1e-300) - (
                    RX / np.maximum(R, 1e-300)
                ) ** 2,
                vr,
            ),
            1e-12,
        )

    params = pd.DataFrame(
        {
            "component": np.arange(k, dtype=np.int64),
            "weight": w,
            "mean": mu,
            "var": vr,
        }
    )
    return params, history
