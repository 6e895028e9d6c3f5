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
