"""Constraint validation — the expectations gate a pipeline runs
before promoting a snapshot.

Each rule is one vectorized pass; nothing materializes on the driver
but per-rule violation COUNTS:

* ``not_null`` / ``in_range`` / ``in_set``: per-batch boolean kernels
  folded with a tiny sum aggregate;
* ``unique``: duplicate count rides the (value, count) histogram
  shuffle (bounded by distinct keys) — violations = sum(cnt - 1);
* ``ref``: referential integrity against another table via a
  broadcast key set below a threshold (Bloom + exact check is the
  drop-in above it — see ops/sketch.bloom_semi_join).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def validate_table(ds, rules: list[dict], ref_keys=None) -> pd.DataFrame:
    """Run ``rules`` over ``ds``; returns (rule, violations).

    Rule forms:
      {"rule": "r1", "kind": "not_null", "col": c}
      {"rule": ..., "kind": "in_range", "col": c, "lo": x, "hi": y}
      {"rule": ..., "kind": "in_set",   "col": c, "values": [...]}
      {"rule": ..., "kind": "unique",   "col": c}
      {"rule": ..., "kind": "ref",      "col": c}   (FK ⊆ ref_keys)

    ``ref_keys``: a ``ray.ObjectRef`` to the referenced key array
    (broadcast once), required iff a ``ref`` rule is present.
    """
    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_aggregate, pre_aggregate,
    )

    ds = ds.materialize()
    scalar_rules = [
        r for r in rules
        if r["kind"] in ("not_null", "in_range", "in_set", "ref")
    ]
    unique_rules = [r for r in rules if r["kind"] == "unique"]

    def check(batch: pd.DataFrame, ref=None) -> pa.Table:
        names, viols = [], []
        keys = _broadcast_fetch(ref) if ref is not None else None
        for r in scalar_rules:
            col = batch[r["col"]]
            # SQL-twin NULL semantics: NULL is a violation ONLY under
            # not_null — CASE/NOT IN predicates skip NULL rows, so the
            # range/enum/ref counters must too
            if r["kind"] == "not_null":
                bad = col.isna()
            elif r["kind"] == "in_range":
                v = col.to_numpy()
                bad = col.notna().to_numpy() & ~(
                    (v >= r["lo"]) & (v <= r["hi"])
                )
            elif r["kind"] == "in_set":
                bad = col.notna() & ~col.isin(r["values"])
            else:  # ref
                bad = col.notna() & ~col.isin(keys)
            names.append(r["rule"])
            viols.append(int(np.asarray(bad).sum()))
        return pa.table(
            {
                "rule": pa.array(names, pa.string()),
                "violations": pa.array(viols, pa.int64()),
            }
        )

    parts = []
    if scalar_rules:
        parts.append(
            pre_aggregate(
                ds.map_batches(check, batch_format="pandas",
                               fn_kwargs={"ref": ref_keys}),
                ["rule"], {"violations": ("violations", "sum")},
            ).to_pandas()
        )

    for r in unique_rules:
        hist = bucketed_aggregate(
            ds, [r["col"]], {"cnt": (r["col"], "count")},
        )

        def dups(batch: pd.DataFrame, r=r) -> pa.Table:
            extra = batch["cnt"].to_numpy(dtype=np.int64) - 1
            return pa.table(
                {
                    "rule": pa.array([r["rule"]], pa.string()),
                    "violations": pa.array(
                        [int(extra[extra > 0].sum())], pa.int64()
                    ),
                }
            )

        parts.append(
            pre_aggregate(
                hist.map_batches(dups, batch_format="pandas"),
                ["rule"], {"violations": ("violations", "sum")},
            ).to_pandas()
        )

    out = pd.concat(parts, ignore_index=True)
    out["violations"] = out["violations"].astype("int64")
    return out.sort_values("rule").reset_index(drop=True)
