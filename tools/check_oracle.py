"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry at the given sf_dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + order-insensitive values (columns sorted by name, rows
sorted by all columns, NaN/None unified).  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].map(
                lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v
            )
        try:
            if str(df[col].dtype).startswith(("datetime", "Int")):
                df[col] = df[col].astype("object").where(df[col].notna(), None)
        except TypeError:
            pass
    df = df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> str:
    if len(got) != len(want):
        return f"ROWS {len(got)} vs {len(want)}"
    if sorted(got.columns) != sorted(want.columns):
        return f"SCHEMA {sorted(got.columns)} vs {sorted(want.columns)}"
    g, w = canon(got), canon(want)
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if abs(a - b) < 1e-9:
                    continue
            if pd.isna(a) and pd.isna(b):
                continue
            if hasattr(a, "timestamp") and hasattr(b, "timestamp"):
                if a == b:
                    continue
            if a != b:
                return f"VALUE col={col} row={i}: {a!r} vs {b!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    times: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:
            import traceback
            traceback.print_exc()
            print(f"{name}: RAY ERROR {exc!r}")
            failures += 1
            continue
        elapsed = time.time() - t0
        times[name] = round(elapsed, 2)
        if name in oracles:
            try:
                want = con.execute(oracles[name]).fetchdf()
            except Exception as exc:
                print(f"{name}: ORACLE ERROR {exc!r}")
                failures += 1
                continue
            verdict = compare(name, got, want)
        else:
            verdict = f"rows-only ({len(got)} rows)"
        status = "PASS" if verdict == "OK" or verdict.startswith("rows-only") else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name}: {status} [{elapsed:.1f}s] {verdict}")

    # timing-regression section (full runs only, advisory): flag any
    # query >3x its recorded baseline AFTER dividing out the run's
    # median drift ratio — this host swings 2-3x between windows, so
    # raw thresholds false-positive; the median ratio is the window's
    # drift and a true regression stands out against it.  Baseline is
    # written on first full run or with GATE_WRITE_TIMES=1.
    if not only and times:
        import json

        base_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "gate_times.json",
        )
        if os.path.exists(base_path):
            with open(base_path) as fh:
                base = json.load(fh)
            ratios = {
                n: times[n] / base[n]
                for n in times
                if n in base and base[n] >= 0.3 and times[n] >= 1.0
            }
            if ratios:
                vals = sorted(ratios.values())
                med = vals[len(vals) // 2]
                flags = {
                    n: r for n, r in ratios.items()
                    if r > 3.0 * max(med, 0.5)
                }
                print(
                    f"timing check: median drift x{med:.2f}, "
                    f"{len(flags)} regression flags "
                    f"(>3x drift-adjusted baseline)"
                )
                for n, r in sorted(
                    flags.items(), key=lambda kv: -kv[1]
                ):
                    print(
                        f"  TIMING {n}: {times[n]:.1f}s vs baseline "
                        f"{base[n]:.1f}s (x{r:.1f})"
                    )
        if os.environ.get("GATE_WRITE_TIMES") or not os.path.exists(
            base_path
        ):
            with open(base_path, "w") as fh:
                json.dump(times, fh, indent=1, sort_keys=True)
            print(f"timing baseline written: {base_path}")

    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
