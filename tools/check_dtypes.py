"""Audit per-query column DTYPE KINDS: Ray result vs DuckDB oracle.

The local value-wise gate (tools/check_oracle.py) treats int 5 and
float 5.0 as equal, but a stringifying value-hash ("5" vs "5.0",
"<NA>" vs "nan") does not — DuckDB promotes sum()/HUGEINT and
NULL-padded int columns to float64 in pandas, so any int64 kernel
column paired with such an oracle column is a latent hash mismatch.
This runs every oracle query at sf0.001 (fast; also catches
tiny-scale crashes) and reports kind-level mismatches per column.
"""
import sys

import duckdb
import pandas as pd
import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8,
                 include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, ".")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"parquet_scan('{sf}/{t}.parquet')"
        )
    qs, osql = e.queries(), e.oracle_sql()
    norm = lambda k: "i" if k in "iu" else k
    bad = []
    for name, fn in sorted(qs.items()):
        if name not in osql:
            continue
        try:
            r = fn(sf)
            if not isinstance(r, pd.DataFrame):
                r = r.to_pandas()
            o = con.execute(osql[name]).df()
            for c in r.columns:
                if c not in o.columns:
                    bad.append((name, f"col {c} missing in oracle"))
                elif norm(r[c].dtype.kind) != norm(o[c].dtype.kind):
                    bad.append(
                        (name, f"col {c}: ray {r[c].dtype} "
                               f"vs oracle {o[c].dtype}")
                    )
        except Exception as exc:
            # record and continue — one malformed result (duplicate
            # column labels etc.) must not abort the whole audit
            bad.append((name, f"ERR {exc!r:.100}"))
            continue
    for b in bad:
        print("MISMATCH", *b)
    print(f"done, {len(bad)} mismatches")
    ray.shutdown()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
