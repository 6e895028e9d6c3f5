"""Named query pipelines over the driver testdata tables.

Each function takes ``sf_dir`` and returns a Dataset / DataFrame —
these back ``__ray_entry__.queries()`` and are verified against DuckDB
oracles (``__ray_entry__.oracle_sql()``) by the driver at sf=0.01.

Every pipeline is Ray-Data-first: column-pruned reads, vectorized
batch kernels, broadcast small sides, partial pre-aggregation before
any groupby shuffle, and explicit top-k instead of full sorts where
possible.  Float outputs are rounded so value-hash comparison against
DuckDB's double arithmetic is stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _rd():
    import ray.data as rd

    return rd


def _parquet(sf_dir: str, table: str, columns=None, num_blocks=None):
    """Pruned read with an explicit METADATA-FREE schema: the testdata
    parquet files embed a pandas-metadata dict, which Ray can't hash
    for schema dedup — every read/reduce task then logs "Failed to
    hash the schemas", burying real warnings.

    ``num_blocks``: shuffle-heavy consumers should size blocks by
    BYTES (Ray's sort makes #input-blocks range partitions and
    blocks^2 store fragments — see BASELINE.md "fragment pathology");
    pass e.g. ``max(8, file_bytes // (64 << 20))``.  CPU-heavy
    map-only consumers should leave the default (more blocks = more
    task parallelism)."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    full = pq.read_schema(path).remove_metadata()
    schema = (
        pa.schema([full.field(c) for c in columns]) if columns else full
    )
    kw = {"override_num_blocks": num_blocks} if num_blocks else {}
    return _rd().read_parquet(path, columns=columns, schema=schema, **kw)


def _parquet_sh(sf_dir: str, table: str, columns=None):
    """_parquet with BYTE-sized blocks (64 MB target, floor 8) for
    shuffle-bound consumers: Ray's auto-parallelism splits small files
    into ~2xCPU micro-blocks, and every downstream sort then pays
    #blocks range partitions and #blocks^2 store fragments.  At 100 TB
    the same formula yields thousands of blocks, so nothing is lost at
    scale.  Keep plain _parquet for CPU-heavy map stages (shingling,
    scoring) where task parallelism matters more than sort overhead."""
    import os

    sz = os.path.getsize(f"{sf_dir}/{table}.parquet")
    return _parquet(
        sf_dir, table, columns, num_blocks=max(8, sz // (64 << 20))
    )


def _cache_tag(sf_dir: str, label: str, *tables: str) -> str:
    """Cache key for /tmp-materialized layouts derived from testdata:
    includes each source parquet's (size, mtime_ns) fingerprint so a
    REGENERATED table at the same path invalidates the cache instead
    of silently serving the previous corpus's layout."""
    import hashlib
    import os

    parts = [os.path.abspath(sf_dir), label, "v2"]
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        st = os.stat(p)
        parts.append(f"{t}:{st.st_size}:{st.st_mtime_ns}")
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def _footer_ts_bounds(sf_dir: str, table: str, col: str):
    """(min, max) of a timestamp column from parquet FOOTER statistics
    — a metadata-only read (row-group stats), no data scan.  At 100 TB
    this touches one footer per file instead of every row.  Returns
    None when any row group lacks stats (caller falls back to an
    aggregate)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f"{sf_dir}/{table}.parquet").metadata
    lo = hi = None
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        for i in range(rg.num_columns):
            c = rg.column(i)
            if c.path_in_schema != col:
                continue
            st = c.statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (lo, hi)


# -- relational core --------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: grouped sums/avgs with partial pre-aggregation
    (one row per key per batch crosses the shuffle, not 6M rows)."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount"],
    )

    def revenue(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return batch.append_column("disc_price", disc_price)

    ds = ds.map_batches(revenue, batch_format="pyarrow")
    out = pre_aggregate(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "count_order": ("l_quantity", "count"),
        },
    ).to_pandas()
    out["avg_qty"] = (out["sum_qty"] / out["count_order"]).round(2)
    out["avg_price"] = (out["sum_base_price"] / out["count_order"]).round(2)
    for col in ("sum_qty", "sum_base_price", "sum_disc_price"):
        out[col] = out[col].round(2)
    out["count_order"] = out["count_order"].astype("int64")
    return out


def q6_filter_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q6 shape: pruned read + vectorized filter + one aggregate."""
    ds = _parquet(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("l_discount"), 0.05),
                pc.less_equal(batch.column("l_discount"), 0.07),
            ),
            pc.less(batch.column("l_quantity"), 24.0),
        )
        t = batch.filter(mask)
        rev = pc.sum(
            pc.multiply(t.column("l_extendedprice"), t.column("l_discount"))
        ).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], pa.float64())})

    total = (
        _sum_scalar(ds.map_batches(partial, batch_format="pyarrow"), "rev")
    )
    return pd.DataFrame({"revenue": [round(total, 2)]})


def _sum_scalar(ds, col: str) -> float:
    from ray.data.aggregate import Sum

    result = ds.aggregate(Sum(col, alias_name="s"))
    return result["s"] if isinstance(result, dict) else result


def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Top-15 orders by totalprice (tie-broken), via sort+limit."""
    ds = _parquet_sh(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = (
        ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False])
        .limit(15)
        .to_pandas()
    )
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out


def q_segment_revenue(sf_dir: str) -> pd.DataFrame:
    """orders x customer broadcast hash join -> revenue per segment."""
    from unfurl_ray.ops.relational import broadcast_join, pre_aggregate

    customer = _parquet(
        sf_dir, "customer", ["c_custkey", "c_mktsegment"]
    ).to_pandas().rename(columns={"c_custkey": "o_custkey"})
    orders = _parquet_sh(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, customer, on="o_custkey")
    out = pre_aggregate(
        joined, ["c_mktsegment"],
        {"revenue": ("o_totalprice", "sum"),
         "n_orders": ("o_totalprice", "count")},
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def q_nation_balance(sf_dir: str) -> pd.DataFrame:
    """supplier x nation x region broadcast joins -> balance per nation."""
    from unfurl_ray.ops.relational import broadcast_join, pre_aggregate

    nation = _parquet(sf_dir, "nation").to_pandas()
    region = _parquet(sf_dir, "region").to_pandas()
    dim = nation.merge(
        region, left_on="n_regionkey", right_on="r_regionkey"
    )[["n_nationkey", "n_name", "r_name"]].rename(
        columns={"n_nationkey": "s_nationkey"}
    )
    supplier = _parquet(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    joined = broadcast_join(supplier, dim, on="s_nationkey")
    out = pre_aggregate(
        joined, ["r_name", "n_name"],
        {"total_bal": ("s_acctbal", "sum"),
         "n_suppliers": ("s_acctbal", "count")},
    ).to_pandas()
    out["total_bal"] = out["total_bal"].round(2)
    out["n_suppliers"] = out["n_suppliers"].astype("int64")
    return out


def q_order_lineitem_join(sf_dir: str) -> pd.DataFrame:
    """Large-large hash join (Dataset.join) -> rows per order status.

    Join partitions are sized by BYTES (~256 MB of input each, floor
    8): measured at sf0.1, per-partition overhead dominates small
    inputs (8 parts: 3.2 s, 16: 4.2 s, 32: 6.8 s, 64: 15.9 s at 32
    CPUs), while at 100 TB the byte rule is what keeps a partition's
    hash table within a worker's heap.
    """
    import os

    from unfurl_ray.ops.relational import pre_aggregate

    in_bytes = sum(
        os.stat(f"{sf_dir}/{t}.parquet").st_size
        for t in ("lineitem", "orders")
    )
    num_partitions = max(8, in_bytes // (256 << 20))
    lineitem = _parquet_sh(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _parquet_sh(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = lineitem.join(
        orders,
        join_type="inner",
        num_partitions=int(num_partitions),
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    out = pre_aggregate(
        joined, ["o_orderstatus"],
        {"n_items": ("l_quantity", "count"),
         "sum_qty": ("l_quantity", "sum")},
    ).to_pandas()
    out["sum_qty"] = out["sum_qty"].round(2)
    out["n_items"] = out["n_items"].astype("int64")
    return out


def q_semi_join(sf_dir: str) -> pd.DataFrame:
    """Orders having any lineitem with quantity >= 49 (broadcast semi)."""
    from unfurl_ray.ops.relational import pre_aggregate, semi_join

    lineitem = _parquet_sh(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    keys = (
        lineitem.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column("l_quantity"), 49.0)
            ).select(["l_orderkey"]),
            batch_format="pyarrow",
        )
        .unique("l_orderkey")
    )
    orders = _parquet_sh(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    hits = semi_join(orders, keys, on="o_orderkey")
    out = pre_aggregate(
        hits, ["o_orderstatus"], {"n_orders": ("o_orderkey", "count")}
    ).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def q_anti_join(sf_dir: str) -> pd.DataFrame:
    """Customers with no orders (broadcast anti join) -> count."""
    from unfurl_ray.ops.relational import semi_join

    order_custs = _parquet_sh(sf_dir, "orders", ["o_custkey"]).unique("o_custkey")
    customer = _parquet_sh(sf_dir, "customer", ["c_custkey"])
    lonely = semi_join(
        customer.map_batches(
            lambda b: b.rename_columns(["o_custkey"]), batch_format="pyarrow"
        ),
        order_custs,
        on="o_custkey",
        anti=True,
    )
    return pd.DataFrame({"n_customers": [int(lonely.count())]})


def q_distinct_event_types(sf_dir: str) -> pd.DataFrame:
    ds = _parquet_sh(sf_dir, "events", ["event_type"])
    values = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": values})


def q_events_window(sf_dir: str) -> pd.DataFrame:
    """Tumbling 1-hour windows per event_type: counts + sums."""
    from unfurl_ray.ops.relational import tumbling_window

    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type", "value"])
    out = tumbling_window(
        ds, ts_col="ts", key_col="event_type", width_s=3600,
        value_col="value",
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    out["n_events"] = out["n_events"].astype("int64")
    return out


def q_sessionize(sf_dir: str) -> pd.DataFrame:
    """30-minute-gap sessions per user -> sessions per user.  The
    rollup over session stubs is one vectorized ``pre_aggregate``
    shuffle (count + sum), never a Python call per user."""
    from unfurl_ray.ops.relational import pre_aggregate, sessionize

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])
    sessions = sessionize(ds, ts_col="ts", key_col="user_id", gap_s=1800)
    out = pre_aggregate(
        sessions,
        ["user_id"],
        {
            "n_sessions": ("n_events", "count"),
            "n_events": ("n_events", "sum"),
        },
    ).to_pandas()
    out["n_sessions"] = out["n_sessions"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_group_hll_users(sf_dir: str) -> pd.DataFrame:
    """Per-event-type distinct users ESTIMATED by grouped HLL — the
    sketch scale path of q_distinct_users (whose exact pair-collapse
    this pytest-checks against within the sketch error bound).
    Rows-only: sketch estimates have no SQL twin."""
    from unfurl_ray.ops.sketch import grouped_hll_distinct

    ds = _parquet_sh(sf_dir, "events", ["event_type", "user_id"])
    out = grouped_hll_distinct(ds, "event_type", "user_id")
    out["n_distinct_est"] = out["n_distinct_est"].round(1)
    return out


def q_range_join(sf_dir: str) -> pd.DataFrame:
    """Interval join of event values against OVERLAPPING tier bands
    (the 'promo' band straddles mid/high, so one event can land in two
    tiers — true many-to-many range-join semantics), aggregated per
    tier.  The tier table is the broadcast side."""
    from unfurl_ray.ops.relational import pre_aggregate, range_join

    tiers = pd.DataFrame(
        {
            "tier": ["low", "mid", "high", "promo"],
            "lo": [0.0, 10.0, 100.0, 50.0],
            "hi": [10.0, 100.0, 1e12, 150.0],
        }
    )
    ds = _parquet_sh(sf_dir, "events", ["event_id", "value"])
    joined = range_join(ds, tiers, "value")
    out = pre_aggregate(
        joined, ["tier"],
        {"n_events": ("value", "count"), "sum_value": ("value", "sum")},
    ).to_pandas()
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("tier").reset_index(drop=True)


def q_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact grouped COUNT DISTINCT, two-level: batches pre-distinct,
    the shuffle carries (event_type, user_id) pairs once per batch,
    never a per-key user set."""
    from unfurl_ray.ops.relational import distinct_count_by

    ds = _parquet_sh(sf_dir, "events", ["event_type", "user_id"])
    out = distinct_count_by(
        ds, "event_type", "user_id", "n_users"
    ).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_pivot_events(sf_dir: str) -> pd.DataFrame:
    """Per-user crosstab of the five event types — fan-out vectorized
    in-batch, one partial row per (user, batch) through the shuffle."""
    from unfurl_ray.ops.relational import pivot_counts

    cats = ["click", "error", "purchase", "signup", "view"]
    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])
    out = pivot_counts(ds, "user_id", "event_type", cats).to_pandas()
    for c in cats:
        out[f"n_{c}"] = out[f"n_{c}"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_unpivot(sf_dir: str) -> pd.DataFrame:
    """UNPIVOT: the per-user event-type crosstab melted back to
    (user_id, event_type, n) long rows — wide-to-long without a
    shuffle (each long row derives from one wide row).  Hash-exact
    DuckDB UNPIVOT twin."""
    from unfurl_ray.ops.relational import pivot_counts, unpivot

    cats = ["click", "error", "purchase", "signup", "view"]
    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])
    wide = pivot_counts(ds, "user_id", "event_type", cats)
    out = unpivot(
        wide, ["user_id"], [f"n_{c}" for c in cats],
        name_col="event_type", value_col="n",
    ).to_pandas()
    out["event_type"] = out["event_type"].str.removeprefix("n_")
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )


def q_stream_dedup(sf_dir: str) -> pd.DataFrame:
    """Incremental cross-run dedup through the sharded index: even
    doc_ids ingest as 'day 1', odd as 'day 2'; each day reports rows
    seen vs rows admitted.  Exactly-one-admission-per-hash makes the
    counts deterministic even though batches race, so the oracle is
    exact SQL over md5(text)."""
    from unfurl_ray.ops.stream_dedup import ShardedDedupIndex

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def day_slice(parity: int):
        def f(batch: pa.Table) -> pa.Table:
            keep = pc.equal(
                pc.bit_wise_and(batch.column("doc_id"), 1), parity
            )
            return batch.filter(keep)

        return f

    index = ShardedDedupIndex(n_shards=4)
    rows = []
    for day in (1, 2):  # day 1 fully ingested before day 2 starts
        day_ds = ds.map_batches(
            day_slice(day - 1), batch_format="pyarrow"
        )
        n_in = day_ds.count()
        n_new = index.filter_new(day_ds).count()
        rows.append({"day": day, "n_in": n_in, "n_new": n_new})
    out = pd.DataFrame(rows)
    return out.astype({"day": "int64", "n_in": "int64", "n_new": "int64"})


def q_bucketed_join(sf_dir: str) -> pd.DataFrame:
    """Shuffle-free co-located join on a shared bucketed layout: both
    tables are materialized ONCE hive-partitioned by
    hash(orderkey) % 16 (the write is the only exchange, cached across
    calls like the IVF index); the join itself is one task per bucket
    reading only its own directories — at 100 TB this is the layout
    you write once and join against forever."""
    import hashlib
    import os
    import tempfile

    from unfurl_ray.ops.layout import bucketed_join, write_bucketed
    from unfurl_ray.ops.relational import pre_aggregate

    nb = 16
    tag = _cache_tag(sf_dir, f"layout{nb}", "orders", "lineitem")
    root = os.path.join(tempfile.gettempdir(), f"unfurl_ray_layout_{tag}")
    orders_path = os.path.join(root, "orders")
    items_path = os.path.join(root, "lineitem")

    def rekey(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["o_orderkey", "l_quantity"])

    if not os.path.isdir(orders_path):
        import shutil

        shutil.rmtree(orders_path + ".tmp", ignore_errors=True)
        write_bucketed(
            _parquet_sh(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]),
            "o_orderkey", orders_path + ".tmp", nb,
        )
        os.rename(orders_path + ".tmp", orders_path)
    if not os.path.isdir(items_path):
        import shutil

        shutil.rmtree(items_path + ".tmp", ignore_errors=True)
        write_bucketed(
            _parquet_sh(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
            .map_batches(rekey, batch_format="pyarrow"),
            "o_orderkey", items_path + ".tmp", nb,
        )
        os.rename(items_path + ".tmp", items_path)

    joined = bucketed_join(orders_path, items_path, "o_orderkey", nb)
    out = pre_aggregate(
        joined, ["o_orderstatus"],
        {
            "n_items": ("l_quantity", "count"),
            "sum_qty": ("l_quantity", "sum"),
        },
    ).to_pandas()
    out["n_items"] = out["n_items"].astype("int64")
    out["sum_qty"] = out["sum_qty"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def q_full_outer_join(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join of two derived per-user summaries (purchase
    spend of users with id % 3 != 0 vs click counts of users with
    id % 2 == 0 — parity filters force unmatched keys on BOTH ends
    at EVERY scale factor, unlike absolute id cutoffs).  Same
    one-shuffle bucket-co-partitioned join as the inner variant: a
    key's rows from both sides share a bucket, so unmatched rows
    null-pad locally with typed Arrow nulls — no second pass, no
    broadcast."""
    import pyarrow.compute as pc

    from unfurl_ray.ops.relational import (
        bucketed_aggregate, bucketed_hash_join,
    )

    ds = _parquet_sh(
        sf_dir, "events", ["user_id", "event_type", "value"]
    )

    def side_filter(etype: str, mod: int, want_zero: bool):
        def f(b: pa.Table) -> pa.Table:
            u = b.column("user_id").to_numpy(zero_copy_only=False)
            par = (u % mod == 0) == want_zero
            return b.filter(
                pc.and_(
                    pc.equal(b.column("event_type"), etype),
                    pa.array(par),
                )
            )

        return f

    a = bucketed_aggregate(
        ds.map_batches(
            side_filter("purchase", 3, False),
            batch_format="pyarrow",
        ),
        ["user_id"], {"spend": ("value", "sum")},
    ).map_batches(
        # floor(x*100 + 0.5)/100: the repo's half-up convention —
        # bit-identical on both engines (see q_quality oracle notes)
        lambda b: b.set_column(
            b.schema.get_field_index("spend"), "spend",
            pa.array(
                np.floor(
                    b.column("spend").to_numpy(zero_copy_only=False)
                    * 100.0 + 0.5
                ) / 100.0,
                pa.float64(),
            ),
        ),
        batch_format="pyarrow",
    )
    b = bucketed_aggregate(
        ds.map_batches(
            side_filter("click", 2, True),
            batch_format="pyarrow",
        ),
        ["user_id"], {"n_clicks": ("value", "count")},
    )
    out = bucketed_hash_join(
        a, b, on="user_id", right_on="user_id", how="outer"
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_skew_join(sf_dir: str) -> pd.DataFrame:
    """Hybrid skew-safe join: lineitems of orders with >= 6 items
    ('hot' keys) join by broadcast, the rest through the hash join;
    results aggregate per order status.  Same rows as a plain SQL
    join, so the oracle is exact."""
    from unfurl_ray.ops.relational import pre_aggregate
    from unfurl_ray.ops.skew import skew_join

    items = _parquet_sh(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _parquet_sh(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    joined = skew_join(
        items, orders, on="l_orderkey", right_on="o_orderkey",
        hot_threshold=6,
    )
    out = pre_aggregate(
        joined, ["o_orderstatus"],
        {
            "n_items": ("l_quantity", "count"),
            "sum_qty": ("l_quantity", "sum"),
        },
    ).to_pandas()
    out["n_items"] = out["n_items"].astype("int64")
    out["sum_qty"] = out["sum_qty"].round(2)
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def q_rollup_revenue(sf_dir: str) -> pd.DataFrame:
    """OLAP rollup in ONE shuffle: GROUP BY ROLLUP(o_orderpriority,
    o_orderstatus) — each batch fans out partial rows for every level
    (detail, per-priority subtotal, grand total), so the shuffle moves
    stub rows only and all levels share a single groupby."""
    from unfurl_ray.ops.relational import rollup_aggregate

    ds = _parquet(
        sf_dir, "orders",
        ["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )
    out = rollup_aggregate(
        ds,
        ["o_orderpriority", "o_orderstatus"],
        {
            "n_orders": ("o_totalprice", "count"),
            "sum_price": ("o_totalprice", "sum"),
        },
    ).to_pandas()
    out["n_orders"] = out["n_orders"].astype("int64")
    out["sum_price"] = out["sum_price"].round(2)
    return out.sort_values(
        ["o_orderpriority", "o_orderstatus"]
    ).reset_index(drop=True)


def q_event_deltas(sf_dir: str) -> pd.DataFrame:
    """Per-user ordered window functions: LAG time delta + trailing
    3-row rolling max, via one groupby(user).map_groups pass over the
    (ts, event_id)-sorted stream.  Both outputs are exact (an int64
    difference; a copied input double), so the DuckDB window twin
    hash-matches with no rounding."""
    from unfurl_ray.ops.relational import lag_rolling

    ds = _parquet_sh(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = lag_rolling(
        ds, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", roll_n=3,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_ntile_curriculum(sf_dir: str) -> pd.DataFrame:
    """Length-based curriculum buckets: NTILE(4) per language over
    (n_tokens, doc_id).  Exact distributed rank via ntile_by's
    histogram-offset decomposition — no group ever holds one
    language's rows, only one (lang, n_tokens) tie-class."""
    import pyarrow.compute as pc

    from unfurl_ray.ops.relational import ntile_by

    ds = _parquet(sf_dir, "documents", ["doc_id", "lang", "text"])

    def toks(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column("text"), "")
        n = pc.cast(pc.count_substring_regex(col, r"\S+"), pa.int64())
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang": batch.column("lang"),
                "n_tokens": n,
            }
        )

    out = ntile_by(
        ds.map_batches(toks, batch_format="pyarrow"),
        part_col="lang", order_col="n_tokens", id_col="doc_id", k=4,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_vocab_spectrum(sf_dir: str) -> pd.DataFrame:
    """Vocabulary frequency spectrum (frequency-of-frequencies, the
    Zipf tail profile): per-batch partial word counts -> word groupby
    sum -> per-batch partial spectrum -> tiny freq groupby.  Shuffle 1
    carries one row per distinct word per batch (never the text);
    shuffle 2 one row per distinct frequency per block."""
    import re as _re
    from collections import Counter

    from ray.data.aggregate import Sum

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws  # shared token contract
    ds = _parquet(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch.column("text").to_pylist():
            counts.update(
                w for w in _ws.split((text or "").lower()) if w
            )
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    word_counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    def spectrum(batch: pa.Table) -> pa.Table:
        freq, n_words = np.unique(
            batch.column("n").to_numpy(), return_counts=True
        )
        return pa.table(
            {
                "freq": pa.array(freq.astype(np.int64), pa.int64()),
                "n_words": pa.array(n_words.astype(np.int64), pa.int64()),
            }
        )

    out = (
        word_counts.map_batches(spectrum, batch_format="pyarrow")
        .groupby("freq")
        .aggregate(Sum("n_words", alias_name="n_words"))
        .to_pandas()
    )
    out["n_words"] = out["n_words"].astype("int64")
    return out.sort_values("freq").reset_index(drop=True)


def q_asof_join(sf_dir: str) -> pd.DataFrame:
    """As-of join: each event matched to the latest order of its
    (user_id % 100)-keyed customer with o_orderdate <= ts.

    Ray shape: tag+union both sides, groupby key, pd.merge_asof per
    group (ray_guide "As-of / range join").  Oracle: DuckDB ASOF JOIN.
    """
    events = _parquet_sh(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _parquet(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_pandas()
    orders["join_key"] = (orders["o_custkey"] % 100).astype("int64")

    import ray

    # Dedupe the right side to one order per (key, date) so asof
    # tie-breaking matches the oracle deterministically.
    orders = (
        orders.groupby(["join_key", "o_orderdate"], as_index=False)
        ["o_orderkey"].max()
    )
    orders_ref = ray.put(orders)

    def asof_per_key(group: pd.DataFrame) -> pd.DataFrame:
        all_orders = ray.get(orders_ref)
        key = int(group["join_key"].iloc[0])
        right = (
            all_orders[all_orders["join_key"] == key]
            .sort_values("o_orderdate")
        )
        left = group.sort_values("ts")
        if right.empty:
            out = left.copy()
            out["o_orderkey"] = pd.Series(
                [pd.NA] * len(out), dtype="Int64", index=out.index
            )
            return out[["event_id", "o_orderkey"]]
        merged = pd.merge_asof(
            left, right,
            left_on="ts", right_on="o_orderdate",
            direction="backward",
        )
        merged["o_orderkey"] = merged["o_orderkey"].astype("Int64")
        return merged[["event_id", "o_orderkey"]]

    def add_key(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "join_key", pa.array(users % 100, pa.int64())
        )

    keyed = events.map_batches(add_key, batch_format="pyarrow")
    return keyed.groupby("join_key").map_groups(
        asof_per_key, batch_format="pandas"
    ).to_pandas()


def q_asof_join_part(sf_dir: str) -> pd.DataFrame:
    """Same as-of join as ``q_asof_join`` via the RANGE-PARTITIONED
    path (ops.relational.asof_join_partitioned): both sides bucketed by
    (key, time), right-side per-bucket maxima forward-filled as carry
    rows — the scale path when the right side is too large to
    broadcast.  Shares q_asof_join's oracle (identical output)."""
    from unfurl_ray.ops.relational import asof_join_partitioned

    # shuffle-bound: byte-sized blocks (see _parquet's num_blocks note)
    events = _parquet_sh(sf_dir, "events",
                         ["event_id", "user_id", "ts"])
    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def key_left(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "join_key", pa.array(users % 100, pa.int64())
        )

    def key_right(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["join_key"] = (out["o_custkey"] % 100).astype("int64")
        # PARTIAL max per batch only — no global dedupe shuffle:
        # asof_join_partitioned resolves cross-batch duplicates by its
        # greatest-payload-wins rule, which equals max(o_orderkey)
        return (
            out.groupby(["join_key", "o_orderdate"], as_index=False)
            ["o_orderkey"].max()
        )

    left = events.map_batches(key_left, batch_format="pyarrow")
    right = orders.map_batches(key_right, batch_format="pandas")
    # events.count() is parquet-metadata-cheap; sizes the merge shuffle
    n_merge = max(16, 2 * events.count() // 20_000)
    out = asof_join_partitioned(
        left, right, "join_key", "ts", "o_orderdate",
        bucket_s=30 * 86400,
        left_keep=["event_id"], right_keep=["o_orderkey"],
        n_merge_buckets=n_merge,
    ).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return out.sort_values("event_id").reset_index(drop=True)

def q_doc_stats(sf_dir: str) -> pd.DataFrame:
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "documents", ["lang", "n_chars"])
    out = pre_aggregate(
        ds, ["lang"],
        {"n_docs": ("n_chars", "count"), "sum_chars": ("n_chars", "sum")},
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype("int64")
    out["sum_chars"] = out["sum_chars"].astype("int64")
    return out


def q_token_count(sf_dir: str):
    from unfurl_ray.ops.textstats import token_count_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        token_count_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_tokens"])


def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    from unfurl_ray.ops.dedup import exact_dedup

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    out["dup_count"] = out["dup_count"].astype("int64")
    return out


def q_fingerprint(sf_dir: str):
    from unfurl_ray.ops.textstats import fingerprint_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        fingerprint_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "fingerprint_md5"])


def q_quality(sf_dir: str):
    from unfurl_ray.ops.textstats import quality_score_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(quality_score_batch, batch_format="pandas")


def q_repetition(sf_dir: str):
    """Gopher-style repetition metrics (dup-word / top-word /
    top-bigram fractions) per document; hash-exact vs a DuckDB twin
    that re-derives the same counts from unnested tokens."""
    from unfurl_ray.ops.textstats import repetition_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(repetition_batch, batch_format="pandas")


def q_pii_scrub(sf_dir: str):
    """Email/phone redaction with per-doc counts and a byte-exact
    scrubbed-text md5 (synthetic deterministic contact line appended
    on both sides — the corpus itself has no PII)."""
    from unfurl_ray.ops.textstats import pii_scrub_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(pii_scrub_batch, batch_format="pyarrow")


def q_pack_shards(sf_dir: str) -> pd.DataFrame:
    """Token-budget shard packing: docs hash-bucket by id, pack in id
    order at 2000 tokens/shard (offset-split rule).  Hash-exact vs a
    window-function DuckDB twin."""
    from unfurl_ray.ops.relational import pack_shards
    from unfurl_ray.ops.textstats import token_count_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    toks = ds.map_batches(
        token_count_batch, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_tokens"])
    out = pack_shards(toks, "n_tokens", budget=2000,
                      n_buckets=8).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_pack_write(sf_dir: str) -> pd.DataFrame:
    """The packed-shard SINK over real payload: documents (text kept)
    pack at 2000 tokens/shard into one parquet file per shard under a
    cached /tmp layout — re-runs skip finished shards, which is the
    resume demo.  Returns the manifest; its (bucket, shard) row/weight
    totals hash-match the window-function oracle."""
    import hashlib
    import os
    import tempfile

    from unfurl_ray.ops.relational import write_packed_shards

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def with_tokens(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column("text"), "")
        n = pc.cast(pc.count_substring_regex(col, r"\S+"), pa.int64())
        return batch.append_column("n_tokens", n)

    tag = _cache_tag(sf_dir, "shards", "documents")
    out_dir = os.path.join(
        tempfile.gettempdir(), f"unfurl_ray_shards_{tag}"
    )
    manifest = write_packed_shards(
        ds.map_batches(with_tokens, batch_format="pyarrow"),
        weight_col="n_tokens", budget=2000, out_dir=out_dir,
        n_buckets=8,
    )
    return manifest.drop(columns=["skipped"])


def q_decontaminate(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    trigram with a held-out 'benchmark' slice (doc_id % 97 == 0 stands
    in for an eval suite).  Hash-exact vs a DuckDB twin that unnests
    the same trigrams and joins."""
    from unfurl_ray.ops.dedup import ngram_decontaminate

    def split(keep_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 97 == 0) == keep_bench
            return batch.filter(pa.array(mask))
        return f

    docs = _parquet(sf_dir, "documents", ["doc_id", "text"])
    bench = docs.map_batches(split(True), batch_format="pyarrow")
    corpus = docs.map_batches(split(False), batch_format="pyarrow")
    out = ngram_decontaminate(corpus, bench, n=3).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_langid(sf_dir: str):
    """Stopword-argmax language ID (actor pool).  Hash-exact vs a SQL
    twin: per-lang stopword hits over the first 200 tokens, cascading
    CASE = the kernel's first-lang-wins tie rule."""
    from unfurl_ray.ops.textstats import LangId

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas",
                          concurrency=(1, 2))


def q_minhash_dedup(sf_dir: str) -> pd.DataFrame:
    from unfurl_ray.ops.dedup import minhash_dedup_pairs

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return minhash_dedup_pairs(ds, threshold=0.8)


def q_simhash(sf_dir: str):
    from unfurl_ray.ops.dedup import add_simhash

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_simhash(b), batch_format="pyarrow"
    ).select_columns(["doc_id", "simhash"])


def q_setsim_join(sf_dir: str) -> pd.DataFrame:
    """Exact set-similarity self-join (Jaccard >= 0.4 over distinct
    3-word shingles) by distributed prefix filtering — the exact
    counterpart to q_minhash_dedup's probabilistic path; see
    ops.dedup.set_similarity_join for the PPJoin-shaped stage layout.
    Hash-exact DuckDB twin (same token contract, integer threshold
    test, half-up 6dp rounding)."""
    from unfurl_ray.ops.dedup import set_similarity_join

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return set_similarity_join(ds, threshold=0.4, k=3)


# -- embeddings -------------------------------------------------------------

def q_cosine_to_query(sf_dir: str) -> pd.DataFrame:
    """Cosine of every vector against the vec_id=0 vector (rounded)."""
    import ray

    import pyarrow.dataset as pads

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    # fetch the single query row with a predicate-pushdown pyarrow
    # read — not a per-row Python filter over the whole table
    first = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(filter=pads.field("vec_id") == 0, columns=["embedding"])
    )
    query = np.asarray(first.column("embedding")[0].as_py(),
                       dtype=np.float64)
    qn = query / np.linalg.norm(query)
    query_ref = ray.put(qn)

    class Cos:
        def __init__(self):
            self.q = ray.get(query_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from unfurl_ray.ops.similarity import _as_matrix, _normalize

            m = _normalize(_as_matrix(batch.column("embedding")))
            sims = np.round(m @ self.q, 4)
            return pa.table(
                {
                    "vec_id": batch.column("vec_id"),
                    "cosine": pa.array(sims, pa.float64()),
                }
            )

    return ds.map_batches(Cos, batch_format="pyarrow",
                          concurrency=(1, 2))


def _query_vectors(sf_dir: str, n: int = 4) -> np.ndarray:
    """The query matrix: vectors vec_id 0..n-1 in vec_id order, via a
    predicate-pushdown pyarrow read (query_id i == vec_id i, which is
    what the SQL oracle joins on)."""
    import pyarrow.dataset as pads

    t = (
        pads.dataset(f"{sf_dir}/embeddings.parquet")
        .to_table(filter=pads.field("vec_id") < n,
                  columns=["vec_id", "embedding"])
        .sort_by("vec_id")
    )
    return np.array(t.column("embedding").to_pylist(), dtype=np.float64)


def q_knn_topk(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 for the vec_id<4 query vectors
    (oracle: DuckDB cross join + window top-k on the same rounded
    total order)."""
    from unfurl_ray.ops.similarity import knn_brute

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_brute(ds, _query_vectors(sf_dir), k=10)
    out["query_id"] = out["query_id"].astype("int64")
    return out


def q_knn_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF-bucketed ANN over the same queries (scale path)."""
    from unfurl_ray.ops.similarity import knn_ivf

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    # nprobe=6/16 probes 37% of the partitions; on these UNclustered
    # synthetic embeddings (IVF's worst case) that measures recall@10
    # = 0.85 vs brute force (4: 0.70, 8: 1.00) — real embedding
    # corpora cluster, shifting the whole tradeoff curve up
    out = knn_ivf(ds, _query_vectors(sf_dir), k=10, nprobe=6)
    out["query_id"] = out["query_id"].astype("int64")
    return out


def q_knn_pq(sf_dir: str) -> pd.DataFrame:
    """Product-quantization ANN over the same queries: sub-codebooks
    trained on a deterministic sample, corpus encoded to 16 bytes per
    64-dim vector, queries answered from codes alone via
    asymmetric-distance lookup tables (Jegou et al. 2011) — the
    memory-scale path below IVF.  Rows-only driver check; the recall
    pytest (vs brute, planted queries) bounds quality at >= 0.6 on
    these unclustered synthetic embeddings (recall@10 measured 0.75;
    real corpora cluster, shifting the curve up)."""
    from unfurl_ray.ops.similarity import knn_pq

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_pq(ds, _query_vectors(sf_dir), k=10)
    out["query_id"] = out["query_id"].astype("int64")
    return out


def q_kmeans_sample(sf_dir: str) -> pd.DataFrame:
    """Cluster-balanced diversity sample: distributed Lloyd's (k=8,
    4 full-corpus passes, per-batch partial sums so the reduce carries
    k stub rows per batch) then the 5 vectors nearest their own
    centroid per cluster.  Rows-only driver check — an iterative float
    reduction has no single-statement SQL twin; pytest asserts parity
    with a single-process numpy reference instead."""
    from unfurl_ray.ops.similarity import (
        kmeans_diversity_sample,
        kmeans_fit,
    )

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    centroids = kmeans_fit(ds, k=8, iters=4)
    out = kmeans_diversity_sample(ds, centroids, m=5)
    out["sim"] = out["sim"].round(6)
    return out.sort_values(["cluster", "vec_id"]).reset_index(drop=True)


# -- extraction -------------------------------------------------------------

def _esc_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")


def _doc_html(doc_id: int, text: str) -> str:
    """Simple deterministic wrap whose extraction output is expressible
    in SQL string functions (the oracle recomputes it from documents)."""
    desc = _esc_attr(text[:100].rstrip())
    return (
        f"<html><head><title>Doc {doc_id}</title>"
        f'<meta name="description" content="{desc}">'
        f'<meta name="language" content="en">'
        f'<link rel="canonical" href="https://example.org/doc/{doc_id}">'
        f"</head><body><p>{_esc_attr(text)}</p></body></html>"
    )


def q_extract_meta(sf_dir: str):
    """unfurl extraction over deterministic HTML wraps of documents."""
    from unfurl_ray.engine.stages import ExtractTurns

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "text": pa.array(
                    [_doc_html(i, t or "") for i, t in zip(ids, texts)],
                    pa.large_string(),
                ),
            }
        )

    extracted = ds.map_batches(wrap, batch_format="pyarrow").map_batches(
        ExtractTurns,
        fn_constructor_kwargs={"keep_columns": ("doc_id",)},
        batch_format="pyarrow",
        # autoscaling pool: a FIXED pool reserves every slot and can
        # deadlock the upstream read task pool on small clusters
        concurrency=(1, 4),
        num_cpus=1,
    )
    return extracted.select_columns(
        ["doc_id", "headline", "description", "language", "canonical_url"]
    )


def q_main_text(sf_dir: str):
    """Boilerplate-stripped main text of the deterministic wraps."""
    from unfurl_ray.content.boilerplate import extract_main_text

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def run(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        mains = [
            extract_main_text(_doc_html(i, t or ""))[0]
            for i, t in zip(ids, texts)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "main_text": pa.array(mains, pa.large_string()),
            }
        )

    return ds.map_batches(run, batch_format="pyarrow")


def q_transcript_types(sf_dir: str) -> pd.DataFrame:
    """Flagship transcript pipeline -> per-type counts, hash-exact vs
    a DuckDB twin that rederives the generator's template routing
    (kind = splitmix64(doc_id) %% 10, written with 32-bit-split
    wrapping multiplication) and the engine's deterministic typing of
    each template family — an end-to-end check that extraction routes
    every turn to the right Unfurl type."""
    from unfurl_ray.engine.pipeline import extract_turns, order_by_turn
    from unfurl_ray.ops.relational import pre_aggregate
    from unfurl_ray.sources.transcripts import build_transcripts

    ds = build_transcripts(sf_dir)
    extracted = extract_turns(ds, concurrency=4)
    out = pre_aggregate(
        extracted, ["unfurl_type"], {"n": ("unfurl_type", "count")}
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out


def q_quantize_embeddings(sf_dir: str) -> pd.DataFrame:
    """Int8 scalar quantization of the embeddings table.  Hash-exact
    vs a DuckDB twin on the integer digests (q_sum, q_l1) — the full
    int8 vector is emitted by the op but summarized for compare
    (list-typed columns don't value-hash portably)."""
    from unfurl_ray.ops.similarity import quantize_embeddings

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = quantize_embeddings(ds).select_columns(
        ["vec_id", "q_sum", "q_l1"]
    ).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_pca(sf_dir: str) -> pd.DataFrame:
    """PCA via distributed moments (per-batch X'X partials, tree
    merge, d x d eigh on the driver) + broadcast projection.
    Rows-only check; numerical parity vs single-process numpy PCA is
    pytest-verified (test_pca_matches_numpy)."""
    from unfurl_ray.ops.similarity import pca_fit, pca_project

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    model = pca_fit(ds, k=2)
    out = pca_project(ds, model).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


def q_embed_neardup(sf_dir: str) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (exact brute baseline;
    broadcast normalized corpus, per-batch matmul -> only matching
    pairs leave the tasks).  Scale path: IVF/LSH bucket + same kernel
    (see ops.similarity.CosinePairs)."""
    from unfurl_ray.ops.similarity import cosine_pair_dedup

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_pair_dedup(ds, threshold=0.45).to_pandas()
    return (
        out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    )


def semdedup(ds, threshold: float = 0.45,
             exact_pair_limit: int = 100_000,
             n_centroids: int = 16, assign_top: int = 2) -> pd.DataFrame:
    """SemDeDup-style semantic deduplication end to end: cosine pairs
    above ``threshold`` become an undirected edge set, distributed
    min-label connected components cluster them, and every vector
    maps to its cluster representative (the min vec_id) with a
    ``kept`` flag — the "keep one per semantic cluster" curation step.

    The pair stage auto-selects by corpus size: at or below
    ``exact_pair_limit`` rows it is the exact broadcast baseline
    (``cosine_pair_dedup`` — fully SQL-twinned, so oracle scales stay
    hash-checked); above it, ``cosine_pairs_bucketed`` — the
    no-broadcast centroid-LSH scale path with identical pair schema
    and the same downstream (exact precision; recall governed by
    ``assign_top``)."""
    from unfurl_ray.ops.graph import assign_components, connected_components
    from unfurl_ray.ops.similarity import (
        cosine_pair_dedup, cosine_pairs_bucketed,
    )

    if ds.count() > exact_pair_limit:
        pairs = cosine_pairs_bucketed(
            ds, threshold=threshold,
            n_centroids=n_centroids, assign_top=assign_top,
        )
    else:
        pairs = cosine_pair_dedup(ds, threshold=threshold)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").to_numpy(zero_copy_only=False)
        b = batch.column("vec_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(
                    np.concatenate([a, b]).astype(np.int64), pa.int64()
                ),
                "v": pa.array(
                    np.concatenate([b, a]).astype(np.int64), pa.int64()
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    labels = connected_components(edges)
    out = assign_components(
        ds, labels, id_column="vec_id", out_column="component"
    ).to_pandas()
    out["kept"] = (out["vec_id"] == out["component"]).astype("bool")
    out = out.astype({"vec_id": "int64", "component": "int64"})
    return out.sort_values("vec_id").reset_index(drop=True)


def q_semdedup(sf_dir: str) -> pd.DataFrame:
    """``semdedup`` over the embeddings table.  Oracle scales sit
    under ``exact_pair_limit``, so the pair stage is the SQL-twinned
    exact baseline (cosine cross join + recursive-CTE min-label) and
    the whole chain is hash-checked; bigger corpora take the bucketed
    path automatically with the same downstream."""
    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    return semdedup(ds, threshold=0.45)


def q_embed_neardup_ann(sf_dir: str) -> pd.DataFrame:
    """Bucketed (centroid-LSH) near-dup pairs — the no-broadcast scale
    path; exact precision, recall governed by assign_top (rows-only
    check: bucket membership is kmeans-derived, not SQL)."""
    from unfurl_ray.ops.similarity import cosine_pairs_bucketed

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = cosine_pairs_bucketed(
        ds, threshold=0.45, n_centroids=8, assign_top=2
    ).to_pandas()
    return (
        out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
        .astype({"vec_a": "int64", "vec_b": "int64"})
    )


def q_image_meta(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing, oracle-checkable: deterministic PNG headers
    (dims derived from doc_id) ride a binary column through the real
    ``ImageMeta`` sniffing stage; SQL recomputes the dims arithmetic."""
    import struct

    from unfurl_ray.ops.multimodal import ImageMeta

    def to_png(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs = [
            b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", d % 640 + 16, d % 480 + 9,
                          8, 2, 0, 0, 0)
            for d in ids
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "content": pa.array(blobs, pa.binary()),
            }
        )

    ds = _parquet_sh(sf_dir, "documents", ["doc_id"])
    out = (
        ds.map_batches(to_png, batch_format="pyarrow")
        .map_batches(
            ImageMeta, batch_format="pyarrow", batch_size=128,
            concurrency=(1, 2), num_cpus=1,
        )
        .to_pandas()
    )
    meta = pd.DataFrame(out["image_meta"].tolist())
    return (
        pd.DataFrame(
            {
                "doc_id": out["doc_id"],
                "format": meta["format"],
                "width": meta["width"].astype("int64"),
                "height": meta["height"].astype("int64"),
            }
        )
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_conv_stats(sf_dir: str) -> pd.DataFrame:
    """Per-conversation turn counts with the skew drill: detect hot
    conv_ids, salt them, aggregate per (conv, salt), merge.  Hash-exact
    vs the DuckDB oracle (the conv hash is a multiplicative mix with a
    HUGEINT SQL twin — see oracle_sql()["q_conv_stats"])."""
    from ray.data.aggregate import Count

    from unfurl_ray.ops.skew import add_salt, find_hot_keys
    from unfurl_ray.sources.transcripts import build_transcripts

    ds = build_transcripts(sf_dir, shuffled=False)
    hot = find_hot_keys(ds, "conv_id", threshold=1000)
    salted = add_salt(ds, "conv_id", hot, n_salt=8, order_col="turn_idx")
    sub = (
        salted.groupby(["conv_id", "salt"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out = (
        sub.groupby("conv_id", as_index=False)["n"].sum()
        .rename(columns={"n": "n_turns"})
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    out["n_turns"] = out["n_turns"].astype("int64")
    return out


def q_hopping_window(sf_dir: str) -> pd.DataFrame:
    """2-hour windows hopping every hour per event_type (each event in
    2 windows; fan-out stays inside the batch, pre-aggregated)."""
    from unfurl_ray.ops.relational import hopping_window

    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type", "value"])
    out = hopping_window(
        ds, ts_col="ts", key_col="event_type", width_s=7200,
        step_s=3600, value_col="value",
    ).to_pandas()
    out["sum_value"] = out["sum_value"].round(2)
    out["n_events"] = out["n_events"].astype("int64")
    return out


def q_topk_per_group(sf_dir: str) -> pd.DataFrame:
    """Top-3 orders by price per order status (partial per-batch top-k,
    tiny global merge — no full shuffle)."""
    from unfurl_ray.ops.relational import topk_per_group

    ds = _parquet(
        sf_dir, "orders", ["o_orderstatus", "o_totalprice", "o_orderkey"]
    )
    out = topk_per_group(
        ds, key_col="o_orderstatus", order_col="o_totalprice", k=3,
        tiebreak_col="o_orderkey",
    )
    out["o_totalprice"] = out["o_totalprice"].round(2)
    return out[["o_orderstatus", "o_orderkey", "o_totalprice"]]


def q_group_median(sf_dir: str) -> pd.DataFrame:
    """Discrete median of order price per status (exact, DuckDB
    quantile_disc semantics) via groupby().map_groups."""
    from unfurl_ray.ops.relational import group_quantile_disc

    out = group_quantile_disc(
        _parquet_sh(sf_dir, "orders", ["o_orderstatus", "o_totalprice"]),
        key_col="o_orderstatus", value_col="o_totalprice", q=0.5,
    ).to_pandas()
    out["quantile_value"] = out["quantile_value"].round(2)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def q_quantile_cont(sf_dir: str) -> pd.DataFrame:
    """Exact per-priority CONTINUOUS quantiles (p25/p50/p90) of order
    value — DuckDB quantile_cont interpolation semantics — via
    ops.relational.grouped_quantile_cont: one distinct-value
    histogram shuffle + a vectorized two-rank interpolation pick;
    no key's raw rows ever group.  Hash-exact vs a quantile_cont
    twin at round(6)."""
    from unfurl_ray.ops.relational import grouped_quantile_cont

    out = grouped_quantile_cont(
        _parquet_sh(
            sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
        ),
        key_col="o_orderpriority", value_col="o_totalprice",
        qs=[0.25, 0.5, 0.9],
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_hll_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users over events via mergeable HLL
    sketches (4 KiB per batch regardless of input size).  Rows-only
    check — the estimate is within ~2% of exact but not equal."""
    from unfurl_ray.ops.sketch import hll_distinct

    ds = _parquet_sh(sf_dir, "events", ["user_id"])
    est = hll_distinct(ds, "user_id", p=12)
    return pd.DataFrame({"approx_distinct_users": [round(est)]})


def q_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Approximate p50/p95/p99 of events.value via mergeable
    rank-strided sketches (no sort, no driver materialization; rows-
    only check — the estimate is within ~0.1% rank error of exact but
    not equal)."""
    from unfurl_ray.ops.sketch import approx_quantiles

    ds = _parquet_sh(sf_dir, "events", ["value"])
    est = approx_quantiles(ds, "value", qs=(0.5, 0.95, 0.99))
    return pd.DataFrame(
        {
            "p50": [round(est[0.5], 4)],
            "p95": [round(est[0.95], 4)],
            "p99": [round(est[0.99], 4)],
        }
    )


def q_group_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Approximate p50/p95 of events.value PER event_type via
    sketch-merge groupby (the shuffle carries ~4KiB sketches per
    (batch, key), never raw values — no one-key-per-group assumption;
    rows-only check)."""
    from unfurl_ray.ops.sketch import grouped_approx_quantiles

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])
    out = grouped_approx_quantiles(
        ds, "event_type", "value", qs=(0.5, 0.95)
    ).to_pandas()
    out["q_0.5"] = out["q_0.5"].round(4)
    out["q_0.95"] = out["q_0.95"].round(4)
    return out.sort_values("event_type").reset_index(drop=True)


def q_bloom_semi_join(sf_dir: str) -> pd.DataFrame:
    """Orders by customers in BUILDING segment, via Bloom-prefiltered
    exact semi join (filter broadcast; survivors exact-checked)."""
    from unfurl_ray.ops.sketch import bloom_semi_join

    cust = (
        _parquet_sh(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        .to_pandas()
    )
    keys = cust.loc[cust["c_mktsegment"] == "BUILDING", "c_custkey"]
    orders = _parquet_sh(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    out = (
        bloom_semi_join(orders, set(keys.tolist()), on="o_custkey")
        .to_pandas()
    )
    return pd.DataFrame(
        {
            "n_orders": [len(out)],
            "revenue": [round(out["o_totalprice"].sum(), 2)],
        }
    )


def q_hash_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic 10% sample: hash-bucket the key inside the batch
    (reproducible across runs/cluster sizes, unlike random_sample) and
    keep bucket < 10 of 100.  The same predicate is exactly
    SQL-expressible, so the sample is oracle-checked row for row."""
    ds = _parquet_sh(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        # explicit uint64 wraparound (mod 2^64) — int64 would silently
        # wrap NEGATIVE above doc_id ~3.5e9 while the HUGEINT oracle
        # stays positive; both sides now compute the same bucket
        with np.errstate(over="ignore"):
            bucket = (ids.astype(np.uint64) * np.uint64(2654435761)) \
                % np.uint64(100)
        return batch.filter(pa.array(bucket < 10))

    out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_dedup_clusters(sf_dir: str) -> pd.DataFrame:
    """Duplicate clustering end-to-end — the step a near-dup pipeline
    needs AFTER pair generation: aligned 64-char chunk fingerprints ->
    fingerprint-bucket edges -> distributed min-label connected
    components -> per-doc cluster representative.  Every stage is
    SQL-expressible (md5 chunks + a recursive-CTE min-label oracle),
    so unlike MinHash the whole clustering chain is hash-checked."""
    from unfurl_ray.ops.graph import (
        assign_components, connected_components, fingerprint_edges,
    )

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    edges = fingerprint_edges(ds, chunk_size=64)
    labels = connected_components(edges)
    out = assign_components(ds, labels).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "component": "int64"})


def q_bfs_hops(sf_dir: str) -> pd.DataFrame:
    """Contamination blast radius: multi-source BFS hop distances
    (<= 3) from the seed docs (doc_id < 100) over the chunk-fingerprint
    duplicate graph — who is transitively linked to a known-bad doc,
    and how closely.  Shard-actor frontier exchange; hash-exact
    recursive-CTE twin."""
    from unfurl_ray.ops.graph import bfs_hops, fingerprint_edges

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    edges = fingerprint_edges(ds, chunk_size=64)
    return bfs_hops(edges, seeds=np.arange(100), max_hops=3)


def q_bigram_counts(sf_dir: str) -> pd.DataFrame:
    """Top-20 corpus bigrams: the bigram fan-out and a per-batch
    partial count (combiner) stay inside ``map_batches``; the shuffle
    carries one (bigram, n) row per batch per distinct bigram, then a
    small groupby-sum and a driver top-k."""
    import re as _re
    from collections import Counter

    from ray.data.aggregate import Sum

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws  # shared token contract
    ds = _parquet(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch.column("text").to_pylist():
            ws = [w for w in _ws.split((text or "").lower()) if w]
            counts.update(
                f"{a} {b}" for a, b in zip(ws, ws[1:])
            )
        return pa.table(
            {
                "bigram": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return (
        out.sort_values(["n", "bigram"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )


def q_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic stratified sample: 5 events per event_type picked
    by md5-rank (reproducible across runs and cluster sizes — unlike
    random_sample — and oracle-checked row for row).  Rides the
    partial-top-k kernel: only 5 rows per type per batch survive to
    the driver merge."""
    import hashlib as _hl

    from unfurl_ray.ops.relational import topk_per_group

    ds = _parquet_sh(sf_dir, "events", ["event_id", "event_type"])

    def add_h(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id").to_pylist()
        return batch.append_column(
            "h",
            pa.array(
                [_hl.md5(str(i).encode()).hexdigest() for i in ids],
                pa.string(),
            ),
        )

    out = topk_per_group(
        ds.map_batches(add_h, batch_format="pyarrow"),
        key_col="event_type", order_col="h", k=5,
        tiebreak_col="event_id",
    )
    out = out[["event_type", "event_id", "h"]]
    out["event_id"] = out["event_id"].astype("int64")
    return out.reset_index(drop=True)


def q_curation(sf_dir: str) -> pd.DataFrame:
    """End-to-end corpus curation — the composition a training-data
    pipeline actually runs, hash-checked as ONE chain: quality filter
    (>= 0.3) -> exact dedup (keep lowest doc_id per md5) -> chunk-
    fingerprint near-dup clustering -> keep each cluster's
    representative.  Stage shapes, at scale: the quality filter is
    per-batch; the dedup keeper set arrives via hash JOIN (not a
    broadcast — it is O(survivors)); only the CLUSTERED-DUP set (tiny
    by construction) is broadcast for the final anti-filter."""
    from unfurl_ray.ops.graph import connected_components, fingerprint_edges
    from unfurl_ray.ops.relational import _arrow
    from unfurl_ray.ops.textstats import quality_score_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def keep_quality(batch: pd.DataFrame) -> pa.Table:
        # emit ARROW: this feeds a Ray-native hash join, and pandas
        # blocks there both pay a conversion in the shuffle and break
        # schema-dedup hashing (the "Failed to hash the schemas" spam)
        q = quality_score_batch(batch)
        out = batch[["doc_id", "text"]].copy()
        out["quality"] = q["quality"].to_numpy()
        return _arrow(out[out["quality"] >= 0.3])

    # materialized once: exact_dedup, the keeper join, and the final
    # filter all consume this filtered corpus — without materializing,
    # each consumer re-runs the read + quality scoring from scratch
    survivors = ds.map_batches(
        keep_quality, batch_format="pandas"
    ).materialize()

    # exact dedup: min doc_id per content hash; keeper ids come back
    # through a hash-partitioned join (the keeper set is the same
    # order of magnitude as the corpus — never broadcast it)
    from unfurl_ray.ops.dedup import exact_dedup

    keepers = exact_dedup(survivors).select_columns(["doc_id"])
    kept = survivors.join(
        keepers, join_type="inner", num_partitions=8,
        on=("doc_id",), right_on=("doc_id",),
    ).materialize()  # consumed by both edge-building and final filter

    # near-dup clustering on the deduped survivors; only docs that
    # LOST to a cluster representative (label != node: a tiny set)
    # need to be known to filter — broadcast just those
    edges = fingerprint_edges(kept, chunk_size=64)
    labels = connected_components(edges)
    if not isinstance(labels, pd.DataFrame):
        labels = labels.to_pandas()
    drop = set(
        labels.loc[labels["label"] != labels["node"], "node"].astype(int)
    )

    def not_dropped(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        mask = pa.array([i not in drop for i in ids])
        return batch.filter(mask).select(["doc_id", "quality"])

    out = kept.map_batches(not_dropped, batch_format="pyarrow").to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_training_prep(sf_dir: str) -> pd.DataFrame:
    """The full prep chain a training-data run makes before writing
    shards, hash-checked as ONE oracle: quality filter (>= 0.3) ->
    benchmark decontamination (drop docs sharing a word trigram with
    the doc_id % 97 held-out slice) -> exact dedup (min doc_id per
    md5) -> token counting -> token-budget shard packing.

    Stage shapes at scale: quality + decontaminate are per-batch with
    one broadcast gram set; the dedup keeper set returns via hash JOIN
    (O(survivors), never broadcast); packing shuffles (id, bucket,
    n_tokens) stubs only."""
    from unfurl_ray.ops.dedup import exact_dedup, ngram_decontaminate
    from unfurl_ray.ops.relational import pack_shards
    from unfurl_ray.ops.textstats import quality_score_batch

    docs = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def split(keep_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            mask = (ids % 97 == 0) == keep_bench
            return batch.filter(pa.array(mask))

        return f

    bench = docs.map_batches(split(True), batch_format="pyarrow")

    def keep_quality(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_score_batch(batch)
        out = batch[["doc_id", "text"]].copy()
        return out[q["quality"].to_numpy() >= 0.3]

    corpus = (
        docs.map_batches(split(False), batch_format="pyarrow")
        .map_batches(keep_quality, batch_format="pandas")
    )

    def keep_clean(batch: pd.DataFrame) -> pa.Table:
        kept = batch.loc[~batch["contaminated"], ["doc_id", "text"]]
        return pa.Table.from_pandas(
            kept, preserve_index=False
        ).replace_schema_metadata(None)

    clean = (
        ngram_decontaminate(corpus, bench, n=3, keep_cols=("text",))
        .map_batches(keep_clean, batch_format="pandas")
        # consumed twice (dedup keepers + the keeper join)
        .materialize()
    )
    keepers = exact_dedup(clean).select_columns(["doc_id"])
    kept = clean.join(
        keepers, join_type="inner", num_partitions=8,
        on=("doc_id",), right_on=("doc_id",),
    )

    def with_tokens(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column("text"), "")
        n = pc.cast(pc.count_substring_regex(col, r"\S+"), pa.int64())
        return pa.table(
            {"doc_id": batch.column("doc_id"), "n_tokens": n}
        )

    toks = kept.map_batches(with_tokens, batch_format="pyarrow")
    out = pack_shards(toks, "n_tokens", budget=2000, n_buckets=8)
    return (
        out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def q_tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Top-3 TF-IDF terms per document.  Two passes, both bounded:
    (1) document frequencies via per-batch UNIQUE-word fan-out ->
    groupby count (the shuffle carries one (word, 1) row per distinct
    word per batch, pre-aggregated); the vocabulary table is broadcast
    once via ``ray.put``; (2) per-doc tf x idf scoring + top-3 inside
    ``map_batches`` — no second shuffle.  Scores are half-up rounded
    to 6 decimals on BOTH sides before ranking so ties break
    identically in Ray and the SQL twin."""
    import math
    import re as _re

    import ray

    from ray.data.aggregate import Sum

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws  # shared token contract
    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no scan

    def words_of(text: str) -> list[str]:
        return [w for w in _ws.split((text or "").lower()) if w]

    def df_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for text in batch.column("text").to_pylist():
            c.update(set(words_of(text)))
        return pa.table(
            {"word": pa.array(list(c.keys()), pa.string()),
             "df": pa.array(list(c.values()), pa.int64())}
        )

    vocab = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    idf = {
        w: math.log(n_docs / d)
        for w, d in zip(vocab["word"], vocab["df"].astype(int))
    }
    idf_ref = ray.put(idf)

    class Score:
        def __init__(self):
            self.idf = ray.get(idf_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            from collections import Counter

            out_id, out_term, out_score = [], [], []
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                tf = Counter(words_of(text))
                scored = [
                    (np.floor(n * self.idf[w] * 1e6 + 0.5) / 1e6, w)
                    for w, n in tf.items()
                ]
                scored.sort(key=lambda t: (-t[0], t[1]))
                for s, w in scored[:3]:
                    out_id.append(doc_id)
                    out_term.append(w)
                    out_score.append(s)
            return pa.table(
                {
                    "doc_id": pa.array(out_id, pa.int64()),
                    "term": pa.array(out_term, pa.string()),
                    "tfidf": pa.array(out_score, pa.float64()),
                }
            )

    out = ds.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    ).to_pandas()
    return (
        out.sort_values(["doc_id", "tfidf", "term"],
                        ascending=[True, False, True])
        .reset_index(drop=True)
    )


def q_inverted_index(sf_dir: str) -> pd.DataFrame:
    """Inverted index over the long-word vocabulary (len >= 6): term ->
    sorted posting list + df.  Postings group by a bounded HASH BUCKET
    of the term (not by term — per-term map_groups would pay one
    Python dispatch per vocabulary word) and the per-term list build
    runs vectorized inside each bucket.  Posting lists serialize to a
    comma-joined string so the value-hash compare (and parquet sinks
    with strict schemas) see a flat column."""
    import re as _re

    _word = _re.compile(r"[a-z0-9_]{6,}")
    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def postings_rows(batch: pa.Table) -> pa.Table:
        out_w, out_d = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            for w in set(_word.findall((text or "").lower())):
                out_w.append(w)
                out_d.append(doc_id)
        buckets = [hash_bucket(w) for w in out_w]
        return pa.table(
            {
                "term": pa.array(out_w, pa.string()),
                "doc_id": pa.array(out_d, pa.int64()),
                "bucket": pa.array(buckets, pa.int32()),
            }
        )

    def hash_bucket(w: str, n: int = 64) -> int:
        import zlib

        return zlib.crc32(w.encode()) % n

    def build_lists(group: pd.DataFrame) -> pa.Table:
        agg = (
            group.groupby("term")["doc_id"]
            .apply(lambda s: sorted(set(int(x) for x in s)))
            .reset_index()
        )
        return pa.table(
            {
                "term": pa.array(agg["term"], pa.string()),
                "df": pa.array(
                    [len(p) for p in agg["doc_id"]], pa.int64()
                ),
                "postings": pa.array(
                    [",".join(map(str, p)) for p in agg["doc_id"]],
                    pa.string(),
                ),
            }
        )

    out = (
        ds.map_batches(postings_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(build_lists, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("term").reset_index(drop=True)


def q_retention(sf_dir: str) -> pd.DataFrame:
    """Hour-over-hour user retention: of the users active in hour h,
    how many were also active in hour h+1.  Fully distributed — the
    shifted self-join is rewritten as a tag fan-out + groupby: each
    distinct (user, hour) emits (user, h, cur=1) and (user, h-1,
    nxt=1); groupby (user, h) sums collapse to 0/1 flags; a final
    per-hour sum yields active and retained.  The event stream is
    pre-collapsed per batch, so shuffles carry distinct pairs only."""
    from ray.data.aggregate import Count, Sum

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])

    def user_hours(batch: pa.Table) -> pa.Table:
        hours = pc.cast(
            pc.divide(
                pc.cast(batch.column("ts"), pa.int64()), 3_600_000_000
            ),
            pa.int64(),
        )
        t = pa.table(
            {"user_id": batch.column("user_id"), "hour": hours}
        )
        # batch-local distinct: the shuffle carries (user, hour) once
        # per batch, not once per event
        return t.group_by(["user_id", "hour"]).aggregate([])

    uh = (
        ds.map_batches(user_hours, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(Count(alias_name="_n"))
    )

    def tag_fanout(batch: pa.Table) -> pa.Table:
        users = batch.column("user_id")
        hours = batch.column("hour")
        n = len(batch)
        return pa.table(
            {
                "user_id": pa.concat_arrays(
                    [users.combine_chunks(), users.combine_chunks()]
                ),
                "h": pa.concat_arrays(
                    [hours.combine_chunks(),
                     pc.subtract(hours, pa.scalar(1)).combine_chunks()]
                ),
                "cur": pa.array([1] * n + [0] * n, pa.int64()),
                "nxt": pa.array([0] * n + [1] * n, pa.int64()),
            }
        )

    flags = (
        uh.map_batches(tag_fanout, batch_format="pyarrow")
        .groupby(["user_id", "h"])
        .aggregate(Sum("cur", alias_name="cur"),
                   Sum("nxt", alias_name="nxt"))
    )

    def per_hour(batch: pa.Table) -> pa.Table:
        cur = batch.column("cur")
        ret = pc.multiply(cur, batch.column("nxt"))
        return pa.table(
            {"hour": batch.column("h"), "active": cur, "retained": ret}
        )

    out = (
        flags.map_batches(per_hour, batch_format="pyarrow")
        .groupby("hour")
        .aggregate(Sum("active", alias_name="active"),
                   Sum("retained", alias_name="retained"))
        .to_pandas()
    )
    # rows where only nxt fired (h = min-1) have active 0 — they are
    # not hours with activity; drop them like the oracle does
    out = out[out["active"] > 0]
    out["active"] = out["active"].astype("int64")
    out["retained"] = out["retained"].astype("int64")
    return out.sort_values("hour").reset_index(drop=True)


def q_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Top-20 most frequent words via the mergeable heavy-hitters
    sketch (ops/sketch.heavy_hitters).  On this corpus the vocabulary
    fits the sketch capacity, so the summary never truncates and the
    result is EXACT (count_min == count_max == true count) — which is
    what makes the DuckDB oracle possible; the truncation/error-bound
    behavior on domains larger than capacity is pytest-covered."""
    import re as _re

    from unfurl_ray.ops.sketch import heavy_hitters

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws  # shared token contract
    ds = _parquet(sf_dir, "documents", ["text"])

    def word_rows(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch.column("text").to_pylist():
            out.extend(w for w in _ws.split((text or "").lower()) if w)
        return pa.table({"value": pa.array(out, pa.string())})

    words = ds.map_batches(word_rows, batch_format="pyarrow")
    return heavy_hitters(words, "value", k=20, capacity=4096)


def q_lm_score(sf_dir: str) -> pd.DataFrame:
    """Unigram language-model score per document — the cheap
    perplexity-style quality signal training pipelines filter on:
    mean log p(word) under the corpus unigram distribution.  Pass 1
    builds the vocabulary counts (pre-aggregated fan-out, same shape
    as q_tfidf); the distribution broadcasts once; pass 2 scores each
    doc inside the batch — no second shuffle.  Rounded half-up at 6
    decimals on both sides for the value-exact oracle."""
    import math
    import re as _re

    import ray

    from ray.data.aggregate import Sum

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws  # shared token contract
    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def words_of(text: str) -> list[str]:
        return [w for w in _ws.split((text or "").lower()) if w]

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: "Counter[str]" = Counter()
        for text in batch.column("text").to_pylist():
            c.update(words_of(text))
        return pa.table(
            {"word": pa.array(list(c.keys()), pa.string()),
             "n": pa.array(list(c.values()), pa.int64())}
        )

    vocab = (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    total = int(vocab["n"].sum())
    logp = {
        w: math.log(int(n) / total)
        for w, n in zip(vocab["word"], vocab["n"])
    }
    logp_ref = ray.put(logp)

    class Score:
        def __init__(self):
            self.logp = ray.get(logp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, scores = [], []
            for doc_id, text in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                ws = words_of(text)
                if ws:
                    mean_lp = sum(self.logp[w] for w in ws) / len(ws)
                    s = np.floor(mean_lp * 1e6 + 0.5) / 1e6
                else:
                    s = None
                ids.append(doc_id)
                scores.append(s)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "lm_score": pa.array(scores, pa.float64()),
                }
            )

    out = ds.map_batches(
        Score, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_rolling_range(sf_dir: str) -> pd.DataFrame:
    """Per-user time-RANGE rolling window (count + exact cents sum
    over the trailing 300 s) via the skew-safe (key, time-bucket)
    decomposition — no group ever holds one user's whole stream, only
    two window-widths of it.  Integer cents make the sum
    order-independent, so the DuckDB RANGE-frame twin hash-matches."""
    from unfurl_ray.ops.relational import rolling_range_window

    ds = _parquet_sh(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    out = rolling_range_window(
        ds, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", width_s=300,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_substring_dedup(sf_dir: str) -> pd.DataFrame:
    """Duplicated 5-gram span counts per document — the exact
    substring-dedup signal (docs whose token windows repeat anywhere
    in the corpus).  md5 gram identity on both sides makes the DuckDB
    twin hash-exact even in the (negligible) collision case."""
    from unfurl_ray.ops.dedup import duplicate_ngram_spans

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = duplicate_ngram_spans(ds, n=5).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_chunk_docs(sf_dir: str) -> pd.DataFrame:
    """Sliding-window chunking: every document split into 64-token
    windows every 48 tokens (16-token overlap) — the step between
    cleaning and embedding/pretraining tokenization.  Pure flat
    map_batches (no shuffle); the ASCII-whitespace token rule is shared
    with the DuckDB generate_series oracle, so chunk text hash-matches
    byte for byte."""
    from unfurl_ray.ops.chunk import chunk_by_tokens

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = chunk_by_tokens(
        ds, text_col="text", id_col="doc_id", window=64, stride=48
    ).to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def q_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Length-weighted document sample, 3 per source, without
    replacement (Efraimidis-Spirakis A-ES on a deterministic id hash):
    longer documents are proportionally likelier, and the identical
    ln(u)/w key in the DuckDB window twin verifies the selection row
    for row."""
    from unfurl_ray.ops.sampling import weighted_sample_per_group

    ds = _parquet_sh(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out = weighted_sample_per_group(
        ds, key_col="source", id_col="doc_id", weight_col="n_chars", k=3
    )
    out = out[["source", "doc_id", "n_chars", "skey"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


def q_mixture_sample(sf_dir: str) -> pd.DataFrame:
    """Domain-mixture resampling: pull a 40-doc corpus at 50 % src0,
    30 % src1, 20 % src2 by md5-rank — the "train on X% web, Y% code"
    curation step.  Quotas are exact counts; selection is reproducible
    on any block layout and window-checked in SQL."""
    from unfurl_ray.ops.sampling import mixture_sample

    ds = _parquet_sh(sf_dir, "documents", ["doc_id", "source"])
    out = mixture_sample(
        ds, key_col="source", id_col="doc_id",
        target_weights={"src0": 0.5, "src1": 0.3, "src2": 0.2},
        total=40,
    )
    out = out[["source", "doc_id", "h"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values(["source", "doc_id"]).reset_index(drop=True)


def q_quarantine(sf_dir: str) -> pd.DataFrame:
    """Poison-pill isolation: a per-batch UDF that raises on ~1 % of
    rows (ZeroDivisionError when the props key k = 50) runs under
    quarantine_map — failing rows land in an auditable quarantine
    stream with the exception name, clean rows are untouched, and the
    job never dies.  The SQL twin derives the identical ok/error split
    and truncating division, so this is hash-checked end to end."""
    import json

    from unfurl_ray.ops.robust import quarantine_map

    ds = _parquet_sh(sf_dir, "events", ["event_id", "props"])

    def risky(batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized-per-batch JSON decode + a computation that RAISES
        # on k = 50 (truncating int() matches DuckDB's // semantics)
        ks = [json.loads(p)["k"] for p in batch["props"]]
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].to_numpy(),
                "k": ks,
                "inv": [int(100 / (k - 50)) for k in ks],
            }
        )

    out = quarantine_map(
        ds, risky, id_cols=["event_id"],
        out_schema={"event_id": "int64", "k": "Int64", "inv": "Int64"},
    ).to_pandas()
    # match the oracle's NULL-promoted float64 (see q_align_union)
    out["k"] = out["k"].astype("float64")
    out["inv"] = out["inv"].astype("float64")
    return out.sort_values("event_id").reset_index(drop=True)


def q_resample_locf(sf_dir: str) -> pd.DataFrame:
    """Time-series resampling: every user's event stream sampled onto
    a regular 6-hour epoch-aligned grid with last-observation-carried-
    forward — the "regular bars from irregular ticks" op.  The grid is
    generated distributed (distinct users via one bucketed aggregate,
    then a per-batch flat-map; no driver loop), and the carry is the
    range-partitioned as-of join (ops.relational.asof_join_partitioned)
    — both sides bucketed by (user, 2-day window), so no broadcast and
    no per-user whole-stream group.  DuckDB ASOF LEFT JOIN is the
    hash-exact twin."""
    import math

    from unfurl_ray.ops.relational import (
        asof_join_partitioned,
        bucketed_aggregate,
    )

    STEP = 21600  # 6 h

    # byte-sized blocks: this query is shuffle-bound (three all-to-alls
    # downstream), and sort partitions / store fragments scale with the
    # input block count — see _parquet's num_blocks note
    ev = _parquet_sh(sf_dir, "events", ["user_id", "ts", "value"])
    # consumed twice (users, right side): materialize the 3-column
    # slice once instead of re-reading per consumer
    ev = ev.materialize()

    fb = _footer_ts_bounds(sf_dir, "events", "ts")
    if fb is not None:  # metadata-only, no scan
        t_min, t_max = (pd.Timestamp(b).value / 1e9 for b in fb)
    else:
        from ray.data.aggregate import Max, Min

        bounds = ev.aggregate(Min("ts"), Max("ts"))
        t_min = pd.Timestamp(bounds["min(ts)"]).value / 1e9
        t_max = pd.Timestamp(bounds["max(ts)"]).value / 1e9
    s = int(math.ceil(t_min / STEP)) * STEP
    e = int(math.floor(t_max / STEP)) * STEP

    users = bucketed_aggregate(
        ev, ["user_id"], {"n": ("user_id", "count")}
    )

    gsecs = np.arange(s, e + 1, STEP, dtype=np.int64)

    def to_grid(batch: pd.DataFrame) -> pa.Table:
        uids = batch["user_id"].to_numpy()
        rep_u = np.repeat(uids, len(gsecs))
        rep_g = np.tile(gsecs, len(uids))
        return pa.table(
            {
                "user_id": pa.array(rep_u, pa.int64()),
                "guser": pa.array(rep_u, pa.int64()),
                "gsec": pa.array(rep_g, pa.int64()),
                "gts_us": pa.array(rep_g * 1_000_000, pa.int64()),
            }
        )

    grid = users.map_batches(to_grid, batch_format="pandas")

    def reduce_ties(batch: pd.DataFrame) -> pd.DataFrame:
        # per-batch max(value) per (user, ts); cross-batch ties resolve
        # to max(value) via the join's sorts-last-wins rule
        return batch.groupby(["user_id", "ts"], as_index=False)[
            "value"
        ].max()

    right = ev.map_batches(reduce_ties, batch_format="pandas")
    # merge-shuffle granularity sized to data: ev.count() is free on
    # the materialized slice; grid rows are the same order of magnitude
    n_merge = max(16, 2 * ev.count() // 20_000)
    out = asof_join_partitioned(
        grid, right, "user_id", "gts_us", "ts", bucket_s=2 * 86400,
        left_keep=["guser", "gsec"], right_keep=["value"],
        dtypes={"guser": "Int64", "gsec": "Int64", "value": "Float64"},
        n_merge_buckets=n_merge,
    ).to_pandas()
    out = out.rename(columns={"guser": "user_id"})
    out["value"] = out["value"].astype("Float64").round(2)
    return (
        out[["user_id", "gsec", "value"]]
        .sort_values(["user_id", "gsec"])
        .reset_index(drop=True)
    )


def q_star_join(sf_dir: str) -> pd.DataFrame:
    """Star-schema rollup: orders (fact) x customer (large dim, hash
    join) x nation x region (fixed-size dims, broadcast into the
    customer map) -> revenue per region.  The dimension chain collapses
    to ONE byte-partitioned hash join plus a broadcast lookup — the
    nation/region tables are constant-size in TPC-H no matter the SF,
    so shipping them inside the task closure is the 100 TB plan, not a
    shortcut."""
    import os

    from unfurl_ray.ops.relational import pre_aggregate

    nation = _parquet(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    region = _parquet(sf_dir, "region", ["r_regionkey", "r_name"])
    r_name = {
        r["r_regionkey"]: r["r_name"] for r in region.take_all()
    }
    nat_region = {
        n["n_nationkey"]: r_name[n["n_regionkey"]]
        for n in nation.take_all()
    }

    customer = _parquet_sh(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def add_region(batch: pa.Table) -> pa.Table:
        nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
        names = pa.array([nat_region[int(k)] for k in nk], pa.string())
        return pa.table(
            {"c_custkey": batch.column("c_custkey"), "r_name": names}
        )

    cust_region = customer.map_batches(add_region, batch_format="pyarrow")

    in_bytes = sum(
        os.stat(f"{sf_dir}/{t}.parquet").st_size
        for t in ("orders", "customer")
    )
    orders = _parquet_sh(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    joined = orders.join(
        cust_region,
        join_type="inner",
        num_partitions=int(max(8, in_bytes // (256 << 20))),
        on=("o_custkey",),
        right_on=("c_custkey",),
    )
    out = pre_aggregate(
        joined, ["r_name"],
        {"revenue": ("o_totalprice", "sum"),
         "n_orders": ("o_totalprice", "count")},
    ).to_pandas()
    out["revenue"] = out["revenue"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("r_name").reset_index(drop=True)


def q_percent_rank(sf_dir: str) -> pd.DataFrame:
    """Per-domain score normalization: exact percent_rank of each
    document's quality score within its source, via the histogram
    decomposition (ops.relational.percent_rank_by) — the shuffle
    carries one row per distinct (source, quality), never a source's
    documents, so a million-doc domain costs the same as a ten-doc
    one.  Quality scores are 4-decimal-rounded, bounding the histogram
    at 10k rows per source."""
    from unfurl_ray.ops.relational import percent_rank_by
    from unfurl_ray.ops.textstats import quality_score_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "source", "text"])

    def score(batch: pd.DataFrame) -> pa.Table:
        q = quality_score_batch(batch)
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(), pa.int64()
                ),
                "source": pa.array(batch["source"], pa.string()),
                "quality": pa.array(
                    q["quality"].to_numpy(), pa.float64()
                ),
            }
        )

    scored = ds.map_batches(score, batch_format="pandas")
    out = percent_rank_by(
        scored, key_col="source", value_col="quality"
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return (
        out[["doc_id", "source", "quality", "pr"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_k_anon(sf_dir: str) -> pd.DataFrame:
    """k-anonymity release: (source, lang) tuples appearing < 5 times
    are suppressed to '*' so no released row's quasi-identifiers match
    fewer than 5 documents.  Tuple frequencies ride the bucketed
    histogram + hash-join shape (ops.privacy.k_anonymize) — no rare
    set on the driver."""
    from unfurl_ray.ops.privacy import k_anonymize

    ds = _parquet_sh(sf_dir, "documents", ["doc_id", "source", "lang"])
    out = k_anonymize(ds, quasi_cols=["source", "lang"], k=5).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return (
        out[["doc_id", "source", "lang", "group_n"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_export_jsonl(sf_dir: str) -> pd.DataFrame:
    """JSONL corpus export (8 hash-bucketed part files under /tmp,
    resumable, deterministic) -> the manifest's (bucket, n_rows),
    hash-checked against the same multiplicative-hash bucketing in
    SQL.  File bytes and skip flags are audited by pytest, not the
    oracle (they are filesystem facts, not SQL facts)."""
    import shutil
    import tempfile

    from unfurl_ray.ops.layout import write_jsonl_shards

    ds = _parquet_sh(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out_dir = tempfile.mkdtemp(prefix="unfurl_jsonl_")
    try:
        manifest = write_jsonl_shards(
            ds, out_dir, id_col="doc_id", n_buckets=8
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return manifest[["bucket", "n_rows"]].reset_index(drop=True)


def q_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered conversion funnel signup -> click -> purchase with
    first-touch semantics (each step counted only strictly after the
    user's first qualifying previous step).  Per step: one bucketed
    min-aggregate + one hash join against the surviving-keys mapping —
    no per-user event stream is ever grouped (ops.relational.
    funnel_counts)."""
    from unfurl_ray.ops.relational import funnel_counts

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts", "event_type"])
    out = funnel_counts(
        ds, key_col="user_id", ts_col="ts", type_col="event_type",
        steps=["signup", "click", "purchase"],
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_zscore(sf_dir: str) -> pd.DataFrame:
    """Per-event-type z-score normalization of event values — the
    feature-scaling step before anomaly thresholds or model input.
    Two passes: per-key (sum, sumsq, count) pre-aggregate, then a
    stateless map; no row shuffle (ops.relational.zscore_by)."""
    from unfurl_ray.ops.relational import zscore_by

    ds = _parquet_sh(sf_dir, "events", ["event_id", "event_type", "value"])
    out = zscore_by(ds, key_col="event_type", value_col="value").to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return (
        out[["event_id", "event_type", "value", "z"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def q_dataset_diff(sf_dir: str) -> pd.DataFrame:
    """Snapshot delta detection: documents vs a simulated re-crawl
    (every 7th doc gone, every 11th edited, every 13th duplicated
    under a new id) -> added / removed / changed ids only.  Narrow
    (id, md5) projections into one full-outer join; unchanged rows
    never leave the classify map (ops.diff.dataset_diff)."""
    import hashlib as _hl

    from unfurl_ray.ops.diff import dataset_diff

    def fp_batch(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fp": pa.array(
                    [_hl.md5((t or "").encode()).hexdigest()
                     for t in texts],
                    pa.string(),
                ),
            }
        )

    old = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def simulate_new(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), np.int64)
        texts = batch.column("text").to_pylist()
        out_id, out_txt = [], []
        for i, t in zip(ids, texts):
            if i % 7 != 0:
                out_id.append(int(i))
                out_txt.append(t + " v2" if i % 11 == 0 else t)
            if i % 13 == 0:
                out_id.append(int(i) + 1_000_000)
                out_txt.append(t)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_txt, pa.string()),
            }
        )

    new = _parquet(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        simulate_new, batch_format="pyarrow"
    )
    out = dataset_diff(
        old.map_batches(fp_batch, batch_format="pyarrow"),
        new.map_batches(fp_batch, batch_format="pyarrow"),
        id_col="doc_id", fp_col="fp",
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_transitions(sf_dir: str) -> pd.DataFrame:
    """Event-type transition matrix (first-order Markov counts over
    each user's time-ordered stream) — 25 cells from 5 event types;
    per-user streams pre-aggregate inside their group, so the global
    reduce sees |types|^2 rows per user, not events."""
    from unfurl_ray.ops.relational import transition_counts

    ds = _parquet_sh(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"])
    out = transition_counts(
        ds, key_col="user_id", ts_col="ts", type_col="event_type",
        id_col="event_id",
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def q_drift_kl(sf_dir: str) -> pd.DataFrame:
    """Distribution-drift monitor: KL(day's event-type mix || global
    mix) per day — the alarm a streaming ingest pipeline runs to catch
    upstream behavior changes.  One (day, type) pre-aggregated count
    shuffle; the 30x5 histogram finishes on the driver."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type"])

    def day_of(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["day"] = batch["ts"].dt.floor("D")
        return out[["day", "event_type"]]

    counts = pre_aggregate(
        ds.map_batches(day_of, batch_format="pandas"),
        ["day", "event_type"],
        {"n": ("event_type", "count")},
    ).to_pandas()
    total = counts.groupby("event_type")["n"].sum()
    q = (total / total.sum()).rename("q")
    counts["p"] = counts["n"] / counts.groupby("day")["n"].transform(
        "sum"
    )
    counts = counts.merge(q, left_on="event_type", right_index=True)
    counts["term"] = counts["p"] * np.log(counts["p"] / counts["q"])
    out = (
        counts.groupby("day", as_index=False)["term"].sum()
        .rename(columns={"term": "kl"})
    )
    out["kl"] = out["kl"].round(6)
    return out.sort_values("day").reset_index(drop=True)


def q_trending(sf_dir: str) -> pd.DataFrame:
    """Top-2 event types per day by count — windowed trending terms.
    The heavy reduce is the pre-aggregated (day, type) count; the
    top-k runs on the tiny histogram (partial top-k per batch)."""
    from unfurl_ray.ops.relational import pre_aggregate, topk_per_group

    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type"])

    def day_of(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        out["day"] = batch["ts"].dt.floor("D")
        return out[["day", "event_type"]]

    counts = pre_aggregate(
        ds.map_batches(day_of, batch_format="pandas"),
        ["day", "event_type"],
        {"n": ("event_type", "count")},
    )
    out = topk_per_group(
        counts, key_col="day", order_col="n", k=2,
        tiebreak_col="event_type",
    )
    out["n"] = out["n"].astype("int64")
    return (
        out[["day", "event_type", "n"]]
        .sort_values(["day", "event_type"])
        .reset_index(drop=True)
    )


def q_window_join(sf_dir: str) -> pd.DataFrame:
    """All (view, click) pairs per user with the click 0-1 h after the
    view — event-time stream-stream join via bucket fan-out
    (ops.relational.windowed_pair_join); no per-user stream ever
    groups, rights fan out 2x instead."""
    from unfurl_ray.ops.relational import windowed_pair_join

    ds = _parquet_sh(sf_dir, "events",
                  ["event_id", "user_id", "ts", "event_type"])
    out = windowed_pair_join(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        type_col="event_type", left_type="view", right_type="click",
        width_s=3600,
    ).to_pandas()
    return (
        out.sort_values(["left_id", "right_id"]).reset_index(drop=True)
    )


def q_mad(sf_dir: str) -> pd.DataFrame:
    """Robust per-type value profile: discrete median, MAD, and the
    count of 3-MAD outliers per event_type, all in exact integer
    cents (ops.relational.mad_outliers_by) — two histogram shuffles
    plus one counting pass; no event_type's rows ever group."""
    from unfurl_ray.ops.relational import mad_outliers_by

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])
    out = mad_outliers_by(ds, key_col="event_type",
                          value_col="value", z=3.0)
    out["n"] = out["n"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_new_users(sf_dir: str) -> pd.DataFrame:
    """Daily acquisition: number of users whose FIRST event falls on
    each day.  One bucketed min-aggregate per user (shuffle carries
    (user, day) partials, pre-reduced per batch) and one small count
    per day — the first-touch attribution shape."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate,
        pre_aggregate,
    )

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])

    def day(batch: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(), pa.int64()
                ),
                "day": pa.array(
                    batch["ts"].dt.strftime("%Y-%m-%d"), pa.string()
                ),
            }
        )

    firsts = bucketed_aggregate(
        ds.map_batches(day, batch_format="pandas"),
        ["user_id"], {"first_day": ("day", "min")},
    )
    out = pre_aggregate(
        firsts, ["first_day"], {"new_users": ("user_id", "count")}
    ).to_pandas()
    out["new_users"] = out["new_users"].astype("int64")
    return out.sort_values("first_day").reset_index(drop=True)


def q_bm25(sf_dir: str) -> pd.DataFrame:
    """BM25 retrieval: top-20 documents for the query {hash, merge,
    vector} (ops.textstats.bm25_topk) — one tokenize pass to a
    compact per-doc stats table, corpus stats folded from per-batch
    partials, vectorized scoring with partial top-k merge."""
    from unfurl_ray.ops.textstats import bm25_topk

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = bm25_topk(ds, terms=["hash", "merge", "vector"], k=20)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out


def q_conv_assemble(sf_dir: str) -> pd.DataFrame:
    """Training-example assembly: stitch each 8-doc group (the
    transcript conv grouping, conv = doc_id // 8) into ONE ordered
    text blob — the "turns -> training example" step.  Convs hash
    onto shuffle buckets (whole conv co-locates; a conv is bounded at
    8 turns so no skew risk); inside a bucket the stitch is one
    sort + groupby string-agg, vectorized per bucket not per conv."""
    from unfurl_ray.sources.transcripts import TURNS_PER_CONV as TURNS

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def shape(batch: pd.DataFrame) -> pa.Table:
        conv = batch["doc_id"].to_numpy() // TURNS
        return pa.table(
            {
                "conv": pa.array(conv, pa.int64()),
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(), pa.int64()
                ),
                "text": pa.array(batch["text"], pa.string()),
                "_b": pa.array(conv % 32, pa.int64()),
            }
        )

    def stitch(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("doc_id")
        agg = g.groupby("conv", sort=True).agg(
            full_text=("text", lambda s: "\n".join(s)),
            n_turns=("text", "size"),
        )
        return pa.table(
            {
                "conv_id": pa.array(
                    [f"{c:08d}" for c in agg.index], pa.string()
                ),
                "full_text": pa.array(
                    agg["full_text"], pa.large_string()
                ),
                "n_turns": pa.array(
                    agg["n_turns"].to_numpy(), pa.int64()
                ),
            }
        )

    out = (
        ds.map_batches(shape, batch_format="pandas")
        .groupby("_b")
        .map_groups(stitch, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("conv_id").reset_index(drop=True)


def q_sft_pairs(sf_dir: str) -> pd.DataFrame:
    """SFT (context, target) pair construction: for every turn k >= 1
    of each 8-doc conv, context = all earlier turns joined by newline,
    target = the turn itself.  Whole convs co-locate by hash; within a
    bucket the context is a per-conv cumulative string sum (shifted by
    one) — O(turns^2) chars per conv, bounded by the 8-turn cap.
    DuckDB twin: windowed string_agg with a 'rows between unbounded
    preceding and 1 preceding' frame."""
    from unfurl_ray.sources.transcripts import TURNS_PER_CONV as TURNS

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def shape(batch: pd.DataFrame) -> pa.Table:
        conv = batch["doc_id"].to_numpy() // TURNS
        return pa.table(
            {
                "conv": pa.array(conv, pa.int64()),
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(), pa.int64()
                ),
                "text": pa.array(batch["text"], pa.string()),
                "_b": pa.array(conv % 32, pa.int64()),
            }
        )

    def pairs(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("doc_id").reset_index(drop=True)
        conv = g["conv"].to_numpy()
        texts = g["text"].to_list()
        # the running concatenation IS the string-agg; per-conv cost is
        # O(turns^2) chars, bounded by the turn cap — not a row-kernel
        # shortcut being missed
        ctx: list[str | None] = [None] * len(texts)
        cur: str | None = None
        prev = None
        for i, t in enumerate(texts):
            if conv[i] != prev:
                cur, prev = None, conv[i]
            ctx[i] = cur
            cur = t if cur is None else f"{cur}\n{t}"
        keep = np.array([c is not None for c in ctx])
        return pa.table(
            {
                "conv_id": pa.array(
                    [f"{c:08d}" for c in conv[keep]], pa.string()
                ),
                "turn_idx": pa.array(
                    (g.loc[keep, "doc_id"] % TURNS).to_numpy(),
                    pa.int64(),
                ),
                "context": pa.array(
                    [c for c in ctx if c is not None],
                    pa.large_string(),
                ),
                "target": pa.array(
                    g.loc[keep, "text"], pa.large_string()
                ),
            }
        )

    out = (
        ds.map_batches(shape, batch_format="pandas")
        .groupby("_b")
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


def q_upsert_merge(sf_dir: str) -> pd.DataFrame:
    """CDC snapshot compaction: apply a deterministic change stream
    (updates for doc_id%10==0, deletes for doc_id%17==0 — deletes
    carry version 2 so they win — inserts at doc_id+10000000 for
    doc_id%23==0) onto the documents snapshot via ops.cdc
    .apply_changes: one bucket-co-partitioned shuffle, latest version
    per key wins, vectorized resolve.  Returns (doc_id, n_chars of
    the merged text) so the oracle compares the full outcome without
    shipping every text to the driver comparison untrimmed."""
    from unfurl_ray.ops.cdc import apply_changes

    base = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def make_changes(batch: pd.DataFrame) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        t = batch["text"]
        frames = []
        upd = d % 10 == 0
        if upd.any():
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": d[upd],
                        "text": "UPDATED " + t[upd],
                        "op": "upsert",
                        "ver": np.int64(1),
                    }
                )
            )
        dele = d % 17 == 0
        if dele.any():
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": d[dele],
                        "text": "",
                        "op": "delete",
                        "ver": np.int64(2),
                    }
                )
            )
        ins = d % 23 == 0
        if ins.any():
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": d[ins] + 10_000_000,
                        "text": "NEW " + t[ins],
                        "op": "upsert",
                        "ver": np.int64(1),
                    }
                )
            )
        out = (
            pd.concat(frames, ignore_index=True)
            if frames
            else pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "text": pd.Series([], dtype="object"),
                    "op": pd.Series([], dtype="object"),
                    "ver": pd.Series([], dtype="int64"),
                }
            )
        )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "text": pa.array(out["text"], pa.string()),
                "op": pa.array(out["op"], pa.string()),
                "ver": pa.array(out["ver"], pa.int64()),
            }
        )

    changes = _parquet(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        make_changes, batch_format="pandas"
    )
    merged = apply_changes(
        base, changes, key_col="doc_id", payload_cols=["text"]
    )

    def finish(batch: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(), pa.int64()
                ),
                "n_chars": pa.array(
                    batch["text"].str.len().to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    out = merged.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_json_extract(sf_dir: str) -> pd.DataFrame:
    """Schema-on-read: pull the integer field k out of the JSON
    ``props`` column with one compiled vectorized regex (no per-row
    json.loads) and aggregate events per k."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["event_id", "props"])

    def extract(batch: pd.DataFrame) -> pa.Table:
        k = (
            batch["props"]
            .str.extract(r'"k":\s*(-?\d+)', expand=False)
            .astype("float64")  # NaN-tolerant; cast back after dropna
        )
        keep = k.notna()
        return pa.table(
            {"k": pa.array(k[keep].astype(np.int64), pa.int64())}
        )

    out = pre_aggregate(
        ds.map_batches(extract, batch_format="pandas"),
        ["k"], {"n": ("k", "count")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("k").reset_index(drop=True)


def q_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document character entropy (ops.textstats
    .char_entropy_batch) — map-only, no shuffle; the low-diversity
    text filter signal."""
    from unfurl_ray.ops.textstats import char_entropy_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        char_entropy_batch, batch_format="pandas"
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_user_entropy(sf_dir: str) -> pd.DataFrame:
    """Behavioral entropy per user (Shannon entropy of the user's
    event-type mix).  ONE shuffle: per-batch (user, type) partial
    counts hash-bucket by USER, and each bucket both merges the
    partials and computes every user's entropy vectorized (the
    per-user total via transform, no Python per user)."""
    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])

    def partial(batch: pd.DataFrame) -> pa.Table:
        c = (
            batch.groupby(["user_id", "event_type"], sort=False)
            .size()
            .reset_index(name="n")
        )
        c["_b"] = (
            pd.util.hash_pandas_object(c["user_id"], index=False)
            .to_numpy() % np.uint64(64)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            c, preserve_index=False
        ).replace_schema_metadata(None)

    def entropy(group: pd.DataFrame) -> pa.Table:
        m = (
            group.groupby(["user_id", "event_type"], as_index=False,
                          sort=False)["n"].sum()
        )
        t = m.groupby("user_id")["n"].transform("sum").to_numpy()
        p = m["n"].to_numpy(dtype=np.float64) / t
        m["_h"] = -p * np.log2(p)
        out = m.groupby("user_id", as_index=False).agg(
            entropy=("_h", "sum"), n=("n", "sum")
        )
        out["entropy"] = np.floor(
            out["entropy"].to_numpy() * 1e6 + 0.5
        ) / 1e6
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(entropy, batch_format="pandas")
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_source_sim(sf_dir: str) -> pd.DataFrame:
    """Corpus-level source similarity: cosine between each pair of
    sources' term-count vectors.  The distributed matrix product
    shape: (source, word, n) partials hash-bucket by WORD (so one
    word's counts across all sources co-locate), each bucket emits a
    PARTIAL dot product per source pair and partial squared norms —
    a handful of floats — and the driver folds them.  The corpus
    payload crosses the shuffle once as (source, word, n) rows."""
    import itertools
    import re as _re

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws  # shared token contract
    ds = _parquet(sf_dir, "documents", ["source", "text"])

    def counts(batch: pd.DataFrame) -> pa.Table:
        from collections import Counter

        c: "Counter[tuple]" = Counter()
        for src, text in zip(batch["source"], batch["text"]):
            for w in _ws.split((text or "").lower()):
                if w:
                    c[(src, w)] += 1
        src = [k[0] for k in c]
        wrd = [k[1] for k in c]
        out = pd.DataFrame({"source": src, "word": wrd,
                            "n": list(c.values())})
        out["_b"] = (
            pd.util.hash_pandas_object(out["word"], index=False)
            .to_numpy() % np.uint64(32)
        ).astype(np.int64)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    def partial_products(group: pd.DataFrame) -> pa.Table:
        m = (
            group.groupby(["source", "word"], as_index=False,
                          sort=False)["n"].sum()
        )
        piv = m.pivot_table(index="word", columns="source",
                            values="n", fill_value=0)
        srcs = list(piv.columns)
        rows = []
        v = {s: piv[s].to_numpy(dtype=np.float64) for s in srcs}
        for s in srcs:
            rows.append((s, s, float((v[s] * v[s]).sum())))
        for a, b in itertools.combinations(sorted(srcs), 2):
            rows.append((a, b, float((v[a] * v[b]).sum())))
        out = pd.DataFrame(rows, columns=["src_a", "src_b", "dot"])
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    parts = (
        ds.map_batches(counts, batch_format="pandas")
        .groupby("_b")
        .map_groups(partial_products, batch_format="pandas")
        .to_pandas()  # <= (pairs + sources) rows per bucket
    )
    tot = parts.groupby(["src_a", "src_b"], as_index=False)["dot"].sum()
    norms = {
        r.src_a: np.sqrt(r.dot)
        for r in tot[tot.src_a == tot.src_b].itertuples()
    }
    pairs = tot[tot.src_a != tot.src_b].copy()
    pairs["cosine"] = np.floor(
        pairs["dot"].to_numpy()
        / np.array([norms[a] for a in pairs["src_a"]])
        / np.array([norms[b] for b in pairs["src_b"]])
        * 1e6 + 0.5
    ) / 1e6
    return (
        pairs[["src_a", "src_b", "cosine"]]
        .sort_values(["src_a", "src_b"])
        .reset_index(drop=True)
    )


def q_skew_report(sf_dir: str) -> pd.DataFrame:
    """Key-skew diagnostics for shuffle planning: the Gini coefficient
    of the per-user event-count distribution, plus extremes.  Two
    histogram collapses — (user -> n) bucketed, then (n -> multiplicity)
    — so the driver folds one row per DISTINCT count, never per key;
    the rank sums come exactly from contiguous rank runs in integer
    arithmetic (no per-key ranking shuffle)."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate,
        pre_aggregate,
    )

    ds = _parquet_sh(sf_dir, "events", ["user_id"])
    per_user = bucketed_aggregate(
        ds, ["user_id"], {"c": ("user_id", "count")}
    )
    hist = pre_aggregate(
        per_user, ["c"], {"m": ("c", "count")}
    ).to_pandas().sort_values("c").reset_index(drop=True)

    c = hist["c"].to_numpy(dtype=np.int64)
    m = hist["m"].to_numpy(dtype=np.int64)
    n = int(m.sum())
    s = int((c * m).sum())
    # ranks of a count-c run start after all smaller counts:
    # sum_{i=a}^{a+m-1} (2i - n - 1) = 2(ma + m(m-1)/2) - m(n+1)
    a = np.concatenate(([1], 1 + np.cumsum(m)[:-1]))
    rank_sum = 2 * (m * a + m * (m - 1) // 2) - m * (n + 1)
    gini = float((rank_sum * c).sum()) / (n * s)
    return pd.DataFrame(
        {
            "gini": [np.floor(gini * 1e6 + 0.5) / 1e6],
            "n_users": [n],
            "n_events": [s],
            "max_c": [int(c[-1])],
        }
    )


def q_mv_update(sf_dir: str) -> pd.DataFrame:
    """Materialized-view maintenance: a per-type (count, sum) rollup
    snapshot built over events BEFORE 2024-01-25 is refreshed with the
    remaining days as a raw delta (ops.incremental.update_aggregate —
    one bucketed shuffle; the delta pre-reduces per batch).  The
    oracle is the FULL recompute over all events, so the check proves
    incremental == from-scratch."""
    from unfurl_ray.ops.incremental import update_aggregate
    from unfurl_ray.ops.relational import pre_aggregate

    CUTOFF = pa.scalar(
        pd.Timestamp("2024-01-25"), type=pa.timestamp("us")
    )
    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type", "value"])
    ds = ds.materialize()  # consumed twice (snapshot base + delta)

    def _split(keep_before: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = pc.less(batch.column("ts"), CUTOFF)
            return batch.filter(mask if keep_before else pc.invert(mask))
        return f

    before = ds.map_batches(_split(True), batch_format="pyarrow")
    after = ds.map_batches(_split(False), batch_format="pyarrow")
    snapshot = pre_aggregate(
        before, ["event_type"],
        {"n": ("value", "count"), "sum_value": ("value", "sum")},
    )
    out = update_aggregate(
        snapshot, after, ["event_type"],
        {"n": ("value", "count"), "sum_value": ("value", "sum")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def q_table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-invariant table checksum of documents (sum of per-row
    md5-prefix ints mod 2^61-1; ops.incremental.table_checksum) —
    the one-scalar output-verification primitive for comparing fresh
    vs resumed runs.  One int64 partial per batch reaches the
    driver."""
    from unfurl_ray.ops.incremental import table_checksum

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def rows(batch: pd.DataFrame) -> list[str]:
        return [
            f"{i}|{t if t is not None else ''}"
            for i, t in zip(batch["doc_id"], batch["text"])
        ]

    c, n = table_checksum(ds, rows)
    return pd.DataFrame({"checksum": [c], "n": [n]})


def q_regression(sf_dir: str) -> pd.DataFrame:
    """Per-type OLS trend of value over time (units/day) via
    distributed SUFFICIENT STATISTICS: each batch contributes
    (n, Sx, Sy, Sxy, Sxx) per key — five floats cross the shuffle per
    (key, batch), never a row.  Time is centered at the corpus epoch
    BEFORE squaring (the 1704067200 constant on both sides) so the
    normal-equation cancellation stays mild and the SQL twin matches
    at 4 decimals."""
    from unfurl_ray.ops.relational import pre_aggregate

    EPOCH = 1_704_067_200.0  # 2024-01-01 in seconds
    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type", "value"])

    def stats(batch: pd.DataFrame) -> pa.Table:
        x = (
            batch["ts"].astype("int64").to_numpy() / 1e6 - EPOCH
        ) / 86400.0
        y = batch["value"].to_numpy(dtype=np.float64)
        d = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        g = d.groupby("event_type", as_index=False).sum()
        return pa.Table.from_pandas(
            g, preserve_index=False
        ).replace_schema_metadata(None)

    agg = pre_aggregate(
        ds.map_batches(stats, batch_format="pandas"),
        ["event_type"],
        {
            "n": ("n", "sum"),
            "sx": ("sx", "sum"),
            "sy": ("sy", "sum"),
            "sxy": ("sxy", "sum"),
            "sxx": ("sxx", "sum"),
        },
    ).to_pandas()

    n = agg["n"].to_numpy(dtype=np.float64)
    sx, sy = agg["sx"].to_numpy(), agg["sy"].to_numpy()
    sxy, sxx = agg["sxy"].to_numpy(), agg["sxx"].to_numpy()
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "slope": np.floor(slope * 1e4 + 0.5) / 1e4,
            "intercept": np.floor(intercept * 1e4 + 0.5) / 1e4,
            "n": agg["n"].astype("int64"),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


def q_zorder_scan(sf_dir: str) -> pd.DataFrame:
    """Multi-dimensional pruning: events materialized ONCE
    hive-partitioned by z-order cell of (user_id, day) — the 2-D
    analogue of the bucketed layout — then a (user 100-300, day 5-10)
    box query reads ONLY the intersecting cells (file-level pruning)
    and applies the exact box filter per batch.  Oracle: the same box
    over the raw table."""
    import hashlib
    import os
    import tempfile

    from unfurl_ray.ops.layout import read_zordered_box, write_zordered

    DAY0 = 19723  # 2024-01-01 in days since epoch
    tag = _cache_tag(sf_dir, "zorder", "events")
    root = os.path.join(tempfile.gettempdir(), f"unfurl_ray_z_{tag}")

    if not os.path.isdir(root):
        ds = _parquet_sh(
            sf_dir, "events", ["user_id", "ts", "event_type", "value"]
        )

        def quantize(batch: pd.DataFrame) -> pd.DataFrame:
            batch["day"] = (
                batch["ts"].astype("int64") // 86_400_000_000 - DAY0
            ).astype("int64")
            return batch

        tmp = root + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # crashed attempt
        write_zordered(
            ds.map_batches(quantize, batch_format="pandas"),
            "user_id", "day", tmp, cell_bits=6,
        )
        os.rename(tmp, root)

    boxed, n_read, n_total = read_zordered_box(
        root, 100, 300, 5, 10,
        columns=["user_id", "day", "event_type", "value"],
    )
    assert boxed is not None and n_read < n_total, (
        "z-order pruning read every cell — layout broken"
    )

    from unfurl_ray.ops.relational import pre_aggregate

    out = pre_aggregate(
        boxed, ["event_type"],
        {"n": ("value", "count"), "sum_value": ("value", "sum")},
    ).to_pandas()
    if out.empty:  # the box can be legitimately empty at tiny sf
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype="object"),
                "n": pd.Series([], dtype="int64"),
                "sum_value": pd.Series([], dtype="float64"),
            }
        )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = out["sum_value"].round(2)
    return out.sort_values("event_type").reset_index(drop=True)


def q_running_total(sf_dir: str) -> pd.DataFrame:
    """Per-user running count + exact cents sum (distributed prefix
    sum): per-(user, day) cell partials -> per-user exclusive prefix
    carries -> one co-partitioned union-groupby where each cell
    cumsums locally and adds its carry.  No group ever holds a whole
    user stream.  Returns the 2000 largest event_ids so the oracle
    row set is stable and small."""
    from unfurl_ray.ops.relational import running_total

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    )
    out = running_total(
        ds, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", bucket_s=86_400,
    ).to_pandas()
    out = out.sort_values("event_id", ascending=False).head(2000)
    return out.sort_values("event_id").reset_index(drop=True)


def q_cube_revenue(sf_dir: str) -> pd.DataFrame:
    """CUBE(event_type, iso-weekday) revenue in one shuffle: each
    batch fans out one pre-aggregated partial per grouping set (4
    sets for 2 keys), all sets share a single groupby — the shuffle
    carries stub rows, never events.  Exact integer cents keep every
    total order-independent."""
    from unfurl_ray.ops.relational import (
        cube_sets, grouping_sets_aggregate,
    )

    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type", "value"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "dow": (batch["ts"].dt.dayofweek + 1).astype(str),
                "cents": np.floor(
                    batch["value"].to_numpy(dtype=np.float64) * 100.0
                ).astype(np.int64),
            }
        )

    out = grouping_sets_aggregate(
        ds.map_batches(prep, batch_format="pandas"),
        ["event_type", "dow"], cube_sets(["event_type", "dow"]),
        {"n": ("cents", "count"), "sum_cents": ("cents", "sum")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    out["sum_cents"] = out["sum_cents"].astype("int64")
    return out.sort_values(["event_type", "dow"]).reset_index(drop=True)


def q_bpe_merges(sf_dir: str) -> pd.DataFrame:
    """Tokenizer fitting: the first 12 BPE merge operations learned
    over the documents corpus.  The corpus collapses to a word
    histogram in one shuffle; every merge round then runs on the
    compressed form with per-batch vectorized pair partials and a
    driver fold of one candidate row per batch.  Rows-only check (the
    iterative argmax has no single-statement SQL twin); pytest parity
    against the dict-based Sennrich reference covers exactness."""
    from unfurl_ray.ops.bpe import bpe_fit

    ds = _parquet(sf_dir, "documents", ["text"])
    # n_buckets sized to this corpus's unique-word count; scale it
    # with vocabulary at larger inputs
    return bpe_fit(ds, "text", n_merges=12, n_buckets=16)


def q_normalize_text(sf_dir: str) -> pd.DataFrame:
    """Unicode text normalization — the step every LLM-data pipeline
    runs before quality filtering: collapse ASCII whitespace runs to
    one space, trim, then NFC-normalize.  Pure per-row map (zero
    shuffle); the string kernels are pandas' vectorized .str ops.
    The explicit [ \\t\\n\\r\\f\\v] class keeps Python and RE2
    whitespace semantics aligned (the q_quality lesson)."""
    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def norm(batch: pd.DataFrame) -> pa.Table:
        s = (
            batch["text"]
            .fillna("")
            .str.replace(r"[ \t\n\r\f\v]+", " ", regex=True)
            # strip SPACES only: the collapse already turned every
            # class character at the edges into ' ', and bare
            # .strip() would also remove U+2028/U+0085-style exotics
            # that DuckDB trim() keeps
            .str.strip(" ")
            .str.normalize("NFC")
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
                "text_norm": pa.array(s, pa.large_string()),
                "n_chars_norm": pa.array(
                    s.str.len().to_numpy(dtype=np.int64), pa.int64()
                ),
            }
        )

    out = ds.map_batches(norm, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_psi_drift(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index between the first and second
    half-month of events — the continuous-distribution drift monitor
    (sibling of q_drift_kl's categorical KL): equi-depth decile
    breaks come from the BASELINE slice's exact integer-cents
    quantiles (the q_winsorize histogram machinery, shuffle bounded
    by distinct values), rows bin against the broadcast breaks, and
    the tiny (side, bin) count table yields per-bin smoothed PSI
    terms ``(p_a - p_b) * ln(p_a / p_b)``, ``p = (c+1)/(n+10)``.
    Every arithmetic step mirrors the SQL twin operation-for-
    operation, so the compare is hash-exact."""
    import pyarrow.compute as pc

    from unfurl_ray.ops.relational import (
        _ts_us, bucketed_aggregate, hist_quantile_disc_by,
        pre_aggregate,
    )

    cut_us = pd.Timestamp("2024-01-16").value // 1000
    qs = [round(0.1 * i, 1) for i in range(1, 10)]

    ds = _parquet_sh(sf_dir, "events", ["ts", "value"])

    def shape(batch: pd.DataFrame) -> pa.Table:
        cents = np.floor(
            batch["value"].to_numpy(dtype=np.float64) * 100.0
        ).astype(np.int64)
        side = (
            _ts_us(batch["ts"]).to_numpy() >= cut_us
        ).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(cents, pa.int64()),
                "side": pa.array(side, pa.int64()),
                "k": pa.array(
                    np.zeros(len(batch), dtype=np.int64), pa.int64()
                ),
            }
        )

    shaped = ds.map_batches(shape, batch_format="pandas").materialize()

    hist_a = bucketed_aggregate(
        shaped.map_batches(
            lambda t: t.filter(pc.equal(t.column("side"), 0)),
            batch_format="pyarrow",
        ),
        ["k", "c"], {"cnt": ("c", "count")},
    )
    row = hist_quantile_disc_by(
        hist_a, "k", "c", "cnt", qs
    ).to_pandas().iloc[0]
    breaks = np.sort(
        np.array(
            [row[f"q_{str(q).replace('.', '')}"] for q in qs],
            dtype=np.int64,
        )
    )

    def binify(batch: pa.Table) -> pa.Table:
        c = batch.column("c").to_numpy(zero_copy_only=False)
        b = np.searchsorted(breaks, c, side="left")  # = #breaks < c
        return pa.table(
            {
                "side": batch.column("side"),
                "bin": pa.array(b.astype(np.int64), pa.int64()),
            }
        )

    counts = pre_aggregate(
        shaped.map_batches(binify, batch_format="pyarrow"),
        ["side", "bin"], {"n": ("bin", "count")},
    ).to_pandas()
    piv = (
        counts.pivot_table(
            index="bin", columns="side", values="n", fill_value=0
        )
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    ca = piv[0].to_numpy(dtype=np.float64)
    cb = piv[1].to_numpy(dtype=np.float64)
    na, nb = ca.sum(), cb.sum()
    p_a = (ca + 1.0) / (na + 10.0)
    p_b = (cb + 1.0) / (nb + 10.0)
    term = (p_a - p_b) * np.log(p_a / p_b)

    def r6(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e6 + 0.5) / 1e6

    return pd.DataFrame(
        {
            "bin": piv.index.to_numpy(dtype=np.int64),
            "p_a": r6(p_a),
            "p_b": r6(p_b),
            "psi_term": r6(term),
        }
    ).reset_index(drop=True)


def q_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """Tokenizer APPLY — the other half of q_bpe_merges: fit 12 merge
    ops on the corpus, then encode every document with them.  Each
    batch tokenizes only its UNIQUE words (the merge list replays as
    the same vectorized passes the fit uses) and token counts fan
    back per doc with one bincount.  Rows-only check (the fit's
    iterative argmax has no SQL twin); pytest parity against the
    scalar Sennrich apply covers the encode kernel."""
    from unfurl_ray.ops.bpe import bpe_encode_counts, bpe_fit

    merges = bpe_fit(
        _parquet(sf_dir, "documents", ["text"]), "text",
        n_merges=12, n_buckets=16,
    )
    out = bpe_encode_counts(
        _parquet(sf_dir, "documents", ["doc_id", "text"]),
        "text", "doc_id", merges,
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_group_split(sf_dir: str) -> pd.DataFrame:
    """Group-aware (conversation-level) train/val/test split: all 8
    turns of a conversation share one hash slot, so duplicates within
    a conversation can never leak across the train/eval boundary.
    Pure per-row map — no shuffle — and the hash is HUGEINT-
    expressible, so every row's assignment is oracle-checked."""
    from unfurl_ray.ops.sampling import group_split
    from unfurl_ray.sources.transcripts import TURNS_PER_CONV

    ds = _parquet_sh(sf_dir, "documents", ["doc_id"])

    def conv(batch: pd.DataFrame) -> pd.DataFrame:
        batch["conv_id"] = batch["doc_id"] // TURNS_PER_CONV
        return batch

    out = group_split(
        ds.map_batches(conv, batch_format="pandas"), "conv_id",
        [("train", 80), ("val", 10), ("test", 10)],
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_compact_layout(sf_dir: str) -> pd.DataFrame:
    """Layout maintenance: a deliberately fragmented bucketed layout
    of events (24 upstream blocks x 16 bucket dirs => hundreds of
    KB-sized files) compacted to ~one file per partition with the
    tmp+rename commit protocol, then verified by per-bucket row
    counts against the raw table.  The oracle checks the compacted
    layout lost/duplicated no rows; the in-pipeline assert checks the
    file count actually shrank."""
    import hashlib
    import os
    import tempfile

    from unfurl_ray.ops.layout import compact_layout, write_bucketed

    tag = _cache_tag(sf_dir, "compact", "events")
    root = os.path.join(tempfile.gettempdir(), f"unfurl_ray_c_{tag}")

    if not os.path.isdir(root):
        ds = _parquet_sh(sf_dir, "events", ["event_id", "user_id"])
        tmp = root + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # crashed attempt
        write_bucketed(ds.repartition(24), "user_id", tmp, n_buckets=16)
        os.rename(tmp, root)

    man = compact_layout(root, target_bytes=128 << 20)
    fresh = ~man["skipped"].all()
    if fresh:
        assert (
            man["files_after"].sum() < man["files_before"].sum()
        ), "compaction rewrote nothing on a fragmented layout"
    out = pd.DataFrame(
        {
            "bucket": man["dir"]
            .str.rsplit("=", n=1)
            .str[1]
            .astype("int64"),
            "n_rows": man["n_rows"].astype("int64"),
        }
    )
    return out.sort_values("bucket").reset_index(drop=True)


def q_align_union(sf_dir: str) -> pd.DataFrame:
    """Schema evolution: two generations of the same corpus — an old
    shard that predates the (source, n_chars) columns and a new shard
    that has them — unioned BY NAME with typed null padding, zero
    shuffle on either branch.  The split is a doc_id parity filter so
    both branches stream from the same pruned read."""
    import pyarrow.compute as pc

    from unfurl_ray.ops.relational import align_union

    def parity(rem: int):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            return batch.filter(
                pc.equal(pc.bit_wise_and(ids, pa.scalar(1)), rem)
            )
        return f

    old = _parquet(sf_dir, "documents", ["doc_id", "lang"]).map_batches(
        parity(0), batch_format="pyarrow"
    )
    new = _parquet(
        sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]
    ).map_batches(parity(1), batch_format="pyarrow")
    out = align_union([old, new]).to_pandas()
    # float64, not nullable Int64: the DuckDB twin's NULL-padded int
    # column arrives as float64/NaN, and the driver compare
    # stringifies — "123.0"/"nan" must match on BOTH sides
    out["n_chars"] = out["n_chars"].astype("float64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_decayed_sum(sf_dir: str) -> pd.DataFrame:
    """Per-user exponentially TIME-DECAYED activity score (tau = 7
    days, anchored at the corpus max timestamp) — the recency-
    weighted aggregate a freshness-aware sampler feeds on.  The
    anchor comes from parquet FOOTER statistics (metadata-only, no
    scan); per-batch partials collapse users before one bucketed
    shuffle.  Scores round to 4 digits so the float fold is
    order-insensitive at hash precision."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    TAU_US = 7 * 86_400_000_000.0
    bounds = _footer_ts_bounds(sf_dir, "events", "ts")
    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts", "value"])
    if bounds is None:
        from ray.data.aggregate import Max

        t_max = pd.Timestamp(
            ds.aggregate(Max("ts"))["max(ts)"]
        ).value // 1000
    else:
        t_max = pd.Timestamp(bounds[1]).value // 1000

    def partial(batch: pd.DataFrame) -> pa.Table:
        ts = batch["ts"].astype("int64").to_numpy()
        w = np.exp((ts - t_max) / TAU_US)
        part = (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(),
                    "score": w * batch["value"].to_numpy(),
                }
            )
            .groupby("user_id", as_index=False, sort=False)["score"]
            .sum()
        )
        return pa.table(
            {
                "user_id": pa.array(
                    part["user_id"].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
                "score": pa.array(
                    part["score"].to_numpy(), pa.float64()
                ),
            }
        )

    out = bucketed_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"score": ("score", "sum")},
    ).to_pandas()
    out["score"] = out["score"].round(4)
    return out.sort_values("user_id").reset_index(drop=True)


def q_merge_runs(sf_dir: str) -> pd.DataFrame:
    """LSM-style sorted-run merge: three interleaved sorted runs of
    events (event_id % 3 shards, each range-file sorted) folded into
    ONE globally sorted run with metadata-only planning — each output
    range reads just its footer-pruned overlapping files, no global
    re-sort shuffle.  In-pipeline assert: path-sorted reads of the
    merged run are globally monotone.  Oracle: the merged content
    equals the raw table."""
    import glob
    import hashlib
    import os
    import tempfile

    import pyarrow.compute as pc

    from unfurl_ray.ops.layout import merge_sorted_runs

    tag = _cache_tag(sf_dir, "runs", "events")
    root = os.path.join(tempfile.gettempdir(), f"unfurl_ray_r_{tag}")

    if not os.path.isdir(root):
        tmp = root + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # crashed attempt
        os.makedirs(tmp, exist_ok=True)
        for rem in range(3):
            ds = _parquet_sh(
                sf_dir, "events", ["event_id", "user_id", "value"]
            )

            def shard(batch: pa.Table, rem=rem) -> pa.Table:
                ids = batch.column("event_id").to_numpy(
                    zero_copy_only=False
                )
                return batch.filter(pa.array(ids % 3 == rem))

            (
                ds.map_batches(shard, batch_format="pyarrow")
                .sort("event_id")
                .write_parquet(os.path.join(tmp, f"run{rem}"))
            )
        os.rename(tmp, root)

    out_dir = root + "_merged"
    sz = os.path.getsize(f"{sf_dir}/events.parquet")
    tb = max(1 << 16, sz // 8)
    man = merge_sorted_runs(
        [os.path.join(root, f"run{r}") for r in range(3)],
        "event_id", out_dir, target_bytes=tb,
    )
    # fan-out sanity only when the input is big enough to plan >1
    # range (at sf0.001 the whole table fits one target_bytes range)
    if sz >= 2 * tb:
        assert len(man) >= 2, (
            "merge produced a single range — no fan-out"
        )

    merged = sorted(glob.glob(os.path.join(out_dir, "*.parquet")))
    # global-order assert from parquet FOOTER stats only (row-group
    # min/max monotone within and across files) — no full read just
    # to validate; at scale validation stays metadata-sized while
    # the content read below exists only because this query RETURNS
    # the table (pytest covers strict row-level order)
    import pyarrow.parquet as pq

    last = None
    for f in merged:
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().names.index("event_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max, (
                "missing footer stats"
            )
            if last is not None:
                assert st.min > last, "cross-range order broken"
            assert st.max >= st.min
            last = st.max
    out = pd.concat(
        [pd.read_parquet(f) for f in merged], ignore_index=True
    )
    return out[["event_id", "user_id", "value"]]


def q_ewma(sf_dir: str) -> pd.DataFrame:
    """Per-event irregular-time EWMA of user activity (tau = 3 days):
    the decayed recurrence is rewritten as a time-weighted per-key
    prefix sum (see ops/relational.ewma_by), so it rides the same
    skew-safe cell decomposition as q_running_total — no group ever
    holds a whole user stream.  Per-key t0 anchoring keeps exp
    arguments bounded by each user's own time span; keys that outlive
    ~700*tau automatically reroute to the bucket-anchored carry path
    (see q_ewma_bot), so no stream length can overflow float64."""
    from unfurl_ray.ops.relational import ewma_by

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    )
    out = ewma_by(
        ds, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", tau_s=3 * 86_400, bucket_s=86_400,
    ).to_pandas()
    out = out.sort_values("event_id", ascending=False).head(2000)
    return out.sort_values("event_id").reset_index(drop=True)


def q_ewma_bot(sf_dir: str) -> pd.DataFrame:
    """EWMA with a 10-MINUTE tau over month-long streams: every key's
    span exceeds the ~709*tau horizon past which the t0-anchored
    identity (q_ewma's fast path, and the SQL window twin) overflows
    float64, so this exercises ewma_by's per-bucket-anchored carry
    path end to end — weights anchor at each row's own time-bucket
    start and the decayed state carries between buckets as
    ``C_b = (C_{b-1} + P_{b-1}) * exp(-dT/tau)``, every exp argument
    bounded by one bucket width.  The oracle is the O(n^2) pairwise
    definition (``sum v_j * exp(-(t_i-t_j)/tau)``, all exp args <= 0,
    so DuckDB never overflows either) restricted to user_id < 20 to
    keep the quadratic twin cheap; the Ray side is the same
    linear-work distributed kernel that runs at full scale."""
    import pyarrow.compute as pc

    from unfurl_ray.ops.relational import ewma_by

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("user_id"), 20)),
        batch_format="pyarrow",
    )
    out = ewma_by(
        ds, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id", tau_s=600.0, bucket_s=86_400,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_interval_coverage(sf_dir: str) -> pd.DataFrame:
    """Per-user interval-union coverage (gaps and islands): each event
    opens an interval of ``value`` minutes; overlapping/touching
    intervals merge, and the answer is islands + total covered time —
    "how long was each user actually active".  Duration derives from
    exact integer cents (``floor(value*100 + 0.5) * 600000 us``, the
    repo's half-up convention on both sides) so the float never hits
    a rounding boundary differently than the SQL twin.  Batch-local island fragments -> per-key stub merge; see
    ops/relational.merge_intervals for the skew story."""
    from unfurl_ray.ops.relational import _ts_us, merge_intervals

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts", "value"])

    def to_iv(batch: pd.DataFrame) -> pa.Table:
        tu = _ts_us(batch["ts"]).to_numpy()
        # floor(x*100 + 0.5): the repo's half-up convention — np.rint
        # rounds half-to-even while DuckDB round() is half-away, so
        # they disagree at exact .5 products (e.g. value=0.125)
        dur = np.floor(
            batch["value"].to_numpy(dtype=np.float64) * 100.0 + 0.5
        ).astype(np.int64) * 600_000
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
                "s": pa.array(tu, pa.int64()),
                "e": pa.array(tu + dur, pa.int64()),
            }
        )

    out = merge_intervals(
        ds.map_batches(to_iv, batch_format="pandas"),
        key_col="user_id", start_col="s", end_col="e",
    ).to_pandas()
    out = out.astype(
        {"user_id": "int64", "n_islands": "int64", "covered_us": "int64"}
    )
    return out.sort_values("user_id").reset_index(drop=True)


def q_profile(sf_dir: str) -> pd.DataFrame:
    """ANALYZE-style profile of the documents table: per-column
    count / nulls / exact distinct / native min-max / mean repr
    length.  Scalar stats ship #columns rows per batch; distinct
    counts ride the (col, value) unique-pair shuffle, bounded by
    distinct values, not rows."""
    from unfurl_ray.ops.profile import profile_table

    cols = ["doc_id", "lang", "source", "n_chars"]
    ds = _parquet(sf_dir, "documents", cols)
    return profile_table(ds, cols)


def q_row_number(sf_dir: str) -> pd.DataFrame:
    """Global stable row numbers over (n_chars, doc_id) — the
    distributed row_number() OVER (ORDER BY ...): one sort, then
    per-block offsets from a #blocks-row summary, looked up by first
    key.  Hash-exact window-function twin."""
    from unfurl_ray.ops.relational import global_row_number

    ds = _parquet(sf_dir, "documents", ["doc_id", "n_chars"])
    out = global_row_number(ds, ["n_chars", "doc_id"]).to_pandas()
    return out.sort_values("rn").reset_index(drop=True)


def q_sorted_neighborhood(sf_dir: str) -> pd.DataFrame:
    """Sorted-Neighborhood entity-resolution candidates: rank docs by
    the 24-char normalized key, compare each row to the next 5 in
    rank order, keep Levenshtein<=4 pairs.  Complements q-gram /
    deletion-neighborhood blocking; hash-exact DuckDB window twin."""
    import re as _re

    from unfurl_ray.ops.relational import sorted_neighborhood_join

    ws = _re.compile(r"[ \t\n\f\r]+")

    def keyed(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        keys = [
            ws.sub(" ", (t or "").lower()).strip()[:24] for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "s": pa.array(keys, pa.string()),
            }
        )

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return sorted_neighborhood_join(ds, keyed, window=5, max_dist=4)


def q_editdist_join(sf_dir: str) -> pd.DataFrame:
    """Exact Levenshtein<=1 self-join over a 24-char normalized text
    key, blocked by FastSS deletion neighborhoods — the exact
    edit-distance counterpart to q_setsim_join's Jaccard prefix
    filter.  Hash-exact DuckDB levenshtein() twin."""
    from unfurl_ray.ops.dedup import edit_distance_join

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    return edit_distance_join(ds, k=1, key_len=24)


def q_corr_matrix(sf_dir: str) -> pd.DataFrame:
    """Pairwise Pearson correlation of the four lineitem value
    columns in one projected pass: per-batch centered co-moment
    partials (p + p² floats per batch) folded driver-side with
    Chan's parallel update — no shuffle, no raw-moment cancellation
    at scale.  Hash-exact DuckDB corr() twin at 6dp half-up."""
    from unfurl_ray.ops.profile import corr_matrix

    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ds = _parquet_sh(sf_dir, "lineitem", cols)
    return corr_matrix(ds, cols)


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """Centrality over the embedding similarity graph: bucketed
    cosine pairs (no corpus broadcast) become symmetric edges, then
    PageRank runs on co-partitioned shard actors — the edge set
    shuffles once at setup; each power step moves only pre-aggregated
    per-bucket (dst, contribution) arrays between shards.  Rows-only
    check (iterative fixpoint has no SQL twin); pytest parity against
    dense numpy power iteration covers exactness.  Returns the top-50
    nodes by rank (rounded so fold order can't flip the hash)."""
    import pyarrow.compute as pc

    from unfurl_ray.ops.graph import pagerank
    from unfurl_ray.ops.similarity import cosine_pairs_bucketed

    ds = _parquet(sf_dir, "embeddings")
    # dedup=False: a pair found in several probed buckets repeats, but
    # pagerank's shards unique their own edges (bucket is a function of
    # src, so all copies land together) — one corpus-pair shuffle saved
    pairs = cosine_pairs_bucketed(
        ds, threshold=0.3, assign_top=3, dedup=False
    )

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").to_numpy(zero_copy_only=False)
        b = batch.column("vec_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([a, b]).astype(np.int64),
                    pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([b, a]).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    # n_buckets=8: the per-round contrib table is node-sized (tiny
    # here); fewer merge groups cut fixed per-iteration overhead
    rank_ds = pagerank(
        edges, damping=0.85, n_iter=8, n_buckets=8, dedup_edges=True
    )

    def local_top(batch: pd.DataFrame) -> pa.Table:
        b = batch.copy()
        b["rank"] = b["rank"].round(8)
        b = b.sort_values(
            ["rank", "node"], ascending=[False, True]
        ).head(50)
        return pa.Table.from_pandas(
            b, preserve_index=False
        ).replace_schema_metadata(None)

    # per-shard top-50 under the final order, tiny collect, finish
    ranks = rank_ds.map_batches(
        local_top, batch_format="pandas"
    ).to_pandas()
    out = ranks.sort_values(
        ["rank", "node"], ascending=[False, True]
    ).head(50)
    return out.sort_values("node").reset_index(drop=True)


def q_sliding_mau(sf_dir: str) -> pd.DataFrame:
    """EXACT 7-day rolling distinct active users per day (the WAU/MAU
    family): each unique (user, event-day) fans out to the <=7 window
    days it supports — inside the batch, after a local distinct — and
    the exact distinct count rides the (window_day, user) pair
    shuffle, bounded by 7x distinct pairs, never raw events.  Window
    bounds come from parquet footer statistics (metadata-only)."""
    from unfurl_ray.ops.relational import distinct_count_by

    W = 7
    lo_hi = _footer_ts_bounds(sf_dir, "events", "ts")
    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])
    if lo_hi is None:
        from ray.data.aggregate import Max, Min

        agg = ds.aggregate(Min("ts"), Max("ts"))
        lo_hi = (agg["min(ts)"], agg["max(ts)"])
    d_lo = pd.Timestamp(lo_hi[0]).value // 1000 // 86_400_000_000
    d_hi = pd.Timestamp(lo_hi[1]).value // 1000 // 86_400_000_000

    def fan_out(batch: pd.DataFrame) -> pa.Table:
        pairs = pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(),
                "d": batch["ts"].astype("int64").to_numpy()
                // 86_400_000_000,
            }
        ).drop_duplicates()
        u = np.repeat(pairs["user_id"].to_numpy(), W)
        wd = np.repeat(pairs["d"].to_numpy(), W) + np.tile(
            np.arange(W, dtype=np.int64), len(pairs)
        )
        keep = (wd >= d_lo) & (wd <= d_hi)
        dedup = pd.DataFrame(
            {"wd": wd[keep], "user_id": u[keep]}
        ).drop_duplicates()
        return pa.table(
            {
                "wd": pa.array(
                    dedup["wd"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "user_id": pa.array(
                    dedup["user_id"].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
            }
        )

    out = distinct_count_by(
        ds.map_batches(fan_out, batch_format="pandas"),
        "wd", "user_id", out_col="mau",
    ).to_pandas()
    out["mau"] = out["mau"].astype("int64")
    return out.sort_values("wd").reset_index(drop=True)


def q_triangles(sf_dir: str) -> pd.DataFrame:
    """Exact triangle count over the embedding similarity graph
    (cosine >= 0.3 edges): degree-oriented wedge enumeration — each
    node emits pairs of its HIGHER-rank neighbors, capping wedges at
    C(oriented-degree, 2) — then wedges and edges co-shuffle on the
    canonical pair hash and close with one vectorized isin per
    bucket.  The count is orientation-invariant, so the SQL twin's
    id-ordered 3-way self-join is hash-exact against it."""
    from unfurl_ray.ops.graph import triangle_count
    from unfurl_ray.ops.similarity import cosine_pair_dedup

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = cosine_pair_dedup(ds, threshold=0.3)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("vec_a").cast(pa.int64()),
                "b": batch.column("vec_b").cast(pa.int64()),
            }
        )

    # materialize once: count() and triangle_count() both consume the
    # edge set, and the O(n^2) pair stage must not run twice
    edges = pairs.map_batches(
        rename, batch_format="pyarrow"
    ).materialize()
    n_edges = edges.count()
    n_tri = triangle_count(edges)
    return pd.DataFrame(
        {
            "n_edges": np.array([n_edges], dtype=np.int64),
            "n_triangles": np.array([n_tri], dtype=np.int64),
        }
    )


def q_sliding_mau_hll(sf_dir: str) -> pd.DataFrame:
    """Approximate 7-day rolling distinct actives — the SCALE PATH
    for q_sliding_mau: the exact variant's shuffle carries one
    (window_day, user) row per distinct pair (7x distinct users per
    day), which at 10^9 users becomes the job; here each batch folds
    one 16 KiB HLL per day, the groupby moves only day-sketches, and
    the window union is a register-max over the tiny day table.
    Rows-only check (sketch estimate has no SQL twin); the pytest
    bound holds it within ~3 % of the exact pair-shuffle answer."""
    from unfurl_ray.ops.sketch import sliding_distinct_hll

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])
    out = sliding_distinct_hll(
        ds, ts_col="ts", id_col="user_id", window=7, p=14
    )
    out["estimate"] = out["estimate"].round(2)
    return out.sort_values("wd").reset_index(drop=True)


def q_time_travel(sf_dir: str) -> pd.DataFrame:
    """Snapshot versioning: v1 ingests the first half-month of
    events, v2 APPENDS the rest; both versions stay readable (reads
    pin a manifest, commits are tmp+rename) and aggregate
    independently.  Output: per-version count + exact cents sum."""
    import hashlib
    import os
    import tempfile

    from unfurl_ray.ops.layout import versioned_read, versioned_write

    CUT = 19723 + 15  # epoch-day 2024-01-16
    tag = _cache_tag(sf_dir, "vers", "events")
    root = os.path.join(tempfile.gettempdir(), f"unfurl_ray_v_{tag}")

    if not os.path.isdir(root):
        tmp = root + ".tmp"
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)  # crashed attempt

        def half(early: bool):
            def f(batch: pd.DataFrame) -> pd.DataFrame:
                day = batch["ts"].astype("int64") // 86_400_000_000
                m = day < CUT if early else day >= CUT
                return batch[m]
            return f

        ds = _parquet_sh(sf_dir, "events", ["event_id", "ts", "value"])
        versioned_write(
            ds.map_batches(half(True), batch_format="pandas"), tmp
        )
        versioned_write(
            ds.map_batches(half(False), batch_format="pandas"), tmp,
            mode="append",
        )
        os.rename(tmp, root)

    rows = []
    for v in (1, 2):
        d = versioned_read(root, version=v, columns=["value"])

        def cents(batch: pd.DataFrame) -> pa.Table:
            c = np.floor(
                batch["value"].to_numpy(dtype=np.float64) * 100.0
            ).astype(np.int64)
            return pa.table(
                {
                    "n": pa.array([len(c)], pa.int64()),
                    "s": pa.array([int(c.sum())], pa.int64()),
                }
            )

        agg = d.map_batches(cents, batch_format="pandas").to_pandas()
        rows.append((v, int(agg["n"].sum()), int(agg["s"].sum())))
    return pd.DataFrame(
        rows, columns=["version", "n", "sum_cents"]
    )


def q_winsorize(sf_dir: str) -> pd.DataFrame:
    """Winsorized robust mean per event type: exact p05/p95 in
    integer cents from the (type, cents) histogram (shuffle bounded
    by distinct cents, not rows), bounds broadcast back, values
    clipped and averaged in one aggregate pass.  Every comparison is
    integer-exact, so the DuckDB quantile_disc + least/greatest twin
    hash-matches."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_aggregate, hist_quantile_disc_by,
        pre_aggregate,
    )

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])

    def to_cents(batch: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "event_type": pa.array(
                    batch["event_type"].to_numpy(), pa.string()
                ),
                "cents": pa.array(
                    np.floor(
                        batch["value"].to_numpy(dtype=np.float64)
                        * 100.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pandas").materialize()
    hist = bucketed_aggregate(
        cents, ["event_type", "cents"], {"cnt": ("cents", "count")},
    )
    bounds = hist_quantile_disc_by(
        hist, "event_type", "cents", "cnt", [0.05, 0.95],
    ).to_pandas()
    ref = ray.put(
        bounds.set_index("event_type")[["q_005", "q_095"]]
    )

    def clip(batch: pd.DataFrame, ref=None) -> pa.Table:
        b = _broadcast_fetch(ref)
        lo = b["q_005"].reindex(batch["event_type"]).to_numpy()
        hi = b["q_095"].reindex(batch["event_type"]).to_numpy()
        c = np.clip(batch["cents"].to_numpy(), lo, hi)
        part = (
            pd.DataFrame(
                {"event_type": batch["event_type"].to_numpy(), "c": c}
            )
            .groupby("event_type", as_index=False, sort=False)
            .agg(n=("c", "size"), s=("c", "sum"))
        )
        return pa.Table.from_pandas(
            part, preserve_index=False
        ).replace_schema_metadata(None)

    agg = pre_aggregate(
        cents.map_batches(clip, batch_format="pandas",
                          fn_kwargs={"ref": ref}),
        ["event_type"], {"n": ("n", "sum"), "s": ("s", "sum")},
    ).to_pandas()
    out = bounds.drop(columns=["n"]).merge(agg, on="event_type")
    out["wins_mean"] = (
        out["s"].astype(np.float64) / out["n"] / 100.0
    ).round(4)
    out = out.rename(columns={"q_005": "p05_cents",
                              "q_095": "p95_cents"})
    out["n"] = out["n"].astype("int64")
    return (
        out[["event_type", "n", "p05_cents", "p95_cents", "wins_mean"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def q_jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """Egress -> ingest closure: documents export to hash-bucketed
    JSONL shards, stream back in through the dirty-tolerant JSONL
    source, and aggregate per source — proving the interchange format
    loses nothing.  (Corrupt-line quarantine is pytest-covered; this
    path is clean.)"""
    import os
    import shutil
    import tempfile

    from unfurl_ray.ops.layout import write_jsonl_shards
    from unfurl_ray.ops.relational import pre_aggregate
    from unfurl_ray.sources.formats import read_jsonl_tolerant

    ds = _parquet_sh(sf_dir, "documents", ["doc_id", "source", "n_chars"])
    out_dir = tempfile.mkdtemp(prefix="unfurl_rt_")
    try:
        write_jsonl_shards(ds, out_dir, id_col="doc_id", n_buckets=8)
        back = read_jsonl_tolerant(
            sorted(
                os.path.join(out_dir, f) for f in os.listdir(out_dir)
            ),
            columns=["doc_id", "source", "n_chars"],
            dtypes={"doc_id": "int64", "source": "object",
                    "n_chars": "int64"},
        )
        out = pre_aggregate(
            back, ["source"],
            {"n": ("doc_id", "count"), "chars": ("n_chars", "sum")},
        ).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    out["n"] = out["n"].astype("int64")
    out["chars"] = out["chars"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_cooccurrence(sf_dir: str) -> pd.DataFrame:
    """Item-item co-occurrence (the recommender / association-rule
    primitive): for every unordered pair of event types, how many
    users did both.  The classic failure here is exploding per-user
    baskets through the shuffle; instead each batch LOCALLY distincts
    (user, type), ONE user-sharded shuffle co-locates a user's few
    distinct types, and pairs fan out only after exact dedup inside
    the shard — bounded by |types|^2/2 per user, never raw events."""
    from unfurl_ray.ops.relational import bucketed_aggregate

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])
    N_SHARDS = 64

    def local_distinct(batch: pd.DataFrame) -> pa.Table:
        u = batch[["user_id", "event_type"]].drop_duplicates()
        shard = (
            pd.util.hash_array(u["user_id"].to_numpy())
            % np.uint64(N_SHARDS)
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(
                    u["user_id"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "event_type": pa.array(
                    u["event_type"].to_numpy(), pa.string()
                ),
                "_shard": pa.array(shard, pa.int64()),
            }
        )

    def fan_pairs(group: pd.DataFrame) -> pa.Table:
        g = group.drop_duplicates(["user_id", "event_type"]).sort_values(
            ["user_id", "event_type"]
        )
        keys = g["user_id"].to_numpy()
        types = g["event_type"].to_numpy()
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
            }
        )
        if len(g) == 0:
            return empty
        new = np.empty(len(g), dtype=np.bool_)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(g))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            t = types[s:e]
            if len(t) < 2:
                continue
            ia, ib = np.triu_indices(len(t), k=1)
            a_out.append(t[ia])
            b_out.append(t[ib])
        if not a_out:
            return empty
        return pa.table(
            {
                "type_a": pa.array(np.concatenate(a_out), pa.string()),
                "type_b": pa.array(np.concatenate(b_out), pa.string()),
            }
        )

    pairs = (
        ds.map_batches(local_distinct, batch_format="pandas")
        .groupby("_shard")
        .map_groups(fan_pairs, batch_format="pandas")
    )
    out = bucketed_aggregate(
        pairs, ["type_a", "type_b"], {"n_users": ("type_a", "count")},
        n_buckets=8,
    ).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


def q_validate(sf_dir: str) -> pd.DataFrame:
    """Expectations gate over orders: key uniqueness (histogram
    duplicate count), null / range / enum checks (vectorized batch
    kernels + tiny sum fold), and referential integrity of o_custkey
    against customer (key set broadcast once; Bloom+exact is the
    documented drop-in at larger key counts).  Only per-rule counts
    ever reach the driver."""
    import ray

    from unfurl_ray.ops.validate import validate_table

    cust = _parquet(sf_dir, "customer", ["c_custkey"]).to_pandas()
    ref = ray.put(cust["c_custkey"].to_numpy())

    ds = _parquet_sh(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
    )
    return validate_table(
        ds,
        [
            {"rule": "orderkey_unique", "kind": "unique",
             "col": "o_orderkey"},
            {"rule": "custkey_not_null", "kind": "not_null",
             "col": "o_custkey"},
            {"rule": "totalprice_range", "kind": "in_range",
             "col": "o_totalprice", "lo": 0.0, "hi": 1_000_000.0},
            {"rule": "status_enum", "kind": "in_set",
             "col": "o_orderstatus", "values": ["O", "F", "P"]},
            {"rule": "custkey_ref", "kind": "ref",
             "col": "o_custkey"},
        ],
        ref_keys=ref,
    )


def q_pseudonymize(sf_dir: str) -> pd.DataFrame:
    """Keyed pseudonymization of user ids before sharing event data:
    sha256(salt|id) prefixes — per-row map, no shuffle, referential
    structure preserved (same id -> same token) — then per-token
    event counts prove the join structure survived.  Top 200 tokens
    for a stable oracle row set."""
    from unfurl_ray.ops.privacy import pseudonymize
    from unfurl_ray.ops.relational import bucketed_aggregate

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_id"])
    tok = pseudonymize(ds, ["user_id"], salt="unfurl-demo-salt")
    out = bucketed_aggregate(
        tok, ["user_id"], {"n_events": ("event_id", "count")},
        n_buckets=16,
    ).to_pandas()
    out = out.rename(columns={"user_id": "token"})
    out["n_events"] = out["n_events"].astype("int64")
    out = out.sort_values(
        ["n_events", "token"], ascending=[False, True]
    ).head(200)
    return out.sort_values("token").reset_index(drop=True)


def q_stream_neardup(sf_dir: str) -> pd.DataFrame:
    """Cross-run streaming NEAR-dup admission: run 1 ingests the
    first half of the corpus; run 2 ingests the second half PLUS
    exact replays of run-1 texts under new ids — the replays (and any
    organic near-dups) must be dropped by the persistent band index.
    Rows-only check (LSH banding has no SQL twin); the one-word-edit
    semantics are pytest-covered."""
    from unfurl_ray.ops.stream_dedup import ShardedNearDupIndex

    docs = _parquet(sf_dir, "documents", ["doc_id", "text"])
    half = docs.count() // 2

    def split(lo: bool):
        def f(batch: pd.DataFrame) -> pa.Table:
            m = batch["doc_id"] < half
            # typed Arrow out: empty pandas object columns break
            # Ray's block size estimator
            return pa.Table.from_pandas(
                batch[m if lo else ~m], preserve_index=False
            ).replace_schema_metadata(None)
        return f

    idx = ShardedNearDupIndex(n_shards=4)
    n_run1 = (
        idx.filter_new(
            docs.map_batches(split(True), batch_format="pandas")
        ).count()
    )

    def replay(batch: pd.DataFrame) -> pa.Table:
        out = batch.copy()
        out["doc_id"] = out["doc_id"] + 1_000_000
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    run2 = docs.map_batches(split(False), batch_format="pandas").union(
        docs.map_batches(split(True), batch_format="pandas")
        .map_batches(replay, batch_format="pandas")
    )
    n_run2 = idx.filter_new(run2).count()
    return pd.DataFrame(
        {"run": [1, 2], "admitted": [n_run1, n_run2]}
    )


def q_chi_square(sf_dir: str) -> pd.DataFrame:
    """Chi-square independence test of event_type x iso-weekday: the
    contingency table is ONE pre-aggregated shuffle of (type, dow)
    partial counts; the statistic folds from the tiny table on the
    driver.  Deterministic rounding makes the twin hash-exact."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "dow": (batch["ts"].dt.dayofweek + 1).astype("int64"),
            }
        )

    cells = pre_aggregate(
        ds.map_batches(prep, batch_format="pandas"),
        ["event_type", "dow"], {"n": ("dow", "count")},
    ).to_pandas()
    # COMPLETE grid: a zero-observed cell still contributes its
    # expected count to the statistic
    grid = (
        cells.pivot(index="event_type", columns="dow", values="n")
        .fillna(0.0)
        .to_numpy(dtype=np.float64)
    )
    total = grid.sum()
    expected = np.outer(grid.sum(axis=1), grid.sum(axis=0)) / total
    chi2 = ((grid - expected) ** 2 / expected).sum()
    k, m = grid.shape
    return pd.DataFrame(
        {
            "chi2": [round(float(chi2), 6)],
            "dof": [int((k - 1) * (m - 1))],
            "n": [int(total)],
        }
    )


def q_daily_p95(sf_dir: str) -> pd.DataFrame:
    """Per-day exact p50/p95 of event value in integer cents — the
    windowed-quantile monitor a latency dashboard runs — composed
    from the (day, cents) histogram shuffle + the multi-quantile
    rank pick (inverse-CDF semantics, hash-exact vs quantile_disc)."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, hist_quantile_disc_by,
    )

    ds = _parquet_sh(sf_dir, "events", ["ts", "value"])

    def prep(batch: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "day": pa.array(
                    (
                        batch["ts"].astype("int64")
                        // 86_400_000_000
                    ).to_numpy(),
                    pa.int64(),
                ),
                "cents": pa.array(
                    np.floor(
                        batch["value"].to_numpy(dtype=np.float64)
                        * 100.0
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    hist = bucketed_aggregate(
        ds.map_batches(prep, batch_format="pandas"),
        ["day", "cents"], {"cnt": ("cents", "count")},
    )
    out = hist_quantile_disc_by(
        hist, "day", "cents", "cnt", [0.5, 0.95],
    ).to_pandas()
    out = out.rename(columns={"q_05": "p50_cents",
                              "q_095": "p95_cents"})
    out["n"] = out["n"].astype("int64")
    return (
        out[["day", "n", "p50_cents", "p95_cents"]]
        .sort_values("day")
        .reset_index(drop=True)
    )


def q_hll_overlap(sf_dir: str) -> pd.DataFrame:
    """Audience overlap between the two halves of the month from two
    streaming HLL passes: |first-half users|, |second-half users|,
    union (sketch register max) and intersection
    (inclusion-exclusion).  Rows-only check (sketch estimates);
    pytest bounds the error vs exact."""
    from unfurl_ray.ops.sketch import hll_set_ops

    CUT = 19723 + 15

    def half(early: bool):
        def f(batch: pd.DataFrame) -> pa.Table:
            day = batch["ts"].astype("int64") // 86_400_000_000
            m = (day < CUT) if early else (day >= CUT)
            return pa.table(
                {
                    "user_id": pa.array(
                        batch.loc[m, "user_id"].to_numpy(), pa.int64()
                    )
                }
            )
        return f

    a = _parquet_sh(sf_dir, "events", ["user_id", "ts"]).map_batches(
        half(True), batch_format="pandas"
    )
    b = _parquet_sh(sf_dir, "events", ["user_id", "ts"]).map_batches(
        half(False), batch_format="pandas"
    )
    est = hll_set_ops(a, b, "user_id")
    return pd.DataFrame(
        {
            "n_a": [round(est["n_a"], 1)],
            "n_b": [round(est["n_b"], 1)],
            "n_union": [round(est["n_union"], 1)],
            "n_intersect": [round(est["n_intersect"], 1)],
        }
    )


def q_quality_model(sf_dir: str) -> pd.DataFrame:
    """Train a fastText-style language/quality classifier on cheap
    document features: vectorized featurization -> distributed IRLS
    (each iteration ships one 4x4 Hessian partial per batch, never
    rows) -> one scoring pass for training accuracy.  Rows-only check
    (iterative solver); exact-update parity vs a single-process IRLS
    is pytest-covered.  Note: the synthetic corpus draws every
    language's text from the SAME vocabulary, so its lang labels are
    statistically independent of the features — train_acc ~ the 'en'
    base rate is the correct ceiling here, not a solver defect (the
    parity test shows the solver recovering real signal)."""
    from unfurl_ray.ops.fit import logreg_irls, logreg_score
    from unfurl_ray.ops.textstats import STOPWORDS, _WORD_SPLIT_RE

    ds = _parquet(sf_dir, "documents", ["doc_id", "text", "lang"])
    lang_sets = {k: frozenset(v) for k, v in STOPWORDS.items()}

    def featurize(batch: pd.DataFrame) -> pd.DataFrame:
        words = (
            batch["text"].fillna("").map(_WORD_SPLIT_RE.findall)
        )
        nw = np.maximum(
            words.map(len).to_numpy(dtype=np.float64), 1.0
        )
        f = pd.DataFrame({"const": np.ones(len(batch))})
        for lg, sw in lang_sets.items():
            f[f"stop_{lg}"] = (
                words.map(
                    lambda ws, sw=sw: sum(
                        1 for w in ws if w.lower() in sw
                    )
                ).to_numpy(dtype=np.float64)
                / nw
            )
        f["y"] = (batch["lang"].to_numpy() == "en").astype(np.int64)
        return f

    feats = ds.map_batches(featurize, batch_format="pandas")
    x_cols = ["const"] + [f"stop_{lg}" for lg in lang_sets]
    fit = logreg_irls(feats, x_cols, "y", iters=8)

    scored = logreg_score(
        feats.materialize(), x_cols, fit["beta"]
    ).to_pandas()
    acc = float(
        ((scored["p"] > 0.5).astype(int) == scored["y"]).mean()
    )
    out = {
        f"beta_{c}": [round(float(b), 6)]
        for c, b in zip(x_cols, fit["beta"])
    }
    out["n"] = [fit["n"]]
    out["train_acc"] = [round(acc, 4)]
    return pd.DataFrame(out)


def q_als_factors(sf_dir: str) -> pd.DataFrame:
    """Taste vectors: rank-2 ALS factorization of the user x
    event-type log-count matrix — one distributed pass per iteration
    (user shards solve locally and emit per-item sufficient stats;
    driver state is items x 2 floats).  Rows-only check (iterative);
    exact-update parity vs the single-process solver is
    pytest-covered."""
    from unfurl_ray.ops.fit import als_implicit
    from unfurl_ray.ops.relational import bucketed_aggregate

    types = ["click", "error", "purchase", "signup", "view"]
    t_idx = {t: i for i, t in enumerate(types)}

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])
    counts = bucketed_aggregate(
        ds, ["user_id", "event_type"],
        {"n": ("event_type", "count")}, n_buckets=16,
    )

    def to_rating(batch: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "user_id": pa.array(
                    batch["user_id"].to_numpy(dtype=np.int64),
                    pa.int64(),
                ),
                "item": pa.array(
                    batch["event_type"].map(t_idx).to_numpy(
                        dtype=np.int64
                    ),
                    pa.int64(),
                ),
                "r": pa.array(
                    np.log1p(batch["n"].to_numpy(dtype=np.float64)),
                    pa.float64(),
                ),
            }
        )

    fit = als_implicit(
        counts.map_batches(to_rating, batch_format="pandas"),
        "user_id", "item", "r", n_items=len(types), k=2, iters=5,
        n_shards=16,
    )
    out = pd.DataFrame(
        {
            "event_type": types,
            "f0": np.round(fit["V"][:, 0], 6),
            "f1": np.round(fit["V"][:, 1], 6),
        }
    )
    out["rmse"] = round(fit["rmse"], 6)
    return out.sort_values("event_type").reset_index(drop=True)


def q_image_phash(sf_dir: str) -> pd.DataFrame:
    """Image near-dup detection end-to-end: binary payloads (doc text
    bytes + exact replays of every 50th doc under new ids) -> pHash
    actor stage -> banded Hamming pair generation.  The replayed
    payloads MUST pair with their originals at distance 0 (all 10 do);
    the remaining distance-0 pairs are same-template documents whose
    chunk features genuinely collapse (the synthetic corpus draws
    from a tiny vocabulary) — deterministic either way.  Rows-only
    check
    (crc-based hashing has no SQL twin); band/Hamming math is
    pytest-covered with an injected backend."""
    from unfurl_ray.ops.multimodal import ImagePHash, phash_hamming_pairs

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def payloads(batch: pd.DataFrame) -> pa.Table:
        ids = batch["doc_id"].to_numpy(dtype=np.int64)
        blobs = [t.encode() for t in batch["text"].fillna("")]
        rep = batch["doc_id"] % 50 == 0
        rep_ids = ids[rep] + 1_000_000
        rep_blobs = [b for b, r in zip(blobs, rep) if r]
        return pa.table(
            {
                "doc_id": pa.array(
                    np.concatenate([ids, rep_ids]), pa.int64()
                ),
                "content": pa.array(blobs + rep_blobs, pa.binary()),
            }
        )

    hashed = ds.map_batches(payloads, batch_format="pandas").map_batches(
        ImagePHash, batch_format="pyarrow", batch_size=128,
        concurrency=(1, 4), num_cpus=1,
    )
    out = phash_hamming_pairs(hashed, max_dist=0).to_pandas()
    out = out.astype({"id_a": "int64", "id_b": "int64",
                      "dist": "int64"})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def q_scd2(sf_dir: str) -> pd.DataFrame:
    """SCD type-2 history of the q_upsert_merge change stream: every
    upsert carries its validity interval [valid_from, valid_to) where
    valid_to is the key's NEXT change version (NULL = current) —
    the audit twin of the latest-wins snapshot, built with one
    key-bucketed shuffle and a vectorized lead() inside each bucket.
    Returns (doc_id, n_chars, valid_from, valid_to)."""
    from unfurl_ray.ops.cdc import scd2_history

    base = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def make_changes(batch: pd.DataFrame) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        t = batch["text"].fillna("")
        frames = []
        upd = d % 10 == 0
        if upd.any():
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": d[upd],
                        "text": "UPDATED " + t[upd],
                        "op": "upsert",
                        "ver": np.int64(1),
                    }
                )
            )
        dele = d % 17 == 0
        if dele.any():
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": d[dele],
                        "text": "",
                        "op": "delete",
                        "ver": np.int64(2),
                    }
                )
            )
        ins = d % 23 == 0
        if ins.any():
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": d[ins] + 10_000_000,
                        "text": "INSERTED " + t[ins],
                        "op": "upsert",
                        "ver": np.int64(3),
                    }
                )
            )
        if not frames:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string()),
                    "op": pa.array([], pa.string()),
                    "ver": pa.array([], pa.int64()),
                }
            )
        out = pd.concat(frames, ignore_index=True)
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    changes = base.map_batches(make_changes, batch_format="pandas")
    hist = scd2_history(
        changes, "doc_id", ["text"],
    ).to_pandas()
    hist["n_chars"] = hist["text"].str.len().astype("int64")
    out = hist[["doc_id", "n_chars", "valid_from", "valid_to"]]
    return out.sort_values(
        ["doc_id", "valid_from"]
    ).reset_index(drop=True)


def q_event_runs(sf_dir: str) -> pd.DataFrame:
    """Repeated-action collapse: maximal runs of >= 2 consecutive
    identical event_types per user (the bot-burst / stuck-agent /
    tool-loop detector).  ``ops.relational.collapse_runs`` — ONE
    range-partitioning sort, per-block vectorized RLE, O(#blocks)
    driver stitch of block-edge runs.  Hash-exact vs the DuckDB
    gaps-and-islands twin (row_number difference)."""
    from unfurl_ray.ops.relational import collapse_runs

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type", "ts",
                                        "event_id"])
    runs = collapse_runs(
        ds, "user_id", "event_type", ["ts", "event_id"]
    )
    out = runs.filter(expr="run_len >= 2").to_pandas()
    out["user_id"] = out["user_id"].astype("int64")
    out["run_len"] = out["run_len"].astype("int64")
    return out.sort_values(
        ["user_id", "start_ts", "event_type"]
    ).reset_index(drop=True)


def q_auc(sf_dir: str) -> pd.DataFrame:
    """Exact ROC AUC of `value` as a score for purchase events — the
    classifier-evaluation metric a quality-filter pipeline reports,
    computed distributed in the Mann-Whitney midrank form
    (ops.fit.roc_auc: histogram shuffle carries one row per DISTINCT
    score; driver holds O(#blocks)).  Hash-exact vs a DuckDB window
    twin of the same identity."""
    from unfurl_ray.ops.fit import roc_auc

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "score": batch["value"].astype("float64"),
                "y": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    r = roc_auc(
        ds.map_batches(tag, batch_format="pandas"), "score", "y"
    )
    return pd.DataFrame(
        {
            "auc": [round(r["auc"], 6)],
            "n_pos": [np.int64(r["n_pos"])],
            "n_neg": [np.int64(r["n_neg"])],
        }
    )


def q_mutual_info(sf_dir: str) -> pd.DataFrame:
    """Mutual information between event type and day-of-week (is
    behavior time-dependent?), with both marginal entropies —
    ops.profile.mutual_information over the pre-aggregated joint
    histogram.  DuckDB twin computes the same identities with window
    sums; day-of-week matches DuckDB's dayofweek (Sunday = 0)."""
    from unfurl_ray.ops.profile import mutual_information

    ds = _parquet_sh(sf_dir, "events", ["event_type", "ts"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                # pandas dayofweek: Monday = 0; DuckDB: Sunday = 0
                "dow": ((batch["ts"].dt.dayofweek + 1) % 7).astype(
                    "int64"
                ),
            }
        )

    return mutual_information(
        ds.map_batches(tag, batch_format="pandas"), "event_type", "dow"
    )


def q_prefix_dedup(sf_dir: str) -> pd.DataFrame:
    """Prefix-containment dedup over documents (truncated re-crawls /
    boilerplate-extended copies): dropped docs + reason.  Hash-exact
    vs a blocked self-join DuckDB twin — the Ray side never forms
    pairs (adjacent-successor check inside the block group)."""
    from unfurl_ray.ops.dedup import prefix_containment_dedup

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = prefix_containment_dedup(ds).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_tree_split(sf_dir: str) -> pd.DataFrame:
    """GBDT-style best regression split for l_extendedprice across
    (l_quantity, l_discount, l_tax) — ops.fit.best_split: the shuffle
    carries per-batch (feature, distinct value, n, sum_y) partials,
    never rows; the driver scans the tiny histogram.  Hash-exact vs a
    DuckDB window twin of the same cumulative-gain identity
    (mean_gain = gain / n keeps the compare inside float tolerance;
    argmax order is unchanged since n is feature-independent)."""
    from unfurl_ray.ops.fit import best_split

    ds = _parquet_sh(
        sf_dir, "lineitem",
        ["l_quantity", "l_discount", "l_tax", "l_extendedprice"],
    )
    return best_split(
        ds, ["l_discount", "l_quantity", "l_tax"], "l_extendedprice"
    )


def q_kcore(sf_dir: str) -> pd.DataFrame:
    """3-core of the embedding similarity graph (cosine >= 0.3):
    iterative peeling on co-partitioned shard actors — each round is
    one pre-aggregated decrement exchange, rounds = peeling depth.
    Rows-only check (iterative fixpoint has no SQL twin in DuckDB
    1.0); pytest parity against driver-side exact peeling covers
    exactness.  Output: surviving (node, residual core degree)."""
    from unfurl_ray.ops.graph import kcore
    from unfurl_ray.ops.similarity import cosine_pair_dedup

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = cosine_pair_dedup(ds, threshold=0.3)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").to_numpy(zero_copy_only=False)
        b = batch.column("vec_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(
                    np.concatenate([a, b]).astype(np.int64), pa.int64()
                ),
                "v": pa.array(
                    np.concatenate([b, a]).astype(np.int64), pa.int64()
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    out = kcore(edges, k=3, num_partitions=8).to_pandas()
    if len(out) == 0:  # Ray's to_pandas drops the schema when empty
        out = pd.DataFrame(
            {
                "node": pd.Series([], dtype="int64"),
                "degree": pd.Series([], dtype="int64"),
            }
        )
    out["node"] = out["node"].astype("int64")
    out["degree"] = out["degree"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def q_group_mode(sf_dir: str) -> pd.DataFrame:
    """Mode (most frequent event_type) per user with deterministic
    ties (min type) — composition of pre_aggregate (the only shuffle,
    one row per (user, type) per batch) and topk_per_group's partial
    top-k.  Hash-exact vs a row_number window twin."""
    from unfurl_ray.ops.relational import pre_aggregate, topk_per_group

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])
    counts = pre_aggregate(
        ds, ["user_id", "event_type"], {"n": ("event_type", "count")}
    )
    out = topk_per_group(
        counts, "user_id", "n", 1, tiebreak_col="event_type"
    )
    out = out.rename(columns={"event_type": "mode_type"})
    out["user_id"] = out["user_id"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_welch_ttest(sf_dir: str) -> pd.DataFrame:
    """Welch two-sample t-test: purchase vs click event values — the
    A/B significance primitive, from one pre-aggregated
    (group, n, sum, sumsq) shuffle (three numbers per group per
    batch, never rows).  Variance uses the explicit sum-of-squares
    form so the DuckDB twin performs the identical float ops;
    t and the Welch-Satterthwaite df round to 6dp."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["event_type"].isin(["purchase", "click"])
        v = batch.loc[m, "value"].astype("float64")
        return pd.DataFrame(
            {
                "grp": batch.loc[m, "event_type"],
                "v": v,
                "v2": v * v,
            }
        )

    agg = pre_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["grp"],
        {"n": ("v", "count"), "s": ("v", "sum"), "ss": ("v2", "sum")},
    ).to_pandas().set_index("grp")
    out = {}
    for g in ("purchase", "click"):
        n = float(agg.loc[g, "n"])
        s = float(agg.loc[g, "s"])
        ss = float(agg.loc[g, "ss"])
        mean = s / n
        var = (ss - s * s / n) / (n - 1.0)
        out[g] = (n, mean, var)
    (n1, m1, v1), (n2, m2, v2) = out["purchase"], out["click"]
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / np.sqrt(se2)
    df = se2 * se2 / (
        (v1 / n1) ** 2 / (n1 - 1.0) + (v2 / n2) ** 2 / (n2 - 1.0)
    )
    return pd.DataFrame(
        {
            "mean_purchase": [round(m1, 6)],
            "mean_click": [round(m2, 6)],
            "t_stat": [round(float(t), 6)],
            "df": [round(float(df), 6)],
            "n_purchase": [np.int64(n1)],
            "n_click": [np.int64(n2)],
        }
    )


def q_weighted_median(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted median unit price — the weighted selection
    primitive (token-budget medians at corpus scale).
    ops.relational.weighted_quantile: histogram shuffle + owner-block
    selection, driver holds O(#blocks).  Hash-exact vs a cumulative-
    weight window twin (all weights integral, so the comparisons are
    float-exact on both sides)."""
    from unfurl_ray.ops.relational import weighted_quantile

    ds = _parquet_sh(
        sf_dir, "lineitem", ["l_extendedprice", "l_quantity"]
    )
    r = weighted_quantile(ds, "l_extendedprice", "l_quantity", q=0.5)
    return pd.DataFrame(
        {
            "wmedian": [round(r["value"], 2)],
            "cum_weight": [np.int64(r["cum_weight"])],
            "total_weight": [np.int64(r["total_weight"])],
        }
    )


def q_calibration(sf_dir: str) -> pd.DataFrame:
    """Decile calibration curve: bucket events by score (value) into
    exact NTILE(10) bins, report per-bin mean score vs observed
    purchase rate — the reliability diagram behind every quality/
    reward-model audit.  Composition: ntile_by's histogram-offset
    rank (no bin ever centralizes) + one pre-aggregated per-bin fold.
    Hash-exact vs an NTILE window twin."""
    from unfurl_ray.ops.relational import ntile_by, pre_aggregate

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "event_type", "value"]
    )

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "c": np.int64(0),
                "score": batch["value"].astype("float64"),
                "y": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    binned = ntile_by(
        ds.map_batches(tag, batch_format="pandas"),
        part_col="c", order_col="score", id_col="event_id", k=10,
    )
    agg = pre_aggregate(
        binned, ["bucket"],
        {"n": ("y", "count"), "sy": ("y", "sum"),
         "ss": ("score", "sum")},
    ).to_pandas()
    agg["mean_score"] = (agg["ss"] / agg["n"]).round(6)
    agg["purchase_rate"] = (agg["sy"] / agg["n"]).round(6)
    agg["bucket"] = agg["bucket"].astype("int64")
    agg["n"] = agg["n"].astype("int64")
    out = agg[["bucket", "n", "mean_score", "purchase_rate"]]
    return out.sort_values("bucket").reset_index(drop=True)


def q_changepoint(sf_dir: str) -> pd.DataFrame:
    """Single-changepoint detection on the daily event-value series:
    the day boundary that best splits the series into two
    constant-mean segments is exactly ops.fit.best_split on the day
    axis (binary segmentation's first step).  Shuffle carries
    (day, n, sum) partials only.  Hash-exact vs the same
    cumulative-gain DuckDB window twin restricted to one feature."""
    from unfurl_ray.ops.fit import best_split

    ds = _parquet_sh(sf_dir, "events", ["ts", "value"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        epoch_day = (
            batch["ts"].astype("int64") // 86_400_000_000
        ).astype("float64")
        return pd.DataFrame(
            {"day": epoch_day, "value": batch["value"].astype(
                "float64")}
        )

    out = best_split(
        ds.map_batches(tag, batch_format="pandas"), ["day"], "value",
        gain_digits=6,
    )
    out = out.rename(
        columns={"threshold": "break_day", "feature": "series"}
    )
    out["series"] = "daily_value"
    out["break_day"] = out["break_day"].astype("int64")
    return out


def q_ks_drift(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov distance between the value
    distributions of 'click' and 'purchase' events — the exact
    distribution-drift gate.  ops.profile.ks_test: one DISTINCT-value
    histogram shuffle + head-offset cumulative fold (the roc_auc
    layout).  Hash-exact vs a window-cumulative DuckDB twin: the
    ECDFs are ratios of exact integers, so both sides bit-agree."""
    from unfurl_ray.ops.profile import ks_test

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])
    r = ks_test(ds, "value", "event_type", "click", "purchase")
    return pd.DataFrame(
        {
            "ks_d": [r["ks_d"]],
            "at_value": [r["at_value"]],
            "n_a": [np.int64(r["n_a"])],
            "n_b": [np.int64(r["n_b"])],
        }
    )


def q_spearman(sf_dir: str) -> pd.DataFrame:
    """Spearman rank correlation between quantity and extended price
    on lineitem (heavy ties on quantity exercise the midranks).
    ops.profile.spearman_corr: two distinct-value midrank maps
    broadcast once, one (n, sums) moment row per batch.  Midranks are
    half-integers -> all sums float-exact at sf0.01, so the explicit
    sum-of-squares DuckDB twin hash-matches."""
    from unfurl_ray.ops.profile import spearman_corr

    ds = _parquet_sh(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice"]
    )
    r = spearman_corr(ds, "l_quantity", "l_extendedprice")
    return pd.DataFrame(
        {"spearman_rho": [r["rho"]], "n": [np.int64(r["n"])]}
    )


def q_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of order spend — the concentration audit run
    over source token mass at corpus scale.  ops.profile.gini: rank
    identity over the sorted distinct-value histogram with closed-form
    tie runs; O(#blocks) driver state.  Hash-exact vs a cumulative-
    count window twin."""
    from unfurl_ray.ops.profile import gini

    ds = _parquet_sh(sf_dir, "orders", ["o_totalprice"])
    r = gini(ds, "o_totalprice")
    return pd.DataFrame(
        {
            "gini": [r["gini"]],
            "n": [np.int64(r["n"])],
            "total": [round(r["total"], 2)],
        }
    )


def q_isotonic(sf_dir: str) -> pd.DataFrame:
    """Isotonic (monotone) calibration of purchase propensity vs
    event value: least-squares monotone step fit by parallel PAV with
    mergeable run stacks (ops.fit.isotonic_fit).  Rows-only — PAV's
    fixpoint has no DuckDB 1.0 twin; exactness is pinned by the
    element-wise parity pytest against a sequential reference."""
    from unfurl_ray.ops.fit import isotonic_fit

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "score": batch["value"].astype("float64"),
                "y": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    out = isotonic_fit(
        ds.map_batches(tag, batch_format="pandas"), "score", "y"
    )
    out["x_start"] = out["x_start"].round(6)
    out["x_end"] = out["x_end"].round(6)
    return out


def q_cm_counts(sf_dir: str) -> pd.DataFrame:
    """Count-Min point estimates of per-user event counts for the ten
    smallest user_ids — the fixed-memory frequency sketch for key
    spaces too wide to heavy-hitter exactly.  ops.sketch
    count_min_sketch: per-batch vectorized fold, tree merge, driver
    sums <=8 sketches.  Rows-only: the estimates are sketch outputs;
    the one-sided error contract (est >= true,
    est - true <= 2 * N / width whp) is pinned by pytest."""
    import numpy as np

    from unfurl_ray.ops.sketch import cm_query, count_min_sketch

    ds = _parquet_sh(sf_dir, "events", ["user_id"])
    cm, n = count_min_sketch(ds, "user_id", width=4096, depth=4)
    users = np.arange(1, 11, dtype=np.int64)
    est = cm_query(cm, users)
    return pd.DataFrame(
        {
            "user_id": users,
            "est_events": est.astype(np.int64),
            "n_total": np.int64(n),
        }
    )


def q_dup_cap(sf_dir: str) -> pd.DataFrame:
    """Frequency-capped dedup: keep at most 2 copies (lowest doc_ids)
    of each exact-duplicate text — the memorization-pressure cap that
    full dedup overshoots.  ops.dedup.frequency_cap: payload dropped
    pre-shuffle, per-batch k-prune, hash-bucket cap.  Hash-exact vs a
    row_number() twin."""
    from unfurl_ray.ops.dedup import frequency_cap

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = frequency_cap(ds, k=2).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return (
        out[["doc_id", "content_hash"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_ecdf_norm(sf_dir: str) -> pd.DataFrame:
    """Normalize purchase-event values against the ECDF of view-event
    values — cross-source score alignment.  ops.profile.ecdf_normalize:
    the reference collapses to its cumulative distinct-value
    histogram, broadcast once; outputs are exact integer ratios, so
    the ASOF-join DuckDB twin hashes equal."""
    from unfurl_ray.ops.profile import ecdf_normalize

    ev = _parquet_sh(
        sf_dir, "events", ["event_id", "event_type", "value"]
    )
    purchases = ev.filter(
        expr="event_type == 'purchase'"
    ).select_columns(["event_id", "value"])
    views = ev.filter(expr="event_type == 'view'")
    out = ecdf_normalize(
        purchases, "value", views, "value"
    ).to_pandas()
    out["event_id"] = out["event_id"].astype("int64")
    return (
        out[["event_id", "ref_pct"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def q_group_wmedian(sf_dir: str) -> pd.DataFrame:
    """Quantity-weighted median unit price per return flag — the
    per-group weighted selection primitive.
    ops.relational.grouped_weighted_quantile: (key, value, weight)
    histogram shuffle, one vectorized selection per key.  Hash-exact
    vs a per-group cumulative-weight window twin (integral weights
    keep comparisons float-exact)."""
    from unfurl_ray.ops.relational import grouped_weighted_quantile

    ds = _parquet_sh(
        sf_dir, "lineitem",
        ["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    out = grouped_weighted_quantile(
        ds, "l_returnflag", "l_extendedprice", "l_quantity", q=0.5
    ).to_pandas()
    out["wq_value"] = out["wq_value"].round(2)
    out["total_weight"] = out["total_weight"].astype("int64")
    return (
        out.rename(columns={"wq_value": "wmedian"})
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def q_fdr(sf_dir: str) -> pd.DataFrame:
    """Benjamini-Hochberg FDR adjustment over a battery of per-event
    p-values (here a deterministic pseudo-p: the fractional part of
    value — the correction is input-agnostic; real batteries feed
    Welch/chi-square outputs).  ops.profile.bh_adjust: one sort +
    three whole-block passes, O(#blocks) driver suffix-min.
    Hash-exact vs a suffix-window-min DuckDB twin."""
    from unfurl_ray.ops.profile import bh_adjust

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "event_type", "value"]
    )

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["event_type"] == "error"
        v = batch.loc[keep, "value"].astype("float64")
        return pd.DataFrame(
            {
                "event_id": batch.loc[keep, "event_id"].astype(
                    "int64"
                ),
                "p": v - np.floor(v),
            }
        )

    out = bh_adjust(
        ds.map_batches(tag, batch_format="pandas"), "p", "event_id"
    ).to_pandas()
    out["p_value"] = out["p_value"].round(6)
    out["p_adj"] = out["p_adj"].round(6)
    return out.sort_values("rank").reset_index(drop=True)


def q_pareto(sf_dir: str) -> pd.DataFrame:
    """2-D Pareto frontier of lineitem over (quantity, extended
    price): the rows no other row beats on both axes (strict-x
    dominance; ties on x are not mutually dominating) — the
    quality-vs-coverage selection curve.
    ops.relational.pareto_frontier_2d: per-distinct-x max-y histogram
    shuffle, driver prefix-max over distinct x, one vectorized probe
    per batch.  Hash-exact vs an exclusive-prefix window twin."""
    from unfurl_ray.ops.relational import pareto_frontier_2d

    ds = _parquet_sh(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity",
         "l_extendedprice"],
    )
    out = pareto_frontier_2d(
        ds, "l_quantity", "l_extendedprice"
    ).to_pandas()
    out["l_orderkey"] = out["l_orderkey"].astype("int64")
    out["l_linenumber"] = out["l_linenumber"].astype("int64")
    out["l_quantity"] = out["l_quantity"].round(2)
    out["l_extendedprice"] = out["l_extendedprice"].round(2)
    return out.sort_values(
        ["l_orderkey", "l_linenumber"]
    ).reset_index(drop=True)


def q_group_auc(sf_dir: str) -> pd.DataFrame:
    """Per-segment ROC AUC: does event value separate purchases from
    the rest within each day-of-week cohort?  The per-segment model-
    quality audit.  ops.fit.group_roc_auc: (key, score, pos/neg)
    histogram shuffle + one vectorized midrank fold per key.
    Hash-exact vs a per-group window twin (half-integer sums are
    float-exact on both sides)."""
    from unfurl_ray.ops.fit import group_roc_auc

    ds = _parquet_sh(
        sf_dir, "events", ["ts", "event_type", "value"]
    )

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        dow = (
            batch["ts"].astype("int64") // 86_400_000_000 % 7
        ).astype("int64")
        return pd.DataFrame(
            {
                "dow": dow,
                "score": batch["value"].astype("float64"),
                "y": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    out = group_roc_auc(
        ds.map_batches(tag, batch_format="pandas"),
        "dow", "score", "y",
    ).to_pandas()
    out = out.rename(columns={"k": "dow"})
    out["dow"] = out["dow"].astype("int64")
    return out.sort_values("dow").reset_index(drop=True)


def q_join_size_est(sf_dir: str) -> pd.DataFrame:
    """Shuffle-free equi-join cardinality estimate (orders x lineitem
    on orderkey) from two Count-Min sketches — the probe a planner
    runs before choosing broadcast vs shuffle join.  Rows-only: the
    estimate is a sketch output; the one-sided contract
    (est >= exact, within eps * Na * Nb / width) is pinned by pytest
    against the exact join count."""
    import numpy as np

    from unfurl_ray.ops.sketch import cm_join_size, count_min_sketch

    o = _parquet_sh(sf_dir, "orders", ["o_orderkey"])
    li = _parquet_sh(sf_dir, "lineitem", ["l_orderkey"])
    cm_o, n_o = count_min_sketch(o, "o_orderkey", width=65536)
    cm_l, n_l = count_min_sketch(li, "l_orderkey", width=65536)
    return pd.DataFrame(
        {
            "est_join_rows": [np.int64(cm_join_size(cm_o, cm_l))],
            "n_orders": [np.int64(n_o)],
            "n_lineitem": [np.int64(n_l)],
        }
    )


def q_cond_entropy(sf_dir: str) -> pd.DataFrame:
    """Conditional entropy H(dow | event_type) and the uncertainty
    coefficient U — how much of the day-of-week is explained by the
    event type, on one normalized scale.
    ops.profile.conditional_entropy over the same joint histogram as
    q_mutual_info.  Hash-exact vs the window-sum identity twin."""
    from unfurl_ray.ops.profile import conditional_entropy

    ds = _parquet_sh(sf_dir, "events", ["event_type", "ts"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "dow": ((batch["ts"].dt.dayofweek + 1) % 7).astype(
                    "int64"
                ),
            }
        )

    return conditional_entropy(
        ds.map_batches(tag, batch_format="pandas"),
        "event_type", "dow",
    )


def q_group_gini(sf_dir: str) -> pd.DataFrame:
    """Per-priority Gini of order spend — the per-source
    concentration audit.  ops.profile.grouped_gini: (key, value,
    count) histogram shuffle + one closed-form fold per key.
    Hash-exact vs a per-group cumulative-count window twin."""
    from unfurl_ray.ops.profile import grouped_gini

    ds = _parquet_sh(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    )
    out = grouped_gini(
        ds, "o_orderpriority", "o_totalprice"
    ).to_pandas()
    out = out.rename(columns={"k": "o_orderpriority"})
    out["total"] = out["total"].round(2)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_group_isotonic(sf_dir: str) -> pd.DataFrame:
    """Per-day-of-week isotonic calibration of purchase propensity vs
    event value — grouped monotone calibration curves.
    ops.fit.grouped_isotonic_fit: (key, x, n, sum_y) histogram
    shuffle, one stack-PAV per key.  Rows-only (PAV fixpoint); the
    per-group parity pytest pins exactness."""
    from unfurl_ray.ops.fit import grouped_isotonic_fit

    ds = _parquet_sh(
        sf_dir, "events", ["ts", "event_type", "value"]
    )

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dow": (
                    batch["ts"].astype("int64") // 86_400_000_000 % 7
                ).astype("int64"),
                "score": batch["value"].astype("float64"),
                "y": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    out = grouped_isotonic_fit(
        ds.map_batches(tag, batch_format="pandas"),
        "dow", "score", "y",
    ).to_pandas()
    out = out.rename(columns={"k": "dow"})
    out["dow"] = out["dow"].astype("int64")
    out["x_start"] = out["x_start"].round(6)
    out["x_end"] = out["x_end"].round(6)
    return out.sort_values(["dow", "x_start"]).reset_index(drop=True)


def q_twap(sf_dir: str) -> pd.DataFrame:
    """Per-user time-weighted average event value (TWAP): each value
    weighted by the interval until the user's next event.
    ops.relational.time_weighted_avg — one groupby(user).map_groups
    pass over the (ts, event_id)-sorted stream; int64-exact interval
    sums.  Hash-exact vs a lead()-window DuckDB twin."""
    from unfurl_ray.ops.relational import time_weighted_avg

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    )
    out = time_weighted_avg(
        ds, key_col="user_id", ts_col="ts", value_col="value",
        id_col="event_id",
    ).to_pandas()
    out["twap"] = out["twap"].round(6)
    return out.sort_values("user_id").reset_index(drop=True)


def _embedding_edges(sf_dir: str, threshold: float = 0.3):
    """Canonical (a, b) cosine-similarity edges over embeddings —
    the shared edge set of the graph-op queries (q_triangles'
    construction, factored)."""
    from unfurl_ray.ops.similarity import cosine_pair_dedup

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = cosine_pair_dedup(ds, threshold=threshold)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("vec_a").cast(pa.int64()),
                "b": batch.column("vec_b").cast(pa.int64()),
            }
        )

    return pairs.map_batches(rename, batch_format="pyarrow")


def q_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the embedding similarity graph
    (cosine >= 0.3): do well-connected vectors cluster with each
    other?  ops.graph.degree_assortativity — degrees attach via two
    bucketed hash joins (no broadcast node table); integer sufficient
    stats make the coefficient hash-exact vs the explicit-sums SQL
    twin."""
    from unfurl_ray.ops.graph import degree_assortativity

    out = degree_assortativity(_embedding_edges(sf_dir))
    out["assortativity"] = out["assortativity"].round(6)
    return out


def q_common_neighbors(sf_dir: str) -> pd.DataFrame:
    """Top-20 link predictions on the embedding similarity graph:
    non-adjacent pairs ranked by neighborhood Jaccard.
    ops.graph.common_neighbor_scores — per-center wedge emission,
    bucketed pair-count fold, composite-key anti-join against the
    edge set, two degree joins, per-block top-k.  Hash-exact vs a
    wedge self-join twin."""
    from unfurl_ray.ops.graph import common_neighbor_scores

    out = common_neighbor_scores(_embedding_edges(sf_dir), top_k=20)
    out["jaccard"] = out["jaccard"].round(6)
    return out.reset_index(drop=True)


def q_naive_bayes(sf_dir: str) -> pd.DataFrame:
    """Categorical naive Bayes model over orders (class = status,
    features = priority + order day-of-week): the classifier-as-
    aggregation primitive.  ops.fit.naive_bayes_fit — one melt + one
    bucketed count shuffle; Laplace-smoothed over the full value x
    class grid.  Hash-exact vs a count-based SQL twin."""
    from unfurl_ray.ops.fit import naive_bayes_fit

    ds = _parquet_sh(
        sf_dir, "orders",
        ["o_orderstatus", "o_orderpriority", "o_orderdate"],
    )

    def feat(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cls": batch["o_orderstatus"],
                "priority": batch["o_orderpriority"],
                "dow": (
                    batch["o_orderdate"].astype("int64")
                    // 86_400_000_000 % 7
                ).astype(str),
            }
        )

    out = naive_bayes_fit(
        ds.map_batches(feat, batch_format="pandas"),
        "cls", ["priority", "dow"],
    )
    out = out.rename(columns={"class": "cls"})
    out["logp"] = out["logp"].round(6)
    return out.sort_values(
        ["feature", "value", "cls"]
    ).reset_index(drop=True)


def q_kaplan_meier(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier survival of user lifetimes (days from first to
    last event; 'event' = the user ever purchased, else censored).
    ops.fit.kaplan_meier over a per-user bucketed aggregate; the
    curve closes on the distinct-duration histogram.  Hash-exact vs
    an ordered product()-window twin."""
    from unfurl_ray.ops.fit import kaplan_meier
    from unfurl_ray.ops.relational import bucketed_aggregate

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts", "event_type"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "ts_us": batch["ts"].astype("int64"),
                "is_p": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    users = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["user_id"],
        {"t0": ("ts_us", "min"), "t1": ("ts_us", "max"),
         "ev": ("is_p", "max")},
    )

    def dur(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dur": (
                    (batch["t1"] - batch["t0"]) // 86_400_000_000
                ).astype("int64"),
                "event": batch["ev"].astype("int64"),
            }
        )

    out = kaplan_meier(
        users.map_batches(dur, batch_format="pandas"), "dur", "event"
    )
    out["survival"] = out["survival"].round(6)
    return out


def q_acf(sf_dir: str) -> pd.DataFrame:
    """Autocorrelation of the daily revenue series at lags 1..7 —
    seasonality detection over the bounded time axis.
    ops.profile.autocorrelation on the pre-aggregated (day, revenue)
    series.  Hash-exact vs a lag self-join twin."""
    from unfurl_ray.ops.profile import autocorrelation
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": (
                    batch["o_orderdate"].astype("int64")
                    // 86_400_000_000
                ).astype("int64"),
                "x": batch["o_totalprice"],
            }
        )

    daily = pre_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["day"], {"x": ("x", "sum")},
    )
    out = autocorrelation(daily, "day", "x", max_lag=7)
    out["acf"] = out["acf"].round(6)
    return out


def q_throttle(sf_dir: str) -> pd.DataFrame:
    """Rapid-repeat event filter: drop events within 1 h of the same
    user's previous event (lag semantics).
    ops.relational.throttle_events — one groupby(user).map_groups
    pass.  Hash-exact vs a lag-window twin."""
    from unfurl_ray.ops.relational import throttle_events

    ds = _parquet_sh(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = throttle_events(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        min_gap_us=3_600_000_000,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_ols_multi(sf_dir: str) -> pd.DataFrame:
    """Multi-feature OLS (extendedprice ~ quantity + discount) by
    one-pass normal equations: per-batch Gram partials, driver solve.
    ops.fit.ols_fit.  Rows-only (float partial fold) + a numpy
    lstsq parity pytest."""
    from unfurl_ray.ops.fit import ols_fit

    ds = _parquet_sh(
        sf_dir, "lineitem",
        ["l_extendedprice", "l_quantity", "l_discount"],
    )
    out = ols_fit(ds, "l_extendedprice", ["l_quantity", "l_discount"])
    out["coef"] = out["coef"].round(4)
    return out


def q_rank_fusion(sf_dir: str) -> pd.DataFrame:
    """Reciprocal rank fusion (k=60) of two customer rankings —
    total spend and order count — the standard multi-signal ranking
    combiner.  Spend folds as exact integer cents so rank ties break
    identically to the twin; ranks come from global_row_number (one
    range-partitioned sort each), fused via a bucketed hash join.
    Hash-exact vs a row_number() twin."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, bucketed_hash_join, global_row_number,
    )

    ds = _parquet_sh(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"],
                "cents": np.round(
                    batch["o_totalprice"].to_numpy() * 100
                ).astype("int64"),
            }
        )

    agg = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["o_custkey"],
        {"spend": ("cents", "sum"), "n": ("cents", "count")},
    ).materialize()

    def neg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.append_column(
            "neg_spend", _pc.negate(batch.column("spend"))
        ).append_column("neg_n", _pc.negate(batch.column("n")))

    keyed = agg.map_batches(neg, batch_format="pyarrow").materialize()
    r1 = global_row_number(
        keyed.select_columns(["o_custkey", "neg_spend"]),
        ["neg_spend", "o_custkey"], out_col="spend_rank",
    ).select_columns(["o_custkey", "spend_rank"])
    r2 = global_row_number(
        keyed.select_columns(["o_custkey", "neg_n"]),
        ["neg_n", "o_custkey"], out_col="count_rank",
    ).select_columns(["o_custkey", "count_rank"])

    both = bucketed_hash_join(
        r1, r2, on="o_custkey", right_on="o_custkey",
    )

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        r1v = batch["spend_rank"].to_numpy(np.int64)
        r2v = batch["count_rank"].to_numpy(np.int64)
        batch["rrf"] = 1.0 / (60 + r1v) + 1.0 / (60 + r2v)
        return batch.sort_values(
            ["rrf", "o_custkey"], ascending=[False, True]
        ).head(20)

    best = both.map_batches(score, batch_format="pandas").to_pandas()
    best = best.sort_values(
        ["rrf", "o_custkey"], ascending=[False, True]
    ).head(20)
    best["rrf"] = best["rrf"].round(6)
    return best[
        ["o_custkey", "spend_rank", "count_rank", "rrf"]
    ].reset_index(drop=True)


def q_collocations(sf_dir: str) -> pd.DataFrame:
    """Top-20 collocations (PMI, min count 5) over the documents
    corpus — the phrase-discovery primitive.
    ops.textstats.pmi_collocations: Counter combiners, bucketed
    vocabulary folds, two degree joins, integer-exact PMI ratio.
    Hash-exact vs an unnest-based SQL twin."""
    from unfurl_ray.ops.textstats import pmi_collocations

    ds = _parquet(sf_dir, "documents", ["text"])
    out = pmi_collocations(ds, "text", min_count=5, top_k=20)
    out["pmi"] = out["pmi"].round(6)
    return out


def q_trigram_paths(sf_dir: str) -> pd.DataFrame:
    """Behavioural path mining: counts of consecutive event-type
    trigrams per user stream.  ops.relational.sequence_ngrams — one
    groupby(user).map_groups pass emits per-key Counter partials,
    bucketed fold.  Hash-exact vs a double-lag window twin."""
    from unfurl_ray.ops.relational import sequence_ngrams

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )
    out = sequence_ngrams(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        token_col="event_type", n=3,
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values(["g1", "g2", "g3"]).reset_index(drop=True)


def q_centroid_sep(sf_dir: str) -> pd.DataFrame:
    """Intra-cluster cohesion of the labeled embedding table: per
    label, mean cosine of members to their own centroid.
    ops.similarity.label_centroid_separation — two partial-sum
    passes, centroid matrix broadcast once.  Hash-exact vs a
    list_cosine_similarity twin at round(6)."""
    from unfurl_ray.ops.similarity import label_centroid_separation

    ds = _parquet(sf_dir, "embeddings", ["label", "embedding"])
    out = label_centroid_separation(ds, "label", "embedding")
    out["mean_cos"] = out["mean_cos"].round(6)
    return out


def q_feature_hash(sf_dir: str) -> pd.DataFrame:
    """Hashing-trick featurization: sparse (doc_id, bucket, tf) rows
    in a fixed 256-dim space, md5-bucketed so the map is
    deterministic and SQL-twinned.  ops.textstats.feature_hash_tf —
    pure map_batches, no vocabulary, no shuffle."""
    from unfurl_ray.ops.textstats import feature_hash_tf

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = feature_hash_tf(ds, "text", "doc_id", n_buckets=256)
    df = out.to_pandas()
    return df.sort_values(["doc_id", "bucket"]).reset_index(drop=True)


def q_benford(sf_dir: str) -> pd.DataFrame:
    """Benford's-law first-digit audit of order amounts (in exact
    cents) with per-digit chi-square terms — the fraud/data-quality
    screen.  ops.profile.benford_audit.  Hash-exact vs a
    string-leading-digit twin."""
    from unfurl_ray.ops.profile import benford_audit

    ds = _parquet_sh(sf_dir, "orders", ["o_totalprice"])

    def cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cents": np.round(
                    batch["o_totalprice"].to_numpy() * 100
                ).astype("int64")
            }
        )

    out = benford_audit(
        ds.map_batches(cents, batch_format="pandas"), "cents"
    )
    out["expected"] = out["expected"].round(6)
    out["chi2_term"] = out["chi2_term"].round(6)
    return out


def q_ccf(sf_dir: str) -> pd.DataFrame:
    """Cross-correlation between the daily click-count and
    purchase-count series at lags -3..3 (does click volume lead
    purchases?).  ops.profile.cross_correlation over one
    pre-aggregated (day, clicks, purchases) pass.  Hash-exact vs a
    day-offset self-join twin."""
    from unfurl_ray.ops.profile import cross_correlation
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["ts", "event_type"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": (
                    batch["ts"].astype("int64") // 86_400_000_000
                ).astype("int64"),
                "x": (batch["event_type"] == "click").astype("int64"),
                "y": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    daily = pre_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["day"], {"x": ("x", "sum"), "y": ("y", "sum")},
    )
    out = cross_correlation(daily, "day", "x", "y", max_lag=3)
    out["ccf"] = out["ccf"].round(6)
    return out


def q_nb_confusion(sf_dir: str) -> pd.DataFrame:
    """Model fit THEN distributed apply: the naive Bayes classifier
    from q_naive_bayes scores every order (broadcast vocabulary-sized
    model, one vectorized reindex per feature per batch) and the
    confusion matrix folds via pre_aggregate.  Hash-exact vs a SQL
    twin that mirrors the score expression term for term (explicit
    ln differences, identical addition order, ties by class asc)."""
    from unfurl_ray.ops.fit import naive_bayes_apply, naive_bayes_fit
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(
        sf_dir, "orders",
        ["o_orderstatus", "o_orderpriority", "o_orderdate"],
    )

    def feat(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cls": batch["o_orderstatus"],
                "priority": batch["o_orderpriority"],
                "dow": (
                    batch["o_orderdate"].astype("int64")
                    // 86_400_000_000 % 7
                ).astype(str),
            }
        )

    feats = ds.map_batches(feat, batch_format="pandas").materialize()
    model = naive_bayes_fit(feats, "cls", ["priority", "dow"])
    scored = naive_bayes_apply(
        feats, model, ["priority", "dow"], out_col="predicted"
    )
    out = pre_aggregate(
        scored.select_columns(["cls", "predicted"]),
        ["cls", "predicted"], {"n": ("cls", "count")},
    ).to_pandas()
    out = out.rename(columns={"cls": "actual"})
    out["n"] = out["n"].astype("int64")
    return out.sort_values(
        ["actual", "predicted"]
    ).reset_index(drop=True)


def q_late_events(sf_dir: str) -> pd.DataFrame:
    """Streaming late-data tagging replayed in batch: per-user
    watermark (arrival order = event_id, allowed lateness 6 h) flags
    events a streaming window would side-output.
    ops.relational.late_event_split.  Hash-exact vs a running-max
    window twin."""
    from unfurl_ray.ops.relational import late_event_split

    ds = _parquet_sh(sf_dir, "events", ["event_id", "ts", "user_id"])
    out = late_event_split(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        allowed_lateness_us=6 * 3_600_000_000,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_keyness(sf_dir: str) -> pd.DataFrame:
    """Corpus keyness: top-20 terms distinguishing English documents
    from the rest by Dunning's G2 log-likelihood ratio.
    ops.textstats.g2_keyness — Counter combiners, bucketed vocabulary
    fold, per-bucket vectorized G2.  Hash-exact vs an explicit-formula
    twin."""
    from unfurl_ray.ops.textstats import g2_keyness

    ds = _parquet(sf_dir, "documents", ["text", "lang"])
    out = g2_keyness(
        ds, "text", "lang", "en", min_count=10, top_k=20
    )
    out["a"] = out["a"].astype("int64")
    out["b"] = out["b"].astype("int64")
    out["g2"] = out["g2"].round(6)
    return out


def q_cume_dist(sf_dir: str) -> pd.DataFrame:
    """Per-source cumulative distribution position of each document's
    quality score — percent_rank's sibling on the shared histogram
    decomposition (ops.relational.cume_dist_by).  Hash-exact vs a
    CUME_DIST() window twin."""
    from unfurl_ray.ops.relational import cume_dist_by
    from unfurl_ray.ops.textstats import quality_score_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "source", "text"])

    def score(batch: pd.DataFrame) -> pa.Table:
        q = quality_score_batch(batch)
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(), pa.int64()
                ),
                "source": pa.array(batch["source"], pa.string()),
                "quality": pa.array(
                    q["quality"].to_numpy(), pa.float64()
                ),
            }
        )

    scored = ds.map_batches(score, batch_format="pandas")
    out = cume_dist_by(
        scored, key_col="source", value_col="quality"
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    return (
        out[["doc_id", "source", "quality", "cd"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def q_impute(sf_dir: str) -> pd.DataFrame:
    """Median imputation: negative account balances (the 'unknown'
    sentinel) replaced by the segment's discrete median of the valid
    balances.  ops.relational.group_quantile_disc for the 5-row
    mapping, then a pure broadcast map — imputation at 100 TB is a
    map, not a join.  Hash-exact (imputed values are data values)."""
    from unfurl_ray.ops.relational import group_quantile_disc

    ds = _parquet_sh(
        sf_dir, "customer", ["c_custkey", "c_mktsegment", "c_acctbal"]
    ).materialize()

    def valid(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("c_acctbal"), 0.0)
        )

    med = group_quantile_disc(
        ds.map_batches(valid, batch_format="pyarrow"),
        "c_mktsegment", "c_acctbal", 0.5,
    ).to_pandas()
    med_map = dict(
        zip(med["c_mktsegment"], med["quantile_value"])
    )

    def impute(batch: pd.DataFrame) -> pd.DataFrame:
        bal = batch["c_acctbal"].to_numpy(np.float64)
        fill = batch["c_mktsegment"].map(med_map).to_numpy(np.float64)
        miss = bal < 0
        return pd.DataFrame(
            {
                "c_custkey": batch["c_custkey"],
                "c_mktsegment": batch["c_mktsegment"],
                "acctbal_imputed": np.where(miss, fill, bal),
                "was_imputed": miss.astype(np.int64),
            }
        )

    out = ds.map_batches(impute, batch_format="pandas").to_pandas()
    return out.sort_values("c_custkey").reset_index(drop=True)


def q_woe_iv(sf_dir: str) -> pd.DataFrame:
    """Scorecard-style Weight-of-Evidence / Information-Value of the
    event value against the purchase target, over exact NTILE(10)
    bins (ops.relational.ntile_by's histogram-offset ranks).  All
    WOE/IV inputs are exact integer counts, so the explicit-formula
    SQL twin hash-matches."""
    from unfurl_ray.ops.relational import ntile_by, pre_aggregate

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "event_type", "value"]
    )

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"],
                "part": "all",
                "value": batch["value"],
                "y": (batch["event_type"] == "purchase").astype(
                    "int64"
                ),
            }
        )

    tagged = ntile_by(
        ds.map_batches(tag, batch_format="pandas"),
        part_col="part", order_col="value", id_col="event_id", k=10,
    )
    counts = pre_aggregate(
        tagged, ["bucket"],
        {"good": ("y", "sum"), "n": ("y", "count")},
    ).to_pandas().sort_values("bucket").reset_index(drop=True)
    good = counts["good"].to_numpy(np.int64)
    n = counts["n"].to_numpy(np.int64)
    bad = n - good
    G, B = int(good.sum()), int(bad.sum())
    woe = np.log(
        (good.astype(np.float64) * B) / (bad.astype(np.float64) * G)
    )
    iv_term = (good / G - bad / B) * woe
    return pd.DataFrame(
        {
            "bucket": counts["bucket"].astype("int64"),
            "n": n,
            "good": good,
            "bad": bad,
            "woe": np.round(woe, 6),
            "iv_term": np.round(iv_term, 6),
        }
    )


def q_resample_linear(sf_dir: str) -> pd.DataFrame:
    """Per-user daily series with LINEAR interpolation between
    observed days (the numeric sibling of q_resample_locf).
    ops.relational.resample_linear — per-key grid fill, SQL-identical
    interpolation expression.  Hash-exact vs a two-ASOF-join twin."""
    from unfurl_ray.ops.relational import resample_linear

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts", "value"])
    out = resample_linear(
        ds, key_col="user_id", ts_col="ts", value_col="value",
        bucket_s=86_400,
    ).to_pandas()
    out["v"] = out["v"].round(6)
    return out.sort_values(
        ["user_id", "unit"]
    ).reset_index(drop=True)


def q_communities(sf_dir: str) -> pd.DataFrame:
    """Community detection on the embedding similarity graph by
    deterministic synchronous label propagation —
    ops.graph.label_propagation (shard-actor Pregel, per-round
    histogram exchange).  Rows-only (iterative fixpoint, no SQL
    twin); the small-graph parity pytest pins the rule."""
    from unfurl_ray.ops.graph import label_propagation

    out = label_propagation(
        _embedding_edges(sf_dir), max_iters=10
    ).to_pandas()
    out["node"] = out["node"].astype("int64")
    out["community"] = out["community"].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


def q_trimmed_mean(sf_dir: str) -> pd.DataFrame:
    """10%-trimmed mean order value per priority — the robust
    location screen.  ops.relational.trimmed_mean_by (rank-based
    trim, (value, id) total order).  Hash-exact vs a row_number
    twin."""
    from unfurl_ray.ops.relational import trimmed_mean_by

    ds = _parquet_sh(
        sf_dir, "orders",
        ["o_orderkey", "o_orderpriority", "o_totalprice"],
    )
    out = trimmed_mean_by(
        ds, key_col="o_orderpriority", value_col="o_totalprice",
        id_col="o_orderkey", trim=0.1,
    ).to_pandas()
    out["trimmed_mean"] = out["trimmed_mean"].round(6)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_attribution(sf_dir: str) -> pd.DataFrame:
    """Last-touch attribution: every purchase credited to the user's
    most recent preceding non-purchase event (arrival order).
    ops.relational.last_touch_attribution — one
    groupby(user).map_groups forward-fill pass.  Hash-exact vs an
    ASOF-join twin."""
    from unfurl_ray.ops.relational import last_touch_attribution

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "user_id", "event_type"]
    )
    out = last_touch_attribution(
        ds, key_col="user_id", id_col="event_id",
        type_col="event_type", target="purchase",
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_first_last(sf_dir: str) -> pd.DataFrame:
    """Per-user first and last event value (the session-bookend
    feature): combiner-friendly argmin/argmax — 2 candidate rows per
    user per batch cross the shuffle.  ops.relational.first_last_by.
    Hash-exact vs a row_number asc/desc twin."""
    from unfurl_ray.ops.relational import first_last_by

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    )
    out = first_last_by(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="value",
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_rolling_median(sf_dir: str) -> pd.DataFrame:
    """Per-user trailing 5-event median of value (robust smoothing).
    ops.relational.rolling_median_by.  Hash-exact vs a median window
    twin (frame shrink at the stream head matches min_periods=1)."""
    from unfurl_ray.ops.relational import rolling_median_by

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "value"]
    )
    out = rolling_median_by(
        ds, key_col="user_id", ts_col="ts", id_col="event_id",
        value_col="value", window=5,
    ).to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def q_entity_resolution(sf_dir: str) -> pd.DataFrame:
    """Entity resolution end to end — the four-stage composition a
    record-linkage pipeline runs: FastSS edit-distance blocking+verify
    (candidate pairs) -> distributed min-label connected components ->
    per-record canonical assignment -> distributed cluster sizes
    (bucketed count + hash join, never a driver-side groupby over the
    corpus).  Hash-exact vs a levenshtein + recursive-CTE twin."""
    import ray

    from unfurl_ray.ops.dedup import edit_distance_join
    from unfurl_ray.ops.graph import (
        assign_components, connected_components,
    )
    from unfurl_ray.ops.relational import (
        _arrow, bucketed_aggregate, bucketed_hash_join,
    )

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    pairs = edit_distance_join(ds, k=1, key_len=24)
    edges = ray.data.from_arrow(
        _arrow(
            pd.DataFrame(
                {
                    "u": np.concatenate(
                        [pairs["doc_a"], pairs["doc_b"]]
                    ).astype(np.int64),
                    "v": np.concatenate(
                        [pairs["doc_b"], pairs["doc_a"]]
                    ).astype(np.int64),
                }
            )
        )
    )
    labels = connected_components(edges)
    assigned = assign_components(ds, labels).materialize()
    sizes = bucketed_aggregate(
        assigned, ["component"],
        {"cluster_size": ("component", "count")},
    )
    joined = bucketed_hash_join(
        assigned, sizes, on="component", right_on="component"
    )

    def finish(batch: pd.DataFrame) -> pa.Table:
        return _arrow(
            pd.DataFrame(
                {
                    "doc_id": batch["doc_id"].astype("int64"),
                    "component": batch["component"].astype("int64"),
                    "cluster_size": batch["cluster_size"].astype(
                        "int64"
                    ),
                    "is_canonical": (
                        batch["doc_id"] == batch["component"]
                    ).astype("int64"),
                }
            )
        )

    out = joined.map_batches(finish, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_histogram(sf_dir: str) -> pd.DataFrame:
    """20 equal-width bins of order value — the plain numeric
    profiling histogram: global min/max from per-batch partials, one
    pre-aggregated bin count shuffle.  Bin expression is float-
    identical to the SQL twin's, so the check is hash-exact."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "orders", ["o_totalprice"]).materialize()

    def mm(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy(np.float64)
        return pd.DataFrame(
            {"mn": [float(v.min())], "mx": [float(v.max())]}
        )

    parts = ds.map_batches(mm, batch_format="pandas").to_pandas()
    mn, mx = float(parts["mn"].min()), float(parts["mx"].max())
    w = (mx - mn) / 20.0

    def binize(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy(np.float64)
        b = np.minimum(np.floor((v - mn) / w), 19.0).astype(np.int64)
        return pd.DataFrame({"bin": b})

    hist = pre_aggregate(
        ds.map_batches(binize, batch_format="pandas"),
        ["bin"], {"n": ("bin", "count")},
    ).to_pandas().sort_values("bin").reset_index(drop=True)
    hist["bin"] = hist["bin"].astype("int64")
    hist["n"] = hist["n"].astype("int64")
    hist["lo"] = (mn + hist["bin"].to_numpy(np.float64) * w).round(6)
    return hist[["bin", "lo", "n"]]


def q_compress_ratio(sf_dir: str) -> pd.DataFrame:
    """zlib compression ratio per document — the cheap redundancy /
    boilerplate signal of a curation stack.
    ops.textstats.compress_ratio_batch (pure map).  Rows-only (no
    SQL zlib); the pytest pins ordering between repetitive and
    high-entropy docs."""
    from unfurl_ray.ops.textstats import compress_ratio_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(
        compress_ratio_batch, batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def q_negatives(sf_dir: str) -> pd.DataFrame:
    """Deterministic contrastive negative sampling: 4 md5-derived
    corpus negatives per anchor doc.  ops.textstats.hash_negatives
    (pure map + one count fold).  Hash-exact vs the md5-substr
    twin."""
    from unfurl_ray.ops.textstats import hash_negatives

    ds = _parquet(sf_dir, "documents", ["doc_id"])
    out = hash_negatives(ds, k=4).to_pandas()
    return out.sort_values(
        ["doc_id", "neg_rank"]
    ).reset_index(drop=True)


def q_dpo_pairs(sf_dir: str) -> pd.DataFrame:
    """Preference-pair assembly (DPO-style): per 8-turn conversation,
    chosen = highest-quality turn, rejected = lowest (ties break by
    doc_id), prompt = first turn.  Whole convs co-locate by hash
    bucket; quality is the shared hash-checked score.  Hash-exact vs
    a row_number twin over the same quality expression."""
    from unfurl_ray.ops.textstats import quality_score_batch
    from unfurl_ray.sources.transcripts import TURNS_PER_CONV as TURNS

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def score(batch: pd.DataFrame) -> pa.Table:
        q = quality_score_batch(batch)
        conv = batch["doc_id"].to_numpy() // TURNS
        return pa.table(
            {
                "conv": pa.array(conv, pa.int64()),
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(), pa.int64()
                ),
                "quality": pa.array(
                    q["quality"].to_numpy(), pa.float64()
                ),
                "_b": pa.array(conv % 32, pa.int64()),
            }
        )

    def pick(group: pd.DataFrame) -> pa.Table:
        rows = []
        for conv, g in group.groupby("conv", sort=False):
            g = g.sort_values("doc_id").reset_index(drop=True)
            prompt_id = int(g["doc_id"].iloc[0])
            ch = g.sort_values(
                ["quality", "doc_id"], ascending=[False, True]
            ).iloc[0]
            rj = g.sort_values(
                ["quality", "doc_id"], ascending=[True, True]
            ).iloc[0]
            rows.append(
                (int(conv), prompt_id, int(ch["doc_id"]),
                 float(ch["quality"]), int(rj["doc_id"]),
                 float(rj["quality"]))
            )
        rows.sort()
        return pa.table(
            {
                "conv_id": pa.array(
                    [r[0] for r in rows], pa.int64()
                ),
                "prompt_id": pa.array(
                    [r[1] for r in rows], pa.int64()
                ),
                "chosen_id": pa.array(
                    [r[2] for r in rows], pa.int64()
                ),
                "chosen_q": pa.array(
                    [r[3] for r in rows], pa.float64()
                ),
                "rejected_id": pa.array(
                    [r[4] for r in rows], pa.int64()
                ),
                "rejected_q": pa.array(
                    [r[5] for r in rows], pa.float64()
                ),
            }
        )

    out = (
        ds.map_batches(score, batch_format="pandas")
        .groupby("_b")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("conv_id").reset_index(drop=True)


def q_kappa(sf_dir: str) -> pd.DataFrame:
    """Annotator-agreement audit: Cohen's kappa between the langid
    heuristic and the stored language label — the label-quality gate
    of an annotation pipeline.  Confusion counts fold via
    pre_aggregate; the kappa formula closes on exact integers.
    Hash-exact vs a margins twin over the shared langid SQL."""
    from unfurl_ray.ops.relational import pre_aggregate
    from unfurl_ray.ops.textstats import LangId

    ds = _parquet(sf_dir, "documents", ["doc_id", "text", "lang"])

    class PredActual:
        def __init__(self):
            self.lid = LangId()

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            pred = self.lid(batch)
            return pd.DataFrame(
                {
                    "actual": batch["lang"].to_numpy(),
                    "pred": pred["lang_pred"].to_numpy(),
                }
            )

    conf = pre_aggregate(
        ds.map_batches(
            PredActual, batch_format="pandas", concurrency=(1, 2)
        ),
        ["actual", "pred"], {"n": ("pred", "count")},
    ).to_pandas()
    n = int(conf["n"].sum())
    agree = int(conf.loc[conf["actual"] == conf["pred"], "n"].sum())
    rows = conf.groupby("actual")["n"].sum()
    cols = conf.groupby("pred")["n"].sum()
    s = int(
        sum(
            int(rows[k]) * int(cols[k])
            for k in rows.index
            if k in cols.index
        )
    )
    po = agree * 1.0 / n
    pe = s * 1.0 / (n * n)
    return pd.DataFrame(
        {
            "n": np.array([n], dtype=np.int64),
            "agree": np.array([agree], dtype=np.int64),
            "po": [round(po, 6)],
            "pe": [round(pe, 6)],
            "kappa": [round((po - pe) / (1 - pe), 6)],
        }
    )


def q_seasonal(sf_dir: str) -> pd.DataFrame:
    """Additive weekly seasonal decomposition of daily revenue:
    per-dow effect (dow mean minus overall mean) and the global
    seasonality strength 1 - SSW/SST, computed on the pre-aggregated
    bounded day axis (the ACF pattern).  Hash-exact vs an
    explicit-sums twin."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": (
                    batch["o_orderdate"].astype("int64")
                    // 86_400_000_000
                ).astype("int64"),
                "x": batch["o_totalprice"],
            }
        )

    daily = pre_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["day"], {"x": ("x", "sum")},
    ).to_pandas()
    day = daily["day"].to_numpy(np.int64)
    x = daily["x"].to_numpy(np.float64)
    dow = day % 7
    m = x.sum() / len(x)
    sst = float(((x - m) ** 2).sum())
    out_rows = []
    ssw = 0.0
    for k in range(7):
        xs = x[dow == k]
        mk = xs.sum() / len(xs)
        ssw += float(((xs - mk) ** 2).sum())
        out_rows.append((k, len(xs), mk, mk - m))
    strength = 1.0 - ssw / sst
    return pd.DataFrame(
        {
            "dow": np.array([r[0] for r in out_rows], dtype=np.int64),
            "n_days": np.array(
                [r[1] for r in out_rows], dtype=np.int64
            ),
            "mean_rev": np.round([r[2] for r in out_rows], 6),
            "effect": np.round([r[3] for r in out_rows], 6),
            "strength": np.round([strength] * 7, 6),
        }
    )


def q_fanout_spectrum(sf_dir: str) -> pd.DataFrame:
    """Join fan-out profiling: the distribution of orders-per-customer
    (frequency-of-frequencies over the join key — what a planner
    needs to predict join blowup).  Two tiny shuffles: bucketed
    per-key counts, then a count histogram."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, pre_aggregate,
    )

    ds = _parquet_sh(sf_dir, "orders", ["o_custkey"])
    per_key = bucketed_aggregate(
        ds, ["o_custkey"], {"n_orders": ("o_custkey", "count")}
    )
    spec = pre_aggregate(
        per_key, ["n_orders"], {"n_customers": ("n_orders", "count")}
    ).to_pandas()
    spec["n_orders"] = spec["n_orders"].astype("int64")
    spec["n_customers"] = spec["n_customers"].astype("int64")
    return spec.sort_values("n_orders").reset_index(drop=True)


def q_csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """CSV egress -> ingest closure: an events projection writes to
    hash-partitioned CSV shards (ray.data.write_csv) and streams back
    through read_csv; the roundtrip must lose nothing — the oracle is
    simply the source selection.  Timestamps stay int64 microseconds
    across the text format (the lossless CSV contract; raw timestamps
    round-trip through ISO strings with unit drift)."""
    import shutil
    import tempfile

    import ray

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "user_id", "ts", "value"]
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts_us": batch["ts"]
                .to_numpy("datetime64[us]")
                .astype("int64"),
                "value": batch["value"],
            }
        )

    out_dir = tempfile.mkdtemp(prefix="unfurl_csv_")
    try:
        ds.map_batches(prep, batch_format="pandas").repartition(
            8
        ).write_csv(out_dir)
        back = ray.data.read_csv(out_dir).to_pandas()
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    back["event_id"] = back["event_id"].astype("int64")
    back["user_id"] = back["user_id"].astype("int64")
    back["ts_us"] = back["ts_us"].astype("int64")
    back["value"] = back["value"].astype("float64")
    return back.sort_values("event_id").reset_index(drop=True)[
        ["event_id", "user_id", "ts_us", "value"]
    ]


def q_dp_counts(sf_dir: str) -> pd.DataFrame:
    """Laplace-mechanism noisy per-type event counts with
    DETERMINISTIC noise (md5-uniform -> inverse-CDF Laplace, seeded
    by the group key) — the mechanism's plumbing made reproducible
    and therefore hash-checkable; swap the seed source for an RNG in
    production to get eps-DP.  Counts fold via pre_aggregate; noise
    is a scalar map over the tiny group table."""
    import hashlib

    from unfurl_ray.ops.relational import pre_aggregate

    eps = 0.5
    b = 1.0 / eps
    ds = _parquet_sh(sf_dir, "events", ["event_type"])
    counts = pre_aggregate(
        ds, ["event_type"], {"n": ("event_type", "count")}
    ).to_pandas().sort_values("event_type").reset_index(drop=True)

    def lap(key: str) -> float:
        h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0 - 0.5
        return -b * np.sign(u) * np.log(1.0 - 2.0 * abs(u))

    noise = np.array([lap(k) for k in counts["event_type"]])
    counts["n"] = counts["n"].astype("int64")
    counts["noisy_n"] = np.round(
        counts["n"].to_numpy(np.float64) + noise, 6
    )
    return counts


def q_share_of_parent(sf_dir: str) -> pd.DataFrame:
    """OLAP share-of-parent: each (status, priority) cell's revenue
    share within its status, and each status within the total — one
    rollup shuffle (exact integer cents), the parent levels joined
    back from the same result.  Hash-exact vs a GROUPING-SETS-free
    explicit twin (exact-int ratios)."""
    from unfurl_ray.ops.relational import rollup_aggregate

    ds = _parquet_sh(
        sf_dir, "orders",
        ["o_orderstatus", "o_orderpriority", "o_totalprice"],
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "status": batch["o_orderstatus"],
                "priority": batch["o_orderpriority"],
                "cents": np.round(
                    batch["o_totalprice"].to_numpy() * 100
                ).astype("int64"),
            }
        )

    roll = rollup_aggregate(
        ds.map_batches(prep, batch_format="pandas"),
        ["status", "priority"], {"cents": ("cents", "sum")},
    ).to_pandas()
    lvl2 = roll[
        (roll["status"] != "ALL") & (roll["priority"] != "ALL")
    ]
    lvl1 = roll[
        (roll["status"] != "ALL") & (roll["priority"] == "ALL")
    ].set_index("status")["cents"]
    total = int(
        roll.loc[
            (roll["status"] == "ALL") & (roll["priority"] == "ALL"),
            "cents",
        ].iloc[0]
    )
    out = pd.DataFrame(
        {
            "status": lvl2["status"].to_numpy(),
            "priority": lvl2["priority"].to_numpy(),
            "cents": lvl2["cents"].astype("int64").to_numpy(),
            "share_of_status": np.round(
                lvl2["cents"].to_numpy(np.float64)
                / lvl1.reindex(lvl2["status"]).to_numpy(np.float64),
                6,
            ),
            "status_share_of_total": np.round(
                lvl1.reindex(lvl2["status"]).to_numpy(np.float64)
                / float(total),
                6,
            ),
        }
    )
    return out.sort_values(
        ["status", "priority"]
    ).reset_index(drop=True)


def q_schema_evolve(sf_dir: str) -> pd.DataFrame:
    """Schema-evolution union: an old snapshot (doc_id, source) and a
    new one with an added column (doc_id, source, n_chars) unify to
    the widest schema with TYPED nulls — the bucketed join's padding
    discipline applied to ingest.  Hash-exact vs a UNION ALL twin."""
    ds = _parquet_sh(sf_dir, "documents", ["doc_id", "source", "n_chars"])

    def old_snapshot(batch: pa.Table) -> pa.Table:
        half = batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
        )
        n = len(half)
        return pa.table(
            {
                "doc_id": half.column("doc_id"),
                "source": half.column("source"),
                "n_chars": pa.nulls(n, pa.int64()),
                "snapshot": pa.array(["old"] * n, pa.string()),
            }
        )

    def new_snapshot(batch: pa.Table) -> pa.Table:
        half = batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 1)
        )
        return pa.table(
            {
                "doc_id": half.column("doc_id"),
                "source": half.column("source"),
                "n_chars": half.column("n_chars").cast(pa.int64()),
                "snapshot": pa.array(["new"] * len(half), pa.string()),
            }
        )

    unified = ds.map_batches(
        old_snapshot, batch_format="pyarrow"
    ).union(ds.map_batches(new_snapshot, batch_format="pyarrow"))

    def finish(batch: pa.Table) -> pa.Table:
        # -1 sentinel instead of a nullable int: the driver's value
        # hash stringifies <NA> and NaN differently across engines
        return batch.set_column(
            batch.column_names.index("n_chars"),
            "n_chars",
            pc.fill_null(batch.column("n_chars"), -1),
        )

    out = unified.map_batches(
        finish, batch_format="pyarrow"
    ).to_pandas()
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_chars"] = out["n_chars"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_markov_stationary(sf_dir: str) -> pd.DataFrame:
    """Stationary distribution of the event-type transition chain:
    the transition counts fold distributed (q_transitions' shuffle);
    the 5x5 row-normalized matrix power-iterates on the driver
    (deterministic, 200 steps).  Rows-only (iterative fixpoint); the
    pytest checks the eigen identity pi P = pi."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(
        sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]
    )

    def pairs(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["ts", "event_id"])
        t = g["event_type"].to_numpy()
        return pa.table(
            {
                "src": pa.array(t[:-1], pa.string()),
                "dst": pa.array(t[1:], pa.string()),
            }
        )

    counts = pre_aggregate(
        ds.groupby("user_id").map_groups(
            pairs, batch_format="pandas"
        ),
        ["src", "dst"], {"n": ("src", "count")},
    ).to_pandas()
    piv = counts.pivot_table(
        index="src", columns="dst", values="n", aggfunc="sum",
        fill_value=0,
    ).sort_index()
    piv = piv[sorted(piv.columns)]
    P = piv.to_numpy(np.float64)
    P = P / P.sum(axis=1, keepdims=True)
    pi = np.full(P.shape[0], 1.0 / P.shape[0])
    for _ in range(200):
        pi = pi @ P
    return pd.DataFrame(
        {
            "event_type": piv.index.to_numpy(),
            "stationary": np.round(pi, 6),
        }
    ).sort_values("event_type").reset_index(drop=True)


def q_lineage(sf_dir: str) -> pd.DataFrame:
    """Provenance accounting: rows surviving a filter, counted per
    INPUT FILE (read_parquet(include_paths=True) threads the source
    path through the pipeline — the audit a multi-source ingest needs
    to blame a bad shard).  Hash-exact (basename is static)."""
    import os

    import ray

    from unfurl_ray.ops.relational import pre_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "n_chars"],
        include_paths=True,
    )

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        keep = batch["n_chars"].to_numpy() >= 200
        return pd.DataFrame(
            {
                "file": [
                    os.path.basename(p)
                    for p in batch.loc[keep, "path"]
                ],
            }
        )

    out = pre_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["file"], {"n_rows": ("file", "count")},
    ).to_pandas()
    out["n_rows"] = out["n_rows"].astype("int64")
    return out.sort_values("file").reset_index(drop=True)


def q_weighted_stats(sf_dir: str) -> pd.DataFrame:
    """Importance-weighted corpus stats per source: char-weighted
    mean quality and the effective sample size (sum w)^2 / sum w^2 —
    what a reweighted training mixture actually contains.  Integer
    weights keep ESS exact; one pre-aggregated shuffle."""
    from unfurl_ray.ops.relational import pre_aggregate
    from unfurl_ray.ops.textstats import quality_score_batch

    ds = _parquet(sf_dir, "documents", ["doc_id", "source", "text"])

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        q = quality_score_batch(batch)
        w = batch["text"].fillna("").str.len().to_numpy(np.int64)
        return pd.DataFrame(
            {
                "source": batch["source"].to_numpy(),
                "w": w,
                "wq": w * q["quality"].to_numpy(np.float64),
                "w2": w * w,
            }
        )

    agg = pre_aggregate(
        ds.map_batches(score, batch_format="pandas"),
        ["source"],
        {"sw": ("w", "sum"), "swq": ("wq", "sum"),
         "sw2": ("w2", "sum"), "n": ("w", "count")},
    ).to_pandas().sort_values("source").reset_index(drop=True)
    sw = agg["sw"].astype("int64")
    sw2 = agg["sw2"].astype("int64")
    return pd.DataFrame(
        {
            "source": agg["source"],
            "n": agg["n"].astype("int64"),
            "weighted_quality": np.round(
                agg["swq"].to_numpy(np.float64)
                / sw.to_numpy(np.float64), 6
            ),
            "ess": np.round(
                sw.to_numpy(np.float64) ** 2
                / sw2.to_numpy(np.float64), 6
            ),
        }
    )


def q_churn_labels(sf_dir: str) -> pd.DataFrame:
    """Leakage-safe label assembly (the point-in-time discipline):
    per-user features from events STRICTLY BEFORE the cutoff
    (n_events, total value) and the label — any purchase in the
    7-day window AFTER it — joined by one bucketed outer-style fold,
    so no future information leaks into a feature.  Cutoff = day 20
    of the stream (static, so the twin is exact)."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(
        sf_dir, "events", ["user_id", "ts", "event_type", "value"]
    )

    # static calendar cutoff (stream spans 2024-01): features from
    # before 01-21, label window [01-21, 01-28)
    cut_us = 1_705_795_200_000_000      # 2024-01-21T00:00Z
    end_us = cut_us + 7 * 86_400_000_000

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].astype("int64")
        before = ts < cut_us
        in_label = (ts >= cut_us) & (ts < end_us)
        return pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "n_before": before.astype("int64"),
                "cents_before": np.where(
                    before,
                    np.round(
                        batch["value"].to_numpy(np.float64) * 100
                    ).astype(np.int64),
                    0,
                ),
                "label": (
                    in_label
                    & (batch["event_type"] == "purchase")
                ).astype("int64"),
            }
        )

    agg = pre_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["user_id"],
        {"n_before": ("n_before", "sum"),
         "cents_before": ("cents_before", "sum"),
         "label": ("label", "max")},
    ).to_pandas().sort_values("user_id").reset_index(drop=True)
    for c in ("user_id", "n_before", "cents_before", "label"):
        agg[c] = agg[c].astype("int64")
    return agg[agg["n_before"] > 0].reset_index(drop=True)


def q_budget_select(sf_dir: str) -> pd.DataFrame:
    """Token-budget curation: select the highest-quality documents
    until a 20k-word budget is exhausted (quality desc, doc_id asc;
    a doc is taken while the cumulative INCLUDING it fits).  The
    distributed shape: a (quality, token_sum) histogram cumsums on
    the driver (one row per distinct 4-dec quality), whole tie
    classes resolve with one vectorized filter, and ONLY the boundary
    tie class fetches its ids — never a global row-level sort pull.
    Hash-exact vs a cumulative-window twin."""
    from unfurl_ray.ops.relational import bucketed_aggregate
    from unfurl_ray.ops.textstats import quality_score_batch

    budget = 20_000
    ds = _parquet(sf_dir, "documents", ["doc_id", "text"])

    def score(batch: pd.DataFrame) -> pa.Table:
        q = quality_score_batch(batch)
        return pa.table(
            {
                "doc_id": pa.array(
                    batch["doc_id"].to_numpy(), pa.int64()
                ),
                "quality": pa.array(
                    q["quality"].to_numpy(), pa.float64()
                ),
                "n_words": pa.array(
                    q["n_words"].to_numpy(np.int64), pa.int64()
                ),
            }
        )

    scored = ds.map_batches(score, batch_format="pandas").materialize()
    hist = bucketed_aggregate(
        scored, ["quality"], {"tok": ("n_words", "sum")}
    ).to_pandas().sort_values(
        "quality", ascending=False
    ).reset_index(drop=True)
    tok = hist["tok"].astype("int64").to_numpy()
    cum_before = np.concatenate(([0], np.cumsum(tok)[:-1]))
    full = cum_before + tok <= budget
    # boundary = the first quality class that does not fully fit
    full_qs = set(hist.loc[full, "quality"])
    boundary_idx = int(full.argmin()) if not full.all() else None

    import pyarrow.compute as _pc

    def in_full(batch: pa.Table) -> pa.Table:
        mask = _pc.is_in(
            batch.column("quality"),
            value_set=pa.array(sorted(full_qs), pa.float64()),
        )
        return batch.filter(mask)

    sel = scored.map_batches(in_full, batch_format="pyarrow")
    parts = [sel.to_pandas()]
    if boundary_idx is not None:
        bq = float(hist["quality"].iloc[boundary_idx])
        remaining = budget - int(cum_before[boundary_idx])
        tie = scored.map_batches(
            lambda t: t.filter(
                _pc.equal(t.column("quality"), pa.scalar(bq))
            ),
            batch_format="pyarrow",
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        cum = tie["n_words"].astype("int64").cumsum()
        parts.append(tie[cum <= remaining])
    out = pd.concat(parts, ignore_index=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_words"] = out["n_words"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def q_mixture_weights(sf_dir: str) -> pd.DataFrame:
    """Temperature-scaled mixture weights per source (the data-mixing
    knob: w_i proportional to n_i^tau, tau=0.7, normalized) from one
    count shuffle.  Exact integer counts; the power/normalize closes
    on the tiny source table.  Hash-exact vs a pow() twin."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet(sf_dir, "documents", ["source"])
    counts = pre_aggregate(
        ds, ["source"], {"n": ("source", "count")}
    ).to_pandas().sort_values("source").reset_index(drop=True)
    n = counts["n"].astype("int64").to_numpy()
    raw = np.power(n.astype(np.float64), 0.7)
    counts["n"] = n
    counts["weight"] = np.round(raw / raw.sum(), 6)
    return counts


def q_anova(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA of order value across priorities: F-statistic
    and eta-squared from per-group sufficient stats (n, sum, sum of
    squares) — one pre-aggregated shuffle, formulas close on the
    5-row table with the explicit sum-of-squares forms the oracle
    conventions require."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    )

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy(np.float64)
        return pd.DataFrame(
            {
                "k": batch["o_orderpriority"],
                "v": v,
                "v2": v * v,
            }
        )

    agg = pre_aggregate(
        ds.map_batches(prep, batch_format="pandas"),
        ["k"],
        {"n": ("v", "count"), "s": ("v", "sum"), "ss": ("v2", "sum")},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    n = agg["n"].astype("int64").to_numpy(np.float64)
    s = agg["s"].to_numpy(np.float64)
    ss = agg["ss"].to_numpy(np.float64)
    N = n.sum()
    S = s.sum()
    k = len(agg)
    ss_between = float((s * s / n).sum()) - S * S / N
    ss_within = float(ss.sum()) - float((s * s / n).sum())
    f_stat = (ss_between / (k - 1)) / (ss_within / (N - k))
    eta2 = ss_between / (ss_between + ss_within)
    return pd.DataFrame(
        {
            "k_groups": np.array([k], dtype=np.int64),
            "n": np.array([int(N)], dtype=np.int64),
            "f_stat": [round(f_stat, 6)],
            "eta2": [round(eta2, 6)],
        }
    )


def q_kruskal(sf_dir: str) -> pd.DataFrame:
    """Kruskal-Wallis rank test of order value across priorities —
    q_anova's nonparametric sibling on the exact midrank machinery.
    ops.profile.kruskal_wallis: one (key, value, count) histogram
    shuffle; exact half-integer rank sums.  Hash-exact vs a window
    midrank twin."""
    from unfurl_ray.ops.profile import kruskal_wallis

    ds = _parquet_sh(
        sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
    )
    out = kruskal_wallis(ds, "o_orderpriority", "o_totalprice")
    out["h_stat"] = out["h_stat"].round(6)
    return out


def q_rank_overlap(sf_dir: str) -> pd.DataFrame:
    """Ranking-agreement eval: overlap@k between the spend ranking
    and the order-count ranking of customers (the top-k Jaccard-lite
    every reranker A/B uses).  Reuses q_rank_fusion's exact-cents
    global_row_number ranks; overlap counts fold vectorized.
    Hash-exact vs a row_number twin."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, bucketed_hash_join, global_row_number,
    )

    ds = _parquet_sh(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"],
                "cents": np.round(
                    batch["o_totalprice"].to_numpy() * 100
                ).astype("int64"),
            }
        )

    agg = bucketed_aggregate(
        ds.map_batches(tag, batch_format="pandas"),
        ["o_custkey"],
        {"spend": ("cents", "sum"), "n": ("cents", "count")},
    ).materialize()

    def neg(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.append_column(
            "neg_spend", _pc.negate(batch.column("spend"))
        ).append_column("neg_n", _pc.negate(batch.column("n")))

    keyed = agg.map_batches(neg, batch_format="pyarrow").materialize()
    r1 = global_row_number(
        keyed.select_columns(["o_custkey", "neg_spend"]),
        ["neg_spend", "o_custkey"], out_col="spend_rank",
    ).select_columns(["o_custkey", "spend_rank"])
    r2 = global_row_number(
        keyed.select_columns(["o_custkey", "neg_n"]),
        ["neg_n", "o_custkey"], out_col="count_rank",
    ).select_columns(["o_custkey", "count_rank"])
    both = bucketed_hash_join(
        r1, r2, on="o_custkey", right_on="o_custkey",
    )

    ks = [5, 10, 20, 50]

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["spend_rank"].to_numpy(np.int64)
        b = batch["count_rank"].to_numpy(np.int64)
        return pd.DataFrame(
            {f"k{k}": [int(((a <= k) & (b <= k)).sum())] for k in ks}
        )

    parts = both.map_batches(
        partial, batch_format="pandas"
    ).to_pandas()
    return pd.DataFrame(
        {
            "k": np.array(ks, dtype=np.int64),
            "overlap": np.array(
                [int(parts[f"k{k}"].sum()) for k in ks],
                dtype=np.int64,
            ),
            "overlap_frac": np.round(
                [int(parts[f"k{k}"].sum()) / k for k in ks], 6
            ),
        }
    )


def q_gap_stats(sf_dir: str) -> pd.DataFrame:
    """Per-user inter-event gap profile (n_gaps, median, p90 — the
    activity-cadence feature): one groupby(user).map_groups pass over
    the (ts, id)-sorted stream; exact int64 gaps and quantile_disc
    index semantics (ceil(q*n) - 1, probed against DuckDB across
    sizes — note 0.9*n float effects replicate because both sides do
    the same double multiply).  Hash-exact vs a lead-window +
    quantile_disc twin."""
    from unfurl_ray.ops.relational import _ts_us

    ds = _parquet_sh(sf_dir, "events", ["event_id", "ts", "user_id"])

    def fold(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["ts", "event_id"])
        ts = _ts_us(g["ts"]).to_numpy()
        if len(ts) < 2:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_gaps": pa.array([], pa.int64()),
                    "median_gap_us": pa.array([], pa.int64()),
                    "p90_gap_us": pa.array([], pa.int64()),
                }
            )
        dt = np.sort(ts[1:] - ts[:-1])
        n = len(dt)
        return pa.table(
            {
                "user_id": pa.array(
                    [int(g["user_id"].iloc[0])], pa.int64()
                ),
                "n_gaps": pa.array([n], pa.int64()),
                "median_gap_us": pa.array(
                    [int(dt[int(np.ceil(0.5 * n)) - 1])],
                    pa.int64(),
                ),
                "p90_gap_us": pa.array(
                    [int(dt[int(np.ceil(0.9 * n)) - 1])],
                    pa.int64(),
                ),
            }
        )

    out = ds.groupby("user_id").map_groups(
        fold, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("user_id").reset_index(drop=True)


def q_novelty_curve(sf_dir: str) -> pd.DataFrame:
    """Marginal-utility curve of the corpus: how many NEW distinct
    word trigrams each doc-id decile contributes (the submodular
    coverage curve behind 'is more of this source still worth
    ingesting').  One gram explode + a bucketed min(doc_id) fold per
    gram; the decile histogram closes tiny.  Hash-exact vs a
    min/ntile twin."""
    import re as _re

    from unfurl_ray.ops.relational import (
        bucketed_aggregate, pre_aggregate,
    )
    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws

    ds = _parquet(sf_dir, "documents", ["doc_id", "text"]).materialize()
    n_docs = ds.count()

    def grams(batch: pa.Table) -> pa.Table:
        out_id, out_g = [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            ws = [w for w in _ws.split((text or "").lower()) if w]
            seen = set(
                " ".join(ws[i: i + 3]) for i in range(len(ws) - 2)
            )
            out_id.extend([doc_id] * len(seen))
            out_g.extend(seen)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "gram": pa.array(out_g, pa.string()),
            }
        )

    first = bucketed_aggregate(
        ds.map_batches(grams, batch_format="pyarrow"),
        ["gram"], {"first_doc": ("doc_id", "min")},
    )

    def decile(batch: pd.DataFrame) -> pd.DataFrame:
        d = (
            batch["first_doc"].to_numpy(np.int64) * 10 // n_docs
        )
        return pd.DataFrame({"decile": d.astype(np.int64)})

    hist = pre_aggregate(
        first.map_batches(decile, batch_format="pandas"),
        ["decile"], {"new_grams": ("decile", "count")},
    ).to_pandas().sort_values("decile").reset_index(drop=True)
    hist["decile"] = hist["decile"].astype("int64")
    hist["new_grams"] = hist["new_grams"].astype("int64")
    hist["cum_grams"] = hist["new_grams"].cumsum().astype("int64")
    return hist


def q3_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: segment-filtered customers x date-filtered
    orders x ship-date-filtered lineitem -> top-10 open orders by
    revenue.  Both joins are bucket-co-partitioned hash joins over
    PRE-FILTERED sides (the filters run inside the pruned read's
    map stage, so only surviving keys enter either shuffle); the
    top-10 closes with per-batch partial top-k — the aggregated
    per-order table is never globally sorted."""
    from unfurl_ray.ops.relational import (
        bucketed_hash_join, pre_aggregate,
    )

    cut = np.datetime64("1998-01-01", "us")

    cust = _parquet_sh(
        sf_dir, "customer", ["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda b: b.filter(
            pc.equal(b.column("c_mktsegment"), "BUILDING")
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cut)),
        batch_format="pyarrow",
    )
    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "part_rev": pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(
                        pa.scalar(1.0), b.column("l_discount")
                    ),
                ),
            }
        ).filter(pc.greater(b.column("l_shipdate"), cut)),
        batch_format="pyarrow",
    )

    open_orders = bucketed_hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
    )
    joined = bucketed_hash_join(
        li, open_orders.select_columns(["o_orderkey", "o_orderdate"]),
        on="l_orderkey", right_on="o_orderkey",
    )
    per_order = pre_aggregate(
        joined, ["l_orderkey", "o_orderdate"],
        {"revenue": ("part_rev", "sum")},
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        # Arrow sort+take keeps the typed schema on EMPTY buckets
        # (an empty pandas block is schema-less and trips the
        # executor's schema-unification warning)
        idx = pc.sort_indices(
            batch,
            sort_keys=[("revenue", "descending"),
                       ("l_orderkey", "ascending")],
        )
        return batch.take(idx[:10])

    top = (
        per_order.map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["revenue", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    top = top.rename(columns={"l_orderkey": "o_orderkey"})
    top["revenue"] = top["revenue"].round(2)
    top["o_orderkey"] = top["o_orderkey"].astype("int64")
    return top[["o_orderkey", "o_orderdate", "revenue"]]


def q5_region_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5 shape: local-supplier revenue per nation for one
    region-year.  nation x region collapse into a constant-size
    broadcast map; supplier collapses to a broadcast (sorted suppkey
    array -> nationkey array) searchsorted lookup — at SF-100TB
    supplier is ~10M rows, two int64 numpy arrays (~160 MB object
    store, shipped ONCE via ray.put), far below a shuffle of the
    lineitem side; customer and orders co-shuffle with lineitem in
    two bucketed hash joins.  The c_nationkey == s_nationkey "local
    supplier" predicate closes vectorized inside the second join's
    output batches."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_hash_join, pre_aggregate,
    )

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    nation = _parquet(sf_dir, "nation").to_pandas()
    region = _parquet(sf_dir, "region").to_pandas()
    asia = nation.merge(
        region[region["r_name"] == "ASIA"],
        left_on="n_regionkey", right_on="r_regionkey",
    )
    nat_name = dict(
        zip(asia["n_nationkey"].astype(int), asia["n_name"])
    )

    sup = _parquet(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).to_pandas().sort_values("s_suppkey")
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
        )
    )

    cust = _parquet_sh(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b, keep=frozenset(nat_name): b.filter(
            pa.array(
                np.isin(
                    b.column("c_nationkey")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64),
                    np.fromiter(keep, np.int64),
                )
            )
        ),
        batch_format="pyarrow",
    )
    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "part_rev": pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(
                        pa.scalar(1.0), b.column("l_discount")
                    ),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    ord_cust = bucketed_hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
    )
    joined = bucketed_hash_join(
        li,
        ord_cust.select_columns(["o_orderkey", "c_nationkey"]),
        on="l_orderkey", right_on="o_orderkey",
    )

    def local_only(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nats = _broadcast_fetch(sup_ref)
        idx = np.searchsorted(
            keys, batch["l_suppkey"].to_numpy(np.int64)
        )
        idx = np.clip(idx, 0, len(keys) - 1)
        s_nat = nats[idx]
        hit = (
            keys[idx] == batch["l_suppkey"].to_numpy(np.int64)
        ) & (s_nat == batch["c_nationkey"].to_numpy(np.int64))
        out = batch.loc[hit, ["part_rev"]].copy()
        out["n_nationkey"] = batch.loc[hit, "c_nationkey"].to_numpy(
            np.int64
        )
        return out

    per_nat = pre_aggregate(
        joined.map_batches(local_only, batch_format="pandas"),
        ["n_nationkey"], {"revenue": ("part_rev", "sum")},
    ).to_pandas()
    per_nat["n_name"] = per_nat["n_nationkey"].map(
        lambda k: nat_name[int(k)]
    )
    per_nat["revenue"] = per_nat["revenue"].round(2)
    return (
        per_nat[["n_name", "revenue"]]
        .sort_values("revenue", ascending=False)
        .reset_index(drop=True)
    )


def q10_returned_items(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer for one
    quarter, top 20.  The lineitem side pre-aggregates to one row
    per orderkey BEFORE the join (the returned-revenue combiner), so
    the orders join moves |matching orders| rows, not |lineitems|;
    the per-customer rollup then joins customer attributes
    bucket-co-partitioned and nation broadcast-maps in the final
    small frame."""
    from unfurl_ray.ops.relational import (
        bucketed_hash_join, pre_aggregate,
    )

    lo = np.datetime64("1997-10-01", "us")
    hi = np.datetime64("1998-01-01", "us")

    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "part_rev": pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(
                        pa.scalar(1.0), b.column("l_discount")
                    ),
                ),
            }
        ).filter(pc.equal(b.column("l_returnflag"), "R")),
        batch_format="pyarrow",
    )
    per_order = pre_aggregate(
        li, ["l_orderkey"], {"rev": ("part_rev", "sum")},
    )
    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    rev_orders = bucketed_hash_join(
        per_order, orders, on="l_orderkey", right_on="o_orderkey",
    )
    per_cust = pre_aggregate(
        rev_orders, ["o_custkey"], {"revenue": ("rev", "sum")},
    )
    cust = _parquet_sh(
        sf_dir, "customer",
        ["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    enriched = bucketed_hash_join(
        per_cust, cust, on="o_custkey", right_on="c_custkey",
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        # Arrow sort+take: typed schema survives empty join buckets
        idx = pc.sort_indices(
            batch,
            sort_keys=[("revenue", "descending"),
                       ("o_custkey", "ascending")],
        )
        return batch.take(idx[:20])

    top = (
        enriched.map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["revenue", "o_custkey"], ascending=[False, True])
        .head(20)
        .reset_index(drop=True)
    )
    nation = _parquet(sf_dir, "nation").to_pandas()
    names = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    top["n_name"] = top["c_nationkey"].map(lambda k: names[int(k)])
    top = top.rename(columns={"o_custkey": "c_custkey"})
    top["revenue"] = top["revenue"].round(2)
    top["c_custkey"] = top["c_custkey"].astype("int64")
    top["c_acctbal"] = top["c_acctbal"].round(2)
    return top[
        ["c_custkey", "c_name", "c_acctbal", "n_name", "revenue"]
    ]


def q_cohort_retention(sf_dir: str) -> pd.DataFrame:
    """Weekly cohort-retention matrix: cohort = the epoch-week of a
    user's FIRST event; cell (cohort_week, week_offset) counts users
    from that cohort active offset weeks later.  Two pre-aggregated
    shuffles — (user) -> first week and (user, week) -> distinct
    active weeks — then one bucketed hash join keyed on user and a
    tiny (cohort, offset) histogram close.  Nothing ever groups a
    user's raw events; both shuffle inputs are per-batch combined
    first, so the exchange moves ~|users| rows, not |events|."""
    from unfurl_ray.ops.relational import (
        bucketed_hash_join, pre_aggregate,
    )

    WEEK_US = 7 * 86_400 * 1_000_000

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])

    def to_weeks(batch: pa.Table) -> pa.Table:
        wk = pc.divide(
            pc.cast(batch.column("ts"), pa.int64()),
            pa.scalar(WEEK_US, pa.int64()),
        )
        return pa.table(
            {"user_id": batch.column("user_id"), "week": wk}
        )

    weeks = ds.map_batches(to_weeks, batch_format="pyarrow")
    firsts = pre_aggregate(
        weeks, ["user_id"], {"cohort_week": ("week", "min")},
    )
    actives = pre_aggregate(
        weeks, ["user_id", "week"], {"n": ("week", "count")},
    ).select_columns(["user_id", "week"])

    joined = bucketed_hash_join(
        actives, firsts, on="user_id", right_on="user_id",
    )

    def offset(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch.column("cohort_week"),
                "week_offset": pc.subtract(
                    batch.column("week"), batch.column("cohort_week")
                ),
            }
        )

    out = pre_aggregate(
        joined.map_batches(offset, batch_format="pyarrow"),
        ["cohort_week", "week_offset"],
        {"n_users": ("cohort_week", "count")},
    ).to_pandas()
    out["n_users"] = out["n_users"].astype("int64")
    for c in ("cohort_week", "week_offset"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["cohort_week", "week_offset"]
    ).reset_index(drop=True)


def q_rfm(sf_dir: str) -> pd.DataFrame:
    """RFM segmentation: per-user Recency (last-event epoch-us),
    Frequency (event count) and Monetary (EXACT integer cents — the
    per-event round happens before the sum so both engines add the
    same integers in any order), each cut into quartiles with the
    distributed exact-NTILE decomposition (``ntile_by``: tiny
    (order-value) histogram + per-tie-class position, never one
    quartile's users on one worker), then the 4x4x4 segment census.
    Three ntile passes shuffle the |users|-sized rollup, not raw
    events."""
    from unfurl_ray.ops.relational import ntile_by, pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(
                pc.multiply(batch.column("value"), pa.scalar(100.0))
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "ts_us": pc.cast(batch.column("ts"), pa.int64()),
                "cents": cents,
            }
        )

    per_user = pre_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"],
        {
            "recency_us": ("ts_us", "max"),
            "frequency": ("ts_us", "count"),
            "monetary_cents": ("cents", "sum"),
        },
    ).map_batches(
        lambda b: b.append_column("_all", pa.array([0] * len(b), pa.int8())),
        batch_format="pyarrow",
    )

    r = ntile_by(per_user, "_all", "recency_us", "user_id", 4)
    rf = ntile_by(
        r.drop_columns(["recency_us"]).rename_columns(
            {"bucket": "r_q"}
        ),
        "_all", "frequency", "user_id", 4,
    )
    rfm = ntile_by(
        rf.drop_columns(["frequency"]).rename_columns(
            {"bucket": "f_q"}
        ),
        "_all", "monetary_cents", "user_id", 4,
    ).rename_columns({"bucket": "m_q"})

    out = pre_aggregate(
        rfm, ["r_q", "f_q", "m_q"], {"n_users": ("r_q", "count")},
    ).to_pandas()
    for c in ("r_q", "f_q", "m_q", "n_users"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["r_q", "f_q", "m_q"]).reset_index(drop=True)


def q_types_to_date(sf_dir: str) -> pd.DataFrame:
    """Per-user cumulative distinct event-type count by day — the
    "feature adoption to date" curve.  Distinct collapse first
    ((user, type) -> first day, a pre-aggregated shuffle), then a
    per-(user, day) new-type histogram, then the running sum closes
    in per-user groups BOUNDED BY THE TYPE CARDINALITY (<= 5 rows per
    user regardless of event volume — the group is over first-days,
    never events, so no bot-user skew exists by construction)."""
    from unfurl_ray.ops.relational import bucketed_aggregate, pre_aggregate

    DAY_US = 86_400 * 1_000_000

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type", "ts"])

    def to_days(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "day": pc.divide(
                    pc.cast(batch.column("ts"), pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
            }
        )

    firsts = bucketed_aggregate(
        ds.map_batches(to_days, batch_format="pyarrow"),
        ["user_id", "event_type"], {"first_day": ("day", "min")},
    )
    per_day = pre_aggregate(
        firsts, ["user_id", "first_day"],
        {"n_new": ("first_day", "count")},
    )

    def cum(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("first_day").reset_index(drop=True)
        g["types_to_date"] = g["n_new"].cumsum().astype("int64")
        return pa.table(
            {
                "user_id": pa.array(
                    g["user_id"].astype("int64"), pa.int64()
                ),
                "day": pa.array(
                    g["first_day"].astype("int64"), pa.int64()
                ),
                "types_to_date": pa.array(
                    g["types_to_date"], pa.int64()
                ),
            }
        )

    out = per_day.groupby("user_id").map_groups(
        cum, batch_format="pandas"
    ).to_pandas()
    return out.sort_values(["user_id", "day"]).reset_index(drop=True)


def q_systematic_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic systematic sampling: every 997th event in the
    global (ts, event_id) order — the classic fixed-interval audit
    sample.  Rides ``global_row_number`` (one range-partitioning
    sort + an O(#blocks) offset table looked up by block head key),
    then a vectorized modulo filter; no driver-side iteration."""
    from unfurl_ray.ops.relational import global_row_number

    ds = _parquet_sh(sf_dir, "events", ["event_id", "ts", "user_id"])
    numbered = global_row_number(
        ds, ["ts", "event_id"], out_col="rn"
    )

    def pick(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        mask = pa.array(rn % 997 == 0)
        return batch.filter(mask).select(["rn", "event_id", "user_id"])

    out = numbered.map_batches(
        pick, batch_format="pyarrow"
    ).to_pandas()
    return out.sort_values("rn").reset_index(drop=True)


def q_dense_rank(sf_dir: str) -> pd.DataFrame:
    """DENSE_RANK of lineitem quantity within (returnflag,
    linestatus) — rank over HEAVILY DUPLICATED values, which is
    where dense-rank differs from rank.  Collapses to the distinct
    (flag, status, quantity) histogram in one pre-aggregated
    shuffle (bounded by the value domain — ~50 quantities x 6
    partitions at ANY scale factor), so the ranking itself is a
    driver-side vectorized cumcount over a few hundred rows."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity"],
    )
    hist = pre_aggregate(
        ds, ["l_returnflag", "l_linestatus", "l_quantity"],
        {"n": ("l_quantity", "count")},
    ).to_pandas().sort_values(
        ["l_returnflag", "l_linestatus", "l_quantity"]
    ).reset_index(drop=True)
    hist["rnk"] = (
        hist.groupby(["l_returnflag", "l_linestatus"]).cumcount() + 1
    ).astype("int64")
    hist["n"] = hist["n"].astype("int64")
    return hist


def q_mannwhitney(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney U between click and purchase event values
    (ops.profile.mann_whitney): one (group, value, count) histogram
    shuffle; midranks, U and the tie-corrected z close on the
    driver's distinct-value table.  Hash-exact vs a windowed
    midrank SQL twin."""
    from unfurl_ray.ops.profile import mann_whitney

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])
    return mann_whitney(
        ds, "event_type", "value", group_a="click", group_b="purchase"
    )


def q_zipf_slope(sf_dir: str) -> pd.DataFrame:
    """Zipf's-law exponent of the corpus: OLS slope of ln(freq) on
    ln(rank) over the top-1000 unigrams (shared whitespace token
    contract).  Per-batch partial word counts -> one word groupby ->
    per-batch partial top-k -> 1000-row driver close; the corpus
    text never moves twice."""
    import re as _re
    from collections import Counter

    from ray.data.aggregate import Sum

    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws

    K = 1000
    ds = _parquet(sf_dir, "documents", ["text"])

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for text in batch.column("text").to_pylist():
            counts.update(
                w for w in _ws.split((text or "").lower()) if w
            )
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    word_counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("n", "descending"), ("word", "ascending")],
        )
        return batch.take(idx[:K])

    top = (
        word_counts.map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "word"], ascending=[False, True])
        .head(K)
        .reset_index(drop=True)
    )
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log(top["n"].to_numpy(np.float64))
    xm, ym = x.mean(), y.mean()
    slope = float(((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum())
    return pd.DataFrame(
        {
            "n_words": np.array([len(top)], dtype=np.int64),
            "zipf_slope": np.array([round(slope, 6)], np.float64),
        }
    )


def q_hhi(sf_dir: str) -> pd.DataFrame:
    """Herfindahl-Hirschman revenue-concentration index per nation:
    per-customer revenue in EXACT integer cents (order-invariant
    sums), one bucketed hash join to pick up the nation key, then a
    per-nation (sum, sum-of-squares) fold — shares never
    materialize per customer, the ratio closes on the #nations-row
    table."""
    from unfurl_ray.ops.relational import (
        bucketed_hash_join, pre_aggregate,
    )

    orders = _parquet_sh(
        sf_dir, "orders", ["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_custkey": b.column("o_custkey"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            b.column("o_totalprice"),
                            pa.scalar(100.0),
                        )
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    per_cust = pre_aggregate(
        orders, ["o_custkey"], {"rev_cents": ("cents", "sum")},
    )
    cust = _parquet_sh(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = bucketed_hash_join(
        per_cust, cust, on="o_custkey", right_on="c_custkey",
    )

    def sq(batch: pa.Table) -> pa.Table:
        r = batch.column("rev_cents").to_numpy(zero_copy_only=False)
        r = r.astype(np.float64)
        return pa.table(
            {
                "c_nationkey": pc.cast(
                    batch.column("c_nationkey"), pa.int64()
                ),
                "rev_cents": batch.column("rev_cents"),
                "rev_sq": pa.array(r * r, pa.float64()),
            }
        )

    per_nat = pre_aggregate(
        joined.map_batches(sq, batch_format="pyarrow"),
        ["c_nationkey"],
        {
            "n_custs": ("rev_cents", "count"),
            "s": ("rev_cents", "sum"),
            "ssq": ("rev_sq", "sum"),
        },
    ).to_pandas()
    nation = _parquet(sf_dir, "nation").to_pandas()
    names = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    per_nat["n_name"] = per_nat["c_nationkey"].map(
        lambda k: names[int(k)]
    )
    per_nat["hhi"] = (
        per_nat["ssq"]
        / (per_nat["s"].astype(np.float64) ** 2)
    ).round(6)
    per_nat["n_custs"] = per_nat["n_custs"].astype("int64")
    return (
        per_nat[["n_name", "n_custs", "hhi"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def q_ndcg(sf_dir: str) -> pd.DataFrame:
    """Per-user NDCG@10 of the value-ranked event feed against
    type-graded relevance (purchase 3 / signup 2 / click 1) — the
    ranking-quality eval.  ``topk_per_group`` prunes to <=10 rows
    per user per batch BEFORE anything global (the retrieved set),
    and both DCG and the ideal DCG are vectorized cumcounts over
    that output-sized frame; users with an all-zero-relevance
    top-10 are excluded (NDCG undefined)."""
    from unfurl_ray.ops.relational import topk_per_group

    REL = {"purchase": 3, "signup": 2, "click": 1}

    ds = _parquet_sh(
        sf_dir, "events", ["user_id", "event_id", "event_type", "value"]
    )
    top = topk_per_group(
        ds, "user_id", "value", 10, tiebreak_col="event_id"
    )
    top = top.sort_values(
        ["user_id", "value", "event_id"],
        ascending=[True, False, True],
    ).reset_index(drop=True)
    top["pos"] = top.groupby("user_id").cumcount() + 1
    top["rel"] = (
        top["event_type"].map(REL).fillna(0).astype(np.int64)
    )
    top["dcg_t"] = top["rel"] / np.log2(top["pos"] + 1.0)
    ideal = top.sort_values(
        ["user_id", "rel"], ascending=[True, False], kind="mergesort"
    ).copy()
    ideal["ipos"] = ideal.groupby("user_id").cumcount() + 1
    ideal["idcg_t"] = ideal["rel"] / np.log2(ideal["ipos"] + 1.0)
    dcg = top.groupby("user_id")["dcg_t"].sum()
    idcg = ideal.groupby("user_id")["idcg_t"].sum()
    out = pd.DataFrame(
        {"user_id": dcg.index.to_numpy(np.int64),
         "ndcg": (dcg / idcg).round(6).to_numpy()}
    )
    out = out[idcg.to_numpy() > 0].reset_index(drop=True)
    return out.sort_values("user_id").reset_index(drop=True)


def q_embed_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension mean / population-std of the embedding column —
    the embedding-health profile (dead dims, scale drift).  Map-only:
    each batch stacks its vectors into one 2-D float64 array and
    folds (count, sum, sum-of-squares) per dimension; the shuffle
    moves #dims-row partials, never a vector."""
    ds = _parquet(sf_dir, "embeddings", ["embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        arr = np.stack(
            batch.column("embedding").to_numpy(zero_copy_only=False)
        ).astype(np.float64)
        dims = np.arange(1, arr.shape[1] + 1, dtype=np.int64)
        return pa.table(
            {
                "dim": pa.array(dims, pa.int64()),
                "n": pa.array(
                    np.full(arr.shape[1], arr.shape[0], np.int64),
                    pa.int64(),
                ),
                "s": pa.array(arr.sum(axis=0), pa.float64()),
                "ss": pa.array((arr * arr).sum(axis=0), pa.float64()),
            }
        )

    from unfurl_ray.ops.relational import pre_aggregate

    folded = pre_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["dim"],
        {"n": ("n", "sum"), "s": ("s", "sum"), "ss": ("ss", "sum")},
    ).to_pandas()
    n = folded["n"].to_numpy(np.float64)
    s = folded["s"].to_numpy(np.float64)
    ss = folded["ss"].to_numpy(np.float64)
    folded["mean_v"] = np.round(s / n, 6)
    folded["std_v"] = np.round(np.sqrt(ss / n - (s / n) ** 2), 6)
    folded["dim"] = folded["dim"].astype("int64")
    return (
        folded[["dim", "mean_v", "std_v"]]
        .sort_values("dim")
        .reset_index(drop=True)
    )


def q_iqr_outliers(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier census per event type: exact q1/q3 via the
    per-key DISCRETE-quantile histogram pick
    (``hist_quantile_disc_by`` — bounded by distinct values, one
    key's rows never co-locate), fences broadcast back, outliers
    counted in one vectorized pass.  Values are pre-rounded to cents
    so the histogram and the SQL twin quantize identically."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, hist_quantile_disc_by, pre_aggregate,
    )

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            batch.column("value"), pa.scalar(100.0)
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    cents = ds.map_batches(to_cents, batch_format="pyarrow")
    hist = pre_aggregate(
        cents, ["event_type", "cents"], {"c": ("cents", "count")},
    )
    qs = hist_quantile_disc_by(
        hist, "event_type", "cents", "c", [0.25, 0.75]
    ).to_pandas()
    qs["iqr"] = qs["q_075"] - qs["q_025"]
    fences = {
        row["event_type"]: (
            row["q_025"] - 1.5 * row["iqr"],
            row["q_075"] + 1.5 * row["iqr"],
        )
        for _, row in qs.iterrows()
    }
    f_ref = ray.put(fences)

    def count_out(batch: pd.DataFrame) -> pa.Table:
        fen = _broadcast_fetch(f_ref)
        lo = batch["event_type"].map(lambda t: fen[t][0]).to_numpy()
        hi = batch["event_type"].map(lambda t: fen[t][1]).to_numpy()
        v = batch["cents"].to_numpy(np.float64)
        out = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "is_out": ((v < lo) | (v > hi)).astype(np.int64),
            }
        )
        return pa.Table.from_pandas(
            out, preserve_index=False
        ).replace_schema_metadata(None)

    counts = pre_aggregate(
        cents.map_batches(count_out, batch_format="pandas"),
        ["event_type"],
        {"n": ("is_out", "count"), "n_outliers": ("is_out", "sum")},
    ).to_pandas()
    out = counts.merge(
        qs[["event_type", "q_025", "q_075"]], on="event_type"
    )
    for c in ("n", "n_outliers", "q_025", "q_075"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def q_lorenz(sf_dir: str) -> pd.DataFrame:
    """Lorenz curve of user spend in 10 exact-NTILE deciles:
    per-user revenue in exact integer cents, ``ntile_by`` decile
    assignment (distributed exact NTILE), then cumulative share per
    decile — the distributional-inequality profile behind the gini
    op, kept as explicit curve points."""
    from unfurl_ray.ops.relational import ntile_by, pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["user_id", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            batch.column("value"), pa.scalar(100.0)
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    per_user = pre_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["user_id"], {"spend": ("cents", "sum")},
    ).map_batches(
        lambda b: b.append_column(
            "_all", pa.array([0] * len(b), pa.int8())
        ),
        batch_format="pyarrow",
    )
    tiled = ntile_by(per_user, "_all", "spend", "user_id", 10)
    dec = pre_aggregate(
        tiled, ["bucket"],
        {"n_users": ("spend", "count"), "spend": ("spend", "sum")},
    ).to_pandas().sort_values("bucket").reset_index(drop=True)
    total = float(dec["spend"].sum())
    dec["cum_share"] = (
        dec["spend"].cumsum().astype(np.float64) / total
    ).round(6)
    dec = dec.rename(columns={"bucket": "decile"})
    for c in ("decile", "n_users", "spend"):
        dec[c] = dec[c].astype("int64")
    return dec[["decile", "n_users", "spend", "cum_share"]]


def q_clustering_coeff(sf_dir: str) -> pd.DataFrame:
    """Per-node local clustering coefficient of the cosine>=0.3
    embedding similarity graph (ops.graph.local_clustering): the
    triangle_count wedge machinery with per-corner credit.
    Hash-exact vs the 3-way self-join twin grouped per corner."""
    from unfurl_ray.ops.graph import local_clustering
    from unfurl_ray.ops.similarity import cosine_pair_dedup

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = cosine_pair_dedup(ds, threshold=0.3)

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": batch.column("vec_a").cast(pa.int64()),
                "b": batch.column("vec_b").cast(pa.int64()),
            }
        )

    edges = pairs.map_batches(rename, batch_format="pyarrow")
    return local_clustering(edges)


def q_dup_rate_by_source(sf_dir: str) -> pd.DataFrame:
    """Per-source exact-duplication diagnostics — the corpus-health
    dashboard row: docs, distinct contents (md5 identity, shared
    with exact_dedup), and dup rate.  The shuffle carries only
    (source, content_hash) distinct partials (payload dropped before
    the exchange); the per-source census is a second tiny
    pre-aggregated fold."""
    from unfurl_ray.ops.dedup import add_content_hash
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, pre_aggregate,
    )

    ds = _parquet(sf_dir, "documents", ["doc_id", "text", "source"])
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, "text").select(
            ["source", "content_hash"]
        ),
        batch_format="pyarrow",
    )
    distinct = bucketed_aggregate(
        hashed, ["source", "content_hash"],
        {"n_copies": ("content_hash", "count")},
    )
    per_source = pre_aggregate(
        distinct, ["source"],
        {
            "n_distinct": ("n_copies", "count"),
            "n_docs": ("n_copies", "sum"),
        },
    ).to_pandas()
    per_source["dup_rate"] = (
        1.0 - per_source["n_distinct"] / per_source["n_docs"]
    ).round(6)
    for c in ("n_distinct", "n_docs"):
        per_source[c] = per_source[c].astype("int64")
    return (
        per_source[["source", "n_docs", "n_distinct", "dup_rate"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def q_cross_source_overlap(sf_dir: str) -> pd.DataFrame:
    """Cross-source contamination census: for each distinct content
    (md5 identity) count how many DISTINCT sources carry it, then
    histogram contents by source spread — 'how much of the corpus is
    syndicated copy'.  Two bounded shuffles: (hash, source) distinct
    collapse, then a per-hash source count; the final histogram is a
    #spread-values-row close."""
    from unfurl_ray.ops.dedup import add_content_hash
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, pre_aggregate,
    )

    ds = _parquet(sf_dir, "documents", ["text", "source"])
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, "text").select(
            ["source", "content_hash"]
        ),
        batch_format="pyarrow",
    )
    pair = bucketed_aggregate(
        hashed, ["content_hash", "source"],
        {"n": ("source", "count")},
    )
    spread = bucketed_aggregate(
        pair, ["content_hash"], {"n_sources": ("source", "count")},
    )
    out = pre_aggregate(
        spread, ["n_sources"], {"n_contents": ("n_sources", "count")},
    ).to_pandas()
    for c in ("n_sources", "n_contents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("n_sources").reset_index(drop=True)


def q_filter_funnel(sf_dir: str) -> pd.DataFrame:
    """Quality-filter funnel census (the Gopher-rule shape): per rule
    the number of failing docs, plus the survivor count after ALL
    rules — one vectorized map pass (Arrow kernels, shared
    whitespace token contract) folding four counters; no shuffle at
    all, the census closes on a 5-row frame."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet(sf_dir, "documents", ["text", "n_chars"])

    def census(batch: pa.Table) -> pa.Table:
        text = pc.coalesce(batch.column("text"), pa.scalar(""))
        low = pc.utf8_lower(text)
        n_tok = pc.count_substring_regex(
            low, r"[^ \t\n\f\r]+"
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        n_chars = (
            batch.column("n_chars")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        avg_len = np.where(n_tok > 0, n_chars / n_tok, 0.0)
        too_short = n_tok < 30
        too_long = n_chars > 350
        odd_words = (avg_len < 3.0) | (avg_len > 8.0)
        survives = ~(too_short | too_long | odd_words)
        return pa.table(
            {
                "rule": pa.array(
                    ["too_short", "too_long", "odd_words",
                     "survivors"],
                    pa.string(),
                ),
                "n": pa.array(
                    [
                        int(too_short.sum()),
                        int(too_long.sum()),
                        int(odd_words.sum()),
                        int(survives.sum()),
                    ],
                    pa.int64(),
                ),
            }
        )

    out = pre_aggregate(
        ds.map_batches(census, batch_format="pyarrow"),
        ["rule"], {"n": ("n", "sum")},
    ).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("rule").reset_index(drop=True)


def q_source_diversity(sf_dir: str) -> pd.DataFrame:
    """Lexical-diversity profile per source: distinct word bigrams /
    total bigrams (type-token ratio at the bigram level — the
    template-spam signal).  In-batch bigram fan-out with a per-batch
    (source, bigram) partial collapse, one bucketed distinct
    shuffle, then a per-source 2-counter fold."""
    from collections import Counter

    from unfurl_ray.ops.relational import (
        bucketed_aggregate, pre_aggregate,
    )
    from unfurl_ray.ops.textstats import _WS_SPLIT_RE as _ws

    ds = _parquet(sf_dir, "documents", ["text", "source"])

    def grams(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for src, text in zip(
            batch.column("source").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            ws = [w for w in _ws.split((text or "").lower()) if w]
            for i in range(len(ws) - 1):
                counts[(src, ws[i] + " " + ws[i + 1])] += 1
        keys = list(counts.keys())
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], pa.string()),
                "bigram": pa.array([k[1] for k in keys], pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    per_gram = bucketed_aggregate(
        ds.map_batches(grams, batch_format="pyarrow"),
        ["source", "bigram"], {"n": ("n", "sum")},
    )
    out = pre_aggregate(
        per_gram, ["source"],
        {"n_distinct": ("n", "count"), "n_total": ("n", "sum")},
    ).to_pandas()
    out["diversity"] = (
        out["n_distinct"] / out["n_total"]
    ).round(6)
    for c in ("n_distinct", "n_total"):
        out[c] = out[c].astype("int64")
    return out.sort_values("source").reset_index(drop=True)


def q_wow_change(sf_dir: str) -> pd.DataFrame:
    """Week-over-week revenue change per event type: one
    pre-aggregated (type, week) shuffle in exact integer cents —
    the fold output is bounded by #types x #weeks, so the lag and
    pct-change close vectorized on that small frame (no per-key
    ordered stream ever forms)."""
    from unfurl_ray.ops.relational import pre_aggregate

    WEEK_US = 7 * 86_400 * 1_000_000

    ds = _parquet_sh(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "week": pc.divide(
                    pc.cast(batch.column("ts"), pa.int64()),
                    pa.scalar(WEEK_US, pa.int64()),
                ),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            batch.column("value"), pa.scalar(100.0)
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    weekly = pre_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type", "week"], {"rev_cents": ("cents", "sum")},
    ).to_pandas().sort_values(["event_type", "week"]).reset_index(
        drop=True
    )
    prev = weekly.groupby("event_type")["rev_cents"].shift(1)
    keep = prev.notna() & (
        weekly.groupby("event_type")["week"].shift(1)
        == weekly["week"] - 1
    )
    out = weekly[keep].copy()
    out["wow_pct"] = (
        (out["rev_cents"] - prev[keep]) / prev[keep]
    ).round(6)
    for c in ("week", "rev_cents"):
        out[c] = out[c].astype("int64")
    return out.reset_index(drop=True)


def q_gap_islands(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands WITHOUT an ordered per-key scan: activity
    islands per user (maximal runs of consecutive active days)
    counted as ``n_days - n_consecutive_pairs``.  The distinct
    (user, day) table unions with its own day+1 shift, one
    pre-aggregated (user, day) fold classifies each slot ({cur},
    {shifted}, or both — a consecutive pair), and a per-user
    2-counter fold closes.  Pure shuffle algebra: works unchanged
    when one bot user has a billion events."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, pre_aggregate,
    )

    DAY_US = 86_400 * 1_000_000

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])

    def to_days(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "day": pc.divide(
                    pc.cast(batch.column("ts"), pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
            }
        )

    days = bucketed_aggregate(
        ds.map_batches(to_days, batch_format="pyarrow"),
        ["user_id", "day"], {"n": ("day", "count")},
    ).select_columns(["user_id", "day"])

    def tag(shift: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": batch.column("user_id"),
                    "day": pc.add(
                        batch.column("day"),
                        pa.scalar(shift, pa.int64()),
                    ),
                    "t": pa.array(
                        np.full(len(batch), shift, np.int64),
                        pa.int64(),
                    ),
                }
            )

        return f

    unioned = days.map_batches(
        tag(0), batch_format="pyarrow"
    ).union(days.map_batches(tag(1), batch_format="pyarrow"))
    slots = pre_aggregate(
        unioned, ["user_id", "day"],
        {"n_tags": ("t", "count"), "t_sum": ("t", "sum")},
    )

    def classify(batch: pa.Table) -> pa.Table:
        n = batch.column("n_tags").to_numpy(zero_copy_only=False)
        s = batch.column("t_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "is_day": pa.array(
                    (s < n).astype(np.int64), pa.int64()
                ),
                "is_pair": pa.array(
                    (n == 2).astype(np.int64), pa.int64()
                ),
            }
        )

    out = pre_aggregate(
        slots.map_batches(classify, batch_format="pyarrow"),
        ["user_id"],
        {"n_days": ("is_day", "sum"), "n_pairs": ("is_pair", "sum")},
    ).to_pandas()
    out["n_islands"] = (out["n_days"] - out["n_pairs"]).astype("int64")
    out["n_days"] = out["n_days"].astype("int64")
    return (
        out[["user_id", "n_days", "n_islands"]]
        .sort_values("user_id")
        .reset_index(drop=True)
    )


def q_peak_hour(sf_dir: str) -> pd.DataFrame:
    """Peak activity hour per event type — argmax over the
    (type, hour-of-day) histogram (bounded at #types x 24 at any
    scale), ties to the earliest hour."""
    from unfurl_ray.ops.relational import pre_aggregate

    HOUR_US = 3600 * 1_000_000

    ds = _parquet_sh(sf_dir, "events", ["event_type", "ts"])

    def to_hours(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "event_type": batch.column("event_type"),
                "hour": pa.array(
                    (us // HOUR_US) % 24, pa.int64()
                ),
            }
        )

    hist = pre_aggregate(
        ds.map_batches(to_hours, batch_format="pyarrow"),
        ["event_type", "hour"], {"n": ("hour", "count")},
    ).to_pandas().sort_values(
        ["event_type", "n", "hour"], ascending=[True, False, True]
    )
    out = hist.groupby("event_type", as_index=False).head(1)
    out = out.rename(columns={"hour": "peak_hour"})
    for c in ("peak_hour", "n"):
        out[c] = out[c].astype("int64")
    return (
        out[["event_type", "peak_hour", "n"]]
        .sort_values("event_type")
        .reset_index(drop=True)
    )


def q_runtime_filter(sf_dir: str) -> pd.DataFrame:
    """Dynamic 'runtime filter' plan (the distributed dynamic
    partition-pruning shape): phase 1 finds the top-20 parts by
    exact-cents revenue with a pre-aggregated fold + partial top-k;
    phase 2 re-scans lineitem with the 20-key set BROADCAST into the
    filter (an isin mask per batch — at 100 TB this is the
    difference between shuffling the fact table and shipping 160
    bytes), then folds count / revenue / mean quantity per part."""
    import ray

    from unfurl_ray.ops.relational import _broadcast_fetch, pre_aggregate

    def prep(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        # floor, not round: Arrow rounds half-to-even while DuckDB
        # rounds half away from zero — floor of the SAME double is
        # unambiguous on both engines
        return pa.table(
            {
                "l_partkey": batch.column("l_partkey"),
                "cents": pc.cast(
                    pc.floor(pc.multiply(rev, pa.scalar(100.0))),
                    pa.int64(),
                ),
                "l_quantity": batch.column("l_quantity"),
            }
        )

    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_quantity"],
    ).map_batches(prep, batch_format="pyarrow").materialize()

    per_part = pre_aggregate(
        li.select_columns(["l_partkey", "cents"]),
        ["l_partkey"], {"rev": ("cents", "sum")},
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("rev", "descending"),
                       ("l_partkey", "ascending")],
        )
        return batch.take(idx[:20])

    top = (
        per_part.map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["rev", "l_partkey"], ascending=[False, True])
        .head(20)
    )
    keys_ref = ray.put(
        np.sort(top["l_partkey"].to_numpy(np.int64))
    )

    def rfilter(batch: pa.Table) -> pa.Table:
        keys = _broadcast_fetch(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys, pk)
        idx = np.clip(idx, 0, len(keys) - 1)
        return batch.filter(pa.array(keys[idx] == pk))

    out = pre_aggregate(
        li.map_batches(rfilter, batch_format="pyarrow"),
        ["l_partkey"],
        {
            "n": ("cents", "count"),
            "rev_cents": ("cents", "sum"),
            "qty_sum": ("l_quantity", "sum"),
        },
    ).to_pandas()
    out["avg_qty"] = (out["qty_sum"] / out["n"]).round(6)
    for c in ("n", "rev_cents"):
        out[c] = out[c].astype("int64")
    return (
        out[["l_partkey", "n", "rev_cents", "avg_qty"]]
        .sort_values("l_partkey")
        .reset_index(drop=True)
    )


def q_knn_classify(sf_dir: str) -> pd.DataFrame:
    """k-NN label vote: 5-nearest-neighbor majority label for the
    vec_id<4 query vectors (self excluded), reusing the brute
    cosine top-k engine (per-batch partial top-k); labels for the
    <=24 surviving neighbor ids come from one predicate-pushed
    filter scan, never a corpus-wide label broadcast.  Ties go to
    the smaller label."""
    from unfurl_ray.ops.similarity import knn_brute

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = knn_brute(ds, _query_vectors(sf_dir), k=6)
    out = out[out["vec_id"] != out["query_id"]]
    out = (
        out.sort_values(["query_id", "cosine", "vec_id"],
                        ascending=[True, False, True])
        .groupby("query_id", as_index=False)
        .head(5)
    )

    need = np.sort(out["vec_id"].unique().astype(np.int64))
    labels = (
        _parquet(sf_dir, "embeddings", ["vec_id", "label"])
        .map_batches(
            lambda b, ks=need: b.filter(
                pa.array(
                    np.isin(
                        b.column("vec_id").to_numpy(
                            zero_copy_only=False
                        ),
                        ks,
                    )
                )
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    merged = out.merge(labels, on="vec_id")
    votes = (
        merged.groupby(["query_id", "label"], as_index=False)
        .size()
        .rename(columns={"size": "votes"})
        .sort_values(["query_id", "votes", "label"],
                     ascending=[True, False, True])
    )
    win = votes.groupby("query_id", as_index=False).head(1)
    win = win.rename(columns={"label": "pred_label"})
    win["query_id"] = win["query_id"].astype("int64")
    win["pred_label"] = win["pred_label"].astype("int64")
    win["votes"] = win["votes"].astype("int64")
    return win.sort_values("query_id").reset_index(drop=True)


def q_set_ops(sf_dir: str) -> pd.DataFrame:
    """Distinct-set algebra census (INTERSECT / EXCEPT / UNION over
    the click vs purchase user sets) in ONE pre-aggregated pass:
    per-user membership flags fold as maxes (the shuffle moves one
    row per user per batch), then the 4-counter census closes on a
    single row — no set ever materializes."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])

    def flags(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "c": pc.cast(pc.equal(et, "click"), pa.int64()),
                "p": pc.cast(pc.equal(et, "purchase"), pa.int64()),
            }
        )

    per_user = pre_aggregate(
        ds.map_batches(flags, batch_format="pyarrow"),
        ["user_id"], {"c": ("c", "max"), "p": ("p", "max")},
    ).to_pandas()
    c = per_user["c"].to_numpy(np.int64)
    p = per_user["p"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "n_both": np.array([int(((c == 1) & (p == 1)).sum())],
                               np.int64),
            "n_click_only": np.array(
                [int(((c == 1) & (p == 0)).sum())], np.int64
            ),
            "n_purchase_only": np.array(
                [int(((c == 0) & (p == 1)).sum())], np.int64
            ),
            "n_union": np.array(
                [int(((c == 1) | (p == 1)).sum())], np.int64
            ),
        }
    )


def q_user_journey(sf_dir: str) -> pd.DataFrame:
    """First-5-events journey census: each user's opening event-type
    path (ts order) counted across the corpus — the onboarding
    funnel paths.  The per-batch partial top-k prunes to <=5 rows
    per user per batch (negated-timestamp trick reuses the
    descending top-k engine for an ASCENDING window), the path
    string builds vectorized on the pruned output, and the census
    is bounded by the path domain (#types^5)."""
    from unfurl_ray.ops.relational import topk_per_group

    ds = _parquet_sh(
        sf_dir, "events", ["user_id", "event_id", "event_type", "ts"]
    )

    def neg_ts(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "event_id": batch.column("event_id"),
                "event_type": batch.column("event_type"),
                "neg_ts": pc.multiply(
                    pc.cast(batch.column("ts"), pa.int64()),
                    pa.scalar(-1, pa.int64()),
                ),
            }
        )

    top = topk_per_group(
        ds.map_batches(neg_ts, batch_format="pyarrow"),
        "user_id", "neg_ts", 5, tiebreak_col="event_id",
    )
    top = top.sort_values(
        ["user_id", "neg_ts", "event_id"],
        ascending=[True, False, True],
    )
    paths = (
        top.groupby("user_id")["event_type"]
        .agg(">".join)
        .rename("path")
        .reset_index()
    )
    out = (
        paths.groupby("path", as_index=False)
        .size()
        .rename(columns={"size": "n_users"})
        .sort_values("path")
        .reset_index(drop=True)
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_partition_prune(sf_dir: str) -> pd.DataFrame:
    """Hive-partitioned layout + partition-pruned read: events write
    once partitioned by event_type (``write_parquet(partition_cols)``
    — the physical layout a 100 TB events table would ship with),
    then the purchase-only daily rollup reads JUST that partition
    directory — zero bytes of any other type leave storage.  The
    /tmp layout caches on the source fingerprint like the other
    layout ops."""
    import os

    from unfurl_ray.ops.relational import pre_aggregate

    DAY_US = 86_400 * 1_000_000
    tag = _cache_tag(sf_dir, "hivepart", "events")
    root = f"/tmp/unfurl_ray_layout/{tag}"
    if not os.path.isdir(root):
        ds = _parquet_sh(
            sf_dir, "events", ["event_id", "ts", "event_type", "value"]
        )
        ds.write_parquet(root, partition_cols=["event_type"])

    part = _rd().read_parquet(
        f"{root}/event_type=purchase",
        columns=["ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "day": pc.divide(
                    pc.cast(batch.column("ts"), pa.int64()),
                    pa.scalar(DAY_US, pa.int64()),
                ),
                "cents": pc.cast(
                    pc.round(
                        pc.multiply(
                            batch.column("value"), pa.scalar(100.0)
                        )
                    ),
                    pa.int64(),
                ),
            }
        )

    out = pre_aggregate(
        part.map_batches(prep, batch_format="pyarrow"),
        ["day"], {"n": ("cents", "count"), "rev_cents": ("cents", "sum")},
    ).to_pandas()
    for c in ("day", "n", "rev_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("day").reset_index(drop=True)


def q_sssp(sf_dir: str) -> pd.DataFrame:
    """Weighted shortest paths from the vec_id<2 seeds over the
    cosine>=0.3 similarity graph, weight = floor((1-cosine)*1e6)
    (integer semantic distance): distributed Bellman-Ford on the
    shared Pregel shard layout (ops.graph.sssp) — exact int64
    distances, rounds bounded by the hop diameter.  Rows-only
    (iterative fixpoint has no SQL twin); pinned by a Dijkstra
    parity pytest."""
    from unfurl_ray.ops.graph import sssp
    from unfurl_ray.ops.similarity import cosine_pair_dedup

    ds = _parquet(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = cosine_pair_dedup(ds, threshold=0.3)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").cast(pa.int64())
        b = batch.column("vec_b").cast(pa.int64())
        cos = batch.column("cosine").to_numpy(zero_copy_only=False)
        w = pa.array(
            np.floor((1.0 - cos) * 1e6).astype(np.int64), pa.int64()
        )
        return pa.table(
            {
                "u": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                "v": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()]),
                "w": pa.concat_arrays([w, w]),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    out = sssp(edges, [0, 1], num_partitions=8)
    return out


def q13_customer_distribution(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING the zero-order bucket.  One combiner-first shuffle
    collapses orders to a per-customer count; a bucketed LEFT hash
    join against the customer key column makes zero-order customers
    visible locally in their bucket (coalesce to 0); the final
    count-of-counts histogram is a second tiny pre_aggregate.  No
    side is broadcast — both shuffles carry one row per customer at
    most, so the plan holds at 1.5B customers."""
    from unfurl_ray.ops.relational import (
        bucketed_hash_join, pre_aggregate,
    )

    per_cust = pre_aggregate(
        _parquet_sh(sf_dir, "orders", ["o_custkey"]),
        ["o_custkey"], {"n_orders": ("o_custkey", "count")},
    )
    cust = _parquet_sh(sf_dir, "customer", ["c_custkey"])
    joined = bucketed_hash_join(
        cust, per_cust, on="c_custkey", right_on="o_custkey",
        how="left",
    )

    def coalesce(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_count": batch["n_orders"]
                .fillna(0)
                .astype("int64"),
            }
        )

    hist = pre_aggregate(
        joined.map_batches(coalesce, batch_format="pandas"),
        ["c_count"], {"custdist": ("c_count", "count")},
    ).to_pandas()
    hist["custdist"] = hist["custdist"].astype("int64")
    return hist.sort_values(
        ["custdist", "c_count"], ascending=[False, False]
    ).reset_index(drop=True)


def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: share of one ship-month's revenue from PROMO
    parts.  The part table collapses to two broadcast numpy arrays
    (sorted partkey, is-promo flag — one bit per part, shipped ONCE
    via ray.put); the lineitem scan is a single filtered pass
    emitting one (promo_rev, total_rev) partial row per batch, so
    nothing shuffles at all."""
    import ray

    from unfurl_ray.ops.relational import _broadcast_fetch

    lo = np.datetime64("1997-09-01", "us")
    hi = np.datetime64("1997-10-01", "us")

    part = (
        _parquet(sf_dir, "part", ["p_partkey", "p_type"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            (part["p_type"] == "PROMO").to_numpy(np.bool_),
        )
    )

    def partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.and_(
                pc.greater_equal(batch.column("l_shipdate"), lo),
                pc.less(batch.column("l_shipdate"), hi),
            )
        )
        keys, promo = _broadcast_fetch(part_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        rev = (
            batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False
            )
            * (
                1.0
                - batch.column("l_discount").to_numpy(
                    zero_copy_only=False
                )
            )
        )
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        is_promo = (keys[idx] == pk) & promo[idx] if len(keys) else (
            np.zeros(len(pk), np.bool_)
        )
        return pa.table(
            {
                "promo_rev": pa.array(
                    [float(rev[is_promo].sum())], pa.float64()
                ),
                "total_rev": pa.array(
                    [float(rev.sum())], pa.float64()
                ),
            }
        )

    parts_df = (
        _parquet_sh(
            sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount",
             "l_shipdate"],
        )
        .map_batches(partials, batch_format="pyarrow")
        .to_pandas()
    )
    ratio = (
        100.0 * parts_df["promo_rev"].sum()
        / parts_df["total_rev"].sum()
    )
    return pd.DataFrame({"promo_revenue": [round(ratio, 4)]})


def q15_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum one-quarter
    revenue.  One combiner-first shuffle builds the per-supplier
    revenue view; the max closes with per-batch partial maxima (the
    per-supplier table is never sorted or pulled to the driver); the
    tiny winner set then broadcast-filters the supplier scan for
    names.  Ties on the ROUNDED revenue are all returned, matching
    the subquery-equality semantics."""
    from unfurl_ray.ops.relational import pre_aggregate

    lo = np.datetime64("1997-07-01", "us")
    hi = np.datetime64("1997-10-01", "us")

    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_suppkey": b.column("l_suppkey"),
                "part_rev": pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(
                        pa.scalar(1.0), b.column("l_discount")
                    ),
                ),
            }
        ).filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        ),
        batch_format="pyarrow",
    )
    rev = pre_aggregate(
        li, ["l_suppkey"], {"total_revenue": ("part_rev", "sum")},
    ).map_batches(
        lambda b: pa.table(
            {
                "l_suppkey": b.column("l_suppkey"),
                "total_revenue": pc.round(
                    b.column("total_revenue"), 2
                ),
            }
        ),
        batch_format="pyarrow",
    )
    best = float(rev.max("total_revenue"))
    winners = rev.map_batches(
        lambda b, m=best: b.filter(
            pc.equal(b.column("total_revenue"), m)
        ),
        batch_format="pyarrow",
    ).to_pandas()

    keep = frozenset(winners["l_suppkey"].astype(int))
    names = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            lambda b, k=keep: b[b["s_suppkey"].isin(k)],
            batch_format="pandas",
        )
        .to_pandas()
    )
    out = names.merge(
        winners, left_on="s_suppkey", right_on="l_suppkey"
    )[["s_suppkey", "s_name", "total_revenue"]]
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out.sort_values("s_suppkey").reset_index(drop=True)


def q17_small_quantity_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's own mean quantity) for one brand
    were not taken.  The brand's partkeys broadcast once (a ~1/25
    slice of part — int64 keys only); pass 1 is a combiner-first
    shuffle over the brand-filtered lineitems building per-part
    (sum, count); the resulting per-part threshold map broadcasts
    back (same 1/25 cardinality) and pass 2 closes with per-batch
    partial sums — the correlated subquery costs two scans and one
    small shuffle, never a self-join."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, pre_aggregate,
    )

    brand_keys = np.sort(
        _parquet(sf_dir, "part", ["p_partkey", "p_brand"])
        .map_batches(
            lambda b: b[b["p_brand"] == "Brand#4"][["p_partkey"]],
            batch_format="pandas",
        )
        .to_pandas()["p_partkey"]
        .to_numpy(np.int64)
    )
    keys_ref = ray.put(brand_keys)

    def brand_only(batch: pa.Table) -> pa.Table:
        keys = _broadcast_fetch(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = keys[idx] == pk if len(keys) else np.zeros(
            len(pk), np.bool_
        )
        return batch.filter(pa.array(hit))

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    branded = _parquet_sh(sf_dir, "lineitem", li_cols).map_batches(
        brand_only, batch_format="pyarrow"
    )
    per_part = pre_aggregate(
        branded, ["l_partkey"],
        {
            "qty_sum": ("l_quantity", "sum"),
            "qty_n": ("l_quantity", "count"),
        },
    ).to_pandas().sort_values("l_partkey")
    thresh_ref = ray.put(
        (
            per_part["l_partkey"].to_numpy(np.int64),
            0.2
            * per_part["qty_sum"].to_numpy(np.float64)
            / per_part["qty_n"].to_numpy(np.float64),
        )
    )

    def small_qty_sum(batch: pa.Table) -> pa.Table:
        keys, thresh = _broadcast_fetch(thresh_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = (
            (keys[idx] == pk) & (qty < thresh[idx])
            if len(keys)
            else np.zeros(len(pk), np.bool_)
        )
        return pa.table(
            {"s": pa.array([float(price[hit].sum())], pa.float64())}
        )

    total = (
        _parquet_sh(sf_dir, "lineitem", li_cols)
        .map_batches(small_qty_sum, batch_format="pyarrow")
        .to_pandas()["s"]
        .sum()
    )
    return pd.DataFrame({"avg_yearly": [round(total / 7.0, 2)]})


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q18 shape: top-100 orders whose total quantity exceeds
    300, with customer names.  The lineitem side collapses to one
    row per orderkey in a combiner-first shuffle BEFORE any join
    (the HAVING filter prunes to a tiny qualifying set — ~0.004% of
    orders at TPC-H selectivity, small enough to broadcast as int64
    keys even at 100 TB); the orders side is then a RUNTIME-FILTERED
    scan (broadcast sorted-key searchsorted, no shuffle at all); the
    top-100 closes with per-batch partial top-k BEFORE customer
    names are fetched, so the name lookup is a ≤100-key
    broadcast-filtered scan of customer — no whole-table shuffle
    anywhere, never a global sort."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, pre_aggregate,
    )

    per_order = (
        pre_aggregate(
            _parquet_sh(
                sf_dir, "lineitem", ["l_orderkey", "l_quantity"]
            ),
            ["l_orderkey"], {"sum_qty": ("l_quantity", "sum")},
        )
        .map_batches(
            lambda b: b.filter(
                pc.greater(b.column("sum_qty"), 300.0)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("l_orderkey")
    )
    qual_ref = ray.put(
        (
            per_order["l_orderkey"].to_numpy(np.int64),
            per_order["sum_qty"].to_numpy(np.float64),
        )
    )

    def runtime_filter(batch: pa.Table) -> pa.Table:
        keys, sq = _broadcast_fetch(qual_ref)
        ok_ = batch.column("o_orderkey").to_numpy(
            zero_copy_only=False
        )
        idx = np.clip(
            np.searchsorted(keys, ok_), 0, max(len(keys) - 1, 0)
        )
        hit = keys[idx] == ok_ if len(keys) else np.zeros(
            len(ok_), np.bool_
        )
        out = batch.filter(pa.array(hit))
        return out.append_column(
            "sum_qty", pa.array(sq[idx[hit]], pa.float64())
        )

    big = _parquet_sh(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    ).map_batches(runtime_filter, batch_format="pyarrow")

    def partial_top(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("o_totalprice", "descending"),
                       ("o_orderkey", "ascending")],
        )
        return batch.take(idx[:100])

    top = (
        big.map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
        .sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        )
        .head(100)
        .reset_index(drop=True)
    )
    keep = frozenset(top["o_custkey"].astype(int))
    names = (
        _parquet(sf_dir, "customer", ["c_custkey", "c_name"])
        .map_batches(
            lambda b, k=keep: b[b["c_custkey"].isin(k)],
            batch_format="pandas",
        )
        .to_pandas()
    )
    top = top.merge(
        names, left_on="o_custkey", right_on="c_custkey"
    ).sort_values(
        ["o_totalprice", "o_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)
    top["o_totalprice"] = top["o_totalprice"].round(2)
    top["sum_qty"] = top["sum_qty"].round(2)
    for c in ("c_custkey", "o_orderkey"):
        top[c] = top[c].astype("int64")
    return top[
        ["c_custkey", "c_name", "o_orderkey", "o_orderdate",
         "o_totalprice", "sum_qty"]
    ]


def q19_banded_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q19 shape: revenue under a DISJUNCTION of
    (brand, size-band, quantity-band) predicates.  part collapses to
    three broadcast numpy arrays (sorted partkey, brand code 1-3,
    size) shipped once; the lineitem scan evaluates all three bands
    vectorized per batch and emits one partial-sum row — a pure map
    plan, no shuffle, no join."""
    import ray

    from unfurl_ray.ops.relational import _broadcast_fetch

    part = (
        _parquet(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    code = np.zeros(len(part), np.int8)
    code[(part["p_brand"] == "Brand#12").to_numpy()] = 1
    code[(part["p_brand"] == "Brand#23").to_numpy()] = 2
    code[(part["p_brand"] == "Brand#4").to_numpy()] = 3
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            code,
            part["p_size"].to_numpy(np.int64),
        )
    )

    def banded_sum(batch: pa.Table) -> pa.Table:
        keys, brand, size = _broadcast_fetch(part_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = batch.column("l_quantity").to_numpy(
            zero_copy_only=False
        )
        rev = (
            batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False
            )
            * (
                1.0
                - batch.column("l_discount").to_numpy(
                    zero_copy_only=False
                )
            )
        )
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        ok = keys[idx] == pk if len(keys) else np.zeros(
            len(pk), np.bool_
        )
        b, s = brand[idx], size[idx]
        hit = ok & (
            ((b == 1) & (s <= 5) & (qty >= 1) & (qty <= 11))
            | ((b == 2) & (s <= 10) & (qty >= 10) & (qty <= 20))
            | ((b == 3) & (s <= 15) & (qty >= 20) & (qty <= 30))
        )
        return pa.table(
            {"s": pa.array([float(rev[hit].sum())], pa.float64())}
        )

    total = (
        _parquet_sh(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice",
             "l_discount"],
        )
        .map_batches(banded_sum, batch_format="pyarrow")
        .to_pandas()["s"]
        .sum()
    )
    return pd.DataFrame({"revenue": [round(total, 2)]})


def q22_idle_customers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q22 shape (nationkey standing in for the phone-prefix
    country code): above-average-balance customers with NO order
    since 1999, counted per nation.  The global mean closes from
    per-batch (sum, count) partials; the anti join is ONE
    bucket-co-partitioned LEFT join of the balance-filtered
    customers against the distinct recent-order custkeys (distinct
    active customers is itself customer-cardinality at design scale,
    so neither side broadcasts); unmatched rows null-pad locally and
    the per-nation rollup is a final tiny pre_aggregate."""
    from unfurl_ray.ops.relational import (
        bucketed_hash_join, pre_aggregate,
    )

    cut = np.datetime64("1999-01-01", "us")

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]
    parts = (
        _parquet_sh(sf_dir, "customer", cust_cols)
        .map_batches(
            lambda b: pa.table(
                {
                    "s": pa.array(
                        [
                            float(
                                pc.sum(
                                    b.filter(
                                        pc.greater(
                                            b.column("c_acctbal"),
                                            0.0,
                                        )
                                    ).column("c_acctbal")
                                ).as_py()
                                or 0.0
                            )
                        ],
                        pa.float64(),
                    ),
                    "n": pa.array(
                        [
                            len(
                                b.filter(
                                    pc.greater(
                                        b.column("c_acctbal"), 0.0
                                    )
                                )
                            )
                        ],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    avg_bal = parts["s"].sum() / parts["n"].sum()

    rich = _parquet_sh(sf_dir, "customer", cust_cols).map_batches(
        lambda b, a=avg_bal: b.filter(
            pc.greater(b.column("c_acctbal"), a)
        ),
        batch_format="pyarrow",
    )
    active = pre_aggregate(
        _parquet_sh(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(
            lambda b: b.filter(
                pc.greater_equal(b.column("o_orderdate"), cut)
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        ),
        ["o_custkey"], {"n_recent": ("o_custkey", "count")},
    )
    joined = bucketed_hash_join(
        rich, active, on="c_custkey", right_on="o_custkey",
        how="left",
    )

    def idle_only(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[batch["n_recent"].isna()][
            ["c_nationkey", "c_acctbal"]
        ]

    out = pre_aggregate(
        joined.map_batches(idle_only, batch_format="pandas"),
        ["c_nationkey"],
        {
            "numcust": ("c_acctbal", "count"),
            "totacctbal": ("c_acctbal", "sum"),
        },
    ).to_pandas()
    out["numcust"] = out["numcust"].astype("int64")
    out["totacctbal"] = out["totacctbal"].round(2)
    out["c_nationkey"] = out["c_nationkey"].astype("int64")
    return out.sort_values("c_nationkey").reset_index(drop=True)


def q_interval_join(sf_dir: str) -> pd.DataFrame:
    """Interval x interval overlap join (ops.relational.
    interval_overlap_join): even event_ids spawn 'effect' intervals
    [ts, ts + (id%7200+60)s), odd event_ids spawn 'incident'
    intervals [ts, ts + (id%5400+120)s); every same-user overlapping
    pair is counted once with its exact overlap duration, rolled up
    per user.  Neither interval set broadcasts — both fragment onto
    one-hour (user, cell) cells and join co-partitioned, with the
    canonical-cell predicate deduping multi-cell overlaps
    vectorized.  All arithmetic is integer microseconds, so the
    DuckDB twin is hash-exact."""
    from unfurl_ray.ops.relational import (
        _ts_us, interval_overlap_join, pre_aggregate,
    )

    def shape(parity: int):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            eid = batch["event_id"].to_numpy(np.int64)
            keep = (eid % 2) == parity
            s = _ts_us(batch["ts"]).to_numpy()[keep]
            mod, base = (7200, 60) if parity == 0 else (5400, 120)
            dur = ((eid[keep] % mod) + base) * 1_000_000
            return pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(
                        np.int64
                    )[keep],
                    "s": s,
                    "e": s + dur,
                }
            )

        return f

    cols = ["event_id", "ts", "user_id"]
    left = _parquet_sh(sf_dir, "events", cols).map_batches(
        shape(0), batch_format="pandas"
    )
    right = _parquet_sh(sf_dir, "events", cols).map_batches(
        shape(1), batch_format="pandas"
    )
    pairs = interval_overlap_join(
        left, right, "user_id", "s", "e", cell_us=3_600_000_000,
    )

    def overlap(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"],
                "overlap_us": np.minimum(batch["e_l"], batch["e_r"])
                - np.maximum(batch["s_l"], batch["s_r"]),
            }
        )

    out = pre_aggregate(
        pairs.map_batches(overlap, batch_format="pandas"),
        ["user_id"],
        {
            "n_pairs": ("overlap_us", "count"),
            "overlap_us": ("overlap_us", "sum"),
        },
    ).to_pandas()
    out["n_pairs"] = out["n_pairs"].astype("int64")
    out["overlap_us"] = out["overlap_us"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q7_volume_shipping(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year.  supplier collapses to a broadcast (sorted suppkey ->
    nationkey) lookup shipped once (10M rows / ~160 MB at design
    scale — far below shuffling lineitem); nation is a constant-size
    driver map; customer nationality rides the orders⋈customer
    bucketed join, then lineitem co-shuffles once on orderkey.  The
    two-direction nation-pair predicate and the year bucketing close
    vectorized inside the join output batches, and the final rollup
    is a tiny pre_aggregate."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_hash_join, pre_aggregate,
    )

    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1998-01-01", "us")

    nation = _parquet(sf_dir, "nation").to_pandas()
    name_of = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    pair = {
        int(
            nation.loc[nation["n_name"] == n, "n_nationkey"].iloc[0]
        )
        for n in ("NATION_3", "NATION_7")
    }

    sup = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
        )
    )

    cust = _parquet_sh(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b, keep=tuple(pair): b.filter(
            pc.is_in(
                b.column("c_nationkey").cast(pa.int64()),
                pa.array(keep, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )
    orders = _parquet_sh(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    ord_cust = bucketed_hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
    )

    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "l_year": pc.year(b.column("l_shipdate")),
                "part_rev": pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(
                        pa.scalar(1.0), b.column("l_discount")
                    ),
                ),
            }
        ).filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        li, ord_cust.select_columns(["o_orderkey", "c_nationkey"]),
        on="l_orderkey", right_on="o_orderkey",
    )

    def nation_pairs(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nats = _broadcast_fetch(sup_ref)
        sk = batch["l_suppkey"].to_numpy(np.int64)
        idx = np.clip(
            np.searchsorted(keys, sk), 0, max(len(keys) - 1, 0)
        )
        s_nat = nats[idx]
        cn = batch["c_nationkey"].to_numpy(np.int64)
        a, b_ = min(pair), max(pair)
        hit = (keys[idx] == sk) & (
            ((s_nat == a) & (cn == b_)) | ((s_nat == b_) & (cn == a))
        )
        out = batch.loc[hit, ["l_year", "part_rev"]].copy()
        out["s_nat"] = s_nat[hit]
        out["c_nat"] = cn[hit]
        return out

    agg = pre_aggregate(
        joined.map_batches(nation_pairs, batch_format="pandas"),
        ["s_nat", "c_nat", "l_year"],
        {"revenue": ("part_rev", "sum")},
    ).to_pandas()
    agg["supp_nation"] = agg["s_nat"].map(
        lambda k: name_of[int(k)]
    )
    agg["cust_nation"] = agg["c_nat"].map(
        lambda k: name_of[int(k)]
    )
    agg["revenue"] = agg["revenue"].round(2)
    agg["l_year"] = agg["l_year"].astype("int64")
    return (
        agg[["supp_nation", "cust_nation", "l_year", "revenue"]]
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


def q12_late_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape (order priority standing in for the missing
    ship-mode column): per order-year counts of LATE lineitems
    (shipped >90 days after the order date) split into high- vs
    low-priority CASE sums.  One bucket-co-partitioned orders ⋈
    lineitem join; the lateness predicate and the conditional counts
    are integer-microsecond vectorized inside the join output; the
    rollup is a tiny pre_aggregate."""
    from unfurl_ray.ops.relational import (
        _ts_us, bucketed_hash_join, pre_aggregate,
    )

    orders = _parquet_sh(
        sf_dir, "orders",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
    )
    li = _parquet_sh(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = bucketed_hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
    )
    lag_us = 90 * 86_400 * 1_000_000

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        ship = _ts_us(batch["l_shipdate"]).to_numpy()
        od = _ts_us(batch["o_orderdate"]).to_numpy()
        late = ship > od + lag_us
        pr = batch["o_orderpriority"].to_numpy()
        high = np.isin(pr, ("1-URGENT", "2-HIGH"))
        year = (
            batch["o_orderdate"]
            .dt.year.to_numpy(np.int64)
        )
        return pd.DataFrame(
            {
                "o_year": year[late],
                "high_line_count": high[late].astype(np.int64),
                "low_line_count": (~high[late]).astype(np.int64),
            }
        )

    out = pre_aggregate(
        joined.map_batches(classify, batch_format="pandas"),
        ["o_year"],
        {
            "high_line_count": ("high_line_count", "sum"),
            "low_line_count": ("low_line_count", "sum"),
        },
    ).to_pandas()
    for c in ("o_year", "high_line_count", "low_line_count"):
        out[c] = out[c].astype("int64")
    return out.sort_values("o_year").reset_index(drop=True)


def q16_supplier_diversity(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q16 shape (lineitem standing in for the missing partsupp
    table): distinct supplier count per (brand, size) class for a
    size short-list, excluding one brand.  part collapses to
    broadcast (sorted partkey -> brand code, size) arrays shipped
    once; the lineitem scan filters and projects to (brand, size,
    suppkey) triples; distinctness is a first combiner-collapsed
    groupby over the triples (bounded by |brands| x |sizes| x
    |suppliers|, never lineitem cardinality) and the count rolls up
    in a second tiny pre_aggregate."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, pre_aggregate,
    )

    sizes = (1, 5, 9, 13, 17)
    part = (
        _parquet(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    brands = sorted(part["p_brand"].unique())
    brand_code = {b: i for i, b in enumerate(brands)}
    keep = (part["p_brand"] != "Brand#4") & part["p_size"].isin(
        sizes
    )
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_brand"].map(brand_code).to_numpy(np.int64),
            part["p_size"].to_numpy(np.int64),
            keep.to_numpy(np.bool_),
        )
    )

    def triples(batch: pa.Table) -> pa.Table:
        keys, bcode, size, ok = _broadcast_fetch(part_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = (keys[idx] == pk) & ok[idx] if len(keys) else (
            np.zeros(len(pk), np.bool_)
        )
        return pa.table(
            {
                "brand_code": pa.array(
                    bcode[idx[hit]], pa.int64()
                ),
                "p_size": pa.array(size[idx[hit]], pa.int64()),
                "l_suppkey": pa.array(
                    batch.column("l_suppkey")
                    .to_numpy(zero_copy_only=False)[hit],
                    pa.int64(),
                ),
            }
        )

    distinct = pre_aggregate(
        _parquet_sh(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(triples, batch_format="pyarrow"),
        ["brand_code", "p_size", "l_suppkey"],
        {"n": ("l_suppkey", "count")},
    )
    out = pre_aggregate(
        distinct, ["brand_code", "p_size"],
        {"supplier_cnt": ("n", "count")},
    ).to_pandas()
    out["p_brand"] = out["brand_code"].map(
        {v: k for k, v in brand_code.items()}
    )
    out["supplier_cnt"] = out["supplier_cnt"].astype("int64")
    out["p_size"] = out["p_size"].astype("int64")
    return (
        out[["p_brand", "p_size", "supplier_cnt"]]
        .sort_values(
            ["supplier_cnt", "p_brand", "p_size"],
            ascending=[False, True, True],
        )
        .reset_index(drop=True)
    )


def q2_min_cost_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q2 shape (observed lineitem unit price standing in for
    the missing partsupp supplycost): for one brand, the supplier(s)
    achieving each part's minimum observed unit price.  The brand's
    partkeys broadcast once (1/25 of part, int64 keys); one
    combiner-first min-shuffle builds the (part, supplier) unit-price
    floor; the per-part minimum broadcasts back as a sorted-key map
    (same 1/25 cardinality) and winners filter vectorized — the
    correlated MIN subquery never self-joins.  min() is
    order-independent and division is deterministic per row, so the
    double equality u == mu is exact against the DuckDB twin."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, pre_aggregate,
    )

    brand_keys = np.sort(
        _parquet(sf_dir, "part", ["p_partkey", "p_brand"])
        .map_batches(
            lambda b: b[b["p_brand"] == "Brand#7"][["p_partkey"]],
            batch_format="pandas",
        )
        .to_pandas()["p_partkey"]
        .to_numpy(np.int64)
    )
    keys_ref = ray.put(brand_keys)

    def unit_prices(batch: pa.Table) -> pa.Table:
        keys = _broadcast_fetch(keys_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = keys[idx] == pk if len(keys) else np.zeros(
            len(pk), np.bool_
        )
        qty = batch.column("l_quantity").to_numpy(
            zero_copy_only=False
        )
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "l_partkey": pa.array(pk[hit], pa.int64()),
                "l_suppkey": pa.array(
                    batch.column("l_suppkey")
                    .to_numpy(zero_copy_only=False)[hit],
                    pa.int64(),
                ),
                "u": pa.array(
                    price[hit] / qty[hit], pa.float64()
                ),
            }
        )

    # materialized: consumed twice (per-part min + winner filter)
    # and bounded by the brand's (part, supplier) pairs
    unit = pre_aggregate(
        _parquet_sh(
            sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice"],
        ).map_batches(unit_prices, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], {"u": ("u", "min")},
    ).materialize()
    best = (
        pre_aggregate(unit, ["l_partkey"], {"mu": ("u", "min")})
        .to_pandas()
        .sort_values("l_partkey")
    )
    best_ref = ray.put(
        (
            best["l_partkey"].to_numpy(np.int64),
            best["mu"].to_numpy(np.float64),
        )
    )

    def winners_only(batch: pd.DataFrame) -> pd.DataFrame:
        keys, mu = _broadcast_fetch(best_ref)
        pk = batch["l_partkey"].to_numpy(np.int64)
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = (keys[idx] == pk) & (
            batch["u"].to_numpy() == mu[idx]
        )
        return batch[hit]

    win = unit.map_batches(
        winners_only, batch_format="pandas"
    ).to_pandas()

    keep = frozenset(win["l_suppkey"].astype(int))
    names = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            lambda b, k=keep: b[b["s_suppkey"].isin(k)],
            batch_format="pandas",
        )
        .to_pandas()
    )
    out = win.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    out["unit_price"] = out["u"].round(4)
    out["p_partkey"] = out["l_partkey"].astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return (
        out[["p_partkey", "s_suppkey", "s_name", "unit_price"]]
        .sort_values(["p_partkey", "s_suppkey"])
        .reset_index(drop=True)
    )


def q4_priority_check(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: per order priority, how many of one quarter's
    orders had AT LEAST ONE late lineitem (EXISTS semi-join; shipped
    >90 days after the order date stands in for the missing
    commit/receipt dates).  The quarter's orders co-shuffle once with
    lineitem on orderkey; the EXISTS collapses to a combiner-first
    distinct over (orderkey, priority) — one row per qualifying
    order, never a per-order group of its lineitems — and the
    priority rollup is a final tiny pre_aggregate."""
    from unfurl_ray.ops.relational import (
        _ts_us, bucketed_hash_join, pre_aggregate,
    )

    lo = np.datetime64("1997-01-01", "us")
    hi = np.datetime64("1997-04-01", "us")

    orders = _parquet_sh(
        sf_dir, "orders",
        ["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ),
        batch_format="pyarrow",
    )
    li = _parquet_sh(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = bucketed_hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
    )
    lag_us = 90 * 86_400 * 1_000_000

    def late_only(batch: pd.DataFrame) -> pd.DataFrame:
        late = (
            _ts_us(batch["l_shipdate"]).to_numpy()
            > _ts_us(batch["o_orderdate"]).to_numpy() + lag_us
        )
        return batch.loc[late, ["l_orderkey", "o_orderpriority"]]

    exists = pre_aggregate(
        joined.map_batches(late_only, batch_format="pandas"),
        ["l_orderkey", "o_orderpriority"],
        {"n": ("l_orderkey", "count")},
    )
    out = pre_aggregate(
        exists, ["o_orderpriority"],
        {"order_count": ("n", "count")},
    ).to_pandas()
    out["order_count"] = out["order_count"].astype("int64")
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q8_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: NATION_3 suppliers' share of all revenue sold
    into NATION_3's own region, by order year.  nation x region
    collapse to driver maps; the region's customers co-shuffle with
    orders, then lineitem joins once on orderkey; supplier
    nationality is the broadcast sorted-key lookup; both CASE sums
    (nation numerator, region denominator) pre-aggregate per
    (year) inside the join output, so the final share division runs
    over a handful of rows on the driver."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_hash_join, pre_aggregate,
    )

    nation = _parquet(sf_dir, "nation").to_pandas()
    target = nation[nation["n_name"] == "NATION_3"].iloc[0]
    region_nations = frozenset(
        nation.loc[
            nation["n_regionkey"] == target["n_regionkey"],
            "n_nationkey",
        ].astype(int)
    )
    target_key = int(target["n_nationkey"])

    sup = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
        )
    )

    cust = _parquet_sh(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda b, keep=tuple(sorted(region_nations)): b.filter(
            pc.is_in(
                b.column("c_nationkey").cast(pa.int64()),
                pa.array(keep, pa.int64()),
            )
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "o_year": pc.year(b.column("o_orderdate")),
            }
        ),
        batch_format="pyarrow",
    )
    ord_cust = bucketed_hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
    )
    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "part_rev": pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(
                        pa.scalar(1.0), b.column("l_discount")
                    ),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        li, ord_cust.select_columns(["o_orderkey", "o_year"]),
        on="l_orderkey", right_on="o_orderkey",
    )

    def case_sums(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nats = _broadcast_fetch(sup_ref)
        sk = batch["l_suppkey"].to_numpy(np.int64)
        idx = np.clip(
            np.searchsorted(keys, sk), 0, max(len(keys) - 1, 0)
        )
        is_target = (keys[idx] == sk) & (nats[idx] == target_key)
        rev = batch["part_rev"].to_numpy()
        return pd.DataFrame(
            {
                "o_year": batch["o_year"].to_numpy(np.int64),
                "nat_rev": np.where(is_target, rev, 0.0),
                "all_rev": rev,
            }
        )

    agg = pre_aggregate(
        joined.map_batches(case_sums, batch_format="pandas"),
        ["o_year"],
        {
            "nat_rev": ("nat_rev", "sum"),
            "all_rev": ("all_rev", "sum"),
        },
    ).to_pandas()
    agg["mkt_share"] = (agg["nat_rev"] / agg["all_rev"]).round(6)
    agg["o_year"] = agg["o_year"].astype("int64")
    return (
        agg[["o_year", "mkt_share"]]
        .sort_values("o_year")
        .reset_index(drop=True)
    )


def q9_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape (0.6 x p_retailprice x quantity standing in for
    the missing partsupp supplycost): profit on one part-name family
    by supplier nation and order year.  part collapses to broadcast
    (sorted partkey, retailprice, name-match flag) arrays and
    supplier to the (suppkey -> nationkey) lookup, both shipped once;
    lineitem co-shuffles ONCE with orders (for the year); profit
    partials pre-aggregate per (nation, year) inside the join
    output."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, bucketed_hash_join, pre_aggregate,
    )

    nation = _parquet(sf_dir, "nation").to_pandas()
    name_of = dict(
        zip(nation["n_nationkey"].astype(int), nation["n_name"])
    )
    part = (
        _parquet(
            sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]
        )
        .to_pandas()
        .sort_values("p_partkey")
    )
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_retailprice"].to_numpy(np.float64),
            part["p_name"]
            .str.contains("gear", regex=False)
            .to_numpy(np.bool_),
        )
    )
    sup = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
        )
    )

    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_year": pc.year(b.column("o_orderdate")),
            }
        ),
        batch_format="pyarrow",
    )

    def project(batch: pa.Table) -> pa.Table:
        keys, retail, match = _broadcast_fetch(part_ref)
        pk = batch.column("l_partkey").to_numpy(zero_copy_only=False)
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = (keys[idx] == pk) & match[idx] if len(keys) else (
            np.zeros(len(pk), np.bool_)
        )
        qty = batch.column("l_quantity").to_numpy(
            zero_copy_only=False
        )[hit]
        price = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False
        )[hit]
        disc = batch.column("l_discount").to_numpy(
            zero_copy_only=False
        )[hit]
        profit = price * (1.0 - disc) - 0.6 * retail[idx[hit]] * qty
        return pa.table(
            {
                "l_orderkey": pa.array(
                    batch.column("l_orderkey")
                    .to_numpy(zero_copy_only=False)[hit],
                    pa.int64(),
                ),
                "l_suppkey": pa.array(
                    batch.column("l_suppkey")
                    .to_numpy(zero_copy_only=False)[hit],
                    pa.int64(),
                ),
                "profit": pa.array(profit, pa.float64()),
            }
        )

    li = _parquet_sh(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
         "l_extendedprice", "l_discount"],
    ).map_batches(project, batch_format="pyarrow")
    joined = bucketed_hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
    )

    def by_nation(batch: pd.DataFrame) -> pd.DataFrame:
        keys, nats = _broadcast_fetch(sup_ref)
        sk = batch["l_suppkey"].to_numpy(np.int64)
        idx = np.clip(
            np.searchsorted(keys, sk), 0, max(len(keys) - 1, 0)
        )
        hit = keys[idx] == sk
        return pd.DataFrame(
            {
                "n_nationkey": nats[idx][hit],
                "o_year": batch["o_year"].to_numpy(np.int64)[hit],
                "profit": batch["profit"].to_numpy()[hit],
            }
        )

    agg = pre_aggregate(
        joined.map_batches(by_nation, batch_format="pandas"),
        ["n_nationkey", "o_year"], {"profit": ("profit", "sum")},
    ).to_pandas()
    agg["nation"] = agg["n_nationkey"].map(
        lambda k: name_of[int(k)]
    )
    agg["profit"] = agg["profit"].round(2)
    agg["o_year"] = agg["o_year"].astype("int64")
    return (
        agg[["nation", "o_year", "profit"]]
        .sort_values(["nation", "o_year"])
        .reset_index(drop=True)
    )


def q11_important_parts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q11 shape (lineitem revenue standing in for partsupp
    stock value): parts whose revenue exceeds 0.1% of their supplier
    nation's total.  supplier collapses to the broadcast (suppkey ->
    nationkey) lookup; ONE combiner-first shuffle builds the
    (nation, part) value table; nation totals are a 25-row driver
    fold over a second tiny pre_aggregate, and the HAVING threshold
    filters vectorized — the 'group total' scalar subquery never
    re-shuffles.  Revenue is computed in exact integer 1e-4-dollar
    units (price cents x discount hundredths — the q_mad pattern),
    so both the threshold comparison and the displayed rounding are
    summation-order-independent and hash-exact vs the twin."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, pre_aggregate,
    )

    sup = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        .to_pandas()
        .sort_values("s_suppkey")
    )
    sup_ref = ray.put(
        (
            sup["s_suppkey"].to_numpy(np.int64),
            sup["s_nationkey"].to_numpy(np.int64),
        )
    )

    def project(batch: pa.Table) -> pa.Table:
        keys, nats = _broadcast_fetch(sup_ref)
        sk = batch.column("l_suppkey").to_numpy(zero_copy_only=False)
        idx = np.clip(
            np.searchsorted(keys, sk), 0, max(len(keys) - 1, 0)
        )
        hit = keys[idx] == sk if len(keys) else np.zeros(
            len(sk), np.bool_
        )
        cents = np.rint(
            batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False
            )
            * 100.0
        ).astype(np.int64)
        disc_h = np.rint(
            batch.column("l_discount").to_numpy(
                zero_copy_only=False
            )
            * 100.0
        ).astype(np.int64)
        rev_e4 = cents * (100 - disc_h)
        return pa.table(
            {
                "nk": pa.array(nats[idx][hit], pa.int64()),
                "l_partkey": pa.array(
                    batch.column("l_partkey")
                    .to_numpy(zero_copy_only=False)[hit],
                    pa.int64(),
                ),
                "val": pa.array(rev_e4[hit], pa.int64()),
            }
        )

    # materialized: consumed twice (nation totals + threshold
    # filter) and bounded by |nations| x |parts|, never lineitem
    pv = pre_aggregate(
        _parquet_sh(
            sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_extendedprice",
             "l_discount"],
        ).map_batches(project, batch_format="pyarrow"),
        ["nk", "l_partkey"], {"val": ("val", "sum")},
    ).materialize()
    totals = (
        pre_aggregate(pv, ["nk"], {"tot": ("val", "sum")})
        .to_pandas()
        .set_index("nk")["tot"]
        .to_dict()
    )

    def above(batch: pd.DataFrame) -> pd.DataFrame:
        tot = batch["nk"].map(totals).to_numpy(np.int64)
        # val > 0.001 * tot, kept exact in integers
        return batch[1000 * batch["val"].to_numpy(np.int64) > tot]

    out = pv.map_batches(above, batch_format="pandas").to_pandas()
    # half-up to cents in exact integers (pandas .round is
    # half-to-even and would disagree with the twin on exact .xx5)
    out["value"] = ((out["val"] + 50) // 100) / 100.0
    out["nk"] = out["nk"].astype("int64")
    out["l_partkey"] = out["l_partkey"].astype("int64")
    return (
        out[["nk", "l_partkey", "value"]]
        .rename(columns={"nk": "s_nationkey"})
        .sort_values(["s_nationkey", "l_partkey"])
        .reset_index(drop=True)
    )


def q20_recent_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape (shipped-quantity concentration standing in
    for partsupp availqty): suppliers of one part family whose
    shipments since 1999 exceed half their all-time quantity.  part
    collapses to a broadcast name-match flag; one combiner-first
    shuffle builds per-supplier (total, recent) quantity sums;
    quantities are integral doubles so both sums — and the 0.5x
    comparison — are exact against the twin.  The qualifying set is
    tiny, so names come from a broadcast-filtered supplier scan."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, _ts_us, pre_aggregate,
    )

    part = (
        _parquet(sf_dir, "part", ["p_partkey", "p_name"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_name"]
            .str.contains("gear", regex=False)
            .to_numpy(np.bool_),
        )
    )
    cut_us = int(
        np.datetime64("1999-01-01", "us").astype(np.int64)
    )

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        keys, match = _broadcast_fetch(part_ref)
        pk = batch["l_partkey"].to_numpy(np.int64)
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = (keys[idx] == pk) & match[idx] if len(keys) else (
            np.zeros(len(pk), np.bool_)
        )
        qty = batch["l_quantity"].to_numpy()[hit]
        recent = (
            _ts_us(batch["l_shipdate"]).to_numpy()[hit] >= cut_us
        )
        return pd.DataFrame(
            {
                "l_suppkey": batch["l_suppkey"].to_numpy(
                    np.int64
                )[hit],
                "total_qty": qty,
                "recent_qty": np.where(recent, qty, 0.0),
            }
        )

    per_supp = pre_aggregate(
        _parquet_sh(
            sf_dir, "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        ).map_batches(project, batch_format="pandas"),
        ["l_suppkey"],
        {
            "total_qty": ("total_qty", "sum"),
            "recent_qty": ("recent_qty", "sum"),
        },
    ).map_batches(
        lambda b: b[
            b["recent_qty"].to_numpy() > 0.5 * b["total_qty"].to_numpy()
        ],
        batch_format="pandas",
    ).to_pandas()

    keep = frozenset(per_supp["l_suppkey"].astype(int))
    names = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            lambda b, k=keep: b[b["s_suppkey"].isin(k)],
            batch_format="pandas",
        )
        .to_pandas()
    )
    out = per_supp.merge(
        names, left_on="l_suppkey", right_on="s_suppkey"
    )
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    for c in ("total_qty", "recent_qty"):
        out[c] = out[c].round(2)
    return (
        out[["s_suppkey", "s_name", "total_qty", "recent_qty"]]
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


def q21_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late supplier on
    multi-supplier orders, top 100 by count.  lineitem co-shuffles
    once with orders on orderkey; per-(order, supplier) late flags
    collapse combiner-first (bounded by suppliers-per-order, never a
    per-order group of raw lineitems); per-order counts are a second
    tiny pre_aggregate whose output joins back bucket-co-partitioned
    on orderkey; the per-supplier tally closes with partial top-k,
    and names come from a ≤100-key broadcast-filtered supplier
    scan."""
    from unfurl_ray.ops.relational import (
        _ts_us, bucketed_hash_join, pre_aggregate,
    )

    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_orderdate"]
    )
    li = _parquet_sh(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]
    )
    joined = bucketed_hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
    )
    lag_us = 90 * 86_400 * 1_000_000

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        late = (
            _ts_us(batch["l_shipdate"]).to_numpy()
            > _ts_us(batch["o_orderdate"]).to_numpy() + lag_us
        )
        return pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].to_numpy(np.int64),
                "l_suppkey": batch["l_suppkey"].to_numpy(np.int64),
                "late": late.astype(np.int64),
            }
        )

    # materialized: ls feeds both the per-order rollup and the
    # join-back; re-deriving it would replay the lineitem x orders
    # join.  It is collapsed to one row per (order, supplier), and
    # the object store spills it rather than holding it on-heap.
    ls = pre_aggregate(
        joined.map_batches(flag, batch_format="pandas"),
        ["l_orderkey", "l_suppkey"], {"late": ("late", "max")},
    ).materialize()
    os_ = pre_aggregate(
        ls, ["l_orderkey"],
        {
            "n_supp": ("late", "count"),
            "n_late": ("late", "sum"),
        },
    )
    both = bucketed_hash_join(
        ls, os_.map_batches(
            lambda b: b.rename_columns(
                ["ok2", "n_supp", "n_late"]
            ),
            batch_format="pyarrow",
        ),
        on="l_orderkey", right_on="ok2",
    )
    tally = pre_aggregate(
        both.map_batches(
            lambda b: b[
                (b["late"] == 1) & (b["n_late"] == 1)
                & (b["n_supp"] >= 2)
            ][["l_suppkey"]],
            batch_format="pandas",
        ),
        ["l_suppkey"], {"numwait": ("l_suppkey", "count")},
    )

    def partial_top(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(
            batch,
            sort_keys=[("numwait", "descending"),
                       ("l_suppkey", "ascending")],
        )
        return batch.take(idx[:100])

    top = (
        tally.map_batches(partial_top, batch_format="pyarrow")
        .to_pandas()
    )
    keep = frozenset(top["l_suppkey"].astype(int))
    names = (
        _parquet(sf_dir, "supplier", ["s_suppkey", "s_name"])
        .map_batches(
            lambda b, k=keep: b[b["s_suppkey"].isin(k)],
            batch_format="pandas",
        )
        .to_pandas()
    )
    top = top.merge(names, left_on="l_suppkey", right_on="s_suppkey")
    top["numwait"] = top["numwait"].astype("int64")
    return (
        top.sort_values(
            ["numwait", "s_name"], ascending=[False, True]
        )
        .head(100)[["s_name", "numwait"]]
        .reset_index(drop=True)
    )


def q_hits(sf_dir: str) -> pd.DataFrame:
    """HITS hubs/authorities (ops.graph.hits) over the directed
    user -> event-type interaction graph: users are hubs, event types
    are authorities (ids offset by 10^9 to keep the node domains
    disjoint).  Distinct (user, type) edges collapse combiner-first
    before the ONE setup shuffle; each power half-step exchanges only
    pre-aggregated contribution / authority-value arrays between
    shard actors.  Rows-only (iterative fixpoint has no SQL twin);
    pytest parity against dense numpy power iteration covers
    exactness.  Returns the top-20 hubs and all authorities, rounded
    so fold order can't flip the hash."""
    from unfurl_ray.ops.graph import hits
    from unfurl_ray.ops.relational import pre_aggregate

    types = sorted(
        _parquet_sh(sf_dir, "events", ["event_type"])
        .unique("event_type")
    )
    code = {t: i for i, t in enumerate(types)}

    def edge(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": batch["user_id"].to_numpy(np.int64),
                "dst": batch["event_type"].map(code).to_numpy(
                    np.int64
                )
                + 1_000_000_000,
            }
        )

    edges = pre_aggregate(
        _parquet_sh(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(edge, batch_format="pandas"),
        ["src", "dst"], {"n": ("src", "count")},
    ).select_columns(["src", "dst"])

    out = hits(edges, n_iter=25, n_buckets=8).to_pandas()
    hubs = (
        out[out["node"] < 1_000_000_000]
        .sort_values(["hub", "node"], ascending=[False, True])
        .head(20)
    )
    auths = out[out["node"] >= 1_000_000_000].sort_values("node")
    res = pd.concat([hubs, auths], ignore_index=True)
    res["hub"] = res["hub"].round(8)
    res["authority"] = res["authority"].round(8)
    res["node"] = res["node"].astype("int64")
    return res[["node", "hub", "authority"]].reset_index(drop=True)


def q_ppr(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank (ops.graph.personalized_pagerank) over
    the embedding similarity graph, seeded on the label-0 vectors —
    'which corpus items does the label-0 neighborhood endorse'.  Same
    one-setup-shuffle Pregel layout as q_pagerank; the seed set is a
    small broadcast list and restart/dangling mass teleports onto
    it.  Rows-only (iterative fixpoint); pytest parity against dense
    numpy RWR covers exactness.  Returns the top-30 NON-seed nodes by
    rank (the recommendation view), rounded."""
    from unfurl_ray.ops.graph import personalized_pagerank
    from unfurl_ray.ops.similarity import cosine_pairs_bucketed

    ds = _parquet(sf_dir, "embeddings")
    # seed set = the 100 smallest label-0 vec_ids, closed with
    # per-batch partial min-k so the driver never sees more than
    # 100 ids per block at any scale
    seeds = sorted(
        _parquet(sf_dir, "embeddings", ["vec_id", "label"])
        .map_batches(
            lambda b: b[b["label"] == 0][["vec_id"]]
            .nsmallest(100, "vec_id"),
            batch_format="pandas",
        )
        .to_pandas()["vec_id"]
        .astype(int)
    )[:100]
    pairs = cosine_pairs_bucketed(
        ds, threshold=0.3, assign_top=3, dedup=False
    )

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("vec_a").to_numpy(zero_copy_only=False)
        b = batch.column("vec_b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(
                    np.concatenate([a, b]).astype(np.int64),
                    pa.int64(),
                ),
                "dst": pa.array(
                    np.concatenate([b, a]).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
    out = personalized_pagerank(
        edges, seeds, n_iter=20, n_buckets=8, dedup_edges=True
    ).to_pandas()
    seed_set = set(seeds)
    out = out[~out["node"].isin(seed_set)]
    out = out.sort_values(
        ["rank", "node"], ascending=[False, True]
    ).head(30)
    out["rank"] = out["rank"].round(8)
    out["node"] = out["node"].astype("int64")
    return out[["node", "rank"]].reset_index(drop=True)


def q_gmm(sf_dir: str) -> pd.DataFrame:
    """3-component 1-D Gaussian mixture (ops.fit.gmm_fit) on
    log1p(value) of purchase events — the classic spend-segmentation
    fit.  Distributed EM: each pass is one task sweep over the
    materialized projected blocks, moving 3k+1 floats per block.
    Rows-only (iterative EM fixpoint has no SQL twin); pytest checks
    exact parity vs an in-memory numpy EM with identical init plus
    log-likelihood monotonicity.  Components are sorted by mean and
    rounded so fold order can't flip the hash."""
    from unfurl_ray.ops.fit import gmm_fit

    ds = _parquet_sh(sf_dir, "events", ["event_type", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(
            pc.equal(batch.column("event_type"), "purchase")
        )
        return pa.table(
            {
                "x": pc.ln(
                    pc.add(
                        pc.cast(b.column("value"), pa.float64()),
                        pa.scalar(1.0),
                    )
                )
            }
        )

    params, history = gmm_fit(
        ds.map_batches(prep, batch_format="pyarrow"), "x",
        k=3, iters=12,
    )
    out = params.sort_values("mean").reset_index(drop=True)
    out["component"] = np.arange(len(out), dtype=np.int64)
    for c in ("weight", "mean", "var"):
        out[c] = out[c].round(6)
    out["final_loglik"] = round(history[-1], 2)
    return out


def q_conversion_lag(sf_dir: str) -> pd.DataFrame:
    """First-view -> first-purchase conversion-lag histogram in
    hour buckets.  Two combiner-first min-shuffles collapse events to
    one (user, first ts) row per side BEFORE the join (the shuffle
    carries one row per user, never events); the per-user lag joins
    bucket-co-partitioned and the histogram is a final tiny
    pre_aggregate.  All arithmetic is integer microseconds —
    hash-exact vs the twin."""
    from unfurl_ray.ops.relational import (
        _ts_us, bucketed_hash_join, pre_aggregate,
    )

    def first_of(etype: str, out: str):
        def f(batch: pd.DataFrame) -> pd.DataFrame:
            m = batch["event_type"].to_numpy() == etype
            return pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(
                        np.int64
                    )[m],
                    out: _ts_us(batch["ts"]).to_numpy()[m],
                }
            )

        return pre_aggregate(
            _parquet_sh(
                sf_dir, "events", ["user_id", "event_type", "ts"]
            ).map_batches(f, batch_format="pandas"),
            ["user_id"], {out: (out, "min")},
        )

    views = first_of("view", "vt")
    buys = first_of("purchase", "pt").map_batches(
        lambda b: b.rename_columns(["uid2", "pt"]),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        views, buys, on="user_id", right_on="uid2",
    )

    def lag_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        lag = batch["pt"].to_numpy(np.int64) - batch[
            "vt"
        ].to_numpy(np.int64)
        keep = lag >= 0
        return pd.DataFrame(
            {"lag_hours": lag[keep] // 3_600_000_000}
        )

    out = pre_aggregate(
        joined.map_batches(lag_bucket, batch_format="pandas"),
        ["lag_hours"], {"n_users": ("lag_hours", "count")},
    ).to_pandas()
    out["lag_hours"] = out["lag_hours"].astype("int64")
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values("lag_hours").reset_index(drop=True)


def q_basket_lift(sf_dir: str) -> pd.DataFrame:
    """Association-rule metrics (support / confidence / lift) for
    unordered event-type pairs over per-user baskets — the
    market-basket analysis on top of q_cooccurrence's exact-dedup
    pair machinery.  Per-batch LOCAL (user, type) distinct, one
    user-sharded shuffle co-locates each user's few distinct types,
    pairs fan out after dedup (bounded by |types|^2/2 per user); the
    singleton and basket totals come from the same collapsed table,
    so lift = N * n_ab / (n_a * n_b) closes on a |types|^2-row driver
    frame.  Ratios are exact-integer divisions rounded identically in
    the twin."""
    from unfurl_ray.ops.relational import pre_aggregate

    ds = _parquet_sh(sf_dir, "events", ["user_id", "event_type"])

    def local_distinct(batch: pd.DataFrame) -> pd.DataFrame:
        u = batch[["user_id", "event_type"]].drop_duplicates()
        return pd.DataFrame(
            {
                "user_id": u["user_id"].to_numpy(np.int64),
                "event_type": u["event_type"].to_numpy(),
            }
        )

    # collapsed (user, type) table — one row per distinct pair
    ut = pre_aggregate(
        ds.map_batches(local_distinct, batch_format="pandas"),
        ["user_id", "event_type"],
        {"n": ("event_type", "count")},
    ).select_columns(["user_id", "event_type"]).materialize()

    singles = (
        pre_aggregate(
            ut, ["event_type"], {"n_users": ("event_type", "count")}
        )
        .to_pandas()
        .set_index("event_type")["n_users"]
        .astype(int)
        .to_dict()
    )
    n_baskets = int(
        pre_aggregate(
            ut, ["user_id"], {"k": ("user_id", "count")}
        ).count()
    )

    N_SHARDS = 64

    def add_shard(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_shard"] = (
            pd.util.hash_array(batch["user_id"].to_numpy())
            % np.uint64(N_SHARDS)
        ).astype(np.int64)
        return batch

    def fan_pairs(group: pd.DataFrame) -> pa.Table:
        # q_cooccurrence's vectorized per-run triu fan-out: one
        # map_groups call per SHARD (64 total), never per user
        g = group.sort_values(["user_id", "event_type"])
        keys = g["user_id"].to_numpy()
        types = g["event_type"].to_numpy()
        empty = pa.table(
            {
                "a": pa.array([], pa.string()),
                "b": pa.array([], pa.string()),
            }
        )
        if len(g) == 0:
            return empty
        new = np.empty(len(g), dtype=np.bool_)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(g))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            t = types[s:e]
            if len(t) < 2:
                continue
            ia, ib = np.triu_indices(len(t), k=1)
            a_out.append(t[ia])
            b_out.append(t[ib])
        if not a_out:
            return empty
        return pa.table(
            {
                "a": pa.array(np.concatenate(a_out), pa.string()),
                "b": pa.array(np.concatenate(b_out), pa.string()),
            }
        )

    pair_counts = pre_aggregate(
        ut.map_batches(add_shard, batch_format="pandas")
        .groupby("_shard")
        .map_groups(fan_pairs, batch_format="pandas"),
        ["a", "b"], {"n_ab": ("a", "count")},
    ).to_pandas()

    def _r6(x: pd.Series) -> pd.Series:
        # half-away-from-zero at 6 dp — DuckDB round() semantics;
        # pandas .round is half-to-even and can flip an exact .5
        return np.floor(x * 1e6 + 0.5) / 1e6

    pair_counts["n_a"] = pair_counts["a"].map(singles).astype(int)
    pair_counts["n_b"] = pair_counts["b"].map(singles).astype(int)
    pair_counts["n_ab"] = pair_counts["n_ab"].astype("int64")
    pair_counts["support"] = _r6(pair_counts["n_ab"] / n_baskets)
    pair_counts["confidence"] = _r6(
        pair_counts["n_ab"] / pair_counts["n_a"]
    )
    pair_counts["lift"] = _r6(
        n_baskets
        * pair_counts["n_ab"]
        / (pair_counts["n_a"] * pair_counts["n_b"])
    )
    return (
        pair_counts[
            ["a", "b", "n_ab", "support", "confidence", "lift"]
        ]
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )


def q_tenure_value(sf_dir: str) -> pd.DataFrame:
    """Event value by user tenure (days since the user's first
    event, bucketed by week of life) — the cohort-age analysis.  One
    combiner-first min-shuffle collapses events to per-user first
    timestamps; events then join bucket-co-partitioned on user (the
    shuffle carries (user, ts, cents) stubs, never text); the tenure
    bucketing and the exact-cents rollup close vectorized.  The stub
    projection is deliberately NOT materialized: both consumers
    re-derive it from the pruned parquet read (two streaming scans),
    which at design scale is cheaper than parking an event-cardinality
    table in the object store."""
    from unfurl_ray.ops.relational import (
        _ts_us, bucketed_hash_join, pre_aggregate,
    )

    ev = _parquet_sh(sf_dir, "events", ["user_id", "ts", "value"])

    def stub(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(np.int64),
                "t": _ts_us(batch["ts"]).to_numpy(),
                "cents": np.rint(
                    batch["value"].to_numpy() * 100.0
                ).astype(np.int64),
            }
        )

    stubs = ev.map_batches(stub, batch_format="pandas")
    first = pre_aggregate(
        stubs, ["user_id"], {"t0": ("t", "min")},
    ).map_batches(
        lambda b: b.rename_columns(["uid2", "t0"]),
        batch_format="pyarrow",
    )
    joined = bucketed_hash_join(
        stubs, first, on="user_id", right_on="uid2",
    )

    WEEK_US = 7 * 86_400 * 1_000_000

    def bucketize(batch: pd.DataFrame) -> pd.DataFrame:
        wk = (
            batch["t"].to_numpy(np.int64)
            - batch["t0"].to_numpy(np.int64)
        ) // WEEK_US
        return pd.DataFrame(
            {
                "tenure_week": wk,
                "cents": batch["cents"].to_numpy(np.int64),
            }
        )

    out = pre_aggregate(
        joined.map_batches(bucketize, batch_format="pandas"),
        ["tenure_week"],
        {
            "n_events": ("cents", "count"),
            "rev_cents": ("cents", "sum"),
        },
    ).to_pandas()
    for c in ("tenure_week", "n_events", "rev_cents"):
        out[c] = out[c].astype("int64")
    return out.sort_values("tenure_week").reset_index(drop=True)


def q_linear_attribution(sf_dir: str) -> pd.DataFrame:
    """LINEAR multi-touch attribution spectrum: every purchase
    splits one unit of credit equally over ALL its preceding touches
    within a 1-hour window (vs q_attribution's last-touch winner).
    Composes windowed_pair_join (touch, purchase) pair emission — 2x
    bucket fan-out, no per-user stream — with a per-purchase
    touch-count shuffle and a join-back; the result collapses to the
    exact-integer (touch_type, k) spectrum, so the credit column is
    ONE integer division per row (n/k) and the twin is hash-exact
    with no float-summation-order exposure."""
    from unfurl_ray.ops.relational import (
        _ts_us, bucketed_hash_join, pre_aggregate,
        windowed_pair_join,
    )

    def shape(batch: pd.DataFrame) -> pd.DataFrame:
        et = batch["event_type"].to_numpy()
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(np.int64),
                "ts": batch["ts"],
                "event_id": batch["event_id"].to_numpy(np.int64),
                "kind": np.where(et == "purchase", "buy", "touch"),
            }
        )

    ev = _parquet_sh(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type"]
    ).map_batches(shape, batch_format="pandas")
    pairs = windowed_pair_join(
        ev, "user_id", "ts", "event_id", "kind",
        left_type="touch", right_type="buy", width_s=3600,
    ).materialize()  # consumed twice: per-purchase k + join-back

    k_per_buy = pre_aggregate(
        pairs, ["right_id"], {"k": ("right_id", "count")},
    ).map_batches(
        lambda b: b.rename_columns(["rid2", "k"]),
        batch_format="pyarrow",
    )
    with_k = bucketed_hash_join(
        pairs, k_per_buy, on="right_id", right_on="rid2",
    )

    # touch id -> original event_type (bucketed join against the
    # pruned touch projection; at design scale both sides are big)
    touch_types = _parquet_sh(
        sf_dir, "events", ["event_id", "event_type"]
    ).map_batches(
        lambda b: b.filter(
            pc.not_equal(b.column("event_type"), "purchase")
        ).rename_columns(["tid", "event_type"]),
        batch_format="pyarrow",
    )
    typed = bucketed_hash_join(
        with_k, touch_types, on="left_id", right_on="tid",
    )

    out = pre_aggregate(
        typed, ["event_type", "k"],
        {"n_touches": ("left_id", "count")},
    ).to_pandas()
    out["k"] = out["k"].astype("int64")
    out["n_touches"] = out["n_touches"].astype("int64")
    # exact: one integer division per row, half-away to 6 dp
    out["credit"] = np.floor(
        out["n_touches"] / out["k"] * 1e6 + 0.5
    ) / 1e6
    return (
        out[["event_type", "k", "n_touches", "credit"]]
        .sort_values(["event_type", "k"])
        .reset_index(drop=True)
    )


def q_return_rate(sf_dir: str) -> pd.DataFrame:
    """Return rate per part brand: part collapses to a broadcast
    (sorted partkey -> brand code) lookup; one pass of per-batch
    partial (total, returned) counts per brand folds into a tiny
    rollup — integer counts, one division per output row, no
    join, no big shuffle."""
    import ray

    from unfurl_ray.ops.relational import (
        _broadcast_fetch, pre_aggregate,
    )

    part = (
        _parquet(sf_dir, "part", ["p_partkey", "p_brand"])
        .to_pandas()
        .sort_values("p_partkey")
    )
    brands = sorted(part["p_brand"].unique())
    code = {b: i for i, b in enumerate(brands)}
    part_ref = ray.put(
        (
            part["p_partkey"].to_numpy(np.int64),
            part["p_brand"].map(code).to_numpy(np.int64),
        )
    )

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        keys, bc = _broadcast_fetch(part_ref)
        pk = batch["l_partkey"].to_numpy(np.int64)
        idx = np.clip(
            np.searchsorted(keys, pk), 0, max(len(keys) - 1, 0)
        )
        hit = keys[idx] == pk if len(keys) else np.zeros(
            len(pk), np.bool_
        )
        ret = (
            batch["l_returnflag"].to_numpy() == "R"
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "brand_code": bc[idx][hit],
                "one": np.ones(int(hit.sum()), np.int64),
                "returned": ret[hit],
            }
        )

    out = pre_aggregate(
        _parquet_sh(
            sf_dir, "lineitem", ["l_partkey", "l_returnflag"]
        ).map_batches(partials, batch_format="pandas"),
        ["brand_code"],
        {
            "n_items": ("one", "sum"),
            "n_returned": ("returned", "sum"),
        },
    ).to_pandas()
    out["p_brand"] = out["brand_code"].map(
        {v: k for k, v in code.items()}
    )
    for c in ("n_items", "n_returned"):
        out[c] = out[c].astype("int64")
    out["return_rate"] = np.floor(
        out["n_returned"] / out["n_items"] * 1e6 + 0.5
    ) / 1e6
    return (
        out[["p_brand", "n_items", "n_returned", "return_rate"]]
        .sort_values("p_brand")
        .reset_index(drop=True)
    )


def q_stickiness(sf_dir: str) -> pd.DataFrame:
    """DAU/WAU stickiness ratio per day: two combiner-first distinct
    shuffles ((user, day) and (user, week)) collapse to integer
    active counts; each day's ratio is ONE integer division against
    its containing week (half-away 6 dp) — no float summation
    anywhere."""
    from unfurl_ray.ops.relational import _ts_us, pre_aggregate

    DAY_US = 86_400 * 1_000_000

    ds = _parquet_sh(sf_dir, "events", ["user_id", "ts"])

    def days(batch: pd.DataFrame) -> pd.DataFrame:
        d = _ts_us(batch["ts"]).to_numpy() // DAY_US
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(np.int64),
                "day": d,
            }
        )

    ud = pre_aggregate(
        ds.map_batches(days, batch_format="pandas"),
        ["user_id", "day"], {"n": ("day", "count")},
    ).select_columns(["user_id", "day"]).materialize()

    dau = pre_aggregate(
        ud, ["day"], {"dau": ("day", "count")},
    ).to_pandas()
    uw = pre_aggregate(
        ud.map_batches(
            lambda b: pd.DataFrame(
                {
                    "user_id": b["user_id"],
                    "week": b["day"].to_numpy(np.int64) // 7,
                }
            ),
            batch_format="pandas",
        ),
        ["user_id", "week"], {"n": ("week", "count")},
    )
    wau = pre_aggregate(
        uw.select_columns(["user_id", "week"]),
        ["week"], {"wau": ("week", "count")},
    ).to_pandas().set_index("week")["wau"].astype(int).to_dict()

    dau["day"] = dau["day"].astype("int64")
    dau["dau"] = dau["dau"].astype("int64")
    dau["wau"] = (dau["day"] // 7).map(wau).astype("int64")
    dau["stickiness"] = np.floor(
        dau["dau"] / dau["wau"] * 1e6 + 0.5
    ) / 1e6
    return (
        dau[["day", "dau", "wau", "stickiness"]]
        .sort_values("day")
        .reset_index(drop=True)
    )


def q_fill_lag(sf_dir: str) -> pd.DataFrame:
    """Order-fill lag histogram: days from order date to the order's
    FIRST shipment.  The aggregate AND the join fuse into ONE
    orderkey shuffle: both sides union with int64-max sentinels in
    the other side's column and a single (min, min) groupby yields
    (orderkey, orderdate, first shipdate) — there is no separate
    aggregate-then-join round trip.  The day-lag histogram is a final
    tiny pre_aggregate — all integer-microsecond arithmetic."""
    from unfurl_ray.ops.relational import _ts_us, pre_aggregate

    DAY_US = 86_400 * 1_000_000
    SENTINEL = np.iinfo(np.int64).max

    li = _parquet_sh(
        sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "okey": b["l_orderkey"].to_numpy(np.int64),
                "od_us": np.full(len(b), SENTINEL, np.int64),
                "ship_us": _ts_us(b["l_shipdate"]).to_numpy(),
            }
        ),
        batch_format="pandas",
    )
    orders = _parquet_sh(
        sf_dir, "orders", ["o_orderkey", "o_orderdate"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "okey": b["o_orderkey"].to_numpy(np.int64),
                "od_us": _ts_us(b["o_orderdate"]).to_numpy(),
                "ship_us": np.full(len(b), SENTINEL, np.int64),
            }
        ),
        batch_format="pandas",
    )
    per_order = pre_aggregate(
        li.union(orders), ["okey"],
        {"od_us": ("od_us", "min"), "ship_us": ("ship_us", "min")},
    )

    def lag(batch: pd.DataFrame) -> pd.DataFrame:
        od = batch["od_us"].to_numpy(np.int64)
        sh = batch["ship_us"].to_numpy(np.int64)
        # sentinel rows = orders with no lineitem / orphan lineitems
        keep = (od != SENTINEL) & (sh != SENTINEL)
        return pd.DataFrame(
            {"lag_days": (sh[keep] - od[keep]) // DAY_US}
        )

    out = pre_aggregate(
        per_order.map_batches(lag, batch_format="pandas"),
        ["lag_days"], {"n_orders": ("lag_days", "count")},
    ).to_pandas()
    out["lag_days"] = out["lag_days"].astype("int64")
    out["n_orders"] = out["n_orders"].astype("int64")
    return out.sort_values("lag_days").reset_index(drop=True)


def q_dup_char_share(sf_dir: str) -> pd.DataFrame:
    """Dedup ROI report: per source, what share of corpus CHARACTERS
    sits in duplicated texts (exact-dup groups of size >= 2).  The
    md5 groupby carries (digest, source, n_chars) stubs — never
    text; group sizes join back onto the stubs in the same bucketed
    shuffle family, and the per-source rollup keeps everything in
    exact integers until one final division."""
    from unfurl_ray.ops.relational import (
        bucketed_hash_join, pre_aggregate,
    )

    ds = _parquet_sh(
        sf_dir, "documents", ["text", "source", "n_chars"]
    )

    def stub(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        digests = [
            hashlib.md5(t.encode()).hexdigest()
            for t in batch["text"]
        ]
        return pd.DataFrame(
            {
                "digest": digests,
                "source": batch["source"].to_numpy(),
                "n_chars": batch["n_chars"].to_numpy(np.int64),
            }
        )

    stubs = ds.map_batches(stub, batch_format="pandas").materialize()
    sizes = pre_aggregate(
        stubs, ["digest"], {"gsize": ("digest", "count")},
    ).map_batches(
        lambda b: b.rename_columns(["d2", "gsize"]),
        batch_format="pyarrow",
    )
    tagged = bucketed_hash_join(
        stubs, sizes, on="digest", right_on="d2",
    )

    def split(batch: pd.DataFrame) -> pd.DataFrame:
        dup = (batch["gsize"].to_numpy(np.int64) >= 2).astype(
            np.int64
        )
        nc = batch["n_chars"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "source": batch["source"].to_numpy(),
                "total_chars": nc,
                "dup_chars": nc * dup,
            }
        )

    out = pre_aggregate(
        tagged.map_batches(split, batch_format="pandas"),
        ["source"],
        {
            "total_chars": ("total_chars", "sum"),
            "dup_chars": ("dup_chars", "sum"),
        },
    ).to_pandas()
    for c in ("total_chars", "dup_chars"):
        out[c] = out[c].astype("int64")
    out["dup_share"] = np.floor(
        out["dup_chars"] / out["total_chars"] * 1e6 + 0.5
    ) / 1e6
    return (
        out[["source", "total_chars", "dup_chars", "dup_share"]]
        .sort_values("source")
        .reset_index(drop=True)
    )


def q_abc_analysis(sf_dir: str) -> pd.DataFrame:
    """ABC / Pareto inventory classification: parts ranked by revenue
    (exact 1e-4-dollar integers), class A = rows while cumulative
    share <= 80%, B = to 95%, C = rest — ties broken by partkey like
    the twin's window.  Distributed shape: one combiner-first
    per-part shuffle, then a (value -> count) histogram whose driver
    fold is bounded by DISTINCT revenue values (the q_budget_select
    tie-class pattern; a 100 TB run would quantize values to bound
    the class count).  Boundary tie classes split by exact integer
    arithmetic — no row-level sort, no id fetch at all."""
    from unfurl_ray.ops.relational import (
        bucketed_aggregate, pre_aggregate,
    )

    def rev_e4(batch: pa.Table) -> pa.Table:
        cents = np.rint(
            batch.column("l_extendedprice").to_numpy(
                zero_copy_only=False
            )
            * 100.0
        ).astype(np.int64)
        disc_h = np.rint(
            batch.column("l_discount").to_numpy(
                zero_copy_only=False
            )
            * 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "l_partkey": batch.column("l_partkey").cast(
                    pa.int64()
                ),
                "val": pa.array(
                    cents * (100 - disc_h), pa.int64()
                ),
            }
        )

    per_part = pre_aggregate(
        _parquet_sh(
            sf_dir, "lineitem",
            ["l_partkey", "l_extendedprice", "l_discount"],
        ).map_batches(rev_e4, batch_format="pyarrow"),
        ["l_partkey"], {"val": ("val", "sum")},
    )
    hist = (
        bucketed_aggregate(
            per_part, ["val"], {"k": ("l_partkey", "count")}
        )
        .to_pandas()
        .sort_values("val", ascending=False)
        .reset_index(drop=True)
    )
    v = hist["val"].astype("int64").to_numpy()
    k = hist["k"].astype("int64").to_numpy()
    t = int((v * k).sum())
    cb = np.concatenate(([0], np.cumsum(v * k)[:-1]))

    def rows_within(pct: int) -> np.ndarray:
        # rows i=1..k of a tie class satisfy
        # (cb + i*v)*100 <= pct*t  ->  i <= (pct*t - 100*cb)/(100*v)
        lim = (pct * t - 100 * cb) // (100 * np.maximum(v, 1))
        return np.clip(lim, 0, k)

    n_a = rows_within(80)
    n_ab = rows_within(95)
    rows = {
        "A": (int(n_a.sum()), int((n_a * v).sum())),
        "B": (int((n_ab - n_a).sum()), int(((n_ab - n_a) * v).sum())),
        "C": (int((k - n_ab).sum()), int(((k - n_ab) * v).sum())),
    }
    return pd.DataFrame(
        {
            "cls": list(rows),
            "n_parts": [rows[c][0] for c in rows],
            "class_val": [rows[c][1] for c in rows],
        }
    ).astype({"n_parts": "int64", "class_val": "int64"})


def q_drawdown(sf_dir: str) -> pd.DataFrame:
    """Worst daily-revenue drop from the running peak: the daily
    exact-cents rollup is one combiner-first shuffle; the running
    max over the (bounded, ~thousands at any scale) day series
    closes on the driver.  One-row output, all integers."""
    from unfurl_ray.ops.relational import _ts_us, pre_aggregate

    DAY_US = 86_400 * 1_000_000

    ds = _parquet_sh(sf_dir, "events", ["ts", "value"])

    def daily(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "day": _ts_us(batch["ts"]).to_numpy() // DAY_US,
                "cents": np.rint(
                    batch["value"].to_numpy() * 100.0
                ).astype(np.int64),
            }
        )

    d = (
        pre_aggregate(
            ds.map_batches(daily, batch_format="pandas"),
            ["day"], {"rev": ("cents", "sum")},
        )
        .to_pandas()
        .sort_values("day")
    )
    rev = d["rev"].astype("int64").to_numpy()
    peak = np.maximum.accumulate(rev)
    return pd.DataFrame(
        {"max_drawdown_cents": [int((peak - rev).max())]}
    ).astype("int64")
