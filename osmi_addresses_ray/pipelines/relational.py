"""Generic relational operators over Ray Data — the engine's query surface.

These wrap the Dataset API with the scale idioms from SURVEY §4.2:
- ``grouped_agg`` pre-aggregates per batch (pandas groupby inside
  ``map_batches``) before the global shuffle, so the all-to-all moves one row
  per (key × batch) instead of every input row;
- joins use the native hash-partitioned ``Dataset.join``;
- ``topk`` takes per-block partial top-k before a driver-side merge
  (no global sort).

Each public query function takes ``sf_dir`` and returns a Dataset or pandas
DataFrame whose column NAMES match the paired oracle SQL in
``__ray_entry__.oracle_sql``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def read(sf_dir: str, table: str, columns=None):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# --- grouped aggregate with partial pre-aggregation --------------------------

_PARTIAL = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
    "mean": (None, None),  # expands to sum+count
}


def grouped_agg(ds, keys: list[str], spec: dict[str, tuple[str | None, str]]):
    """``spec``: alias → (column|None, fn) with fn ∈ sum/count/min/max/mean.

    Partial aggregation per batch via Arrow-native ``Table.group_by`` (NOT a
    pandas round-trip — pandas' ns-timestamp/object metadata poisons the
    downstream shuffle, measured 11s vs 0.95s on the events table), then a
    small global groupby over the partials.
    """
    plan: list[tuple[str, str, str]] = []  # (partial_col, src_col, fn)
    finalize: list[tuple[str, str]] = []  # (alias, kind)
    for alias, (col, fn) in spec.items():
        if fn == "mean":
            plan.append((f"__{alias}_s", col, "sum"))
            plan.append((f"__{alias}_c", col, "count"))
            finalize.append((alias, "mean"))
        elif fn == "count":
            plan.append((f"__{alias}", keys[0] if col is None else col, "count"))
            finalize.append((alias, "count"))
        else:
            plan.append((f"__{alias}", col, fn))
            finalize.append((alias, fn))

    uniq: dict[tuple[str, str], list[str]] = {}
    for pcol, col, fn in plan:
        uniq.setdefault((col, fn), []).append(pcol)
    arrow_aggs = list(uniq.keys())

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(keys, use_threads=False).aggregate(arrow_aggs)
        out = {k: g[k] for k in keys}
        for (col, fn), pcols in uniq.items():
            src = g[f"{col}_{fn}"]
            for p in pcols:
                out[p] = src
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)

    from ray.data.aggregate import Max, Min, Sum

    aggs = []
    for pcol, _c, fn in plan:
        merge = _PARTIAL["count"][1] if fn == "count" else _PARTIAL[fn][1]
        cls = {"sum": Sum, "min": Min, "max": Max}[merge]
        aggs.append(cls(pcol, alias_name=pcol))
    merged = partials.groupby(keys).aggregate(*aggs)

    def final(t: pa.Table) -> pa.Table:
        cols = {k: t[k] for k in keys}
        for alias, kind in finalize:
            if kind == "mean":
                cols[alias] = pc.divide(
                    pc.cast(t[f"__{alias}_s"], pa.float64()),
                    pc.cast(t[f"__{alias}_c"], pa.float64()),
                )
            else:
                cols[alias] = t[f"__{alias}"]
        return pa.table(cols)

    return merged.map_batches(final, batch_format="pyarrow")


def topk(
    ds, col: str, k: int, *, descending: bool = True, tie_cols: list[str] | None = None
) -> pd.DataFrame:
    """Per-block partial top-k, merged on the driver — no global sort.

    ``tie_cols``: deterministic ascending tie-break at the k-th value (without
    it, rows tied at the boundary are kept in batch-arrival order — fine for
    exploration, wrong for oracle comparison).
    """
    ties = list(tie_cols or [])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        # keep="all" keeps every row tied at the k-th value so the tie-break
        # sort below can pick the deterministic winners
        top = df.nlargest(k, col, keep="all") if descending else df.nsmallest(k, col, keep="all")
        if ties:
            top = top.sort_values([col] + ties, ascending=[not descending] + [True] * len(ties))
        return top.head(k)

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    parts = parts.sort_values(
        [col] + ties, ascending=[not descending] + [True] * len(ties), kind="stable"
    )
    return parts.head(k).reset_index(drop=True)


# --- driver-facing queries (testdata tables) ---------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style: grouped sums over lineitem with a date filter."""
    ds = read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(np.datetime64("1998-09-01", "us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], cutoff))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("disc_price", disc)

    ds = ds.map_batches(prep, batch_format="pyarrow")
    out = grouped_agg(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("l_quantity", "sum"),
            "sum_base_price": ("l_extendedprice", "sum"),
            "sum_disc_price": ("disc_price", "sum"),
            "avg_qty": ("l_quantity", "mean"),
            "count_order": (None, "count"),
        },
    )
    df = out.to_pandas().sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    for c in ("sum_base_price", "sum_disc_price", "avg_qty"):
        df[c] = df[c].round(4)
    return df


def q_filter_high_value(sf_dir: str):
    """Predicate + projection pushdown."""
    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)),
        batch_format="pyarrow",
    )
    df = ds.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
    return df


# fact-side row count above which aggregation is pushed below a join: the
# pushdown trades one extra groupby exchange (fixed ~2s latency at toy
# scale) for shuffling one row per key instead of one per fact row — a
# clear win once the fact side dominates the exchange
PUSHDOWN_ROWS = 5_000_000

# dimension-side row count under which a fact ⨝ dim join is executed as a
# broadcast (ray.put the dim once, vectorized searchsorted probe inside
# map_batches) instead of an all-to-all hash shuffle of the fact side —
# the canonical small-side pattern; above the budget the native
# hash-partitioned Dataset.join takes over
BROADCAST_ROWS = 5_000_000


def broadcast_inner_join(fact, dim, *, left_on: str, right_on: str, take_cols: list[str]):
    """fact ⨝ dim on an integer key with the dim side broadcast.

    The dim's (key, take_cols) columns are collected once on the driver
    (bounded by BROADCAST_ROWS at call sites), key-sorted, and shipped via
    ``ray.put``; every fact batch probes with one ``np.searchsorted`` and
    appends the dim columns by Arrow ``take``. Rows without a match are
    dropped (inner semantics). Equivalent to
    ``fact.join(dim, join_type="inner", ...)`` restricted to ``take_cols``.
    """
    import ray

    dim_tab = pa.concat_tables(
        ray.get(dim.select_columns([right_on] + take_cols).to_arrow_refs())
    ).combine_chunks()
    keys = dim_tab[right_on].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    side = {
        "keys": keys[order],
        "cols": {c: dim_tab[c].take(pa.array(order)).combine_chunks() for c in take_cols},
    }
    ref = ray.put(side)

    def probe(t: pa.Table, _ref=ref, _left_on=left_on) -> pa.Table:
        from ..state.broadcast import get_cached

        s = get_cached(_ref)
        sk = s["keys"]
        if len(sk) == 0:
            t = t.slice(0, 0)
            for c, arr in s["cols"].items():
                t = t.append_column(c, arr.slice(0, 0))
            return t
        fk = t[_left_on].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(sk, fk)
        pos_c = np.minimum(pos, len(sk) - 1)
        hit = sk[pos_c] == fk
        if not hit.all():
            t = t.filter(pa.array(hit))
            pos_c = pos_c[hit]
        idx = pa.array(pos_c, pa.int64())
        for c, arr in s["cols"].items():
            t = t.append_column(c, arr.take(idx))
        return t

    return fact.map_batches(probe, batch_format="pyarrow")


def q_join_orders_customers(sf_dir: str, *, pushdown: bool | None = None, broadcast: bool | None = None):
    """Hash join orders ⨝ customer, revenue per market segment.

    Adaptive group-pushdown: above PUSHDOWN_ROWS the orders side
    pre-aggregates per custkey so the join moves one row per customer
    instead of one per order (correct because custkey functionally
    determines the join's right side)."""
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    if pushdown is None:
        pushdown = orders.count() > PUSHDOWN_ROWS  # parquet metadata, no scan
    if broadcast is None:
        broadcast = cust.count() <= BROADCAST_ROWS  # parquet metadata, no scan
    if pushdown:
        pre = grouped_agg(
            orders,
            ["o_custkey"],
            {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")},
        )
        spec = {"revenue": ("revenue", "sum"), "n_orders": ("n_orders", "sum")}
        if broadcast:
            j = broadcast_inner_join(
                pre, cust, left_on="o_custkey", right_on="c_custkey",
                take_cols=["c_mktsegment"],
            )
        else:
            j = pre.join(
                cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
            )
    else:
        spec = {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")}
        if broadcast:
            j = broadcast_inner_join(
                orders, cust, left_on="o_custkey", right_on="c_custkey",
                take_cols=["c_mktsegment"],
            )
        else:
            j = orders.join(
                cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
            )
    out = grouped_agg(j, ["c_mktsegment"], spec)
    df = out.to_pandas().sort_values("c_mktsegment").reset_index(drop=True)
    df["revenue"] = df["revenue"].round(4)
    return df


def q_top_orders(sf_dir: str):
    """Top-10 orders by totalprice (partial top-k, no global sort)."""
    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    df = topk(ds, "o_totalprice", 10, tie_cols=["o_orderkey"])
    return df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).reset_index(
        drop=True
    )


def q_supplier_part_join(sf_dir: str, *, pushdown: bool | None = None, broadcast: bool | None = None):
    """lineitem ⨝ part grouped by brand, with adaptive aggregation pushdown
    (lineitem pre-aggregates per partkey above PUSHDOWN_ROWS — the join then
    moves one row per part, not one per lineitem)."""
    li = read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice"])
    part = read(sf_dir, "part", columns=["p_partkey", "p_brand"])
    if pushdown is None:
        pushdown = li.count() > PUSHDOWN_ROWS
    if broadcast is None:
        broadcast = part.count() <= BROADCAST_ROWS
    if pushdown:
        pre = grouped_agg(
            li, ["l_partkey"], {"revenue": ("l_extendedprice", "sum"), "n_items": (None, "count")}
        )
        spec = {"revenue": ("revenue", "sum"), "n_items": ("n_items", "sum")}
        if broadcast:
            j = broadcast_inner_join(
                pre, part, left_on="l_partkey", right_on="p_partkey",
                take_cols=["p_brand"],
            )
        else:
            j = pre.join(
                part, join_type="inner", num_partitions=8, on=("l_partkey",), right_on=("p_partkey",)
            )
    else:
        spec = {"revenue": ("l_extendedprice", "sum"), "n_items": (None, "count")}
        if broadcast:
            j = broadcast_inner_join(
                li, part, left_on="l_partkey", right_on="p_partkey",
                take_cols=["p_brand"],
            )
        else:
            j = li.join(
                part, join_type="inner", num_partitions=8, on=("l_partkey",), right_on=("p_partkey",)
            )
    out = grouped_agg(j, ["p_brand"], spec)
    df = out.to_pandas().sort_values("p_brand").reset_index(drop=True)
    df["revenue"] = df["revenue"].round(4)
    return df


def q_distinct_event_types(sf_dir: str):
    ds = read(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pd.DataFrame({"event_type": vals})


def q_events_hourly(sf_dir: str):
    """Tumbling 1h window per event_type (stream-shaped groupby)."""
    ds = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        w = pc.floor_temporal(t["ts"], unit="hour")
        return t.append_column("window_start", w)

    ds = ds.map_batches(add_window, batch_format="pyarrow")
    out = grouped_agg(
        ds,
        ["event_type", "window_start"],
        {"n_events": (None, "count"), "sum_value": ("value", "sum")},
    )
    df = out.to_pandas().sort_values(["event_type", "window_start"]).reset_index(drop=True)
    df["sum_value"] = df["sum_value"].round(4)
    return df


def q_nation_region_join(sf_dir: str):
    """Broadcast join: tiny region side shipped via a plain dict lookup."""
    region = {r["r_regionkey"]: r["r_name"] for r in read(sf_dir, "region").take_all()}
    nation = read(sf_dir, "nation")

    def f(t: pa.Table) -> pa.Table:
        keys = t["n_regionkey"].to_numpy(zero_copy_only=False)
        names = pa.array([region[int(k)] for k in keys], pa.string())
        return t.append_column("r_name", names)

    df = nation.map_batches(f, batch_format="pyarrow").to_pandas()
    return df.sort_values("n_nationkey").reset_index(drop=True)


def q_customer_order_counts(sf_dir: str):
    """Left-ish aggregate: orders per customer incl. aggregate sort+limit."""
    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    agg = grouped_agg(
        orders, ["o_custkey"], {"n_orders": (None, "count"), "total": ("o_totalprice", "sum")}
    )
    df = agg.to_pandas()
    df["total"] = df["total"].round(4)
    return df.sort_values("o_custkey").reset_index(drop=True)
