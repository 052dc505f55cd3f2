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
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..ops import fit_hash_shuffle, join_parts_for


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


def grouped_agg_direct(
    ds,
    keys: list[str],
    spec: dict,
    *,
    num_parts: int = 8,
    empty_schema: pa.Schema | None = None,
):
    """``grouped_agg`` for HIGH-cardinality keys.

    Ray's sort-based ``groupby().aggregate()`` costs ~50 µs per distinct
    group (measured round 4: 7.3 s over the 134k-group assoc_rules partial
    table); past a few tens of thousands of keys the direct hash exchange
    with a per-partition pandas groupby is ~10x faster. Same ``spec``
    contract as ``grouped_agg`` for sum/count/min/max (mean = sum+count
    finalize, identical float semantics; null keys group, matching the
    Arrow ``group_by`` partial).

    ``empty_schema``: the FINAL output schema (keys + aliases). On a fully
    empty input the partial plan never runs, so no schema can be inferred —
    with ``empty_schema`` the group-agg of nothing short-circuits to a typed
    empty Dataset; without it, empty input raises (loudly, at plan time,
    instead of a ``None`` schema dying inside the exchange's split task)."""
    from ..ops import direct_partitioned_map

    plan: list[tuple[str, str, str]] = []
    finalize: list[tuple[str, str]] = []
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
    sample = partials.schema()
    sample = getattr(sample, "base_schema", sample)
    if sample is None:
        # fully empty input: the partial fn never ran, so nothing can be
        # inferred — and the group-agg of nothing IS nothing, so skip the
        # exchange entirely rather than shipping a None schema into it
        if empty_schema is not None:
            import ray

            # from_arrow_refs, not from_arrow: from_arrow drops a 0-row
            # table's schema, from_arrow_refs keeps the typed block
            return rd.from_arrow_refs([ray.put(empty_schema.empty_table())])
        raise ValueError(
            "grouped_agg_direct: input dataset is empty and no empty_schema "
            "was given; pass empty_schema=<final output schema> to support "
            "degenerate inputs"
        )
    merge_of = {
        pcol: ("sum" if fn in ("sum", "count") else fn) for pcol, _c, fn in plan
    }

    def reduce_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sample.empty_table()
        df = t.to_pandas()
        # dropna=False: Arrow group_by (the partial) keeps null keys as a
        # group — the merge must too. select(sample.names): pandas emits agg
        # columns in plan order, which diverges from the partial-schema
        # order for specs mixing mean with another agg on one source column;
        # cast() matches by position, so normalize the order first.
        g = df.groupby(keys, sort=False, as_index=False, dropna=False).agg(merge_of)
        return (
            pa.Table.from_pandas(g, preserve_index=False)
            .select(sample.names)
            .cast(sample)
        )

    merged = direct_partitioned_map(
        partials, keys, num_parts, reduce_fn, sample
    )

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
    ds,
    col: str,
    k: int,
    *,
    descending: bool = True,
    tie_cols: list[str] | None = None,
    empty_schema: pa.Schema | None = None,
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
    if len(parts.columns) == 0:
        # all-rows-filtered input: Ray's to_pandas loses columns. Callers
        # with a full schema contract pass empty_schema; otherwise at least
        # the sort columns must exist so EVERY call site survives empty
        if empty_schema is not None:
            parts = empty_schema.empty_table().to_pandas()
        else:
            parts = pd.DataFrame({c: pd.Series(dtype=object) for c in [col] + ties})
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
    from osmi_addresses_ray.ops import to_pandas_typed

    df = to_pandas_typed(
        out,
        pa.schema(
            [("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
             ("sum_qty", pa.float64()), ("sum_base_price", pa.float64()),
             ("sum_disc_price", pa.float64()), ("avg_qty", pa.float64()),
             ("count_order", pa.int64())]
        ),
    ).sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
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
    from osmi_addresses_ray.ops import to_pandas_typed

    df = to_pandas_typed(
        ds,
        pa.schema(
            [("o_orderkey", pa.int64()), ("o_totalprice", pa.float64()),
             ("o_orderstatus", pa.string())]
        ),
    ).sort_values("o_orderkey").reset_index(drop=True)
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
            n = cust.count()
            j = pre.join(
                cust, join_type="inner",
                on=("o_custkey",), right_on=("c_custkey",),
                **fit_hash_shuffle(join_parts_for(n), est_rows=n),
            )
    else:
        spec = {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")}
        if broadcast:
            j = broadcast_inner_join(
                orders, cust, left_on="o_custkey", right_on="c_custkey",
                take_cols=["c_mktsegment"],
            )
        else:
            n = max(orders.count(), cust.count())
            j = orders.join(
                cust, join_type="inner",
                on=("o_custkey",), right_on=("c_custkey",),
                **fit_hash_shuffle(join_parts_for(n), est_rows=n),
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
            n = part.count()
            j = pre.join(
                part, join_type="inner",
                on=("l_partkey",), right_on=("p_partkey",),
                **fit_hash_shuffle(join_parts_for(n), est_rows=n),
            )
    else:
        spec = {"revenue": ("l_extendedprice", "sum"), "n_items": (None, "count")}
        if broadcast:
            j = broadcast_inner_join(
                li, part, left_on="l_partkey", right_on="p_partkey",
                take_cols=["p_brand"],
            )
        else:
            n = max(li.count(), part.count())
            j = li.join(
                part, join_type="inner",
                on=("l_partkey",), right_on=("p_partkey",),
                **fit_hash_shuffle(join_parts_for(n), est_rows=n),
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


def grouped_quantiles(
    ds, key: str, col: str, quantiles: Sequence[float]
) -> pd.DataFrame:
    """Exact per-group quantiles in ONE streaming pass — no global sort.

    Shape for scale: each batch collapses to a (key, value, count) partial
    histogram via Arrow ``group_by`` (the exchange then carries one row per
    DISTINCT (key, value) per batch, not per input row); a global groupby
    merges the partials; only the merged histogram — bounded by the value
    domain, not the row count — reaches the driver, where a cumsum walk reads
    off the discrete quantiles. This is exact whenever the value domain is
    materially smaller than the data (prices, quantities, durations). For a
    truly continuous unbounded column the same pass degrades gracefully into
    "histogram as large as the data": switch to fixed-width binning plus a
    per-bin refinement pass (not needed for any testdata column).

    Quantile definition matches DuckDB ``quantile_disc``: the value at index
    ``max(0, ceil(p*n) - 1)`` of the sorted column (verified empirically).
    """
    hist = grouped_agg(ds, [key, col], {"cnt": (None, "count")}).to_pandas()
    return quantiles_from_histogram(hist, key, col, quantiles)


def quantiles_from_histogram(
    hist: pd.DataFrame, key: str, col: str, quantiles: Sequence[float]
) -> pd.DataFrame:
    """Driver-side cumsum walk over a merged (key, value, count) histogram
    (separated out so the index rule is directly property-testable)."""
    hist = hist.sort_values([key, col], kind="stable").reset_index(drop=True)
    rows = []
    for k, g in hist.groupby(key, sort=True):
        counts = g["cnt"].to_numpy(np.int64)
        values = g[col].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        row = {key: k}
        for p in quantiles:
            idx = max(0, int(np.ceil(p * n)) - 1)
            row[f"p{int(round(p * 100)):02d}"] = values[np.searchsorted(cum, idx, side="right")]
        rows.append(row)
    return pd.DataFrame(rows)


def q_price_quantiles(sf_dir: str):
    """Exact discrete quantiles of l_extendedprice per return flag.

    Uses the binned two-pass variant: extendedprice is near-unique (qty ×
    part price), so the value-histogram exchange would carry ~the whole
    column (measured 18 s vs 1.4 s at sf0.1)."""
    ds = read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    df = grouped_quantiles_binned(
        ds, "l_returnflag", "l_extendedprice", [0.25, 0.50, 0.75, 0.90, 0.99]
    )
    return df.sort_values("l_returnflag").reset_index(drop=True)


def grouped_topk(
    ds,
    key: str,
    col: str,
    k: int,
    *,
    tie_col: str,
    extra_cols: Sequence[str] = (),
) -> pd.DataFrame:
    """Per-group top-k (``col`` desc, ``tie_col`` asc) without a global sort.

    Two-level reduction: every batch first collapses to at most k rows per
    key it contains (vectorized pandas sort + groupby-cumcount — no Python
    per-group loop), so the hash exchange moves ≤ k rows per (key × batch);
    the partitioned finalize then re-applies the same reduction per key with
    all of a key's survivors co-located. Adding a ``rank`` column makes the
    output self-describing (and matches ROW_NUMBER() in the oracle).
    """
    cols = [key, col, tie_col, *extra_cols]

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key, col, tie_col], ascending=[True, False, True], kind="stable")
        keep = df.groupby(key, sort=False).cumcount() < k
        return df[keep.to_numpy()]

    partial = ds.select_columns(cols).map_batches(_reduce, batch_format="pandas")

    def _finalize(t: pa.Table) -> pa.Table:
        df = _reduce(t.to_pandas())
        rank = df.groupby(key, sort=False).cumcount().to_numpy() + 1
        out = pa.Table.from_pandas(df, preserve_index=False)
        return out.append_column("rank", pa.array(rank, pa.int64()))

    from osmi_addresses_ray.ops import partitioned_map

    final = partitioned_map(partial, [key], num_parts=16, fn=_finalize)
    return final.to_pandas().sort_values([key, "rank"], kind="stable").reset_index(drop=True)


def q_top_orders_per_customer(sf_dir: str):
    """Grouped top-3 orders per customer by total price (window-function
    shape rebuilt as two-level partial top-k + hash exchange)."""
    ds = read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"])
    return grouped_topk(ds, "o_custkey", "o_totalprice", 3, tie_col="o_orderkey")


# --- bloom-filter semi-join ---------------------------------------------------

_BLOOM_BITS = 1 << 20  # 128 KiB per filter; ~0.01% FP at 10k keys, k=4
_BLOOM_K = 4


def _bloom_hashes(keys: np.ndarray, num_bits: int = _BLOOM_BITS):
    """Double hashing: k bit indexes per key from one splitmix64 pass.

    idx_i = (h1 + i*h2) mod m — the standard Kirsch-Mitzenmacher scheme, so
    the per-key cost is one 64-bit mix regardless of k.
    """
    x = keys.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(
        0xFFFFFFFFFFFFFFFF
    )
    z = z ^ (z >> np.uint64(31))
    h1 = z & np.uint64(0xFFFFFFFF)
    h2 = (z >> np.uint64(32)) | np.uint64(1)  # odd → full-period stride
    m = np.uint64(num_bits)
    return [((h1 + np.uint64(i) * h2) % m).astype(np.int64) for i in range(_BLOOM_K)]


def _bloom_member(bits: np.ndarray, keys: np.ndarray, num_bits: int = _BLOOM_BITS) -> np.ndarray:
    ok = np.ones(len(keys), dtype=bool)
    for idx in _bloom_hashes(keys, num_bits):
        ok &= (bits[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1) != 0
    return ok


def _sorted_member(have: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``keys`` in the sorted unique array ``have``."""
    if len(have) == 0:
        return np.zeros(len(keys), dtype=bool)
    pos = np.searchsorted(have, keys)
    pos[pos >= len(have)] = 0
    return have[pos] == keys


def bloom_semi_join(
    probe,
    probe_key: str,
    build,
    build_key: str,
    *,
    num_parts: int = 16,
    num_bits: int = _BLOOM_BITS,
):
    """EXACT distributed semi-join with a bloom pre-filter on the probe side.

    The build side collapses to per-batch 128 KiB bitsets (map_batches), a
    second 64-way map level ORs them, and the driver ORs the ≤ n_blocks/64
    survivors — a two-level tree reduce, so at 10⁶ blocks the driver sees
    ~16k blobs, not the key stream. The merged filter ships once via
    ``ray.put``; every probe batch drops non-members BEFORE the hash
    exchange (the bloom's only job is shrinking the all-to-all — at a 1%
    build selectivity it cuts the shuffled probe bytes ~99%). Correctness
    never rests on the bloom: survivors are verified by an exact co-grouped
    ``isin`` against the true build keys, so false positives only cost
    bandwidth. Reference analogy: the written-ways membership gate
    (dedup_first) — here generalized to two-sided semi-join shape.
    """
    import ray

    from osmi_addresses_ray.ops import direct_cogroup

    words = num_bits >> 6

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        keys = t[build_key].to_numpy(zero_copy_only=False)
        for idx in _bloom_hashes(keys, num_bits):
            np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def or_level(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in t["bits"]:
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    build_keys = build.select_columns([build_key]).materialize()
    blobs = (
        build_keys.map_batches(partial, batch_format="pyarrow")
        .map_batches(or_level, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    bits = np.zeros(words, dtype=np.uint64)
    for row in blobs:
        bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    bits_ref = ray.put(bits)

    def prefilter(t: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        keys = t[probe_key].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_bloom_member(b, keys, num_bits)))

    survivors = probe.map_batches(prefilter, batch_format="pyarrow").materialize()
    out_schema = pa.schema([survivors.schema().base_schema.field(n) for n in probe.schema().names])

    def verify(p: pa.Table, bkeys: pa.Table) -> pa.Table:
        if p.num_rows == 0:
            return out_schema.empty_table()
        have = np.unique(bkeys[build_key].to_numpy(zero_copy_only=False))
        keys = p[probe_key].to_numpy(zero_copy_only=False)
        return p.filter(pa.array(_sorted_member(have, keys)))

    return direct_cogroup(
        [survivors, build_keys],
        [[probe_key], [build_key]],
        num_parts,
        verify,
        [out_schema, pa.schema([(build_key, pa.int64())])],
    )


def q_bloom_semijoin(sf_dir: str):
    """Orders having at least one near-max-quantity lineitem (l_quantity ≥ 49),
    via the bloom-prefiltered exact semi-join."""
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    items = read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    items = items.filter(expr="l_quantity >= 49")
    out = bloom_semi_join(orders, "o_orderkey", items.select_columns(["l_orderkey"]), "l_orderkey")
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


def anti_join(probe, probe_key: str, build, build_key: str, *, num_parts: int = 16):
    """Distributed anti-join: probe rows whose key has NO match in build.

    One hash exchange co-locates each key's probe rows with the build keys
    that share its hash partition; the per-partition reject is a vectorized
    sorted-membership test. Unlike the semi-join, a bloom CANNOT pre-filter
    here — a false positive would drop a true result — so the exchange
    moves the full probe side (shrunk only by column pruning at the read).
    """
    from osmi_addresses_ray.ops import direct_cogroup

    # normalize to Arrow blocks first: from_pandas-born datasets report a
    # PandasBlockSchema whose fields can't seed the typed empties the
    # exchange needs for partitions with no probe rows
    probe = probe.map_batches(lambda t: t, batch_format="pyarrow").materialize()
    build_keys = build.select_columns([build_key]).materialize()
    out_schema = pa.schema(
        [probe.schema().base_schema.field(n) for n in probe.schema().names]
    )

    def reject(p: pa.Table, bkeys: pa.Table) -> pa.Table:
        if p.num_rows == 0:
            return out_schema.empty_table()
        have = np.unique(bkeys[build_key].to_numpy(zero_copy_only=False))
        keys = p[probe_key].to_numpy(zero_copy_only=False)
        return p.filter(pa.array(~_sorted_member(have, keys)))

    return direct_cogroup(
        [probe, build_keys],
        [[probe_key], [build_key]],
        num_parts,
        reject,
        [out_schema, pa.schema([(build_key, pa.int64())])],
    )


def q_anti_join_orders(sf_dir: str):
    """Orders with NO near-max-quantity lineitem — the exact complement of
    q_bloom_semijoin, so together they partition the orders table."""
    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    items = read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    items = items.filter(expr="l_quantity >= 49")
    out = anti_join(orders, "o_orderkey", items.select_columns(["l_orderkey"]), "l_orderkey")
    # anti_join types every partition with out_schema, so even an empty
    # result carries the right columns
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


def q_events_rollup(sf_dir: str):
    """ROLLUP(event_type, hour): three aggregation levels from ONE corpus
    pass — the coarser levels re-aggregate the merged finest-grain result
    (already small: |types| × |hours| rows on the driver), never the input.
    NULL marks the rolled-up dimension, as in SQL ROLLUP.
    """
    ds = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_window(t: pa.Table) -> pa.Table:
        return t.append_column("window_start", pc.floor_temporal(t["ts"], unit="hour"))

    hourly = grouped_agg(
        ds.map_batches(add_window, batch_format="pyarrow"),
        ["event_type", "window_start"],
        {"n_events": (None, "count"), "sum_value": ("value", "sum")},
    ).to_pandas()

    lvl1 = (
        hourly.groupby("event_type", as_index=False)
        .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        .assign(window_start=pd.NaT)
    )
    lvl0 = pd.DataFrame(
        {
            "event_type": [None],
            "window_start": [pd.NaT],
            "n_events": [hourly["n_events"].sum()],
            "sum_value": [hourly["sum_value"].sum()],
        }
    )
    out = pd.concat(
        [hourly, lvl1[hourly.columns], lvl0[hourly.columns]], ignore_index=True
    )
    # pin the dtype: pandas' all-NA-column concat inference is deprecated and
    # an upgrade could silently flip the rolled-up NaT column to object
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out["sum_value"] = out["sum_value"].round(4)
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(
        ["event_type", "window_start"], na_position="last", kind="stable"
    ).reset_index(drop=True)


def q_user_top_event_type(sf_dir: str):
    """Per-user modal event type (grouped argmax).

    Combiner shape: per-batch (user, type) counts → one small groupby-sum →
    a user-keyed exchange for the argmax (the merged table is |users|×|types|
    rows — tiny relative to events, but a user's rows can still straddle
    block boundaries, so the argmax needs the co-location, not the driver).
    Ties on count break by event_type ascending in engine and SQL.
    """
    from osmi_addresses_ray.ops import partitioned_map

    ds = read(sf_dir, "events", columns=["user_id", "event_type"])
    counts = grouped_agg(ds, ["user_id", "event_type"], {"cnt": (None, "count")})

    def pick(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["user_id", "cnt", "event_type"], ascending=[True, False, True], kind="stable"
        )
        df = df.drop_duplicates("user_id")
        return pa.Table.from_pandas(df, preserve_index=False)

    out = partitioned_map(counts, ["user_id"], num_parts=16, fn=pick).to_pandas()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_orders_above_cust_avg(sf_dir: str):
    """Orders strictly above their own customer's average price (correlated
    scalar-subquery shape: aggregate once, broadcast the per-key scalars,
    filter the fact side map-side — no fact-side exchange at all).

    The comparison is EXACT-integer: price > sum/n is evaluated as
    price_cents·n > sum_cents (cents = floor(p·100+0.5), the running_totals
    rule), because a float mean's summation order differs between the
    engine's batch partials and SQL's row-sequential fold — equal-priced
    groups could flip membership by 1 ulp. The broadcast is unconditional
    and bounded by |customers| (fits the BROADCAST_ROWS budget at every
    testdata scale); probe misses are dropped, not mis-joined.
    """
    import ray

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)), pa.int64())
        return t.append_column("cents", cents)

    with_cents = orders.map_batches(to_cents, batch_format="pyarrow").materialize()
    sums = grouped_agg(
        with_cents, ["o_custkey"], {"sum_cents": ("cents", "sum"), "n": (None, "count")}
    ).to_pandas().sort_values("o_custkey")
    ref = ray.put(
        (
            sums["o_custkey"].to_numpy(np.int64),
            sums["sum_cents"].to_numpy(np.int64),
            sums["n"].to_numpy(np.int64),
        )
    )

    def f(t: pa.Table) -> pa.Table:
        keys, sc, n = ray.get(ref)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(keys, ck), 0, len(keys) - 1)
        hit = keys[pos] == ck
        keep = hit & (cents * n[pos] > sc[pos])
        return t.filter(pa.array(keep)).drop_columns(["cents"])

    from osmi_addresses_ray.ops import to_pandas_typed

    out = to_pandas_typed(
        with_cents.map_batches(f, batch_format="pyarrow"),
        pa.schema(
            [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
             ("o_totalprice", pa.float64())]
        ),
    )
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_events_pivot(sf_dir: str):
    """Hourly counts pivoted to one column per event type (conditional
    aggregation): the indicator columns are built vectorized inside the
    batch, so the pivot is just a grouped sum — no per-type scans and no
    post-aggregation reshape exchange. Type set is the table's enum
    (click/view/purchase in testdata)."""
    ds = read(sf_dir, "events", columns=["event_type", "ts"])
    types = ["click", "purchase", "view"]

    def prep(t: pa.Table) -> pa.Table:
        cols = {"window_start": pc.floor_temporal(t["ts"], unit="hour")}
        for ty in types:
            cols[f"n_{ty}"] = pc.cast(pc.equal(t["event_type"], ty), pa.int64())
        return pa.table(cols)

    out = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["window_start"],
        {f"n_{ty}": (f"n_{ty}", "sum") for ty in types},
    ).to_pandas()
    for ty in types:
        out[f"n_{ty}"] = out[f"n_{ty}"].astype("int64")
    return out.sort_values("window_start").reset_index(drop=True)


def q_revenue_by_nation(sf_dir: str):
    """Three-table chain (orders ⨝ customer ⨝ nation): both dimension hops
    are broadcast probes folded into ONE map stage, then the partial-agg
    groupby — the fact table crosses no exchange until it is already
    reduced to one row per (nation × batch). Probe misses are DROPPED
    (inner-join semantics), never mis-joined to a neighboring key."""
    import ray

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    nation = nation.sort_values("n_nationkey")
    ref = ray.put(
        (
            cust["c_custkey"].to_numpy(np.int64),
            cust["c_nationkey"].to_numpy(np.int64),
            nation["n_nationkey"].to_numpy(np.int64),
            nation["n_name"].to_numpy(object),
        )
    )

    orders = read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def probe(t: pa.Table) -> pa.Table:
        ck, cn, nk, nm = ray.get(ref)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        cust_pos = np.clip(np.searchsorted(ck, keys), 0, len(ck) - 1)
        hit = ck[cust_pos] == keys
        nkey = cn[cust_pos]
        npos = np.clip(np.searchsorted(nk, nkey), 0, len(nk) - 1)
        hit &= nk[npos] == nkey
        name = nm[npos]
        return pa.table(
            {
                "n_name": pa.array(name[hit], pa.string()),
                "o_totalprice": t["o_totalprice"].filter(pa.array(hit)),
            }
        )

    agg = grouped_agg(
        orders.map_batches(probe, batch_format="pyarrow"),
        ["n_name"],
        {"revenue": ("o_totalprice", "sum"), "n_orders": (None, "count")},
    ).to_pandas()
    agg["revenue"] = agg["revenue"].round(4)
    agg["n_orders"] = agg["n_orders"].astype("int64")
    return agg.sort_values("n_name").reset_index(drop=True)


def _total_order_bins(v: np.ndarray) -> np.ndarray:
    """IEEE-754 total-order trick: flipping the sign bit (positives) or all
    bits (negatives) makes the uint64 bit pattern monotonic in the float
    value, so the top 20 bits (shift 44) are an order-preserving binning
    with NO min/max pre-pass. Occupied bins per exponent range: 2^8 —
    coarse enough that the merged histogram stays small, fine enough that a
    refinement bin holds ~n/2k rows."""
    bits = v.astype(np.float64).view(np.uint64)
    neg = (bits >> np.uint64(63)) != 0
    flipped = np.where(neg, ~bits, bits | np.uint64(1 << 63))
    return (flipped >> np.uint64(44)).astype(np.int64)


def _binned_histogram(ds, key: str, col: str) -> pd.DataFrame:
    """Pass 1 of the binned quantile machinery: merged (key, bin, count)."""

    def partial(t: pa.Table) -> pa.Table:
        b = _total_order_bins(t[col].to_numpy(zero_copy_only=False))
        return (
            pa.table({key: t[key], "__bin": pa.array(b, pa.int64())})
            .group_by([key, "__bin"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns([key, "__bin", "cnt"])
        )

    hist = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"), [key, "__bin"], {"cnt": ("cnt", "sum")}
    ).to_pandas()
    return hist.sort_values([key, "__bin"], kind="stable").reset_index(drop=True)


def _pick_bin_values(ds, key: str, col: str, needed_bins: dict) -> pd.DataFrame:
    """Pass 2: re-read ONLY rows whose (key, bin) is needed; ``needed_bins``
    maps key -> sorted np.int64 bin array."""
    import ray

    ref = ray.put(needed_bins)

    def pick(t: pa.Table) -> pa.Table:
        ns = ray.get(ref)
        ks = t[key].to_numpy(zero_copy_only=False)
        vs = t[col].to_numpy(zero_copy_only=False)
        bs = _total_order_bins(vs)
        keep = np.zeros(len(ks), dtype=bool)
        for k, bins in ns.items():  # ≤ keys iterations, vectorized inside
            keep |= (ks == k) & np.isin(bs, bins)
        return pa.table(
            {key: pa.array(ks[keep]), "__bin": pa.array(bs[keep], pa.int64()),
             col: pa.array(vs[keep])}
        )

    return ds.map_batches(pick, batch_format="pyarrow").to_pandas()


def grouped_quantiles_binned(
    ds, key: str, col: str, quantiles: Sequence[float]
) -> pd.DataFrame:
    """Exact per-group quantiles for NEAR-UNIQUE value domains — the
    refinement path ``grouped_quantiles`` documents.

    The value-histogram variant degrades when distinct values ≈ rows (its
    merge shuffle carries the whole column); this one never ships values in
    pass 1: each batch bins by the top 20 bits of the value's total-ordered
    IEEE representation (order-preserving, needs no min/max pre-pass — see
    ``_total_order_bins``), the merged bin histogram tells the driver which
    (key, bin) holds each requested quantile and the rank within it, and
    pass 2 re-reads ONLY rows falling in those few bins to pick the exact
    value by rank. Correctness doesn't depend on bin boundary placement —
    rank accounting and row selection use the SAME bin function, so any
    order-preserving assignment yields the exact order statistic.
    """
    hist = _binned_histogram(ds, key, col)

    # driver: locate each quantile's (key, bin, rank-within-bin)
    needed: dict[tuple, list[tuple[float, int]]] = {}
    for k, g in hist.groupby(key, sort=True):
        counts = g["cnt"].to_numpy(np.int64)
        bins = g["__bin"].to_numpy(np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for p in quantiles:
            idx = max(0, int(np.ceil(p * n)) - 1)
            j = int(np.searchsorted(cum, idx, side="right"))
            rank = idx - (int(cum[j - 1]) if j else 0)
            needed.setdefault((k, int(bins[j])), []).append((p, rank))

    by_key: dict = {}
    for k, b in needed:
        by_key.setdefault(k, []).append(b)
    picked = _pick_bin_values(
        ds, key, col, {k: np.array(sorted(v), dtype=np.int64) for k, v in by_key.items()}
    )

    rows: dict = {}
    for (k, b), wants in needed.items():
        vals = np.sort(
            picked[(picked[key] == k) & (picked["__bin"] == b)][col].to_numpy()
        )
        for p, rank in wants:
            rows.setdefault(k, {key: k})[f"p{int(round(p * 100)):02d}"] = vals[rank]
    cols = [key] + [f"p{int(round(p * 100)):02d}" for p in quantiles]
    return pd.DataFrame(list(rows.values()))[cols]


def q_order_percent_rank(sf_dir: str):
    """percent_rank of each order within its customer by total price.

    Window-rank shape: one custkey exchange co-locates each customer's
    orders; ranks use RANK semantics (ties share the smallest rank — a
    searchsorted against the partition's sorted prices, no per-row Python)
    and pct_rank = (rank-1)/(n-1) is the same two-integer IEEE division
    DuckDB's percent_rank evaluates, so the doubles are bit-identical.
    """
    from osmi_addresses_ray.ops import partitioned_map

    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def ranks(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"], kind="stable"
        )
        g = df.groupby("o_custkey", sort=False)
        n = g["o_orderkey"].transform("size").to_numpy(np.int64)
        # RANK with ties: 1 + count of strictly smaller prices in the group
        rank = (
            g["o_totalprice"].rank(method="min").to_numpy(np.float64).astype(np.int64)
        )
        pct = np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)
        out = pa.Table.from_pandas(
            df[["o_orderkey", "o_custkey"]], preserve_index=False
        )
        return out.append_column("pct_rank", pa.array(pct, pa.float64()))

    out = partitioned_map(ds, ["o_custkey"], num_parts=16, fn=ranks)
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


def q_order_list_per_customer(sf_dir: str):
    """Ordered string aggregation: each customer's order keys joined ','
    in ascending order (the per-group reduce is a co-located vectorized
    sort + join — deterministic because the order is total)."""
    from osmi_addresses_ray.ops import partitioned_map

    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def agg(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["o_custkey", "o_orderkey"], kind="stable")
        joined = (
            df.assign(s=df["o_orderkey"].astype(str))
            .groupby("o_custkey", sort=True)["s"]
            .agg(",".join)
            .reset_index(name="order_keys")
        )
        n = df.groupby("o_custkey", sort=True).size().to_numpy(np.int64)
        out = pa.Table.from_pandas(joined, preserve_index=False)
        return out.append_column("n_orders", pa.array(n, pa.int64()))

    out = partitioned_map(ds, ["o_custkey"], num_parts=16, fn=agg)
    return out.to_pandas().sort_values("o_custkey").reset_index(drop=True)


def q_price_outliers(sf_dir: str):
    """Lineitems strictly above their return flag's p99 price — threshold
    filtering composed on the binned exact quantiles: the p99 is a REAL
    data value (an order statistic, not an interpolation), so the compare
    is float-equality-safe on both sides."""
    import ray

    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_extendedprice"])
    q99 = grouped_quantiles_binned(ds, "l_returnflag", "l_extendedprice", [0.99])
    q99 = q99.sort_values("l_returnflag")
    ref = ray.put(
        (q99["l_returnflag"].to_numpy(object), q99["p99"].to_numpy(np.float64))
    )

    def f(t: pa.Table) -> pa.Table:
        flags, cut = ray.get(ref)
        fl = t["l_returnflag"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(flags, fl), 0, len(flags) - 1)
        keep = (flags[pos] == fl) & (price > cut[pos])
        return t.filter(pa.array(keep))

    from osmi_addresses_ray.ops import to_pandas_typed

    out = to_pandas_typed(
        ds.map_batches(f, batch_format="pyarrow"),
        pa.schema(
            [("l_orderkey", pa.int64()), ("l_returnflag", pa.string()),
             ("l_extendedprice", pa.float64())]
        ),
    )
    return out.sort_values(["l_orderkey", "l_returnflag", "l_extendedprice"]).reset_index(
        drop=True
    )


def q_distinct_users_per_type(sf_dir: str):
    """Exact grouped COUNT(DISTINCT): per-batch distinct (type, user) pairs
    collapse the exchange to one row per pair per batch, a pair-keyed
    groupby dedups globally, and a small per-type count finishes — the
    exact counterpart of the HLL sketch (which answers the same question
    in 4 KiB when ±1.6% is acceptable)."""
    ds = read(sf_dir, "events", columns=["event_type", "user_id"])

    def pairs(t: pa.Table) -> pa.Table:
        return t.group_by(["event_type", "user_id"], use_threads=False).aggregate([])

    uniq = ds.map_batches(pairs, batch_format="pyarrow").groupby(
        ["event_type", "user_id"]
    ).count()
    counts = grouped_agg(uniq, ["event_type"], {"n_users": (None, "count")}).to_pandas()
    counts["n_users"] = counts["n_users"].astype("int64")
    return counts.sort_values("event_type").reset_index(drop=True)


def q_price_quantiles_cont(sf_dir: str):
    """Interpolated (continuous) quantiles per return flag — the
    quantile_cont counterpart of q_price_quantiles, on the SAME binned
    two-pass machinery: the histogram locates BOTH bracketing order
    statistics (rank floor((n-1)p) and its successor) and the driver
    interpolates lo·(1−f) + hi·f — DuckDB's exact expression (probed;
    lo + f·(hi−lo) is 1 ulp off) — so the doubles match bit-for-bit."""
    ds = read(sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice"])
    key, col = "l_returnflag", "l_extendedprice"
    quantiles = [0.25, 0.50, 0.75]

    hist = _binned_histogram(ds, key, col)

    needed: dict[tuple, list[tuple[float, int, int]]] = {}
    metas = []
    for k, g in hist.groupby(key, sort=True):
        counts = g["cnt"].to_numpy(np.int64)
        bins = g["__bin"].to_numpy(np.int64)
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for p in quantiles:
            x = p * (n - 1)
            lo_idx = int(np.floor(x))
            hi_idx = min(lo_idx + 1, n - 1)
            for idx in (lo_idx, hi_idx):
                j = int(np.searchsorted(cum, idx, side="right"))
                rank = idx - (int(cum[j - 1]) if j else 0)
                needed.setdefault((k, int(bins[j])), []).append((p, rank, idx))
            metas.append((k, p, x, lo_idx, hi_idx))

    by_key: dict = {}
    for k, b in needed:
        by_key.setdefault(k, []).append(b)
    picked = _pick_bin_values(
        ds, key, col,
        {k: np.array(sorted(set(v)), dtype=np.int64) for k, v in by_key.items()},
    )

    value_at: dict[tuple, float] = {}
    for (k, b), wants in needed.items():
        vals = np.sort(picked[(picked[key] == k) & (picked["__bin"] == b)][col].to_numpy())
        for _p, rank, idx in wants:
            value_at[(k, idx)] = float(vals[rank])

    rows: dict = {}
    for k, p, x, lo_idx, hi_idx in metas:
        lo, hi = value_at[(k, lo_idx)], value_at[(k, hi_idx)]
        frac = x - np.floor(x)
        # DuckDB interpolates as lo*(1-f) + hi*f (probed; lo+f*(hi-lo)
        # differs in the last ulp on real rows)
        rows.setdefault(k, {key: k})[f"p{int(round(p * 100)):02d}"] = (
            lo * (1.0 - frac) + hi * frac
        )
    cols = [key] + [f"p{int(round(p * 100)):02d}" for p in quantiles]
    return pd.DataFrame(list(rows.values()))[cols].sort_values(key).reset_index(drop=True)




def _ntile_of(rn: np.ndarray, n: int, b: int) -> np.ndarray:
    """SQL NTILE bucket for 1-based global row numbers: the first ``n % b``
    buckets get ``n//b + 1`` rows, the rest ``n//b`` (empirically verified
    against DuckDB's ntile in the unit test)."""
    size, rem = divmod(n, b)
    if size == 0:
        return rn.astype(np.int64)
    thresh = rem * (size + 1)
    return np.where(
        rn <= thresh,
        (rn - 1) // (size + 1) + 1,
        rem + (rn - 1 - thresh) // size + 1,
    ).astype(np.int64)


def q_ntile_orders(sf_dir: str, *, buckets: int = 4, num_parts: int = 16):
    """NTILE(4) of every order by (o_totalprice DESC, o_orderkey) — the
    distributed global-rank shape WITHOUT a global sort: pass 1 histograms
    the order-preserving IEEE total-order bins (``_total_order_bins``; the
    merged histogram is bounded by occupied bins, never rows), the driver
    exclusive-scans bin counts in DESCENDING bin order into per-bin rank
    offsets (broadcast), and pass 2 hash-exchanges rows by bin — all equal
    prices share a bin — where each bin lexsorts locally and adds its
    offset to get exact global row numbers. Same two-pass discipline as
    grouped_quantiles_binned; no driver row materialization."""
    import ray

    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def hist_partial(t: pa.Table) -> pa.Table:
        b = _total_order_bins(t["o_totalprice"].to_numpy(zero_copy_only=False))
        return (
            pa.table({"__bin": pa.array(b, pa.int64())})
            .group_by(["__bin"], use_threads=False)
            .aggregate([([], "count_all")])
            .rename_columns(["__bin", "cnt"])
        )

    hist = grouped_agg(
        ds.map_batches(hist_partial, batch_format="pyarrow"), ["__bin"], {"cnt": ("cnt", "sum")}
    ).to_pandas()
    hist = hist.sort_values("__bin", ascending=False).reset_index(drop=True)
    bins = hist["__bin"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)
    n_total = int(cnts.sum())
    offsets = np.concatenate(([0], np.cumsum(cnts)))[:-1]
    # broadcast: bins ASCENDING for searchsorted, offsets aligned
    asc = np.argsort(bins)
    ref = ray.put((bins[asc], offsets[asc]))

    from ..ops import partitioned_map

    def pre_bin(t: pa.Table) -> pa.Table:
        b = _total_order_bins(t["o_totalprice"].to_numpy(zero_copy_only=False))
        return t.append_column("__bin", pa.array(b, pa.int64()))

    def rank_fn(t: pa.Table) -> pa.Table:
        bins_a, offs_a = ray.get(ref)
        okey = t["o_orderkey"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        binv = t["__bin"].to_numpy(zero_copy_only=False)
        # per bin: price DESC (exact float negation), orderkey ASC
        order = np.lexsort((okey, -price, binv))
        ok, pr, bv = okey[order], price[order], binv[order]
        new_bin = np.r_[True, bv[1:] != bv[:-1]]
        bstart = np.maximum.accumulate(np.where(new_bin, np.arange(len(bv)), -1))
        local = np.arange(len(bv)) - bstart
        rn = offs_a[np.searchsorted(bins_a, bv)] + local + 1
        bucket = _ntile_of(rn, n_total, buckets)
        return pa.table(
            {
                "o_orderkey": pa.array(ok, pa.int64()),
                "o_totalprice": pa.array(pr, pa.float64()),
                "bucket": pa.array(bucket, pa.int64()),
            }
        )

    out = partitioned_map(
        ds.map_batches(pre_bin, batch_format="pyarrow"), ["__bin"], num_parts, rank_fn
    )
    return out.to_pandas().sort_values("o_orderkey").reset_index(drop=True)


def q_dense_rank_customers(sf_dir: str):
    """DENSE_RANK of customers by order count (desc): the rank table is the
    DISTINCT count values (tiny — bounded by the count domain, not by
    customers), computed by one extra micro-groupby over the per-customer
    aggregate and broadcast into a vectorized searchsorted map."""
    import ray

    ds = read(sf_dir, "orders", columns=["o_custkey"])
    counts = grouped_agg(ds, ["o_custkey"], {"n_orders": (None, "count")})
    distinct = grouped_agg(counts, ["n_orders"], {"_": ("n_orders", "count")}).to_pandas()
    vals = np.sort(distinct["n_orders"].to_numpy(np.int64))  # ascending
    ref = ray.put(vals)

    def assign(t: pa.Table) -> pa.Table:
        v = ray.get(ref)
        n = t["n_orders"].to_numpy(zero_copy_only=False).astype(np.int64)
        # dense rank desc = 1 + number of distinct values strictly greater
        drank = len(v) - np.searchsorted(v, n, side="left")
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "n_orders": pa.array(n, pa.int64()),
                "drank": pa.array(drank, pa.int64()),
            }
        )

    out = counts.map_batches(assign, batch_format="pyarrow")
    return out.to_pandas().sort_values("o_custkey").reset_index(drop=True)


def q_events_cube(sf_dir: str):
    """CUBE(event_type, day): all four aggregation levels from ONE corpus
    pass. Like q_events_rollup, the finest grain (|types| × |days|) is the
    only distributed aggregate; the three marginals re-aggregate that small
    merged result — never the input. NULL marks each cubed-out dimension."""
    ds = read(sf_dir, "events", columns=["event_type", "ts", "value"])

    def add_day(t: pa.Table) -> pa.Table:
        return t.append_column("day", pc.floor_temporal(t["ts"], unit="day"))

    fine = grouped_agg(
        ds.map_batches(add_day, batch_format="pyarrow"),
        ["event_type", "day"],
        {"n_events": (None, "count"), "sum_value": ("value", "sum")},
    ).to_pandas()

    by_type = (
        fine.groupby("event_type", as_index=False)
        .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        .assign(day=pd.NaT)
    )
    by_day = (
        fine.groupby("day", as_index=False)
        .agg(n_events=("n_events", "sum"), sum_value=("sum_value", "sum"))
        .assign(event_type=None)
    )
    grand = pd.DataFrame(
        {
            "event_type": [None],
            "day": [pd.NaT],
            "n_events": [fine["n_events"].sum()],
            "sum_value": [fine["sum_value"].sum()],
        }
    )
    cols = ["event_type", "day", "n_events", "sum_value"]
    out = pd.concat(
        [fine[cols], by_type[cols], by_day[cols], grand[cols]], ignore_index=True
    )
    out["day"] = out["day"].astype("datetime64[us]")
    out["event_type"] = out["event_type"].astype(object).where(out["event_type"].notna(), None)
    out["sum_value"] = out["sum_value"].round(4)
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(
        ["event_type", "day"], na_position="last", kind="stable"
    ).reset_index(drop=True)


def q_first_last_order(sf_dir: str):
    """Per-customer first/last order key by (o_orderdate, o_orderkey) plus
    order count — the grouped argmin/argmax combiner: each batch reduces to
    one candidate row per customer (first/last/count), one small groupby
    merges. The exchange carries |customers|·blocks rows, never the orders."""
    ds = read(sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "o_custkey": pd.Series([], dtype="int64"),
                    "first_date": pd.Series([], dtype="datetime64[us]"),
                    "first_orderkey": pd.Series([], dtype="int64"),
                    "last_date": pd.Series([], dtype="datetime64[us]"),
                    "last_orderkey": pd.Series([], dtype="int64"),
                    "n_orders": pd.Series([], dtype="int64"),
                }
            )
        s = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="stable")
        head = s.groupby("o_custkey", as_index=False).first()
        tail = s.groupby("o_custkey", as_index=False).last()
        cnt = s.groupby("o_custkey", as_index=False).size()
        return pd.DataFrame(
            {
                "o_custkey": head["o_custkey"].astype("int64"),
                "first_date": head["o_orderdate"],
                "first_orderkey": head["o_orderkey"].astype("int64"),
                "last_date": tail["o_orderdate"],
                "last_orderkey": tail["o_orderkey"].astype("int64"),
                "n_orders": cnt["size"].astype("int64"),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # final merge of the (small) per-block candidates, same ordering rule
    f = partials.sort_values(
        ["o_custkey", "first_date", "first_orderkey"], kind="stable"
    ).groupby("o_custkey", as_index=False).first()
    l = partials.sort_values(
        ["o_custkey", "last_date", "last_orderkey"], kind="stable"
    ).groupby("o_custkey", as_index=False).last()
    n = partials.groupby("o_custkey", as_index=False)["n_orders"].sum()
    out = pd.DataFrame(
        {
            "o_custkey": f["o_custkey"].astype("int64"),
            "first_orderkey": f["first_orderkey"].astype("int64"),
            "last_orderkey": l["last_orderkey"].astype("int64"),
            "n_orders": n["n_orders"].astype("int64"),
        }
    )
    return out.sort_values("o_custkey").reset_index(drop=True)


# --- median absolute deviation (chained exact quantiles) ----------------------


def q_mad_priority(sf_dir: str):
    """Median absolute deviation of o_totalprice per order priority.

    Two chained distributed exact-quantile passes: pass A computes each
    group's median with the binned two-pass machinery (no value shuffle);
    the tiny per-group median table is broadcast via ``ray.put`` and pass B
    runs the SAME machinery over the derived ``abs(price - med)`` column.
    Both the median and the MAD are REAL data values (quantile_disc rule),
    so the result hash-matches DuckDB bit-for-bit with no float tolerance.
    Scale shape: 2 × (histogram exchange of (key, bin, cnt) rows + a pass-2
    re-read of only the quantile-holding bins); nothing driver-side grows
    with the row count.
    """
    import ray

    cols = ["o_orderpriority", "o_totalprice"]
    ds = read(sf_dir, "orders", columns=cols)
    med = grouped_quantiles_binned(ds, "o_orderpriority", "o_totalprice", [0.5])
    med_ref = ray.put(dict(zip(med["o_orderpriority"], med["p50"])))

    def absdev(t: pa.Table) -> pa.Table:
        m = ray.get(med_ref)
        k = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        meds = np.zeros(len(v), dtype=np.float64)
        for key, mv in m.items():  # ≤ #groups iterations, vectorized inside
            meds[k == key] = mv
        # explicit cast: a zero-row upstream block arrives null-typed and
        # would otherwise fork the stream schema
        return pa.table(
            {"o_orderpriority": t["o_orderpriority"], "absdev": np.abs(v - meds)}
        ).cast(pa.schema([("o_orderpriority", pa.string()), ("absdev", pa.float64())]))

    dev = ds.map_batches(absdev, batch_format="pyarrow")
    mad = grouped_quantiles_binned(dev, "o_orderpriority", "absdev", [0.5]).rename(
        columns={"p50": "mad"}
    )
    out = med.rename(columns={"p50": "med"}).merge(mad, on="o_orderpriority")
    return out.sort_values("o_orderpriority").reset_index(drop=True)[
        ["o_orderpriority", "med", "mad"]
    ]


# --- 2-D skyline (Pareto frontier) --------------------------------------------


def _skyline2d(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean mask of the (maximize price, minimize date) skyline.

    A row survives iff no other row is ≥ in price AND ≤ in date with at
    least one strict inequality (duplicates of an undominated pair all
    survive). Vectorized: sort by (price desc, date asc); within an
    equal-price run only rows tying the run's min date can survive, and the
    run min must beat (strictly) the best date seen at any higher price.
    """
    n = len(price)
    if n == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((date, -price))
    p_s, d_s = price[order], date[order]
    run_start = np.flatnonzero(np.concatenate(([True], p_s[1:] != p_s[:-1])))
    run_id = np.cumsum(np.concatenate(([True], p_s[1:] != p_s[:-1]))) - 1
    run_min = d_s[run_start]  # date asc within a run → first element is min
    # best (smallest) date among strictly-higher-price runs
    best_higher = np.concatenate(([np.inf], np.minimum.accumulate(run_min)[:-1]))
    ok_run = run_min < best_higher
    keep_sorted = ok_run[run_id] & (d_s == run_min[run_id])
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def pareto_orders(sf_dir: str):
    """Skyline of orders: maximize o_totalprice, minimize o_orderdate.

    Distributed shape: the skyline operator is union-stable — every global
    skyline point survives its block's local skyline — so each block emits
    its local frontier (O(log n) expected rows on unordered data), the
    driver unions the small candidate sets and takes one final frontier.
    No shuffle at all; the exchange is the candidate rows only.
    """
    ds = read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderdate"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        keep = _skyline2d(
            df["o_totalprice"].to_numpy(np.float64),
            df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64).astype(np.float64),
        )
        return df[keep]

    cand = ds.map_batches(local, batch_format="pandas").to_pandas()
    keep = _skyline2d(
        cand["o_totalprice"].to_numpy(np.float64),
        cand["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64).astype(np.float64),
    )
    out = cand[keep].sort_values("o_orderkey").reset_index(drop=True)
    out["o_orderkey"] = out["o_orderkey"].astype("int64")
    return out


# --- left outer join with null-side defaults -----------------------------------


def q_left_join_nulls(sf_dir: str, *, num_parts: int = 8):
    """Customers LEFT JOIN their order aggregate: customers with no orders
    keep a row (n_orders = 0, total_spent = 0). Completes the join matrix
    (inner/broadcast/semi/anti/range/as-of are covered elsewhere).

    Scale shape: orders are pre-aggregated per custkey FIRST (one grouped
    exchange over partial sums), so the co-group joins two key-sized
    tables — the left-join exchange never carries order rows.
    """
    from ..ops import cogroup

    cust = read(sf_dir, "customer", columns=["c_custkey"])
    orders_agg = grouped_agg(
        read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]),
        ["o_custkey"],
        {"n_orders": (None, "count"), "total_spent": ("o_totalprice", "sum")},
    )

    def f(c_t: pa.Table, o_t: pa.Table) -> pa.Table:
        c = c_t.to_pandas()
        o = o_t.to_pandas()
        m = c.merge(o, left_on="c_custkey", right_on="o_custkey", how="left")
        return pa.table(
            {
                "c_custkey": pa.array(m["c_custkey"].to_numpy(np.int64)),
                "n_orders": pa.array(
                    m["n_orders"].fillna(0).to_numpy(np.int64), pa.int64()
                ),
                "total_spent": pa.array(
                    m["total_spent"].fillna(0.0).round(4).to_numpy(np.float64)
                ),
            }
        )

    out = cogroup(
        [cust, orders_agg],
        [["c_custkey"], ["o_custkey"]],
        num_parts,
        f,
        [
            pa.schema([("c_custkey", pa.int64())]),
            pa.schema(
                [
                    ("o_custkey", pa.int64()),
                    ("n_orders", pa.int64()),
                    ("total_spent", pa.float64()),
                ]
            ),
        ],
    )
    return out.to_pandas().sort_values("c_custkey").reset_index(drop=True)


def q_zscore_orders(sf_dir: str) -> pd.DataFrame:
    """Per-priority z-score normalization of order totals — the grouped
    feature-normalization pass every training pipeline runs before scaling.

    Classic two-pass shape: pass 1 reduces per-batch moment partials
    (group, n, Σv, Σv²) through one tiny group-count-sized exchange; the
    merged moments broadcast to a stateless scoring pass — no per-row
    exchange at any point. Values enter as exact integer cents
    (floor(p·100+0.5), the running_totals rule) divided once to doubles, so
    the only cross-engine float drift is the Σv/Σv² reduction order
    (~1e-13) — z rounds to 4 decimals (the token_entropy libm-parity rule).
    Degenerate groups (sd < 1e-9, e.g. a single row) emit z = 0.0 on both
    sides.
    """
    import ray

    ds = read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        v = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5) / 100.0
        g = pd.DataFrame({"o_orderpriority": df["o_orderpriority"], "v": v, "vv": v * v})
        agg = g.groupby("o_orderpriority", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), ss=("vv", "sum")
        ).reset_index()
        agg["n"] = agg["n"].astype("int64")
        return agg

    merged = grouped_agg(
        ds.map_batches(moments, batch_format="pandas"),
        ["o_orderpriority"],
        {"n": ("n", "sum"), "s": ("s", "sum"), "ss": ("ss", "sum")},
    ).to_pandas()
    mean = merged["s"].to_numpy(np.float64) / merged["n"].to_numpy(np.float64)
    var = merged["ss"].to_numpy(np.float64) / merged["n"].to_numpy(np.float64) - mean * mean
    sd = np.sqrt(np.maximum(var, 0.0))
    stats_ref = ray.put(
        (pd.Index(merged["o_orderpriority"]), mean, sd)
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        index, mean_a, sd_a = ray.get(stats_ref)
        idx = index.get_indexer(df["o_orderpriority"])
        v = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5) / 100.0
        m, s = mean_a[idx], sd_a[idx]
        z = np.where(s < 1e-9, 0.0, np.round((v - m) / np.where(s < 1e-9, 1.0, s), 4) + 0.0)
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_orderpriority": df["o_orderpriority"],
                "z": z,
            }
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("o_orderkey").reset_index(drop=True)


def q_trimmed_mean(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag 10%-trimmed and 10%-winsorized means of l_quantity —
    the two classic robust location estimators, computed EXACTLY from one
    domain-bounded value histogram (no global sort).

    Shape: per-batch (flag, cents, count) partials → one groupby whose
    volume is bounded by the DISTINCT value domain (quantities: ~50 values),
    never the row count; the driver walks each flag's cumsum once. With
    t = n // 10: trimmed = mean of ranks (t, n−t]; winsorized = trimmed sum
    + t·(value at rank t+1) + t·(value at rank n−t), over all n. All sums
    are exact integer cents; ONE final division each + round(6) is
    bit-identical to the SQL window recomputation.
    """
    ds = read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["l_quantity"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
        g = (
            pd.DataFrame({"f": df["l_returnflag"], "c": c})
            .groupby(["f", "c"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        g["cnt"] = g["cnt"].astype("int64")
        return g

    hist = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["f", "c"],
        {"cnt": ("cnt", "sum")},
    ).to_pandas()
    rows = []
    for f, g in hist.sort_values(["f", "c"]).groupby("f", sort=True):
        vals = g["c"].to_numpy(np.int64)
        cnts = g["cnt"].to_numpy(np.int64)
        cum = np.cumsum(cnts)
        n = int(cum[-1])
        t = n // 10
        lo_rank, hi_rank = t + 1, n - t
        # overlap of each value's rank run [cum_prev+1, cum] with the window
        prev = cum - cnts
        inside = np.minimum(cum, hi_rank) - np.maximum(prev + 1, lo_rank) + 1
        inside = np.maximum(inside, 0)
        trimmed_sum = int((vals * inside).sum())
        n_kept = int(inside.sum())
        v_lo = int(vals[np.searchsorted(cum, lo_rank, side="left")])
        v_hi = int(vals[np.searchsorted(cum, hi_rank, side="left")])
        winsor_sum = trimmed_sum + t * v_lo + t * v_hi
        rows.append(
            {
                "l_returnflag": f,
                "n": n,
                "trimmed_mean": round(trimmed_sum / (100.0 * n_kept), 6),
                "winsorized_mean": round(winsor_sum / (100.0 * n), 6),
            }
        )
    out = pd.DataFrame(rows).astype({"n": "int64"})
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_weighted_quantiles(sf_dir: str) -> pd.DataFrame:
    """Quantity-WEIGHTED exact price quantiles per return flag: the smallest
    price (in integer cents) whose cumulative quantity weight reaches
    q·W — the token-weighted-percentile shape every corpus-curation report
    needs (weights = tokens, values = doc scores), entirely in exact
    integers (cross-multiplied 100·cumw ≥ q100·W, no float thresholds).

    Binned two-pass shape (same scaling argument as
    ``grouped_quantiles_binned``): pass 1 ships only (flag, bin, Σw) — never
    values; the driver walks the merged histogram to each quantile's
    (bin, residual-weight threshold); pass 2 re-reads only the needed bins
    and resolves the exact value by within-bin weighted rank. Correctness
    is bin-placement-independent: rank accounting and row selection use the
    same bin function.
    """
    q100s = (25, 50, 75, 90, 99)
    key, BIN = "l_returnflag", 4096

    ds = read(
        sf_dir, "lineitem", columns=["l_returnflag", "l_extendedprice", "l_quantity"]
    )

    def to_cw(t: pa.Table):
        c = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        w = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t[key].to_numpy(zero_copy_only=False), c, w

    def partial(t: pa.Table) -> pa.Table:
        ks, c, w = to_cw(t)
        return (
            pa.table(
                {key: pa.array(ks), "__bin": pa.array(c // BIN), "w": pa.array(w)}
            )
            .group_by([key, "__bin"], use_threads=False)
            .aggregate([("w", "sum")])
            .rename_columns([key, "__bin", "w"])
        )

    hist = (
        grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            [key, "__bin"],
            {"w": ("w", "sum")},
        )
        .to_pandas()
        .sort_values([key, "__bin"], kind="stable")
    )

    # driver: per flag, each quantile's (bin, within-bin weight threshold)
    needed: dict[tuple, list[tuple[int, int]]] = {}
    totals: dict = {}
    for f, g in hist.groupby(key, sort=True):
        wsum = g["w"].to_numpy(np.int64)
        bins = g["__bin"].to_numpy(np.int64)
        cum = np.cumsum(wsum)
        W = int(cum[-1])
        totals[f] = W
        for q in q100s:
            j = int(np.searchsorted(100 * cum, q * W, side="left"))
            before = int(cum[j - 1]) if j else 0
            t_in = (q * W - 100 * before + 99) // 100  # ceil, exact ints
            needed.setdefault((f, int(bins[j])), []).append((q, int(t_in)))

    import ray

    by_key: dict = {}
    for f, b in needed:
        by_key.setdefault(f, []).append(b)
    ref = ray.put({f: np.array(sorted(v), np.int64) for f, v in by_key.items()})

    def pick(t: pa.Table) -> pa.Table:
        ns = ray.get(ref)
        ks, c, w = to_cw(t)
        bs = c // BIN
        keep = np.zeros(len(ks), dtype=bool)
        for f, bins in ns.items():
            keep |= (ks == f) & np.isin(bs, bins)
        return pa.table(
            {
                key: pa.array(ks[keep]),
                "__bin": pa.array(bs[keep]),
                "c": pa.array(c[keep]),
                "w": pa.array(w[keep]),
            }
        )

    picked = ds.map_batches(pick, batch_format="pyarrow").to_pandas()

    rows: dict = {}
    for (f, b), wants in needed.items():
        sub = picked[(picked[key] == f) & (picked["__bin"] == b)]
        # collapse ties on the exact value, then weighted rank by cumsum
        agg = sub.groupby("c", sort=True)["w"].sum()
        vals = agg.index.to_numpy(np.int64)
        cumw = np.cumsum(agg.to_numpy(np.int64))
        for q, t_in in wants:
            v = int(vals[np.searchsorted(cumw, t_in, side="left")])
            rows.setdefault(f, {key: f, "total_w": totals[f]})[f"p{q:02d}"] = v
    cols = [key, "total_w"] + [f"p{q:02d}" for q in q100s]
    out = pd.DataFrame(list(rows.values()))[cols]
    for c in cols[1:]:
        out[c] = out[c].astype("int64")
    return out.sort_values(key).reset_index(drop=True)


def q_props_extract(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: pull the integer field ``k`` out of the
    JSON ``props`` column (vectorized regexp — no per-row json.loads) and
    aggregate it per event type. The engine's regex and the oracle's DuckDB
    ``regexp_extract`` share one spec; rows whose props lack a numeric k
    count in ``n_missing`` instead of being silently dropped. All outputs
    are exact integers — partial per-batch aggregation, one tiny groupby.
    """
    ds = read(sf_dir, "events", columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        props = pd.Series(t["props"].to_pandas(), copy=False).astype("string")
        k = props.str.extract(r'"k"\s*:\s*(-?[0-9]+)', expand=False).astype("Int64")
        kv = k.to_numpy(dtype="float64", na_value=np.nan)
        have = ~np.isnan(kv)
        kz = np.where(have, kv, 0).astype(np.int64)
        big = np.int64(np.iinfo(np.int64).max)
        return (
            pa.table(
                {
                    "event_type": pa.array(et),
                    "n": pa.array(np.ones(len(et), np.int64)),
                    "n_missing": pa.array((~have).astype(np.int64)),
                    "sum_k": pa.array(kz),
                    "min_k": pa.array(np.where(have, kz, big)),
                    "max_k": pa.array(np.where(have, kz, -big - 1)),
                }
            )
            .group_by(["event_type"], use_threads=False)
            .aggregate(
                [("n", "sum"), ("n_missing", "sum"), ("sum_k", "sum"),
                 ("min_k", "min"), ("max_k", "max")]
            )
            .rename_columns(
                ["event_type", "n", "n_missing", "sum_k", "min_k", "max_k"]
            )
        )

    out = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        {
            "n": ("n", "sum"),
            "n_missing": ("n_missing", "sum"),
            "sum_k": ("sum_k", "sum"),
            "min_k": ("min_k", "min"),
            "max_k": ("max_k", "max"),
        },
    ).to_pandas()
    for c in out.columns[1:]:
        out[c] = out[c].astype("int64")
    # a group with NO numeric k pins min/max to 0 (the oracle's COALESCE)
    allmiss = out["n_missing"] == out["n"]
    out.loc[allmiss, ["min_k", "max_k"]] = 0
    return out.sort_values("event_type").reset_index(drop=True)


def theil_sen_trend(sf_dir: str, *, cap: int = 500, num_parts: int = 8) -> pd.DataFrame:
    """Grouped Theil–Sen robust trend: per customer nation, the MEDIAN of
    all pairwise slopes (Δprice-cents / Δorder-days) over the nation's
    ``cap`` lowest-orderkey orders — the outlier-immune alternative to the
    OLS trend (``q_event_trend``), and the estimator of choice when a few
    mispriced orders would wreck a least-squares fit.

    Exactness: x (epoch days) and y (cents) are exact int64; each slope is
    ONE IEEE division; the even-count median is lo·0.5 + hi·0.5 (DuckDB's
    quantile_cont fold, probed in q_price_quantiles_cont). Same-day pairs
    (Δx = 0) are excluded by spec.

    Shape: orders ⨝ customer on custkey (hash exchange), emissions
    re-partitioned on nationkey; per-nation O(m²) pair sweep with m capped
    deterministically (lowest orderkeys) — the classic Theil–Sen scaling
    trade (full pairwise is quadratic; production systems subsample pairs,
    we subsample rows by a stable rule so the oracle can mirror it).
    """
    from ..ops import direct_cogroup

    orders = read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).materialize()
    customer = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).materialize()

    nk_schema = pa.schema(
        [("nk", pa.int64()), ("ok", pa.int64()), ("x", pa.int64()), ("y", pa.int64())]
    )

    def attach(o: pa.Table, c: pa.Table) -> pa.Table:
        if o.num_rows == 0:
            return nk_schema.empty_table()
        od = o.to_pandas()
        cd = c.to_pandas()
        m = od.merge(cd, left_on="o_custkey", right_on="c_custkey", how="inner")
        x = (
            m["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        )
        y = np.floor(m["o_totalprice"].to_numpy(np.float64) * 100.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "nk": pa.array(m["c_nationkey"].to_numpy(np.int64)),
                "ok": pa.array(m["o_orderkey"].to_numpy(np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
            }
        )

    emissions = direct_cogroup(
        [orders, customer],
        [["o_custkey"], ["c_custkey"]],
        num_parts,
        attach,
        [
            pa.schema(
                [("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                 ("o_orderdate", pa.timestamp("us")), ("o_totalprice", pa.float64())]
            ),
            pa.schema([("c_custkey", pa.int64()), ("c_nationkey", pa.int64())]),
        ],
        emit_partitioned_on=["nk"],
    )

    out_schema = pa.schema(
        [("nationkey", pa.int64()), ("n_pairs", pa.int64()), ("slope", pa.float64())]
    )

    def slopes(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas()
        rows = []
        for nk, g in df.groupby("nk", sort=True):
            g = g.sort_values("ok", kind="stable").head(cap)
            x = g["x"].to_numpy(np.int64)
            y = g["y"].to_numpy(np.int64)
            i, j = np.triu_indices(len(x), k=1)
            dx = x[j] - x[i]
            keep = dx != 0
            sl = (y[j] - y[i])[keep].astype(np.float64) / dx[keep].astype(np.float64)
            sl.sort(kind="stable")
            n = len(sl)
            if n == 0:
                continue
            med = sl[n // 2] if n % 2 else sl[n // 2 - 1] * 0.5 + sl[n // 2] * 0.5
            rows.append((int(nk), n, med))
        if not rows:
            return out_schema.empty_table()
        nks, ns, meds = zip(*rows)
        return pa.table(
            {
                "nationkey": pa.array(np.array(nks, np.int64)),
                "n_pairs": pa.array(np.array(ns, np.int64)),
                "slope": pa.array(np.array(meds, np.float64)),
            }
        )

    out = direct_cogroup(
        [emissions], [["nk"]], num_parts, slopes, [nk_schema]
    ).to_pandas()
    if out.empty:  # every nation's pairs were same-day (or no orders)
        return pd.DataFrame(
            {
                "nationkey": pd.Series([], dtype="int64"),
                "n_pairs": pd.Series([], dtype="int64"),
                "slope": pd.Series([], dtype="float64"),
            }
        )
    for c in ("nationkey", "n_pairs"):
        out[c] = out[c].astype("int64")
    return out.sort_values("nationkey").reset_index(drop=True)


def weighted_sample(sf_dir: str, *, k: int = 200) -> pd.DataFrame:
    """Weighted sampling WITHOUT replacement over lineitem, weight =
    ``l_quantity`` — the mixture-sampling primitive (pick k docs with
    probability ∝ weight) of every corpus-curation pipeline, done with zero
    randomness so the draw is reproducible across reruns and cluster sizes.

    Integer analogue of Efraimidis & Spirakis (2006) exponential-key
    sampling: each row's priority is the MIN of ``w`` double-mixed
    multiplicative-hash draws — h1 = ((key % 1000003 + j*10007 + 1)
    * 2654435761) % 2^32, draw = ((h1 % 999983) * 2654435761) % 2^32. The
    second round matters: one round makes the j-draws an arithmetic
    progression mod 2^32 (fixed stride), whose min is NOT distributed like
    the min of w uniforms, and the heavy-row win rate collapses (0.38 vs
    the ∝-weight 0.74 on the unit fixture). More draws (higher weight)
    stochastically lower the min, so P(selected) grows ∝ w exactly as the
    min-of-w-exponentials trick, and every operand stays < 2^63 so the
    DuckDB oracle evaluates the identical BIGINT expression via one
    ``list_transform(range(0, w), ...)`` per row.

    Distributed shape: priorities are a vectorized per-batch map (an
    (n × w_max) lattice of int64 hash evaluations, masked at each row's own
    w) fused into the read; only per-block top-k survivors (k rows/block)
    reach the driver merge — the corpus never moves, there is no exchange
    at all. At 10^12 rows this is a pure map + k·P-row reduce.
    """
    W_MAX = 64  # l_quantity ∈ 1..50; lattice is clipped + masked anyway

    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_quantity"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        ok = df["l_orderkey"].to_numpy(np.int64)
        ln = df["l_linenumber"].to_numpy(np.int64)
        w = np.minimum(df["l_quantity"].to_numpy(np.float64).astype(np.int64), W_MAX)
        keymod = (ok * 8 + ln) % 1000003
        j = np.arange(W_MAX, dtype=np.int64)
        # (n, W_MAX) lattice: operand ≤ (1000003 + 64*10007 + 1)·2654435761 < 2^63
        h1 = ((keymod[:, None] + j[None, :] * 10007 + 1) * 2654435761) % (1 << 32)
        lat = ((h1 % 999983) * 2654435761) % (1 << 32)
        lat[j[None, :] >= w[:, None]] = 1 << 62  # mask draws beyond each row's w
        pr = lat.min(axis=1)
        return pd.DataFrame(
            {"l_orderkey": ok, "l_linenumber": ln, "wt": w, "priority": pr}
        )

    out = topk(
        ds.map_batches(part, batch_format="pandas"),
        "priority",
        k,
        descending=False,
        tie_cols=["l_orderkey", "l_linenumber"],
    )
    for c in ("l_orderkey", "l_linenumber", "wt", "priority"):
        out[c] = out[c].astype("int64")
    return (
        out[["l_orderkey", "l_linenumber", "wt", "priority"]]
        .sort_values(["priority", "l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )


def q_group_moments(sf_dir: str) -> pd.DataFrame:
    """Exact integer sufficient statistics per return flag — the moments
    every BI/feature engine reduces var/skew/kurtosis/corr to: n, Σq, Σq²,
    Σq³, Σq⁴ over quantity plus the Σq·d cross-moment against the discount
    in exact centi-units. All integers (quantity ≤ 50 so q⁴ ≤ 6.25e6; at
    10¹² rows the sums stay < 2⁶³ — documented bound), so the merge is
    order-free and hash-stable with no float surface.

    Shape: per-batch partial moment reduction → one group-count-sized
    exchange (the q_zscore_orders two-pass family, minus the second pass)."""
    ds = read(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity", "l_discount"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(np.float64).astype(np.int64)
        d = np.floor(df["l_discount"].to_numpy(np.float64) * 100 + 0.5).astype(np.int64)
        g = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "s1": q, "s2": q * q, "s3": q * q * q, "s4": q * q * q * q,
                "sqd": q * d,
            }
        )
        agg = g.groupby("l_returnflag", sort=False).agg(
            n=("s1", "size"), s1=("s1", "sum"), s2=("s2", "sum"),
            s3=("s3", "sum"), s4=("s4", "sum"), sqd=("sqd", "sum"),
        ).reset_index()
        agg["n"] = agg["n"].astype("int64")
        return agg

    out = grouped_agg(
        ds.map_batches(part, batch_format="pandas"),
        ["l_returnflag"],
        {c: (c, "sum") for c in ("n", "s1", "s2", "s3", "s4", "sqd")},
    ).to_pandas()
    for c in ("n", "s1", "s2", "s3", "s4", "sqd"):
        out[c] = out[c].astype("int64")
    return out.sort_values("l_returnflag").reset_index(drop=True)


def q_full_outer_hours(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Hourly click counts FULL OUTER JOIN hourly view counts — the last
    cell of the join matrix (inner/left/broadcast/semi/anti/bloom/range/
    as-of live elsewhere): hours with only clicks keep n_view = −1, hours
    with only views keep n_click = −1 (an explicit absent sentinel — a
    present side is always ≥ 1, so the sentinel is unambiguous and keeps
    both columns int64 with no NULL-dtype surface).

    Scale shape: each side pre-aggregates to calendar-bounded hourly counts
    FIRST (partial per-batch counts → one grouped exchange each), then one
    hour-keyed cogroup outer-merges two hour-sized tables — event rows
    never cross the join exchange."""
    import pyarrow.compute as pc

    from ..ops import cogroup

    ds = read(sf_dir, "events", columns=["event_type", "ts"])

    def hourly(which: str):
        def f(t: pa.Table) -> pa.Table:
            s = t.filter(pc.equal(t["event_type"], which))
            return pa.table({"hr": pc.floor_temporal(s["ts"], unit="hour")})

        return grouped_agg(
            ds.map_batches(f, batch_format="pyarrow"), ["hr"], {"n": (None, "count")}
        )

    hr_schema = pa.schema([("hr", pa.timestamp("us")), ("n", pa.int64())])

    def merge(c_t: pa.Table, v_t: pa.Table) -> pa.Table:
        c = c_t.to_pandas().rename(columns={"n": "n_click"})
        v = v_t.to_pandas().rename(columns={"n": "n_view"})
        m = c.merge(v, on="hr", how="outer")
        return pa.table(
            {
                "hr": pa.array(m["hr"].astype("datetime64[us]")),
                "n_click": pa.array(m["n_click"].fillna(-1).to_numpy(np.int64)),
                "n_view": pa.array(m["n_view"].fillna(-1).to_numpy(np.int64)),
            }
        )

    out = cogroup(
        [hourly("click"), hourly("view")], [["hr"], ["hr"]], num_parts, merge,
        [hr_schema, hr_schema],
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "hr": pd.Series([], dtype="datetime64[us]"),
                "n_click": pd.Series([], dtype="int64"),
                "n_view": pd.Series([], dtype="int64"),
            }
        )
    for c in ("n_click", "n_view"):
        out[c] = out[c].astype("int64")
    return out.sort_values("hr").reset_index(drop=True)


# --- Benford first-digit audit ------------------------------------------------

# round(log10(1 + 1/d) * 1e6) for d = 1..9; the nine roundings sum to exactly
# 1_000_000, so the expected shares form a true ppm partition. Fixed integer
# constants — both engine and SQL compare against the SAME literals, no
# transcendental is evaluated at query time on either side.
_BENFORD_PPM = np.array(
    [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757],
    dtype=np.int64,
)


def benford_audit(sf_dir: str) -> pd.DataFrame:
    """Benford's-law first-significant-digit audit over order totals (the
    classic fraud/synthetic-data screen): the distribution of the leading
    digit of o_totalprice in exact integer cents vs Benford's log10(1+1/d)
    expectation, as integer ppm shares — obs_ppm = n·10⁶ // N (floor), dev_ppm
    = |obs_ppm − exp_ppm|. Everything int64-bounded at ANY corpus size
    (shares ≤ 10⁶), no float log anywhere.

    Shape: per-batch 9-bin digit histograms (searchsorted against the int64
    powers of ten — exact, no float log10) → one ≤9-row-per-partition
    groupby; the ppm arithmetic runs on the 9-row result.
    """
    ds = read(sf_dir, "orders", columns=["o_totalprice"])
    pows = np.power(10, np.arange(19), dtype=np.int64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["o_totalprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        cents = cents[cents > 0]
        mag = np.searchsorted(pows, cents, side="right") - 1
        digit = cents // pows[mag]
        g = pd.DataFrame({"digit": digit}).groupby("digit", sort=False).size()
        g = g.reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    hist = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["digit"],
        {"n": ("n", "sum")},
    ).to_pandas()
    empty = pd.DataFrame({
        "digit": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "exp_ppm": pd.Series([], dtype="int64"),
        "obs_ppm": pd.Series([], dtype="int64"),
        "dev_ppm": pd.Series([], dtype="int64"),
    })
    if hist.empty:
        return empty
    hist["n"] = hist["n"].astype("int64")
    total = int(hist["n"].sum())
    hist["digit"] = hist["digit"].astype("int64")
    hist["exp_ppm"] = _BENFORD_PPM[hist["digit"].to_numpy() - 1]
    hist["obs_ppm"] = hist["n"].to_numpy() * 1_000_000 // total
    hist["dev_ppm"] = np.abs(hist["obs_ppm"] - hist["exp_ppm"])
    return hist.sort_values("digit").reset_index(drop=True)


# --- association rules (market-basket pair supports) ----------------------------


def assoc_rules(sf_dir: str, *, top: int = 25, num_parts: int = 8) -> pd.DataFrame:
    """Market-basket association mining (Agrawal et al. 1993) over orders as
    baskets and parts as items: the ``top`` co-ordered part pairs by exact
    support, with both item supports and the basket count riding along so
    confidence support_ab/support_a and lift n·s_ab/(s_a·s_b) are one
    consumer division each. Ties at the boundary break by (part_a, part_b)
    ascending. All counts exact int64.

    Distributed shape: ONE orderkey-keyed exchange (baskets are tiny —
    pairs per order bounded by C(lineitems,2) ≈ 21); inside a partition:
    per-order distinct parts → pair expansion (the allen run-expansion
    scheme) → partial (pa, pb) counts, with item supports (pb = −1) and the
    partition's basket count (−1, −1) folded into the SAME stream. A second
    (pa, pb)-keyed aggregate finishes; top-k is per-block partial + a k·P
    driver merge, and only the ≤2·top winners' item supports are pulled."""
    from ..ops import direct_partitioned_map

    pre_schema = pa.schema(
        [("o", pa.int64()), ("p", pa.int64())]
    )
    out_schema = pa.schema(
        [("pa", pa.int64()), ("pb", pa.int64()), ("c", pa.int64())]
    )

    def pre(t: pa.Table) -> pa.Table:
        g = (
            pd.DataFrame({
                "o": t["l_orderkey"].to_numpy(zero_copy_only=False),
                "p": t["l_partkey"].to_numpy(zero_copy_only=False),
            })
            .drop_duplicates()
        )
        return pa.Table.from_pandas(g, preserve_index=False).cast(pre_schema)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = t.to_pandas().drop_duplicates().sort_values(["o", "p"])
        o = df["o"].to_numpy(np.int64)
        p = df["p"].to_numpy(np.int64)
        starts = np.flatnonzero(np.r_[True, o[1:] != o[:-1]])
        lens = np.diff(np.r_[starts, len(o)])
        parts = [
            pd.DataFrame({"pa": p, "pb": np.full(len(p), -1, np.int64)}),
            pd.DataFrame({
                "pa": np.array([-1], np.int64), "pb": np.array([-1], np.int64),
                "c": np.array([len(starts)], np.int64),
            }),
        ]
        if int((lens * (lens - 1) // 2).sum()) > 0:
            reps = np.concatenate([np.arange(k - 1, -1, -1) for k in lens])
            li = np.repeat(np.arange(len(o)), reps)
            seg = np.repeat(np.cumsum(reps) - reps, reps)
            ri = li + 1 + (np.arange(int(reps.sum())) - seg)
            parts.insert(0, pd.DataFrame({"pa": p[li], "pb": p[ri]}))
        pair_df = pd.concat(
            [d for d in parts if "c" not in d.columns], ignore_index=True
        )
        g = pair_df.groupby(["pa", "pb"], sort=False).size().reset_index(name="c")
        g = pd.concat([g, parts[-1]], ignore_index=True)
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).cast(out_schema)

    ds = read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    # shuffle chaining: the basket exchange emits its partials already
    # hash-partitioned on (pa, pb), and the final sum is a per-partition
    # pandas groupby over the grid — Ray's sort-based groupby.aggregate
    # cost 7.3 s on the 134k-row partial table (the r4 profile's worst
    # query); the chained direct exchange finishes in well under a second
    from ..ops import direct_cogroup

    grid = direct_cogroup(
        [ds], [["o"]], num_parts, fn, [pre_schema], pres=[pre],
        emit_partitioned_on=["pa", "pb"],
    )

    def sum_fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return out_schema.empty_table()
        g = (
            t.to_pandas()
            .groupby(["pa", "pb"], sort=False, as_index=False)["c"].sum()
        )
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).cast(out_schema)

    agg = direct_cogroup(
        [grid], [["pa", "pb"]], num_parts, sum_fn, [out_schema]
    ).materialize()

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64")
         for c in ("part_a", "part_b", "support_ab", "support_a",
                   "support_b", "n_orders")}
    )
    pairs_only = agg.filter(expr="pb >= 0")
    top_df = topk(
        pairs_only, "c", top, tie_cols=["pa", "pb"], empty_schema=out_schema
    )
    if top_df.empty:
        return empty
    top_df = top_df.rename(
        columns={"pa": "part_a", "pb": "part_b", "c": "support_ab"}
    )
    want = set(top_df["part_a"]) | set(top_df["part_b"])

    sup = {}
    n_orders = 0
    for b in agg.filter(expr="pb == -1").iter_batches(batch_format="pyarrow"):
        pa_arr = b["pa"].to_numpy(zero_copy_only=False)
        c_arr = b["c"].to_numpy(zero_copy_only=False)
        for pid, c in zip(pa_arr, c_arr):
            if pid == -1:
                n_orders += int(c)
            elif int(pid) in want:
                sup[int(pid)] = int(c)
    top_df["support_a"] = top_df["part_a"].map(sup).astype("int64")
    top_df["support_b"] = top_df["part_b"].map(sup).astype("int64")
    top_df["n_orders"] = np.int64(n_orders)
    for c in top_df.columns:
        top_df[c] = top_df[c].astype("int64")
    return (
        top_df.sort_values(["support_ab", "part_a", "part_b"],
                           ascending=[False, True, True])
        .reset_index(drop=True)
    )


# --- Soundex phonetic coding (entity-resolution blocking key) --------------------

_SOUNDEX_CODE = {}
for _grp, _d in (("bfpv", 1), ("cgjkqsxz", 2), ("dt", 3), ("l", 4),
                 ("mn", 5), ("r", 6)):
    for _ch in _grp:
        _SOUNDEX_CODE[_ch] = _d
for _ch in "hw":
    _SOUNDEX_CODE[_ch] = -1  # transparent: preserves the previous code
# vowels (aeiouy) and anything else: 0 — breaks same-code runs


def soundex_code(word: str) -> str:
    """American Soundex (Russell/Odell), the full rulebook: first letter
    kept; later letters append their digit iff it differs from the PREVIOUS
    letter's code, where h/w are transparent (keep the previous code — same
    digits across h/w collapse) and vowels reset it (same digits across a
    vowel both survive); pad/truncate to 4. Empty input → ''."""
    w = word.lower()
    if not w:
        return ""
    first = w[0].upper()
    prev = _SOUNDEX_CODE.get(w[0], 0)
    acc = first
    for ch in w[1:]:
        d = _SOUNDEX_CODE.get(ch, 0)
        if 1 <= d != prev and len(acc) < 4:
            acc += str(d)
        if d != -1:
            prev = d
    return (acc + "000")[:4]


def soundex_parts(sf_dir: str) -> pd.DataFrame:
    """Soundex blocking-key histogram over part names — the phonetic
    entity-resolution primitive (block candidate duplicate names by code,
    verify inside blocks): for every part, the Soundex of the FIRST word of
    p_name; output (soundex, n) counts. The state machine runs once per
    DISTINCT word per batch (vocabulary-bounded work, the BPE unique-word
    scheme), then a tiny code-keyed aggregate — strings never shuffle raw.
    """
    ds = read(sf_dir, "part", columns=["p_name"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        first = df["p_name"].astype(str).str.split(" ", n=1).str[0]
        uniq = pd.unique(first)
        table = {w: soundex_code(w) for w in uniq}
        codes = first.map(table)
        g = codes.value_counts().rename_axis("soundex").reset_index(name="n")
        g["n"] = g["n"].astype("int64")
        return g

    out = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["soundex"], {"n": ("n", "sum")},
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({
            "soundex": pd.Series([], dtype=object),
            "n": pd.Series([], dtype="int64"),
        })
    out["n"] = out["n"].astype("int64")
    return out.sort_values("soundex").reset_index(drop=True)


# --- bloom-filter false-positive-rate audit ---------------------------------------


def bloom_fpr_audit(sf_dir: str) -> pd.DataFrame:
    """Measured (not estimated) false-positive audit of the semi-join bloom
    filter: build the production filter (same 2²⁰-bit Kirsch–Mitzenmacher
    double-hash spec as ``bloom_semi_join``) over the ordering customers,
    probe EVERY customer, and report the exact counts — n_probes, n_members
    (exact distinct build keys), n_pass (bloom accepts), n_fp = n_pass −
    n_members (no false negatives ⇒ every member passes), plus bits_set
    (filter popcount, the load factor behind the FP math). The sketch-QA
    sibling of ``cms_token_counts``/``ams_f2``: the filter's REAL error on
    real keys, hash-checkable because the whole spec is integer arithmetic.

    Shape: build = per-batch 128 KiB OR partials → 64-way OR level → driver
    OR (the bloom_semi_join tree); probes test per batch against the
    broadcast filter (``ray.put`` once); n_members is the one honest
    key-keyed exchange. Output: one row of exact int64 stats.
    """
    import ray

    words = _BLOOM_BITS >> 6

    def partial(t: pa.Table) -> pa.Table:
        bits = np.zeros(words, dtype=np.uint64)
        keys = t["o_custkey"].to_numpy(zero_copy_only=False)
        for idx in _bloom_hashes(keys, _BLOOM_BITS):
            np.bitwise_or.at(
                bits, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64)
            )
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    def or_level(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in t["bits"]:
            acc |= np.frombuffer(blob.as_py(), dtype=np.uint64)
        return pa.table({"bits": pa.array([acc.tobytes()], pa.binary())})

    orders = read(sf_dir, "orders", columns=["o_custkey"]).materialize()
    blobs = (
        orders.map_batches(partial, batch_format="pyarrow")
        .map_batches(or_level, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    bits = np.zeros(words, dtype=np.uint64)
    for row in blobs:
        bits |= np.frombuffer(row["bits"], dtype=np.uint64)
    bits_set = int(np.unpackbits(bits.view(np.uint8)).sum())
    bits_ref = ray.put(bits)

    def probe_partial(t: pa.Table) -> pa.Table:
        b = ray.get(bits_ref)
        keys = t["c_custkey"].to_numpy(zero_copy_only=False)
        ok = _bloom_member(b, keys, _BLOOM_BITS)
        return pa.table({
            "n": pa.array([len(keys)]), "p": pa.array([int(ok.sum())]),
        })

    probes = read(sf_dir, "customer", columns=["c_custkey"]).map_batches(
        probe_partial, batch_format="pyarrow"
    ).to_pandas()
    n_probes = int(probes["n"].sum()) if not probes.empty else 0
    n_pass = int(probes["p"].sum()) if not probes.empty else 0
    members = grouped_agg(
        orders, ["o_custkey"], {"c": (None, "count")}
    ).map_batches(
        lambda t: pa.table({"m": pa.array([t.num_rows])}),
        batch_format="pyarrow",
    ).to_pandas()
    n_members = int(members["m"].sum()) if not members.empty else 0
    return pd.DataFrame({
        "m_bits": pd.array([_BLOOM_BITS], dtype="int64"),
        "k_hashes": pd.array([_BLOOM_K], dtype="int64"),
        "n_probes": pd.array([n_probes], dtype="int64"),
        "n_members": pd.array([n_members], dtype="int64"),
        "n_pass": pd.array([n_pass], dtype="int64"),
        "n_fp": pd.array([n_pass - n_members], dtype="int64"),
        "bits_set": pd.array([bits_set], dtype="int64"),
    })


# --- gravity model of trade flows --------------------------------------------------


def trade_gravity(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Gravity-model sufficient statistics of international trade flows
    (Tinbergen 1962): per (customer nation, supplier nation), the observed
    revenue plus its row, column and grand totals — expected ∝
    row·col/total, so the gravity residual is one consumer division away
    from these exact integers. Revenue is exact "centicents":
    price_cents · (100 − disc_pct) with both factors floor(x·100+0.5) —
    no float multiply anywhere. int64 audit: Σ cc overflows past ~3·10⁹
    lineitems per nation pair; the python-int total fold RAISES first.

    Distributed shape: the fact side crosses ONE orderkey-keyed cogroup
    (orders-projection × lineitem — the PageRank edge-builder shape); both
    dimension hops (custkey→nation, suppkey→nation) are broadcast probes
    inside that cogroup, so what leaves it is already (cnat, snat, cc)
    partials; a ≤25²-row groupby and driver total arithmetic finish.
    """
    import ray

    from ..ops import direct_cogroup

    cust = read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"]).to_pandas()
    supp = read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nation = read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    cust = cust.sort_values("c_custkey")
    supp = supp.sort_values("s_suppkey")
    nation = nation.sort_values("n_nationkey")
    ref = ray.put((
        cust["c_custkey"].to_numpy(np.int64),
        cust["c_nationkey"].to_numpy(np.int64),
        supp["s_suppkey"].to_numpy(np.int64),
        supp["s_nationkey"].to_numpy(np.int64),
        nation["n_nationkey"].to_numpy(np.int64),
        nation["n_name"].to_numpy(object),
    ))

    orders = read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    items = read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    part_schema = pa.schema(
        [("cn", pa.string()), ("sn", pa.string()), ("cc", pa.int64())]
    )

    def fuse(o_t: pa.Table, l_t: pa.Table) -> pa.Table:
        if o_t.num_rows == 0 or l_t.num_rows == 0:
            return part_schema.empty_table()
        ck, cn, sk, snk, nk, nm = ray.get(ref)
        od = o_t.to_pandas()
        ld = l_t.to_pandas()
        m = ld.merge(od, left_on="l_orderkey", right_on="o_orderkey",
                     how="inner")
        if m.empty:
            return part_schema.empty_table()
        keys = m["o_custkey"].to_numpy(np.int64)
        cpos = np.clip(np.searchsorted(ck, keys), 0, len(ck) - 1)
        hit = ck[cpos] == keys
        skeys = m["l_suppkey"].to_numpy(np.int64)
        spos = np.clip(np.searchsorted(sk, skeys), 0, len(sk) - 1)
        hit &= sk[spos] == skeys
        cnk = cn[cpos]
        snk2 = snk[spos]
        cn_pos = np.clip(np.searchsorted(nk, cnk), 0, len(nk) - 1)
        sn_pos = np.clip(np.searchsorted(nk, snk2), 0, len(nk) - 1)
        hit &= (nk[cn_pos] == cnk) & (nk[sn_pos] == snk2)
        cents = np.floor(
            m["l_extendedprice"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        dpct = np.floor(
            m["l_discount"].to_numpy(np.float64) * 100 + 0.5
        ).astype(np.int64)
        cc = cents * (100 - dpct)
        g = (
            pd.DataFrame({
                "cn": nm[cn_pos][hit], "sn": nm[sn_pos][hit], "cc": cc[hit],
            })
            .groupby(["cn", "sn"], sort=False)["cc"].sum().reset_index()
        )
        g["cc"] = g["cc"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False).cast(part_schema)

    parts = direct_cogroup(
        [orders.materialize(), items.materialize()],
        [["o_orderkey"], ["l_orderkey"]], num_parts, fuse,
        [
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64()),
                       ("l_extendedprice", pa.float64()),
                       ("l_discount", pa.float64())]),
        ],
    )
    obs = grouped_agg(parts, ["cn", "sn"], {"cc": ("cc", "sum")}).to_pandas()
    empty = pd.DataFrame({
        "cust_nation": pd.Series([], dtype=object),
        "supp_nation": pd.Series([], dtype=object),
        "obs_cc": pd.Series([], dtype="int64"),
        "row_cc": pd.Series([], dtype="int64"),
        "col_cc": pd.Series([], dtype="int64"),
        "total_cc": pd.Series([], dtype="int64"),
    })
    if obs.empty:
        return empty
    obs = obs.rename(columns={"cn": "cust_nation", "sn": "supp_nation",
                              "cc": "obs_cc"})
    obs["obs_cc"] = obs["obs_cc"].astype("int64")
    total = sum(int(v) for v in obs["obs_cc"])
    if total >= 2**63:
        raise OverflowError("trade_gravity: totals exceed int64")
    row = obs.groupby("cust_nation")["obs_cc"].sum().rename("row_cc")
    col = obs.groupby("supp_nation")["obs_cc"].sum().rename("col_cc")
    obs = obs.merge(row, on="cust_nation").merge(col, on="supp_nation")
    obs["total_cc"] = np.int64(total)
    for c in ("obs_cc", "row_cc", "col_cc", "total_cc"):
        obs[c] = obs[c].astype("int64")
    return obs.sort_values(["cust_nation", "supp_nation"]).reset_index(drop=True)


# --- functional-dependency / key profiling ----------------------------------------

_FD_CANDIDATES = (
    # (table, determinant, dependent)
    ("lineitem", "l_orderkey", "l_suppkey"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("lineitem", "l_suppkey", "l_partkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_custkey"),
)


def fd_profile(sf_dir: str) -> pd.DataFrame:
    """Functional-dependency discovery profile (the TANE-family
    data-profiling primitive, Huhtala et al. 1999): for each candidate
    X → Y, the number of distinct determinant values and how many of them
    VIOLATE the dependency (map to ≥2 distinct dependents) — n_violations
    = 0 certifies the FD holds exactly (o_orderkey → o_custkey must; the
    co-supply pairs must not). Exact integer counts only.

    Distributed shape per candidate: per-batch distinct (det, dep) partials
    → ONE det-keyed exchange counting distinct deps per determinant →
    per-partition (n_keys, n_violations) partials — the driver sums
    ≤ P rows per candidate; determinant key sets never leave the workers.
    """
    from ..ops import direct_partitioned_map

    rows = []
    for table, det, dep in _FD_CANDIDATES:
        ds = read(sf_dir, table, columns=[det, dep])

        pre_schema = pa.schema([("det", pa.int64()), ("dep", pa.string())])

        def pre(t: pa.Table, det=det, dep=dep) -> pa.Table:
            df = pd.DataFrame({
                "det": t[det].to_numpy(zero_copy_only=False),
                "dep": np.asarray(t[dep].to_pandas().astype(str), dtype=object),
            }).drop_duplicates()
            return pa.Table.from_pandas(df, preserve_index=False).cast(pre_schema)

        stat_schema = pa.schema([("n_keys", pa.int64()), ("n_viol", pa.int64())])

        def fold(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return stat_schema.empty_table()
            df = t.to_pandas().drop_duplicates()
            g = df.groupby("det", sort=False)["dep"].nunique()
            return pa.table({
                "n_keys": pa.array([int(len(g))]),
                "n_viol": pa.array([int((g >= 2).sum())]),
            })

        parts = direct_partitioned_map(
            ds, ["det"], 8, fold, pre_schema, pre=pre
        ).to_pandas()
        n_keys = int(parts["n_keys"].sum()) if not parts.empty else 0
        n_viol = int(parts["n_viol"].sum()) if not parts.empty else 0
        rows.append((f"{table}.{det}", f"{table}.{dep}", n_keys, n_viol,
                     1 if n_viol == 0 else 0))
    out = pd.DataFrame(
        rows, columns=["det", "dep", "n_keys", "n_violations", "holds"]
    )
    for c in ("n_keys", "n_violations", "holds"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["det", "dep"]).reset_index(drop=True)
