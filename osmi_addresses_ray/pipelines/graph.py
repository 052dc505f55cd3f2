"""Link-graph operators (PageRank) over the relational tables.

PageRank is the classic authority-weighting step of a web-corpus training
pipeline (quality-weight documents by the link graph before sampling). The
engine's graph is the customer↔supplier bipartite graph induced by orders:
an undirected edge per DISTINCT (o_custkey, l_suppkey) pair that ever traded
(node ids: customer = custkey, supplier = 1_000_000 + suppkey).

Exactness: ranks are SCALED INTEGERS (r₀ = 10¹² per node) and one iteration
is r'(v) = (3·SCALE)//20 + Σ_{u→v} (17·r(u)) // (20·outdeg(u)) — the d=0.85
damping expressed as exact rationals with floor division. Integer sums are
associative, so the distributed result is bit-equal to the DuckDB oracle's
unrolled iterations regardless of partitioning or reduce order (the repo's
exact-integer float-parity rule).

Distributed shape (every wide step an explicit hash exchange, shuffle-chained
via ``emit_partitioned_on`` so intermediates never take an extra object-store
round trip):
  1. orderkey-keyed cogroup of orders × lineitem → directed edge emissions,
     re-partitioned on src.
  2. per-src partition: global distinct (src, dst) (all rows of a src live in
     one partition) + outdeg attach; nodes table derived the same way.
  3. per iteration: [ranks ⨝ edges] keyed on the node hash space → per-edge
     integer contributions re-partitioned on dst; [contributions ⨝ nodes]
     → next ranks, re-partitioned on node. Two chained exchanges per
     iteration, volume O(|E|) — nothing driver-side, no broadcast.
At 10¹²-doc scale the node space is huge: everything stays hash-partitioned;
the only driver materialization is the final top-k merge (k·P rows).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

SCALE = 10**12
_SUPP_BASE = 1_000_000


def _read(sf_dir: str, table: str, columns):
    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def pagerank_trade(
    sf_dir: str, *, iters: int = 5, num_parts: int = 8, top: int = 25
) -> pd.DataFrame:
    """Top-``top`` nodes of the trade graph by ``iters``-step integer PageRank.

    Output: (node_id, pr) — pr is the exact scaled-integer rank; ties break
    by node_id ascending. See module docstring for the iteration rule.
    """
    from ..ops import direct_cogroup

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).materialize()
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).materialize()

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def to_edges(o: pa.Table, l: pa.Table) -> pa.Table:
        od = o.to_pandas()
        ld = l.to_pandas()
        m = ld.merge(od, left_on="l_orderkey", right_on="o_orderkey", how="inner")
        cust = m["o_custkey"].to_numpy(np.int64)
        supp = m["l_suppkey"].to_numpy(np.int64) + _SUPP_BASE
        return pa.table(
            {
                "src": pa.array(np.concatenate([cust, supp])),
                "dst": pa.array(np.concatenate([supp, cust])),
            }
        )

    emissions = direct_cogroup(
        [orders, lineitem],
        [["o_orderkey"], ["l_orderkey"]],
        num_parts,
        to_edges,
        [
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64())]),
        ],
        emit_partitioned_on=["src"],
    )

    # 2. per-partition global distinct + outdeg (a src's rows are co-located)
    dedup_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("outdeg", pa.int64())]
    )

    def distinct_with_deg(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["src", "dst"])
        deg = df.groupby("src")["dst"].transform("size").to_numpy(np.int64)
        return pa.table(
            {
                "src": pa.array(df["src"].to_numpy(np.int64)),
                "dst": pa.array(df["dst"].to_numpy(np.int64)),
                "outdeg": pa.array(deg),
            }
        )

    edges = direct_cogroup(
        [emissions], [["src"]], num_parts, distinct_with_deg, [edge_schema],
        emit_partitioned_on=["src"],
    )

    node_schema = pa.schema([("node", pa.int64()), ("r", pa.int64())])

    def init_ranks(t: pa.Table) -> pa.Table:
        nodes = np.unique(t.to_pandas()["src"].to_numpy(np.int64))
        return pa.table(
            {"node": pa.array(nodes), "r": pa.array(np.full(len(nodes), SCALE, np.int64))}
        )

    ranks = direct_cogroup(
        [edges], [["src"]], num_parts, init_ranks, [dedup_schema],
        emit_partitioned_on=["node"],
    )

    base = (3 * SCALE) // 20
    contrib_schema = pa.schema([("dst", pa.int64()), ("c", pa.int64())])

    def contribs(r_t: pa.Table, e_t: pa.Table) -> pa.Table:
        if e_t.num_rows == 0:
            return contrib_schema.empty_table()
        rdf = r_t.to_pandas()
        edf = e_t.to_pandas()
        nodes = rdf["node"].to_numpy(np.int64)
        rvals = rdf["r"].to_numpy(np.int64)
        order = np.argsort(nodes, kind="stable")
        src = edf["src"].to_numpy(np.int64)
        r_src = rvals[order[np.searchsorted(nodes[order], src)]]
        c = (17 * r_src) // (20 * edf["outdeg"].to_numpy(np.int64))
        return pa.table({"dst": pa.array(edf["dst"].to_numpy(np.int64)), "c": pa.array(c)})

    def gather(c_t: pa.Table, r_t: pa.Table) -> pa.Table:
        rdf = r_t.to_pandas()
        nodes = rdf["node"].to_numpy(np.int64)
        new_r = np.full(len(nodes), base, dtype=np.int64)
        cdf = c_t.to_pandas()
        if len(cdf):
            order = np.argsort(nodes, kind="stable")
            row = order[np.searchsorted(nodes[order], cdf["dst"].to_numpy(np.int64))]
            np.add.at(new_r, row, cdf["c"].to_numpy(np.int64))
        return pa.table({"node": pa.array(nodes), "r": pa.array(new_r)})

    for it in range(iters):
        last = it == iters - 1
        cpp = direct_cogroup(
            [ranks, edges], [["node"], ["src"]], num_parts, contribs,
            [node_schema, dedup_schema], emit_partitioned_on=["dst"],
        )
        ranks = direct_cogroup(
            [cpp, ranks], [["dst"], ["node"]], num_parts, gather,
            [contrib_schema, node_schema],
            emit_partitioned_on=None if last else ["node"],
        )

    # 3. per-partition top-k, tiny driver merge (k rows per partition)
    def topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(
            ["r", "node"], ascending=[False, True], kind="stable"
        )
        return pa.Table.from_pandas(df.head(top), preserve_index=False)

    parts = ranks.map_batches(topk, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["r", "node"], ascending=[False, True], kind="stable")
    out = parts.head(top).reset_index(drop=True)
    return pd.DataFrame(
        {"node_id": out["node"].astype("int64"), "pr": out["r"].astype("int64")}
    )


def triangle_counts(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Per-supplier triangle participation counts in the co-supplier graph
    (undirected edge = two suppliers that supply at least one common part in
    lineitem), via degree-ordered wedge checking (Suri & Vassilvitskii 2011;
    Cohen's MapReduce triangle enumeration):

    1. part-keyed exchange with a map-side (part, supp) distinct fused into
       the split wave: per part, triangular pair expansion (sa < sb) — a
       part with S suppliers emits C(S,2) pairs (the hot-part knob is the
       match stage's salting family; at this corpus the co-supplier graph is
       near-COMPLETE, the worst case for wedge counting, a deliberate stress
       shape).
    2. pair-keyed exchange dedups pairs shared by several parts → simple
       edge set; per-partition (node, deg) partials → one tiny groupby →
       degree table broadcast via ``ray.put`` (|V| = #suppliers; past the
       broadcast budget this becomes a node-keyed hash join — the
       places-index fallback family).
    3. src-keyed exchange of edges oriented low-(deg, id) → high-(deg, id)
       (bounds every out-degree by O(sqrt(|E|)), so wedge volume is
       O(|E|^1.5) worst case instead of Σ deg²): per source, triangular
       wedge expansion over its out-neighbours, wedge key = (min, max) by
       node id.
    4. (a, b)-keyed co-group of wedges × canonical edges: a wedge closed by
       an edge is exactly ONE triangle (only the lowest-(deg, id) vertex of
       a triangle emits its wedge); per-partition (node, cnt) partials over
       {center, a, b} → one final tiny grouped sum.

    Output: (s_suppkey, n_triangles) for suppliers in ≥1 triangle, exact
    integers, ordered by supplier.
    """
    import ray

    from ..ops import direct_cogroup, direct_partitioned_map
    from .relational import grouped_agg

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).materialize()

    pair_schema = pa.schema([("sa", pa.int64()), ("sb", pa.int64())])
    ps_schema = pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())])

    def pre_distinct(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if not len(pk):
            return ps_schema.empty_table()
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        return pa.table({"l_partkey": pk[keep], "l_suppkey": sk[keep]})

    def _triangular(groups: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Index pairs (i, j), i<j, within each group run of the sorted
        ``groups`` array. Returns (left_idx, right_idx)."""
        if not len(groups):
            e = np.empty(0, np.int64)
            return e, e
        first = np.r_[True, groups[1:] != groups[:-1]]
        gidx = np.cumsum(first) - 1
        counts = np.bincount(gidx)
        goffs = np.concatenate(([0], np.cumsum(counts)))
        pos = np.arange(len(groups)) - goffs[gidx]
        fanout = counts[gidx] - 1 - pos
        total = int(fanout.sum())
        if not total:
            e = np.empty(0, np.int64)
            return e, e
        lefts = np.repeat(np.arange(len(groups)), fanout)
        offs = np.concatenate(([0], np.cumsum(fanout)))
        rights = lefts + 1 + (np.arange(total) - np.repeat(offs[:-1], fanout))
        return lefts, rights

    def part_pairs(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if not len(pk):
            return pair_schema.empty_table()
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        pk, sk = pk[keep], sk[keep]
        li_, ri_ = _triangular(pk)
        return pa.table({"sa": sk[li_], "sb": sk[ri_]})

    pairs = direct_partitioned_map(
        li, ["l_partkey"], num_parts, part_pairs, ps_schema, pre=pre_distinct
    )

    def dedup_pairs(t: pa.Table) -> pa.Table:
        sa = t["sa"].to_numpy().astype(np.int64)
        sb = t["sb"].to_numpy().astype(np.int64)
        if not len(sa):
            return pair_schema.empty_table()
        order = np.lexsort((sb, sa))
        sa, sb = sa[order], sb[order]
        keep = np.r_[True, (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        return pa.table({"sa": sa[keep], "sb": sb[keep]})

    edges = direct_cogroup(
        [pairs], [["sa", "sb"]], num_parts, dedup_pairs, [pair_schema]
    ).materialize()

    # degrees: per-block partials -> tiny groupby -> broadcast
    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [t["sa"].to_numpy().astype(np.int64), t["sb"].to_numpy().astype(np.int64)]
        )
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"node": u, "deg": c.astype(np.int64)})

    deg = grouped_agg(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"],
        {"deg": ("deg", "sum")},
    ).to_pandas()
    if deg.empty or "node" not in deg.columns:  # edgeless graph: no triangles
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "n_triangles": pd.Series([], dtype="int64"),
            }
        )
    deg = deg.sort_values("node").reset_index(drop=True)
    deg_ref = ray.put(
        (deg["node"].to_numpy(np.int64), deg["deg"].to_numpy(np.int64))
    )

    wedge_schema = pa.schema(
        [("a", pa.int64()), ("b", pa.int64()), ("center", pa.int64())]
    )
    orient_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def orient(t: pa.Table) -> pa.Table:
        nodes, degs = ray.get(deg_ref)
        sa = t["sa"].to_numpy().astype(np.int64)
        sb = t["sb"].to_numpy().astype(np.int64)
        if not len(sa):
            return orient_schema.empty_table()
        da = degs[np.searchsorted(nodes, sa)]
        db = degs[np.searchsorted(nodes, sb)]
        a_first = (da < db) | ((da == db) & (sa < sb))
        return pa.table(
            {"src": np.where(a_first, sa, sb), "dst": np.where(a_first, sb, sa)}
        )

    def wedge_expand(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy().astype(np.int64)
        dst = t["dst"].to_numpy().astype(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        # out-neighbours sorted by node id -> wedge pairs come out a < b
        li_, ri_ = _triangular(src)
        return pa.table({"a": dst[li_], "b": dst[ri_], "center": src[li_]})

    wedges = direct_partitioned_map(
        edges, ["src"], num_parts, wedge_expand, orient_schema, pre=orient
    )

    cnt_schema = pa.schema([("node", pa.int64()), ("cnt", pa.int64())])

    def close_wedges(w_t: pa.Table, e_t: pa.Table) -> pa.Table:
        if w_t.num_rows == 0 or e_t.num_rows == 0:
            return cnt_schema.empty_table()
        ea = e_t["sa"].to_numpy().astype(np.int64)
        eb = e_t["sb"].to_numpy().astype(np.int64)
        eorder = np.lexsort((eb, ea))
        ea, eb = ea[eorder], eb[eorder]
        wa = w_t["a"].to_numpy().astype(np.int64)
        wb = w_t["b"].to_numpy().astype(np.int64)
        wc = w_t["center"].to_numpy().astype(np.int64)
        # two-key membership probe: one searchsorted on a packed key
        # (supplier ids are < 2^31, so sa*2^32 + sb cannot overflow int64)
        key_e = ea * np.int64(1 << 32) + eb
        key_w = wa * np.int64(1 << 32) + wb
        p = np.searchsorted(key_e, key_w)
        hit = (p < len(key_e)) & (key_e[np.minimum(p, len(key_e) - 1)] == key_w)
        tri_nodes = np.concatenate([wa[hit], wb[hit], wc[hit]])
        if not len(tri_nodes):
            return cnt_schema.empty_table()
        u, c = np.unique(tri_nodes, return_counts=True)
        return pa.table({"node": u, "cnt": c.astype(np.int64)})

    partials = direct_cogroup(
        [wedges, edges],
        [["a", "b"], ["sa", "sb"]],
        num_parts,
        close_wedges,
        [wedge_schema, pair_schema],
    )
    out = grouped_agg(partials, ["node"], {"cnt": ("cnt", "sum")}).to_pandas()
    if out.empty or "node" not in out.columns:  # triangle-free graph
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype="int64"),
                "n_triangles": pd.Series([], dtype="int64"),
            }
        )
    out = out.sort_values("node").reset_index(drop=True)
    return pd.DataFrame(
        {
            "s_suppkey": out["node"].astype("int64"),
            "n_triangles": out["cnt"].astype("int64"),
        }
    )


def bfs_hops(
    sf_dir: str, *, seed_mod: int = 97, max_hops: int = 4, num_parts: int = 8
) -> pd.DataFrame:
    """Multi-source BFS over the trade graph: minimum hop count from the
    seed set (customers with ``c_custkey % seed_mod == 0``, hop 0 — seeds
    with no trades still appear) to every node reachable within
    ``max_hops``; farther nodes are omitted.

    Distributed shape — the pregel frontier loop, every step an explicit
    hash exchange like the PageRank iterations above: per round,
    [dist ⨝ edges] keyed on the node hash space emits (dst) for FRONTIER
    rows only (hops == round-1), re-partitioned on dst; [emissions ⨝ dist]
    merges, assigning the round number to first-time nodes. Volume per
    round is O(frontier-degree sum), never O(V·rounds); nothing lives on
    the driver. Hop counts are integers, so the result is bit-equal to the
    DuckDB ``WITH RECURSIVE`` oracle regardless of partitioning or reduce
    order.
    """
    from ..ops import direct_cogroup, direct_partitioned_map

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).materialize()
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).materialize()

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def to_edges(o: pa.Table, l: pa.Table) -> pa.Table:
        od = o.to_pandas()
        ld = l.to_pandas()
        m = ld.merge(od, left_on="l_orderkey", right_on="o_orderkey", how="inner")
        cust = m["o_custkey"].to_numpy(np.int64)
        supp = m["l_suppkey"].to_numpy(np.int64) + _SUPP_BASE
        return pa.table(
            {
                "src": pa.array(np.concatenate([cust, supp])),
                "dst": pa.array(np.concatenate([supp, cust])),
            }
        )

    emissions = direct_cogroup(
        [orders, lineitem],
        [["o_orderkey"], ["l_orderkey"]],
        num_parts,
        to_edges,
        [
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64())]),
        ],
        emit_partitioned_on=["src"],
    )

    def distinct_edges(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["src", "dst"])
        return pa.table(
            {
                "src": pa.array(df["src"].to_numpy(np.int64)),
                "dst": pa.array(df["dst"].to_numpy(np.int64)),
            }
        )

    edges = direct_cogroup(
        [emissions], [["src"]], num_parts, distinct_edges, [edge_schema],
        emit_partitioned_on=["src"],
    )

    dist_schema = pa.schema([("node", pa.int64()), ("hops", pa.int64())])

    def seed(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = np.unique(ck[ck % seed_mod == 0])
        return pa.table(
            {"node": pa.array(ck), "hops": pa.array(np.zeros(len(ck), np.int64))}
        )

    dist = direct_partitioned_map(
        _read(sf_dir, "customer", ["c_custkey"]).materialize(),
        ["c_custkey"], num_parts, seed,
        pa.schema([("c_custkey", pa.int64())]),
    )
    # re-key onto the node hash space the merge step uses
    dist = direct_cogroup(
        [dist], [["node"]], num_parts, lambda t: t, [dist_schema],
        emit_partitioned_on=["node"],
    )

    emit_schema = pa.schema([("dst", pa.int64())])

    for rnd in range(1, max_hops + 1):

        def expand(d_t: pa.Table, e_t: pa.Table, *, _r=rnd) -> pa.Table:
            if d_t.num_rows == 0 or e_t.num_rows == 0:
                return emit_schema.empty_table()
            dd = d_t.to_pandas()
            frontier = dd.loc[dd["hops"] == _r - 1, "node"].to_numpy(np.int64)
            if not len(frontier):
                return emit_schema.empty_table()
            edf = e_t.to_pandas()
            hit = np.isin(edf["src"].to_numpy(np.int64), frontier)
            return pa.table(
                {"dst": pa.array(np.unique(edf["dst"].to_numpy(np.int64)[hit]))}
            )

        def merge(n_t: pa.Table, d_t: pa.Table, *, _r=rnd) -> pa.Table:
            seen = d_t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            cand = np.unique(n_t["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
            new = cand[~np.isin(cand, seen)]
            return pa.table(
                {
                    "node": pa.array(np.concatenate([seen, new])),
                    "hops": pa.array(
                        np.concatenate(
                            [
                                d_t["hops"].to_numpy(zero_copy_only=False).astype(np.int64),
                                np.full(len(new), _r, np.int64),
                            ]
                        )
                    ),
                }
            )

        nxt = direct_cogroup(
            [dist, edges], [["node"], ["src"]], num_parts, expand,
            [dist_schema, edge_schema], emit_partitioned_on=["dst"],
        )
        dist = direct_cogroup(
            [nxt, dist], [["dst"], ["node"]], num_parts, merge,
            [emit_schema, dist_schema],
            emit_partitioned_on=None if rnd == max_hops else ["node"],
        )

    out = dist.to_pandas()
    if out.empty:  # no seeds in the corpus at all
        return pd.DataFrame(
            {
                "node_id": pd.Series([], dtype="int64"),
                "hops": pd.Series([], dtype="int64"),
            }
        )
    out["node_id"] = out["node"].astype("int64")
    out["hops"] = out["hops"].astype("int64")
    return out[["node_id", "hops"]].sort_values("node_id").reset_index(drop=True)


def kcore_nodes(
    sf_dir: str, *, k: int = 45, num_parts: int = 8, max_rounds: int = 64
) -> pd.DataFrame:
    """k-core of the trade graph: iteratively peel nodes of degree < ``k``
    until fixpoint; output the surviving nodes with their within-core
    degree. The classic density filter (Seidman 1983) a link-graph
    curation pass runs before sampling hub-anchored documents.

    Distributed shape — two chained hash exchanges per peel round, exactly
    the PageRank iteration budget: edges live partitioned on src (both
    directions of every undirected edge are stored, so a node's full
    adjacency is partition-local). Round = (1) per-partition degree count →
    dead srcs; their edges flip into KILL NOTICES (v, dead-u) keyed on the
    surviving endpoint, survivors pass through keyed on src — one mixed
    emission partitioned on the shared node hash space; (2) per partition,
    drop survivor edges pointing at a dead neighbor, re-emit partitioned on
    src for the next round. The driver sees only the edge COUNT per round
    (termination check); volume per round is O(E_remaining). ``max_rounds``
    is a runaway bound only — termination is the true fixpoint (a round
    that kills nobody).

    Degrees are integers and peeling is order-free within a round, so the
    result is partitioning-invariant and bit-equal to the naive
    peel-to-fixpoint oracle (oracle/llm_ops.kcore_oracle).
    """
    from ..ops import direct_cogroup

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).materialize()
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).materialize()

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])

    def to_edges(o: pa.Table, l: pa.Table) -> pa.Table:
        od = o.to_pandas()
        ld = l.to_pandas()
        m = ld.merge(od, left_on="l_orderkey", right_on="o_orderkey", how="inner")
        cust = m["o_custkey"].to_numpy(np.int64)
        supp = m["l_suppkey"].to_numpy(np.int64) + _SUPP_BASE
        return pa.table(
            {
                "src": pa.array(np.concatenate([cust, supp])),
                "dst": pa.array(np.concatenate([supp, cust])),
            }
        )

    emissions = direct_cogroup(
        [orders, lineitem],
        [["o_orderkey"], ["l_orderkey"]],
        num_parts,
        to_edges,
        [
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64())]),
        ],
        emit_partitioned_on=["src"],
    )

    def distinct_edges(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["src", "dst"])
        return pa.table(
            {
                "src": pa.array(df["src"].to_numpy(np.int64)),
                "dst": pa.array(df["dst"].to_numpy(np.int64)),
            }
        )

    edges = direct_cogroup(
        [emissions], [["src"]], num_parts, distinct_edges, [edge_schema],
        emit_partitioned_on=["src"],
    )

    mixed_schema = pa.schema(
        [("node", pa.int64()), ("other", pa.int64()), ("kind", pa.int64())]
    )

    def detect(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return mixed_schema.empty_table()
        df = t.to_pandas()
        deg = df.groupby("src")["dst"].transform("size").to_numpy(np.int64)
        dead = deg < k
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
        # survivors keyed on their own src; a dead node's edges become kill
        # notices keyed on the OTHER endpoint
        return pa.table(
            {
                "node": pa.array(np.where(dead, dst, src)),
                "other": pa.array(np.where(dead, src, dst)),
                "kind": pa.array(dead.astype(np.int64)),
            }
        )

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return edge_schema.empty_table()
        df = t.to_pandas()
        notices = df[df["kind"] == 1]
        surv = df[df["kind"] == 0]
        if len(notices):
            # vectorized anti-join on the (node, other) pair
            hit = surv.merge(
                notices[["node", "other"]].drop_duplicates(),
                on=["node", "other"],
                how="left",
                indicator=True,
            )
            surv = hit[hit["_merge"] == "left_only"]
        return pa.table(
            {
                "src": pa.array(surv["node"].to_numpy(np.int64)),
                "dst": pa.array(surv["other"].to_numpy(np.int64)),
            }
        )

    n_edges = edges.to_dataset().count()
    for _ in range(max_rounds):
        mixed = direct_cogroup(
            [edges], [["src"]], num_parts, detect, [edge_schema],
            emit_partitioned_on=["node"],
        )
        edges = direct_cogroup(
            [mixed], [["node"]], num_parts, clean, [mixed_schema],
            emit_partitioned_on=["src"],
        )
        n_new = edges.to_dataset().count()
        if n_new == n_edges:
            break
        n_edges = n_new

    def degrees(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("node_id", pa.int64()), ("degree", pa.int64())]
            ).empty_table()
        g = t.to_pandas().groupby("src").size()
        return pa.table(
            {
                "node_id": pa.array(g.index.to_numpy(np.int64)),
                "degree": pa.array(g.to_numpy(np.int64)),
            }
        )

    out = direct_cogroup(
        [edges], [["src"]], num_parts, degrees, [edge_schema]
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "node_id": pd.Series([], dtype="int64"),
                "degree": pd.Series([], dtype="int64"),
            }
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("node_id").reset_index(drop=True)


_RA_SCALE = 10**12


def _tri_pairs(groups: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Index pairs (i, j), i<j, within each run of the SORTED ``groups``
    array (module-level twin of triangle_counts' in-closure helper, for
    exchange fns that must pickle standalone)."""
    if not len(groups):
        e = np.empty(0, np.int64)
        return e, e
    first = np.r_[True, groups[1:] != groups[:-1]]
    gidx = np.cumsum(first) - 1
    counts = np.bincount(gidx)
    goffs = np.concatenate(([0], np.cumsum(counts)))
    pos = np.arange(len(groups)) - goffs[gidx]
    fanout = counts[gidx] - 1 - pos
    total = int(fanout.sum())
    if not total:
        e = np.empty(0, np.int64)
        return e, e
    lefts = np.repeat(np.arange(len(groups)), fanout)
    offs = np.concatenate(([0], np.cumsum(fanout)))
    rights = lefts + 1 + (np.arange(total) - np.repeat(offs[:-1], fanout))
    return lefts, rights


def ra_links(sf_dir: str, *, k: int = 50, num_parts: int = 8) -> pd.DataFrame:
    """Link prediction over the part–supplier bipartite graph: for every
    supplier pair that shares ≥1 part, the resource-allocation index (Zhou,
    Lü & Zhang 2009 — Σ over common neighbours z of 1/deg(z), the
    best-performing local similarity index in their benchmark) plus the
    neighbourhood Jaccard — the "which nodes will trade next" primitive that
    doubles as a candidate generator for entity resolution.

    Exactness: RA is kept as the SCALED INTEGER Σ (10^12 // S_z) (S_z = the
    part's supplier count) — floor-division rationals make the sum
    order-free and bit-equal to the SQL oracle (the repo's exact-integer
    float-parity rule; a float 1/deg sum would be partition-order
    dependent). Jaccard is ONE IEEE division of exact int64s:
    n_common / (deg_a + deg_b − n_common).

    Distributed shape (volume never exceeds pair multiplicity):
      1. part-keyed exchange, map-side (part, supp) distinct fused into the
         split wave: per part, triangular pair expansion weighted
         10^12 // S_z (hot parts are the match stage's salting family).
      2. supplier-keyed exchange of the same slim 2-col table: global
         per-supplier part-degree (all rows of a supplier co-locate).
         The degree table is |suppliers| rows — broadcast via ``ray.put``;
         past the broadcast budget this becomes a pair-keyed hash join on
         sa then sb (the places-index fallback family).
      3. (sa, sb)-keyed exchange: n_common = pair count, ra_int = Σ w,
         jaccard from broadcast degrees — then per-block top-k, driver
         merges k·P rows.
    """
    import ray

    from ..ops import direct_cogroup, direct_partitioned_map
    from .relational import topk

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).materialize()

    ps_schema = pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())])
    wpair_schema = pa.schema(
        [("sa", pa.int64()), ("sb", pa.int64()), ("w", pa.int64())]
    )

    def pre_distinct(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if not len(pk):
            return ps_schema.empty_table()
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        return pa.table({"l_partkey": pk[keep], "l_suppkey": sk[keep]})

    def part_pairs(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if not len(pk):
            return wpair_schema.empty_table()
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        pk, sk = pk[keep], sk[keep]
        # per-part supplier count -> the RA weight of every pair it emits
        first = np.r_[True, pk[1:] != pk[:-1]]
        gidx = np.cumsum(first) - 1
        s_per_part = np.bincount(gidx)
        w_row = (_RA_SCALE // s_per_part[gidx]).astype(np.int64)
        li_, ri_ = _tri_pairs(pk)
        return pa.table({"sa": sk[li_], "sb": sk[ri_], "w": w_row[li_]})

    pairs = direct_partitioned_map(
        li, ["l_partkey"], num_parts, part_pairs, ps_schema, pre=pre_distinct
    ).materialize()

    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def supp_degree(t: pa.Table) -> pa.Table:
        # all rows of a supplier co-locate: per-partition distinct is global
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if not len(pk):
            return deg_schema.empty_table()
        order = np.lexsort((pk, sk))
        pk, sk = pk[order], sk[order]
        keep = np.r_[True, (sk[1:] != sk[:-1]) | (pk[1:] != pk[:-1])]
        u, c = np.unique(sk[keep], return_counts=True)
        return pa.table({"node": u, "deg": c.astype(np.int64)})

    deg = direct_partitioned_map(
        li, ["l_suppkey"], num_parts, supp_degree, ps_schema, pre=pre_distinct
    ).to_pandas()
    out_empty = pd.DataFrame(
        {
            "sa": pd.Series([], dtype="int64"),
            "sb": pd.Series([], dtype="int64"),
            "n_common": pd.Series([], dtype="int64"),
            "ra_int": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        }
    )
    if deg.empty:
        return out_empty
    deg = deg.sort_values("node").reset_index(drop=True)
    deg_ref = ray.put((deg["node"].to_numpy(np.int64), deg["deg"].to_numpy(np.int64)))

    agg_schema = pa.schema(
        [
            ("sa", pa.int64()),
            ("sb", pa.int64()),
            ("n_common", pa.int64()),
            ("ra_int", pa.int64()),
            ("jaccard", pa.float64()),
        ]
    )

    def pair_agg(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return agg_schema.empty_table()
        nodes, degs = ray.get(deg_ref)
        sa = t["sa"].to_numpy().astype(np.int64)
        sb = t["sb"].to_numpy().astype(np.int64)
        w = t["w"].to_numpy().astype(np.int64)
        order = np.lexsort((sb, sa))
        sa, sb, w = sa[order], sb[order], w[order]
        first = np.r_[True, (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        gidx = np.cumsum(first) - 1
        n_common = np.bincount(gidx).astype(np.int64)
        ra_int = np.bincount(gidx, weights=w).astype(np.int64)
        usa, usb = sa[first], sb[first]
        da = degs[np.searchsorted(nodes, usa)]
        db = degs[np.searchsorted(nodes, usb)]
        jac = n_common.astype(np.float64) / (da + db - n_common).astype(np.float64)
        return pa.table(
            {"sa": usa, "sb": usb, "n_common": n_common, "ra_int": ra_int,
             "jaccard": jac}
        )

    scored = direct_cogroup([pairs], [["sa", "sb"]], num_parts, pair_agg, [wpair_schema])
    out = topk(scored, "ra_int", k, descending=True, tie_cols=["sa", "sb"],
               empty_schema=agg_schema)
    if out.empty:
        return out_empty
    for c in ("sa", "sb", "n_common", "ra_int"):
        out[c] = out[c].astype("int64")
    out["jaccard"] = out["jaccard"].astype("float64")
    return (
        out[["sa", "sb", "n_common", "ra_int", "jaccard"]]
        .sort_values(["ra_int", "sa", "sb"], ascending=[False, True, True])
        .reset_index(drop=True)
    )


def butterfly_counts(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Per-supplier butterfly (2×2 biclique) participation counts in the
    part–supplier bipartite graph — the bipartite analogue of triangle
    counting (Wang et al. 2019 "Vertex priority based butterfly counting"):
    a butterfly is {s, s′, p₁, p₂} with both suppliers supplying both
    parts; butterflies(s) = Σ_{s′} C(cp(s, s′), 2) where cp is the number
    of co-supplied parts, so each butterfly counts once per participating
    supplier. The bipartite-community/density signal behind co-purchase
    and co-occurrence analysis.

    Distributed shape: (1) part-keyed exchange with map-side distinct
    fused into the split wave — per part, triangular supplier-pair
    expansion, one row per (part, pair), the triangle_counts stress shape
    (hot-part salting is the documented knob); (2) pair-keyed grouped
    count → cp, each pair emitting C(cp,2) to both endpoints in the same
    pass; (3) one supplier-keyed grouped sum, left-joined against the
    (tiny) supplier table so zero-butterfly suppliers keep their row.
    Exact integers end to end. TRUE SQL oracle: self-join pair counts +
    the same closed form.
    """
    from ..ops import direct_partitioned_map
    from .relational import grouped_agg

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).materialize()

    pair_schema = pa.schema([("sa", pa.int64()), ("sb", pa.int64())])
    ps_schema = pa.schema([("l_partkey", pa.int64()), ("l_suppkey", pa.int64())])
    contrib_schema = pa.schema([("s", pa.int64()), ("bf", pa.int64())])

    def pre_distinct(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if not len(pk):
            return ps_schema.empty_table()
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        return pa.table({"l_partkey": pk[keep], "l_suppkey": sk[keep]})

    def part_pairs(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy().astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        if not len(pk):
            return pair_schema.empty_table()
        order = np.lexsort((sk, pk))
        pk, sk = pk[order], sk[order]
        keep = np.r_[True, (pk[1:] != pk[:-1]) | (sk[1:] != sk[:-1])]
        pk, sk = pk[keep], sk[keep]
        first = np.r_[True, pk[1:] != pk[:-1]]
        gidx = np.cumsum(first) - 1
        counts = np.bincount(gidx)
        goffs = np.concatenate(([0], np.cumsum(counts)))
        pos = np.arange(len(pk)) - goffs[gidx]
        fanout = counts[gidx] - 1 - pos
        total = int(fanout.sum())
        if not total:
            return pair_schema.empty_table()
        lefts = np.repeat(np.arange(len(pk)), fanout)
        offs = np.concatenate(([0], np.cumsum(fanout)))
        rights = lefts + 1 + (np.arange(total) - np.repeat(offs[:-1], fanout))
        return pa.table({"sa": sk[lefts], "sb": sk[rights]})

    pairs = direct_partitioned_map(
        li, ["l_partkey"], num_parts, part_pairs, ps_schema, pre=pre_distinct
    )

    def pair_contrib(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return contrib_schema.empty_table()
        sa = t["sa"].to_numpy().astype(np.int64)
        sb = t["sb"].to_numpy().astype(np.int64)
        order = np.lexsort((sb, sa))
        sa, sb = sa[order], sb[order]
        first = np.r_[True, (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])]
        starts = np.flatnonzero(first)
        cp = np.diff(np.r_[starts, len(sa)])
        bf = cp * (cp - 1) // 2
        keep = bf > 0
        return pa.table(
            {
                "s": pa.array(np.concatenate([sa[starts][keep], sb[starts][keep]])),
                "bf": pa.array(np.concatenate([bf[keep], bf[keep]])),
            }
        )

    contrib = direct_partitioned_map(
        pairs.materialize(), ["sa", "sb"], num_parts, pair_contrib, pair_schema
    )
    summed = grouped_agg(contrib, ["s"], {"butterflies": ("bf", "sum")}).to_pandas()
    if summed.empty:  # no co-supplied part anywhere: all-zero output
        summed = pd.DataFrame(
            {"s": pd.Series([], dtype="int64"),
             "butterflies": pd.Series([], dtype="int64")}
        )
    supp = _read(sf_dir, "supplier", ["s_suppkey"]).to_pandas()
    out = supp.merge(summed.rename(columns={"s": "s_suppkey"}), on="s_suppkey", how="left")
    out["butterflies"] = out["butterflies"].fillna(0).astype("int64")
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    return out.sort_values("s_suppkey").reset_index(drop=True)


def degree_assortativity(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Degree assortativity (Newman 2002 r coefficient) of the undirected
    customer↔supplier trade graph: the Pearson correlation of endpoint
    degrees over the DIRECTED edge list (both orientations, the standard
    convention) — negative r = hubs attach to leaves (disassortative, the
    typical bipartite shape). One row of exact integer sufficient stats
    (m, Σx, Σy, Σxy, Σx², Σy²) plus r.

    Distributed shape: the pagerank_trade edge construction verbatim
    (orderkey cogroup → src-keyed distinct-with-degree), one more
    dst-keyed cogroup attaching the other endpoint's degree, then
    per-batch integer partials summed on the driver (6 numbers per block).
    The closed-form combine runs in python ints (m·Σxy − Σx·Σy overflows
    int64 at web scale; HUGEINT on the SQL side), with ONE float division
    by one sqrt — both sides convert the same exact integers. Note: the
    HUGEINT product of the two variance terms caps at ~1.7e38; past
    ~10¹⁸-scale sums the oracle would need a two-double split."""
    from ..ops import direct_cogroup

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).materialize()
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).materialize()

    edge_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    dedup_schema = pa.schema(
        [("src", pa.int64()), ("dst", pa.int64()), ("deg_src", pa.int64())]
    )
    deg_schema = pa.schema([("node", pa.int64()), ("deg", pa.int64())])

    def to_edges(o: pa.Table, l: pa.Table) -> pa.Table:
        od = o.to_pandas()
        ld = l.to_pandas()
        m = ld.merge(od, left_on="l_orderkey", right_on="o_orderkey", how="inner")
        cust = m["o_custkey"].to_numpy(np.int64)
        supp = m["l_suppkey"].to_numpy(np.int64) + _SUPP_BASE
        return pa.table(
            {
                "src": pa.array(np.concatenate([cust, supp])),
                "dst": pa.array(np.concatenate([supp, cust])),
            }
        )

    emissions = direct_cogroup(
        [orders, lineitem],
        [["o_orderkey"], ["l_orderkey"]],
        num_parts,
        to_edges,
        [
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64())]),
        ],
        emit_partitioned_on=["src"],
    )

    def distinct_with_deg(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["src", "dst"])
        deg = df.groupby("src")["dst"].transform("size").to_numpy(np.int64)
        return pa.table(
            {
                "src": pa.array(df["src"].to_numpy(np.int64)),
                "dst": pa.array(df["dst"].to_numpy(np.int64)),
                "deg_src": pa.array(deg),
            }
        )

    edges = direct_cogroup(
        [emissions], [["src"]], num_parts, distinct_with_deg, [edge_schema],
        emit_partitioned_on=["src"],
    )
    edges_ds = edges.to_dataset().materialize()

    def node_deg(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["src"])
        return pa.table(
            {
                "node": pa.array(df["src"].to_numpy(np.int64)),
                "deg": pa.array(df["deg_src"].to_numpy(np.int64)),
            }
        )

    degs = direct_cogroup(
        [edges_ds], [["src"]], num_parts, node_deg, [dedup_schema]
    ).materialize()

    stat_cols = ("m", "sx", "sy", "sxy", "sxx", "syy")

    def attach_and_sum(e_t: pa.Table, d_t: pa.Table) -> pa.Table:
        if e_t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in stat_cols})
        dmap = dict(
            zip(
                d_t["node"].to_numpy(zero_copy_only=False),
                d_t["deg"].to_numpy(zero_copy_only=False),
            )
        )
        x = e_t["deg_src"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.array(
            [dmap[n] for n in e_t["dst"].to_numpy(zero_copy_only=False)], np.int64
        )
        return pa.table(
            {
                "m": pa.array([np.int64(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxy": pa.array([(x * y).sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
            }
        )

    parts = direct_cogroup(
        [edges_ds, degs], [["dst"], ["node"]], num_parts,
        attach_and_sum, [dedup_schema, deg_schema],
    ).to_pandas()
    tot = {c: int(parts[c].sum()) for c in stat_cols}
    m, sx, sy, sxy, sxx, syy = (tot[c] for c in stat_cols)
    num = m * sxy - sx * sy
    d1 = m * sxx - sx * sx
    d2 = m * syy - sy * sy
    import math

    r = float(num) / math.sqrt(float(d1 * d2)) if d1 and d2 else 0.0
    out = pd.DataFrame([{**tot, "r": r}])
    for c in stat_cols:
        out[c] = out[c].astype("int64")
    return out[list(stat_cols) + ["r"]]


# --- HITS hubs & authorities over the customer -> supplier trade graph -------

_HITS_EDGE = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_HITS_SCORE = pa.schema([("node", pa.int64()), ("s", pa.int64())])


def hits_trade(sf_dir: str, *, iters: int = 2, num_parts: int = 8, top: int = 20):
    """HITS (Kleinberg 1999) hubs and authorities over the DIRECTED bipartite
    trade graph — customer u → supplier v iff u ordered ≥1 lineitem from v —
    in EXACT unnormalized integers: h₀ ≡ 1; per iteration aₖ(v) = Σ_{u→v}
    hₖ₋₁(u) then hₖ(u) = Σ_{u→v} aₖ(v) (auth from old hubs, hub from NEW
    auths — the classic update order). Unnormalized scores grow ≤ d_max per
    half-step (bounded by d_max^(2·iters) overall); ``iters=2`` keeps int64
    exact up to d_max ~ 2^15, and an explicit per-partition guard RAISES
    before any silent overflow. Output: top-``top`` rows per role
    (role, node_id, score, rank), rank ties by node_id ascending.

    Distributed shape: the distinct edge list is built once via an
    orderkey-keyed cogroup and kept in TWO static partitionings (by u and by
    v); each half-iteration is one score-table exchange onto the matching
    edge copy (per-partition searchsorted join + np.add.at partial sums,
    emitted pre-partitioned on the OTHER endpoint so the completing groupby
    is partition-local). Score tables are O(|V|) rows — always the small
    side of the exchange; edges never move after the two initial layouts.
    """
    from ..ops import direct_cogroup

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).materialize()
    lineitem = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).materialize()

    def to_edges(o: pa.Table, l: pa.Table) -> pa.Table:
        m = l.to_pandas().merge(
            o.to_pandas(), left_on="l_orderkey", right_on="o_orderkey", how="inner"
        )
        return pa.table({
            "u": pa.array(m["o_custkey"].to_numpy(np.int64)),
            "v": pa.array(m["l_suppkey"].to_numpy(np.int64)),
        })

    raw = direct_cogroup(
        [orders, lineitem],
        [["o_orderkey"], ["l_orderkey"]],
        num_parts,
        to_edges,
        [
            pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
            pa.schema([("l_orderkey", pa.int64()), ("l_suppkey", pa.int64())]),
        ],
        emit_partitioned_on=["u"],
    )

    def distinct(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["u", "v"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(_HITS_EDGE)

    # u-partitioned rows are co-located per u, so the per-partition distinct
    # is globally exact; the second call lays the SAME edge set out by v
    # PrePartitioned grids: both edge layouts are built ONCE and re-consumed
    # by every iteration's cogroup with zero further edge movement
    edges_u = direct_cogroup(
        [raw], [["u"]], num_parts, distinct, [_HITS_EDGE],
        emit_partitioned_on=["u"],
    )
    edges_v = direct_cogroup(
        [edges_u], [["v"]], num_parts, lambda t: t, [_HITS_EDGE],
        emit_partitioned_on=["v"],
    )

    def init_h(t: pa.Table) -> pa.Table:
        nodes = np.unique(t["u"].to_numpy(zero_copy_only=False))
        return pa.table({
            "node": pa.array(nodes, pa.int64()),
            "s": pa.array(np.ones(len(nodes), np.int64)),
        })

    h = direct_cogroup(
        [edges_u], [["u"]], num_parts, init_h, [_HITS_EDGE],
        emit_partitioned_on=["node"],
    )

    def _half_step(score_t: pa.Table, edge_t: pa.Table, src: str, dst: str) -> pa.Table:
        """Partial sums of ``score`` over ``src`` onto ``dst`` endpoints."""
        if edge_t.num_rows == 0:
            return _HITS_SCORE.empty_table()
        nodes = score_t["node"].to_numpy(zero_copy_only=False)
        svals = score_t["s"].to_numpy(zero_copy_only=False)
        order = np.argsort(nodes, kind="stable")
        e_src = edge_t[src].to_numpy(zero_copy_only=False)
        e_dst = edge_t[dst].to_numpy(zero_copy_only=False)
        s_src = svals[order[np.searchsorted(nodes[order], e_src)]]
        uniq, inv = np.unique(e_dst, return_inverse=True)
        counts = np.bincount(inv)
        smax = int(s_src.max()) if len(s_src) else 0
        if smax and smax > (2**62) // max(1, int(counts.max())):
            raise OverflowError(
                "hits_trade int64 guard: raise iters cap or rescale scores"
            )
        acc = np.zeros(len(uniq), np.int64)
        np.add.at(acc, inv, s_src)
        return pa.table({"node": pa.array(uniq, pa.int64()), "s": pa.array(acc)})

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HITS_SCORE.empty_table()
        df = t.to_pandas().groupby("node", sort=False)["s"].sum().reset_index()
        df["s"] = df["s"].astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False).cast(_HITS_SCORE)

    a = None
    for _ in range(iters):
        a_parts = direct_cogroup(
            [h, edges_u], [["node"], ["u"]], num_parts,
            lambda s_t, e_t: _half_step(s_t, e_t, "u", "v"),
            [_HITS_SCORE, _HITS_EDGE], emit_partitioned_on=["node"],
        )
        a = direct_cogroup(
            [a_parts], [["node"]], num_parts, finish, [_HITS_SCORE],
            emit_partitioned_on=["node"],
        )
        h_parts = direct_cogroup(
            [a, edges_v], [["node"], ["v"]], num_parts,
            lambda s_t, e_t: _half_step(s_t, e_t, "v", "u"),
            [_HITS_SCORE, _HITS_EDGE], emit_partitioned_on=["node"],
        )
        h = direct_cogroup(
            [h_parts], [["node"]], num_parts, finish, [_HITS_SCORE],
            emit_partitioned_on=["node"],
        )

    def _topk(ds, role: str) -> pd.DataFrame:
        def tk(t: pa.Table) -> pa.Table:
            df = t.to_pandas().sort_values(
                ["s", "node"], ascending=[False, True], kind="stable"
            )
            return pa.Table.from_pandas(df.head(top), preserve_index=False)

        parts = ds.to_dataset().map_batches(tk, batch_format="pyarrow").to_pandas()
        parts = parts.sort_values(
            ["s", "node"], ascending=[False, True], kind="stable"
        ).head(top).reset_index(drop=True)
        return pd.DataFrame({
            "role": role,
            "node_id": parts["node"].astype("int64"),
            "score": parts["s"].astype("int64"),
            "rank": np.arange(1, len(parts) + 1, dtype="int64"),
        })

    out = pd.concat([_topk(a, "authority"), _topk(h, "hub")], ignore_index=True)
    return out.sort_values(["role", "rank"]).reset_index(drop=True)
