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
