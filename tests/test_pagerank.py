"""Integer PageRank: partition invariance, mass conservation-ish bounds,
hand-checked tiny graph."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from osmi_addresses_ray.pipelines import graph


def _with_mem_tables(monkeypatch, orders: pd.DataFrame, lineitem: pd.DataFrame, parallelism=3):
    tbls = {"orders": orders, "lineitem": lineitem}

    def fake_read(sf_dir, table, columns):
        return rd.from_pandas(tbls[table][columns]).repartition(parallelism)

    monkeypatch.setattr(graph, "_read", fake_read)


def _mk(pairs):
    """orders/lineitem frames realizing exactly the given (cust, supp) pairs."""
    orders = pd.DataFrame(
        {"o_orderkey": range(len(pairs)), "o_custkey": [c for c, _ in pairs]}
    )
    lineitem = pd.DataFrame(
        {"l_orderkey": range(len(pairs)), "l_suppkey": [s for _, s in pairs]}
    )
    return orders, lineitem


def test_two_node_fixed_point(monkeypatch):
    # single cust-supp pair: symmetric 2-cycle, outdeg 1 both ways.
    # r0 = S; r1 = 3S//20 + 17S//20 ... stays at 999999999999 or so (floor loss)
    o, l = _mk([(7, 3)])
    _with_mem_tables(monkeypatch, o, l)
    out = graph.pagerank_trade("<mem>", iters=5, top=10)
    assert set(out["node_id"]) == {7, 1000003}
    # symmetric graph: both nodes identical rank
    assert out["pr"].nunique() == 1
    # exact scalar recurrence
    r = 10**12
    for _ in range(5):
        r = (3 * 10**12) // 20 + (17 * r) // 20
    assert (out["pr"] == r).all()


def test_star_center_dominates(monkeypatch):
    # supplier 1 trades with customers 1..6 -> center outranks leaves
    o, l = _mk([(c, 1) for c in range(1, 7)])
    _with_mem_tables(monkeypatch, o, l)
    out = graph.pagerank_trade("<mem>", iters=5, top=10)
    s = dict(zip(out["node_id"], out["pr"]))
    center = s[1000001]
    leaves = [v for k, v in s.items() if k != 1000001]
    assert len(leaves) == 6 and all(center > v for v in leaves)
    assert len(set(leaves)) == 1  # leaves symmetric


def test_partition_invariance(monkeypatch):
    rng = np.random.default_rng(5)
    pairs = [(int(c), int(s)) for c, s in zip(rng.integers(0, 40, 300), rng.integers(0, 12, 300))]
    o, l = _mk(pairs)
    _with_mem_tables(monkeypatch, o, l, parallelism=1)
    a = graph.pagerank_trade("<mem>", iters=4, num_parts=2, top=20)
    _with_mem_tables(monkeypatch, o, l, parallelism=6)
    b = graph.pagerank_trade("<mem>", iters=4, num_parts=7, top=20)
    pd.testing.assert_frame_equal(a, b)
    # total mass bounded: every rank below total initial mass
    n_nodes = len(set(c for c, _ in pairs) | set(1000000 + s for _, s in pairs))
    assert (a["pr"] < n_nodes * graph.SCALE).all()


def test_bfs_hops_chain_cap_and_isolated_seed(tmp_path, ray_session):
    """Hand-built chain c97—s1—c5—s2—c6—s3: hop cap 4 keeps s3 out; an
    order-less seed customer still appears at hop 0; a disconnected
    component (c8—s9) never appears."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.graph import bfs_hops

    pd.DataFrame({"c_custkey": [97, 194, 5, 6, 8]}).to_parquet(
        tmp_path / "customer.parquet", index=False
    )
    pd.DataFrame(
        {"o_orderkey": [1, 2, 3, 4, 5, 6], "o_custkey": [97, 5, 5, 6, 6, 8]}
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {"l_orderkey": [1, 2, 3, 4, 5, 6], "l_suppkey": [1, 1, 2, 2, 3, 9]}
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)

    out = bfs_hops(str(tmp_path), num_parts=3)
    got = dict(zip(out["node_id"], out["hops"]))
    assert got == {97: 0, 194: 0, 1000001: 1, 5: 2, 1000002: 3, 6: 4}


def test_kcore_multi_round_cascade(tmp_path, ray_session):
    """K_{3,3} plus a 3-hop tail: the tail peels over THREE rounds (supp5 →
    cust4 → supp4), the biclique survives with every degree exactly 3."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.graph import kcore_nodes

    # K_{3,3}: custs 1,2,3 x supps 1,2,3; tail: supp4-{cust1,cust2,cust4},
    # cust4-supp5
    pairs = [(c, s) for c in (1, 2, 3) for s in (1, 2, 3)]
    pairs += [(1, 4), (2, 4), (4, 4), (4, 5)]
    pd.DataFrame(
        {
            "o_orderkey": range(1, len(pairs) + 1),
            "o_custkey": [c for c, _ in pairs],
        }
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "l_orderkey": range(1, len(pairs) + 1),
            "l_suppkey": [s for _, s in pairs],
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)

    out = kcore_nodes(str(tmp_path), k=3, num_parts=3)
    got = dict(zip(out["node_id"], out["degree"]))
    assert got == {1: 3, 2: 3, 3: 3, 1000001: 3, 1000002: 3, 1000003: 3}


def test_kcore_everything_peels(tmp_path, ray_session):
    """A path graph has no 2-core: endpoints cascade until empty."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.graph import kcore_nodes

    # path c1-s1-c2-s2-c3
    pairs = [(1, 1), (2, 1), (2, 2), (3, 2)]
    pd.DataFrame(
        {"o_orderkey": range(1, 5), "o_custkey": [c for c, _ in pairs]}
    ).to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame(
        {"l_orderkey": range(1, 5), "l_suppkey": [s for _, s in pairs]}
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = kcore_nodes(str(tmp_path), k=2, num_parts=2)
    assert len(out) == 0


def test_ra_links_closed_form(tmp_path, ray_session):
    """Crafted bipartite graph: p1 -> {s1,s2,s3}, p2 -> {s1,s2}, p3 -> {s9}.
    RA(s1,s2) = 10^12//3 + 10^12//2, RA(s1,s3) = RA(s2,s3) = 10^12//3;
    jaccard(s1,s2) = 2/(2+2-2) = 1.0, (s_,s3) = 1/(2+1-1) = 0.5."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.graph import ra_links

    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 9),
            (1, 1), (2, 2)]  # duplicates must not change anything
    pd.DataFrame(rows, columns=["l_partkey", "l_suppkey"]).to_parquet(
        tmp_path / "lineitem.parquet", index=False
    )
    out = ra_links(str(tmp_path), k=10, num_parts=3)
    got = {(int(r.sa), int(r.sb)): (int(r.n_common), int(r.ra_int), float(r.jaccard))
           for r in out.itertuples()}
    third, half = 10**12 // 3, 10**12 // 2
    assert got[(1, 2)] == (2, third + half, 1.0)
    assert got[(1, 3)] == (1, third, 0.5)
    assert got[(2, 3)] == (1, third, 0.5)
    assert len(got) == 3  # s9 shares no part with anyone
    # ordering: ra_int desc then (sa, sb)
    assert out.iloc[0].sa == 1 and out.iloc[0].sb == 2


def test_ra_links_partition_invariance(ray_session):
    from osmi_addresses_ray.pipelines.graph import ra_links

    a = ra_links("/root/testdata/sf0.001", k=20, num_parts=2)
    b = ra_links("/root/testdata/sf0.001", k=20, num_parts=7)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b)


# --- HITS ---------------------------------------------------------------------


def test_hits_planted_star(monkeypatch, ray_session):
    """Star K_{1,1} plus a popular supplier: hand-computed 2-iteration HITS.

    Edges: c1->s1, c2->s1, c3->s2.
    a1: s1=2, s2=1. h1: c1=2, c2=2, c3=1.
    a2: s1=4, s2=1. h2: c1=4, c2=4, c3=1.
    """
    o, l = _mk([(1, 1), (2, 1), (3, 2)])
    _with_mem_tables(monkeypatch, o, l)
    out = graph.hits_trade("<mem>", num_parts=3)
    auth = out[out["role"] == "authority"].set_index("node_id")["score"]
    hub = out[out["role"] == "hub"].set_index("node_id")["score"]
    assert auth.to_dict() == {1: 4, 2: 1}
    assert hub.to_dict() == {1: 4, 2: 4, 3: 1}
    # rank ties break by node_id ascending
    hubs = out[out["role"] == "hub"].sort_values("rank")
    assert hubs["node_id"].tolist() == [1, 2, 3]


def test_hits_duplicate_orders_collapse(monkeypatch, ray_session):
    """The SAME (cust, supp) pair through many orders is ONE edge."""
    o, l = _mk([(1, 1)] * 5 + [(2, 1)])
    _with_mem_tables(monkeypatch, o, l)
    out = graph.hits_trade("<mem>", num_parts=2)
    auth = out[out["role"] == "authority"].set_index("node_id")["score"]
    assert auth.to_dict() == {1: 4}  # a2 = h1(c1)+h1(c2) = 2+2


def test_hits_partition_invariance(monkeypatch, ray_session):
    pairs = [(c, (c * 7) % 4) for c in range(24)]
    o, l = _mk(pairs)
    _with_mem_tables(monkeypatch, o, l)
    a = graph.hits_trade("<mem>", num_parts=1)
    _with_mem_tables(monkeypatch, o, l, parallelism=5)
    b = graph.hits_trade("<mem>", num_parts=7)
    pd.testing.assert_frame_equal(a, b)
