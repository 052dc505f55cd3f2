"""triangle_counts — closed-form semantics on crafted sparse graphs (the SQL
gate at tests/test_driver_contract.py covers the dense fixture corpus)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from osmi_addresses_ray.pipelines.graph import triangle_counts


def _write_lineitem(tmp_path, part_suppliers: dict[int, list[int]]):
    rows = [
        (pk, sk)
        for pk, supps in part_suppliers.items()
        for sk in supps
        for _ in range(2)  # duplicated rows: the distinct step must absorb
    ]
    df = pd.DataFrame(rows, columns=["l_partkey", "l_suppkey"]).astype("int64")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


def test_triangle_pendant_and_multi_part_edge(tmp_path):
    # part 1 -> K3 on {1,2,3}; part 2 -> pendant edge 3-4;
    # part 3 re-creates edge 1-2 (must NOT double-count the triangle)
    sf = _write_lineitem(tmp_path, {1: [1, 2, 3], 2: [3, 4], 3: [1, 2]})
    out = triangle_counts(sf, num_parts=4)
    assert dict(zip(out["s_suppkey"], out["n_triangles"])) == {1: 1, 2: 1, 3: 1}


def test_triangle_square_with_diagonal(tmp_path):
    # cycle 1-2-3-4-1 plus diagonal 1-3: triangles (1,2,3) and (1,3,4)
    edges = {10: [1, 2], 11: [2, 3], 12: [3, 4], 13: [1, 4], 14: [1, 3]}
    sf = _write_lineitem(tmp_path, edges)
    out = triangle_counts(sf, num_parts=4)
    assert dict(zip(out["s_suppkey"], out["n_triangles"])) == {1: 2, 2: 1, 3: 2, 4: 1}


def test_triangle_free_graph_is_empty(tmp_path):
    sf = _write_lineitem(tmp_path, {1: [1, 2], 2: [3, 4]})
    out = triangle_counts(sf, num_parts=2)
    assert len(out) == 0
    assert list(out.columns) == ["s_suppkey", "n_triangles"]


def test_butterfly_counts_planted_biclique(tmp_path, ray_session):
    """K_{2,3} (suppliers 1,2 x parts 10,20,30) has C(3,2)=3 butterflies,
    each counted once per supplier; supplier 3 shares only ONE part with
    supplier 1 (cp=1 -> no butterfly); supplier 4 is isolated (0 kept via
    the left join); duplicate lineitem rows must not inflate cp."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.graph import butterfly_counts

    li = pd.DataFrame(
        {
            "l_orderkey": range(8),
            "l_partkey": [10, 20, 30, 10, 20, 30, 10, 10],
            "l_suppkey": [1, 1, 1, 2, 2, 2, 3, 3],  # (10,3) duplicated
        }
    )
    supp = pd.DataFrame({"s_suppkey": [1, 2, 3, 4]})
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    supp.to_parquet(tmp_path / "supplier.parquet", index=False)
    out = butterfly_counts(str(tmp_path), num_parts=2)
    got = dict(zip(out["s_suppkey"], out["butterflies"]))
    assert got == {1: 3, 2: 3, 3: 0, 4: 0}


def test_degree_assortativity_star_is_disassortative(tmp_path, ray_session):
    """A star K_{1,4} (one customer, four suppliers, one order each) is
    perfectly disassortative: every edge pairs deg 4 with deg 1 -> r = -1;
    sufficient stats are hand-checkable (m=8, sx=sy=20, sxy=32)."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.graph import degree_assortativity

    orders = pd.DataFrame({"o_orderkey": [1, 2, 3, 4], "o_custkey": [7] * 4})
    li = pd.DataFrame(
        {"l_orderkey": [1, 2, 3, 4], "l_suppkey": [11, 12, 13, 14]}
    )
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    li.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = degree_assortativity(str(tmp_path), num_parts=2).iloc[0]
    assert (out.m, out.sx, out.sy, out.sxy) == (8, 20, 20, 32)
    assert (out.sxx, out.syy) == (68, 68)
    assert out.r == -1.0
