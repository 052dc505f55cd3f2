"""bbox_overlap_pairs (reference-point rectangle join) and q_zscore_orders —
closed-form semantics beyond the SQL-parity gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from osmi_addresses_ray.pipelines.geo_ops import bbox_overlap_pairs
from osmi_addresses_ray.pipelines.relational import q_zscore_orders


def _rects(rows):
    df = pd.DataFrame(
        rows, columns=["side", "rid", "x0", "x1", "y0", "y1"]
    ).astype({"side": "int8", "rid": "int64", "x0": "int64", "x1": "int64",
              "y0": "int64", "y1": "int64"})
    df.insert(0, "cell", np.zeros(len(df), np.int64))
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def _run(rows, cell=100, num_parts=4):
    out = bbox_overlap_pairs(_rects(rows), cell=cell, num_parts=num_parts).to_pandas()
    return out.sort_values(["building_id", "highway_id"]).reset_index(drop=True)


def test_bbox_pair_spanning_many_cells_emitted_once():
    # A covers ~5x5 cells; B overlaps it across several cells; the
    # reference-point rule must emit the pair exactly once with exact area
    rows = [(0, 1, 0, 499, 0, 499), (1, 2, 250, 700, 250, 700)]
    out = _run(rows, cell=100)
    assert len(out) == 1
    assert out.loc[0, "building_id"] == 1 and out.loc[0, "highway_id"] == 2
    assert out.loc[0, "overlap_area"] == (499 - 250) * (499 - 250)


def test_bbox_touching_edges_and_disjoint():
    rows = [
        (0, 1, 0, 100, 0, 100),
        (1, 2, 100, 200, 0, 100),   # shares the x=100 edge -> area 0, still a hit
        (1, 3, 101, 200, 0, 100),   # disjoint by one unit
        (1, 4, -50, -1, -50, -1),   # diagonal corner-disjoint
    ]
    out = _run(rows, cell=64)
    assert set(zip(out["building_id"], out["highway_id"])) == {(1, 2)}
    assert (out["overlap_area"] == 0).all()


def test_bbox_negative_coordinates_and_cross_product():
    # two buildings x three highways in the negative quadrant, all nested
    rows = [(0, i, -1000, -100, -1000, -100) for i in (1, 2)] + [
        (1, j, -900, -200, -900, -200) for j in (10, 11, 12)
    ]
    out = _run(rows, cell=300)
    assert len(out) == 6  # full 2x3 cross product, each exactly once
    assert (out["overlap_area"] == 700 * 700).all()


def test_zscore_orders_closed_form(tmp_path):
    vals = [100.0, 200.0, 300.0, 50.0, 50.0]
    pri = ["A", "A", "A", "B", "B"]
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(5, dtype=np.int64),
            "o_custkey": np.zeros(5, dtype=np.int64),
            "o_orderstatus": ["F"] * 5,
            "o_totalprice": vals,
            "o_orderdate": pd.to_datetime(["2024-01-01"] * 5),
            "o_orderpriority": pri,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    out = q_zscore_orders(str(tmp_path)).set_index("o_orderkey")
    # group A: mean 200, population sd = sqrt(20000/3)
    sd = np.sqrt(((100 - 200) ** 2 + 0 + (300 - 200) ** 2) / 3)
    assert out.loc[0, "z"] == round(-100 / sd, 4)
    assert out.loc[1, "z"] == 0.0
    assert out.loc[2, "z"] == round(100 / sd, 4)
    # group B is constant -> degenerate sd -> z = 0 on both rows
    assert out.loc[3, "z"] == 0.0 and out.loc[4, "z"] == 0.0


def test_trimmed_mean_closed_form(tmp_path):
    from osmi_addresses_ray.pipelines.relational import q_trimmed_mean

    # 10 rows, one flag: values 1..10 -> t = 1, trimmed = mean(2..9) = 5.5,
    # winsorized = (sum(2..9) + 2 + 9) / 10 = 5.5
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(10, dtype=np.int64),
            "l_partkey": np.zeros(10, dtype=np.int64),
            "l_suppkey": np.zeros(10, dtype=np.int64),
            "l_linenumber": np.zeros(10, dtype=np.int32),
            "l_quantity": np.arange(1.0, 11.0),
            "l_extendedprice": np.zeros(10),
            "l_discount": np.zeros(10),
            "l_tax": np.zeros(10),
            "l_returnflag": ["A"] * 10,
            "l_linestatus": ["O"] * 10,
            "l_shipdate": pd.to_datetime(["2024-01-01"] * 10),
        }
    )
    pq.write_table(pa.Table.from_pandas(li, preserve_index=False),
                   str(tmp_path / "lineitem.parquet"))
    out = q_trimmed_mean(str(tmp_path))
    assert out.loc[0, "n"] == 10
    assert out.loc[0, "trimmed_mean"] == 5.5
    assert out.loc[0, "winsorized_mean"] == 5.5
