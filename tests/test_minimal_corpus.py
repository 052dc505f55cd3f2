"""Robustness sweep: every sf-table query must run (not necessarily return
rows) on a MINIMAL corpus — single-digit rows per table, one user, one
event type, degenerate-but-legal values. The driver always feeds generated
testdata; this guards the edges that data never exercises (empty groups,
single-element windows, k > n top-k, every-doc-identical dedup input)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

TS = pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00"]).astype(
    "datetime64[us]"
)


@pytest.fixture(scope="module")
def mini_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("mini_sf")
    pd.DataFrame({"r_regionkey": [0], "r_name": ["R0"]}).to_parquet(
        d / "region.parquet", index=False
    )
    pd.DataFrame(
        {"n_nationkey": [0], "n_name": ["N0"], "n_regionkey": [0]}
    ).to_parquet(d / "nation.parquet", index=False)
    pd.DataFrame(
        {"c_custkey": [1], "c_name": ["c1"], "c_mktsegment": ["SEG"], "c_nationkey": [0]}
    ).to_parquet(d / "customer.parquet", index=False)
    pd.DataFrame(
        {"s_suppkey": [1], "s_name": ["s1"], "s_nationkey": [0]}
    ).to_parquet(d / "supplier.parquet", index=False)
    pd.DataFrame(
        {"p_partkey": [1], "p_brand": ["B1"], "p_name": ["lone widget"]}
    ).to_parquet(d / "part.parquet", index=False)
    pd.DataFrame(
        {
            "o_orderkey": np.array([10, 11], dtype=np.int64),
            "o_custkey": np.array([1, 1], dtype=np.int64),
            "o_totalprice": [100.0, 100.0],  # equal prices: rank/mean ties
            "o_orderstatus": ["O", "F"],
            "o_orderdate": TS[:2],
            "o_orderpriority": ["1-URGENT", "1-URGENT"],  # one group: MAD of ties
        }
    ).to_parquet(d / "orders.parquet", index=False)
    pd.DataFrame(
        {
            "l_orderkey": np.array([10], dtype=np.int64),
            "l_partkey": np.array([1], dtype=np.int64),
            "l_suppkey": np.array([1], dtype=np.int64),
            "l_linenumber": np.array([1], dtype=np.int32),
            "l_quantity": [50.0],
            "l_extendedprice": [100.0],
            "l_discount": [0.0],
            "l_tax": [0.0],
            "l_returnflag": ["A"],
            "l_linestatus": ["O"],
            "l_shipdate": TS[:1],
        }
    ).to_parquet(d / "lineitem.parquet", index=False)
    pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "user_id": np.array([7, 7, 7], dtype=np.int64),
            "event_type": ["click", "view", "click"],
            "ts": TS,
            "value": [1.0, -1.0, 0.0],
            # one numeric k, one malformed, one k-less: the JSON-extract
            # edges (all-missing groups pin min/max to 0)
            "props": ['{"k": 3}', "not json", "{}"],
        }
    ).to_parquet(d / "events.parquet", index=False)
    pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["same text here", "same text here", ""],  # dup + empty
            "lang": ["en", "en", "en"],
        }
    ).to_parquet(d / "documents.parquet", index=False)
    rng = np.random.default_rng(1)
    pd.DataFrame(
        {
            "vec_id": np.arange(16, dtype=np.int64),
            "embedding": [rng.standard_normal(16).astype(np.float32) for _ in range(16)],
        }
    ).to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


def test_every_sf_query_runs_on_minimal_corpus(mini_sf):
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    q = entry.queries()
    failures = []
    for name, fn in sorted(q.items()):
        if name.startswith("osmi_") or name in (
            # fixture-corpus queries ignore sf_dir (geospatial/media/raster)
            "media_features", "media_resize", "media_audio_features",
            "media_frame_sample", "pip_entrances_in_buildings",
            "geodesic_lengths", "rasterize_nwa", "zonal_entrances_per_building",
            "polygonize_nwa", "geohash_cells", "hilbert_keys",
        ):
            continue
        try:
            res = fn(mini_sf)
            assert res is not None
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:90]}")
    assert not failures, "\n".join(failures)
