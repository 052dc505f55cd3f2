"""Raster ↔ vector operator tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osmi_addresses_ray.pipelines.raster import (
    TILE,
    _label_tile,
    polygonize,
    rasterize_points,
    zonal_stats,
)


def test_label_tile_components():
    # L-shape (0,0)(1,0)(1,1) + isolated (5,5)
    from osmi_addresses_ray.pipelines.raster import lin_index

    ix = np.array([0, 1, 1, 5], dtype=np.int64)
    iy = np.array([0, 0, 1, 5], dtype=np.int64)
    lab = _label_tile(ix, iy)
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] != lab[0]
    # component id = min biased linear cell index
    assert lab[0] == lin_index(np.array([0]), np.array([0]))[0]

    # negative indices must stay injective and 4-connected across zero
    ix2 = np.array([-1, 0, -1, 3], dtype=np.int64)
    iy2 = np.array([0, 0, -1, -7], dtype=np.int64)
    lab2 = _label_tile(ix2, iy2)
    assert lab2[0] == lab2[1] == lab2[2]  # (-1,0)-(0,0) and (-1,-1)-(-1,0)
    assert lab2[3] != lab2[0]


def test_rasterize_matches_histogram(ray_session):
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 0.01, 5000)
    y = rng.uniform(0, 0.01, 5000)
    ds = rd.from_arrow(pa.table({"lon": x, "lat": y})).repartition(7)
    out = rasterize_points(ds, res=0.001).to_pandas()
    got = {(r.ix, r.iy): r.n for r in out.itertuples()}
    ix = np.floor(x / 0.001).astype(int)
    iy = np.floor(y / 0.001).astype(int)
    exp: dict = {}
    for a, b in zip(ix, iy):
        exp[(a, b)] = exp.get((a, b), 0) + 1
    assert got == exp


def test_polygonize_across_tile_boundary(ray_session):
    # one 4-connected strip crossing the tile boundary at ix = TILE-1 / TILE,
    # plus an isolated cell far away
    cells = [(TILE - 2, 3), (TILE - 1, 3), (TILE, 3), (TILE + 1, 3), (5, 50)]
    df = pd.DataFrame(
        {
            "tile_x": [c[0] // TILE for c in cells],
            "tile_y": [c[1] // TILE for c in cells],
            "ix": [c[0] for c in cells],
            "iy": [c[1] for c in cells],
            "n": [1] * len(cells),
        }
    )
    raster = rd.from_pandas(df).repartition(3)
    cells_out, comps = polygonize(raster, threshold=1)
    cdf = cells_out.to_pandas()
    strip = cdf[cdf["iy"] == 3]
    assert strip["comp"].nunique() == 1
    assert cdf["comp"].nunique() == 2
    comp_df = comps.to_pandas().sort_values("n_cells", ascending=False)
    assert comp_df.iloc[0]["n_cells"] == 4
    assert comp_df.iloc[0]["geom_wkt"].startswith("POLYGON")


def test_zonal_stats_counts(ray_session):
    # 2 unit squares, 3 points in the first, 1 in the second, 1 outside
    polys = rd.from_arrow(
        pa.table(
            {
                "poly_id": pa.array([1, 2], pa.int64()),
                "xs": pa.array([[0.0, 1.0, 1.0, 0.0, 0.0], [2.0, 3.0, 3.0, 2.0, 2.0]]),
                "ys": pa.array([[0.0, 0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0, 0.0]]),
            }
        )
    )
    pts = rd.from_arrow(
        pa.table(
            {
                "point_id": pa.array([10, 11, 12, 13, 14], pa.int64()),
                "lon": pa.array([0.2, 0.5, 0.8, 2.5, 5.0]),
                "lat": pa.array([0.5, 0.5, 0.5, 0.5, 0.5]),
            }
        )
    )
    out = {r["poly_id"]: r["n_points"] for r in zonal_stats(pts, polys).take_all()}
    assert out == {1: 3, 2: 1}


def test_rasterize_negative_cells(ray_session):
    # points below/left of the origin must bin into the correct negative
    # cells (regression: an unbiased int pack decoded (ix,-1) as (ix-1, 2^32-1))
    ds = rd.from_arrow(
        pa.table({"lon": [-0.0004, 0.0004, -0.0004], "lat": [-0.0004, -0.0004, 0.0004]})
    )
    out = rasterize_points(ds, res=0.001).to_pandas()
    got = {(r.ix, r.iy): r.n for r in out.itertuples()}
    assert got == {(-1, -1): 1, (0, -1): 1, (-1, 0): 1}


def test_tile_pyramid_invariants(ray_session):
    import ray.data as rd

    from osmi_addresses_ray.pipelines.raster import rasterize_points, tile_pyramid

    pts = pd.DataFrame(
        {
            "lon": [0.0001, 0.0004, 0.0011, -0.0003, -0.0003, 0.0021],
            "lat": [0.0001, 0.0001, 0.0009, -0.0001, -0.0001, 0.0019],
        }
    )
    ds = rd.from_pandas(pts)
    pyr = tile_pyramid(rasterize_points(ds, res=0.001))
    # every level preserves the total count
    assert (pyr.groupby("zoom")["n"].sum() == len(pts)).all()
    # negative indices floor-halve (not truncate): cell (-1,-1) -> (-1,-1)
    l1 = pyr[pyr["zoom"] == 1].set_index(["ix", "iy"])["n"]
    assert l1.loc[(-1, -1)] == 2
    # parent of (0,0) and (1,0) at zoom 0 merges into (0,0) at zoom 1
    l0 = pyr[pyr["zoom"] == 0].set_index(["ix", "iy"])["n"]
    assert l1.loc[(0, 0)] == l0.loc[(0, 0)] + l0.get((1, 0), 0)
    # each parent equals the sum of its children between all levels
    for z in (0, 1):
        child = pyr[pyr["zoom"] == z].copy()
        child["pix"] = child["ix"] // 2
        child["piy"] = child["iy"] // 2
        want = child.groupby(["pix", "piy"])["n"].sum().sort_index()
        got = (
            pyr[pyr["zoom"] == z + 1]
            .set_index(["ix", "iy"])["n"]
            .sort_index()
        )
        assert (want.to_numpy() == got.to_numpy()).all()


def test_kernel_smooth_stencil_and_halo(ray_session):
    """3x3 box sum: a cell pair across a tile boundary smooths into each
    other (halo correctness); empty neighbors of mass appear (dilation);
    brute-force cross-check over the whole planted raster."""
    from osmi_addresses_ray.pipelines.raster import kernel_smooth

    cells = {(TILE - 1, 3): 5, (TILE, 3): 7, (0, 0): 1, (10, 10): 2}
    df = pd.DataFrame(
        {
            "tile_x": [k[0] // TILE for k in cells],
            "tile_y": [k[1] // TILE for k in cells],
            "ix": [k[0] for k in cells],
            "iy": [k[1] for k in cells],
            "n": list(cells.values()),
        }
    )
    out = kernel_smooth(rd.from_pandas(df).repartition(3), num_parts=4)
    got = {(r.ix, r.iy): r.sm for r in out.itertuples()}
    exp: dict = {}
    for (cx, cy), n in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                k = (cx + dx, cy + dy)
                exp[k] = exp.get(k, 0) + n
    assert got == exp
    assert got[(TILE - 1, 3)] == 12 and got[(TILE, 3)] == 12  # cross-tile halo
    assert got[(0, 1)] == 1  # dilation ring exists
