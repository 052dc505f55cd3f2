"""Cube-sphere quadtree cell tests: Hilbert prefix stability, parent-shift ≡
direct coarse encode, face coverage, and engine-vs-scalar-oracle equality."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmi_addresses_ray.functions.geohash import hilbert_xy2d
from osmi_addresses_ray.functions.s2quad import (
    face_of,
    quad_cell,
    quad_parent,
    sphere_xyz,
)
from osmi_addresses_ray.oracle.layers import (
    _quad_cell_scalar,
    _xy2d_scalar,
    oracle_quad_cells,
)


def test_hilbert_prefix_stability():
    rng = np.random.default_rng(0)
    n = 14
    x = rng.integers(0, 1 << n, 5000)
    y = rng.integers(0, 1 << n, 5000)
    d = hilbert_xy2d(x, y, n)
    for k in (1, 3, 6):
        assert np.array_equal(hilbert_xy2d(x >> k, y >> k, n - k), d >> (2 * k)), k


def test_scalar_hilbert_matches_vectorized():
    rng = np.random.default_rng(1)
    n = 10
    x = rng.integers(0, 1 << n, 300)
    y = rng.integers(0, 1 << n, 300)
    d = hilbert_xy2d(x, y, n)
    for i in range(len(x)):
        assert _xy2d_scalar(int(x[i]), int(y[i]), n) == d[i]


def test_parent_shift_equals_direct_coarse_encode():
    rng = np.random.default_rng(2)
    lon = rng.uniform(-180, 180, 20000)
    lat = rng.uniform(-90, 90, 20000)
    c12 = quad_cell(lon, lat, 12)
    c8 = quad_cell(lon, lat, 8)
    assert np.array_equal(quad_parent(c12, 4), c8)


def test_all_faces_reachable_and_ids_in_range():
    # cardinal directions + poles hit every face
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
    x, y, z = sphere_xyz(lon, lat)
    assert sorted(face_of(x, y, z).tolist()) == [0, 1, 2, 3, 4, 5]
    c = quad_cell(lon, lat, 12)
    assert (c >= 0).all() and (c < 6 << 24).all()


def test_vectorized_cells_match_scalar_oracle():
    rng = np.random.default_rng(3)
    n = 2000
    df = pd.DataFrame(
        {
            "node_id": np.arange(n, dtype=np.float64),
            "ip_id": pd.array([None] * n, dtype="string"),
            "lon": rng.uniform(-180, 180, n),
            "lat": rng.uniform(-90, 90, n),
        }
    )
    want = oracle_quad_cells(df)
    got12 = quad_cell(df["lon"].to_numpy(), df["lat"].to_numpy(), 12)
    got8 = quad_cell(df["lon"].to_numpy(), df["lat"].to_numpy(), 8)
    # oracle is sorted by node_id which is already ascending
    assert np.array_equal(got12, want["cell_l12"].to_numpy())
    assert np.array_equal(got8, want["cell_l8"].to_numpy())


def test_scalar_cell_on_exact_axis_points():
    # exact unit vectors (no trig involved) — spec sanity on face centers:
    # every face center maps to the middle cell of its face grid
    for x, y, z, f in [
        (1.0, 0.0, 0.0, 0),
        (0.0, 1.0, 0.0, 1),
        (0.0, 0.0, 1.0, 2),
        (-1.0, 0.0, 0.0, 3),
        (0.0, -1.0, 0.0, 4),
        (0.0, 0.0, -1.0, 5),
    ]:
        c = _quad_cell_scalar(x, y, z, 4)
        assert c >> 8 == f
        d = c & 0xFF
        # u = v = 0 → s = t = 0.5 → i = j = 8 at level 4
        assert d == _xy2d_scalar(8, 8, 4)
