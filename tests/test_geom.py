"""Unit tests for the from-scratch geometry kernels."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmi_addresses_ray.functions import geom
from osmi_addresses_ray.functions.cells import cell_of, cells_of_bbox
from osmi_addresses_ray.functions.housenumber import (
    alphabetic_parts,
    atoi,
    is_plain_number,
)


def test_mercator_roundtrip():
    lon, lat = np.array([8.788, -122.4, 0.0]), np.array([47.25, 37.77, 0.0])
    x, y = geom.wgs2merc(lon, lat)
    lon2, lat2 = geom.merc2wgs(x, y)
    assert np.allclose(lon, lon2, atol=1e-12)
    assert np.allclose(lat, lat2, atol=1e-12)
    # known value: EPSG:3857 of (0, 0) is (0, 0)
    assert x[2] == 0 and y[2] == 0


def test_centroid_square():
    ring = np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
    assert geom.polygon_centroid(ring) == (1.0, 1.0)


def test_centroid_degenerate():
    ring = np.array([[0, 0], [2, 0], [0, 0]], dtype=float)
    cx, cy = geom.polygon_centroid(ring)
    assert (cx, cy) == (1.0, 0.0)


def test_point_polyline_distance():
    line = np.array([[0, 0], [10, 0]], dtype=float)
    assert geom.point_polyline_distance(5, 3, line) == 3.0
    assert geom.point_polyline_distance(-4, 3, line) == 5.0  # clamps to endpoint
    d = geom.points_polyline_distances(np.array([5.0, -4.0]), np.array([3.0, 3.0]), line)
    assert np.allclose(d, [3.0, 5.0])


def test_snap_to_way_prefers_segment_projection():
    way = np.array([[0, 0], [10, 0], [10, 10]], dtype=float)
    # nearest vertex to (6, 1) is (10,0)? no — vertex dists: (0,0)=6.08, (10,0)=4.1, (10,10)=9.8
    x, y = geom.snap_to_way(6, 1, way)
    assert (x, y) == (6.0, 0.0)  # projection onto first segment via neighborhood
    # point past the end clamps to last vertex
    x, y = geom.snap_to_way(20, 20, way)
    assert (x, y) == (10.0, 10.0)


def test_value_along():
    line = np.array([[0, 0], [10, 0], [10, 5]], dtype=float)
    assert geom.value_along(line, 0) == (0.0, 0.0)
    assert geom.value_along(line, 12) == (10.0, 2.0)
    assert geom.value_along(line, 99) == (10.0, 5.0)
    pts = geom.values_along(line, np.array([0.0, 12.0, 99.0]))
    assert np.allclose(pts, [[0, 0], [10, 2], [10, 5]])


def test_points_in_ring():
    ring = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    inside = geom.points_in_ring(np.array([2.0, 5.0, -1.0]), np.array([2.0, 2.0, 2.0]), ring)
    assert inside.tolist() == [True, False, False]


def test_is_point_near_bbox_lon_scaling():
    # at lat 60, cos = 0.5 → lon tolerance doubles
    near = geom.is_point_near_bbox(59.9, 60.1, 10.0, 10.2, 10.2 + 0.015, 60.0, 0.01)
    assert bool(near)  # 0.015 < 0.01/cos(60°)=0.02
    far = geom.is_point_near_bbox(59.9, 60.1, 10.0, 10.2, 10.2 + 0.025, 60.0, 0.01)
    assert not bool(far)


def test_atoi_and_format():
    assert atoi("123%&") == 123
    assert atoi("  -42x") == -42
    assert atoi("x42") == 0
    assert is_plain_number("123", 123)
    assert not is_plain_number("123%&", 123)
    assert not is_plain_number("0123", 123)
    assert not is_plain_number("0", 0)


def test_alphabetic_parts():
    assert alphabetic_parts("12a", "12f") == ("ok", ord("a"), ord("f"), "12")
    assert alphabetic_parts("12a", "13f")[0] == "numeric parts of housenumbers not identical"
    assert alphabetic_parts("12", "12f")[0] == "no alphabetic part in addr:housenumber"
    assert alphabetic_parts("1ab", "12f")[0] == "skip"  # second-last char alphabetic
    assert alphabetic_parts("", "")[0] == "no alphabetic part in addr:housenumber"


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-85, max_value=85),
    lon=st.floats(min_value=-180, max_value=179.999),
    dlat=st.floats(min_value=0, max_value=0.05),
    dlon=st.floats(min_value=0, max_value=0.05),
    plat=st.floats(min_value=-0.015, max_value=0.015),
    plon=st.floats(min_value=-0.05, max_value=0.05),
)
def test_cell_cover_property(lat, lon, dlat, dlon, plat, plon):
    """If the bbox prefilter accepts a point, the point's cell must be in
    cells_of_bbox — the correctness contract of the J2 replication."""
    s, n, w, e = lat, min(lat + dlat, 85.0), lon, min(lon + dlon, 180.0)
    py, px = np.clip(lat + plat, -85, 85), lon + plon
    if px >= 180 or px < -180:
        return
    if bool(geom.is_point_near_bbox(s, n, w, e, px, py, 0.01)):
        cells = cells_of_bbox(s, n, w, e, 0.01)
        assert int(cell_of(px, py)) in set(cells.tolist())


def test_cells_of_bboxes_matches_scalar():
    """Batch cells kernel == scalar cells_of_bbox, row by row, including
    polar bands and antimeridian wraps (street-replication hot path)."""
    import numpy as np

    from osmi_addresses_ray.constants import MAXDIST
    from osmi_addresses_ray.functions.cells import cells_of_bboxes

    rng = np.random.default_rng(7)
    N = 1500
    lat0 = rng.uniform(-89.9, 89.8, N)
    lat1 = lat0 + rng.uniform(0, 0.2, N)
    lon0 = rng.uniform(-180, 179.9, N)
    lon1 = lon0 + rng.uniform(0, 0.2, N)
    lat0[:30] = rng.uniform(88.5, 89.95, 30)
    lat1[:30] = np.minimum(lat0[:30] + rng.uniform(0, 0.5, 30), 90.0)
    lon0[30:60] = 179.99
    lon1[30:60] = 180.0
    lat0[60:90] = -90.0
    lat1[60:90] = -89.9
    lon0[90:120] = -180.0
    lon1[90:120] = -179.99
    flat, counts = cells_of_bboxes(lat0, lat1, lon0, lon1, MAXDIST)
    ofs = np.concatenate(([0], np.cumsum(counts)))
    for i in range(N):
        exp = cells_of_bbox(
            float(lat0[i]), float(lat1[i]), float(lon0[i]), float(lon1[i]), MAXDIST
        )
        assert np.array_equal(np.asarray(exp), flat[ofs[i] : ofs[i + 1]]), i


def test_polygon_centroids_packed_matches_scalar():
    import numpy as np

    from osmi_addresses_ray.functions.geom import (
        polygon_centroid,
        polygon_centroids_packed,
    )

    rng = np.random.default_rng(3)
    rings = []
    # simple rings, collinear (zero-area) rings, single-point repeats
    for _ in range(200):
        k = rng.integers(3, 12)
        pts = rng.uniform(-10, 10, (k, 2))
        rings.append(np.vstack((pts, pts[0])))
    for _ in range(20):
        # collinear with small-integer coords: the shoelace sum is EXACTLY
        # 0.0, so both paths take the degenerate fallback. (Float-dust
        # near-zero areas divide by ~1e-15 — pure cancellation noise in the
        # scalar version too — and are not a meaningful contract.)
        a = rng.integers(-5, 5, 2).astype(np.float64)
        d = rng.integers(1, 4, 2).astype(np.float64)
        rings.append(np.array([a, a + d, a + 2 * d, a]))  # zero area
    rings.append(np.array([[1.0, 2.0], [1.0, 2.0], [1.0, 2.0]]))  # zero length
    fx = np.concatenate([r[:, 0] for r in rings])
    fy = np.concatenate([r[:, 1] for r in rings])
    offsets = np.concatenate(([0], np.cumsum([len(r) for r in rings])))
    sel = np.arange(len(rings))
    cx, cy = polygon_centroids_packed(fx, fy, offsets, sel)
    for i, r in enumerate(rings):
        ex, ey = polygon_centroid(r)
        assert np.isclose(cx[i], ex, rtol=1e-12, atol=1e-12), i
        assert np.isclose(cy[i], ey, rtol=1e-12, atol=1e-12), i


def test_geohash_known_vectors():
    from osmi_addresses_ray.functions.geohash import geohash_encode

    got = geohash_encode(np.array([-5.6, 10.40744]), np.array([42.6, 57.64911]), 5)
    assert got.tolist() == ["ezs42", "u4pru"]
    long = geohash_encode(np.array([10.40744]), np.array([57.64911]), 11)
    assert long.tolist() == ["u4pruydqqvj"]


def test_geohash_prefix_nesting_and_edges():
    from osmi_addresses_ray.functions.geohash import geohash_encode

    lon = np.array([-180.0, 179.9999999, 0.0, 8.5417])
    lat = np.array([-90.0, 89.9999999, 0.0, 47.3769])
    for p in (3, 5, 7):
        g_p = geohash_encode(lon, lat, p)
        g_7 = geohash_encode(lon, lat, 7)
        # shorter precision is always a prefix: cells nest
        assert all(full.startswith(short) for short, full in zip(g_p, g_7))
    assert geohash_encode(np.array([-180.0]), np.array([-90.0]), 7)[0] == "0000000"


def test_geohash_engine_matches_scalar_oracle_fuzz():
    import pandas as pd

    from osmi_addresses_ray.functions.geohash import geohash_encode
    from osmi_addresses_ray.oracle.layers import oracle_geohash

    rng = np.random.default_rng(11)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-90, 90, 2000)
    df = pd.DataFrame({"node_id": np.arange(2000), "ip_id": [""] * 2000, "lon": lon, "lat": lat})
    want = oracle_geohash(df).sort_values("node_id").reset_index(drop=True)
    assert (want["geohash"].to_numpy(object) == geohash_encode(lon, lat, 7)).all()


def test_hilbert_vectorized_matches_scalar_and_locality():
    from osmi_addresses_ray.functions.geohash import hilbert_d

    def xy2d(n, x, y):
        d = 0
        s = n // 2
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s //= 2
        return d

    order, n = 4, 16
    lons, lats, want = [], [], []
    for xi in range(n):
        for yi in range(n):
            lons.append(-180 + (xi + 0.5) * 360 / n)
            lats.append(-90 + (yi + 0.5) * 180 / n)
            want.append(xy2d(n, xi, yi))
    got = hilbert_d(np.array(lons), np.array(lats), order)
    assert got.tolist() == want
    # bijection over the full grid
    assert sorted(got.tolist()) == list(range(n * n))
