"""Unit tests for the geodesic-length and LV95 kernels."""

from __future__ import annotations

import numpy as np
import pytest

from osmi_addresses_ray.functions.geo_ref import (
    BESSEL_A,
    BESSEL_E2,
    LV95_FE,
    LV95_FN,
    LV95_LAT0,
    LV95_LON0,
    TOWGS84,
    _geodetic_to_geocentric,
    geodesic_length,
    lv95_ring_area,
    osmium_quantize,
    wgs84_to_lv95,
)
from osmi_addresses_ray.functions.geo_ref import WGS84_A, WGS84_E2, _geocentric_to_geodetic


def test_osmium_quantize_semantics():
    # round half away from zero at 1e-7, exact on 7-decimal values
    assert osmium_quantize(np.array([8.00000005]))[0] == pytest.approx(8.0000001, abs=1e-12)
    assert osmium_quantize(np.array([-8.00000005]))[0] == pytest.approx(-8.0000001, abs=1e-12)
    assert osmium_quantize(np.array([47.2535361]))[0] == 47.2535361


def test_greatcircle_one_degree_longitude():
    # 1° of longitude at the equator on the mean sphere ≈ R·π/180
    import math

    d = geodesic_length(np.array([[0.0, 0.0], [1.0, 0.0]]))
    assert d == pytest.approx(6371008.771 * math.pi / 180.0, rel=1e-9)


def test_lv95_projection_origin():
    """The projection center (Bern) maps to exactly (2600000, 1200000) in
    CH1903+; feed its WGS84 equivalent obtained by the forward Helmert."""
    x, y, z = _geodetic_to_geocentric(LV95_LAT0, LV95_LON0, BESSEL_A, BESSEL_E2)
    lat, lon = _geocentric_to_geodetic(
        x + TOWGS84[0], y + TOWGS84[1], z + TOWGS84[2], WGS84_A, WGS84_E2
    )
    E, N = wgs84_to_lv95(np.rad2deg(lon), np.rad2deg(lat))
    # ~0.5 mm residual: the 2D transform assumes h=0 on the WGS84 side while
    # the Bessel-surface point sits at h≈49 m (inherent to 2D ST_Transform)
    assert float(E) == pytest.approx(LV95_FE, abs=2e-3)
    assert float(N) == pytest.approx(LV95_FN, abs=2e-3)


def test_lv95_scale_near_center():
    """k0 = 1 at the projection center: a small E-W step projects to the
    ellipsoidal parallel arc N(φ)·cosφ·Δλ (NOT the mean-sphere arc, which is
    0.29 % shorter at this latitude)."""
    lon0, lat0 = 7.44, 46.95
    dlon = 0.001
    E1, N1 = wgs84_to_lv95(np.array([lon0]), np.array([lat0]))
    E2_, N2 = wgs84_to_lv95(np.array([lon0 + dlon]), np.array([lat0]))
    proj_len = float(np.hypot(E2_ - E1, N2 - N1))
    Nrad = WGS84_A / np.sqrt(1.0 - WGS84_E2 * np.sin(np.deg2rad(lat0)) ** 2)
    arc = np.deg2rad(dlon) * np.cos(np.deg2rad(lat0)) * Nrad
    assert proj_len == pytest.approx(arc, rel=1e-3)


def test_lv95_area_square():
    """A ~100 m square near Bern has area ~width*height in LV95 meters."""
    lon0, lat0 = 7.45, 46.96
    dlat = 100.0 / 111194.9
    dlon = 100.0 / (111194.9 * np.cos(np.deg2rad(lat0)))
    ring = np.array(
        [
            [lon0, lat0],
            [lon0 + dlon, lat0],
            [lon0 + dlon, lat0 + dlat],
            [lon0, lat0 + dlat],
            [lon0, lat0],
        ]
    )
    area = lv95_ring_area(ring)
    assert area == pytest.approx(100.0 * 100.0, rel=5e-3)
