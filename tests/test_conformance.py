"""End-to-end conformance: full pipeline on the reference testzone corpus,
asserting the reference's own golden layer counts (test/run_tests.sh:15-79)."""

from __future__ import annotations

import pyarrow.compute as pc
import pytest
import ray.data as rd

from osmi_addresses_ray.pipelines.address_view import build_layers


@pytest.fixture(scope="module")
def layers(testzone_docs):
    return build_layers(rd.from_arrow(testzone_docs), num_parts=4)


def _count(layers, name, pred=None):
    ds = layers[name]
    if pred is None:
        return ds.count()
    total = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        total += b.filter(pred(b)).num_rows
    return total


def test_connection_line(layers):
    assert _count(layers, "osmi_addresses_connection_line") == 116


def test_nearest_points(layers):
    assert _count(layers, "osmi_addresses_nearest_points") == 111


def test_nearest_roads(layers):
    assert _count(layers, "osmi_addresses_nearest_roads") == 8


def test_nearest_areas(layers):
    assert _count(layers, "osmi_addresses_nearest_areas") == 1


def test_interpolation(layers):
    assert _count(layers, "osmi_addresses_interpolation") == 27


def test_nodes_with_addresses(layers):
    name = "osmi_addresses_nodes_with_addresses"
    assert _count(layers, name) == 134
    assert _count(layers, name, lambda b: pc.equal(b["is_ip"], 0)) == 115
    assert _count(layers, name, lambda b: pc.equal(b["is_ip"], 1)) == 19
    assert _count(layers, name, lambda b: pc.is_valid(b["road_id"])) == 111
    assert (
        _count(
            layers,
            name,
            lambda b: pc.or_(
                pc.is_valid(b["nody_place_id"]), pc.is_valid(b["wayy_place_id"])
            ),
        )
        == 5
    )


def test_ways_with_addresses(layers):
    assert _count(layers, "osmi_addresses_ways_with_addresses") == 48


def test_buildings(layers):
    assert _count(layers, "osmi_addresses_buildings") == 0


def test_addrx(layers):
    assert _count(layers, "osmi_addresses_addrx_on_nonclosed_way") == 9


def test_entrances(layers):
    assert _count(layers, "osmi_addresses_entrances") == 6


def test_ways_with_postal_code(layers):
    assert _count(layers, "osmi_addresses_ways_with_postal_code") == 8


def test_karlsruher_strasse_8_location(layers):
    """run_tests.sh:58 — location probe for node -807's address point.

    The reference's ``inbbox`` operator (test_engine.pl:43) queries the
    SpatiaLite R-tree, whose MBRs are float32 with outward rounding — i.e.
    the real assertion is "exactly one point within ~1 float32 ulp of the
    box", not an exact float64 equality. We emulate the R-tree semantics:
    float32(xmin) < left AND float32(xmax) > right (and same for y).
    """
    import numpy as np

    left, right = 8.784524590652961, 8.784524590652963
    bottom, top = 47.25353605657822, 47.25353605657824

    def f32_down(v):
        f = np.float32(v)
        return np.where(f.astype(np.float64) <= v, f, np.nextafter(f, np.float32(-np.inf))).astype(np.float64)

    def f32_up(v):
        f = np.float32(v)
        return np.where(f.astype(np.float64) >= v, f, np.nextafter(f, np.float32(np.inf))).astype(np.float64)

    def pred(b):
        import pyarrow as pa

        lon = b["lon"].to_numpy(zero_copy_only=False)
        lat = b["lat"].to_numpy(zero_copy_only=False)
        ok = (
            (f32_down(lon) < left)
            & (f32_up(lon) > right)
            & (f32_down(lat) < bottom)
            & (f32_up(lat) > top)
        )
        return pa.array(ok)

    n = _count(layers, "osmi_addresses_nodes_with_addresses", pred)
    assert n == 1


# --- run_tests.sh:37-46,63-79 — bbox containment + geodesic length / LV95 area

import re as _re

import numpy as _np


def _wkt_coords(wkt: str) -> _np.ndarray:
    pts = _re.findall(r"[-\d.eE+]+ [-\d.eE+]+", wkt)
    return _np.array([[float(v) for v in p.split()] for p in pts])


def _layer_lengths(layers, name):
    from osmi_addresses_ray.functions.geo_ref import geodesic_length

    return [geodesic_length(_wkt_coords(r["geom_wkt"])) for r in layers[name].take_all()]


def _layer_areas(layers, name):
    from osmi_addresses_ray.functions.geo_ref import lv95_ring_area

    return [lv95_ring_area(_wkt_coords(r["geom_wkt"])) for r in layers[name].take_all()]


# SpatiaLite re-runs bit-identically at 1e-7; our independent kernels match
# its algorithms (see functions/geo_ref.py) to <=2.4e-5 m / <=6.2e-6 m² on
# these geometries — the asserted tolerances cover that residual with margin.
LEN_TOL = 5e-5
AREA_TOL = 1e-4

LENGTH_GOLDENS = {
    # run_tests.sh:63-70 — SELECT MIN/MAX(ST_Length(geometry, 0))
    "osmi_addresses_connection_line": (1.34749447344977, 17.3055759386695),
    "osmi_addresses_interpolation": (2.81660826175927, 31.288447031296),
    "osmi_addresses_nearest_roads": (16.0156550129829, 139.896459880885),
    "osmi_addresses_ways_with_postal_code": (85.0653586130059, 1932.24220904501),
}

AREA_GOLDENS = {
    # run_tests.sh:74-79 — SELECT MIN/MAX(ST_Area(ST_Transform(geometry, 2056)))
    "osmi_addresses_ways_with_addresses": (0.958406202423518, 49.3336374588885),
    "osmi_addresses_nearest_areas": (198.809381183972, 198.809381183972),
}


@pytest.mark.parametrize("layer", sorted(LENGTH_GOLDENS))
def test_geodesic_length_goldens(layers, layer):
    ls = _layer_lengths(layers, layer)
    gmin, gmax = LENGTH_GOLDENS[layer]
    assert min(ls) == pytest.approx(gmin, abs=LEN_TOL)
    assert max(ls) == pytest.approx(gmax, abs=LEN_TOL)


@pytest.mark.parametrize("layer", sorted(AREA_GOLDENS))
def test_lv95_area_goldens(layers, layer):
    ars = _layer_areas(layers, layer)
    gmin, gmax = AREA_GOLDENS[layer]
    assert min(ars) == pytest.approx(gmin, abs=AREA_TOL)
    assert max(ars) == pytest.approx(gmax, abs=AREA_TOL)


# run_tests.sh:37-46 — every layer feature inside the testzone bbox
# (test_engine.pl reads the SpatiaLite R-tree, which stores float32 envelopes)
BBOX_LAYERS = (
    "osmi_addresses_connection_line",
    "osmi_addresses_interpolation",
    "osmi_addresses_nearest_points",
    "osmi_addresses_nearest_roads",
    "osmi_addresses_nearest_areas",
    "osmi_addresses_nodes_with_addresses",
    "osmi_addresses_ways_with_addresses",
    "osmi_addresses_buildings",
    "osmi_addresses_entrances",
)
TZ_BBOX = (8.783, 8.793, 47.25, 47.2544)  # left, right, bottom, top


@pytest.mark.parametrize("layer", sorted(BBOX_LAYERS))
def test_outofbbox_zero(layers, layer):
    left, right, bottom, top = (_np.float32(v) for v in TZ_BBOX)
    for r in layers[layer].take_all():
        c = _wkt_coords(r["geom_wkt"]).astype(_np.float32)
        assert (
            (c[:, 0] >= left).all()
            and (c[:, 0] <= right).all()
            and (c[:, 1] >= bottom).all()
            and (c[:, 1] <= top).all()
        ), f"{layer}: feature outside testzone bbox"
