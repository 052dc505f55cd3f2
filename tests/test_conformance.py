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
