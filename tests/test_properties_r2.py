"""Property-based tests (hypothesis) for round-2 kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**29), max_value=2**29 - 1),
            st.integers(min_value=-(2**29), max_value=2**29 - 1),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_lin_index_injective_roundtrip(pairs):
    from osmi_addresses_ray.pipelines.raster import _unpack, lin_index

    ix = np.array([p[0] for p in pairs], dtype=np.int64)
    iy = np.array([p[1] for p in pairs], dtype=np.int64)
    key = lin_index(ix, iy)
    rx, ry = _unpack(key)
    assert (rx == ix).all() and (ry == iy).all()
    # injective: distinct cells → distinct keys
    assert len(set(key.tolist())) == len(set(pairs))


@given(st.lists(st.floats(min_value=-180, max_value=180, allow_nan=False), min_size=1, max_size=30))
def test_osmium_quantize_idempotent_and_bounded(vals):
    from osmi_addresses_ray.functions.geo_ref import osmium_quantize

    a = np.array(vals, dtype=np.float64)
    q = osmium_quantize(a)
    # idempotent (a quantized value re-quantizes to itself)
    assert np.array_equal(osmium_quantize(q), q)
    # within half a quantum of the input
    assert np.all(np.abs(q - a) <= 5.0000001e-8)


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=40))
def test_pbf_varint_zigzag_roundtrip(vals):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from pbf_writer import _varint, _zz

    from osmi_addresses_ray.sources.osm_pbf import packed_varints

    buf = b"".join(_varint(_zz(v)) for v in vals)
    assert packed_varints(buf, signed=True) == vals


@given(
    st.lists(st.integers(min_value=0, max_value=7), min_size=0, max_size=60),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=25, deadline=None)
def test_pack_unpack_roundtrip(parts, num_parts):
    import pyarrow as pa

    from osmi_addresses_ray.ops import pack_by_part, unpack_parts

    part = np.array([p % num_parts for p in parts], dtype=np.int64)
    t = pa.table({"v": pa.array(np.arange(len(part)), pa.int64())})
    packed = pack_by_part(t, part, 0)
    tabs = unpack_parts(packed, 1)[0]
    got = sorted(v for tab in tabs for v in tab["v"].to_pylist())
    assert got == list(range(len(part)))


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=-10, max_value=10, allow_nan=False),
            st.floats(min_value=-10, max_value=10, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    )
)
@settings(max_examples=50, deadline=None)
def test_centroid_scalar_equals_packed(points):
    """The batch (packed) centroid kernel must agree with the scalar one on
    arbitrary (possibly degenerate/self-intersecting) rings."""
    from osmi_addresses_ray.functions.geom import (
        polygon_centroid,
        polygon_centroids_packed,
    )

    ring = np.array(points + [points[0]], dtype=np.float64)
    cx, cy = polygon_centroid(ring)
    px, py = polygon_centroids_packed(
        ring[:, 0], ring[:, 1], np.array([0, len(ring)], np.int64), np.array([0])
    )
    assert np.isclose(px[0], cx, rtol=0, atol=1e-12) or px[0] == cx
    assert np.isclose(py[0], cy, rtol=0, atol=1e-12) or py[0] == cy
