"""Vectorized WKT construction for the output layers.

The reference writes OGR geometries into SpatiaLite (Writer.hpp:104-150); our
sinks are Parquet, so geometry travels as WKT text next to typed attribute
columns. Points keep ``lon``/``lat`` float64 siblings so consumers never have
to re-parse WKT for probing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def point_wkt(lon, lat) -> pa.Array:
    """Vectorized ``POINT (x y)`` from two float arrays."""
    lon_s = pc.cast(pa.array(np.asarray(lon, dtype=np.float64)), pa.string())
    lat_s = pc.cast(pa.array(np.asarray(lat, dtype=np.float64)), pa.string())
    return pc.binary_join_element_wise("POINT (", lon_s, " ", lat_s, ")", "")


def linestring_wkt_py(coords: np.ndarray) -> str:
    """``LINESTRING (...)`` from an (n,2) array of lon/lat."""
    body = ", ".join(f"{x!r} {y!r}" for x, y in coords)
    return f"LINESTRING ({body})"


def polygon_wkt_py(coords: np.ndarray) -> str:
    """``POLYGON ((...))`` from an (n,2) closed ring (first == last)."""
    body = ", ".join(f"{x!r} {y!r}" for x, y in coords)
    return f"POLYGON (({body}))"


def two_point_line_wkt(x1, y1, x2, y2) -> pa.Array:
    """Vectorized 2-point ``LINESTRING`` (connection lines)."""
    parts = [
        pc.cast(pa.array(np.asarray(a, dtype=np.float64)), pa.string())
        for a in (x1, y1, x2, y2)
    ]
    return pc.binary_join_element_wise(
        "LINESTRING (", parts[0], " ", parts[1], ", ", parts[2], " ", parts[3], ")", ""
    )


def lines_wkt_from_offsets(
    flat_xy: np.ndarray, offsets: np.ndarray, *, polygon: bool = False
) -> pa.Array:
    """WKT strings for many polylines packed as (flat (n,2) coords, offsets).

    Fully vectorized: per-vertex "x y" strings via Arrow cast, then one
    ``binary_join`` over a list view — no per-geometry Python (the f-string
    loop measured ~5µs/row across millions of output rows). ``polygon=True``
    emits POLYGON with the ring as-is. Float text is Arrow's shortest
    round-trip form (same kernel as ``point_wkt``).
    """
    if len(offsets) <= 1:
        return pa.array([], pa.string())
    xs = pc.cast(pa.array(np.ascontiguousarray(flat_xy[:, 0])), pa.string())
    ys = pc.cast(pa.array(np.ascontiguousarray(flat_xy[:, 1])), pa.string())
    verts = pc.binary_join_element_wise(xs, ys, " ")
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), verts)
    body = pc.binary_join(lists, ", ")
    if polygon:
        return pc.binary_join_element_wise("POLYGON ((", body, "))", "")
    return pc.binary_join_element_wise("LINESTRING (", body, ")", "")
