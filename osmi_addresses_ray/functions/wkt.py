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


def lines_wkt_from_offsets(flat_xy: np.ndarray, offsets: np.ndarray, *, polygon: bool = False) -> list:
    """WKT strings for many polylines packed as (flat (n,2) coords, offsets).

    Python-level per-geometry loop — used only on output layers (small
    relative to input). ``polygon=True`` emits POLYGON with the ring as-is.
    """
    out = []
    for i in range(len(offsets) - 1):
        seg = flat_xy[offsets[i] : offsets[i + 1]]
        out.append(polygon_wkt_py(seg) if polygon else linestring_wkt_py(seg))
    return out
