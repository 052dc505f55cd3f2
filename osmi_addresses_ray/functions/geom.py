"""From-scratch numpy geometry kernels (no shapely/GDAL in this environment).

Each kernel reproduces the observable behavior of an OGR/GEOS operation used
by the reference:

- ``polygon_centroid``        ← OGRPolygon::Centroid (GeometryHelper.hpp:31-41)
- ``point_polyline_distance`` ← OGRLineString::Distance (ConnectionLinePreprocessor.hpp:266)
- ``closest_point_on_segment``← CLPP.hpp:343-364 (r-clamped scalar projection)
- ``snap_to_way``             ← CLPP.hpp:283-338 (nearest vertex, then the two
                                adjacent segments; computed in EPSG:3857)
- ``wgs2merc`` / ``merc2wgs`` ← GeometryHelper.hpp:15-27,43-61 (spherical web
                                mercator)
- ``value_along``             ← OGRLineString::Value linear referencing
                                (InterpolationWriter.hpp:193-195)
- ``polyline_length``         ← OGRLineString::get_Length (planar, degrees)
- ``lat2int16``/``lon2int16``/``int162lat``/``int162lon`` and
  ``is_point_near_bbox``      ← GeometryHelper.hpp:96-152, including the
                                int16 quantization with outward rounding and
                                the float32 arithmetic of the bbox test
- ``points_in_ring``          ← ray-casting point-in-polygon (north-star PIP op)

All coordinate arrays are float64 ``(n, 2)`` = (x=lon, y=lat) unless noted.
"""

from __future__ import annotations

import numpy as np

INT16_MAX = 32767
MERC_R = 6378137.0


# --- web mercator (spherical, EPSG:3857) ------------------------------------

def wgs2merc(lon, lat):
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    x = MERC_R * np.deg2rad(lon)
    y = MERC_R * np.log(np.tan(np.pi / 4.0 + np.deg2rad(lat) / 2.0))
    return x, y


def merc2wgs(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lon = np.rad2deg(x / MERC_R)
    lat = np.rad2deg(2.0 * np.arctan(np.exp(y / MERC_R)) - np.pi / 2.0)
    return lon, lat


# --- bbox + int16 quantization (GeometryHelper.hpp:71-120) ------------------

def bbox_of(coords: np.ndarray) -> tuple[float, float, float, float]:
    """(south, north, west, east) envelope of an (n,2) lon/lat array."""
    return (
        float(coords[:, 1].min()),
        float(coords[:, 1].max()),
        float(coords[:, 0].min()),
        float(coords[:, 0].max()),
    )


def lat2int16(lat, increment_when_rounding: bool):
    r = np.asarray(lat, dtype=np.float64) * INT16_MAX / 90.0
    return (np.ceil(r) if increment_when_rounding else np.floor(r)).astype(np.int16)


def lon2int16(lon, increment_when_rounding: bool):
    r = np.asarray(lon, dtype=np.float64) * INT16_MAX / 180.0
    return (np.ceil(r) if increment_when_rounding else np.floor(r)).astype(np.int16)


def int162lat(v):
    return (np.asarray(v, dtype=np.float32) * np.float32(90.0) / np.float32(INT16_MAX)).astype(
        np.float32
    )


def int162lon(v):
    return (np.asarray(v, dtype=np.float32) * np.float32(180.0) / np.float32(INT16_MAX)).astype(
        np.float32
    )


def quantized_bbox(coords: np.ndarray) -> tuple[float, float, float, float]:
    """(s, n, w, e) after int16 round-trip with outward rounding.

    Reproduces FirstHandler.hpp:66-70 + GeometryHelper.hpp:96-120: the street
    index stores int16-quantized bboxes; the candidate prefilter dequantizes
    them to float32. Outward rounding can expand the envelope by up to one
    quantum (~0.0027° lat / ~0.0055° lon).
    """
    s, n, w, e = bbox_of(coords)
    return (
        float(int162lat(lat2int16(s, False))),
        float(int162lat(lat2int16(n, True))),
        float(int162lon(lon2int16(w, False))),
        float(int162lon(lon2int16(e, True))),
    )


def is_point_near_bbox(s, n, w, e, lon, lat, tolerance):
    """Vectorized GeometryHelper.hpp:127-152 (float32 arithmetic).

    True when the point is within ``tolerance`` degrees of the bbox in
    latitude and ``tolerance/cos(lat)`` in longitude. All operands are cast
    to float32, as in the reference.
    """
    f = np.float32
    lat32 = np.asarray(lat, dtype=f)
    lon32 = np.asarray(lon, dtype=f)
    tol = f(tolerance)
    lon_tol = tol / np.cos(np.deg2rad(lat32).astype(f)).astype(f)
    return (
        (lat32 < np.asarray(n, f) + tol)
        & (lat32 > np.asarray(s, f) - tol)
        & (lon32 < np.asarray(e, f) + lon_tol)
        & (lon32 > np.asarray(w, f) - lon_tol)
    )


# --- polygon centroid (GEOS-equivalent shoelace) -----------------------------

def polygon_centroid(ring: np.ndarray) -> tuple[float, float]:
    """Area-weighted centroid of a closed ring (first == last point).

    GEOS ``algorithm::Centroid`` formulation: triangles fanned from the
    ring's FIRST point, signed areas computed on base-point-relative
    coordinates. This matches OGRPolygon::Centroid (which delegates to
    GEOS) and — the load-bearing property — stays numerically accurate for
    near-degenerate / self-intersecting rings, where the classic absolute-
    coordinate shoelace loses ~10 digits to cancellation and scatters the
    centroid tens of meters (observed on the reference testzone's bowtie
    test polygons). Degenerate (zero-area) rings fall back to the
    length-weighted midpoint, then the first point, like GEOS.
    """
    x = ring[:, 0]
    y = ring[:, 1]
    x0, y0 = x[0], y[0]
    a2 = (x[:-1] - x0) * (y[1:] - y0) - (x[1:] - x0) * (y[:-1] - y0)
    area2 = np.add.reduceat(a2, [0])[0] if len(a2) else 0.0
    if area2 != 0.0:
        cx = np.add.reduceat(a2 * (x0 + x[:-1] + x[1:]), [0])[0] / 3.0 / area2
        cy = np.add.reduceat(a2 * (y0 + y[:-1] + y[1:]), [0])[0] / 3.0 / area2
        return float(cx), float(cy)
    # zero area: length-weighted average of segment midpoints
    seg = np.hypot(np.diff(x), np.diff(y))
    total = seg.sum()
    if total == 0.0:
        return float(x[0]), float(y[0])
    mx = ((x[:-1] + x[1:]) / 2.0 * seg).sum() / total
    my = ((y[:-1] + y[1:]) / 2.0 * seg).sum() / total
    return float(mx), float(my)


def polygon_centroids_packed(
    fx: np.ndarray, fy: np.ndarray, offsets: np.ndarray, sel: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Batch ``polygon_centroid`` over rings packed as flat coords + offsets.

    ``sel`` = ring indices to compute (closed, nonzero). Segmented GEOS
    base-point triangle formulation via add.reduceat with ring-boundary pair
    terms zeroed — same values and the same degenerate fallbacks as the
    scalar function, no per-ring Python.
    """
    counts = np.diff(offsets)
    csel = counts[sel]
    if not len(csel):
        return np.empty(0, np.float64), np.empty(0, np.float64)
    tot = int(csel.sum())
    goff = np.concatenate(([0], np.cumsum(csel)))
    gi = np.repeat(offsets[:-1][sel], csel) + (
        np.arange(tot) - np.repeat(goff[:-1], csel)
    )
    gx, gy = fx[gi], fy[gi]
    # per-ring base point (the ring's first vertex), broadcast over pairs;
    # boundary pairs (ring i's last → ring i+1's first) are zeroed below
    bnd = goff[1:-1] - 1
    bx = gx[goff[:-1]]
    by = gy[goff[:-1]]
    ring_full = np.repeat(np.arange(len(csel)), csel)[:-1]
    x0 = bx[ring_full]
    y0 = by[ring_full]
    cross = (gx[:-1] - x0) * (gy[1:] - y0) - (gx[1:] - x0) * (gy[:-1] - y0)
    seg = np.hypot(np.diff(gx), np.diff(gy))
    cross[bnd] = 0.0
    seg[bnd] = 0.0
    starts = goff[:-1]
    area2 = np.add.reduceat(cross, starts)
    sxc = np.add.reduceat(cross * (x0 + gx[:-1] + gx[1:]), starts)
    syc = np.add.reduceat(cross * (y0 + gy[:-1] + gy[1:]), starts)
    with np.errstate(divide="ignore", invalid="ignore"):
        cx = sxc / 3.0 / area2
        cy = syc / 3.0 / area2
    # zero-area fallback: length-weighted midpoint; zero-length: first point
    degen = area2 == 0.0
    if degen.any():
        slen = np.add.reduceat(seg, starts)
        mx = np.add.reduceat((gx[:-1] + gx[1:]) / 2.0 * seg, starts)
        my = np.add.reduceat((gy[:-1] + gy[1:]) / 2.0 * seg, starts)
        with np.errstate(divide="ignore", invalid="ignore"):
            fmx = mx / slen
            fmy = my / slen
        first_x = gx[starts]
        first_y = gy[starts]
        zl = slen == 0.0
        fmx = np.where(zl, first_x, fmx)
        fmy = np.where(zl, first_y, fmy)
        cx = np.where(degen, fmx, cx)
        cy = np.where(degen, fmy, cy)
    return cx, cy


# --- distances / projection --------------------------------------------------

def point_polyline_distance(px: float, py: float, coords: np.ndarray) -> float:
    """Exact min distance from a point to a polyline (planar).

    Equivalent to GEOS/OGR ``Distance`` between a point and a linestring:
    min over all segments of the clamped point-segment distance.
    """
    ax, ay = coords[:-1, 0], coords[:-1, 1]
    bx, by = coords[1:, 0], coords[1:, 1]
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    t = np.where(seg2 > 0.0, ((px - ax) * dx + (py - ay) * dy) / np.where(seg2 == 0, 1, seg2), 0.0)
    t = np.clip(t, 0.0, 1.0)
    cx, cy = ax + t * dx, ay + t * dy
    return float(np.min(np.hypot(px - cx, py - cy)))


def points_polyline_distances(px: np.ndarray, py: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Min distance of MANY points to one polyline — vectorized (m pts × k segs)."""
    ax, ay = coords[:-1, 0], coords[:-1, 1]
    bx, by = coords[1:, 0], coords[1:, 1]
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    seg2_safe = np.where(seg2 == 0.0, 1.0, seg2)
    # shape (m, k)
    t = ((px[:, None] - ax) * dx + (py[:, None] - ay) * dy) / seg2_safe
    t = np.where(seg2 > 0.0, np.clip(t, 0.0, 1.0), 0.0)
    cx = ax + t * dx
    cy = ay + t * dy
    return np.hypot(px[:, None] - cx, py[:, None] - cy).min(axis=1)


def closest_point_on_segment(a, b, p):
    """CLPP.hpp:343-364 — r-clamped projection of p onto segment a-b."""
    ax, ay = a
    bx, by = b
    px, py = p
    den = (bx - ax) ** 2 + (by - ay) ** 2
    if den == 0.0:
        return ax, ay
    r = ((px - ax) * (bx - ax) + (py - ay) * (by - ay)) / den
    if r < 0:
        return ax, ay
    if r > 1:
        return bx, by
    return ax + r * (bx - ax), ay + r * (by - ay)


def snap_to_way(px: float, py: float, coords: np.ndarray) -> tuple[float, float]:
    """CLPP.hpp:283-338 — nearest VERTEX, then the better of the two adjacent
    segments' clamped projections. Not the global nearest point: faithful to
    the reference's local neighborhood search. Operates in whatever CRS the
    inputs are in (the reference calls it in EPSG:3857).
    """
    d = np.hypot(coords[:, 0] - px, coords[:, 1] - py)
    i = int(np.argmin(d))  # first minimal vertex, like the strict '<' scan
    best = (float(coords[i, 0]), float(coords[i, 1]))
    if i > 0:
        cand = closest_point_on_segment(coords[i], coords[i - 1], (px, py))
        # unconditional: at least as close as the vertex (CLPP.hpp:327-328)
        best = cand
    if i < len(coords) - 1:
        cand = closest_point_on_segment(coords[i], coords[i + 1], (px, py))
        if np.hypot(px - cand[0], py - cand[1]) < np.hypot(px - best[0], py - best[1]):
            best = cand
    return float(best[0]), float(best[1])


# --- linear referencing ------------------------------------------------------

def polyline_length(coords: np.ndarray) -> float:
    return float(np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1])).sum())


def value_along(coords: np.ndarray, dist: float) -> tuple[float, float]:
    """OGRLineString::Value — the point at ``dist`` along the line.

    Below 0 → first point; past the end → last point.
    """
    seg = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
    cum = np.concatenate(([0.0], np.cumsum(seg)))
    if dist <= 0.0:
        return float(coords[0, 0]), float(coords[0, 1])
    if dist >= cum[-1]:
        return float(coords[-1, 0]), float(coords[-1, 1])
    i = int(np.searchsorted(cum, dist, side="right") - 1)
    i = min(i, len(seg) - 1)
    r = (dist - cum[i]) / seg[i] if seg[i] > 0 else 0.0
    return (
        float(coords[i, 0] + r * (coords[i + 1, 0] - coords[i, 0])),
        float(coords[i, 1] + r * (coords[i + 1, 1] - coords[i, 1])),
    )


def values_along(coords: np.ndarray, dists: np.ndarray) -> np.ndarray:
    """Vectorized ``value_along`` for many distances → (m,2) points."""
    seg = np.hypot(np.diff(coords[:, 0]), np.diff(coords[:, 1]))
    cum = np.concatenate(([0.0], np.cumsum(seg)))
    d = np.clip(np.asarray(dists, dtype=np.float64), 0.0, cum[-1])
    i = np.clip(np.searchsorted(cum, d, side="right") - 1, 0, len(seg) - 1)
    segi = np.where(seg[i] > 0, seg[i], 1.0)
    r = np.where(seg[i] > 0, (d - cum[i]) / segi, 0.0)
    out = np.empty((len(d), 2), dtype=np.float64)
    out[:, 0] = coords[i, 0] + r * (coords[i + 1, 0] - coords[i, 0])
    out[:, 1] = coords[i, 1] + r * (coords[i + 1, 1] - coords[i, 1])
    return out


# --- point in polygon (ray casting) -----------------------------------------

def points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray casting of many points against one closed ring.

    Points exactly on an edge may go either way (standard ray-cast caveat);
    the engine's PIP layer documents this. Ring is (k,2), first == last.
    """
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    cond = (y1 > py) != (y2 > py)
    denom = np.where(y2 - y1 == 0.0, 1.0, y2 - y1)
    xint = x1 + (py - y1) * (x2 - x1) / denom
    crossings = (cond & (px < xint)).sum(axis=1)
    return (crossings % 2).astype(bool)
