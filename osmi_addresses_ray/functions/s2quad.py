"""Cube-sphere quadtree cell ids (S2-style) — the hierarchical companion to
the flat near-equal-area bands in ``functions/cells.py``.

The north rule names an "H3 resolution-8 cell encoding (S2 fallback for polar
tiles)"; ``cells.py`` provides the production join key (near-equal-area bands
with polar collapse). This module adds the true hierarchical scheme: project
each point onto the unit sphere, pick the dominant cube face, gnomonic (u, v)
on that face, S2's quadratic u→s reprojection (equalizes cell areas that pure
gnomonic projection distorts ~5.2×), quantize to a 2^level grid, and order
cells by a Hilbert curve per face.

Cell id layout: ``face·4^level + hilbert_d`` (3 + 2·level bits — level ≤ 30
fits int64). Because the Hilbert fold is prefix-stable
(``functions/geohash.hilbert_xy2d``), **``parent(cell) = cell >> 2``** — a
multi-level rollup never re-reads the points, it just shifts the ids.

Face/UV convention (S2's faceXYZtoUV, public): face = axis of max |component|
with ties broken z ≻ y ≻ x; per-face (u, v) as tabulated in ``_face_uv``.
All post-trig arithmetic (division, sqrt, multiply, floor) is exactly-rounded
IEEE, so the scalar oracle reproduces the engine bit-for-bit as long as both
evaluate sin/cos through the same primitive (see oracle_quad_cells).
"""

from __future__ import annotations

import numpy as np

from .geohash import hilbert_xy2d


def sphere_xyz(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Degrees → unit-sphere coordinates (float64)."""
    lam = np.deg2rad(np.asarray(lon, np.float64))
    phi = np.deg2rad(np.asarray(lat, np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def face_of(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Dominant-axis face id 0..5 (+x +y +z −x −y −z), ties z ≻ y ≻ x."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    return np.where(
        az >= np.maximum(ax, ay),
        np.where(z >= 0, 2, 5),
        np.where(ay > ax, np.where(y >= 0, 1, 4), np.where(x >= 0, 0, 3)),
    ).astype(np.int64)


def _face_uv(x, y, z, f):
    """Per-face gnomonic (u, v) ∈ [-1, 1] (S2 convention)."""
    conds = [f == 0, f == 1, f == 2, f == 3, f == 4, f == 5]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(conds, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.select(conds, [z / x, z / y, -y / z, y / x, -x / y, -x / z])
    return u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    """S2's quadratic area-equalizing reprojection: [-1, 1] → [0, 1]."""
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def quad_cell(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Vectorized int64 cell id at ``level`` (≤ 30)."""
    x, y, z = sphere_xyz(lon, lat)
    f = face_of(x, y, z)
    u, v = _face_uv(x, y, z, f)
    n = 1 << level
    i = np.clip(np.floor(_uv_to_st(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(_uv_to_st(v) * n), 0, n - 1).astype(np.int64)
    return (f << np.int64(2 * level)) + hilbert_xy2d(i, j, level)


def quad_parent(cell: np.ndarray, steps: int = 1) -> np.ndarray:
    """Ancestor ``steps`` levels up — a pure shift (Hilbert prefix property)."""
    return np.asarray(cell) >> np.int64(2 * steps)
