"""Vectorized geohash cell encoding (tiling vocabulary alongside the engine's
lat/lon CELL_DEG grid — see SCALE.md "Tiling": the north-star names H3 res-8;
geohash gives the same groupby-shuffle key contract — prefix-nestable string
cells with neighbor locality — from pure integer bit math, with no icosahedral
tables to ship).

Spec (exact-integer form of the classic interval-halving geohash, evaluated
on the engine's libosmium-quantized 1e-7 int32 coordinates, so there is no
float boundary ambiguity at any precision):
  xi = ((lon7 + 180e7) * 2^ceil(5p/2)) // 360e7     (lon bit count)
  yi = ((lat7 +  90e7) * 2^floor(5p/2)) // 180e7    (lat bit count)
  interleave MSB-first starting with a lon bit; 5-bit groups index the
  standard base32 alphabet (no a/i/l/o).
Mathematically identical to binary interval halving of the real ranges
because the inputs are exact rationals over 1e7.
"""

from __future__ import annotations

import numpy as np

_B32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype=np.uint8)
_LON_SCALE = 3_600_000_000  # 360 * 1e7
_LAT_SCALE = 1_800_000_000


def geohash_encode(lon: np.ndarray, lat: np.ndarray, precision: int = 7) -> np.ndarray:
    """lon/lat degree arrays → geohash strings (vectorized, object array).

    Coordinates are first quantized to the engine's 1e-7 int32 grid (a
    no-op for already-parsed OSM points) so the cell math is exact integer.
    """
    assert 1 <= precision <= 12
    nbits = 5 * precision
    n_lon = (nbits + 1) // 2
    n_lat = nbits // 2

    lon7 = np.floor(np.abs(lon) * 1e7 + 0.5).astype(np.int64) * np.sign(lon).astype(np.int64)
    lat7 = np.floor(np.abs(lat) * 1e7 + 0.5).astype(np.int64) * np.sign(lat).astype(np.int64)
    # (coord + half-scale) * 2^bits stays well under 2^63 for precision <= 12,
    # so plain int64 is exact
    xi = np.clip(
        (lon7 + _LON_SCALE // 2) * (1 << n_lon) // _LON_SCALE, 0, (1 << n_lon) - 1
    ).astype(np.uint64)
    yi = np.clip(
        (lat7 + _LAT_SCALE // 2) * (1 << n_lat) // _LAT_SCALE, 0, (1 << n_lat) - 1
    ).astype(np.uint64)

    # interleave: MSB-first, lon first. Build the nbits-wide value by
    # shifting each source bit to its target slot (loop over BIT POSITIONS,
    # not rows — 5*precision iterations of O(n) vector ops).
    val = np.zeros(len(lon), dtype=np.uint64)
    for b in range(nbits):
        target = np.uint64(nbits - 1 - b)
        if b % 2 == 0:  # lon bit
            src = np.uint64(n_lon - 1 - b // 2)
            val |= ((xi >> src) & np.uint64(1)) << target
        else:
            src = np.uint64(n_lat - 1 - b // 2)
            val |= ((yi >> src) & np.uint64(1)) << target

    chars = np.empty((len(lon), precision), dtype=np.uint8)
    for g in range(precision):
        shift = np.uint64(5 * (precision - 1 - g))
        chars[:, g] = _B32[((val >> shift) & np.uint64(31)).astype(np.int64)]
    return np.char.decode(chars.view(f"S{precision}").ravel(), "ascii").astype(object)


def hilbert_d(lon: np.ndarray, lat: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert-curve distance of each point's 2^order × 2^order grid cell —
    the locality-preserving 1-D sort key (consecutive keys are adjacent
    cells, unlike the Z-ish geohash whose prefix jumps at quadrant seams),
    which is what makes range scans over a Hilbert-sorted layout touch
    contiguous tiles.

    Grid indexes come from the same exact-integer quantization as the
    geohash (no float boundary cases); the xy→d transform is the classic
    iterative quadrant fold (Wikipedia's xy2d), vectorized by looping over
    the ``order`` levels with whole-array ops.
    """
    nbits = order
    lon7 = np.floor(np.abs(lon) * 1e7 + 0.5).astype(np.int64) * np.sign(lon).astype(np.int64)
    lat7 = np.floor(np.abs(lat) * 1e7 + 0.5).astype(np.int64) * np.sign(lat).astype(np.int64)
    x = np.clip((lon7 + _LON_SCALE // 2) * (1 << nbits) // _LON_SCALE, 0, (1 << nbits) - 1)
    y = np.clip((lat7 + _LAT_SCALE // 2) * (1 << nbits) // _LAT_SCALE, 0, (1 << nbits) - 1)

    return hilbert_xy2d(x, y, nbits)


def hilbert_xy2d(x: np.ndarray, y: np.ndarray, nbits: int) -> np.ndarray:
    """Vectorized classic xy→d quadrant fold (top-down). Because digits are
    extracted high bit first, the curve index is PREFIX-STABLE across
    levels: ``xy2d(i >> k, j >> k, n - k) == xy2d(i, j, n) >> 2k`` — the
    property the quadtree cell ids' ``parent = cell >> 2`` relies on."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros(len(x), dtype=np.int64)
    s = 1 << (nbits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: the classic in-place fold
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d
