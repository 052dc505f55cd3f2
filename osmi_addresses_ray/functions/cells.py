"""Hierarchical spatial cell index (H3-res8-style, hand-rolled).

The flagship nearest-street join (SURVEY.md §2.4 J2) shuffles addresses and
replicated streets on a cell id. Cells are ~0.01° latitude bands split into
longitude bins whose count shrinks with cos(latitude) — near-equal-area, and
the polar collapse (the "S2 fallback" role) keeps the 1/cos(lat) longitude
tolerance from exploding replication at high latitudes: a polar band has few,
very wide bins.

Contract (property-tested): for any point p and padded bbox test
``is_point_near_bbox(bbox, p, tol)`` (GeometryHelper.hpp:127-152), if the test
passes then ``cell_of(p)`` ∈ ``cells_of_bbox(bbox, tol)``. Street geometries
are therefore replicated to ``cells_of_bbox``, addresses hashed to their own
single cell, and each address is matched in exactly one group — no duplicate
output rows, no neighbor-ring probe at match time.
"""

from __future__ import annotations

import numpy as np

# Latitude band height in degrees. Sized at 4×MAXDIST: the street-side
# replication pad is MAXDIST on every side, so a short street covers
# ((len + 2·MAXDIST)/CELL_DEG + 1)² ≈ 2–4 cells at 0.04 versus ~9 at 0.01
# (measured replication 9.5× → ~2.5×). Bigger cells = fewer replicas but
# fatter match groups; 0.04 balances the two for the J2 co-group.
CELL_DEG = 0.04
N_BANDS = int(np.ceil(180.0 / CELL_DEG))
# Longitude-pad safety: the bbox test scales tolerance by 1/cos(lat_point),
# where lat_point may sit anywhere in a band (± tol outside it); padding uses
# the most permissive cos in [band ± tol] plus this factor for float32 slack.
_PAD_SAFETY = 1.001


def _nlon(band: np.ndarray | int) -> np.ndarray | int:
    """Number of longitude bins for a latitude band (≥1, polar collapse)."""
    center = (np.asarray(band, dtype=np.float64) + 0.5) * CELL_DEG - 90.0
    n = np.floor(360.0 * np.maximum(np.cos(np.deg2rad(center)), 0.0) / CELL_DEG)
    return np.maximum(n, 1.0).astype(np.int64)


def cell_of(lon, lat):
    """Vectorized int64 cell id: (lat_band << 20) | lon_bin."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    band = np.clip(np.floor((lat + 90.0) / CELL_DEG), 0, N_BANDS - 1).astype(np.int64)
    nlon = _nlon(band)
    # wrap lon into [-180, 180) then bin
    lon_w = np.mod(lon + 180.0, 360.0)
    lon_bin = np.clip(np.floor(lon_w / 360.0 * nlon), 0, nlon - 1).astype(np.int64)
    return (band << 20) | lon_bin


def cells_of_bbox(s: float, n: float, w: float, e: float, tol: float) -> np.ndarray:
    """All cell ids a point passing ``is_point_near_bbox(bbox, p, tol)`` can be in.

    Latitude pad = tol; longitude pad per band = tol / min cos over the band's
    reachable latitudes, × a small safety factor. Bands touching |lat| ≥ 90-ε
    or where the pad covers the full circle collapse to every bin in the band.
    """
    lo_band = int(np.clip(np.floor((s - tol + 90.0) / CELL_DEG), 0, N_BANDS - 1))
    hi_band = int(np.clip(np.floor((n + tol + 90.0) / CELL_DEG), 0, N_BANDS - 1))
    out: list[np.ndarray] = []
    for band in range(lo_band, hi_band + 1):
        band_lo = band * CELL_DEG - 90.0
        band_hi = band_lo + CELL_DEG
        # most permissive |lat| for 1/cos scaling within this band (± nothing:
        # a point IN this band has lat in [band_lo, band_hi])
        max_abs_lat = min(max(abs(band_lo), abs(band_hi)), 89.999)
        lon_pad = tol / max(np.cos(np.deg2rad(max_abs_lat)), 1e-6) * _PAD_SAFETY
        nlon = int(_nlon(band))
        if lon_pad * 2.0 + (e - w) >= 360.0 or nlon <= 2:
            bins = np.arange(nlon, dtype=np.int64)
        else:
            wlo = np.mod(w - lon_pad + 180.0, 360.0)
            ehi = np.mod(e + lon_pad + 180.0, 360.0)
            blo = int(np.floor(wlo / 360.0 * nlon))
            bhi = int(np.floor(ehi / 360.0 * nlon))
            blo = min(blo, nlon - 1)
            bhi = min(bhi, nlon - 1)
            if blo <= bhi and (w - lon_pad + 180.0) >= 0 and (e + lon_pad + 180.0) < 360.0:
                bins = np.arange(blo, bhi + 1, dtype=np.int64)
            else:  # antimeridian wrap
                bins = np.concatenate(
                    [np.arange(0, bhi + 1, dtype=np.int64), np.arange(blo, nlon, dtype=np.int64)]
                )
                bins = np.unique(bins)
        out.append((np.int64(band) << 20) | bins)
    return np.concatenate(out) if out else np.empty(0, dtype=np.int64)
