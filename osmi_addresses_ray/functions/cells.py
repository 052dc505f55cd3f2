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


def cells_of_bboxes(
    s: np.ndarray, n: np.ndarray, w: np.ndarray, e: np.ndarray, tol: float
) -> tuple[np.ndarray, np.ndarray]:
    """Batch ``cells_of_bbox``: → (cells_flat, per_row_counts).

    ``cells_flat`` is row-major (all of row 0's cells, then row 1's, …), each
    row's cells in the same (band asc, bin asc) order the scalar function
    emits. Pure numpy — no per-row Python; the scalar loop measured ~40 CPU·s
    per bench leg inside street replication.
    """
    s = np.asarray(s, np.float64)
    n = np.asarray(n, np.float64)
    w = np.asarray(w, np.float64)
    e = np.asarray(e, np.float64)
    nrows = len(s)
    if nrows == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    lo_b = np.clip(np.floor((s - tol + 90.0) / CELL_DEG), 0, N_BANDS - 1).astype(np.int64)
    hi_b = np.clip(np.floor((n + tol + 90.0) / CELL_DEG), 0, N_BANDS - 1).astype(np.int64)
    nb = hi_b - lo_b + 1
    # (row, band) pairs, row-major band-ascending
    rb_row = np.repeat(np.arange(nrows), nb)
    ofs = np.concatenate(([0], np.cumsum(nb)))
    band = lo_b[rb_row] + (np.arange(len(rb_row)) - np.repeat(ofs[:-1], nb))
    band_lo = band * CELL_DEG - 90.0
    band_hi = band_lo + CELL_DEG
    max_abs = np.minimum(np.maximum(np.abs(band_lo), np.abs(band_hi)), 89.999)
    lon_pad = tol / np.maximum(np.cos(np.deg2rad(max_abs)), 1e-6) * _PAD_SAFETY
    nlon = _nlon(band)
    w_ = w[rb_row]
    e_ = e[rb_row]
    full = (lon_pad * 2.0 + (e_ - w_) >= 360.0) | (nlon <= 2)
    wlo = np.mod(w_ - lon_pad + 180.0, 360.0)
    ehi = np.mod(e_ + lon_pad + 180.0, 360.0)
    blo = np.minimum(np.floor(wlo / 360.0 * nlon).astype(np.int64), nlon - 1)
    bhi = np.minimum(np.floor(ehi / 360.0 * nlon).astype(np.int64), nlon - 1)
    nowrap = (~full) & (blo <= bhi) & ((w_ - lon_pad + 180.0) >= 0) & (
        (e_ + lon_pad + 180.0) < 360.0
    )
    wrap = ~full & ~nowrap
    # wrapped [0..bhi] ∪ [blo..nlon-1] covers every bin when blo <= bhi+1
    wrap_full = wrap & (blo <= bhi + 1)
    wrap_dis = wrap & ~wrap_full
    isfull = full | wrap_full
    # ≤2 contiguous bin ranges per (row, band); range 1 always exists
    r1_start = np.where(isfull, 0, np.where(nowrap, blo, 0))
    r1_cnt = np.where(isfull, nlon, np.where(nowrap, bhi - blo + 1, bhi + 1))
    # range 2 only for the disjoint wrap case; starts above range 1 → bin order stays ascending
    rec_rb = np.concatenate((np.arange(len(band)), np.flatnonzero(wrap_dis)))
    rec_start = np.concatenate((r1_start, blo[wrap_dis]))
    rec_cnt = np.concatenate((r1_cnt, (nlon - blo)[wrap_dis]))
    rec_rank = np.concatenate(
        (np.zeros(len(band), np.int8), np.ones(int(wrap_dis.sum()), np.int8))
    )
    ro = np.lexsort((rec_rank, rec_rb))
    rec_rb = rec_rb[ro]
    rec_start = rec_start[ro]
    rec_cnt = rec_cnt[ro]
    tot = int(rec_cnt.sum())
    rep = np.repeat(np.arange(len(rec_cnt)), rec_cnt)
    rofs = np.concatenate(([0], np.cumsum(rec_cnt)))
    bins = rec_start[rep] + (np.arange(tot) - np.repeat(rofs[:-1], rec_cnt))
    cells_flat = (band[rec_rb[rep]] << 20) | bins
    counts = np.bincount(rb_row[rec_rb[rep]], minlength=nrows).astype(np.int64)
    return cells_flat, counts


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
