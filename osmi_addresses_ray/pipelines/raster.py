"""Raster ↔ vector operators (north_rule: "raster↔vector").

Three Ray-Data-first operators over point/polygon layers:

- ``rasterize_points`` — vector → raster: points binned into a regular grid.
  Per-batch partial 2-D histograms (np.unique on composite cell keys) BEFORE
  the exchange, then one tile-keyed partitioned_map sums partials — the
  all-to-all moves one row per (cell × batch), never one per point. Output is
  a SPARSE raster: one row per non-empty cell, tiled so any downstream
  consumer can read a tile range without touching the rest.
- ``zonal_stats`` — raster-style aggregate over vector zones: point-in-
  polygon containment (the cell co-group join from ``stages/contains``)
  followed by a per-zone count — the classic zonal-statistics shape.
- ``polygonize`` — raster → vector: 4-connected components over the sparse
  cell set. Per-tile local labeling (vectorized union-find over cell arrays)
  + a driver-side merge of the tile-boundary adjacency graph (label pairs
  only — O(perimeter), not O(cells)) + a broadcast relabel pass. Components
  are emitted as per-cell memberships plus per-component envelope polygons
  (cell-union outlines are intentionally simplified to envelopes; the
  membership rows carry the exact cell set).

All determinism: component ids are the minimum linear cell index of the
component, so output is partitioning-invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TILE = 256  # cells per tile side
_BIAS = np.int64(1 << 30)  # shifts cell indices non-negative before packing
_MULT = np.int64(1 << 31)


def lin_index(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """Injective int64 key for a cell; valid for |ix|,|iy| < 2^30 (biased
    pack — a plain ix<<32|iy collides for negative iy, and a 2^31 bias with
    a 2^32 multiplier overflows int64). Also the canonical component id
    (minimum over a component's cells)."""
    return (np.asarray(ix, np.int64) + _BIAS) * _MULT + (
        np.asarray(iy, np.int64) + _BIAS
    )


def _unpack(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    ix = (key >> np.int64(31)) - _BIAS
    iy = (key & np.int64((1 << 31) - 1)) - _BIAS
    return ix.astype(np.int64), iy.astype(np.int64)


def _cells_of(ds, x_col, y_col, x0, y0, res):
    def f(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False)
        y = t[y_col].to_numpy(zero_copy_only=False)
        ix = np.floor((x - x0) / res).astype(np.int64)
        iy = np.floor((y - y0) / res).astype(np.int64)
        # partial histogram inside the batch: one row per distinct cell
        uniq, counts = np.unique(lin_index(ix, iy), return_counts=True)
        uix, uiy = _unpack(uniq)
        return pa.table(
            {
                # floor division keeps tiles consistent for negative indices
                "tile_x": pa.array(uix // TILE),
                "tile_y": pa.array(uiy // TILE),
                "ix": pa.array(uix),
                "iy": pa.array(uiy),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def rasterize_points(ds, *, x_col="lon", y_col="lat", x0=0.0, y0=0.0, res=0.001,
                     num_parts: int = 8):
    """Points → sparse raster Dataset (tile_x, tile_y, ix, iy, n)."""
    from ..ops import partitioned_map

    partials = _cells_of(ds, x_col, y_col, x0, y0, res)

    def reduce_tile(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby(["tile_x", "tile_y", "ix", "iy"], as_index=False)[
            "n"
        ].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    return partitioned_map(partials, ["tile_x", "tile_y"], num_parts, reduce_tile)


def zonal_stats(points_ds, polys_ds, *, num_parts: int = 8):
    """Per-polygon point counts: contains-join → groupby zone."""
    from ..stages.contains import contains_join

    pip = contains_join(points_ds, polys_ds, num_parts=num_parts)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["poly_id"], use_threads=False).aggregate([("point_id", "count")])
        return g.rename_columns(["poly_id", "n_points"])

    from ray.data.aggregate import Sum

    return (
        pip.map_batches(partial, batch_format="pyarrow")
        .groupby("poly_id")
        .aggregate(Sum("n_points", alias_name="n_points"))
    )


# --- raster → vector ---------------------------------------------------------

def _label_tile(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    """4-connected component labels within one cell set; label = min linear
    index of the component (vectorized union-find via iterated min-pooling)."""
    order = np.lexsort((iy, ix))
    ix, iy = ix[order], iy[order]
    key = lin_index(ix, iy)  # ascending after the lexsort (biased pack)
    n = len(ix)
    label = np.arange(n, dtype=np.int64)
    # neighbor index arrays (right and down suffice for undirected merging);
    # sorted key → one searchsorted per direction, no per-cell Python
    nbr = np.full((n, 2), -1, dtype=np.int64)
    for j, (dx, dy) in enumerate(((1, 0), (0, 1))):
        nk = lin_index(ix + dx, iy + dy)
        idx = np.searchsorted(key, nk).clip(0, max(n - 1, 0))
        hit = key[idx] == nk
        nbr[hit, j] = idx[hit]
    # iterate label min-exchange until fixpoint (diameter-bounded)
    while True:
        new = label.copy()
        for j in (0, 1):
            m = nbr[:, j] >= 0
            tgt = nbr[m, j]
            np.minimum.at(new, tgt, label[m])
            np.minimum.at(new, np.flatnonzero(m), label[tgt])
        # pointer jumping
        new = new[new]
        if np.array_equal(new, label):
            break
        label = new
    # back to original row order, as min LINEAR CELL INDEX of the component
    lin = key  # unique per cell
    comp_min = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(comp_min, label, lin)
    out = np.empty(n, dtype=np.int64)
    out[order] = comp_min[label]
    return out


def polygonize(raster_ds, *, threshold: int = 1, x0=0.0, y0=0.0, res=0.001,
               num_parts: int = 8):
    """Sparse raster → (cells_df, components_df).

    cells_df: (ix, iy, comp) membership with GLOBAL component ids;
    components_df: (comp, n_cells, geom_type, geom_wkt envelope polygon).
    """
    import ray

    from ..ops import partitioned_map

    kept = raster_ds.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["n"], threshold)),
        batch_format="pyarrow",
    )

    def tile_label(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out = []
        for (_tx, _ty), g in df.groupby(["tile_x", "tile_y"], sort=False):
            ix = g["ix"].to_numpy()
            iy = g["iy"].to_numpy()
            comp = _label_tile(ix, iy)
            sub = pd.DataFrame({"ix": ix, "iy": iy, "comp": comp})
            out.append(sub)
        res_df = pd.concat(out) if out else pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("ix", "iy", "comp")}
        )
        return pa.Table.from_pandas(res_df, preserve_index=False)

    cells = partitioned_map(kept, ["tile_x", "tile_y"], num_parts, tile_label).materialize()

    # boundary adjacency: labels of cells on tile edges + their right/down
    # neighbors in OTHER tiles; the pair list is O(boundary), driver-merged
    def boundary_pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        edge = df[
            ((df["ix"] + 1) % TILE == 0) | ((df["iy"] + 1) % TILE == 0)
            | (df["ix"] % TILE == 0) | (df["iy"] % TILE == 0)
        ]
        return pa.Table.from_pandas(edge, preserve_index=False)

    edges = cells.map_batches(boundary_pairs, batch_format="pyarrow").to_pandas()
    # driver union-find over boundary labels
    parent: dict[int, int] = {}

    def find(a: int) -> int:
        while parent.get(a, a) != a:
            parent[a] = parent.get(parent[a], parent[a])
            a = parent[a]
        return a

    def union(a: int, b: int):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    if len(edges):
        pos = {
            (int(r.ix), int(r.iy)): int(r.comp) for r in edges.itertuples()
        }
        for (ix, iy), c in pos.items():
            for dx, dy in ((1, 0), (0, 1)):
                nc = pos.get((ix + dx, iy + dy))
                if nc is not None:
                    union(c, nc)
    remap = {c: find(c) for c in set(parent)}
    remap_ref = ray.put(remap)

    def relabel(t: pa.Table) -> pa.Table:
        # int-exact mapping via sorted key arrays (pandas .map round-trips
        # through float64 and corrupts ids ≥ 2^53)
        m = ray.get(remap_ref)
        comp = t["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
        if m:
            keys = np.array(sorted(m), dtype=np.int64)
            vals = np.array([m[k] for k in keys], dtype=np.int64)
            pos = np.searchsorted(keys, comp).clip(0, len(keys) - 1)
            hit = keys[pos] == comp
            comp = comp.copy()
            comp[hit] = vals[pos[hit]]
        return t.set_column(t.column_names.index("comp"), "comp", pa.array(comp))

    cells_final = cells.map_batches(relabel, batch_format="pyarrow")

    def comp_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("comp", as_index=False).agg(
            n_cells=("ix", "size"), min_ix=("ix", "min"), max_ix=("ix", "max"),
            min_iy=("iy", "min"), max_iy=("iy", "max"),
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def comp_reduce(t: pa.Table) -> pa.Table:
        df = t.to_pandas().groupby("comp", as_index=False).agg(
            n_cells=("n_cells", "sum"), min_ix=("min_ix", "min"),
            max_ix=("max_ix", "max"), min_iy=("min_iy", "min"),
            max_iy=("max_iy", "max"),
        )
        wkts = []
        for r in df.itertuples():
            x1 = x0 + r.min_ix * res
            x2 = x0 + (r.max_ix + 1) * res
            y1 = y0 + r.min_iy * res
            y2 = y0 + (r.max_iy + 1) * res
            wkts.append(
                f"POLYGON (({x1!r} {y1!r}, {x2!r} {y1!r}, {x2!r} {y2!r}, "
                f"{x1!r} {y2!r}, {x1!r} {y1!r}))"
            )
        df["geom_type"] = "POLYGON"
        df["geom_wkt"] = wkts
        return pa.Table.from_pandas(
            df[["comp", "n_cells", "geom_type", "geom_wkt"]], preserve_index=False
        )

    from ..ops import partitioned_map as pmap

    comps = pmap(
        cells_final.map_batches(comp_partial, batch_format="pyarrow"),
        ["comp"], num_parts, comp_reduce,
    )
    return cells_final, comps


def tile_pyramid(raster_ds, *, levels: int = 3):
    """Zoom-pyramid rollup of a sparse raster (the map-tile aggregation the
    OSM Inspector serves its layers through): level 0 is the base grid, each
    coarser level floor-halves the cell indices and sums counts.

    Per level: one per-batch partial histogram over the parent cells + a
    small (ix, iy)-keyed exchange (``grouped_agg``) — each level's row count
    is ≤ 1/4 the previous, so the whole pyramid costs ~4/3 of one base
    pass. Returns a pandas frame (zoom, ix, iy, n) — callers at planetary
    scale keep the per-level Datasets instead (write_parquet per zoom).
    """
    from .relational import grouped_agg

    def select_cells(t: pa.Table) -> pa.Table:
        return pa.table({"ix": t["ix"], "iy": t["iy"], "n": t["n"]})

    # each level is consumed twice (emitted + rolled up) and is SMALL
    # (already cell-aggregated), so materialize to avoid re-executing the
    # full rasterize lineage once per zoom
    level = raster_ds.map_batches(select_cells, batch_format="pyarrow").materialize()
    frames = []
    for z in range(levels):
        df = level.to_pandas().sort_values(["ix", "iy"]).reset_index(drop=True)
        df.insert(0, "zoom", np.int64(z))
        frames.append(df)
        if z + 1 < levels:

            def parent_partial(t: pa.Table) -> pa.Table:
                ix = t["ix"].to_numpy(zero_copy_only=False) // 2
                iy = t["iy"].to_numpy(zero_copy_only=False) // 2
                return (
                    pa.table(
                        {
                            "ix": pa.array(ix, pa.int64()),
                            "iy": pa.array(iy, pa.int64()),
                            "n": t["n"],
                        }
                    )
                    .group_by(["ix", "iy"], use_threads=False)
                    .aggregate([("n", "sum")])
                    .rename_columns(["ix", "iy", "n"])
                )

            level = grouped_agg(
                level.map_batches(parent_partial, batch_format="pyarrow"),
                ["ix", "iy"],
                {"n": ("n", "sum")},
            ).materialize()
    out = pd.concat(frames, ignore_index=True)
    for c in ("zoom", "ix", "iy", "n"):
        out[c] = out[c].astype("int64")
    return out[["zoom", "ix", "iy", "n"]]


def kernel_smooth(raster_ds, *, num_parts: int = 8):
    """Sparse 3×3 box-sum over a cell histogram — the kernel-density /
    heat-map smoothing pass (hotspot surfaces, density shading). Every
    output cell carries the sum of the 3×3 neighborhood's counts;
    zero-count cells adjacent to mass APPEAR in the output (the stencil
    dilates the support by one ring), cells with no populated neighbor
    stay absent. Exact integers.

    Distributed shape: the sparse stencil via scatter — each populated
    cell replicates its count to its 9 neighborhood cells (a 9× map-side
    blow-up of the SPARSE histogram, not the corpus), each replica keyed
    by the DESTINATION cell's tile, then one tile-keyed exchange sums per
    cell — the halo exchange falls out of keying by destination instead
    of shipping border strips. Same shape at any kernel size k: k²×
    sparse blow-up, one exchange. Returns (ix, iy, sm) sorted.
    TRUE SQL oracle: histogram × 3×3 offset cross-join, regrouped."""
    from ..ops import partitioned_map

    def scatter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("tile_x", pa.int64()), ("tile_y", pa.int64()),
                 ("ix", pa.int64()), ("iy", pa.int64()), ("n", pa.int64())]
            ).empty_table()
        ix = t["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.array([-1, 0, 1], np.int64)
        dx = np.repeat(d, 3)
        dy = np.tile(d, 3)
        gx = (ix[:, None] + dx[None, :]).ravel()
        gy = (iy[:, None] + dy[None, :]).ravel()
        gn = np.repeat(n, 9)
        return pa.table(
            {
                "tile_x": pa.array(gx // TILE),
                "tile_y": pa.array(gy // TILE),
                "ix": pa.array(gx),
                "iy": pa.array(gy),
                "n": pa.array(gn),
            }
        )

    reps = raster_ds.map_batches(scatter, batch_format="pyarrow")

    def reduce_tile(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .groupby(["ix", "iy"], as_index=False)["n"]
            .sum()
            .rename(columns={"n": "sm"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = partitioned_map(reps, ["tile_x", "tile_y"], num_parts, reduce_tile).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("ix", "iy", "sm")}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["ix", "iy"]).reset_index(drop=True)
