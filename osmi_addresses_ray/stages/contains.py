"""Point-in-polygon containment join — the north-star PIP capability.

``contains_join(points_ds, polys_ds)``: same cell-co-group skeleton as the
street match (SURVEY §4.3): polygons replicate to every cell overlapping
their bbox, points hash to their own cell, each partition ray-casts its
points against its candidate rings (vectorized numpy per ring).

Engine use: the ``entrance_in_building`` check layer (entrances ⨯ closed
building ways). Points exactly on an edge follow ray-cast parity (documented
caveat in functions.geom.points_in_ring).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.cells import cell_of
from ..functions.geom import points_in_ring
from ..ops import cogroup

PIP_POINT_SCHEMA = pa.schema(
    [
        pa.field("cell", pa.int64()),
        pa.field("point_id", pa.int64()),
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
    ]
)

PIP_POLY_SCHEMA = pa.schema(
    [
        pa.field("cell", pa.int64()),
        pa.field("poly_id", pa.int64()),
        pa.field("xs", pa.list_(pa.float64())),
        pa.field("ys", pa.list_(pa.float64())),
        pa.field("bbox_s", pa.float64()),
        pa.field("bbox_n", pa.float64()),
        pa.field("bbox_w", pa.float64()),
        pa.field("bbox_e", pa.float64()),
    ]
)

PIP_OUT_SCHEMA = pa.schema(
    [pa.field("point_id", pa.int64()), pa.field("poly_id", pa.int64())]
)


def _pip_partition(polys: pa.Table, points: pa.Table) -> pa.Table:
    if polys.num_rows == 0 or points.num_rows == 0:
        return PIP_OUT_SCHEMA.empty_table()
    px = points["lon"].to_numpy(zero_copy_only=False)
    py = points["lat"].to_numpy(zero_copy_only=False)
    pid = points["point_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pcell = points["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    # sort points by cell once: each polygon replica probes only ITS cell's
    # slice (searchsorted) instead of scanning the whole partition
    porder = np.argsort(pcell, kind="stable")
    px, py, pid, pcell = px[porder], py[porder], pid[porder], pcell[porder]

    pl_cell = polys["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    pl_id = polys["poly_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bs = polys["bbox_s"].to_numpy(zero_copy_only=False)
    bn = polys["bbox_n"].to_numpy(zero_copy_only=False)
    bw = polys["bbox_w"].to_numpy(zero_copy_only=False)
    be = polys["bbox_e"].to_numpy(zero_copy_only=False)
    xs_col = polys["xs"].combine_chunks() if isinstance(polys["xs"], pa.ChunkedArray) else polys["xs"]
    ys_col = polys["ys"].combine_chunks() if isinstance(polys["ys"], pa.ChunkedArray) else polys["ys"]
    offs = np.asarray(xs_col.offsets, np.int64)
    offs = offs - offs[0]
    fx = np.asarray(xs_col.flatten(), np.float64)
    fy = np.asarray(ys_col.flatten(), np.float64)

    lo = np.searchsorted(pcell, pl_cell, side="left")
    hi = np.searchsorted(pcell, pl_cell, side="right")
    out_pt, out_poly = [], []
    for i in np.flatnonzero(hi > lo):
        sl = slice(lo[i], hi[i])
        m = (py[sl] >= bs[i]) & (py[sl] <= bn[i]) & (px[sl] >= bw[i]) & (px[sl] <= be[i])
        if not m.any():
            continue
        ring = np.column_stack((fx[offs[i] : offs[i + 1]], fy[offs[i] : offs[i + 1]]))
        cx = px[sl][m]
        cy = py[sl][m]
        inside = points_in_ring(cx, cy, ring)
        hits = pid[sl][m][inside]
        out_pt.append(hits)
        out_poly.append(np.full(len(hits), pl_id[i], np.int64))
    if not out_pt:
        return PIP_OUT_SCHEMA.empty_table()
    return pa.table(
        {
            "point_id": pa.array(np.concatenate(out_pt), pa.int64()),
            "poly_id": pa.array(np.concatenate(out_poly), pa.int64()),
        }
    )


def contains_join(points_ds, polys_ds, *, num_parts: int = 16):
    """points (point_id, lon, lat) ⨝-contains polys (poly_id, xs, ys closed
    ring) → (point_id, poly_id) pairs. Polygons replicate to covered cells
    (dedup not needed: a point is tested only in its OWN cell's replica)."""

    def prep_points(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(cell_of(lon, lat), pa.int64()),
                t["point_id"].combine_chunks(),
                t["lon"].combine_chunks(),
                t["lat"].combine_chunks(),
            ],
            schema=PIP_POINT_SCHEMA,
        )

    def prep_polys(t: pa.Table) -> pa.Table:
        n_rows = t.num_rows
        if n_rows == 0:
            return PIP_POLY_SCHEMA.empty_table()
        xs = t["xs"].combine_chunks() if isinstance(t["xs"], pa.ChunkedArray) else t["xs"]
        ys = t["ys"].combine_chunks() if isinstance(t["ys"], pa.ChunkedArray) else t["ys"]
        offs = np.asarray(xs.offsets, np.int64)
        offs = offs - offs[0]
        fx = np.asarray(xs.flatten(), np.float64)
        fy = np.asarray(ys.flatten(), np.float64)
        starts = offs[:-1]
        bbox_s = np.minimum.reduceat(fy, starts)
        bbox_n = np.maximum.reduceat(fy, starts)
        bbox_w = np.minimum.reduceat(fx, starts)
        bbox_e = np.maximum.reduceat(fx, starts)
        from ..functions.cells import cells_of_bboxes

        cells_flat, cell_counts = cells_of_bboxes(bbox_s, bbox_n, bbox_w, bbox_e, 0.0)
        ri = np.repeat(np.arange(n_rows), cell_counts)
        take = pa.array(ri, pa.int64())
        payload = t.select(["poly_id", "xs", "ys"]).take(take)
        return pa.Table.from_arrays(
            [
                pa.array(cells_flat, pa.int64()),
                payload["poly_id"],
                payload["xs"],
                payload["ys"],
                pa.array(bbox_s[ri]),
                pa.array(bbox_n[ri]),
                pa.array(bbox_w[ri]),
                pa.array(bbox_e[ri]),
            ],
            schema=PIP_POLY_SCHEMA,
        )

    pts = points_ds.map_batches(prep_points, batch_format="pyarrow")
    pls = polys_ds.map_batches(prep_polys, batch_format="pyarrow")
    return cogroup(
        [pls, pts],
        [["cell"], ["cell"]],
        num_parts,
        _pip_partition,
        [PIP_POLY_SCHEMA, PIP_POINT_SCHEMA],
    )


def entrances_in_buildings(parsed_ds, ways_geo, *, num_parts: int = 16):
    """Check layer: entrance nodes contained in closed building rings."""
    import pyarrow.compute as pc

    from ..constants import tag_col

    def pts(t: pa.Table) -> pa.Table:
        is_node = pc.equal(t["etype"], "node")
        ent = pc.or_(
            pc.is_valid(t[tag_col("entrance")]),
            pc.fill_null(pc.equal(t[tag_col("building")], "entrance"), False),
        )
        s = t.filter(pc.and_(is_node, ent))
        return pa.table(
            {
                "point_id": s["osm_id"].combine_chunks(),
                "lon": s["lon"].combine_chunks(),
                "lat": s["lat"].combine_chunks(),
            }
        )

    def polys(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t[tag_col("building")]), t["is_closed"]), t["nonzero"]
        )
        s = t.filter(keep)
        return pa.table(
            {
                "poly_id": s["way_id"].combine_chunks(),
                "xs": s["xs"].combine_chunks(),
                "ys": s["ys"].combine_chunks(),
            }
        )

    return contains_join(
        parsed_ds.map_batches(pts, batch_format="pyarrow"),
        ways_geo.map_batches(polys, batch_format="pyarrow"),
        num_parts=num_parts,
    )
