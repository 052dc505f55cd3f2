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

from ..functions.cells import cell_of, cells_of_bbox
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
    pd_ = points.to_pydict()
    pl = polys.to_pydict()
    px = np.asarray(pd_["lon"], dtype=np.float64)
    py = np.asarray(pd_["lat"], dtype=np.float64)
    pid = np.asarray(pd_["point_id"], dtype=np.int64)
    pcell = np.asarray(pd_["cell"], dtype=np.int64)
    out_pt, out_poly = [], []
    for i in range(len(pl["poly_id"])):
        # candidates: points in this replica's cell AND inside the poly bbox
        m = (
            (pcell == pl["cell"][i])
            & (py >= pl["bbox_s"][i])
            & (py <= pl["bbox_n"][i])
            & (px >= pl["bbox_w"][i])
            & (px <= pl["bbox_e"][i])
        )
        if not m.any():
            continue
        ring = np.column_stack(
            (np.asarray(pl["xs"][i], np.float64), np.asarray(pl["ys"][i], np.float64))
        )
        inside = points_in_ring(px[m], py[m], ring)
        hits = pid[m][inside]
        out_pt.extend(hits.tolist())
        out_poly.extend([pl["poly_id"][i]] * len(hits))
    return pa.table(
        {
            "point_id": pa.array(out_pt, pa.int64()),
            "poly_id": pa.array(out_poly, pa.int64()),
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
        d = t.to_pydict()
        out = {k: [] for k in PIP_POLY_SCHEMA.names}
        for i in range(t.num_rows):
            xs = np.asarray(d["xs"][i], np.float64)
            ys = np.asarray(d["ys"][i], np.float64)
            s, n, w, e = ys.min(), ys.max(), xs.min(), xs.max()
            for c in cells_of_bbox(s, n, w, e, 0.0).tolist():
                out["cell"].append(c)
                out["poly_id"].append(d["poly_id"][i])
                out["xs"].append(d["xs"][i])
                out["ys"].append(d["ys"][i])
                out["bbox_s"].append(s)
                out["bbox_n"].append(n)
                out["bbox_w"].append(w)
                out["bbox_e"].append(e)
        return pa.Table.from_pydict(out, schema=PIP_POLY_SCHEMA)

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
