"""Flagship match stage (J2 street kNN / J4 place / J5 snap) — the engine's
second shuffle, an explicit cell-keyed co-group.

Reference flow (single-process, in-RAM multimaps):
ConnectionLinePreprocessor.hpp:50-168 probes ``name2highways_{area,nonarea}``
per address, bbox-prefilters candidates (GeometryHelper.hpp:127-152, int16
dequantized), ranks by exact planar-degree distance (:266-275, strict ``<`` —
first candidate in areas-then-nonareas way-id order wins ties), snaps the
address onto the winner in EPSG:3857 (:283-364), and probes the places
multimaps with the never-updated-best-distance quirk (:171-209: the LAST
candidate within MAXDIST wins, nody scanned before wayy).

Ray realization (SURVEY §2.4 J2):
- streets replicate to every cell overlapping their padded quantized bbox
  (``cells_of_bbox``; the cell-cover property test guarantees any address
  whose bbox prefilter would accept the street shares a cell with a replica);
- addresses (nodes ∪ closed-way centroids ∪ interpolated points) hash to
  exactly ONE cell → matched in exactly one group → no dedup of winners;
- one ``cogroup`` on cell id; within a partition everything is grouped by
  (cell, name) with numpy kernels;
- the places index is tiny → broadcast (ray.put + per-worker cache), probed
  inside the same stage;
- every address row carries its nodes_with_addresses payload through the
  shuffle, so the nwa layer falls out of this single pass (the reference
  fills road_id/place markers via out-params, SecondHandler.hpp:45-49).

Outputs are a tagged union (split after one materialization):
``__out`` 0 = nodes_with_addresses rows, 1 = connection lines, 2 = nearest
points, 3 = nearest road/area candidates (pre-dedup, with the deterministic
reference processing-order key ord0..ord3 for ST4's "first write wins").
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..constants import MAXDIST, STREETNAME_KEYS, tag_col
from ..functions.cells import cell_of, cells_of_bbox
from ..functions.geom import (
    is_point_near_bbox,
    merc2wgs,
    point_polyline_distance,
    snap_to_way,
    wgs2merc,
)
from ..ops import cogroup
from ..state.broadcast import get_cached

# --- schemas ----------------------------------------------------------------

STREET_SCHEMA = pa.schema(
    [
        pa.field("cell", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("way_id", pa.int64()),
        pa.field("is_area", pa.bool_()),
        pa.field("xs", pa.list_(pa.float64())),
        pa.field("ys", pa.list_(pa.float64())),
        pa.field("bbox_s", pa.float64()),
        pa.field("bbox_n", pa.float64()),
        pa.field("bbox_w", pa.float64()),
        pa.field("bbox_e", pa.float64()),
        pa.field("lastchange", pa.string()),
    ]
)

ADDR_SCHEMA = pa.schema(
    [
        pa.field("cell", pa.int64()),
        pa.field("kind", pa.string()),  # node | way | ip
        pa.field("obj_id", pa.int64()),
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
        pa.field("street", pa.string()),
        pa.field("place_name", pa.string()),
        pa.field("nwa_emit", pa.bool_()),
        pa.field("houseno", pa.string()),
        pa.field("postcode", pa.string()),
        pa.field("city", pa.string()),
        pa.field("country", pa.string()),
        pa.field("fulladdr", pa.string()),
        pa.field("place", pa.string()),
        pa.field("lastchange", pa.string()),
        pa.field("ord0", pa.int32()),
        pa.field("ord1", pa.int64()),
        pa.field("ord2", pa.int32()),
        pa.field("ord3", pa.int32()),
    ]
)

MATCH_OUT_SCHEMA = pa.schema(
    [
        pa.field("__out", pa.int8()),
        # nwa payload (0)
        pa.field("node_id", pa.int64()),
        pa.field("way_id", pa.int64()),
        pa.field("ip_id", pa.string()),
        pa.field("is_ip", pa.int32()),
        pa.field("street", pa.string()),
        pa.field("houseno", pa.string()),
        pa.field("postcode", pa.string()),
        pa.field("city", pa.string()),
        pa.field("country", pa.string()),
        pa.field("fulladdr", pa.string()),
        pa.field("place", pa.string()),
        pa.field("road_id", pa.string()),
        pa.field("nody_place_id", pa.string()),
        pa.field("wayy_place_id", pa.string()),
        pa.field("lastchange", pa.string()),
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
        # connection line (1): (lon,lat) → (lon2,lat2)
        pa.field("lon2", pa.float64()),
        pa.field("lat2", pa.float64()),
        # nearest road/area candidates (3)
        pa.field("name", pa.string()),
        pa.field("is_area", pa.bool_()),
        pa.field("xs", pa.list_(pa.float64())),
        pa.field("ys", pa.list_(pa.float64())),
        pa.field("ord0", pa.int32()),
        pa.field("ord1", pa.int64()),
        pa.field("ord2", pa.int32()),
        pa.field("ord3", pa.int32()),
    ]
)


# --- street replication ------------------------------------------------------

def streets_from_ways_geo(ways_geo):
    """Street index rows: one per (street name × covered cell).

    Name extraction = FirstHandler.hpp:116-126 (7 keys, per-way dedup);
    area/nonarea split = :72-80; replication cells from the padded quantized
    bbox. Each street's payload (coords) is duplicated per covered cell — the
    explicit trade replacing the reference's global in-RAM multimap.
    """

    def f(t: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(t[tag_col("highway")]), t["nonzero"])
        s = t.filter(mask)
        if s.num_rows == 0:
            return STREET_SCHEMA.empty_table()
        d = s.to_pydict()
        n = s.num_rows
        area = d[tag_col("area")]
        closed = d["is_closed"]
        name_cols = [d[tag_col(k)] for k in STREETNAME_KEYS]
        out = {k: [] for k in STREET_SCHEMA.names}
        for i in range(n):
            names = sorted({c[i] for c in name_cols if c[i] is not None})
            if not names:
                continue
            is_area = bool(area[i] in ("yes", "true") and closed[i])
            cells = cells_of_bbox(
                d["bbox_s"][i], d["bbox_n"][i], d["bbox_w"][i], d["bbox_e"][i], MAXDIST
            )
            for name in names:
                for c in cells.tolist():
                    out["cell"].append(c)
                    out["name"].append(name)
                    out["way_id"].append(d["way_id"][i])
                    out["is_area"].append(is_area)
                    out["xs"].append(d["xs"][i])
                    out["ys"].append(d["ys"][i])
                    out["bbox_s"].append(d["bbox_s"][i])
                    out["bbox_n"].append(d["bbox_n"][i])
                    out["bbox_w"].append(d["bbox_w"][i])
                    out["bbox_e"].append(d["bbox_e"][i])
                    out["lastchange"].append("")  # quirk: never assigned
                    # (FirstHandler.hpp:62-74 → NearestRoadsWriter lastchange "")
        return pa.Table.from_pydict(out, schema=STREET_SCHEMA)

    return ways_geo.map_batches(f, batch_format="pyarrow")


# --- address points ----------------------------------------------------------

_A7 = ["street", "housenumber", "postcode", "city", "country", "full", "place"]


def node_addresses(parsed_ds):
    """Nodes carrying any of the 7 addr keys (NodesWithAddressesWriter.hpp:54)."""

    def f(t: pa.Table) -> pa.Table:
        is_node = pc.equal(t["etype"], "node")
        any7 = None
        for k in _A7:
            v = pc.is_valid(t[tag_col(f"addr:{k}")])
            any7 = v if any7 is None else pc.or_(any7, v)
        s = t.filter(pc.and_(is_node, any7))
        n = s.num_rows
        lon = s["lon"].to_numpy(zero_copy_only=False)
        lat = s["lat"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(cell_of(lon, lat), pa.int64()),
                pa.array(["node"] * n, pa.string()),
                s["osm_id"].combine_chunks().cast(pa.int64()),
                s["lon"].combine_chunks(),
                s["lat"].combine_chunks(),
                s[tag_col("addr:street")].combine_chunks(),
                s[tag_col("addr:place")].combine_chunks(),
                pa.array(np.ones(n, bool)),
                s[tag_col("addr:housenumber")].combine_chunks(),
                s[tag_col("addr:postcode")].combine_chunks(),
                s[tag_col("addr:city")].combine_chunks(),
                s[tag_col("addr:country")].combine_chunks(),
                s[tag_col("addr:full")].combine_chunks(),
                s[tag_col("addr:place")].combine_chunks(),
                s["lastchange"].combine_chunks(),
                pa.array(np.zeros(n, np.int32)),
                s["osm_id"].combine_chunks().cast(pa.int64()),
                pa.array(np.zeros(n, np.int32)),
                pa.array(np.zeros(n, np.int32)),
            ],
            schema=ADDR_SCHEMA,
        )

    return parsed_ds.map_batches(f, batch_format="pyarrow")


def way_addresses(ways_geo):
    """Closed-way address points (centroid): match gate = closed & (street or
    place) (CLPP.hpp:85-111); nwa gate = building & (street|houseno)
    (NodesWithAddressesWriter.hpp:85-96). Pass-2 nonzero gate applies."""

    def f(t: pa.Table) -> pa.Table:
        street = t[tag_col("addr:street")]
        placet = t[tag_col("addr:place")]
        houseno = t[tag_col("addr:housenumber")]
        building = t[tag_col("building")]
        nwa_emit = pc.and_(
            pc.is_valid(building), pc.or_(pc.is_valid(street), pc.is_valid(houseno))
        )
        match_gate = pc.or_(pc.is_valid(street), pc.is_valid(placet))
        keep = pc.and_(
            pc.and_(t["is_closed"], t["nonzero"]), pc.or_(nwa_emit, match_gate)
        )
        s = t.filter(keep)
        n = s.num_rows
        lon = s["centroid_lon"].to_numpy(zero_copy_only=False)
        lat = s["centroid_lat"].to_numpy(zero_copy_only=False)
        ne = pc.and_(
            pc.is_valid(s[tag_col("building")]),
            pc.or_(
                pc.is_valid(s[tag_col("addr:street")]),
                pc.is_valid(s[tag_col("addr:housenumber")]),
            ),
        )
        return pa.Table.from_arrays(
            [
                pa.array(cell_of(lon, lat), pa.int64()),
                pa.array(["way"] * n, pa.string()),
                s["way_id"].combine_chunks(),
                s["centroid_lon"].combine_chunks(),
                s["centroid_lat"].combine_chunks(),
                s[tag_col("addr:street")].combine_chunks(),
                s[tag_col("addr:place")].combine_chunks(),
                ne.combine_chunks() if isinstance(ne, pa.ChunkedArray) else ne,
                s[tag_col("addr:housenumber")].combine_chunks(),
                s[tag_col("addr:postcode")].combine_chunks(),
                s[tag_col("addr:city")].combine_chunks(),
                s[tag_col("addr:country")].combine_chunks(),
                s[tag_col("addr:full")].combine_chunks(),
                s[tag_col("addr:place")].combine_chunks(),
                s["lastchange"].combine_chunks(),
                pa.array(np.ones(n, np.int32)),
                s["way_id"].combine_chunks(),
                pa.array(np.ones(n, np.int32)),
                pa.array(np.zeros(n, np.int32)),
            ],
            schema=ADDR_SCHEMA,
        )

    return ways_geo.map_batches(f, batch_format="pyarrow")


def ip_addresses(ip_points_ds):
    """Interpolated points (__out=1 of the interpolation stage) → ADDR rows.

    process_interpolated_node (CLPP.hpp:39-48): street probe only, no place
    probes; nwa fields come from the first endpoint (already resolved)."""

    def f(t: pa.Table) -> pa.Table:
        n = t.num_rows
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        return pa.Table.from_arrays(
            [
                pa.array(cell_of(lon, lat), pa.int64()),
                pa.array(["ip"] * n, pa.string()),
                pa.array(np.zeros(n, np.int64)),
                t["lon"].combine_chunks(),
                t["lat"].combine_chunks(),
                t["street"].combine_chunks(),
                pa.nulls(n, pa.string()),
                pa.array(np.ones(n, bool)),
                t["houseno"].combine_chunks(),
                t["postcode"].combine_chunks(),
                t["city"].combine_chunks(),
                t["country"].combine_chunks(),
                t["fulladdr"].combine_chunks(),
                t["place"].combine_chunks(),
                pa.nulls(n, pa.string()),
                t["ord0"].combine_chunks(),
                t["ord1"].combine_chunks(),
                t["ord2"].combine_chunks(),
                t["ord3"].combine_chunks(),
            ],
            schema=ADDR_SCHEMA,
        )

    return ip_points_ds.map_batches(f, batch_format="pyarrow")


# --- places broadcast index (ST2) -------------------------------------------

def build_places_index(parsed_ds, ways_geo) -> dict:
    """name → (nody list, wayy list), each entry (id, lon, lat), id-ordered.

    FirstHandler.hpp:24-36 (node places) and :87-97 (closed-way places via
    centroid). Small side → driver collect + broadcast (SURVEY ST2). Multimap
    insertion order == OSM file order == id order per provenance, which the
    J4 last-within-MAXDIST quirk depends on.
    """
    import pyarrow.compute as pcc

    places: dict[str, tuple[list, list]] = {}

    def nf(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.equal(t["etype"], "node"), pc.is_valid(t[tag_col("place")])),
            pc.is_valid(t[tag_col("name")]),
        )
        s = t.filter(keep)
        return s.select(["osm_id", "lon", "lat", tag_col("name")])

    for b in parsed_ds.map_batches(nf, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        d = b.to_pydict()
        for i in range(b.num_rows):
            places.setdefault(d[tag_col("name")][i], ([], []))[0].append(
                (d["osm_id"][i], d["lon"][i], d["lat"][i])
            )

    def wf(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t[tag_col("place")]), pc.is_valid(t[tag_col("name")])),
            pc.and_(t["is_closed"], t["nonzero"]),
        )
        s = t.filter(keep)
        return s.select(["way_id", "centroid_lon", "centroid_lat", tag_col("name")])

    for b in ways_geo.map_batches(wf, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        d = b.to_pydict()
        for i in range(b.num_rows):
            places.setdefault(d[tag_col("name")][i], ([], []))[1].append(
                (d["way_id"][i], d["centroid_lon"][i], d["centroid_lat"][i])
            )

    for name, (nody, wayy) in places.items():
        nody.sort()
        wayy.sort()
    return places


# --- the per-partition match kernel -----------------------------------------

def _match_partition(streets: pa.Table, addrs: pa.Table, places_ref) -> pa.Table:
    places = get_cached(places_ref) if places_ref is not None else {}

    out_rows: dict[str, list] = {f.name: [] for f in MATCH_OUT_SCHEMA}

    def emit(tag, **kw):
        for f in MATCH_OUT_SCHEMA:
            if f.name == "__out":
                out_rows["__out"].append(tag)
            else:
                out_rows[f.name].append(kw.get(f.name))

    # street index: (cell, name) → candidate arrays, areas first then
    # nonareas, way-id order within each (multimap scan order, CLPP:227-237)
    sidx: dict[tuple[int, str], list[int]] = {}
    sd = streets.to_pydict() if streets.num_rows else {k: [] for k in STREET_SCHEMA.names}
    order = sorted(
        range(len(sd["cell"])),
        key=lambda i: (sd["cell"][i], sd["name"][i], not sd["is_area"][i], sd["way_id"][i]),
    )
    for i in order:
        sidx.setdefault((sd["cell"][i], sd["name"][i]), []).append(i)

    ad = addrs.to_pydict() if addrs.num_rows else {k: [] for k in ADDR_SCHEMA.names}
    n_addr = len(ad["cell"])

    s_xs = sd["xs"]
    s_ys = sd["ys"]

    for i in range(n_addr):
        kind = ad["kind"][i]
        px, py = ad["lon"][i], ad["lat"][i]
        street_name = ad["street"][i]
        road_id = None
        nody_place_id = None
        wayy_place_id = None

        # --- J2: street match ---
        if street_name is not None:
            cands = sidx.get((ad["cell"][i], street_name), ())
            best_d = np.inf
            best_j = -1
            for j in cands:
                if not bool(
                    is_point_near_bbox(
                        sd["bbox_s"][j], sd["bbox_n"][j], sd["bbox_w"][j], sd["bbox_e"][j],
                        px, py, MAXDIST,
                    )
                ):
                    continue
                coords = np.column_stack(
                    (np.asarray(s_xs[j], np.float64), np.asarray(s_ys[j], np.float64))
                )
                d = point_polyline_distance(px, py, coords)
                if d < best_d:
                    best_d = d
                    best_j = j
            if best_j >= 0:
                j = best_j
                coords = np.column_stack(
                    (np.asarray(s_xs[j], np.float64), np.asarray(s_ys[j], np.float64))
                )
                # J5 snap in mercator (CLPP.hpp:149-154)
                mx, my = wgs2merc(np.array([px]), np.array([py]))
                wxs, wys = wgs2merc(coords[:, 0], coords[:, 1])
                sx, sy = snap_to_way(float(mx[0]), float(my[0]), np.column_stack((wxs, wys)))
                slon, slat = merc2wgs(np.array([sx]), np.array([sy]))
                slon, slat = float(slon[0]), float(slat[0])
                road_id = "1"
                emit(
                    1,
                    lon=px, lat=py, lon2=slon, lat2=slat,
                    node_id=ad["obj_id"][i] if kind == "node" else None,
                    way_id=ad["obj_id"][i] if kind == "way" else None,
                )
                emit(2, lon=slon, lat=slat, way_id=sd["way_id"][j])
                emit(
                    3,
                    way_id=sd["way_id"][j], name=street_name,
                    is_area=sd["is_area"][j], xs=s_xs[j], ys=s_ys[j],
                    lastchange="",
                    ord0=ad["ord0"][i], ord1=ad["ord1"][i],
                    ord2=ad["ord2"][i], ord3=ad["ord3"][i],
                )

        # --- J4: place probes (nodes: street name + place name; ways: place) ---
        probe_names = []
        if kind == "node":
            if street_name is not None and street_name in places:
                probe_names.append(street_name)
            pn = ad["place_name"][i]
            if pn is not None and pn in places:
                probe_names.append(pn)
        elif kind == "way":
            pn = ad["place_name"][i]
            if pn is not None and pn in places:
                probe_names.append(pn)
        for name in probe_names:
            nody, wayy = places[name]
            winner = None  # (lon, lat, is_nody)
            for _pid, plon, plat in nody:
                if np.hypot(px - plon, py - plat) < MAXDIST:
                    winner = (plon, plat, True)  # last-wins quirk (CLPP:186-195)
            for _pid, plon, plat in wayy:
                if np.hypot(px - plon, py - plat) < MAXDIST:
                    winner = (plon, plat, False)
            if winner is not None:
                plon, plat, is_nody = winner
                if is_nody:
                    nody_place_id = "1"
                else:
                    wayy_place_id = "1"
                emit(
                    1,
                    lon=px, lat=py, lon2=plon, lat2=plat,
                    node_id=0 if kind == "node" else None,
                    way_id=0 if kind == "way" else None,
                )

        # --- nwa row ---
        if ad["nwa_emit"][i]:
            if kind == "ip":
                emit(
                    0,
                    node_id=None, way_id=None, ip_id=None, is_ip=1,
                    street=ad["street"][i], houseno=ad["houseno"][i],
                    postcode=ad["postcode"][i], city=ad["city"][i],
                    country=ad["country"][i], fulladdr=ad["fulladdr"][i],
                    place=ad["place"][i], road_id=road_id,
                    nody_place_id=None, wayy_place_id=None,
                    lastchange=None, lon=px, lat=py,
                )
            else:
                emit(
                    0,
                    node_id=ad["obj_id"][i] if kind == "node" else None,
                    way_id=ad["obj_id"][i] if kind == "way" else None,
                    ip_id=None, is_ip=0,
                    street=ad["street"][i], houseno=ad["houseno"][i],
                    postcode=ad["postcode"][i], city=ad["city"][i],
                    country=ad["country"][i], fulladdr=ad["fulladdr"][i],
                    place=ad["place"][i], road_id=road_id,
                    nody_place_id=nody_place_id, wayy_place_id=wayy_place_id,
                    lastchange=ad["lastchange"][i], lon=px, lat=py,
                )

    return pa.Table.from_pydict(out_rows, schema=MATCH_OUT_SCHEMA)


def match_stage(streets_ds, addrs_ds, places: dict, *, num_parts: int = 32):
    """Co-group streets and addresses on cell id and run the match kernel."""
    places_ref = ray.put(places)

    def fn(streets_part: pa.Table, addrs_part: pa.Table) -> pa.Table:
        return _match_partition(streets_part, addrs_part, places_ref)

    return cogroup(
        [streets_ds, addrs_ds],
        [["cell"], ["cell"]],
        num_parts,
        fn,
        [STREET_SCHEMA, ADDR_SCHEMA],
    )
