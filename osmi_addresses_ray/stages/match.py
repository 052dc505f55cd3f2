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
    wgs2merc,
)
from ..ops import cogroup
from ..state.broadcast import get_cached

# Flat-sweep chunk size (pair-rows). Keeps each kernel's scratch ~tens of MB
# so concurrent partition tasks stay cache-friendly instead of contending for
# DRAM bandwidth (measured below 0.8 scaling at 8M on one box).
import os as _os

SWEEP_CHUNK = int(_os.environ.get("GRAFT_SWEEP_CHUNK", "8000000"))

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
        n = s.num_rows
        if n == 0:
            return STREET_SCHEMA.empty_table()

        # (row, name) pairs: 7 name keys, per-row dedup + ascending name order
        # (== the reference's sorted std::set iteration)
        ri_parts, nm_parts = [], []
        for k in STREETNAME_KEYS:
            col = s[tag_col(k)]
            valid = np.flatnonzero(pc.is_valid(col).to_numpy(zero_copy_only=False))
            if len(valid):
                ri_parts.append(valid)
                nm_parts.append(col.to_numpy(zero_copy_only=False)[valid])
        if not ri_parts:
            return STREET_SCHEMA.empty_table()
        ri = np.concatenate(ri_parts)
        nm = np.concatenate(nm_parts)
        order = np.lexsort((nm, ri))  # row-major, names ascending within row
        ri, nm = ri[order], nm[order]
        keep = np.concatenate(([True], (ri[1:] != ri[:-1]) | (nm[1:] != nm[:-1])))
        ri, nm = ri[keep], nm[keep]

        # covered cells per row (padded quantized bbox), batch kernel
        from ..functions.cells import cells_of_bboxes

        bs = s["bbox_s"].to_numpy(zero_copy_only=False)
        bn = s["bbox_n"].to_numpy(zero_copy_only=False)
        bw = s["bbox_w"].to_numpy(zero_copy_only=False)
        be = s["bbox_e"].to_numpy(zero_copy_only=False)
        cells_flat, cell_counts = cells_of_bboxes(bs, bn, bw, be, MAXDIST)
        cofs = np.concatenate(([0], np.cumsum(cell_counts)))

        # expand each (row, name) pair over the row's cells (name outer, cell
        # inner — the original nesting)
        pc_counts = cell_counts[ri]
        total = int(pc_counts.sum())
        if total == 0:
            return STREET_SCHEMA.empty_table()
        pair_idx = np.repeat(np.arange(len(ri)), pc_counts)
        pofs = np.concatenate(([0], np.cumsum(pc_counts)))
        within = np.arange(total) - np.repeat(pofs[:-1], pc_counts)
        cell_final = cells_flat[cofs[ri[pair_idx]] + within]
        final_ri = ri[pair_idx]

        is_area_row = pc.fill_null(
            pc.and_(
                pc.is_in(s[tag_col("area")], value_set=pa.array(["yes", "true"])),
                s["is_closed"],
            ),
            False,
        ).to_numpy(zero_copy_only=False)
        take = pa.array(final_ri, pa.int64())
        payload = s.select(
            ["way_id", "xs", "ys", "bbox_s", "bbox_n", "bbox_w", "bbox_e"]
        ).take(take)
        return pa.Table.from_arrays(
            [
                pa.array(cell_final, pa.int64()),
                pa.array(nm[pair_idx], pa.string()),
                payload["way_id"],
                pa.array(is_area_row[final_ri]),
                payload["xs"],
                payload["ys"],
                payload["bbox_s"],
                payload["bbox_n"],
                payload["bbox_w"],
                payload["bbox_e"],
                # quirk: lastchange never assigned (FirstHandler.hpp:62-74 →
                # NearestRoadsWriter lastchange "")
                pa.array(np.full(total, "", object), pa.string()),
            ],
            schema=STREET_SCHEMA,
        )

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


def _ip_rows_to_addr(t: pa.Table) -> pa.Table:
    """Interpolated-point rows → ADDR rows (the shared projection kernel of
    ``ip_addresses`` and the match exchange's fused ip source)."""
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


def ip_addresses(ip_points_ds):
    """Interpolated points (__out=1 of the interpolation stage) → ADDR rows.

    process_interpolated_node (CLPP.hpp:39-48): street probe only, no place
    probes; nwa fields come from the first endpoint (already resolved)."""
    return ip_points_ds.map_batches(_ip_rows_to_addr, batch_format="pyarrow")


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

    def _collect(ds_batches, slot: int, id_col: str, lon_col: str, lat_col: str):
        import pandas as pd

        for b in ds_batches:
            df = b.to_pandas()
            if not len(df):
                continue
            df = df.sort_values(id_col, kind="stable")
            names = df[tag_col("name")].to_numpy()
            tup = list(
                zip(
                    df[id_col].to_numpy().tolist(),
                    df[lon_col].to_numpy().tolist(),
                    df[lat_col].to_numpy().tolist(),
                )
            )
            # group boundaries after a single sort by name (vectorized split)
            order = np.argsort(names, kind="stable")
            names_s = names[order]
            starts = np.flatnonzero(
                np.concatenate(([True], names_s[1:] != names_s[:-1]))
            )
            ends = np.concatenate((starts[1:], [len(names_s)]))
            for s0, e0 in zip(starts, ends):
                lst = places.setdefault(names_s[s0], ([], []))[slot]
                lst.extend(tup[i] for i in order[s0:e0])

    _collect(
        parsed_ds.map_batches(nf, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ),
        0,
        "osm_id",
        "lon",
        "lat",
    )

    def wf(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.and_(pc.is_valid(t[tag_col("place")]), pc.is_valid(t[tag_col("name")])),
            pc.and_(t["is_closed"], t["nonzero"]),
        )
        s = t.filter(keep)
        return s.select(["way_id", "centroid_lon", "centroid_lat", tag_col("name")])

    _collect(
        ways_geo.map_batches(wf, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"
        ),
        1,
        "way_id",
        "centroid_lon",
        "centroid_lat",
    )

    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for name, (nody, wayy) in places.items():
        nody.sort()
        wayy.sort()
        out[name] = (
            np.array(nody, dtype=np.float64).reshape(-1, 3),
            np.array(wayy, dtype=np.float64).reshape(-1, 3),
        )
    return out


_PLACE_ROW_SCHEMA = pa.schema(
    [
        pa.field("flavor", pa.int8()),  # 0 = node place, 1 = closed-way place
        pa.field("id", pa.int64()),
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
        pa.field("name", pa.string()),
    ]
)


def _name_shard_codes(names, n_shards: int) -> np.ndarray:
    """Deterministic cross-process shard assignment for place names (the
    same ``ops.hash_keys`` hash the exchange uses — PYTHONHASHSEED-free)."""
    from ..ops import hash_keys

    t = pa.table({"name": pa.array(list(names), pa.string())})
    return (hash_keys(t, ["name"]) % np.uint64(n_shards)).astype(np.int64)


@ray.remote(num_cpus=0)
class PlacesShard:
    """One shard of the distributed places index (ST2 scale fallback): holds
    {name → (nody, wayy)} for the names hashing to this shard."""

    def __init__(self, tab: pa.Table):
        from ..pipelines.side_inputs import _places_from_tables

        flav = tab["flavor"].to_numpy(zero_copy_only=False)
        sel = ["id", "lon", "lat", "name"]
        nody = tab.filter(pa.array(flav == 0)).select(sel)
        wayy = tab.filter(pa.array(flav == 1)).select(sel)
        self.d = _places_from_tables(nody, wayy)

    def fetch(self, names: list[str]) -> dict:
        return {n: self.d[n] for n in names if n in self.d}


class ShardedPlacesIndex:
    """Handle for the name-hash-sharded places index (ST2 fallback when the
    index exceeds the broadcast budget).

    The place probe is keyed by NAME while match partitions are keyed by
    CELL — no locality to exploit — so the fallback is a sharded index
    service: each match partition batches the unique names it actually
    probes into one ``fetch`` RPC per shard (traffic is O(distinct probed
    names per partition), never O(places)). Documented partitioning
    assumption: shard actors jointly hold the full index, O(places/K) each.
    """

    __slots__ = ("shards", "total")

    def __init__(self, shards, total: int):
        self.shards = shards
        self.total = int(total)

    def __bool__(self) -> bool:
        return self.total > 0

    def __len__(self) -> int:
        return self.total

    def fetch_local(self, names: list[str]) -> dict:
        if not names:
            return {}
        codes = _name_shard_codes(names, len(self.shards))
        futs, name_arr = [], np.asarray(names, object)
        for s in np.unique(codes):
            futs.append(self.shards[int(s)].fetch.remote(list(name_arr[codes == s])))
        out: dict = {}
        for d in ray.get(futs):
            out.update(d)
        return out


def build_places_shards(parsed_ds, ways_geo, *, n_shards: int = 8, num_parts: int | None = None):
    """Distributed build of the sharded places index: extract place rows
    (node places + closed-way places, FirstHandler.hpp:24-36/:87-97) as a
    Dataset, hash-partition by name into ``n_shards`` partitions, and feed
    each partition to a shard actor — the driver never holds the index."""
    from ..ops import direct_cogroup

    def nodes_places(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(t["etype"], "node"),
            pc.and_(pc.is_valid(t[tag_col("place")]), pc.is_valid(t[tag_col("name")])),
        )
        s = t.filter(m)
        return pa.table(
            {
                "flavor": pa.array(np.zeros(s.num_rows, np.int8)),
                "id": s["osm_id"].combine_chunks(),
                "lon": s["lon"].combine_chunks(),
                "lat": s["lat"].combine_chunks(),
                "name": s[tag_col("name")].combine_chunks(),
            }
        )

    def ways_places(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.is_valid(t[tag_col("place")]), pc.is_valid(t[tag_col("name")])),
            pc.and_(t["is_closed"], t["nonzero"]),
        )
        s = t.filter(m)
        return pa.table(
            {
                "flavor": pa.array(np.ones(s.num_rows, np.int8)),
                "id": s["way_id"].combine_chunks(),
                "lon": s["centroid_lon"].combine_chunks(),
                "lat": s["centroid_lat"].combine_chunks(),
                "name": s[tag_col("name")].combine_chunks(),
            }
        )

    rows = parsed_ds.map_batches(nodes_places, batch_format="pyarrow").union(
        ways_geo.map_batches(ways_places, batch_format="pyarrow")
    )
    # one hash exchange on name: partition p holds exactly shard p's rows
    sharded = direct_cogroup(
        [rows], [["name"]], n_shards, lambda t: t, [_PLACE_ROW_SCHEMA]
    )
    refs = sharded.to_arrow_refs()
    shards = [PlacesShard.remote(r) for r in refs]
    total = sharded.count()
    return ShardedPlacesIndex(shards, total)


class PlacesIndex:
    """Columnar broadcast form of the places index (ST2).

    {name: ((n,3) nody, (m,3) wayy)} as ONE data array per flavor plus
    offsets and a name→slot dict; ``get`` returns zero-copy views. A dict of
    2×19k small ndarrays costs ~1s to ray.put/deserialize per worker — this
    form is two large buffers.
    """

    __slots__ = ("index", "nody_data", "nody_off", "wayy_data", "wayy_off")

    def __init__(self, index, nody_data, nody_off, wayy_data, wayy_off):
        self.index = index
        self.nody_data = nody_data
        self.nody_off = nody_off
        self.wayy_data = wayy_data
        self.wayy_off = wayy_off

    @classmethod
    def from_dict(cls, d: dict):
        names = list(d.keys())
        index = {n: i for i, n in enumerate(names)}
        empty = np.empty((0, 3), np.float64)

        def side(slot: int):
            arrs = [np.asarray(d[n][slot], np.float64).reshape(-1, 3) for n in names]
            off = np.zeros(len(names) + 1, np.int64)
            if arrs:
                np.cumsum([len(a) for a in arrs], out=off[1:])
                data = np.concatenate(arrs) if off[-1] else empty
            else:
                data = empty
            return data, off

        nody_data, nody_off = side(0)
        wayy_data, wayy_off = side(1)
        return cls(index, nody_data, nody_off, wayy_data, wayy_off)

    def __len__(self) -> int:
        return len(self.index)

    def __bool__(self) -> bool:
        return bool(self.index)

    def get(self, name, default=None):
        i = self.index.get(name)
        if i is None:
            return default
        return (
            self.nody_data[self.nody_off[i] : self.nody_off[i + 1]],
            self.wayy_data[self.wayy_off[i] : self.wayy_off[i + 1]],
        )


# --- the per-partition match kernel -----------------------------------------

def _match_partition(streets: pa.Table, addrs: pa.Table, places_ref) -> pa.Table:
    """Vectorized partition kernel: pandas group-index + numpy distance
    matrices per (cell, name) group; per-way batched mercator snap."""
    import pandas as pd

    places = get_cached(places_ref) if places_ref is not None else {}
    n = addrs.num_rows
    if n == 0:
        return MATCH_OUT_SCHEMA.empty_table()

    # ---- street arrays
    ns = streets.num_rows
    if ns:
        s_cell = streets["cell"].to_numpy(zero_copy_only=False)
        s_way = streets["way_id"].to_numpy(zero_copy_only=False)
        s_area = streets["is_area"].to_numpy(zero_copy_only=False)
        s_bs = streets["bbox_s"].to_numpy(zero_copy_only=False)
        s_bn = streets["bbox_n"].to_numpy(zero_copy_only=False)
        s_bw = streets["bbox_w"].to_numpy(zero_copy_only=False)
        s_be = streets["bbox_e"].to_numpy(zero_copy_only=False)
        xs_l = streets["xs"].combine_chunks() if isinstance(streets["xs"], pa.ChunkedArray) else streets["xs"]
        ys_l = streets["ys"].combine_chunks() if isinstance(streets["ys"], pa.ChunkedArray) else streets["ys"]
        s_offs = np.asarray(xs_l.offsets)
        s_offs = s_offs - s_offs[0]
        s_fx = np.asarray(xs_l.flatten(), dtype=np.float64)
        s_fy = np.asarray(ys_l.flatten(), dtype=np.float64)
    else:
        xs_l = ys_l = None

    # ---- address arrays
    a_cell = addrs["cell"].to_numpy(zero_copy_only=False)
    a_obj = addrs["obj_id"].to_numpy(zero_copy_only=False)
    ax = addrs["lon"].to_numpy(zero_copy_only=False)
    ay = addrs["lat"].to_numpy(zero_copy_only=False)
    a_ord = [addrs[f"ord{i}"].to_numpy(zero_copy_only=False) for i in range(4)]

    kind_node = pc.equal(addrs["kind"], "node").to_numpy(zero_copy_only=False)
    kind_way = pc.equal(addrs["kind"], "way").to_numpy(zero_copy_only=False)
    kind_ip = pc.equal(addrs["kind"], "ip").to_numpy(zero_copy_only=False)

    # ONE dictionary over {addr street, addr place_name, street name}: name
    # equality becomes int-code equality — the join, the probe grouping and
    # has_* masks never touch Python strings (full-column to_pylist
    # conversions measured ~0.9s/partition)
    _a_st = addrs["street"].combine_chunks() if isinstance(addrs["street"], pa.ChunkedArray) else addrs["street"]
    _a_pl = addrs["place_name"].combine_chunks() if isinstance(addrs["place_name"], pa.ChunkedArray) else addrs["place_name"]
    if ns:
        _s_nm = streets["name"].combine_chunks() if isinstance(streets["name"], pa.ChunkedArray) else streets["name"]
    else:
        _s_nm = pa.array([], pa.string())
    _enc = pa.concat_arrays([_a_st, _a_pl, _s_nm]).dictionary_encode()
    _codes = np.asarray(pc.fill_null(_enc.indices, -1), dtype=np.int64)
    uniq_names = _enc.dictionary.to_pylist()
    a_street_code = _codes[:n]
    a_place_code = _codes[n : 2 * n]
    s_name_code = _codes[2 * n :]

    matched = np.zeros(n, dtype=bool)
    win_row = np.full(n, -1, dtype=np.int64)  # street row index of the winner
    snap_lon = np.full(n, np.nan)
    snap_lat = np.full(n, np.nan)
    nody_m = np.zeros(n, dtype=bool)
    wayy_m = np.zeros(n, dtype=bool)

    # ---- J2: street match — ONE vectorized (cell, name) equi-join builds
    # all candidate pairs, then per-candidate-street batched distances and a
    # single lexsort winner selection (replaces a per-group Python loop)
    has_street = a_street_code >= 0
    if has_street.any() and ns:
        hs = np.flatnonzero(has_street)
        adf = pd.DataFrame({"cell": a_cell[hs], "name": a_street_code[hs], "ai": hs})
        sdf = pd.DataFrame({"cell": s_cell, "name": s_name_code, "sj": np.arange(ns)})
        pairs = adf.merge(sdf, on=["cell", "name"], how="inner", sort=False)
        if len(pairs):
            ai = pairs["ai"].to_numpy()
            sj = pairs["sj"].to_numpy()
            ok = np.asarray(
                is_point_near_bbox(
                    s_bs[sj], s_bn[sj], s_bw[sj], s_be[sj], ax[ai], ay[ai], MAXDIST
                )
            )
            ai, sj = ai[ok], sj[ok]
        if len(pairs) and len(ai):
            # multimap scan rank: areas first, way-id order within each
            # (CLPP.hpp:227-237; insertion order == way id order); within one
            # address's candidates — which share (cell, name) — this global
            # rank preserves the reference's scan order exactly
            order_rank = np.lexsort((s_way, ~s_area.astype(bool)))
            rank = np.empty(ns, np.int64)
            rank[order_rank] = np.arange(ns)

            # flat (pair × segment) distance sweep with a segmented min —
            # identical elementwise arithmetic to points_polyline_distances
            # (a per-candidate-street loop paid ~40µs of small-numpy overhead
            # per street; partitions carry ~10^5 candidate streets). Chunked
            # so peak scratch stays ~a few hundred MB per task.
            seg_counts = s_offs[1:] - s_offs[:-1] - 1  # ≥1 (nonzero gate)
            d = np.empty(len(ai), dtype=np.float64)
            P = len(ai)
            pc_counts = seg_counts[sj]
            chunk_target = SWEEP_CHUNK
            p0 = 0
            while p0 < P:
                p1 = p0
                tot = 0
                while p1 < P and (tot == 0 or tot + pc_counts[p1] <= chunk_target):
                    tot += pc_counts[p1]
                    p1 += 1
                cnt = pc_counts[p0:p1]
                rep = np.repeat(np.arange(p0, p1), cnt)
                pofs = np.concatenate(([0], np.cumsum(cnt)))
                pos = np.arange(tot) - np.repeat(pofs[:-1], cnt)
                v = s_offs[sj[rep]] + pos
                axp, ayp = ax[ai[rep]], ay[ai[rep]]
                x1, y1 = s_fx[v], s_fy[v]
                dx, dy = s_fx[v + 1] - x1, s_fy[v + 1] - y1
                seg2 = dx * dx + dy * dy
                seg2_safe = np.where(seg2 == 0.0, 1.0, seg2)
                t = ((axp - x1) * dx + (ayp - y1) * dy) / seg2_safe
                t = np.where(seg2 > 0.0, np.clip(t, 0.0, 1.0), 0.0)
                dflat = np.hypot(axp - (x1 + t * dx), ayp - (y1 + t * dy))
                d[p0:p1] = np.minimum.reduceat(dflat, pofs[:-1])
                p0 = p1

            # winner per address: min distance, ties broken by FIRST in scan
            # order (strict '<' update in the reference)
            key = np.lexsort((rank[sj], d, ai))
            ai_k = ai[key]
            first = np.concatenate(([True], ai_k[1:] != ai_k[:-1]))
            w_ai = ai_k[first]
            w_sj = sj[key][first]
            matched[w_ai] = True
            win_row[w_ai] = w_sj

    # ---- J5: snap (mercator, CLPP.hpp:149-154,283-338) — flat
    # (match × vertex) sweep: first-minimal vertex via segmented min +
    # first-index trick, then the two adjacent segments, all element-wise
    # identical to the former per-winner-way _snap_many loop (26k calls ×
    # ~125µs per partition)
    midx_all = np.flatnonzero(matched)
    if len(midx_all):

        def _proj_flat(axv, ayv, bxv, byv, pxv, pyv):
            # CLPP.hpp:343-364 r-clamped projection, flat arrays
            dx, dy = bxv - axv, byv - ayv
            den = dx * dx + dy * dy
            safe = np.where(den == 0.0, 1.0, den)
            r = np.clip(((pxv - axv) * dx + (pyv - ayv) * dy) / safe, 0.0, 1.0)
            ox = np.where(den == 0.0, axv, axv + r * dx)
            oy = np.where(den == 0.0, ayv, ayv + r * dy)
            return ox, oy

        wj = win_row[midx_all]
        pmx, pmy = wgs2merc(ax[midx_all], ay[midx_all])
        vcounts = s_offs[1:] - s_offs[:-1]
        M = len(midx_all)
        mcnt = vcounts[wj]
        q0 = 0
        while q0 < M:
            q1, tot = q0, 0
            while q1 < M and (tot == 0 or tot + mcnt[q1] <= SWEEP_CHUNK):
                tot += mcnt[q1]
                q1 += 1
            cnt = mcnt[q0:q1]
            rep = np.repeat(np.arange(q0, q1), cnt)
            pofs = np.concatenate(([0], np.cumsum(cnt)))
            pos = np.arange(tot) - np.repeat(pofs[:-1], cnt)
            v = s_offs[wj[rep]] + pos
            vx, vy = wgs2merc(s_fx[v], s_fy[v])
            d = np.hypot(vx - pmx[rep], vy - pmy[rep])
            dmin = np.minimum.reduceat(d, pofs[:-1])
            # FIRST minimal vertex (strict '<' scan == np.argmin tie rule)
            cand_idx = np.where(d == dmin[rep - q0], np.arange(tot), tot)
            first_flat = np.minimum.reduceat(cand_idx, pofs[:-1])
            i_pos = first_flat - pofs[:-1]
            vi = s_offs[wj[q0:q1]] + i_pos
            bx, by = wgs2merc(s_fx[vi], s_fy[vi])
            px_, py_ = pmx[q0:q1], pmy[q0:q1]
            best_x, best_y = bx.copy(), by.copy()
            prev = i_pos > 0
            if prev.any():
                pax, pay = wgs2merc(s_fx[vi[prev] - 1], s_fy[vi[prev] - 1])
                best_x[prev], best_y[prev] = _proj_flat(
                    bx[prev], by[prev], pax, pay, px_[prev], py_[prev]
                )
            nxt = i_pos < cnt - 1
            if nxt.any():
                nax, nay = wgs2merc(s_fx[vi[nxt] + 1], s_fy[vi[nxt] + 1])
                vbx, vby = wgs2merc(s_fx[vi[nxt]], s_fy[vi[nxt]])
                cx, cy = _proj_flat(vbx, vby, nax, nay, px_[nxt], py_[nxt])
                closer = np.hypot(px_[nxt] - cx, py_[nxt] - cy) < np.hypot(
                    px_[nxt] - best_x[nxt], py_[nxt] - best_y[nxt]
                )
                bxn, byn = best_x[nxt], best_y[nxt]
                bxn[closer], byn[closer] = cx[closer], cy[closer]
                best_x[nxt], best_y[nxt] = bxn, byn
            lo, la = merc2wgs(best_x, best_y)
            sel = midx_all[q0:q1]
            snap_lon[sel] = lo
            snap_lat[sel] = la
            q0 = q1

    # ---- J4: place probes (nodes: addr:street name AND addr:place name;
    # closed ways: addr:place name; never for interpolated points)
    place_line_src: list[np.ndarray] = []
    place_line_dst_lon: list[np.ndarray] = []
    place_line_dst_lat: list[np.ndarray] = []

    def probe(idx: np.ndarray, codes: np.ndarray):
        if not len(idx):
            return
        pdf = pd.DataFrame({"name": codes}).groupby("name", sort=False).indices
        for code, local in pdf.items():
            entry = places.get(uniq_names[code])
            if entry is None:
                continue
            nody, wayy = entry
            comb = np.vstack((nody, wayy))
            if len(comb) == 0:
                continue
            p_split = len(nody)
            gidx = idx[local]
            dx = ax[gidx][:, None] - comb[None, :, 1]
            dy = ay[gidx][:, None] - comb[None, :, 2]
            within = np.hypot(dx, dy) < MAXDIST
            anyw = within.any(axis=1)
            if not anyw.any():
                continue
            # LAST within-MAXDIST candidate wins (never-updated best_dist
            # quirk, CLPP.hpp:186-206; nody scanned before wayy)
            last = comb.shape[0] - 1 - np.argmax(within[:, ::-1], axis=1)
            sel = gidx[anyw]
            lastw = last[anyw]
            is_nody = lastw < p_split
            nody_m[sel[is_nody]] = True
            wayy_m[sel[~is_nody]] = True
            place_line_src.append(sel)
            place_line_dst_lon.append(comb[lastw, 1])
            place_line_dst_lat.append(comb[lastw, 2])

    if places:
        # pass 1: node addresses probing with their addr:street value
        p1 = np.flatnonzero(kind_node & has_street)
        # pass 2: nodes and ways probing with their addr:place value
        has_place = a_place_code >= 0
        p2 = np.flatnonzero((kind_node | kind_way) & has_place)
        if isinstance(places, ShardedPlacesIndex):
            # distributed mode: pull ONLY the names this partition probes
            # from the shard service, then run the identical probe kernel
            codes_needed = np.unique(
                np.concatenate([a_street_code[p1], a_place_code[p2]])
            )
            names_needed = [uniq_names[c] for c in codes_needed if c >= 0]
            places = places.fetch_local(names_needed)
        probe(p1, a_street_code[p1])
        probe(p2, a_place_code[p2])

    # ---- assemble outputs -------------------------------------------------
    tables: list[pa.Table] = []

    def sub_table(nrows: int, tag: int, cols: dict) -> pa.Table:
        arrays = []
        for f in MATCH_OUT_SCHEMA:
            if f.name == "__out":
                arrays.append(pa.array(np.full(nrows, tag, np.int8)))
            elif f.name in cols:
                v = cols[f.name]
                arrays.append(v if isinstance(v, (pa.Array, pa.ChunkedArray)) else pa.array(v, f.type, from_pandas=True))
            else:
                arrays.append(pa.nulls(nrows, f.type))
        return pa.Table.from_arrays(arrays, schema=MATCH_OUT_SCHEMA)

    # __out=0: nwa rows
    emit0 = addrs["nwa_emit"].to_numpy(zero_copy_only=False).astype(bool)
    e0 = np.flatnonzero(emit0)
    if len(e0):
        e0_arr = pa.array(e0, pa.int64())
        take_s = lambda c: addrs[c].take(e0_arr)  # arrow gather, no objects
        isip = kind_ip[e0]
        node_ids = np.where(kind_node[e0], a_obj[e0], 0)
        way_ids = np.where(kind_way[e0], a_obj[e0], 0)
        road = np.where(matched[e0], "1", None)
        nodym = np.where(nody_m[e0] & ~isip, "1", None)
        wayym = np.where(wayy_m[e0] & ~isip, "1", None)
        lastchange = pc.if_else(
            pa.array(isip), pa.nulls(len(e0), pa.string()), take_s("lastchange")
        )
        cols = {
            "node_id": pa.array(node_ids, pa.int64(), mask=~kind_node[e0]),
            "way_id": pa.array(way_ids, pa.int64(), mask=~kind_way[e0]),
            "is_ip": pa.array(isip.astype(np.int32)),
            "street": take_s("street"),
            "houseno": take_s("houseno"),
            "postcode": take_s("postcode"),
            "city": take_s("city"),
            "country": take_s("country"),
            "fulladdr": take_s("fulladdr"),
            "place": take_s("place"),
            "road_id": pa.array(road, pa.string(), from_pandas=True),
            "nody_place_id": pa.array(nodym, pa.string(), from_pandas=True),
            "wayy_place_id": pa.array(wayym, pa.string(), from_pandas=True),
            "lastchange": lastchange,
            "lon": pa.array(ax[e0]),
            "lat": pa.array(ay[e0]),
        }
        tables.append(sub_table(len(e0), 0, cols))

    # __out=1: connection lines (street matches, then place lines)
    m1 = np.flatnonzero(matched)
    if len(m1):
        tables.append(
            sub_table(
                len(m1),
                1,
                {
                    "node_id": pa.array(a_obj[m1], pa.int64(), mask=~kind_node[m1]),
                    "way_id": pa.array(a_obj[m1], pa.int64(), mask=~kind_way[m1]),
                    "lon": pa.array(ax[m1]),
                    "lat": pa.array(ay[m1]),
                    "lon2": pa.array(snap_lon[m1]),
                    "lat2": pa.array(snap_lat[m1]),
                },
            )
        )
    if place_line_src:
        pl = np.concatenate(place_line_src)
        zero = np.zeros(len(pl), np.int64)
        tables.append(
            sub_table(
                len(pl),
                1,
                {
                    "node_id": pa.array(zero, pa.int64(), mask=~kind_node[pl]),
                    "way_id": pa.array(zero, pa.int64(), mask=~kind_way[pl]),
                    "lon": pa.array(ax[pl]),
                    "lat": pa.array(ay[pl]),
                    "lon2": pa.array(np.concatenate(place_line_dst_lon)),
                    "lat2": pa.array(np.concatenate(place_line_dst_lat)),
                },
            )
        )

    # __out=2: nearest points; __out=3: nearest road/area candidates
    if len(m1):
        rows = win_row[m1]
        tables.append(
            sub_table(
                len(m1),
                2,
                {
                    "way_id": pa.array(s_way[rows], pa.int64()),
                    "lon": pa.array(snap_lon[m1]),
                    "lat": pa.array(snap_lat[m1]),
                },
            )
        )
        take_idx = pa.array(rows, pa.int64())
        tables.append(
            sub_table(
                len(m1),
                3,
                {
                    "way_id": pa.array(s_way[rows], pa.int64()),
                    "name": addrs["street"].take(pa.array(m1, pa.int64())),
                    "is_area": pa.array(s_area[rows].astype(bool)),
                    "lastchange": pa.array([""] * len(m1), pa.string()),
                    "xs": xs_l.take(take_idx),
                    "ys": ys_l.take(take_idx),
                    "ord0": pa.array(a_ord[0][m1], pa.int32()),
                    "ord1": pa.array(a_ord[1][m1], pa.int64()),
                    "ord2": pa.array(a_ord[2][m1], pa.int32()),
                    "ord3": pa.array(a_ord[3][m1], pa.int32()),
                },
            )
        )

    if not tables:
        return MATCH_OUT_SCHEMA.empty_table()
    return pa.concat_tables(tables)


# max salt fan-out per hot cell; cell ids use < 44 bits so cell*MAX_SALT
# stays within int64
MAX_SALT = 1024


def compute_salt_map(addrs_ds, *, hot_threshold: int) -> dict[int, int]:
    """Cheap pre-scan: per-cell address counts (Arrow partial aggregation →
    tiny global groupby) → {cell: salt_k} for cells above ``hot_threshold``.

    The salted-key split for skewed urban mega-cells (SURVEY §4.2; the
    FP-Hadoop / Hyper-Dimension-Shuffle trick from PAPERS.md): a hot cell's
    ADDRESSES spread over k sub-keys, its STREETS replicate to all k."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["cell"]).group_by(["cell"], use_threads=False).aggregate([("cell", "count")])
        return g.rename_columns(["cell", "n"])

    counts = (
        addrs_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="n"))
    )
    salt: dict[int, int] = {}
    for b in counts.iter_batches(batch_format="pyarrow"):
        cells = b["cell"].to_numpy(zero_copy_only=False)
        ns = b["n"].to_numpy(zero_copy_only=False)
        hot = ns > hot_threshold
        for c, cnt in zip(cells[hot], ns[hot]):
            salt[int(c)] = int(min(MAX_SALT, -(-cnt // hot_threshold)))
    return salt


def _salted(streets_ds, addrs_ds, salt_map: dict[int, int]):
    """Append ``skey`` to both sides: hot-cell addresses spread across k
    sub-keys (by deterministic hash), hot-cell street replicas duplicated to
    every sub-key. Output row SETS are provably unchanged: each address still
    meets exactly the street replicas of its own cell."""
    import pandas as pd

    salt_ref = ray.put(salt_map)

    def addr_skey(t: pa.Table) -> pa.Table:
        sm = get_cached(salt_ref)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        k = pd.Series(cell).map(sm).fillna(1).to_numpy(np.int64)
        from ..ops import hash_keys

        sub = (hash_keys(t, ["lon", "lat", "ord1", "ord3"]) % k.astype(np.uint64)).astype(np.int64)
        skey = cell * MAX_SALT + sub
        return t.append_column("skey", pa.array(skey, pa.int64()))

    def street_skey(t: pa.Table) -> pa.Table:
        sm = get_cached(salt_ref)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        k = pd.Series(cell).map(sm).fillna(1).to_numpy(np.int64)
        rep = np.repeat(np.arange(t.num_rows), k)
        sub = np.concatenate([np.arange(kk, dtype=np.int64) for kk in k]) if len(k) else np.empty(0, np.int64)
        tt = t.take(pa.array(rep))
        skey = cell[rep] * MAX_SALT + sub
        return tt.append_column("skey", pa.array(skey, pa.int64()))

    a = addrs_ds.map_batches(addr_skey, batch_format="pyarrow")
    s = streets_ds.map_batches(street_skey, batch_format="pyarrow")
    return s, a


def match_stage(
    streets_ds,
    addrs_ds,
    places: dict,
    *,
    num_parts: int = 32,
    salt_map: dict[int, int] | None = None,
    exchange: str = "direct",
    ip_src=None,
):
    """Co-group streets and addresses on cell id and run the match kernel.

    ``salt_map`` (from ``compute_salt_map``) splits skewed cells; the kernel
    itself is salt-agnostic because candidates are matched on the TRUE cell
    column inside each partition. ``exchange``: "direct" = two-wave raw-task
    map/reduce (ops.direct_cogroup, no sort barrier); "groupby" = packed-blob
    groupby exchange (streaming, backpressured).

    ``ip_src`` (direct, unsalted only): the interpolation stage's raw
    tagged-union output as a THIRD exchange source (``ops.RawRefs`` or a
    Dataset). Its split tasks filter ``__out=1`` and project to ADDR rows
    map-side (``pres``), then the kernel sees base ∪ ip addresses exactly
    as the union path would — but the interp wave and the street/base-addr
    splits overlap on object availability instead of serializing behind a
    union plan execution (round-5 e2e fixed-term cut)."""
    if isinstance(places, ray.ObjectRef):
        # collect_side_inputs_async hands the broadcast ref directly
        places_ref = places
    else:
        if isinstance(places, dict):
            places = PlacesIndex.from_dict(places)
        places_ref = ray.put(places)

    def fn(streets_part: pa.Table, addrs_part: pa.Table) -> pa.Table:
        if "skey" in streets_part.column_names:
            streets_part = streets_part.drop_columns(["skey"])
        if "skey" in addrs_part.column_names:
            addrs_part = addrs_part.drop_columns(["skey"])
        return _match_partition(streets_part, addrs_part, places_ref)

    key = ["cell"]
    street_schema, addr_schema = STREET_SCHEMA, ADDR_SCHEMA
    if salt_map:
        if ip_src is not None:
            raise ValueError("ip_src is not supported with salt_map")
        streets_ds, addrs_ds = _salted(streets_ds, addrs_ds, salt_map)
        key = ["skey"]
        street_schema = STREET_SCHEMA.append(pa.field("skey", pa.int64()))
        addr_schema = ADDR_SCHEMA.append(pa.field("skey", pa.int64()))

    from ..ops import direct_cogroup

    if ip_src is not None:
        if exchange != "direct":
            raise ValueError("ip_src requires the direct exchange")
        import pyarrow.compute as pcc

        def ip_pre(t: pa.Table) -> pa.Table:
            s = t.filter(pcc.equal(t["__out"], 1))
            if s.num_rows == 0:
                return ADDR_SCHEMA.empty_table()
            return _ip_rows_to_addr(s)

        def fn3(streets_part, base_part, ip_part):
            if ip_part.num_rows == 0:
                addrs_part = base_part
            elif base_part.num_rows == 0:
                addrs_part = ip_part
            else:
                # base-then-ip: the union path's concat order
                addrs_part = pa.concat_tables(
                    [base_part, ip_part], promote_options="default"
                )
            return fn(streets_part, addrs_part)

        return direct_cogroup(
            [streets_ds, addrs_ds, ip_src],
            [key, key, key],
            num_parts,
            fn3,
            [street_schema, addr_schema, ADDR_SCHEMA],
            pres=[None, None, ip_pre],
        )

    impl = direct_cogroup if exchange == "direct" else cogroup
    return impl(
        [streets_ds, addrs_ds],
        [key, key],
        num_parts,
        fn,
        [street_schema, addr_schema],
    )
