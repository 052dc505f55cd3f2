"""Way-geometry assembly (J1): the engine's first shuffle.

Replaces the reference's in-RAM node-location map (main.cpp:65-68 — 80 GB RSS
at Europe scale, SURVEY.md ST5) with a distributed equi-join:

    ways ─ explode refs → (node_ref, way_id, pos, n_refs)
         ⨝ nodes on node_ref                       (hash shuffle #1)
         ─ co-group with way attrs on way_id       (hash shuffle #2)
         → ways_geo (ordered coord lists + derived geometry columns)

Ways with unresolved refs are dropped whole, mirroring the reference's
``location_handler.ignore_errors()`` + invalid_location catch (main.cpp:68,
SecondHandler.hpp:84-88): an incomplete join (joined rows < n_refs) discards
the way. Ways with <2 refs are dropped (FirstHandler.hpp:41).

Derived columns: ``is_closed`` (first ref == last ref, osmium Way::is_closed),
``nonzero`` (some vertex differs from vertex 0, GeometryHelper.hpp:154-167),
quantized float32 bbox (FirstHandler.hpp:66-70), centroid for closed ways
(GeometryHelper.hpp:31-41).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import PARSED_TAG_KEYS, tag_col
from ..functions.geom import polygon_centroid
from ..ops import cogroup

# way attribute columns carried through assembly
WAY_ATTR_COLS = ["doc_id", "osm_id", "lastchange"] + [tag_col(k) for k in PARSED_TAG_KEYS]

LOCATED_REF_SCHEMA = pa.schema(
    [
        pa.field("way_id", pa.int64()),
        pa.field("node_ref", pa.int64()),
        pa.field("pos", pa.int32()),
        pa.field("n_refs", pa.int32()),
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
    ]
)

WAYS_GEO_FIELDS = [
    pa.field("doc_id", pa.string()),
    pa.field("way_id", pa.int64()),
    pa.field("lastchange", pa.string()),
    *[pa.field(tag_col(k), pa.string()) for k in PARSED_TAG_KEYS],
    pa.field("xs", pa.list_(pa.float64())),
    pa.field("ys", pa.list_(pa.float64())),
    pa.field("first_ref", pa.int64()),
    pa.field("last_ref", pa.int64()),
    pa.field("is_closed", pa.bool_()),
    pa.field("nonzero", pa.bool_()),
    pa.field("bbox_s", pa.float64()),
    pa.field("bbox_n", pa.float64()),
    pa.field("bbox_w", pa.float64()),
    pa.field("bbox_e", pa.float64()),
    pa.field("centroid_lon", pa.float64()),
    pa.field("centroid_lat", pa.float64()),
]
WAYS_GEO_SCHEMA = pa.schema(WAYS_GEO_FIELDS)


def explode_refs_batch(t: pa.Table) -> pa.Table:
    """(way rows) → one row per (node_ref, way_id, pos)."""
    refs = t["refs"]
    if isinstance(refs, pa.ChunkedArray):
        refs = refs.combine_chunks()
    offs = np.asarray(refs.offsets)
    counts = np.diff(offs)
    way_ids = t["osm_id"].to_numpy(zero_copy_only=False)
    parent = np.repeat(np.arange(t.num_rows), counts)
    total = int(counts.sum())
    pos = (np.arange(total) - np.repeat(offs[:-1] - offs[0], counts)).astype(np.int32)
    return pa.table(
        {
            "node_ref": refs.flatten(),
            "way_id": pa.array(way_ids[parent], pa.int64()),
            "pos": pa.array(pos, pa.int32()),
            "n_refs": pa.array(counts[parent].astype(np.int32), pa.int32()),
        }
    )


def _int16_roundtrip_bbox(lat_min, lat_max, lon_min, lon_max):
    """Vectorized FirstHandler.hpp:66-70 int16 quantization with outward
    rounding, dequantized to float32 (GeometryHelper.hpp:96-120)."""
    i16 = 32767
    f = np.float32
    n = np.ceil(lat_max * i16 / 90.0).astype(np.int16).astype(f) * f(90) / f(i16)
    s = np.floor(lat_min * i16 / 90.0).astype(np.int16).astype(f) * f(90) / f(i16)
    e = np.ceil(lon_max * i16 / 180.0).astype(np.int16).astype(f) * f(180) / f(i16)
    w = np.floor(lon_min * i16 / 180.0).astype(np.int16).astype(f) * f(180) / f(i16)
    return s.astype(np.float64), n.astype(np.float64), w.astype(np.float64), e.astype(np.float64)


def _reassemble(located: pa.Table, attrs: pa.Table) -> pa.Table:
    """Per-partition: ordered coord lists per way + derived geometry columns.

    Vectorized: one lexsort over the partition, list reconstruction via
    offsets; the only per-way Python work is the centroid of closed ways.
    """
    if located.num_rows == 0 or attrs.num_rows == 0:
        return WAYS_GEO_SCHEMA.empty_table()
    wid = located["way_id"].to_numpy(zero_copy_only=False)
    pos = located["pos"].to_numpy(zero_copy_only=False)
    nref = located["n_refs"].to_numpy(zero_copy_only=False)
    ref = located["node_ref"].to_numpy(zero_copy_only=False)
    lon = located["lon"].to_numpy(zero_copy_only=False)
    lat = located["lat"].to_numpy(zero_copy_only=False)

    order = np.lexsort((pos, wid))
    wid, pos, nref, ref, lon, lat = (a[order] for a in (wid, pos, nref, ref, lon, lat))
    # way boundaries
    starts = np.flatnonzero(np.concatenate(([True], wid[1:] != wid[:-1])))
    ends = np.concatenate((starts[1:], [len(wid)]))
    counts = ends - starts
    uniq_wid = wid[starts]
    complete = counts == nref[starts]  # dangling refs → drop whole way
    ge2 = counts >= 2

    keep = complete & ge2
    if not keep.any():
        return WAYS_GEO_SCHEMA.empty_table()
    starts_k, ends_k, counts_k = starts[keep], ends[keep], counts[keep]
    uniq_k = uniq_wid[keep]

    # gather flat coords of kept ways (ways are contiguous after the lexsort)
    row_keep = np.repeat(keep, counts)
    fx, fy = lon[row_keep], lat[row_keep]
    offsets = np.concatenate(([0], np.cumsum(counts_k))).astype(np.int32)
    xs = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(fx, pa.float64()))
    ys = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(fy, pa.float64()))

    first_ref = ref[starts_k]
    last_ref = ref[ends_k - 1]
    is_closed = first_ref == last_ref

    # vectorized per-way aggregates over the flat arrays
    seg_id = np.repeat(np.arange(len(counts_k)), counts_k)
    bbox_n = np.maximum.reduceat(fy, offsets[:-1])
    bbox_s = np.minimum.reduceat(fy, offsets[:-1])
    bbox_e = np.maximum.reduceat(fx, offsets[:-1])
    bbox_w = np.minimum.reduceat(fx, offsets[:-1])
    qs, qn, qw, qe = _int16_roundtrip_bbox(bbox_s, bbox_n, bbox_w, bbox_e)
    first_x = fx[offsets[:-1]]
    first_y = fy[offsets[:-1]]
    nonzero = np.logical_or.reduceat(
        (fx != first_x[seg_id]) | (fy != first_y[seg_id]), offsets[:-1]
    )

    cen_lon = np.full(len(counts_k), np.nan)
    cen_lat = np.full(len(counts_k), np.nan)
    closed_idx = np.flatnonzero(is_closed & nonzero)
    if len(closed_idx):
        from ..functions.geom import polygon_centroids_packed

        cen_lon[closed_idx], cen_lat[closed_idx] = polygon_centroids_packed(
            fx, fy, offsets, closed_idx
        )

    # attach way attributes (attrs partitioned on the same key → local join)
    adf = attrs.to_pandas().set_index("osm_id")
    adf = adf.reindex(uniq_k)
    present = adf["doc_id"].notna().to_numpy()
    if not present.all():
        # refs for ways whose attr row landed elsewhere can't happen (same
        # partition key); missing attrs means the way wasn't selected — drop.
        sel = np.flatnonzero(present)
        sel_rows = np.isin(seg_id, sel)
        new_counts = counts_k[sel]
        offsets = np.concatenate(([0], np.cumsum(new_counts))).astype(np.int32)
        fx, fy = fx[sel_rows], fy[sel_rows]
        xs = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(fx, pa.float64()))
        ys = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), pa.array(fy, pa.float64()))
        uniq_k = uniq_k[sel]
        first_ref, last_ref, is_closed = first_ref[sel], last_ref[sel], is_closed[sel]
        bbox_n, bbox_s, bbox_e, bbox_w = bbox_n[sel], bbox_s[sel], bbox_e[sel], bbox_w[sel]
        qs, qn, qw, qe = qs[sel], qn[sel], qw[sel], qe[sel]
        nonzero, cen_lon, cen_lat = nonzero[sel], cen_lon[sel], cen_lat[sel]
        adf = adf.loc[uniq_k]

    arrays = [
        pa.array(adf["doc_id"].to_numpy(), pa.string(), from_pandas=True),
        pa.array(uniq_k, pa.int64()),
        pa.array(adf["lastchange"].to_numpy(), pa.string(), from_pandas=True),
        *[
            pa.array(adf[tag_col(k)].to_numpy(), pa.string(), from_pandas=True)
            for k in PARSED_TAG_KEYS
        ],
        xs,
        ys,
        pa.array(first_ref, pa.int64()),
        pa.array(last_ref, pa.int64()),
        pa.array(is_closed),
        pa.array(nonzero),
        pa.array(qs, pa.float64()),
        pa.array(qn, pa.float64()),
        pa.array(qw, pa.float64()),
        pa.array(qe, pa.float64()),
        pa.array(cen_lon, pa.float64()),
        pa.array(cen_lat, pa.float64()),
    ]
    return pa.Table.from_arrays(arrays, schema=WAYS_GEO_SCHEMA)


NODE_LOC_SCHEMA = pa.schema(
    [
        pa.field("osm_id", pa.int64()),
        pa.field("lon", pa.float64()),
        pa.field("lat", pa.float64()),
    ]
)

EXPLODED_SCHEMA = pa.schema(
    [
        pa.field("node_ref", pa.int64()),
        pa.field("way_id", pa.int64()),
        pa.field("pos", pa.int32()),
        pa.field("n_refs", pa.int32()),
    ]
)


def _locate(refs_part: pa.Table, nodes_part: pa.Table) -> pa.Table:
    """Per-partition hash join of exploded refs vs node locations (inner —
    dangling refs drop here and the reassembly completeness check drops the
    whole way). Arrow-native (Acero) join: no pandas round-trip."""
    if refs_part.num_rows == 0 or nodes_part.num_rows == 0:
        return LOCATED_REF_SCHEMA.empty_table()
    j = refs_part.join(
        nodes_part,
        keys=["node_ref"],
        right_keys=["osm_id"],
        join_type="inner",
        use_threads=False,
    )
    return j.select(
        ["way_id", "node_ref", "pos", "n_refs", "lon", "lat"]
    ).cast(LOCATED_REF_SCHEMA)


def _pre_exploded(t: pa.Table) -> pa.Table:
    w = t.filter(pc.equal(t["etype"], "way")).select(["osm_id", "refs"])
    return explode_refs_batch(w)


def _pre_nodes(t: pa.Table) -> pa.Table:
    return t.filter(pc.equal(t["etype"], "node")).select(["osm_id", "lon", "lat"])


def _pre_way_attrs(t: pa.Table) -> pa.Table:
    return t.filter(pc.equal(t["etype"], "way")).select(WAY_ATTR_COLS)


def assemble_ways(parsed_ds, *, num_parts: int = 32, exchange: str = "direct"):
    """parsed docs Dataset → ways_geo Dataset (see module docstring).

    ``exchange="direct"`` runs BOTH shuffles (node-id location join, way-id
    reassembly) as two-wave raw-task map/reduce exchanges
    (ops.direct_cogroup); ``"native"`` uses Ray's hash-join operator + the
    packed-groupby exchange (streaming, backpressured — the path for inputs
    too large to pin)."""
    from ..ops import direct_cogroup

    nodes = parsed_ds.filter(expr="etype == 'node'").select_columns(
        ["osm_id", "lon", "lat"]
    )
    ways = parsed_ds.filter(expr="etype == 'way'")
    way_attrs = ways.select_columns(WAY_ATTR_COLS)

    exploded = ways.select_columns(["osm_id", "refs"]).map_batches(
        explode_refs_batch, batch_format="pyarrow"
    )

    attrs_schema = pa.schema(
        [
            pa.field("doc_id", pa.string()),
            pa.field("osm_id", pa.int64()),
            pa.field("lastchange", pa.string()),
            *[pa.field(tag_col(k), pa.string()) for k in PARSED_TAG_KEYS],
        ]
    )

    if exchange == "direct":
        # shuffle chaining + map-side fusion: both exchanges read the
        # materialized ``parsed`` blocks directly — the per-source shaping
        # (node/way filter, projection, ref explode) runs INSIDE the split
        # tasks (``pres``), so no separate plan execution or object-store
        # round trip exists for exploded/nodes/way_attrs; and the
        # node-location join's reduce emits its output already
        # hash-partitioned on way_id, so the reassembly exchange consumes
        # the grid without a split wave.
        located = direct_cogroup(
            [parsed_ds, parsed_ds],
            [["node_ref"], ["osm_id"]],
            num_parts,
            _locate,
            [EXPLODED_SCHEMA, NODE_LOC_SCHEMA],
            pres=[_pre_exploded, _pre_nodes],
            emit_partitioned_on=["way_id"],
        )
        return direct_cogroup(
            [located, parsed_ds],
            [["way_id"], ["osm_id"]],
            num_parts,
            _reassemble,
            [LOCATED_REF_SCHEMA, attrs_schema],
            pres=[None, _pre_way_attrs],
        )

    from ..ops import fit_hash_shuffle

    located = exploded.join(
        nodes,
        join_type="inner",
        on=("node_ref",),
        right_on=("osm_id",),
        **fit_hash_shuffle(num_parts),
    ).select_columns(["way_id", "node_ref", "pos", "n_refs", "lon", "lat"])
    return cogroup(
        [located, way_attrs],
        [["way_id"], ["osm_id"]],
        num_parts,
        _reassemble,
        [LOCATED_REF_SCHEMA, attrs_schema],
    )
