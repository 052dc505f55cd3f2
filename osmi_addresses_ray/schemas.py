"""Explicit Arrow schemas for every table that crosses a stage boundary.

The input schema is fixed by the graft contract (BASELINE.json ``input_hint``):
a Lance-shaped table of interleaved text+media documents. The 11 output-layer
schemas mirror the reference writer constructors (FIXTURES.md §3); ids are
int64 (the reference stores them stringified through OGR — Writer.hpp:59-81 —
which loses nothing but type fidelity; we keep the integer).

Geometry is carried as WKT in ``geom_wkt`` plus a ``geom_type`` string; point
layers additionally expose ``lon``/``lat`` float64 columns for cheap probing.
"""

from __future__ import annotations

import pyarrow as pa

# --- input ------------------------------------------------------------------

SPAN_TYPE = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

DOC_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
    ]
)

# --- layer schemas (attribute part; FIXTURES.md §3) -------------------------

_GEOM = [
    pa.field("geom_type", pa.string()),
    pa.field("geom_wkt", pa.string()),
]
_PT = [pa.field("lon", pa.float64()), pa.field("lat", pa.float64())]

ENTRANCES_SCHEMA = pa.schema(
    [
        pa.field("node_id", pa.int64()),
        pa.field("lastchange", pa.string()),
        pa.field("entrance", pa.string()),
        *_PT,
        *_GEOM,
    ]
)

CONNECTION_LINE_SCHEMA = pa.schema(
    [
        pa.field("node_id", pa.int64()),
        pa.field("way_id", pa.int64()),
        *_GEOM,
    ]
)

NEAREST_POINTS_SCHEMA = pa.schema([pa.field("way_id", pa.int64()), *_PT, *_GEOM])

NEAREST_ROADS_SCHEMA = pa.schema(
    [
        pa.field("way_id", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("lastchange", pa.string()),
        *_GEOM,
    ]
)

NEAREST_AREAS_SCHEMA = pa.schema(
    [
        pa.field("way_id", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("lastchange", pa.string()),
        *_GEOM,
    ]
)

INTERPOLATION_SCHEMA = pa.schema(
    [
        pa.field("way_id", pa.int64()),
        pa.field("typename", pa.string()),
        pa.field("firstid", pa.int64()),
        pa.field("lastid", pa.int64()),
        pa.field("firstno", pa.string()),
        pa.field("lastno", pa.string()),
        pa.field("error", pa.string()),
        pa.field("lastchange", pa.string()),
        *_GEOM,
    ]
)

NODES_WITH_ADDRESSES_SCHEMA = pa.schema(
    [
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
        *_PT,
        *_GEOM,
    ]
)

WAYS_WITH_ADDRESSES_SCHEMA = pa.schema(
    [
        pa.field("way_id", pa.int64()),
        pa.field("street", pa.string()),
        pa.field("houseno", pa.string()),
        pa.field("postcode", pa.string()),
        pa.field("city", pa.string()),
        pa.field("country", pa.string()),
        pa.field("fulladdr", pa.string()),
        pa.field("place", pa.string()),
        pa.field("lastchange", pa.string()),
        *_GEOM,
    ]
)

BUILDINGS_SCHEMA = pa.schema(
    [pa.field("way_id", pa.int64()), pa.field("lastchange", pa.string()), *_GEOM]
)

ADDRX_ON_NONCLOSED_WAY_SCHEMA = pa.schema(
    [pa.field("way_id", pa.int64()), pa.field("lastchange", pa.string()), *_GEOM]
)

WAYS_WITH_POSTAL_CODE_SCHEMA = pa.schema(
    [
        pa.field("way_id", pa.int64()),
        pa.field("lastchange", pa.string()),
        pa.field("postalcode", pa.string()),
        *_GEOM,
    ]
)

LAYER_SCHEMAS = {
    "osmi_addresses_connection_line": CONNECTION_LINE_SCHEMA,
    "osmi_addresses_nearest_points": NEAREST_POINTS_SCHEMA,
    "osmi_addresses_nearest_roads": NEAREST_ROADS_SCHEMA,
    "osmi_addresses_nearest_areas": NEAREST_AREAS_SCHEMA,
    "osmi_addresses_interpolation": INTERPOLATION_SCHEMA,
    "osmi_addresses_nodes_with_addresses": NODES_WITH_ADDRESSES_SCHEMA,
    "osmi_addresses_ways_with_addresses": WAYS_WITH_ADDRESSES_SCHEMA,
    "osmi_addresses_buildings": BUILDINGS_SCHEMA,
    "osmi_addresses_addrx_on_nonclosed_way": ADDRX_ON_NONCLOSED_WAY_SCHEMA,
    "osmi_addresses_entrances": ENTRANCES_SCHEMA,
    "osmi_addresses_ways_with_postal_code": WAYS_WITH_POSTAL_CODE_SCHEMA,
}


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
