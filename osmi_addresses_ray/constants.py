"""Engine-wide constants.

Values mirror the reference implementation where semantics demand it:

- ``MAXDIST`` — maximum connection-line length in degrees; reference:
  ConnectionLinePreprocessor.hpp:11.
- the seven address keys captured for interpolation endpoints; reference:
  SecondHandler.hpp:55-62.
- the 20 ``addr:*`` keys flagged on non-closed ways; reference:
  AddrXOnNonClosedWayWriter.hpp:19-38.
- street-name keys used to index highways; reference: FirstHandler.hpp:118.
"""

from __future__ import annotations

# ConnectionLinePreprocessor.hpp:11 — soft cap on connection-line length (degrees).
MAXDIST = 0.01

# SecondHandler.hpp:55-62 — tags captured for interpolation endpoint nodes.
ADDR_KEYS_7 = (
    "addr:housenumber",
    "addr:street",
    "addr:postcode",
    "addr:city",
    "addr:country",
    "addr:full",
    "addr:place",
)

# InterpolationWriter.hpp:151-158 — endpoint tags compared for equality
# (housenumber intentionally excluded).
ENDPOINT_COMPARE_KEYS = (
    "addr:street",
    "addr:postcode",
    "addr:city",
    "addr:country",
    "addr:full",
    "addr:place",
)

# AddrXOnNonClosedWayWriter.hpp:19-38 — keys that flag a misplaced address
# when present on a non-closed way.
ADDRX_KEYS_20 = (
    "addr:street",
    "addr:housenumber",
    "addr:full",
    "addr:conscriptionnumber",
    "addr:housename",
    "addr:place",
    "addr:postcode",
    "addr:flats",
    "addr:door",
    "addr:unit",
    "addr:floor",
    "addr:city",
    "addr:country",
    "addr:hamlet",
    "addr:suburb",
    "addr:district",
    "addr:subdistrict",
    "addr:province",
    "addr:region",
    "addr:state",
)

# FirstHandler.hpp:118 — tag keys whose values name a highway in the street index.
STREETNAME_KEYS = (
    "name",
    "name:left",
    "name:right",
    "alt_name",
    "official_name",
    "short_name",
    "ref",
)

# All tag keys eagerly extracted to flat columns by the parse stage.
PARSED_TAG_KEYS = tuple(
    sorted(
        set(ADDR_KEYS_7)
        | set(ADDRX_KEYS_20)
        | set(STREETNAME_KEYS)
        | {
            "entrance",
            "building",
            "place",
            "highway",
            "area",
            "addr:interpolation",
            "postal_code",
        }
    )
)


def tag_col(key: str) -> str:
    """Column name carrying the value of OSM tag ``key`` after parsing."""
    return "t_" + key.replace(":", "_")


# Layer names (Writer ctors; e.g. EntrancesWriter.hpp:10, InterpolationWriter.hpp:22).
LAYER_CONNECTION_LINE = "osmi_addresses_connection_line"
LAYER_NEAREST_POINTS = "osmi_addresses_nearest_points"
LAYER_NEAREST_ROADS = "osmi_addresses_nearest_roads"
LAYER_NEAREST_AREAS = "osmi_addresses_nearest_areas"
LAYER_INTERPOLATION = "osmi_addresses_interpolation"
LAYER_NODES_WITH_ADDRESSES = "osmi_addresses_nodes_with_addresses"
LAYER_WAYS_WITH_ADDRESSES = "osmi_addresses_ways_with_addresses"
LAYER_BUILDINGS = "osmi_addresses_buildings"
LAYER_ADDRX_ON_NONCLOSED_WAY = "osmi_addresses_addrx_on_nonclosed_way"
LAYER_ENTRANCES = "osmi_addresses_entrances"
LAYER_WAYS_WITH_POSTAL_CODE = "osmi_addresses_ways_with_postal_code"

ALL_LAYERS = (
    LAYER_CONNECTION_LINE,
    LAYER_NEAREST_POINTS,
    LAYER_NEAREST_ROADS,
    LAYER_NEAREST_AREAS,
    LAYER_INTERPOLATION,
    LAYER_NODES_WITH_ADDRESSES,
    LAYER_WAYS_WITH_ADDRESSES,
    LAYER_BUILDINGS,
    LAYER_ADDRX_ON_NONCLOSED_WAY,
    LAYER_ENTRANCES,
    LAYER_WAYS_WITH_POSTAL_CODE,
)
