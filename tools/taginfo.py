"""Generate the engine's taginfo project file (taginfo data_format 1).

The reference publishes `taginfo.json` (reference repo root) declaring
every OSM tag its Address view consumes, for the taginfo project registry.
This tool emits the same declaration derived from THIS engine's behavior —
the consumed-tag surface is identical by construction (the parser projects
`constants.PARSED_TAG_KEYS`, the entrance/interpolation/area value sets
mirror the reference's checks), and `tests/test_resume_and_tools.py`
asserts (key, value, object_types) parity entry-for-entry against the
reference's own file so drift in either direction fails the build.

Usage: python tools/taginfo.py [OUT.json]   (default: stdout)
"""

from __future__ import annotations

import json
import sys

NODE_AREA = ["node", "area"]

# (key, value, object_types, description) — semantics per the engine:
# stages/parse.py (tag projection), stages/entrances.py (entrance values),
# stages/interpolation.py (interpolation values), stages/match.py
# (street-name keys + area rule), pipelines/side_inputs.py (place).
TAGS: list[tuple[str, str | None, list[str], str | None]] = [
    ("addr:city", None, NODE_AREA, None),
    ("addr:country", None, NODE_AREA, None),
    ("addr:full", None, NODE_AREA, None),
    ("addr:housenumber", None, NODE_AREA, None),
    ("addr:interpolation", "all", ["way"], None),
    ("addr:interpolation", "alphabetic", ["way"], None),
    ("addr:interpolation", "even", ["way"], None),
    ("addr:interpolation", "odd", ["way"], None),
    ("addr:place", None, NODE_AREA, None),
    ("addr:postcode", None, NODE_AREA, None),
    ("addr:street", None, NODE_AREA, None),
    ("alt_name", None, ["way"], None),
    ("area", "yes", ["area"], None),
    ("area", "true", ["area"], "Unrecommended tagging style"),
    ("building", None, ["area"], None),
    ("building", "entrance", ["node"], "Old tagging style"),
    ("entrance", "emergency", ["node"], None),
    ("entrance", "exit", ["node"], None),
    ("entrance", "main", ["node"], None),
    ("entrance", "service", ["node"], None),
    ("entrance", "yes", ["node"], None),
    ("highway", None, ["way", "area"], None),
    ("name", None, ["way", "area"], None),
    ("name:left", None, ["way"], None),
    ("name:right", None, ["way"], None),
    ("official_name", None, ["way"], None),
    ("postal_code", None, ["way", "area"], None),
    ("place", None, NODE_AREA, None),
    ("short_name", None, ["way"], None),
    ("ref", None, ["way"], None),
]


def build() -> dict:
    tags = []
    for key, value, otypes, desc in TAGS:
        row: dict = {"key": key}
        if value is not None:
            row["value"] = value
        row["object_types"] = list(otypes)
        if desc is not None:
            row["description"] = desc
        tags.append(row)
    return {
        "data_format": 1,
        "project": {
            "name": "ray-osmi Addresses engine",
            "description": (
                "Ray-Data-native re-implementation of OSM Inspector's "
                "Address view; consumes the same tag surface."
            ),
            "doc_url": "https://github.com/ltog/osmi-addresses",
        },
        "tags": tags,
    }


def main() -> int:
    doc = build()
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(doc, f, indent=1)
    else:
        json.dump(doc, sys.stdout, indent=1)
        print()
    return 0


if __name__ == "__main__":
    sys.exit(main())
