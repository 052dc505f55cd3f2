"""PBF reader round-trip: spec-following encoder (tests/pbf_writer.py) →
distributed reader → same parsed entities as the XML path."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(__file__))

from pbf_writer import encode_pbf

from osmi_addresses_ray.oracle.layers import parse_entities
from osmi_addresses_ray.sources.osm_xml import read_osm_xml  # noqa: F401 (parity source)
from osmi_addresses_ray.sources.osm_pbf import read_osm_pbf
from osmi_addresses_ray.sources.testzone import load_osm_xml

TESTZONE = "/root/reference/test/osmi-testzone.osm"


def _canon(ents):
    out = []
    for e in sorted(ents, key=lambda e: (e["etype"] or "", e["id"] or 0)):
        out.append(
            (
                e["etype"], e["id"],
                None if e["lon"] is None else round(e["lon"], 7),
                None if e["lat"] is None else round(e["lat"], 7),
                tuple(e["refs"]), tuple(sorted(e["tags"].items())), e["lastchange"],
            )
        )
    return out


def test_pbf_roundtrip_matches_xml(ray_session, tmp_path):
    xml_docs = load_osm_xml(TESTZONE)
    xml_ents = parse_entities(xml_docs)

    pbf_path = str(tmp_path / "tz.osm.pbf")
    with open(pbf_path, "wb") as f:
        f.write(encode_pbf(xml_ents, block_size=64))

    pbf_docs = read_osm_pbf(pbf_path, blobs_per_task=2).to_pandas()
    assert len(pbf_docs) == xml_docs.num_rows
    import pyarrow as pa

    from osmi_addresses_ray.schemas import DOC_SCHEMA, SPAN_TYPE

    tab = pa.Table.from_arrays(
        [
            pa.array(pbf_docs["doc_id"], pa.string()),
            pa.array([list(s) for s in pbf_docs["spans"]], pa.list_(SPAN_TYPE)),
        ],
        schema=DOC_SCHEMA,
    )
    pbf_ents = parse_entities(tab)
    assert _canon(pbf_ents) == _canon(xml_ents)


def test_pbf_pipeline_goldens(ray_session, tmp_path):
    """The full flagship pipeline over PBF input reproduces the testzone
    golden counts."""
    import ray.data as rd

    from osmi_addresses_ray.pipelines.address_view import build_layers

    xml_ents = parse_entities(load_osm_xml(TESTZONE))
    pbf_path = str(tmp_path / "tz2.osm.pbf")
    with open(pbf_path, "wb") as f:
        f.write(encode_pbf(xml_ents))
    layers = build_layers(read_osm_pbf(pbf_path), num_parts=4)
    assert layers["osmi_addresses_connection_line"].count() == 116
    assert layers["osmi_addresses_nodes_with_addresses"].count() == 134
    assert layers["osmi_addresses_interpolation"].count() == 27
