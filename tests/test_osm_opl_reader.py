"""OPL reader round-trip: spec-following encoder (tests/opl_writer.py) →
reader → same parsed entities as the XML path; chunk-count invariance
(any byte offset aligns to a line start); escaping edge cases."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from opl_writer import encode_opl

from osmi_addresses_ray.oracle.layers import parse_entities
from osmi_addresses_ray.sources.osm_opl import (
    _parse_fragment,
    parse_opl_line,
    read_osm_opl,
)
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
                tuple(e["refs"]), tuple(sorted(e["tags"].items())),
                e["lastchange"],
            )
        )
    return out


def _docs_to_table(docs):
    from osmi_addresses_ray.sources.testzone import docs_to_table

    return docs_to_table(docs)


def test_opl_roundtrip_matches_xml():
    xml_docs = load_osm_xml(TESTZONE)
    xml_ents = parse_entities(xml_docs)
    docs = _parse_fragment(encode_opl(xml_ents), noise=True)
    assert len(docs) == xml_docs.num_rows
    assert _canon(parse_entities(_docs_to_table(docs))) == _canon(xml_ents)


def test_opl_escaping_and_noise_fields():
    line = (
        "n-7 v3 dV c9 i2 uanon%20%user t2020-01-02T03:04:05Z "
        "Tname=Caf%e9%%20%%25%=x,addr:street%3d%k=a%2c%b x-8.5000000 y47.25"
    )
    etype, oid, lon, lat, refs, tags, ts = parse_opl_line(line)
    assert (etype, oid, lon, lat, ts) == (
        "node", -7, -8.5, 47.25, "2020-01-02T03:04:05Z"
    )
    assert dict(tags) == {"name": "Café %=x", "addr:street=k": "a,b"}

    way = parse_opl_line("w12 Nn3,n-4,n5 Thighway=primary")
    assert way[0] == "way" and way[4] == [3, -4, 5]
    assert way[5] == [("highway", "primary")]

    rel = parse_opl_line("r5 Mn1@outer,w2@ Ttype=multipolygon")
    assert rel[0] == "relation"  # parsed, later skipped


def test_opl_malformed_object_field_raises():
    import pytest

    with pytest.raises(ValueError):
        parse_opl_line("q123 x1 y2")
    with pytest.raises(ValueError):
        parse_opl_line("n x1 y2")


def test_opl_chunk_invariance(ray_session, tmp_path):
    """Docs are identical whatever n_chunks is (line alignment correct)."""
    xml_ents = parse_entities(load_osm_xml(TESTZONE))
    path = str(tmp_path / "tz.opl")
    with open(path, "wb") as f:
        f.write(encode_opl(xml_ents))
    one = read_osm_opl(path, n_chunks=1).to_pandas()
    many = read_osm_opl(path, n_chunks=13).to_pandas()
    assert sorted(one["doc_id"]) == sorted(many["doc_id"])
    assert len(one) == len(xml_ents)


def test_opl_pipeline_goldens(ray_session, tmp_path):
    """Flagship pipeline over OPL input reproduces testzone golden counts,
    including via the gz single-stream fallback."""
    import gzip

    from osmi_addresses_ray.pipelines.address_view import build_layers

    xml_ents = parse_entities(load_osm_xml(TESTZONE))
    path = str(tmp_path / "tz2.opl")
    data = encode_opl(xml_ents)
    with open(path, "wb") as f:
        f.write(data)
    layers = build_layers(read_osm_opl(path, n_chunks=5), num_parts=4)
    assert layers["osmi_addresses_connection_line"].count() == 116
    assert layers["osmi_addresses_nodes_with_addresses"].count() == 134
    assert layers["osmi_addresses_interpolation"].count() == 27

    gz_path = str(tmp_path / "tz3.opl.gz")
    with gzip.open(gz_path, "wb") as f:
        f.write(data)
    assert read_osm_opl(gz_path).count() == len(xml_ents)
