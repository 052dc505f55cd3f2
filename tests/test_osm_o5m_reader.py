"""o5m reader round-trip: spec-following encoder (tests/o5m_writer.py) →
reader → same parsed entities as the XML path; plus string-table /
delta-reset / relation-consistency unit probes."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

from o5m_writer import encode_o5m

from osmi_addresses_ray.oracle.layers import parse_entities
from osmi_addresses_ray.sources.osm_o5m import decode_o5m, iter_o5m_entities, read_osm_o5m
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


def _docs_to_table(docs):
    import pyarrow as pa

    from osmi_addresses_ray.sources.testzone import docs_to_table

    return docs_to_table(docs)


def test_o5m_roundtrip_matches_xml(tmp_path):
    xml_docs = load_osm_xml(TESTZONE)
    xml_ents = parse_entities(xml_docs)

    data = encode_o5m(xml_ents)
    docs = decode_o5m(data)
    assert len(docs) == xml_docs.num_rows
    assert _canon(parse_entities(_docs_to_table(docs))) == _canon(xml_ents)


def test_o5m_roundtrip_with_resets(tmp_path):
    """0xff resets mid-stream must not change the decoded content."""
    xml_ents = parse_entities(load_osm_xml(TESTZONE))
    plain = decode_o5m(encode_o5m(xml_ents))
    with_resets = decode_o5m(encode_o5m(xml_ents, reset_every=17))
    assert plain == with_resets


def test_o5m_relations_keep_string_table_consistent():
    """A relation BETWEEN two tagged nodes shares the string table with
    them — the reader must parse (not skip) its strings or the second
    node's tag REFERENCE misresolves."""
    from o5m_writer import _Encoder, _uint

    enc = _Encoder()
    out = bytearray(b"\xff\xe0" + _uint(4) + b"o5m2")
    out += enc.node(1, 1.0, 2.0, {"amenity": "cafe"}, "2020-01-02T03:04:05Z")
    out += enc.relation(
        5, [(0, 1, "stop"), (1, 9, "outer")], {"type": "route"}, None
    )
    # same tags as node 1 → the encoder emits a table REFERENCE whose offset
    # counts the relation's member/tag strings
    out += enc.node(2, 1.5, 2.5, {"amenity": "cafe"}, "2020-01-02T03:04:06Z")
    out += b"\xfe"
    got = list(iter_o5m_entities(bytes(out), emit_relations=True))
    assert [g[0] for g in got] == ["node", "relation", "node"]
    n1, rel, n2 = got
    assert n1[5] == [("amenity", "cafe")] and n2[5] == [("amenity", "cafe")]
    assert n1[2] == 10000000 and n1[3] == 20000000  # 1e-7 units
    assert rel[1] == 5 and rel[4] == [(0, 1, "stop"), (1, 9, "outer")]
    assert rel[5] == [("type", "route")]
    assert n2[6] == "2020-01-02T03:04:06Z"


def test_o5m_bad_header_rejected():
    import pytest

    with pytest.raises(ValueError, match="magic"):
        list(iter_o5m_entities(b"\xff\xe0\x04o5m3\xfe"))


def test_o5m_reader_dataset(ray_session, tmp_path):
    """read_osm_o5m returns a docs Dataset the flagship pipeline accepts."""
    xml_ents = parse_entities(load_osm_xml(TESTZONE))
    path = str(tmp_path / "tz.o5m")
    with open(path, "wb") as f:
        f.write(encode_o5m(xml_ents))
    ds = read_osm_o5m(path)
    assert ds.count() == len(xml_ents)


def test_o5m_pipeline_goldens(ray_session, tmp_path):
    """Flagship pipeline over o5m input reproduces testzone golden counts."""
    from osmi_addresses_ray.pipelines.address_view import build_layers

    xml_ents = parse_entities(load_osm_xml(TESTZONE))
    path = str(tmp_path / "tz2.o5m")
    with open(path, "wb") as f:
        f.write(encode_o5m(xml_ents, reset_every=100))
    layers = build_layers(read_osm_o5m(path), num_parts=4)
    assert layers["osmi_addresses_connection_line"].count() == 116
    assert layers["osmi_addresses_nodes_with_addresses"].count() == 134
    assert layers["osmi_addresses_interpolation"].count() == 27
