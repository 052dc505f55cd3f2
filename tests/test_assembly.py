"""Way-geometry assembly (J1) on the testzone corpus."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmi_addresses_ray.sources.testzone import doc_from_entity, docs_to_table
from osmi_addresses_ray.stages.assembly import assemble_ways
from osmi_addresses_ray.stages.parse import parse_docs


def test_assembly_testzone(testzone_docs, testzone_parsed):
    ds = parse_docs(rd.from_arrow(testzone_docs))
    ways_geo = assemble_ways(ds, num_parts=4)
    rows = ways_geo.take_all()
    # 125 ways minus two single-node ways (ids 1225, 1227) the reference
    # also drops (FirstHandler.hpp:41, GeometryHelper.hpp:154-156)
    assert len(rows) == 123
    by_id = {r["way_id"]: r for r in rows}
    # spot check one way's ref ordering against the raw XML-parsed doc
    parsed = testzone_parsed.to_pylist()
    nodes = {r["osm_id"]: r for r in parsed if r["etype"] == "node"}
    for r in parsed:
        if r["etype"] == "way" and len(r["refs"]) >= 2 and r["osm_id"] in by_id:
            got = by_id[r["osm_id"]]
            exp_x = [nodes[n]["lon"] for n in r["refs"] if n in nodes]
            assert got["xs"] == exp_x, f"way {r['osm_id']} coord order"
            assert got["first_ref"] == r["refs"][0]
            assert got["last_ref"] == r["refs"][-1]
            assert got["is_closed"] == (r["refs"][0] == r["refs"][-1])
            break


def test_assembly_drops_incomplete_and_short():
    docs = [
        doc_from_entity("node", 1, lon=8.0, lat=47.0),
        doc_from_entity("node", 2, lon=8.001, lat=47.0),
        doc_from_entity("way", 10, refs=[1, 2], tags=[("highway", "residential")]),
        doc_from_entity("way", 11, refs=[1, 99], tags=[]),  # dangling ref
        doc_from_entity("way", 12, refs=[1], tags=[]),  # single node
        doc_from_entity("way", 13, refs=[1, 1], tags=[]),  # closed degenerate, resolvable
    ]
    ds = parse_docs(rd.from_arrow(docs_to_table(docs)))
    rows = assemble_ways(ds, num_parts=2).take_all()
    ids = sorted(r["way_id"] for r in rows)
    assert ids == [10, 13]
    r13 = next(r for r in rows if r["way_id"] == 13)
    assert r13["is_closed"] and not r13["nonzero"]
    r10 = next(r for r in rows if r["way_id"] == 10)
    assert r10["nonzero"] and not r10["is_closed"]
    assert np.isclose(r10["bbox_e"], 8.001, atol=0.006)  # quantized outward
    assert r10["bbox_e"] >= 8.001
