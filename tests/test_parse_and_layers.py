"""Parse stage + stateless layers against reference testzone goldens
(test/run_tests.sh:15-79)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from osmi_addresses_ray.stages.entrances import entrances_batch
from osmi_addresses_ray.stages.parse import parse_docs


def test_parse_counts(testzone_parsed):
    p = testzone_parsed
    assert p.num_rows == 620
    assert pc.sum(pc.cast(pc.equal(p["etype"], "node"), pa.int64())).as_py() == 495
    assert pc.sum(pc.cast(pc.equal(p["etype"], "way"), pa.int64())).as_py() == 125


def test_span_invariant_through_parse(testzone_docs):
    ds = rd.from_arrow(testzone_docs)
    parsed = parse_docs(ds)
    out = parsed.select_columns(["doc_id", "spans"]).sort("doc_id").take_all()
    src = testzone_docs.sort_by("doc_id").to_pylist()
    assert len(out) == len(src)
    for a, b in zip(out, src):
        assert a["doc_id"] == b["doc_id"]
        assert a["spans"] == b["spans"], f"spans mutated for {a['doc_id']}"


def test_entrances_goldens(testzone_parsed):
    e = entrances_batch(testzone_parsed)
    assert e.num_rows == 6  # run_tests.sh:36
    assert e.filter(pc.is_null(e["entrance"])).num_rows == 1  # run_tests.sh:60
    assert e.filter(pc.equal(e["entrance"], "emergency")).num_rows == 1  # :61
