"""Convert the reference conformance corpus (OSM XML) into interleaved docs.

The reference pipeline is validated against ``test/osmi-testzone.osm`` (495
nodes, 125 ways; golden layer counts in ``test/run_tests.sh:15-79``). This
module re-encodes that XML — or any OSM XML of nodes/ways — into the engine's
input shape (BASELINE.json ``input_hint``): one document per OSM entity with
an ordered ``spans`` list of typed segments, interleaved with deterministic
text/media noise spans that the engine must carry through untouched.

Id sign-flipping mirrors ``test/makeidpositive.sh:10`` (negative ``id=`` /
``ref=`` attributes become positive).

This is a *test/bench input generator*, driver-side only — the engine itself
never parses XML.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

from ..schemas import DOC_SCHEMA, SPAN_TYPE


def _noise_spans(doc_key: str, slot: int) -> list[tuple[str, str, str]]:
    """Deterministic noise (kind, text, media_ref) tuples for one slot.

    crc32, not ``hash()`` — Python string hashing is salted per process and
    docs must be byte-identical across runs and workers."""
    import zlib

    h = zlib.crc32(f"{doc_key}:{slot}".encode()) & 0x7FFFFFFF
    out = []
    if h % 3 == 0:
        out.append(("text", f"lorem-{h % 997}", ""))
    if h % 5 == 0:
        out.append(("media", "", f"img://fixture/{h % 101}"))
    return out


def doc_from_entity(
    etype: str,
    osm_id: int,
    *,
    lon: float | None = None,
    lat: float | None = None,
    refs: list[int] | None = None,
    tags: list[tuple[str, str]] | None = None,
    timestamp: str | None = None,
    noise: bool = True,
) -> dict:
    """Build one interleaved document for an OSM entity (FIXTURES.md §1)."""
    doc_id = f"{etype}/{osm_id}"
    raw: list[tuple[str, str, str]] = [(f"osm:{etype}", str(osm_id), "")]
    if etype == "node":
        raw.append(("geom", f"{lon!r},{lat!r}", ""))
    for r in refs or ():
        raw.append(("ref", str(r), ""))
    for k, v in tags or ():
        raw.append(("tag", f"{k}={v}", ""))
    if timestamp:
        raw.append(("meta", timestamp, ""))

    spans: list[dict] = []
    for slot, (kind, text, media_ref) in enumerate(raw):
        if noise:
            for nk, nt, nm in _noise_spans(doc_id, slot):
                spans.append(
                    {"kind": nk, "text": nt, "media_ref": nm, "offset": len(spans)}
                )
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )
    return {"doc_id": doc_id, "spans": spans}


def load_osm_xml(path: str, *, noise: bool = True) -> pa.Table:
    """Parse an OSM XML file into a docs table (nodes and ways only).

    Relations are read but ignored, like the reference (no ``relation()``
    handler in FirstHandler.hpp / SecondHandler.hpp).
    """
    tree = ET.parse(path)
    root = tree.getroot()
    docs: list[dict] = []
    for el in root:
        if el.tag == "node":
            osm_id = abs(int(el.get("id")))
            tags = [
                (t.get("k"), t.get("v")) for t in el.findall("tag")
            ]
            docs.append(
                doc_from_entity(
                    "node",
                    osm_id,
                    lon=float(el.get("lon")),
                    lat=float(el.get("lat")),
                    tags=tags,
                    timestamp=el.get("timestamp"),
                    noise=noise,
                )
            )
        elif el.tag == "way":
            osm_id = abs(int(el.get("id")))
            refs = [abs(int(nd.get("ref"))) for nd in el.findall("nd")]
            tags = [(t.get("k"), t.get("v")) for t in el.findall("tag")]
            docs.append(
                doc_from_entity(
                    "way",
                    osm_id,
                    refs=refs,
                    tags=tags,
                    timestamp=el.get("timestamp"),
                    noise=noise,
                )
            )
    return docs_to_table(docs)


def docs_to_table(docs: list[dict]) -> pa.Table:
    doc_ids = pa.array([d["doc_id"] for d in docs], pa.string())
    spans = pa.array([d["spans"] for d in docs], pa.list_(SPAN_TYPE))
    return pa.Table.from_arrays([doc_ids, spans], schema=DOC_SCHEMA)
