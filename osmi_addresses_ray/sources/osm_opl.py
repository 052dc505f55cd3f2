"""Distributed OSM OPL ("Object Per Line") → interleaved-docs ingestion.

Completes the reference's input-format matrix (reference `README.md:15`:
libosmium reads every mainstream OSM format; earlier rounds covered
XML/gz/bz2/PBF/o5m — this adds OPL, decoded from the published osmium
format description):

    file   := ( line "\\n" )*
    line   := objfield ( " " field )*
    objfield := ("n"|"w"|"r") id          object type + id (first field)
    field  := "v" version | "d" V|D | "c" changeset | "t" ISO-timestamp
            | "i" uid | "u" user
            | "x" lon | "y" lat                       (nodes)
            | "T" key=value ("," key=value)*          (tags)
            | "N" nREF ("," nREF)*                    (way node refs)
            | "M" member ("," member)*                (relation members)
    escaping: inside tag keys/values, user names and member roles, the
    bytes space/newline/CR/tab/comma/"="/"@"/"%" and all control chars are
    written as "%" + lowercase-hex UNICODE CODEPOINT + "%" (e.g. "%20%");
    a decoder must unescape ANY %hex% sequence.

Unlike o5m (delta-chained) and XML (entity boundaries need a parser-aware
scan), OPL is NEWLINE-DELIMITED with escaped newlines — any byte offset can
be aligned to the next "\\n"+1 and parsed independently, which makes it the
cheapest format to ingest in parallel: the driver picks ``n_chunks`` nominal
offsets, each Ray task aligns its start to a line boundary and parses whole
lines in [start, end). Relations are parsed and skipped (the reference has
no relation handler, `FirstHandler.hpp`/`SecondHandler.hpp`).

``.opl.gz`` / ``.opl.bz2`` single-stream files fall back to one
streaming-decompression task (same documented trade as osm_xml.py).

Verified by round-trip against an independent spec-following encoder
(tests/opl_writer.py) on the reference testzone corpus: identical docs to
the XML path, invariant under the chunk count.
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..schemas import DOC_SCHEMA
from .testzone import doc_from_entity, docs_to_table

_ESC = re.compile(r"%([0-9a-fA-F]{1,6})%")
_ETYPE = {"n": "node", "w": "way", "r": "relation"}


def _unescape(s: str) -> str:
    return _ESC.sub(lambda m: chr(int(m.group(1), 16)), s) if "%" in s else s


def parse_opl_line(line: str):
    """One OPL line → (etype, id, lon, lat, refs, tags, timestamp).

    Unknown field letters are skipped (the spec allows writers to add
    fields); a line whose object field is malformed raises — like
    libosmium, never silently drop data.
    """
    fields = line.split(" ")
    head = fields[0]
    etype = _ETYPE.get(head[:1])
    if etype is None or len(head) < 2:
        raise ValueError(f"malformed OPL object field: {head!r}")
    oid = int(head[1:])
    lon = lat = None
    refs: list[int] = []
    tags: list[tuple[str, str]] = []
    ts = None
    for f in fields[1:]:
        if len(f) < 2:  # empty field body (e.g. "u" with anonymous user)
            continue
        key, body = f[0], f[1:]
        if key == "x":
            lon = float(body)
        elif key == "y":
            lat = float(body)
        elif key == "t":
            ts = body
        elif key == "T":
            for pair in body.split(","):
                k, _, v = pair.partition("=")
                tags.append((_unescape(k), _unescape(v)))
        elif key == "N":
            refs = [int(r[1:]) for r in body.split(",")]
        # v/d/c/i/u/M and unknown letters: not part of the docs model
    return etype, oid, lon, lat, refs, tags, ts


def _parse_fragment(data: bytes, *, noise: bool) -> list[dict]:
    docs: list[dict] = []
    for raw in data.split(b"\n"):
        if not raw.strip():
            continue
        etype, oid, lon, lat, refs, tags, ts = parse_opl_line(
            raw.decode("utf-8")
        )
        if etype == "node":
            docs.append(
                doc_from_entity(
                    "node", abs(oid), lon=lon, lat=lat, tags=tags,
                    timestamp=ts, noise=noise,
                )
            )
        elif etype == "way":
            docs.append(
                doc_from_entity(
                    "way", abs(oid), refs=[abs(r) for r in refs], tags=tags,
                    timestamp=ts, noise=noise,
                )
            )
    return docs


def _next_line_offset(path: str, offset: int, file_size: int) -> int:
    """Smallest line-start position >= offset (escaped newlines mean a
    literal '\\n' byte ALWAYS terminates a line)."""
    if offset <= 0:
        return 0
    if offset >= file_size:
        return file_size
    with open(path, "rb") as f:
        f.seek(offset - 1)
        if f.read(1) == b"\n":
            return offset
        while True:
            buf = f.read(1 << 20)
            if not buf:
                return file_size
            i = buf.find(b"\n")
            if i >= 0:
                return f.tell() - len(buf) + i + 1


def read_osm_opl(path: str, *, n_chunks: int = 32, noise: bool = True):
    """Parallel OPL reader → docs Dataset (see module docstring)."""
    import os

    import ray.data as rd

    if path.endswith((".gz", ".bz2")):
        def stream(_b: pa.Table) -> pa.Table:
            import bz2
            import gzip

            opener = gzip.open if path.endswith(".gz") else bz2.open
            with opener(path, "rb") as f:
                docs = _parse_fragment(f.read(), noise=noise)
            return docs_to_table(docs) if docs else DOC_SCHEMA.empty_table()

        return rd.range(1, override_num_blocks=1).map_batches(
            stream, batch_format="pyarrow"
        )

    size = os.path.getsize(path)
    nominal = [size * i // n_chunks for i in range(n_chunks + 1)]
    bounds = sorted({_next_line_offset(path, off, size) for off in nominal})
    if bounds[-1] != size:
        bounds.append(size)
    ranges = [
        {"start": s, "end": e} for s, e in zip(bounds[:-1], bounds[1:]) if e > s
    ]
    src = rd.from_items(ranges)

    def parse(t: pa.Table) -> pa.Table:
        docs: list[dict] = []
        with open(path, "rb") as f:
            for r in t.to_pylist():
                f.seek(r["start"])
                docs.extend(
                    _parse_fragment(f.read(r["end"] - r["start"]), noise=noise)
                )
        if not docs:
            return DOC_SCHEMA.empty_table()
        return docs_to_table(docs)

    return src.map_batches(parse, batch_format="pyarrow")
