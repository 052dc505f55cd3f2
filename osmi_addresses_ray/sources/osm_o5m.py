"""OSM .o5m → interleaved-docs ingestion.

Completes the reference's input-format matrix (reference `README.md:15`:
libosmium reads every mainstream OSM format; rounds 1-2 covered
XML/gz/bz2/PBF — this adds o5m, decoded from the published spec
(https://wiki.openstreetmap.org/wiki/O5m):

    file    := ( dataset )*
    dataset := 0xff                      reset deltas + string table
             | 0xfe                      end of file
             | 0xe0 len "o5m2"|"o5c2"    header
             | 0x10 len node-payload
             | 0x11 len way-payload
             | 0x12 len relation-payload
             | 0xdb len bbox | 0xdc len timestamp | other len-prefixed: skip

    uint    := little-endian base-128 varint (protobuf-style)
    sint    := uint u; u&1 ? -(u>>1)-1 : u>>1      (zigzag)
    node    := Δid version-block Δlon Δlat (string-pair tag)*
    way     := Δid version-block reflen (Δnoderef)* (string-pair tag)*
    rel     := Δid version-block reflen (Δmemberid member-string)* (tag)*
    version-block := uint version [ Δtimestamp [ Δchangeset uid/user-pair ] ]
                     (tail fields only when the preceding value is nonzero)

    string pair  := uint ref | 0x00 bytes 0x00 bytes 0x00  (inline)
    member string:= uint ref | 0x00 bytes 0x00             (inline single)
    Inline strings of total length ≤ 250 enter a ring table; ref n = n-th
    most recently stored entry. Eleven delta counters (node/way/rel id,
    lon, lat, timestamp, changeset, way-ref, rel-ref per member type) are
    zeroed by 0xff, along with the table.

Coordinates are already int32 1e-7 fixed-point — exactly the osmium
quantization the engine normalizes to. Relations are parsed (their member
strings participate in the shared string table) but not emitted, like the
reference (no relation handler).

Distribution note: o5m is a DELTA-CHAINED sequential format — datasets are
not independently decodable at arbitrary offsets (splitting is only legal
at 0xff reset marks, which writers emit sparsely, typically once per object
type). Like the ``.osm.gz`` single-stream fallback (osm_xml.py), the parse
runs as ONE streaming Ray task — the documented trade; convert to PBF
(blob-parallel, sources/osm_pbf.py) for planet-scale parallel ingestion.

Verified by round-trip against an independent spec-following encoder
(tests/o5m_writer.py) on the reference testzone corpus: identical docs to
the XML path. (No real-world o5m fixture exists in this sandbox; the
reader follows the published spec byte-for-byte.)
"""

from __future__ import annotations

import time

import pyarrow as pa

from ..schemas import DOC_SCHEMA
from .testzone import doc_from_entity, docs_to_table

_STRING_TABLE_SIZE = 15000
_MAX_STORED_LEN = 250


def read_uint(buf: bytes, pos: int) -> tuple[int, int]:
    val = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def read_sint(buf: bytes, pos: int) -> tuple[int, int]:
    u, pos = read_uint(buf, pos)
    return (-(u >> 1) - 1 if u & 1 else u >> 1), pos


def _iso(ts_seconds: int) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(ts_seconds))


class _O5mState:
    """Delta counters + ring string table (shared across datasets, zeroed by
    0xff reset)."""

    def __init__(self):
        self.reset()

    def reset(self):
        # 11 delta counters per the spec
        self.id = [0, 0, 0]  # node / way / relation id
        self.lon = 0
        self.lat = 0
        self.timestamp = 0
        self.changeset = 0
        self.way_ref = 0
        self.rel_ref = [0, 0, 0]  # member id per member type
        self.table: list[tuple[bytes, ...]] = []

    def store(self, parts: tuple[bytes, ...]):
        if sum(len(p) for p in parts) <= _MAX_STORED_LEN:
            self.table.append(parts)
            if len(self.table) > _STRING_TABLE_SIZE:
                del self.table[0 : len(self.table) - _STRING_TABLE_SIZE]

    def lookup(self, ref: int) -> tuple[bytes, ...]:
        return self.table[-ref]

    def read_pair(self, buf: bytes, pos: int) -> tuple[tuple[bytes, bytes], int]:
        ref, pos = read_uint(buf, pos)
        if ref:
            pair = self.lookup(ref)
            return (pair[0], pair[1]), pos
        end1 = buf.index(0, pos)
        end2 = buf.index(0, end1 + 1)
        pair = (buf[pos:end1], buf[end1 + 1 : end2])
        self.store(pair)
        return pair, end2 + 1

    def read_single(self, buf: bytes, pos: int) -> tuple[bytes, int]:
        ref, pos = read_uint(buf, pos)
        if ref:
            return self.lookup(ref)[0], pos
        end = buf.index(0, pos)
        s = buf[pos:end]
        self.store((s,))
        return s, end + 1


def _read_version_block(st: _O5mState, buf: bytes, pos: int) -> tuple[str | None, int]:
    """uint version, then timestamp/changeset/uid-user only while the
    preceding value is nonzero. Returns the ISO lastchange (or None)."""
    version, pos = read_uint(buf, pos)
    if version == 0:
        return None, pos
    dts, pos = read_sint(buf, pos)
    st.timestamp += dts
    if st.timestamp == 0:
        return None, pos
    dcs, pos = read_sint(buf, pos)
    st.changeset += dcs
    # uid/user string pair (uid is varint bytes inside the pair); parsed so
    # the shared string table stays consistent, content unused
    _, pos = st.read_pair(buf, pos)
    return _iso(st.timestamp), pos


def iter_o5m_entities(data: bytes, *, emit_relations: bool = False):
    """Yield (etype, id, lon, lat, refs, tags, lastchange) tuples.

    ``lon``/``lat`` are 1e-7-degree ints for nodes, else None; relations
    are fully parsed (string-table consistency) but skipped unless asked.
    """
    st = _O5mState()
    pos = 0
    n = len(data)
    while pos < n:
        t = data[pos]
        pos += 1
        if t == 0xFF:
            st.reset()
            continue
        if t == 0xFE:
            break
        if t >= 0xF0:  # other single-byte datasets: skip
            continue
        ln, pos = read_uint(data, pos)
        end = pos + ln
        if t == 0x10:  # node
            d, pos = read_sint(data, pos)
            st.id[0] += d
            lastchange, pos = _read_version_block(st, data, pos)
            d, pos = read_sint(data, pos)
            st.lon += d
            d, pos = read_sint(data, pos)
            st.lat += d
            tags = []
            while pos < end:
                (k, v), pos = st.read_pair(data, pos)
                tags.append((k.decode(), v.decode()))
            yield ("node", st.id[0], st.lon, st.lat, None, tags, lastchange)
        elif t == 0x11:  # way
            d, pos = read_sint(data, pos)
            st.id[1] += d
            lastchange, pos = _read_version_block(st, data, pos)
            reflen, pos = read_uint(data, pos)
            refs_end = pos + reflen
            refs = []
            while pos < refs_end:
                d, pos = read_sint(data, pos)
                st.way_ref += d
                refs.append(st.way_ref)
            tags = []
            while pos < end:
                (k, v), pos = st.read_pair(data, pos)
                tags.append((k.decode(), v.decode()))
            yield ("way", st.id[1], None, None, refs, tags, lastchange)
        elif t == 0x12:  # relation — parse for table/delta consistency
            d, pos = read_sint(data, pos)
            st.id[2] += d
            lastchange, pos = _read_version_block(st, data, pos)
            reflen, pos = read_uint(data, pos)
            refs_end = pos + reflen
            members = []
            while pos < refs_end:
                d, pos = read_sint(data, pos)
                s, pos = st.read_single(data, pos)
                mtype = int(chr(s[0]))  # '0' node / '1' way / '2' relation
                st.rel_ref[mtype] += d
                members.append((mtype, st.rel_ref[mtype], s[1:].decode()))
            tags = []
            while pos < end:
                (k, v), pos = st.read_pair(data, pos)
                tags.append((k.decode(), v.decode()))
            if emit_relations:
                yield ("relation", st.id[2], None, None, members, tags, lastchange)
        else:  # header / bbox / timestamp / unknown length-prefixed
            if t == 0xE0 and data[pos:end] not in (b"o5m2", b"o5c2"):
                raise ValueError(f"bad o5m header magic {data[pos:end]!r}")
        pos = end
    return


def decode_o5m(data: bytes, *, noise: bool = True) -> list[dict]:
    docs = []
    for etype, oid, lon, lat, refs, tags, lastchange in iter_o5m_entities(data):
        if etype == "node":
            docs.append(
                doc_from_entity(
                    "node",
                    abs(oid),
                    lon=lon * 1e-7,
                    lat=lat * 1e-7,
                    tags=tags,
                    timestamp=lastchange,
                    noise=noise,
                )
            )
        elif etype == "way":
            docs.append(
                doc_from_entity(
                    "way",
                    abs(oid),
                    refs=[abs(r) for r in refs],
                    tags=tags,
                    timestamp=lastchange,
                    noise=noise,
                )
            )
    return docs


def read_osm_o5m(path: str, *, noise: bool = True):
    """o5m → docs Dataset. One streaming parse task (see module docstring:
    delta chaining makes the format sequential; use PBF for parallel
    ingestion at scale)."""
    import ray
    import ray.data as rd

    @ray.remote
    def parse() -> pa.Table:
        with open(path, "rb") as f:
            data = f.read()
        docs = decode_o5m(data, noise=noise)
        return docs_to_table(docs) if docs else DOC_SCHEMA.empty_table()

    return rd.from_arrow_refs([parse.remote()])
