"""Distributed OSM PBF → interleaved-docs ingestion.

Completes the reference's input-format surface (`README.md:15`: XML/PBF/
gz/bz2). The PBF wire format is decoded from the published spec
(https://wiki.openstreetmap.org/wiki/PBF_Format — fileformat.proto /
osmformat.proto) with a hand-rolled protobuf-wire reader — this environment
has no protobuf library:

    file   := ( int32_be(len) BlobHeader Blob )*
    BlobHeader := {1: type:string, 3: datasize:int32}
    Blob   := {1: raw:bytes | 3: zlib_data:bytes, 2: raw_size}
    OSMData blob → PrimitiveBlock :=
        {1: StringTable{1: bytes*}, 2: PrimitiveGroup*,
         17: granularity(=100), 18: date_granularity(=1000),
         19: lat_offset, 20: lon_offset}
    PrimitiveGroup := {1: Node*, 2: DenseNodes, 3: Way*, 4: Relation*}
    DenseNodes := {1: packed sint64 Δid, 5: DenseInfo,
                   8: packed sint64 Δlat, 9: packed sint64 Δlon,
                   10: packed int32 keys_vals (0-terminated per node)}
    Way := {1: id, 2: packed keys, 3: packed vals, 4: Info,
            8: packed sint64 Δrefs}

    lat = 1e-9 * (lat_offset + granularity * v)   (granularity 100 → 1e-7°,
    exactly the osmium fixed-point the engine quantizes to)

Distribution: blob boundaries are natural split points. The driver walks the
header chain (a seek + 4-byte read per blob — no payload IO), then blobs fan
out round-robin to Ray tasks which decompress + decode independently.
Relations are skipped (the reference has no relation handler). Timestamps
become ISO8601 ``lastchange`` like osmium's ``Timestamp::to_iso``.

Verified by round-trip against an independent spec-following encoder
(tests/pbf_writer.py) on the reference testzone corpus: identical docs to
the XML path. (No real-world PBF fixture exists in this sandbox; the reader
follows the published spec byte-for-byte.)
"""

from __future__ import annotations

import struct
import time
import zlib

import pyarrow as pa

from ..schemas import DOC_SCHEMA
from .testzone import doc_from_entity, docs_to_table


# --- protobuf wire primitives -------------------------------------------------

def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message.

    wire 0 → varint int; wire 2 → bytes; wire 5/1 → fixed32/64 (returned raw).
    """
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = read_varint(buf, pos)
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            v = buf[pos : pos + 4]
            pos += 4
        elif wt == 1:
            v = buf[pos : pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, v


def packed_varints(buf: bytes, *, signed: bool = False) -> list[int]:
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        v, pos = read_varint(buf, pos)
        out.append(zigzag(v) if signed else v)
    return out


# --- blob chain ---------------------------------------------------------------

def scan_blobs(path: str) -> list[tuple[int, int, str]]:
    """(payload_offset, payload_len, type) per blob — header-only IO."""
    out = []
    with open(path, "rb") as f:
        while True:
            hdr_len_raw = f.read(4)
            if len(hdr_len_raw) < 4:
                break
            (hdr_len,) = struct.unpack(">i", hdr_len_raw)
            hdr = f.read(hdr_len)
            btype = "?"
            datasize = 0
            for field, _wt, v in iter_fields(hdr):
                if field == 1:
                    btype = v.decode()
                elif field == 3:
                    datasize = v
            off = f.tell()
            out.append((off, datasize, btype))
            f.seek(off + datasize)
    return out


def _blob_payload(raw: bytes) -> bytes:
    plain = None
    for field, _wt, v in iter_fields(raw):
        if field == 1:
            plain = v
        elif field == 3:
            plain = zlib.decompress(v)
    if plain is None:
        raise ValueError("blob carries no raw/zlib payload")
    return plain


def _iso(ts_seconds: int) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(ts_seconds))


# --- PrimitiveBlock decoding --------------------------------------------------

def decode_primitive_block(buf: bytes, *, noise: bool) -> list[dict]:
    strings: list[str] = []
    groups: list[bytes] = []
    granularity = 100
    date_gran = 1000
    lat_off = 0
    lon_off = 0
    for field, _wt, v in iter_fields(buf):
        if field == 1:
            strings = [s.decode() for f2, _w, s in iter_fields(v) if f2 == 1]
        elif field == 2:
            groups.append(v)
        elif field == 17:
            granularity = v
        elif field == 18:
            date_gran = v
        elif field == 19:
            lat_off = v
        elif field == 20:
            lon_off = v

    def coord(off, v):
        return 1e-9 * (off + granularity * v)

    docs: list[dict] = []
    for g in groups:
        for field, _wt, v in iter_fields(g):
            if field == 2:  # DenseNodes
                ids = lats = lons = kvs = None
                tstamps = None
                for f2, _w, v2 in iter_fields(v):
                    if f2 == 1:
                        ids = packed_varints(v2, signed=True)
                    elif f2 == 5:  # DenseInfo
                        for f3, _w3, v3 in iter_fields(v2):
                            if f3 == 2:
                                tstamps = packed_varints(v3, signed=True)
                    elif f2 == 8:
                        lats = packed_varints(v2, signed=True)
                    elif f2 == 9:
                        lons = packed_varints(v2, signed=True)
                    elif f2 == 10:
                        kvs = packed_varints(v2)
                cur_id = cur_lat = cur_lon = cur_ts = 0
                kv_pos = 0
                for i in range(len(ids or [])):
                    cur_id += ids[i]
                    cur_lat += lats[i]
                    cur_lon += lons[i]
                    tags = []
                    if kvs:
                        while kv_pos < len(kvs) and kvs[kv_pos] != 0:
                            tags.append((strings[kvs[kv_pos]], strings[kvs[kv_pos + 1]]))
                            kv_pos += 2
                        kv_pos += 1  # the 0 separator
                    ts = None
                    if tstamps is not None:
                        cur_ts += tstamps[i]
                        ts = _iso(cur_ts * date_gran // 1000)
                    docs.append(
                        doc_from_entity(
                            "node",
                            abs(cur_id),
                            lon=coord(lon_off, cur_lon),
                            lat=coord(lat_off, cur_lat),
                            tags=tags,
                            timestamp=ts,
                            noise=noise,
                        )
                    )
            elif field == 1:  # plain Node
                nid = 0
                nlat = nlon = 0
                keys = vals = []
                ts = None
                for f2, _w, v2 in iter_fields(v):
                    if f2 == 1:
                        nid = zigzag(v2) if isinstance(v2, int) else v2
                    elif f2 == 2:
                        keys = packed_varints(v2)
                    elif f2 == 3:
                        vals = packed_varints(v2)
                    elif f2 == 4:
                        for f3, _w3, v3 in iter_fields(v2):
                            if f3 == 2:
                                ts = _iso(v3 * date_gran // 1000)
                    elif f2 == 8:
                        nlat = zigzag(v2)
                    elif f2 == 9:
                        nlon = zigzag(v2)
                docs.append(
                    doc_from_entity(
                        "node",
                        abs(nid),
                        lon=coord(lon_off, nlon),
                        lat=coord(lat_off, nlat),
                        tags=[(strings[k], strings[w]) for k, w in zip(keys, vals)],
                        timestamp=ts,
                        noise=noise,
                    )
                )
            elif field == 3:  # Way
                wid = 0
                keys = vals = refs = []
                ts = None
                for f2, _w, v2 in iter_fields(v):
                    if f2 == 1:
                        wid = v2
                    elif f2 == 2:
                        keys = packed_varints(v2)
                    elif f2 == 3:
                        vals = packed_varints(v2)
                    elif f2 == 4:
                        for f3, _w3, v3 in iter_fields(v2):
                            if f3 == 2:
                                ts = _iso(v3 * date_gran // 1000)
                    elif f2 == 8:
                        refs = packed_varints(v2, signed=True)
                abs_refs = []
                cur = 0
                for d in refs:
                    cur += d
                    abs_refs.append(abs(cur))
                docs.append(
                    doc_from_entity(
                        "way",
                        abs(wid),
                        refs=abs_refs,
                        tags=[(strings[k], strings[w]) for k, w in zip(keys, vals)],
                        timestamp=ts,
                        noise=noise,
                    )
                )
            # field 4 (Relation): skipped, like the reference
    return docs


def read_osm_pbf(path: str, *, noise: bool = True, blobs_per_task: int = 4):
    """Parallel OSM PBF reader → docs Dataset (see module docstring)."""
    import ray.data as rd

    blobs = [b for b in scan_blobs(path) if b[2] == "OSMData"]
    chunks = [
        blobs[i : i + blobs_per_task] for i in range(0, len(blobs), blobs_per_task)
    ]
    if not chunks:
        return rd.from_arrow(DOC_SCHEMA.empty_table())
    src = rd.from_items(
        [{"offs": [c[0] for c in ch], "lens": [c[1] for c in ch]} for ch in chunks]
    )

    def parse(t: pa.Table) -> pa.Table:
        docs: list[dict] = []
        with open(path, "rb") as f:
            for row in t.to_pylist():
                for off, ln in zip(row["offs"], row["lens"]):
                    f.seek(off)
                    docs.extend(
                        decode_primitive_block(_blob_payload(f.read(ln)), noise=noise)
                    )
        if not docs:
            return DOC_SCHEMA.empty_table()
        return docs_to_table(docs)

    return src.map_batches(parse, batch_format="pyarrow")
