"""Minimal spec-following OSM PBF encoder — TEST FIXTURE ONLY.

Written independently from the reader (straight from the published
fileformat.proto/osmformat.proto field numbers) so the round-trip test
exercises the wire format from both directions. Encodes nodes as DenseNodes
and ways as Way messages, zlib-compressed OSMData blobs, granularity 100
(1e-7°)."""

from __future__ import annotations

import struct
import zlib


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63) if v < 0 else v << 1


def _field(num: int, wt: int) -> bytes:
    return _varint((num << 3) | wt)


def _bytes_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _varint_field(num: int, v: int) -> bytes:
    return _field(num, 0) + _varint(v)


def _packed(num: int, vals, *, signed: bool = False) -> bytes:
    body = b"".join(_varint(_zz(v) if signed else v) for v in vals)
    return _bytes_field(num, body)


def _string_table(strings) -> bytes:
    return b"".join(_bytes_field(1, s.encode()) for s in strings)


def encode_pbf(entities: list[dict], *, block_size: int = 100) -> bytes:
    """entities: dicts with etype/id/lon/lat/refs/tags (oracle parse shape)."""
    out = bytearray()

    def blob(btype: str, payload: bytes):
        comp = zlib.compress(payload)
        blob_msg = _varint_field(2, len(payload)) + _bytes_field(3, comp)
        hdr = _bytes_field(1, btype.encode()) + _varint_field(3, len(blob_msg))
        out.extend(struct.pack(">i", len(hdr)))
        out.extend(hdr)
        out.extend(blob_msg)

    blob("OSMHeader", _bytes_field(4, b"OsmSchema-V0.6"))

    for i in range(0, len(entities), block_size):
        chunk = entities[i : i + block_size]
        strings = [""]
        sidx: dict[str, int] = {"": 0}

        def s(x: str) -> int:
            if x not in sidx:
                sidx[x] = len(strings)
                strings.append(x)
            return sidx[x]

        nodes = [e for e in chunk if e["etype"] == "node"]
        ways = [e for e in chunk if e["etype"] == "way"]
        groups = b""
        if nodes:
            ids, lats, lons, kvs = [], [], [], []
            pid = plat = plon = 0
            for e in nodes:
                ids.append(e["id"] - pid)
                lat_i = round(e["lat"] * 1e7)
                lon_i = round(e["lon"] * 1e7)
                lats.append(lat_i - plat)
                lons.append(lon_i - plon)
                pid, plat, plon = e["id"], lat_i, lon_i
                for k, v in e["tags"].items():
                    kvs.extend((s(k), s(v)))
                kvs.append(0)
            dense = (
                _packed(1, ids, signed=True)
                + _packed(8, lats, signed=True)
                + _packed(9, lons, signed=True)
                + _packed(10, kvs)
            )
            groups += _bytes_field(2, _bytes_field(2, dense))
        for e in ways:
            refs = []
            prev = 0
            for r in e["refs"]:
                refs.append(r - prev)
                prev = r
            way = (
                _varint_field(1, e["id"])
                + _packed(2, [s(k) for k in e["tags"]])
                + _packed(3, [s(v) for v in e["tags"].values()])
                + _packed(8, refs, signed=True)
            )
            groups += _bytes_field(2, _bytes_field(3, way))
        block = (
            _bytes_field(1, _string_table(strings))
            + groups
            + _varint_field(17, 100)  # granularity → 1e-7°
        )
        blob("OSMData", block)
    return bytes(out)
