"""Minimal spec-following .o5m encoder — TEST FIXTURE ONLY.

Written independently from the reader (straight from the published o5m
dataset grammar at https://wiki.openstreetmap.org/wiki/O5m) so the
round-trip test exercises the format from both directions: delta-coded
ids/coords/timestamps/refs, the 15000-entry ring string table with the
≤250-byte storage rule, version blocks with uid/user pairs, reset
datasets, and skippable bbox datasets.
"""

from __future__ import annotations

import calendar
import time

_TABLE_SIZE = 15000
_MAX_STORED = 250


def _uint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _sint(v: int) -> bytes:
    return _uint((v << 1) ^ (v >> 63) if v < 0 else v << 1)


class _Encoder:
    def __init__(self):
        self.reset_state()

    def reset_state(self):
        self.nid = self.wid = self.rid = 0
        self.lon = self.lat = 0
        self.ts = self.cs = 0
        self.way_ref = 0
        self.rel_ref = [0, 0, 0]
        self.tab_idx: dict[tuple[bytes, ...], int] = {}
        self.tab_n = 0

    def string(self, parts: tuple[bytes, ...]) -> bytes:
        if parts in self.tab_idx:
            ref = self.tab_n - self.tab_idx[parts]
            if ref <= _TABLE_SIZE:
                return _uint(ref)
        out = b"\x00" + b"\x00".join(parts) + b"\x00"
        if sum(len(p) for p in parts) <= _MAX_STORED:
            self.tab_idx[parts] = self.tab_n
            self.tab_n += 1
        return out

    def version_block(self, lastchange: str | None) -> bytes:
        if not lastchange:
            return _uint(0)
        ts = calendar.timegm(time.strptime(lastchange, "%Y-%m-%dT%H:%M:%SZ"))
        out = _uint(1) + _sint(ts - self.ts)
        self.ts = ts
        out += _sint(7 - self.cs)  # fixed changeset 7
        self.cs = 7
        out += self.string((_uint(42), b"tester"))  # uid 42 / user "tester"
        return out

    def node(self, oid: int, lon: float, lat: float, tags, lastchange) -> bytes:
        ilon, ilat = int(round(lon * 1e7)), int(round(lat * 1e7))
        p = _sint(oid - self.nid)
        self.nid = oid
        p += self.version_block(lastchange)
        p += _sint(ilon - self.lon) + _sint(ilat - self.lat)
        self.lon, self.lat = ilon, ilat
        for k, v in sorted(tags.items()):
            p += self.string((k.encode(), v.encode()))
        return b"\x10" + _uint(len(p)) + p

    def way(self, oid: int, refs, tags, lastchange) -> bytes:
        p = _sint(oid - self.wid)
        self.wid = oid
        p += self.version_block(lastchange)
        refbytes = b""
        for r in refs:
            refbytes += _sint(r - self.way_ref)
            self.way_ref = r
        p += _uint(len(refbytes)) + refbytes
        for k, v in sorted(tags.items()):
            p += self.string((k.encode(), v.encode()))
        return b"\x11" + _uint(len(p)) + p

    def relation(self, oid: int, members, tags, lastchange) -> bytes:
        """members: [(mtype 0|1|2, member_id, role str)]"""
        p = _sint(oid - self.rid)
        self.rid = oid
        p += self.version_block(lastchange)
        refbytes = b""
        for mtype, mid, role in members:
            refbytes += _sint(mid - self.rel_ref[mtype])
            self.rel_ref[mtype] = mid
            refbytes += self.string((str(mtype).encode() + role.encode(),))
        p += _uint(len(refbytes)) + refbytes
        for k, v in sorted(tags.items()):
            p += self.string((k.encode(), v.encode()))
        return b"\x12" + _uint(len(p)) + p


def encode_o5m(ents, *, reset_every: int | None = None, with_bbox: bool = True) -> bytes:
    """Entities (parse_entities dicts) → o5m bytes. Nodes first, then ways
    (the o5m convention). ``reset_every`` inserts 0xff mid-stream to
    exercise delta/table resets."""
    enc = _Encoder()
    out = bytearray(b"\xff\xe0" + _uint(4) + b"o5m2")
    if with_bbox:
        bbox = _sint(-1800000000) + _sint(-900000000) + _sint(1800000000) + _sint(900000000)
        out += b"\xdb" + _uint(len(bbox)) + bbox
    i = 0
    for etype in ("node", "way", "relation"):
        for e in ents:
            if e["etype"] != etype:
                continue
            if reset_every and i and i % reset_every == 0:
                out += b"\xff"
                enc.reset_state()
            i += 1
            if etype == "node":
                out += enc.node(e["id"], e["lon"], e["lat"], e["tags"], e["lastchange"])
            elif etype == "way":
                out += enc.way(e["id"], e["refs"], e["tags"], e["lastchange"])
            else:
                out += enc.relation(
                    e["id"], e["members"], e["tags"], e["lastchange"]
                )
    out += b"\xfe"
    return bytes(out)
