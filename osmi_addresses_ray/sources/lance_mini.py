"""Minimal Lance-layout dataset writer/reader for the ``.lance`` carrier.

The north-star input format is a Lance table, but the sandbox image has no
``pylance`` — so until round 5 the ``.lance`` CLI branch could only raise.
This module implements enough of the PUBLIC Lance v2 layout (see
lancedb/lance ``docs/format.rst``: dataset directory with ``data/*.lance``
fragments + ``_versions/*.manifest``; fragment files with data pages first,
then per-column metadata, then offset tables, then the fixed 40-byte footer
ending in the ``LANC`` magic) that the branch genuinely executes: real
files, real buffer-level columnar decode, distributed one-task-per-fragment
reads.

Scope (documented divergence, not a stub):
- The fragment container follows the published v2 footer layout
  (column-metadata start / offset-table starts / counts / version /
  ``LANC``), but column metadata and the manifest use a LOCAL
  protobuf-wire-format schema defined below — NOT Lance's own protobuf
  definitions, which cannot be interop-verified in a sandbox without
  pylance. Files written here are therefore only guaranteed readable by
  this module; when ``pylance`` IS importable, ``docs_io.read_lance_docs``
  prefers the real library and never consults this path.
- Columnar encoding is Arrow buffer-level: every array node (validity,
  offsets, data, children — recursively for list/struct) is written as an
  aligned buffer and reconstructed with ``pa.Array.from_buffers``, so any
  nested docs schema (e.g. spans ``list<struct<...>>``) round-trips
  bit-exactly.

Local metadata wire format (standard protobuf varint/length-delimited
encoding):

    ColumnMeta  { repeated Node nodes = 1; }           // pre-order
    Node        { uint64 length = 1; uint64 null_count = 2;
                  repeated sint64 buffers = 3 [packed]; } // -1 = absent
    Manifest    { repeated string data_files = 1; uint64 num_rows = 2;
                  bytes schema_ipc = 3; uint64 version = 4; }
"""

from __future__ import annotations

import os
import struct

import pyarrow as pa

MAGIC = b"LANC"
_MAJOR, _MINOR = 0, 3
_ALIGN = 64


# --- protobuf wire-format primitives (local messages only) -------------------


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _read_uvarint(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7


def _field(num: int, wire: int) -> bytes:
    return _uvarint((num << 3) | wire)


def _walk_fields(buf: bytes):
    """Yield (field_num, wire_type, value) over a message's fields."""
    pos = 0
    while pos < len(buf):
        tag, pos = _read_uvarint(buf, pos)
        num, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_uvarint(buf, pos)
        elif wire == 2:
            ln, pos = _read_uvarint(buf, pos)
            v = buf[pos : pos + ln]
            pos += ln
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield num, wire, v


# --- Arrow node tree <-> buffers ---------------------------------------------


def _has_offset(arr: pa.Array) -> bool:
    if arr.offset != 0:
        return True
    if pa.types.is_struct(arr.type):
        return any(_has_offset(arr.field(i)) for i in range(arr.type.num_fields))
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        return _has_offset(arr.values)
    return False


def _flatten(arr: pa.Array, bufs: list, nodes: list) -> None:
    """Pre-order walk: append each node's buffers to ``bufs`` and a
    (length, null_count, buffer-index list) entry to ``nodes``.

    Requires zero offsets throughout the tree (write_fragment compacts the
    ROOT first — compacting a child independently would desync a parent
    list's offsets buffer from the rebased values)."""
    if arr.offset != 0:
        raise ValueError("lance-mini write requires compacted (offset-0) arrays")
    idxs = []
    n_buf = arr.type.num_buffers
    for b in arr.buffers()[:n_buf]:
        if b is None:
            idxs.append(-1)
        else:
            idxs.append(len(bufs))
            bufs.append(b)
    nodes.append((len(arr), arr.null_count, idxs))
    if pa.types.is_struct(arr.type):
        for i in range(arr.type.num_fields):
            _flatten(arr.field(i), bufs, nodes)
    elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        _flatten(arr.values, bufs, nodes)
    elif arr.type.num_fields:
        raise ValueError(f"unsupported nested type for lance-mini: {arr.type}")


def _rebuild(typ: pa.DataType, nodes: list, page_bufs: list, cursor: list) -> pa.Array:
    length, null_count, idxs = nodes[cursor[0]]
    cursor[0] += 1
    buffers = [None if i < 0 else page_bufs[i] for i in idxs]
    children = []
    if pa.types.is_struct(typ):
        children = [
            _rebuild(typ.field(i).type, nodes, page_bufs, cursor)
            for i in range(typ.num_fields)
        ]
    elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
        children = [_rebuild(typ.value_type, nodes, page_bufs, cursor)]
    return pa.Array.from_buffers(
        typ, length, buffers, null_count=null_count, children=children or None
    )


# --- fragment files ----------------------------------------------------------


def write_fragment(table: pa.Table, path: str) -> None:
    """One Lance-v2-layout fragment file for ``table``."""
    table = table.combine_chunks()
    col_meta_blobs = []
    out = bytearray()

    def _pad():
        while len(out) % _ALIGN:
            out.append(0)

    for name in table.column_names:
        arr = table[name]
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        if _has_offset(arr):
            # root-level take rebuilds the whole tree zero-offset
            arr = arr.take(pa.array(range(len(arr)), pa.int64()))
            if _has_offset(arr):
                raise ValueError(
                    f"column {name!r}: could not compact for lance-mini write"
                )
        bufs: list = []
        nodes: list = []
        _flatten(arr, bufs, nodes)
        # data pages: write this column's buffers, remember (pos, size)
        spans = []
        for b in bufs:
            _pad()
            spans.append((len(out), b.size))
            out.extend(b)
        # ColumnMeta: nodes with buffer indices rewritten to packed
        # (pos, size) pairs via a per-column buffer table appended as
        # field 2 (repeated uint64, packed: pos0, size0, pos1, size1, ...)
        meta = bytearray()
        for length, null_count, idxs in nodes:
            node = bytearray()
            node += _field(1, 0) + _uvarint(length)
            node += _field(2, 0) + _uvarint(null_count)
            packed = b"".join(_uvarint(_zigzag(i)) for i in idxs)
            node += _field(3, 2) + _uvarint(len(packed)) + packed
            meta += _field(1, 2) + _uvarint(len(node)) + bytes(node)
        btab = b"".join(_uvarint(v) for s in spans for v in s)
        meta += _field(2, 2) + _uvarint(len(btab)) + btab
        col_meta_blobs.append(bytes(meta))

    # column metadata section
    _pad()
    cm_start = len(out)
    cm_offsets = []
    for blob in col_meta_blobs:
        cm_offsets.append((len(out), len(blob)))
        out.extend(blob)
    # column metadata offset table
    cmo_start = len(out)
    for pos, size in cm_offsets:
        out += struct.pack("<QQ", pos, size)
    # global buffers: #0 = Arrow schema IPC (carries nested types exactly)
    schema_buf = table.schema.serialize().to_pybytes()
    gb_start = len(out)
    out.extend(schema_buf)
    gbo_start = len(out)
    out += struct.pack("<QQ", gb_start, len(schema_buf))
    out += struct.pack(
        "<QQQIIHH",
        cm_start,
        cmo_start,
        gbo_start,
        1,
        len(col_meta_blobs),
        _MAJOR,
        _MINOR,
    )
    out += MAGIC
    with open(path, "wb") as f:
        f.write(out)


def read_fragment(path: str) -> pa.Table:
    with open(path, "rb") as f:
        data = f.read()
    if data[-4:] != MAGIC:
        raise ValueError(f"{path}: not a Lance fragment (bad magic)")
    (
        cm_start,
        cmo_start,
        gbo_start,
        n_global,
        n_cols,
        major,
        minor,
    ) = struct.unpack("<QQQIIHH", data[-40:-4])
    if (major, minor) != (_MAJOR, _MINOR):
        raise ValueError(
            f"{path}: lance-mini reads only v{_MAJOR}.{_MINOR} fragments, "
            f"got v{major}.{minor}"
        )
    gb_pos, gb_size = struct.unpack("<QQ", data[gbo_start : gbo_start + 16])
    schema = pa.ipc.read_schema(pa.BufferReader(data[gb_pos : gb_pos + gb_size]))
    if len(schema) != n_cols:
        raise ValueError(f"{path}: schema/column-count mismatch")
    cols = []
    for ci in range(n_cols):
        pos, size = struct.unpack("<QQ", data[cmo_start + 16 * ci : cmo_start + 16 * ci + 16])
        nodes = []
        spans: list[tuple[int, int]] = []
        for num, wire, v in _walk_fields(data[pos : pos + size]):
            if num == 1:
                length = null_count = 0
                idxs: list[int] = []
                for n2, w2, v2 in _walk_fields(v):
                    if n2 == 1:
                        length = v2
                    elif n2 == 2:
                        null_count = v2
                    elif n2 == 3:
                        p = 0
                        while p < len(v2):
                            raw, p = _read_uvarint(v2, p)
                            idxs.append(_unzigzag(raw))
                nodes.append((length, null_count, idxs))
            elif num == 2:
                p = 0
                flat = []
                while p < len(v):
                    raw, p = _read_uvarint(v, p)
                    flat.append(raw)
                spans = [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]
        page_bufs = [pa.py_buffer(data[p0 : p0 + sz]) for p0, sz in spans]
        cursor = [0]
        cols.append(_rebuild(schema.field(ci).type, nodes, page_bufs, cursor))
    return pa.Table.from_arrays(cols, schema=schema)


# --- dataset directory (manifest + fragments) --------------------------------


def write_lance_mini(
    table: pa.Table, path: str, *, rows_per_fragment: int = 100_000
) -> None:
    """``table`` -> ``path`` (a ``NAME.lance`` DIRECTORY, per the Lance
    dataset layout: ``data/*.lance`` fragments + ``_versions/1.manifest``
    + ``_latest.manifest``)."""
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    os.makedirs(os.path.join(path, "_versions"), exist_ok=True)
    frags = []
    n = table.num_rows
    step = max(1, int(rows_per_fragment))
    for i, lo in enumerate(range(0, max(n, 1), step)):
        frag = table.slice(lo, min(step, n - lo)) if n else table
        name = f"frag-{i:05d}.lance"
        write_fragment(frag, os.path.join(path, "data", name))
        frags.append(name)
    m = bytearray()
    for name in frags:
        nb = name.encode()
        m += _field(1, 2) + _uvarint(len(nb)) + nb
    m += _field(2, 0) + _uvarint(n)
    schema_buf = table.schema.serialize().to_pybytes()
    m += _field(3, 2) + _uvarint(len(schema_buf)) + schema_buf
    m += _field(4, 0) + _uvarint(1)
    for mf in ("_versions/1.manifest", "_latest.manifest"):
        with open(os.path.join(path, mf), "wb") as f:
            f.write(m)


def read_manifest(path: str) -> tuple[list[str], int, pa.Schema]:
    with open(os.path.join(path, "_latest.manifest"), "rb") as f:
        data = f.read()
    files: list[str] = []
    num_rows = 0
    schema = None
    for num, wire, v in _walk_fields(data):
        if num == 1:
            files.append(v.decode())
        elif num == 2:
            num_rows = v
        elif num == 3:
            schema = pa.ipc.read_schema(pa.BufferReader(v))
    if schema is None:
        raise ValueError(f"{path}: manifest missing schema")
    return files, num_rows, schema


def is_lance_mini(path: str) -> bool:
    return os.path.isfile(os.path.join(path, "_latest.manifest"))


def read_lance_mini(path: str):
    """Lance-mini dataset dir -> Ray Dataset, one decode task per fragment
    (the distributed-read shape: the driver touches only the manifest)."""
    import ray.data as rd

    files, _num_rows, schema = read_manifest(path)
    paths = [os.path.join(path, "data", f) for f in files]

    def decode(batch: pa.Table) -> pa.Table:
        tabs = [read_fragment(p) for p in batch["path"].to_pylist()]
        return pa.concat_tables(tabs) if tabs else schema.empty_table()

    src = rd.from_items(
        [{"path": p} for p in paths], override_num_blocks=max(1, len(paths))
    )
    return src.map_batches(decode, batch_format="pyarrow", batch_size=1)
