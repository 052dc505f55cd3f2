"""Parse stage: interleaved docs → typed entity columns (zero-copy Arrow).

One vectorized ``map_batches`` pass over the input docs table. It only ADDS
sibling columns — ``doc_id`` and ``spans`` flow through byte-identical,
honoring the per-row span-sequence invariant (BASELINE.json ``input_hint``).

Replaces the reference's libosmium object stream + tag lookups
(main.cpp:73,87; AltTagList.hpp:11-25) with columnar extraction:

- entity header spans (``osm:node`` / ``osm:way``) → ``etype``, ``osm_id``
- ``geom`` spans → ``lon``, ``lat`` (float64)
- ``ref`` spans → ``refs`` (list<int64>, way order preserved)
- ``tag`` spans → one flat ``t_<key>`` string column per hot key
  (constants.PARSED_TAG_KEYS); absent tag = null
- ``meta`` spans → ``lastchange`` (ISO8601 string; "" when absent, matching
  osmium's ``Timestamp().to_iso()`` for the invalid timestamp)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import PARSED_TAG_KEYS, tag_col


def parse_docs_batch(batch: pa.Table) -> pa.Table:
    """Vectorized span parser; Arrow in / Arrow out."""
    n = batch.num_rows
    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    # ListArray internals: values + offsets → flat span fields + parent doc index.
    flat = spans.flatten()
    offs = np.asarray(spans.offsets)
    counts = np.diff(offs)
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)

    kind = flat.field("kind")
    text = flat.field("text")

    is_node_hdr = pc.equal(kind, "osm:node").to_numpy(zero_copy_only=False)
    is_way_hdr = pc.equal(kind, "osm:way").to_numpy(zero_copy_only=False)
    is_geom = pc.equal(kind, "geom").to_numpy(zero_copy_only=False)
    is_ref = pc.equal(kind, "ref").to_numpy(zero_copy_only=False)
    is_tag = pc.equal(kind, "tag").to_numpy(zero_copy_only=False)
    is_meta = pc.equal(kind, "meta").to_numpy(zero_copy_only=False)

    # --- entity type + id ---
    etype = np.full(n, None, dtype=object)
    osm_id = np.zeros(n, dtype=np.int64)
    hdr_mask = is_node_hdr | is_way_hdr
    hdr_parent = parent[hdr_mask]
    hdr_ids = pc.cast(text.filter(pa.array(hdr_mask)), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    hdr_is_node = is_node_hdr[hdr_mask]
    etype[hdr_parent[hdr_is_node]] = "node"
    etype[hdr_parent[~hdr_is_node]] = "way"
    osm_id[hdr_parent] = hdr_ids

    # --- node coordinates ("lon,lat") ---
    lon = np.full(n, np.nan, dtype=np.float64)
    lat = np.full(n, np.nan, dtype=np.float64)
    if is_geom.any():
        gm = pa.array(is_geom)
        gtxt = text.filter(gm)
        split = pc.split_pattern(gtxt, pattern=",", max_splits=1)
        glon = pc.cast(pc.list_element(split, 0), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        glat = pc.cast(pc.list_element(split, 1), pa.float64()).to_numpy(
            zero_copy_only=False
        )
        # libosmium location semantics: coordinates are int32 fixed-point at
        # 1e-7° (osmium::Location, round half away from zero). Quantizing at
        # parse time makes every downstream geometry (centroids, snaps,
        # densified points, lengths) match the reference bit-for-bit — the
        # reference engine cannot see more precision than this.
        glon = np.sign(glon) * np.floor(np.abs(glon) * 1e7 + 0.5) / 1e7
        glat = np.sign(glat) * np.floor(np.abs(glat) * 1e7 + 0.5) / 1e7
        gp = parent[is_geom]
        lon[gp] = glon
        lat[gp] = glat

    # --- way refs, order-preserving list reassembly ---
    ref_parent = parent[is_ref]
    ref_vals = pc.cast(text.filter(pa.array(is_ref)), pa.int64())
    ref_offsets = np.searchsorted(ref_parent, np.arange(n + 1), side="left").astype(
        np.int32
    )
    refs = pa.ListArray.from_arrays(pa.array(ref_offsets, pa.int32()), ref_vals)

    # --- tags → flat columns for the hot keys ---
    cols: dict[str, np.ndarray] = {}
    if is_tag.any():
        tm = pa.array(is_tag)
        ttxt = text.filter(tm)
        tsplit = pc.split_pattern(ttxt, pattern="=", max_splits=1)
        tkeys = pc.list_element(tsplit, 0)
        tvals = pc.list_element(tsplit, 1).to_numpy(zero_copy_only=False)
        tparent = parent[is_tag]
        for key in PARSED_TAG_KEYS:
            sel = pc.equal(tkeys, key).to_numpy(zero_copy_only=False)
            col = np.full(n, None, dtype=object)
            if sel.any():
                col[tparent[sel]] = tvals[sel]
            cols[tag_col(key)] = col
    else:
        for key in PARSED_TAG_KEYS:
            cols[tag_col(key)] = np.full(n, None, dtype=object)

    # --- lastchange ---
    lastchange = np.full(n, "", dtype=object)
    if is_meta.any():
        mtxt = text.filter(pa.array(is_meta)).to_numpy(zero_copy_only=False)
        lastchange[parent[is_meta]] = mtxt

    out = batch
    out = out.append_column("etype", pa.array(etype, pa.string()))
    out = out.append_column("osm_id", pa.array(osm_id, pa.int64()))
    out = out.append_column("lon", pa.array(lon, pa.float64()))
    out = out.append_column("lat", pa.array(lat, pa.float64()))
    out = out.append_column("refs", refs)
    out = out.append_column("lastchange", pa.array(lastchange, pa.string()))
    for name, col in cols.items():
        out = out.append_column(name, pa.array(col, pa.string()))
    return out


def parse_docs(ds, *, batch_size: int | None = None):
    """Apply the parse stage to a docs Dataset (stateless tasks)."""
    return ds.map_batches(parse_docs_batch, batch_format="pyarrow", batch_size=batch_size)
