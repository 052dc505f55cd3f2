"""Fused driver-side side-input collection (one pass per source).

The interpolation endpoint-tag map (ST3) and the places index (ST2) are both
small broadcast structures pulled from the same two materialized tables.
Collecting them separately costs four dataset executions; fusing the pulls
into one tagged pass per source halves the serial driver overhead — at
pipeline scale every execution costs ~0.5-1s of scheduling regardless of
data volume.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import ADDR_KEYS_7, tag_col


_TAG_COLS = [tag_col(k) for k in ADDR_KEYS_7]


def _ways_pass(t: pa.Table) -> pa.Table:
    """Pass 1 (ways_geo): interpolation endpoints + closed-way places."""
    interp = t.filter(
        pc.and_(pc.is_valid(t[tag_col("addr:interpolation")]), t["nonzero"])
    )
    ep = pa.table(
        {
            "tag": pa.array(np.zeros(interp.num_rows * 2, np.int8)),
            "id": pa.concat_arrays(
                [
                    interp["first_ref"].combine_chunks(),
                    interp["last_ref"].combine_chunks(),
                ]
            ),
            "lon": pa.nulls(interp.num_rows * 2, pa.float64()),
            "lat": pa.nulls(interp.num_rows * 2, pa.float64()),
            "name": pa.nulls(interp.num_rows * 2, pa.string()),
        }
    )
    wplace = t.filter(
        pc.and_(
            pc.and_(
                pc.is_valid(t[tag_col("place")]), pc.is_valid(t[tag_col("name")])
            ),
            pc.and_(t["is_closed"], t["nonzero"]),
        )
    )
    wp = pa.table(
        {
            "tag": pa.array(np.ones(wplace.num_rows, np.int8)),
            "id": wplace["way_id"].combine_chunks(),
            "lon": wplace["centroid_lon"].combine_chunks(),
            "lat": wplace["centroid_lat"].combine_chunks(),
            "name": wplace[tag_col("name")].combine_chunks(),
        }
    )
    return pa.concat_tables([ep, wp])


def _node_pass(t: pa.Table, ep: np.ndarray) -> pa.Table:
    """Pass 2 (parsed): endpoint node tags + node places. ``ep`` is the
    sorted endpoint-id array from pass 1 (a task argument, so Ray schedules
    this task only once pass 1's reduce is done)."""
    is_node = pc.equal(t["etype"], "node")
    nodes = t.filter(is_node)
    ids = nodes["osm_id"].to_numpy(zero_copy_only=False)
    if len(ep):
        pos = np.searchsorted(ep, ids).clip(0, max(len(ep) - 1, 0))
        is_ep = ep[pos] == ids
    else:
        is_ep = np.zeros(len(ids), bool)
    epn = nodes.filter(pa.array(is_ep))
    ept = pa.table(
        {
            "tag": pa.array(np.zeros(epn.num_rows, np.int8)),
            "id": epn["osm_id"].combine_chunks(),
            "lon": epn["lon"].combine_chunks(),
            "lat": epn["lat"].combine_chunks(),
            "name": pa.nulls(epn.num_rows, pa.string()),
            **{c: epn[c].combine_chunks() for c in _TAG_COLS},
        }
    )
    np_mask = pc.and_(
        pc.is_valid(nodes[tag_col("place")]), pc.is_valid(nodes[tag_col("name")])
    )
    pl = nodes.filter(np_mask)
    plt = pa.table(
        {
            "tag": pa.array(np.ones(pl.num_rows, np.int8)),
            "id": pl["osm_id"].combine_chunks(),
            "lon": pl["lon"].combine_chunks(),
            "lat": pl["lat"].combine_chunks(),
            "name": pl[tag_col("name")].combine_chunks(),
            **{c: pa.nulls(pl.num_rows, pa.string()) for c in _TAG_COLS},
        }
    )
    return pa.concat_tables([ept, plt])


def _reduce_ways_pass(*outs):
    """→ (sorted endpoint-id array, closed-way place table)."""
    tabs = [t for t in outs if t is not None and t.num_rows]
    if tabs:
        t1 = pa.concat_tables(tabs)
    else:
        t1 = pa.table(
            {
                "tag": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
                "name": pa.array([], pa.string()),
            }
        )
    tags1 = t1["tag"].to_numpy(zero_copy_only=False)
    ep_ids = t1["id"].to_numpy(zero_copy_only=False)[tags1 == 0]
    wayy_tab = t1.filter(pa.array(tags1 == 1))
    ep_sorted = (
        np.unique(ep_ids.astype(np.int64)) if len(ep_ids) else np.empty(0, np.int64)
    )
    return ep_sorted, wayy_tab


def _reduce_node_pass(wayy_tab: pa.Table, *outs):
    """→ (EndpointTagMap, PlacesIndex) — the two broadcast structures,
    built off-driver (the argsort + dictionary-encode reduction measured
    ~1s serial at the 768k-block corpus)."""
    from ..stages.match import PlacesIndex

    tabs = [t for t in outs if t is not None and t.num_rows]
    if tabs:
        t2 = pa.concat_tables(tabs)
    else:
        t2 = pa.table(
            {
                "tag": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
                "name": pa.array([], pa.string()),
                **{c: pa.array([], pa.string()) for c in _TAG_COLS},
            }
        )
    tags2 = t2["tag"].to_numpy(zero_copy_only=False)
    epb = t2.filter(pa.array(tags2 == 0))
    ep_ids2 = epb["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ep_ids2, kind="stable")
    # arrow-native sort: no object-matrix materialization (the per-column
    # to_numpy(object) conversion measured ~4s at 768k endpoints)
    ep_sorted_tab = (
        epb.select(_TAG_COLS).take(pa.array(order, pa.int64())).combine_chunks()
    )
    endpoint_tags = EndpointTagMap(ep_ids2[order], ep_sorted_tab)

    nody_tab = t2.filter(pa.array(tags2 == 1)).select(["id", "lon", "lat", "name"])
    places = PlacesIndex.from_dict(_places_from_tables(nody_tab, wayy_tab))
    return endpoint_tags, places


def collect_side_inputs_async(parsed_ds, ways_geo):
    """→ (endpoint_tags_ref, places_ref): the whole collection — two raw
    task waves over the materialized sources' block refs, plus both
    reductions — runs as a chained remote-task graph. The driver holds only
    ObjectRefs (which ``interpolation_stage`` / ``match_stage`` accept
    directly as the broadcast handle), so the collection overlaps the
    street/address pre-executions instead of serializing the spine.

    Both passes run as raw Ray tasks over block refs: inputs sit in the
    object store, the per-block outputs are tiny, and a Dataset execution +
    iter_batches stream here measured 1.4-2s of pure driver latency per
    pass at the 768k-block corpus vs ~0.2s for the task wave. Zero-row
    blocks are skipped (a lazy empty dataset's block refs can carry a
    degenerate pre-transform schema the pass fn must never see).
    """
    import ray

    wave1 = ray.remote(num_cpus=1)(
        lambda block: _ways_pass(block) if block.num_rows else None
    )
    p1 = [wave1.remote(r) for r in ways_geo.to_arrow_refs()]
    red1 = ray.remote(num_returns=2)(_reduce_ways_pass)
    ep_ref, wayy_ref = red1.remote(*p1)

    wave2 = ray.remote(num_cpus=1)(
        lambda block, ep: _node_pass(block, ep) if block.num_rows else None
    )
    p2 = [wave2.remote(r, ep_ref) for r in parsed_ds.to_arrow_refs()]
    red2 = ray.remote(num_returns=2)(_reduce_node_pass)
    et_ref, pl_ref = red2.remote(wayy_ref, *p2)
    return et_ref, pl_ref


def collect_side_inputs(parsed_ds, ways_geo):
    """Synchronous wrapper → (EndpointTagMap, PlacesIndex) values.

    Semantics identical to stages.interpolation.collect_endpoint_tags and
    stages.match.build_places_index (which remain for standalone use).
    """
    import ray

    et_ref, pl_ref = collect_side_inputs_async(parsed_ds, ways_geo)
    return ray.get(et_ref), ray.get(pl_ref)


def _places_from_tables(nody_tab: pa.Table, wayy_tab: pa.Table):
    """Vectorized build of {name: (nody (n,3) ndarray, wayy (m,3) ndarray)},
    rows sorted by id within each flavor (reference probe order).

    No per-group pandas iteration: dictionary-encode names, lexsort by
    (name code, id), slice at code boundaries — per-group cost is one
    ndarray view (pandas ``groupby`` iteration measured ~5s for 19k names)."""
    out_places: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    empty = np.empty((0, 3), np.float64)
    sides: list[dict[str, np.ndarray]] = []
    for tab in (nody_tab, wayy_tab):
        side: dict[str, np.ndarray] = {}
        if tab.num_rows:
            name_arr = pa.chunked_array([tab["name"]]).combine_chunks().dictionary_encode()
            codes = np.asarray(name_arr.indices)
            names = name_arr.dictionary.to_pylist()
            ids = tab["id"].to_numpy(zero_copy_only=False).astype(np.float64)
            lon = tab["lon"].to_numpy(zero_copy_only=False)
            lat = tab["lat"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, codes))
            data = np.column_stack((ids, lon, lat))[order]
            cs = codes[order]
            bounds = np.flatnonzero(cs[1:] != cs[:-1]) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(cs)]))
            for s, e in zip(starts.tolist(), ends.tolist()):
                side[names[cs[s]]] = data[s:e]
        sides.append(side)
    nody, wayy = sides
    for name in {**nody, **wayy}:
        out_places[name] = (nody.get(name, empty), wayy.get(name, empty))
    return out_places


class EndpointTagMap:
    """Columnar stand-in for dict[node_id -> {addr key: val}] (ST3).

    Sorted int64 id array + an Arrow table of the 7 addr tag columns in the
    same order; ``get`` does a binary search and materializes the tiny
    per-node dict on demand. Probes happen only for interpolation-way
    endpoints (sparse); construction, ``ray.put`` serialization and
    per-worker deserialization are all columnar/zero-copy (dict-of-dicts
    measured ~5s serial at 2.7M docs; an object value matrix ~4s at 11M).

    Scale note (>10^11 docs): this broadcast grows with interpolation-way
    count. The shuffle alternative documented at SURVEY §2.4 J3 — explode
    (way, which, endpoint_ref), hash-exchange against addr-tagged nodes on
    ref, re-exchange by way_id — drops in at ``interpolation_stage`` without
    touching the validator, which only consumes the two per-endpoint dicts.
    """

    __slots__ = ("ids", "tab", "_cols")

    def __init__(self, ids: np.ndarray, tab: pa.Table):
        self.ids = ids
        self.tab = tab
        self._cols = None

    def __len__(self) -> int:
        return len(self.ids)

    def __getstate__(self):
        return (self.ids, self.tab)

    def __setstate__(self, st):
        self.ids, self.tab = st
        self._cols = None

    def get(self, node_id, default=None):
        i = int(np.searchsorted(self.ids, node_id))
        if i >= len(self.ids) or self.ids[i] != node_id:
            return default
        if self._cols is None:
            self._cols = [self.tab.column(j) for j in range(self.tab.num_columns)]
        out = {}
        for k, col in zip(ADDR_KEYS_7, self._cols):
            v = col[i].as_py()
            if v is not None:
                out[k] = v
        return out

    def lookup_columns(self, node_ids: np.ndarray) -> pa.Table:
        """Vectorized lookup: node ids → one Arrow table with the 7 addr tag
        columns (null where the id is absent or the tag unset). The
        interpolation validator's column-oriented fast path."""
        node_ids = np.asarray(node_ids, np.int64)
        n = len(node_ids)
        if len(self.ids) == 0 or n == 0:
            return pa.table({k: pa.nulls(n, pa.string()) for k in ADDR_KEYS_7})
        pos = np.searchsorted(self.ids, node_ids).clip(0, len(self.ids) - 1)
        found = self.ids[pos] == node_ids
        idx = pa.array(pos, pa.int64(), mask=~found)  # null index -> null value
        return pa.table(
            {k: self.tab.column(j).take(idx) for j, k in enumerate(ADDR_KEYS_7)}
        )

    def get_batch(self, node_ids: np.ndarray) -> list[dict]:
        """Vectorized lookup: one searchsorted + 7 Arrow takes for a whole
        batch of node ids (the per-row ``get`` costs a binary search plus 7
        scalar ``as_py`` calls — the interpolation validator's former
        per-row tail). Missing ids map to {}."""
        node_ids = np.asarray(node_ids, np.int64)
        if len(self.ids) == 0 or len(node_ids) == 0:
            return [{} for _ in node_ids]
        pos = np.searchsorted(self.ids, node_ids).clip(0, len(self.ids) - 1)
        found = self.ids[pos] == node_ids
        import pyarrow as _pa

        take_idx = _pa.array(pos, _pa.int64())
        cols = [self.tab.column(j).take(take_idx).to_pylist() for j in range(self.tab.num_columns)]
        out: list[dict] = []
        for r in range(len(node_ids)):
            if not found[r]:
                out.append({})
                continue
            d = {}
            for k, col in zip(ADDR_KEYS_7, cols):
                v = col[r]
                if v is not None:
                    d[k] = v
            out.append(d)
        return out
