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


def collect_side_inputs(parsed_ds, ways_geo):
    """→ (endpoint_tags: {node_id: {addr key: val}}, places: {name: (nody, wayy)}).

    Pass 1 (ways_geo): interpolation endpoints + closed-way places.
    Pass 2 (parsed nodes): endpoint node tags + node places.
    Semantics identical to stages.interpolation.collect_endpoint_tags and
    stages.match.build_places_index (which remain for standalone use).
    """
    import ray

    # ---- pass 1: ways side (tagged union) ----
    def wf(t: pa.Table) -> pa.Table:
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

    # Both passes run as one wave of raw Ray tasks over the (already
    # materialized) source's block refs: inputs sit in the object store, the
    # per-block outputs are tiny, and a Dataset execution + iter_batches
    # stream here measured 1.4-2s of pure driver latency per pass at the
    # 768k-block corpus vs ~0.2s for the task wave. ALL reduction is
    # vectorized post-concat (per-batch python dict building measured ~5s
    # serial at 192k-block scale — the single argsort/groupby below is
    # ~100ms).
    # zero-row blocks can carry a degenerate (pre-transform) schema — a lazy
    # empty dataset's block refs surface the input schema, which the pass fn
    # must never see (map_batches simply skipped such blocks).
    _pass_task = ray.remote(num_cpus=1)(
        lambda fn, block: fn(block) if block.num_rows else None
    )

    def _drain(ds, fn) -> list[pa.Table]:
        fn_ref = ray.put(fn)
        outs = ray.get([_pass_task.remote(fn_ref, r) for r in ds.to_arrow_refs()])
        return [t for t in outs if t is not None and t.num_rows]

    pass1 = _drain(ways_geo, wf)
    t1 = (
        pa.concat_tables(pass1)
        if pass1
        else pa.table(
            {
                "tag": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
                "name": pa.array([], pa.string()),
            }
        )
    )
    tags1 = t1["tag"].to_numpy(zero_copy_only=False)
    ep_ids = t1["id"].to_numpy(zero_copy_only=False)[tags1 == 0]
    wayy_tab = t1.filter(pa.array(tags1 == 1))

    # ---- pass 2: node side ----
    ep_sorted = np.unique(ep_ids.astype(np.int64)) if len(ep_ids) else np.empty(0, np.int64)
    ep_ref = ray.put(ep_sorted)
    tag_cols = [tag_col(k) for k in ADDR_KEYS_7]

    def nf(t: pa.Table) -> pa.Table:
        import ray as _ray

        from ..state.broadcast import get_cached

        is_node = pc.equal(t["etype"], "node")
        nodes = t.filter(is_node)
        ep = get_cached(ep_ref)
        ids = nodes["osm_id"].to_numpy(zero_copy_only=False)
        if len(ep):
            pos = np.searchsorted(ep, ids).clip(0, max(len(ep) - 1, 0))
            is_ep = ep[pos] == ids if len(ep) else np.zeros(len(ids), bool)
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
                **{c: epn[c].combine_chunks() for c in tag_cols},
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
                **{c: pa.nulls(pl.num_rows, pa.string()) for c in tag_cols},
            }
        )
        return pa.concat_tables([ept, plt])

    pass2 = _drain(parsed_ds, nf)
    if pass2:
        t2 = pa.concat_tables(pass2)
    else:
        t2 = pa.table(
            {
                "tag": pa.array([], pa.int8()),
                "id": pa.array([], pa.int64()),
                "lon": pa.array([], pa.float64()),
                "lat": pa.array([], pa.float64()),
                "name": pa.array([], pa.string()),
                **{c: pa.array([], pa.string()) for c in tag_cols},
            }
        )
    tags2 = t2["tag"].to_numpy(zero_copy_only=False)
    epb = t2.filter(pa.array(tags2 == 0))
    ep_ids2 = epb["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ep_ids2, kind="stable")
    # arrow-native sort: no object-matrix materialization on the driver (the
    # per-column to_numpy(object) conversion measured ~4s at 768k endpoints)
    ep_sorted_tab = epb.select(tag_cols).take(pa.array(order, pa.int64())).combine_chunks()
    endpoint_tags = EndpointTagMap(ep_ids2[order], ep_sorted_tab)

    nody_tab = t2.filter(pa.array(tags2 == 1)).select(["id", "lon", "lat", "name"])
    out_places = _places_from_tables(nody_tab, wayy_tab)
    return endpoint_tags, out_places


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
