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
import pandas as pd
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

    endpoints: set[int] = set()
    places: dict[str, tuple[list, list]] = {}
    for b in ways_geo.map_batches(wf, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        tags = b["tag"].to_numpy(zero_copy_only=False)
        ids = b["id"].to_numpy(zero_copy_only=False)
        ep_mask = tags == 0
        endpoints.update(ids[ep_mask].tolist())
        wp = b.filter(pa.array(tags == 1))
        if wp.num_rows:
            df = wp.to_pandas().sort_values("id", kind="stable")
            for name, g in df.groupby("name", sort=False):
                places.setdefault(name, ([], []))[1].extend(
                    zip(g["id"].tolist(), g["lon"].tolist(), g["lat"].tolist())
                )

    # ---- pass 2: node side ----
    ep_sorted = np.sort(np.fromiter(endpoints, dtype=np.int64)) if endpoints else np.empty(0, np.int64)
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

    endpoint_tags: dict[int, dict[str, str]] = {}
    for b in parsed_ds.map_batches(nf, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        tags = b["tag"].to_numpy(zero_copy_only=False)
        epb = b.filter(pa.array(tags == 0))
        if epb.num_rows:
            df = epb.to_pandas()
            ids = df["id"].to_numpy()
            recs = df[tag_cols].to_numpy(dtype=object)
            has_any = pd.notna(recs).any(axis=1)
            for i in np.flatnonzero(has_any):
                endpoint_tags[int(ids[i])] = {
                    k: v
                    for k, v in zip(ADDR_KEYS_7, recs[i])
                    if v is not None and v == v
                }
            for i in np.flatnonzero(~has_any):
                endpoint_tags[int(ids[i])] = {}
        plb = b.filter(pa.array(tags == 1))
        if plb.num_rows:
            df = plb.to_pandas().sort_values("id", kind="stable")
            for name, g in df.groupby("name", sort=False):
                places.setdefault(name, ([], []))[0].extend(
                    zip(g["id"].tolist(), g["lon"].tolist(), g["lat"].tolist())
                )

    out_places: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    for name, (nody, wayy) in places.items():
        nody.sort()
        wayy.sort()
        out_places[name] = (
            np.array(nody, dtype=np.float64).reshape(-1, 3),
            np.array(wayy, dtype=np.float64).reshape(-1, 3),
        )
    return endpoint_tags, out_places
