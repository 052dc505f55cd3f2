"""Interpolation subsystem: J3 endpoint-tag capture + validator + densifier.

Reference: InterpolationWriter.hpp:39-237 — for every way tagged
``addr:interpolation`` (that survives the pass-2 nonzero-length gate) a layer
row is ALWAYS emitted (:229); error-free ways additionally densify to
``is_ip=1`` address points that feed the street match and the
nodes_with_addresses layer.

Endpoint-tag capture (reference ST3: mutable ``node_map_type``,
SecondHandler.hpp:52-65) becomes a broadcast join: the endpoint-node id set is
tiny relative to the node table (interpolation ways are sparse in OSM), so we
collect {endpoint node id → 7 filtered addr tags} once on the driver
(a filtered, projected pull — NOT a full materialization) and ship it to the
validator tasks via ``ray.put``. Scale note: at planet scale this map is
O(#interpolation ways × 2) entries ≈ tens of MB; if a corpus ever breaks the
assumption, swap ``endpoint_tags_map`` for two distributed left joins on
first_ref/last_ref (the code is factored so only that function changes).

The error ladder is ported branch-for-branch, including its quirks:
- C unsigned-int arithmetic for housenumbers (atoi of negatives wraps);
- the alphabetic pre-branch errors (:93-118) can be OVERWRITTEN by later
  rungs (`different tags on endpoints`, `closed way`) because the C++ chain
  keeps evaluating (:128-160);
- ``endpoint has wrong format`` is skipped for alphabetic (:129);
- densification walks exclusive of endpoints with unsigned wraparound
  semantics (:190), linear-referencing each number along the way (:193-195).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..constants import ADDR_KEYS_7, ENDPOINT_COMPARE_KEYS, tag_col
from ..functions.housenumber import alphabetic_parts, atoi, is_plain_number
from ..schemas import INTERPOLATION_SCHEMA

U32 = 1 << 32

# address-point rows produced by densification (feed match + nwa)
IP_POINT_FIELDS = [
    pa.field("kind", pa.string()),  # "ip"
    pa.field("obj_id", pa.int64()),
    pa.field("lon", pa.float64()),
    pa.field("lat", pa.float64()),
    pa.field("street", pa.string()),
    pa.field("houseno", pa.string()),
    pa.field("postcode", pa.string()),
    pa.field("city", pa.string()),
    pa.field("country", pa.string()),
    pa.field("fulladdr", pa.string()),
    pa.field("place", pa.string()),
    pa.field("lastchange", pa.string()),
    # deterministic reference processing order (SURVEY ST4): ways phase,
    # interpolation way id, sub-phase 0 (ip before the way's own match),
    # generation index
    pa.field("ord0", pa.int32()),
    pa.field("ord1", pa.int64()),
    pa.field("ord2", pa.int32()),
    pa.field("ord3", pa.int32()),
]
IP_POINT_SCHEMA = pa.schema(IP_POINT_FIELDS)


def collect_endpoint_tags(parsed_ds, interp_ways_ds) -> dict[int, dict[str, str]]:
    """Driver-side small-side collection of endpoint node tags (see module
    docstring for the scale argument). Both pulls are filtered+projected."""
    endpoints = set()
    for b in interp_ways_ds.select_columns(["first_ref", "last_ref"]).iter_batches(
        batch_format="pyarrow"
    ):
        endpoints.update(b["first_ref"].to_pylist())
        endpoints.update(b["last_ref"].to_pylist())
    if not endpoints:
        return {}
    ep_arr = np.fromiter(endpoints, dtype=np.int64)
    ep_ref = ray.put(np.sort(ep_arr))

    cols = ["osm_id"] + [tag_col(k) for k in ADDR_KEYS_7]

    def filt(t: pa.Table) -> pa.Table:
        ids = t["osm_id"].to_numpy(zero_copy_only=False)
        ep = ray.get(ep_ref)
        mask = ep[np.searchsorted(ep, ids).clip(0, len(ep) - 1)] == ids
        return t.filter(pa.array(mask))

    nodes = (
        parsed_ds.filter(expr="etype == 'node'")
        .select_columns(cols)
        .map_batches(filt, batch_format="pyarrow")
    )
    # vectorized dict build: one pandas conversion, per-row dicts only for
    # nodes that actually carry tags (the driver loop must stay O(endpoints))
    out: dict[int, dict[str, str]] = {}
    for b in nodes.iter_batches(batch_format="pyarrow"):
        df = b.to_pandas()
        ids = df["osm_id"].to_numpy()
        recs = df[[tag_col(k) for k in ADDR_KEYS_7]].to_numpy(dtype=object)
        has_any = pd.notna(recs).any(axis=1) if len(df) else np.zeros(0, bool)
        for i in np.flatnonzero(has_any):
            out[int(ids[i])] = {
                k: v for k, v in zip(ADDR_KEYS_7, recs[i]) if v is not None and v == v
            }
        for i in np.flatnonzero(~has_any):
            out[int(ids[i])] = {}
    return out


def _u32(v: int) -> int:
    return v & (U32 - 1)


def _abs_diff(a: int, b: int) -> int:
    return a - b if a > b else b - a


def validate_and_densify(
    way_id: int,
    interpolation: str,
    xs: np.ndarray,
    ys: np.ndarray,
    first_id: int,
    last_id: int,
    is_closed: bool,
    lastchange: str,
    first_tags: dict[str, str],
    last_tags: dict[str, str],
):
    """One interpolation way → (layer_row_dict, [ip_point_dicts]).

    Exact port of the InterpolationWriter.hpp:39-237 control flow.
    """
    first_raw = first_tags.get("addr:housenumber", "")
    last_raw = last_tags.get("addr:housenumber", "")

    row = {
        "way_id": way_id,
        "typename": interpolation,
        "firstid": first_id,
        "lastid": last_id,
        "firstno": first_raw if first_raw != "" else None,
        "lastno": last_raw if last_raw != "" else None,
        "error": None,
        "lastchange": lastchange,
    }

    first = _u32(atoi(first_raw)) if first_raw != "" else 0
    last = _u32(atoi(last_raw)) if last_raw != "" else 0

    alpha_error = None
    is_alpha_ok = False
    first_numeric = ""
    if interpolation == "alphabetic":
        status, fa, la, fnum = alphabetic_parts(first_raw, last_raw)
        if status == "ok":
            first, last, first_numeric = fa, la, fnum
            is_alpha_ok = True
        elif status != "skip":
            alpha_error = status

    ip_points: list[dict] = []
    ladder_error = None
    if interpolation not in ("all", "even", "odd", "alphabetic"):
        ladder_error = "unknown interpolation type"
    elif interpolation != "alphabetic" and (
        first == 0
        or last == 0
        or not is_plain_number(first_raw, first)
        or not is_plain_number(last_raw, last)
    ):
        ladder_error = "endpoint has wrong format"
    elif _abs_diff(first, last) > 1000:
        ladder_error = "range too large"
    elif (interpolation in ("even", "odd") and _abs_diff(first, last) == 2) or (
        interpolation == "all" and _abs_diff(first, last) == 1
    ):
        ladder_error = "needless interpolation"
    elif interpolation == "even" and (first % 2 == 1 or last % 2 == 1):
        ladder_error = "interpolation even but number odd"
    elif interpolation == "odd" and (first % 2 == 0 or last % 2 == 0):
        ladder_error = "interpolation odd but number even"
    elif any(
        first_tags.get(k, "") != last_tags.get(k, "") for k in ENDPOINT_COMPARE_KEYS
    ):
        ladder_error = "different tags on endpoints"
    elif is_closed:
        ladder_error = "interpolation is a closed way"
    elif interpolation in ("all", "odd", "even") or is_alpha_ok:
        # densify (InterpolationWriter.hpp:161-227)
        coords = np.column_stack((xs, ys))
        seg = np.hypot(np.diff(xs), np.diff(ys))
        cum = np.concatenate(([0.0], np.cumsum(seg)))
        length = float(cum[-1])
        increment = 2 if interpolation in ("even", "odd") else 1
        if first == last:
            # Equal endpoint numbers (e.g. '4'->'4' even/all, or alphabetic
            # '2a'->'2a'): the C++ reference computes fraction = 1/0.0 = inf
            # (InterpolationWriter.hpp:170-176) and its densify loop
            # `nr < upper && nr > lower` with lower == upper never iterates —
            # an error-free layer row with zero ip points. Guard the Python
            # ZeroDivisionError and mirror that.
            fraction, lower, upper = 0.0, first, last
        elif first < last:
            fraction = 1.0 / (last - first)
            lower, upper = first, last
        else:
            fraction = 1.0 / (first - last)
            increment = -increment
            lower, upper = last, first

        nrs = []
        nr = _u32(first + increment)
        while lower < nr < upper:
            nrs.append(nr)
            nr = _u32(nr + increment)
        if nrs:
            nrs_np = np.array(nrs, dtype=np.float64)
            if increment > 0:
                dists = (nrs_np - lower) * fraction * length
            else:
                dists = (1.0 - ((nrs_np - lower) * fraction)) * length
            # vectorized OGRLineString::Value
            d = np.clip(dists, 0.0, length)
            i = np.clip(np.searchsorted(cum, d, side="right") - 1, 0, max(len(seg) - 1, 0))
            segi = np.where(seg[i] > 0, seg[i], 1.0)
            r = np.where(seg[i] > 0, (d - cum[i]) / segi, 0.0)
            px = coords[i, 0] + r * (coords[i + 1, 0] - coords[i, 0])
            py = coords[i, 1] + r * (coords[i + 1, 1] - coords[i, 1])
            for g, nr_v in enumerate(nrs):
                nrstr = (
                    str(nr_v)
                    if interpolation != "alphabetic"
                    else first_numeric + chr(nr_v)
                )
                ip_points.append(
                    {
                        "kind": "ip",
                        "obj_id": 0,
                        "lon": float(px[g]),
                        "lat": float(py[g]),
                        "street": first_tags.get("addr:street", ""),
                        "houseno": nrstr,
                        "postcode": first_tags.get("addr:postcode", ""),
                        "city": first_tags.get("addr:city", ""),
                        "country": first_tags.get("addr:country", ""),
                        "fulladdr": first_tags.get("addr:full", ""),
                        "place": first_tags.get("addr:place", ""),
                        "lastchange": "",
                        "ord0": 1,
                        "ord1": way_id,
                        "ord2": 0,
                        "ord3": g,
                    }
                )

    row["error"] = ladder_error if ladder_error is not None else alpha_error
    return row, ip_points


class InterpolationValidator:
    """Stateful validator: holds the broadcast endpoint-tag map, validates
    and densifies one batch of interpolation ways per call.

    Instantiated per worker process via the broadcast cache (ray.put once,
    one deserialization per worker) and run as stateless TASKS — interpolation
    ways are sparse, so an actor pool's startup cost dominates its benefit.

    Emits a union of layer rows (``__out=0``) and ip points (``__out=1``);
    the pipeline splits them with cheap filters after one materialization.
    """

    def __init__(self, endpoint_tags_ref):
        from ..state.broadcast import get_cached

        self.endpoint_tags = get_cached(endpoint_tags_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        rows: list[dict] = []
        points: list[dict] = []
        n = t.num_rows
        way_ids = t["way_id"].to_numpy(zero_copy_only=False)
        interp_vals = t[tag_col("addr:interpolation")].to_pylist()
        first_refs = t["first_ref"].to_numpy(zero_copy_only=False)
        last_refs = t["last_ref"].to_numpy(zero_copy_only=False)
        closed = t["is_closed"].to_numpy(zero_copy_only=False)
        lastchange = t["lastchange"].to_pylist()
        xs_col = t["xs"].combine_chunks() if isinstance(t["xs"], pa.ChunkedArray) else t["xs"]
        ys_col = t["ys"].combine_chunks() if isinstance(t["ys"], pa.ChunkedArray) else t["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        flat_x = np.asarray(xs_col.flatten(), np.float64)
        flat_y = np.asarray(ys_col.flatten(), np.float64)
        # batched endpoint-tag lookup (one searchsorted + 7 takes per side
        # instead of a binary search + 7 scalar as_py per row)
        if hasattr(self.endpoint_tags, "get_batch"):
            f_tags = self.endpoint_tags.get_batch(first_refs)
            l_tags = self.endpoint_tags.get_batch(last_refs)
        else:
            f_tags = [self.endpoint_tags.get(int(r), {}) or {} for r in first_refs]
            l_tags = [self.endpoint_tags.get(int(r), {}) or {} for r in last_refs]
        for i in range(n):
            xs = flat_x[offs[i] : offs[i + 1]]
            ys = flat_y[offs[i] : offs[i + 1]]
            row, ips = validate_and_densify(
                int(way_ids[i]),
                interp_vals[i],
                xs,
                ys,
                int(first_refs[i]),
                int(last_refs[i]),
                bool(closed[i]),
                lastchange[i],
                f_tags[i],
                l_tags[i],
            )
            rows.append(row)
            points.extend(ips)

        if rows:
            # one vectorized WKT pass for the whole batch (one layer row per
            # input way, in order) instead of a per-row f-string join
            from ..functions.wkt import lines_wkt_from_offsets

            attrs = pa.Table.from_pylist(
                rows,
                schema=pa.schema(
                    [f for f in INTERPOLATION_SCHEMA if f.name not in ("geom_type", "geom_wkt")]
                ),
            )
            wkt = lines_wkt_from_offsets(
                np.column_stack((flat_x, flat_y)), offs, polygon=False
            )
            layer = attrs.append_column(
                "geom_type", pa.array(["LINESTRING"] * n, pa.string())
            ).append_column("geom_wkt", wkt)
        else:
            layer = INTERPOLATION_SCHEMA.empty_table()
        pts = (
            pa.Table.from_pylist(points, schema=IP_POINT_SCHEMA)
            if points
            else IP_POINT_SCHEMA.empty_table()
        )
        # tagged union over superset schema
        out_fields = list(INTERPOLATION_SCHEMA) + [
            f for f in IP_POINT_SCHEMA if f.name not in INTERPOLATION_SCHEMA.names
        ]
        union_schema = pa.schema([pa.field("__out", pa.int8())] + out_fields)

        def align(tab: pa.Table, tag: int) -> pa.Table:
            arrays = [pa.array(np.full(tab.num_rows, tag, np.int8))]
            for f in union_schema:
                if f.name == "__out":
                    continue
                if f.name in tab.column_names:
                    arrays.append(tab[f.name].cast(f.type))
                else:
                    arrays.append(pa.nulls(tab.num_rows, f.type))
            return pa.Table.from_arrays(arrays, schema=union_schema)

        return pa.concat_tables([align(layer, 0), align(pts, 1)])


def interpolation_stage(ways_geo, endpoint_tags, *, concurrency=(1, 4)):
    # endpoint_tags: any mapping with .get(node_id, default) -> dict | None
    # (plain dict from collect_endpoint_tags, or the columnar EndpointTagMap
    # from pipelines.side_inputs at scale)
    """ways_geo → union dataset of interpolation layer rows (__out=0) and
    densified ip address points (__out=1). Caller materializes once and splits."""
    import pyarrow.compute as pc

    from ..ops import filter_batches

    interp = filter_batches(
        ways_geo,
        lambda t: pc.and_(pc.is_valid(t[tag_col("addr:interpolation")]), t["nonzero"]),
    )
    ref = ray.put(endpoint_tags)

    def run(t: pa.Table) -> pa.Table:
        return InterpolationValidator(ref)(t)

    return interp.map_batches(run, batch_format="pyarrow")
