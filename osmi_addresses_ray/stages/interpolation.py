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
        ip_points = _densify_way(
            way_id, first, last, interpolation, first_numeric, xs, ys, first_tags
        )

    row["error"] = ladder_error if ladder_error is not None else alpha_error
    return row, ip_points


def _densify_way(
    way_id: int,
    first: int,
    last: int,
    interpolation: str,
    first_numeric: str,
    xs: np.ndarray,
    ys: np.ndarray,
    first_tags: dict[str, str],
) -> list[dict]:
    """Densify ONE error-free interpolation way (InterpolationWriter.hpp:161-227).

    Shared by the scalar reference path and the vectorized validator's
    alphabetic fallback; the vectorized numeric path reproduces these exact
    float expressions batched (see InterpolationValidator._densify_numeric).
    """
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
    ip_points: list[dict] = []
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
    return ip_points


def _tags_table(endpoint_tags, refs: np.ndarray) -> pa.Table:
    """node refs → Arrow table of the 7 addr tag columns (null = absent).

    Columnar fast path for EndpointTagMap; per-row dict fallback for the
    plain-dict map used by tests/tiny corpora."""
    if hasattr(endpoint_tags, "lookup_columns"):
        return endpoint_tags.lookup_columns(refs)
    cols: dict[str, list] = {k: [] for k in ADDR_KEYS_7}
    for r in refs:
        d = endpoint_tags.get(int(r), {}) or {}
        for k in ADDR_KEYS_7:
            cols[k].append(d.get(k))
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def _str_fill(tab: pa.Table, key: str) -> np.ndarray:
    """One tag column → object ndarray of str with null→'' (C-string view)."""
    import pyarrow.compute as pc

    return np.asarray(pc.fill_null(tab[key], "").to_pandas(), dtype=object)


def _vec_atoi_u32(raw: np.ndarray) -> np.ndarray:
    """Elementwise ``_u32(atoi(s))`` over an object array of strings.

    Same semantics as functions.housenumber.atoi (optional C whitespace,
    optional sign, leading digits else 0) masked to uint32 — vectorized via
    one regex extract; digit runs longer than 18 chars (int64 overflow) fall
    back to exact Python ints."""
    s = pd.Series(raw, dtype=object)
    ext = s.str.extract(r"^[ \t\n\r\v\f]*([+-]?[0-9]+)", expand=False)
    out = np.zeros(len(raw), np.int64)
    ok = ext.notna().to_numpy()
    if ok.any():
        vals = ext[ok]
        lens = vals.str.len().to_numpy()
        ok_idx = np.flatnonzero(ok)
        short = lens <= 18
        if short.any():
            out[ok_idx[short]] = vals[short].astype(np.int64).to_numpy() & np.int64(
                0xFFFFFFFF
            )
        for i, v in zip(ok_idx[~short], vals[~short]):
            out[i] = int(v) & 0xFFFFFFFF
    return out


def _vec_is_plain(raw: np.ndarray, val: np.ndarray) -> np.ndarray:
    """Elementwise is_plain_number: val > 0 and len(raw) == floor(log10)+1."""
    lens = np.fromiter((len(x) for x in raw), np.int64, len(raw))
    pos = val > 0
    dg = np.zeros(len(val), np.int64)
    if pos.any():
        dg[pos] = np.floor(np.log10(val[pos].astype(np.float64))).astype(np.int64) + 1
    return pos & (lens == dg)


_ERR_UNKNOWN = "unknown interpolation type"
_ERR_FORMAT = "endpoint has wrong format"
_ERR_RANGE = "range too large"
_ERR_NEEDLESS = "needless interpolation"
_ERR_EVEN_ODD = "interpolation even but number odd"
_ERR_ODD_EVEN = "interpolation odd but number even"
_ERR_TAGS = "different tags on endpoints"
_ERR_CLOSED = "interpolation is a closed way"


class InterpolationValidator:
    """Stateful validator: holds the broadcast endpoint-tag map, validates
    and densifies one batch of interpolation ways per call.

    Instantiated per worker process via the broadcast cache (ray.put once,
    one deserialization per worker) and run as stateless TASKS — interpolation
    ways are sparse, so an actor pool's startup cost dominates its benefit.

    The error ladder (InterpolationWriter.hpp:120-160) runs as pure column
    ops over the whole batch; densification of error-free numeric ways is
    vectorized grouped by vertex count (per-row ``cumsum(axis=1)`` keeps the
    float operation order identical to the per-way scalar path, so outputs
    are bit-for-bit equal to ``validate_and_densify``). Per-way Python
    remains only for ``alphabetic`` ways (rare; exercised by the testzone
    conformance corpus).

    Emits a union of layer rows (``__out=0``) and ip points (``__out=1``);
    the pipeline splits them with cheap filters after one materialization.
    """

    def __init__(self, endpoint_tags_ref):
        from ..state.broadcast import get_cached

        self.endpoint_tags = get_cached(endpoint_tags_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = t.num_rows
        way_ids = t["way_id"].to_numpy(zero_copy_only=False)
        interp_vals = np.asarray(t[tag_col("addr:interpolation")].to_pandas(), object)
        first_refs = t["first_ref"].to_numpy(zero_copy_only=False)
        last_refs = t["last_ref"].to_numpy(zero_copy_only=False)
        closed = t["is_closed"].to_numpy(zero_copy_only=False)
        xs_col = t["xs"].combine_chunks() if isinstance(t["xs"], pa.ChunkedArray) else t["xs"]
        ys_col = t["ys"].combine_chunks() if isinstance(t["ys"], pa.ChunkedArray) else t["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        flat_x = np.asarray(xs_col.flatten(), np.float64)
        flat_y = np.asarray(ys_col.flatten(), np.float64)

        fcols = [f"__f_{tag_col(k)}" for k in ADDR_KEYS_7]
        if all(c in t.column_names for c in fcols):
            # distributed mode: endpoint tags arrived as attached columns
            # (interpolation_stage_distributed) — no broadcast map probe
            f_tab = pa.table({k: t[f"__f_{tag_col(k)}"] for k in ADDR_KEYS_7})
            l_tab = pa.table({k: t[f"__l_{tag_col(k)}"] for k in ADDR_KEYS_7})
        else:
            f_tab = _tags_table(self.endpoint_tags, first_refs)
            l_tab = _tags_table(self.endpoint_tags, last_refs)
        fraw = _str_fill(f_tab, "addr:housenumber")
        lraw = _str_fill(l_tab, "addr:housenumber")

        # --- numeric parse (all rows; alphabetic rows overridden below) ---
        fval = _vec_atoi_u32(fraw)
        lval = _vec_atoi_u32(lraw)
        plain_f = _vec_is_plain(fraw, fval)
        plain_l = _vec_is_plain(lraw, lval)

        is_alpha = interp_vals == "alphabetic"
        alpha_err = np.full(n, None, object)
        alpha_ok = np.zeros(n, bool)
        first_numeric = np.full(n, "", object)
        for i in np.flatnonzero(is_alpha):
            status, fa, la, fnum = alphabetic_parts(str(fraw[i]), str(lraw[i]))
            if status == "ok":
                fval[i], lval[i], first_numeric[i] = fa, la, fnum
                alpha_ok[i] = True
            elif status != "skip":
                alpha_err[i] = status

        diff = np.abs(fval - lval)
        is_even = interp_vals == "even"
        is_odd = interp_vals == "odd"
        is_all = interp_vals == "all"
        known = is_even | is_odd | is_all | is_alpha

        # different-tags check over the 6 compare keys (null→"" like the
        # scalar dict .get(k, ""))
        tags_differ = np.zeros(n, bool)
        for k in ENDPOINT_COMPARE_KEYS:
            tags_differ |= np.asarray(
                pc.not_equal(
                    pc.fill_null(f_tab[k], ""), pc.fill_null(l_tab[k], "")
                ).to_numpy(zero_copy_only=False)
            )

        # --- the ladder, exact branch order (InterpolationWriter.hpp:120-160)
        conds = [
            ~known,
            ~is_alpha & ((fval == 0) | (lval == 0) | ~plain_f | ~plain_l),
            diff > 1000,
            ((is_even | is_odd) & (diff == 2)) | (is_all & (diff == 1)),
            is_even & ((fval % 2 == 1) | (lval % 2 == 1)),
            is_odd & ((fval % 2 == 0) | (lval % 2 == 0)),
            tags_differ,
            np.asarray(closed, bool),
        ]
        errs = [
            _ERR_UNKNOWN, _ERR_FORMAT, _ERR_RANGE, _ERR_NEEDLESS,
            _ERR_EVEN_ODD, _ERR_ODD_EVEN, _ERR_TAGS, _ERR_CLOSED,
        ]
        error = np.full(n, None, object)
        unset = np.ones(n, bool)
        for cond, e in zip(conds, errs):
            hit = unset & cond
            error[hit] = e
            unset &= ~cond
        # ladder error wins; otherwise the alphabetic pre-branch error
        error[unset & (alpha_err != None)] = alpha_err[unset & (alpha_err != None)]  # noqa: E711

        densify = unset & ((is_even | is_odd | is_all) | alpha_ok)

        # --- vectorized densification (numeric ways, grouped by #vertices) --
        pt_cols = self._densify_numeric(
            densify & ~is_alpha, fval, lval, is_all, way_ids, offs, flat_x, flat_y, f_tab
        )

        # --- alphabetic densification: scalar fallback (rare) ---
        points_alpha: list[dict] = []
        for i in np.flatnonzero(densify & is_alpha):
            points_alpha.extend(
                _densify_way(
                    int(way_ids[i]),
                    int(fval[i]),
                    int(lval[i]),
                    "alphabetic",
                    str(first_numeric[i]),
                    flat_x[offs[i] : offs[i + 1]],
                    flat_y[offs[i] : offs[i + 1]],
                    {
                        k: v
                        for k, v in zip(
                            ADDR_KEYS_7,
                            (f_tab[k][i].as_py() for k in ADDR_KEYS_7),
                        )
                        if v is not None
                    },
                )
            )

        # --- layer table (one row per way, batch order) ---
        from ..functions.wkt import lines_wkt_from_offsets

        firstno = pa.array(np.where(fraw == "", None, fraw), pa.string())
        lastno = pa.array(np.where(lraw == "", None, lraw), pa.string())
        layer = pa.Table.from_arrays(
            [
                pa.array(way_ids, pa.int64()),
                pa.array(interp_vals, pa.string()),
                pa.array(first_refs, pa.int64()),
                pa.array(last_refs, pa.int64()),
                firstno,
                lastno,
                pa.array(error, pa.string()),
                t["lastchange"].combine_chunks()
                if isinstance(t["lastchange"], pa.ChunkedArray)
                else t["lastchange"],
                pa.array(["LINESTRING"] * n, pa.string()),
                lines_wkt_from_offsets(
                    np.column_stack((flat_x, flat_y)), offs, polygon=False
                ),
            ],
            schema=INTERPOLATION_SCHEMA,
        )
        pts_alpha = (
            pa.Table.from_pylist(points_alpha, schema=IP_POINT_SCHEMA)
            if points_alpha
            else IP_POINT_SCHEMA.empty_table()
        )
        pts = pa.concat_tables([pt_cols, pts_alpha]) if pt_cols.num_rows else pts_alpha
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


    @staticmethod
    def _densify_numeric(
        mask: np.ndarray,
        fval: np.ndarray,
        lval: np.ndarray,
        is_all: np.ndarray,
        way_ids: np.ndarray,
        offs: np.ndarray,
        flat_x: np.ndarray,
        flat_y: np.ndarray,
        f_tab: pa.Table,
    ) -> pa.Table:
        """Vectorized densification of error-free even/odd/all ways.

        Bit-parity with ``_densify_way``: all float expressions are the same
        elementwise ops; the only grouping-sensitive ops — per-way cumsum and
        searchsorted — run grouped by vertex count so ``cumsum(axis=1)``
        accumulates in the identical per-way order, and searchsorted(side=
        'right') is reproduced as ``(cum <= d).sum(axis=1) - 1``.
        """
        import pyarrow.compute as pc

        D = np.flatnonzero(mask)
        if len(D) == 0:
            return IP_POINT_SCHEMA.empty_table()
        f = fval[D]
        l = lval[D]
        inc = np.where(is_all[D], 1, 2).astype(np.int64)
        k = np.abs(f - l)
        c = np.maximum((k - 1) // inc, 0)  # generated points per way
        has = c > 0
        D, f, l, inc, k, c = D[has], f[has], l[has], inc[has], k[has], c[has]
        if len(D) == 0:
            return IP_POINT_SCHEMA.empty_table()
        nv = (offs[D + 1] - offs[D]).astype(np.int64)
        take_d = pa.array(D, pa.int64())
        tag_keys = (
            "addr:street", "addr:postcode", "addr:city",
            "addr:country", "addr:full", "addr:place",
        )
        tagv = {
            key: np.asarray(
                pc.fill_null(f_tab[key], "").take(take_d).to_pandas(), object
            )
            for key in tag_keys
        }

        chunks: list[dict[str, np.ndarray]] = []
        for count in np.unique(nv):
            sel = np.flatnonzero(nv == count)
            m = len(sel)
            vidx = offs[D[sel]][:, None] + np.arange(int(count))[None, :]
            X = flat_x[vidx]
            Y = flat_y[vidx]
            seg2 = np.hypot(np.diff(X, axis=1), np.diff(Y, axis=1))
            cum2 = np.concatenate([np.zeros((m, 1)), np.cumsum(seg2, axis=1)], axis=1)
            length = cum2[:, -1]
            csel = c[sel]
            total = int(csel.sum())
            w = np.repeat(np.arange(m), csel)
            g = np.arange(total) - np.repeat(np.cumsum(csel) - csel, csel)
            fw = f[sel][w]
            asc = fw < l[sel][w]
            nr = np.where(asc, fw + inc[sel][w] * (g + 1), fw - inc[sel][w] * (g + 1))
            lower = np.minimum(fw, l[sel][w])
            fraction = 1.0 / k[sel][w].astype(np.float64)
            nrf = nr.astype(np.float64)
            lw = length[w]
            dists = np.where(
                asc, (nrf - lower) * fraction, 1.0 - ((nrf - lower) * fraction)
            ) * lw
            d = np.clip(dists, 0.0, lw)
            i = (cum2[w] <= d[:, None]).sum(axis=1) - 1
            i = np.clip(i, 0, max(int(count) - 2, 0))
            seg_i = seg2[w, i]
            segi = np.where(seg_i > 0, seg_i, 1.0)
            r = np.where(seg_i > 0, (d - cum2[w, i]) / segi, 0.0)
            px = X[w, i] + r * (X[w, np.minimum(i + 1, int(count) - 1)] - X[w, i])
            py = Y[w, i] + r * (Y[w, np.minimum(i + 1, int(count) - 1)] - Y[w, i])
            chunk = {
                "lon": px,
                "lat": py,
                "houseno": nr.astype(str).astype(object),
                "ord1": way_ids[D[sel]][w],
                "ord3": g.astype(np.int32),
            }
            for key in tag_keys:
                chunk[key] = tagv[key][sel][w]
            chunks.append(chunk)

        cat = {kk: np.concatenate([ch[kk] for ch in chunks]) for kk in chunks[0]}
        npts = len(cat["lon"])
        return pa.Table.from_arrays(
            [
                pa.array(["ip"] * npts, pa.string()),
                pa.array(np.zeros(npts, np.int64), pa.int64()),
                pa.array(cat["lon"], pa.float64()),
                pa.array(cat["lat"], pa.float64()),
                pa.array(cat["addr:street"], pa.string()),
                pa.array(cat["houseno"], pa.string()),
                pa.array(cat["addr:postcode"], pa.string()),
                pa.array(cat["addr:city"], pa.string()),
                pa.array(cat["addr:country"], pa.string()),
                pa.array(cat["addr:full"], pa.string()),
                pa.array(cat["addr:place"], pa.string()),
                pa.array([""] * npts, pa.string()),
                pa.array(np.ones(npts, np.int32), pa.int32()),
                pa.array(cat["ord1"], pa.int64()),
                pa.array(np.zeros(npts, np.int32), pa.int32()),
                pa.array(cat["ord3"], pa.int32()),
            ],
            schema=IP_POINT_SCHEMA,
        )


NODE_TAGS_SCHEMA = pa.schema(
    [pa.field("osm_id", pa.int64())]
    + [pa.field(tag_col(k), pa.string()) for k in ADDR_KEYS_7]
)


def _attach_endpoint_cols(prefix: str):
    """cogroup fn: left-join a partition of interpolation ways against the
    co-partitioned endpoint-node tag rows, appending ``__{prefix}_<tagcol>``
    string columns (null on miss — identical to an absent/untagged node)."""
    import pyarrow.compute as pc

    tcols = [tag_col(k) for k in ADDR_KEYS_7]
    key = "first_ref" if prefix == "f" else "last_ref"

    def fn(interp_part: pa.Table, nodes_part: pa.Table) -> pa.Table:
        n = interp_part.num_rows
        refs = interp_part[key].to_numpy(zero_copy_only=False)
        out = interp_part
        if nodes_part.num_rows == 0 or n == 0:
            for c in tcols:
                out = out.append_column(f"__{prefix}_{c}", pa.nulls(n, pa.string()))
            return out
        nid = nodes_part["osm_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(nid, kind="stable")
        nid_s = nid[order]
        pos = np.searchsorted(nid_s, refs).clip(0, len(nid_s) - 1)
        hit = nid_s[pos] == refs
        take = pa.array(np.where(hit, order[pos], 0), pa.int64())
        hit_arr = pa.array(hit)
        for c in tcols:
            col = nodes_part[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = pc.if_else(hit_arr, col.take(take), pa.nulls(n, pa.string()))
            out = out.append_column(f"__{prefix}_{c}", vals)
        return out

    return fn


def interpolation_stage_distributed(parsed_ds, ways_geo, *, num_parts: int = 16):
    """SURVEY J3 scale fallback for the endpoint-tag broadcast (ST3): when
    the endpoint-tag map exceeds the broadcast budget, capture endpoint tags
    with two hash-partitioned left joins on first_ref / last_ref (reference
    semantics: InterpolationWriter.hpp:59-70) instead of a driver-collected
    map. Only nodes carrying at least one of the 7 addr keys enter the
    exchange — for the ladder an untagged endpoint is indistinguishable from
    an absent one — so the shuffle moves O(tagged nodes + interpolation
    ways), never O(nodes). Output is identical to ``interpolation_stage``.
    """
    import pyarrow.compute as pc

    from ..ops import direct_cogroup, filter_batches

    interp = filter_batches(
        ways_geo,
        lambda t: pc.and_(pc.is_valid(t[tag_col("addr:interpolation")]), t["nonzero"]),
    )
    interp_schema = _dataset_schema(ways_geo)

    cols = ["osm_id"] + [tag_col(k) for k in ADDR_KEYS_7]

    def tagged_only(t: pa.Table) -> pa.Table:
        mask = None
        for k in ADDR_KEYS_7:
            v = pc.is_valid(t[tag_col(k)])
            mask = v if mask is None else pc.or_(mask, v)
        return t.filter(mask)

    tagged_nodes = (
        parsed_ds.filter(expr="etype == 'node'")
        .select_columns(cols)
        .map_batches(tagged_only, batch_format="pyarrow")
        .materialize()  # consumed by both joins
    )

    cg1 = direct_cogroup(
        [interp, tagged_nodes],
        [["first_ref"], ["osm_id"]],
        num_parts,
        _attach_endpoint_cols("f"),
        [interp_schema, NODE_TAGS_SCHEMA],
        emit_partitioned_on=["last_ref"],  # shuffle chaining into join #2
    )
    schema1 = pa.schema(
        list(interp_schema)
        + [pa.field(f"__f_{tag_col(k)}", pa.string()) for k in ADDR_KEYS_7]
    )
    cg2 = direct_cogroup(
        [cg1, tagged_nodes],
        [["last_ref"], ["osm_id"]],
        num_parts,
        _attach_endpoint_cols("l"),
        [schema1, NODE_TAGS_SCHEMA],
    )
    ref = ray.put({})  # validator reads the attached columns, never the map

    def run(t: pa.Table) -> pa.Table:
        return InterpolationValidator(ref)(t)

    return cg2.map_batches(run, batch_format="pyarrow")


def _dataset_schema(ds) -> pa.Schema:
    s = ds.schema()
    return getattr(s, "base_schema", s)


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
    # an ObjectRef (collect_side_inputs_async) is already the broadcast
    # handle — re-putting would force a driver-side ray.get of the map
    ref = (
        endpoint_tags
        if isinstance(endpoint_tags, ray.ObjectRef)
        else ray.put(endpoint_tags)
    )

    def run(t: pa.Table) -> pa.Table:
        return InterpolationValidator(ref)(t)

    return interp.map_batches(run, batch_format="pyarrow")


def interp_union_schema() -> pa.Schema:
    """The validator's tagged-union output schema, statically (layer rows
    ``__out=0`` + ip points ``__out=1`` over the superset columns)."""
    out_fields = list(INTERPOLATION_SCHEMA) + [
        f for f in IP_POINT_SCHEMA if f.name not in INTERPOLATION_SCHEMA.names
    ]
    return pa.schema([pa.field("__out", pa.int8())] + out_fields)


def interpolation_stage_raw(ways_geo, endpoint_tags) -> tuple[list, pa.Schema]:
    """``interpolation_stage`` as a RAW-TASK wave over the materialized
    ``ways_geo`` block refs → (block refs, union schema) — the round-5
    e2e fixed-term cut.

    The Dataset-plan formulation pays an executor launch plus a driver
    materialize barrier before anything downstream can even be planned —
    and even ``rd.from_arrow_refs`` BARRIERS (it ray.gets a metadata task
    per ref). Returning the bare refs instead lets the match exchange
    consume them as an ``ops.RawRefs`` source whose split tasks chain on
    OBJECT availability: interpolation and the match split wave overlap
    with no driver sync at all. Row-identical to ``interpolation_stage``
    (parity asserted in tests/test_interpolation.py); every consumer reads
    the same refs, so the validator still runs once per block.
    """
    ref = (
        endpoint_tags
        if isinstance(endpoint_tags, ray.ObjectRef)
        else ray.put(endpoint_tags)
    )
    schema = interp_union_schema()
    col = tag_col("addr:interpolation")

    @ray.remote
    def run(block: pa.Table, ref_holder: list) -> pa.Table:
        import pyarrow.compute as pc

        if block.num_rows == 0 or col not in block.column_names:
            return schema.empty_table()
        t = block.filter(pc.and_(pc.is_valid(block[col]), block["nonzero"]))
        if t.num_rows == 0:
            return schema.empty_table()
        return InterpolationValidator(ref_holder[0])(t)

    # ref rides in a list so Ray does NOT auto-deref it (the validator's
    # per-worker broadcast cache is keyed by the ref)
    refs = [run.remote(b, [ref]) for b in ways_geo.to_arrow_refs()]
    return refs, schema


def interpolation_stage_refs(ways_geo, endpoint_tags):
    """Dataset wrapper over ``interpolation_stage_raw`` (tests / callers
    that want a Dataset and can afford the from_arrow_refs barrier)."""
    import ray.data as rd

    refs, _schema = interpolation_stage_raw(ways_geo, endpoint_tags)
    return rd.from_arrow_refs(refs)
