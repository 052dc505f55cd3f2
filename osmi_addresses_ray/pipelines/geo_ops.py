"""Extra geospatial operators over the address-point / way-geometry layers.

Four operator families the reference's SpatiaLite consumers run as ad-hoc
spatial SQL, rebuilt Ray-Data-first (north_rule: spatial-join + tiling engine
— kNN, PIP, raster↔vector are elsewhere; this module adds the radius
self-join, density clustering, geometry simplification and per-cell convex
summaries):

- ``radius_pairs``         — all point pairs within R, cell-bucketed with a
                             3×3 neighbor replication of the probe side; one
                             hash exchange, each qualifying pair emitted
                             EXACTLY once (proof in the docstring).
- ``spatial_clusters``     — single-linkage radius clustering (DBSCAN with
                             minPts=1): radius graph → the repo's
                             large-star/small-star connected components.
- ``douglas_peucker`` /
  ``simplify_ways``        — classic DP line simplification with EXACT
                             integer rational comparisons (cross² vs
                             ε²·len²), per-way inside ``map_batches``.
- ``convex_hulls``         — per-cell convex hull via the MERGEABLE
                             hull-of-hulls combiner: each batch emits only
                             its partial hull (O(h) rows), one cell-keyed
                             exchange finishes — the full point set never
                             shuffles.

All geometry is in libosmium-quantized integer coordinates (1e-7°,
``stages/parse.py``), so every comparison here is integer-exact and the
DuckDB / naive-Python oracles can reproduce results bit-for-bit.

Scale notes (100 TB): the radius join's bucket width equals R, so a pair's
two endpoints are never more than one cell apart — replication is a constant
9× of the probe side only, and the exchange key is the cell id (same key the
flagship J2 match uses, so a fused pipeline re-uses the co-location). Skewed
(urban) cells are the documented risk: the per-cell candidate count is
quadratic, so ``cell_cap`` RAISES (no silent truncation) and the remedy is
the same salting used for mega-cells in the match stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

QUANT = 10_000_000  # 1e-7° integer quantization (libosmium scale)
_CELL_BIAS = 1 << 25
_CENTROID_PID_BASE = 10_000_000  # building-centroid rows get way_id + base

_POINT_SCHEMA = pa.schema([("pid", pa.int64()), ("ix", pa.int64()), ("iy", pa.int64())])
_EMIT_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()),
        ("side", pa.int8()),
        ("pid", pa.int64()),
        ("ix", pa.int64()),
        ("iy", pa.int64()),
    ]
)
_PAIR_SCHEMA = pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()), ("dist2", pa.int64())])
_HULL_PART_SCHEMA = pa.schema(
    [
        ("cell_x", pa.int64()),
        ("cell_y", pa.int64()),
        ("ix", pa.int64()),
        ("iy", pa.int64()),
        ("cnt", pa.int64()),
    ]
)
_HULL_OUT_SCHEMA = pa.schema(
    [
        ("cell_x", pa.int64()),
        ("cell_y", pa.int64()),
        ("n_pts", pa.int64()),
        ("n_hull", pa.int64()),
        ("area2", pa.int64()),
    ]
)


# --------------------------------------------------------------------------
# point extraction from the nodes_with_addresses layer
# --------------------------------------------------------------------------

def _points_table(t: pa.Table) -> pa.Table:
    """nwa batch → distinct (pid, ix, iy): real address points only
    (is_ip == 0), pid = node_id for nodes, way_id + 1e7 for the
    building-centroid rows (node_id null there). Mirrored by the oracle SQL
    (COALESCE + the same bias)."""
    import pyarrow.compute as pc

    s = t.filter(pc.equal(t["is_ip"], 0))
    node = s["node_id"].to_numpy(zero_copy_only=False)
    way = s["way_id"].to_numpy(zero_copy_only=False)
    pid = np.where(np.isnan(node), _CENTROID_PID_BASE + way, node).astype(np.int64)
    ix = np.round(s["lon"].to_numpy(zero_copy_only=False) * QUANT).astype(np.int64)
    iy = np.round(s["lat"].to_numpy(zero_copy_only=False) * QUANT).astype(np.int64)
    out = pa.table({"pid": pa.array(pid), "ix": pa.array(ix), "iy": pa.array(iy)})
    # distinct within the batch; cross-batch dupes impossible (one nwa row
    # per source entity), asserted cheap here rather than trusted
    return out.group_by(["pid", "ix", "iy"]).aggregate([]).cast(_POINT_SCHEMA)


def points_from_nwa(nwa_ds):
    """nodes_with_addresses layer Dataset → (pid, ix, iy) point Dataset."""
    return nwa_ds.map_batches(_points_table, batch_format="pyarrow")


# --------------------------------------------------------------------------
# radius self-join
# --------------------------------------------------------------------------

def _cell_key(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    """Biased int64 pack of a (possibly negative) cell coordinate pair."""
    return (cx + _CELL_BIAS) * (1 << 26) + (cy + _CELL_BIAS)


def radius_pairs(points_ds, *, radius: int, num_parts: int = 8, cell_cap: int = 100_000):
    """All unordered point pairs with squared distance ≤ radius² (integer
    units), emitted exactly once as (id_a < id_b, dist2).

    Shape: bucket width = radius, so any qualifying pair sits in the same or
    an adjacent cell. Each point is emitted once as a LEFT row in its home
    cell and 9× as a RIGHT row into the 3×3 neighborhood; per cell the
    (left × right) product is swept vectorized. Uniqueness proof: pair
    (a, b) with a.pid < b.pid is produced only where a is a LEFT row — a is
    LEFT exactly once (its home cell), and b's replica is present there
    because |cell(a) − cell(b)| ≤ 1 per axis; the mirrored candidate in
    cell(b) fails the pid ordering. One hash exchange on the cell id.

    ``cell_cap`` bounds the per-cell product and RAISES when exceeded (the
    repo's no-silent-caps rule) — at that density the caller should shrink
    the radius or salt the hot cell like the J2 mega-cell path.
    """
    from ..ops import direct_cogroup

    r2 = int(radius) * int(radius)

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMIT_SCHEMA.empty_table()
        pid = t["pid"].to_numpy(zero_copy_only=False)
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        cx = ix // radius
        cy = iy // radius
        n = len(pid)
        # home (left) rows
        home = _cell_key(cx, cy)
        # 3×3 replica (right) rows — outer add against the 9 offset pairs,
        # row-major ravel matching np.repeat(pid, 9) below
        dxy = np.array([-1, 0, 1], dtype=np.int64)
        offx = np.repeat(dxy, 3)
        offy = np.tile(dxy, 3)
        rep = _cell_key((cx[:, None] + offx[None, :]).ravel(),
                        (cy[:, None] + offy[None, :]).ravel())
        cell = np.concatenate([home, rep])
        side = np.concatenate(
            [np.zeros(n, np.int8), np.ones(9 * n, np.int8)]
        )
        pid9 = np.concatenate([pid, np.repeat(pid, 9)])
        ix9 = np.concatenate([ix, np.repeat(ix, 9)])
        iy9 = np.concatenate([iy, np.repeat(iy, 9)])
        return pa.table(
            {
                "cell": pa.array(cell),
                "side": pa.array(side),
                "pid": pa.array(pid9),
                "ix": pa.array(ix9),
                "iy": pa.array(iy9),
            }
        )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _PAIR_SCHEMA.empty_table()
        cell = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        pid = t["pid"].to_numpy(zero_copy_only=False)
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cell))
        cell, side, pid, ix, iy = cell[order], side[order], pid[order], ix[order], iy[order]
        new = np.empty(len(cell), bool)
        new[0] = True
        new[1:] = cell[1:] != cell[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(cell))
        nl = np.add.reduceat((side == 0).astype(np.int64), starts)
        nc = ends - starts
        nr = nc - nl
        if int((nl * nr).max(initial=0)) > cell_cap:
            raise RuntimeError(
                f"radius_pairs: a cell's candidate product exceeds cell_cap={cell_cap}; "
                "shrink the radius or salt the hot cell"
            )
        # per-left expansion: lefts are the side==0 rows (sorted first per cell)
        left_idx = np.flatnonzero(side == 0)
        spans = np.repeat(nr, nl)  # candidate count for each left row
        total = int(spans.sum())
        if total == 0:
            return _PAIR_SCHEMA.empty_table()
        right_start = np.repeat(starts + nl, nl)
        cum = np.cumsum(spans) - spans
        inner = np.arange(total, dtype=np.int64) - np.repeat(cum, spans)
        li = np.repeat(left_idx, spans)
        ri = np.repeat(right_start, spans) + inner
        dx = ix[li] - ix[ri]
        dy = iy[li] - iy[ri]
        d2 = dx * dx + dy * dy
        keep = (d2 <= r2) & (pid[li] < pid[ri])
        return pa.table(
            {
                "id_a": pa.array(pid[li][keep]),
                "id_b": pa.array(pid[ri][keep]),
                "dist2": pa.array(d2[keep]),
            }
        )

    emitted = points_ds.map_batches(emit, batch_format="pyarrow").materialize()
    return direct_cogroup([emitted], [["cell"]], num_parts, sweep, [_EMIT_SCHEMA])


# --------------------------------------------------------------------------
# single-linkage radius clustering
# --------------------------------------------------------------------------

def cluster_points(points_ds, *, radius: int, num_parts: int = 8):
    """(pid, cluster_id) for every point: cluster = min pid of its
    radius-graph connected component (self when isolated). Radius graph via
    ``radius_pairs``, components via the repo's star-contraction
    ``connected_components`` (O(log² n) node-keyed exchanges over the edge
    list only), final assignment one pid-keyed cogroup of points × star
    edges — the point set shuffles exactly once."""
    from ..ops import direct_cogroup
    from .dedup import connected_components

    points = points_ds.materialize()
    pairs = radius_pairs(points, radius=radius, num_parts=num_parts)

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["id_a"], "v": t["id_b"]})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    stars = connected_components(edges, num_parts=num_parts)

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    out_schema = pa.schema([("pid", pa.int64()), ("cluster_id", pa.int64())])

    def assign(pts_t: pa.Table, stars_t: pa.Table) -> pa.Table:
        ids = pts_t["pid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        rep = ids.copy()
        if stars_t.num_rows:
            child = stars_t["u"].to_numpy(zero_copy_only=False)
            root = stars_t["v"].to_numpy(zero_copy_only=False)
            order = np.argsort(child, kind="stable")
            child, root = child[order], root[order]
            pos = np.clip(np.searchsorted(child, ids), 0, len(child) - 1)
            hit = child[pos] == ids
            rep[hit] = root[pos[hit]]
        return pa.table({"pid": pa.array(ids), "cluster_id": pa.array(rep)}).cast(out_schema)

    return direct_cogroup(
        [points, stars], [["pid"], ["u"]], num_parts, assign, [_POINT_SCHEMA, edge_schema]
    )


# --------------------------------------------------------------------------
# Douglas–Peucker simplification (exact integer comparisons)
# --------------------------------------------------------------------------

def douglas_peucker(xs: np.ndarray, ys: np.ndarray, eps: int) -> np.ndarray:
    """Indices kept by DP at tolerance ``eps`` (integer coordinate units).

    Exact arithmetic: a point survives iff its perpendicular distance to the
    anchor LINE exceeds eps, decided as cross² > eps²·len² in int64 (no
    sqrt, no float). Closed/degenerate spans (anchor points equal) fall back
    to max point-to-anchor distance, compared as d² > eps². The split vertex
    is the FIRST index attaining the maximum. Iterative stack with a
    vectorized per-span sweep — per-way work is O(n·depth) numpy, no Python
    loop over vertices."""
    n = len(xs)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    xs = xs.astype(np.int64, copy=False)
    ys = ys.astype(np.int64, copy=False)
    eps2 = int(eps) * int(eps)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        px = xs[a + 1 : b]
        py = ys[a + 1 : b]
        dx = xs[b] - xs[a]
        dy = ys[b] - ys[a]
        len2 = dx * dx + dy * dy
        if len2 == 0:
            d = (px - xs[a]) ** 2 + (py - ys[a]) ** 2
            k = int(np.argmax(d))
            if int(d[k]) > eps2:
                keep[a + 1 + k] = True
                stack.append((a, a + 1 + k))
                stack.append((a + 1 + k, b))
        else:
            cross = dx * (py - ys[a]) - dy * (px - xs[a])
            num = cross * cross
            k = int(np.argmax(num))
            if int(num[k]) > eps2 * int(len2):
                keep[a + 1 + k] = True
                stack.append((a, a + 1 + k))
                stack.append((a + 1 + k, b))
    return np.flatnonzero(keep).astype(np.int64)


def simplify_ways(ways_geo_ds, *, eps: int):
    """DP-simplify every nonzero-length way: → one row per KEPT vertex
    (way_id, seq, ix, iy). Runs per-way inside ``map_batches`` (ways are
    short; parallelism comes from way partitioning, reference geometries
    average <20 vertices — see SURVEY §2.3 M3 bbox note)."""
    out_schema = pa.schema(
        [("way_id", pa.int64()), ("seq", pa.int32()), ("ix", pa.int64()), ("iy", pa.int64())]
    )

    def fn(t: pa.Table) -> pa.Table:
        s = t.filter(t["nonzero"])
        if s.num_rows == 0:
            return out_schema.empty_table()
        xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
        ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        fx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
        fy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
        wid = s["way_id"].to_numpy(zero_copy_only=False)
        w_out, seq_out, ix_out, iy_out = [], [], [], []
        for i in range(len(wid)):
            lo, hi = offs[i], offs[i + 1]
            kept = douglas_peucker(fx[lo:hi], fy[lo:hi], eps)
            w_out.append(np.full(len(kept), wid[i], np.int64))
            seq_out.append(np.arange(len(kept), dtype=np.int32))
            ix_out.append(fx[lo + kept])
            iy_out.append(fy[lo + kept])
        return pa.table(
            {
                "way_id": pa.array(np.concatenate(w_out)),
                "seq": pa.array(np.concatenate(seq_out)),
                "ix": pa.array(np.concatenate(ix_out)),
                "iy": pa.array(np.concatenate(iy_out)),
            }
        ).cast(out_schema)

    return ways_geo_ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# per-cell convex hulls (mergeable combiner)
# --------------------------------------------------------------------------

def monotone_chain(ix: np.ndarray, iy: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Strictly-convex hull (Andrew's monotone chain) over integer points →
    (hx, hy) in CCW order starting at the lexicographically smallest point.
    Collinear boundary points are DROPPED (strict turns), which is what
    makes hull-of-hulls an exact combiner: a dropped point lies in the
    convex span of kept ones, so it can never be a strict vertex later."""
    pts = np.unique(np.stack([ix.astype(np.int64), iy.astype(np.int64)], axis=1), axis=0)
    n = len(pts)
    if n <= 2:
        return pts[:, 0], pts[:, 1]

    def half(p):
        h = []
        for q in p:
            while len(h) >= 2:
                ox, oy = h[-2]
                ax, ay = h[-1]
                if (int(ax - ox) * int(q[1] - oy) - int(ay - oy) * int(q[0] - ox)) <= 0:
                    h.pop()
                else:
                    break
            h.append((int(q[0]), int(q[1])))
        return h[:-1]

    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower + upper
    hx = np.array([p[0] for p in hull], np.int64)
    hy = np.array([p[1] for p in hull], np.int64)
    return hx, hy


def _hull_area2(hx: np.ndarray, hy: np.ndarray) -> int:
    """Doubled signed shoelace area of a CCW hull (exact int; ≥ 0)."""
    if len(hx) < 3:
        return 0
    x2 = np.append(hx, hx[0])
    y2 = np.append(hy, hy[0])
    return int(np.sum(x2[:-1] * y2[1:] - x2[1:] * y2[:-1], dtype=np.int64))


def _per_cell_hulls(cell_x, cell_y, ix, iy, cnt=None):
    """Group points by cell (lexsort) and chain each group → partial-hull
    rows (cell_x, cell_y, ix, iy, cnt) with the group's point count carried
    on its first row only (summed downstream for n_pts)."""
    order = np.lexsort((cell_y, cell_x))
    cell_x, cell_y, ix, iy = cell_x[order], cell_y[order], ix[order], iy[order]
    cw = cnt[order] if cnt is not None else np.ones(len(ix), np.int64)
    key = _cell_key(cell_x, cell_y)
    new = np.empty(len(key), bool)
    if len(key):
        new[0] = True
        new[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new)
    ends = np.append(starts[1:], len(key))
    rows = {"cell_x": [], "cell_y": [], "ix": [], "iy": [], "cnt": []}
    for s, e in zip(starts, ends):
        hx, hy = monotone_chain(ix[s:e], iy[s:e])
        m = len(hx)
        rows["cell_x"].append(np.full(m, cell_x[s], np.int64))
        rows["cell_y"].append(np.full(m, cell_y[s], np.int64))
        rows["ix"].append(hx)
        rows["iy"].append(hy)
        c = np.zeros(m, np.int64)
        c[0] = int(cw[s:e].sum())
        rows["cnt"].append(c)
    if not rows["ix"]:
        return _HULL_PART_SCHEMA.empty_table()
    return pa.table({k: pa.array(np.concatenate(v)) for k, v in rows.items()}).cast(
        _HULL_PART_SCHEMA
    )


def convex_hulls(points_ds, *, cell: int, num_parts: int = 8):
    """Per-cell convex hull summary: (cell_x, cell_y, n_pts, n_hull, area2).

    Two-level: every batch reduces its points to partial hulls (O(h) rows
    out, the mergeable-combiner pattern — the raw point set never enters the
    exchange), then ONE cell-keyed cogroup chains the union of partials.
    area2 is the exact doubled integer shoelace (0 for degenerate cells)."""
    from ..ops import direct_cogroup

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HULL_PART_SCHEMA.empty_table()
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        return _per_cell_hulls(ix // cell, iy // cell, ix, iy)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HULL_OUT_SCHEMA.empty_table()
        merged = _per_cell_hulls(
            t["cell_x"].to_numpy(zero_copy_only=False),
            t["cell_y"].to_numpy(zero_copy_only=False),
            t["ix"].to_numpy(zero_copy_only=False),
            t["iy"].to_numpy(zero_copy_only=False),
            cnt=t["cnt"].to_numpy(zero_copy_only=False),
        )
        cx = merged["cell_x"].to_numpy(zero_copy_only=False)
        cy = merged["cell_y"].to_numpy(zero_copy_only=False)
        hx = merged["ix"].to_numpy(zero_copy_only=False)
        hy = merged["iy"].to_numpy(zero_copy_only=False)
        cw = merged["cnt"].to_numpy(zero_copy_only=False)
        key = _cell_key(cx, cy)
        new = np.empty(len(key), bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(key))
        out = {"cell_x": [], "cell_y": [], "n_pts": [], "n_hull": [], "area2": []}
        for s, e in zip(starts, ends):
            out["cell_x"].append(int(cx[s]))
            out["cell_y"].append(int(cy[s]))
            out["n_pts"].append(int(cw[s:e].sum()))
            out["n_hull"].append(int(e - s))
            out["area2"].append(_hull_area2(hx[s:e], hy[s:e]))
        return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()}).cast(
            _HULL_OUT_SCHEMA
        )

    partials = points_ds.map_batches(partial, batch_format="pyarrow").materialize()
    return direct_cogroup(
        [partials], [["cell_x", "cell_y"]], num_parts, final, [_HULL_PART_SCHEMA]
    )


# --------------------------------------------------------------------------
# driver-contract wrappers (fixture corpus; oracles in oracle/geo_ops.py)
# --------------------------------------------------------------------------

RADIUS_UNITS = 10_000  # 0.001° — intra-block pairs only on the fixture grid
HULL_CELL_UNITS = 100_000  # ~3 fixture blocks per cell
SIMPLIFY_EPS = 2_000  # 0.0002° — drops the right-angle building corners


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def spatial_radius_join(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    pts = points_from_nwa(nwa_ds)
    df = radius_pairs(pts, radius=RADIUS_UNITS, num_parts=num_parts).to_pandas()
    return _sorted(df.astype({"id_a": "int64", "id_b": "int64", "dist2": "int64"}))


def spatial_clusters(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    pts = points_from_nwa(nwa_ds)
    df = cluster_points(pts, radius=RADIUS_UNITS, num_parts=num_parts).to_pandas()
    return _sorted(df.astype({"pid": "int64", "cluster_id": "int64"}))


def line_simplify(ways_geo_ds) -> pd.DataFrame:
    df = simplify_ways(ways_geo_ds, eps=SIMPLIFY_EPS).to_pandas()
    return _sorted(
        df.astype({"way_id": "int64", "seq": "int32", "ix": "int64", "iy": "int64"})
    )


def convex_hull_cells(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    pts = points_from_nwa(nwa_ds)
    df = convex_hulls(pts, cell=HULL_CELL_UNITS, num_parts=num_parts).to_pandas()
    return _sorted(df.astype({c: "int64" for c in df.columns}))


# --------------------------------------------------------------------------
# cube-sphere quadtree cells (S2-style): encode + pure-shift hierarchy rollup
# --------------------------------------------------------------------------

QUAD_LEVEL_FINE = 12
QUAD_LEVEL_COARSE = 8


def quad_cells_table(nwa_ds) -> pd.DataFrame:
    """Per-address quadtree cell ids at two levels (fine + its ancestor).

    The coarse id is derived by the prefix shift ``cell >> 2·Δlevel`` —
    no second spherical projection; the Hilbert fold's prefix stability
    makes the shift exactly equal to a direct coarse encode (unit-tested).
    """
    from ..functions.s2quad import quad_cell, quad_parent

    shift_steps = QUAD_LEVEL_FINE - QUAD_LEVEL_COARSE

    def f(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        c12 = quad_cell(lon, lat, QUAD_LEVEL_FINE)
        return pa.table(
            {
                "node_id": t["node_id"],
                "ip_id": t["ip_id"],
                "lon": t["lon"],
                "lat": t["lat"],
                "cell_l12": pa.array(c12, pa.int64()),
                "cell_l8": pa.array(quad_parent(c12, shift_steps), pa.int64()),
            }
        )

    return (
        nwa_ds.map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["node_id", "ip_id", "lon", "lat"])
        .reset_index(drop=True)
    )


def quad_rollup(nwa_ds) -> pd.DataFrame:
    """Two-level hierarchical aggregate: fine-cell counts (one grouped
    exchange of (cell, count) partials), then the coarse level is a PURE
    ID SHIFT over the already-tiny fine table — the quadtree rollup never
    touches the points again, which is the whole point of prefix-stable
    cell ids at 100-TB scale (N levels of zoom = 1 point scan + N shifts).
    """
    from ..functions.s2quad import quad_cell, quad_parent
    from .relational import grouped_agg

    shift_steps = QUAD_LEVEL_FINE - QUAD_LEVEL_COARSE

    def cells(t: pa.Table) -> pa.Table:
        lon = t["lon"].to_numpy(zero_copy_only=False)
        lat = t["lat"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"cell_l12": pa.array(quad_cell(lon, lat, QUAD_LEVEL_FINE), pa.int64())}
        )

    per_fine = grouped_agg(
        nwa_ds.map_batches(cells, batch_format="pyarrow"),
        ["cell_l12"],
        {"n": (None, "count")},
    )

    def to_coarse(t: pa.Table) -> pa.Table:
        c = t["cell_l12"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell_l8": pa.array(quad_parent(c, shift_steps), pa.int64()),
                "n": t["n"],
            }
        )

    out = grouped_agg(
        per_fine.map_batches(to_coarse, batch_format="pyarrow"),
        ["cell_l8"],
        {"n_points": ("n", "sum"), "n_child_cells": (None, "count")},
    ).to_pandas()
    out["n_points"] = out["n_points"].astype("int64")
    out["n_child_cells"] = out["n_child_cells"].astype("int64")
    return out.sort_values("cell_l8").reset_index(drop=True)


# --------------------------------------------------------------------------
# exact cross-way segment-intersection join
# --------------------------------------------------------------------------

SEG_CELL_UNITS = 50_000  # 0.005° grid — a fixture road segment spans ≤ a few cells
_SEG_MAX_CELLS = 1_024  # raise (no silent caps) if one segment covers more
_SEG_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()),
        ("seg_idx", pa.int32()),
        ("ax", pa.int64()),
        ("ay", pa.int64()),
        ("bx", pa.int64()),
        ("by", pa.int64()),
    ]
)
_SEG_EMIT_SCHEMA = pa.schema([("cell", pa.int64()), *_SEG_SCHEMA])
_XING_SCHEMA = pa.schema(
    [
        ("way_a", pa.int64()),
        ("seg_a", pa.int32()),
        ("way_b", pa.int64()),
        ("seg_b", pa.int32()),
    ]
)


def way_segments(ways_geo_ds):
    """Nonzero ways → one row per consecutive vertex pair
    (way_id, seg_idx, ax, ay, bx, by) in libosmium-quantized ints.
    Zero-length segments are kept — the strict-crossing predicate rejects
    them (both orientations vanish), so parity with the naive oracle holds
    without a special case."""

    def fn(t: pa.Table) -> pa.Table:
        s = t.filter(t["nonzero"])
        if s.num_rows == 0:
            return _SEG_SCHEMA.empty_table()
        xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
        ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        fx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
        fy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
        wid = s["way_id"].to_numpy(zero_copy_only=False)
        counts = np.diff(offs)
        nseg = counts - 1  # ways_geo guarantees >=2 vertices
        way_out = np.repeat(wid, nseg)
        # flat index of each segment's first vertex: per-way arange offset
        seg_idx = np.arange(int(nseg.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(nseg) - nseg, nseg
        )
        first = seg_idx + np.repeat(offs[:-1], nseg)
        return pa.table(
            {
                "way_id": pa.array(way_out),
                "seg_idx": pa.array(seg_idx.astype(np.int32)),
                "ax": pa.array(fx[first]),
                "ay": pa.array(fy[first]),
                "bx": pa.array(fx[first + 1]),
                "by": pa.array(fy[first + 1]),
            }
        ).cast(_SEG_SCHEMA)

    return ways_geo_ds.map_batches(fn, batch_format="pyarrow")


def _orient_signs(px, py, qx, qy, rx, ry) -> np.ndarray:
    """sign of cross(q-p, r-p) in exact int64. Operand bound: coordinate
    DIFFERENCES must stay < 2^31 units (~214 degrees) so each product fits in
    62 bits and the difference in 63 — true for any real-world way; raise
    rather than wrap if violated."""
    dqx, dqy, drx, dry = qx - px, qy - py, rx - px, ry - py
    hi = max(
        int(np.abs(dqx).max(initial=0)), int(np.abs(dqy).max(initial=0)),
        int(np.abs(drx).max(initial=0)), int(np.abs(dry).max(initial=0)),
    )
    if hi >= (1 << 31):
        raise RuntimeError(
            "segment_intersections: coordinate span >= 2^31 quantized units; "
            "the int64 orientation predicate would overflow"
        )
    return np.sign(dqx * dry - dqy * drx)


def segment_intersections(
    segments_ds, *, cell: int = SEG_CELL_UNITS, num_parts: int = 8,
    cell_cap: int = 5_000_000,
):
    """All cross-way segment pairs that PROPERLY cross (strict interior
    intersection: endpoints touching or collinear overlap excluded), each
    emitted exactly once as (way_a < way_b, seg_a, seg_b).

    Shape (the map-overlay / road-graph-conflation primitive): each segment
    replicates into every grid cell its bbox overlaps (bounded by
    length/cell; > _SEG_MAX_CELLS raises), ONE hash exchange on the cell id,
    then a per-cell vectorized sweep: bbox-overlap prefilter, exact int64
    orientation predicate, and the EMIT-ONCE rule — a qualifying pair is
    reported only from the cell containing the min corner of the two bboxes'
    intersection. That corner lies inside both bboxes, so both replicas are
    present in exactly that one cell; no distinct-pairs exchange is needed.

    100 TB note: the exchange carries replicated segments (constant factor ~
    bbox cells per segment), pairs never shuffle; skewed (dense-junction)
    cells bound by ``cell_cap`` which RAISES — remedy is a smaller ``cell``
    or the J2 mega-cell salting.
    """
    from ..ops import direct_cogroup

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SEG_EMIT_SCHEMA.empty_table()
        ax = t["ax"].to_numpy(zero_copy_only=False)
        ay = t["ay"].to_numpy(zero_copy_only=False)
        bx = t["bx"].to_numpy(zero_copy_only=False)
        by = t["by"].to_numpy(zero_copy_only=False)
        x0, x1 = np.minimum(ax, bx) // cell, np.maximum(ax, bx) // cell
        y0, y1 = np.minimum(ay, by) // cell, np.maximum(ay, by) // cell
        ncell = (x1 - x0 + 1) * (y1 - y0 + 1)
        if int(ncell.max(initial=0)) > _SEG_MAX_CELLS:
            raise RuntimeError(
                f"segment_intersections: one segment covers >{_SEG_MAX_CELLS} "
                f"cells of width {cell}; raise the cell size"
            )
        total = int(ncell.sum())
        row = np.repeat(np.arange(len(ax), dtype=np.int64), ncell)
        # per-replica rank -> (dx, dy) offset within the row's bbox-cell grid
        rank = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(ncell) - ncell, ncell
        )
        w = np.repeat(x1 - x0 + 1, ncell)
        cx = np.repeat(x0, ncell) + rank % w
        cy = np.repeat(y0, ncell) + rank // w
        cols = {"cell": pa.array(_cell_key(cx, cy))}
        for name in ("way_id", "seg_idx", "ax", "ay", "bx", "by"):
            cols[name] = pa.array(t[name].to_numpy(zero_copy_only=False)[row])
        return pa.table(cols).cast(_SEG_EMIT_SCHEMA)

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _XING_SCHEMA.empty_table()
        cellv = t["cell"].to_numpy(zero_copy_only=False)
        order = np.argsort(cellv, kind="stable")
        cellv = cellv[order]
        col = {
            n: t[n].to_numpy(zero_copy_only=False)[order]
            for n in ("way_id", "seg_idx", "ax", "ay", "bx", "by")
        }
        new = np.empty(len(cellv), bool)
        new[0] = True
        new[1:] = cellv[1:] != cellv[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(cellv))
        n_in = ends - starts
        if int((n_in * (n_in - 1) // 2).max(initial=0)) > cell_cap:
            raise RuntimeError(
                f"segment_intersections: a cell's pair count exceeds "
                f"cell_cap={cell_cap}; shrink the cell or salt it"
            )
        # all i<j pairs within each cell, vectorized
        spans = np.repeat(n_in, n_in) - (
            np.arange(len(cellv), dtype=np.int64)
            - np.repeat(starts, n_in)
            + 1
        )  # rights remaining after each left row
        total = int(spans.sum())
        if total == 0:
            return _XING_SCHEMA.empty_table()
        li = np.repeat(np.arange(len(cellv), dtype=np.int64), spans)
        inner = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(spans) - spans, spans
        )
        ri = li + 1 + inner
        keep = col["way_id"][li] != col["way_id"][ri]
        li, ri = li[keep], ri[keep]
        # bbox overlap prefilter
        ax_l, ay_l = col["ax"][li], col["ay"][li]
        bx_l, by_l = col["bx"][li], col["by"][li]
        ax_r, ay_r = col["ax"][ri], col["ay"][ri]
        bx_r, by_r = col["bx"][ri], col["by"][ri]
        ovx0 = np.maximum(np.minimum(ax_l, bx_l), np.minimum(ax_r, bx_r))
        ovx1 = np.minimum(np.maximum(ax_l, bx_l), np.maximum(ax_r, bx_r))
        ovy0 = np.maximum(np.minimum(ay_l, by_l), np.minimum(ay_r, by_r))
        ovy1 = np.minimum(np.maximum(ay_l, by_l), np.maximum(ay_r, by_r))
        keep = (ovx0 <= ovx1) & (ovy0 <= ovy1)
        # emit-once: this cell must contain the overlap-bbox min corner
        this_cell = cellv[li]
        keep &= _cell_key(ovx0 // cell, ovy0 // cell) == this_cell
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return _XING_SCHEMA.empty_table()
        li, ri = li[idx], ri[idx]
        ax_l, ay_l, bx_l, by_l = ax_l[idx], ay_l[idx], bx_l[idx], by_l[idx]
        ax_r, ay_r, bx_r, by_r = ax_r[idx], ay_r[idx], bx_r[idx], by_r[idx]
        o1 = _orient_signs(ax_l, ay_l, bx_l, by_l, ax_r, ay_r)
        o2 = _orient_signs(ax_l, ay_l, bx_l, by_l, bx_r, by_r)
        o3 = _orient_signs(ax_r, ay_r, bx_r, by_r, ax_l, ay_l)
        o4 = _orient_signs(ax_r, ay_r, bx_r, by_r, bx_l, by_l)
        cross = (o1 * o2 < 0) & (o3 * o4 < 0)
        li, ri = li[cross], ri[cross]
        wa, wb = col["way_id"][li], col["way_id"][ri]
        sa, sb = col["seg_idx"][li], col["seg_idx"][ri]
        swap = wa > wb
        way_a = np.where(swap, wb, wa)
        way_b = np.where(swap, wa, wb)
        seg_a = np.where(swap, sb, sa)
        seg_b = np.where(swap, sa, sb)
        return pa.table(
            {
                "way_a": pa.array(way_a),
                "seg_a": pa.array(seg_a.astype(np.int32)),
                "way_b": pa.array(way_b),
                "seg_b": pa.array(seg_b.astype(np.int32)),
            }
        ).cast(_XING_SCHEMA)

    emitted = segments_ds.map_batches(emit, batch_format="pyarrow").materialize()
    return direct_cogroup([emitted], [["cell"]], num_parts, sweep, [_SEG_EMIT_SCHEMA])


DROP_UNITS = 40_000  # 0.004° service-drop length — spans a fixture block


def drop_segments(points_ds, *, drop: int = DROP_UNITS):
    """Candidate utility service-drop per address point: a vertical chord
    from the point ``drop`` units due south, keyed way_id = -pid (disjoint
    from real OSM way ids, one segment each). The overlay query asks which
    drops would cross a mapped way."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SEG_SCHEMA.empty_table()
        pid = t["pid"].to_numpy(zero_copy_only=False)
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "way_id": pa.array(-pid),
                "seg_idx": pa.array(np.zeros(len(pid), np.int32)),
                "ax": pa.array(ix),
                "ay": pa.array(iy),
                "bx": pa.array(ix),
                "by": pa.array(iy - drop),
            }
        ).cast(_SEG_SCHEMA)

    return points_ds.map_batches(fn, batch_format="pyarrow")


def crossing_overlay(nwa_ds, ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Map-overlay demo of the intersection join: mapped way segments ∪
    per-address service drops, one proper-crossing sweep over the union."""
    segs = way_segments(ways_geo_ds).union(drop_segments(points_from_nwa(nwa_ds)))
    df = segment_intersections(segs, num_parts=num_parts).to_pandas()
    return _sorted(
        df.astype(
            {"way_a": "int64", "seg_a": "int32", "way_b": "int64", "seg_b": "int32"}
        )
    )


# --------------------------------------------------------------------------
# exact k-nearest-neighbour self-join (grid-doubling)
# --------------------------------------------------------------------------

_KNN_SCHEMA = pa.schema(
    [
        ("kind", pa.int8()),  # 0 = resolved result row, 1 = unresolved point
        ("pid", pa.int64()),
        ("neighbor_id", pa.int64()),
        ("rnk", pa.int64()),
        ("dist2", pa.int64()),
        ("ix", pa.int64()),
        ("iy", pa.int64()),
    ]
)
_FULL_COVER = np.int64(1) << 33  # > any quantized coordinate span


def knn_point_pairs(
    points_ds,
    *,
    k: int = 3,
    cell0: int = 10_000,
    num_parts: int = 8,
    cell_cap: int = 1_000_000,
    max_rounds: int = 24,
):
    """EXACT k nearest neighbours for every point (self excluded), emitted as
    (pid, neighbor_id, rnk 1..k, dist2); ties on distance break by neighbor
    id — the spatial-join complement of the flagship nearest-street kernel.

    Grid-doubling rounds: round r buckets points into cells of width
    ``cell0·2^r`` and sweeps each query against its 3×3 neighbourhood (the
    ``radius_pairs`` emit shape). A query RESOLVES when it has ≥ k candidates
    and its kth-smallest distance ≤ cell width — any unseen point is > one
    full cell away, i.e. strictly farther, so the seen top-k is the true
    top-k. Unresolved points re-enter the next round with doubled cells;
    once a cell exceeds the coordinate span, the 3×3 neighbourhood covers the
    whole corpus and every survivor resolves unconditionally (points with
    fewer than k neighbours in total emit what exists). Each round is ONE
    cell-keyed exchange over ONLY the still-unresolved points, so total work
    is one full pass plus geometrically-shrinking tails — the distributed
    analogue of an adaptive-radius kNN.

    Exactness bound: planar integer distances assume per-axis extents below
    2^31 quantized units (~210°) so dist2 fits int64 — true for any
    single-region corpus; the DuckDB oracle overflows LOUDLY past it.
    ``cell_cap`` RAISES on a hot cell's candidate product (no silent caps;
    the remedy is the J2 mega-cell salting family).
    """
    from ..ops import direct_cogroup

    kq = int(k)

    def make_sweep(s: int, final: bool):
        # clamp: past ~3e9 the squared cell width exceeds int64 (and every
        # candidate distance), so the resolution test is a tautology anyway
        s2 = np.int64(min(s * s, (1 << 63) - 1))

        def sweep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _KNN_SCHEMA.empty_table()
            cell = t["cell"].to_numpy(zero_copy_only=False)
            side = t["side"].to_numpy(zero_copy_only=False)
            pid = t["pid"].to_numpy(zero_copy_only=False)
            ix = t["ix"].to_numpy(zero_copy_only=False)
            iy = t["iy"].to_numpy(zero_copy_only=False)
            order = np.lexsort((side, cell))
            cell, side, pid, ix, iy = (
                cell[order], side[order], pid[order], ix[order], iy[order]
            )
            new = np.empty(len(cell), bool)
            new[0] = True
            new[1:] = cell[1:] != cell[:-1]
            starts = np.flatnonzero(new)
            ends = np.append(starts[1:], len(cell))
            nl = np.add.reduceat((side == 0).astype(np.int64), starts)
            nr = ends - starts - nl
            if int((nl * nr).max(initial=0)) > cell_cap:
                raise RuntimeError(
                    f"knn_point_pairs: cell candidate product exceeds "
                    f"cell_cap={cell_cap}; salt the hot cell or raise cell0"
                )
            left_idx = np.flatnonzero(side == 0)
            spans = np.repeat(nr, nl)
            total = int(spans.sum())
            qpid, qix, qiy = pid[left_idx], ix[left_idx], iy[left_idx]
            if total == 0:
                # no candidates anywhere: resolved-with-nothing on the final
                # round, otherwise everything is unresolved
                if final or not len(qpid):
                    return _KNN_SCHEMA.empty_table()
                z = np.zeros(len(qpid), np.int64)
                return pa.table(
                    {
                        "kind": np.ones(len(qpid), np.int8),
                        "pid": qpid, "neighbor_id": z, "rnk": z, "dist2": z,
                        "ix": qix, "iy": qiy,
                    }
                ).cast(_KNN_SCHEMA)
            right_start = np.repeat(starts + nl, nl)
            cum = np.cumsum(spans) - spans
            inner = np.arange(total, dtype=np.int64) - np.repeat(cum, spans)
            li = np.repeat(np.arange(len(left_idx), dtype=np.int64), spans)
            ri = np.repeat(right_start, spans) + inner
            d2 = (qix[li] - ix[ri]) ** 2 + (qiy[li] - iy[ri]) ** 2
            nid = pid[ri]
            keep = qpid[li] != nid  # self-exclusion by id
            li, d2, nid = li[keep], d2[keep], nid[keep]
            # per-query (d2, nid) ascending rank
            o2 = np.lexsort((nid, d2, li))
            li, d2, nid = li[o2], d2[o2], nid[o2]
            cnt = np.bincount(li, minlength=len(left_idx))
            qstart = np.concatenate(([0], np.cumsum(cnt)))[:-1]
            rnk = np.arange(len(li), dtype=np.int64) - qstart[li] + 1
            has_k = cnt >= kq
            kth_d2 = np.full(len(left_idx), np.iinfo(np.int64).max, np.int64)
            kth_d2[has_k] = d2[qstart[has_k] + kq - 1]
            resolved = (has_k & (kth_d2 <= s2)) if not final else np.ones(
                len(left_idx), bool
            )
            out_rows = resolved[li] & (rnk <= kq)
            res = pa.table(
                {
                    "kind": np.zeros(int(out_rows.sum()), np.int8),
                    "pid": qpid[li[out_rows]],
                    "neighbor_id": nid[out_rows],
                    "rnk": rnk[out_rows],
                    "dist2": d2[out_rows],
                    "ix": qix[li[out_rows]],
                    "iy": qiy[li[out_rows]],
                }
            ).cast(_KNN_SCHEMA)
            un = np.flatnonzero(~resolved)
            if not len(un):
                return res
            z = np.zeros(len(un), np.int64)
            unres = pa.table(
                {
                    "kind": np.ones(len(un), np.int8),
                    "pid": qpid[un], "neighbor_id": z, "rnk": z, "dist2": z,
                    "ix": qix[un], "iy": qiy[un],
                }
            ).cast(_KNN_SCHEMA)
            return pa.concat_tables([res, unres])

        return sweep

    def make_emit_left(s: int):
        """Query rows: one home-cell row per still-pending point."""

        def emit(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _EMIT_SCHEMA.empty_table()
            pid = t["pid"].to_numpy(zero_copy_only=False)
            ix = t["ix"].to_numpy(zero_copy_only=False)
            iy = t["iy"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "cell": _cell_key(ix // s, iy // s),
                    "side": np.zeros(len(pid), np.int8),
                    "pid": pid, "ix": ix, "iy": iy,
                }
            ).cast(_EMIT_SCHEMA)

        return emit

    def make_emit_right(s: int, cells_ref):
        """Candidate rows: EVERY corpus point replicates to its 3×3
        neighbourhood (candidates must never shrink with the pending set —
        a late-resolving query still competes against early-resolved
        neighbours), pruned map-side to the broadcast set of cells that
        still hold a pending query (None = all cells active)."""
        import ray as _ray

        def emit(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _EMIT_SCHEMA.empty_table()
            pid = t["pid"].to_numpy(zero_copy_only=False)
            ix = t["ix"].to_numpy(zero_copy_only=False)
            iy = t["iy"].to_numpy(zero_copy_only=False)
            cx = ix // s
            cy = iy // s
            dxy = np.array([-1, 0, 1], dtype=np.int64)
            offx = np.repeat(dxy, 3)
            offy = np.tile(dxy, 3)
            rep = _cell_key((cx[:, None] + offx[None, :]).ravel(),
                            (cy[:, None] + offy[None, :]).ravel())
            pid9 = np.repeat(pid, 9)
            ix9 = np.repeat(ix, 9)
            iy9 = np.repeat(iy, 9)
            if cells_ref is not None:
                active = _ray.get(cells_ref)  # sorted active-cell keys
                p = np.searchsorted(active, rep)
                keep = (p < len(active)) & (
                    active[np.minimum(p, len(active) - 1)] == rep
                )
                rep, pid9, ix9, iy9 = rep[keep], pid9[keep], ix9[keep], iy9[keep]
            return pa.table(
                {
                    "cell": rep,
                    "side": np.ones(len(pid9), np.int8),
                    "pid": pid9, "ix": ix9, "iy": iy9,
                }
            ).cast(_EMIT_SCHEMA)

        return emit

    import ray as _ray
    import ray.data as _rd

    all_pts = points_ds.materialize()
    n_total = all_pts.count()
    pending = all_pts
    results = []
    s = int(cell0)
    for round_i in range(max_rounds):
        n_pending = pending.count()
        if n_pending == 0:
            break
        final = s >= int(_FULL_COVER)
        if n_pending == n_total:
            cells_ref = None  # every cell is active; skip the prune
        else:
            # distinct home cells of the pending queries (bounded by the
            # pending count, which shrinks geometrically after round 0; at
            # corpus scales past the broadcast budget this becomes a
            # cell-keyed semi-join — the repo's sparse-co-group fallback)
            def _home_cells(t: pa.Table) -> pa.Table:
                ix = t["ix"].to_numpy(zero_copy_only=False)
                iy = t["iy"].to_numpy(zero_copy_only=False)
                return pa.table({"cell": np.unique(_cell_key(ix // s, iy // s))})

            cells = np.unique(
                pending.map_batches(_home_cells, batch_format="pyarrow")
                .to_pandas()["cell"]
                .to_numpy()
            )
            cells_ref = _ray.put(cells)
        emitted = (
            pending.map_batches(make_emit_left(s), batch_format="pyarrow")
            .union(
                all_pts.map_batches(make_emit_right(s, cells_ref),
                                    batch_format="pyarrow")
            )
            .materialize()
        )
        swept = direct_cogroup(
            [emitted], [["cell"]], num_parts, make_sweep(s, final), [_EMIT_SCHEMA]
        ).materialize()
        results.append(
            swept.filter(expr="kind == 0").select_columns(
                ["pid", "neighbor_id", "rnk", "dist2"]
            )
        )
        pending = swept.filter(expr="kind == 1").select_columns(
            ["pid", "ix", "iy"]
        ).materialize()
        if final:
            pending = _rd.from_arrow(_POINT_SCHEMA.empty_table())
        s *= 2
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out


def spatial_knn_join(nwa_ds, *, k: int = 3, num_parts: int = 8) -> pd.DataFrame:
    """k nearest address points per address point (exact integer distances,
    ties by neighbor id), over the fixture's real address points."""
    pts = points_from_nwa(nwa_ds)
    df = knn_point_pairs(pts, k=k, num_parts=num_parts).to_pandas()
    df = df.astype(
        {"pid": "int64", "neighbor_id": "int64", "rnk": "int64", "dist2": "int64"}
    )
    return df.sort_values(["pid", "rnk"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# rectangle (bbox) intersection join
# --------------------------------------------------------------------------

_RECT_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()),
        ("side", pa.int8()),
        ("rid", pa.int64()),
        ("x0", pa.int64()),
        ("x1", pa.int64()),
        ("y0", pa.int64()),
        ("y1", pa.int64()),
    ]
)
_OVERLAP_SCHEMA = pa.schema(
    [
        ("building_id", pa.int64()),
        ("highway_id", pa.int64()),
        ("overlap_area", pa.int64()),
    ]
)


def bbox_overlap_pairs(rects_ds, *, cell: int, num_parts: int = 8):
    """All (A-rect, B-rect) pairs whose integer bboxes intersect, each pair
    emitted EXACTLY ONCE with its exact-integer overlap area — the
    rectangle-join primitive under every bbox-prefiltered spatial join.

    Grid-partitioned rectangle join with reference-point dedup: every rect
    replicates to each grid cell its bbox covers (fanout = covered-cell
    count, geometry-bound); per cell the A×B cross product is swept
    vectorized, and a qualifying pair is emitted ONLY from the cell that
    contains the intersection rectangle's min corner (the canonical
    "reference point"), so no dedup exchange is needed. One cell-keyed hash
    exchange total. Hot cells: same salting family as the J2 mega-cells
    (the per-cell product is the cap to watch, as in radius_pairs).

    ``rects_ds`` rows: (side 0=A / 1=B, rid, x0, x1, y0, y1), quantized
    integer coords; overlap areas assume extents < 2^31 units so the
    product fits int64.
    """
    from ..ops import direct_cogroup

    c = int(cell)

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _RECT_SCHEMA.empty_table()
        side = t["side"].to_numpy(zero_copy_only=False)
        rid = t["rid"].to_numpy(zero_copy_only=False)
        x0 = t["x0"].to_numpy(zero_copy_only=False)
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        y0 = t["y0"].to_numpy(zero_copy_only=False)
        y1 = t["y1"].to_numpy(zero_copy_only=False)
        cx0, cx1 = x0 // c, x1 // c
        cy0, cy1 = y0 // c, y1 // c
        ncx = cx1 - cx0 + 1
        ncy = cy1 - cy0 + 1
        tot = ncx * ncy
        total = int(tot.sum())
        rep = np.repeat(np.arange(len(rid), dtype=np.int64), tot)
        cum = np.cumsum(tot) - tot
        k = np.arange(total, dtype=np.int64) - np.repeat(cum, tot)
        cx = cx0[rep] + k // ncy[rep]
        cy = cy0[rep] + k % ncy[rep]
        return pa.table(
            {
                "cell": _cell_key(cx, cy),
                "side": side[rep],
                "rid": rid[rep],
                "x0": x0[rep], "x1": x1[rep], "y0": y0[rep], "y1": y1[rep],
            }
        ).cast(_RECT_SCHEMA)

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OVERLAP_SCHEMA.empty_table()
        cell_k = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        rid = t["rid"].to_numpy(zero_copy_only=False)
        x0 = t["x0"].to_numpy(zero_copy_only=False)
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        y0 = t["y0"].to_numpy(zero_copy_only=False)
        y1 = t["y1"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cell_k))
        cell_k, side, rid = cell_k[order], side[order], rid[order]
        x0, x1, y0, y1 = x0[order], x1[order], y0[order], y1[order]
        new = np.empty(len(cell_k), bool)
        new[0] = True
        new[1:] = cell_k[1:] != cell_k[:-1]
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(cell_k))
        nl = np.add.reduceat((side == 0).astype(np.int64), starts)
        nl[side[starts] != 0] = 0  # cells with no A rows (reduceat quirk)
        nr = ends - starts - nl
        spans = np.repeat(nr, nl)
        total = int(spans.sum())
        if total == 0:
            return _OVERLAP_SCHEMA.empty_table()
        left_idx = np.flatnonzero(side == 0)
        right_start = np.repeat(starts + nl, nl)
        cum = np.cumsum(spans) - spans
        inner = np.arange(total, dtype=np.int64) - np.repeat(cum, spans)
        li = np.repeat(left_idx, spans)
        ri = np.repeat(right_start, spans) + inner
        ix0 = np.maximum(x0[li], x0[ri])
        ix1 = np.minimum(x1[li], x1[ri])
        iy0 = np.maximum(y0[li], y0[ri])
        iy1 = np.minimum(y1[li], y1[ri])
        hit = (ix0 <= ix1) & (iy0 <= iy1)
        # reference-point dedup: emit only from the intersection min corner
        hit &= _cell_key(ix0 // c, iy0 // c) == cell_k[li]
        return pa.table(
            {
                "building_id": rid[li][hit],
                "highway_id": rid[ri][hit],
                "overlap_area": ((ix1 - ix0) * (iy1 - iy0))[hit],
            }
        ).cast(_OVERLAP_SCHEMA)

    emitted = rects_ds.map_batches(emit, batch_format="pyarrow").materialize()
    return direct_cogroup([emitted], [["cell"]], num_parts, sweep, [_RECT_SCHEMA])


BBOX_PAD_UNITS = 40_000  # 0.004° candidate pad — the flagship bbox⊕MAXDIST shape


def _way_rects(t: pa.Table) -> pa.Table:
    """ways_geo batch → rect rows: side 0 = closed building ways (bbox
    expanded by ``BBOX_PAD_UNITS`` — the flagship match's bbox⊕MAXDIST
    candidate prefilter), side 1 = highway ways (a way carrying both tags
    appears on both sides). Integer bboxes recomputed from the quantized
    coordinate lists (per-point quantize-then-min, mirroring the naive
    oracle)."""
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return _RECT_SCHEMA.empty_table()
    xs = t["xs"].combine_chunks()
    ys = t["ys"].combine_chunks()
    offs = xs.offsets.to_numpy()
    fx = np.round(xs.flatten().to_numpy(zero_copy_only=False) * QUANT).astype(np.int64)
    fy = np.round(ys.flatten().to_numpy(zero_copy_only=False) * QUANT).astype(np.int64)
    st = offs[:-1].astype(np.int64)
    x0 = np.minimum.reduceat(fx, st)
    x1 = np.maximum.reduceat(fx, st)
    y0 = np.minimum.reduceat(fy, st)
    y1 = np.maximum.reduceat(fy, st)
    wid = t["way_id"].to_numpy(zero_copy_only=False)
    nonzero = t["nonzero"].to_numpy(zero_copy_only=False).astype(bool)
    closed = t["is_closed"].to_numpy(zero_copy_only=False).astype(bool)
    has_b = pc.is_valid(t["t_building"]).to_numpy(zero_copy_only=False)
    has_h = pc.is_valid(t["t_highway"]).to_numpy(zero_copy_only=False)
    a_sel = np.flatnonzero(nonzero & closed & has_b)
    b_sel = np.flatnonzero(nonzero & has_h)
    return pa.table(
        {
            "cell": np.zeros(len(a_sel) + len(b_sel), np.int64),  # filled by emit
            "side": np.concatenate(
                [np.zeros(len(a_sel), np.int8), np.ones(len(b_sel), np.int8)]
            ),
            "rid": np.concatenate([wid[a_sel], wid[b_sel]]),
            "x0": np.concatenate([x0[a_sel] - BBOX_PAD_UNITS, x0[b_sel]]),
            "x1": np.concatenate([x1[a_sel] + BBOX_PAD_UNITS, x1[b_sel]]),
            "y0": np.concatenate([y0[a_sel] - BBOX_PAD_UNITS, y0[b_sel]]),
            "y1": np.concatenate([y1[a_sel] + BBOX_PAD_UNITS, y1[b_sel]]),
        }
    ).cast(_RECT_SCHEMA)


def bbox_overlap_join(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Padded-building-bbox × highway-bbox intersection join over the
    assembled ways (exact integer overlap areas of the padded rects, each
    pair once) — the candidate-generation prefilter of a within-distance
    spatial join, materialized as its own operator."""
    rects = ways_geo_ds.map_batches(_way_rects, batch_format="pyarrow")
    df = bbox_overlap_pairs(
        rects, cell=HULL_CELL_UNITS, num_parts=num_parts
    ).to_pandas()
    if df.empty:  # typed-empty fallback: to_pandas drops columns on 0 rows
        df = pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("building_id", "highway_id", "overlap_area")}
        )
    df = df.astype(
        {"building_id": "int64", "highway_id": "int64", "overlap_area": "int64"}
    )
    return df.sort_values(["building_id", "highway_id"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# IDW grid interpolation (inverse-distance-weighted surface over addresses)
# --------------------------------------------------------------------------

IDW_CELL_UNITS = 10_000  # 1e-3° grid ≈ 111 m; radius = one cell width
_IDW_SCALE = 10**12  # fixed-point weight scale: terms are exact int64
_IDW_SCHEMA = pa.schema(
    [
        ("cell_x", pa.int64()),
        ("cell_y", pa.int64()),
        ("n_pts", pa.int64()),
        ("num", pa.int64()),
        ("den", pa.int64()),
        ("idw", pa.float64()),
    ]
)


def _valued_points(t: pa.Table) -> pa.Table:
    """nwa batch → (pid, ix, iy, v): real address points (is_ip == 0) whose
    housenumber has a POSITIVE numeric atoi prefix (C atoi semantics, the
    interpolation family's parser). Mirrored by the oracle SQL's
    regexp_extract + TRY_CAST."""
    import pyarrow.compute as pc

    s = t.filter(pc.equal(t["is_ip"], 0))
    if s.num_rows == 0:
        return pa.schema(
            [("pid", pa.int64()), ("ix", pa.int64()), ("iy", pa.int64()),
             ("v", pa.int64())]
        ).empty_table()
    node = s["node_id"].to_numpy(zero_copy_only=False)
    way = s["way_id"].to_numpy(zero_copy_only=False)
    pid = np.where(np.isnan(node), _CENTROID_PID_BASE + way, node).astype(np.int64)
    ix = np.round(s["lon"].to_numpy(zero_copy_only=False) * QUANT).astype(np.int64)
    iy = np.round(s["lat"].to_numpy(zero_copy_only=False) * QUANT).astype(np.int64)
    hn = pd.Series(s["houseno"].to_pandas(), copy=False).astype("string")
    v = (
        hn.str.extract(r"^\s*([+-]?[0-9]+)", expand=False)
        .astype("Int64")
        .to_numpy(dtype="float64", na_value=np.nan)
    )
    keep = ~np.isnan(v)
    keep &= np.where(keep, v, 0) > 0
    return pa.table(
        {
            "pid": pa.array(pid[keep]),
            "ix": pa.array(ix[keep]),
            "iy": pa.array(iy[keep]),
            "v": pa.array(v[keep].astype(np.int64)),
        }
    )


def idw_grid(nwa_ds, *, cell: int = IDW_CELL_UNITS, num_parts: int = 8) -> pd.DataFrame:
    """Inverse-distance-weighted (power 2) interpolation of housenumber
    values onto the centers of every OCCUPIED grid cell — the classic
    scattered-points → raster surface step (Shepard 1968), over the same
    quantized integer coordinates as the rest of the geo family.

    Exactness: each contribution is the fixed-point pair
    ``num_i = (v_i·10¹²) // d2_i``, ``den_i = 10¹² // d2_i`` — exact int64
    floor divisions, summed order-free — and ``idw = num/den`` is ONE IEEE
    division, so the TRUE SQL oracle (same integer terms over an O(cells ×
    points) join) is bit-equal regardless of partitioning. Contributors are
    points with ``0 < d2 ≤ cell²`` of the cell center (a point exactly ON
    a center is excluded — d2 = 0 has no IDW weight); a cell whose only
    points sit on its center emits nothing.

    Shape: one hash exchange on the cell id — each valued point is emitted
    once as an OCCUPANCY row (home cell) and 9× as a CANDIDATE row into the
    3×3 neighborhood (radius = cell width ⇒ one-ring suffices, the
    ``radius_pairs`` invariant); the per-cell fold is vectorized. Domain
    note: coordinates are libosmium-positive (testzone convention); the
    oracle's integer ``//`` truncates where numpy floors, which differ only
    on negative operands that this domain never produces.
    """
    from ..ops import direct_partitioned_map

    cell = int(cell)
    r2 = cell * cell
    half = cell // 2

    emit_schema = pa.schema(
        [
            ("cell", pa.int64()),
            ("side", pa.int8()),
            ("ix", pa.int64()),
            ("iy", pa.int64()),
            ("v", pa.int64()),
        ]
    )

    def emit(t: pa.Table) -> pa.Table:
        p = _valued_points(t)
        if p.num_rows == 0:
            return emit_schema.empty_table()
        ix = p["ix"].to_numpy(zero_copy_only=False)
        iy = p["iy"].to_numpy(zero_copy_only=False)
        v = p["v"].to_numpy(zero_copy_only=False)
        cx = ix // cell
        cy = iy // cell
        n = len(ix)
        home = _cell_key(cx, cy)
        dxy = np.array([-1, 0, 1], dtype=np.int64)
        offx = np.repeat(dxy, 3)
        offy = np.tile(dxy, 3)
        rep = _cell_key((cx[:, None] + offx[None, :]).ravel(),
                        (cy[:, None] + offy[None, :]).ravel())
        return pa.table(
            {
                "cell": pa.array(np.concatenate([home, rep])),
                "side": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(9 * n, np.int8)])
                ),
                "ix": pa.array(np.concatenate([ix, np.repeat(ix, 9)])),
                "iy": pa.array(np.concatenate([iy, np.repeat(iy, 9)])),
                "v": pa.array(np.concatenate([v, np.repeat(v, 9)])),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _IDW_SCHEMA.empty_table()
        df = t.to_pandas()
        occ = df[df["side"] == 0]
        cand = df[df["side"] == 1]
        if not len(occ):
            return _IDW_SCHEMA.empty_table()
        cells = occ["cell"].drop_duplicates().to_numpy(np.int64)
        out_rows = []
        cand_by_cell = dict(tuple(cand.groupby("cell")))
        for ck in cells:
            cx = ck // (1 << 26) - _CELL_BIAS
            cy = ck % (1 << 26) - _CELL_BIAS
            gx = cx * cell + half
            gy = cy * cell + half
            c = cand_by_cell.get(ck)
            if c is None:
                continue
            dx = c["ix"].to_numpy(np.int64) - gx
            dy = c["iy"].to_numpy(np.int64) - gy
            d2 = dx * dx + dy * dy
            m = (d2 > 0) & (d2 <= r2)
            if not m.any():
                continue
            d2m = d2[m]
            vm = c["v"].to_numpy(np.int64)[m]
            num = int(((vm * _IDW_SCALE) // d2m).sum())
            den = int((_IDW_SCALE // d2m).sum())
            out_rows.append((cx, cy, int(m.sum()), num, den))
        if not out_rows:
            return _IDW_SCHEMA.empty_table()
        cxs, cys, ns, nums, dens = (np.array(x, np.int64) for x in zip(*out_rows))
        return pa.table(
            {
                "cell_x": pa.array(cxs),
                "cell_y": pa.array(cys),
                "n_pts": pa.array(ns),
                "num": pa.array(nums),
                "den": pa.array(dens),
                "idw": pa.array(nums.astype(np.float64) / dens.astype(np.float64)),
            }
        )

    out = direct_partitioned_map(
        nwa_ds, ["cell"], num_parts, fold, emit_schema, pre=emit
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame({c: pd.Series([], dtype=str(t.to_pandas_dtype()))
                            for c, t in zip(_IDW_SCHEMA.names, _IDW_SCHEMA.types)})
    for c in ("cell_x", "cell_y", "n_pts", "num", "den"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)


# --- HMM map matching (Viterbi snap of point sequences to streets) -----------
#
# The sequence extension of the reference's per-point snap-to-street (J5,
# ClosestPointsWriter semantics, stages/match.py:653): a trajectory of noisy
# points is matched to street segments jointly, a min-sum Viterbi over
# (emission = snapped squared distance) + (transition = squared displacement
# between consecutive snap points), so an outlier point cannot jump the match
# to a far road the way independent per-point snapping does (Newson &
# Krumm 2009, the standard HMM map-matching formulation — costs here are
# exact integers instead of Gaussian/exponential log-likelihoods, which
# preserves the argmin structure while making the DP bit-reproducible).
#
# Exactness spec (the scalar oracle re-declares every rule):
#   coords: libosmium QUANT ints. CLIP = 2^20 on any point−endpoint delta and
#   MM_CROSS_MAX = 3·10^9 on the rejection cross product — beyond either the
#   candidate saturates at CAP = 2^42 and snaps to endpoint a (ties at CAP
#   break by (way_id, seg_idx), so saturation is deterministic).
#   interior:  d2 = cross² // len2,  snap = a + (dot·seg) // len2  (floor);
#   ends:      exact integer point distance, snap = the endpoint.
#   DP tie rule: candidates per step are ordered (d2, way_id, seg_idx), the
#   running argmin keeps the SMALLEST candidate index; final backtrack from
#   the smallest-index minimal total. int64 audit: |dot| ≤ 2·2^40 ≈ 2.2e12,
#   dot·seg ≤ 2.3e18 < 2^63, path total ≤ steps·(CAP + 2·CLIP²) ≈ 2^49·steps.
#
# Distributed shape: trajectories are exchanged on traj_id (one partition
# owns a whole trajectory — the DP is sequential per trajectory, parallel
# across them); the street-segment table rides along as a ray.put broadcast
# (fixture-scale streets; past the broadcast budget candidates come from the
# J2 cell-join family instead — stages/match.py:511 — and only the DP keeps
# this shape).

MM_CLIP = 1 << 20
MM_CAP = 1 << 42
MM_CROSS_MAX = 3_000_000_000
_MM_OFF = 1601  # synth offsets ∈ [−800, 800] quantized units (≈ ±9 m GPS noise)

_TRAJ_SCHEMA = pa.schema(
    [("traj_id", pa.int64()), ("step", pa.int64()), ("px", pa.int64()), ("py", pa.int64())]
)
_MATCH_SCHEMA = pa.schema(
    [
        ("traj_id", pa.int64()),
        ("step", pa.int64()),
        ("px", pa.int64()),
        ("py", pa.int64()),
        ("way_id", pa.int64()),
        ("seg_idx", pa.int64()),
        ("snap_x", pa.int64()),
        ("snap_y", pa.int64()),
        ("d2", pa.int64()),
    ]
)


def street_ways(ways_geo_ds):
    """Assembled ways carrying a highway tag (the street network)."""
    from ..constants import tag_col

    import pyarrow.compute as pc

    hw = tag_col("highway")

    def fn(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(pc.is_valid(t[hw]), t["nonzero"]))

    return ways_geo_ds.map_batches(fn, batch_format="pyarrow")


def synth_trajectories(ways_geo_ds):
    """Deterministic GPS-like trajectories: one per street way — each
    consecutive vertex pair contributes its floor-midpoint displaced by a
    hash offset h = ((way_id % 2^31)·1000003 + step)·2654435761 % 2^32,
    off = (h % 1601 − 800, (h >> 11) % 1601 − 800). Pure integer spec (the
    oracle re-declares it); a flat map over the street ways, no exchange."""

    def fn(t: pa.Table) -> pa.Table:
        segs = way_segments_table(t)
        if segs is None:
            return _TRAJ_SCHEMA.empty_table()
        wid, sidx, ax, ay, bx, by = segs
        h = (((wid % 2147483648) * 1000003 + sidx) * 2654435761) % (1 << 32)
        px = (ax + bx) // 2 + (h % _MM_OFF) - 800
        py = (ay + by) // 2 + ((h >> 11) % _MM_OFF) - 800
        return pa.table(
            {"traj_id": pa.array(wid), "step": pa.array(sidx.astype(np.int64)),
             "px": pa.array(px), "py": pa.array(py)}
        )

    return street_ways(ways_geo_ds).map_batches(fn, batch_format="pyarrow")


def way_segments_table(t: pa.Table):
    """In-batch twin of ``way_segments``'s kernel returning flat arrays
    (way_id, seg_idx, ax, ay, bx, by) — shared by trajectory synthesis and
    the broadcast segment collection so both see identical quantization."""
    s = t.filter(t["nonzero"]) if "nonzero" in t.schema.names else t
    if s.num_rows == 0:
        return None
    xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
    ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
    offs = np.asarray(xs_col.offsets, np.int64)
    offs = offs - offs[0]
    fx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
    fy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
    wid = s["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs)
    nseg = counts - 1
    way_out = np.repeat(wid, nseg)
    seg_idx = np.arange(int(nseg.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(nseg) - nseg, nseg
    )
    first = seg_idx + np.repeat(offs[:-1], nseg)
    return way_out, seg_idx, fx[first], fy[first], fx[first + 1], fy[first + 1]


def _mm_candidates(px, py, segs, k):
    """Vectorized emission evaluation of every (point, segment) pair →
    per-point top-k candidate arrays, each (n, k): way, seg, d2, sx, sy.
    Implements the exactness spec above in pure int64 numpy."""
    wid, sidx, ax, ay, bx, by = segs
    n, S = len(px), len(wid)
    dx = (bx - ax)[None, :]
    dy = (by - ay)[None, :]
    len2 = dx * dx + dy * dy
    d1x = px[:, None] - ax[None, :]
    d1y = py[:, None] - ay[None, :]
    d2x = px[:, None] - bx[None, :]
    d2y = py[:, None] - by[None, :]
    far = (
        (np.abs(d1x) > MM_CLIP) | (np.abs(d1y) > MM_CLIP)
        | (np.abs(d2x) > MM_CLIP) | (np.abs(d2y) > MM_CLIP)
        | (np.abs(dx) > MM_CLIP) | (np.abs(dy) > MM_CLIP)  # degenerate-long segment
    )
    # products only where near: zero the masked deltas first
    d1xm = np.where(far, 0, d1x)
    d1ym = np.where(far, 0, d1y)
    d2xm = np.where(far, 0, d2x)
    d2ym = np.where(far, 0, d2y)
    dot = d1xm * dx + d1ym * dy
    cross = d1xm * dy - d1ym * dx
    da2 = d1xm * d1xm + d1ym * d1ym
    db2 = d2xm * d2xm + d2ym * d2ym
    len2s = np.where(len2 == 0, 1, len2)
    interior = (dot > 0) & (dot < len2) & (len2 > 0)
    sat = far | (interior & (np.abs(cross) >= MM_CROSS_MAX))
    use_b = (~interior) & (dot >= len2) & (len2 > 0)
    d2v = np.where(interior, (cross * cross) // len2s, np.where(use_b, db2, da2))
    d2v = np.where(sat, MM_CAP, d2v)
    sx = np.where(interior & ~sat, ax[None, :] + (dot * dx) // len2s, np.where(use_b & ~sat, bx[None, :], ax[None, :]))
    sy = np.where(interior & ~sat, ay[None, :] + (dot * dy) // len2s, np.where(use_b & ~sat, by[None, :], ay[None, :]))
    # per-row top-k by (d2, way_id, seg_idx): lexsort within each row
    rows = np.repeat(np.arange(n, dtype=np.int64), S)
    order = np.lexsort(
        (np.tile(sidx, n), np.tile(wid, n), d2v.reshape(-1), rows)
    ).reshape(n, S)[:, :k]
    cols = order - np.arange(n, dtype=np.int64)[:, None] * S
    ii = np.arange(n)[:, None]
    return (
        wid[cols], sidx[cols], d2v[ii, cols], sx[ii, cols], sy[ii, cols]
    )


def _mm_viterbi(px, py, cand):
    """Min-sum Viterbi over one trajectory's per-step candidates.
    Returns (way, seg, sx, sy, d2) arrays along the optimal path."""
    cw, cs, cd, csx, csy = cand
    T, K = cw.shape
    total = cd[0].copy()
    back = np.zeros((T, K), np.int64)
    for t in range(1, T):
        ddx = np.clip(csx[t][None, :] - csx[t - 1][:, None], -MM_CLIP, MM_CLIP)
        ddy = np.clip(csy[t][None, :] - csy[t - 1][:, None], -MM_CLIP, MM_CLIP)
        trans = ddx * ddx + ddy * ddy  # (K_prev, K_cur)
        score = total[:, None] + trans
        back[t] = np.argmin(score, axis=0)  # first minimal index (np rule)
        total = score[back[t], np.arange(K)] + cd[t]
    path = np.zeros(T, np.int64)
    path[T - 1] = int(np.argmin(total))
    for t in range(T - 1, 0, -1):
        path[t - 1] = back[t][path[t]]
    tt = np.arange(T)
    return cw[tt, path], cs[tt, path], csx[tt, path], csy[tt, path], cd[tt, path]


def map_match(ways_geo_ds, *, k: int = 4, num_parts: int = 8) -> pd.DataFrame:
    """Match every synthesized trajectory to the street network. Output one
    row per trajectory point: matched (way_id, seg_idx), integer snap
    coordinates and the emission d2 along the Viterbi-optimal path."""
    import ray

    from ..ops import direct_partitioned_map

    streets = street_ways(ways_geo_ds).materialize()
    seg_parts = []
    for batch in streets.iter_batches(batch_format="pyarrow"):
        segs = way_segments_table(batch)
        if segs is not None:
            seg_parts.append(segs)
    empty = pd.DataFrame(
        {n: pd.Series([], dtype="int64") for n in _MATCH_SCHEMA.names}
    )
    if not seg_parts:
        return empty
    cat = [np.concatenate([p[i] for p in seg_parts]) for i in range(6)]
    # canonical segment order (way_id, seg_idx) so broadcast content is
    # independent of block arrival order
    so = np.lexsort((cat[1], cat[0]))
    segs_ref = ray.put(tuple(c[so] for c in cat))
    kk = k

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _MATCH_SCHEMA.empty_table()
        segs = ray.get(segs_ref)
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        out = []
        for tid, g in df.groupby("traj_id", sort=True):
            px = g["px"].to_numpy(np.int64)
            py = g["py"].to_numpy(np.int64)
            cand = _mm_candidates(px, py, segs, kk)
            w, s, sx, sy, d2 = _mm_viterbi(px, py, cand)
            out.append(
                pd.DataFrame(
                    {"traj_id": tid, "step": g["step"].to_numpy(np.int64),
                     "px": px, "py": py, "way_id": w, "seg_idx": s,
                     "snap_x": sx, "snap_y": sy, "d2": d2}
                )
            )
        return pa.Table.from_pandas(pd.concat(out), preserve_index=False).cast(
            _MATCH_SCHEMA
        )

    traj = synth_trajectories(ways_geo_ds)
    res = direct_partitioned_map(
        traj, ["traj_id"], num_parts, fold, _TRAJ_SCHEMA
    ).to_pandas()
    if res.empty:
        return empty
    for c in res.columns:
        res[c] = res[c].astype("int64")
    return res.sort_values(["traj_id", "step"]).reset_index(drop=True)


# --- DBSCAN (density-based clustering with core/border/noise roles) ----------

_DBSCAN_SCHEMA = pa.schema(
    [("pid", pa.int64()), ("role", pa.int64()), ("label", pa.int64())]
)


def dbscan_points(points_ds, *, radius: int, min_pts: int, num_parts: int = 8):
    """DBSCAN (Ester, Kriegel, Sander & Xu 1996) over integer points with
    deterministic tie rules: core = |N_eps(p)| ≥ min_pts (COUNTING SELF,
    the original formulation); clusters = connected components of the
    core–core eps-graph labelled by component-min pid; border points take
    the MIN label among their core neighbours (the classic "first cluster
    that reaches it" nondeterminism pinned to an order-free rule); noise
    label −1. roles: 0 core, 1 border, 2 noise.

    Distributed shape: eps-pairs from the cell-bucketed ``radius_pairs``
    sweep (volume = true pair count, hot cells = the J2 salting family);
    per-node neighbour counts via partial-sum exchange; components via the
    O(log² n) star-contraction CC over CORE–CORE edges only; border labels
    via one more pid-keyed exchange of (non-core, core-label) emissions.
    The point set itself shuffles exactly once (final assignment cogroup).
    """
    from ..ops import direct_cogroup
    from .dedup import connected_components
    from .relational import grouped_agg

    import ray

    points = points_ds.materialize()
    pairs = radius_pairs(points, radius=radius, num_parts=num_parts).materialize()

    def nbr_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [t["id_a"].to_numpy(zero_copy_only=False),
             t["id_b"].to_numpy(zero_copy_only=False)]
        ).astype(np.int64)
        u, c = np.unique(nodes, return_counts=True)
        return pa.table({"pid": pa.array(u), "cnt": pa.array(c.astype(np.int64))})

    nbr = grouped_agg(
        pairs.map_batches(nbr_partial, batch_format="pyarrow"),
        ["pid"], {"cnt": ("cnt", "sum")},
    ).to_pandas()
    core_ids = (
        np.sort(nbr[nbr["cnt"] + 1 >= min_pts]["pid"].to_numpy(np.int64))
        if not nbr.empty and "pid" in nbr.columns
        else np.empty(0, np.int64)
    )
    # |core| ≤ |points|, but only ids cross the driver (the places-index
    # broadcast family; past the budget this becomes a semi-join)
    core_ref = ray.put(core_ids)

    edge_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])

    def core_edges(t: pa.Table) -> pa.Table:
        core = ray.get(core_ref)
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = np.isin(a, core) & np.isin(b, core)
        return pa.table({"u": pa.array(a[m]), "v": pa.array(b[m])})

    stars = connected_components(
        pairs.map_batches(core_edges, batch_format="pyarrow").materialize(),
        num_parts=num_parts,
    ).to_pandas()
    star_child = stars["u"].to_numpy(np.int64) if len(stars) else np.empty(0, np.int64)
    star_root = stars["v"].to_numpy(np.int64) if len(stars) else np.empty(0, np.int64)
    so = np.argsort(star_child, kind="stable")
    star_ref = ray.put((star_child[so], star_root[so]))

    def _labels_of(ids: np.ndarray, child, root) -> np.ndarray:
        lab = ids.copy()
        if len(child):
            pos = np.clip(np.searchsorted(child, ids), 0, len(child) - 1)
            hit = child[pos] == ids
            lab[hit] = root[pos[hit]]
        return lab

    emit_schema = pa.schema([("pid", pa.int64()), ("lab", pa.int64())])

    def border_emit(t: pa.Table) -> pa.Table:
        """(non-core pid, its core neighbour's cluster label) emissions."""
        core = ray.get(core_ref)
        child, root = ray.get(star_ref)
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_core = np.isin(a, core)
        b_core = np.isin(b, core)
        outs, labs = [], []
        m1 = ~a_core & b_core
        outs.append(a[m1]); labs.append(_labels_of(b[m1], child, root))
        m2 = a_core & ~b_core
        outs.append(b[m2]); labs.append(_labels_of(a[m2], child, root))
        return pa.table(
            {"pid": pa.array(np.concatenate(outs)), "lab": pa.array(np.concatenate(labs))}
        )

    border = pairs.map_batches(border_emit, batch_format="pyarrow")

    def assign(pts_t: pa.Table, bord_t: pa.Table) -> pa.Table:
        core = ray.get(core_ref)
        child, root = ray.get(star_ref)
        ids = pts_t["pid"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        is_core = np.isin(ids, core)
        label = np.full(len(ids), -1, np.int64)
        label[is_core] = _labels_of(ids[is_core], child, root)
        role = np.where(is_core, 0, 2).astype(np.int64)
        if bord_t.num_rows:
            bp = bord_t["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
            bl = bord_t["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.lexsort((bl, bp))
            bp, bl = bp[o], bl[o]
            first = np.r_[True, bp[1:] != bp[:-1]]
            ub, ul = bp[first], bl[first]  # min label per border pid
            pos = np.clip(np.searchsorted(ub, ids), 0, max(len(ub) - 1, 0))
            hit = (len(ub) > 0) & (ub[pos] == ids) & ~is_core
            label[hit] = ul[pos[hit]]
            role[hit] = 1
        return pa.table(
            {"pid": pa.array(ids), "role": pa.array(role), "label": pa.array(label)}
        ).cast(_DBSCAN_SCHEMA)

    out = direct_cogroup(
        [points, border], [["pid"], ["pid"]], num_parts, assign,
        [_POINT_SCHEMA, emit_schema],
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("pid", "role", "label")}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("pid").reset_index(drop=True)


DBSCAN_MIN_PTS = 5  # fixture mix: 156 cores, borders and noise all nonempty


def dbscan_nwa(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    pts = points_from_nwa(nwa_ds)
    df = dbscan_points(pts, radius=RADIUS_UNITS, min_pts=DBSCAN_MIN_PTS,
                       num_parts=num_parts)
    return _sorted(df)


# --- weighted shortest paths over the street network --------------------------

_SSSP_V_BIAS = 1 << 28
_SSSP_V_MUL = 1 << 29
_SSSP_MAX_ROUNDS = 64
_SSSP_K_SOURCES = 8

_SSSP_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64())])
_SSSP_DIST_SCHEMA = pa.schema(
    [("node", pa.int64()), ("src", pa.int64()), ("dist", pa.int64()), ("imp", pa.int64())]
)


def _sssp_vid(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Street-graph vertex id: coordinates floor-divided to 1e-6° and packed
    into one int64 — endpoints shared between ways (same OSM node) collapse
    to the same vertex. |x//10| < 2^28 holds for all valid lon/lat."""
    return (x // 10 + _SSSP_V_BIAS) * _SSSP_V_MUL + (y // 10 + _SSSP_V_BIAS)


def _street_edges_and_sources(ways_geo_ds, *, num_parts: int, k_sources: int):
    """Shared street-graph construction for the routing operators: the
    deduped undirected edge list (u, v, w) partitioned on u, plus the
    ``k_sources`` globally smallest vertex ids (deterministic seed set;
    per-block partial min-k → driver merge of k·P ids). Returns
    ``(None, None)`` when the corpus has no street segments."""
    from ..ops import direct_cogroup

    streets = street_ways(ways_geo_ds).materialize()

    def to_edges(t: pa.Table) -> pa.Table:
        segs = way_segments_table(t)
        if segs is None:
            return _SSSP_EDGE_SCHEMA.empty_table()
        _w, _s, ax, ay, bx, by = segs
        u = _sssp_vid(ax, ay)
        v = _sssp_vid(bx, by)
        w = np.abs(bx - ax) + np.abs(by - ay)
        keep = u != v  # zero-extent (same-vertex) segments add nothing
        u, v, w = u[keep], v[keep], w[keep]
        return pa.table(
            {
                "u": pa.array(np.concatenate([u, v])),
                "v": pa.array(np.concatenate([v, u])),
                "w": pa.array(np.concatenate([w, w])),
            }
        )

    def dedup_min_w(t: pa.Table) -> pa.Table:
        """Per (u, v) keep the MIN weight (parallel segments collapse)."""
        if t.num_rows == 0:
            return _SSSP_EDGE_SCHEMA.empty_table()
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.lexsort((w, v, u))
        u, v, w = u[o], v[o], w[o]
        first = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
        return pa.table({"u": pa.array(u[first]), "v": pa.array(v[first]),
                         "w": pa.array(w[first])})

    raw = streets.map_batches(to_edges, batch_format="pyarrow")
    edges = direct_cogroup(
        [raw], [["u"]], num_parts, dedup_min_w, [_SSSP_EDGE_SCHEMA],
        emit_partitioned_on=["u"],
    )

    vmins = []
    for b in edges.to_dataset().iter_batches(batch_format="pyarrow"):
        uu = b["u"].to_numpy(zero_copy_only=False)
        if len(uu):
            vmins.append(np.unique(uu)[:k_sources])
    if not vmins:
        return None, None
    sources = np.unique(np.concatenate(vmins))[:k_sources]
    return edges, sources


def street_route_dist(ways_geo_ds, *, num_parts: int = 8, budget: int | None = None) -> pd.DataFrame:
    """Multi-source weighted shortest paths over the street graph — the
    routing primitive behind isochrones and travel-distance features.
    Vertices: quantized segment endpoints; edges: street segments weighted
    by exact L1 length (|dx|+|dy| in 1e-7° units); sources: the 8 smallest
    vertex ids (deterministic). Output: (src, node, dist) for every
    reachable pair, exact integers.

    Distributed shape: Bellman-Ford-style min-plus pregel — per round,
    [dist ⨝ edges] keyed on the vertex hash space emits (dst, src,
    dist + w) for IMPROVED rows only, re-partitioned on dst; the merge step
    keeps the per-(node, src) minimum and flags improvements. Rounds stop
    at the TRUE fixpoint (zero improved rows, checked by a tiny per-round
    aggregate); ``_SSSP_MAX_ROUNDS`` is a runaway guard that RAISES, never
    silently truncates. Volume per round = improved-frontier degree sum.
    The scalar oracle runs Dijkstra (heapq) — algorithm-diverse from the
    engine's relaxation rounds, so a shared bug can't cancel out.
    """
    from ..ops import direct_cogroup

    import ray

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ("src", "node", "dist")}
    )
    edges, sources = _street_edges_and_sources(
        ways_geo_ds, num_parts=num_parts, k_sources=_SSSP_K_SOURCES
    )
    if edges is None:
        return empty
    src_ref = ray.put(sources)

    def seed(t: pa.Table) -> pa.Table:
        srcs = ray.get(src_ref)
        uu = np.unique(t["u"].to_numpy(zero_copy_only=False).astype(np.int64))
        here = uu[np.isin(uu, srcs)]
        return pa.table(
            {
                "node": pa.array(here),
                "src": pa.array(here),
                "dist": pa.array(np.zeros(len(here), np.int64)),
                "imp": pa.array(np.ones(len(here), np.int64)),
            }
        )

    dist = direct_cogroup(
        [edges], [["u"]], num_parts, seed, [_SSSP_EDGE_SCHEMA],
        emit_partitioned_on=["node"],
    )

    emit_schema = pa.schema(
        [("dst", pa.int64()), ("src", pa.int64()), ("cand", pa.int64())]
    )

    def expand(d_t: pa.Table, e_t: pa.Table) -> pa.Table:
        if d_t.num_rows == 0 or e_t.num_rows == 0:
            return emit_schema.empty_table()
        dd = d_t.to_pandas()
        dd = dd[dd["imp"] == 1]
        if dd.empty:
            return emit_schema.empty_table()
        ed = e_t.to_pandas()
        m = ed.merge(dd, left_on="u", right_on="node", how="inner")
        if m.empty:
            return emit_schema.empty_table()
        out = pd.DataFrame(
            {
                "dst": m["v"].to_numpy(np.int64),
                "src": m["src"].to_numpy(np.int64),
                "cand": m["dist"].to_numpy(np.int64) + m["w"].to_numpy(np.int64),
            }
        )
        if budget is not None:
            # bounded expansion: a candidate past the budget can never lie
            # on a shortest path to an in-budget node (weights are >= 0),
            # so the frontier stays the size of the budget ball
            out = out[out["cand"] <= budget]
        # map-side combine: min cand per (dst, src)
        out = out.sort_values(["dst", "src", "cand"], kind="stable")
        first = ~out.duplicated(["dst", "src"])
        return pa.Table.from_pandas(out[first], preserve_index=False).cast(emit_schema)

    def merge(n_t: pa.Table, d_t: pa.Table) -> pa.Table:
        dd = d_t.to_pandas()[["node", "src", "dist"]]
        if n_t.num_rows:
            nd = n_t.to_pandas().rename(
                columns={"dst": "node", "cand": "dist"}
            )
            allr = pd.concat([dd.assign(old=1), nd.assign(old=0)])
        else:
            allr = dd.assign(old=1)
        # tie on dist prefers the OLD row (old=1 first) — an equal-distance
        # re-arrival must NOT count as an improvement or rounds never settle
        allr = allr.sort_values(
            ["node", "src", "dist", "old"],
            ascending=[True, True, True, False], kind="stable",
        )
        first = ~allr.duplicated(["node", "src"])
        win = allr[first]
        imp = (win["old"] == 0).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(win["node"].to_numpy(np.int64)),
                "src": pa.array(win["src"].to_numpy(np.int64)),
                "dist": pa.array(win["dist"].to_numpy(np.int64)),
                "imp": pa.array(imp.to_numpy()),
            }
        )

    for rnd in range(_SSSP_MAX_ROUNDS):
        nxt = direct_cogroup(
            [dist, edges], [["node"], ["u"]], num_parts, expand,
            [_SSSP_DIST_SCHEMA, _SSSP_EDGE_SCHEMA], emit_partitioned_on=["dst"],
        )
        dist = direct_cogroup(
            [nxt, dist], [["dst"], ["node"]], num_parts, merge,
            [emit_schema, _SSSP_DIST_SCHEMA], emit_partitioned_on=["node"],
        )
        improved = sum(
            int(b["imp"].to_numpy(zero_copy_only=False).sum())
            for b in dist.to_dataset().select_columns(["imp"]).iter_batches(batch_format="pyarrow")
        )
        if improved == 0:
            break
    else:
        raise RuntimeError(
            f"street_route_dist did not reach fixpoint in {_SSSP_MAX_ROUNDS} rounds"
        )

    out = dist.to_dataset().to_pandas()
    if out.empty:
        return empty
    out = out[["src", "node", "dist"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["src", "node"]).reset_index(drop=True)


# --- turn classification along trajectories -----------------------------------

_TURN_SCHEMA = pa.schema(
    [("traj_id", pa.int64()), ("step", pa.int64()), ("turn", pa.string())]
)


def turn_classes(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Per interior trajectory point, the turn class of the heading change —
    the exact-integer octant trick: no atan2, just the SIGNS of the cross
    and dot products of consecutive displacement vectors (left / right /
    straight / uturn; 'stop' when either displacement is zero). The
    turn-event stream is the feature layer behind map-matching QA and
    driver-behaviour models.

    One trajectory-keyed exchange (same key as map_match); in-partition
    work is whole-array shifts — no per-row Python. TRUE SQL oracle: DuckDB
    LAG/LEAD over the independently written trajectory points."""
    from ..ops import direct_partitioned_map

    traj = synth_trajectories(ways_geo_ds)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _TURN_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        tid = df["traj_id"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        py = df["py"].to_numpy(np.int64)
        n = len(tid)
        if n < 3:
            return _TURN_SCHEMA.empty_table()
        same3 = (tid[2:] == tid[1:-1]) & (tid[1:-1] == tid[:-2])
        d1x, d1y = px[1:-1] - px[:-2], py[1:-1] - py[:-2]
        d2x, d2y = px[2:] - px[1:-1], py[2:] - py[1:-1]
        cross = d1x * d2y - d1y * d2x
        dot = d1x * d2x + d1y * d2y
        zero = ((d1x == 0) & (d1y == 0)) | ((d2x == 0) & (d2y == 0))
        cls = np.where(
            zero, "stop",
            np.where(cross > 0, "left",
                     np.where(cross < 0, "right",
                              np.where(dot > 0, "straight", "uturn"))),
        )
        keep = same3
        return pa.table(
            {
                "traj_id": pa.array(tid[1:-1][keep]),
                "step": pa.array(df["step"].to_numpy(np.int64)[1:-1][keep]),
                "turn": pa.array(cls[keep].astype(object), pa.string()),
            }
        )

    out = direct_partitioned_map(
        traj, ["traj_id"], num_parts, fn, _TRAJ_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "traj_id": pd.Series([], dtype="int64"),
                "step": pd.Series([], dtype="int64"),
                "turn": pd.Series([], dtype=object),
            }
        )
    for c in ("traj_id", "step"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["traj_id", "step"]).reset_index(drop=True)


# --- origin–destination flows over trajectories --------------------------------

_OD_CELL = 100_000  # 0.01° OD zoning


def od_flows(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Origin–destination matrix over the synthesized trajectories: each
    trajectory contributes one (origin cell, destination cell) flow, cells =
    floor-division zoning at 0.01°. The transport-planning aggregate every
    movement dataset reduces to.

    One trajectory-keyed exchange (first/last point per trajectory via
    in-partition lexsort ends), then a tiny (o, d)-keyed count."""
    from ..ops import direct_partitioned_map
    from .relational import grouped_agg

    traj = synth_trajectories(ways_geo_ds)
    od_schema = pa.schema(
        [("o_x", pa.int64()), ("o_y", pa.int64()),
         ("d_x", pa.int64()), ("d_y", pa.int64()), ("n", pa.int64())]
    )

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return od_schema.empty_table()
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        tid = df["traj_id"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        py = df["py"].to_numpy(np.int64)
        first = np.r_[True, tid[1:] != tid[:-1]]
        last = np.r_[tid[1:] != tid[:-1], True]
        o_x, o_y = px[first] // _OD_CELL, py[first] // _OD_CELL
        d_x, d_y = px[last] // _OD_CELL, py[last] // _OD_CELL
        g = pd.DataFrame({"o_x": o_x, "o_y": o_y, "d_x": d_x, "d_y": d_y})
        g = g.groupby(["o_x", "o_y", "d_x", "d_y"], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False).cast(od_schema)

    parts = direct_partitioned_map(
        traj, ["traj_id"], num_parts, fn, _TRAJ_SCHEMA
    )
    out = grouped_agg(parts, ["o_x", "o_y", "d_x", "d_y"], {"n": ("n", "sum")}).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("o_x", "o_y", "d_x", "d_y", "n")}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["o_x", "o_y", "d_x", "d_y"]).reset_index(drop=True)


def map_match_accuracy(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Map-matching quality as an oracle-checked METRIC (the knn_recall
    family): share of trajectory steps whose matched way equals the source
    street. One row: (n_steps, n_correct, accuracy = ONE IEEE division)."""
    mm = map_match(ways_geo_ds, num_parts=num_parts)
    n = len(mm)
    ok = int((mm["traj_id"] == mm["way_id"]).sum()) if n else 0
    acc = (float(ok) / float(n)) if n else 0.0
    return pd.DataFrame(
        [{"n_steps": np.int64(n), "n_correct": np.int64(ok), "accuracy": np.float64(acc)}]
    )


# --- hotspot cells (local density vs global mean) ------------------------------

_HOTSPOT_CELL = 10_000  # 0.001° analysis cells


def hotspot_cells(points_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Hotspot detection, the integer-exact core of the Getis-Ord G* local
    statistic: per occupied cell, the 3×3-neighbourhood point sum S_i is
    compared against the global mean — hot ⇔ S_i·C > 9·T (cross-multiplied,
    no float threshold), with C = occupied cells, T = total points; the
    reported intensity ratio (S_i·C)/(9·T) is ONE IEEE division of exact
    int64s. The z-score normalization of full G* is monotone in S_i under
    fixed weights, so the hot/cold ordering is the same — this keeps the
    statistic bit-reproducible (the repo's exact-integer float-parity rule).

    Shape: per-batch cell-count partials → tiny occupied-cell aggregate →
    9-way neighbour-candidate emission → ONE cell-keyed exchange →
    broadcast (T, C) scalars. Volume after the first aggregate is
    O(occupied cells), never O(points). int64 audit: S·C ≤ T² — fine to
    ~3·10^9 points per analysis region; shard regions beyond that."""
    from ..ops import direct_partitioned_map
    from .relational import grouped_agg

    def cellify(t: pa.Table) -> pa.Table:
        cx = t["ix"].to_numpy(zero_copy_only=False) // _HOTSPOT_CELL
        cy = t["iy"].to_numpy(zero_copy_only=False) // _HOTSPOT_CELL
        g = pd.DataFrame({"cx": cx, "cy": cy}).groupby(["cx", "cy"], sort=False).size()
        return pa.table(
            {
                "cx": pa.array(g.index.get_level_values(0).to_numpy(np.int64)),
                "cy": pa.array(g.index.get_level_values(1).to_numpy(np.int64)),
                "n": pa.array(g.to_numpy(np.int64)),
            }
        )

    cells = grouped_agg(
        points_ds.map_batches(cellify, batch_format="pyarrow"),
        ["cx", "cy"], {"n": ("n", "sum")},
    ).materialize()
    cdf = cells.to_pandas()
    empty = pd.DataFrame(
        {
            "cell_x": pd.Series([], dtype="int64"),
            "cell_y": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "nbr_sum": pd.Series([], dtype="int64"),
            "hot": pd.Series([], dtype="int64"),
            "ratio": pd.Series([], dtype="float64"),
        }
    )
    if cdf.empty:
        return empty
    T = int(cdf["n"].sum())
    C = int(len(cdf))

    emit_schema = pa.schema([("cx", pa.int64()), ("cy", pa.int64()), ("n", pa.int64())])

    def emit9(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = t["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        outs = []
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                outs.append(pa.table({"cx": pa.array(cx + dx), "cy": pa.array(cy + dy),
                                      "n": pa.array(n)}))
        return pa.concat_tables(outs)

    def fold(nbr_t: pa.Table, own_t: pa.Table) -> pa.Table:
        if own_t.num_rows == 0:
            return pa.schema(
                [("cell_x", pa.int64()), ("cell_y", pa.int64()), ("n", pa.int64()),
                 ("nbr_sum", pa.int64())]
            ).empty_table()
        nb = nbr_t.to_pandas().groupby(["cx", "cy"])["n"].sum()
        own = own_t.to_pandas()
        key = list(zip(own["cx"], own["cy"]))
        s = np.array([int(nb.get(k, 0)) for k in key], np.int64)
        return pa.table(
            {
                "cell_x": pa.array(own["cx"].to_numpy(np.int64)),
                "cell_y": pa.array(own["cy"].to_numpy(np.int64)),
                "n": pa.array(own["n"].to_numpy(np.int64)),
                "nbr_sum": pa.array(s),
            }
        )

    from ..ops import direct_cogroup

    nbr = cells.map_batches(emit9, batch_format="pyarrow")
    out = direct_cogroup(
        [nbr, cells], [["cx", "cy"], ["cx", "cy"]], num_parts, fold,
        [emit_schema, emit_schema],
    ).to_pandas()
    if out.empty:
        return empty
    out["hot"] = (out["nbr_sum"] * C > 9 * T).astype("int64")
    out["ratio"] = (out["nbr_sum"].to_numpy(np.int64) * C).astype(np.float64) / float(9 * T)
    for c in ("cell_x", "cell_y", "n", "nbr_sum"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["cell_x", "cell_y"]).reset_index(drop=True)


def hotspot_nwa(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    return hotspot_cells(points_from_nwa(nwa_ds), num_parts=num_parts)


# --- dwell trajectories: stay-point detection + trajectory similarity ----------

_DWELL_JIT = 401  # dwell jitter ∈ [−200, 200] quantized units (≈ ±2 m)


def synth_dwell_trajectories(ways_geo_ds):
    """Deterministic dwell-patterned trajectories: one per street way — each
    way VERTEX contributes r = 1 + (h % 3) points jittered ±200 units around
    it (a walker pausing at corners), so consecutive points cluster at a
    vertex (dwell) and jump vertex-to-vertex (move). Pure integer spec the
    oracle re-declares scalar-for-scalar:

        h  = ((way_id % 2^31)·1000003 + vertex_idx)·2654435761 mod 2^32
        r  = 1 + h % 3
        hk = ((h + 97·k)·2654435761) mod 2^32          k = 0..r−1
        p  = (vx + hk % 401 − 200, vy + (hk >> 11) % 401 − 200)

    steps number sequentially along the way. A flat map over the street
    ways — no exchange; int64 wrap ≡ mod 2^64 keeps residues mod 2^32 exact
    (the synth_trajectories precedent)."""

    def fn(t: pa.Table) -> pa.Table:
        s = t.filter(t["nonzero"]) if "nonzero" in t.schema.names else t
        if s.num_rows == 0:
            return _TRAJ_SCHEMA.empty_table()
        xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
        ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        vx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
        vy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
        wid = s["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        way_v = np.repeat(wid, counts)  # way id per vertex
        vidx = np.arange(len(vx), dtype=np.int64) - np.repeat(offs[:-1], counts)
        h = (((way_v % 2147483648) * 1000003 + vidx) * 2654435761) % (1 << 32)
        r = 1 + (h % 3)
        # expand each vertex into its r dwell points
        pt_way = np.repeat(way_v, r)
        pt_h = np.repeat(h, r)
        pt_vx = np.repeat(vx, r)
        pt_vy = np.repeat(vy, r)
        k = np.arange(int(r.sum()), dtype=np.int64) - np.repeat(np.cumsum(r) - r, r)
        hk = ((pt_h + 97 * k) * 2654435761) % (1 << 32)
        px = pt_vx + hk % _DWELL_JIT - 200
        py = pt_vy + (hk >> 11) % _DWELL_JIT - 200
        # sequential step within each way
        per_way = np.zeros(len(wid), np.int64)
        np.add.at(per_way, np.repeat(np.arange(len(wid)), counts), r)
        step = np.arange(len(px), dtype=np.int64) - np.repeat(
            np.cumsum(per_way) - per_way, per_way
        )
        return pa.table(
            {"traj_id": pa.array(pt_way), "step": pa.array(step),
             "px": pa.array(px), "py": pa.array(py)}
        )

    return street_ways(ways_geo_ds).map_batches(fn, batch_format="pyarrow")


_STAY_SCHEMA = pa.schema(
    [
        ("traj_id", pa.int64()), ("start_step", pa.int64()),
        ("end_step", pa.int64()), ("n_pts", pa.int64()),
        ("sx", pa.int64()), ("sy", pa.int64()),
    ]
)


def staypoints(
    ways_geo_ds, *, r2: int = 1_000_000, t_min: int = 2, num_parts: int = 8
) -> pd.DataFrame:
    """Stay-point detection (Li et al. 2008, "Mining user similarity based
    on location history"): scanning a trajectory with anchor i, let j be the
    first later point farther than R from p_i; if the dwell spans ≥ t_min
    steps the window [i, j) is a stay point (centroid = floor-mean, exact —
    coordinates are positive so floor ≡ trunc ≡ SQL //) and the scan resumes
    at j, else the anchor advances by one. R² = 1e6 (≈ 11 m) comfortably
    contains the ±200-unit dwell jitter and excludes vertex-to-vertex moves.

    One trajectory-keyed exchange; in-partition the per-anchor exceed index
    comes from a vectorized pairwise sweep (trajectories are short — the
    map_match sequential-per-trajectory precedent), the anchor walk itself
    is O(n). TRUE SQL oracle: recursive-CTE anchor walk over the
    independently synthesized dwell points."""
    return staypoints_from_points(
        synth_dwell_trajectories(ways_geo_ds), r2=r2, t_min=t_min, num_parts=num_parts
    )


def staypoints_from_points(
    traj, *, r2: int = 1_000_000, t_min: int = 2, num_parts: int = 8
) -> pd.DataFrame:
    """Stay-point detection over an explicit (traj_id, step, px, py) points
    dataset — the kernel behind ``staypoints`` (see its docstring)."""
    from ..ops import direct_partitioned_map

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _STAY_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        tid = df["traj_id"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        py = df["py"].to_numpy(np.int64)
        bounds = np.r_[0, np.flatnonzero(tid[1:] != tid[:-1]) + 1, len(tid)]
        rows = {k: [] for k in _STAY_SCHEMA.names}
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            x, y = px[b0:b1], py[b0:b1]
            n = b1 - b0
            d2 = (x[:, None] - x[None, :]) ** 2 + (y[:, None] - y[None, :]) ** 2
            far = d2 > r2
            i = 0
            while i < n:
                later = np.flatnonzero(far[i, i + 1:])
                j = (i + 1 + later[0]) if len(later) else n
                if j - i >= t_min:
                    rows["traj_id"].append(tid[b0])
                    rows["start_step"].append(i)
                    rows["end_step"].append(j - 1)
                    rows["n_pts"].append(j - i)
                    rows["sx"].append(int(x[i:j].sum()) // (j - i))
                    rows["sy"].append(int(y[i:j].sum()) // (j - i))
                    i = j
                else:
                    i += 1
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in _STAY_SCHEMA],
            schema=_STAY_SCHEMA,
        )

    out = direct_partitioned_map(
        traj, ["traj_id"], num_parts, fn, _TRAJ_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({f.name: pd.Series([], dtype="int64") for f in _STAY_SCHEMA})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["traj_id", "start_step"]).reset_index(drop=True)


_HAUS_CELL = 100_000  # same 0.01° zoning as od_flows
_HAUS_SCHEMA = pa.schema(
    [
        ("cell_x", pa.int64()), ("cell_y", pa.int64()),
        ("traj_a", pa.int64()), ("traj_b", pa.int64()), ("h2", pa.int64()),
    ]
)
_HAUS_PT_SCHEMA = pa.schema(
    [
        ("cell_x", pa.int64()), ("cell_y", pa.int64()),
        ("traj_id", pa.int64()), ("px", pa.int64()), ("py", pa.int64()),
    ]
)


def hausdorff_pairs(
    ways_geo_ds, *, num_parts: int = 8, cell_cap: int = 256
) -> pd.DataFrame:
    """Pairwise trajectory similarity: the symmetric Hausdorff distance²
    (exact integers — max over points of the min squared distance to the
    other trajectory, both directions) between every pair of trajectories
    sharing an ORIGIN cell (0.01° zoning of the step-0 point, the od_flows
    zoning). The co-movement / route-overlap primitive of trajectory mining.

    Two exchanges: (1) trajectory-keyed — compute each trajectory's origin
    cell in-partition (all its points are co-located) and re-emit points
    tagged with it; (2) cell-keyed — per cell, one flat (points_a ×
    points_b) sweep per pair. Per-cell work is O(T²·m²) in trajectories T
    and points m, so cells above ``cell_cap`` trajectories raise (the
    simhash precedent: no silent truncation — pre-bucket denser zonings or
    raise the cap deliberately)."""
    return hausdorff_from_points(
        synth_dwell_trajectories(ways_geo_ds), num_parts=num_parts, cell_cap=cell_cap
    )


def hausdorff_from_points(
    traj, *, num_parts: int = 8, cell_cap: int = 256
) -> pd.DataFrame:
    """Origin-cell-bucketed pairwise Hausdorff² over an explicit
    (traj_id, step, px, py) points dataset — the kernel behind
    ``hausdorff_pairs`` (see its docstring)."""
    from ..ops import direct_partitioned_map

    def tag_origin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HAUS_PT_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        tid = df["traj_id"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        py = df["py"].to_numpy(np.int64)
        first = np.r_[True, tid[1:] != tid[:-1]]
        gidx = np.cumsum(first) - 1
        cx = (px[first] // _HAUS_CELL)[gidx]
        cy = (py[first] // _HAUS_CELL)[gidx]
        return pa.table(
            {"cell_x": pa.array(cx), "cell_y": pa.array(cy),
             "traj_id": pa.array(tid), "px": pa.array(px), "py": pa.array(py)}
        )

    pts = direct_partitioned_map(traj, ["traj_id"], num_parts, tag_origin, _TRAJ_SCHEMA)

    def pair_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HAUS_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["cell_x", "cell_y", "traj_id"], kind="stable")
        rows = {k: [] for k in _HAUS_SCHEMA.names}
        for (cx, cy), g in df.groupby(["cell_x", "cell_y"], sort=False):
            tids = g["traj_id"].unique()
            if len(tids) > cell_cap:
                raise ValueError(
                    f"hausdorff cell ({cx},{cy}) holds {len(tids)} trajectories "
                    f"(> cell_cap={cell_cap}): use a finer zoning or raise the cap"
                )
            if len(tids) < 2:
                continue
            by_t = {
                tid: (sub["px"].to_numpy(np.int64), sub["py"].to_numpy(np.int64))
                for tid, sub in g.groupby("traj_id", sort=False)
            }
            tids = np.sort(tids)
            for ai in range(len(tids)):
                xa, ya = by_t[tids[ai]]
                for bi in range(ai + 1, len(tids)):
                    xb, yb = by_t[tids[bi]]
                    d2 = (xa[:, None] - xb[None, :]) ** 2 + (ya[:, None] - yb[None, :]) ** 2
                    h2 = max(int(d2.min(axis=1).max()), int(d2.min(axis=0).max()))
                    rows["cell_x"].append(int(cx))
                    rows["cell_y"].append(int(cy))
                    rows["traj_a"].append(int(tids[ai]))
                    rows["traj_b"].append(int(tids[bi]))
                    rows["h2"].append(h2)
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in _HAUS_SCHEMA],
            schema=_HAUS_SCHEMA,
        )

    out = direct_partitioned_map(
        pts, ["cell_x", "cell_y"], num_parts, pair_sweep, _HAUS_PT_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({f.name: pd.Series([], dtype="int64") for f in _HAUS_SCHEMA})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["cell_x", "cell_y", "traj_a", "traj_b"]).reset_index(drop=True)


# --- discrete Fréchet distance between co-origin trajectories --------------------

_FRECHET_SCHEMA = pa.schema(
    [
        ("cell_x", pa.int64()), ("cell_y", pa.int64()),
        ("traj_a", pa.int64()), ("traj_b", pa.int64()), ("f2", pa.int64()),
    ]
)
_FRECHET_INF = np.int64(1) << 62
_FRECHET_PT_SCHEMA = pa.schema(
    [
        ("cell_x", pa.int64()), ("cell_y", pa.int64()),
        ("traj_id", pa.int64()), ("step", pa.int64()),
        ("px", pa.int64()), ("py", pa.int64()),
    ]
)


def _frechet2(xa, ya, xb, yb) -> int:
    """Discrete Fréchet distance² (Eiter & Mannila 1994 coupling measure)
    between two point sequences, exact int64: the minimax grid-path cost
    dp(i,j) = max(d²(i,j), min(dp(i-1,j), dp(i,j-1), dp(i-1,j-1))).
    Vectorized per ANTI-DIAGONAL (each diagonal depends only on the two
    before it), so the inner work is numpy shifts/minima — no per-cell
    Python in the O(n·m) grid."""
    d2 = (xa[:, None] - xb[None, :]) ** 2 + (ya[:, None] - yb[None, :]) ** 2
    n, m = d2.shape
    # diag arrays indexed by absolute i (0..n-1); INF where cell not on diag
    prev = np.full(n, _FRECHET_INF)  # diag k-1
    prev2 = np.full(n, _FRECHET_INF)  # diag k-2
    prev[0] = d2[0, 0]
    for k in range(1, n + m - 1):
        cur = np.full(n, _FRECHET_INF)
        lo, hi = max(0, k - m + 1), min(n - 1, k)
        i = np.arange(lo, hi + 1)
        up = prev[i]  # (i, j-1)
        left = np.where(i > 0, prev[i - 1], _FRECHET_INF)  # (i-1, j)
        diag = np.where(i > 0, prev2[i - 1], _FRECHET_INF)  # (i-1, j-1)
        pv = np.minimum(np.minimum(up, left), diag)
        # border cells (i==0 or j==0) have exactly one live pred; interior
        # cells have all three — "min over preds present" covers both
        cur[i] = np.maximum(d2[i, k - i], pv)
        prev2, prev = prev, cur
    return int(prev[n - 1])


def frechet_pairs(
    ways_geo_ds, *, num_parts: int = 8, cell_cap: int = 256
) -> pd.DataFrame:
    """Pairwise trajectory similarity under ORDER: the discrete Fréchet
    distance² (minimax coupling over the step-ordered point sequences)
    between every pair of trajectories sharing an ORIGIN cell (0.01°
    zoning of the step-0 point — the hausdorff_pairs bucketing). Fréchet
    is the order-aware sibling of Hausdorff: two routes covering the same
    set of points in opposite directions are Hausdorff-identical but
    Fréchet-far, so this is the route-following / lane-matching primitive.

    Same two-exchange shape as ``hausdorff_pairs``: (1) trajectory-keyed
    origin tagging, (2) cell-keyed pair sweep; per pair the DP grid is
    swept one anti-diagonal at a time (vectorized, exact int64). Cells
    above ``cell_cap`` trajectories raise — no silent truncation. TRUE SQL
    oracle: recursive-CTE over anti-diagonals carrying two diagonal
    layers, min-of-preds via a single moves-table join + GROUP BY."""
    return frechet_from_points(
        synth_dwell_trajectories(ways_geo_ds), num_parts=num_parts, cell_cap=cell_cap
    )


def frechet_from_points(
    traj, *, num_parts: int = 8, cell_cap: int = 256
) -> pd.DataFrame:
    """Origin-cell-bucketed pairwise discrete Fréchet² over an explicit
    (traj_id, step, px, py) points dataset — the kernel behind
    ``frechet_pairs`` (see its docstring)."""
    from ..ops import direct_partitioned_map

    def tag_origin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _FRECHET_PT_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        tid = df["traj_id"].to_numpy(np.int64)
        step = df["step"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        py = df["py"].to_numpy(np.int64)
        first = np.r_[True, tid[1:] != tid[:-1]]
        gidx = np.cumsum(first) - 1
        cx = (px[first] // _HAUS_CELL)[gidx]
        cy = (py[first] // _HAUS_CELL)[gidx]
        return pa.table(
            {"cell_x": pa.array(cx), "cell_y": pa.array(cy),
             "traj_id": pa.array(tid), "step": pa.array(step),
             "px": pa.array(px), "py": pa.array(py)}
        )

    pts = direct_partitioned_map(traj, ["traj_id"], num_parts, tag_origin, _TRAJ_SCHEMA)

    def pair_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _FRECHET_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(
            ["cell_x", "cell_y", "traj_id", "step"], kind="stable"
        )
        rows = {k: [] for k in _FRECHET_SCHEMA.names}
        for (cx, cy), g in df.groupby(["cell_x", "cell_y"], sort=False):
            tids = g["traj_id"].unique()
            if len(tids) > cell_cap:
                raise ValueError(
                    f"frechet cell ({cx},{cy}) holds {len(tids)} trajectories "
                    f"(> cell_cap={cell_cap}): use a finer zoning or raise the cap"
                )
            if len(tids) < 2:
                continue
            by_t = {
                tid: (sub["px"].to_numpy(np.int64), sub["py"].to_numpy(np.int64))
                for tid, sub in g.groupby("traj_id", sort=False)
            }
            tids = np.sort(tids)
            for ai in range(len(tids)):
                xa, ya = by_t[tids[ai]]
                for bi in range(ai + 1, len(tids)):
                    xb, yb = by_t[tids[bi]]
                    rows["cell_x"].append(int(cx))
                    rows["cell_y"].append(int(cy))
                    rows["traj_a"].append(int(tids[ai]))
                    rows["traj_b"].append(int(tids[bi]))
                    rows["f2"].append(_frechet2(xa, ya, xb, yb))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in _FRECHET_SCHEMA],
            schema=_FRECHET_SCHEMA,
        )

    out = direct_partitioned_map(
        pts, ["cell_x", "cell_y"], num_parts, pair_sweep, _FRECHET_PT_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({f.name: pd.Series([], dtype="int64") for f in _FRECHET_SCHEMA})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["cell_x", "cell_y", "traj_a", "traj_b"]).reset_index(drop=True)


# --- connected components of the street graph -----------------------------------

_CC_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def street_components(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Connected components of the street graph (vertices = quantized
    segment endpoints, the street_route_dist graph; edges = street
    segments): each vertex labelled with its component's minimum vertex id.
    The reachability primitive behind network QA (disconnected-island
    detection) and per-component routing shards.

    Distributed shape: the alternating large-star/small-star contraction of
    ``pipelines.dedup.connected_components`` — O(log² n) rounds, one
    node-keyed exchange over the EDGE list per round, never the corpus.
    TRUE SQL oracle: recursive-CTE label closure over the independently
    parsed edge set."""
    from .dedup import connected_components
    from .relational import grouped_agg

    streets = street_ways(ways_geo_ds)

    def to_edges(t: pa.Table) -> pa.Table:
        segs = way_segments_table(t)
        if segs is None:
            return _CC_EDGE_SCHEMA.empty_table()
        _w, _s, ax, ay, bx, by = segs
        u = _sssp_vid(ax, ay)
        v = _sssp_vid(bx, by)
        keep = u != v  # zero-extent segments connect nothing
        return pa.table({"u": pa.array(u[keep]), "v": pa.array(v[keep])})

    pairs = streets.map_batches(to_edges, batch_format="pyarrow")
    stars = connected_components(pairs, num_parts=num_parts)

    def emit_labels(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("node_id", pa.int64()), ("comp", pa.int64())]).empty_table()
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        # star edges carry v = component root (minimum id): label the
        # non-root endpoint AND the root itself (dedup'd by the min agg)
        return pa.table(
            {
                "node_id": pa.array(np.concatenate([u, v])),
                "comp": pa.array(np.concatenate([v, v])),
            }
        )

    lab = stars.map_batches(emit_labels, batch_format="pyarrow")
    out = grouped_agg(lab, ["node_id"], {"comp": ("comp", "min")}).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"node_id": pd.Series([], dtype="int64"), "comp": pd.Series([], dtype="int64")}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("node_id").reset_index(drop=True)


# --- step-aligned co-movement detection ------------------------------------------

_COMOVE_EMIT_SCHEMA = pa.schema(
    [
        ("step", pa.int64()), ("cell", pa.int64()), ("side", pa.int8()),
        ("traj", pa.int64()), ("ix", pa.int64()), ("iy", pa.int64()),
    ]
)
_COMOVE_STEP_SCHEMA = pa.schema(
    [("traj_a", pa.int64()), ("traj_b", pa.int64()), ("d2", pa.int64())]
)


def comovement_pairs(
    ways_geo_ds, *, radius: int = 30_000, k_min: int = 2,
    num_parts: int = 8, cell_cap: int = 100_000,
) -> pd.DataFrame:
    """Co-movement detection: trajectory pairs that are within ``radius`` of
    each other at ≥ ``k_min`` SAME step indices (the convoy/flock primitive
    of movement mining — unlike Hausdorff similarity, proximity must be
    simultaneous). Output per pair: the count of close steps and the exact
    minimum squared distance.

    Shape: the radius_pairs 3×3-neighborhood scheme keyed by (step, cell) —
    proximity is only tested between same-step points, so the exchange key
    carries the step and no cross-step candidate is ever generated; a
    second tiny pair-keyed exchange sums the per-step hits. ``cell_cap``
    RAISES on a degenerate (step, cell) density (no silent truncation).
    TRUE SQL oracle: step-equality self-join + HAVING over the independent
    dwell points."""
    return comovement_from_points(
        synth_dwell_trajectories(ways_geo_ds),
        radius=radius, k_min=k_min, num_parts=num_parts, cell_cap=cell_cap,
    )


def comovement_from_points(
    traj, *, radius: int = 30_000, k_min: int = 2,
    num_parts: int = 8, cell_cap: int = 100_000,
) -> pd.DataFrame:
    """Co-movement detection over an explicit (traj_id, step, px, py) points
    dataset — the kernel behind ``comovement_pairs`` (see its docstring)."""
    from ..ops import direct_cogroup
    from .relational import grouped_agg

    r2 = int(radius) * int(radius)

    def emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COMOVE_EMIT_SCHEMA.empty_table()
        tid = t["traj_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        step = t["step"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = t["px"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t["py"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = ix // radius
        cy = iy // radius
        n = len(tid)
        home = _cell_key(cx, cy)
        dxy = np.array([-1, 0, 1], dtype=np.int64)
        offx = np.repeat(dxy, 3)
        offy = np.tile(dxy, 3)
        rep = _cell_key((cx[:, None] + offx[None, :]).ravel(),
                        (cy[:, None] + offy[None, :]).ravel())
        return pa.table(
            {
                "step": pa.array(np.concatenate([step, np.repeat(step, 9)])),
                "cell": pa.array(np.concatenate([home, rep])),
                "side": pa.array(
                    np.concatenate([np.zeros(n, np.int8), np.ones(9 * n, np.int8)])
                ),
                "traj": pa.array(np.concatenate([tid, np.repeat(tid, 9)])),
                "ix": pa.array(np.concatenate([ix, np.repeat(ix, 9)])),
                "iy": pa.array(np.concatenate([iy, np.repeat(iy, 9)])),
            }
        )

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COMOVE_STEP_SCHEMA.empty_table()
        step = t["step"].to_numpy(zero_copy_only=False)
        cell = t["cell"].to_numpy(zero_copy_only=False)
        side = t["side"].to_numpy(zero_copy_only=False)
        tid = t["traj"].to_numpy(zero_copy_only=False)
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, cell, step))
        step, cell, side, tid, ix, iy = (
            step[order], cell[order], side[order], tid[order], ix[order], iy[order]
        )
        new = np.empty(len(cell), bool)
        new[0] = True
        new[1:] = (cell[1:] != cell[:-1]) | (step[1:] != step[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(cell))
        nl = np.add.reduceat((side == 0).astype(np.int64), starts)
        nc = ends - starts
        nr = nc - nl
        if int((nl * nr).max(initial=0)) > cell_cap:
            raise RuntimeError(
                f"comovement_pairs: a (step, cell) candidate product exceeds "
                f"cell_cap={cell_cap}; shrink the radius or salt the hot cell"
            )
        left_idx = np.flatnonzero(side == 0)
        spans = np.repeat(nr, nl)
        total = int(spans.sum())
        if total == 0:
            return _COMOVE_STEP_SCHEMA.empty_table()
        right_start = np.repeat(starts + nl, nl)
        cum = np.cumsum(spans) - spans
        inner = np.arange(total, dtype=np.int64) - np.repeat(cum, spans)
        li = np.repeat(left_idx, spans)
        ri = np.repeat(right_start, spans) + inner
        dx = ix[li] - ix[ri]
        dy = iy[li] - iy[ri]
        d2 = dx * dx + dy * dy
        keep = (d2 <= r2) & (tid[li] < tid[ri])
        return pa.table(
            {
                "traj_a": pa.array(tid[li][keep]),
                "traj_b": pa.array(tid[ri][keep]),
                "d2": pa.array(d2[keep]),
            }
        )

    emitted = traj.map_batches(emit, batch_format="pyarrow").materialize()
    hits = direct_cogroup(
        [emitted], [["step", "cell"]], num_parts, sweep, [_COMOVE_EMIT_SCHEMA]
    )
    agg = grouped_agg(
        hits.map_batches(
            lambda t: pa.table(
                {"traj_a": t["traj_a"], "traj_b": t["traj_b"],
                 "n_close": pa.array(np.ones(t.num_rows, np.int64)),
                 "min_d2": t["d2"]}
            ),
            batch_format="pyarrow",
        ),
        ["traj_a", "traj_b"],
        {"n_close": ("n_close", "sum"), "min_d2": ("min_d2", "min")},
    ).to_pandas()
    if agg.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("traj_a", "traj_b", "n_close", "min_d2")}
        )
    for c in agg.columns:
        agg[c] = agg[c].astype("int64")
    out = agg[agg["n_close"] >= k_min]
    return out.sort_values(["traj_a", "traj_b"]).reset_index(drop=True)


# --- segment bearing rose ---------------------------------------------------------

_ROSE_SCHEMA = pa.schema(
    [("way_id", pa.int64()), ("octant", pa.int64()), ("n", pa.int64())]
)


def _bearing_octant(dx: np.ndarray, dy: np.ndarray) -> np.ndarray:
    """45° compass octant of an integer displacement, exact — no atan2:
    quadrant from the signs, diagonal split by the STRICT |dy| > |dx|
    comparison (ties fall to the axis-adjacent octant; the SQL oracle
    re-declares the identical CASE ladder). Octants number CCW from East:
    0=E..NE, 1=NE..N, 2=N..NW, 3=NW..W, 4=W..SW, 5=SW..S, 6=S..SE, 7=SE..E."""
    adx, ady = np.abs(dx), np.abs(dy)
    q = np.where(
        (dx >= 0) & (dy >= 0), 0,
        np.where((dx < 0) & (dy >= 0), 1, np.where((dx < 0) & (dy < 0), 2, 3)),
    )
    diag = (ady > adx).astype(np.int64)
    # quadrant q covers octants [2q, 2q+1] CCW; within-quadrant CCW progress
    # flips meaning in odd quadrants (angle grows as |dx| overtakes |dy|)
    inner = np.where(q % 2 == 0, diag, 1 - diag)
    return 2 * q + inner


def segment_bearing_rose(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Per-way compass rose: count of street segments per 45° bearing
    octant — the orientation signature behind grid-vs-organic street-layout
    classification (Boeing 2019's street-network orientation entropy, kept
    integer-exact by octant counting instead of angular histograms).

    A stateless flat map over street ways (octant = sign/compare ladder,
    no trigonometry) + one tiny (way, octant)-keyed grouped count. TRUE SQL
    oracle: the identical CASE ladder over independently parsed segments."""
    from .relational import grouped_agg

    def fn(t: pa.Table) -> pa.Table:
        segs = way_segments_table(t)
        if segs is None:
            return _ROSE_SCHEMA.empty_table()
        wid, _sidx, ax, ay, bx, by = segs
        dx, dy = bx - ax, by - ay
        keep = (dx != 0) | (dy != 0)  # zero-extent: no bearing
        wid, dx, dy = wid[keep], dx[keep], dy[keep]
        return pa.table(
            {
                "way_id": pa.array(wid),
                "octant": pa.array(_bearing_octant(dx, dy)),
                "n": pa.array(np.ones(len(wid), np.int64)),
            }
        )

    rose = street_ways(ways_geo_ds).map_batches(fn, batch_format="pyarrow")
    out = grouped_agg(rose, ["way_id", "octant"], {"n": ("n", "sum")}).to_pandas()
    if out.empty:
        return pd.DataFrame({f.name: pd.Series([], dtype="int64") for f in _ROSE_SCHEMA})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["way_id", "octant"]).reset_index(drop=True)


# --- polygon validity / shape audit ------------------------------------------

_POLY_AUDIT_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()), ("n_vertices", pa.int64()),
        ("area2", pa.int64()), ("winding", pa.int64()),
        ("is_convex", pa.int64()), ("bbox_w", pa.int64()),
        ("bbox_h", pa.int64()),
    ]
)


def polygon_audit(ways_geo_ds) -> pd.DataFrame:
    """Per-polygon shape audit over every CLOSED assembled way (first
    quantized vertex == last, ≥3 stored points): twice the signed
    shoelace area (CCW positive), winding sign, strict convexity (every
    turn the same sign, zero-area rejected), vertex count and bbox extent —
    the geometry-QA pass a renderer or importer runs before trusting
    polygon rings (reference semantic root: the area/nonarea classifier,
    ``osmi/MarkerInterface.hpp`` closed-way handling).

    Exactness: coordinates are anchored per way to the bbox minimum before
    any product, so each shoelace term is |t| ≤ bbox_w·bbox_h < 2^62 (guarded
    — raise, don't wrap) and matches DuckDB BIGINT window arithmetic
    bit-for-bit.

    Shape: a stateless flat map — each way's ring is one list row, so no
    exchange at any scale; output is one row per polygon."""

    def fn(t: pa.Table) -> pa.Table:
        s = t.filter(t["nonzero"]) if "nonzero" in t.schema.names else t
        if s.num_rows == 0:
            return _POLY_AUDIT_SCHEMA.empty_table()
        xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
        ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        fx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
        fy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
        wid = s["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        first_i, last_i = offs[:-1], offs[1:] - 1
        # >= 3 stored points (2 distinct vertices): degenerate two-point
        # "rings" are kept and flagged (area2 0, winding 0) — the audit's job
        closed = (counts >= 3) & (fx[first_i] == fx[last_i]) & (fy[first_i] == fy[last_i])
        if not closed.any():
            return _POLY_AUDIT_SCHEMA.empty_table()
        keep_pt = np.repeat(closed, counts)
        fx, fy = fx[keep_pt], fy[keep_pt]
        wid, counts = wid[closed], counts[closed]
        starts = np.cumsum(counts) - counts
        # anchor to the per-way bbox minimum: every later product stays small
        minx = np.minimum.reduceat(fx, starts)
        miny = np.minimum.reduceat(fy, starts)
        bw = np.maximum.reduceat(fx, starts) - minx
        bh = np.maximum.reduceat(fy, starts) - miny
        if int((bw.astype(object) * bh.astype(object)).max()) >= (1 << 62):
            raise RuntimeError(
                "polygon_audit: bbox area >= 2^62 quantized units²; int64 "
                "shoelace terms would overflow (DuckDB HUGEINT oracle would "
                "not — split the ring or widen the kernel)"
            )
        ax = fx - np.repeat(minx, counts)
        ay = fy - np.repeat(miny, counts)
        nseg = counts - 1
        e_starts = np.cumsum(nseg) - nseg
        efirst = np.arange(int(nseg.sum()), dtype=np.int64) - np.repeat(
            e_starts, nseg
        ) + np.repeat(starts, nseg)
        dx = ax[efirst + 1] - ax[efirst]
        dy = ay[efirst + 1] - ay[efirst]
        # shoelace: Σ x_i·dy_i − y_i·dx_i  (== Σ x_i·y_{i+1} − x_{i+1}·y_i)
        terms = ax[efirst] * dy - ay[efirst] * dx
        area2 = np.add.reduceat(terms, e_starts)
        # turns: cross of consecutive edges, wrapping last → first
        edge_way = np.repeat(np.arange(len(wid), dtype=np.int64), nseg)
        inrun = edge_way[:-1] == edge_way[1:]
        crw = dx[:-1] * dy[1:] - dy[:-1] * dx[1:]
        crv = crw[inrun]
        t_starts = np.cumsum(nseg - 1) - (nseg - 1)
        mn = np.minimum.reduceat(crv, t_starts)
        mx = np.maximum.reduceat(crv, t_starts)
        e_last = e_starts + nseg - 1
        wrap = dx[e_last] * dy[e_starts] - dy[e_last] * dx[e_starts]
        mn = np.minimum(mn, wrap)
        mx = np.maximum(mx, wrap)
        return pa.table(
            {
                "way_id": pa.array(wid),
                "n_vertices": pa.array(nseg),
                "area2": pa.array(area2),
                "winding": pa.array(np.sign(area2)),
                "is_convex": pa.array(
                    ((area2 != 0) & ((mn >= 0) | (mx <= 0))).astype(np.int64)
                ),
                "bbox_w": pa.array(bw),
                "bbox_h": pa.array(bh),
            }
        ).cast(_POLY_AUDIT_SCHEMA)

    out = ways_geo_ds.map_batches(fn, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype="int64") for f in _POLY_AUDIT_SCHEMA}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("way_id").reset_index(drop=True)


# --- geofence entry/exit transitions -----------------------------------------

FENCE_DILATE_UNITS = 20_000  # 0.002° arrival zone ≈ 220 m around a building
_GF_CELL = 100_000  # 0.01° bucketing (od_flows zoning); fences span ≤ a few cells
_GF_FENCE_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()), ("fence_id", pa.int64()),
        ("x0", pa.int64()), ("x1", pa.int64()),
        ("y0", pa.int64()), ("y1", pa.int64()),
    ]
)
_GF_PT_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()), ("traj_id", pa.int64()), ("step", pa.int64()),
        ("px", pa.int64()), ("py", pa.int64()),
    ]
)
_GF_CONT_SCHEMA = pa.schema(
    [("traj_id", pa.int64()), ("fence_id", pa.int64()), ("step", pa.int64())]
)
_GF_MAX_SCHEMA = pa.schema([("traj_id", pa.int64()), ("max_step", pa.int64())])
_GF_EVENT_SCHEMA = pa.schema(
    [
        ("traj_id", pa.int64()), ("fence_id", pa.int64()),
        ("step", pa.int64()), ("event", pa.int64()),
    ]
)


def geofence_transitions(
    ways_geo_ds, *, dilate: int = FENCE_DILATE_UNITS, num_parts: int = 8
) -> pd.DataFrame:
    """Geofence entry/exit events: every building's bbox dilated by
    ``dilate`` is an arrival zone (the "phone entered the 220 m zone of the
    store" primitive), probed by the dwell-patterned trajectories. Emits
    one row per transition — event +1 at the first step inside a zone (a
    trajectory starting inside counts as entering at its first step), −1 at
    the first step back outside; a trajectory that ends inside never exits.

    Shape: two exchanges. (1) cell-keyed containment — fences replicate to
    every 0.01° cell their dilated bbox covers (bbox_overlap_pairs fanout),
    points go to their single home cell, so each contained (point, fence)
    is found exactly once with no dedup pass; (2) trajectory-keyed — the
    contained step sets co-grouped with each trajectory's max step, runs →
    events via one lexsort + diff per partition. Both sides stream; nothing
    driver-side. TRUE SQL oracle: BETWEEN join + lag/lead window run
    detection over the independent dwell points and way bboxes."""
    return geofence_transitions_from_points(
        synth_dwell_trajectories(ways_geo_ds), ways_geo_ds,
        dilate=dilate, num_parts=num_parts,
    )


def geofence_transitions_from_points(
    traj, ways_geo_ds, *, dilate: int = FENCE_DILATE_UNITS, num_parts: int = 8
) -> pd.DataFrame:
    """Geofence event kernel over an explicit (traj_id, step, px, py) points
    dataset — the machinery behind ``geofence_transitions`` (see its
    docstring for semantics and the exchange shapes)."""
    from ..ops import direct_cogroup
    from .relational import grouped_agg

    d = int(dilate)

    def fence_emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _GF_FENCE_SCHEMA.empty_table()
        r = _way_rects(t)  # side 0 = closed building ways, already padded
        side = r["side"].to_numpy(zero_copy_only=False)
        b = r.filter(pa.array(side == 0))
        if b.num_rows == 0:
            return _GF_FENCE_SCHEMA.empty_table()
        fid = b["rid"].to_numpy(zero_copy_only=False)
        # _way_rects pads by BBOX_PAD_UNITS; re-pad to the fence dilation
        x0 = b["x0"].to_numpy(zero_copy_only=False) + BBOX_PAD_UNITS - d
        x1 = b["x1"].to_numpy(zero_copy_only=False) - BBOX_PAD_UNITS + d
        y0 = b["y0"].to_numpy(zero_copy_only=False) + BBOX_PAD_UNITS - d
        y1 = b["y1"].to_numpy(zero_copy_only=False) - BBOX_PAD_UNITS + d
        cx0, cx1 = x0 // _GF_CELL, x1 // _GF_CELL
        cy0, cy1 = y0 // _GF_CELL, y1 // _GF_CELL
        ncx, ncy = cx1 - cx0 + 1, cy1 - cy0 + 1
        tot = ncx * ncy
        rep = np.repeat(np.arange(len(fid), dtype=np.int64), tot)
        cum = np.cumsum(tot) - tot
        k = np.arange(int(tot.sum()), dtype=np.int64) - np.repeat(cum, tot)
        cx = cx0[rep] + k // ncy[rep]
        cy = cy0[rep] + k % ncy[rep]
        return pa.table(
            {
                "cell": _cell_key(cx, cy), "fence_id": fid[rep],
                "x0": x0[rep], "x1": x1[rep], "y0": y0[rep], "y1": y1[rep],
            }
        ).cast(_GF_FENCE_SCHEMA)

    def point_emit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _GF_PT_SCHEMA.empty_table()
        px = t["px"].to_numpy(zero_copy_only=False)
        py = t["py"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": _cell_key(px // _GF_CELL, py // _GF_CELL),
                "traj_id": t["traj_id"], "step": t["step"],
                "px": t["px"], "py": t["py"],
            }
        ).cast(_GF_PT_SCHEMA)

    fences = ways_geo_ds.map_batches(fence_emit, batch_format="pyarrow").materialize()
    pts = traj.map_batches(point_emit, batch_format="pyarrow").materialize()

    def contain(f_t: pa.Table, p_t: pa.Table) -> pa.Table:
        if f_t.num_rows == 0 or p_t.num_rows == 0:
            return _GF_CONT_SCHEMA.empty_table()
        f = f_t.to_pandas()
        p = p_t.to_pandas()
        m = p.merge(f, on="cell", how="inner")
        hit = (
            (m["px"] >= m["x0"]) & (m["px"] <= m["x1"])
            & (m["py"] >= m["y0"]) & (m["py"] <= m["y1"])
        )
        m = m[hit]
        return pa.table(
            {
                "traj_id": pa.array(m["traj_id"].to_numpy(np.int64)),
                "fence_id": pa.array(m["fence_id"].to_numpy(np.int64)),
                "step": pa.array(m["step"].to_numpy(np.int64)),
            }
        ).cast(_GF_CONT_SCHEMA)

    contained = direct_cogroup(
        [fences, pts], [["cell"], ["cell"]], num_parts, contain,
        [_GF_FENCE_SCHEMA, _GF_PT_SCHEMA],
    ).materialize()
    max_steps = grouped_agg(
        traj, ["traj_id"], {"max_step": ("step", "max")}
    ).materialize()

    def events(c_t: pa.Table, m_t: pa.Table) -> pa.Table:
        if c_t.num_rows == 0:
            return _GF_EVENT_SCHEMA.empty_table()
        tid = c_t["traj_id"].to_numpy(zero_copy_only=False)
        fid = c_t["fence_id"].to_numpy(zero_copy_only=False)
        st = c_t["step"].to_numpy(zero_copy_only=False)
        order = np.lexsort((st, fid, tid))
        tid, fid, st = tid[order], fid[order], st[order]
        newg = np.empty(len(tid), bool)
        newg[0] = True
        newg[1:] = (tid[1:] != tid[:-1]) | (fid[1:] != fid[:-1])
        gap = np.empty(len(tid), bool)
        gap[0] = True
        gap[1:] = st[1:] != st[:-1] + 1
        run_start = newg | gap
        run_end = np.append(run_start[1:], True)
        mt = m_t["traj_id"].to_numpy(zero_copy_only=False)
        mv = m_t["max_step"].to_numpy(zero_copy_only=False)
        mo = np.argsort(mt, kind="stable")
        max_arr = mv[mo][np.searchsorted(mt[mo], tid)]
        e_idx = np.flatnonzero(run_start)
        x_idx = np.flatnonzero(run_end & (st + 1 <= max_arr))
        return pa.table(
            {
                "traj_id": pa.array(np.concatenate([tid[e_idx], tid[x_idx]])),
                "fence_id": pa.array(np.concatenate([fid[e_idx], fid[x_idx]])),
                "step": pa.array(np.concatenate([st[e_idx], st[x_idx] + 1])),
                "event": pa.array(
                    np.concatenate(
                        [np.ones(len(e_idx), np.int64), -np.ones(len(x_idx), np.int64)]
                    )
                ),
            }
        ).cast(_GF_EVENT_SCHEMA)

    out = direct_cogroup(
        [contained, max_steps], [["traj_id"], ["traj_id"]], num_parts, events,
        [_GF_CONT_SCHEMA, _GF_MAX_SCHEMA],
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype="int64") for f in _GF_EVENT_SCHEMA}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["traj_id", "fence_id", "step", "event"]
    ).reset_index(drop=True)


# --- street-network chain contraction (degree-2 topology simplification) ---------

_CHAIN_SEG_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()), ("seq", pa.int64()),
        ("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
    ]
)
_CHAIN_END_SCHEMA = pa.schema(
    [("node", pa.int64()), ("way_id", pa.int64()), ("seq", pa.int64()), ("end", pa.int8())]
)
_CHAIN_DEG_SCHEMA = pa.schema([("node", pa.int64()), ("deg", pa.int64())])
_CHAIN_ENDDEG_SCHEMA = pa.schema(
    [("way_id", pa.int64()), ("seq", pa.int64()), ("end", pa.int8()), ("deg", pa.int64())]
)
_CHAIN_LAB_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()), ("seq", pa.int64()),
        ("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
        ("deg_u", pa.int64()), ("deg_v", pa.int64()),
    ]
)
_CHAIN_LOOKUP_SCHEMA = pa.schema(
    [
        ("node", pa.int64()), ("way_id", pa.int64()), ("seq", pa.int64()),
        ("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
        ("deg_u", pa.int64()), ("deg_v", pa.int64()),
    ]
)
_CHAIN_COMP_SCHEMA = pa.schema([("node", pa.int64()), ("comp", pa.int64())])
_CHAIN_KEYED_SCHEMA = pa.schema(
    [
        ("chain", pa.int64()),
        ("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
        ("deg_u", pa.int64()), ("deg_v", pa.int64()),
    ]
)
_CHAIN_OUT_SCHEMA = pa.schema(
    [
        ("anchor", pa.int64()), ("junc_a", pa.int64()), ("junc_b", pa.int64()),
        ("n_segments", pa.int64()), ("total_len", pa.int64()),
    ]
)


def _chain_own_key(way_id: np.ndarray, seq: np.ndarray) -> np.ndarray:
    """Chain id for a junction-junction single-segment chain: a NEGATIVE
    key derived from the segment identity (component labels are packed
    vertex ids ≥ 0, so the spaces can't collide)."""
    return -(way_id * 1_000_000 + seq) - 1


def street_chains(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Topology simplification of the street graph (the "line merge" /
    pseudo-edge primitive behind routing-graph shrinking and cartographic
    generalization): every maximal run of degree-2 vertices collapses into
    ONE chain row — end junctions (sorted; −1/−1 for pure degree-2
    cycles), segment count, exact L1 total length, and a deterministic
    anchor (minimum vertex id touched by the chain).

    Distributed shape — no sequential chain WALK anywhere: degrees are an
    endpoint-keyed grouped count; the degree-2 subgraph's components come
    from the existing star-contraction (O(log² n) edge-keyed rounds);
    edges then join their chain label through one node-keyed cogroup and
    aggregate per chain in one more exchange. Junction-junction edges are
    their own single-segment chains under a negative segment-identity key.
    TRUE SQL oracle: same pipeline as recursive-CTE closure + grouping
    over the independently parsed segments."""
    import ray  # noqa: F401  (cogroup machinery)

    from ..ops import cogroup, direct_partitioned_map
    from .dedup import connected_components
    from .relational import grouped_agg

    streets = street_ways(ways_geo_ds)

    def to_segs(t: pa.Table) -> pa.Table:
        segs = way_segments_table(t)
        if segs is None:
            return _CHAIN_SEG_SCHEMA.empty_table()
        wid, seq, ax, ay, bx, by = segs
        u = _sssp_vid(ax, ay)
        v = _sssp_vid(bx, by)
        w = np.abs(bx - ax) + np.abs(by - ay)
        keep = u != v
        return pa.table(
            {
                "way_id": pa.array(wid[keep].astype(np.int64)),
                "seq": pa.array(seq[keep].astype(np.int64)),
                "u": pa.array(u[keep]), "v": pa.array(v[keep]),
                "w": pa.array(w[keep].astype(np.int64)),
            }
        )

    segs = streets.map_batches(to_segs, batch_format="pyarrow").materialize()

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CHAIN_END_SCHEMA.empty_table()
        wid = t["way_id"].to_numpy(zero_copy_only=False)
        seq = t["seq"].to_numpy(zero_copy_only=False)
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v])),
                "way_id": pa.array(np.concatenate([wid, wid])),
                "seq": pa.array(np.concatenate([seq, seq])),
                "end": pa.array(
                    np.r_[np.zeros(len(u), np.int8), np.ones(len(v), np.int8)]
                ),
            }
        )

    ends = segs.map_batches(explode, batch_format="pyarrow").materialize()
    deg = grouped_agg(ends, ["node"], {"deg": (None, "count")}).materialize()

    def join_deg(ends_t: pa.Table, deg_t: pa.Table) -> pa.Table:
        if ends_t.num_rows == 0:
            return _CHAIN_ENDDEG_SCHEMA.empty_table()
        d = dict(
            zip(
                deg_t["node"].to_numpy(zero_copy_only=False),
                deg_t["deg"].to_numpy(zero_copy_only=False),
            )
        )
        nodes = ends_t["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "way_id": ends_t["way_id"], "seq": ends_t["seq"],
                "end": ends_t["end"],
                "deg": pa.array(np.array([d[n] for n in nodes], np.int64)),
            }
        )

    enddeg = cogroup(
        [ends, deg], [["node"], ["node"]], num_parts, join_deg,
        [_CHAIN_END_SCHEMA, _CHAIN_DEG_SCHEMA],
    ).materialize()

    def assemble(seg_t: pa.Table, ed_t: pa.Table) -> pa.Table:
        if seg_t.num_rows == 0:
            return _CHAIN_LAB_SCHEMA.empty_table()
        sdf = seg_t.to_pandas()
        edf = ed_t.to_pandas()
        du = edf[edf["end"] == 0].set_index(["way_id", "seq"])["deg"]
        dv = edf[edf["end"] == 1].set_index(["way_id", "seq"])["deg"]
        key = pd.MultiIndex.from_frame(sdf[["way_id", "seq"]])
        sdf["deg_u"] = du.reindex(key).to_numpy(np.int64)
        sdf["deg_v"] = dv.reindex(key).to_numpy(np.int64)
        return pa.Table.from_pandas(sdf, preserve_index=False).cast(_CHAIN_LAB_SCHEMA)

    lab = cogroup(
        [segs, enddeg], [["way_id", "seq"], ["way_id", "seq"]], num_parts,
        assemble, [_CHAIN_SEG_SCHEMA, _CHAIN_ENDDEG_SCHEMA],
    ).materialize()

    d2e = lab.map_batches(
        lambda t: pa.table(
            {
                "u": pa.array(
                    t["u"].to_numpy(zero_copy_only=False)[
                        (t["deg_u"].to_numpy(zero_copy_only=False) == 2)
                        & (t["deg_v"].to_numpy(zero_copy_only=False) == 2)
                    ]
                ),
                "v": pa.array(
                    t["v"].to_numpy(zero_copy_only=False)[
                        (t["deg_u"].to_numpy(zero_copy_only=False) == 2)
                        & (t["deg_v"].to_numpy(zero_copy_only=False) == 2)
                    ]
                ),
            }
        ),
        batch_format="pyarrow",
    )
    stars = connected_components(d2e, num_parts=num_parts)

    def emit_comp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CHAIN_COMP_SCHEMA.empty_table()
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v])),
                "comp": pa.array(np.concatenate([v, v])),
            }
        )

    comp = grouped_agg(
        stars.map_batches(emit_comp, batch_format="pyarrow"),
        ["node"],
        {"comp": ("comp", "min")},
    ).materialize()

    def to_lookup(t: pa.Table) -> pa.Table:
        """Edges with ≥1 degree-2 endpoint, keyed by the node whose chain
        component labels them (u preferred — u and v give the same
        component when both are degree-2)."""
        if t.num_rows == 0:
            return _CHAIN_LOOKUP_SCHEMA.empty_table()
        df = t.to_pandas()
        has = (df["deg_u"] == 2) | (df["deg_v"] == 2)
        df = df[has].copy()
        df.insert(
            0, "node",
            np.where(df["deg_u"] == 2, df["u"], df["v"]).astype(np.int64),
        )
        return pa.Table.from_pandas(df, preserve_index=False).cast(
            _CHAIN_LOOKUP_SCHEMA
        )

    def label_chain(lk_t: pa.Table, comp_t: pa.Table) -> pa.Table:
        if lk_t.num_rows == 0:
            return _CHAIN_KEYED_SCHEMA.empty_table()
        cmap = dict(
            zip(
                comp_t["node"].to_numpy(zero_copy_only=False),
                comp_t["comp"].to_numpy(zero_copy_only=False),
            )
        )
        nodes = lk_t["node"].to_numpy(zero_copy_only=False)
        # isolated degree-2 vertex (both neighbours are junctions): its own
        # singleton component — label = itself
        chain = np.array([cmap.get(n, n) for n in nodes], np.int64)
        return pa.table(
            {
                "chain": pa.array(chain),
                "u": lk_t["u"], "v": lk_t["v"], "w": lk_t["w"],
                "deg_u": lk_t["deg_u"], "deg_v": lk_t["deg_v"],
            }
        )

    comp_keyed = cogroup(
        [lab.map_batches(to_lookup, batch_format="pyarrow").materialize(), comp],
        [["node"], ["node"]], num_parts, label_chain,
        [_CHAIN_LOOKUP_SCHEMA, _CHAIN_COMP_SCHEMA],
    )

    def own_keyed(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df[(df["deg_u"] != 2) & (df["deg_v"] != 2)].copy()
        if df.empty:
            return _CHAIN_KEYED_SCHEMA.empty_table()
        df.insert(
            0, "chain",
            _chain_own_key(
                df["way_id"].to_numpy(np.int64), df["seq"].to_numpy(np.int64)
            ),
        )
        return pa.Table.from_pandas(
            df[["chain", "u", "v", "w", "deg_u", "deg_v"]], preserve_index=False
        ).cast(_CHAIN_KEYED_SCHEMA)

    keyed = comp_keyed.union(lab.map_batches(own_keyed, batch_format="pyarrow"))

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CHAIN_OUT_SCHEMA.empty_table()
        df = t.to_pandas()
        rows = {k: [] for k in _CHAIN_OUT_SCHEMA.names}
        for _c, g in df.groupby("chain", sort=False):
            u = g["u"].to_numpy(np.int64)
            v = g["v"].to_numpy(np.int64)
            rows["anchor"].append(int(min(u.min(), v.min())))
            juncs = np.concatenate(
                [u[g["deg_u"].to_numpy(np.int64) != 2],
                 v[g["deg_v"].to_numpy(np.int64) != 2]]
            )
            rows["junc_a"].append(int(juncs.min()) if len(juncs) else -1)
            rows["junc_b"].append(int(juncs.max()) if len(juncs) else -1)
            rows["n_segments"].append(len(g))
            rows["total_len"].append(int(g["w"].sum()))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in _CHAIN_OUT_SCHEMA],
            schema=_CHAIN_OUT_SCHEMA,
        )

    out = direct_partitioned_map(
        keyed.materialize(), ["chain"], num_parts, fold, _CHAIN_KEYED_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype="int64") for f in _CHAIN_OUT_SCHEMA}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["anchor", "junc_a", "junc_b", "n_segments", "total_len"]
    ).reset_index(drop=True)


# --- isochrone reachability within a cost budget ---------------------------------

_ISO_BUDGET = 40_000  # 1e-7° L1 units ≈ 400 m


def isochrone_counts(
    ways_geo_ds, *, budget: int = _ISO_BUDGET, num_parts: int = 8
) -> pd.DataFrame:
    """Isochrone summary per seed: over the street graph (the
    street_route_dist vertices/edges/seeds), the set of vertices whose
    shortest-path L1 distance from the seed is ≤ ``budget`` — reported as
    (n_reachable incl. the seed, max_dist, sum_dist), all exact integers.
    The service-area / coverage primitive behind "what can I reach in X".

    Distributed shape: the min-plus pregel of ``street_route_dist`` with a
    BUDGET PRUNE inside the expand step — candidates past the budget never
    relax (nonnegative weights ⇒ they cannot serve in-budget nodes), so
    per-round volume is the budget ball's boundary, not the graph. TRUE
    SQL oracle: recursive-CTE Bellman-Ford with the same cap + grouping.
    """
    d = street_route_dist(ways_geo_ds, num_parts=num_parts, budget=budget)
    if d.empty:
        return pd.DataFrame(
            {
                c: pd.Series([], dtype="int64")
                for c in ("src", "n_reachable", "max_dist", "sum_dist")
            }
        )
    g = d.groupby("src", as_index=False).agg(
        n_reachable=("node", "count"),
        max_dist=("dist", "max"),
        sum_dist=("dist", "sum"),
    )
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return g.sort_values("src").reset_index(drop=True)


# --- STR R-tree bulk-load packing (spatial index construction) -------------------

_STR_LEAF_CAP = 16
_STR_PT_SCHEMA = pa.schema(
    [("pid", pa.int64()), ("ix", pa.int64()), ("iy", pa.int64())]
)
_STR_SLAB_SCHEMA = pa.schema(
    [("slab", pa.int64()), ("pid", pa.int64()), ("ix", pa.int64()), ("iy", pa.int64())]
)
_STR_OUT_SCHEMA = pa.schema(
    [
        ("slab", pa.int64()), ("leaf", pa.int64()), ("n_points", pa.int64()),
        ("min_x", pa.int64()), ("max_x", pa.int64()),
        ("min_y", pa.int64()), ("max_y", pa.int64()),
    ]
)


def _ceil_isqrt(n: int) -> int:
    """Exact ceil(sqrt(n)) in integers (floor-isqrt + correction) — the
    same two-step the SQL oracle uses so both sides agree at perfect
    squares regardless of float sqrt rounding."""
    import math

    s0 = math.isqrt(n)
    return s0 if s0 * s0 >= n else s0 + 1


def str_pack(points_ds, *, leaf_cap: int = _STR_LEAF_CAP, num_parts: int = 8) -> pd.DataFrame:
    """Sort-Tile-Recursive R-tree bulk load (Leutenegger et al. 1997) of a
    point set: S = ceil(sqrt(ceil(n/C))) vertical slabs of ceil(n/S)
    points in (ix, iy, pid) order, each slab packed into leaves of C
    points in (iy, ix, pid) order. Output: one row per leaf with its
    exact MBR and occupancy — the spatial-index CONSTRUCTION primitive
    (the layout a bulk-loaded R-tree or a hive-partitioned spatial table
    would write).

    Distributed shape — global order WITHOUT a global sort: pass 1
    histograms ix values (the exchange carries one row per occupied ix,
    never points) and the driver exclusive-scans bin counts into rank
    offsets (the q_ntile_orders discipline); pass 2 hash-exchanges points
    by ix — equal ix always co-located — and each bin lexsorts locally,
    adds its offset, and knows every point's exact global rank ⇒ slab;
    pass 3 exchanges by slab and packs leaves in-partition. TRUE SQL
    oracle: two row_number() windows + integer division."""
    import ray

    from ..ops import direct_partitioned_map
    from .relational import grouped_agg

    pts = points_ds.materialize()
    hist = grouped_agg(
        pts.map_batches(
            lambda t: pa.table({"ix": t["ix"]}), batch_format="pyarrow"
        ),
        ["ix"],
        {"cnt": (None, "count")},
    ).to_pandas()
    if hist.empty:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype="int64") for f in _STR_OUT_SCHEMA}
        )
    hist = hist.sort_values("ix").reset_index(drop=True)
    bins = hist["ix"].to_numpy(np.int64)
    cnts = hist["cnt"].to_numpy(np.int64)
    n = int(cnts.sum())
    n_leaves = (n + leaf_cap - 1) // leaf_cap
    s = _ceil_isqrt(n_leaves)
    slab_size = (n + s - 1) // s
    offsets = np.concatenate(([0], np.cumsum(cnts)))[:-1]
    ref = ray.put((bins, offsets))

    def to_slabs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _STR_SLAB_SCHEMA.empty_table()
        b, off = ray.get(ref)
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        pid = t["pid"].to_numpy(zero_copy_only=False)
        o = np.lexsort((pid, iy, ix))
        ix, iy, pid = ix[o], iy[o], pid[o]
        # local position within each ix run + that ix's global offset
        first = np.r_[True, ix[1:] != ix[:-1]]
        starts = np.flatnonzero(first)
        local = np.arange(len(ix)) - np.repeat(starts, np.diff(np.r_[starts, len(ix)]))
        rank = off[np.searchsorted(b, ix)] + local
        return pa.table(
            {
                "slab": pa.array(rank // slab_size),
                "pid": pa.array(pid), "ix": pa.array(ix), "iy": pa.array(iy),
            }
        )

    slabbed = direct_partitioned_map(pts, ["ix"], num_parts, to_slabs, _STR_PT_SCHEMA)

    def pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _STR_OUT_SCHEMA.empty_table()
        df = t.to_pandas()
        rows = {k: [] for k in _STR_OUT_SCHEMA.names}
        for slab, g in df.groupby("slab", sort=False):
            o = np.lexsort(
                (g["pid"].to_numpy(np.int64), g["ix"].to_numpy(np.int64),
                 g["iy"].to_numpy(np.int64))
            )
            ix = g["ix"].to_numpy(np.int64)[o]
            iy = g["iy"].to_numpy(np.int64)[o]
            leaf = np.arange(len(ix)) // leaf_cap
            for lf in range(int(leaf[-1]) + 1):
                m = leaf == lf
                rows["slab"].append(int(slab))
                rows["leaf"].append(lf)
                rows["n_points"].append(int(m.sum()))
                rows["min_x"].append(int(ix[m].min()))
                rows["max_x"].append(int(ix[m].max()))
                rows["min_y"].append(int(iy[m].min()))
                rows["max_y"].append(int(iy[m].max()))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in _STR_OUT_SCHEMA],
            schema=_STR_OUT_SCHEMA,
        )

    out = direct_partitioned_map(
        slabbed.materialize(), ["slab"], num_parts, pack, _STR_SLAB_SCHEMA
    ).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["slab", "leaf"]).reset_index(drop=True)


def str_pack_nwa(nwa_ds, *, leaf_cap: int = _STR_LEAF_CAP, num_parts: int = 8) -> pd.DataFrame:
    return str_pack(points_from_nwa(nwa_ds), leaf_cap=leaf_cap, num_parts=num_parts)


# --- spatially stratified sampling ------------------------------------------------

_SSAMP_CELL = 100_000  # 0.01° zoning — the hotspot/od_flows cell
_SSAMP_K = 5
_SSAMP_PRIME = 1_000_003
_SSAMP_MULT = 2_654_435_761


def spatial_stratified_sample(
    points_ds, *, k_per_cell: int = _SSAMP_K, num_parts: int = 8
) -> pd.DataFrame:
    """Deterministic spatially-stratified sample: within every occupied
    0.01° cell, rank points by the multiplicative hash
    (pid % 1000003)·2654435761 mod 2³² (ties by pid) and keep the first
    ``k_per_cell`` — the geo-balancing primitive for training-data
    selection (dense downtown cells stop drowning out rural ones), the
    spatial sibling of ``textstats.stratified_sample``.

    Same exchange-free shape: per-batch partial top-k per cell bounds
    every merge at cells × k rows per block; coordinates never move. The
    hash is plain integer arithmetic (max product < 2⁶³), so the SQL
    oracle evaluates the SAME expression rather than matching a hash
    library."""
    def part(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {c: pd.Series([], dtype="int64")
                 for c in ("cell_x", "cell_y", "pid", "h")}
            )
        pid = t["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = t["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = (pid % _SSAMP_PRIME) * _SSAMP_MULT % (1 << 32)
        d = pd.DataFrame(
            {"cell_x": ix // _SSAMP_CELL, "cell_y": iy // _SSAMP_CELL,
             "pid": pid, "h": h}
        )
        d = d.sort_values(["cell_x", "cell_y", "h", "pid"], kind="stable")
        return d.groupby(["cell_x", "cell_y"], sort=False).head(k_per_cell)

    parts = points_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("cell_x", "cell_y", "pid", "rn")}
        )
    parts = parts.sort_values(["cell_x", "cell_y", "h", "pid"], kind="stable")
    out = parts.groupby(["cell_x", "cell_y"], sort=False).head(k_per_cell).copy()
    out["rn"] = out.groupby(["cell_x", "cell_y"]).cumcount() + 1
    out = out[["cell_x", "cell_y", "pid", "rn"]].astype("int64")
    return out.sort_values(["cell_x", "cell_y", "rn"]).reset_index(drop=True)


def spatial_sample_nwa(nwa_ds, *, k_per_cell: int = _SSAMP_K, num_parts: int = 8) -> pd.DataFrame:
    return spatial_stratified_sample(
        points_from_nwa(nwa_ds), k_per_cell=k_per_cell, num_parts=num_parts
    )


# --- address completeness audit ----------------------------------------------------

_ADDRQ_FIELDS = ("street", "houseno", "postcode", "city", "country", "place")
_ADDRQ_SCHEMA = pa.schema(
    [("pc", pa.string()), ("n_rows", pa.int64()), ("sum_score", pa.int64()),
     ("n_street", pa.int64()), ("n_houseno", pa.int64()), ("n_city", pa.int64()),
     ("n_full", pa.int64())]
)


def addr_completeness(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Per-postcode address-completeness audit over the
    nodes_with_addresses layer — the domain QA aggregate an address
    inspector publishes: row count, summed field-presence score (street /
    houseno / postcode / city / country / place; present = non-null AND
    non-empty), per-key presence counts and the count of FULL addresses
    (street + houseno + city all present). NULL postcodes group under ''.

    Pure pre-aggregation shape: per-batch pandas groupby partials → one
    tiny postcode-keyed grouped sum; the layer rows never move whole.
    TRUE SQL oracle: the same CASE ladder over the independently computed
    naive-oracle layer."""
    from .relational import grouped_agg

    def part(t: pa.Table) -> pd.DataFrame:
        df = t.select(list(_ADDRQ_FIELDS)).to_pandas()
        pres = {
            f: (df[f].notna() & (df[f] != "")).astype(np.int64)
            for f in _ADDRQ_FIELDS
        }
        out = pd.DataFrame(
            {
                "pc": df["postcode"].fillna("").astype(object),
                "n_rows": np.int64(1),
                "sum_score": sum(pres.values()).astype(np.int64),
                "n_street": pres["street"],
                "n_houseno": pres["houseno"],
                "n_city": pres["city"],
                "n_full": (
                    pres["street"] & pres["houseno"] & pres["city"]
                ).astype(np.int64),
            }
        )
        return out.groupby("pc", as_index=False, sort=False).sum()

    g = grouped_agg(
        nwa_ds.map_batches(part, batch_format="pyarrow"),
        ["pc"],
        {c: (c, "sum") for c in _ADDRQ_SCHEMA.names if c != "pc"},
    ).to_pandas()
    for c in g.columns:
        if c != "pc":
            g[c] = g[c].astype("int64")
    g["pc"] = g["pc"].astype(object)
    return g.sort_values("pc").reset_index(drop=True)[list(_ADDRQ_SCHEMA.names)]


# --- trajectory speed-outlier audit -------------------------------------------------

_SPEED_SCHEMA = pa.schema(
    [
        ("traj_id", pa.int64()), ("n_steps", pa.int64()), ("med_d", pa.int64()),
        ("n_outliers", pa.int64()), ("max_d", pa.int64()),
    ]
)


def traj_speed_outliers(ways_geo_ds, *, factor: int = 4, num_parts: int = 8) -> pd.DataFrame:
    """GPS glitch audit per trajectory: step displacements d_i (L1 between
    consecutive points), lower median med (sorted[(m−1)//2] — the
    quantile_disc(0.5) element), and the count of outlier steps
    d_i > factor·med (cross-multiplied integers; med = 0 degenerates to
    d_i > 0). The jump-detection pass a map-matching pipeline runs before
    trusting a trace.

    One trajectory-keyed exchange; in-partition it's one lexsort + two
    segment sweeps (diffs, then per-trajectory sorted-median via segmented
    argsort) — no per-row Python. TRUE SQL oracle: lag() diffs +
    quantile_disc over the independently synthesized trajectory points."""
    from ..ops import direct_partitioned_map

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SPEED_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        tid = df["traj_id"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        py = df["py"].to_numpy(np.int64)
        same = tid[1:] == tid[:-1]
        d = (np.abs(np.diff(px)) + np.abs(np.diff(py)))[same]
        dt = tid[1:][same]
        if len(dt) == 0:
            return _SPEED_SCHEMA.empty_table()
        rows = {k: [] for k in _SPEED_SCHEMA.names}
        bounds = np.r_[0, np.flatnonzero(dt[1:] != dt[:-1]) + 1, len(dt)]
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            seg = np.sort(d[b0:b1])
            m = b1 - b0
            med = int(seg[(m - 1) // 2])
            rows["traj_id"].append(int(dt[b0]))
            rows["n_steps"].append(m)
            rows["med_d"].append(med)
            rows["n_outliers"].append(int((d[b0:b1] > factor * med).sum()))
            rows["max_d"].append(int(seg[-1]))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in _SPEED_SCHEMA],
            schema=_SPEED_SCHEMA,
        )

    out = direct_partitioned_map(
        synth_trajectories(ways_geo_ds), ["traj_id"], num_parts, fn, _TRAJ_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {f.name: pd.Series([], dtype="int64") for f in _SPEED_SCHEMA}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("traj_id").reset_index(drop=True)


# --- way sinuosity classification ---------------------------------------------------

_SINU_SCHEMA = pa.schema(
    [
        ("way_id", pa.int64()), ("len_l1", pa.int64()), ("chord_l1", pa.int64()),
        ("sin_class", pa.string()),
    ]
)


def way_sinuosity(ways_geo_ds) -> pd.DataFrame:
    """Per-street-way sinuosity audit (road-geometry QA: detour factor of
    the drawn line vs its endpoints): exact L1 path length Σ(|dx|+|dy|)
    against the L1 endpoint chord, classified by integer cross-multiply —
    'loop' when the chord is zero (closed or returning way), 'straight'
    when 5·len ≤ 6·chord (detour ≤ 1.2×), else 'curved'. L1 on BOTH sides
    keeps the ratio rational: no sqrt, no float anywhere.

    Exchange-free: a way's vertices live in one row, so this is one
    vectorized map over the street ways (segment sums via np.add.at on
    way ordinals). TRUE SQL oracle: grouped segment sums + min/max_by
    endpoints over the independently parsed segments."""
    streets = street_ways(ways_geo_ds)

    def fn(t: pa.Table) -> pa.Table:
        segs = way_segments_table(t)
        if segs is None:
            return _SINU_SCHEMA.empty_table()
        wid, seq, ax, ay, bx, by = segs
        d = np.abs(bx - ax) + np.abs(by - ay)
        first = np.r_[True, wid[1:] != wid[:-1]]
        gidx = np.cumsum(first) - 1
        n_ways = int(gidx[-1]) + 1 if len(gidx) else 0
        ln = np.zeros(n_ways, np.int64)
        np.add.at(ln, gidx, d)
        starts = np.flatnonzero(first)
        ends = np.r_[starts[1:], len(wid)] - 1
        chord = np.abs(bx[ends] - ax[starts]) + np.abs(by[ends] - ay[starts])
        w = wid[starts].astype(np.int64)
        cls = np.where(
            chord == 0, "loop", np.where(5 * ln <= 6 * chord, "straight", "curved")
        )
        return pa.table(
            {
                "way_id": pa.array(w),
                "len_l1": pa.array(ln),
                "chord_l1": pa.array(chord.astype(np.int64)),
                "sin_class": pa.array(cls.astype(object), pa.string()),
            }
        )

    out = streets.map_batches(fn, batch_format="pyarrow").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "way_id": pd.Series([], dtype="int64"),
                "len_l1": pd.Series([], dtype="int64"),
                "chord_l1": pd.Series([], dtype="int64"),
                "sin_class": pd.Series([], dtype=object),
            }
        )
    for c in ("way_id", "len_l1", "chord_l1"):
        out[c] = out[c].astype("int64")
    return out.sort_values("way_id").reset_index(drop=True)


# --- route circuity distribution ---------------------------------------------------


def route_circuity(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Circuity (detour-factor) distribution of the street network: for
    every (seed, reachable vertex) pair of ``street_route_dist``, compare
    the network distance against the straight-line L1 chord RECOVERED FROM
    THE PACKED VERTEX ID (vid = (x//10 + B)·M + (y//10 + B) decodes to the
    1e-6° floor-quantized coordinates — deterministic on both sides), and
    bucket the rational ratio by integer division: bucket = min(10·dist //
    chord, 39) (10 = ratio 1.0x, 39+ clamps the long tail), −1 for the
    zero-chord self pair. Output: (src, bucket, n) counts — the
    network-efficiency fingerprint planners compare across cities.

    Piggybacks the SSSP pregel output; the bucketing is one vectorized
    pass + a tiny grouped count. TRUE SQL oracle: the same unpack/bucket
    arithmetic over the independent Dijkstra parquet."""
    d = street_route_dist(ways_geo_ds, num_parts=num_parts)
    if d.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("src", "bucket", "n")}
        )
    src = d["src"].to_numpy(np.int64)
    node = d["node"].to_numpy(np.int64)
    dist = d["dist"].to_numpy(np.int64)

    def unpack(v):
        return v // _SSSP_V_MUL - _SSSP_V_BIAS, v % _SSSP_V_MUL - _SSSP_V_BIAS

    sx, sy = unpack(src)
    nx, ny = unpack(node)
    chord = (np.abs(nx - sx) + np.abs(ny - sy)) * 10
    bucket = np.where(
        chord == 0, -1, np.minimum(10 * dist // np.maximum(chord, 1), 39)
    )
    out = (
        pd.DataFrame({"src": src, "bucket": bucket})
        .groupby(["src", "bucket"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["src", "bucket"]).reset_index(drop=True)


# --- network Voronoi (nearest-facility allocation) ----------------------------------


_NV_LABEL_SCHEMA = pa.schema(
    [("node", pa.int64()), ("seed", pa.int64()), ("dist", pa.int64()),
     ("imp", pa.int64())]
)


def network_voronoi(
    ways_geo_ds, *, num_parts: int = 8, k_seeds: int = _SSSP_K_SOURCES
) -> pd.DataFrame:
    """Network Voronoi / nearest-facility allocation: assign every street
    vertex to its NEAREST seed by network distance (the catchment-area
    primitive behind service-coverage and facility-location analyses).
    Seeds are the ``k_seeds`` smallest vertex ids (deterministic, the same
    set ``street_route_dist`` routes from); ties at equal distance go to
    the SMALLEST seed id. Output: (node, seed, dist) — one row per vertex
    reachable from any seed, exact integers.

    Distributed shape: a min-plus label-propagation pregel like
    ``street_route_dist`` but carrying ONE (dist, seed) label per vertex
    instead of k distance rows — state and per-round exchange volume are
    k× smaller, which is the standard scale trick for nearest-facility
    (the k-source SSSP materializes k·V rows; this materializes V). The
    merge keeps the lexicographic (dist, seed) minimum per node, tie
    preferring the incumbent so an equal re-arrival never counts as an
    improvement; rounds stop at the true fixpoint and
    ``_SSSP_MAX_ROUNDS`` RAISES rather than truncating. TRUE SQL oracle:
    per-node argmin over the independent Dijkstra parquet
    (row_number ordered by dist, src)."""
    from ..ops import direct_cogroup

    import ray

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ("node", "seed", "dist")}
    )
    edges, sources = _street_edges_and_sources(
        ways_geo_ds, num_parts=num_parts, k_sources=k_seeds
    )
    if edges is None:
        return empty
    src_ref = ray.put(sources)

    def seed_fn(t: pa.Table) -> pa.Table:
        srcs = ray.get(src_ref)
        uu = np.unique(t["u"].to_numpy(zero_copy_only=False).astype(np.int64))
        here = uu[np.isin(uu, srcs)]
        return pa.table(
            {
                "node": pa.array(here),
                "seed": pa.array(here),
                "dist": pa.array(np.zeros(len(here), np.int64)),
                "imp": pa.array(np.ones(len(here), np.int64)),
            }
        )

    labels = direct_cogroup(
        [edges], [["u"]], num_parts, seed_fn, [_SSSP_EDGE_SCHEMA],
        emit_partitioned_on=["node"],
    )

    emit_schema = pa.schema(
        [("dst", pa.int64()), ("seed", pa.int64()), ("cand", pa.int64())]
    )

    def expand(l_t: pa.Table, e_t: pa.Table) -> pa.Table:
        if l_t.num_rows == 0 or e_t.num_rows == 0:
            return emit_schema.empty_table()
        ld = l_t.to_pandas()
        ld = ld[ld["imp"] == 1]
        if ld.empty:
            return emit_schema.empty_table()
        m = e_t.to_pandas().merge(ld, left_on="u", right_on="node", how="inner")
        if m.empty:
            return emit_schema.empty_table()
        out = pd.DataFrame(
            {
                "dst": m["v"].to_numpy(np.int64),
                "seed": m["seed"].to_numpy(np.int64),
                "cand": m["dist"].to_numpy(np.int64) + m["w"].to_numpy(np.int64),
            }
        )
        # map-side combine: lexicographic (cand, seed) min per dst
        out = out.sort_values(["dst", "cand", "seed"], kind="stable")
        first = ~out.duplicated(["dst"])
        return pa.Table.from_pandas(out[first], preserve_index=False).cast(emit_schema)

    def merge(n_t: pa.Table, l_t: pa.Table) -> pa.Table:
        ld = l_t.to_pandas()[["node", "seed", "dist"]]
        if n_t.num_rows:
            nd = n_t.to_pandas().rename(columns={"dst": "node", "cand": "dist"})
            allr = pd.concat([ld.assign(old=1), nd.assign(old=0)])
        else:
            allr = ld.assign(old=1)
        # winner = lexicographic (dist, seed) min; incumbent first among
        # exact ties so equal re-arrivals never flag an improvement
        allr = allr.sort_values(
            ["node", "dist", "seed", "old"],
            ascending=[True, True, True, False], kind="stable",
        )
        first = ~allr.duplicated(["node"])
        win = allr[first]
        return pa.table(
            {
                "node": pa.array(win["node"].to_numpy(np.int64)),
                "seed": pa.array(win["seed"].to_numpy(np.int64)),
                "dist": pa.array(win["dist"].to_numpy(np.int64)),
                "imp": pa.array((win["old"] == 0).to_numpy().astype(np.int64)),
            }
        )

    for _rnd in range(_SSSP_MAX_ROUNDS):
        nxt = direct_cogroup(
            [labels, edges], [["node"], ["u"]], num_parts, expand,
            [_NV_LABEL_SCHEMA, _SSSP_EDGE_SCHEMA], emit_partitioned_on=["dst"],
        )
        labels = direct_cogroup(
            [nxt, labels], [["dst"], ["node"]], num_parts, merge,
            [emit_schema, _NV_LABEL_SCHEMA], emit_partitioned_on=["node"],
        )
        improved = sum(
            int(b["imp"].to_numpy(zero_copy_only=False).sum())
            for b in labels.to_dataset().select_columns(["imp"]).iter_batches(
                batch_format="pyarrow"
            )
        )
        if improved == 0:
            break
    else:
        raise RuntimeError(
            f"network_voronoi did not reach fixpoint in {_SSSP_MAX_ROUNDS} rounds"
        )

    out = labels.to_dataset().to_pandas()
    if out.empty:
        return empty
    out = out[["node", "seed", "dist"]]
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("node").reset_index(drop=True)


# --- minimum spanning forest (Boruvka) ----------------------------------------------


_MST_LAB_SCHEMA = pa.schema([("node", pa.int64()), ("comp", pa.int64())])
_MST_E1_SCHEMA = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()), ("cu", pa.int64())]
)
_MST_E2_SCHEMA = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("w", pa.int64()),
     ("cu", pa.int64()), ("cv", pa.int64())]
)
_MST_MAX_ROUNDS = 48


def street_mst(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Minimum spanning forest of the street graph (edges weighted by exact
    L1 length) — the backbone-extraction primitive behind network
    generalization, clustering (single-linkage = MSF) and redundancy
    audits. Ties are broken by the total order (w, min(u,v), max(u,v)),
    which makes the forest UNIQUE, so Borůvka here and Kruskal in the
    oracle must produce the identical edge set. Output: one (u, v, w) row
    per forest edge, u < v, sorted.

    Distributed shape: textbook Borůvka — per round (a) two node-keyed
    exchanges attach component labels to the static edge list, (b) one
    comp-keyed exchange picks each component's minimum outgoing edge
    (map-side combiner keeps per-partition minima, so the exchange carries
    ≤ one row per (partition, comp)), (c) the selected COMPONENT-pair
    graph — at most one edge per component, halving each round — runs
    through the alternating-star ``connected_components`` contraction,
    and (d) one exchange relabels vertices. Rounds ≤ log₂V;
    ``_MST_MAX_ROUNDS`` RAISES, never truncates. The driver only ever
    sees the per-round selected-edge count."""
    from ..ops import direct_cogroup
    from .dedup import connected_components

    import ray.data as rd

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ("u", "v", "w")}
    )
    edges, _srcs = _street_edges_and_sources(
        ways_geo_ds, num_parts=num_parts, k_sources=1
    )
    if edges is None:
        return empty

    def seed_labels(t: pa.Table) -> pa.Table:
        uu = np.unique(t["u"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"node": pa.array(uu), "comp": pa.array(uu)})

    labels = direct_cogroup(
        [edges], [["u"]], num_parts, seed_labels, [_SSSP_EDGE_SCHEMA],
        emit_partitioned_on=["node"],
    )

    def attach_u(e_t: pa.Table, l_t: pa.Table) -> pa.Table:
        if e_t.num_rows == 0:
            return _MST_E1_SCHEMA.empty_table()
        m = e_t.to_pandas().merge(
            l_t.to_pandas(), left_on="u", right_on="node", how="inner"
        )
        return pa.Table.from_pandas(
            m.rename(columns={"comp": "cu"})[["u", "v", "w", "cu"]],
            preserve_index=False,
        ).cast(_MST_E1_SCHEMA)

    def attach_v(e_t: pa.Table, l_t: pa.Table) -> pa.Table:
        if e_t.num_rows == 0:
            return _MST_E2_SCHEMA.empty_table()
        m = e_t.to_pandas().merge(
            l_t.to_pandas(), left_on="v", right_on="node", how="inner"
        ).rename(columns={"comp": "cv"})
        m = m[m["cu"] != m["cv"]]
        if m.empty:
            return _MST_E2_SCHEMA.empty_table()
        # canonical edge key + map-side combine: per-cu lexicographic
        # (w, a, b) minimum — the exchange moves <= one row per comp
        a = np.minimum(m["u"].to_numpy(np.int64), m["v"].to_numpy(np.int64))
        b = np.maximum(m["u"].to_numpy(np.int64), m["v"].to_numpy(np.int64))
        d = pd.DataFrame(
            {"u": a, "v": b, "w": m["w"].to_numpy(np.int64),
             "cu": m["cu"].to_numpy(np.int64), "cv": m["cv"].to_numpy(np.int64)}
        ).sort_values(["cu", "w", "u", "v"], kind="stable")
        d = d[~d.duplicated(["cu"])]
        return pa.Table.from_pandas(d, preserve_index=False).cast(_MST_E2_SCHEMA)

    def pick_min(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _MST_E2_SCHEMA.empty_table()
        d = t.to_pandas().sort_values(["cu", "w", "u", "v"], kind="stable")
        return pa.Table.from_pandas(
            d[~d.duplicated(["cu"])], preserve_index=False
        ).cast(_MST_E2_SCHEMA)

    def relabel(l_t: pa.Table, s_t: pa.Table) -> pa.Table:
        ld = l_t.to_pandas()
        if ld.empty:
            return _MST_LAB_SCHEMA.empty_table()
        sd = s_t.to_pandas()
        if not sd.empty:
            m = ld.merge(sd, left_on="comp", right_on="u", how="left")
            ld = pd.DataFrame(
                {"node": m["node"].to_numpy(np.int64),
                 "comp": m["v"].fillna(m["comp"]).to_numpy(np.int64)}
            )
        return pa.Table.from_pandas(
            ld[["node", "comp"]], preserve_index=False
        ).cast(_MST_LAB_SCHEMA)

    chosen: list = []
    for _rnd in range(_MST_MAX_ROUNDS):
        e1 = direct_cogroup(
            [edges, labels], [["u"], ["node"]], num_parts, attach_u,
            [_SSSP_EDGE_SCHEMA, _MST_LAB_SCHEMA], emit_partitioned_on=["v"],
        )
        e2 = direct_cogroup(
            [e1, labels], [["v"], ["node"]], num_parts, attach_v,
            [_MST_E1_SCHEMA, _MST_LAB_SCHEMA], emit_partitioned_on=["cu"],
        )
        sel = direct_cogroup(
            [e2], [["cu"]], num_parts, pick_min, [_MST_E2_SCHEMA],
        ).materialize()
        if sel.count() == 0:
            break
        chosen.append(sel.select_columns(["u", "v", "w"]))
        merge_pairs = sel.select_columns(["cu", "cv"]).rename_columns(["u", "v"])
        stars = connected_components(merge_pairs, num_parts=num_parts)
        labels = direct_cogroup(
            [labels, stars], [["comp"], ["u"]], num_parts, relabel,
            [_MST_LAB_SCHEMA, pa.schema([("u", pa.int64()), ("v", pa.int64())])],
            emit_partitioned_on=["node"],
        )
    else:
        raise RuntimeError(
            f"street_mst did not reach fixpoint in {_MST_MAX_ROUNDS} rounds"
        )

    if not chosen:
        return empty
    mst = chosen[0]
    for part in chosen[1:]:
        mst = mst.union(part)

    def dedup_exact_edges(t: pa.Table) -> pa.Table:
        # the same edge is selected by BOTH endpoint components in the
        # round that merges them — exact-duplicate rows, one exchange
        if t.num_rows == 0:
            return _SSSP_EDGE_SCHEMA.empty_table()
        d = t.to_pandas().drop_duplicates(["u", "v"])
        return pa.Table.from_pandas(d, preserve_index=False).cast(_SSSP_EDGE_SCHEMA)

    out = direct_cogroup(
        [mst.materialize()], [["u"]], num_parts, dedup_exact_edges,
        [_SSSP_EDGE_SCHEMA],
    ).to_pandas()
    if out.empty:
        return empty
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["u", "v"]).reset_index(drop=True)


# --- maximal independent set (Luby, fixed hash priorities) --------------------------


_MIS_STATE_SCHEMA = pa.schema(
    [("node", pa.int64()), ("p", pa.int64()), ("st", pa.int64()),
     ("new", pa.int64())]
)
_MIS_MSG_SCHEMA = pa.schema(
    [("dst", pa.int64()), ("mp", pa.int64()), ("mid", pa.int64()),
     ("kill", pa.int64())]
)
_MIS_MAX_ROUNDS = 64


def _mis_priority(v: np.ndarray) -> np.ndarray:
    """Fixed deterministic priority: the repo's multiplicative-hash spec
    ((v mod 2³¹)·2654435761 mod 2³², reduce BEFORE multiplying)."""
    return ((v % 2147483648) * 2654435761) % (1 << 32)


def street_mis(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Maximal independent set over the street graph — the non-adjacent
    representative-selection primitive (sensor/sign placement, landmark
    sampling, graph-coloring seeds): no two selected vertices share a
    segment, and no unselected vertex could be added. Priorities are the
    FIXED multiplicative hash of the vertex id (ties by id), which makes
    the result the unique greedy lexicographic MIS — the scalar oracle
    replays greedy insertion in (p, id) order and the sets must match
    exactly. Output: (node, in_mis) for every graph vertex.

    Distributed shape: Luby-style rounds, ONE fused message exchange per
    round — undecided vertices send (p, id) to neighbors, NEWLY selected
    vertices send a kill flag (senders are only the undecided + newly-IN
    frontier, so per-round volume tracks the undecided subgraph, which
    shrinks geometrically); a vertex joins when it beats the (p, id) min
    of its undecided neighborhood, leaves when any neighbor joined.
    Fixed priorities mean adjacent vertices can never join in the same
    round. ``_MIS_MAX_ROUNDS`` RAISES, never truncates."""
    from ..ops import direct_cogroup

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ("node", "in_mis")}
    )
    edges, _srcs = _street_edges_and_sources(
        ways_geo_ds, num_parts=num_parts, k_sources=1
    )
    if edges is None:
        return empty

    def seed_states(t: pa.Table) -> pa.Table:
        uu = np.unique(t["u"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table(
            {
                "node": pa.array(uu),
                "p": pa.array(_mis_priority(uu)),
                "st": pa.array(np.zeros(len(uu), np.int64)),
                "new": pa.array(np.zeros(len(uu), np.int64)),
            }
        )

    states = direct_cogroup(
        [edges], [["u"]], num_parts, seed_states, [_SSSP_EDGE_SCHEMA],
        emit_partitioned_on=["node"],
    )

    def emit_msgs(e_t: pa.Table, s_t: pa.Table) -> pa.Table:
        if e_t.num_rows == 0 or s_t.num_rows == 0:
            return _MIS_MSG_SCHEMA.empty_table()
        sd = s_t.to_pandas()
        sd = sd[(sd["st"] == 0) | ((sd["st"] == 1) & (sd["new"] == 1))]
        if sd.empty:
            return _MIS_MSG_SCHEMA.empty_table()
        m = e_t.to_pandas().merge(sd, left_on="u", right_on="node", how="inner")
        if m.empty:
            return _MIS_MSG_SCHEMA.empty_table()
        return pa.table(
            {
                "dst": pa.array(m["v"].to_numpy(np.int64)),
                "mp": pa.array(m["p"].to_numpy(np.int64)),
                "mid": pa.array(m["u"].to_numpy(np.int64)),
                "kill": pa.array((m["st"] == 1).to_numpy().astype(np.int64)),
            }
        )

    def decide(m_t: pa.Table, s_t: pa.Table) -> pa.Table:
        sd = s_t.to_pandas()
        if sd.empty:
            return _MIS_STATE_SCHEMA.empty_table()
        sd = sd.copy()
        md = m_t.to_pandas() if m_t.num_rows else None
        und = sd["st"].to_numpy() == 0
        killed = np.zeros(len(sd), bool)
        best_p = np.full(len(sd), np.iinfo(np.int64).max, np.int64)
        best_id = np.full(len(sd), np.iinfo(np.int64).max, np.int64)
        if md is not None and not md.empty:
            idx = pd.Series(np.arange(len(sd)), index=sd["node"].to_numpy())
            pos = idx.reindex(md["dst"].to_numpy()).to_numpy()
            ok = ~pd.isna(pos)
            pos = pos[ok].astype(np.int64)
            mk = md["kill"].to_numpy(np.int64)[ok]
            mp = md["mp"].to_numpy(np.int64)[ok]
            mid = md["mid"].to_numpy(np.int64)[ok]
            np.logical_or.at(killed, pos[mk == 1], True)
            live = mk == 0
            # running lexicographic (mp, mid) min per receiver
            o = np.lexsort((mid[live], mp[live], pos[live]))
            lp, lmp, lmid = pos[live][o], mp[live][o], mid[live][o]
            first = np.r_[True, lp[1:] != lp[:-1]]
            best_p[lp[first]] = lmp[first]
            best_id[lp[first]] = lmid[first]
        own_p = sd["p"].to_numpy(np.int64)
        own_id = sd["node"].to_numpy(np.int64)
        wins = (own_p < best_p) | ((own_p == best_p) & (own_id < best_id))
        st = sd["st"].to_numpy(np.int64).copy()
        new = np.zeros(len(sd), np.int64)
        go_out = und & killed
        go_in = und & ~killed & wins
        st[go_out] = 2
        st[go_in] = 1
        new[go_in] = 1
        return pa.table(
            {
                "node": pa.array(own_id),
                "p": pa.array(own_p),
                "st": pa.array(st),
                "new": pa.array(new),
            }
        )

    for _rnd in range(_MIS_MAX_ROUNDS):
        msgs = direct_cogroup(
            [edges, states], [["u"], ["node"]], num_parts, emit_msgs,
            [_SSSP_EDGE_SCHEMA, _MIS_STATE_SCHEMA], emit_partitioned_on=["dst"],
        )
        states = direct_cogroup(
            [msgs, states], [["dst"], ["node"]], num_parts, decide,
            [_MIS_MSG_SCHEMA, _MIS_STATE_SCHEMA], emit_partitioned_on=["node"],
        )
        undecided = sum(
            int((b["st"].to_numpy(zero_copy_only=False) == 0).sum())
            for b in states.to_dataset().select_columns(["st"]).iter_batches(
                batch_format="pyarrow"
            )
        )
        if undecided == 0:
            break
    else:
        raise RuntimeError(
            f"street_mis did not converge in {_MIS_MAX_ROUNDS} rounds"
        )

    out = states.to_dataset().to_pandas()
    if out.empty:
        return empty
    out = pd.DataFrame(
        {"node": out["node"].astype("int64"),
         "in_mis": (out["st"] == 1).astype("int64")}
    )
    return out.sort_values("node").reset_index(drop=True)


# --------------------------------------------------------------------------
# polygon relate: exact DE-9IM-style classification of closed-ring pairs
# --------------------------------------------------------------------------

_RELATE_RING_SCHEMA = pa.schema(
    [
        ("cell", pa.int64()),
        ("way_id", pa.int64()),
        ("x0", pa.int64()),
        ("x1", pa.int64()),
        ("y0", pa.int64()),
        ("y1", pa.int64()),
        ("xs", pa.list_(pa.int64())),
        ("ys", pa.list_(pa.int64())),
    ]
)

_RELATE_SCHEMA = pa.schema(
    [
        ("way_a", pa.int64()),
        ("way_b", pa.int64()),
        ("n_cross", pa.int64()),
        ("n_touch", pa.int64()),
        ("relation", pa.string()),
    ]
)

_RELATE_NAMES = np.array(
    ["disjoint", "touches", "crosses", "within", "contains", "boundary_equal"]
)


def _relate_rings(t: pa.Table) -> pa.Table:
    """Closed rings (polygon_audit closure rule) replicated to every
    HULL_CELL_UNITS cell their bbox covers."""
    s = t.filter(t["nonzero"]) if "nonzero" in t.schema.names else t
    if s.num_rows == 0:
        return _RELATE_RING_SCHEMA.empty_table()
    xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
    ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
    offs = np.asarray(xs_col.offsets, np.int64)
    offs = offs - offs[0]
    fx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
    fy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
    wid = s["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.diff(offs)
    first_i, last_i = offs[:-1], offs[1:] - 1
    closed = (counts >= 3) & (fx[first_i] == fx[last_i]) & (fy[first_i] == fy[last_i])
    if not closed.any():
        return _RELATE_RING_SCHEMA.empty_table()
    keep_pt = np.repeat(closed, counts)
    fx, fy = fx[keep_pt], fy[keep_pt]
    wid, counts = wid[closed], counts[closed]
    starts = np.cumsum(counts) - counts
    x0 = np.minimum.reduceat(fx, starts)
    x1 = np.maximum.reduceat(fx, starts)
    y0 = np.minimum.reduceat(fy, starts)
    y1 = np.maximum.reduceat(fy, starts)
    c = HULL_CELL_UNITS
    cx0, cx1, cy0, cy1 = x0 // c, x1 // c, y0 // c, y1 // c
    ncx, ncy = cx1 - cx0 + 1, cy1 - cy0 + 1
    tot = ncx * ncy
    total = int(tot.sum())
    rep = np.repeat(np.arange(len(wid), dtype=np.int64), tot)
    cum = np.cumsum(tot) - tot
    k = np.arange(total, dtype=np.int64) - np.repeat(cum, tot)
    cx = cx0[rep] + k // ncy[rep]
    cy = cy0[rep] + k % ncy[rep]
    ring_off = pa.array(np.r_[np.int64(0), np.cumsum(counts)], pa.int32())
    xs_list = pa.ListArray.from_arrays(ring_off, pa.array(fx, pa.int64()))
    ys_list = pa.ListArray.from_arrays(ring_off, pa.array(fy, pa.int64()))
    return pa.table(
        {
            "cell": _cell_key(cx, cy),
            "way_id": pa.array(wid[rep], pa.int64()),
            "x0": pa.array(x0[rep], pa.int64()),
            "x1": pa.array(x1[rep], pa.int64()),
            "y0": pa.array(y0[rep], pa.int64()),
            "y1": pa.array(y1[rep], pa.int64()),
            "xs": xs_list.take(pa.array(rep, pa.int64())),
            "ys": ys_list.take(pa.array(rep, pa.int64())),
        }
    ).cast(_RELATE_RING_SCHEMA)


def _onseg(px, py, sx1, sy1, sx2, sy2):
    """Given collinearity, point-on-segment == bbox containment."""
    return (
        (px >= np.minimum(sx1, sx2))
        & (px <= np.maximum(sx1, sx2))
        & (py >= np.minimum(sy1, sy2))
        & (py <= np.maximum(sy1, sy2))
    )


def _containment_side(fx, fy, offs, iv, ie, ancx, ancy):
    """Per pair: is ring ``iv`` inside ring ``ie``?

    Chosen test vertex = the LOWEST-seq vertex of iv (closing duplicate
    excluded) not on ie's boundary; strict-interior by exact crossing-number
    parity. Returns (inside: bool[P], has_free_vertex: bool[P])."""
    cnt = np.diff(offs)
    P = len(iv)
    nv = cnt[iv] - 1  # vertices, closing dup dropped
    ne = cnt[ie] - 1  # edges of the other ring
    # level-1 expansion: (pair, vertex)
    totv = int(nv.sum())
    pidv = np.repeat(np.arange(P, dtype=np.int64), nv)
    cumv = np.cumsum(nv) - nv
    kv = np.arange(totv, dtype=np.int64) - np.repeat(cumv, nv)
    vflat = offs[iv][pidv] + kv
    # level-2 expansion: (pair, vertex) x other-ring edge
    me = ne[pidv]
    tote = int(me.sum())
    pv = np.repeat(np.arange(totv, dtype=np.int64), me)
    cume = np.cumsum(me) - me
    ke = np.arange(tote, dtype=np.int64) - np.repeat(cume, me)
    eflat = offs[ie][pidv][pv] + ke
    qx = fx[vflat][pv] - ancx[pidv][pv]
    qy = fy[vflat][pv] - ancy[pidv][pv]
    ax = fx[eflat] - ancx[pidv][pv]
    ay = fy[eflat] - ancy[pidv][pv]
    bx = fx[eflat + 1] - ancx[pidv][pv]
    by = fy[eflat + 1] - ancy[pidv][pv]
    cr = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
    onb_e = (cr == 0) & _onseg(qx, qy, ax, ay, bx, by)
    onb = np.bincount(pv, onb_e, minlength=totv) > 0
    # first free vertex per pair: min kv among ~onb
    BIG = np.int64(1) << 60
    key = np.where(onb, BIG, kv)
    if totv:
        minkey = np.minimum.reduceat(key, cumv)
    else:
        minkey = np.empty(0, np.int64)
    has_free = minkey < BIG
    # crossing parity for the chosen vertex: reuse the level-2 rows whose
    # vertex IS the chosen one
    chosen = kv == minkey[pidv]
    up = (ay <= qy) & (by > qy) & (cr > 0)
    dn = (by <= qy) & (ay > qy) & (cr < 0)
    hit = (up | dn) & chosen[pv] & ~onb[pv]
    crossings = np.bincount(pidv[pv], hit, minlength=P).astype(np.int64)
    inside = has_free & (crossings % 2 == 1)
    return inside, has_free


def _relate_kernel(fx, fy, offs, ia, ib):
    """Exact integer relate of ring pairs (flat coords + offsets, pair index
    arrays). Returns (n_cross, n_touch, relation_code) int64 arrays.

    Spec (the SQL oracle mirrors it verbatim):
      o1..o4 = the four edge-pair orientation cross products; PROPER
      crossing = strictly opposite nonzero signs on both; TOUCH = any
      collinear endpoint-on-segment contact on a non-proper pair.
      Containment: lowest-seq vertex not on the other boundary, strict
      crossing-number parity. relation precedence: crosses > within >
      contains > boundary_equal > touches > disjoint.
    """
    P = len(ia)
    if P == 0:
        z = np.empty(0, np.int64)
        return z, z, z
    cnt = np.diff(offs)
    starts = offs[:-1]
    rminx = np.minimum.reduceat(fx, starts)
    rminy = np.minimum.reduceat(fy, starts)
    rmaxx = np.maximum.reduceat(fx, starts)
    rmaxy = np.maximum.reduceat(fy, starts)
    ancx = np.minimum(rminx[ia], rminx[ib])
    ancy = np.minimum(rminy[ia], rminy[ib])
    ext = np.maximum(
        np.maximum(rmaxx[ia], rmaxx[ib]) - ancx,
        np.maximum(rmaxy[ia], rmaxy[ib]) - ancy,
    )
    if ext.size and int(ext.max()) >= (1 << 31):
        raise OverflowError(
            "polygon_relate: pair bbox extent >= 2^31 units; orientation "
            "products would overflow int64"
        )
    na, nb_ = cnt[ia] - 1, cnt[ib] - 1
    M = na * nb_
    tot = int(M.sum())
    pid = np.repeat(np.arange(P, dtype=np.int64), M)
    cum = np.cumsum(M) - M
    k = np.arange(tot, dtype=np.int64) - np.repeat(cum, M)
    ea = k // nb_[pid]
    eb = k % nb_[pid]
    A = offs[ia][pid] + ea
    B = offs[ib][pid] + eb
    ax0, ay0 = ancx[pid], ancy[pid]
    a1x, a1y = fx[A] - ax0, fy[A] - ay0
    a2x, a2y = fx[A + 1] - ax0, fy[A + 1] - ay0
    b1x, b1y = fx[B] - ax0, fy[B] - ay0
    b2x, b2y = fx[B + 1] - ax0, fy[B + 1] - ay0
    o1 = (a2x - a1x) * (b1y - a1y) - (a2y - a1y) * (b1x - a1x)
    o2 = (a2x - a1x) * (b2y - a1y) - (a2y - a1y) * (b2x - a1x)
    o3 = (b2x - b1x) * (a1y - b1y) - (b2y - b1y) * (a1x - b1x)
    o4 = (b2x - b1x) * (a2y - b1y) - (b2y - b1y) * (a2x - b1x)
    proper = (((o1 > 0) & (o2 < 0)) | ((o1 < 0) & (o2 > 0))) & (
        ((o3 > 0) & (o4 < 0)) | ((o3 < 0) & (o4 > 0))
    )
    touch = ~proper & (
        ((o1 == 0) & _onseg(b1x, b1y, a1x, a1y, a2x, a2y))
        | ((o2 == 0) & _onseg(b2x, b2y, a1x, a1y, a2x, a2y))
        | ((o3 == 0) & _onseg(a1x, a1y, b1x, b1y, b2x, b2y))
        | ((o4 == 0) & _onseg(a2x, a2y, b1x, b1y, b2x, b2y))
    )
    n_cross = np.bincount(pid, proper, minlength=P).astype(np.int64)
    n_touch = np.bincount(pid, touch, minlength=P).astype(np.int64)
    a_in, free_a = _containment_side(fx, fy, offs, ia, ib, ancx, ancy)
    b_in, free_b = _containment_side(fx, fy, offs, ib, ia, ancx, ancy)
    rel = np.zeros(P, np.int64)
    rel[n_touch > 0] = 1
    rel[~free_a & ~free_b] = 5
    rel[b_in] = 4
    rel[a_in] = 3
    rel[n_cross > 0] = 2
    return n_cross, n_touch, rel


def polygon_relate(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Topological relationship of every bbox-overlapping pair of closed
    rings — disjoint / touches / crosses / within / contains /
    boundary_equal — using EXACT integer predicates only (orientation
    signs, collinear on-segment, crossing-number parity; no constructed
    intersection coordinates, so nothing is approximate). The
    st_relate-family overlay primitive a conflation pipeline runs before
    merging polygon datasets.

    Shape: rings replicate to covered HULL_CELL_UNITS cells (ONE cell-keyed
    exchange); per cell a vectorized bbox sweep yields candidates, each
    pair emitted only from the cell holding its intersection-bbox min
    corner (reference-point dedup — no second exchange). All edge x edge
    and vertex x edge predicate batches run as flat numpy expansions
    ACROSS pairs. Per-pair products are pair-bbox-anchored; extents
    >= 2^31 units raise rather than wrap (polygon_audit guard family).
    """

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _RELATE_SCHEMA.empty_table()
        cell = t["cell"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        t = t.take(pa.array(order, pa.int64()))
        cell = cell[order]
        wid = t["way_id"].to_numpy(zero_copy_only=False)
        x0 = t["x0"].to_numpy(zero_copy_only=False)
        x1 = t["x1"].to_numpy(zero_copy_only=False)
        y0 = t["y0"].to_numpy(zero_copy_only=False)
        y1 = t["y1"].to_numpy(zero_copy_only=False)
        xs_col = t["xs"].combine_chunks() if isinstance(t["xs"], pa.ChunkedArray) else t["xs"]
        ys_col = t["ys"].combine_chunks() if isinstance(t["ys"], pa.ChunkedArray) else t["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        fx = np.asarray(xs_col.flatten(), np.int64)
        fy = np.asarray(ys_col.flatten(), np.int64)
        c = HULL_CELL_UNITS
        bounds = np.r_[0, np.flatnonzero(cell[1:] != cell[:-1]) + 1, len(cell)]
        ia_all, ib_all = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            kk = e - s
            if kk < 2:
                continue
            ii, jj = np.triu_indices(kk, 1)
            ii += s
            jj += s
            # canonical orientation way_a < way_b
            swap = wid[ii] > wid[jj]
            ii2 = np.where(swap, jj, ii)
            jj2 = np.where(swap, ii, jj)
            ii, jj = ii2, jj2
            keep = (
                (wid[ii] != wid[jj])
                & (x0[ii] <= x1[jj]) & (x0[jj] <= x1[ii])
                & (y0[ii] <= y1[jj]) & (y0[jj] <= y1[ii])
            )
            ii, jj = ii[keep], jj[keep]
            # reference-point dedup: intersection bbox min corner in THIS cell
            rx = np.maximum(x0[ii], x0[jj])
            ry = np.maximum(y0[ii], y0[jj])
            this = _cell_key(rx // c, ry // c) == cell[s]
            ia_all.append(ii[this])
            ib_all.append(jj[this])
        if not ia_all:
            return _RELATE_SCHEMA.empty_table()
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        if not len(ia):
            return _RELATE_SCHEMA.empty_table()
        n_cross, n_touch, rel = _relate_kernel(fx, fy, offs, ia, ib)
        return pa.table(
            {
                "way_a": pa.array(wid[ia], pa.int64()),
                "way_b": pa.array(wid[ib], pa.int64()),
                "n_cross": pa.array(n_cross, pa.int64()),
                "n_touch": pa.array(n_touch, pa.int64()),
                "relation": pa.array(_RELATE_NAMES[rel]),
            }
        ).cast(_RELATE_SCHEMA)

    from ..ops import direct_partitioned_map

    rings = ways_geo_ds.map_batches(_relate_rings, batch_format="pyarrow")
    out = direct_partitioned_map(
        rings, ["cell"], num_parts, fn, _RELATE_RING_SCHEMA
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "way_a": pd.Series([], dtype="int64"),
                "way_b": pd.Series([], dtype="int64"),
                "n_cross": pd.Series([], dtype="int64"),
                "n_touch": pd.Series([], dtype="int64"),
                "relation": pd.Series([], dtype="object"),
            }
        )
    return out.sort_values(["way_a", "way_b"]).reset_index(drop=True)


def relate_augment(ways_geo_ds):
    """Overlay-test corpus enrichment: per closed ring, emit the ring plus
    three deterministic twins — a (bw//2, bh//2)-shifted copy
    (way_id + 1e9, crossing geometry), an exact duplicate (way_id + 2e9,
    boundary_equal), and a 2x2-unit square at the bbox center
    (way_id + 3e9, containment probe). A stateless flat map; twin ids are
    disjoint from real way ids by construction."""

    def fn(t: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [
                ("way_id", pa.int64()),
                ("xs", pa.list_(pa.float64())),
                ("ys", pa.list_(pa.float64())),
                ("nonzero", pa.bool_()),
            ]
        )
        s = t.filter(t["nonzero"]) if "nonzero" in t.schema.names else t
        if s.num_rows == 0:
            return out_schema.empty_table()
        xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
        ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        fx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
        fy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
        wid = s["way_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        first_i, last_i = offs[:-1], offs[1:] - 1
        closed = (counts >= 3) & (fx[first_i] == fx[last_i]) & (fy[first_i] == fy[last_i])
        w_ids, xs_out, ys_out = [], [], []

        def emit(w, xs, ys):
            w_ids.append(int(w))
            xs_out.append([v / QUANT for v in xs])
            ys_out.append([v / QUANT for v in ys])

        for i in np.flatnonzero(closed):
            sl = slice(offs[i], offs[i + 1])
            xs, ys = fx[sl], fy[sl]
            x0, x1 = int(xs.min()), int(xs.max())
            y0, y1 = int(ys.min()), int(ys.max())
            emit(wid[i], xs, ys)
            dx, dy = (x1 - x0) // 2, (y1 - y0) // 2
            if dx or dy:
                emit(wid[i] + 1_000_000_000, xs + dx, ys + dy)
            emit(wid[i] + 2_000_000_000, xs, ys)
            cx, cy = (x0 + x1) // 2, (y0 + y1) // 2
            emit(
                wid[i] + 3_000_000_000,
                [cx - 1, cx + 1, cx + 1, cx - 1, cx - 1],
                [cy - 1, cy - 1, cy + 1, cy + 1, cy - 1],
            )
            # same square under a SMALLER id: the pair orients as 'within'
            emit(
                wid[i] - 4_000_000_000,
                [cx - 1, cx + 1, cx + 1, cx - 1, cx - 1],
                [cy - 1, cy - 1, cy + 1, cy + 1, cy - 1],
            )
            # bbox-corner square: bboxes meet at the single point (x0, y0) —
            # 'touches' when the ring has a vertex there, else 'disjoint'
            emit(
                wid[i] + 5_000_000_000,
                [x0 - 2, x0, x0, x0 - 2, x0 - 2],
                [y0 - 2, y0 - 2, y0, y0, y0 - 2],
            )
        return pa.table(
            {
                "way_id": pa.array(w_ids, pa.int64()),
                "xs": pa.array(xs_out, pa.list_(pa.float64())),
                "ys": pa.array(ys_out, pa.list_(pa.float64())),
                "nonzero": pa.array([True] * len(w_ids), pa.bool_()),
            }
        )

    return ways_geo_ds.map_batches(fn, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Hilbert-curve linearization + locality audit
# --------------------------------------------------------------------------

HILBERT_ORDER = 16  # 2^16 × 2^16 curve grid; SQL oracle hardcodes the same


def _hilbert_d(x: np.ndarray, y: np.ndarray, order: int) -> np.ndarray:
    """Vectorized xy→d Hilbert index (the classic rotate-and-fold loop,
    Hamilton's / Wikipedia formulation) over int64 grids in [0, 2^order).
    d max = 4^order − 1 (≈4.3e9 at order 16) — int64 throughout."""
    x = np.asarray(x, np.int64).copy()
    y = np.asarray(y, np.int64).copy()
    d = np.zeros(len(x), np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        flip = ry == 0
        xf = np.where(flip & (rx == 1), s - 1 - x, x)
        yf = np.where(flip & (rx == 1), s - 1 - y, y)
        x, y = np.where(flip, yf, x), np.where(flip, xf, y)
        s >>= 1
    return d


_HILB_PART = pa.schema(
    [
        ("kind", pa.int8()),     # 0 = histogram partial, 1 = bucket edge row
        ("ordering", pa.string()),
        ("bucket", pa.int64()),
        ("pos", pa.int8()),      # edge rows: 0 = first-in-bucket, 1 = last
        ("digits", pa.int64()),  # hist rows: decimal digits of the L1 jump
        ("n", pa.int64()),
        ("s", pa.int64()),
        ("ix", pa.int64()),
        ("iy", pa.int64()),
    ]
)
_P10 = 10 ** np.arange(1, 19, dtype=np.int64)


def _l1_digits(l1: np.ndarray) -> np.ndarray:
    """Decimal digit count of a nonneg int64 — length(l1::VARCHAR) in SQL."""
    return np.maximum(np.searchsorted(_P10, l1, side="right") + 1, 1).astype(np.int64)


def hilbert_locality_nwa(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """``hilbert_locality`` over the nodes_with_addresses layer's points."""
    return hilbert_locality(points_from_nwa(nwa_ds), num_parts=num_parts)


def hilbert_locality(points_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Hilbert-curve linearization of the address points with a locality
    audit against row-major order — the space-filling-curve layout primitive
    behind spatially-clustered parquet/Lance file ordering (write data in
    curve order and range scans touch few files). For BOTH orderings
    (``hilbert``: curve index at order 16 over min-anchored, shifted grid
    coords, ties by pid; ``row_major``: lexicographic (iy, ix, pid)), every
    CONSECUTIVE point pair's L1 jump |Δix|+|Δiy| is bucketed by its decimal
    digit count. Output: (ordering, bucket, n_pairs, sum_l1) — Hilbert
    should show mass shifted toward small buckets, which is the measurable
    claim behind choosing it for layout. All quantities exact integers.

    Distributed shape: one extent aggregate (per-block partials → driver
    min/max over ≤#blocks rows), then ONE exchange keyed by contiguous key
    ranges (top bits of the order key, ≤64+1 buckets per ordering): within a
    bucket all global-order neighbors are co-resident, so per-partition
    sort + diff computes every pair except the ≤64 bucket-boundary pairs,
    which travel as 2 edge rows per (ordering, bucket) to a driver-side
    merge — O(buckets), never O(points). The global sort this replaces is
    the curve's own virtue: bucketing BY the key IS the curve order.
    """
    from ..ops import direct_partitioned_map

    order = HILBERT_ORDER
    pts = points_ds.materialize()

    ext_schema = pa.schema(
        [("minx", pa.int64()), ("maxx", pa.int64()),
         ("miny", pa.int64()), ("maxy", pa.int64())]
    )

    def ext_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return ext_schema.empty_table()
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        return pa.table({
            "minx": pa.array([int(ix.min())]), "maxx": pa.array([int(ix.max())]),
            "miny": pa.array([int(iy.min())]), "maxy": pa.array([int(iy.max())]),
        })

    ext = pts.map_batches(ext_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({
        "ordering": pd.Series([], dtype=object),
        "bucket": pd.Series([], dtype="int64"),
        "n_pairs": pd.Series([], dtype="int64"),
        "sum_l1": pd.Series([], dtype="int64"),
    })
    if ext.empty:
        return empty
    minx, miny = int(ext["minx"].min()), int(ext["miny"].min())
    rng = max(int(ext["maxx"].max()) - minx, int(ext["maxy"].max()) - miny)
    shift = max(0, rng.bit_length() - order)
    # contiguous bucket widths: top-6-bits of each ordering's primary key
    hb = max(0, (2 * order) - 6)
    rb = max(0, rng.bit_length() - 6)

    key_schema = pa.schema(
        [("bucket", pa.int64()), ("ordering", pa.string()),
         ("k1", pa.int64()), ("k2", pa.int64()), ("k3", pa.int64()),
         ("ix", pa.int64()), ("iy", pa.int64())]
    )

    def keyed(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return key_schema.empty_table()
        pid = t["pid"].to_numpy(zero_copy_only=False)
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        xn, yn = ix - minx, iy - miny
        h = _hilbert_d(xn >> shift, yn >> shift, order)
        z = np.zeros(len(pid), np.int64)
        return pa.table({
            "bucket": pa.array(np.concatenate([h >> hb, yn >> rb])),
            "ordering": pa.array(
                ["hilbert"] * len(pid) + ["row_major"] * len(pid)),
            "k1": pa.array(np.concatenate([h, yn])),
            "k2": pa.array(np.concatenate([pid, xn])),
            "k3": pa.array(np.concatenate([z, pid])),
            "ix": pa.array(np.concatenate([ix, ix])),
            "iy": pa.array(np.concatenate([iy, iy])),
        })

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _HILB_PART.empty_table()
        df = t.to_pandas()
        out = {c: [] for c in _HILB_PART.names}

        def emit(kind, ordering, bucket, pos, digits, n, s, ix, iy):
            out["kind"].append(kind); out["ordering"].append(ordering)
            out["bucket"].append(bucket); out["pos"].append(pos)
            out["digits"].append(digits); out["n"].append(n); out["s"].append(s)
            out["ix"].append(ix); out["iy"].append(iy)

        for (ordering, bucket), g in df.groupby(["ordering", "bucket"], sort=False):
            o = np.lexsort((
                g["k3"].to_numpy(), g["k2"].to_numpy(), g["k1"].to_numpy()))
            ix = g["ix"].to_numpy()[o]
            iy = g["iy"].to_numpy()[o]
            emit(1, ordering, int(bucket), 0, 0, 0, 0, int(ix[0]), int(iy[0]))
            emit(1, ordering, int(bucket), 1, 0, 0, 0, int(ix[-1]), int(iy[-1]))
            if len(ix) > 1:
                l1 = np.abs(np.diff(ix)) + np.abs(np.diff(iy))
                dg = _l1_digits(l1)
                for d in np.unique(dg):
                    m = dg == d
                    emit(0, ordering, int(bucket), 0, int(d),
                         int(m.sum()), int(l1[m].sum()), 0, 0)
        return pa.Table.from_pandas(
            pd.DataFrame(out), preserve_index=False
        ).cast(_HILB_PART)

    parts = direct_partitioned_map(
        pts, ["ordering", "bucket"], num_parts, fold, key_schema, pre=keyed
    ).to_pandas()
    if parts.empty:
        return empty
    hist = parts[parts["kind"] == 0]
    agg: dict[tuple, list] = {}
    for _, r in hist.iterrows():
        k = (r["ordering"], int(r["digits"]))
        a = agg.setdefault(k, [0, 0])
        a[0] += int(r["n"]); a[1] += int(r["s"])
    # boundary pairs: adjacent nonempty buckets in bucket order
    edges = parts[parts["kind"] == 1]
    for ordering, g in edges.groupby("ordering", sort=False):
        g = g.sort_values(["bucket", "pos"], kind="stable")
        buckets = g["bucket"].unique()
        for b0, b1 in zip(buckets[:-1], buckets[1:]):
            last = g[(g["bucket"] == b0) & (g["pos"] == 1)].iloc[0]
            first = g[(g["bucket"] == b1) & (g["pos"] == 0)].iloc[0]
            l1 = abs(int(first["ix"]) - int(last["ix"])) + abs(
                int(first["iy"]) - int(last["iy"]))
            d = int(_l1_digits(np.array([l1], np.int64))[0])
            a = agg.setdefault((ordering, d), [0, 0])
            a[0] += 1; a[1] += l1
    rows = [
        {"ordering": o, "bucket": d, "n_pairs": v[0], "sum_l1": v[1]}
        for (o, d), v in agg.items()
    ]
    if not rows:  # a single point emits edge rows but no pairs
        return empty
    return (
        pd.DataFrame(rows)
        .astype({"bucket": "int64", "n_pairs": "int64", "sum_l1": "int64"})
        .sort_values(["ordering", "bucket"])
        .reset_index(drop=True)
    )


# --------------------------------------------------------------------------
# polygon dissolve (attribute-keyed merge of edge-adjacent parcels)
# --------------------------------------------------------------------------

_DISS_MULT = 2654435761
_DISS_PRIME = 1000003
_DISS_GRID_K = 4096  # parcel key stride (i*4096+j) — the SQL oracle mirrors it


def _parcel_hash(k: np.ndarray) -> np.ndarray:
    """The repo's multiplicative-hash spec ((k % 1000003)·2654435761 mod
    2³²) — plain int64 arithmetic, evaluated verbatim in the SQL oracle."""
    return (k % _DISS_PRIME) * _DISS_MULT % (1 << 32)


def polygon_dissolve(n_side: int = 48, *, num_parts: int = 8) -> pd.DataFrame:
    """GIS dissolve: merge edge-adjacent unit parcels that share a zone
    attribute into regions, reporting each region's parcel count and OUTER
    perimeter — the overlay step behind cadastre/zoning generalization
    (ST_Union-by-attribute). Corpus: a deterministic n×n parcel grid where
    parcel (i, j) exists iff hash(i·4096+j) % 10 < 8 and its zone is
    (hash // 10) % 4 — plain-arithmetic synthesis both sides evaluate.
    Perimeter is EXACT: 4·n_parcels − 2·(internal shared edges), where an
    edge is internal iff its two parcels share a zone (a different-zone
    neighbor keeps that edge on BOTH regions' boundaries).

    Distributed shape: parcels generate in range-partitioned tasks; each
    parcel emits its 2 forward (right/down) edge keys into ONE
    edge-keyed exchange where groups of ≤2 same-edge rows become adjacency
    pairs; components run on the PAIR list via the alternating star
    contraction (O(log² n) node-keyed exchanges over edges only); a final
    pid-keyed label join + region-keyed count finishes. No stage ever
    materializes the parcel grid on the driver.
    """
    import ray.data as rd

    from ..ops import direct_cogroup, direct_partitioned_map
    from .dedup import connected_components

    rows = rd.range(n_side).repartition(max(2, num_parts))

    parcel_schema = pa.schema(
        [("pid", pa.int64()), ("i", pa.int64()), ("j", pa.int64()),
         ("zone", pa.int64())]
    )

    def gen(t: pa.Table) -> pa.Table:
        ii = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        i = np.repeat(ii, n_side)
        j = np.tile(np.arange(n_side, dtype=np.int64), len(ii))
        h = _parcel_hash(i * _DISS_GRID_K + j)
        keep = (h % 10) < 8
        i, j, h = i[keep], j[keep], h[keep]
        return pa.table({
            "pid": pa.array(i * n_side + j),
            "i": pa.array(i), "j": pa.array(j),
            "zone": pa.array((h // 10) % 4),
        })

    parcels = rows.map_batches(gen, batch_format="pyarrow").materialize()

    # each parcel announces itself on its right and down edge keys; an edge
    # key groups ≤2 parcels, which become an adjacency pair iff zones match
    emit_schema = pa.schema(
        [("ek", pa.int64()), ("pid", pa.int64()), ("zone", pa.int64())]
    )

    def to_edge_rows(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False)
        j = t["j"].to_numpy(zero_copy_only=False)
        pid = t["pid"].to_numpy(zero_copy_only=False)
        z = t["zone"].to_numpy(zero_copy_only=False)
        # horizontal edge between (i,j)-(i,j+1): key 2*(i*K+j)+0 announced by
        # BOTH sides (left announces its right edge, right its left edge);
        # vertical likewise with parity 1
        right_of = 2 * (i * _DISS_GRID_K + j)
        left_of = 2 * (i * _DISS_GRID_K + (j - 1))
        below_of = 2 * (i * _DISS_GRID_K + j) + 1
        above_of = 2 * ((i - 1) * _DISS_GRID_K + j) + 1
        return pa.table({
            "ek": pa.array(np.concatenate([right_of, left_of, below_of, above_of])),
            "pid": pa.array(np.tile(pid, 4)),
            "zone": pa.array(np.tile(z, 4)),
        })

    def edge_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _CC_EDGE_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["ek", "pid"], kind="stable")
        ek = df["ek"].to_numpy()
        pid = df["pid"].to_numpy()
        z = df["zone"].to_numpy()
        same = (ek[1:] == ek[:-1]) & (z[1:] == z[:-1])
        return pa.table({
            "u": pa.array(pid[:-1][same]), "v": pa.array(pid[1:][same]),
        })

    pairs = direct_partitioned_map(
        parcels, ["ek"], num_parts, edge_pairs, emit_schema, pre=to_edge_rows
    )
    pairs = pairs.materialize()
    n_internal = int(pairs.count())
    stars = connected_components(pairs, num_parts=num_parts)

    lbl_schema = pa.schema([("pid", pa.int64()), ("region", pa.int64())])

    def star_labels(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pid": pa.array(np.concatenate([u, v])),
            "region": pa.array(np.concatenate([v, v])),
        })

    labels = stars.map_batches(star_labels, batch_format="pyarrow")

    # pid-keyed cogroup: parcels ⨝ labels (absent label ⇒ singleton region)
    out_schema = pa.schema(
        [("region", pa.int64()), ("zone", pa.int64()),
         ("n_parcels", pa.int64()), ("n_internal", pa.int64())]
    )

    def finish(p_t: pa.Table, l_t: pa.Table) -> pa.Table:
        if p_t.num_rows == 0:
            return out_schema.empty_table()
        pdf = p_t.to_pandas()
        ldf = l_t.to_pandas().groupby("pid", as_index=False)["region"].min()
        m = pdf.merge(ldf, on="pid", how="left")
        m["region"] = m["region"].fillna(m["pid"]).astype("int64")
        g = m.groupby(["region"], as_index=False).agg(
            zone=("zone", "min"), n_parcels=("pid", "size"))
        g["n_internal"] = 0
        return pa.Table.from_pandas(
            g[["region", "zone", "n_parcels", "n_internal"]], preserve_index=False
        ).cast(out_schema)

    region_parts = direct_cogroup(
        [parcels, labels], [["pid"], ["pid"]], num_parts, finish,
        [parcel_schema, lbl_schema], emit_partitioned_on=["region"],
    )

    # internal-edge counts per region: one pid-keyed label join over pairs,
    # pre-partitioned on region to meet the parcel partials
    def edge_region(e_t: pa.Table, l_t: pa.Table) -> pa.Table:
        if e_t.num_rows == 0:
            return out_schema.empty_table()
        edf = e_t.to_pandas()
        ldf = l_t.to_pandas().groupby("pid", as_index=False)["region"].min()
        m = edf.merge(ldf, left_on="u", right_on="pid", how="left")
        m["region"] = m["region"].fillna(m["u"]).astype("int64")
        g = m.groupby("region", as_index=False).size()
        g.columns = ["region", "n_internal"]
        g["zone"] = -1
        g["n_parcels"] = 0
        return pa.Table.from_pandas(
            g[["region", "zone", "n_parcels", "n_internal"]], preserve_index=False
        ).cast(out_schema)

    edge_parts = direct_cogroup(
        [pairs, labels], [["u"], ["pid"]], num_parts, edge_region,
        [_CC_EDGE_SCHEMA, lbl_schema], emit_partitioned_on=["region"],
    )

    def merge_region(a_t: pa.Table, b_t: pa.Table) -> pa.Table:
        df = pd.concat([a_t.to_pandas(), b_t.to_pandas()])
        if df.empty:
            return out_schema.empty_table()
        g = df.groupby("region", as_index=False).agg(
            zone=("zone", "max"), n_parcels=("n_parcels", "sum"),
            n_internal=("n_internal", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False).cast(out_schema)

    merged = direct_cogroup(
        [region_parts, edge_parts], [["region"], ["region"]], num_parts,
        merge_region, [out_schema, out_schema],
    ).to_pandas()
    merged["perimeter"] = 4 * merged["n_parcels"] - 2 * merged["n_internal"]
    out = merged[["region", "zone", "n_parcels", "perimeter"]].astype("int64")
    assert int(merged["n_internal"].sum()) == n_internal
    return out.sort_values("region").reset_index(drop=True)


# --------------------------------------------------------------------------
# areal interpolation (proportional-area zonal reallocation)
# --------------------------------------------------------------------------

AREAL_CELL = 200_000          # source grid side in micro-degrees (0.02°)
_AREAL_Q = AREAL_CELL // 4    # target grid offset: S/4 → 9/3/3/1 weights


def areal_interp_nwa(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """``areal_interpolation`` over the nodes_with_addresses layer points."""
    return areal_interpolation(points_from_nwa(nwa_ds), num_parts=num_parts)


def areal_interpolation(points_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Areal interpolation (Goodchild & Lam 1980): reallocate per-source-zone
    address counts onto an INCOMPATIBLE target zoning by exact proportional
    overlap area — the zonal-rebasing step behind census-tract ↔ grid
    transfers. Source zones: the 0.02° grid anchored at the corpus min
    corner; target zones: the same grid shifted by S/4 on both axes, so
    every source cell splits into four target quadrants with exact overlap
    weights 9/16, 3/16, 3/16, 1/16. Output per target cell: alloc_16 =
    Σ 16·count·overlap/S² (an exact integer — no float area anywhere) and
    n_src, the number of contributing source cells.

    Distributed shape: one extent aggregate (per-block min partials), ONE
    cell-keyed exchange of pre-aggregated (sx, sy) count partials, then the
    4× quadrant expansion runs over SOURCE CELLS (already ≪ points) into a
    second cell-keyed sum. Points never reach the driver; both exchanges
    carry occupied-cell rows only.
    """
    from .relational import grouped_agg

    pts = points_ds.materialize()

    def ext_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("minx", pa.int64()), ("miny", pa.int64())]
            ).empty_table()
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        return pa.table({
            "minx": pa.array([int(ix.min())]),
            "miny": pa.array([int(iy.min())]),
        })

    ext = pts.map_batches(ext_partial, batch_format="pyarrow").to_pandas()
    empty = pd.DataFrame({
        "tx": pd.Series([], dtype="int64"),
        "ty": pd.Series([], dtype="int64"),
        "alloc_16": pd.Series([], dtype="int64"),
        "n_src": pd.Series([], dtype="int64"),
    })
    if ext.empty:
        return empty
    minx, miny = int(ext["minx"].min()), int(ext["miny"].min())
    S = AREAL_CELL

    def src_partial(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False) - minx
        iy = t["iy"].to_numpy(zero_copy_only=False) - miny
        g = (
            pd.DataFrame({"sx": ix // S, "sy": iy // S})
            .groupby(["sx", "sy"], sort=False).size().reset_index(name="c")
        )
        g["c"] = g["c"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    src = grouped_agg(
        pts.map_batches(src_partial, batch_format="pyarrow"),
        ["sx", "sy"],
        {"c": ("c", "sum")},
    )

    def quadrants(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("tx", pa.int64()), ("ty", pa.int64()),
                 ("alloc_16", pa.int64()), ("n_src", pa.int64())]
            ).empty_table()
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-axis overlap: 3S/4 stays in index sx/sy, S/4 spills to +1
        tx = np.concatenate([sx, sx + 1, sx, sx + 1])
        ty = np.concatenate([sy, sy, sy + 1, sy + 1])
        w = np.repeat(np.array([9, 3, 3, 1], dtype=np.int64), len(sx))
        return pa.table({
            "tx": pa.array(tx), "ty": pa.array(ty),
            "alloc_16": pa.array(np.tile(c, 4) * w),
            "n_src": pa.array(np.ones(4 * len(sx), dtype=np.int64)),
        })

    out = grouped_agg(
        src.map_batches(quadrants, batch_format="pyarrow"),
        ["tx", "ty"],
        {"alloc_16": ("alloc_16", "sum"), "n_src": ("n_src", "sum")},
    ).to_pandas()
    if out.empty:
        return empty
    for col in ("tx", "ty", "alloc_16", "n_src"):
        out[col] = out[col].astype("int64")
    return out.sort_values(["tx", "ty"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# label propagation communities (synchronous, deterministic)
# --------------------------------------------------------------------------

_LPA_ROUNDS = 4
_LPA_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])
_LPA_MSG_SCHEMA = pa.schema([("dst", pa.int64()), ("lab", pa.int64())])


def street_lpa(ways_geo_ds, *, rounds: int = _LPA_ROUNDS, num_parts: int = 8):
    """Label-propagation community detection (Raghavan et al. 2007) over the
    street graph, made DETERMINISTIC: synchronous rounds, label(v) starts as
    v, and each round every vertex adopts the most frequent label among its
    NEIGHBORS with ties to the smallest label — the unique fixed-``rounds``
    synchronous trajectory, which the SQL oracle replays round by round as a
    recursive CTE (no random visit order, no early stopping). Output:
    (node, label) for every street-graph vertex after ``rounds`` rounds —
    the cheap community/neighborhood signal behind locality-aware
    partitioning and district detection.

    Distributed shape: the deduped undirected edge list stays partitioned on
    u; per round TWO chained exchanges move O(|E|) label messages
    (edges ⨝ labels on u → (v, label) re-partitioned on v; per-v mode by
    count-then-min). No driver state; round count is a constant.
    """
    from ..ops import direct_cogroup

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64") for c in ("node", "label")}
    )
    edges, _srcs = _street_edges_and_sources(
        ways_geo_ds, num_parts=num_parts, k_sources=1
    )
    if edges is None:
        return empty

    def seed_labels(t: pa.Table) -> pa.Table:
        uu = np.unique(t["u"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"node": pa.array(uu), "lab": pa.array(uu)})

    labels = direct_cogroup(
        [edges], [["u"]], num_parts, seed_labels,
        [_SSSP_EDGE_SCHEMA], emit_partitioned_on=["node"],
    )
    lab_schema = pa.schema([("node", pa.int64()), ("lab", pa.int64())])

    def emit(e_t: pa.Table, l_t: pa.Table) -> pa.Table:
        if e_t.num_rows == 0 or l_t.num_rows == 0:
            return _LPA_MSG_SCHEMA.empty_table()
        m = e_t.to_pandas().merge(
            l_t.to_pandas(), left_on="u", right_on="node", how="inner"
        )
        if m.empty:
            return _LPA_MSG_SCHEMA.empty_table()
        return pa.table({
            "dst": pa.array(m["v"].to_numpy(np.int64)),
            "lab": pa.array(m["lab"].to_numpy(np.int64)),
        })

    def adopt(m_t: pa.Table, l_t: pa.Table) -> pa.Table:
        if l_t.num_rows == 0:
            return lab_schema.empty_table()
        ld = l_t.to_pandas()
        if m_t.num_rows == 0:
            return pa.table({
                "node": pa.array(ld["node"].to_numpy(np.int64)),
                "lab": pa.array(ld["lab"].to_numpy(np.int64)),
            })
        md = m_t.to_pandas()
        cnt = (
            md.groupby(["dst", "lab"], sort=False).size().reset_index(name="c")
        )
        # mode with ties to the SMALLEST label: sort by (c desc, lab asc)
        o = np.lexsort((cnt["lab"].to_numpy(np.int64),
                        -cnt["c"].to_numpy(np.int64),
                        cnt["dst"].to_numpy(np.int64)))
        dst = cnt["dst"].to_numpy(np.int64)[o]
        lab = cnt["lab"].to_numpy(np.int64)[o]
        first = np.r_[True, dst[1:] != dst[:-1]]
        win = pd.Series(lab[first], index=dst[first])
        new = win.reindex(ld["node"].to_numpy()).to_numpy()
        keep = ld["lab"].to_numpy(np.int64)
        out = np.where(np.isnan(new), keep, new).astype(np.int64)
        return pa.table({
            "node": pa.array(ld["node"].to_numpy(np.int64)),
            "lab": pa.array(out),
        })

    for _rnd in range(rounds):
        msgs = direct_cogroup(
            [edges, labels], [["u"], ["node"]], num_parts, emit,
            [_SSSP_EDGE_SCHEMA, lab_schema], emit_partitioned_on=["dst"],
        )
        labels = direct_cogroup(
            [msgs, labels], [["dst"], ["node"]], num_parts, adopt,
            [_LPA_MSG_SCHEMA, lab_schema], emit_partitioned_on=["node"],
        )

    out = labels.to_dataset().to_pandas()
    if out.empty:
        return empty
    out = pd.DataFrame({
        "node": out["node"].astype("int64"),
        "label": out["lab"].astype("int64"),
    })
    return out.sort_values("node").reset_index(drop=True)


# --------------------------------------------------------------------------
# Moran's I spatial autocorrelation (rook adjacency over occupied cells)
# --------------------------------------------------------------------------


def moran_nwa(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """``moran_points`` over the nodes_with_addresses layer points."""
    return moran_points(points_from_nwa(nwa_ds), num_parts=num_parts)


def moran_points(points_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Moran's I spatial autocorrelation (Moran 1950) of per-cell address
    counts over the 0.001° lattice, rook adjacency restricted to OCCUPIED
    cells — the global clustered-vs-dispersed diagnostic behind hotspot
    screening. Emitted as EXACT integer sufficient statistics with
    deviations pre-scaled by C (z_i = n_i·C − T, so no rational mean):

        I = (C / W) · num_zz / den_zz
        num_zz = Σ_i Σ_j w_ij z_i z_j   (w = rook, both orders counted)
        den_zz = Σ_i z_i²,  W = w_sum

    The one IEEE division is the consumer's; every emitted number is an
    exact int64 (python-int folds internally; an explicit guard RAISES
    past int64 — z² grows as (C·n)², shard analysis regions past ~10⁹
    points). Output: one row (n_cells, w_sum, num_zz, den_zz).

    Distributed shape: per-batch cell-count partials → ONE cell-keyed
    exchange (occupied cells only); each occupied cell then emits 4
    edge-keyed rows (its right/down edges as owner, its left/up edges as
    guest) into a SECOND exchange where ≤2-row groups become adjacent
    pairs — O(occupied cells), never O(points) and never a driver-side
    adjacency scan; den/C/T fold from per-partition partials.
    """
    from ..ops import direct_partitioned_map
    from .relational import grouped_agg

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64")
         for c in ("n_cells", "w_sum", "num_zz", "den_zz")}
    )

    def cellify(t: pa.Table) -> pa.Table:
        cx = t["ix"].to_numpy(zero_copy_only=False) // _HOTSPOT_CELL
        cy = t["iy"].to_numpy(zero_copy_only=False) // _HOTSPOT_CELL
        g = pd.DataFrame({"cx": cx, "cy": cy}).groupby(
            ["cx", "cy"], sort=False
        ).size()
        return pa.table({
            "cx": pa.array(g.index.get_level_values(0).to_numpy(np.int64)),
            "cy": pa.array(g.index.get_level_values(1).to_numpy(np.int64)),
            "n": pa.array(g.to_numpy(np.int64)),
        })

    cells = grouped_agg(
        points_ds.map_batches(cellify, batch_format="pyarrow"),
        ["cx", "cy"], {"n": ("n", "sum")},
    ).materialize()

    def scalars_partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "c": pa.array([len(n)]), "t": pa.array([int(n.sum())]),
        })

    sc = cells.map_batches(scalars_partial, batch_format="pyarrow").to_pandas()
    if sc.empty or int(sc["c"].sum()) == 0:
        return empty
    C = int(sc["c"].sum())
    T = int(sc["t"].sum())

    def den_partial(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = sum((int(v) * C - T) ** 2 for v in n)
        return pa.table({"d": pa.array([d if d < 2**63 else -1])})

    dps = cells.map_batches(den_partial, batch_format="pyarrow").to_pandas()
    if (dps["d"] < 0).any():
        raise OverflowError("moran_points: den partial exceeds int64")
    # fold partials in Python ints: a numpy int64 sum wraps silently when
    # the TOTAL exceeds int64 even though every partial is below it, which
    # would bypass the >= 2**63 guard below (trade_gravity precedent)
    den = sum(int(v) for v in dps["d"])

    edge_schema = pa.schema(
        [("ex", pa.int64()), ("ey", pa.int64()), ("dir", pa.int64()),
         ("n", pa.int64())]
    )

    def to_edges(t: pa.Table) -> pa.Table:
        cx = t["cx"].to_numpy(zero_copy_only=False).astype(np.int64)
        cy = t["cy"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        # owner of its right (dir 0) and down (dir 1) edges, guest on the
        # left neighbor's right edge and the lower neighbor's down edge
        return pa.table({
            "ex": pa.array(np.concatenate([cx, cx, cx - 1, cx])),
            "ey": pa.array(np.concatenate([cy, cy, cy, cy - 1])),
            "dir": pa.array(np.concatenate([
                np.zeros(len(cx), np.int64), np.ones(len(cx), np.int64),
                np.zeros(len(cx), np.int64), np.ones(len(cx), np.int64),
            ])),
            "n": pa.array(np.concatenate([n, n, n, n])),
        })

    pair_schema = pa.schema([("w", pa.int64()), ("num", pa.int64())])

    def pair_fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        df = t.to_pandas()
        g = df.groupby(["ex", "ey", "dir"], sort=False)["n"].agg(
            ["count", list]
        )
        both = g[g["count"] == 2]
        w = 0
        num = 0
        for pair in both["list"]:
            w += 2
            num += 2 * (int(pair[0]) * C - T) * (int(pair[1]) * C - T)
        if abs(num) >= 2**63:
            raise OverflowError("moran_points: num partial exceeds int64")
        return pa.table({"w": pa.array([w]), "num": pa.array([num])})

    parts = direct_partitioned_map(
        cells.map_batches(to_edges, batch_format="pyarrow"),
        ["ex", "ey", "dir"], num_parts, pair_fold, edge_schema,
    ).to_pandas()
    w_sum = sum(int(v) for v in parts["w"]) if not parts.empty else 0
    num = sum(int(v) for v in parts["num"]) if not parts.empty else 0
    if abs(num) >= 2**63 or den >= 2**63:
        raise OverflowError("moran_points: statistic exceeds int64")
    return pd.DataFrame({
        "n_cells": pd.array([C], dtype="int64"),
        "w_sum": pd.array([w_sum], dtype="int64"),
        "num_zz": pd.array([num], dtype="int64"),
        "den_zz": pd.array([den], dtype="int64"),
    })


# --------------------------------------------------------------------------
# Visvalingam–Whyatt simplification (effective-area point removal)
# --------------------------------------------------------------------------

VW_MIN_AREA2 = 2 * 1_000_000  # twice-area threshold in unit² (0.0001°-scale)


def visvalingam(xs: np.ndarray, ys: np.ndarray, min_area2: int) -> np.ndarray:
    """Indices kept by Visvalingam–Whyatt (1993) at twice-area threshold
    ``min_area2``: repeatedly remove the interior vertex whose neighbor
    triangle has the SMALLEST |cross| (twice the effective area, exact
    int64), ties to the lowest index, until every survivor's area is
    ≥ ``min_area2``. Endpoints always survive. Per-way doubly-linked sweep —
    each removal touches only its two neighbors, so a way of n vertices
    costs O(n·scan) with n bounded by the reference's short geometries
    (SURVEY §2.3 M3: average <20 vertices)."""
    n = len(xs)
    if n <= 2:
        return np.arange(n, dtype=np.int64)
    xs = xs.astype(np.int64, copy=False)
    ys = ys.astype(np.int64, copy=False)
    prv = np.arange(-1, n - 1, dtype=np.int64)
    nxt = np.arange(1, n + 1, dtype=np.int64)
    alive = np.ones(n, dtype=bool)

    def area2(i: int) -> int:
        a, b = int(prv[i]), int(nxt[i])
        return abs(
            (xs[i] - xs[a]) * (ys[b] - ys[a])
            - (ys[i] - ys[a]) * (xs[b] - xs[a])
        )

    ar = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for i in range(1, n - 1):
        ar[i] = area2(i)
    while True:
        interior = alive.copy()
        interior[0] = interior[n - 1] = False
        if not interior.any():
            break
        cand = np.where(interior, ar, np.iinfo(np.int64).max)
        k = int(np.argmin(cand))  # argmin takes the FIRST minimum — the tie rule
        if int(cand[k]) >= min_area2:
            break
        alive[k] = False
        a, b = int(prv[k]), int(nxt[k])
        nxt[a], prv[b] = b, a
        if a != 0 and a != n - 1:
            ar[a] = area2(a)
        if b != 0 and b != n - 1:
            ar[b] = area2(b)
    return np.flatnonzero(alive).astype(np.int64)


def vw_simplify_ways(ways_geo_ds, *, min_area2: int):
    """VW-simplify every nonzero-length way → one row per KEPT vertex
    (way_id, seq, ix, iy) — the area-based sibling of ``simplify_ways``
    (DP keeps what sticks OUT; VW keeps what MATTERS by area, the rule
    cartographers prefer for polygons)."""
    out_schema = pa.schema(
        [("way_id", pa.int64()), ("seq", pa.int32()), ("ix", pa.int64()),
         ("iy", pa.int64())]
    )

    def fn(t: pa.Table) -> pa.Table:
        s = t.filter(t["nonzero"])
        if s.num_rows == 0:
            return out_schema.empty_table()
        xs_col = s["xs"].combine_chunks() if isinstance(s["xs"], pa.ChunkedArray) else s["xs"]
        ys_col = s["ys"].combine_chunks() if isinstance(s["ys"], pa.ChunkedArray) else s["ys"]
        offs = np.asarray(xs_col.offsets, np.int64)
        offs = offs - offs[0]
        fx = np.round(np.asarray(xs_col.flatten(), np.float64) * QUANT).astype(np.int64)
        fy = np.round(np.asarray(ys_col.flatten(), np.float64) * QUANT).astype(np.int64)
        wid = s["way_id"].to_numpy(zero_copy_only=False)
        w_out, seq_out, ix_out, iy_out = [], [], [], []
        for i in range(len(wid)):
            lo, hi = offs[i], offs[i + 1]
            kept = visvalingam(fx[lo:hi], fy[lo:hi], min_area2)
            w_out.append(np.full(len(kept), wid[i], np.int64))
            seq_out.append(np.arange(len(kept), dtype=np.int32))
            ix_out.append(fx[lo + kept])
            iy_out.append(fy[lo + kept])
        return pa.table(
            {
                "way_id": pa.array(np.concatenate(w_out)),
                "seq": pa.array(np.concatenate(seq_out)),
                "ix": pa.array(np.concatenate(ix_out)),
                "iy": pa.array(np.concatenate(iy_out)),
            }
        )

    return ways_geo_ds.map_batches(fn, batch_format="pyarrow")


def vw_line_simplify(ways_geo_ds) -> pd.DataFrame:
    df = vw_simplify_ways(ways_geo_ds, min_area2=VW_MIN_AREA2).to_pandas()
    return _sorted(
        df.astype({"way_id": "int64", "seq": "int32", "ix": "int64", "iy": "int64"})
    )


# --------------------------------------------------------------------------
# Ripley's K multi-radius pair counts
# --------------------------------------------------------------------------

RIPLEY_R0 = 5_000   # base ring radius (0.0005°)
RIPLEY_RINGS = 4


def ripley_k_nwa(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """``ripley_k`` over the nodes_with_addresses layer points."""
    return ripley_k(points_from_nwa(nwa_ds), num_parts=num_parts)


def ripley_k(points_ds, *, r0: int = RIPLEY_R0, rings: int = RIPLEY_RINGS,
             num_parts: int = 8) -> pd.DataFrame:
    """Ripley's K-function sufficient statistics (Ripley 1977): cumulative
    unordered-pair counts at radii r = k·r0, k = 1..``rings``, plus the
    point count and the bounding-box area — the multi-scale
    clustered-vs-CSR diagnostic (K̂(r) = area·2·n_pairs(r)/n² is the
    consumer's one division). All emitted quantities exact int64.

    Distributed shape: ONE cell exchange at width rings·r0 (the existing
    ``radius_pairs`` 3×3 scheme — any qualifying pair is co-cell or
    adjacent), per-partition ring bucketing by searchsorted against the
    ring-radius² ladder, a ≤``rings``-row groupby, and a per-block
    min/max extent partial. Pair lists never reach the driver.
    """
    from .relational import grouped_agg

    pts = points_ds.materialize()
    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64")
         for c in ("k", "r", "n_pairs", "n_pts", "bbox_area")}
    )

    def ext_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("minx", pa.int64()), ("maxx", pa.int64()),
                 ("miny", pa.int64()), ("maxy", pa.int64()),
                 ("n", pa.int64())]
            ).empty_table()
        ix = t["ix"].to_numpy(zero_copy_only=False)
        iy = t["iy"].to_numpy(zero_copy_only=False)
        return pa.table({
            "minx": pa.array([int(ix.min())]), "maxx": pa.array([int(ix.max())]),
            "miny": pa.array([int(iy.min())]), "maxy": pa.array([int(iy.max())]),
            "n": pa.array([t.num_rows]),
        })

    ext = pts.map_batches(ext_partial, batch_format="pyarrow").to_pandas()
    if ext.empty:
        return empty
    n_pts = int(ext["n"].sum())
    area = (int(ext["maxx"].max()) - int(ext["minx"].min())) * (
        int(ext["maxy"].max()) - int(ext["miny"].min())
    )
    ladder = np.array([(k * r0) ** 2 for k in range(1, rings + 1)], np.int64)

    pairs = radius_pairs(pts, radius=rings * r0, num_parts=num_parts)

    def ring_partial(t: pa.Table) -> pa.Table:
        d2 = t["dist2"].to_numpy(zero_copy_only=False).astype(np.int64)
        ring = np.searchsorted(ladder, d2, side="left") + 1  # min k with d≤k·r0
        g = pd.DataFrame({"k": ring}).groupby("k", sort=False).size()
        return pa.table({
            "k": pa.array(g.index.to_numpy(np.int64)),
            "c": pa.array(g.to_numpy(np.int64)),
        })

    rc = grouped_agg(
        pairs.map_batches(ring_partial, batch_format="pyarrow"),
        ["k"], {"c": ("c", "sum")},
    ).to_pandas()
    per_ring = np.zeros(rings, dtype=np.int64)
    if not rc.empty:
        kk = rc["k"].to_numpy(np.int64)
        per_ring[kk - 1] = rc["c"].to_numpy(np.int64)
    cum = np.cumsum(per_ring)
    return pd.DataFrame({
        "k": pd.array(np.arange(1, rings + 1), dtype="int64"),
        "r": pd.array(np.arange(1, rings + 1) * r0, dtype="int64"),
        "n_pairs": pd.array(cum, dtype="int64"),
        "n_pts": pd.array([n_pts] * rings, dtype="int64"),
        "bbox_area": pd.array([area] * rings, dtype="int64"),
    })


# --------------------------------------------------------------------------
# hexagonal binning (H3-style tiling on an exact integer hex lattice)
# --------------------------------------------------------------------------

HEX_W = 10_000   # column pitch in micro-degrees (0.001°)
HEX_H = 8_660    # row pitch ≈ (√3/2)·W, fixed integer — the lattice is exact


def hex_bin_nwa(nwa_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """``hex_bin_counts`` over the nodes_with_addresses layer points."""
    return hex_bin_counts(points_from_nwa(nwa_ds), num_parts=num_parts)


def hex_bin_counts(points_ds, *, top: int = 25, num_parts: int = 8) -> pd.DataFrame:
    """H3-style hexagonal binning: assign every address point to the nearest
    center of the offset hex lattice (centers at (q·W + (r odd ? W/2 : 0),
    r·H), H = 8660 ≈ √3/2·W fixed INTEGER — the Voronoi cells of this
    lattice are true hexagons, and because H/W stays a ratio of integers the
    assignment is exact: 4 candidate centers (rows r₀/r₀+1 × columns
    q₀/q₀+1; (W/2)² ≤ H² proves no other row can win), integer d²
    comparisons, ties by (d², r, q) lexicographic min. Output: the ``top``
    densest hex cells (q, r, n), ties by (q, r) — the hex analogue of the
    quadtree rollup, and the exact-arithmetic core of an H3-like tiler
    (BASELINE north star: H3 res-8 cell encoding).

    Distributed shape: per-batch candidate ladder + cell-count partials →
    ONE (q, r)-keyed aggregate → per-block partial top-k, k·P driver merge.
    Points never move; only occupied-cell rows do.
    """
    from .relational import grouped_agg, topk

    def assign(t: pa.Table) -> pa.Table:
        ix = t["ix"].to_numpy(zero_copy_only=False).astype(np.int64)
        iy = t["iy"].to_numpy(zero_copy_only=False).astype(np.int64)
        r0 = iy // HEX_H
        best_d = np.full(len(ix), np.iinfo(np.int64).max, np.int64)
        best_r = np.zeros(len(ix), np.int64)
        best_q = np.zeros(len(ix), np.int64)
        for dr in (0, 1):
            r = r0 + dr
            off = np.where(r % 2 != 0, HEX_W // 2, 0)
            q0 = (ix - off) // HEX_W
            for dq in (0, 1):
                q = q0 + dq
                cx = q * HEX_W + off
                cy = r * HEX_H
                d2 = (ix - cx) ** 2 + (iy - cy) ** 2
                better = (d2 < best_d) | (
                    (d2 == best_d)
                    & ((r < best_r) | ((r == best_r) & (q < best_q)))
                )
                best_d = np.where(better, d2, best_d)
                best_r = np.where(better, r, best_r)
                best_q = np.where(better, q, best_q)
        g = (
            pd.DataFrame({"q": best_q, "r": best_r})
            .groupby(["q", "r"], sort=False).size().reset_index(name="n")
        )
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = grouped_agg(
        points_ds.map_batches(assign, batch_format="pyarrow"),
        ["q", "r"], {"n": ("n", "sum")},
    )
    out_schema = pa.schema([("q", pa.int64()), ("r", pa.int64()), ("n", pa.int64())])
    out = topk(cells, "n", top, tie_cols=["q", "r"], empty_schema=out_schema)
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("q", "r", "n")}
        )
    for c in ("q", "r", "n"):
        out[c] = out[c].astype("int64")
    return (
        out.sort_values(["n", "q", "r"], ascending=[False, True, True])
        .reset_index(drop=True)[["q", "r", "n"]]
    )


# --------------------------------------------------------------------------
# EDR trajectory similarity (Edit Distance on Real sequences)
# --------------------------------------------------------------------------

EDR_EPS = 20_000  # per-axis match tolerance (0.002°), L∞ per the EDR paper
_EDR_SCHEMA = pa.schema(
    [("cell_x", pa.int64()), ("cell_y", pa.int64()),
     ("traj_a", pa.int64()), ("traj_b", pa.int64()), ("edr", pa.int64())]
)


def _edr(xa, ya, xb, yb, eps: int) -> int:
    """EDR (Chen, Özsu & Oria 2005) between two point sequences, exact
    int64: dp(i,j) = min(dp(i-1,j-1) + [no match], dp(i-1,j) + 1,
    dp(i,j-1) + 1) on the (n+1)×(m+1) grid, match iff BOTH axis gaps ≤ eps
    (the paper's L∞ rule). Borders dp(i,0) = i / dp(0,j) = j emerge from
    the insert/delete chains. Vectorized per anti-diagonal like
    ``_frechet2`` — numpy shifts/minima, no per-cell Python."""
    n, m = len(xa), len(xb)
    match = (
        (np.abs(xa[:, None] - xb[None, :]) <= eps)
        & (np.abs(ya[:, None] - yb[None, :]) <= eps)
    )
    INF = _FRECHET_INF
    prev = np.full(n + 1, INF)   # diagonal k-1
    prev2 = np.full(n + 1, INF)  # diagonal k-2
    prev[0] = 0                  # dp(0, 0)
    for k in range(1, n + m + 1):
        cur = np.full(n + 1, INF)
        lo, hi = max(0, k - m), min(n, k)
        i = np.arange(lo, hi + 1)
        j = k - i
        up = np.where(j >= 1, prev[i] + 1, INF)            # dp(i, j-1) + 1
        im1 = np.maximum(i - 1, 0)
        left = np.where(i >= 1, prev[im1] + 1, INF)        # dp(i-1, j) + 1
        dboth = (i >= 1) & (j >= 1)
        dia_pred = np.where(dboth, prev2[im1], INF)
        dia_cost = np.where(
            dboth & match[im1, np.maximum(j - 1, 0)], 0, 1
        )
        dia = np.where(dia_pred >= INF, INF, dia_pred + dia_cost)
        cur[i] = np.minimum(np.minimum(up, left), dia)
        prev2, prev = prev, cur
    return int(prev[n])


def edr_pairs(ways_geo_ds, *, num_parts: int = 8, cell_cap: int = 256) -> pd.DataFrame:
    """Pairwise trajectory similarity under NOISE: EDR (edit distance on
    real sequences) between every pair of trajectories sharing an origin
    cell. EDR is the robust sibling of Fréchet/DTW — one GPS glitch costs
    exactly one edit instead of dominating a minimax or summed distance —
    which is why it's the trajectory-dedup metric of choice over noisy
    traces. Same two-exchange origin-cell shape as ``frechet_pairs``; TRUE
    SQL oracle: the same recursive anti-diagonal walk with min-of-preds
    + per-move costs (insert/delete 1, substitute by the L∞ match test)."""
    return edr_from_points(
        synth_dwell_trajectories(ways_geo_ds), num_parts=num_parts,
        cell_cap=cell_cap,
    )


def edr_from_points(traj, *, num_parts: int = 8, cell_cap: int = 256) -> pd.DataFrame:
    """Origin-cell-bucketed pairwise EDR over an explicit (traj_id, step,
    px, py) points dataset — the kernel behind ``edr_pairs``."""
    from ..ops import direct_partitioned_map

    def tag_origin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _FRECHET_PT_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(["traj_id", "step"], kind="stable")
        tid = df["traj_id"].to_numpy(np.int64)
        step = df["step"].to_numpy(np.int64)
        px = df["px"].to_numpy(np.int64)
        py = df["py"].to_numpy(np.int64)
        first = np.r_[True, tid[1:] != tid[:-1]]
        gidx = np.cumsum(first) - 1
        cx = (px[first] // _HAUS_CELL)[gidx]
        cy = (py[first] // _HAUS_CELL)[gidx]
        return pa.table(
            {"cell_x": pa.array(cx), "cell_y": pa.array(cy),
             "traj_id": pa.array(tid), "step": pa.array(step),
             "px": pa.array(px), "py": pa.array(py)}
        )

    pts = direct_partitioned_map(traj, ["traj_id"], num_parts, tag_origin, _TRAJ_SCHEMA)

    def pair_sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EDR_SCHEMA.empty_table()
        df = t.to_pandas().sort_values(
            ["cell_x", "cell_y", "traj_id", "step"], kind="stable"
        )
        rows = {k: [] for k in _EDR_SCHEMA.names}
        for (cx, cy), g in df.groupby(["cell_x", "cell_y"], sort=False):
            tids = g["traj_id"].unique()
            if len(tids) > cell_cap:
                raise ValueError(
                    f"edr cell ({cx},{cy}) holds {len(tids)} trajectories "
                    f"(> cell_cap={cell_cap}): use a finer zoning or raise the cap"
                )
            if len(tids) < 2:
                continue
            by_t = {
                tid: (sub["px"].to_numpy(np.int64), sub["py"].to_numpy(np.int64))
                for tid, sub in g.groupby("traj_id", sort=False)
            }
            tids = np.sort(tids)
            for ai in range(len(tids)):
                xa, ya = by_t[tids[ai]]
                for bi in range(ai + 1, len(tids)):
                    xb, yb = by_t[tids[bi]]
                    rows["cell_x"].append(int(cx))
                    rows["cell_y"].append(int(cy))
                    rows["traj_a"].append(int(tids[ai]))
                    rows["traj_b"].append(int(tids[bi]))
                    rows["edr"].append(_edr(xa, ya, xb, yb, EDR_EPS))
        return pa.Table.from_arrays(
            [pa.array(rows[f.name], f.type) for f in _EDR_SCHEMA],
            schema=_EDR_SCHEMA,
        )

    out = direct_partitioned_map(
        pts, ["cell_x", "cell_y"], num_parts, pair_sweep, _FRECHET_PT_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame({f.name: pd.Series([], dtype="int64") for f in _EDR_SCHEMA})
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["cell_x", "cell_y", "traj_a", "traj_b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# bipartiteness audit (parity 2-coloring + odd-cycle conflict count)
# --------------------------------------------------------------------------

_BIP_MAX_ROUNDS = 64
_BIP_STATE_SCHEMA = pa.schema([("node", pa.int64()), ("dist", pa.int64())])
_BIP_MSG_SCHEMA = pa.schema([("dst", pa.int64()), ("d", pa.int64())])


def street_bipartite(ways_geo_ds, *, num_parts: int = 8) -> pd.DataFrame:
    """Bipartiteness audit of the street graph: per connected component,
    2-color vertices by BFS hop-parity from the component's minimum vertex
    and count CONFLICT edges (both endpoints the same color) — a component
    is bipartite iff zero conflicts, and each conflict certifies an odd
    cycle (the two-colorability test behind alternating-side numbering
    schemes and frontier scheduling). Deterministic: hop distances are
    unique minima; the root is the component min. Output per component:
    (comp, n_nodes, n_edges, n_conflicts, bipartite).

    Distributed shape: synchronous unit-weight min-plus pregel — per round
    ONE message exchange from all reached nodes (O(reached·deg) rows;
    adopting street_route_dist's improved-frontier sender set is the
    documented refinement for high-diameter graphs), convergence detected
    from per-block (unreached, Σdist) partials — no full driver pull per
    round. ``_BIP_MAX_ROUNDS`` RAISES (a street graph with BFS radius > 64
    needs a bigger cap, not silence).
    """
    from ..ops import direct_cogroup

    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64")
         for c in ("comp", "n_nodes", "n_edges", "n_conflicts", "bipartite")}
    )
    edges, _srcs = _street_edges_and_sources(
        ways_geo_ds, num_parts=num_parts, k_sources=1
    )
    if edges is None:
        return empty

    # component labels: per-node min reachable id via the same alternating
    # star contraction the CC operator uses — here we need (node, comp)

    def to_cc_edges(t: pa.Table) -> pa.Table:
        return pa.table({"u": t["u"], "v": t["v"]})

    from .dedup import connected_components

    _CC_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    cc_ds = connected_components(
        edges.to_dataset().map_batches(to_cc_edges, batch_format="pyarrow"),
        num_parts=num_parts,
    ).materialize()

    INF = np.int64(1) << 60

    def seed(t: pa.Table) -> pa.Table:
        uu = np.unique(t["u"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"node": pa.array(uu), "dist": pa.array(
            np.full(len(uu), INF, np.int64))})

    states = direct_cogroup(
        [edges], [["u"]], num_parts, seed, [_SSSP_EDGE_SCHEMA],
        emit_partitioned_on=["node"],
    )

    # roots: comp minima — every node NOT appearing as a star child is its
    # component's min. Decided per partition by co-grouping the state grid
    # with the CC star edges on the node key: no node-id pull to the
    # driver, no V-sized broadcast (r4 distributed-finalize refinement).
    def seed_roots(s_t: pa.Table, c_t: pa.Table) -> pa.Table:
        if s_t.num_rows == 0:
            return _BIP_STATE_SCHEMA.empty_table()
        n = s_t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = s_t["dist"].to_numpy(zero_copy_only=False).astype(np.int64).copy()
        child = (
            np.unique(c_t["u"].to_numpy(zero_copy_only=False).astype(np.int64))
            if c_t.num_rows else np.empty(0, np.int64)
        )
        d[~np.isin(n, child)] = 0
        return pa.table({"node": pa.array(n), "dist": pa.array(d)})

    states = direct_cogroup(
        [states.to_dataset(), cc_ds], [["node"], ["u"]], num_parts, seed_roots,
        [_BIP_STATE_SCHEMA, _CC_SCHEMA], emit_partitioned_on=["node"],
    )

    prev_sig: tuple[int, int] | None = None

    for _rnd in range(_BIP_MAX_ROUNDS):
        def emit(e_t: pa.Table, s_t: pa.Table) -> pa.Table:
            if e_t.num_rows == 0 or s_t.num_rows == 0:
                return _BIP_MSG_SCHEMA.empty_table()
            sd = s_t.to_pandas()
            sd = sd[sd["dist"] < INF]
            if sd.empty:
                return _BIP_MSG_SCHEMA.empty_table()
            m = e_t.to_pandas().merge(sd, left_on="u", right_on="node")
            if m.empty:
                return _BIP_MSG_SCHEMA.empty_table()
            return pa.table({
                "dst": pa.array(m["v"].to_numpy(np.int64)),
                "d": pa.array(m["dist"].to_numpy(np.int64) + 1),
            })

        def relax(m_t: pa.Table, s_t: pa.Table) -> pa.Table:
            sd = s_t.to_pandas()
            if sd.empty:
                return _BIP_STATE_SCHEMA.empty_table()
            d = sd["dist"].to_numpy(np.int64).copy()
            if m_t.num_rows:
                md = m_t.to_pandas().groupby("dst")["d"].min()
                pos = pd.Series(np.arange(len(sd)), index=sd["node"].to_numpy())
                p = pos.reindex(md.index.to_numpy()).to_numpy()
                ok = ~pd.isna(p)
                p = p[ok].astype(np.int64)
                d[p] = np.minimum(d[p], md.to_numpy(np.int64)[ok])
            return pa.table({
                "node": pa.array(sd["node"].to_numpy(np.int64)),
                "dist": pa.array(d),
            })

        msgs = direct_cogroup(
            [edges, states.to_dataset()], [["u"], ["node"]], num_parts, emit,
            [_SSSP_EDGE_SCHEMA, _BIP_STATE_SCHEMA], emit_partitioned_on=["dst"],
        )
        new_states = direct_cogroup(
            [msgs, states.to_dataset()], [["dst"], ["node"]], num_parts, relax,
            [_BIP_MSG_SCHEMA, _BIP_STATE_SCHEMA], emit_partitioned_on=["node"],
        )

        def _sig(st) -> tuple[int, int]:
            # distances only ever DECREASE, so the pair (#unreached,
            # Σ finite dist) is monotone and unchanged ⇔ converged —
            # per-block partials, never a full driver pull
            n_inf = 0
            fin = 0
            for b in st.to_dataset().select_columns(["dist"]).iter_batches(
                batch_format="pyarrow"
            ):
                d = b["dist"].to_numpy(zero_copy_only=False)
                hit = d < INF
                n_inf += int((~hit).sum())
                fin += int(d[hit].sum())
            return n_inf, fin

        # carry the previous round's signature forward instead of
        # re-executing the old-state plan every round (one scan per round,
        # not two); round 0 pays one extra scan to seed it
        if prev_sig is None:
            prev_sig = _sig(states)
        new_sig = _sig(new_states)
        states = new_states
        if prev_sig == new_sig:
            break
        prev_sig = new_sig
    else:
        raise RuntimeError(
            f"street_bipartite did not converge in {_BIP_MAX_ROUNDS} rounds"
        )

    # final audit, fully distributed (r4): the per-node state and edge
    # tables never land on the driver — the driver frame is one partial
    # row per (component x partition), bounded by component count.
    _NI_SCHEMA = pa.schema(
        [("node", pa.int64()), ("color", pa.int64()), ("comp", pa.int64())]
    )

    def label_fn(s_t: pa.Table, c_t: pa.Table) -> pa.Table:
        # node-keyed co-group: attach hop parity and the CC label (a node
        # absent from the star edges is a root and labels itself)
        if s_t.num_rows == 0:
            return _NI_SCHEMA.empty_table()
        n = s_t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = s_t["dist"].to_numpy(zero_copy_only=False).astype(np.int64)
        comp = n.copy()
        if c_t.num_rows:
            cu = c_t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
            cv = c_t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            o = np.argsort(cu, kind="stable")
            cu, cv = cu[o], cv[o]
            pos = np.searchsorted(cu, n).clip(0, len(cu) - 1)
            hit = cu[pos] == n
            comp[hit] = cv[pos[hit]]
        return pa.table(
            {"node": pa.array(n), "color": pa.array(d % 2), "comp": pa.array(comp)}
        )

    node_info = direct_cogroup(
        [states.to_dataset(), cc_ds], [["node"], ["u"]], num_parts, label_fn,
        [_BIP_STATE_SCHEMA, _CC_SCHEMA], emit_partitioned_on=["node"],
    )

    _HALF_SCHEMA = pa.schema(
        [("v", pa.int64()), ("comp", pa.int64()), ("cu", pa.int64())]
    )

    def attach_u(e_t: pa.Table, ni_t: pa.Table) -> pa.Table:
        # one undirected edge per (u < v) pair; u's color/comp live in this
        # partition by construction of the node key
        if e_t.num_rows == 0 or ni_t.num_rows == 0:
            return _HALF_SCHEMA.empty_table()
        eu = e_t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        ev = e_t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = eu < ev
        eu, ev = eu[keep], ev[keep]
        if not len(eu):
            return _HALF_SCHEMA.empty_table()
        n = ni_t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = ni_t["color"].to_numpy(zero_copy_only=False).astype(np.int64)
        cmp_ = ni_t["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(n, kind="stable")
        n, col, cmp_ = n[o], col[o], cmp_[o]
        # node_info covers every edge endpoint by construction (edges are
        # emitted symmetrically, states seeded from u) — clip + verify so a
        # future break of that invariant raises instead of mislabeling
        pos = np.searchsorted(n, eu).clip(0, len(n) - 1)
        if not bool(np.all(n[pos] == eu)):
            raise AssertionError(
                "street_bipartite: edge endpoint missing from node_info "
                "co-partition (edge symmetry invariant broken)"
            )
        return pa.table(
            {"v": pa.array(ev), "comp": pa.array(cmp_[pos]),
             "cu": pa.array(col[pos])}
        )

    half = direct_cogroup(
        [edges, node_info], [["u"], ["node"]], num_parts, attach_u,
        [_SSSP_EDGE_SCHEMA, _NI_SCHEMA], emit_partitioned_on=["v"],
    )

    _EP_SCHEMA = pa.schema(
        [("comp", pa.int64()), ("n", pa.int64()), ("conf", pa.int64())]
    )

    def attach_v(h_t: pa.Table, ni_t: pa.Table) -> pa.Table:
        # close the edge with v's color, pre-aggregate per component
        if h_t.num_rows == 0 or ni_t.num_rows == 0:
            return _EP_SCHEMA.empty_table()
        hv = h_t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        hc = h_t["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
        cu = h_t["cu"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = ni_t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        col = ni_t["color"].to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(n, kind="stable")
        n, col = n[o], col[o]
        pos = np.searchsorted(n, hv).clip(0, len(n) - 1)
        if not bool(np.all(n[pos] == hv)):
            raise AssertionError(
                "street_bipartite: half-edge head missing from node_info "
                "co-partition (edge symmetry invariant broken)"
            )
        conflict = (cu == col[pos]).astype(np.int64)
        uc, inv = np.unique(hc, return_inverse=True)
        return pa.table(
            {
                "comp": pa.array(uc),
                "n": pa.array(np.bincount(inv).astype(np.int64)),
                "conf": pa.array(
                    np.bincount(inv, weights=conflict).astype(np.int64)
                ),
            }
        )

    edge_parts = direct_cogroup(
        [half, node_info], [["v"], ["node"]], num_parts, attach_v,
        [_HALF_SCHEMA, _NI_SCHEMA],
    ).to_pandas()

    def node_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("comp", pa.int64()), ("n", pa.int64())]).empty_table()
        c = t["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
        uc, inv = np.unique(c, return_inverse=True)
        return pa.table(
            {"comp": pa.array(uc), "n": pa.array(np.bincount(inv).astype(np.int64))}
        )

    node_parts = (
        node_info.to_dataset()
        .map_batches(node_partial, batch_format="pyarrow")
        .to_pandas()
    )
    nodes_per = node_parts.groupby("comp")["n"].sum()
    edges_per = (
        edge_parts.groupby("comp").agg(n_edges=("n", "sum"), n_conflicts=("conf", "sum"))
        if not edge_parts.empty
        else pd.DataFrame(columns=["n_edges", "n_conflicts"])
    )
    out = (
        pd.DataFrame({"n_nodes": nodes_per})
        .join(edges_per, how="left")
        .fillna(0)
        .reset_index(names="comp")
    )
    out["bipartite"] = (out["n_conflicts"] == 0).astype("int64")
    for c in ("comp", "n_nodes", "n_edges", "n_conflicts", "bipartite"):
        out[c] = out[c].astype("int64")
    return (
        out[["comp", "n_nodes", "n_edges", "n_conflicts", "bipartite"]]
        .sort_values("comp").reset_index(drop=True)
    )
