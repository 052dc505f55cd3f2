"""Independent naive oracles for the extra geospatial operators
(pipelines/geo_ops.py). No engine imports beyond the shared naive parser —
scalar Python ints throughout, structured differently from the engine's
vectorized kernels so a shared bug can't cancel out.

The radius self-join and spatial clusters need no Python oracle: their
oracle_sql() is TRUE DuckDB SQL (O(n²) self-join / recursive-CTE reachability)
over the independently recomputed point parquet (``spatial_radius_src``).
"""

from __future__ import annotations

import pandas as pd

from .layers import parse_entities

QUANT = 10_000_000


def _way_points(docs) -> list[tuple[int, list[tuple[int, int]]]]:
    """Naive-parse → [(way_id, [(ix, iy), ...])] for every way with ≥2 fully
    resolvable refs and nonzero extent (the engine's assembled-way gate,
    stages/assembly.py)."""
    ents = parse_entities(docs)
    nodes = {e["id"]: e for e in ents if e["etype"] == "node"}
    out = []
    for e in ents:
        if e["etype"] != "way" or len(e["refs"]) < 2:
            continue
        if any(r not in nodes for r in e["refs"]):
            continue
        pts = [
            (round(nodes[r]["lon"] * QUANT), round(nodes[r]["lat"] * QUANT))
            for r in e["refs"]
        ]
        if all(p == pts[0] for p in pts):
            continue
        out.append((e["id"], pts))
    return out


def _dp(pts: list[tuple[int, int]], eps: int) -> list[int]:
    """Recursive Douglas–Peucker over python ints (spec mirror of
    pipelines/geo_ops.douglas_peucker, deliberately recursive not stacked):
    perpendicular-LINE distance via cross² > eps²·len²; equal anchors fall
    back to point distance; split at the FIRST max index."""
    n = len(pts)
    if n <= 2:
        return list(range(n))
    eps2 = eps * eps
    ax, ay = pts[0]
    bx, by = pts[-1]
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    best_i, best_v = -1, -1
    for i in range(1, n - 1):
        px, py = pts[i]
        if len2 == 0:
            v = (px - ax) * (px - ax) + (py - ay) * (py - ay)
            thresh = eps2
        else:
            c = dx * (py - ay) - dy * (px - ax)
            v = c * c
            thresh = eps2 * len2
        if v > best_v:
            best_i, best_v = i, v
    # recompute the threshold for the winner (len2 is span-constant)
    limit = eps2 if len2 == 0 else eps2 * len2
    if best_v <= limit:
        return [0, n - 1]
    left = _dp(pts[: best_i + 1], eps)
    right = _dp(pts[best_i:], eps)
    return left + [best_i + r for r in right[1:]]


def oracle_line_simplify(docs, eps: int) -> pd.DataFrame:
    rows = []
    for way_id, pts in _way_points(docs):
        for seq, i in enumerate(_dp(pts, eps)):
            rows.append(
                {"way_id": way_id, "seq": seq, "ix": pts[i][0], "iy": pts[i][1]}
            )
    df = pd.DataFrame(rows, columns=["way_id", "seq", "ix", "iy"])
    return df.astype({"way_id": "int64", "seq": "int32", "ix": "int64", "iy": "int64"})


def _cross(o, a, b) -> int:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _chain(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Scalar monotone chain, strict turns (collinear dropped)."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return pts
    lower: list[tuple[int, int]] = []
    for p in pts:
        while len(lower) >= 2 and _cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list[tuple[int, int]] = []
    for p in reversed(pts):
        while len(upper) >= 2 and _cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    return lower[:-1] + upper[:-1]


def oracle_convex_hulls(points_df: pd.DataFrame, cell: int) -> pd.DataFrame:
    """points_df has (pid, ix, iy) — the same derivation the SQL oracle uses
    (COALESCE'd ids over the independent nwa recomputation)."""
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for ix, iy in zip(points_df["ix"], points_df["iy"]):
        key = (int(ix) // cell, int(iy) // cell)
        groups.setdefault(key, []).append((int(ix), int(iy)))
    rows = []
    for (cx, cy), pts in sorted(groups.items()):
        hull = _chain(pts)
        area2 = 0
        if len(hull) >= 3:
            for i in range(len(hull)):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % len(hull)]
                area2 += x1 * y2 - x2 * y1
        rows.append(
            {
                "cell_x": cx,
                "cell_y": cy,
                "n_pts": len(pts),  # point ROWS (pids), not distinct coords
                "n_hull": len(hull),
                "area2": area2,
            }
        )
    df = pd.DataFrame(rows, columns=["cell_x", "cell_y", "n_pts", "n_hull", "area2"])
    return df.astype("int64")


def oracle_way_segments(docs) -> pd.DataFrame:
    """Independent segment derivation for the intersection join's TRUE SQL
    oracle (the O(n²) cross join + the same strict-crossing predicate run in
    DuckDB over this parquet): naive parse, scalar loop, one row per
    consecutive vertex pair."""
    rows = []
    for way_id, pts in _way_points(docs):
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            rows.append(
                {"way_id": way_id, "seg_idx": i, "ax": ax, "ay": ay, "bx": bx, "by": by}
            )
    df = pd.DataFrame(rows, columns=["way_id", "seg_idx", "ax", "ay", "bx", "by"])
    return df.astype(
        {"way_id": "int64", "seg_idx": "int32", "ax": "int64", "ay": "int64",
         "bx": "int64", "by": "int64"}
    )


def oracle_overlay_segments(docs, nwa_points: pd.DataFrame, drop: int) -> pd.DataFrame:
    """Naive segment union for the crossing-overlay oracle: way segments +
    one due-south service-drop chord per address point (way_id = -pid)."""
    segs = oracle_way_segments(docs)
    ch = pd.DataFrame(
        {
            "way_id": -nwa_points["pid"].to_numpy(),
            "seg_idx": 0,
            "ax": nwa_points["ix"].to_numpy(),
            "ay": nwa_points["iy"].to_numpy(),
            "bx": nwa_points["ix"].to_numpy(),
            "by": nwa_points["iy"].to_numpy() - drop,
        }
    )
    out = pd.concat([segs, ch], ignore_index=True)
    return out.astype(
        {"way_id": "int64", "seg_idx": "int32", "ax": "int64", "ay": "int64",
         "bx": "int64", "by": "int64"}
    )


def oracle_way_bboxes(docs) -> pd.DataFrame:
    """Naive way-bbox source for the rectangle-join oracle: independent
    parse, per-point 1e-7 quantization then min/max, engine gates mirrored
    (≥2 resolvable refs, nonzero extent; closed = first ref == last ref).
    kind: 'building' for closed building-tagged ways, 'highway' for
    highway-tagged ways (a way with both tags emits both rows)."""
    ents = parse_entities(docs)
    nodes = {e["id"]: e for e in ents if e["etype"] == "node"}
    rows = []
    for e in ents:
        if e["etype"] != "way" or len(e["refs"]) < 2:
            continue
        if any(r not in nodes for r in e["refs"]):
            continue
        pts = [
            (round(nodes[r]["lon"] * QUANT), round(nodes[r]["lat"] * QUANT))
            for r in e["refs"]
        ]
        if all(p == pts[0] for p in pts):
            continue
        x0 = min(p[0] for p in pts)
        x1 = max(p[0] for p in pts)
        y0 = min(p[1] for p in pts)
        y1 = max(p[1] for p in pts)
        closed = e["refs"][0] == e["refs"][-1]
        if closed and "building" in e["tags"]:
            rows.append(("building", e["id"], x0, x1, y0, y1))
        if "highway" in e["tags"]:
            rows.append(("highway", e["id"], x0, x1, y0, y1))
    return pd.DataFrame(
        rows, columns=["kind", "way_id", "x0", "x1", "y0", "y1"]
    ).astype(
        {"way_id": "int64", "x0": "int64", "x1": "int64",
         "y0": "int64", "y1": "int64"}
    )


# --- HMM map matching (spec mirror of pipelines/geo_ops.map_match) -----------

_MM_CLIP = 1 << 20
_MM_CAP = 1 << 42
_MM_CROSS_MAX = 3_000_000_000


def _mm_emission(px: int, py: int, seg) -> tuple[int, int, int]:
    """(d2, snap_x, snap_y) for one point against one segment — scalar
    python ints, re-declaring the engine's CLIP/CAP/CROSS saturation spec."""
    _w, _s, ax, ay, bx, by = seg
    dx, dy = bx - ax, by - ay
    if (
        abs(px - ax) > _MM_CLIP or abs(py - ay) > _MM_CLIP
        or abs(px - bx) > _MM_CLIP or abs(py - by) > _MM_CLIP
        or abs(dx) > _MM_CLIP or abs(dy) > _MM_CLIP
    ):
        return _MM_CAP, ax, ay
    d1x, d1y = px - ax, py - ay
    len2 = dx * dx + dy * dy
    dot = d1x * dx + d1y * dy
    if len2 == 0 or dot <= 0:
        return d1x * d1x + d1y * d1y, ax, ay
    if dot >= len2:
        d2x, d2y = px - bx, py - by
        return d2x * d2x + d2y * d2y, bx, by
    cross = d1x * dy - d1y * dx
    if abs(cross) >= _MM_CROSS_MAX:
        return _MM_CAP, ax, ay
    return (cross * cross) // len2, ax + (dot * dx) // len2, ay + (dot * dy) // len2


def oracle_map_match(docs, k: int = 4) -> pd.DataFrame:
    """Scalar Viterbi map matching over the synthesized trajectories —
    loops and python ints throughout, no numpy."""
    # street segments: assembled-way gate + highway tag, (way_id, seg_idx) order
    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    segs = []
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            segs.append((way_id, i, ax, ay, bx, by))
    segs.sort(key=lambda s: (s[0], s[1]))

    rows = []
    by_way: dict[int, list] = {}
    for s in segs:
        by_way.setdefault(s[0], []).append(s)
    for way_id in sorted(by_way):
        traj = []
        for s in by_way[way_id]:
            _w, i, ax, ay, bx, by = s
            h = (((way_id % 2147483648) * 1000003 + i) * 2654435761) % (1 << 32)
            traj.append((i, (ax + bx) // 2 + h % 1601 - 800,
                         (ay + by) // 2 + (h >> 11) % 1601 - 800))
        # per-step candidates: k smallest (d2, way, seg) over ALL segments
        cands = []
        for _step, px, py in traj:
            scored = []
            for s in segs:
                d2, sx, sy = _mm_emission(px, py, s)
                scored.append((d2, s[0], s[1], sx, sy))
            scored.sort()
            cands.append(scored[:k])
        # min-sum Viterbi, first-minimal-index tie rule
        T = len(traj)
        total = [c[0] for c in cands[0]]
        back = [[0] * len(cands[t]) for t in range(T)]
        for t in range(1, T):
            new_total = []
            for j, cj in enumerate(cands[t]):
                best, barg = None, 0
                for i, ci in enumerate(cands[t - 1]):
                    ddx = max(-_MM_CLIP, min(_MM_CLIP, cj[3] - ci[3]))
                    ddy = max(-_MM_CLIP, min(_MM_CLIP, cj[4] - ci[4]))
                    sc = total[i] + ddx * ddx + ddy * ddy
                    if best is None or sc < best:
                        best, barg = sc, i
                back[t][j] = barg
                new_total.append(best + cj[0])
            total = new_total
        path = [0] * T
        path[T - 1] = min(range(len(total)), key=lambda i: (total[i], i))
        for t in range(T - 1, 0, -1):
            path[t - 1] = back[t][path[t]]
        for t, (step, px, py) in enumerate(traj):
            d2, w, s, sx, sy = cands[t][path[t]]
            rows.append((way_id, step, px, py, w, s, sx, sy, d2))
    cols = ["traj_id", "step", "px", "py", "way_id", "seg_idx",
            "snap_x", "snap_y", "d2"]
    df = pd.DataFrame(rows, columns=cols)
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return df.sort_values(["traj_id", "step"]).reset_index(drop=True).astype("int64")


# --- weighted street shortest paths (spec mirror of street_route_dist) -------

_SSSP_V_BIAS = 1 << 28
_SSSP_V_MUL = 1 << 29


def _sssp_vid(x: int, y: int) -> int:
    return (x // 10 + _SSSP_V_BIAS) * _SSSP_V_MUL + (y // 10 + _SSSP_V_BIAS)


def oracle_street_route_dist(docs, k_sources: int = 8) -> pd.DataFrame:
    """Scalar Dijkstra (heapq) over the independently parsed street graph —
    algorithm-diverse from the engine's Bellman-Ford relaxation rounds."""
    import heapq

    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    adj: dict[int, dict[int, int]] = {}
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            u, v = _sssp_vid(ax, ay), _sssp_vid(bx, by)
            if u == v:
                continue
            w = abs(bx - ax) + abs(by - ay)
            for a, b in ((u, v), (v, u)):
                cur = adj.setdefault(a, {})
                if b not in cur or w < cur[b]:
                    cur[b] = w
    if not adj:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("src", "node", "dist")}
        )
    sources = sorted(adj)[:k_sources]
    rows = []
    for s in sources:
        dist = {s: 0}
        heap = [(0, s)]
        while heap:
            d, u = heapq.heappop(heap)
            if d > dist.get(u, 1 << 62):
                continue
            for v, w in adj[u].items():
                nd = d + w
                if nd < dist.get(v, 1 << 62):
                    dist[v] = nd
                    heapq.heappush(heap, (nd, v))
        for node, d in dist.items():
            rows.append((s, node, d))
    return (
        pd.DataFrame(rows, columns=["src", "node", "dist"])
        .sort_values(["src", "node"])
        .reset_index(drop=True)
        .astype("int64")
    )


def oracle_street_mst(docs) -> pd.DataFrame:
    """Scalar Kruskal with union-find over the independently parsed street
    graph, edge order (w, min(u,v), max(u,v)) — algorithm-diverse from the
    engine's Borůvka rounds; the strict total order makes the forest
    unique so the edge sets must match exactly."""
    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    best: dict[tuple[int, int], int] = {}
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            u, v = _sssp_vid(ax, ay), _sssp_vid(bx, by)
            if u == v:
                continue
            a, b = (u, v) if u < v else (v, u)
            w = abs(bx - ax) + abs(by - ay)
            if (a, b) not in best or w < best[(a, b)]:
                best[(a, b)] = w
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    rows = []
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            rows.append((a, b, w))
    df = pd.DataFrame(rows, columns=["u", "v", "w"])
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("u", "v", "w")})
    return df.sort_values(["u", "v"]).reset_index(drop=True).astype("int64")


def oracle_street_mis(docs) -> pd.DataFrame:
    """Greedy lexicographic MIS in (priority, id) order over the
    independently parsed street graph — sequential insertion, algorithm-
    diverse from the engine's Luby rounds; fixed priorities make the two
    constructions provably identical."""
    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    adj: dict[int, set[int]] = {}
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            u, v = _sssp_vid(ax, ay), _sssp_vid(bx, by)
            if u == v:
                continue
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    if not adj:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("node", "in_mis")}
        )
    order = sorted(adj, key=lambda v: (((v % 2147483648) * 2654435761) % (1 << 32), v))
    chosen: set[int] = set()
    for v in order:
        if not (adj[v] & chosen):
            chosen.add(v)
    return (
        pd.DataFrame(
            {"node": sorted(adj), "in_mis": [int(v in chosen) for v in sorted(adj)]}
        )
        .astype("int64")
    )


def oracle_traj_points(docs) -> pd.DataFrame:
    """Independent scalar synthesis of the GPS-like trajectory points (the
    synth_trajectories spec) — the point source for turn-class SQL."""
    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    rows = []
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            h = (((way_id % 2147483648) * 1000003 + i) * 2654435761) % (1 << 32)
            rows.append((way_id, i, (ax + bx) // 2 + h % 1601 - 800,
                         (ay + by) // 2 + (h >> 11) % 1601 - 800))
    df = pd.DataFrame(rows, columns=["traj_id", "step", "px", "py"])
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in df.columns})
    return df.sort_values(["traj_id", "step"]).reset_index(drop=True).astype("int64")


def oracle_dwell_points(docs) -> pd.DataFrame:
    """Independent scalar synthesis of the dwell-patterned trajectory points
    (the synth_dwell_trajectories spec) — pure Python big-int arithmetic,
    the point source for the stay-point / Hausdorff SQL oracles."""
    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    rows = []
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        step = 0
        for i, (vx, vy) in enumerate(pts):
            h = (((way_id % 2147483648) * 1000003 + i) * 2654435761) % (1 << 32)
            r = 1 + h % 3
            for k in range(r):
                hk = ((h + 97 * k) * 2654435761) % (1 << 32)
                rows.append(
                    (way_id, step, vx + hk % 401 - 200, vy + (hk >> 11) % 401 - 200)
                )
                step += 1
    df = pd.DataFrame(rows, columns=["traj_id", "step", "px", "py"])
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in df.columns})
    return df.sort_values(["traj_id", "step"]).reset_index(drop=True).astype("int64")


def oracle_street_edges(docs) -> pd.DataFrame:
    """Independent scalar parse of the street-graph edge set (both
    directions, parallel edges collapsed) — the edge source for the
    connected-components recursive-CTE SQL."""
    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    edges = set()
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            u, v = _sssp_vid(ax, ay), _sssp_vid(bx, by)
            if u == v:
                continue
            edges.add((u, v))
            edges.add((v, u))
    df = pd.DataFrame(sorted(edges), columns=["u", "v"])
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in ("u", "v")})
    return df.astype("int64")


def oracle_highway_segments(docs) -> pd.DataFrame:
    """Independent scalar parse of the STREET (highway-tagged) way segments
    (way_id, seg_idx, ax, ay, bx, by) — the segment source for the
    bearing-rose SQL. Distinct from ``oracle_way_segments`` above, which
    keeps EVERY assembled way (buildings included) for the overlay oracle —
    this function once shadowed that name and silently dropped building
    segments from the segment_crossings oracle."""
    ents = parse_entities(docs)
    hw_ways = {e["id"] for e in ents if e["etype"] == "way" and "highway" in e["tags"]}
    rows = []
    for way_id, pts in _way_points(docs):
        if way_id not in hw_ways:
            continue
        for i in range(len(pts) - 1):
            (ax, ay), (bx, by) = pts[i], pts[i + 1]
            rows.append((way_id, i, ax, ay, bx, by))
    cols = ["way_id", "seg_idx", "ax", "ay", "bx", "by"]
    df = pd.DataFrame(rows, columns=cols)
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    return df.sort_values(["way_id", "seg_idx"]).reset_index(drop=True).astype("int64")


def oracle_closed_way_points(docs) -> pd.DataFrame:
    """Independent scalar derivation of CLOSED-ring vertex lists for the
    polygon-audit SQL: one row per vertex (way_id, seq, ix, iy), only ways
    whose first quantized point equals their last with ≥3 stored points
    (degenerate two-vertex rings are kept for flagging) — the audit's
    closed-way gate re-declared naively."""
    rows = []
    for way_id, pts in _way_points(docs):
        if len(pts) < 3 or pts[0] != pts[-1]:
            continue
        for seq, (ix, iy) in enumerate(pts):
            rows.append((way_id, seq, ix, iy))
    df = pd.DataFrame(rows, columns=["way_id", "seq", "ix", "iy"])
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in df.columns})
    return df.astype("int64")


def oracle_relate_rings(docs) -> pd.DataFrame:
    """Closed rings + the deterministic overlay twins for polygon_relate:
    per ring, a bbox-half shifted copy (way_id + 1e9, guaranteed crossing
    geometry), an exact duplicate (way_id + 2e9, boundary_equal), and a
    2x2-unit square at the bbox center (way_id + 3e9, containment probe).
    Recomputed scalar from the raw docs — no engine imports."""
    rows = []
    for way_id, pts in _way_points(docs):
        if len(pts) < 3 or pts[0] != pts[-1]:
            continue
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
        for seq, (ix, iy) in enumerate(pts):
            rows.append((way_id, seq, ix, iy))
        dx, dy = (x1 - x0) // 2, (y1 - y0) // 2
        if dx or dy:
            for seq, (ix, iy) in enumerate(pts):
                rows.append((way_id + 1_000_000_000, seq, ix + dx, iy + dy))
        for seq, (ix, iy) in enumerate(pts):
            rows.append((way_id + 2_000_000_000, seq, ix, iy))
        cx, cy = (x0 + x1) // 2, (y0 + y1) // 2
        sq = [(cx - 1, cy - 1), (cx + 1, cy - 1), (cx + 1, cy + 1),
              (cx - 1, cy + 1), (cx - 1, cy - 1)]
        for seq, (ix, iy) in enumerate(sq):
            rows.append((way_id + 3_000_000_000, seq, ix, iy))
        for seq, (ix, iy) in enumerate(sq):
            rows.append((way_id - 4_000_000_000, seq, ix, iy))
        corner = [(x0 - 2, y0 - 2), (x0, y0 - 2), (x0, y0),
                  (x0 - 2, y0), (x0 - 2, y0 - 2)]
        for seq, (ix, iy) in enumerate(corner):
            rows.append((way_id + 5_000_000_000, seq, ix, iy))
    df = pd.DataFrame(rows, columns=["way_id", "seq", "ix", "iy"])
    if df.empty:
        df = pd.DataFrame({c: pd.Series([], dtype="int64") for c in df.columns})
    return df.astype("int64")


def oracle_vw_simplify(docs, min_area2: int) -> pd.DataFrame:
    """Independent scalar Visvalingam–Whyatt replay: plain python-int list
    surgery (remove-min loop over a live list, lowest index on ties) over
    the naive-parsed ways — no linked list, no numpy."""

    def _vw(pts: list[tuple[int, int]]) -> list[int]:
        idx = list(range(len(pts)))
        if len(idx) <= 2:
            return idx

        def a2(j: int) -> int:
            (ax, ay) = pts[idx[j - 1]]
            (px, py) = pts[idx[j]]
            (bx, by) = pts[idx[j + 1]]
            return abs((px - ax) * (by - ay) - (py - ay) * (bx - ax))

        while len(idx) > 2:
            areas = [a2(j) for j in range(1, len(idx) - 1)]
            m = min(areas)
            if m >= min_area2:
                break
            # lowest ORIGINAL index among minima == first position in the
            # live list (original order is preserved by list surgery)
            idx.pop(1 + areas.index(m))
        return idx

    rows = []
    for way_id, pts in _way_points(docs):
        for seq, i in enumerate(_vw(pts)):
            rows.append(
                {"way_id": way_id, "seq": seq, "ix": pts[i][0], "iy": pts[i][1]}
            )
    df = pd.DataFrame(rows, columns=["way_id", "seq", "ix", "iy"])
    return df.astype({"way_id": "int64", "seq": "int32", "ix": "int64", "iy": "int64"})
