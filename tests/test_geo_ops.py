"""Unit tests for the extra geospatial operators (pipelines/geo_ops.py):
exactness of the radius join vs an in-test brute force, cluster labels vs an
in-test union-find, DP and hull kernels on hand-built geometries, and the
hull combiner's cross-batch merge property."""

import numpy as np
import pyarrow as pa
import pytest

from osmi_addresses_ray.pipelines.geo_ops import (
    cluster_points,
    convex_hulls,
    douglas_peucker,
    monotone_chain,
    radius_pairs,
)


def _points_ds(pid, ix, iy, *, blocks=1):
    import ray.data as rd

    t = pa.table(
        {
            "pid": pa.array(np.asarray(pid, np.int64)),
            "ix": pa.array(np.asarray(ix, np.int64)),
            "iy": pa.array(np.asarray(iy, np.int64)),
        }
    )
    if blocks == 1:
        return rd.from_arrow(t)
    step = max(1, t.num_rows // blocks)
    return rd.from_arrow_refs(
        [__import__("ray").put(t.slice(i, step)) for i in range(0, t.num_rows, step)]
    )


def _brute_pairs(pid, ix, iy, r):
    out = set()
    for i in range(len(pid)):
        for j in range(len(pid)):
            d2 = (ix[i] - ix[j]) ** 2 + (iy[i] - iy[j]) ** 2
            if d2 <= r * r and pid[i] < pid[j]:
                out.add((pid[i], pid[j], d2))
    return out


def test_radius_pairs_matches_bruteforce(ray_session):
    rng = np.random.RandomState(7)
    n = 120
    pid = np.arange(1000, 1000 + n)
    # cluster points around a few centers so cells both split and share pairs;
    # include negative coordinates to exercise the biased cell pack
    centers = rng.randint(-50_000, 50_000, size=(6, 2))
    which = rng.randint(0, 6, n)
    ix = centers[which, 0] + rng.randint(-6_000, 6_000, n)
    iy = centers[which, 1] + rng.randint(-6_000, 6_000, n)
    got = radius_pairs(_points_ds(pid, ix, iy, blocks=5), radius=5_000, num_parts=4)
    gdf = got.to_pandas()
    got_set = set(zip(gdf["id_a"], gdf["id_b"], gdf["dist2"]))
    assert len(got_set) == len(gdf), "duplicate pair emitted"
    assert got_set == _brute_pairs(pid, ix, iy, 5_000)


def test_radius_pairs_boundary_inclusive(ray_session):
    # d² == R² must be included (the SQL oracle uses <=)
    ds = _points_ds([1, 2], [0, 3000], [0, 4000])
    df = radius_pairs(ds, radius=5000, num_parts=2).to_pandas()
    assert df.to_dict("records") == [{"id_a": 1, "id_b": 2, "dist2": 25_000_000}]
    df2 = radius_pairs(ds, radius=4999, num_parts=2).to_pandas()
    assert len(df2) == 0


def test_radius_pairs_cell_cap_raises(ray_session):
    n = 40
    ds = _points_ds(np.arange(n), np.zeros(n), np.zeros(n))
    with pytest.raises((RuntimeError, Exception), match="cell_cap"):
        radius_pairs(ds, radius=10, num_parts=2, cell_cap=100).to_pandas()


def test_cluster_points_chain_and_isolated(ray_session):
    # chain 1-2-3-4 spans cells (each hop within R, ends far apart) + isolated 99
    pid = [1, 2, 3, 4, 99]
    ix = [0, 4000, 8000, 12000, 100000]
    iy = [0, 0, 0, 0, 0]
    df = (
        cluster_points(_points_ds(pid, ix, iy), radius=5000, num_parts=3)
        .to_pandas()
        .sort_values("pid")
        .reset_index(drop=True)
    )
    assert df["pid"].tolist() == [1, 2, 3, 4, 99]
    assert df["cluster_id"].tolist() == [1, 1, 1, 1, 99]


def test_douglas_peucker_kernel():
    # straight collinear run collapses to endpoints at any eps > 0
    xs = np.array([0, 10, 20, 30], np.int64)
    ys = np.array([0, 0, 0, 0], np.int64)
    assert douglas_peucker(xs, ys, 1).tolist() == [0, 3]
    # spike above eps survives
    ys2 = np.array([0, 50, 0, 0], np.int64)
    assert douglas_peucker(xs, ys2, 10).tolist() == [0, 1, 3]
    # exact threshold: distance == eps is DROPPED (strict >)
    xs3 = np.array([0, 5, 10], np.int64)
    ys3 = np.array([0, 3, 0], np.int64)
    assert douglas_peucker(xs3, ys3, 3).tolist() == [0, 2]
    assert douglas_peucker(xs3, ys3, 2).tolist() == [0, 1, 2]
    # closed ring (first == last): degenerate anchor falls back to point
    # distance; far corner splits, near corners drop
    rx = np.array([0, 2000, 2000, 0, 0], np.int64)
    ry = np.array([0, 0, 2000, 2000, 0], np.int64)
    kept = douglas_peucker(rx, ry, 2000).tolist()
    assert kept == [0, 2, 4]  # diagonal corner survives (2828 > 2000)


def test_monotone_chain_kernel():
    # square + center + edge midpoint: midpoint (collinear) and center drop
    ix = np.array([0, 10, 10, 0, 5, 5], np.int64)
    iy = np.array([0, 0, 10, 10, 5, 0], np.int64)
    hx, hy = monotone_chain(ix, iy)
    assert sorted(zip(hx, hy)) == [(0, 0), (0, 10), (10, 0), (10, 10)]
    # CCW from the lexicographic minimum
    assert (hx[0], hy[0]) == (0, 0)
    # degenerate: single + duplicate points
    hx1, hy1 = monotone_chain(np.array([3, 3]), np.array([4, 4]))
    assert len(hx1) == 1
    # collinear set → 2 endpoints
    hx2, hy2 = monotone_chain(np.array([0, 5, 10]), np.array([0, 5, 10]))
    assert sorted(zip(hx2, hy2)) == [(0, 0), (10, 10)]


def test_convex_hulls_cross_batch_merge(ray_session):
    """Splitting the point set across many blocks must not change the hull
    summary (hull-of-hulls combiner exactness)."""
    from osmi_addresses_ray.oracle.geo_ops import oracle_convex_hulls

    import pandas as pd

    rng = np.random.RandomState(11)
    n = 200
    pid = np.arange(n)
    ix = rng.randint(-120_000, 120_000, n)
    iy = rng.randint(-120_000, 120_000, n)
    out = (
        convex_hulls(_points_ds(pid, ix, iy, blocks=9), cell=80_000, num_parts=4)
        .to_pandas()
        .sort_values(["cell_x", "cell_y"])
        .reset_index(drop=True)
        .astype("int64")
    )
    exp = (
        oracle_convex_hulls(pd.DataFrame({"pid": pid, "ix": ix, "iy": iy}), 80_000)
        .sort_values(["cell_x", "cell_y"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, exp)


def _nwa_like(rows):
    """rows: (node_id, lon, lat, houseno) → minimal nwa-shaped Dataset."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    df = pd.DataFrame(rows, columns=["node_id", "lon", "lat", "houseno"])
    df["node_id"] = df["node_id"].astype("float64")
    df["way_id"] = np.zeros(len(df))  # float64, never selected (node_id set)
    df["is_ip"] = 0
    return rd.from_pandas(df)


def test_idw_grid_closed_form(ray_session):
    """Two values straddling one cell center at known integer distances:
    the fixed-point terms are computable by hand."""
    import numpy as np

    from osmi_addresses_ray.pipelines.geo_ops import idw_grid

    # cell 10000 units = 1e-3 deg; cell (8000, 47000) center = (80005000,
    # 470005000) units. Points at +/-1000 units in x → d2 = 1e6 each.
    c_lon, c_lat = 8.0005, 47.0005
    out = idw_grid(
        _nwa_like(
            [
                (1, c_lon - 0.0001, c_lat, "10"),
                (2, c_lon + 0.0001, c_lat, "30"),
                # on-center point: excluded from the fold (d2 = 0) but its
                # presence alone would mark the cell occupied
                (3, c_lon, c_lat, "999"),
                # out of radius (>1 cell away in x)
                (4, c_lon + 0.0021, c_lat, "7x"),
            ]
        ),
        num_parts=2,
    )
    S = 10**12
    # cells: home of pts 1,2,3 and the home of pt 4 (occupied by pt 4 only,
    # reached by pts within radius? pt4 home center is 2 cells right of c —
    # no candidate within r2 except pt4 itself at d2>0)
    main = out[(out.cell_x == 8000) & (out.cell_y == 47000)].iloc[0]
    assert main.n_pts == 2
    assert main.num == (10 * S) // 1_000_000 + (30 * S) // 1_000_000
    assert main.den == 2 * (S // 1_000_000)
    assert np.isclose(main.idw, 20.0)  # equidistant → plain mean


def test_idw_grid_partition_invariance(ray_session):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (i, 8.0 + rng.randint(0, 60) * 1e-4, 47.0 + rng.randint(0, 60) * 1e-4,
         str(1 + rng.randint(0, 99)))
        for i in range(60)
    ]
    from osmi_addresses_ray.pipelines.geo_ops import idw_grid

    a = idw_grid(_nwa_like(rows), num_parts=1)
    b = idw_grid(_nwa_like(rows), num_parts=7)
    assert a.equals(b)


def test_dbscan_roles_and_bridge_split(ray_session):
    """Two 5-point dense blobs joined by a single sparse bridge point:
    single-linkage would merge everything; DBSCAN (min_pts=5) must keep TWO
    clusters, classify the bridge as border-or-noise, and label an isolated
    far point as noise. Border tie rule: min core-neighbour label."""
    from osmi_addresses_ray.pipelines.geo_ops import dbscan_points

    # blob A at x≈0, blob B at x≈30; radius=10 ⇒ intra-blob complete graphs
    pts = {
        1: (0, 0), 2: (3, 0), 3: (0, 3), 4: (3, 3), 5: (1, 1),       # blob A
        11: (30, 0), 12: (33, 0), 13: (30, 3), 14: (33, 3), 15: (31, 1),  # blob B
        20: (15, 0),     # bridge: within 10+ of nothing dense enough
        6: (12, 0),      # border of A: near cores 2 and 4, itself only 3 nbrs
        99: (1000, 1000),  # noise
    }
    ids = sorted(pts)
    ds = _points_ds(ids, [pts[i][0] for i in ids], [pts[i][1] for i in ids], blocks=3)
    out = dbscan_points(ds, radius=10, min_pts=5, num_parts=3).set_index("pid")

    for i in (1, 2, 3, 4, 5):
        assert out.loc[i].role == 0 and out.loc[i].label == 1
    for i in (11, 12, 13, 14, 15):
        assert out.loc[i].role == 0 and out.loc[i].label == 11
    assert out.loc[6].role == 1 and out.loc[6].label == 1   # border of A
    assert out.loc[99].role == 2 and out.loc[99].label == -1
    assert out.loc[20].role in (1, 2)
    # the two blobs stay separate clusters
    assert set(out[out.role == 0].label) == {1, 11}


def test_dbscan_partition_invariance(ray_session):
    import pandas as pd

    from osmi_addresses_ray.pipelines.geo_ops import dbscan_points

    rng = np.random.RandomState(7)
    ix = rng.randint(-1000, 1000, 300)
    iy = rng.randint(-1000, 1000, 300)
    ds = _points_ds(np.arange(300), ix, iy, blocks=5)
    a = dbscan_points(ds, radius=120, min_pts=4, num_parts=2)
    b = dbscan_points(ds, radius=120, min_pts=4, num_parts=9)
    pd.testing.assert_frame_equal(
        a.sort_values("pid").reset_index(drop=True),
        b.sort_values("pid").reset_index(drop=True),
    )


def test_hotspot_cells_closed_form(ray_session):
    """9 points in one 3×3 block vs 3 isolated single-point cells: the dense
    block's cells are hot (neighbourhood mean ≫ global), the isolated cells
    are not; ratio is the exact integer cross product divided once."""
    from osmi_addresses_ray.pipelines.geo_ops import hotspot_cells

    # dense: 2 points in each of the 9 cells (0..2, 0..2)
    ids, xs, ys = [], [], []
    k = 0
    for cx in range(3):
        for cy in range(3):
            for off in (5, 9):
                ids.append(k); xs.append(cx * 10_000 + off); ys.append(cy * 10_000 + 5)
                k += 1
    # isolated: 3 single points far away
    for i, (fx, fy) in enumerate([(50, 0), (80, 0), (0, 70)]):
        ids.append(100 + i); xs.append(fx * 10_000 + 5); ys.append(fy * 10_000 + 5)
    ds = _points_ds(ids, xs, ys, blocks=3)
    out = hotspot_cells(ds, num_parts=3).set_index(["cell_x", "cell_y"])
    # T=21 points, C=12 cells; centre cell (1,1): S = 18 -> 18·12 > 9·21 hot
    assert out.loc[(1, 1)].nbr_sum == 18 and out.loc[(1, 1)].hot == 1
    assert out.loc[(1, 1)].ratio == (18 * 12) / (9 * 21.0)
    # isolated singleton: S = 1 -> 12 < 189 cold
    assert out.loc[(50, 0)].nbr_sum == 1 and out.loc[(50, 0)].hot == 0
    # corner of the dense block still hot: S = 8 -> 96 < 189? COLD in fact
    assert out.loc[(0, 0)].nbr_sum == 8 and out.loc[(0, 0)].hot == 0


def _traj_ds(traj_id, step, px, py):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "traj_id": pa.array(np.asarray(traj_id, np.int64)),
                "step": pa.array(np.asarray(step, np.int64)),
                "px": pa.array(np.asarray(px, np.int64)),
                "py": pa.array(np.asarray(py, np.int64)),
            }
        )
    )


def test_staypoints_anchor_walk_semantics(ray_session):
    from osmi_addresses_ray.pipelines.geo_ops import staypoints_from_points

    # traj 1: dwell of 3 near origin (d <= 400 < R), jump to (10000, 0),
    # dwell of 2 there, jump again, single trailing point -> two staypoints
    px = [0, 300, 150, 10000, 10300, 50000]
    py = [0, 0, 200, 0, 0, 0]
    out = staypoints_from_points(
        _traj_ds([1] * 6, range(6), px, py), r2=1_000_000, t_min=2, num_parts=2
    )
    assert out[["start_step", "end_step", "n_pts"]].values.tolist() == [
        [0, 2, 3], [3, 4, 2]
    ]
    # floor-mean centroids
    assert out["sx"].tolist() == [(0 + 300 + 150) // 3, (10000 + 10300) // 2]
    # anchor semantics: the scan measures from the ANCHOR, so a slow drift
    # where each consecutive pair is near but the span exceeds R from the
    # anchor ends the window at the first point farther than R from p_i
    px2 = [0, 900, 1800, 2700]
    out2 = staypoints_from_points(
        _traj_ds([2] * 4, range(4), px2, [0] * 4), r2=1_000_000, t_min=2, num_parts=2
    )
    # from anchor 0: first exceed is step 2 (1800 > 1000) -> window [0, 1]
    assert out2.iloc[0][["start_step", "end_step"]].tolist() == [0, 1]


def test_hausdorff_pairs_hand_values(ray_session):
    from osmi_addresses_ray.pipelines.geo_ops import hausdorff_from_points

    # two trajectories in the same origin cell: A = {(0,0), (10,0)},
    # B = {(0,3), (10,4)}; directed A->B: max(min(9, 116), min(109, 16)) = 16
    # wait: d2((0,0),(0,3))=9, d2((0,0),(10,4))=116 -> min 9;
    # d2((10,0),(0,3))=109, d2((10,0),(10,4))=16 -> min 16; h(A->B)=16
    # B->A symmetric: (0,3): min(9, 109)=9; (10,4): min(116, 16)=16 -> 16
    out = hausdorff_from_points(
        _traj_ds([1, 1, 2, 2], [0, 1, 0, 1], [0, 10, 0, 10], [0, 0, 3, 4]),
        num_parts=2,
    )
    assert len(out) == 1
    assert out.iloc[0]["h2"] == 16
    assert (out.iloc[0][["traj_a", "traj_b"]].tolist()) == [1, 2]
    # trajectories in DIFFERENT origin cells pair with nothing
    out2 = hausdorff_from_points(
        _traj_ds([1, 2], [0, 0], [0, 300_000], [0, 0]), num_parts=2
    )
    assert out2.empty


def test_hausdorff_cell_cap_raises(ray_session):
    from osmi_addresses_ray.pipelines.geo_ops import hausdorff_from_points

    ds = _traj_ds([1, 2, 3], [0, 0, 0], [10, 20, 30], [0, 0, 0])
    with pytest.raises(Exception, match="cell_cap"):
        hausdorff_from_points(ds, num_parts=1, cell_cap=2)


def test_street_components_labels_two_islands(ray_session):
    """Two disjoint chains + a triangle must get three distinct min-id
    labels through the full star-contraction path."""
    import ray.data as rd

    from osmi_addresses_ray.pipelines.dedup import connected_components
    from osmi_addresses_ray.pipelines.relational import grouped_agg

    edges = pa.table(
        {
            "u": pa.array([1, 2, 10, 20, 21], type=pa.int64()),
            "v": pa.array([2, 3, 11, 21, 22], type=pa.int64()),
        }
    )
    stars = connected_components(rd.from_arrow(edges), num_parts=2)

    def emit(t):
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"node_id": pa.array(np.r_[u, v]), "comp": pa.array(np.r_[v, v])}
        )

    out = (
        grouped_agg(stars.map_batches(emit, batch_format="pyarrow"),
                    ["node_id"], {"comp": ("comp", "min")})
        .to_pandas().sort_values("node_id").reset_index(drop=True)
    )
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    assert dict(zip(out["node_id"], out["comp"])) == want


def test_comovement_requires_simultaneity(ray_session):
    """Two trajectories tracing the SAME path but time-shifted must NOT
    pair (Hausdorff would see them as identical); a true convoy must."""
    import ray.data as rd

    from osmi_addresses_ray.pipelines.geo_ops import comovement_from_points

    pts = pa.table(
        {
            "traj_id": pa.array([1, 1, 1, 2, 2, 2, 3, 3, 3], pa.int64()),
            "step": pa.array([0, 1, 2, 0, 1, 2, 0, 1, 2], pa.int64()),
            # traj 1 and 2 walk together (always 5 apart); traj 3 walks the
            # same path as 1 but one step LATE (same positions, shifted)
            "px": pa.array([0, 1000, 2000, 5, 1005, 2005, 900000, 0, 1000], pa.int64()),
            "py": pa.array([0] * 9, pa.int64()),
        }
    )
    out = comovement_from_points(rd.from_arrow(pts), radius=100, k_min=2, num_parts=2)
    assert out[["traj_a", "traj_b"]].values.tolist() == [[1, 2]]
    assert out.iloc[0]["n_close"] == 3 and out.iloc[0]["min_d2"] == 25


def test_bearing_octant_compass_and_ties():
    from osmi_addresses_ray.pipelines.geo_ops import _bearing_octant

    dx = np.array([10, 7, 3, -3, -7, -10, -7, -3, 3, 7, 10, -10], np.int64)
    dy = np.array([0, 3, 7, 7, 3, 0, -3, -7, -7, -3, 10, -10], np.int64)
    # E, E-NE, NE-N, N-NW, NW-W, W, W-SW, SW-S, S-SE, SE-E, tie@45°, tie@225°
    want = [0, 0, 1, 2, 3, 3, 4, 5, 6, 7, 0, 4]
    assert _bearing_octant(dx, dy).tolist() == want


# --- areal interpolation --------------------------------------------------------


def test_areal_interpolation_single_cell(ray_session):
    """Three points in ONE source cell (anchored at the min point): the cell
    splits 9/3/3/1 sixteenths across the four shifted target quadrants."""
    from osmi_addresses_ray.pipelines.geo_ops import areal_interpolation

    out = areal_interpolation(
        _points_ds([1, 2, 3], [70_000_000, 70_050_000, 70_199_999],
                   [460_000_000, 460_000_001, 460_100_000]),
        num_parts=2,
    )
    got = {(r.tx, r.ty): (r.alloc_16, r.n_src) for r in out.itertuples()}
    assert got == {
        (0, 0): (27, 1), (1, 0): (9, 1), (0, 1): (9, 1), (1, 1): (3, 1),
    }
    assert int(out["alloc_16"].sum()) == 16 * 3  # mass conservation


def test_areal_interpolation_two_cells_merge(ray_session):
    """Two adjacent source cells: the shared target column sums both
    contributions and reports n_src = 2 there."""
    from osmi_addresses_ray.pipelines.geo_ops import (
        AREAL_CELL,
        areal_interpolation,
    )

    S = AREAL_CELL
    # cell (0,0): 1 point at origin; cell (1,0): 2 points
    out = areal_interpolation(
        _points_ds([1, 2, 3], [0, S, S + 5], [0, 0, 0], blocks=1), num_parts=2
    )
    got = {(r.tx, r.ty): (r.alloc_16, r.n_src) for r in out.itertuples()}
    # tx=1 receives 1*1 (spill of cell 0) + 2*9 (body of cell 1) on ty=0
    assert got[(1, 0)] == (1 * 3 + 2 * 9, 2)
    assert got[(1, 1)] == (1 * 1 + 2 * 3, 2)
    assert got[(0, 0)] == (9, 1) and got[(2, 0)] == (6, 1)
    assert int(out["alloc_16"].sum()) == 16 * 3


# --- Moran's I --------------------------------------------------------------------


def test_moran_clustered_vs_checker(ray_session):
    """3×2 block of occupied cells arranged clustered (5s row over 1s row)
    vs checkerboard: hand-computed sufficient
    stats; clustered num_zz must exceed the anti-clustered one."""
    from osmi_addresses_ray.pipelines.geo_ops import _HOTSPOT_CELL, moran_points

    S = _HOTSPOT_CELL

    def pts_for(counts):
        # counts[(cx,cy)] -> that many points inside the cell
        pid, ix, iy = [], [], []
        k = 0
        for (cx, cy), c in counts.items():
            for j in range(c):
                pid.append(k); k += 1
                ix.append(cx * S + 10 + j)
                iy.append(cy * S + 10)
        return _points_ds(pid, ix, iy, blocks=1)

    def scalar(counts):
        cells = list(counts.items())
        C = len(cells)
        T = sum(c for _, c in cells)
        z = {xy: c * C - T for xy, c in cells}
        num = w = 0
        for (x, y) in counts:
            for dx, dy in ((1, 0), (0, 1)):
                if (x + dx, y + dy) in counts:
                    num += 2 * z[(x, y)] * z[(x + dx, y + dy)]
                    w += 2
        den = sum(v * v for v in z.values())
        return C, w, num, den

    clustered = {(0, 0): 5, (1, 0): 5, (2, 0): 5,
                 (0, 1): 1, (1, 1): 1, (2, 1): 1}
    checker = {(0, 0): 5, (1, 0): 1, (2, 0): 5,
               (0, 1): 1, (1, 1): 5, (2, 1): 1}
    results = {}
    for name, counts in (("clustered", clustered), ("checker", checker)):
        out = moran_points(pts_for(counts), num_parts=3)
        row = out.iloc[0]
        C, w, num, den = scalar(counts)
        assert (row["n_cells"], row["w_sum"], row["num_zz"], row["den_zz"]) \
            == (C, w, num, den), name
        results[name] = int(row["num_zz"])
    assert results["clustered"] > 0 > results["checker"]


def test_moran_single_cell_no_pairs(ray_session):
    from osmi_addresses_ray.pipelines.geo_ops import moran_points

    out = moran_points(_points_ds([1, 2], [5, 6], [5, 6]), num_parts=2)
    row = out.iloc[0]
    assert row["n_cells"] == 1 and row["w_sum"] == 0 and row["num_zz"] == 0
    assert row["den_zz"] == 0  # z of the single cell is n·1 − n = 0


# --- Visvalingam–Whyatt -------------------------------------------------------------


def test_visvalingam_kernel_order_and_threshold():
    from osmi_addresses_ray.pipelines.geo_ops import visvalingam

    # collinear interior point: area 0 -> removed at any threshold > 0
    xs = np.array([0, 10, 20], np.int64)
    ys = np.array([0, 0, 0], np.int64)
    assert visvalingam(xs, ys, 1).tolist() == [0, 2]
    # zig-zag: areas 2*[small, big]; small corner removed first, then the
    # recomputed big corner survives the threshold
    xs2 = np.array([0, 10, 20, 30], np.int64)
    ys2 = np.array([0, 2, 40, 0], np.int64)
    # areas2: p1: |cross((10,2)-(0,0),(20,40)-(0,0))| = |10*40-2*20| = 360
    #         p2: |cross| at (20,40) with nbrs (10,2),(30,0) = |10*-2-38*20|=780
    kept = visvalingam(xs2, ys2, 400)
    assert kept.tolist() == [0, 2, 3]  # p1 (360 < 400) dropped, p2 recomputed
    # after p1 removal p2's area changes: nbrs (0,0),(30,0): |20*0-40*30|=1200
    kept2 = visvalingam(xs2, ys2, 1300)
    assert kept2.tolist() == [0, 3]
    # tie rule: two equal minimal areas -> FIRST index removed first
    xs3 = np.array([0, 10, 20, 30, 40], np.int64)
    ys3 = np.array([0, 1, 0, 1, 0], np.int64)
    kept3 = visvalingam(xs3, ys3, 21)  # both interior humps have area2 = 20
    assert 1 not in kept3.tolist()


def test_vw_matches_scalar_oracle_shape():
    """Engine kernel == scalar oracle list replay on a random polyline."""
    from osmi_addresses_ray.pipelines.geo_ops import visvalingam

    rng = np.random.RandomState(5)
    xs = np.cumsum(rng.randint(1, 20, 30)).astype(np.int64)
    ys = rng.randint(-50, 50, 30).astype(np.int64)

    def scalar(pts, thr):
        idx = list(range(len(pts)))

        def a2(j):
            (ax, ay), (px, py), (bx, by) = (
                pts[idx[j - 1]], pts[idx[j]], pts[idx[j + 1]])
            return abs((px - ax) * (by - ay) - (py - ay) * (bx - ax))

        while len(idx) > 2:
            areas = [a2(j) for j in range(1, len(idx) - 1)]
            m = min(areas)
            if m >= thr:
                break
            idx.pop(1 + areas.index(m))
        return idx

    for thr in (1, 100, 1000, 10**9):
        got = visvalingam(xs, ys, thr).tolist()
        want = scalar(list(zip(xs.tolist(), ys.tolist())), thr)
        assert got == want, thr


# --- Ripley's K -------------------------------------------------------------------


def test_ripley_k_cumulative_rings(ray_session):
    """Pairs planted at known distances: d=3 (ring 1), d=7 (ring 2),
    d=20 exactly on ring 4's boundary (inclusive)."""
    from osmi_addresses_ray.pipelines.geo_ops import ripley_k

    out = ripley_k(
        _points_ds([1, 2, 3, 4], [0, 3, 100, 120], [0, 0, 93, 93]),
        r0=5, rings=4, num_parts=2,
    )
    # distances: (1,2)=3; (3,4)=20; (1,3),(1,4),(2,3),(2,4) all > 20
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["r"].tolist() == [5, 10, 15, 20]
    assert out["n_pairs"].tolist() == [1, 1, 1, 2]  # d=20 lands IN ring 4
    assert (out["n_pts"] == 4).all()
    assert (out["bbox_area"] == 120 * 93).all()


def test_ripley_k_boundary_between_rings(ray_session):
    """d = 10 with r0 = 5 sits exactly on ring 2's boundary -> counted in
    ring 2 (cumulative from k=2), not ring 3."""
    from osmi_addresses_ray.pipelines.geo_ops import ripley_k

    out = ripley_k(_points_ds([1, 2], [0, 10], [0, 0]), r0=5, rings=3,
                   num_parts=1)
    assert out["n_pairs"].tolist() == [0, 1, 1]


# --- hexagonal binning -------------------------------------------------------------


def test_hex_bin_nearest_center_exact(ray_session):
    """Points placed nearer a shifted odd-row center than any even-row
    center must land in the odd row; a point equidistant between two
    centers takes the (r, q)-smaller one."""
    from osmi_addresses_ray.pipelines.geo_ops import HEX_H, HEX_W, hex_bin_counts

    pts = [
        (1, 100, 100),                       # near center (0, 0)
        (2, HEX_W // 2, HEX_H),              # exactly center (0, 1) (odd row)
        (3, HEX_W // 2, HEX_H // 2),         # same x as odd center -> (0, 1)
        (4, HEX_W + 100, 50),                # near center (1, 0)
    ]
    out = hex_bin_counts(
        _points_ds([p for p, _, _ in pts], [x for _, x, _ in pts],
                   [y for _, _, y in pts]),
        top=10, num_parts=2,
    )
    got = {(r.q, r.r): r.n for r in out.itertuples()}
    # scalar check: brute-force over a center window
    def brute(ix, iy):
        best = None
        for r in range(-2, 4):
            off = HEX_W // 2 if r % 2 else 0
            for q in range(-2, 4):
                cx, cy = q * HEX_W + off, r * HEX_H
                d2 = (ix - cx) ** 2 + (iy - cy) ** 2
                key = (d2, r, q)
                if best is None or key < best:
                    best = key
        return best[1], best[2]

    want = {}
    for _, x, y in pts:
        r, q = brute(x, y)
        want[(q, r)] = want.get((q, r), 0) + 1
    assert got == want
    assert got[(0, 1)] == 2  # exact odd-row center + the same-x midpoint
    assert got[(0, 0)] == 1 and got[(1, 0)] == 1


def test_hex_bin_topk_order(ray_session):
    """Three cells with counts 3/2/1: output ordered by n desc then (q, r)."""
    from osmi_addresses_ray.pipelines.geo_ops import HEX_H, HEX_W, hex_bin_counts

    pid, ix, iy = [], [], []
    k = 0
    for (q, r), c in [((0, 0), 3), ((2, 0), 2), ((4, 0), 1)]:
        for j in range(c):
            pid.append(k); k += 1
            ix.append(q * HEX_W + j)
            iy.append(r * HEX_H)
    out = hex_bin_counts(_points_ds(pid, ix, iy), top=2, num_parts=2)
    assert list(zip(out["q"], out["r"], out["n"])) == [(0, 0, 3), (2, 0, 2)]
