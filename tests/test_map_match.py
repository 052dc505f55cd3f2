"""HMM map-matching tests: the continuity property that separates Viterbi
matching from greedy per-point snapping, kernel exactness vs the scalar
oracle, and partition invariance of the trajectory exchange."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from osmi_addresses_ray.pipelines.geo_ops import _mm_candidates, _mm_viterbi


def _segs(rows):
    a = np.array(rows, np.int64)
    return (a[:, 0], a[:, 1], a[:, 2], a[:, 3], a[:, 4], a[:, 5])


def test_viterbi_continuity_beats_greedy():
    """Two parallel roads A (y=0) and B (y=600). The middle point is nearer
    to B (emission saving 120000) but jumping there and back costs 2·600²
    = 720000 of transition — Viterbi must stay on A while the greedy
    per-point snap (candidate 0) picks B."""
    segs = _segs([
        (1, 0, 0, 0, 4000, 0),        # road A
        (2, 0, 0, 600, 4000, 600),    # road B
    ])
    px = np.array([1000, 2000, 3000], np.int64)
    py = np.array([100, 400, 100], np.int64)
    cand = _mm_candidates(px, py, segs, 2)
    cw, cs, cd, csx, csy = cand
    assert cw[1][0] == 2          # greedy winner for the noisy point is B
    w, s, sx, sy, d2 = _mm_viterbi(px, py, cand)
    assert w.tolist() == [1, 1, 1] # Viterbi keeps the trajectory on A
    assert sy.tolist() == [0, 0, 0]
    assert d2.tolist() == [100 * 100, 400 * 400, 100 * 100]


def test_emission_spec_branches():
    """Endpoint clamps, interior floor-division snap, and CAP saturation."""
    from osmi_addresses_ray.oracle.geo_ops import _mm_emission

    seg = (7, 0, 0, 0, 100, 0)
    assert _mm_emission(-30, 40, seg) == (30 * 30 + 40 * 40, 0, 0)    # before a
    assert _mm_emission(130, 40, seg) == (30 * 30 + 40 * 40, 100, 0)  # past b
    assert _mm_emission(37, 13, seg) == (13 * 13, 37, 0)              # interior
    big = 1 << 21
    assert _mm_emission(big, 0, seg)[0] == 1 << 42                    # CLIP → CAP
    # numpy kernel agrees branch-for-branch
    segs = _segs([seg])
    for p in [(-30, 40), (130, 40), (37, 13), (big, 0)]:
        cw, cs, cd, csx, csy = _mm_candidates(
            np.array([p[0]], np.int64), np.array([p[1]], np.int64), segs, 1
        )
        assert (int(cd[0][0]), int(csx[0][0]), int(csy[0][0])) == _mm_emission(
            p[0], p[1], seg
        )


def test_map_match_fixture_matches_oracle_and_partitions(ray_session):
    from osmi_addresses_ray.oracle.geo_ops import oracle_map_match
    from osmi_addresses_ray.pipelines.geo_ops import map_match
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(13)).drop_columns(["spans"])
    wg = assemble_ways(parsed, num_parts=4)
    out = map_match(wg, num_parts=4)
    ora = oracle_map_match(fixture_table(13))
    pd.testing.assert_frame_equal(out, ora)
    # noise is small vs street spacing: every step matches its source way
    assert (out.traj_id == out.way_id).all()

    out7 = map_match(wg, num_parts=7)
    pd.testing.assert_frame_equal(out, out7)


def _ways_geo_ds(ways):
    """Minimal ways_geo-shaped dataset: [(way_id, [(lon,lat)...], highway)]"""
    import pyarrow as pa
    import ray.data as rd

    from osmi_addresses_ray.constants import tag_col

    t = pa.table(
        {
            "way_id": pa.array([w[0] for w in ways], pa.int64()),
            "xs": pa.array([[p[0] for p in w[1]] for w in ways], pa.list_(pa.float64())),
            "ys": pa.array([[p[1] for p in w[1]] for w in ways], pa.list_(pa.float64())),
            "nonzero": pa.array([True] * len(ways)),
            tag_col("highway"): pa.array([w[2] for w in ways], pa.string()),
        }
    )
    return rd.from_arrow(t)


def test_route_dist_weighted_beats_hops(ray_session):
    """Square graph where the 3-hop detour (total weight 3k) is shorter than
    the 1-hop direct edge (weight 10k): a hop-count BFS would report the
    direct edge's endpoint at distance 10k, weighted SSSP must say 3k.
    Units: 1e-5 lon ≈ 100 quantized units."""
    from osmi_addresses_ray.pipelines.geo_ops import _sssp_vid, street_route_dist

    A, C, D, B = (0.0, 0.0), (0.00005, 0.0), (0.00010, 0.0), (0.00015, 0.0)
    far = (0.00015, 0.0005)  # B—far edge, just to have a 2nd component? no: connected
    ways = [
        (1, [A, B], "residential"),          # direct: weight 1500
        (2, [A, C, D, B], "residential"),    # detour: 3 × 500 = 1500? equal...
    ]
    # make the direct edge genuinely longer: bend it through a far point
    ways[0] = (1, [A, (0.000075, 0.0003), B], "residential")
    out = street_route_dist(_ways_geo_ds(ways), num_parts=3)
    va = _sssp_vid(np.int64(0), np.int64(0))
    vb = _sssp_vid(np.int64(1500), np.int64(0))
    d = out.set_index(["src", "node"])["dist"]
    # src = min vid = A; A→B must take the straight detour: 3 hops × 500
    assert d.loc[(va, vb)] == 1500
    # the bent direct way costs 750+3000 + 750+3000 = 7500 — not chosen
    assert (out["dist"] >= 0).all()


def test_route_dist_fixture_matches_oracle_and_partitions(ray_session):
    import pandas as pd

    from osmi_addresses_ray.oracle.geo_ops import oracle_street_route_dist
    from osmi_addresses_ray.pipelines.geo_ops import street_route_dist
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(13)).drop_columns(["spans"])
    wg = assemble_ways(parsed, num_parts=4)
    out = street_route_dist(wg, num_parts=4)
    pd.testing.assert_frame_equal(out, oracle_street_route_dist(fixture_table(13)))
    out2 = street_route_dist(wg, num_parts=7)
    pd.testing.assert_frame_equal(out, out2)


def test_turn_classes_closed_form(ray_session):
    """A zig-zag street produces alternating left/right; a straight street
    with varying vertex spacing yields 'straight'; zero displacement
    (duplicate synthesized point) yields 'stop'. Built through the real
    trajectory synthesis for one hand-checkable case: classes recomputed
    here from the synthesized points themselves."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.geo_ops import synth_trajectories, turn_classes

    ways = [
        (1, [(0.0, 0.0), (0.0001, 0.0001), (0.0002, 0.0), (0.0003, 0.0001),
             (0.0004, 0.0)], "residential"),
        (2, [(0.01, 0.0), (0.0101, 0.0), (0.0102, 0.0), (0.0104, 0.0)], "residential"),
    ]
    ds = _ways_geo_ds(ways)
    out = turn_classes(ds, num_parts=3)
    pts = synth_trajectories(ds).to_pandas().sort_values(["traj_id", "step"])

    # recompute expected classes scalar from the synthesized points
    import numpy as np
    exp = {}
    for tid, g in pts.groupby("traj_id"):
        px, py = g.px.to_numpy(np.int64), g.py.to_numpy(np.int64)
        st = g.step.to_numpy(np.int64)
        for i in range(1, len(px) - 1):
            d1 = (px[i] - px[i-1], py[i] - py[i-1])
            d2 = (px[i+1] - px[i], py[i+1] - py[i])
            cross = d1[0]*d2[1] - d1[1]*d2[0]
            dot = d1[0]*d2[0] + d1[1]*d2[1]
            if d1 == (0, 0) or d2 == (0, 0):
                c = "stop"
            elif cross > 0:
                c = "left"
            elif cross < 0:
                c = "right"
            else:
                c = "straight" if dot > 0 else "uturn"
            exp[(tid, st[i])] = c
    got = {(r.traj_id, r.step): r.turn for r in out.itertuples()}
    assert got == exp
    assert len(got) == (5 - 1 - 2) + (4 - 1 - 2)  # interior points per way


def test_od_flows_and_accuracy(ray_session):
    """OD flows over a crafted two-street network: each trajectory's origin
    and destination land in the expected 0.01°-cells; the accuracy metric
    is 1.0 when every step matches its source way (well-separated streets)."""
    from osmi_addresses_ray.pipelines.geo_ops import map_match_accuracy, od_flows

    ways = [
        (1, [(0.0, 0.0), (0.001, 0.0), (0.002, 0.0), (0.02, 0.0)], "residential"),
        (2, [(0.5, 0.5), (0.501, 0.5), (0.502, 0.5)], "residential"),
    ]
    ds = _ways_geo_ds(ways)
    od = od_flows(ds, num_parts=3)
    assert od.n.sum() == 2  # one flow per trajectory
    # recompute expected origin/destination cells from the synthesized points
    from osmi_addresses_ray.pipelines.geo_ops import synth_trajectories

    pts = synth_trajectories(ds).to_pandas().sort_values(["traj_id", "step"])
    exp = set()
    for tid, g in pts.groupby("traj_id"):
        o = g.iloc[0]
        d = g.iloc[-1]
        exp.add((o.px // 100000, o.py // 100000, d.px // 100000, d.py // 100000))
    got = set(zip(od.o_x, od.o_y, od.d_x, od.d_y))
    assert got == exp

    acc = map_match_accuracy(ds, num_parts=3)
    assert acc.n_steps.iloc[0] == 5  # 3 + 2 segments
    assert acc.accuracy.iloc[0] == 1.0
