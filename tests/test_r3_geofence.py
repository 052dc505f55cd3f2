"""geofence_transitions over planted fences/walks: entry mid-walk, exit,
re-entry, start-inside, end-inside (no exit), a fence spanning two grid
cells (exactly-once containment across the replicated-fence exchange), and
the building/highway/open-way fence gate — cases the fixture corpus only
probes in aggregate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osmi_addresses_ray.pipelines.geo_ops import (
    QUANT,
    geofence_transitions_from_points,
)


def _u(units: int) -> float:
    return units / QUANT


def _ways_geo(ways: list[dict]):
    """Fabricate the assembled-ways shape _way_rects consumes."""
    t = pa.table(
        {
            "way_id": pa.array([w["id"] for w in ways], pa.int64()),
            "xs": pa.array([[_u(x) for x, _ in w["pts"]] for w in ways],
                           pa.list_(pa.float64())),
            "ys": pa.array([[_u(y) for _, y in w["pts"]] for w in ways],
                           pa.list_(pa.float64())),
            "nonzero": pa.array([True] * len(ways)),
            "is_closed": pa.array([w.get("closed", True) for w in ways]),
            "t_building": pa.array(
                [w.get("building") for w in ways], pa.string()),
            "t_highway": pa.array(
                [w.get("highway") for w in ways], pa.string()),
        }
    )
    return rd.from_arrow(t)


def _traj(rows: list[tuple[int, int, int, int]]):
    tid, step, px, py = (list(c) for c in zip(*rows))
    return rd.from_arrow(
        pa.table(
            {
                "traj_id": pa.array(tid, pa.int64()),
                "step": pa.array(step, pa.int64()),
                "px": pa.array(px, pa.int64()),
                "py": pa.array(py, pa.int64()),
            }
        )
    )


SQ = [(0, 0), (2000, 0), (2000, 2000), (0, 2000), (0, 0)]


def test_geofence_planted_events(ray_session):
    ways = [
        # fence 1: building square [0,2000]^2, dilate 100 -> [-100,2100]^2
        {"id": 1, "pts": SQ, "building": "yes"},
        # fence 2: same square shifted to x+1_000_000 — its dilated bbox
        # [999900,1002100] straddles the 100k-cell boundary at 1_000_000
        {"id": 2, "pts": [(x + 1_000_000, y) for x, y in SQ],
         "building": "yes"},
        # way 3: closed highway ring at the origin — NOT a fence
        {"id": 3, "pts": SQ, "highway": "residential"},
        # way 4: open building way at the origin — NOT a fence
        {"id": 4, "pts": SQ[:-1], "closed": False, "building": "yes"},
    ]
    walk = [
        # traj 10 vs fence 1: out, in, in, out, in(last) -> +1@1, -1@3, +1@4
        (10, 0, -500, 1000),
        (10, 1, 0, 1000),
        (10, 2, 1000, 1000),
        (10, 3, 5000, 1000),
        (10, 4, 1000, 1000),
        # traj 11 vs fence 2: starts inside (cell right of the fence's home
        # cell), leaves -> +1@0, -1@1
        (11, 0, 1_001_000, 1000),
        (11, 1, 2_000_000, 1000),
    ]
    out = geofence_transitions_from_points(
        _traj(walk), _ways_geo(ways), dilate=100, num_parts=4
    )
    got = list(out.itertuples(index=False, name=None))
    assert got == [
        (10, 1, 1, 1),
        (10, 1, 3, -1),
        (10, 1, 4, 1),
        (11, 2, 0, 1),
        (11, 2, 1, -1),
    ]
    assert all(out[c].dtype == np.int64 for c in out.columns)


def test_geofence_dilation_boundary(ray_session):
    ways = [{"id": 1, "pts": SQ, "building": "yes"}]
    walk = [
        (20, 0, -100, 0),   # exactly on the dilated edge: inside
        (20, 1, -101, 0),   # one unit past: outside
        (20, 2, 2100, 2100),  # opposite dilated corner: inside (last)
    ]
    out = geofence_transitions_from_points(
        _traj(walk), _ways_geo(ways), dilate=100, num_parts=2
    )
    assert list(out.itertuples(index=False, name=None)) == [
        (20, 1, 0, 1),
        (20, 1, 1, -1),
        (20, 1, 2, 1),
    ]


def test_geofence_no_fences_or_no_hits(ray_session):
    # highway-only corpus -> no fences -> typed empty frame
    out = geofence_transitions_from_points(
        _traj([(1, 0, 0, 0)]),
        _ways_geo([{"id": 3, "pts": SQ, "highway": "x"}]),
        dilate=100, num_parts=2,
    )
    assert len(out) == 0
    assert list(out.columns) == ["traj_id", "fence_id", "step", "event"]
    assert all(out[c].dtype == np.int64 for c in out.columns)
    # fences exist but the walk never touches one
    out2 = geofence_transitions_from_points(
        _traj([(1, 0, 9_000_000, 9_000_000)]),
        _ways_geo([{"id": 1, "pts": SQ, "building": "yes"}]),
        dilate=100, num_parts=2,
    )
    assert len(out2) == 0


def test_geofence_fixture_invariants(ray_session):
    """On the fixture corpus: events alternate +1/-1 per (traj, fence) with
    a running occupancy in {0,1}, and steps stay within the trajectory."""
    from osmi_addresses_ray.pipelines.geo_ops import (
        geofence_transitions,
        synth_dwell_trajectories,
    )
    from osmi_addresses_ray.sources.fixture import fixture_docs
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(13)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=4)
    out = geofence_transitions(ways_geo, num_parts=4)
    assert len(out) > 0
    for (_, _), g in out.groupby(["traj_id", "fence_id"]):
        occ = g["event"].cumsum()
        assert occ.isin([0, 1]).all() and occ.iloc[-1] in (0, 1)
        assert g["event"].iloc[0] == 1
    # exits never exceed a trajectory's max step
    mx = (
        synth_dwell_trajectories(ways_geo).to_pandas()
        .groupby("traj_id")["step"].max()
    )
    ex = out[out["event"] == -1]
    assert (ex["step"].to_numpy()
            <= mx.loc[ex["traj_id"]].to_numpy()).all()
