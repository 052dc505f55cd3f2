"""polygon_audit over planted rings: CW winding, nonconvex L-shape, a
zero-area spike, collinear edge chains, and the open-way/closed-way gate —
shapes the fixture corpus (all-CCW convex squares/triangles) cannot probe."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osmi_addresses_ray.pipelines.geo_ops import QUANT, polygon_audit


def _ways_geo(rings: dict[int, list[tuple[float, float]]]):
    """Fabricate the assembled-ways table shape (way_id, xs, ys, nonzero)."""
    t = pa.table(
        {
            "way_id": pa.array(list(rings), pa.int64()),
            "xs": pa.array([[p[0] for p in r] for r in rings.values()],
                           pa.list_(pa.float64())),
            "ys": pa.array([[p[1] for p in r] for r in rings.values()],
                           pa.list_(pa.float64())),
            "nonzero": pa.array([True] * len(rings)),
        }
    )
    return rd.from_arrow(t)


def _u(units: int) -> float:
    return units / QUANT


def test_polygon_audit_planted_shapes(ray_session):
    sq = [(0, 0), (_u(100), 0), (_u(100), _u(100)), (0, _u(100)), (0, 0)]
    out = polygon_audit(
        _ways_geo(
            {
                # 1: CCW unit square, area2 = 2·100·100 = 20000
                1: sq,
                # 2: the SAME square traversed clockwise
                2: sq[::-1],
                # 3: nonconvex L-shape (CCW)
                3: [(0, 0), (_u(200), 0), (_u(200), _u(100)), (_u(100), _u(100)),
                    (_u(100), _u(200)), (0, _u(200)), (0, 0)],
                # 4: zero-area spike (out and back): closed, area2 = 0
                4: [(0, 0), (_u(100), 0), (0, 0)],
                # 5: open way — must be absent from the audit
                5: [(0, 0), (_u(100), _u(100))],
                # 6: square with a collinear midpoint on the bottom edge —
                # still convex (zero turns allowed)
                6: [(0, 0), (_u(50), 0), (_u(100), 0), (_u(100), _u(100)),
                    (0, _u(100)), (0, 0)],
            }
        )
    )
    assert out["way_id"].tolist() == [1, 2, 3, 4, 6]
    r = out.set_index("way_id")
    assert r.loc[1, "area2"] == 20000 and r.loc[1, "winding"] == 1
    assert r.loc[1, "is_convex"] == 1 and r.loc[1, "n_vertices"] == 4
    assert r.loc[2, "area2"] == -20000 and r.loc[2, "winding"] == -1
    assert r.loc[2, "is_convex"] == 1  # convexity is winding-agnostic
    assert r.loc[3, "winding"] == 1 and r.loc[3, "is_convex"] == 0
    assert r.loc[3, "area2"] == 2 * (200 * 100 + 100 * 100)
    assert r.loc[3, "bbox_w"] == 200 and r.loc[3, "bbox_h"] == 200
    assert r.loc[4, "area2"] == 0 and r.loc[4, "winding"] == 0
    assert r.loc[4, "is_convex"] == 0  # degenerate ring is never convex
    assert r.loc[6, "is_convex"] == 1 and r.loc[6, "n_vertices"] == 5


def test_polygon_audit_empty_and_dtypes(ray_session):
    out = polygon_audit(_ways_geo({7: [(0, 0), (_u(10), _u(10))]}))
    assert len(out) == 0
    assert all(out[c].dtype == np.int64 for c in out.columns)
    assert list(out.columns) == [
        "way_id", "n_vertices", "area2", "winding", "is_convex",
        "bbox_w", "bbox_h",
    ]


def test_polygon_audit_matches_fixture_squares(ray_session, tmp_path):
    """Fixture buildings are CCW squares 2000 units on a side → every audit
    row convex, winding 1, with area2 = 2·bbox_w·bbox_h for rectangles."""
    from osmi_addresses_ray.sources.fixture import fixture_docs
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    parsed = parse_docs(fixture_docs(13)).drop_columns(["spans"])
    out = polygon_audit(assemble_ways(parsed, num_parts=4))
    assert len(out) > 0
    assert (out["winding"] == 1).all() and (out["is_convex"] == 1).all()
    rect = out[out["n_vertices"] == 4]
    assert (rect["area2"] == 2 * rect["bbox_w"] * rect["bbox_h"]).all()


# ---------------------------------------------------------------------------
# polygon_relate: exact DE-9IM-style classification
# ---------------------------------------------------------------------------


def _rings(*rs):
    fx, fy, offs = [], [], [0]
    for r in rs:
        for x, y in r:
            fx.append(x)
            fy.append(y)
        offs.append(len(fx))
    return (
        np.array(fx, np.int64),
        np.array(fy, np.int64),
        np.array(offs, np.int64),
    )


def _sq(x, y, s):
    return [(x, y), (x + s, y), (x + s, y + s), (x, y + s), (x, y)]


def test_relate_kernel_planted_classes():
    from osmi_addresses_ray.pipelines.geo_ops import _relate_kernel

    fx, fy, offs = _rings(
        _sq(0, 0, 100),     # 0 big
        _sq(10, 10, 20),    # 1 strictly inside
        _sq(90, 50, 40),    # 2 crosses the right edge
        _sq(100, 0, 50),    # 3 shares the right edge (touch only)
        _sq(0, 0, 100),     # 4 identical
        _sq(0, 0, 50),      # 5 shares corner + two half-edges, inside
    )
    ia = np.array([0, 0, 0, 0, 0], np.int64)
    ib = np.array([1, 2, 3, 4, 5], np.int64)
    nc, nt, rel = _relate_kernel(fx, fy, offs, ia, ib)
    names = ["disjoint", "touches", "crosses", "within", "contains", "boundary_equal"]
    got = [names[r] for r in rel]
    assert got[0] == "contains" and nc[0] == 0 and nt[0] == 0
    assert got[1] == "crosses" and nc[1] == 2
    assert got[2] == "touches" and nc[2] == 0 and nt[2] > 0
    assert got[3] == "boundary_equal"
    # ring 5's free vertices (50,50 corner region) are strictly inside 0
    assert got[4] == "contains"
    # swapped orientation: the inner ring is 'within'
    nc2, nt2, rel2 = _relate_kernel(
        fx, fy, offs, np.array([1], np.int64), np.array([0], np.int64)
    )
    assert names[rel2[0]] == "within"


def test_relate_kernel_vertex_on_boundary_fallback():
    """First vertex of the probe ring lies ON the other's boundary: the
    containment test must skip to the next free vertex, not misclassify."""
    from osmi_addresses_ray.pipelines.geo_ops import _relate_kernel

    # diamond whose first vertex (50,0) sits on the big square's bottom edge
    diamond = [(50, 0), (60, 10), (50, 20), (40, 10), (50, 0)]
    fx, fy, offs = _rings(_sq(0, 0, 100), diamond)
    nc, nt, rel = _relate_kernel(
        fx, fy, offs, np.array([0], np.int64), np.array([1], np.int64)
    )
    assert rel[0] == 4 and nt[0] > 0  # contains (touching from inside)


def test_relate_pipeline_partition_invariance(ray_session):
    from osmi_addresses_ray.pipelines.geo_ops import polygon_relate, relate_augment
    from osmi_addresses_ray.sources.fixture import fixture_docs
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    def build():
        parsed = parse_docs(fixture_docs(5)).drop_columns(["spans"])
        return relate_augment(assemble_ways(parsed, num_parts=2))

    a = polygon_relate(build(), num_parts=1)
    b = polygon_relate(build(), num_parts=4)
    assert a.equals(b)
    assert not a.empty
    assert set(a["relation"]) >= {"crosses", "contains", "within"}
