"""Unit tests for the exact segment-intersection join (geo_ops):
predicate strictness, emit-once across shared cells, partition invariance,
and the overlay wrapper's crossing counts on the fixture grid."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from osmi_addresses_ray.pipelines.geo_ops import (
    _SEG_SCHEMA,
    segment_intersections,
)


def _segs(rows):
    cols = list(zip(*rows))
    return rd.from_arrow(
        pa.table(
            {
                "way_id": pa.array(np.array(cols[0], np.int64)),
                "seg_idx": pa.array(np.array(cols[1], np.int32)),
                "ax": pa.array(np.array(cols[2], np.int64)),
                "ay": pa.array(np.array(cols[3], np.int64)),
                "bx": pa.array(np.array(cols[4], np.int64)),
                "by": pa.array(np.array(cols[5], np.int64)),
            }
        ).cast(_SEG_SCHEMA)
    )


def _run(rows, **kw):
    df = segment_intersections(_segs(rows), **kw).to_pandas()
    return sorted(map(tuple, df.to_numpy().tolist()))


def test_proper_crossing_detected():
    # X shape crossing at the origin
    rows = [(1, 0, -10, -10, 10, 10), (2, 0, -10, 10, 10, -10)]
    assert _run(rows) == [(1, 0, 2, 0)]


def test_touching_excluded():
    # T junction: way 2 ENDS on way 1's interior — not a proper crossing
    rows = [(1, 0, -10, 0, 10, 0), (2, 0, 0, 0, 0, 10)]
    assert _run(rows) == []


def test_collinear_overlap_excluded():
    rows = [(1, 0, 0, 0, 10, 0), (2, 0, 5, 0, 15, 0)]
    assert _run(rows) == []


def test_same_way_pairs_excluded():
    # self-crossing bowtie within one way id
    rows = [(1, 0, -10, -10, 10, 10), (1, 1, -10, 10, 10, -10)]
    assert _run(rows) == []


def test_zero_length_segment_harmless():
    rows = [(1, 0, 0, 0, 0, 0), (2, 0, -5, -5, 5, 5)]
    assert _run(rows) == []


def test_emit_once_across_cells():
    # two long diagonals spanning many 50k-unit cells: pair reported once
    rows = [
        (1, 0, -200_000, -200_000, 200_000, 200_000),
        (2, 0, -200_000, 200_000, 200_000, -200_000),
    ]
    assert _run(rows) == [(1, 0, 2, 0)]
    # and with a small cell so both segments replicate widely (21² cells
    # each — under the _SEG_MAX_CELLS=1024 replication guard)
    assert _run(rows, cell=20_000) == [(1, 0, 2, 0)]


def test_partition_invariance():
    rng = np.random.default_rng(7)
    rows = []
    for i in range(120):
        x, y = rng.integers(-300_000, 300_000, 2)
        dx, dy = rng.integers(-80_000, 80_000, 2)
        rows.append((i + 1, 0, int(x), int(y), int(x + dx), int(y + dy)))
    assert _run(rows, num_parts=1) == _run(rows, num_parts=7)
    got = _run(rows, num_parts=5)
    assert len(got) == len(set(got))  # emit-once: no duplicates
    assert len(got) > 0  # dense random chords must cross somewhere


def test_overflow_guard_raises():
    big = 1 << 32
    rows = [(1, 0, -big, 0, big, 1), (2, 0, 0, -10, 0, 10)]
    # surfaces as a RayTaskError wrapping the guard's RuntimeError
    with pytest.raises(Exception, match="overflow|2\\^31|cells"):
        _run(rows)


def test_crossing_overlay_fixture_counts():
    """Overlay on the 12-block fixture: engine result equals the naive
    O(n²) python sweep over the same segment union."""
    import importlib.util

    import duckdb

    spec = importlib.util.spec_from_file_location("re_", "__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from osmi_addresses_ray.oracle.geo_ops import oracle_overlay_segments
    from osmi_addresses_ray.pipelines.geo_ops import (
        DROP_UNITS,
        QUANT,
        _CENTROID_PID_BASE,
        crossing_overlay,
    )
    from osmi_addresses_ray.sources.fixture import fixture_docs, fixture_table
    from osmi_addresses_ray.stages.assembly import assemble_ways
    from osmi_addresses_ray.stages.parse import parse_docs

    N = 12
    parsed = parse_docs(fixture_docs(N)).drop_columns(["spans"])
    ways_geo = assemble_ways(parsed, num_parts=4)
    out = crossing_overlay(
        m._fixture_layers(N)["osmi_addresses_nodes_with_addresses"],
        ways_geo,
        num_parts=4,
    )
    onwa = m._fixture_oracle(N)["osmi_addresses_nodes_with_addresses"]
    onwa = onwa[onwa["is_ip"] == 0]
    pts = (
        onwa.assign(
            pid=np.where(
                onwa["node_id"].isna(),
                _CENTROID_PID_BASE + onwa["way_id"],
                onwa["node_id"],
            ).astype("int64"),
            ix=np.round(onwa["lon"] * QUANT).astype("int64"),
            iy=np.round(onwa["lat"] * QUANT).astype("int64"),
        )[["pid", "ix", "iy"]]
        .drop_duplicates()
    )
    allseg = oracle_overlay_segments(fixture_table(N), pts, DROP_UNITS)
    odf = duckdb.sql(
        """
        WITH o AS (
         SELECT a.way_id wa, a.seg_idx sa, b.way_id wb, b.seg_idx sb,
          ((a.bx-a.ax)::HUGEINT*(b.ay-a.ay)::HUGEINT
           - (a.by-a.ay)::HUGEINT*(b.ax-a.ax)::HUGEINT) o1,
          ((a.bx-a.ax)::HUGEINT*(b.by-a.ay)::HUGEINT
           - (a.by-a.ay)::HUGEINT*(b.bx-a.ax)::HUGEINT) o2,
          ((b.bx-b.ax)::HUGEINT*(a.ay-b.ay)::HUGEINT
           - (b.by-b.ay)::HUGEINT*(a.ax-b.ax)::HUGEINT) o3,
          ((b.bx-b.ax)::HUGEINT*(a.by-b.ay)::HUGEINT
           - (b.by-b.ay)::HUGEINT*(a.bx-b.ax)::HUGEINT) o4
         FROM allseg a JOIN allseg b ON a.way_id < b.way_id)
        SELECT wa AS way_a, sa AS seg_a, wb AS way_b, sb AS seg_b
        FROM o
        WHERE ((o1 > 0 AND o2 < 0) OR (o1 < 0 AND o2 > 0))
          AND ((o3 > 0 AND o4 < 0) OR (o3 < 0 AND o4 > 0))
        ORDER BY 1, 2, 3, 4
        """
    ).df()
    assert len(out) > 0
    assert out.reset_index(drop=True).astype("int64").equals(odf.astype("int64"))
