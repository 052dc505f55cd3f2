"""Discrete Fréchet pairs over planted trajectories: order sensitivity
(forward vs reversed route is Hausdorff-identical but Fréchet-far), the
minimax-coupling value on a hand-computed detour, origin-cell bucketing
(different origin cells never pair), and partition-count invariance of the
two-exchange shape."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from osmi_addresses_ray.pipelines.geo_ops import (
    _frechet2,
    frechet_from_points,
)


def _traj(rows):
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


def test_frechet_kernel_known_values():
    # identical sequences -> 0
    xa = np.array([0, 10, 20], np.int64)
    ya = np.zeros(3, np.int64)
    assert _frechet2(xa, ya, xa.copy(), ya.copy()) == 0
    # reversed copy: every coupling must at some point span the full
    # 20-unit extent -> 400 (Hausdorff² would be 0)
    assert _frechet2(xa, ya, xa[::-1].copy(), ya.copy()) == 400
    # single-point vs line: dp degenerates to max over the line = 400
    assert _frechet2(xa[:1], ya[:1], xa, ya) == 400
    # detour: B visits (10, 5) where A stays on the axis; best coupling
    # pairs the detour vertex with A's midpoint -> 25
    xb = np.array([0, 10, 20], np.int64)
    yb = np.array([0, 5, 0], np.int64)
    assert _frechet2(xa, ya, xb, yb) == 25


def test_frechet_pairs_bucketing_and_order(ray_session):
    # trajectories 1..3 share origin cell (0,0); 4 starts in another cell
    pts = [
        # traj 1: axis walk
        (1, 0, 0, 0), (1, 1, 1000, 0), (1, 2, 2000, 0),
        # traj 2: the same walk REVERSED in step order (same point set)
        (2, 0, 2000, 0), (2, 1, 1000, 0), (2, 2, 0, 0),
        # traj 3: identical to traj 1
        (3, 0, 0, 0), (3, 1, 1000, 0), (3, 2, 2000, 0),
        # traj 4: far-away origin cell -> never paired
        (4, 0, 10_000_000, 0), (4, 1, 10_001_000, 0),
    ]
    for parts in (1, 3):
        out = frechet_from_points(_traj(pts), num_parts=parts)
        got = {
            (int(r.traj_a), int(r.traj_b)): int(r.f2) for r in out.itertuples()
        }
        assert got == {
            (1, 2): 2000 ** 2,  # reversal is maximally Fréchet-far
            (1, 3): 0,
            (2, 3): 2000 ** 2,
        }
        assert (out[["cell_x", "cell_y"]] == 0).all().all()


def test_frechet_cell_cap_raises(ray_session):
    pts = [(t, 0, 0, 0) for t in range(5)]
    try:
        frechet_from_points(_traj(pts), num_parts=1, cell_cap=3)
    except Exception as e:  # Ray wraps the ValueError
        assert "cell_cap" in str(e)
    else:
        raise AssertionError("expected cell_cap violation to raise")


# --- EDR ---------------------------------------------------------------------------


def test_edr_kernel_fuzz_vs_memoized_bruteforce():
    import functools

    from osmi_addresses_ray.pipelines.geo_ops import _edr

    def brute(xa, ya, xb, yb, eps):
        @functools.lru_cache(None)
        def dp(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            m = abs(xa[i - 1] - xb[j - 1]) <= eps and abs(ya[i - 1] - yb[j - 1]) <= eps
            return min(dp(i - 1, j - 1) + (0 if m else 1),
                       dp(i - 1, j) + 1, dp(i, j - 1) + 1)
        return dp(len(xa), len(xb))

    rng = np.random.RandomState(17)
    for trial in range(200):
        n, m = rng.randint(1, 9, 2)
        xa, ya = rng.randint(0, 40, n), rng.randint(0, 40, n)
        xb, yb = rng.randint(0, 40, m), rng.randint(0, 40, m)
        eps = int(rng.randint(1, 30))
        got = _edr(xa.astype(np.int64), ya.astype(np.int64),
                   xb.astype(np.int64), yb.astype(np.int64), eps)
        want = brute(tuple(int(v) for v in xa), tuple(int(v) for v in ya),
                     tuple(int(v) for v in xb), tuple(int(v) for v in yb), eps)
        assert got == want, trial


def test_edr_glitch_costs_one_edit():
    """A single GPS spike costs exactly 1 edit (EDR's robustness claim),
    while the identical trace costs 0."""
    from osmi_addresses_ray.pipelines.geo_ops import _edr

    xa = np.array([0, 10, 20, 30, 40], np.int64)
    ya = np.zeros(5, np.int64)
    xb = xa.copy()
    yb = ya.copy()
    assert _edr(xa, ya, xb, yb, 5) == 0
    yb2 = ya.copy()
    yb2[2] = 10_000  # spike far beyond eps
    assert _edr(xa, ya, xb, yb2, 5) == 1


def test_edr_reversed_is_expensive():
    from osmi_addresses_ray.pipelines.geo_ops import _edr

    xa = np.arange(0, 60, 10, dtype=np.int64)
    ya = np.zeros(6, np.int64)
    assert _edr(xa, ya, xa[::-1].copy(), ya, 3) > 3
