"""knn_point_pairs — exact grid-doubling kNN self-join vs a brute-force
oracle (the SQL gate at tests/test_driver_contract.py covers the fixture)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from osmi_addresses_ray.pipelines.geo_ops import knn_point_pairs


def _brute(pid, ix, iy, k):
    rows = []
    for i in range(len(pid)):
        d2 = (ix - ix[i]) ** 2 + (iy - iy[i]) ** 2
        order = np.lexsort((pid, d2))
        order = order[pid[order] != pid[i]][:k]
        for r, j in enumerate(order, 1):
            rows.append((pid[i], pid[j], r, int(d2[j])))
    return (
        pd.DataFrame(rows, columns=["pid", "neighbor_id", "rnk", "dist2"])
        .sort_values(["pid", "rnk"])
        .reset_index(drop=True)
        .astype("int64")
    )


def _run(pid, ix, iy, k, **kw):
    pts = rd.from_pandas(pd.DataFrame({"pid": pid, "ix": ix, "iy": iy}))
    out = knn_point_pairs(pts, k=k, **kw).to_pandas()
    return (
        out[["pid", "neighbor_id", "rnk", "dist2"]]
        .sort_values(["pid", "rnk"])
        .reset_index(drop=True)
        .astype("int64")
    )


def test_knn_matches_brute_force_sparse_spread():
    # points far sparser than cell0: several doubling rounds are exercised,
    # and late-resolving queries must still see EARLY-RESOLVED points as
    # candidates (the full-candidate-side regression)
    rng = np.random.default_rng(7)
    n = 200
    ix = rng.integers(-2_000_000, 2_000_000, n).astype(np.int64)
    iy = rng.integers(-2_000_000, 2_000_000, n).astype(np.int64)
    pid = np.arange(n, dtype=np.int64) * 7 + 3
    out = _run(pid, ix, iy, 3, cell0=10_000, num_parts=4)
    assert out.equals(_brute(pid, ix, iy, 3))


def test_knn_duplicate_coordinates_and_ties():
    rng = np.random.default_rng(11)
    base_x = rng.integers(0, 100_000, 40).astype(np.int64)
    base_y = rng.integers(0, 100_000, 40).astype(np.int64)
    ix = np.concatenate([base_x, base_x])  # exact duplicates -> dist2 == 0
    iy = np.concatenate([base_y, base_y])
    pid = np.arange(80, dtype=np.int64)
    out = _run(pid, ix, iy, 2, cell0=5_000, num_parts=4)
    assert out.equals(_brute(pid, ix, iy, 2))
    # every point's rank-1 neighbour is its coordinate twin at distance 0
    r1 = out[out["rnk"] == 1]
    assert (r1["dist2"] == 0).all()


def test_knn_fewer_points_than_k_resolves_at_full_cover():
    pid = np.array([5, 9], dtype=np.int64)
    ix = np.array([0, 3_000_000_000], dtype=np.int64)  # antipodal-ish span
    iy = np.array([0, 0], dtype=np.int64)
    out = _run(pid, ix, iy, 4, cell0=10_000, num_parts=2)
    # each point has exactly one neighbour in the corpus
    assert len(out) == 2
    assert set(out["rnk"]) == {1}
    assert (out["dist2"] == 9_000_000_000_000_000_000).all()


def test_hard_negatives_labels_differ():
    import duckdb

    from osmi_addresses_ray.pipelines.similarity import hard_negatives

    sf = "/root/testdata/sf0.001"
    out = hard_negatives(sf, query_ids=(0, 1, 2, 3), k=4)
    con = duckdb.connect(":memory:")
    lab = dict(
        con.sql(
            f"SELECT vec_id, label FROM read_parquet('{sf}/embeddings.parquet')"
        ).fetchall()
    )
    # every mined negative carries a different label than its query
    for q, v in zip(out["query_id"], out["vec_id"]):
        assert lab[int(v)] != lab[int(q)]
    # full rank ladder per query
    assert out.groupby("query_id")["rank"].apply(
        lambda s: sorted(s) == [1, 2, 3, 4]
    ).all()
