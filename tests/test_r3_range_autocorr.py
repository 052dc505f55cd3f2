"""knn_range (threshold similarity sweep) and ts_autocorr_stats (lag-1
sufficient statistics) — planted-geometry / hand-counted oracles; the SQL
gate covers the fixture tables."""

from __future__ import annotations

import numpy as np
import pandas as pd

from osmi_addresses_ray.pipelines import similarity, timeseries


def _emb_dir(tmp_path, mat):
    pd.DataFrame(
        {
            "vec_id": np.arange(len(mat), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in mat],
        }
    ).to_parquet(tmp_path / "embeddings.parquet", index=False)
    return str(tmp_path)


def test_knn_range_planted_threshold(tmp_path, ray_session):
    """Vectors at known angles to the query: only those whose cosine rounds
    to >= tau survive; the query row itself is excluded even though its
    cosine is 1.0."""
    dim = 8
    q = np.zeros(dim, dtype=np.float64)
    q[0] = 1.0
    rows = [q]  # vec_id 0 = the query
    for cos in (0.95, 0.6, 0.3, 0.2999999, -0.4):
        v = np.zeros(dim)
        v[0] = cos
        v[1] = np.sqrt(1.0 - cos * cos)
        rows.append(v)
    d = _emb_dir(tmp_path, np.array(rows))
    out = similarity.knn_range(d, query_id=0, tau=0.3)
    # 0.2999999 rounds to 0.3 at 6 decimals -> INCLUDED (rounded-threshold rule)
    assert out["vec_id"].tolist() == [1, 2, 3, 4]
    assert out["cosine"].iloc[0] == 0.95
    assert (out["cosine"] >= 0.3).all()
    assert 0 not in set(out["vec_id"])
    # descending cosine, ascending vec_id tiebreak
    assert out["cosine"].is_monotonic_decreasing


def test_knn_range_empty_result_schema(tmp_path, ray_session):
    dim = 4
    mat = np.eye(dim)[:3]  # mutually orthogonal -> cosine 0 everywhere
    d = _emb_dir(tmp_path, mat)
    out = similarity.knn_range(d, query_id=0, tau=0.5)
    assert len(out) == 0
    assert list(out.columns) == ["vec_id", "cosine"]
    assert out["vec_id"].dtype == np.int64 and out["cosine"].dtype == np.float64


def test_ts_autocorr_stats_hand_counted(tmp_path, ray_session):
    """Counts [2, 4, 3] over three consecutive observed hours for type A:
    pairs (2,4),(4,3) -> n=2, sxy=20, sx=6, sy=7, sxx=20, syy=25.
    Type B has one hour only -> no pair, absent from output."""
    base = np.datetime64("2024-05-01T00:00:00", "us")
    hr = np.timedelta64(3_600_000_000, "us")
    rows = []
    eid = 0
    for h, n in enumerate((2, 4, 3)):
        for _ in range(n):
            rows.append((eid, 1, "A", base + h * hr, 0.0, "{}"))
            eid += 1
    rows.append((eid, 2, "B", base, 0.0, "{}"))
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet", index=False)
    out = timeseries.ts_autocorr_stats(str(tmp_path))
    assert out["event_type"].tolist() == ["A"]
    a = out.iloc[0]
    assert (a.n_pairs, a.sxy, a.sx, a.sy, a.sxx, a.syy) == (2, 20, 6, 7, 20, 25)


def test_ts_autocorr_gap_breaks_no_pair_only_if_unobserved_hour_adjacent(
    tmp_path, ray_session
):
    """The convention is adjacent OBSERVED hours (LEAD over hour order), so a
    gap hour does NOT break the pairing — hours 0 and 2 still pair."""
    base = np.datetime64("2024-05-01T00:00:00", "us")
    hr = np.timedelta64(3_600_000_000, "us")
    rows = []
    eid = 0
    for h, n in ((0, 5), (2, 7)):
        for _ in range(n):
            rows.append((eid, 1, "A", base + h * hr, 0.0, "{}"))
            eid += 1
    pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value", "props"]
    ).to_parquet(tmp_path / "events.parquet", index=False)
    out = timeseries.ts_autocorr_stats(str(tmp_path))
    a = out.iloc[0]
    assert (a.n_pairs, a.sxy) == (1, 35)
