"""Emulate the driver's correctness gate: run every queries() entry at
sf0.001 and compare SQL-checked ones against DuckDB (row count, column names,
order-insensitive values)."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(res):
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


SQL_CHECKED = sorted(entrymod.oracle_sql().keys())

# Per-query gate budget (VERDICT r3 task #9): the driver's correctness
# sweep runs EVERY query each round, so the full surface only stays
# verifiable if no single query grows a super-linear hot spot. 25 s at
# sf0.001 on the 4-CPU test session is ~8x the slowest healthy query —
# loose enough for host-contention windows, tight enough to fail the
# "query got an order of magnitude slower" class before it taxes every
# future round.
PER_QUERY_BUDGET_S = 25.0
_query_times: dict[str, float] = {}


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_sql_parity(con, name):
    import time as _time

    t0 = _time.monotonic()
    ray_df = _normalize(_to_df(entrymod.queries()[name](SF_DIR)))
    _query_times[name] = _time.monotonic() - t0
    assert _query_times[name] < PER_QUERY_BUDGET_S, (
        f"{name}: {_query_times[name]:.1f}s exceeds the {PER_QUERY_BUDGET_S}s "
        "gate budget at sf0.001 — profile with tools/profile_queries.py"
    )
    sql_df = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns), (
        f"{name}: cols {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: {len(ray_df)} vs {len(sql_df)} rows"
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False, check_exact=False, atol=1e-5)


def test_rows_only_queries_run():
    qs = entrymod.queries()
    sql = set(entrymod.oracle_sql())
    for name, fn in qs.items():
        if name in sql or name.startswith("osmi_"):
            continue
        df = _to_df(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke():
    df = entrymod.entry()
    assert len(df) > 0
    assert "road_id" in df.columns


def test_fdiv_sql_matches_numpy_floor():
    """The oracle-side floor-division helper must agree with numpy/python
    `//` for NEGATIVE dividends (DuckDB's native `//` truncates toward
    zero), and with a column divisor — ADVICE r3 found hex_bins / moran_i /
    edr oracles silently diverging on any western/southern-hemisphere
    corpus."""
    xs = np.array([-21, -20, -1, 0, 1, 19, 20, 21, -7, 7,
                   -1_800_000_001, 1_799_999_999], dtype=np.int64)
    for d in (2, 10, 8660, 10000, 100000):
        expr = entrymod._fdiv("x", d)
        got = duckdb.sql(
            f"SELECT {expr} AS f FROM (SELECT unnest($xs::BIGINT[]) AS x)",
            params={"xs": [int(v) for v in xs]},
        ).fetchnumpy()["f"]
        assert (got == xs // d).all(), f"d={d}: {got} vs {xs // d}"
    # column divisor (the staypoints centroid uses sum // n_pts)
    expr = entrymod._fdiv("x", "n")
    got = duckdb.sql(
        f"SELECT {expr} AS f FROM (VALUES (-7, 2), (-7, 3), (7, 2)) t(x, n)"
    ).fetchnumpy()["f"]
    assert list(got) == [-4, -3, 3]


def test_query_budget_total():
    """Full-surface sweep budget: the accumulated Ray-side wall time of
    every oracle-paired query this session must stay bounded, or the
    driver's per-round gate becomes unrunnable as the surface grows
    (VERDICT r3 task #9). Only meaningful after test_sql_parity ran."""
    if len(_query_times) < len(SQL_CHECKED) // 2:
        pytest.skip("parity tests did not run (filtered session)")
    total = sum(_query_times.values())
    worst = sorted(_query_times.items(), key=lambda kv: -kv[1])[:5]
    assert total < 900.0, (
        f"gate sweep total {total:.0f}s exceeds the 900s budget; "
        f"worst offenders: {worst}"
    )
