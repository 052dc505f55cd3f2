"""Independent pure-Python oracles for driver correctness checks.

For operators that ANSI SQL cannot express (sketches, ANN, geospatial
layers), the driver's oracle side is a naive single-threaded re-computation
written against the ALGORITHM SPEC (seeds, hash families, formulas) — not
against the engine code. Each oracle writes its result to a fixed parquet
path under /tmp/graft_oracle/, and the paired ``oracle_sql()`` entry is
``SELECT * FROM read_parquet(...)`` so DuckDB hash-compares the engine's
distributed result against the naive recomputation.

No module here imports engine pipeline/stage code; shared constants
(token regex, seeds, FNV parameters) are re-declared from the spec.
"""

from __future__ import annotations

import os

import pandas as pd

ORACLE_DIR = "/tmp/graft_oracle"


def oracle_path(name: str) -> str:
    return os.path.join(ORACLE_DIR, f"{name}.parquet")


def write_oracle(name: str, df: pd.DataFrame) -> str:
    os.makedirs(ORACLE_DIR, exist_ok=True)
    path = oracle_path(name)
    df.reset_index(drop=True).to_parquet(path, index=False)
    return path


def read_parquet_sql(name: str, order_by: str) -> str:
    return f"SELECT * FROM read_parquet('{oracle_path(name)}') ORDER BY {order_by}"
