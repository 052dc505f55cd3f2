"""Driver-faithful correctness-gate simulation.

Runs EVERY __ray_entry__.queries() entry at a chosen sf (default sf0.01 —
the driver's own scale) against its oracle_sql() with the driver's
normalization (float32→float64 before round-to-6, datetimes to us, columns
sorted by name, rows sorted, STRICT value equality — not a tolerance), and
prints one line per query plus a summary. Run with a cold oracle cache
(`rm -rf /tmp/graft_oracle /tmp/graft_ivf`) to also exercise the
`_ensure_default_oracles` regeneration path.

Usage: python tools/gate_sim.py [SF_DIR] [name-substring ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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
        if df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6) + 0.0
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filters = sys.argv[2:]
    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect(":memory:")
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry.queries()
    osql = entry.oracle_sql()
    n_pass = n_rows_only = 0
    failures: list[str] = []
    for name in sorted(qs):
        if name_filters and not any(s in name for s in name_filters):
            continue
        try:
            res = _to_df(qs[name](sf_dir))
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            failures.append(f"{name}: ENGINE {type(e).__name__}: {str(e)[:100]}")
            print(f"FAIL  {name} (engine error)")
            continue
        if name not in osql:
            ok = res is not None and len(res.columns) > 0
            n_rows_only += 1 if ok else 0
            if not ok:
                failures.append(f"{name}: rows-only check failed")
            print(f"{'rows ' if ok else 'FAIL '} {name} ({len(res)} rows)")
            continue
        try:
            ora = con.sql(osql[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: ORACLE {type(e).__name__}: {str(e)[:100]}")
            print(f"FAIL  {name} (oracle error)")
            continue
        a, b = _normalize(res), _normalize(ora)
        if list(a.columns) != list(b.columns):
            failures.append(f"{name}: columns {list(a.columns)} vs {list(b.columns)}")
            print(f"FAIL  {name} (schema)")
        elif len(a) != len(b):
            failures.append(f"{name}: rows {len(a)} vs {len(b)}")
            print(f"FAIL  {name} (rows)")
        elif not a.equals(b):
            bad = [c for c in a.columns if not a[c].equals(b[c])]
            failures.append(f"{name}: value mismatch in {bad}")
            print(f"FAIL  {name} (values: {bad})")
        else:
            n_pass += 1
            print(f"pass  {name} ({len(a)} rows)")
    print(
        f"\n{n_pass} hash-equal, {n_rows_only} rows-only, "
        f"{len(failures)} failures"
    )
    for f in failures:
        print("  " + f)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
