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


def _code_fingerprint() -> str:
    """Hash of the package + entry-point sources. Oracle parquet is written
    by a query run of a specific code version; a file left by an OLDER
    version must never be read back as the oracle for the current one (the
    driver may evaluate oracle SQL before re-running the paired query, and
    /tmp persists across rounds)."""
    import hashlib

    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    paths = [os.path.join(os.path.dirname(pkg), "__ray_entry__.py")]
    for root, _dirs, files in os.walk(pkg):
        paths.extend(os.path.join(root, f) for f in files if f.endswith(".py"))
    for p in sorted(paths):
        try:
            with open(p, "rb") as fh:
                h.update(fh.read())
        except OSError:
            pass
    return h.hexdigest()[:16]


def invalidate_stale_oracles() -> None:
    """Clear oracle files written by a different code version (sidecar
    ``_version`` stamp). Idempotent and cheap when the stamp matches."""
    import shutil

    stamp_path = os.path.join(ORACLE_DIR, "_version")
    fp = _code_fingerprint()
    try:
        if open(stamp_path).read().strip() == fp:
            return
    except OSError:
        pass
    shutil.rmtree(ORACLE_DIR, ignore_errors=True)
    os.makedirs(ORACLE_DIR, exist_ok=True)
    with open(stamp_path, "w") as fh:
        fh.write(fp)


def write_oracle(name: str, df: pd.DataFrame) -> str:
    os.makedirs(ORACLE_DIR, exist_ok=True)
    path = oracle_path(name)
    df.reset_index(drop=True).to_parquet(path, index=False)
    return path


def read_parquet_sql(name: str, order_by: str) -> str:
    return f"SELECT * FROM read_parquet('{oracle_path(name)}') ORDER BY {order_by}"
