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

# GRAFT_ORACLE_DIR: alternate cache dir for corpus-variant gate legs (the
# mirrored-coordinate sweep must not poison / be poisoned by the default
# corpus's cached oracle parquet)
ORACLE_DIR = os.environ.get("GRAFT_ORACLE_DIR", "/tmp/graft_oracle")


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


def tagged_dir(name: str, tag: int) -> str:
    return os.path.join(ORACLE_DIR, name, f"tag={tag}")


def write_oracle_tagged(name: str, df: pd.DataFrame, tag: int) -> str:
    """Input-scale-namespaced oracle write (hive ``tag=<n>`` partition dirs).

    The flat-path oracles are input-independent fixtures, but the sf-table
    oracles change with the corpus: a query run at sf0.001 (pytest) must not
    poison the parquet a later SQL-first evaluation at sf0.01 (the driver)
    reads back. ``tag`` is the row count of the query's base table, and the
    paired SQL selects ``WHERE tag = (SELECT count(*) FROM <base>)`` so each
    evaluation scale reads only its own partition."""
    import shutil

    d = tagged_dir(name, tag)
    tmp = d + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    df.reset_index(drop=True).to_parquet(os.path.join(tmp, "data.parquet"), index=False)
    shutil.rmtree(d, ignore_errors=True)
    os.replace(tmp, d)
    return d


# content fingerprint of the query's base table, evaluated by DuckDB on BOTH
# sides (Python tags the write via read_parquet; the oracle SQL re-evaluates
# the same expression over the driver-registered view) — row counts alone
# collide across scale factors (sf0.001 and sf0.01 both ship 500 docs)
_TAG_EXPR = {
    "documents": "(sum(hash(doc_id::VARCHAR || left(text, 24))) % 999999937)::BIGINT",
    "embeddings": "(sum(hash(vec_id::VARCHAR || embedding[1]::VARCHAR)) % 999999937)::BIGINT",
    "events": "(sum(hash(event_id::VARCHAR || user_id::VARCHAR)) % 999999937)::BIGINT",
    "lineitem": (
        "(sum(hash(l_orderkey::VARCHAR || l_suppkey::VARCHAR || "
        "l_linenumber::VARCHAR)) % 999999937)::BIGINT"
    ),
}


def read_tagged_sql(name: str, order_by: str, tag_source: str) -> str:
    glob = os.path.join(ORACLE_DIR, name, "*", "*.parquet")
    return (
        f"SELECT * EXCLUDE (tag) FROM read_parquet('{glob}', hive_partitioning=1) "
        f"WHERE tag = (SELECT {_TAG_EXPR[tag_source]} FROM {tag_source}) "
        f"ORDER BY {order_by}"
    )


def content_tag(sf_dir: str, table: str) -> int:
    """The write-side twin of ``read_tagged_sql``'s WHERE tag."""
    import duckdb

    path = os.path.join(sf_dir, f"{table}.parquet")
    return int(
        duckdb.sql(f"SELECT {_TAG_EXPR[table]} FROM read_parquet('{path}')").fetchone()[0]
    )
