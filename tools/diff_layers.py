"""Regression diff of two layer-output directories (order-insensitive).

Engine equivalent of the reference's ``test/compare_sqlite.sh`` /
``create_sqlite_diff.sh`` (§3.3): per layer, compares schemas and
order-insensitive row multisets via DuckDB, and writes added/deleted rows to
parquet under ``--diff-out``.

    python tools/diff_layers.py DIR_A DIR_B [--diff-out DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("dir_a")
    p.add_argument("dir_b")
    p.add_argument("--diff-out", default=None)
    args = p.parse_args(argv)

    layers_a = {d for d in os.listdir(args.dir_a) if os.path.isdir(os.path.join(args.dir_a, d))}
    layers_b = {d for d in os.listdir(args.dir_b) if os.path.isdir(os.path.join(args.dir_b, d))}
    rc = 0
    for only, where in ((layers_a - layers_b, args.dir_b), (layers_b - layers_a, args.dir_a)):
        for layer in sorted(only):
            print(f"MISSING: {layer} not in {where}")
            rc = 1

    con = duckdb.connect()
    for layer in sorted(layers_a & layers_b):
        pa_ = os.path.join(args.dir_a, layer, "*.parquet")
        pb_ = os.path.join(args.dir_b, layer, "*.parquet")
        import glob

        files_a = glob.glob(pa_)
        files_b = glob.glob(pb_)
        if not files_a or not files_b:
            # an empty layer may have no part files at all
            n_a = len(con.sql(f"SELECT 1 FROM read_parquet('{pa_}')")) if files_a else 0
            n_b = len(con.sql(f"SELECT 1 FROM read_parquet('{pb_}')")) if files_b else 0
            if n_a == n_b == 0:
                print(f"OK {layer} (empty)")
            else:
                print(f"DIFF {layer}: +{n_b} -{n_a} (one side empty)")
                rc = 1
            continue
        try:
            cols_a = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{pa_}')").fetchall()]
            cols_b = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM read_parquet('{pb_}')").fetchall()]
        except duckdb.IOException as e:
            print(f"READ ERROR {layer}: {e}")
            rc = 1
            continue
        if cols_a != cols_b:
            print(f"SCHEMA DIFF {layer}: {cols_a} vs {cols_b}")
            rc = 1
            continue
        added = con.sql(
            f"SELECT * FROM read_parquet('{pb_}') EXCEPT ALL SELECT * FROM read_parquet('{pa_}')"
        )
        deleted = con.sql(
            f"SELECT * FROM read_parquet('{pa_}') EXCEPT ALL SELECT * FROM read_parquet('{pb_}')"
        )
        n_add, n_del = len(added), len(deleted)
        if n_add or n_del:
            print(f"DIFF {layer}: +{n_add} -{n_del}")
            rc = 1
            if args.diff_out:
                os.makedirs(args.diff_out, exist_ok=True)
                if n_add:
                    added.write_parquet(os.path.join(args.diff_out, f"{layer}.added.parquet"))
                if n_del:
                    deleted.write_parquet(os.path.join(args.diff_out, f"{layer}.deleted.parquet"))
        else:
            print(f"OK {layer}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
