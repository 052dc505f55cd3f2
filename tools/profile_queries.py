"""Per-query wall-time profile of the driver gate.

Runs each __ray_entry__.queries() callable at SF_DIR (default sf0.01) and
prints a sorted cost table — the budget watchdog for the driver's per-round
correctness sweep (the gate runs EVERY query; one slow query taxes every
round). Use `python tools/profile_queries.py [SF_DIR] [name-substr ...]`.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    import os

    import ray

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    os.chdir(repo)
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    subs = sys.argv[2:]
    ray.init(address="local", include_dashboard=False, ignore_reinit_error=True)
    import importlib.util

    spec = importlib.util.spec_from_file_location("__ray_entry__", "__ray_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs = mod.queries()
    rows = []
    for name, fn in sorted(qs.items()):
        if subs and not any(s in name for s in subs):
            continue
        t0 = time.monotonic()
        try:
            res = fn(sf_dir)
            n = len(res) if hasattr(res, "__len__") else -1
            err = ""
        except Exception as e:  # keep profiling the rest
            n, err = -1, f"{type(e).__name__}: {e}"
        rows.append((time.monotonic() - t0, name, n, err))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"{'sec':>8}  {'rows':>8}  query")
    for sec, name, n, err in rows:
        print(f"{sec:8.2f}  {n:8d}  {name}  {err}")
    print(f"{total:8.2f}  TOTAL over {len(rows)} queries")
    ray.shutdown()


if __name__ == "__main__":
    main()
