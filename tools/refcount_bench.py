"""Driver-ref bench for the direct exchange: one-level grid vs two-level.

The one-level exchange holds O(blocks x P) piece ObjectRefs on the driver —
the documented cluster risk (SCALE.md "Exchanges"). This tool measures the
actual driver cost at a given (blocks, P): each leg runs in a FRESH
subprocess (own Ray session) so driver max-RSS is attributable, executes one
sum-per-key direct_cogroup over a synthetic int corpus, and reports the
piece-ref count (ops.EXCHANGE_STATS), wall time, and driver ru_maxrss.

Usage:
    python tools/refcount_bench.py [--blocks 512] [--parts 1024]
                                   [--rows 4000000] [--cpus 8]

Writes REFCOUNT_r05.json in the repo root (cited by SCALE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LEG = r"""
import json, os, resource, sys, time
import numpy as np, pandas as pd, pyarrow as pa
import ray
ray.init(address="local", num_cpus=int(os.environ["RC_CPUS"]),
         include_dashboard=False, logging_level="ERROR")
import ray.data as rd
from osmi_addresses_ray import ops

rows, blocks, parts = (int(os.environ[k]) for k in ("RC_ROWS", "RC_BLOCKS", "RC_PARTS"))
mode = os.environ["RC_MODE"]
rng = np.random.default_rng(5)
df = pd.DataFrame({
    "k": rng.integers(0, rows // 8, rows).astype(np.int64),
    "v": rng.integers(0, 1_000_000, rows).astype(np.int64),
})
ds = rd.from_pandas(df).repartition(blocks).materialize()
schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])

def f(t):
    if t.num_rows == 0:
        return pa.schema([("k", pa.int64()), ("s", pa.int64())]).empty_table()
    g = t.to_pandas().groupby("k", as_index=False, sort=True).agg(s=("v", "sum"))
    return pa.Table.from_pandas(g, preserve_index=False)

t0 = time.perf_counter()
out = ops.direct_cogroup([ds], [["k"]], parts, f, [schema],
                         two_level=(mode == "two_level"))
n = out.count()
wall = time.perf_counter() - t0
res = {
    "mode": mode, "rows_out": n, "wall_sec": round(wall, 2),
    "piece_refs": ops.EXCHANGE_STATS["piece_refs"],
    "out_refs": ops.EXCHANGE_STATS["out_refs"],
    "n_blocks": ops.EXCHANGE_STATS["n_blocks"],
    "driver_maxrss_mb": round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024, 1),
}
print("RESULT " + json.dumps(res))
ray.shutdown()
os._exit(0)
"""


def run_leg(mode: str, rows: int, blocks: int, parts: int, cpus: int) -> dict:
    env = dict(
        os.environ, RC_MODE=mode, RC_ROWS=str(rows), RC_BLOCKS=str(blocks),
        RC_PARTS=str(parts), RC_CPUS=str(cpus),
    )
    proc = subprocess.run(
        [sys.executable, "-c", _LEG], env=env, capture_output=True,
        text=True, cwd=REPO,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    return {"mode": mode, "error": True, "rc": proc.returncode,
            "stderr_tail": proc.stderr[-2000:]}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=512)
    ap.add_argument("--parts", type=int, default=1024)
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    legs = [
        run_leg(m, args.rows, args.blocks, args.parts, args.cpus)
        for m in ("one_level", "two_level")
    ]
    ok = all(not leg.get("error") for leg in legs)
    result = {
        "metric": "direct_exchange_driver_refs",
        "rows": args.rows, "blocks": args.blocks, "parts": args.parts,
        "num_cpus": args.cpus, "legs": legs,
    }
    if ok:
        one, two = legs
        assert one["rows_out"] == two["rows_out"]
        result["ref_reduction"] = round(one["piece_refs"] / two["piece_refs"], 1)
        result["wall_ratio_two_vs_one"] = round(
            two["wall_sec"] / one["wall_sec"], 3)
    out = os.path.join(REPO, "REFCOUNT_r05.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
