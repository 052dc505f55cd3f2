"""High-partition-count crossover bench: direct vs native exchange.

The direct two-wave exchange (ops.direct_cogroup) drives O(blocks x P)
object refs from the driver; SCALE.md documents it "fine to P~64" and names
exchange="native" (streaming hash join + packed groupby) as the path past
that. This tool MEASURES the crossover instead of asserting it: it runs the
flagship address-view pipeline (all three wide exchanges: assembly, match,
written-ways dedup) on the ~11M-doc synthetic corpus at
P in {64, 256, 1024} under both transports, one fresh Ray session per
configuration (subprocess, identical input), and prints one JSON line with
the wall-time matrix plus the measured crossover point.

Usage:
    python tools/highp_bench.py [--blocks 768000] [--cpus 32]
                                [--parts 64,256,1024]

Writes HIGHP_BENCH.json in the repo root (the artifact SCALE.md cites).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_leg(blocks: int, cpus: int, parts: int, exchange: str) -> dict:
    out_path = f"/tmp/graft_highp_{os.getpid()}_{parts}_{exchange}.json"
    if os.path.exists(out_path):
        os.remove(out_path)
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS=str(cpus),
        GRAFT_BENCH_BLOCKS=str(blocks),
        GRAFT_BENCH_MODE="av",
        GRAFT_AV_PARTS=str(parts),
        GRAFT_EXCHANGE=exchange,
        GRAFT_BENCH_OUT=out_path,
    )
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, cwd=REPO,
    )
    wall = time.perf_counter() - t0
    if not os.path.exists(out_path):
        return {
            "parts": parts, "exchange": exchange, "error": True,
            "rc": proc.returncode, "stderr_tail": proc.stderr[-2000:],
            "subprocess_wall": round(wall, 1),
        }
    with open(out_path) as f:
        r = json.load(f)
    return {
        "parts": parts,
        "exchange": exchange,
        "address_view_sec": r["queries"]["address_view"],
        "docs_per_sec": r["address_view"]["docs_per_sec"],
        "n_docs": r["address_view"]["n_docs"],
        "phases": r["address_view"].get("phases", {}),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--blocks", type=int, default=768000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--parts", default="64,256,1024")
    ap.add_argument("--exchanges", default="direct,native")
    ap.add_argument("--out", default="HIGHP_BENCH.json")
    args = ap.parse_args()

    # author the corpus once at full parallelism, outside any timed leg
    env = dict(
        os.environ, RAY_GRAFT_CPUS=str(args.cpus),
        GRAFT_BENCH_BLOCKS=str(args.blocks), GRAFT_BENCH_MODE="prep",
        GRAFT_BENCH_OUT=f"/tmp/graft_highp_prep_{os.getpid()}.json",
    )
    subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                   env=env, capture_output=True, text=True, cwd=REPO)

    legs = []
    for parts in (int(p) for p in args.parts.split(",")):
        for exchange in args.exchanges.split(","):
            leg = run_leg(args.blocks, args.cpus, parts, exchange)
            legs.append(leg)
            print(json.dumps(leg), flush=True)

    # crossover: smallest P where native beats direct
    crossover = None
    by_p: dict[int, dict[str, float]] = {}
    for leg in legs:
        if "address_view_sec" in leg:
            by_p.setdefault(leg["parts"], {})[leg["exchange"]] = leg[
                "address_view_sec"
            ]
    for p in sorted(by_p):
        t = by_p[p]
        if "direct" in t and "native" in t and t["native"] < t["direct"]:
            crossover = p
            break
    result = {
        "metric": "highp_crossover",
        "blocks": args.blocks,
        "num_cpus": args.cpus,
        "legs": legs,
        "crossover_parts": crossover,
    }
    with open(os.path.join(REPO, args.out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
