"""Standing spill-regime gate (round-5 verdict task #5).

SPILL_r04 proved the flagship degrades gracefully (0.61x) when the object
store is squeezed below the working set — but as a one-off artifact. This
test re-runs a scaled-down version of the same two-leg comparison every
suite run and FAILS if graceful degradation regresses into a cliff, the
same way the gate budgets are asserted in test_driver_contract.

Budgets: throughput ratio >= 0.5 (half the r4 full-scale margin under the
noisier small run) and spilled_mib > 0 (the leg must demonstrably exercise
the disk path — a silent no-spill run proves nothing).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spill_regime_graceful_not_cliff():
    env = dict(
        os.environ,
        GRAFT_SF_DIR="/root/testdata/sf0.001",
        RAY_GRAFT_CPUS="8",
        GRAFT_SPILL_BLOCKS="200000",
        GRAFT_SPILL_STORE_GB="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--spill"],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=580,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
    assert line.startswith("{"), (
        f"bench --spill produced no JSON; rc={proc.returncode}, "
        f"stderr tail={proc.stderr[-2000:]!r}"
    )
    r = json.loads(line)
    assert r["metric"] == "spill_throughput_ratio"
    spilled = r["spill_counters"]["spilled_mib"]
    assert spilled > 0, (
        "spill leg did not spill — shrink GRAFT_SPILL_STORE_GB or grow "
        f"GRAFT_SPILL_BLOCKS (counters: {r['spill_counters']})"
    )
    assert r["value"] >= 0.5, (
        f"spill-regime throughput ratio {r['value']} fell below the 0.5 "
        f"budget (resident {r['resident_sec']}s vs spill {r['spill_sec']}s, "
        f"{spilled} MiB spilled) — graceful degradation regressed to a cliff"
    )
