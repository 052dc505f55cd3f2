"""Benchmark harness — the engine's feedback loop.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus the flagship address-view pipeline over the
deterministic synthetic corpus scaled to the same sf, and prints ONE JSON
line. ``--scaling`` reruns the same workload in fresh processes at
num_cpus=8 and num_cpus=32 on identical input and reports both throughputs
and the scaling efficiency (the sandbox stand-in for the north_rule's
N vs 4N-node cluster sizes; see BASELINE.md).

This script OWNS its Ray session (the only place besides tests/CLI allowed
to call ray.init).
"""

from __future__ import annotations

import json
import numpy as np
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_from_dir(SF_DIR)
# synthetic corpus size tied to sf; --scaling overrides via env so both
# parallelism levels chew enough work for overheads to amortize
N_BLOCKS = int(os.environ.get("GRAFT_BENCH_BLOCKS", str(max(60, int(60000 * SF)))))


def fixture_path() -> str:
    """Generate (once) and cache the synthetic corpus as parquet."""
    path = f"/tmp/osmi_bench_fixture_{N_BLOCKS}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        from osmi_addresses_ray.sources.fixture import fixture_docs

        fixture_docs(N_BLOCKS, parallelism=NUM_CPUS).write_parquet(path)
        open(marker, "w").write("ok")
    return path


def bench_address_view() -> tuple[float, dict]:
    import ray.data as rd

    from osmi_addresses_ray.pipelines.address_view import build_layers

    docs_path = fixture_path()
    t0 = time.perf_counter()
    # coalesce to ~1 block per CPU: tiny blocks make every downstream stage
    # overhead-bound (measured: assembly 6.3s → 2.6s at 66 → 32 blocks)
    docs = rd.read_parquet(docs_path, override_num_blocks=NUM_CPUS)
    n_docs = docs.count()
    # partition count follows data volume (one partition ≈ 1.5k blocks of
    # fixture ≈ 23k docs), floored at 8 for parallelism; CPU count alone is
    # the wrong driver at small scale (32 parts measured slower than 8)
    num_parts = int(np.clip(N_BLOCKS // 1500, 8, max(NUM_CPUS, 8)))
    layers = build_layers(docs, num_parts=num_parts)
    # consume ALL layers in ONE tagged-union execution — ten separate
    # .count() calls cost ten driver-side execution launches (~1s each)
    import pyarrow as pa

    tagged = None
    for name in (
        "osmi_addresses_nodes_with_addresses",
        "osmi_addresses_connection_line",
        "osmi_addresses_nearest_points",
        "osmi_addresses_nearest_roads",
        "osmi_addresses_nearest_areas",
        "osmi_addresses_interpolation",
        "osmi_addresses_ways_with_addresses",
        "osmi_addresses_addrx_on_nonclosed_way",
        "osmi_addresses_entrances",
        "osmi_addresses_ways_with_postal_code",
    ):
        part = layers[name].map_batches(
            lambda t, _n=name: pa.table({"layer": [_n], "n": [t.num_rows]}),
            batch_format="pyarrow",
        )
        tagged = part if tagged is None else tagged.union(part)
    counts: dict[str, int] = {}
    for row in tagged.take_all():
        counts[row["layer"]] = counts.get(row["layer"], 0) + row["n"]
    sec = time.perf_counter() - t0
    return sec, {"n_docs": n_docs, "docs_per_sec": round(n_docs / sec, 1), **counts}


def bench_relational() -> dict[str, float]:
    from osmi_addresses_ray.pipelines import relational

    out = {}
    for name, fn in [
        ("q1_pricing_summary", relational.q1_pricing_summary),
        ("q_join_orders_customers", relational.q_join_orders_customers),
        ("q_supplier_part_join", relational.q_supplier_part_join),
        ("q_events_hourly", relational.q_events_hourly),
        ("q_top_orders", relational.q_top_orders),
    ]:
        t0 = time.perf_counter()
        fn(SF_DIR)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def bench_trainingdata() -> dict[str, float]:
    from osmi_addresses_ray.pipelines import dedup, similarity, textstats

    out = {}
    for name, fn in [
        ("dedup_exact_docs", dedup.exact_dedup_docs),
        ("minhash_lsh_pairs", dedup.minhash_lsh_pairs),
        ("token_counts", textstats.token_counts),
        ("lang_id", textstats.lang_id),
        ("knn_bruteforce", similarity.knn_bruteforce),
    ]:
        t0 = time.perf_counter()
        fn(SF_DIR)
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def run_once() -> dict:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    # warm the OS page cache AND the Ray worker pool (untimed): without this,
    # the first timed stage pays ~32 worker-process cold starts
    rd.read_parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    rd.range(1_000_000, override_num_blocks=NUM_CPUS * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).count()
    fixture_path()  # generate corpus outside the timed region

    queries: dict[str, float] = {}
    av_sec, av_stats = bench_address_view()
    queries["address_view"] = round(av_sec, 3)
    queries.update(bench_relational())
    queries.update(bench_trainingdata())

    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "address_view": av_stats,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    scale_blocks = os.environ.get("GRAFT_SCALING_BLOCKS", "48000")

    def sub(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=SF_DIR,
            GRAFT_BENCH_BLOCKS=scale_blocks,
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            raise RuntimeError(
                f"bench subprocess (cpus={ncpu}) produced no JSON; "
                f"rc={proc.returncode}, stderr tail: {proc.stderr[-2000:]}"
            )
        return json.loads(lines[-1])

    # pre-generate the corpus so both levels read identical input
    lo, hi = 8, 32
    r_lo = sub(lo)
    r_hi = sub(hi)
    t_lo = r_lo["queries"]["address_view"]
    t_hi = r_hi["queries"]["address_view"]
    thr_lo = r_lo["address_view"]["docs_per_sec"]
    thr_hi = r_hi["address_view"]["docs_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": t_lo,
        "sec_32": t_hi,
        "docs_per_sec_8": thr_lo,
        "docs_per_sec_32": thr_hi,
        "total_sec_8": r_lo["value"],
        "total_sec_32": r_hi["value"],
        "sf": SF,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
    sys.stdout.flush()
    # ray.shutdown() occasionally races a late core-worker callback into a
    # nonzero exit; the JSON line is already flushed, so exit hard and clean.
    os._exit(0)
