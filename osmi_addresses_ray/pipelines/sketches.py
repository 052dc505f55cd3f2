"""Mergeable distinct-count sketches (HyperLogLog).

At 100 TB an exact COUNT(DISTINCT) over a high-cardinality column is an
all-to-all exchange of every distinct key; a HyperLogLog collapses each batch
to a fixed 2^p-byte register array, merges are elementwise max (associative,
commutative — any tree shape gives the same registers), and only kilobytes
ever move. The register computation is fully deterministic (splitmix64,
no sampling), so the same input yields the same estimate on any cluster
shape — which is what lets the driver hash-check it against a naive
single-threaded recomputation (oracle/llm_ops.hll_distinct_oracle).

Register rule (standard HLL, Flajolet et al. 2007):
  h   = splitmix64(value)
  idx = h >> (64 - p)                      (top p bits)
  w   = h << p  (low 64-p bits, left-aligned)
  rho = #leading zeros of w + 1, with w == 0 -> 64 - p + 1
Estimate = alpha_m * m^2 / sum(2^-M_j), with the small-range linear-counting
correction (E <= 2.5m and empty registers present).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

HLL_P = 12  # 4096 registers / 4 KiB per sketch; ~1.6% standard error

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _rho(h: np.ndarray, p: int) -> np.ndarray:
    """1 + leading-zero count within the low 64-p suffix bits of h.

    Requires p >= 11 so the suffix fits 2^53 and the float64 exponent gives
    the exact bit length (the same no-inexact-primitive rule as the
    fingerprint kernel).
    """
    assert p >= 11, "suffix must stay float64-exact"
    s = h & np.uint64((1 << (64 - p)) - 1)
    out = np.full(len(s), 64 - p + 1, dtype=np.uint8)
    nz = s != 0
    bl = np.frexp(s[nz].astype(np.float64))[1]  # == bit_length, exact
    out[nz] = (64 - p - bl + 1).astype(np.uint8)
    return out


def hll_registers(values: np.ndarray, p: int = HLL_P) -> np.ndarray:
    h = _splitmix64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    regs = np.zeros(1 << p, dtype=np.uint8)
    np.maximum.at(regs, idx, _rho(h, p))
    return regs


def hll_estimate(regs: np.ndarray, p: int = HLL_P) -> int:
    """Driver-side scalar estimate over the 2^p merged registers.

    Deliberately a sequential python-float fold (not np.sum, which sums
    pairwise): the float-parity rule — the oracle recomputation must be able
    to reproduce the exact double, and summation ORDER is part of the spec.
    The distributed work (register computation/merge) stays numpy.
    """
    import math

    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / sum(2.0 ** (-int(r)) for r in regs)
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)  # linear counting
    return int(round(e))


def hll_distinct(ds, col: str, p: int = HLL_P):
    """Approximate COUNT(DISTINCT col) via a two-level register merge.

    Each batch emits its 2^p registers as one binary row; a 64-way map level
    maxes them; the driver maxes the <= n_blocks/64 survivors (same tree
    shape as the bloom build — at 10^6 blocks the driver touches ~16k rows of
    4 KiB, never the key stream).
    """

    def partial(t: pa.Table) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"regs": pa.array([hll_registers(vals, p).tobytes()], pa.binary())})

    def max_level(t: pa.Table) -> pa.Table:
        acc = np.zeros(1 << p, dtype=np.uint8)
        for blob in t["regs"]:
            np.maximum(acc, np.frombuffer(blob.as_py(), dtype=np.uint8), out=acc)
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    blobs = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(max_level, batch_format="pyarrow", batch_size=64)
        .take_all()
    )
    regs = np.zeros(1 << p, dtype=np.uint8)
    for row in blobs:
        np.maximum(regs, np.frombuffer(row["regs"], dtype=np.uint8), out=regs)
    return regs


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct user_id count over the events table."""
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    regs = hll_distinct(ds, "user_id")
    return pd.DataFrame(
        {
            "col_name": ["user_id"],
            "n_registers": np.array([1 << HLL_P], dtype=np.int64),
            "approx_distinct": np.array([hll_estimate(regs)], dtype=np.int64),
        }
    )
