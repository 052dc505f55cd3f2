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


# --- count-min sketch (heavy-hitter frequency estimates) ---------------------

CMS_DEPTH = 4
CMS_WIDTH = 1 << 14  # 4 rows x 16384 int64 counters = 512 KiB per sketch


def _cms_hashes(hashes: np.ndarray) -> list[np.ndarray]:
    """Depth row indexes via Kirsch-Mitzenmacher double hashing of the
    token's 64-bit hash (same scheme as the bloom filter)."""
    h1 = hashes & np.uint64(0xFFFFFFFF)
    h2 = (hashes >> np.uint64(32)) | np.uint64(1)
    w = np.uint64(CMS_WIDTH)
    return [((h1 + np.uint64(d) * h2) % w).astype(np.int64) for d in range(CMS_DEPTH)]


def cms_add(cms: np.ndarray, hashes: np.ndarray, counts: np.ndarray) -> None:
    for d, idx in enumerate(_cms_hashes(hashes)):
        np.add.at(cms[d], idx, counts)


def cms_query(cms: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    est = np.full(len(hashes), np.iinfo(np.int64).max, dtype=np.int64)
    for d, idx in enumerate(_cms_hashes(hashes)):
        np.minimum(est, cms[d][idx], out=est)
    return est


def _token_hash64(tokens: np.ndarray) -> np.ndarray:
    """FNV-1a over the FIRST 64 token bytes (ASCII by construction of the
    token regex; the 64-byte cap is the LSH token-hash rule — it bounds the
    n×maxlen work matrix so one pathological mega-token can't allocate
    n × its length)."""
    out = np.full(len(tokens), 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    maxlen = min(64, max((len(t) for t in tokens), default=0))
    mat = np.zeros((len(tokens), maxlen), dtype=np.uint8)
    lens = np.empty(len(tokens), dtype=np.int64)
    for i, t in enumerate(tokens):
        bs = t.encode()[:64]
        lens[i] = len(bs)
        mat[i, : len(bs)] = np.frombuffer(bs, dtype=np.uint8)
    for j in range(maxlen):
        live = lens > j
        out[live] = ((out[live] ^ mat[live, j].astype(np.uint64)) * prime) & _MASK
    return out


def cms_token_counts(sf_dir: str, probe_tokens: list[str] | None = None) -> pd.DataFrame:
    """Count-min estimates vs exact counts for a fixed probe-token set.

    The sketch is a pure ADDITIVE counter grid, so the merged registers are
    independent of batch boundaries and merge-tree shape (integer addition
    commutes) — what makes a distributed sketch hash-checkable. Each batch
    emits one 512 KiB partial; a 64-way sum level and a driver sum finish
    (same tree as the bloom build). The exact counts ride the top_tokens
    combiner path, so the output also exhibits the CMS one-sided error
    (est >= true, overestimate bounded by n/width per row).
    """
    import re as _re

    import ray.data as _rd

    from .textstats import _TOKEN_RE, _read_docs

    probes = probe_tokens or [
        "the", "and", "of", "to", "a", "in", "is", "it", "that", "with",
        "der", "die", "und", "le", "la", "les", "data", "model", "pipeline",
        "document",
    ]
    ds = _read_docs(sf_dir)
    tok = _re.compile(_TOKEN_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in tok.findall(t.lower())]
        cms = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        if toks:
            vc = pd.Series(toks).value_counts()
            cms_add(cms, _token_hash64(vc.index.to_numpy(object)), vc.to_numpy(np.int64))
        return pd.DataFrame({"cms": [cms.tobytes()]})

    def sum_level(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)
        for blob in df["cms"]:
            acc += np.frombuffer(blob, dtype=np.int64)
        return pd.DataFrame({"cms": [acc.tobytes()]})

    blobs = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(sum_level, batch_format="pandas", batch_size=64)
        .take_all()
    )
    cms = np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)
    for row in blobs:
        cms += np.frombuffer(row["cms"], dtype=np.int64)
    cms = cms.reshape(CMS_DEPTH, CMS_WIDTH)

    est = cms_query(cms, _token_hash64(np.array(probes, dtype=object)))

    # exact counts via the combiner path (only for the probe set)
    from .relational import grouped_agg

    probe_set = set(probes)

    def exact_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in tok.findall(t.lower()) if w in probe_set]
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(toks).value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)})

    exact_df = grouped_agg(
        ds.map_batches(exact_partial, batch_format="pandas"), ["token"], {"cnt": ("cnt", "sum")}
    ).to_pandas()
    if len(exact_df.columns) == 0:  # no probe token occurs in the corpus
        exact_df = pd.DataFrame({"token": pd.Series(dtype=object), "cnt": pd.Series(dtype="int64")})
    exact = exact_df.set_index("token")["cnt"]
    true_cnt = np.array([int(exact.get(t, 0)) for t in probes], dtype=np.int64)
    out = pd.DataFrame(
        {"token": np.array(probes, dtype=object), "est_cnt": est, "true_cnt": true_cnt}
    )
    assert (out["est_cnt"] >= out["true_cnt"]).all()  # CMS one-sided error
    return out.sort_values("token").reset_index(drop=True)
