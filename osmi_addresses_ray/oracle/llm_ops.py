"""Naive single-threaded oracles for the sketch / ANN operators.

Each function reads the parquet tables directly with pyarrow (no Ray) and
recomputes the operator per-row from the published spec:

- simhash: 64-bit token-hash bit voting (pandas hash_array is the declared
  token hash family).
- minhash+LSH: tokens are maximal ASCII [0-9A-Za-z_] byte runs of the
  UTF-8 text, hashed FNV-1a-64 over their first 64 bytes with A-Z lowered;
  k=5 token shingles, each shingle hash an FNV fold over up to k
  consecutive token hashes (<k tokens fold them all; empty doc → the bare
  FNV basis); one-permutation-hashing signature over 64 bins — mixed =
  splitmix64(shingle hash), bin = mixed >> 58, value = mixed & (2^58-1),
  min per bin, empty bins densified from the cyclically nearest non-empty
  bin to the right (pre-densification distances); 16 bands FNV-folded;
  buckets capped at 64 members; true Jaccard over the shingle-hash sets.
- IVF kNN / embedding dedup: spherical k-means centroids from the
  deterministic sample (vec_id < 512; RandomState seed 42 / 7), nearest-cell
  assignment, probe/all-pairs per spec.

Everything is per-doc Python loops — intentionally the slowest clearest
shape, run only at driver fixture scale.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

_TOKEN = re.compile(r"[A-Za-z0-9_]+")
_MASK61 = np.uint64(0x1FFFFFFFFFFFFFFF)
_FNV = np.uint64(1099511628211)


def _docs(sf_dir: str) -> pd.DataFrame:
    return (
        pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _emb(sf_dir: str) -> pd.DataFrame:
    return (
        pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )


_FNV_BASIS = 0xCBF29CE484222325
_FNV_P = 1099511628211
_TOKEN_BYTES = re.compile(rb"[A-Za-z0-9_]+")


def _fnv1a(bs: bytes) -> int:
    """FNV-1a-64 over the first 64 bytes, A-Z lowered (the declared token
    hash family; the engine computes the identical values with byte-table
    sweeps, dedup._token_hashes_batch)."""
    h = _FNV_BASIS
    for c in bs.lower()[:64]:
        h = ((h ^ c) * _FNV_P) & 0xFFFFFFFFFFFFFFFF
    return h


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Per-position FNV fold over up to k consecutive token hashes; tokens
    are maximal ASCII [0-9A-Za-z_] byte runs of the UTF-8 encoding."""
    toks = _TOKEN_BYTES.findall(text.encode("utf-8"))
    th = [_fnv1a(t) for t in toks]
    s = max(len(toks) - k + 1, 1)
    out = np.empty(s, np.uint64)
    for i in range(s):
        acc = _FNV_BASIS
        for t in th[i : i + k]:
            acc = ((acc * _FNV_P) ^ t) & 0xFFFFFFFFFFFFFFFF
        out[i] = np.uint64(acc)
    return out


def simhash_oracle(sf_dir: str) -> pd.DataFrame:
    docs = _docs(sf_dir)
    out = []
    for r in docs.itertuples():
        toks = _TOKEN.findall(r.text.lower())
        if not toks:
            out.append(np.uint64(0))
            continue
        hs = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
        val = np.uint64(0)
        for b in range(64):
            ones = int(((hs >> np.uint64(b)) & np.uint64(1)).sum())
            if 2 * ones - len(hs) > 0:
                val |= np.uint64(1) << np.uint64(b)
        out.append(val)
    return pd.DataFrame({"doc_id": docs["doc_id"], "simhash": np.array(out, dtype=np.uint64)})


def _splitmix64_one(x: int) -> int:
    """splitmix64 finalizer (Steele/Lea/Flood, public domain), scalar form."""
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _oph_signature(h: np.ndarray, num_perm: int) -> np.ndarray:
    """One-permutation-hashing signature, naive per-shingle loop: bin from
    the top log2(num_perm) bits of splitmix64(shingle hash), value from its
    low 58 bits, min per bin; empty bins copy the cyclically nearest
    non-empty bin to the right (distances on the raw signature)."""
    shift = 64 - (num_perm.bit_length() - 1)
    empty = (1 << 64) - 1
    sig = [empty] * num_perm
    for x in h:
        m = _splitmix64_one(int(x))
        b = m >> shift
        v = m & ((1 << 58) - 1)
        if v < sig[b]:
            sig[b] = v
    out = list(sig)
    for i in range(num_perm):
        if sig[i] == empty:
            for d in range(1, num_perm):
                j = (i + d) % num_perm
                if sig[j] != empty:
                    out[i] = sig[j]
                    break
    return np.array(out, dtype=np.uint64)


def minhash_pairs_oracle(
    sf_dir: str, *, num_perm: int = 64, bands: int = 16, threshold: float = 0.5,
    bucket_cap: int = 64,
) -> pd.DataFrame:
    docs = _docs(sf_dir)
    rows_per_band = num_perm // bands

    buckets: dict[tuple[int, np.uint64], list[int]] = {}
    hash_sets: dict[int, np.ndarray] = {}
    for r in docs.itertuples():
        h = _shingle_hashes(r.text)
        hash_sets[r.doc_id] = np.unique(h)
        sig = _oph_signature(h, num_perm)
        with np.errstate(over="ignore"):  # uint64 wraparound is the spec
            for band in range(bands):
                acc = np.uint64(band + 1)
                for j in range(rows_per_band):
                    acc = (acc * _FNV) ^ sig[band * rows_per_band + j]
                key = (band, acc & np.uint64(0x7FFFFFFFFFFFFFFF))
                buckets.setdefault(key, []).append(r.doc_id)

    cand = set()
    for ids in buckets.values():
        ids = sorted(set(ids))[:bucket_cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))

    out_a, out_b, out_j = [], [], []
    for da, db in sorted(cand):
        sa, sb = hash_sets[da], hash_sets[db]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        jac = inter / max(1, len(sa) + len(sb) - inter)
        if jac >= threshold:
            out_a.append(da)
            out_b.append(db)
            out_j.append(round(jac, 6))
    return pd.DataFrame(
        {
            "doc_a": np.array(out_a, dtype=np.int64),
            "doc_b": np.array(out_b, dtype=np.int64),
            "jaccard": np.array(out_j, dtype=np.float64),
        }
    )


def ngram_dedup_oracle(sf_dir: str, *, threshold: float = 0.8) -> pd.DataFrame:
    docs = _docs(sf_dir)
    pairs = minhash_pairs_oracle(sf_dir, threshold=threshold)
    drop = set(pairs["doc_b"])
    keep = docs.loc[~docs["doc_id"].isin(drop), ["doc_id"]]
    return keep.sort_values("doc_id").reset_index(drop=True)


def _centroids_oracle(emb: pd.DataFrame, n_cells: int, seed: int, lloyd_iters: int = 5) -> np.ndarray:
    sample = emb[emb["vec_id"] < 512].sort_values("vec_id")
    mat0 = np.stack(sample["embedding"].to_numpy()).astype(np.float32)
    mat0 /= np.maximum(np.linalg.norm(mat0, axis=1, keepdims=True), 1e-30)
    rng = np.random.RandomState(seed)
    cent = mat0[rng.choice(len(mat0), size=min(n_cells, len(mat0)), replace=False)].copy()
    for _ in range(lloyd_iters):
        assign = np.argmax(mat0 @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = mat0[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-30)
    return cent


def _n_cells(n: int) -> int:
    return int(np.clip(int(np.sqrt(max(n, 1))), 8, 4096))


def knn_ivf_oracle(
    sf_dir: str, *, query_id: int = 0, k: int = 10, n_cells: int | None = None,
    nprobe: int | None = None,
) -> pd.DataFrame:
    emb = _emb(sf_dir)
    n = len(emb)
    if n_cells is None:
        n_cells = _n_cells(n)
    cent = _centroids_oracle(emb, n_cells, seed=42)
    if nprobe is None:
        nprobe = max(8, len(cent) // 8)

    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    norms32 = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    unit = (mat / norms32[:, None]).astype(np.float32)
    cells = np.argmax(unit @ cent.T, axis=1)

    qrow = mat[emb.index[emb["vec_id"] == query_id][0]]
    q = qrow / max(np.linalg.norm(qrow), 1e-30)
    probe = set(int(c) for c in np.argsort(-(cent @ q))[:nprobe])

    # float64 gemv over the probed subset — same op shape and dtype chain as
    # the engine's per-batch score (mat→f64, q f32→f64), per-row independent
    sel = np.array([int(cells[i]) in probe for i in range(n)])
    m64 = mat[sel].astype(np.float64)
    q64 = q.astype(np.float64)
    sims = (m64 @ q64) / np.maximum(np.linalg.norm(m64, axis=1), 1e-30)
    vids = emb["vec_id"].to_numpy()[sel]
    rows = [
        (int(v), round(float(s), 6)) for v, s in zip(vids, sims) if int(v) != query_id
    ]
    rows.sort(key=lambda t: (-t[1], t[0]))
    rows = rows[:k]
    return pd.DataFrame(
        {
            "vec_id": np.array([r[0] for r in rows], dtype=np.int64),
            "cosine": np.array([r[1] for r in rows], dtype=np.float64),
        }
    )


def _split2(unit: np.ndarray) -> np.ndarray:
    i0 = 0
    d = unit @ unit[i0]
    i1 = int(np.argmin(d))
    if i1 == i0:
        i1 = min(1, len(unit) - 1)
    c = np.stack([unit[i0], unit[i1]])
    for _ in range(3):
        side = (unit @ c[1]) > (unit @ c[0])
        for s in (0, 1):
            m = side == bool(s)
            if m.any():
                v = unit[m].mean(axis=0)
                c[s] = v / max(np.linalg.norm(v), 1e-30)
    return (unit @ c[1]) > (unit @ c[0])


def _pairs_rec(ids, unit, threshold, cap, depth=0):
    out = []
    if len(ids) > cap and depth < 12:
        side = _split2(unit)
        if side.all() or (~side).all():
            side = np.arange(len(ids)) % 2 == 0
        for s in (True, False):
            m = side == s
            out.extend(_pairs_rec(ids[m], unit[m], threshold, cap, depth + 1))
        return out
    if len(ids) < 2:
        return out
    # one leaf-subset matmul (same op shape as the engine → bitwise-equal sims)
    sims = unit @ unit.T
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            sim = round(float(sims[i, j]), 6)
            if sim >= threshold:
                va, vb = int(ids[i]), int(ids[j])
                out.append((min(va, vb), max(va, vb), sim))
    return out


def emb_dedup_oracle(
    sf_dir: str, *, threshold: float = 0.4, n_cells: int | None = None, cap: int | None = None
) -> pd.DataFrame:
    emb = _emb(sf_dir)
    n = len(emb)
    if n_cells is None:
        n_cells = _n_cells(n)
    if cap is None:
        cap = max(64, 4 * int(np.sqrt(max(n, 1))))
    cent = _centroids_oracle(emb, n_cells, seed=7)

    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float32)
    norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
    unit32 = (mat / norms[:, None]).astype(np.float32)
    cells = np.argmax(unit32 @ cent.T, axis=1)
    unit = unit32.astype(np.float64)
    vec_ids = emb["vec_id"].to_numpy()

    rows = []
    for c in np.unique(cells):
        m = cells == c
        ids = vec_ids[m]
        u = unit[m]
        order = np.argsort(ids)
        rows.extend(_pairs_rec(ids[order], u[order], threshold, cap))
    rows.sort()
    return pd.DataFrame(
        {
            "vec_a": np.array([r[0] for r in rows], dtype=np.int64),
            "vec_b": np.array([r[1] for r in rows], dtype=np.int64),
            "cosine": np.array([r[2] for r in rows], dtype=np.float64),
        }
    )


def dedup_clusters_oracle(sf_dir: str, *, threshold: float = 0.5) -> pd.DataFrame:
    """Naive single-threaded re-statement of the dedup-clustering spec:
    union-find over the verified MinHash-LSH pairs, representative = minimum
    doc_id of the component; docs in no pair represent themselves."""
    pairs = minhash_pairs_oracle(sf_dir, threshold=threshold)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for r in pairs.itertuples():
        ra, rb = find(int(r.doc_a)), find(int(r.doc_b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    doc_ids = _docs(sf_dir)["doc_id"].to_numpy()
    rep = np.array([find(int(d)) for d in doc_ids], dtype=np.int64)
    return (
        pd.DataFrame({"doc_id": doc_ids.astype(np.int64), "rep_id": rep})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def knn_hyperplane_oracle(
    sf_dir: str, *, query_id: int = 0, k: int = 10, n_planes: int = 8, max_flips: int = 2,
) -> pd.DataFrame:
    """Naive restatement of the hyperplane-LSH spec: gaussian planes from
    rng(1234), bucket = sign bits, probe = Hamming<=max_flips, exact cosine
    top-k among the probed candidates (ties by vec_id)."""
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    qv = mat[ids == query_id][0]
    planes = np.random.default_rng(1234).standard_normal((n_planes, mat.shape[1]))

    def bucket(rows: np.ndarray) -> np.ndarray:
        signs = (rows @ planes.T) >= 0.0
        return (signs.astype(np.uint32) << np.arange(n_planes, dtype=np.uint32)).sum(
            axis=1
        ).astype(np.int64)

    bq = int(bucket(qv[None, :])[0])
    probes = {bq}
    for i in range(n_planes):
        probes.add(bq ^ (1 << i))
        if max_flips >= 2:
            for j in range(i + 1, n_planes):
                probes.add(bq ^ (1 << i) ^ (1 << j))
    b = bucket(mat)
    cand = np.array([x in probes for x in b]) & (ids != query_id)
    cids, cmat = ids[cand], mat[cand]
    sims = np.round(
        (cmat @ qv)
        / (np.maximum(np.linalg.norm(cmat, axis=1), 1e-30) * max(np.linalg.norm(qv), 1e-30)),
        6,
    )
    df = pd.DataFrame({"vec_id": cids.astype(np.int64), "cosine": sims})
    return (
        df.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )


def hll_distinct_oracle(sf_dir: str) -> pd.DataFrame:
    """Naive scalar-loop HLL over events.user_id: per-value python-int
    splitmix64 + int.bit_length registers, then the textbook estimate —
    no numpy vector kernels shared with the engine."""
    import math

    p = 12
    m = 1 << p
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    regs = [0] * m
    mask64 = (1 << 64) - 1
    for v in set(ev["user_id"].to_pylist()):
        z = (int(v) + 0x9E3779B97F4A7C15) & mask64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask64
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask64
        h = z ^ (z >> 31)
        idx = h >> (64 - p)
        suffix = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) - suffix.bit_length() + 1
        if rho > regs[idx]:
            regs[idx] = rho
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / sum(2.0 ** (-r) for r in regs)
    zeros = regs.count(0)
    if e <= 2.5 * m and zeros:
        e = m * math.log(m / zeros)
    return pd.DataFrame(
        {
            "col_name": ["user_id"],
            "n_registers": np.array([m], dtype=np.int64),
            "approx_distinct": np.array([int(round(e))], dtype=np.int64),
        }
    )


def cms_token_counts_oracle(sf_dir: str) -> pd.DataFrame:
    """Scalar recomputation of the count-min probe estimates: per-token
    python-int FNV-1a + KM row indexes into plain python counter lists,
    exact counts from a dict."""
    probes = [
        "the", "and", "of", "to", "a", "in", "is", "it", "that", "with",
        "der", "die", "und", "le", "la", "les", "data", "model", "pipeline",
        "document",
    ]
    depth, width = 4, 1 << 14
    mask = (1 << 64) - 1
    docs = _docs(sf_dir)

    def fnv(t: str) -> int:
        h = 0xCBF29CE484222325
        for b in t.encode()[:64]:  # first-64-bytes cap, same as the engine
            h = ((h ^ b) * 0x100000001B3) & mask
        return h

    def rows(h: int) -> list[int]:
        h1, h2 = h & 0xFFFFFFFF, (h >> 32) | 1
        return [(h1 + d * h2) % width for d in range(depth)]

    cms = [[0] * width for _ in range(depth)]
    true_cnt: dict[str, int] = {}
    for r in docs.itertuples():
        for w in _TOKEN.findall(r.text.lower()):
            for d, idx in enumerate(rows(fnv(w))):
                cms[d][idx] += 1
            if w in probes:
                true_cnt[w] = true_cnt.get(w, 0) + 1
    out = []
    for t in sorted(probes):
        est = min(cms[d][idx] for d, idx in enumerate(rows(fnv(t))))
        out.append({"token": t, "est_cnt": np.int64(est), "true_cnt": np.int64(true_cnt.get(t, 0))})
    return pd.DataFrame(out, columns=["token", "est_cnt", "true_cnt"])


def kmeans_assign_oracle(sf_dir: str) -> pd.DataFrame:
    """Per-row scalar recomputation of the k-means assignment: same seeded
    driver-side training spec, then a python loop argmax per vector."""
    emb = _emb(sf_dir)
    cent = _centroids_oracle(emb, 16, seed=42)
    rows = []
    for r in emb.itertuples():
        v = np.asarray(r.embedding, np.float64)
        sims = []
        for c in cent:
            dot = 0.0
            na = 0.0
            nb = 0.0
            for i in range(len(v)):
                dot += v[i] * float(c[i])
                na += v[i] * v[i]
                nb += float(c[i]) * float(c[i])
            sims.append(dot / np.sqrt(na * nb))
        rows.append({"vec_id": np.int64(r.vec_id), "cluster": np.int64(int(np.argmax(sims)))})
    return pd.DataFrame(rows).sort_values("vec_id").reset_index(drop=True)


def simhash_pairs_oracle(sf_dir: str) -> pd.DataFrame:
    """All doc pairs with simhash Hamming distance <= 3 — naive O(n^2) over
    the independently recomputed signatures; popcount via unpackbits (a
    DIFFERENT popcount than the engine's SWAR fold)."""
    s = simhash_oracle(sf_dir).sort_values("doc_id").reset_index(drop=True)
    sig = s["simhash"].to_numpy(np.uint64)
    did = s["doc_id"].to_numpy(np.int64)
    out_a: list[int] = []
    out_b: list[int] = []
    out_h: list[int] = []
    for i in range(len(sig)):
        x = sig[i] ^ sig[i + 1 :]
        if not len(x):
            continue
        ham = np.unpackbits(x[:, None].view(np.uint8), axis=1).sum(axis=1)
        for j in np.flatnonzero(ham <= 3):
            out_a.append(int(did[i]))
            out_b.append(int(did[i + 1 + j]))
            out_h.append(int(ham[j]))
    return (
        pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
                "hamming": pd.Series(out_h, dtype="int64"),
            }
        )
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _pq_codebooks_oracle(emb: pd.DataFrame, m: int = 8, k: int = 16, seed: int = 42,
                         lloyd_iters: int = 5) -> np.ndarray:
    """Independent restatement of the PQ training spec (float64 throughout):
    per subspace, RandomState(seed+m) picks k sample rows, Lloyd with L2."""
    sample = emb[emb["vec_id"] < 512].sort_values("vec_id")
    mat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
    d = mat.shape[1]
    sub = d // m
    books = np.empty((m, k, sub), dtype=np.float64)
    for mi in range(m):
        x = mat[:, mi * sub:(mi + 1) * sub]
        rng = np.random.RandomState(seed + mi)
        cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
        for _ in range(lloyd_iters):
            d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                mask = assign == c
                if mask.any():
                    cent[c] = x[mask].mean(axis=0)
        books[mi, :len(cent)] = cent
        if len(cent) < k:
            books[mi, len(cent):] = cent[0]
    return books


def pq_codes_oracle(sf_dir: str) -> pd.DataFrame:
    """Per-row scalar PQ encode: python-float left-to-right distance folds
    (subdim 8 < numpy's pairwise blocksize, so the engine's vectorized sum
    is the same fold), first-min tie rule."""
    emb = _emb(sf_dir)
    books = _pq_codebooks_oracle(emb)
    m, k, sub = books.shape
    rows = []
    for r in emb.itertuples():
        v = np.asarray(r.embedding, np.float64)
        for mi in range(m):
            best_c, best_d = 0, None
            for c in range(k):
                acc = 0.0
                for i in range(sub):
                    diff = v[mi * sub + i] - float(books[mi, c, i])
                    acc += diff * diff
                if best_d is None or acc < best_d:
                    best_d, best_c = acc, c
            rows.append(
                {"vec_id": np.int64(r.vec_id), "m": np.int64(mi), "code": np.int64(best_c)}
            )
    return pd.DataFrame(rows).sort_values(["vec_id", "m"]).reset_index(drop=True)


def pq_adc_oracle(sf_dir: str, *, query_id: int = 0, topk: int = 10) -> pd.DataFrame:
    """Scalar ADC: LUT from the exact query vs every codebook entry, distance
    = LUT fold in subspace order, (dist asc, vec_id asc) top-k."""
    emb = _emb(sf_dir)
    books = _pq_codebooks_oracle(emb)
    m, k, sub = books.shape
    qv = np.asarray(
        emb.loc[emb["vec_id"] == query_id, "embedding"].iloc[0], np.float64
    )
    lut = np.empty((m, k), dtype=np.float64)
    for mi in range(m):
        for c in range(k):
            acc = 0.0
            for i in range(sub):
                diff = qv[mi * sub + i] - float(books[mi, c, i])
                acc += diff * diff
            lut[mi, c] = acc
    codes = pq_codes_oracle(sf_dir)
    by_vec = codes.pivot(index="vec_id", columns="m", values="code")
    rows = []
    for vid, cs in by_vec.iterrows():
        if int(vid) == query_id:
            continue
        acc = 0.0
        for mi in range(m):
            acc += float(lut[mi, int(cs[mi])])
        # np.round to match the engine's rounding exactly (builtin round
        # can differ on half-way scaled values)
        rows.append({"vec_id": np.int64(vid), "adc_dist": float(np.round(acc, 6))})
    rows.sort(key=lambda t: (t["adc_dist"], t["vec_id"]))
    return pd.DataFrame(rows[:topk])


def pca_project_oracle(sf_dir: str) -> pd.DataFrame:
    """Scalar restatement of the PCA spec. The integer moments are exact and
    order-free (any correct implementation produces identical ints), so they
    may be recomputed with whole-array numpy; the power iteration and the
    per-row projection folds are scalar python loops in the spec's order."""
    emb = _emb(sf_dir)
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(mat * 1_000_000.0 + 0.5).astype(np.int64)
    n, d = q.shape
    gram = q.T @ q
    sums = q.sum(axis=0)
    mean_q = [float(sums[i]) / float(n) for i in range(d)]
    cov = [[float(gram[i, j]) / float(n) - mean_q[i] * mean_q[j] for j in range(d)]
           for i in range(d)]
    import math

    v = [1.0 / math.sqrt(float(d))] * d
    for _ in range(30):
        w = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc += cov[i][j] * v[j]
            w.append(acc)
        norm_sq = 0.0
        for i in range(d):
            norm_sq += w[i] * w[i]
        norm = math.sqrt(norm_sq)
        if norm == 0.0:
            break
        v = [w[i] / norm for i in range(d)]
    k = max(range(d), key=lambda i: (abs(v[i]), -i))
    if v[k] < 0:
        v = [-x for x in v]
    rows = []
    ids = emb["vec_id"].to_numpy()
    qf = q.astype(np.float64)
    for r in range(n):
        acc = 0.0
        for i in range(d):
            acc += (float(qf[r, i]) - mean_q[i]) * v[i]
        # np.round, not builtin round: the two differ on rare half-way
        # scaled values and the engine rounds with numpy
        rows.append({"vec_id": np.int64(ids[r]), "pc1": float(np.round(acc, 4))})
    return pd.DataFrame(rows).sort_values("vec_id").reset_index(drop=True)


def bpe_merges_oracle(sf_dir: str, *, n_merges: int = 20) -> pd.DataFrame:
    """Scalar restatement of the BPE trainer spec: word histogram from a
    per-doc python loop, then per-round pair counting with the
    (-count, (left, right)) pick rule and in-place merges."""
    import re as _re

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    tok = _re.compile(r"[A-Za-z0-9_]+")
    counts: dict[str, int] = {}
    for t in docs["text"]:
        for w in tok.findall(t.lower()):
            counts[w] = counts.get(w, 0) + 1
    seqs = [(list(w), c) for w, c in sorted(counts.items())]
    rows = []
    for rank in range(1, n_merges + 1):
        pc: dict[tuple, int] = {}
        for sym, cnt in seqs:
            for i in range(len(sym) - 1):
                k = (sym[i], sym[i + 1])
                pc[k] = pc.get(k, 0) + cnt
        if not pc:
            break
        best_pair, best_cnt = None, None
        for k, v in pc.items():
            if best_cnt is None or v > best_cnt or (v == best_cnt and k < best_pair):
                best_pair, best_cnt = k, v
        left, right = best_pair
        rows.append({"rank": np.int64(rank), "left": left, "right": right,
                     "pair_count": np.int64(best_cnt)})
        new = left + right
        for sym, _ in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == left and sym[i + 1] == right:
                    sym[i : i + 2] = [new]
                else:
                    i += 1
    return pd.DataFrame(rows, columns=["rank", "left", "right", "pair_count"])


def semdedup_oracle(sf_dir: str, *, tau: float = 0.42) -> pd.DataFrame:
    """Scalar recomputation of SemDeDup: same seeded centroid training
    spec, per-row scalar-loop cluster argmax, then per-cluster nested
    pairwise loops in vec_id order — max cosine to any earlier same-cluster
    vector (NaN for the first), keep = 0 iff that max >= tau. Dimension
    folds run left-to-right like the engine's ordered fold, computed here
    with plain python loops instead of numpy array ops."""
    emb = _emb(sf_dir)
    cent = _centroids_oracle(emb, 16, seed=42)

    def scalar_cos(v, w):
        dot = 0.0
        na = 0.0
        nb = 0.0
        for i in range(len(v)):
            dot += v[i] * w[i]
            na += v[i] * v[i]
            nb += w[i] * w[i]
        return dot / np.sqrt(na * nb)

    clusters: dict[int, list[tuple[int, np.ndarray]]] = {}
    for r in emb.itertuples():
        v = np.asarray(r.embedding, np.float64)
        best_c, best_s = 0, -np.inf
        for ci, c in enumerate(cent):
            s = scalar_cos(v, np.asarray(c, np.float64))
            if s > best_s:
                best_c, best_s = ci, s
        clusters.setdefault(best_c, []).append((int(r.vec_id), v))
    rows = []
    for ci, members in clusters.items():
        members.sort(key=lambda m: m[0])
        for j, (vid, vj) in enumerate(members):
            prior = np.nan
            for i in range(j):
                s = scalar_cos(members[i][1], vj)
                if np.isnan(prior) or s > prior:
                    prior = s
            keep = 1 if (np.isnan(prior) or prior < tau) else 0
            rows.append(
                {
                    "vec_id": np.int64(vid),
                    "cluster": np.int64(ci),
                    "prior_cosine": np.round(prior, 6),
                    "keep": np.int64(keep),
                }
            )
    return pd.DataFrame(rows).sort_values("vec_id").reset_index(drop=True)


def kcore_oracle(sf_dir: str, *, k: int = 45) -> pd.DataFrame:
    """Naive k-core peel to fixpoint with python dict-of-sets adjacency —
    independent of the engine's exchange structure. Same trade graph as
    the engine (customer = custkey, supplier = 1_000_000 + suppkey,
    distinct undirected edges)."""
    import os

    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    lineitem = pq.read_table(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_orderkey", "l_suppkey"]
    ).to_pandas()
    m = lineitem.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    adj: dict[int, set[int]] = {}
    for c, s in zip(m["o_custkey"], m["l_suppkey"]):
        a, b = int(c), 1_000_000 + int(s)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        dead = [n for n, nbrs in adj.items() if len(nbrs) < k]
        if not dead:
            break
        for n in dead:
            for nb in adj[n]:
                adj[nb].discard(n)
            del adj[n]
    rows = [
        {"node_id": np.int64(n), "degree": np.int64(len(nbrs))}
        for n, nbrs in adj.items()
    ]
    out = pd.DataFrame(rows, columns=["node_id", "degree"])
    out["node_id"] = out["node_id"].astype("int64")
    out["degree"] = out["degree"].astype("int64")
    return out.sort_values("node_id").reset_index(drop=True)


def _kll_oracle_cap(h: int, n_levels: int) -> int:
    import math

    return max(2, math.ceil(128 * ((2.0 / 3.0) ** (n_levels - 1 - h))))


class _KLLOracle:
    """Standalone scalar mirror of the engine's deterministic KLL spec
    (pipelines/sketches.KLLSketch docstring); no engine imports."""

    def __init__(self):
        self.levels = [[]]
        self.coins = [0]

    def _compact(self):
        while True:
            nl = len(self.levels)
            target = None
            for h in range(nl):
                if len(self.levels[h]) > _kll_oracle_cap(h, nl):
                    target = h
                    break
            if target is None:
                return
            lv = sorted(self.levels[target])
            even = len(lv) - (len(lv) % 2)
            o = self.coins[target] % 2
            self.coins[target] += 1
            promoted = lv[o:even:2]
            self.levels[target] = lv[even:]
            if target + 1 == len(self.levels):
                self.levels.append([])
                self.coins.append(0)
            self.levels[target + 1].extend(promoted)

    def insert_sorted(self, values):
        for v in values:
            self.levels[0].append(int(v))
            if len(self.levels[0]) > _kll_oracle_cap(0, len(self.levels)):
                self._compact()

    def merge(self, other):
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.coins.append(0)
        for h in range(len(other.levels)):
            self.levels[h].extend(other.levels[h])
            self.coins[h] += other.coins[h]
        self._compact()


def kll_oracle(sf_dir: str) -> pd.DataFrame:
    """Naive recomputation of kll_quantiles: same partition hash (pandas'
    fixed-key siphash), same feed order, same merge order, scalar loops."""
    import os

    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    ).to_pandas()
    cents = np.floor(ev["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    eid = ev["event_id"].to_numpy(np.int64)
    part = (
        pd.util.hash_pandas_object(ev["event_id"], index=False).to_numpy()
        % np.uint64(8)
    ).astype(np.int64)

    merged = _KLLOracle()
    for p in sorted(set(part.tolist())):
        m = part == p
        order = np.lexsort((eid[m], cents[m]))
        sk = _KLLOracle()
        sk.insert_sorted(cents[m][order])
        merged.merge(sk)

    n = len(cents)
    svals = np.sort(cents)
    pairs = sorted(
        (v, 1 << h) for h, lv in enumerate(merged.levels) for v in lv
    )
    total = sum(w for _, w in pairs)
    assert total == n
    rows = []
    for q in (1, 10, 25, 50, 75, 90, 99):
        cum = 0
        est = pairs[-1][0]
        for v, w in pairs:
            cum += w
            if 100 * cum >= q * total:
                est = v
                break
        target = -(-q * n // 100)
        exact = int(svals[target - 1])
        rank_est = int(np.searchsorted(svals, est, side="right"))
        err = round(abs(rank_est - target) / n, 6)
        rows.append(
            {"q100": np.int64(q), "est": np.int64(est), "exact": np.int64(exact),
             "rank_err_frac": err, "n": np.int64(n)}
        )
    return pd.DataFrame(rows)


def bpe_encode_oracle(sf_dir: str, *, n_merges: int = 20) -> pd.DataFrame:
    """Scalar tokenizer application: retrain the merge table with the
    trainer oracle's loops, then encode every doc word-by-word."""
    import re as _re

    merges_df = bpe_merges_oracle(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tok = _re.compile(r"[A-Za-z0-9_]+")
    cache: dict[str, int] = {}

    def enc(w: str) -> int:
        if w not in cache:
            sym = list(w)
            for left, right in merges:
                i = 0
                while i < len(sym) - 1:
                    if sym[i] == left and sym[i + 1] == right:
                        sym[i : i + 2] = [left + right]
                    else:
                        i += 1
            cache[w] = len(sym)
        return cache[w]

    rows = []
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = tok.findall(t.lower())
        nsym = sum(enc(w) for w in ws)
        ratio = nsym / len(ws) if ws else 0.0
        rows.append((np.int64(did), np.int64(len(ws)), np.int64(nsym), float(ratio)))
    return pd.DataFrame(rows, columns=["doc_id", "n_words", "n_symbols", "ratio"]).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def kcenter_oracle(sf_dir: str, *, k: int = 12) -> pd.DataFrame:
    """Scalar Gonzalez farthest-point traversal: same dim-sequential float64
    fold, same center order, same (max dist, min id) tie rule."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = [int(x) for x in emb["vec_id"]]
    vecs = [[float(np.float32(v)) for v in e] for e in emb["embedding"]]
    if not ids:
        return pd.DataFrame(
            {c: pd.Series([], dtype=t) for c, t in
             (("round", "int64"), ("vec_id", "int64"), ("dist", "float64"))}
        )
    order = sorted(range(len(ids)), key=lambda i: ids[i])
    seed = order[0]
    chosen = [(0, ids[seed], 0.0)]
    centers = [vecs[seed]]
    taken = {ids[seed]}
    for rnd in range(1, k):
        best_d, best_id, best_i = None, None, None
        for i in order:
            if ids[i] in taken:
                continue
            md = None
            for c in centers:
                acc = 0.0
                for dim in range(len(c)):
                    diff = vecs[i][dim] - c[dim]
                    acc = acc + diff * diff
                md = acc if md is None else min(md, acc)
            if best_d is None or md > best_d or (md == best_d and ids[i] < best_id):
                best_d, best_id, best_i = md, ids[i], i
        chosen.append((rnd, best_id, float(best_d)))
        centers.append(vecs[best_i])
        taken.add(best_id)
    return pd.DataFrame(chosen, columns=["round", "vec_id", "dist"]).astype(
        {"round": "int64", "vec_id": "int64", "dist": "float64"}
    )


def lsh_calibration_oracle(sf_dir: str, *, num_perm: int = 64, bands: int = 16,
                           bucket_cap: int = 64) -> pd.DataFrame:
    """Naive calibration recomputation: the minhash_pairs_oracle candidate
    enumeration, per-pair signature agreement via the scalar
    _oph_signature, exact inter/union, est//8 binning."""
    docs = _docs(sf_dir)
    rows_per_band = num_perm // bands
    buckets: dict[tuple[int, np.uint64], list[int]] = {}
    hash_sets: dict[int, np.ndarray] = {}
    sigs: dict[int, np.ndarray] = {}
    for r in docs.itertuples():
        h = _shingle_hashes(r.text)
        hash_sets[r.doc_id] = np.unique(h)
        sig = _oph_signature(h, num_perm)
        sigs[r.doc_id] = sig
        with np.errstate(over="ignore"):
            for band in range(bands):
                acc = np.uint64(band + 1)
                for j in range(rows_per_band):
                    acc = (acc * _FNV) ^ sig[band * rows_per_band + j]
                key = (band, acc & np.uint64(0x7FFFFFFFFFFFFFFF))
                buckets.setdefault(key, []).append(r.doc_id)
    cand = set()
    for ids in buckets.values():
        ids = sorted(set(ids))[:bucket_cap]
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                cand.add((ids[i], ids[j]))
    agg: dict[int, list[int]] = {}
    for da, db in sorted(cand):
        sa, sb = hash_sets[da], hash_sets[db]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        uni = len(sa) + len(sb) - inter
        est = int((sigs[da] == sigs[db]).sum())
        b = est // 8
        a = agg.setdefault(b, [0, 0, 0, 0])
        a[0] += 1
        a[1] += est
        a[2] += inter
        a[3] += uni
    out = pd.DataFrame(
        [
            {"bin": b, "n_pairs": v[0], "sum_match": v[1],
             "sum_inter": v[2], "sum_union": v[3]}
            for b, v in sorted(agg.items())
        ],
        columns=["bin", "n_pairs", "sum_match", "sum_inter", "sum_union"],
    )
    return out.astype("int64") if len(out) else pd.DataFrame(
        {c: pd.Series([], dtype="int64")
         for c in ("bin", "n_pairs", "sum_match", "sum_inter", "sum_union")}
    )
