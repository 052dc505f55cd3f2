"""Similarity search over an embedding column (list<float>).

- ``knn_bruteforce`` — exact cosine top-k: the query matrix is broadcast once
  (``ray.put``), every batch computes a numpy matmul against it, per-batch
  partial top-k rows are merged on the driver. This is the baseline that
  scales linearly with the corpus and never shuffles the corpus.
- ``knn_ivf`` — the scale path: k-means-style coarse centroids (trained on a
  sample), every vector assigned to its nearest centroid cell
  (vectorized), probes restricted to the ``nprobe`` nearest cells — the
  standard IVF-Flat layout expressed as filter + brute force over a
  hash-partitioned subset.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _read_emb(sf_dir: str):
    return rd.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    col = t["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = np.asarray(col.flatten(), dtype=np.float32)
    offs = np.asarray(col.offsets)
    offs = offs - offs[0]
    dim = offs[1] - offs[0]
    mat = flat.reshape(len(offs) - 1, dim)
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    return ids, mat


def knn_bruteforce(sf_dir: str, *, query_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k neighbors of ``query_id`` (excluded from results)."""
    ds = _read_emb(sf_dir)
    # fetch the query vector (tiny filtered pull)
    qrow = None
    for b in ds.iter_batches(batch_format="pyarrow"):
        ids, mat = _batch_matrix(b)
        hit = np.flatnonzero(ids == query_id)
        if len(hit):
            qrow = mat[hit[0]]
            break
    assert qrow is not None, f"query vec_id {query_id} not found"
    q_ref = ray.put(qrow.astype(np.float64))

    def score(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        m64 = mat.astype(np.float64)  # float64 math → parity with SQL oracle
        qv = ray.get(q_ref)
        qn = max(np.linalg.norm(qv), 1e-30)
        norms = np.linalg.norm(m64, axis=1)
        sims = (m64 @ qv) / (np.maximum(norms, 1e-30) * qn)
        order = np.argsort(-sims, kind="stable")[: k + 1]
        return pa.table(
            {
                "vec_id": pa.array(ids[order], pa.int64()),
                "cosine": pa.array(np.round(sims[order], 6)),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts[parts["vec_id"] != query_id]
    parts = parts.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable")
    return parts.head(k).reset_index(drop=True)


def knn_ivf(sf_dir: str, *, query_id: int = 0, k: int = 10, n_cells: int = 16, nprobe: int = 4):
    """IVF-bucketed ANN: centroids from a deterministic sample, probe the
    nprobe nearest cells only. Returns (neighbors_df, recall_vs_bruteforce)."""
    ds = _read_emb(sf_dir)
    sample = ds.limit(512).to_pandas()
    mat0 = np.stack(sample["embedding"].to_numpy()).astype(np.float32)
    mat0 /= np.maximum(np.linalg.norm(mat0, axis=1, keepdims=True), 1e-30)
    rng = np.random.RandomState(42)
    cent = mat0[rng.choice(len(mat0), size=min(n_cells, len(mat0)), replace=False)]
    # a few Lloyd iterations on the sample
    for _ in range(5):
        assign = np.argmax(mat0 @ cent.T, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = mat0[m].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-30)
    cent_ref = ray.put(cent)

    # query
    bf = knn_bruteforce(sf_dir, query_id=query_id, k=k)
    qrow = None
    for b in ds.iter_batches(batch_format="pyarrow"):
        ids, mat = _batch_matrix(b)
        hit = np.flatnonzero(ids == query_id)
        if len(hit):
            qrow = mat[hit[0]]
            break
    q = qrow / max(np.linalg.norm(qrow), 1e-30)
    qc = np.argsort(-(cent @ q))[:nprobe]
    probe_cells = set(int(c) for c in qc)
    q_ref = ray.put(q)

    def score(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        c = ray.get(cent_ref)
        qv = ray.get(q_ref)
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
        unit = mat / norms[:, None]
        cells = np.argmax(unit @ c.T, axis=1)
        mask = np.isin(cells, list(probe_cells))
        sims = (unit[mask] @ qv)
        sel = ids[mask]
        order = np.argsort(-sims, kind="stable")[: k + 1]
        return pa.table(
            {
                "vec_id": pa.array(sel[order], pa.int64()),
                "cosine": pa.array(np.round(sims[order].astype(np.float64), 6)),
            }
        )

    parts = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    parts = parts[parts["vec_id"] != query_id]
    parts = parts.sort_values(["cosine", "vec_id"], ascending=[False, True], kind="stable").head(k)
    recall = len(set(parts["vec_id"]) & set(bf["vec_id"])) / max(1, k)
    return parts.reset_index(drop=True), recall


def embedding_cosine_dedup(sf_dir: str, *, threshold: float = 0.95) -> pd.DataFrame:
    """Near-dup vector pairs (cosine ≥ threshold) via all-pairs within
    IVF cells — each cell's members compared locally, never global O(n²)."""
    ds = _read_emb(sf_dir)
    sample = ds.limit(512).to_pandas()
    mat0 = np.stack(sample["embedding"].to_numpy()).astype(np.float32)
    mat0 /= np.maximum(np.linalg.norm(mat0, axis=1, keepdims=True), 1e-30)
    rng = np.random.RandomState(7)
    cent = mat0[rng.choice(len(mat0), size=min(32, len(mat0)), replace=False)]
    cent_ref = ray.put(cent)

    def assign(t: pa.Table) -> pa.Table:
        ids, mat = _batch_matrix(t)
        c = ray.get(cent_ref)
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-30)
        unit = (mat / norms[:, None]).astype(np.float32)
        cells = np.argmax(unit @ c.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(cells),
                "unit": pa.array(list(unit.astype(np.float64)), pa.list_(pa.float64())),
            }
        )

    from ..ops import partitioned_map

    def pairs(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_a, out_b, out_s = [], [], []
        for _c, g in df.groupby("cell", sort=False):
            ids = g["vec_id"].to_numpy()
            m = np.stack(g["unit"].to_numpy())
            sims = m @ m.T
            iu = np.triu_indices(len(ids), k=1)
            hit = sims[iu] >= threshold
            out_a.extend(ids[iu[0][hit]])
            out_b.extend(ids[iu[1][hit]])
            out_s.extend(np.round(sims[iu][hit], 6))
        return pa.table(
            {
                "vec_a": pa.array(np.array(out_a, dtype=np.int64)),
                "vec_b": pa.array(np.array(out_b, dtype=np.int64)),
                "cosine": pa.array(np.array(out_s, dtype=np.float64)),
            }
        )

    out = partitioned_map(ds.map_batches(assign, batch_format="pyarrow"), ["cell"], 8, pairs)
    df = out.to_pandas()
    if df.empty:
        df = pd.DataFrame(
            {
                "vec_a": pd.Series([], dtype="int64"),
                "vec_b": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )
    return df.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
