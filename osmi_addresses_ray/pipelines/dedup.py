"""Deduplication operators for large-scale training-data pipelines.

All follow the sketch-then-shuffle shape: a vectorized ``map_batches`` stage
computes per-row signatures, then ONE explicit groupby moves only the
signature rows (never the full payload twice):

- ``exact_dedup_docs`` — content hash → hash-partition → min(doc_id) per hash.
- ``minhash_lsh_pairs`` — shingle → minhash (k permutations) → band → bucket
  groupby → candidate pairs verified by true Jaccard (the standard
  MinHash+LSH pipeline).
- ``simhash_buckets`` — 64-bit simhash over token hashes; near-dups = equal
  values on rotated prefixes (here: exact-simhash groups, a deterministic
  subset check).
- ``ngram_jaccard_pairs`` — exact n-gram-set Jaccard over LSH candidates.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_TOKEN = re.compile(r"[A-Za-z0-9_]+")


def _read_docs(sf_dir: str):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])


def _hash64(strs: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(strs, index=False).to_numpy()


def exact_dedup_docs(sf_dir: str):
    """Keep min(doc_id) per distinct text. Oracle-SQL-checkable."""
    ds = _read_docs(sf_dir)

    def sig(df: pd.DataFrame) -> pd.DataFrame:
        df["h"] = _hash64(df["text"])
        return df[["doc_id", "h", "text"]]

    from ..ops import partitioned_map

    def keep_first(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(["h", "doc_id"]).drop_duplicates("h", keep="first")
        return pa.Table.from_pandas(df[["doc_id", "text"]], preserve_index=False)

    out = partitioned_map(ds.map_batches(sig, batch_format="pandas"), ["h"], 8, keep_first)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def _shingles(text: str, k: int = 5) -> np.ndarray:
    toks = _TOKEN.findall(text.lower())
    if len(toks) < k:
        return np.array([" ".join(toks)]) if toks else np.array(["∅"])
    return np.array([" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)])


class MinHasher:
    """Actor-pool stage: k universal-hash permutations compiled once."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, 2**61 - 1, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, 2**61 - 1, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text)
        h = pd.util.hash_array(sh).astype(np.uint64)
        # (num_perm, n_shingles) universal hashing, min over shingles
        vals = (np.outer(self.a, h) + self.b[:, None]) & np.uint64(0x1FFFFFFFFFFFFFFF)
        return vals.min(axis=1)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in df["text"]])
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        out["sig"] = list(sigs)
        return out


def minhash_lsh_pairs(sf_dir: str, *, num_perm: int = 64, bands: int = 16, threshold: float = 0.5):
    """Near-duplicate candidate pairs with verified Jaccard ≥ threshold.

    shingle→minhash per batch (actor pool) → explode to (band, band_hash,
    doc_id) → groupby bucket → pairs → verify true shingle Jaccard.
    """
    ds = _read_docs(sf_dir)
    rows_per_band = num_perm // bands

    docs_pdf = None  # verification side, loaded lazily per worker via broadcast

    sigged = ds.map_batches(MinHasher, batch_format="pandas", concurrency=(1, 4),
                            fn_constructor_args=(num_perm,))

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        buckets, doc_ids = [], []
        fnv = np.uint64(1099511628211)
        for doc_id, sig in zip(df["doc_id"], df["sig"]):
            s = np.asarray(sig, dtype=np.uint64).reshape(bands, rows_per_band)
            for b in range(bands):
                acc = np.uint64(b + 1)
                for v in s[b]:
                    acc = (acc * fnv) ^ np.uint64(v)
                buckets.append(int(acc & np.uint64(0x7FFFFFFFFFFFFFFF)))
                doc_ids.append(doc_id)
        return pd.DataFrame({"bucket": buckets, "doc_id": doc_ids})

    buckets = sigged.map_batches(explode, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _b, g in df.groupby("bucket", sort=False):
            ids = sorted(set(g["doc_id"]))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out.append((ids[i], ids[j]))
        return pd.DataFrame(out, columns=["doc_a", "doc_b"]) if out else pd.DataFrame(
            {"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64")}
        )

    from ..ops import partitioned_map

    cand = partitioned_map(
        buckets, ["bucket"], 8, lambda t: pa.Table.from_pandas(pairs(t.to_pandas()), preserve_index=False)
    )
    cand_df = cand.to_pandas().drop_duplicates().reset_index(drop=True)
    if cand_df.empty:
        return pd.DataFrame({"doc_a": pd.Series([], dtype="int64"), "doc_b": pd.Series([], dtype="int64"), "jaccard": pd.Series([], dtype="float64")})

    # verify with true shingle Jaccard (small candidate set by construction)
    texts = _read_docs(sf_dir).to_pandas().set_index("doc_id")["text"]
    sh = {d: set(_shingles(texts.loc[d])) for d in set(cand_df["doc_a"]) | set(cand_df["doc_b"])}
    jac = [
        len(sh[a] & sh[b]) / max(1, len(sh[a] | sh[b]))
        for a, b in zip(cand_df["doc_a"], cand_df["doc_b"])
    ]
    cand_df["jaccard"] = np.round(jac, 6)
    out = cand_df[cand_df["jaccard"] >= threshold]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def simhash_docs(sf_dir: str):
    """64-bit simhash per doc (token-hash bit voting), vectorized per batch."""
    ds = _read_docs(sf_dir)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        out_h = np.zeros(len(df), dtype=np.uint64)
        for i, text in enumerate(df["text"]):
            toks = _TOKEN.findall(text.lower())
            if not toks:
                continue
            h = pd.util.hash_array(np.array(toks, dtype=object)).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
            votes = bits.sum(axis=0) * 2 - len(h)
            out_h[i] = np.packbits((votes > 0).astype(np.uint8), bitorder="little").view(
                np.uint64
            )[0]
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "simhash": out_h})

    df = ds.map_batches(f, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def ngram_jaccard_dedup(sf_dir: str, *, threshold: float = 0.8):
    """Docs to KEEP after removing near-duplicates (Jaccard ≥ threshold,
    higher doc_id dropped). Uses the LSH candidates, then exact verify."""
    pairs = minhash_lsh_pairs(sf_dir, threshold=threshold)
    drop = set(pairs["doc_b"]) if len(pairs) else set()
    docs = _read_docs(sf_dir).to_pandas()
    keep = docs[~docs["doc_id"].isin(drop)][["doc_id"]]
    return keep.sort_values("doc_id").reset_index(drop=True)
