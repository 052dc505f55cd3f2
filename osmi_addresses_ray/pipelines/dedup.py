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
        # one hash_array call per sub-chunk (not per doc) + segmented min via
        # reduceat; sub-chunks bound the (num_perm × shingles) work matrix
        sh_lists = [_shingles(t) for t in df["text"]]
        counts = np.array([len(s) for s in sh_lists], dtype=np.int64)
        sig_parts: list[np.ndarray] = []
        mask = np.uint64(0x1FFFFFFFFFFFFFFF)
        i = 0
        while i < len(sh_lists):
            j, tot = i, 0
            while j < len(sh_lists) and tot + counts[j] <= 200_000:
                tot += counts[j]
                j += 1
            j = max(j, i + 1)
            chunk = sh_lists[i:j]
            h = pd.util.hash_array(np.concatenate(chunk)).astype(np.uint64)
            vals = (self.a[:, None] * h[None, :] + self.b[:, None]) & mask
            offs = np.concatenate(([0], np.cumsum(counts[i:j])))[:-1]
            sig_parts.append(np.minimum.reduceat(vals, offs, axis=1).T)
            i = j
        sigs = np.concatenate(sig_parts) if sig_parts else np.empty((0, self.num_perm), np.uint64)
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
        if not len(df):
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype="int64"), "doc_id": pd.Series([], dtype="int64")}
            )
        # FNV-fold each band vectorized over (docs, bands); identical values
        # to the former per-scalar loop (uint64 wraparound semantics)
        fnv = np.uint64(1099511628211)
        S = np.stack([np.asarray(s, np.uint64) for s in df["sig"]]).reshape(
            len(df), bands, rows_per_band
        )
        acc = np.broadcast_to(
            np.arange(1, bands + 1, dtype=np.uint64), (len(df), bands)
        ).copy()
        for r in range(rows_per_band):
            acc = (acc * fnv) ^ S[:, :, r]
        return pd.DataFrame(
            {
                "bucket": (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).ravel(),
                "doc_id": np.repeat(df["doc_id"].to_numpy(), bands),
            }
        )

    buckets = sigged.map_batches(explode, batch_format="pandas")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        # singleton buckets dominate — drop them vectorized before the
        # per-bucket combination loop touches only true collision groups
        df = df.drop_duplicates(["bucket", "doc_id"])
        sizes = df["bucket"].map(df["bucket"].value_counts())
        df = df[sizes >= 2]
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

    # verify with true shingle Jaccard. Only candidate docs reach the driver
    # (distributed semi-join filter) — pulling the full corpus here would be
    # a driver OOM at 100 TB scale.
    cand_ids = np.array(sorted(set(cand_df["doc_a"]) | set(cand_df["doc_b"])), dtype=np.int64)

    def only_cands(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["doc_id"].isin(cand_ids)]

    texts = (
        _read_docs(sf_dir)
        .map_batches(only_cands, batch_format="pandas")
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    sh = {d: set(_shingles(texts.loc[d])) for d in cand_ids}
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
        tok_lists = [_TOKEN.findall(t.lower()) for t in df["text"]]
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        nz = np.flatnonzero(counts)
        if len(nz):
            # hash every token in the batch at once, then segmented bit votes
            # per doc via add.reduceat (identical values to the per-doc loop)
            all_toks = np.concatenate([np.array(tok_lists[i], dtype=object) for i in nz])
            h = pd.util.hash_array(all_toks).astype(np.uint64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int32
            )
            offs = np.concatenate(([0], np.cumsum(counts[nz])))[:-1]
            sums = np.add.reduceat(bits, offs, axis=0)  # (n_nz, 64)
            votes = sums * 2 - counts[nz][:, None]
            out_h[nz] = np.packbits(
                (votes > 0).astype(np.uint8), axis=1, bitorder="little"
            ).view(np.uint64)[:, 0]
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "simhash": out_h})

    df = ds.map_batches(f, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def ngram_jaccard_dedup(sf_dir: str, *, threshold: float = 0.8):
    """Docs to KEEP after removing near-duplicates (Jaccard ≥ threshold,
    higher doc_id dropped). Uses the LSH candidates, then exact verify."""
    pairs = minhash_lsh_pairs(sf_dir, threshold=threshold)
    drop = np.array(sorted(set(pairs["doc_b"])), dtype=np.int64) if len(pairs) else np.empty(0, np.int64)
    # anti-join executes distributed; only the surviving ids (no text
    # payload) reach the driver
    ids = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    keep = ids.map_batches(
        lambda df: df[~df["doc_id"].isin(drop)], batch_format="pandas"
    ).to_pandas()
    return keep.sort_values("doc_id").reset_index(drop=True)
