"""Deduplication operators for large-scale training-data pipelines.

All follow the sketch-then-shuffle shape: a vectorized ``map_batches`` stage
computes per-row signatures, then explicit exchanges move only what each step
needs (signatures, ids, shingle-hash sets) — the full text payload crosses an
exchange at most once, and the driver only ever sees final results:

- ``exact_dedup_docs`` — content hash → hash-partition (h, doc_id) ONLY →
  min(doc_id) per hash → winners joined back to the text with a native
  hash join (no text payload through the dedup exchange, no driver id set).
- ``minhash_lsh_pairs`` — shingle → minhash (k permutations) → band → bucket
  groupby → candidate pairs → DISTRIBUTED verification: pair memberships are
  co-grouped with the docs table on doc_id to attach per-doc shingle-hash
  sets, then a second exchange on the pair key computes true Jaccard inside
  workers. The driver receives only verified pairs.
- ``simhash_docs`` — 64-bit simhash over token hashes (segmented bit votes).
- ``ngram_jaccard_dedup`` — exact n-gram-set Jaccard over LSH candidates;
  the anti-join that drops losers runs as a distributed co-group.

Scale notes (100 TB): bucket sizes are capped (``_BUCKET_CAP``) so a
degenerate band value cannot create O(n²) pairs — the standard LSH guard;
hub docs appearing in many pairs replicate their shingle-hash set once per
pair through the verify exchange, which the cap bounds at
``cap²/2 × bands`` pairs per bucket.

Bandwidth notes (single node): the two kernels in the hot path are written
to stay OFF the memory bus — tokenize+hash is a byte-table sweep over the
Arrow string buffer with zero per-token allocation
(``_token_hashes_batch``), and the minhash is one-permutation hashing
(``MinHasher``): a single whole-array mix + radix argsort per batch instead
of a (k × shingles) universal-hash work matrix. The earlier object-array
and k-permutation formulations were allocator/bandwidth-bound and flattened
2→8 CPU scaling on one socket.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_TOKEN = re.compile(r"[A-Za-z0-9_]+")
_BUCKET_CAP = 64  # default max docs per LSH bucket considered for pair generation


@ray.remote(num_cpus=0)
class _TruncationCounter:
    """Cluster-wide no-silent-caps ledger: workers report every LSH bucket
    whose membership exceeded the cap; callers read the total to audit the
    recall impact (raise ``bucket_cap`` and re-run to measure)."""

    def __init__(self):
        self.capped_buckets = 0
        self.dropped_members = 0

    def add(self, buckets: int, members: int):
        self.capped_buckets += buckets
        self.dropped_members += members

    def snapshot(self):
        return {"capped_buckets": self.capped_buckets, "dropped_members": self.dropped_members}


def _truncation_counter():
    return _TruncationCounter.options(
        name="lsh_truncation_counter", get_if_exists=True, lifetime="detached"
    ).remote()


def lsh_truncation_stats() -> dict:
    """Totals of capped LSH buckets / dropped members since session start."""
    return ray.get(_truncation_counter().snapshot.remote())
# per-worker-process stage state (compile-once without an actor pool)
_WORKER_CACHE: dict = {}

DOCS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
_MEMB_SCHEMA = pa.schema(
    [
        ("key_doc", pa.int64()),
        ("doc_a", pa.int64()),
        ("doc_b", pa.int64()),
        ("side", pa.int8()),
    ]
)


def _read_docs(sf_dir: str):
    from ..ops import read_parquet_sized

    return read_parquet_sized(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )


def _hash64(strs: pd.Series) -> np.ndarray:
    return pd.util.hash_pandas_object(strs, index=False).to_numpy()


def _hash64_b(strs: pd.Series) -> np.ndarray:
    """Second, independent 64-bit siphash (different 16-byte key): the exact
    dedup keys winners on the PAIR (h, h2) = a 128-bit signature. A single
    64-bit key collides ~30 times at 10^12 docs (birthday bound) and would
    silently merge distinct texts; 128 bits pushes that to ~1e-15."""
    return pd.util.hash_pandas_object(
        strs, index=False, hash_key="graft-dedup-2nd!"
    ).to_numpy()


def _sig_frame(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, h, h2) 128-bit signature rows — shared by the one-shot and
    incremental dedup paths (two independent siphash keys; collision odds
    across both ~2^-128 per pair)."""
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].to_numpy(),
            "h": _hash64(df["text"]),
            "h2": _hash64_b(df["text"]),
        }
    )


def _keep_ids_semi_join(ds, winners):
    """Adaptive winner semi-join shared by both dedup paths: a small winner
    set broadcasts as a sorted id array (one ray.put, searchsorted filter
    per batch — no shuffle of the text payload); past the broadcast budget,
    the distributed hash join ships each surviving text exactly once."""
    n_win = winners.count()
    if n_win <= 5_000_000:
        import ray as _ray

        wdf = winners.to_pandas()  # column-less when every winner block is empty
        ids = (
            np.sort(wdf["doc_id"].to_numpy())
            if "doc_id" in wdf.columns
            else np.array([], np.int64)
        )
        ref = _ray.put(ids)

        def semi(t: pa.Table) -> pa.Table:
            import ray as __ray

            keep_ids = __ray.get(ref)
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keep_ids, d).clip(0, max(len(keep_ids) - 1, 0))
            mask = keep_ids[pos] == d if len(keep_ids) else np.zeros(len(d), bool)
            return t.filter(pa.array(mask))

        return ds.map_batches(semi, batch_format="pyarrow")
    from ..ops import fit_hash_shuffle, join_parts_for

    # winners >5M here; the doc side is a constant factor larger (its dup
    # ratio), so sizing off the winner count keeps partitions in range
    # without re-executing the doc-side plan for a count
    return ds.join(
        winners, join_type="inner", on=("doc_id",),
        **fit_hash_shuffle(join_parts_for(n_win), est_rows=n_win, bytes_per_row=2048),
    )


def exact_dedup_docs(sf_dir: str):
    """Keep min(doc_id) per distinct text. Oracle-SQL-checkable.

    The dedup exchange moves (h, doc_id) only; the winning texts never leave
    their original blocks until the final inner join ships each exactly once.
    """
    ds = _read_docs(sf_dir)

    from ..ops import partitioned_map

    def keep_first(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .sort_values(["h", "h2", "doc_id"])
            .drop_duplicates(["h", "h2"], keep="first")
        )
        return pa.Table.from_pandas(df[["doc_id"]], preserve_index=False)

    winners = partitioned_map(
        ds.map_batches(_sig_frame, batch_format="pandas"), ["h"], 8, keep_first
    ).materialize()
    out = _keep_ids_semi_join(ds, winners)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


_FNV_BASIS = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(1099511628211)
_SHINGLE_K = 5
_MAX_TOKEN_BYTES = 64  # only the first 64 bytes of a token feed its hash

# byte classifier / ASCII-lowercase tables for the zero-allocation tokenizer
_IS_TOKEN_BYTE = np.zeros(256, dtype=bool)
for _c in b"0123456789_":
    _IS_TOKEN_BYTE[_c] = True
for _c in range(ord("a"), ord("z") + 1):
    _IS_TOKEN_BYTE[_c] = True
    _IS_TOKEN_BYTE[_c - 32] = True
_LOWER = np.arange(256, dtype=np.uint8)
_LOWER[ord("A") : ord("Z") + 1] += 32


def _token_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated 64-bit token hashes + per-doc token counts — one pass
    over the batch's raw UTF-8 bytes, zero per-token allocation.

    Spec (mirrored by oracle/llm_ops._shingle_hashes): a token is a maximal
    run of ASCII ``[0-9A-Za-z_]`` bytes in the doc's UTF-8 encoding; its
    hash is FNV-1a-64 over the run's bytes with A-Z lowered, capped at the
    first ``_MAX_TOKEN_BYTES`` bytes. The regex/``hash_pandas`` formulation
    this replaces allocated a Python string per token and measured
    ~300 µs/doc with only 1.45× scaling 2→8 CPUs (allocator/bandwidth
    bound); byte sweeps are sequential table lookups.
    """
    arr = pa.array(texts, pa.string()) if not isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pa.compute.fill_null(arr, "")
    off_dtype = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    buffers = arr.buffers()
    str_offs = np.frombuffer(
        buffers[1],
        dtype=off_dtype,
        count=len(arr) + 1,
        offset=arr.offset * np.dtype(off_dtype).itemsize,
    ).astype(np.int64)
    data = (
        np.frombuffer(buffers[2], dtype=np.uint8, count=int(str_offs[-1]))
        if buffers[2] is not None and str_offs[-1] > str_offs[0]
        else np.empty(0, np.uint8)
    )
    lo = int(str_offs[0])
    str_offs = str_offs - lo
    b = data[lo : lo + int(str_offs[-1])]
    n_docs = len(arr)
    if not len(b):
        return np.empty(0, np.uint64), np.zeros(n_docs, np.int64)
    m = _IS_TOKEN_BYTE[b]
    # a token starts where a token byte follows a non-token byte — with doc
    # boundaries forcing a break so runs never span documents
    prev = np.empty_like(m)
    prev[0] = False
    prev[1:] = m[:-1]
    doc_starts = str_offs[:-1][str_offs[:-1] < len(b)]
    prev[doc_starts] = False
    nxt = np.empty_like(m)
    nxt[-1] = False
    nxt[:-1] = m[1:]
    inner_ends = str_offs[1:][(str_offs[1:] < len(b)) & (str_offs[1:] > 0)]
    nxt[inner_ends - 1] = False
    starts = np.flatnonzero(m & ~prev)
    ends = np.flatnonzero(m & ~nxt) + 1
    lowered = _LOWER[b]
    h = np.full(len(starts), _FNV_BASIS)
    cap = np.minimum(ends, starts + _MAX_TOKEN_BYTES)
    for t in range(int((cap - starts).max()) if len(starts) else 0):
        idx = starts + t
        alive = idx < cap
        if not alive.any():
            break
        safe = np.minimum(idx, len(b) - 1)
        byte = lowered[safe].astype(np.uint64)
        h = np.where(alive, (h ^ byte) * _FNV_PRIME, h)
    # token → doc assignment, then per-doc counts
    doc_of = np.searchsorted(str_offs, starts, side="right") - 1
    counts = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    return h, counts


def _shingle_hashes_batch(texts, k: int = _SHINGLE_K) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated 64-bit shingle hashes + per-doc shingle counts.

    Chunks the doc list so each inner call's uint64 temporaries (the
    per-byte-position and per-shingle-position sweeps below iterate over the
    SAME arrays 5–64 times) stay LLC-resident instead of streaming DRAM:
    measured 1.7× faster single-threaded at 50k synthetic docs, and it keeps
    the stage from saturating socket bandwidth under 8 concurrent workers
    (the same chunking lesson as the earlier minhash work matrix).
    """
    n = len(texts)
    if n <= 1024:
        return _shingle_hashes_chunk(texts, k)
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        sizes = pa.compute.binary_length(texts).to_numpy(zero_copy_only=False)
        def slicer(i, j):
            return texts.slice(i, j - i)
    else:
        sizes = np.fromiter((len(t) for t in texts), np.int64, n)
        def slicer(i, j):
            return texts[i:j]
    cum = np.cumsum(sizes, dtype=np.int64)
    hs, cs, i = [], [], 0
    while i < n:
        j = int(np.searchsorted(cum, (cum[i - 1] if i else 0) + 512 * 1024))
        j = max(i + 1, min(j + 1, i + 1024, n))
        h, c = _shingle_hashes_chunk(slicer(i, j), k)
        hs.append(h)
        cs.append(c)
        i = j
    return np.concatenate(hs), np.concatenate(cs)


def _shingle_hashes_chunk(texts, k: int = _SHINGLE_K) -> tuple[np.ndarray, np.ndarray]:
    """Shingle hash = FNV fold over up to ``k`` CONSECUTIVE TOKEN HASHES
    (k masked vector ops over the byte-sweep token hashes) — no per-shingle
    or per-token string construction. A doc with n<k tokens yields one
    shingle folding its n tokens; an empty doc yields the bare FNV basis.
    The oracle (oracle/llm_ops.py) mirrors this spec loop-wise.
    """
    th, n = _token_hashes_batch(texts)
    offs = np.concatenate(([0], np.cumsum(n)))
    total_tok = int(offs[-1])
    s = np.maximum(n - k + 1, 1)  # shingle count per doc (empty doc → 1)
    soffs = np.concatenate(([0], np.cumsum(s)))
    total_s = int(soffs[-1])
    # global token index of each shingle's first token
    p = np.repeat(offs[:-1], s) + (np.arange(total_s) - np.repeat(soffs[:-1], s))
    end = np.repeat(offs[1:], s)
    acc = np.full(total_s, _FNV_BASIS)
    for j in range(k):
        idx = p + j
        m = idx < end
        safe = np.minimum(idx, max(total_tok - 1, 0))
        if total_tok:
            acc = np.where(m, (acc * _FNV_PRIME) ^ th[safe], acc)
    return acc, s


def _shingle_hash_set(text: str) -> np.ndarray:
    """Sorted unique 64-bit shingle hashes (the universe minhash runs over)."""
    h, _ = _shingle_hashes_batch([text])
    return np.unique(h)


_OPH_EMPTY = np.uint64(0xFFFFFFFFFFFFFFFF)  # sentinel; real values are < 2^58
_OPH_VAL_MASK = np.uint64((1 << 58) - 1)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele/Lea/Flood, public domain) —
    decorrelates the shingle-hash bits before the OPH bin/value split."""
    with np.errstate(over="ignore"):
        z = x + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


class MinHasher:
    """One-permutation-hashing minhash (Li/Owen/Zhang 2012) with nearest-
    right rotation densification (Shrivastava/Li 2014).

    Spec (mirrored loop-wise by ``oracle/llm_ops.py``):
      mixed = splitmix64(shingle_hash);  bin = mixed >> (64 - log2(k));
      value = mixed & (2^58 - 1);  sig[bin] = min(values in bin);  an empty
      bin copies the value of the cyclically NEAREST non-empty bin to its
      right (distances measured on the pre-densification signature).

    This replaces the earlier k-universal-hash formulation: one whole-array
    mix + a radix argsort per batch instead of k multiply-mods per shingle
    (64× less arithmetic and, critically, no (k × shingles) work matrix
    streaming through the memory bus — the universal-hash version's DRAM
    traffic halved per-core throughput at 8 CPUs on one socket).
    """

    def __init__(self, num_perm: int = 64, seed: int = 42):
        if num_perm & (num_perm - 1) or not 2 <= num_perm <= 64:
            raise ValueError("num_perm must be a power of two in [2, 64]")
        self.num_perm = num_perm
        self._bin_shift = np.uint64(64 - num_perm.bit_length() + 1)

    def signature(self, text: str) -> np.ndarray:
        return self.signatures([text])[0]

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sigs = self.signatures(list(df["text"]))
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy()})
        out["sig"] = list(sigs)
        return out

    def signatures(self, texts) -> np.ndarray:
        """(n_docs, num_perm) uint64 signature matrix; ``texts`` may be a
        Python list or an Arrow string array (zero-copy byte sweep)."""
        h_all, counts = _shingle_hashes_batch(texts)
        n_docs, k = len(counts), self.num_perm
        mixed = _splitmix64(h_all)
        bins = (mixed >> self._bin_shift).astype(np.int64)
        vals = mixed & _OPH_VAL_MASK
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        key = doc_of * k + bins
        # stable argsort = radix for ints; shingles are already doc-grouped,
        # so this is a near-linear pass, then one reduceat for per-bin mins
        order = np.argsort(key, kind="stable")
        ks, vs = key[order], vals[order]
        sig = np.full(n_docs * k, _OPH_EMPTY, np.uint64)
        if len(ks):
            starts = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
            sig[ks[starts]] = np.minimum.reduceat(vs, starts)
        sig = sig.reshape(n_docs, k)
        # jump-pointer fill: after shifts 1,2,4,... each empty slot holds the
        # value of the nearest ORIGINALLY non-empty bin to its right (cyclic)
        s = 1
        empty = sig == _OPH_EMPTY
        while s < k and empty.any():
            sig[empty] = np.roll(sig, -s, axis=1)[empty]
            s <<= 1
            empty = sig == _OPH_EMPTY
        return sig


def _oph_from_hashes(h: np.ndarray, num_perm: int = 64) -> np.ndarray:
    """OPH signature of ONE shingle-hash set (the MinHasher spec applied to
    a single row): min per top-bits bin + the same jump-pointer
    densification. Used by the calibration op, which already holds the
    per-doc hash sets in the pair worker."""
    shift = np.uint64(64 - num_perm.bit_length() + 1)
    mixed = _splitmix64(h.astype(np.uint64))
    bins = (mixed >> shift).astype(np.int64)
    vals = mixed & _OPH_VAL_MASK
    sig = np.full(num_perm, _OPH_EMPTY, np.uint64)
    np.minimum.at(sig, bins, vals)
    s = 1
    empty = sig == _OPH_EMPTY
    while s < num_perm and empty.any():
        sig[empty] = np.roll(sig, -s)[empty]
        s <<= 1
        empty = sig == _OPH_EMPTY
    return sig


def _lsh_candidate_pairs(
    sf_dir: str, *, num_perm: int, bands: int, bucket_cap: int = _BUCKET_CAP,
    num_parts: int = 8,
):
    """Candidate pair Dataset (doc_a, doc_b), deduplicated, fully distributed."""
    ds = _read_docs(sf_dir)
    rows_per_band = num_perm // bands

    # ONE fused Arrow-native stage: tokenize → OPH signature → band fold →
    # (bucket, doc_id). Signatures never leave the worker (no object columns,
    # no sig serialization through the object store), and the text column is
    # consumed as raw Arrow buffers — the pandas round-trip this replaces
    # more than doubled the stage's core-seconds at 1M docs. Stateless tasks
    # with a per-worker-process cached MinHasher: same compile-once property
    # as an actor pool without its fixed concurrency cap / startup latency.
    def sig_explode(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"bucket": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
        if not t.num_rows:
            return empty
        hasher = _WORKER_CACHE.get(("minhash", num_perm))
        if hasher is None:
            hasher = MinHasher(num_perm)
            _WORKER_CACHE[("minhash", num_perm)] = hasher
        sig = hasher.signatures(t.column("text"))
        # FNV-fold each band vectorized over (docs, bands)
        fnv = np.uint64(1099511628211)
        S = sig.reshape(len(sig), bands, rows_per_band)
        acc = np.broadcast_to(
            np.arange(1, bands + 1, dtype=np.uint64), (len(sig), bands)
        ).copy()
        for r in range(rows_per_band):
            acc = (acc * fnv) ^ S[:, :, r]
        doc_id = t.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": (acc & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64).ravel(),
                "doc_id": np.repeat(doc_id, bands),
            }
        )

    # sig_explode is fused INTO the exchange's split wave (pre): parquet
    # blocks flow straight into split tasks that tokenize → sign → band →
    # partition, so the 16×-fanout bucket table (64M rows ≈ 1 GB at 4M docs)
    # never takes its own object-store round trip

    _EMPTY_PAIRS = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )

    def pairs(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _EMPTY_PAIRS
        b = t["bucket"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        # one lexsort drives everything: (bucket, doc) dedup, group
        # boundaries, the cap, and triangular pair expansion — no pandas,
        # no per-bucket Python loop (the groupby/itertuples formulation was
        # ~40% of the exchange stage's core-seconds at 4M docs)
        order = np.lexsort((d, b))
        bs, ds_ = b[order], d[order]
        keep = np.r_[True, (bs[1:] != bs[:-1]) | (ds_[1:] != ds_[:-1])]
        bs, ds_ = bs[keep], ds_[keep]
        first = np.r_[True, bs[1:] != bs[:-1]] if len(bs) else np.empty(0, bool)
        gidx = np.cumsum(first) - 1
        counts = np.bincount(gidx)
        goffs = np.concatenate(([0], np.cumsum(counts)))
        pos_in_g = np.arange(len(ds_)) - goffs[gidx]
        over = counts > bucket_cap
        if over.any():  # no silent caps: count + report
            _truncation_counter().add.remote(
                int(over.sum()), int((counts[over] - bucket_cap).sum())
            )
            in_cap = pos_in_g < bucket_cap
            bs, ds_, gidx = bs[in_cap], ds_[in_cap], gidx[in_cap]
            counts = np.minimum(counts, bucket_cap)
            goffs = np.concatenate(([0], np.cumsum(counts)))
            pos_in_g = np.arange(len(ds_)) - goffs[gidx]
        # member at position i pairs with the (m-1-i) members after it
        fanout = counts[gidx] - 1 - pos_in_g
        total = int(fanout.sum())
        if not total:
            return _EMPTY_PAIRS
        lefts = np.repeat(np.arange(len(ds_)), fanout)
        offs = np.concatenate(([0], np.cumsum(fanout)))
        rights = lefts + 1 + (np.arange(total) - np.repeat(offs[:-1], fanout))
        return pa.table({"doc_a": ds_[lefts], "doc_b": ds_[rights]})

    from ..ops import direct_partitioned_map

    # NOTE: pairs surviving multiple buckets leave here duplicated; the
    # verify stage (keyed by the pair) deduplicates for free — a dedicated
    # dedupe exchange measured ~1.5s of pure barrier cost at small scale.
    # The raw-task exchange (not the packed sort transport): at 4M docs the
    # bucket stream is 64M rows ≈ 1 GB, and sort parallelism sized by packed
    # BLOB rows would squeeze them through a handful of tasks.
    return direct_partitioned_map(
        ds,
        ["bucket"],
        num_parts,
        pairs,
        pa.schema([("bucket", pa.int64()), ("doc_id", pa.int64())]),
        pre=sig_explode,
    )


def _verified_pairs(sf_dir: str, cand, *, threshold: float, num_parts: int = 8, stats: bool = False):
    """Distributed true-Jaccard verification of candidate pairs.

    Exchange 1 (on doc id): pair-membership rows ⨝ docs — each matched doc's
    shingle-hash set is computed once per partition occurrence and attached.
    Exchange 2 (on the pair key): both sides of a pair meet in one worker,
    which computes |A∩B| / |A∪B| over the sorted uint64 hash sets.
    The driver never holds candidate texts or unverified pairs.
    """

    def explode_members(t: pa.Table) -> pa.Table:
        df = t.to_pandas().drop_duplicates(["doc_a", "doc_b"])  # intra-batch
        memb = pd.DataFrame(
            {
                "key_doc": np.concatenate([df["doc_a"].to_numpy(), df["doc_b"].to_numpy()]),
                "doc_a": np.tile(df["doc_a"].to_numpy(), 2),
                "doc_b": np.tile(df["doc_b"].to_numpy(), 2),
                "side": np.repeat(np.array([0, 1], dtype=np.int8), len(df)),
            }
        )
        return pa.Table.from_pandas(memb, preserve_index=False).cast(_MEMB_SCHEMA)

    memb = cand.map_batches(explode_members, batch_format="pyarrow").materialize()

    # Distributed semi-filter of the docs side: one object-store-resident
    # reduction turns the member rows into a sorted unique id array (the
    # driver only passes the REF around — it never holds ids or texts), and
    # every docs block drops its non-member rows MAP-SIDE before the
    # exchange. At 1M docs / 28k verified pairs this cuts the attach
    # exchange from shipping 1M texts to ~56k. Adaptive: past the broadcast
    # budget (mirroring exact_dedup's 5M-id rule) the filter is skipped and
    # the full co-group runs.
    docs_side = _read_docs(sf_dir)
    docs_pre = None
    if memb.count() <= 10_000_000:
        import ray as _ray

        @_ray.remote
        def _uniq_ids(*blocks):
            # empty blocks can carry a degenerate (column-less) schema
            arrs = [
                b["key_doc"].to_numpy()
                for b in blocks
                if b.num_rows and "key_doc" in b.column_names
            ]
            return np.unique(np.concatenate(arrs)) if arrs else np.empty(0, np.int64)

        ids_ref = _uniq_ids.remote(*memb.to_arrow_refs())

        def docs_pre(t: pa.Table) -> pa.Table:
            import ray as __ray

            ids = __ray.get(ids_ref)  # zero-copy plasma read per task
            d = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ids, d).clip(0, max(len(ids) - 1, 0))
            mask = ids[pos] == d if len(ids) else np.zeros(len(d), bool)
            return t.filter(pa.array(mask))

    _EMPTY_ATT = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "side": pa.array([], pa.int8()),
            "hashes": pa.array([], pa.list_(pa.uint64())),
        }
    )

    def attach(memb_t: pa.Table, docs_t: pa.Table) -> pa.Table:
        if not memb_t.num_rows:
            return _EMPTY_ATT
        m_key = memb_t["key_doc"].to_numpy(zero_copy_only=False)
        doc_ids = docs_t["doc_id"].to_numpy(zero_copy_only=False)
        # per-doc sorted-unique shingle-hash sets, fully vectorized: one
        # lexsort over (doc, hash), first-occurrence mask, segment offsets
        h_all, s_counts = _shingle_hashes_batch(docs_t.column("text"))
        doc_idx = np.repeat(np.arange(len(doc_ids), dtype=np.int64), s_counts)
        order = np.lexsort((h_all, doc_idx))
        hs, di = h_all[order], doc_idx[order]
        first = np.r_[True, (hs[1:] != hs[:-1]) | (di[1:] != di[:-1])] if len(hs) else np.empty(0, bool)
        uh, ud = hs[first], di[first]
        set_counts = np.bincount(ud, minlength=len(doc_ids))
        set_offs = np.concatenate(([0], np.cumsum(set_counts)))
        # memb row → its doc's set slice (searchsorted on the sorted id view)
        if len(doc_ids) == 0:
            raise ValueError("candidate pairs reference docs missing from the corpus")
        id_order = np.argsort(doc_ids, kind="stable")
        sorted_ids = doc_ids[id_order]
        pos = id_order[np.searchsorted(sorted_ids, m_key).clip(0, len(doc_ids) - 1)]
        if not np.array_equal(doc_ids[pos], m_key):
            raise ValueError("candidate pair references a doc_id missing from the corpus")
        lens = set_counts[pos]
        row_offs = np.concatenate(([0], np.cumsum(lens)))
        flat = np.repeat(set_offs[pos], lens) + (
            np.arange(row_offs[-1], dtype=np.int64) - np.repeat(row_offs[:-1], lens)
        )
        hashes = pa.ListArray.from_arrays(
            pa.array(row_offs, pa.int32()), pa.array(uh[flat], pa.uint64())
        )
        return pa.table(
            {
                "doc_a": memb_t["doc_a"],
                "doc_b": memb_t["doc_b"],
                "side": memb_t["side"],
                "hashes": hashes,
            }
        )

    # Both exchanges move FAT payloads (text, then hash-set lists) — the
    # packed sort transport would squeeze those bytes through tasks sized by
    # blob ROW count, so both ride the raw-task direct exchange. The semi
    # filter is fused map-side into the split wave (pres), and the attach
    # reduce re-partitions its output on the pair key (shuffle chaining), so
    # the fat intermediate takes no extra object-store round trip.
    from ..ops import direct_cogroup

    attached = direct_cogroup(
        [memb, docs_side],
        [["key_doc"], ["doc_id"]],
        num_parts,
        attach,
        [_MEMB_SCHEMA, DOCS_SCHEMA],
        pres=[None, docs_pre],
        emit_partitioned_on=["doc_a", "doc_b"],
    )

    def verify(t: pa.Table) -> pa.Table:
        # cross-bucket duplicate pairs collapse here: same (doc_a, doc_b,
        # side) rows carry identical hash sets, keep one of each
        df = (
            t.to_pandas()
            .drop_duplicates(["doc_a", "doc_b", "side"])
            .sort_values(["doc_a", "doc_b", "side"])
        )
        if stats:
            # calibration mode: per pair, the OPH signature agreement
            # (estimated similarity numerator) plus the exact inter/union
            rows = {k: [] for k in ("doc_a", "doc_b", "est_match", "inter", "uni")}
            it = df.itertuples()
            for r0, r1 in zip(it, it):
                a = np.asarray(r0.hashes, dtype=np.uint64)
                b = np.asarray(r1.hashes, dtype=np.uint64)
                inter = len(np.intersect1d(a, b, assume_unique=True))
                est = int((_oph_from_hashes(a) == _oph_from_hashes(b)).sum())
                rows["doc_a"].append(r0.doc_a)
                rows["doc_b"].append(r0.doc_b)
                rows["est_match"].append(est)
                rows["inter"].append(inter)
                rows["uni"].append(len(a) + len(b) - inter)
            return pa.table(
                {k: pa.array(np.asarray(v, np.int64)) for k, v in rows.items()}
            )
        out_a, out_b, out_j = [], [], []
        it = df.itertuples()
        for r0, r1 in zip(it, it):  # pairs are adjacent after the sort
            a = np.asarray(r0.hashes, dtype=np.uint64)
            b = np.asarray(r1.hashes, dtype=np.uint64)
            inter = len(np.intersect1d(a, b, assume_unique=True))
            jac = inter / max(1, len(a) + len(b) - inter)
            if jac >= threshold:
                out_a.append(r0.doc_a)
                out_b.append(r0.doc_b)
                out_j.append(round(jac, 6))
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(out_a, np.int64)),
                "doc_b": pa.array(np.asarray(out_b, np.int64)),
                "jaccard": pa.array(np.asarray(out_j, np.float64)),
            }
        )

    att_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("side", pa.int8()),
            ("hashes", pa.list_(pa.uint64())),
        ]
    )
    return direct_cogroup(
        [attached], [["doc_a", "doc_b"]], num_parts, verify, [att_schema]
    )


def minhash_lsh_pairs(
    sf_dir: str,
    *,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    bucket_cap: int = _BUCKET_CAP,
    num_parts: int = 8,
):
    """Near-duplicate candidate pairs with verified Jaccard ≥ threshold.

    shingle→minhash per batch (actor pool) → explode to (band, band_hash,
    doc_id) → bucket groupby → candidate pairs → distributed true-Jaccard
    verification (see ``_verified_pairs``). Jaccard is computed over the
    64-bit shingle-hash sets (the same universe the minhash sketches).
    Buckets larger than ``bucket_cap`` are truncated (bounded pair fan-out);
    every truncation is counted — read ``lsh_truncation_stats()`` after a
    run to audit recall impact, and raise ``bucket_cap`` to recover it."""
    cand = _lsh_candidate_pairs(
        sf_dir, num_perm=num_perm, bands=bands, bucket_cap=bucket_cap, num_parts=num_parts
    )
    out = _verified_pairs(sf_dir, cand, threshold=threshold, num_parts=num_parts).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "jaccard": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _simhash_batch(df: pd.DataFrame) -> pd.DataFrame:
    """64-bit simhash per doc (token-hash bit voting), vectorized per batch."""
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


def simhash_docs(sf_dir: str):
    """64-bit simhash per doc (token-hash bit voting), vectorized per batch."""
    ds = _read_docs(sf_dir)
    df = ds.map_batches(_simhash_batch, batch_format="pandas").to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR bit-fold; the multiply wraps
    mod 2^64 which is exactly the algorithm's carry discipline)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + (
        (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
    )
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    with np.errstate(over="ignore"):
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


_SIMHASH_BUCKET_CAP = 4096

_SIMPAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
)


def simhash_pairs(sf_dir: str, *, max_hamming: int = 3, num_parts: int = 8) -> pd.DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance ≤ ``max_hamming``.

    Pigeonhole banding: the 64-bit signature splits into 4 disjoint 16-bit
    bands; ≤3 differing bits can touch at most 3 bands, so every qualifying
    pair collides in at least one band — candidate generation is EXACT
    (recall 1.0), unlike MinHash-LSH's probabilistic bands. Shape: the
    signature + band fan-out are fused into the exchange's split wave
    (``pre=``), ONE hash exchange on the (band, value) bucket key
    co-locates candidates, pair expansion (lexsort + triangular
    repeat/arange, the LSH kernel's shape) and the xor-popcount verify run
    inside the partition, and a tiny (a, b)-keyed groupby dedupes pairs
    that collide in several bands. Buckets above ``_SIMHASH_BUCKET_CAP``
    would go O(cap²) — truncation is counted and raises at result time
    (never silent), and a bucket that size is a degenerate all-equal
    signature cluster an exact-dedup pass should have removed first.
    """
    ds = _read_docs(sf_dir)

    def fan(t: pa.Table) -> pa.Table:
        df = _simhash_batch(t.to_pandas())
        sig = df["simhash"].to_numpy(np.uint64)
        did = df["doc_id"].to_numpy(np.int64)
        n, bands = len(df), 4
        bvals = np.empty((bands, n), dtype=np.int64)
        for b in range(bands):
            bvals[b] = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        bucket = (
            np.repeat(np.arange(bands, dtype=np.int64), n) * 65536 + bvals.reshape(-1)
        )
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "doc_id": pa.array(np.tile(did, bands), pa.int64()),
                "simhash": pa.array(np.tile(sig, bands), pa.uint64()),
            }
        )

    def pairs(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _SIMPAIR_SCHEMA.empty_table()
        b = t["bucket"].to_numpy(zero_copy_only=False)
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        s = t["simhash"].to_numpy(zero_copy_only=False)
        order = np.lexsort((d, b))
        bs, ds_, ss = b[order], d[order], s[order]
        first = np.r_[True, bs[1:] != bs[:-1]]
        gidx = np.cumsum(first) - 1
        counts = np.bincount(gidx)
        if (counts > _SIMHASH_BUCKET_CAP).any():
            raise ValueError(
                f"simhash bucket over cap ({int(counts.max())} > "
                f"{_SIMHASH_BUCKET_CAP}): run exact dedup first"
            )
        goffs = np.concatenate(([0], np.cumsum(counts)))
        pos_in_g = np.arange(len(ds_)) - goffs[gidx]
        fanout = counts[gidx] - 1 - pos_in_g
        total = int(fanout.sum())
        if not total:
            return _SIMPAIR_SCHEMA.empty_table()
        lefts = np.repeat(np.arange(len(ds_)), fanout)
        offs = np.concatenate(([0], np.cumsum(fanout)))
        rights = lefts + 1 + (np.arange(total) - np.repeat(offs[:-1], fanout))
        ham = _popcount64(ss[lefts] ^ ss[rights])
        keep = ham <= max_hamming
        return pa.table(
            {
                "doc_a": pa.array(ds_[lefts][keep], pa.int64()),
                "doc_b": pa.array(ds_[rights][keep], pa.int64()),
                "hamming": pa.array(ham[keep], pa.int64()),
            }
        )

    from ..ops import direct_partitioned_map

    cand = direct_partitioned_map(
        ds,
        ["bucket"],
        num_parts,
        pairs,
        pa.schema(
            [("bucket", pa.int64()), ("doc_id", pa.int64()), ("simhash", pa.uint64())]
        ),
        pre=fan,
    )
    # pairs colliding in several bands leave the exchange duplicated with
    # identical hamming; one tiny pair-keyed groupby dedupes them
    from .relational import grouped_agg

    out = grouped_agg(cand, ["doc_a", "doc_b"], {"hamming": ("hamming", "min")})
    df = out.to_pandas()
    if len(df.columns) == 0:
        df = _SIMPAIR_SCHEMA.empty_table().to_pandas()
    for c in ("doc_a", "doc_b", "hamming"):
        df[c] = df[c].astype("int64")
    return df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def ngram_jaccard_dedup(sf_dir: str, *, threshold: float = 0.8):
    """Docs to KEEP after removing near-duplicates (Jaccard ≥ threshold,
    higher doc_id dropped). LSH candidates + distributed exact verify, then a
    distributed anti-join drops the losers (no driver-side id set)."""
    from ..ops import cogroup

    cand = _lsh_candidate_pairs(sf_dir, num_perm=64, bands=16)
    verified = _verified_pairs(sf_dir, cand, threshold=threshold)

    drops = verified.map_batches(
        lambda t: pa.table({"doc_id": t["doc_b"].cast(pa.int64())}),
        batch_format="pyarrow",
    )
    from ..ops import read_parquet_sized

    ids = read_parquet_sized(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"])
    id_schema = pa.schema([("doc_id", pa.int64())])

    def anti(ids_t: pa.Table, drops_t: pa.Table) -> pa.Table:
        keep = ids_t.to_pandas()
        dropped = drops_t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pandas(
            keep[~keep["doc_id"].isin(dropped)], preserve_index=False
        ).cast(id_schema)

    keep = cogroup(
        [ids, drops], [["doc_id"], ["doc_id"]], 8, anti, [id_schema, id_schema]
    )
    return keep.to_pandas().sort_values("doc_id").reset_index(drop=True)


# --- near-dup clustering: connected components over verified pairs ----------

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _edges_table(u: np.ndarray, v: np.ndarray) -> pa.Table:
    return pa.table({"u": pa.array(u, pa.int64()), "v": pa.array(v, pa.int64())})


def _dedup_edges(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop self-loops and duplicate (u, v) rows (ids are nonnegative, so a
    packed (u<<32 | v) key would overflow past 2^32 ids — lexsort instead)."""
    keep = u != v
    u, v = u[keep], v[keep]
    if not len(u):
        return u, v
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    first = np.r_[True, (u[1:] != u[:-1]) | (v[1:] != v[:-1])]
    return u[first], v[first]


def _star_fn(large: bool):
    """One star-contraction step over a node-keyed partition (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14). Input edges are
    keyed on ``u`` with the required orientation already emitted by the
    PREVIOUS round (large-star consumes both directions; small-star consumes
    (hi, lo)); output is oriented for the NEXT round, so every round is
    exactly one exchange with no separate orientation pass."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EDGE_SCHEMA.empty_table()
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        u, v = _dedup_edges(u, v)
        if not len(u):
            return _EDGE_SCHEMA.empty_table()
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        counts = np.diff(np.r_[starts, len(u)])
        uu = u[starts]
        m = np.minimum(np.minimum.reduceat(v, starts), uu)  # min(N(u) ∪ {u})
        m_per = np.repeat(m, counts)
        if large:
            # attach strictly-greater neighbors to the local min; output
            # (v, m) has v > u >= m — already (hi, lo) for the small-star
            mask = v > u
            oa, ob = v[mask], m_per[mask]
        else:
            # all neighbors are <= u here; re-root them (and u) at the min,
            # then emit BOTH directions — the large-star needs full N(u)
            mask = v != m_per
            head = uu != m
            oa = np.concatenate([v[mask], uu[head]])
            ob = np.concatenate([m_per[mask], m[head]])
            oa, ob = np.concatenate([oa, ob]), np.concatenate([ob, oa])
        oa, ob = _dedup_edges(oa, ob)
        return _edges_table(oa, ob)

    return fn


def _edge_signature(edges_ds) -> tuple[int, int]:
    """(row count, order-free splitmix64 checksum) — one tiny aggregate pass
    used as the star-contraction fixed-point test."""

    def part(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.uint64)
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            s = int(_splitmix64(u * np.uint64(0x9E3779B97F4A7C15) ^ v).sum(dtype=np.uint64))
        return pa.table({"n": pa.array([t.num_rows], pa.int64()),
                         "s": pa.array([s % (1 << 63)], pa.int64())})

    agg = edges_ds.map_batches(part, batch_format="pyarrow").to_pandas()
    if agg.empty:  # zero blocks survive an all-empty round
        return 0, 0
    return int(agg["n"].sum()), int(agg["s"].sum() % (1 << 63))


def connected_components(pairs_ds, *, num_parts: int = 8, max_rounds: int = 50):
    """Distributed connected components over an edge Dataset (columns
    ``u``/``v``): alternating large-star / small-star contraction. Every
    round is ONE node-keyed exchange over the edge list only (never the
    corpus), and the algorithm converges in O(log² n) rounds — near-dup
    components (cliques and short chains) settle in 2-3. Returns a Dataset
    of (u, v) star edges with v = component minimum, one per non-root node;
    isolated nodes never enter and never leave.

    Raises after ``max_rounds`` instead of returning a possibly-unconverged
    labelling (the repo's no-silent-caps rule)."""
    from ..ops import direct_cogroup

    def both_dirs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EDGE_SCHEMA.empty_table()
        a = t["u"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        b = t["v"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        return _edges_table(np.concatenate([a, b]), np.concatenate([b, a]))

    edges = direct_cogroup(
        [pairs_ds], [["u"]], num_parts, _star_fn(large=True),
        [_EDGE_SCHEMA], pres=[both_dirs],
    ).materialize()
    prev_sig = None
    for _ in range(max_rounds):
        edges = direct_cogroup(
            [edges], [["u"]], num_parts, _star_fn(large=False), [_EDGE_SCHEMA]
        ).materialize()
        sig = _edge_signature(edges)
        if sig == prev_sig:
            break
        prev_sig = sig
        edges = direct_cogroup(
            [edges], [["u"]], num_parts, _star_fn(large=True), [_EDGE_SCHEMA]
        ).materialize()
    else:
        raise RuntimeError(f"connected_components: no fixed point in {max_rounds} rounds")

    def stars_only(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        keep = u > v  # the small-star output is doubled; keep (child, root)
        return _edges_table(u[keep], v[keep])

    return edges.map_batches(stars_only, batch_format="pyarrow")


def dedup_clusters(sf_dir: str, *, threshold: float = 0.5, num_parts: int = 8) -> pd.DataFrame:
    """End-to-end MinHash dedup: verified LSH pairs → connected components →
    per-doc representative (component minimum). Output one row per document:
    (doc_id, rep_id); a doc survives dedup iff doc_id == rep_id. The final
    assignment is a doc_id-keyed cogroup of the (tiny) star edges against
    the corpus ids — the text never re-enters."""
    from ..ops import direct_cogroup

    cand = _lsh_candidate_pairs(
        sf_dir, num_perm=64, bands=16, bucket_cap=_BUCKET_CAP, num_parts=num_parts
    )
    ver = _verified_pairs(sf_dir, cand, threshold=threshold, num_parts=num_parts)

    def to_edges(t: pa.Table) -> pa.Table:
        return pa.table({
            "u": pc.cast(t["doc_a"], pa.int64()),
            "v": pc.cast(t["doc_b"], pa.int64()),
        })

    edges = ver.map_batches(to_edges, batch_format="pyarrow").materialize()
    stars = connected_components(edges, num_parts=num_parts)

    docs = _read_docs(sf_dir).select_columns(["doc_id"]).materialize()
    doc_schema = pa.schema([("doc_id", pa.int64())])
    out_schema = pa.schema([("doc_id", pa.int64()), ("rep_id", pa.int64())])

    def assign(docs_t: pa.Table, stars_t: pa.Table) -> pa.Table:
        ids = docs_t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        rep = ids.copy()
        if stars_t.num_rows:
            child = stars_t["u"].to_numpy(zero_copy_only=False)
            root = stars_t["v"].to_numpy(zero_copy_only=False)
            order = np.argsort(child, kind="stable")
            child, root = child[order], root[order]
            pos = np.searchsorted(child, ids)
            pos_c = np.clip(pos, 0, len(child) - 1)
            hit = child[pos_c] == ids
            rep[hit] = root[pos_c[hit]]
        return pa.table({"doc_id": pa.array(ids), "rep_id": pa.array(rep)})

    out = direct_cogroup(
        [docs, stars], [["doc_id"], ["u"]], num_parts, assign,
        [doc_schema, _EDGE_SCHEMA],
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "rep_id": "int64"}
    )


# --- incremental exact dedup (stateful increments) ----------------------------

def dedup_incremental_docs(sf_dir: str):
    """Driver query: split the documents table into two doc_id-ordered
    increments, run them through a FRESH state dir, and return the union of
    kept docs — which must equal the one-shot dedup (its SQL oracle)."""
    import tempfile

    import pyarrow.compute as pc
    import ray.data as rd_mod

    ds = _read_docs(sf_dir)
    cutoff = int(ds.max("doc_id")) // 2
    with tempfile.TemporaryDirectory(prefix="graft_dedup_state_") as state:
        inc1 = ds.map_batches(
            lambda t, c=cutoff: t.filter(pc.less_equal(t["doc_id"], c)),
            batch_format="pyarrow",
        )
        inc2 = ds.map_batches(
            lambda t, c=cutoff: t.filter(pc.greater(t["doc_id"], c)),
            batch_format="pyarrow",
        )
        kept1 = exact_dedup_incremental(inc1, state).to_pandas()
        kept2 = exact_dedup_incremental(inc2, state).to_pandas()
    out = pd.concat([kept1, kept2], ignore_index=True)[["doc_id", "text"]]
    return out.sort_values("doc_id").reset_index(drop=True)



def exact_dedup_incremental(docs_ds, state_dir: str, *, num_parts: int = 8):
    """Dedup ONE INCREMENT of documents against persisted state — the shape
    a daily-ingest pipeline actually runs: new data is deduped against
    everything already accepted WITHOUT reprocessing the accepted corpus.

    State layout: hash-partitioned signature parquet files under
    ``part=<k>/`` dirs (partition = h % num_parts, the same key the dedup
    exchange uses). ``state_dir`` must be on storage every node can read
    (shared FS / object store at cluster scale; local disk in this sandbox).

    Retry-safe two-phase structure:
      phase A (tasks, READ-ONLY vs state): co-locate the increment's
        signatures per partition, keep-min within the increment, anti-join
        the partition's persisted signatures — no writes, so Ray task
        retries are harmless; the ``materialize()`` barrier then pins the
        winner set exactly once.
      phase B (driver commit): append each partition's new signatures as
        ONE new file named by a content hash of its doc_ids — a replayed
        commit rewrites the same bytes to the same name (idempotent), no
        directory-swap crash window, and concurrent increments never touch
        the same file.
    A fully REPLAYED increment finds its own signatures persisted and
    returns an empty kept set — the state stays correct; callers consume an
    increment's kept-set exactly once (the ingest-log contract; increments
    must be processed in doc_id order for the global keep-min rule).
    """
    import hashlib
    import os

    import pyarrow.parquet as pq

    from ..ops import partitioned_map

    os.makedirs(state_dir, exist_ok=True)

    def probe(t: pa.Table) -> pa.Table:
        df = (
            t.to_pandas()
            .sort_values(["h", "h2", "doc_id"])
            .drop_duplicates(["h", "h2"], keep="first")
        )
        if df.empty:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "h": pa.array([], pa.uint64()),
                 "h2": pa.array([], pa.uint64())}
            )
        from ..ops import hash_keys

        part = int(
            hash_keys(pa.Table.from_pandas(df.head(1), preserve_index=False), ["h"])[0]
            % np.uint64(num_parts)
        )
        pdir = os.path.join(state_dir, f"part={part}")
        if os.path.isdir(pdir) and os.listdir(pdir):
            seen = pq.read_table(pdir, columns=["h", "h2"]).to_pandas()
            merged = df.merge(seen, on=["h", "h2"], how="left", indicator=True)
            df = merged[merged["_merge"] == "left_only"][["doc_id", "h", "h2"]]
        return pa.Table.from_pandas(df[["doc_id", "h", "h2"]], preserve_index=False)

    winners = partitioned_map(
        docs_ds.map_batches(_sig_frame, batch_format="pandas"), ["h"], num_parts, probe
    ).materialize()

    # phase B: commit new signatures. Signature rows are tiny (24 B/doc);
    # at >5M winners per increment, shard this loop over ray tasks keyed by
    # partition — the file-per-commit naming already supports it.
    wdf = winners.to_pandas()
    if len(wdf):
        from ..ops import hash_keys as _hk

        part_of = (
            _hk(pa.Table.from_pandas(wdf, preserve_index=False), ["h"])
            % np.uint64(num_parts)
        ).astype(np.int64)
        for part in np.unique(part_of):
            g = wdf[part_of == part].sort_values("doc_id")
            pdir = os.path.join(state_dir, f"part={int(part)}")
            os.makedirs(pdir, exist_ok=True)
            tag = hashlib.sha256(g["doc_id"].to_numpy(np.int64).tobytes()).hexdigest()[:16]
            final = os.path.join(pdir, f"sigs-{tag}.parquet")
            tmp = final + ".tmp"
            g[["h", "h2", "doc_id"]].to_parquet(tmp, index=False)
            os.replace(tmp, final)  # single-file atomic rename, idempotent

    return _keep_ids_semi_join(docs_ds, winners)


# --- edit-distance ≤ 1 string self-join (SymSpell deletion banding) -----------

_FNV_OFF = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def _fnv64_str(s: str) -> int:
    h = _FNV_OFF
    for b in s.encode("utf-8"):
        h = ((h ^ b) * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 63)  # int64 range


def _ed_le1(a: str, b: str):
    """Exact edit distance when ≤ 1, else None. Equal length: ed ≤ 1 ⟺
    Hamming ≤ 1 (a single length-preserving edit is a substitution); length
    gap 1: one deletion from the longer must reproduce the shorter."""
    la, lb = len(a), len(b)
    if a == b:
        return 0
    if abs(la - lb) > 1:
        return None
    if la == lb:
        return 1 if sum(x != y for x, y in zip(a, b)) == 1 else None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1 :] else None


def fuzzy_name_pairs(names_ds, *, num_parts: int = 8, bucket_cap: int = 10_000):
    """All unordered pairs of distinct names with edit distance ≤ 1.

    SymSpell-style banding: each name emits (hash(variant), name) for the
    name itself plus every single-character deletion. Completeness for
    ed ≤ 1: a substitution pair shares the deletion at the differing
    position; an insertion/deletion pair shares the shorter name itself.
    One bucket-keyed exchange; per-bucket all-pairs verified by the EXACT
    ``_ed_le1`` predicate (hash collisions and spurious co-bucketing are
    filtered here), then a tiny (name_a, name_b) groupby dedupes pairs
    found in several buckets. ``bucket_cap`` raises on degenerate buckets
    (the no-silent-caps rule — very short names co-bucket heavily).

    Scale: emit volume is O(total name chars); buckets are keyed by variant
    hash so the exchange carries (hash, name) only. Oracle: DuckDB
    ``levenshtein`` over the O(n²) self-join."""
    from ..ops import direct_cogroup
    from .relational import grouped_agg

    emit_schema = pa.schema([("bh", pa.int64()), ("name", pa.string())])
    pair_schema = pa.schema(
        [("name_a", pa.string()), ("name_b", pa.string()), ("dist", pa.int64())]
    )

    distinct = grouped_agg(names_ds, ["name"], {"_c": (None, "count")}).drop_columns(
        ["_c"]
    ).materialize()

    def emit(t: pa.Table) -> pa.Table:
        bh, nm = [], []
        for name in t["name"].to_pylist():
            if name is None:
                continue
            variants = {name}
            for i in range(len(name)):
                variants.add(name[:i] + name[i + 1 :])
            for v in variants:
                bh.append(_fnv64_str(v))
                nm.append(name)
        return pa.table({"bh": pa.array(bh, pa.int64()), "name": pa.array(nm)})

    def sweep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pair_schema.empty_table()
        df = t.to_pandas().sort_values(["bh", "name"], kind="stable")
        out_a, out_b, out_d = [], [], []
        for _, grp in df.groupby("bh", sort=False):
            names = grp["name"].drop_duplicates().tolist()
            n = len(names)
            if n * (n - 1) // 2 > bucket_cap:
                raise RuntimeError(
                    f"fuzzy_name_pairs: bucket exceeds bucket_cap={bucket_cap} pairs; "
                    "shorten the deletion depth or pre-shard by name length"
                )
            for i in range(n):
                for j in range(i + 1, n):
                    d = _ed_le1(names[i], names[j])
                    if d is not None and d > 0:
                        out_a.append(names[i])
                        out_b.append(names[j])
                        out_d.append(d)
        return pa.table(
            {
                "name_a": pa.array(out_a, pa.string()),
                "name_b": pa.array(out_b, pa.string()),
                "dist": pa.array(out_d, pa.int64()),
            }
        )

    emitted = distinct.map_batches(emit, batch_format="pyarrow").materialize()
    pairs = direct_cogroup([emitted], [["bh"]], num_parts, sweep, [emit_schema])
    out = grouped_agg(pairs, ["name_a", "name_b"], {"dist": ("dist", "min")})
    return out


def snm_pairs(
    sf_dir: str, *, window: int = 4, prefix: int = 24, num_parts: int = 8
) -> pd.DataFrame:
    """Sorted-neighborhood near-dup pairs (the classic record-linkage SNM
    blocking: sort on a cheap key, compare only rows within a fixed-size
    sliding window of the GLOBAL sort order — linear candidate count where
    LSH pays hashing and all-pairs pays n²).

    Blocking key = first ``prefix`` chars of lower(text); candidates = row
    pairs within ``window``-1 positions in the (key, doc_id) total order;
    verification = exact distinct-token Jaccard ≥ 1/2, kept as the integer
    comparison 2·|∩| ≥ |∪| (no float). Output (doc_a, doc_b, inter, uni).

    Distributed shape: the sort is Ray Data's native range exchange; the
    cross-partition window is closed with BOUNDARY HEADS — a tiny task per
    sorted block ships its first window-1 rows to the driver (O(window ×
    num_blocks) rows, independent of corpus size), and each block's pair
    task receives its own block plus the concatenated next-block heads.
    A pair (i, j), i<j in global order, is emitted only by the task owning
    row i — exactly once, so the result is block-boundary invariant.
    """
    import ray

    w = int(window)
    ds = _read_docs(sf_dir)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        toks = [sorted(set(_TOKEN.findall(t.lower()))) for t in df["text"]]
        return pd.DataFrame(
            {
                "k": df["text"].str.lower().str.slice(0, prefix),
                "doc_id": df["doc_id"].astype("int64"),
                "toks": pd.Series(toks, dtype=object),
            }
        )

    sorted_ds = (
        ds.map_batches(keyed, batch_format="pandas").sort(["k", "doc_id"]).materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    key_schema = pa.schema(
        [("k", pa.string()), ("doc_id", pa.int64()), ("toks", pa.list_(pa.string()))]
    )

    @ray.remote
    def _head(t: pa.Table) -> pa.Table:
        # Ray's empty pandas blocks surface as 0-COLUMN arrow tables that can
        # still claim nonzero num_rows — normalize to a typed empty so the
        # boundary-budget arithmetic never counts phantom rows
        if "doc_id" not in t.column_names:
            return key_schema.empty_table()
        return t.slice(0, w - 1).combine_chunks()

    heads = ray.get([_head.remote(r) for r in refs])

    out_schema = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("inter", pa.int64()),
            ("uni", pa.int64()),
        ]
    )

    @ray.remote
    def _pairs(block: pa.Table, next_t: pa.Table) -> pa.Table:
        if "doc_id" not in block.column_names:  # phantom 0-column block
            return out_schema.empty_table()
        n_own = block.num_rows
        if n_own == 0:
            return out_schema.empty_table()
        t = pa.concat_tables([block, next_t], promote_options="default")
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tok_sets = [frozenset(x) for x in t["toks"].to_pylist()]
        da, db, inters, unis = [], [], [], []
        for a in range(n_own):
            sa = tok_sets[a]
            for b in range(a + 1, min(a + w, len(tok_sets))):
                sb = tok_sets[b]
                inter = len(sa & sb)
                uni = len(sa) + len(sb) - inter
                if uni > 0 and 2 * inter >= uni:
                    lo, hi = (ids[a], ids[b]) if ids[a] < ids[b] else (ids[b], ids[a])
                    da.append(lo)
                    db.append(hi)
                    inters.append(inter)
                    unis.append(uni)
        return pa.table(
            {
                "doc_a": pa.array(np.asarray(da, np.int64)),
                "doc_b": pa.array(np.asarray(db, np.int64)),
                "inter": pa.array(np.asarray(inters, np.int64)),
                "uni": pa.array(np.asarray(unis, np.int64)),
            }
        )

    def next_rows(i: int) -> pa.Table:
        tail: list[pa.Table] = []
        got = 0
        for h in heads[i + 1 :]:
            if got >= w - 1:
                break
            take = h.slice(0, (w - 1) - got)
            tail.append(take)
            got += take.num_rows
        if not tail:
            return heads[0].schema.empty_table() if heads else out_schema.empty_table()
        return pa.concat_tables(tail, promote_options="default")

    out_refs = [_pairs.remote(r, next_rows(i)) for i, r in enumerate(refs)]
    import ray.data as _rd

    out = _rd.from_arrow_refs(out_refs).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("doc_a", "doc_b", "inter", "uni")}
        )
    return (
        out.sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype({c: "int64" for c in ("doc_a", "doc_b", "inter", "uni")})
    )


def lsh_calibration(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """MinHash-LSH calibration curve — the dedup-QA audit that tells you
    whether the sketch's similarity ESTIMATE tracks truth on YOUR corpus:
    every LSH candidate pair contributes its OPH signature agreement
    (est_match of 64 bins, the unbiased Jaccard estimator's numerator) and
    its exact intersection/union sizes; pairs bucket by est_match // 8 and
    each bucket reports exact integer sums (read expected-vs-observed as
    sum_match/(64·n) vs sum_inter/sum_union). A well-calibrated sketch
    puts high-est buckets at high true overlap; drift means the shingle or
    mixing spec forked somewhere.

    Shape: the minhash_lsh_pairs machinery verbatim (candidate exchanges +
    pair-keyed co-group) with the verify worker emitting integer stats
    instead of filtering — the signatures are recomputed FROM the pair's
    hash sets in the worker (OPH is a pure function of the set), so no
    extra signature exchange exists. One final tiny bin-keyed groupby."""
    from .relational import grouped_agg

    cand = _lsh_candidate_pairs(sf_dir, num_perm=64, bands=16,
                                bucket_cap=_BUCKET_CAP, num_parts=num_parts)
    stats = _verified_pairs(sf_dir, cand, threshold=0.0, num_parts=num_parts,
                            stats=True)

    def to_bins(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("bin", pa.int64()), ("n_pairs", pa.int64()),
                 ("sum_match", pa.int64()), ("sum_inter", pa.int64()),
                 ("sum_union", pa.int64())]
            ).empty_table()
        est = t["est_match"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bin": pa.array(est // 8),
                "n_pairs": pa.array(np.ones(len(est), np.int64)),
                "sum_match": pa.array(est),
                "sum_inter": t["inter"],
                "sum_union": t["uni"],
            }
        )

    g = grouped_agg(
        stats.map_batches(to_bins, batch_format="pyarrow"),
        ["bin"],
        {c: (c, "sum") for c in ("n_pairs", "sum_match", "sum_inter", "sum_union")},
    ).to_pandas()
    if g.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("bin", "n_pairs", "sum_match", "sum_inter", "sum_union")}
        )
    for c in g.columns:
        g[c] = g[c].astype("int64")
    return g.sort_values("bin").reset_index(drop=True)[
        ["bin", "n_pairs", "sum_match", "sum_inter", "sum_union"]
    ]


# --- exact set-similarity join (prefix filter) ------------------------------------

_SSJ_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()),
     ("inter", pa.int64()), ("union_", pa.int64())]
)
_SSJ_BUCKET_CAP = 4096


def ssjoin_prefix(
    sf_dir: str, *, t_num: int = 1, t_den: int = 2, num_parts: int = 8,
    bucket_cap: int = _SSJ_BUCKET_CAP,
) -> pd.DataFrame:
    """EXACT set-similarity join with the prefix filter (PPJoin family —
    Chaudhuri 2006 / Xiao 2008 / Vernica 2010): every unordered doc pair
    whose token-SET Jaccard ≥ t (= t_num/t_den, default 1/2), with
    DETERMINISTIC 100% recall — the exact-guarantee sibling of the
    probabilistic MinHash-LSH path. Candidate completeness: tokens are
    totally ordered by (global frequency asc, token asc); doc x indexes its
    first p(x) = |x| − ceil(t·|x|) + 1 tokens; the SMALLEST common token of
    a qualifying pair provably lies in BOTH prefixes (if it escaped either
    prefix, all common tokens would sit in that side's ceil(t·|x|) − 1
    suffix < t·|x| ≤ overlap — contradiction). The size filter
    t_den·min ≥ t_num·max prunes inside buckets; verification is exact set
    intersection; the threshold test is the cross-multiplication
    t_den·|A∩B| ≥ t_num·|A∪B| — no floats anywhere.

    Distributed shape: (1) token-keyed exchange attaches global frequency,
    (2) doc-keyed regroup sorts each doc's tokens canonically and emits
    prefix postings, (3) token-keyed bucket pairing (``bucket_cap`` RAISES —
    hot tokens sort to the END of the order, so honest buckets are rare-
    token sized), (4) pair-keyed dedup, (5) member ⨝ docs attach and
    (6) pair-keyed exact verify — the _verified_pairs exchange shape with
    token sets instead of shingle hashes. The driver never holds texts,
    candidates or token sets.
    """
    import re as _re

    from ..ops import direct_cogroup, direct_partitioned_map

    tok_re = _re.compile(r"[A-Za-z0-9_]+")

    dt_schema = pa.schema([("doc", pa.int64()), ("token", pa.string())])

    def doc_tokens(t: pa.Table) -> pa.Table:
        docs, toks = [], []
        for did, text in zip(
            t["doc_id"].to_pylist(), t["text"].to_pylist()
        ):
            ts = sorted(set(tok_re.findall(text.lower())))
            docs.extend([did] * len(ts))
            toks.extend(ts)
        return pa.table({
            "doc": pa.array(docs, pa.int64()),
            "token": pa.array(toks, pa.string()),
        })

    docs_raw = _read_docs(sf_dir).materialize()
    dt = docs_raw.map_batches(doc_tokens, batch_format="pyarrow").materialize()

    dtf_schema = pa.schema(
        [("doc", pa.int64()), ("token", pa.string()), ("f", pa.int64())]
    )

    def attach_freq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return dtf_schema.empty_table()
        df = t.to_pandas()
        f = df.groupby("token", sort=False)["doc"].transform("size")
        return pa.table({
            "doc": pa.array(df["doc"].to_numpy(np.int64)),
            "token": pa.array(df["token"].to_numpy(object), pa.string()),
            "f": pa.array(f.to_numpy(np.int64)),
        })

    dtf = direct_partitioned_map(dt, ["token"], num_parts, attach_freq, dt_schema)

    post_schema = pa.schema(
        [("token", pa.string()), ("doc", pa.int64()), ("sz", pa.int64())]
    )

    def emit_prefix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return post_schema.empty_table()
        df = t.to_pandas().sort_values(["doc", "f", "token"], kind="stable")
        doc = df["doc"].to_numpy(np.int64)
        token = df["token"].to_numpy(object)
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        lens = np.diff(np.r_[starts, len(doc)])
        # p = sz - ceil(t*sz) + 1, exact integer ceil
        p = lens - (t_num * lens + t_den - 1) // t_den + 1
        pos = np.arange(len(doc)) - np.repeat(starts, lens)
        keep = pos < np.repeat(p, lens)
        return pa.table({
            "token": pa.array(token[keep], pa.string()),
            "doc": pa.array(doc[keep]),
            "sz": pa.array(np.repeat(lens, lens)[keep].astype(np.int64)),
        })

    postings = direct_partitioned_map(
        dtf, ["doc"], num_parts, emit_prefix, dtf_schema
    )

    cand_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        df = t.to_pandas()
        out_a, out_b = [], []
        for token, g in df.groupby("token", sort=False):
            if len(g) > bucket_cap:
                raise ValueError(
                    f"ssjoin bucket for token {token!r} holds {len(g)} "
                    f"prefix postings (> bucket_cap={bucket_cap})"
                )
            if len(g) < 2:
                continue
            d = g["doc"].to_numpy(np.int64)
            sz = g["sz"].to_numpy(np.int64)
            o = np.argsort(d, kind="stable")
            d, sz = d[o], sz[o]
            n = len(d)
            li = np.repeat(np.arange(n), np.arange(n - 1, -1, -1))
            seg = np.cumsum(np.arange(n - 1, -1, -1)) - np.arange(n - 1, -1, -1)
            ri = li + 1 + (np.arange(len(li)) - np.repeat(seg, np.arange(n - 1, -1, -1)))
            mn = np.minimum(sz[li], sz[ri])
            mx = np.maximum(sz[li], sz[ri])
            ok = t_den * mn >= t_num * mx  # size filter, exact
            out_a.append(d[li][ok])
            out_b.append(d[ri][ok])
        if not out_a:
            return cand_schema.empty_table()
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a)),
            "doc_b": pa.array(np.concatenate(out_b)),
        })

    cand = direct_partitioned_map(
        postings, ["token"], num_parts, bucket_pairs, post_schema
    )

    def dedup_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return cand_schema.empty_table()
        df = t.to_pandas().drop_duplicates(["doc_a", "doc_b"])
        return pa.Table.from_pandas(df, preserve_index=False).cast(cand_schema)

    cand = direct_partitioned_map(
        cand, ["doc_a", "doc_b"], num_parts, dedup_pairs, cand_schema
    ).materialize()

    memb_schema = pa.schema(
        [("key_doc", pa.int64()), ("doc_a", pa.int64()), ("doc_b", pa.int64())]
    )

    def explode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return memb_schema.empty_table()
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key_doc": pa.array(np.concatenate([a, b])),
            "doc_a": pa.array(np.tile(a, 2)),
            "doc_b": pa.array(np.tile(b, 2)),
        })

    memb = cand.map_batches(explode, batch_format="pyarrow")

    att_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("side_doc", pa.int64()), ("toks", pa.list_(pa.string()))]
    )
    docs_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def attach(m_t: pa.Table, d_t: pa.Table) -> pa.Table:
        if m_t.num_rows == 0 or d_t.num_rows == 0:
            return att_schema.empty_table()
        md = m_t.to_pandas()
        dd = d_t.to_pandas()
        wanted = set(md["key_doc"].astype(int))
        sets = {
            int(did): sorted(set(tok_re.findall(text.lower())))
            for did, text in zip(dd["doc_id"], dd["text"])
            if int(did) in wanted
        }
        md = md[md["key_doc"].isin(sets.keys())]
        if md.empty:
            return att_schema.empty_table()
        return pa.table({
            "doc_a": pa.array(md["doc_a"].to_numpy(np.int64)),
            "doc_b": pa.array(md["doc_b"].to_numpy(np.int64)),
            "side_doc": pa.array(md["key_doc"].to_numpy(np.int64)),
            "toks": pa.array(
                [sets[int(k)] for k in md["key_doc"]], pa.list_(pa.string())
            ),
        })

    att = direct_cogroup(
        [memb, docs_raw], [["key_doc"], ["doc_id"]], num_parts, attach,
        [memb_schema, docs_schema], emit_partitioned_on=["doc_a", "doc_b"],
    )

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SSJ_PAIR_SCHEMA.empty_table()
        df = t.to_pandas()
        rows_a, rows_b, rows_i, rows_u = [], [], [], []
        for (a, b), g in df.groupby(["doc_a", "doc_b"], sort=False):
            if len(g) != 2:
                continue  # a side missing (doc absent) — cannot qualify
            sa = np.asarray(g.iloc[0]["toks"], dtype=object)
            sb = np.asarray(g.iloc[1]["toks"], dtype=object)
            if int(g.iloc[0]["side_doc"]) != int(a):
                sa, sb = sb, sa
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            if union > 0 and t_den * inter >= t_num * union:
                rows_a.append(int(a)); rows_b.append(int(b))
                rows_i.append(inter); rows_u.append(union)
        return pa.table({
            "doc_a": pa.array(rows_a, pa.int64()),
            "doc_b": pa.array(rows_b, pa.int64()),
            "inter": pa.array(rows_i, pa.int64()),
            "union_": pa.array(rows_u, pa.int64()),
        })

    out = direct_partitioned_map(
        att, ["doc_a", "doc_b"], num_parts, verify, att_schema
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in _SSJ_PAIR_SCHEMA.names}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
