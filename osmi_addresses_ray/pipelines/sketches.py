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


# --------------------------------------------------------------------------
# KLL quantile sketch (Karnin–Lang–Liberty 2016), deterministic variant
# --------------------------------------------------------------------------

KLL_K = 128  # top-level capacity; rank error ~ O(1/k)
_KLL_C = 2.0 / 3.0
KLL_Q100S = (1, 10, 25, 50, 75, 90, 99)
KLL_PARTS = 8


def _kll_cap(h: int, n_levels: int) -> int:
    import math

    d = n_levels - 1 - h  # depth from the top
    return max(2, math.ceil(KLL_K * (_KLL_C ** d)))


class KLLSketch:
    """Deterministic KLL: the classic geometric-capacity compactor ladder
    with the random coin replaced by a per-level compaction COUNTER parity
    (spec shared verbatim with oracle/llm_ops.kll_oracle — the two are
    loop-for-loop mirrors):

      * level h holds items of weight 2^h; capacities shrink by 2/3 per
        level below the top.
      * compaction of level h: sort ascending; an ODD length retains the
        maximum at the level; offset = coins[h] % 2 (then coins[h] += 1);
        every 2nd item of the even prefix promotes to level h+1.
        Weight is conserved exactly, so Σ 2^h·|level h| == #inserts.
      * the compaction loop always fixes the LOWEST over-capacity level
        first, re-deriving capacities as the ladder grows.
      * merge: extend level lists and add coin counters elementwise, then
        run the same loop.

    Determinism contract: inputs are fed in (value, id)-sorted order per
    hash partition and partition sketches merge in partition-index order,
    so the final sketch is a pure function of the input multiset + the
    partition count — which is what lets the driver hash-check estimates
    against the naive recomputation.
    """

    __slots__ = ("levels", "coins")

    def __init__(self):
        self.levels: list[list[int]] = [[]]
        self.coins: list[int] = [0]

    def _compact_loop(self) -> None:
        while True:
            n_levels = len(self.levels)
            for h in range(n_levels):
                if len(self.levels[h]) > _kll_cap(h, n_levels):
                    break
            else:
                return
            lv = sorted(self.levels[h])
            even = len(lv) - (len(lv) % 2)
            o = self.coins[h] % 2
            self.coins[h] += 1
            promoted = lv[o:even:2]
            self.levels[h] = lv[even:]  # the retained max (or nothing)
            if h + 1 == len(self.levels):
                self.levels.append([])
                self.coins.append(0)
            self.levels[h + 1].extend(promoted)

    def insert_sorted(self, values) -> None:
        """Feed pre-sorted values one at a time (the spec's insert order)."""
        cap0 = _kll_cap(0, len(self.levels))
        for v in values:
            self.levels[0].append(int(v))
            if len(self.levels[0]) > cap0:
                self._compact_loop()
                cap0 = _kll_cap(0, len(self.levels))

    def merge(self, other: "KLLSketch") -> None:
        while len(self.levels) < len(other.levels):
            self.levels.append([])
            self.coins.append(0)
        for h, lv in enumerate(other.levels):
            self.levels[h].extend(lv)
            self.coins[h] += other.coins[h]
        self._compact_loop()

    def total_weight(self) -> int:
        return sum((1 << h) * len(lv) for h, lv in enumerate(self.levels))

    def quantile(self, q100: int) -> int:
        pairs = sorted(
            (v, 1 << h) for h, lv in enumerate(self.levels) for v in lv
        )
        total = self.total_weight()
        cum = 0
        for v, w in pairs:
            cum += w
            if 100 * cum >= q100 * total:
                return v
        return pairs[-1][0]


def kll_quantiles(sf_dir: str, *, num_parts: int = KLL_PARTS) -> pd.DataFrame:
    """Approximate quantiles of ``events.value`` (integer cents) from a
    mergeable KLL sketch, reported AGAINST the exact order statistics so
    the rank error is part of the hash-checked result:

      (q100, est, exact, rank_err_frac, n)   with
      rank_err_frac = |rank(est) − ceil(q·n/100)| / n, rounded to 6.

    Distributed shape: ONE hash exchange builds a per-partition sketch
    (each a few KB whatever the partition holds); the driver merges P
    sketches in partition order. The exact side rides the value-histogram
    exchange (bounded by DISTINCT cents, not rows — 17.8k at sf0.1), which
    also furnishes rank(est) with no extra pass. At 100 TB the histogram
    verification leg is dropped and the sketch stands alone — that is the
    point of the sketch; here the pairing is what makes the gate
    falsifiable (a compaction bug shifts est and breaks the hash).
    """
    from ..ops import direct_partitioned_map

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    ).materialize()

    sk_schema = pa.schema(
        [("part", pa.int64()), ("level", pa.int64()), ("kind", pa.int64()),
         ("v", pa.int64())]
    )
    in_schema = pa.schema([("event_id", pa.int64()), ("value", pa.float64())])

    def build(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return sk_schema.empty_table()
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        from ..ops import hash_keys

        # NB: uint64 % python-int promotes to float64 and garbles — keep the
        # modulus in uint64 like ops._split does
        part = int(hash_keys(t.slice(0, 1), ["event_id"])[0] % np.uint64(num_parts))
        order = np.lexsort((eid, cents))
        sk = KLLSketch()
        sk.insert_sorted(cents[order])
        rows_level, rows_kind, rows_v = [], [], []
        for h, lv in enumerate(sk.levels):
            for v in lv:
                rows_level.append(h); rows_kind.append(0); rows_v.append(v)
            rows_level.append(h); rows_kind.append(1); rows_v.append(sk.coins[h])
        n = len(rows_v)
        return pa.table(
            {
                "part": pa.array(np.full(n, part, np.int64)),
                "level": pa.array(np.array(rows_level, np.int64)),
                "kind": pa.array(np.array(rows_kind, np.int64)),
                "v": pa.array(np.array(rows_v, np.int64)),
            }
        )

    sk_rows = direct_partitioned_map(
        ds, ["event_id"], num_parts, build, in_schema
    ).to_pandas()

    # exact side: value-histogram exchange (bounded by distinct cents)
    def hist_partial(t: pa.Table) -> pa.Table:
        c = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        vals, cnt = np.unique(c, return_counts=True)
        return pa.table({"c": pa.array(vals), "cnt": pa.array(cnt.astype(np.int64))})

    from .relational import grouped_agg

    hist = (
        grouped_agg(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            ["c"], {"cnt": ("cnt", "sum")},
        )
        .to_pandas()
        .sort_values("c")
    )
    hv = hist["c"].to_numpy(np.int64)
    hc = np.cumsum(hist["cnt"].to_numpy(np.int64))
    n = int(hc[-1])

    # driver: reconstruct + merge partition sketches in partition order
    merged = KLLSketch()
    for p in sorted(sk_rows["part"].unique()):
        g = sk_rows[sk_rows["part"] == p]
        sk = KLLSketch()
        n_lv = int(g["level"].max()) + 1
        sk.levels = [
            sorted(g[(g["level"] == h) & (g["kind"] == 0)]["v"].tolist())
            for h in range(n_lv)
        ]
        sk.coins = [
            int(g[(g["level"] == h) & (g["kind"] == 1)]["v"].iloc[0])
            for h in range(n_lv)
        ]
        merged.merge(sk)
    assert merged.total_weight() == n, "KLL weight conservation broken"

    rows = []
    for q in KLL_Q100S:
        est = merged.quantile(q)
        target = -(-q * n // 100)  # ceil(q·n/100)
        exact = int(hv[np.searchsorted(100 * hc, 100 * target, side="left")])
        rank_est = int(hc[np.searchsorted(hv, est, side="right") - 1]) if est >= hv[0] else 0
        err = round(abs(rank_est - target) / n, 6)
        rows.append(
            {"q100": q, "est": est, "exact": exact, "rank_err_frac": err, "n": n}
        )
    out = pd.DataFrame(rows)
    for c in ("q100", "est", "exact", "n"):
        out[c] = out[c].astype("int64")
    return out


# --- AMS F2 (second frequency moment) sketch audit ----------------------------

_AMS_R = 16  # estimator replicas; signs come from bits 0..15 of the token hash


def ams_f2(sf_dir: str) -> pd.DataFrame:
    """AMS second-frequency-moment sketch (Alon–Matias–Szegedy 1996) vs the
    EXACT F2 = Σ_types c² of the corpus token-frequency vector — the
    join-size / self-join-cardinality estimator. Each of the 16 replicas
    keeps one int64: z_i = Σ_occurrences sign_i(token), with sign_i = 1−2·bit_i
    of the token's full-length FNV-1a 64 hash (the SQL-expressible hash the
    fingerprint family already uses); E[z_i²] = F2. Everything is exact
    integer arithmetic — z by commutative int64 sums (any merge tree), z² and
    F2 in python ints with an explicit int64-overflow guard that RAISES.

    Distributed shape: the sketch itself needs ZERO exchanges — each batch
    emits 16 (i, z_partial) rows (the linear-sketch property: z is a dot
    product with a fixed ±1 vector), merged by one ≤16-row-per-partition
    groupby. The exact F2 is the one honest token-keyed exchange
    (pre-aggregated per-batch (token, count) partials), whose per-partition
    Σc² partials come back as single rows.
    """
    import re as _re

    from .relational import grouped_agg
    from .textstats import _TOKEN_RE, _fnv1a_tokens, _read_docs

    tok = _re.compile(_TOKEN_RE)
    bitdivs = (np.uint64(1) << np.arange(_AMS_R, dtype=np.uint64)).reshape(1, -1)

    def z_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in tok.findall(t.lower())]
        if not toks:
            return pd.DataFrame({
                "i": pd.Series([], dtype="int64"),
                "z": pd.Series([], dtype="int64"),
            })
        h = _fnv1a_tokens(np.asarray(toks, dtype=object))
        bits = ((h.reshape(-1, 1) // bitdivs) & np.uint64(1)).astype(np.int64)
        z = (1 - 2 * bits).sum(axis=0)
        return pd.DataFrame({"i": np.arange(_AMS_R, dtype=np.int64), "z": z})

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in tok.findall(t.lower())]
        if not toks:
            return pd.DataFrame({
                "t": pd.Series([], dtype=object),
                "c": pd.Series([], dtype="int64"),
            })
        vc = pd.Series(toks).value_counts()
        return pd.DataFrame({
            "t": vc.index.to_numpy(object), "c": vc.to_numpy(np.int64)
        })

    ds = _read_docs(sf_dir)
    zs = grouped_agg(
        ds.map_batches(z_partial, batch_format="pandas"),
        ["i"],
        {"z": ("z", "sum")},
    ).to_pandas()
    empty = pd.DataFrame({
        "i": pd.Series([], dtype="int64"),
        "z": pd.Series([], dtype="int64"),
        "z2": pd.Series([], dtype="int64"),
        "f2": pd.Series([], dtype="int64"),
    })
    if zs.empty:
        return empty
    counts = grouped_agg(
        ds.map_batches(count_partial, batch_format="pandas"),
        ["t"],
        {"c": ("c", "sum")},
    )

    def sq_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = df["c"].to_numpy(np.int64)
        # python-int fold: Σc² overflows int64 at ~3e9 occurrences of one type
        return pd.DataFrame({"f2p": [sum(int(v) * int(v) for v in c)]})

    f2 = sum(int(r["f2p"]) for r in counts.map_batches(
        sq_partial, batch_format="pandas"
    ).take_all())
    if f2 >= 2**63:
        raise OverflowError("ams_f2: exact F2 exceeds int64 — rescale output")
    zs = zs.sort_values("i").reset_index(drop=True)
    zs["z"] = zs["z"].astype("int64")
    z_int = [int(v) for v in zs["z"]]
    if any(abs(v) >= 3_037_000_499 for v in z_int):
        raise OverflowError("ams_f2: |z| too large for exact int64 z²")
    zs["z2"] = np.array([v * v for v in z_int], dtype=np.int64)
    zs["f2"] = np.int64(f2)
    zs["i"] = zs["i"].astype("int64")
    return zs[["i", "z", "z2", "f2"]]
