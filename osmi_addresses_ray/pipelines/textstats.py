"""Text analysis operators over the documents table — all stateless,
vectorized ``map_batches`` (the language-ID stage is an actor pool so the
stopword tables/regexes compile once per actor).

- token_counts    — \\w+ token count + char count per doc (SQL-checkable)
- quality_scores  — length / punctuation ratio / stopword ratio / mean word
                    length (SQL-checkable components)
- lang_id         — stopword-count argmax over {en, de, fr} (SQL-checkable:
                    the same counts + CASE tie-break are expressed in DuckDB)
- fingerprints    — order-sensitive 64-bit document fingerprint: FNV-1a hash
                    per token folded as sum(i * h_i) mod 2^64 (SQL-checkable
                    via DuckDB list lambdas + HUGEINT arithmetic; the
                    position weight keeps it order-sensitive while the
                    commutative sum keeps the engine side one segmented
                    reduction instead of a per-byte serial fold)
"""

from __future__ import annotations

import os
import re
from collections import Counter

import numpy as np
import pandas as pd
import ray.data as rd

_TOKEN_RE = r"[A-Za-z0-9_]+"


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    from ..ops import read_parquet_sized

    return read_parquet_sized(
        os.path.join(sf_dir, "documents.parquet"), columns=list(columns)
    )


def token_counts(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": df["text"].map(lambda t: len(tok.findall(t))).astype("int64"),
                "n_chars": df["text"].str.len().astype("int64"),
            }
        )

    return ds.map_batches(f, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality components (round(6) for oracle float parity)."""
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)
    punct = re.compile(r"[.,;:!?]")

    def f(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].map(tok.findall)
        n_tok = toks.map(len).astype("int64")
        n_chars = df["text"].str.len().astype("int64")
        n_punct = df["text"].map(lambda t: len(punct.findall(t))).astype("int64")
        mean_wl = toks.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": n_tok,
                "punct_ratio": (n_punct / n_chars.clip(lower=1)).round(6),
                "mean_word_len": mean_wl.round(6),
            }
        )

    return ds.map_batches(f, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def _segment_tokens(texts, tok) -> tuple[list[list[str]], np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch: (token lists, per-doc counts, starts, ends) where
    starts/ends index into the concatenation of all tokens."""
    tok_lists = [tok.findall(t.lower()) for t in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    ends = np.cumsum(counts)
    starts = ends - counts
    return tok_lists, counts, starts, ends


class LangId:
    """Actor-pool stage: stopword tables built once per actor.

    Scoring: per language, count of (lowercased) tokens present in its
    stopword set; prediction = highest count, ties broken by the
    lexicographically LARGEST language code, 'und' when all counts are 0.
    Vectorized: one token explode per batch, one hash-isin per language,
    segment sums via the cumsum-difference trick (robust to empty docs)."""

    STOPS = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "with"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
        "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    }
    # argmax picks the FIRST max → order by descending code for the tie-break
    PREF = ("fr", "en", "de")

    def __init__(self):
        self.tok = re.compile(_TOKEN_RE)
        self.stop_idx = {lang: pd.Index(sorted(s)) for lang, s in self.STOPS.items()}

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy()
        tok_lists, counts, starts, ends = _segment_tokens(texts, self.tok)
        n = len(df)
        scores = np.zeros((n, len(self.PREF)), dtype=np.int64)
        if counts.sum():
            all_toks = pd.Series(
                np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
            )
            for j, lang in enumerate(self.PREF):
                hit = all_toks.isin(self.stop_idx[lang]).to_numpy().astype(np.int64)
                c = np.concatenate(([0], np.cumsum(hit)))
                scores[:, j] = c[ends] - c[starts]
        best = np.argmax(scores, axis=1)
        langs = np.array(self.PREF, dtype=object)[best]
        langs[scores.max(axis=1) == 0] = "und"
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "lang_pred": langs.astype(str)}
        )


_WORKER_CACHE: dict = {}


def _lang_id_batch(df: pd.DataFrame) -> pd.DataFrame:
    # per-worker-process cached LangId: compile-once without an actor pool
    # (the pool's fixed concurrency + startup latency measured ~2s at 32
    # CPUs on small corpora; pools pay off when per-actor setup is expensive,
    # and three 10-word hash indexes are not)
    lid = _WORKER_CACHE.get("langid")
    if lid is None:
        lid = LangId()
        _WORKER_CACHE["langid"] = lid
    return lid(df)


def lang_id(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir)
    return (
        ds.map_batches(_lang_id_batch, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


_FNV_BASIS = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def _fnv1a_tokens(all_toks: np.ndarray) -> np.ndarray:
    """Vectorized FNV-1a 64 over the ASCII bytes of each token: the fold runs
    over CHAR POSITIONS (max token length iterations of whole-array uint64
    ops), not over tokens — no per-token Python.

    Token chars are ASCII by construction (the \\w+ token regex), so byte
    values == code points and the DuckDB oracle can recompute the identical
    hash with ascii(t[j])."""
    if len(all_toks) == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.char.str_len(all_toks.astype(str))
    flat = np.frombuffer("".join(all_toks.tolist()).encode(), dtype=np.uint8)
    offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
    maxlen = int(lens.max())
    acc = np.full(len(all_toks), _FNV_BASIS, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = lens > j
            b = flat[offs[m] + j].astype(np.uint64)
            acc[m] = (acc[m] ^ b) * _FNV_PRIME
    return acc


def fingerprints(sf_dir: str) -> pd.DataFrame:
    """Order-sensitive 64-bit doc fingerprint (SQL-checkable):

        fingerprint = ( sum over tokens t_i of  i * fnv1a64(t_i) )  mod 2^64

    with i 1-based (matching DuckDB's list_transform (x, i) index). The
    position weight makes it order-sensitive; the commutative sum makes the
    engine side a single segmented reduction (uint64 cumsum-difference,
    which wraps mod 2^64 exactly like the SQL's HUGEINT % 2^64)."""
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy()
        tok_lists, counts, starts, ends = _segment_tokens(texts, tok)
        fps = np.zeros(len(df), dtype=np.uint64)
        if counts.sum():
            all_toks = np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists if t]
            )
            h = _fnv1a_tokens(all_toks)
            # 1-based position within each doc
            pos = (np.arange(len(h), dtype=np.int64) - np.repeat(starts, counts) + 1).astype(
                np.uint64
            )
            with np.errstate(over="ignore"):
                hw = h * pos
                cum = np.concatenate(
                    ([np.uint64(0)], np.cumsum(hw, dtype=np.uint64))
                )
            fps = cum[ends] - cum[starts]  # uint64 wraparound == mod 2^64
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "fingerprint": fps})

    return ds.map_batches(f, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)


def top_tokens(sf_dir: str, k: int = 100) -> pd.DataFrame:
    """Global token-frequency top-k over the corpus.

    Combiner pattern: tokens are exploded and counted WITHIN each batch
    (per-batch partial counts shrink the exchange from one row per token
    occurrence to one row per distinct token per block), then one small
    token-keyed groupby-sum merges the partials, then a per-block partial
    top-k with deterministic (cnt DESC, token ASC) tie-break. At 100 TB the
    exchange carries |vocab| x blocks rows, never the corpus."""
    from .relational import grouped_agg, topk

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in tok.findall(t.lower())]
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(toks).value_counts()
        return pd.DataFrame(
            {"token": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)}
        )

    partials = ds.map_batches(partial, batch_format="pandas")
    merged = grouped_agg(partials, ["token"], {"cnt": ("cnt", "sum")})
    out = topk(merged, "cnt", k, descending=True, tie_cols=["token"])
    out["cnt"] = out["cnt"].astype("int64")
    return out[["token", "cnt"]]


_STRAT_MULT = 2654435761  # Knuth multiplicative constant
_STRAT_PRIME = 1000003


def _strat_hash(doc_id: np.ndarray) -> np.ndarray:
    """(doc_id % 1000003) * 2654435761 % 2^32 — pure int arithmetic that
    DuckDB BIGINT evaluates without overflow (max product ~2.7e15 < 2^63),
    so the oracle is the same expression, not a matching hash library."""
    return (doc_id.astype(np.int64) % _STRAT_PRIME) * _STRAT_MULT % (1 << 32)


def stratified_sample(sf_dir: str, n_per_group: int = 20) -> pd.DataFrame:
    """Deterministic per-language sample: rank docs within each ``lang`` by a
    multiplicative hash of doc_id (ties by doc_id) and keep the first
    ``n_per_group``. Per-batch partial top-n per group bounds every exchange
    row count at groups x n per block — the corpus text never moves."""
    ds = _read_docs(sf_dir, columns=("doc_id", "lang"))

    def part(df: pd.DataFrame) -> pd.DataFrame:
        h = _strat_hash(df["doc_id"].to_numpy())
        d = pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "lang": df["lang"].to_numpy(), "h": h}
        )
        d = d.sort_values(["lang", "h", "doc_id"], kind="stable")
        return d.groupby("lang", sort=False).head(n_per_group)

    # partials are tiny (groups x n per block): one driver-side merge ranks
    # the global winners exactly like the per-block pass did
    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["lang", "h", "doc_id"], kind="stable")
    out = parts.groupby("lang", sort=False).head(n_per_group).copy()
    out["rn"] = out.groupby("lang").cumcount() + 1
    return (
        out[["doc_id", "lang", "rn"]]
        .astype({"rn": "int64"})
        .sort_values(["lang", "rn"])
        .reset_index(drop=True)
    )


_SCRUB_EMAIL = r"[A-Za-z0-9_.]+@[A-Za-z0-9_.]+"
_SCRUB_NUM = r"[0-9]{6,}"


def scrub_pii(sf_dir: str) -> pd.DataFrame:
    """Mask emails then long digit runs (RE2 semantics on BOTH sides: Arrow's
    replace_substring_regex and DuckDB's regexp_replace are RE2, so the SQL
    oracle is the same pattern, not a re-implementation). ``n_masked`` counts
    the sequential replacements (digit runs counted on the email-scrubbed
    text, mirroring the replace order)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read_docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        text = pc.cast(t["text"], pa.string())
        n_email = pc.count_substring_regex(text, _SCRUB_EMAIL)
        step1 = pc.replace_substring_regex(text, _SCRUB_EMAIL, "<email>")
        n_num = pc.count_substring_regex(step1, _SCRUB_NUM)
        clean = pc.replace_substring_regex(step1, _SCRUB_NUM, "<num>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "clean_text": clean,
                "n_masked": pc.cast(pc.add(n_email, n_num), pa.int64()),
            }
        )

    return (
        ds.map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def tfidf_top_terms(sf_dir: str) -> pd.DataFrame:
    """Per-document top TF-IDF term (keyword-extraction shape).

    Two corpus passes, one vocab-sized exchange:
    pass 1 computes document frequencies — each batch emits one row per
    distinct token it contains (a doc's text lives in exactly one row, so
    per-batch distinct (doc, token) counts sum to the exact global df) and
    a token-keyed groupby merges them; the merged vocab table broadcasts
    once via ``ray.put`` (bounded by vocab size; past a broadcast budget
    this becomes a token-keyed hash join, same as the places-index
    fallback). Pass 2 re-tokenizes per batch, probes the broadcast for df,
    scores, and picks each doc's argmax WITHIN the batch — no per-doc
    exchange at all.

    Score = tf · (N+1)/(df+1): the idf is the raw inverse frequency ratio,
    NOT log-scaled — one integer product (exact ≤ 2⁵³) and one IEEE
    division are bit-identical between numpy and DuckDB, where ln() is a
    libm call that differs by 1 ulp across implementations (the float-parity
    rule from the geodesic kernels: mirror the reduction primitive, or
    don't use it). Ranking is unchanged for any fixed df ordering.
    Ties on score break by token ascending in both engine and SQL.
    """
    import ray

    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in set(tok.findall(t.lower()))]
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object), "df": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(toks).value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(object), "df": vc.to_numpy(np.int64)})

    vocab = grouped_agg(
        ds.map_batches(df_partial, batch_format="pandas"), ["token"], {"df": ("df", "sum")}
    ).to_pandas()
    n_docs = int(ds.count())
    vocab_ref = ray.put((pd.Index(vocab["token"]), vocab["df"].to_numpy(np.int64)))

    def score_part(df: pd.DataFrame) -> pd.DataFrame:
        index, df_arr = ray.get(vocab_ref)
        per_doc = [tok.findall(t.lower()) for t in df["text"]]
        lens = np.array([len(x) for x in per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "token": pd.Series([], dtype=object),
                    "tf": pd.Series([], dtype="int64"),
                    "df": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        flat = pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(np.int64), lens),
                "token": np.array([w for ws in per_doc for w in ws], dtype=object),
            }
        )
        tf = flat.groupby(["doc_id", "token"], sort=False).size().reset_index(name="tf")
        d = df_arr[index.get_indexer(tf["token"])]
        tf["df"] = d
        tf["score"] = (tf["tf"].to_numpy(np.int64) * (n_docs + 1)).astype(np.float64) / (
            d + 1
        ).astype(np.float64)
        tf = tf.sort_values(
            ["doc_id", "score", "token"], ascending=[True, False, True], kind="stable"
        )
        return tf.drop_duplicates("doc_id")[["doc_id", "token", "tf", "df", "score"]]

    out = ds.map_batches(score_part, batch_format="pandas").to_pandas()
    out["tf"] = out["tf"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def chunk_documents(sf_dir: str, *, size: int = 32, step: int = 24) -> pd.DataFrame:
    """Split each document into overlapping token windows (LLM-ingest shape).

    Pure flat-map fanout: every chunk is derived from its own doc inside the
    batch that holds the doc — no exchange at all, output row count ~n/step
    per doc. Chunk starts are ``range(0, n_tokens, step)`` (the trailing
    window may be shorter than ``size``); chunk text is the tokens joined by
    a single space — tokenization is the SAME normalization the rest of the
    textstats family uses, so chunk boundaries are reproducible in SQL
    (DuckDB list slicing over regexp_extract_all).
    """
    ds = _read_docs(sf_dir)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        return _chunk_batch(df, size, step)

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def _chunk_batch(df: pd.DataFrame, size: int, step: int) -> pd.DataFrame:
    """Per-batch chunk expansion shared by chunk_documents and the mixture
    (so the mixture's chunk side can stream instead of collecting)."""
    tok = re.compile(_TOKEN_RE)
    doc_ids, chunk_ids, starts, n_toks, texts = [], [], [], [], []
    for did, t in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
        toks = tok.findall(t)
        n = len(toks)
        for ci, s in enumerate(range(0, n, step)):
            piece = toks[s : s + size]
            doc_ids.append(did)
            chunk_ids.append(ci)
            starts.append(s)
            n_toks.append(len(piece))
            texts.append(" ".join(piece))
    return pd.DataFrame(
        {
            "doc_id": pd.Series(doc_ids, dtype="int64"),
            "chunk_id": pd.Series(chunk_ids, dtype="int64"),
            "start_tok": pd.Series(starts, dtype="int64"),
            "n_tokens": pd.Series(n_toks, dtype="int64"),
            "chunk_text": pd.Series(texts, dtype=object),
        }
    )


# GPT-2-style pre-tokenizer, restricted to syntax RE2 and Python re share
# (no lookahead, no \p classes): contractions, space-prefixed letter runs,
# digit runs, punctuation runs, whitespace runs.
_BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+|\s+"


def token_counts_bpe(sf_dir: str) -> pd.DataFrame:
    """Token counts under a BPE-ish pre-tokenizer (the segmentation an LLM
    tokenizer applies before merges — the practical unit for data budgets).

    Fully vectorized: Arrow's ``count_substring_regex`` runs the RE2 pattern
    over the whole column with no per-row Python; the oracle runs the SAME
    pattern through DuckDB's RE2, so both sides share one regex engine
    semantics (the scrub_pii precedent).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _read_docs(sf_dir)

    def f(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bpe_tokens": pc.cast(
                    pc.count_substring_regex(t["text"], _BPE_RE), pa.int64()
                ),
            }
        )

    out = ds.map_batches(f, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def top_bigrams(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Global top-k token bigrams (adjacent-pair counts within each doc).

    Same combiner shape as top_tokens: pairs are formed and counted WITHIN
    each batch (vectorized: one token explode, adjacent join per doc), one
    small bigram-keyed groupby merges partials, partial top-k finishes.
    """
    from .relational import grouped_agg, topk

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        grams = []
        for t in df["text"]:
            ws = tok.findall(t.lower())
            grams.extend(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        if not grams:
            return pd.DataFrame(
                {"bigram": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(grams).value_counts()
        return pd.DataFrame({"bigram": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)})

    merged = grouped_agg(ds.map_batches(partial, batch_format="pandas"), ["bigram"], {"cnt": ("cnt", "sum")})
    out = topk(merged, "cnt", k, descending=True, tie_cols=["bigram"])
    out["cnt"] = out["cnt"].astype("int64")
    return out[["bigram", "cnt"]]


def training_mixture(sf_dir: str, n: int = 300) -> pd.DataFrame:
    """Weighted deterministic mixture of two corpus views (whole documents at
    weight 2, their 32-token chunks at weight 1) into one training stream.

    Mixture sampling without randomness: every candidate row gets an integer
    priority key = hash(id) // weight (a deterministic integer analogue of
    the exponential-rank trick — doubling the weight halves the expected
    key, doubling the draw rate), the union streams through the partial
    top-k (smallest keys win), and provenance rides along as a column. All
    arithmetic is BIGINT-safe (operands reduced mod 2^31 before the
    multiplicative hash) so the SQL oracle evaluates the identical
    expressions.
    """
    from .relational import topk

    docs = _read_docs(sf_dir)

    def key_docs(df: pd.DataFrame) -> pd.DataFrame:
        h = ((df["doc_id"].to_numpy(np.int64) % 2147483648) * 2654435761) % 4294967296
        return pd.DataFrame(
            {
                "source": np.array(["docs"] * len(df), dtype=object),
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "chunk_id": np.full(len(df), -1, dtype=np.int64),
                "text": df["text"].to_numpy(object),
                "mix_key": (h // 2).astype(np.int64),
            }
        )

    def key_chunks(df: pd.DataFrame) -> pd.DataFrame:
        chunks = _chunk_batch(df, 32, 24)
        ch = (
            (chunks["doc_id"].to_numpy(np.int64) * 1000003
             + chunks["chunk_id"].to_numpy(np.int64))
            % 2147483648
        ) * 2654435761 % 4294967296
        return pd.DataFrame(
            {
                "source": np.array(["chunk"] * len(chunks), dtype=object),
                "doc_id": chunks["doc_id"].to_numpy(np.int64),
                "chunk_id": chunks["chunk_id"].to_numpy(np.int64),
                "text": chunks["chunk_text"].to_numpy(object),
                "mix_key": (ch // 1).astype(np.int64),
            }
        )

    # BOTH sides stream: the chunk expansion runs inside map_batches on a
    # second scan of the same lazy read — only the n smallest keys ever
    # reach the driver (the collect-then-from_pandas form OOMed by design
    # review at corpus scale)
    stream = docs.map_batches(key_docs, batch_format="pandas").union(
        _read_docs(sf_dir).map_batches(key_chunks, batch_format="pandas")
    )
    out = topk(stream, "mix_key", n, descending=False, tie_cols=["source", "doc_id", "chunk_id"])
    for c in ("doc_id", "chunk_id", "mix_key"):
        out[c] = out[c].astype("int64")
    return out[["source", "doc_id", "chunk_id", "text", "mix_key"]]


def _doc_ngrams(ws: list[str], n: int) -> list[str]:
    """Space-joined n-token windows (all positions, duplicates included)."""
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


_DECON_MOD = 83  # benchmark membership rule: doc_id % 83 == 0 (deterministic)


def decontaminate_docs(sf_dir: str, *, n: int = 5, bench_mod: int = _DECON_MOD) -> pd.DataFrame:
    """Benchmark decontamination: flag every training document sharing any
    n-token window with the benchmark suite (here: the deterministic
    ``doc_id % 83 == 0`` subset — the shape is what matters, not the rule).

    Scale shape: the BENCHMARK side is small by definition (an eval suite,
    not the corpus), so its distinct n-gram set is collected once and
    broadcast via ``ray.put``; the corpus side streams through one
    ``map_batches`` probe — per batch, ONE lexsort dedups (doc, gram) and
    ONE searchsorted against the broadcast sorted array scores every doc.
    No corpus-sized exchange anywhere. ``n_overlap`` counts the doc's
    DISTINCT grams hitting the benchmark set.
    """
    import ray

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def bench_partial(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[df["doc_id"].to_numpy(np.int64) % bench_mod == 0]
        grams = sorted(
            {g for t in sel["text"] for g in _doc_ngrams(tok.findall(t.lower()), n)}
        )
        return pd.DataFrame({"gram": pd.Series(grams, dtype=object)})

    bench = ds.map_batches(bench_partial, batch_format="pandas").to_pandas()
    bench_arr = (
        np.sort(bench["gram"].unique()).astype(object)
        if len(bench)
        else np.empty(0, dtype=object)
    )
    bench_ref = ray.put(bench_arr)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bench_ref)
        ids = df["doc_id"].to_numpy(np.int64)
        per_doc = [_doc_ngrams(tok.findall(t.lower()), n) for t in df["text"]]
        lens = np.array([len(g) for g in per_doc], dtype=np.int64)
        n_ov = np.zeros(len(df), dtype=np.int64)
        if lens.sum() and len(b):
            flat = np.array([g for gs in per_doc for g in gs], dtype=object)
            did = np.repeat(np.arange(len(df)), lens)
            o = np.lexsort((flat, did))
            flat, did = flat[o], did[o]
            first = np.r_[True, (did[1:] != did[:-1]) | (flat[1:] != flat[:-1])]
            flat, did = flat[first], did[first]
            idx = np.searchsorted(b, flat)
            idx_c = np.minimum(idx, len(b) - 1)
            hit = (idx < len(b)) & (b[idx_c] == flat)
            np.add.at(n_ov, did[hit], 1)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_overlap": n_ov,
                "contaminated": (n_ov > 0).astype(np.int64),
            }
        )

    out = ds.map_batches(probe, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def frequent_ngrams(sf_dir: str, *, n: int = 5, min_docs: int = 2, k: int = 50) -> pd.DataFrame:
    """Boilerplate detection: n-grams appearing in ≥ ``min_docs`` DISTINCT
    documents, top-k by document frequency (ties by gram ascending).

    Same combiner shape as top_tokens: a doc's text lives in exactly one
    row, so per-batch distinct-(doc, gram) counts sum to the exact global
    document frequency; the exchange carries one row per distinct gram per
    block, never the corpus."""
    import pyarrow as pa

    from .relational import grouped_agg_direct, topk

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        grams: list[str] = []
        for t in df["text"]:
            grams.extend(set(_doc_ngrams(tok.findall(t.lower()), n)))
        if not grams:
            return pd.DataFrame(
                {"gram": pd.Series([], dtype=object), "df": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(grams).value_counts()
        return pd.DataFrame({"gram": vc.index.to_numpy(object), "df": vc.to_numpy(np.int64)})

    # gram cardinality ~ corpus-wide distinct n-grams: the high-cardinality
    # grouped-agg path (direct hash exchange; see grouped_agg_direct)
    merged = grouped_agg_direct(
        ds.map_batches(partial, batch_format="pandas"),
        ["gram"],
        {"df": ("df", "sum")},
        empty_schema=pa.schema([("gram", pa.string()), ("df", pa.int64())]),
    )
    filt = merged.map_batches(
        lambda d: d[d["df"] >= min_docs], batch_format="pandas"
    )
    out = topk(
        filt, "df", k, descending=True, tie_cols=["gram"],
        empty_schema=pa.schema([("gram", pa.string()), ("df", pa.int64())]),
    )
    out["df"] = out["df"].astype("int64")
    return out[["gram", "df"]]


_SEARCH_TERMS = ("merge", "window", "batch")


def search_docs_all_terms(
    sf_dir: str, terms: tuple[str, ...] = _SEARCH_TERMS
) -> pd.DataFrame:
    """Boolean AND search: documents whose token stream contains EVERY query
    term, with the total occurrence count. This is the map side of an
    inverted-index probe — embarrassingly parallel (no exchange at all):
    each batch tokenizes once and takes one segmented equality count per
    term (cumsum-difference, the lang_id shape)."""
    import pyarrow as pa

    from ..ops import to_pandas_typed

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy()
        tok_lists, counts, starts, ends = _segment_tokens(texts, tok)
        tf = np.zeros((len(df), len(terms)), dtype=np.int64)
        if counts.sum():
            all_toks = pd.Series(
                np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
            )
            for j, term in enumerate(terms):
                hit = (all_toks == term).to_numpy().astype(np.int64)
                c = np.concatenate(([0], np.cumsum(hit)))
                tf[:, j] = c[ends] - c[starts]
        keep = (tf > 0).all(axis=1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                "n_occurrences": tf.sum(axis=1)[keep],
            }
        )

    out = to_pandas_typed(
        ds.map_batches(f, batch_format="pandas"),
        pa.schema([("doc_id", pa.int64()), ("n_occurrences", pa.int64())]),
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def bigram_lift(sf_dir: str, k: int = 20, min_count: int = 5) -> pd.DataFrame:
    """Top-k token bigrams by LIFT — count(xy)·N / (count(x)·count(y)), the
    log-free PMI analogue (one integer product each side and ONE IEEE
    division, so the score is bit-identical in SQL, unlike log-PMI where
    ln() differs by 1 ulp across libms).

    Composition: the bigram and unigram count passes are the existing
    combiner shapes; the unigram table broadcasts (vocab-bounded, same
    budget note as TF-IDF) and lift + top-k finish on counts only.
    """
    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in tok.findall(t.lower())]
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(toks).value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)})

    def bi_partial(df: pd.DataFrame) -> pd.DataFrame:
        grams = []
        for t in df["text"]:
            ws = tok.findall(t.lower())
            grams.extend(f"{a} {b}" for a, b in zip(ws, ws[1:]))
        if not grams:
            return pd.DataFrame(
                {"bigram": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(grams).value_counts()
        return pd.DataFrame({"bigram": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)})

    import ray

    uni = grouped_agg(
        ds.map_batches(uni_partial, batch_format="pandas"), ["token"], {"cnt": ("cnt", "sum")}
    ).to_pandas()
    n_tokens = int(uni["cnt"].sum())
    uni = uni.sort_values("token")
    uni_ref = ray.put((uni["token"].to_numpy(object), uni["cnt"].to_numpy(np.int64)))

    bi = grouped_agg(
        ds.map_batches(bi_partial, batch_format="pandas"), ["bigram"], {"cnt": ("cnt", "sum")}
    )

    def add_lift(df: pd.DataFrame) -> pd.DataFrame:
        # lift computed map-side against the broadcast unigram table, then
        # the streaming partial top-k merges — the driver never holds the
        # full >=min_count bigram table (it grows with the corpus)
        toks, cnts = ray.get(uni_ref)
        df = df[df["cnt"] >= min_count].copy()
        if df.empty:
            df["lift"] = pd.Series([], dtype="float64")
            return df
        parts = df["bigram"].str.split(" ", n=1, expand=True)
        cx = cnts[np.searchsorted(toks, parts[0].to_numpy(object))]
        cy = cnts[np.searchsorted(toks, parts[1].to_numpy(object))]
        cxy = df["cnt"].to_numpy(np.int64)
        df["lift"] = (cxy * n_tokens).astype(np.float64) / (cx * cy).astype(np.float64)
        return df

    from .relational import topk as _topk

    import pyarrow as pa

    scored = bi.map_batches(add_lift, batch_format="pandas")
    out = _topk(
        scored, "lift", k, descending=True, tie_cols=["bigram"],
        empty_schema=pa.schema(
            [("bigram", pa.string()), ("cnt", pa.int64()), ("lift", pa.float64())]
        ),
    )
    out["cnt"] = out["cnt"].astype("int64")
    return out[["bigram", "cnt", "lift"]].reset_index(drop=True)


def doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Gopher-style repetition profile per document: token count, distinct
    token count, and the modal token's frequency (all exact integers — the
    duplicate-token and top-token-fraction quality gates divide these
    downstream). Tokenization is the family spec (_TOKEN_RE, case-sensitive,
    same as token_counts). Purely per-doc → embarrassingly parallel
    map_batches, no exchange."""
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        n = np.empty(len(df), np.int64)
        nd = np.empty(len(df), np.int64)
        top = np.empty(len(df), np.int64)
        for i, t in enumerate(df["text"]):
            toks = tok.findall(t)
            n[i] = len(toks)
            if toks:
                vc = Counter(toks)
                nd[i] = len(vc)
                top[i] = max(vc.values())
            else:
                nd[i] = 0
                top[i] = 0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": n,
                "n_distinct": nd,
                "top_count": top,
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# --- inverted index: one-time posting layout + partition-pruned search --------

_IDX_BUCKETS = 64
_INVIDX_CACHE: dict[tuple[str, int], str] = {}


def _token_bucket(tokens: pd.Series, n_buckets: int) -> np.ndarray:
    """Deterministic token → bucket (siphash; stable across processes)."""
    return (pd.util.hash_pandas_object(tokens, index=False).to_numpy() %
            np.uint64(n_buckets)).astype(np.int64)


def build_inverted_index(sf_dir: str, *, n_buckets: int = _IDX_BUCKETS) -> str:
    """One-time token-bucket-partitioned posting layout (the IVF pattern
    applied to text search): rows (bucket, token, doc_id, tf) written
    hive-partitioned as ``bucket=<b>/``, so a query touches ONLY its query
    terms' buckets — never the corpus. Tagged by the corpus file identity
    (ns mtime + size) plus the pandas major version (the bucket hash is
    pandas' siphash), built atomically via tmp-dir + os.replace.
    """
    import pyarrow.parquet as papq

    docs_path = os.path.join(sf_dir, "documents.parquet")
    key = (os.path.abspath(sf_dir), n_buckets)
    if key in _INVIDX_CACHE:
        return _INVIDX_CACHE[key]
    st = os.stat(docs_path)
    import hashlib

    tag = hashlib.sha256(
        f"{key[0]}|{n_buckets}|{st.st_mtime_ns}.{st.st_size}|pd{pd.__version__}".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join("/tmp/graft_invidx", tag)
    if os.path.isdir(index_dir):
        _INVIDX_CACHE[key] = index_dir
        return index_dir

    tok = re.compile(_TOKEN_RE)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy()
        tok_lists, counts, starts, ends = _segment_tokens(texts, tok)
        if not counts.sum():
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype=np.int64),
                 "token": pd.Series([], dtype=object),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "tf": pd.Series([], dtype=np.int64)}
            )
        all_toks = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
        doc_ids = np.repeat(df["doc_id"].to_numpy(np.int64), counts)
        g = (
            pd.DataFrame({"token": all_toks, "doc_id": doc_ids})
            .groupby(["token", "doc_id"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        g["bucket"] = _token_bucket(g["token"], n_buckets)
        g["tf"] = g["tf"].astype(np.int64)
        return g[["bucket", "token", "doc_id", "tf"]]

    tmp_dir = index_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    _read_docs(sf_dir).map_batches(postings, batch_format="pandas").write_parquet(
        tmp_dir, partition_cols=["bucket"]
    )
    os.replace(tmp_dir, index_dir)
    _INVIDX_CACHE[key] = index_dir
    return index_dir


def search_docs_indexed(
    sf_dir: str, terms: tuple[str, ...] = _SEARCH_TERMS, *, n_buckets: int = _IDX_BUCKETS
) -> pd.DataFrame:
    """Boolean AND search through the inverted index: read ONLY the query
    terms' bucket partitions, keep exact-term rows, and co-group by doc_id —
    a doc qualifies iff its distinct-term row count equals len(terms)
    (build emits one row per (token, doc)). Same result contract (and the
    same SQL oracle) as the full-scan ``search_docs_all_terms``; the scan
    version is the no-index baseline, this is the 100-TB query path.
    """
    import ray.data as rd

    from .relational import grouped_agg

    index_dir = build_inverted_index(sf_dir, n_buckets=n_buckets)
    import glob as _glob

    buckets = sorted(set(_token_bucket(pd.Series(list(terms)), n_buckets).tolist()))
    # enumerate files: a multi-path read_parquet wants files, not hive dirs
    paths = [
        p
        for b in buckets
        for p in sorted(_glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
    ]
    if not paths:
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype=np.int64),
             "n_occurrences": pd.Series([], dtype=np.int64)}
        )
    term_set = set(terms)

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        hit = df[df["token"].isin(term_set)]
        return pd.DataFrame(
            {"doc_id": hit["doc_id"].astype(np.int64), "tf": hit["tf"].astype(np.int64)}
        )

    agg = grouped_agg(
        rd.read_parquet(paths, columns=["token", "doc_id", "tf"]).map_batches(
            probe, batch_format="pandas"
        ),
        ["doc_id"],
        {"n_occurrences": ("tf", "sum"), "n_terms": (None, "count")},
    ).to_pandas()
    out = agg[agg["n_terms"] == len(terms)][["doc_id", "n_occurrences"]]
    out["doc_id"] = out["doc_id"].astype("int64")
    out["n_occurrences"] = out["n_occurrences"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# --- exact duplicate-span profile (per-doc shared-shingle counts) --------------


def duplicate_spans(sf_dir: str, *, n: int = 8, num_parts: int = 8) -> pd.DataFrame:
    """Per-document count of DISTINCT n-token windows shared verbatim with
    at least one other document — the doc-level signal of exact substring
    duplication (the dedup-before-training precursor: a high count marks a
    doc whose text is copied elsewhere in the corpus).

    Distributed shape: one fused split wave turns each doc row into its
    distinct (gram, doc_id) pairs and hash-partitions by gram, so every
    gram's full posting sits in exactly one partition; there the document
    frequency is a single groupby-transform and each partition emits only
    per-doc partial counts (≤ docs-in-partition rows). A final doc-keyed
    grouped sum merges partials. Nothing quadratic anywhere: work and
    exchange are linear in total shingle count.
    """
    import pyarrow as pa

    from ..ops import direct_partitioned_map
    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        grams: list[str] = []
        docs: list[int] = []
        for did, txt in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            gs = set(_doc_ngrams(tok.findall(txt.lower()), n))
            grams.extend(gs)
            docs.extend([int(did)] * len(gs))
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(np.asarray(docs, dtype=np.int64)),
            }
        )

    schema = pa.schema([("gram", pa.string()), ("doc_id", pa.int64())])

    def per_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        # a doc contributes each gram once (set per doc) → group size == df
        dup = df[df.groupby("gram")["gram"].transform("size") > 1]
        out = dup.groupby("doc_id").size().reset_index(name="n")
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
                "n": pa.array(out["n"].to_numpy(np.int64)),
            }
        )

    partials = direct_partitioned_map(
        ds.materialize(), ["gram"], num_parts, per_part, schema, pre=pre
    )
    agg = grouped_agg(partials, ["doc_id"], {"n_dup_spans": ("n", "sum")}).to_pandas()
    if agg.empty:  # no shared window anywhere → typed empty result
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "n_dup_spans": pd.Series([], dtype="int64")}
        )
    agg["doc_id"] = agg["doc_id"].astype("int64")
    agg["n_dup_spans"] = agg["n_dup_spans"].astype("int64")
    return agg.sort_values("doc_id").reset_index(drop=True)


def lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Language-ID confusion matrix: corpus truth label × n-gram-heuristic
    prediction, counted per pair. One stateless pass (the lang_id kernel
    runs in-batch against the truth column already in the row — no join),
    partial pair counts per block, one tiny grouped exchange."""
    from .relational import grouped_agg

    ds = _read_docs(sf_dir, columns=("doc_id", "text", "lang"))

    def f(df: pd.DataFrame) -> pd.DataFrame:
        pred = _lang_id_batch(df)
        out = pd.DataFrame(
            {"lang": df["lang"].to_numpy(object), "lang_pred": pred["lang_pred"].to_numpy(object)}
        )
        g = out.groupby(["lang", "lang_pred"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = grouped_agg(
        ds.map_batches(f, batch_format="pandas"), ["lang", "lang_pred"], {"n": ("n", "sum")}
    ).to_pandas()
    agg["n"] = agg["n"].astype("int64")
    return agg.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


# --- BPE vocabulary induction over the word histogram ---------------------------


def _bpe_train(word_counts: list[tuple[str, int]], n_merges: int) -> list[tuple[int, str, str, int]]:
    """Classic BPE merges over a (word, count) histogram: each word starts as
    its character sequence; per round, the adjacent symbol pair with the
    highest count-weighted frequency merges (ties → lexicographically
    smallest (left, right)). Returns (rank, left, right, pair_count).

    Plain scalar python by design: the histogram is vocab-bounded, so this
    runs on the driver and the oracle restates it verbatim."""
    seqs = [([c for c in w], int(cnt)) for w, cnt in word_counts]
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, cnt in seqs:
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), c = best
        merges.append((rank, left, right, int(c)))
        tok = left + right
        for sym, _ in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == left and sym[i + 1] == right:
                    sym[i : i + 2] = [tok]
                else:
                    i += 1
    return merges


def bpe_merges(sf_dir: str, *, n_merges: int = 20) -> pd.DataFrame:
    """Train the first ``n_merges`` BPE merges on the corpus.

    The scale-correct trainer shape (how production BPE trainers work):
    the corpus collapses to a WORD HISTOGRAM first — one combiner-style
    token-count exchange, vocab-bounded — and the merge loop runs on the
    driver over that histogram only. Corpus size changes the histogram
    counts, not the driver's work; the merge loop never re-reads text.
    """
    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter(w for t in df["text"] for w in tok.findall(t.lower()))
        return pd.DataFrame(
            {"word": np.array(list(c.keys()), dtype=object),
             "cnt": np.fromiter(c.values(), dtype=np.int64, count=len(c))}
        )

    hist = grouped_agg(
        ds.map_batches(partial, batch_format="pandas"), ["word"], {"cnt": ("cnt", "sum")}
    ).to_pandas()
    # deterministic driver order (the trainer itself is order-insensitive,
    # but fixed inputs make debugging reproducible)
    hist = hist.sort_values("word", kind="stable")
    merges = _bpe_train(list(zip(hist["word"], hist["cnt"])), n_merges)
    return pd.DataFrame(merges, columns=["rank", "left", "right", "pair_count"]).astype(
        {"rank": "int64", "pair_count": "int64"}
    )


def heavy_hitters(sf_dir: str, *, k: int = 200) -> pd.DataFrame:
    """All tokens with global frequency strictly above total_tokens/k —
    the frequency-threshold heavy-hitters operator (Misra–Gries shape).

    Two corpus passes, one tiny exchange:
    pass 1 emits each batch's LOCAL heavy hitters (count_b·k > n_b, at most
    k−1 tokens per batch — the Misra–Gries survivor set of that batch). Any
    global heavy hitter must be a local one somewhere (if count_b·k ≤ n_b in
    every batch, summing gives count·k ≤ n), so the union is a guaranteed
    candidate superset; false candidates are eliminated by pass 2's exact
    recount, which makes the OUTPUT independent of partitioning. Pass 2
    counts only the broadcast candidates plus a per-batch token total
    (sentinel row — "\\x00total" can't collide with [A-Za-z0-9_]+ tokens),
    one token-keyed groupby, strict cnt·k > total filter.

    100 TB note: the exchange carries ≤ (k−1)·num_blocks candidate partials
    + candidate counts — never the token stream; for extreme block counts
    the candidate union itself would go through one more local-threshold
    level (same argument, applied to merged summaries). No silent caps: the
    candidate set is exact by construction, not sampled.
    """
    import ray

    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)
    _SENTINEL = "\x00total"

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        toks = [w for t in df["text"] for w in tok.findall(t.lower())]
        if not toks:
            return pd.DataFrame({"token": pd.Series([], dtype=object)})
        vc = pd.Series(toks).value_counts()
        keep = vc[vc * k > len(toks)]
        return pd.DataFrame({"token": keep.index.to_numpy(object)})

    cands = ds.map_batches(cand, batch_format="pandas").to_pandas()
    if cands.empty or "token" not in cands.columns:
        # no batch had a local heavy hitter -> no global one can exist
        return pd.DataFrame(
            {"token": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
        )
    cand_set = frozenset(cands["token"].tolist())
    cand_ref = ray.put(cand_set)

    def recount(df: pd.DataFrame) -> pd.DataFrame:
        cset = ray.get(cand_ref)
        toks = [w for t in df["text"] for w in tok.findall(t.lower())]
        rows_t = [_SENTINEL]
        rows_c = [np.int64(len(toks))]
        if toks:
            s = pd.Series(toks)
            vc = s[s.isin(cset)].value_counts()
            rows_t += vc.index.tolist()
            rows_c += vc.to_numpy(np.int64).tolist()
        return pd.DataFrame(
            {"token": pd.Series(rows_t, dtype=object), "cnt": pd.Series(rows_c, dtype="int64")}
        )

    merged = grouped_agg(
        ds.map_batches(recount, batch_format="pandas"), ["token"], {"cnt": ("cnt", "sum")}
    ).to_pandas()
    total = int(merged.loc[merged["token"] == _SENTINEL, "cnt"].iloc[0])
    out = merged[(merged["token"] != _SENTINEL) & (merged["cnt"] * k > total)]
    out = out.sort_values(["cnt", "token"], ascending=[False, True], kind="stable")
    return out.reset_index(drop=True).astype({"cnt": "int64"})


BM25_TERMS = ("join", "scan", "dup")  # fixed multi-term query, df-diverse
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_search(sf_dir: str, *, terms: tuple = BM25_TERMS, k: int = 15) -> pd.DataFrame:
    """Top-k documents by BM25 for a fixed multi-term query (ranked
    retrieval over the corpus, the scoring sibling of the boolean searches).

    Two passes, no corpus exchange: pass 1 reduces one stats row per batch
    (n_docs, total tokens, per-term df — df is exact per batch because a
    doc's text lives in one row) and the driver sums them; pass 2 rescans,
    scores each doc and keeps a per-batch top-k, merged on the driver
    (bounded by k·num_blocks rows).

    Float parity (the repo's ordered-fold rule): idf is the RATIONAL BM25
    idf (N−df+0.5)/(df+0.5) — no ln(), whose last-ulp differs across libms —
    and the per-doc score is the fixed-order fold ((w₀+w₁)+w₂) with exact-0
    for absent terms; every divide/multiply is parenthesized identically in
    the paired DuckDB SQL, so float64 results are bit-equal and the top-k
    cut is deterministic. Ties break by doc_id ascending on both sides.
    """
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)
    terms = tuple(terms)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        per_doc = [tok.findall(t.lower()) for t in df["text"]]
        row = {
            "n_docs": np.int64(len(per_doc)),
            "total": np.int64(sum(len(x) for x in per_doc)),
        }
        for i, term in enumerate(terms):
            row[f"df{i}"] = np.int64(sum(term in set(ws) for ws in per_doc))
        return pd.DataFrame([row])

    agg = ds.map_batches(stats, batch_format="pandas").to_pandas().sum()
    n_docs = int(agg["n_docs"])
    total_toks = int(agg["total"])
    # tokenless corpus: scores are all empty; keep avgdl finite (unused)
    avgdl = (
        np.float64(total_toks) / np.float64(n_docs) if total_toks else np.float64(1.0)
    )
    idf = np.array(
        [
            (np.float64(n_docs - int(agg[f"df{i}"])) + 0.5)
            / (np.float64(int(agg[f"df{i}"])) + 0.5)
            for i in range(len(terms))
        ]
    )

    def score_part(df: pd.DataFrame) -> pd.DataFrame:
        per_doc = [tok.findall(t.lower()) for t in df["text"]]
        lens = np.array([len(x) for x in per_doc], dtype=np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        doc_ids = df["doc_id"].to_numpy(np.int64)
        pos = np.repeat(np.arange(len(per_doc)), lens)
        flat = np.array([w for ws in per_doc for w in ws], dtype=object)
        dl = lens.astype(np.float64)
        denom_dl = BM25_K1 * ((1.0 - BM25_B) + BM25_B * (dl / avgdl))
        score = np.zeros(len(per_doc), np.float64)
        for i, term in enumerate(terms):
            tf = np.bincount(pos[flat == term], minlength=len(per_doc)).astype(
                np.float64
            )
            # literal 2.2, NOT K1+1.0 — the sum could round away from the
            # SQL literal's double and break bit-parity
            w = idf[i] * ((tf * 2.2) / (tf + denom_dl))
            w[tf == 0] = 0.0
            score = score + w  # fixed term order == SQL's explicit fold
        keep = score > 0
        out = pd.DataFrame({"doc_id": doc_ids[keep], "score": score[keep]})
        out = out.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
        return out.head(k)

    parts = ds.map_batches(score_part, batch_format="pandas").to_pandas()
    if parts.empty or "score" not in parts.columns:  # tokenless corpus
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    parts = parts.sort_values(["score", "doc_id"], ascending=[False, True], kind="stable")
    return parts.head(k).reset_index(drop=True).astype({"doc_id": "int64"})


def scrub_dup_ngrams(sf_dir: str, *, n: int = 8, num_parts: int = 8) -> pd.DataFrame:
    """Exact-substring scrub (the rewrite sibling of ``duplicate_spans``):
    any n-token window whose exact text occurs in ≥2 distinct documents is
    removed from EVERY document containing it — every token position covered
    by such a window is dropped and the survivors re-join with single spaces
    (Lee et al., "Deduplicating Training Data Makes Language Models Better":
    corpus-wide exact substring deduplication, here with the symmetric
    remove-all-copies rule so the result is order-free and deterministic).

    Output: one row per document — (doc_id, text_clean, n_kept, n_removed).

    Distributed shape (two chained exchanges, no broadcast, nothing
    quadratic):
      1. gram-keyed exchange — the split wave explodes each doc into
         (gram, doc_id, start) occurrence postings; each reduce partition
         owns its grams' full postings, keeps grams present in ≥2 distinct
         docs, and emits the covered (doc_id, start) window starts, ALREADY
         re-partitioned on doc_id (``emit_partitioned_on`` — no second split
         wave).
      2. doc-keyed cogroup of those covered starts against the docs table:
         per doc, mark positions [start, start+n) (one repeat/tile explode +
         per-doc searchsorted — no per-position Python), re-join the
         uncovered tokens.
    Work and exchange volume are linear in total window count; the rewritten
    text never re-enters an exchange (it is produced in the final reduce).
    """
    return _scrub_ds(_read_docs(sf_dir).materialize(), n=n, num_parts=num_parts)


def _scrub_ds(ds, *, n: int = 8, num_parts: int = 8) -> pd.DataFrame:
    """Dataset-level core of ``scrub_dup_ngrams`` (also the last stage of
    ``curate_corpus``). ``ds`` must be materialized with (doc_id, text)."""
    import pyarrow as pa

    from ..ops import direct_cogroup

    tok = re.compile(_TOKEN_RE)

    def pre_postings(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        grams: list[str] = []
        docs: list[int] = []
        starts: list[int] = []
        for did, txt in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            ws = tok.findall(txt.lower())
            gs = _doc_ngrams(ws, n)
            grams.extend(gs)
            docs.extend([int(did)] * len(gs))
            starts.extend(range(len(gs)))
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(np.asarray(docs, dtype=np.int64)),
                "start": pa.array(np.asarray(starts, dtype=np.int64)),
            }
        )

    post_schema = pa.schema(
        [("gram", pa.string()), ("doc_id", pa.int64()), ("start", pa.int64())]
    )
    cov_schema = pa.schema([("doc_id", pa.int64()), ("start", pa.int64())])

    def dup_starts(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return cov_schema.empty_table()
        # gram is "duplicated" iff ≥2 DISTINCT docs contain it
        ndocs = df.groupby("gram")["doc_id"].transform("nunique")
        cov = df[ndocs > 1]
        return pa.table(
            {
                "doc_id": pa.array(cov["doc_id"].to_numpy(np.int64)),
                "start": pa.array(cov["start"].to_numpy(np.int64)),
            }
        )

    covered = direct_cogroup(
        [ds],
        [["gram"]],
        num_parts,
        dup_starts,
        [post_schema],
        pres=[pre_postings],
        emit_partitioned_on=["doc_id"],
    )

    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("text_clean", pa.string()),
            ("n_kept", pa.int64()),
            ("n_removed", pa.int64()),
        ]
    )

    def rebuild(cov: pa.Table, docs: pa.Table) -> pa.Table:
        ddf = docs.to_pandas()
        if not len(ddf):
            return out_schema.empty_table()
        cdf = cov.to_pandas()
        per_doc = [tok.findall(t.lower()) for t in ddf["text"]]
        doc_ids = ddf["doc_id"].to_numpy(np.int64)
        lens = np.array([len(w) for w in per_doc], dtype=np.int64)
        offs = np.zeros(len(per_doc) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        covered_flat = np.zeros(int(offs[-1]), dtype=bool)
        if len(cdf):
            order = np.argsort(doc_ids, kind="stable")
            row = order[np.searchsorted(doc_ids[order], cdf["doc_id"].to_numpy(np.int64))]
            # explode each covered window start into its n positions at once
            base = offs[row] + cdf["start"].to_numpy(np.int64)
            pos = (base[:, None] + np.arange(n)[None, :]).ravel()
            covered_flat[pos] = True
        texts: list[str] = []
        kept = np.empty(len(per_doc), dtype=np.int64)
        for i, ws in enumerate(per_doc):
            keep_mask = ~covered_flat[offs[i] : offs[i + 1]]
            kept[i] = int(keep_mask.sum())
            texts.append(" ".join(w for w, k in zip(ws, keep_mask) if k))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "text_clean": pa.array(texts, pa.string()),
                "n_kept": pa.array(kept),
                "n_removed": pa.array(lens - kept),
            }
        )

    docs_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    out = direct_cogroup(
        [covered, ds],
        [["doc_id"], ["doc_id"]],
        num_parts,
        rebuild,
        [cov_schema, docs_schema],
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "text_clean": pd.Series([], dtype="object"),
                "n_kept": pd.Series([], dtype="int64"),
                "n_removed": pd.Series([], dtype="int64"),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True).astype(
        {"doc_id": "int64", "n_kept": "int64", "n_removed": "int64"}
    )


def pack_sequences(sf_dir: str, *, capacity: int = 512, bucket_width: int = 64,
                   num_parts: int = 8) -> pd.DataFrame:
    """GPT-style sequence packing: lay every document's tokens end-to-end in
    doc_id order and cut fixed-``capacity`` training bins, documents crossing
    bin boundaries (the standard causal-LM packing — no padding waste). Output
    per doc: (doc_id, tok_start, n_tokens, bin_start, bin_end) where
    tok_start is the doc's global token offset and [bin_start, bin_end] the
    bins it occupies (a 0-token doc degenerates to its insertion point's bin).

    Distributed shape = the ``running_totals`` prefix-scan pattern with
    doc_id-range buckets as the ordered scan key: one hash exchange
    co-locates each bucket, each partition scans its buckets locally and
    emits per-doc local offsets plus ONE total row per bucket; the driver
    exclusive-scans the tiny bucket-total vector and a final vectorized add
    shifts every doc by its bucket offset. All integers — exact regardless
    of partitioning. ``bucket_width`` only affects parallel granularity,
    never the result; at 10¹²-doc scale pick width ≈ docs/(parts·64).
    """
    import pyarrow as pa

    from ..ops import direct_partitioned_map

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n_tok = np.array([len(tok.findall(x.lower())) for x in df["text"]], np.int64)
        did = df["doc_id"].to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(did),
                "n_tokens": pa.array(n_tok),
                "bucket": pa.array(did // bucket_width),
            }
        )

    pre_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("bucket", pa.int64())]
    )
    out_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("local_start", pa.int64()),
        ]
    )

    def local_scan(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return out_schema.empty_table()
        df = df.sort_values(["bucket", "doc_id"], kind="stable")
        n = df["n_tokens"].to_numpy(np.int64)
        b = df["bucket"].to_numpy(np.int64)
        cum = np.cumsum(n) - n  # exclusive scan over the sorted partition
        # restart at each bucket boundary: subtract the bucket's first cum
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        base = np.repeat(cum[starts], np.diff(np.r_[starts, len(b)]))
        return pa.table(
            {
                "bucket": pa.array(b),
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(n),
                "local_start": pa.array(cum - base),
            }
        )

    scanned = direct_partitioned_map(
        ds.materialize(), ["bucket"], num_parts, local_scan, pre_schema, pre=pre
    ).to_pandas()
    if scanned.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "tok_start", "n_tokens", "bin_start", "bin_end")}
        )
    # driver: exclusive scan over per-bucket totals (one tiny row per bucket)
    totals = scanned.groupby("bucket")["n_tokens"].sum().sort_index()
    offsets = totals.cumsum().shift(fill_value=0)
    start = (
        scanned["bucket"].map(offsets).to_numpy(np.int64)
        + scanned["local_start"].to_numpy(np.int64)
    )
    n = scanned["n_tokens"].to_numpy(np.int64)
    last = np.where(n > 0, start + n - 1, start)
    out = pd.DataFrame(
        {
            "doc_id": scanned["doc_id"].astype("int64"),
            "tok_start": start,
            "n_tokens": n,
            "bin_start": start // capacity,
            "bin_end": last // capacity,
        }
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def span_corruption(sf_dir: str, *, mod: int = 5) -> pd.DataFrame:
    """T5-style span-corruption preprocessing: a deterministic ~1/``mod`` of
    token positions are masked (rule: (doc_id·1000003 + p·10007) mod ``mod``
    == 0 at 0-based position p — arithmetic, so the oracle restates it
    verbatim); consecutive masked tokens merge into one span, the inputs get
    one ``<extra_id_K>`` sentinel per span and the targets the sentinel
    followed by the masked tokens (the T5 denoising objective's example
    layout). Output (doc_id, inputs, targets, n_masked).

    Embarrassingly parallel: one stateless ``map_batches`` pass, no
    exchange — each doc's masking depends only on its own id and length.
    """
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        ids, inputs, targets, n_masked = [], [], [], []
        for did, txt in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            ws = tok.findall(txt.lower())
            p = np.arange(len(ws), dtype=np.int64)
            m = (int(did) * 1000003 + p * 10007) % mod == 0
            first = m & np.r_[True, ~m[:-1]] if len(ws) else m
            sid = np.cumsum(first) - 1
            inp, tgt = [], []
            for i, w in enumerate(ws):
                if not m[i]:
                    inp.append(w)
                elif first[i]:
                    s = f"<extra_id_{sid[i]}>"
                    inp.append(s)
                    tgt.append(f"{s} {w}")
                else:
                    tgt.append(w)
            ids.append(int(did))
            inputs.append(" ".join(inp))
            targets.append(" ".join(tgt))
            n_masked.append(int(m.sum()))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "inputs": pd.Series(inputs, dtype=object),
                "targets": pd.Series(targets, dtype=object),
                "n_masked": pd.Series(n_masked, dtype="int64"),
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def gopher_quality_filter(sf_dir: str) -> pd.DataFrame:
    """Gopher-rule quality gate (Rae et al. 2021 §A1.1, adapted to this
    corpus's tokenizer): per doc the exact integer components and a pass
    flag. Rules (all exact rational comparisons — no floats):
      R1  50 ≤ n_tokens ≤ 100000
      R2  3·n_tokens ≤ sum_tok_chars ≤ 10·n_tokens      (mean word length 3–10)
      R3  10·(n_tokens − n_distinct) ≤ 8·n_tokens        (duplicate-token
          fraction ≤ 0.8 — the corpus is small-vocab word soup, so the
          published 0.3 would reject everything; the SHAPE of the gate is
          what's reproduced)
      R4  5·top_count ≤ n_tokens                         (modal token ≤ 0.2)
      R5  5·n_alpha ≥ 4·n_tokens                         (≥ 0.8 alphabetic)
    Output (doc_id, n_tokens, sum_tok_chars, n_distinct, top_count, n_alpha,
    passes) — one stateless vectorized pass, no exchange.
    """
    ds = _read_docs(sf_dir)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        n, chars, nd, top, nal, passes = _gopher_stats(df["text"])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": n,
                "sum_tok_chars": chars,
                "n_distinct": nd,
                "top_count": top,
                "n_alpha": nal,
                "passes": passes.astype(np.int64),
            }
        )

    return (
        ds.map_batches(f, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _gopher_stats(texts):
    """Shared Gopher-gate kernel: integer components + pass mask per text."""
    tok = re.compile(_TOKEN_RE)
    alpha = re.compile(r"[a-z]")
    k = len(texts)
    n = np.empty(k, np.int64)
    chars = np.empty(k, np.int64)
    nd = np.empty(k, np.int64)
    top = np.empty(k, np.int64)
    nal = np.empty(k, np.int64)
    for i, t in enumerate(texts):
        ws = tok.findall(t.lower())
        n[i] = len(ws)
        chars[i] = sum(len(w) for w in ws)
        if ws:
            vc = Counter(ws)
            nd[i] = len(vc)
            top[i] = max(vc.values())
        else:
            nd[i] = 0
            top[i] = 0
        nal[i] = sum(1 for w in ws if alpha.search(w))
    passes = (
        (n >= 50)
        & (n <= 100000)
        & (3 * n <= chars)
        & (chars <= 10 * n)
        & (10 * (n - nd) <= 8 * n)
        & (5 * top <= n)
        & (5 * nal >= 4 * n)
    )
    return n, chars, nd, top, nal, passes


def curate_corpus(sf_dir: str, *, n: int = 8, num_parts: int = 8) -> pd.DataFrame:
    """End-to-end RefinedWeb-style corpus curation — the three verified
    stages CHAINED as one streaming pipeline over the same dataset:

      1. Gopher quality gate (``_gopher_stats`` — in-batch filter, no
         exchange; rejected docs never leave their read block),
      2. exact dedup among survivors (128-bit text signature exchange —
         (sig, doc_id) pairs only, the text never enters the shuffle;
         winner = min doc_id per signature; winners re-partitioned on
         doc_id chain straight into the semi-join cogroup),
      3. exact-substring scrub among the deduped survivors (``_scrub_ds`` —
         n-gram windows duplicated across ≥2 SURVIVING docs removed).

    Output one row per surviving doc: (doc_id, text_clean, n_kept,
    n_removed). Every stage is the already-hash-verified kernel; this query
    verifies their COMPOSITION against one chained-CTE DuckDB oracle.
    """
    import pyarrow as pa

    from ..ops import direct_cogroup
    from .dedup import _hash64, _hash64_b

    ds = _read_docs(sf_dir)

    def gate(df: pd.DataFrame) -> pd.DataFrame:
        *_, passes = _gopher_stats(df["text"])
        out = df.loc[passes, ["doc_id", "text"]].copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    kept = ds.map_batches(gate, batch_format="pandas").materialize()

    sig_schema = pa.schema(
        [("sig1", pa.int64()), ("sig2", pa.int64()), ("doc_id", pa.int64())]
    )
    win_schema = pa.schema([("doc_id", pa.int64())])
    docs_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])

    def pre_sig(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        return pa.table(
            {
                "sig1": pa.array(_hash64(df["text"]).view(np.int64)),
                "sig2": pa.array(_hash64_b(df["text"]).view(np.int64)),
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
            }
        )

    def winners_fn(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return win_schema.empty_table()
        w = df.groupby(["sig1", "sig2"])["doc_id"].min()
        return pa.table({"doc_id": pa.array(np.sort(w.to_numpy(np.int64)))})

    winners = direct_cogroup(
        [kept], [["sig1", "sig2"]], num_parts, winners_fn, [sig_schema],
        pres=[pre_sig], emit_partitioned_on=["doc_id"],
    )

    def semi(w_t: pa.Table, d_t: pa.Table) -> pa.Table:
        ddf = d_t.to_pandas()
        if not len(ddf):
            return docs_schema.empty_table()
        wids = w_t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        out = ddf[np.isin(ddf["doc_id"].to_numpy(np.int64), wids)]
        return pa.Table.from_pandas(out, schema=docs_schema, preserve_index=False)

    surv = direct_cogroup(
        [winners, kept], [["doc_id"], ["doc_id"]], num_parts, semi,
        [win_schema, docs_schema],
    ).materialize()

    return _scrub_ds(surv, n=n, num_parts=num_parts)


def shard_assignment(sf_dir: str, *, shards: int = 16, num_parts: int = 8) -> pd.DataFrame:
    """Deterministic size-balanced shard layout: docs ranked by
    (n_tokens DESC, doc_id ASC) get shard = rank % ``shards`` — the
    round-robin longest-processing-time heuristic (big docs spread first, so
    shard token totals differ by at most one doc at each size level).

    Distributed rank without a global sort: token counts are CALENDAR-SMALL
    in distinct values (bounded by max doc length), so one hash exchange
    co-locates each n_tokens VALUE GROUP, each partition ranks its groups
    internally by doc_id, and the driver exclusive-scans the per-value group
    sizes (one tiny row per distinct length, descending) to shift local
    ranks to global ones — the ``running_totals`` scan shape keyed by value
    instead of time. Output (doc_id, n_tokens, rank, shard).
    """
    import pyarrow as pa

    from ..ops import direct_partitioned_map

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        n_tok = np.array([len(tok.findall(x.lower())) for x in df["text"]], np.int64)
        return pa.table(
            {"doc_id": pa.array(df["doc_id"].to_numpy(np.int64)), "n_tokens": pa.array(n_tok)}
        )

    pre_schema = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("local_rank", pa.int64())]
    )

    def local_rank(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return out_schema.empty_table()
        df = df.sort_values(["n_tokens", "doc_id"], ascending=[False, True], kind="stable")
        lr = df.groupby("n_tokens", sort=False).cumcount().to_numpy(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64)),
                "local_rank": pa.array(lr),
            }
        )

    ranked = direct_partitioned_map(
        ds.materialize(), ["n_tokens"], num_parts, local_rank, pre_schema, pre=pre
    ).to_pandas()
    if ranked.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64")
             for c in ("doc_id", "n_tokens", "rank", "shard")}
        )
    # driver: one tiny row per DISTINCT length — exclusive scan in desc order
    sizes = ranked.groupby("n_tokens").size().sort_index(ascending=False)
    offsets = sizes.cumsum().shift(fill_value=0)
    rank = (
        ranked["n_tokens"].map(offsets).to_numpy(np.int64)
        + ranked["local_rank"].to_numpy(np.int64)
    )
    out = pd.DataFrame(
        {
            "doc_id": ranked["doc_id"].astype("int64"),
            "n_tokens": ranked["n_tokens"].astype("int64"),
            "rank": rank,
            "shard": rank % np.int64(shards),
        }
    )
    return out.sort_values("doc_id").reset_index(drop=True)


# --- information-theoretic quality signals ----------------------------------


def _doc_distinct_counts(
    texts, tok
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Explode a batch of texts into per-(row, DISTINCT lowercased token)
    counts, token-ascending within each row. Returns (row_of_group, counts,
    n_tokens_per_row, token_of_group). One lexsort + run-length encode — no
    per-row dicts."""
    lists = [tok.findall(t.lower()) for t in texts]
    m = len(lists)
    lens = np.fromiter((len(x) for x in lists), np.int64, m)
    tot = int(lens.sum())
    if tot == 0:
        e = np.empty(0, np.int64)
        return e, e, lens, np.empty(0, object)
    flat = np.empty(tot, object)
    pos = 0
    for x in lists:
        if x:
            flat[pos : pos + len(x)] = x
            pos += len(x)
    rows = np.repeat(np.arange(m, dtype=np.int64), lens)
    order = np.lexsort((flat, rows))
    fr, fo = rows[order], flat[order]
    new = np.ones(tot, bool)
    new[1:] = (fr[1:] != fr[:-1]) | (fo[1:] != fo[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, tot)).astype(np.int64)
    return fr[starts], counts, lens, fo[starts]


def token_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-document Shannon entropy (bits) of the lowercased token histogram,
    plus the exact-integer Simpson (collision) numerator sum(c^2) — the two
    information-theoretic quality signals corpus curation gates on (low
    entropy = templated/repetitive text; complements doc_repetition's Gopher
    count gates).

    Purely per-doc -> embarrassingly parallel map_batches, zero exchanges.
    Float-parity contract: H = log2(n) - (sum c*log2(c))/n sums libm terms,
    and numpy vs DuckDB log2 may disagree by 1 ulp per term (the tfidf
    rule), so the published entropy is rounded to FOUR decimals — a <=1e-12
    total disagreement cannot flip that rounding (and round(x,4) is stable
    under the driver's further round-to-6) — while simpson_num carries the
    exact-integer full-precision signal. `+ 0.0` normalizes -0.0 on both
    sides.
    """
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        m = len(df)
        g_rows, counts, lens, _ = _doc_distinct_counts(df["text"], tok)
        simp = np.zeros(m, np.int64)
        ent = np.zeros(m, np.float64)
        if len(counts):
            # counts^2 sums stay < 2^53 (exact in the float accumulator)
            simp = np.bincount(
                g_rows, weights=(counts * counts).astype(np.float64), minlength=m
            ).astype(np.int64)
            s = np.bincount(g_rows, weights=counts * np.log2(counts), minlength=m)
            nz = lens > 0
            nf = lens[nz].astype(np.float64)
            ent[nz] = np.round(np.log2(nf) - s[nz] / nf, 4) + 0.0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "n_tokens": lens,
                "simpson_num": simp,
                "entropy": ent,
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def dsir_weights(sf_dir: str, *, target_source: str = "src0") -> pd.DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): per-doc log p_target(x)/p_raw(x)
    under add-1-smoothed bag-of-words unigram models, where the target
    distribution is estimated from the docs whose ``source`` equals
    ``target_source`` and the raw distribution from the whole corpus.
    Upweighted docs are the ones that look like the target domain — the
    published recipe for domain-targeted pretraining-data selection.

    Two corpus passes, one vocab-sized exchange (the tfidf shape):
    pass 1 emits per-batch (token, raw_count, target_count) partials and a
    token groupby merges them; the merged vocab broadcasts once via
    ``ray.put`` (past a broadcast budget this becomes a token-keyed hash
    join — the places-index fallback family). Pass 2 probes the broadcast
    per batch and reduces per doc with one bincount — no per-doc exchange.

    weight(d) = sum_w c_d(w)*(ln(ct_w+1) - ln(cr_w+1))
                + n_d*(ln(T_raw+V) - ln(T_tgt+V))
    Rounded to 4 decimals (ln is libm — the token_entropy float-parity
    rule); n_tokens rides along exact.
    """
    import ray
    import pyarrow.parquet as _papq

    from .relational import grouped_agg

    # a corpus without a source column has no target split: every ct is 0
    # and the weights reduce to a constant-model log-ratio (still finite)
    has_source = "source" in _papq.read_schema(
        os.path.join(sf_dir, "documents.parquet")
    ).names
    cols = ("doc_id", "text", "source") if has_source else ("doc_id", "text")
    ds = _read_docs(sf_dir, columns=cols)
    tok = re.compile(_TOKEN_RE)

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        g_rows, counts, _, toks = _doc_distinct_counts(df["text"], tok)
        if not len(counts):
            return pd.DataFrame(
                {
                    "token": pd.Series([], dtype=object),
                    "cr": pd.Series([], dtype="int64"),
                    "ct": pd.Series([], dtype="int64"),
                }
            )
        if has_source:
            is_tgt = (df["source"].to_numpy(object)[g_rows] == target_source)
        else:
            is_tgt = np.zeros(len(g_rows), bool)
        part = pd.DataFrame(
            {"token": toks, "cr": counts, "ct": np.where(is_tgt, counts, 0)}
        )
        agg = part.groupby("token", sort=False).sum().reset_index()
        agg["cr"] = agg["cr"].astype("int64")
        agg["ct"] = agg["ct"].astype("int64")
        return agg

    vocab = grouped_agg(
        ds.map_batches(vocab_partial, batch_format="pandas"),
        ["token"],
        {"cr": ("cr", "sum"), "ct": ("ct", "sum")},
    ).to_pandas()
    t_raw = int(vocab["cr"].sum()) if len(vocab) else 0
    t_tgt = int(vocab["ct"].sum()) if len(vocab) else 0
    n_vocab = len(vocab)
    const = float(np.log(float(t_raw + n_vocab)) - np.log(float(t_tgt + n_vocab))) \
        if n_vocab else 0.0
    vocab_ref = ray.put(
        (
            pd.Index(vocab["token"]) if n_vocab else pd.Index([]),
            vocab["cr"].to_numpy(np.int64) if n_vocab else np.empty(0, np.int64),
            vocab["ct"].to_numpy(np.int64) if n_vocab else np.empty(0, np.int64),
        )
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        index, cr, ct = ray.get(vocab_ref)
        m = len(df)
        g_rows, counts, lens, toks = _doc_distinct_counts(df["text"], tok)
        w = np.zeros(m, np.float64)
        if len(counts):
            idx = index.get_indexer(toks)
            term = counts * (np.log(ct[idx] + 1.0) - np.log(cr[idx] + 1.0))
            s = np.bincount(g_rows, weights=term, minlength=m)
            w = np.round(s + lens.astype(np.float64) * const, 4) + 0.0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "n_tokens": lens,
                "dsir_logw": w,
            }
        )

    out = ds.map_batches(score, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def ccnet_buckets(sf_dir: str, *, train_mod: int = 7) -> pd.DataFrame:
    """CC-Net-style perplexity bucketing (Wenzek et al. 2020): score every
    document under an add-1-smoothed unigram LM trained on the held split
    (doc_id % ``train_mod`` == 0), then split the corpus into head / middle /
    tail by log-perplexity tertiles — the published recipe for
    quality-stratifying a web corpus before sampling.

    Three passes, all bounded exchanges:
    1. LM training: token-count partials over the held split → one
       vocab-sized groupby → broadcast (T tokens, V vocab; the tfidf-family
       join fallback applies past the broadcast budget).
    2. Scoring (stateless): logpp = ln(T+V) − (1/n)·Σ c_d(w)·ln(c_train(w)+1),
       rounded to 4 decimals (the token_entropy libm-parity rule) — rounding
       BEFORE thresholding makes the bucket comparison operate on doubles
       that are bit-identical across engines.
    3. Tertiles: a (value, count) histogram of the rounded logpp (bounded by
       distinct rounded values) reaches the driver; thresholds are the
       explicit order statistics at ranks ceil(n/3), ceil(2n/3) (TRUE
       integer ceil on both sides — not a float quantile index); buckets
       assigned in one final stateless pass. Zero-token docs score 0.0
       (lowest → head) by convention on both sides.
    """
    import ray

    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def train_partial(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[(df["doc_id"].to_numpy(np.int64) % train_mod) == 0]
        g_rows, counts, _, toks = _doc_distinct_counts(sel["text"], tok)
        if not len(counts):
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype="int64")}
            )
        part = pd.DataFrame({"token": toks, "c": counts})
        agg = part.groupby("token", sort=False).sum().reset_index()
        agg["c"] = agg["c"].astype("int64")
        return agg

    vocab = grouped_agg(
        ds.map_batches(train_partial, batch_format="pandas"),
        ["token"],
        {"c": ("c", "sum")},
    ).to_pandas()
    t_train = int(vocab["c"].sum()) if len(vocab) else 0
    n_vocab = len(vocab)
    const = float(np.log(float(t_train + n_vocab))) if n_vocab else 0.0
    lm_ref = ray.put(
        (
            pd.Index(vocab["token"]) if n_vocab else pd.Index([]),
            vocab["c"].to_numpy(np.int64) if n_vocab else np.empty(0, np.int64),
        )
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        index, c_tr = ray.get(lm_ref)
        m = len(df)
        g_rows, counts, lens, toks = _doc_distinct_counts(df["text"], tok)
        lp = np.zeros(m, np.float64)
        if len(counts):
            idx = index.get_indexer(toks)
            hit = np.where(idx >= 0, c_tr[np.maximum(idx, 0)], 0)
            term = counts * np.log(hit + 1.0)
            s = np.bincount(g_rows, weights=term, minlength=m)
            nz = lens > 0
            nf = lens[nz].astype(np.float64)
            lp[nz] = np.round(const - s[nz] / nf, 4) + 0.0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "n_tokens": lens,
                "logpp": lp,
            }
        )

    scored = ds.map_batches(score, batch_format="pandas").materialize()

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["logpp"].value_counts()
        return pd.DataFrame(
            {"logpp": vc.index.to_numpy(np.float64),
             "cnt": vc.to_numpy(np.int64)}
        )

    hist = grouped_agg(
        scored.map_batches(hist_partial, batch_format="pandas"),
        ["logpp"],
        {"cnt": ("cnt", "sum")},
    ).to_pandas().sort_values("logpp").reset_index(drop=True)
    counts = hist["cnt"].to_numpy(np.int64)
    values = hist["logpp"].to_numpy(np.float64)
    cum = np.cumsum(counts)
    n = int(cum[-1])
    # explicit order statistics: rank ceil(n/3), ceil(2n/3) (1-indexed)
    r1 = -(-n // 3)
    r2 = -(-(2 * n) // 3)
    t1 = values[np.searchsorted(cum, r1, side="left")]
    t2 = values[np.searchsorted(cum, r2, side="left")]

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        lp = df["logpp"].to_numpy(np.float64)
        b = np.where(lp <= t1, "head", np.where(lp <= t2, "middle", "tail"))
        out = df.copy()
        out["bucket"] = b
        return out

    out = scored.map_batches(bucketize, batch_format="pandas").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_WINNOW_K = 3   # token-gram width
_WINNOW_W = 4   # window of consecutive gram hashes
_WINNOW_POS_BITS = 20  # gram position packed below the hash in the tie key


def winnow_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
    the MOSS plagiarism-detection selector): guarantees every match of
    ≥ w+k−1 tokens between two documents shares a selected fingerprint,
    while keeping the selected set ~2/(w+1) of all grams.

    Spec (the SQL oracle evaluates the identical expressions):
      token k-grams (k=3) hashed g_i = (3·h_i + 5·h_{i+1} + 7·h_{i+2})
      mod 2^32 with h = fnv1a64(token) mod 2^32; every window of w=4
      consecutive grams selects its minimum with the RIGHTMOST-position tie
      rule — packed as key = g·2^20 + (2^20−1−pos) so one integer MIN
      implements both orderings; docs with fewer than w grams select from
      their single (short) final window. Output: the DISTINCT selections.

    Distributed shape: zero exchanges — selection is per-document, fused
    into the read; at 10^12 docs this is a pure map. Dedup of selections is
    in-batch (a document never spans batches)."""
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)
    K, W, PB = _WINNOW_K, _WINNOW_W, _WINNOW_POS_BITS

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy()
        doc_ids = df["doc_id"].to_numpy(np.int64)
        tok_lists, counts, starts, ends = _segment_tokens(texts, tok)
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
                "fp": pd.Series([], dtype="int64"),
            }
        )
        if counts.sum() == 0:
            return empty
        all_toks = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
        h32 = (_fnv1a_tokens(all_toks) % np.uint64(1 << 32)).astype(np.int64)
        n = len(h32)
        docidx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        # gram i valid iff tokens i..i+K-1 are in the SAME doc
        gi = np.arange(n - K + 1, dtype=np.int64) if n >= K else np.empty(0, np.int64)
        gi = gi[docidx[gi] == docidx[gi + K - 1]] if len(gi) else gi
        if not len(gi):
            return empty
        g = (3 * h32[gi] + 5 * h32[gi + 1] + 7 * h32[gi + 2]) % (1 << 32)
        gdoc = docidx[gi]
        gpos = gi - starts[gdoc]
        if int(gpos.max()) >= (1 << PB):
            raise ValueError("winnowing: document exceeds 2^20 grams")
        key = g * (1 << PB) + ((1 << PB) - 1 - gpos)
        # per-gram window min over the W trailing grams of the same doc
        m = len(key)
        win = key.copy()
        for s in range(1, W):
            shifted = np.full(m, 1 << 62, np.int64)
            shifted[s:] = key[:-s]
            same = np.zeros(m, bool)
            same[s:] = gdoc[s:] == gdoc[:-s]
            win = np.minimum(win, np.where(same, shifted, 1 << 62))
        # keep full windows (pos ≥ W−1) plus each short doc's final window
        gcnt = np.bincount(gdoc, minlength=len(counts))
        is_last = gpos == (gcnt[gdoc] - 1)
        keep = (gpos >= W - 1) | is_last
        sel_doc = doc_ids[gdoc[keep]]
        sel_key = win[keep]
        u = np.unique(np.stack([sel_doc, sel_key], axis=1), axis=0)
        return pd.DataFrame(
            {
                "doc_id": u[:, 0],
                "pos": (1 << PB) - 1 - (u[:, 1] % (1 << PB)),
                "fp": u[:, 1] >> PB,
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("doc_id", "pos", "fp")}
        )
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values(["doc_id", "pos"]).reset_index(drop=True)


_CDC_W = 8        # rolling-hash window (bytes)
_CDC_B = np.uint64(263)  # polynomial base (odd -> invertible mod 2^64)
_CDC_MASK = 64    # cut when window hash % 64 == 0 (expected chunk ~64 chars)


def cdc_chunks(sf_dir: str) -> pd.DataFrame:
    """Content-defined chunking (the LBFS/Rabin boundary rule of
    Muthitacharoen, Chen & Mazières 2001 — the storage-dedup primitive
    behind chunk-level dedup of near-identical documents): a cut falls
    AFTER every position whose 8-byte rolling polynomial hash ≡ 0 (mod 64),
    so an insertion early in a document shifts only the chunks it touches —
    unlike fixed-size splitting, where everything downstream re-hashes.
    Basic CDC: no min/max clamps (those reintroduce sequential state; this
    is the original LBFS formulation).

    Spec (SQL-identical): codes = ascii bytes of the raw text; window hash
    at end position i = Σ_{j=0..7} c_{i-7+j}·263^(7-j) mod 2^64, defined
    when the window lies inside the doc; chunk hash = Horner fold
    acc←acc·263+c mod 2^64 over the chunk. Output one row per non-empty
    chunk: (doc_id, chunk_id, start, len, chunk_hash) — uint64 hash
    widened losslessly into the driver's comparator.

    Distributed shape: zero exchanges (boundaries and hashes are per-doc);
    the rolling hash is 8 whole-array shift-mul-adds and the chunk fold
    iterates max-chunk-length times over the CHUNK vector (the
    `_fnv1a_tokens` pattern) — no per-row Python."""
    ds = _read_docs(sf_dir)
    W, B, MASK = _CDC_W, _CDC_B, _CDC_MASK

    def f(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy()
        doc_ids = df["doc_id"].to_numpy(np.int64)
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_id": pd.Series([], dtype="int64"),
                "start": pd.Series([], dtype="int64"),
                "len": pd.Series([], dtype="int64"),
                "chunk_hash": pd.Series([], dtype="uint64"),
            }
        )
        if lens.sum() == 0:
            return empty
        flat = np.frombuffer("".join(texts.tolist()).encode(), dtype=np.uint8)
        n = len(flat)
        codes = flat.astype(np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        docidx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        # rolling hash ending at i: 8 shift-mul-adds (Horner over the window)
        with np.errstate(over="ignore"):
            h = np.zeros(n, np.uint64)
            for j in range(W):
                shifted = np.zeros(n, np.uint64)
                s = W - 1 - j
                if s:
                    shifted[s:] = codes[:-s]
                else:
                    shifted = codes
                h = h * B + shifted
        pos_in_doc = np.arange(n, dtype=np.int64) - starts[docidx]
        cut_after = (pos_in_doc >= W - 1) & (h % np.uint64(MASK) == 0)
        # chunk starts: doc starts + positions right after a cut (same doc)
        cut_next = np.zeros(n, bool)
        cut_next[1:] = cut_after[:-1] & (docidx[1:] == docidx[:-1])
        is_start = cut_next.copy()
        # empty docs have start == end (== n when last in batch): no chunk start
        is_start[starts[lens > 0]] = True
        cstart = np.flatnonzero(is_start)
        # chunk end = next chunk start in the same doc, else doc end
        nxt = np.empty(len(cstart), np.int64)
        nxt[:-1] = cstart[1:]
        nxt[-1] = n
        cdoc = docidx[cstart]
        cend = np.where(
            (nxt <= ends[cdoc]) & (np.r_[cdoc[1:] == cdoc[:-1], False]),
            nxt, ends[cdoc],
        )
        clen = cend - cstart
        keep = clen > 0
        cstart, cend, clen, cdoc = cstart[keep], cend[keep], clen[keep], cdoc[keep]
        # Horner fold over each chunk, max-chunk-len whole-array iterations
        with np.errstate(over="ignore"):
            acc = np.zeros(len(cstart), np.uint64)
            for j in range(int(clen.max())):
                m = clen > j
                acc[m] = acc[m] * B + codes[cstart[m] + j]
        # chunk_id = rank within doc
        first = np.r_[True, cdoc[1:] != cdoc[:-1]]
        chunk_id = np.arange(len(cdoc), dtype=np.int64) - np.maximum.accumulate(
            np.where(first, np.arange(len(cdoc), dtype=np.int64), 0)
        )
        return pd.DataFrame(
            {
                "doc_id": doc_ids[cdoc],
                "chunk_id": chunk_id,
                "start": cstart - starts[cdoc],
                "len": clen,
                "chunk_hash": acc,
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "chunk_id": pd.Series([], dtype="int64"),
                "start": pd.Series([], dtype="int64"),
                "len": pd.Series([], dtype="int64"),
                "chunk_hash": pd.Series([], dtype="uint64"),
            }
        )
    for c in ("doc_id", "chunk_id", "start", "len"):
        out[c] = out[c].astype("int64")
    out["chunk_hash"] = out["chunk_hash"].astype("uint64")
    return out.sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)


def _bpe_apply(word: str, merges: list[tuple[str, str]]) -> int:
    """Symbol count of ``word`` after applying ``merges`` in rank order
    (the training replacement loop verbatim, so encoding reproduces the
    trainer's segmentation)."""
    sym = list(word)
    for left, right in merges:
        i = 0
        while i < len(sym) - 1:
            if sym[i] == left and sym[i + 1] == right:
                sym[i : i + 2] = [left + right]
            else:
                i += 1
    return len(sym)


def bpe_encode(sf_dir: str, *, n_merges: int = 20) -> pd.DataFrame:
    """Tokenizer APPLICATION — the other half of ``bpe_merges``: encode the
    corpus with the trained merge table and report per-doc compression
    (n_words, n_symbols, ratio = ONE IEEE division).

    Scale shape: the merge table is trained once (vocab-bounded histogram
    exchange + driver loop, see bpe_merges) and broadcast via ``ray.put``;
    encoding is per-batch over the batch's UNIQUE words only (per-word cost
    is vocab-bounded and amortizes across repeats — the production
    tokenizer-server shape), then an O(tokens) lookup. Zero exchanges."""
    import ray

    merges_df = bpe_merges(sf_dir, n_merges=n_merges)
    merges = list(zip(merges_df["left"], merges_df["right"]))
    merges_ref = ray.put(merges)

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        mg = ray.get(merges_ref)
        texts = df["text"].to_numpy()
        tok_lists, counts, starts, ends = _segment_tokens(texts, tok)
        if counts.sum() == 0:
            all_toks = np.empty(0, object)
        else:
            all_toks = np.concatenate(
                [np.asarray(t, dtype=object) for t in tok_lists if t]
            )
        uniq, inv = np.unique(all_toks.astype(str), return_inverse=True) if len(all_toks) else (np.empty(0, str), np.empty(0, np.int64))
        sym_of = np.array([_bpe_apply(w, mg) for w in uniq], dtype=np.int64)
        per_tok = sym_of[inv] if len(all_toks) else np.empty(0, np.int64)
        cum = np.concatenate(([0], np.cumsum(per_tok))).astype(np.int64)
        n_sym = cum[ends] - cum[starts]
        n_words = counts
        ratio = np.where(
            n_words > 0, n_sym.astype(np.float64) / np.maximum(n_words, 1), 0.0
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_words": n_words,
                "n_symbols": n_sym,
                "ratio": ratio,
            }
        )

    out = ds.map_batches(f, batch_format="pandas").to_pandas()
    for c in ("doc_id", "n_words", "n_symbols"):
        out[c] = out[c].astype("int64")
    out["ratio"] = out["ratio"].astype("float64")
    return out.sort_values("doc_id").reset_index(drop=True)


def temperature_mix(sf_dir: str) -> pd.DataFrame:
    """Temperature-scaled source mixing (the multilingual-corpus rebalancing
    rule of Lample & Conneau 2019, τ=1/2): source s with n_s documents gets
    quota isqrt(n_s) — big sources are downweighted ∝ n^τ so small sources
    are not drowned. τ=1/2 keeps the quota EXACT (math.isqrt; the SQL oracle
    corrects DuckDB's float sqrt at perfect-square boundaries), avoiding
    float-power thresholds entirely. Within a source, winners are the
    quota smallest by the house multiplicative hash (ties doc_id) — the
    deterministic sampler family.

    Shape: one tiny per-source count exchange → driver isqrt quotas →
    broadcast → per-block partial top-quota per source → driver merge of
    ≤ Σ quota rows per block. Corpus text never moves."""
    import math

    import ray
    import pyarrow.parquet as _papq

    from .relational import grouped_agg

    # a corpus without a source column is a single source named "docs"
    has_source = "source" in _papq.read_schema(
        os.path.join(sf_dir, "documents.parquet")
    ).names
    cols = ("doc_id", "source") if has_source else ("doc_id",)
    ds = _read_docs(sf_dir, columns=cols)

    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"] if has_source else pd.Series(["docs"] * len(df))
        vc = src.value_counts()
        return pd.DataFrame({"source": vc.index.to_numpy(object), "n": vc.to_numpy(np.int64)})

    counts = grouped_agg(
        ds.map_batches(cnt, batch_format="pandas"), ["source"], {"n": ("n", "sum")}
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame(
            {
                "source": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype="int64"),
                "rn": pd.Series([], dtype="int64"),
            }
        )
    quotas = {s: math.isqrt(int(n)) for s, n in zip(counts["source"], counts["n"])}
    qref = ray.put(quotas)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(qref)
        h = _strat_hash(df["doc_id"].to_numpy())
        src = (
            df["source"].to_numpy(object)
            if has_source
            else np.array(["docs"] * len(df), dtype=object)
        )
        d = pd.DataFrame(
            {"source": src, "doc_id": df["doc_id"].to_numpy(np.int64), "h": h}
        ).sort_values(["source", "h", "doc_id"], kind="stable")
        return d.groupby("source", sort=False, group_keys=False).apply(
            lambda g: g.head(q.get(g.name, 0))
        )

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    parts = parts.sort_values(["source", "h", "doc_id"], kind="stable")
    out = parts.groupby("source", sort=False, group_keys=False).apply(
        lambda g: g.head(quotas.get(g.name, 0))
    ).copy()
    out["rn"] = out.groupby("source").cumcount() + 1
    return (
        out[["source", "doc_id", "rn"]]
        .astype({"doc_id": "int64", "rn": "int64"})
        .sort_values(["source", "rn"])
        .reset_index(drop=True)
    )


def ngram_novelty(sf_dir: str, *, n: int = 8, num_parts: int = 8) -> pd.DataFrame:
    """Per-document n-gram novelty attribution: of a doc's distinct n-token
    windows, how many occur FIRST in this doc (first = minimum doc_id over
    the corpus — the deterministic stand-in for arrival order)? The
    incremental-crawl signal behind "is this doc adding anything new":
    novelty/total ≈ 1 marks fresh content, ≈ 0 a rehash of existing docs.
    Docs with fewer than n tokens have no windows and emit no row (the
    duplicate_spans convention, mirrored by the SQL).

    Distributed shape: the duplicate_spans exchange — one fused split wave
    of distinct (gram, doc_id) pairs hash-partitioned by gram, so each
    gram's full posting is in exactly one partition; there BOTH partials
    reduce per doc (total grams in partition, grams whose min doc_id is
    this doc) and one final doc-keyed grouped sum merges them. Linear in
    total shingle volume, nothing quadratic."""
    import pyarrow as pa

    from ..ops import direct_partitioned_map
    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def pre(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        grams: list[str] = []
        docs: list[int] = []
        for did, txt in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            gs = set(_doc_ngrams(tok.findall(txt.lower()), n))
            grams.extend(gs)
            docs.extend([int(did)] * len(gs))
        return pa.table(
            {
                "gram": pa.array(grams, pa.string()),
                "doc_id": pa.array(np.asarray(docs, dtype=np.int64)),
            }
        )

    schema = pa.schema([("gram", pa.string()), ("doc_id", pa.int64())])
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_novel", pa.int64())]
    )

    def per_part(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        if not len(df):
            return out_schema.empty_table()
        tot = df.groupby("doc_id").size().rename("n_grams")
        first_doc = df.groupby("gram")["doc_id"].transform("min")
        nov = df[df["doc_id"] == first_doc].groupby("doc_id").size().rename("n_novel")
        out = pd.concat([tot, nov], axis=1).fillna(0).reset_index()
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"].to_numpy(np.int64)),
                "n_grams": pa.array(out["n_grams"].to_numpy(np.int64)),
                "n_novel": pa.array(out["n_novel"].to_numpy(np.int64)),
            }
        )

    partials = direct_partitioned_map(
        ds.materialize(), ["gram"], num_parts, per_part, schema, pre=pre
    )
    agg = grouped_agg(
        partials, ["doc_id"],
        {"n_grams": ("n_grams", "sum"), "n_novel": ("n_novel", "sum")},
    ).to_pandas()
    if agg.empty:
        return pd.DataFrame({f.name: pd.Series([], dtype="int64") for f in out_schema})
    for c in agg.columns:
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("doc_id").reset_index(drop=True)

# --- vocabulary growth (Heaps' law curve) --------------------------------------


def vocab_growth(sf_dir: str) -> pd.DataFrame:
    """Vocabulary growth curve (Heaps' law V(n) ~ k·nᵝ): for every doc, the
    number of NEW token types it introduces when the corpus is read in
    doc_id order, plus the running type and token totals. The
    corpus-diversity diagnostic behind dedup/mixture tuning: a flattening
    curve means incoming docs stop contributing vocabulary.

    Distributed shape — "first doc of each type" is an attribution
    reduction, not a scan-in-order: (1) per batch, dedup tokens to
    (token, min-doc-in-batch) partials, so the exchange carries one row
    per distinct type per batch, never the token stream; (2) token-keyed
    grouped MIN → each type's global first doc; (3) regroup the firsts by
    doc (≤ one row per doc leaves the exchange) — the distinct-token set
    itself never lands on the driver. Per-doc token counts ride a separate
    trivially-parallel count. The two cumulative sums run over the per-doc
    RESULT rows, which is the operator's own output size. All integers.
    TRUE SQL oracle: min(doc_id) per token → group by first doc → window
    cumsums over the full doc list.
    """
    from .relational import grouped_agg

    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)

    def first_partials(df: pd.DataFrame) -> pd.DataFrame:
        first: dict[str, int] = {}
        for doc_id, text in zip(df["doc_id"].to_numpy(np.int64), df["text"]):
            for w in tok.findall(text.lower()):
                # ascending doc_id within a batch isn't guaranteed -> min
                if w not in first or doc_id < first[w]:
                    first[w] = int(doc_id)
        return pd.DataFrame(
            {
                "token": pd.Series(list(first.keys()), dtype=object),
                "first_doc": pd.Series(list(first.values()), dtype="int64"),
            }
        )

    token_firsts = grouped_agg(
        ds.map_batches(first_partials, batch_format="pandas"),
        ["token"],
        {"first_doc": ("first_doc", "min")},
    )
    new_types = grouped_agg(
        token_firsts.drop_columns(["token"]),
        ["first_doc"],
        {"new_types": (None, "count")},
    ).to_pandas()

    def doc_counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64").to_numpy(),
                "doc_tokens": pd.Series(
                    [len(tok.findall(t.lower())) for t in df["text"]], dtype="int64"
                ),
            }
        )

    out = (
        ds.map_batches(doc_counts, batch_format="pandas")
        .to_pandas()
        .merge(
            new_types.rename(columns={"first_doc": "doc_id"}),
            on="doc_id",
            how="left",
        )
    )
    out["new_types"] = out["new_types"].fillna(0).astype("int64")
    out = out.sort_values("doc_id").reset_index(drop=True)
    out["cum_types"] = out["new_types"].cumsum().astype("int64")
    out["cum_tokens"] = out["doc_tokens"].cumsum().astype("int64")
    out["doc_id"] = out["doc_id"].astype("int64")
    return out[["doc_id", "new_types", "cum_types", "doc_tokens", "cum_tokens"]]


def collocations(sf_dir: str, *, window: int = 3, k: int = 40) -> pd.DataFrame:
    """Collocation profile of the corpus's most frequent token: counts of
    every word appearing within ±``window`` positions of an occurrence of
    the target (each (occurrence, neighbor-position) pair counts once) —
    the KWIC / collocation-strength primitive of corpus linguistics,
    distinct from adjacent-bigram counts. Target = global top token
    (ties by token), a corpus-derived scalar rather than a parameter.

    Shape: pass 1 is the top_tokens partial-count machinery reduced to
    top-1 (the only driver-side value is ONE token string, broadcast into
    the second pass's closure); pass 2 re-reads the text column once,
    emits only window neighbors of target occurrences (per-batch partial
    counts), and finishes with a tiny word-keyed groupby + partial top-k.
    TRUE SQL oracle: list_filter/list_transform window expansion around
    the same top-1 CTE."""
    from .relational import grouped_agg, topk

    tok = re.compile(_TOKEN_RE)

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        toks: list[str] = []
        for t in df["text"]:
            toks.extend(tok.findall(t.lower()))
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(toks).value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)})

    ds = _read_docs(sf_dir, columns=("text",))
    merged = grouped_agg(
        ds.map_batches(count_partial, batch_format="pandas"), ["token"],
        {"cnt": ("cnt", "sum")},
    )
    top = topk(merged, "cnt", 1, descending=True, tie_cols=["token"])
    empty = pd.DataFrame(
        {"word": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
    )
    if top.empty:
        return empty
    target = str(top["word"].iloc[0]) if "word" in top.columns else str(top["token"].iloc[0])

    def neighbors_partial(df: pd.DataFrame) -> pd.DataFrame:
        words: list[str] = []
        for t in df["text"]:
            ws = tok.findall(t.lower())
            n = len(ws)
            for i, w in enumerate(ws):
                if w != target:
                    continue
                lo = max(0, i - window)
                hi = min(n - 1, i + window)
                words.extend(ws[j] for j in range(lo, hi + 1) if j != i)
        if not words:
            return pd.DataFrame(
                {"word": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}
            )
        vc = pd.Series(words).value_counts()
        return pd.DataFrame(
            {"word": vc.index.to_numpy(object), "cnt": vc.to_numpy(np.int64)}
        )

    merged2 = grouped_agg(
        _read_docs(sf_dir, columns=("text",)).map_batches(
            neighbors_partial, batch_format="pandas"
        ),
        ["word"], {"cnt": ("cnt", "sum")},
    )
    out = topk(merged2, "cnt", k, descending=True, tie_cols=["word"])
    if out.empty:
        return empty
    out["cnt"] = out["cnt"].astype("int64")
    return out[["word", "cnt"]]


_POSIDX_CACHE: dict = {}


def build_positional_index(sf_dir: str, *, n_buckets: int = _IDX_BUCKETS) -> str:
    """One-time POSITIONAL posting layout: rows (bucket, token, doc_id,
    pos) hive-partitioned by token bucket — the inverted-index pattern of
    ``build_inverted_index`` extended with in-doc positions, the layout
    phrase and proximity queries key on (one row per token OCCURRENCE, so
    the index is corpus-token-count sized; queries still read only their
    terms' buckets). Same atomicity/cache contract: content-identity tag,
    tmp-dir build + os.replace."""
    docs_path = os.path.join(sf_dir, "documents.parquet")
    key = (os.path.abspath(sf_dir), n_buckets)
    if key in _POSIDX_CACHE:
        return _POSIDX_CACHE[key]
    st = os.stat(docs_path)
    import hashlib

    tag = hashlib.sha256(
        f"{key[0]}|{n_buckets}|{st.st_mtime_ns}.{st.st_size}|pd{pd.__version__}".encode()
    ).hexdigest()[:16]
    index_dir = os.path.join("/tmp/graft_posidx", tag)
    if os.path.isdir(index_dir):
        _POSIDX_CACHE[key] = index_dir
        return index_dir

    tok = re.compile(_TOKEN_RE)

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].to_numpy()
        tok_lists, counts, starts, _ends = _segment_tokens(texts, tok)
        total = int(counts.sum())
        if not total:
            return pd.DataFrame(
                {"bucket": pd.Series([], dtype=np.int64),
                 "token": pd.Series([], dtype=object),
                 "doc_id": pd.Series([], dtype=np.int64),
                 "pos": pd.Series([], dtype=np.int64)}
            )
        all_toks = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists if t])
        doc_ids = np.repeat(df["doc_id"].to_numpy(np.int64), counts)
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        g = pd.DataFrame({"token": all_toks, "doc_id": doc_ids, "pos": pos})
        g["bucket"] = _token_bucket(g["token"], n_buckets)
        return g[["bucket", "token", "doc_id", "pos"]]

    tmp_dir = index_dir + ".tmp"
    if os.path.isdir(tmp_dir):
        import shutil

        shutil.rmtree(tmp_dir)
    _read_docs(sf_dir).map_batches(postings, batch_format="pandas").write_parquet(
        tmp_dir, partition_cols=["bucket"]
    )
    os.replace(tmp_dir, index_dir)
    _POSIDX_CACHE[key] = index_dir
    return index_dir


def phrase_search(
    sf_dir: str, phrase: tuple[str, str] | None = None,
    *, n_buckets: int = _IDX_BUCKETS, num_parts: int = 8,
) -> pd.DataFrame:
    """Exact phrase search through the positional index: per-doc count of
    adjacent (w1, w2) occurrences. ``phrase=None`` queries the corpus's
    GLOBAL TOP BIGRAM (ties by bigram — corpus-derived, no parameter).
    Query cost ∝ the two terms' posting lists, never the corpus: read
    only the phrase tokens' bucket partitions, then ONE doc-keyed
    exchange merges the two position lists and counts pos+1 adjacency
    (vectorized isin over int64 position keys). Output: (doc_id, n_occ)
    for matching docs, sorted. TRUE SQL oracle: list_filter adjacency
    over the same top-bigram CTE."""
    import glob as _glob

    import ray.data as rd

    from ..ops import direct_partitioned_map

    empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"), "n_occ": pd.Series([], dtype="int64")}
    )
    if phrase is None:
        top = top_bigrams(sf_dir, k=1)
        if top.empty:
            return empty
        w1, w2 = str(top["bigram"].iloc[0]).split(" ")
    else:
        w1, w2 = phrase

    index_dir = build_positional_index(sf_dir, n_buckets=n_buckets)
    buckets = sorted(set(_token_bucket(pd.Series([w1, w2]), n_buckets).tolist()))
    paths = [
        p
        for b in buckets
        for p in sorted(_glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet")))
    ]
    if not paths:
        return empty

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        hit = df[df["token"].isin({w1, w2})]
        return pd.DataFrame(
            {
                "doc_id": hit["doc_id"].astype(np.int64),
                "token": hit["token"].astype(object),
                "pos": hit["pos"].astype(np.int64),
            }
        )

    postings = rd.read_parquet(paths, columns=["token", "doc_id", "pos"]).map_batches(
        probe, batch_format="pandas"
    )

    def adjacency(t) -> pd.DataFrame:
        df = t.to_pandas() if not isinstance(t, pd.DataFrame) else t
        if df.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "n_occ": pd.Series([], dtype=np.int64)}
            )
        # per doc: positions p of w1 with p+1 among w2's positions; the
        # (doc_id, pos) pair packs into one int64 key (pos < 2^20 tokens)
        k1 = df.loc[df["token"] == w1, ["doc_id", "pos"]]
        k2 = df.loc[df["token"] == w2, ["doc_id", "pos"]]
        key1 = k1["doc_id"].to_numpy(np.int64) * (1 << 20) + k1["pos"].to_numpy(np.int64) + 1
        key2 = k2["doc_id"].to_numpy(np.int64) * (1 << 20) + k2["pos"].to_numpy(np.int64)
        hitmask = np.isin(key1, key2)
        if not hitmask.any():
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "n_occ": pd.Series([], dtype=np.int64)}
            )
        vc = pd.Series(k1["doc_id"].to_numpy(np.int64)[hitmask]).value_counts()
        return pd.DataFrame(
            {"doc_id": vc.index.to_numpy(np.int64), "n_occ": vc.to_numpy(np.int64)}
        )

    import pyarrow as _pa

    out_schema = _pa.schema([("doc_id", _pa.int64()), ("n_occ", _pa.int64())])
    in_schema = _pa.schema(
        [("doc_id", _pa.int64()), ("token", _pa.string()), ("pos", _pa.int64())]
    )

    def fn(t: _pa.Table) -> _pa.Table:
        return _pa.Table.from_pandas(
            adjacency(t), preserve_index=False
        ).cast(out_schema)

    out = direct_partitioned_map(
        postings.materialize(), ["doc_id"], num_parts, fn, in_schema
    ).to_pandas()
    if out.empty:
        return empty
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


# --- RAKE keyword extraction -----------------------------------------------------

# the lang_id English stopword set — RAKE's phrase delimiters
_RAKE_STOPS = ("the", "and", "of", "to", "a", "in", "is", "it", "that", "with")


def rake_keywords(sf_dir: str, *, top: int = 25) -> pd.DataFrame:
    """RAKE keyword extraction (Rose et al. 2010), word-level and
    integer-exact: candidate phrases are maximal runs of non-stopword
    tokens; per word, freq = occurrences inside candidates and deg =
    Σ length of the containing phrase (the co-occurrence degree, self
    included). RAKE's score deg/freq is ranked by the EXACT integer key
    (deg·10⁶)//freq, ties by word ascending — no float division. Output:
    top-``top`` (word, freq, deg, score_key).

    Distributed shape: phrase segmentation is one vectorized pass per batch
    (cumsum phrase ids over the token explode — stopwords and doc starts
    close phrases), partials pre-aggregate per batch, ONE word-keyed
    exchange, per-block partial top-k + k·P driver merge. int64 guard on
    the key RAISES past ~9·10¹² total degree.
    """
    import re as _re

    import pyarrow as pa

    from .relational import grouped_agg, topk

    tok = _re.compile(_TOKEN_RE)
    stops = frozenset(_RAKE_STOPS)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        words, starts = [], []
        for t in df["text"]:
            ts = tok.findall(t.lower())
            starts.append(len(words))
            words.extend(ts)
        if not words:
            return pd.DataFrame({
                "word": pd.Series([], dtype=object),
                "freq": pd.Series([], dtype="int64"),
                "deg": pd.Series([], dtype="int64"),
            })
        w = np.asarray(words, dtype=object)
        is_stop = np.isin(w, list(stops))
        doc_start = np.zeros(len(w), dtype=bool)
        doc_start[np.asarray(starts, dtype=np.int64)[
            np.asarray(starts, dtype=np.int64) < len(w)]] = True
        # a phrase id increments at every stopword and every doc start, so
        # consecutive non-stop tokens inside one doc share an id
        pid = np.cumsum(is_stop | doc_start)
        live = ~is_stop
        if not live.any():
            return pd.DataFrame({
                "word": pd.Series([], dtype=object),
                "freq": pd.Series([], dtype="int64"),
                "deg": pd.Series([], dtype="int64"),
            })
        plen = np.bincount(pid[live], minlength=int(pid.max()) + 1)
        g = (
            pd.DataFrame({
                "word": w[live],
                "deg": plen[pid[live]].astype(np.int64),
            })
            .groupby("word", sort=False)
            .agg(freq=("deg", "size"), deg=("deg", "sum"))
            .reset_index()
        )
        g["freq"] = g["freq"].astype("int64")
        g["deg"] = g["deg"].astype("int64")
        return g

    agg = grouped_agg(
        _read_docs(sf_dir).map_batches(partial, batch_format="pandas"),
        ["word"], {"freq": ("freq", "sum"), "deg": ("deg", "sum")},
    )

    def add_key(t: pa.Table) -> pa.Table:
        freq = t["freq"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = t["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(deg) and int(deg.max()) >= 9_000_000_000_000:
            raise OverflowError("rake_keywords: deg·1e6 exceeds int64")
        return t.append_column(
            "score_key", pa.array(deg * 1_000_000 // freq, pa.int64())
        )

    out = topk(
        agg.map_batches(add_key, batch_format="pyarrow"),
        "score_key", top, tie_cols=["word"],
        empty_schema=pa.schema([
            ("word", pa.string()), ("freq", pa.int64()),
            ("deg", pa.int64()), ("score_key", pa.int64()),
        ]),
    )
    if out.empty:
        return pd.DataFrame({
            "word": pd.Series([], dtype=object),
            "freq": pd.Series([], dtype="int64"),
            "deg": pd.Series([], dtype="int64"),
            "score_key": pd.Series([], dtype="int64"),
        })
    for c in ("freq", "deg", "score_key"):
        out[c] = out[c].astype("int64")
    return (
        out.sort_values(["score_key", "word"], ascending=[False, True])
        .reset_index(drop=True)[["word", "freq", "deg", "score_key"]]
    )


# --- Zipf coverage audit -----------------------------------------------------------


def zipf_coverage(sf_dir: str) -> pd.DataFrame:
    """Zipf-structure audit of the corpus token distribution: the EXACT
    minimum number of token types needed to cover ≥50% and ≥90% of all
    occurrences (k50/k90), plus totals — the head-heaviness signal behind
    vocabulary sizing and stopword-list design. Integer thresholds by
    cross-multiplication (2·covered ≥ total; 10·covered ≥ 9·total), partial
    blocks by exact ceil division — no float percentage anywhere.

    Distributed shape: ONE token-keyed exchange (per-batch pre-aggregated
    counts) → per-batch (count → n_types) histogram partials → one TINY
    exchange over distinct count values (≤ O(√tokens) rows — a corpus of N
    occurrences supports at most √(2N) distinct counts); the driver walks
    that bounded histogram once, largest count first. Output: one row
    (n_tokens, n_types, k50, k90).
    """
    import re as _re

    from .relational import grouped_agg

    tok = _re.compile(_TOKEN_RE)

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

    counts = grouped_agg(
        _read_docs(sf_dir).map_batches(count_partial, batch_format="pandas"),
        ["t"], {"c": ("c", "sum")},
    )

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c", sort=False).size().reset_index(name="n_types")
        g["n_types"] = g["n_types"].astype("int64")
        return g

    hist = grouped_agg(
        counts.map_batches(hist_partial, batch_format="pandas"),
        ["c"], {"n_types": ("n_types", "sum")},
    ).to_pandas()
    empty = pd.DataFrame(
        {c: pd.Series([], dtype="int64")
         for c in ("n_tokens", "n_types", "k50", "k90")}
    )
    if hist.empty:
        return empty
    hist = hist.sort_values("c", ascending=False).reset_index(drop=True)
    cs = hist["c"].to_numpy(np.int64)
    ns = hist["n_types"].to_numpy(np.int64)
    total = int((cs * ns).sum())
    n_types = int(ns.sum())

    def k_for(num: int, den: int) -> int:
        # smallest k with den·covered ≥ num·total over the desc-count walk
        target = -(-num * total // den)  # ceil(num·total/den)
        covered = 0
        k = 0
        for c, n in zip(cs, ns):
            block = int(c) * int(n)
            if covered + block >= target:
                need = target - covered
                return k + (need + int(c) - 1) // int(c)
            covered += block
            k += int(n)
        return k

    return pd.DataFrame({
        "n_tokens": pd.array([total], dtype="int64"),
        "n_types": pd.array([n_types], dtype="int64"),
        "k50": pd.array([k_for(1, 2)], dtype="int64"),
        "k90": pd.array([k_for(9, 10)], dtype="int64"),
    })
