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
