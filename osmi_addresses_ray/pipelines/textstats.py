"""Text analysis operators over the documents table — all stateless,
vectorized ``map_batches`` (the language-ID stage is an actor pool so the
stopword tables/regexes compile once per actor).

- token_counts    — \\w+ token count + char count per doc (SQL-checkable)
- quality_scores  — length / punctuation ratio / stopword ratio / mean word
                    length (SQL-checkable components)
- lang_id         — n-gram/stopword heuristic over {en, de, fr} (rows-only)
- fingerprints    — 64-bit rolling (polynomial) hash of normalized text
                    (rows-only; deterministic)
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import ray.data as rd

_TOKEN_RE = r"[A-Za-z0-9_]+"


def _read_docs(sf_dir: str, columns=("doc_id", "text")):
    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=list(columns))


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


class LangId:
    """Actor-pool stage: stopword tables built once per actor."""

    STOPS = {
        "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "with"},
        "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"},
        "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    }

    def __init__(self):
        self.tok = re.compile(_TOKEN_RE)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        langs = []
        for text in df["text"]:
            ws = [w.lower() for w in self.tok.findall(text)]
            if not ws:
                langs.append("und")
                continue
            scores = {
                lang: sum(w in stops for w in ws) for lang, stops in self.STOPS.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            langs.append(best if scores[best] > 0 else "und")
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "lang_pred": langs})


def lang_id(sf_dir: str) -> pd.DataFrame:
    ds = _read_docs(sf_dir)
    return (
        ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def fingerprints(sf_dir: str) -> pd.DataFrame:
    """64-bit polynomial rolling hash of lowercased \\w+-normalized text."""
    ds = _read_docs(sf_dir)
    tok = re.compile(_TOKEN_RE)
    P = np.uint64(1099511628211)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        fps = np.zeros(len(df), dtype=np.uint64)
        for i, text in enumerate(df["text"]):
            acc = np.uint64(14695981039346656037)
            for w in tok.findall(text.lower()):
                for ch in w.encode():
                    acc = (acc ^ np.uint64(ch)) * P
                acc = (acc ^ np.uint64(32)) * P  # token separator
            fps[i] = acc
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "fingerprint": fps})

    return ds.map_batches(f, batch_format="pandas").to_pandas().sort_values("doc_id").reset_index(drop=True)
