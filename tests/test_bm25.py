"""BM25 ranked search: partition invariance, absent-term zero, top-k cut."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from osmi_addresses_ray.pipelines import textstats


def _with_mem_docs(monkeypatch, texts, parallelism=4):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(parallelism)
    monkeypatch.setattr(textstats, "_read_docs", lambda sf_dir, columns=None: ds)


def test_partition_invariance(monkeypatch):
    texts = [f"join scan filler{i % 11} " * (1 + i % 5) for i in range(60)]
    _with_mem_docs(monkeypatch, texts, 1)
    a = textstats.bm25_search("<mem>", k=10)
    _with_mem_docs(monkeypatch, texts, 7)
    b = textstats.bm25_search("<mem>", k=10)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == 10


def test_absent_terms_excluded(monkeypatch):
    _with_mem_docs(monkeypatch, ["nothing relevant here", "join wins", "dup dup"])
    out = textstats.bm25_search("<mem>", k=5)
    assert set(out["doc_id"]) == {1, 2}
    assert (out["score"] > 0).all()


def test_rare_term_outscores_common(monkeypatch):
    # same tf and dl; 'dup' is corpus-rare -> higher idf -> higher score
    texts = ["join pad", "dup pad"] + ["join pad"] * 20
    _with_mem_docs(monkeypatch, texts)
    out = textstats.bm25_search("<mem>", k=30)
    s = dict(zip(out["doc_id"], out["score"]))
    assert s[1] > s[0]


def test_tokenless_corpus(monkeypatch):
    _with_mem_docs(monkeypatch, ["", "  ", "\n"])
    out = textstats.bm25_search("<mem>")
    assert out.empty
