"""Heavy-hitters operator: candidate-superset guarantee, partition
invariance, strict-threshold edge."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from osmi_addresses_ray.pipelines import textstats


def _docs_ds(texts, parallelism):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    return rd.from_pandas(df).repartition(parallelism)


def _hh(texts, k, parallelism=4, monkeypatch=None):
    # route _read_docs to the in-memory corpus
    ds = _docs_ds(texts, parallelism)
    monkeypatch.setattr(textstats, "_read_docs", lambda sf_dir, columns=None: ds)
    return textstats.heavy_hitters("<mem>", k=k)


def test_split_across_batches_still_found(monkeypatch):
    # "hot" is locally rare in every batch (1 of 4 tokens per doc) but
    # globally frequent; with k=3 the global threshold is total/3
    texts = ["hot alpha%d beta%d gamma%d" % (i, i, i) for i in range(40)]
    texts += ["hot hot hot"] * 2
    out = _hh(texts, 3, parallelism=8, monkeypatch=monkeypatch)
    # total=166, hot=46 -> 46*3=138 <= 166: not a hitter; k=4: 184 > 166
    assert out.empty
    out = _hh(texts, 4, parallelism=8, monkeypatch=monkeypatch)
    assert out["token"].tolist() == ["hot"]
    assert out["cnt"].tolist() == [46]


def test_partition_invariance(monkeypatch):
    texts = [f"x{i % 7} common word{i % 19}" for i in range(120)]
    a = _hh(texts, 10, parallelism=1, monkeypatch=monkeypatch)
    b = _hh(texts, 10, parallelism=9, monkeypatch=monkeypatch)
    pd.testing.assert_frame_equal(a, b)
    assert "common" in a["token"].tolist()


def test_strict_threshold(monkeypatch):
    # token at EXACTLY total/k must be excluded (strict >)
    texts = ["a b", "a c"]  # total=4, a=2; k=2 -> 2*2=4 not > 4
    out = _hh(texts, 2, monkeypatch=monkeypatch)
    assert out.empty


def test_empty_corpus(monkeypatch):
    out = _hh(["", "   "], 5, monkeypatch=monkeypatch)
    assert out.empty
