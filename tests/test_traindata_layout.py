"""pack_sequences (distributed prefix scan) and span_corruption (T5 mask)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from osmi_addresses_ray.pipelines import textstats


def _with_mem_docs(monkeypatch, texts, parallelism=4, ids=None):
    df = pd.DataFrame(
        {"doc_id": ids if ids is not None else range(len(texts)), "text": texts}
    )
    ds = rd.from_pandas(df).repartition(parallelism)
    monkeypatch.setattr(textstats, "_read_docs", lambda sf_dir, columns=None: ds)


def test_pack_offsets_and_bins(monkeypatch):
    # 3 docs with 2, 3, 4 tokens, capacity 4:
    # starts 0, 2, 5; doc1 spans bins 0..1 (tokens 2..4), doc2 bins 1..2
    _with_mem_docs(monkeypatch, ["a b", "c d e", "f g h i"])
    out = textstats.pack_sequences("<mem>", capacity=4, bucket_width=2)
    assert list(out["tok_start"]) == [0, 2, 5]
    assert list(out["bin_start"]) == [0, 0, 1]
    assert list(out["bin_end"]) == [0, 1, 2]


def test_pack_zero_token_doc(monkeypatch):
    _with_mem_docs(monkeypatch, ["a b c", "", "d"])
    out = textstats.pack_sequences("<mem>", capacity=2, bucket_width=1)
    row = out[out["doc_id"] == 1].iloc[0]
    assert row["n_tokens"] == 0 and row["bin_start"] == row["bin_end"] == 1


def test_pack_partition_and_width_invariance(monkeypatch):
    texts = [f"{'tok ' * (1 + i % 9)}" for i in range(120)]
    _with_mem_docs(monkeypatch, texts, 1)
    a = textstats.pack_sequences("<mem>", capacity=16, bucket_width=7, num_parts=2)
    _with_mem_docs(monkeypatch, texts, 11)
    b = textstats.pack_sequences("<mem>", capacity=16, bucket_width=64, num_parts=5)
    pd.testing.assert_frame_equal(a, b)
    # contiguity: starts are the exclusive cumsum of lengths in doc_id order
    assert (a["tok_start"].to_numpy() == np.cumsum(a["n_tokens"].to_numpy()) - a["n_tokens"].to_numpy()).all()


def test_span_corruption_roundtrip(monkeypatch):
    _with_mem_docs(monkeypatch, ["alpha beta gamma delta epsilon zeta eta theta"], ids=[10])
    out = textstats.span_corruption("<mem>", mod=3)
    row = out.iloc[0]
    ws = "alpha beta gamma delta epsilon zeta eta theta".split()
    m = [(10 * 1000003 + p * 10007) % 3 == 0 for p in range(len(ws))]
    assert row["n_masked"] == sum(m)
    # every masked token appears in targets, every unmasked one in inputs
    tgt_toks = [t for t in row["targets"].split() if not t.startswith("<extra_id_")]
    assert tgt_toks == [w for w, mm in zip(ws, m) if mm]
    inp_toks = [t for t in row["inputs"].split() if not t.startswith("<extra_id_")]
    assert inp_toks == [w for w, mm in zip(ws, m) if not mm]
    # sentinel count identical on both sides and consecutively numbered
    s_in = [t for t in row["inputs"].split() if t.startswith("<extra_id_")]
    s_tg = [t for t in row["targets"].split() if t.startswith("<extra_id_")]
    assert s_in == s_tg == [f"<extra_id_{k}>" for k in range(len(s_in))]


def test_span_corruption_empty_doc(monkeypatch):
    _with_mem_docs(monkeypatch, ["", "word"])
    out = textstats.span_corruption("<mem>")
    assert out.loc[0, "inputs"] == "" and out.loc[0, "targets"] == ""


def test_shard_assignment_rank_and_balance(monkeypatch):
    import numpy as np

    texts = [f"{'w ' * (1 + (i * 7) % 23)}" for i in range(80)]
    _with_mem_docs(monkeypatch, texts, 1)
    a = textstats.shard_assignment("<mem>", shards=4, num_parts=2)
    _with_mem_docs(monkeypatch, texts, 9)
    b = textstats.shard_assignment("<mem>", shards=4, num_parts=7)
    pd.testing.assert_frame_equal(a, b)
    # rank equals the naive (n_tokens DESC, doc_id) order
    naive = a.sort_values(["n_tokens", "doc_id"], ascending=[False, True])
    assert list(naive["rank"]) == list(range(len(a)))
    # LPT round-robin: every shard gets n/4 docs, token totals near-equal
    cnt = a.groupby("shard").size()
    assert cnt.max() - cnt.min() <= 1
    tot = a.groupby("shard")["n_tokens"].sum()
    assert tot.max() - tot.min() <= int(a["n_tokens"].max())
