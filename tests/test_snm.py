"""Sorted-neighborhood pairs: window semantics + block-boundary invariance."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from osmi_addresses_ray.pipelines import dedup


def _with_mem_docs(monkeypatch, texts, parallelism=4):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(parallelism)
    monkeypatch.setattr(dedup, "_read_docs", lambda sf_dir: ds)


def test_adjacent_dups_found_beyond_window_missed(monkeypatch):
    # keys sort as given; docs 0/1 are near-identical and adjacent; doc 5
    # shares tokens with doc 0 but is 5 positions away (window=3) -> missed
    texts = [
        "aaa bbb ccc ddd",      # k='aaa...'
        "aaa bbb ccc eee",      # adjacent to 0, jaccard 3/5 >= 1/2
        "mmm nnn ooo ppp",
        "qqq rrr sss ttt",
        "uuu vvv www xxx",
        "zzz aaa bbb ccc ddd",  # jaccard 4/5 with doc 0 but rank-distance 5
    ]
    _with_mem_docs(monkeypatch, texts)
    out = dedup.snm_pairs("<mem>", window=3)
    got = set(zip(out["doc_a"], out["doc_b"]))
    assert (0, 1) in got
    assert (0, 5) not in got  # SNM window miss, by design


def test_boundary_invariance(monkeypatch):
    texts = [f"w{i % 7} common token set shared {i % 3}" for i in range(50)]
    _with_mem_docs(monkeypatch, texts, 1)
    a = dedup.snm_pairs("<mem>", window=4)
    _with_mem_docs(monkeypatch, texts, 9)
    b = dedup.snm_pairs("<mem>", window=4)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_integer_jaccard_threshold(monkeypatch):
    # |∩|=2, |∪|=4 -> 2*2 >= 4 kept; |∩|=1, |∪|=3 -> 2 < 3 dropped
    _with_mem_docs(monkeypatch, ["aa bb cc", "aa bb dd", "aa ee ff"])
    out = dedup.snm_pairs("<mem>", window=3)
    got = {(r.doc_a, r.doc_b): (r.inter, r.uni) for r in out.itertuples()}
    assert got.get((0, 1)) == (2, 4)
    assert (0, 2) not in got


def test_empty_and_tiny(monkeypatch):
    _with_mem_docs(monkeypatch, ["solo"], 2)
    out = dedup.snm_pairs("<mem>")
    assert out.empty and list(out.columns) == ["doc_a", "doc_b", "inter", "uni"]
