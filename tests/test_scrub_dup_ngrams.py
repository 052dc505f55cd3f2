"""Exact-substring scrub: removal semantics, partition invariance, edges."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from osmi_addresses_ray.pipelines import textstats


def _with_mem_docs(monkeypatch, texts, parallelism=4):
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df).repartition(parallelism)
    monkeypatch.setattr(textstats, "_read_docs", lambda sf_dir, columns=None: ds)


def test_shared_window_removed_from_both(monkeypatch):
    shared = "a b c d e f g h"  # one exact 8-gram
    _with_mem_docs(monkeypatch, [f"x1 x2 {shared} y1", f"z1 {shared} z2 z3"])
    out = textstats.scrub_dup_ngrams("<mem>", n=8)
    assert list(out["text_clean"]) == ["x1 x2 y1", "z1 z2 z3"]
    assert list(out["n_removed"]) == [8, 8]
    assert list(out["n_kept"]) == [3, 3]


def test_unique_docs_untouched(monkeypatch):
    texts = [f"u{i} v{i} w{i} x{i} y{i} z{i} p{i} q{i} r{i}" for i in range(5)]
    _with_mem_docs(monkeypatch, texts)
    out = textstats.scrub_dup_ngrams("<mem>", n=8)
    assert (out["n_removed"] == 0).all()
    assert list(out["text_clean"]) == texts


def test_overlapping_windows_union_coverage(monkeypatch):
    # 9 shared tokens -> two overlapping 8-windows; coverage is their union
    shared = "a b c d e f g h i"
    _with_mem_docs(monkeypatch, [f"{shared} only1", f"only2 {shared}"])
    out = textstats.scrub_dup_ngrams("<mem>", n=8)
    assert list(out["text_clean"]) == ["only1", "only2"]
    assert list(out["n_removed"]) == [9, 9]


def test_within_doc_repeat_not_removed(monkeypatch):
    # the window repeats INSIDE one doc but exists in no other doc: the rule
    # is >=2 distinct documents, so it survives
    w = "a b c d e f g h"
    _with_mem_docs(monkeypatch, [f"{w} {w}", "something else entirely"])
    out = textstats.scrub_dup_ngrams("<mem>", n=8)
    assert out.loc[0, "n_removed"] == 0


def test_short_docs_and_partition_invariance(monkeypatch):
    texts = ["tiny doc", ""] + [f"c{i} common one two three four five six seven c{i}" for i in range(6)]
    _with_mem_docs(monkeypatch, texts, 1)
    a = textstats.scrub_dup_ngrams("<mem>", n=8, num_parts=3)
    _with_mem_docs(monkeypatch, texts, 5)
    b = textstats.scrub_dup_ngrams("<mem>", n=8, num_parts=7)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) == len(texts)
    # "common one two three four five six seven" is an 8-gram shared by all 6
    assert (a.loc[2:, "n_removed"] == 8).all()


def test_curate_corpus_stage_interplay(monkeypatch):
    """gate drops short docs; dedup keeps min doc_id per exact text; scrub
    removes only windows shared between SURVIVORS (stage-order probe: if
    scrub ran before dedup, doc 0's padA windows would be duplicated with
    its copy doc 1 and stripped — n_removed would be 68, not 8)."""
    pad_a = " ".join(f"pada{i}" for i in range(60))
    pad_b = " ".join(f"padb{i}" for i in range(60))
    shared = "s1a s2a s3a s4a s5a s6a s7a s8a"  # one exact 8-gram window
    texts = [
        f"{pad_a} {shared}",   # 0: survivor, shares ONLY `shared` with 2
        f"{pad_a} {shared}",   # 1: exact dup of 0 -> deduped (min id wins)
        f"{shared} {pad_b}",   # 2: survivor
        "too short",           # 3: gate-dropped (n_tokens < 50)
    ]
    _with_mem_docs(monkeypatch, texts)
    out = textstats.curate_corpus("<mem>", n=8)
    assert list(out["doc_id"]) == [0, 2]
    assert list(out["n_removed"]) == [8, 8]
    assert "s1a" not in out.loc[0, "text_clean"]
    assert out.loc[0, "text_clean"] == pad_a
    assert out.loc[1, "text_clean"] == pad_b


def test_ngram_novelty_attribution(ray_session, tmp_path):
    """Doc 1 introduces every window of a 9-token text; doc 2 copies it
    verbatim (novelty 0); doc 3 is fresh; doc 4 is too short for a window."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.textstats import ngram_novelty

    t1 = "a b c d e f g h i"          # 2 windows of 8
    t3 = "p q r s t u v w x y"        # 3 fresh windows
    pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [t1, t1, t3, "too short"]}
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    out = ngram_novelty(str(tmp_path), num_parts=2)
    got = {r.doc_id: (r.n_grams, r.n_novel) for r in out.itertuples()}
    assert got == {1: (2, 2), 2: (2, 0), 3: (3, 3)}


def test_collocations_window_counts(monkeypatch):
    """Target = global top token; window clips at doc edges; only the
    occurrence's OWN position is excluded, other target occurrences in
    the window DO count as neighbors."""
    _with_mem_docs(monkeypatch, ["t a t b c", "c t d", "t t e"])
    out = textstats.collocations("<mem>", window=1, k=10)
    got = dict(zip(out["word"], out["cnt"]))
    # counts: doc1 occ@0 -> a; occ@2 -> a, b; doc2 occ@1 -> c, d;
    # doc3 occ@0 -> t; occ@1 -> t, e
    assert got == {"a": 2, "t": 2, "b": 1, "c": 1, "d": 1, "e": 1}
    # ordering: cnt desc then word asc
    assert out["word"].tolist()[:2] == ["a", "t"]


def test_phrase_search_adjacency(tmp_path):
    """Phrase = the corpus top bigram; only ADJACENT in-order pairs count;
    repeated-token phrases ('t t') chain-count correctly; reversed order
    does not match."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "k v k v x",     # 'k v' twice
        "v k x y z",     # reversed only -> no match
        "a k v b",       # once
        "q r s t u",     # absent
    ]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = textstats.phrase_search(str(tmp_path), num_parts=2)
    got = dict(zip(out["doc_id"], out["n_occ"]))
    assert got == {0: 2, 2: 1}

    # explicit repeated-token phrase over 't t t' = two overlapping hits
    t2 = pa.table({"doc_id": pa.array([7], pa.int64()),
                   "text": pa.array(["t t t"], pa.string())})
    d2 = tmp_path / "rep"
    d2.mkdir()
    pq.write_table(t2, str(d2 / "documents.parquet"))
    out2 = textstats.phrase_search(str(d2), phrase=("t", "t"), num_parts=2)
    assert dict(zip(out2["doc_id"], out2["n_occ"])) == {7: 2}
