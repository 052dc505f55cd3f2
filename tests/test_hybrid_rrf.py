"""hybrid_search_rrf fusion semantics on a planted corpus: known BM25 and
cosine rankings, single-leg docs encoded as rank 0 (never NULL), RRF tie
broken by doc_id, and the fused ordering itself."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from osmi_addresses_ray.pipelines.similarity import hybrid_search_rrf


def _corpus(tmp_path):
    # lexical leg: only docs 0..2 contain the query terms; tf gradient
    # makes the BM25 order 2 > 1 > 0 (more matched terms, shorter docs)
    texts = [
        "join pad pad pad pad pad pad pad",          # 1 term, long
        "join scan pad pad",                          # 2 terms
        "join scan dup",                              # 3 terms, shortest
        "nothing relevant here at all",               # lexical miss
        "also nothing relevant whatsoever",           # lexical miss
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    )
    docs.to_parquet(os.path.join(tmp_path, "documents.parquet"), index=False)
    # semantic leg: query = vec 0; vec 3 nearly parallel (top sem), vec 4
    # halfway, vecs 1 and 2 orthogonal (cosine 0, still ranked by doc_id)
    emb = [
        [1.0, 0.0],   # 0: the query itself (excluded from sem leg)
        [0.0, 1.0],   # 1: cosine 0
        [0.0, -1.0],  # 2: cosine 0 (negative axis -> cosine 0 with [1,0])
        [1.0, 0.01],  # 3: cosine ~1
        [1.0, 1.0],   # 4: cosine ~0.707
    ]
    edf = pd.DataFrame(
        {
            "vec_id": np.arange(5, dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in emb],
            "label": np.zeros(5, dtype=np.int32),
        }
    )
    edf.to_parquet(os.path.join(tmp_path, "embeddings.parquet"), index=False)


def test_rrf_fusion_semantics(tmp_path, ray_session):
    _corpus(str(tmp_path))
    out = hybrid_search_rrf(str(tmp_path), k=5, k_lex=3, k_sem=3)
    got = {
        int(r.doc_id): (int(r.lex_rank), int(r.sem_rank), r.rrf)
        for r in out.itertuples()
    }
    # lexical ranking: 2, 1, 0; semantic ranking (k_sem=3): 3, 4, then the
    # cosine-0 tie 1 vs 2 broken by vec_id -> 1
    assert got[2][0] == 1 and got[1][0] == 2 and got[0][0] == 3
    assert got[3][1] == 1 and got[4][1] == 2 and got[1][1] == 3
    # single-leg docs carry rank 0 on the missing leg
    assert got[0][1] == 0 and got[3][0] == 0 and got[4][0] == 0
    # doc 1 is the only two-leg doc: rrf = 1/62 + 1/63
    assert got[1][2] == 1.0 / 62 + 1.0 / 63
    # fused order: doc 1 (two legs) first, then the rank-1 singles 2 and 3
    # (equal rrf 1/61 -> doc_id tie-break), then the rank-2 single (1/62)
    # ahead of the rank-3 single (1/63)
    assert out["doc_id"].tolist() == [1, 2, 3, 4, 0]
