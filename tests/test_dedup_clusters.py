"""Distributed connected components (large-star/small-star) and the
end-to-end dedup_clusters operator."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osmi_addresses_ray.pipelines.dedup import connected_components, dedup_clusters


def _cc(pairs: list[tuple[int, int]], num_parts: int = 3) -> dict[int, int]:
    df = pd.DataFrame(pairs, columns=["u", "v"]).astype("int64")
    ds = rd.from_pandas(df).materialize()
    out = connected_components(ds, num_parts=num_parts).to_pandas()
    return dict(zip(out["u"], out["v"]))


def _uf(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for p in pairs for n in p}
    return {n: find(n) for n in nodes if find(n) != n}


def test_cc_long_chain_multi_round():
    # a length-40 path needs several star rounds — exercises the iteration
    pairs = [(i, i + 1) for i in range(40)]
    got = _cc(pairs)
    assert got == {i: 0 for i in range(1, 41)}


def test_cc_two_components_and_clique():
    pairs = [(5, 9), (9, 7), (100, 101), (101, 102), (102, 100), (200, 201)]
    assert _cc(pairs) == _uf(pairs)


def test_cc_duplicate_and_reversed_edges():
    pairs = [(3, 1), (1, 3), (3, 1), (8, 3)]
    assert _cc(pairs) == {3: 1, 8: 1}


def test_cc_empty():
    ds = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    ).materialize()
    out = connected_components(ds, num_parts=2).to_pandas()
    assert len(out) == 0


def test_cc_random_vs_union_find():
    rng = np.random.default_rng(7)
    nodes = rng.integers(0, 300, size=(120, 2))
    pairs = [(int(a), int(b)) for a, b in nodes if a != b]
    assert _cc(pairs, num_parts=5) == _uf(pairs)


def test_dedup_clusters_matches_oracle_sf0001():
    from osmi_addresses_ray.oracle.llm_ops import dedup_clusters_oracle

    sf = "/root/testdata/sf0.001"
    got = dedup_clusters(sf)
    want = dedup_clusters_oracle(sf)
    pd.testing.assert_frame_equal(got, want)
    # contract: one row per doc, reps are component minima (rep <= doc)
    assert (got["rep_id"] <= got["doc_id"]).all()
    assert got["doc_id"].is_unique


def test_knn_hyperplane_matches_oracle_and_recall():
    from osmi_addresses_ray.oracle.llm_ops import knn_hyperplane_oracle
    from osmi_addresses_ray.pipelines.similarity import knn_bruteforce, knn_hyperplane

    sf = "/root/testdata/sf0.001"
    got = knn_hyperplane(sf)
    want = knn_hyperplane_oracle(sf)
    pd.testing.assert_frame_equal(got, want)
    assert len(got) > 0
    # sanity: the probed approximation overlaps the exact answer
    exact = set(knn_bruteforce(sf)["vec_id"])
    assert len(set(got["vec_id"]) & exact) >= 1


def test_incremental_dedup_equals_one_shot(tmp_path):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from osmi_addresses_ray.pipelines.dedup import exact_dedup_incremental

    texts = ["alpha", "beta", "alpha", "gamma", "beta", "alpha", "delta", "gamma"]
    docs = pd.DataFrame({"doc_id": np.arange(8, dtype=np.int64), "text": texts})
    state = tmp_path / "state"

    # increments in doc_id order (the ingest-log contract)
    inc1 = rd.from_pandas(docs[docs["doc_id"] < 4]).repartition(2)
    inc2 = rd.from_pandas(docs[docs["doc_id"] >= 4]).repartition(2)
    kept1 = exact_dedup_incremental(inc1, str(state)).to_pandas()
    kept2 = exact_dedup_incremental(inc2, str(state)).to_pandas()
    got = sorted(pd.concat([kept1, kept2])["doc_id"].tolist())
    # one-shot: min doc_id per distinct text
    want = sorted(docs.groupby("text")["doc_id"].min().tolist())
    assert got == want == [0, 1, 3, 6]

    # replaying increment 2: state already holds its signatures -> nothing new
    kept2b = exact_dedup_incremental(
        rd.from_pandas(docs[docs["doc_id"] >= 4]).repartition(2), str(state)
    ).to_pandas()
    assert len(kept2b) == 0
