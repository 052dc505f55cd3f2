"""Unit tests for the round-3 statistics additions: the 2-D skyline kernel,
median-absolute-deviation chaining, and the exact-integer covariance fold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osmi_addresses_ray.pipelines.relational import _skyline2d
from osmi_addresses_ray.pipelines.similarity import embedding_covariance


def _naive_skyline(price, date):
    n = len(price)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (
                price[j] >= price[i]
                and date[j] <= date[i]
                and (price[j] > price[i] or date[j] < date[i])
            ):
                keep[i] = False
                break
    return keep


def test_skyline_matches_naive_on_random_inputs():
    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 40))
        # small integer domains force heavy ties in both dimensions
        price = rng.integers(0, 6, n).astype(np.float64)
        date = rng.integers(0, 6, n).astype(np.float64)
        got = _skyline2d(price, date)
        want = _naive_skyline(price, date)
        assert np.array_equal(got, want), (trial, price, date)


def test_skyline_duplicates_of_frontier_point_all_survive():
    price = np.array([5.0, 5.0, 3.0])
    date = np.array([2.0, 2.0, 1.0])
    keep = _skyline2d(price, date)
    assert keep.tolist() == [True, True, True]


def test_skyline_empty():
    assert _skyline2d(np.empty(0), np.empty(0)).tolist() == []


def test_embedding_covariance_exact_integers(tmp_path):
    rng = np.random.default_rng(3)
    n, d = 257, 5  # odd count to exercise ragged batches
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = embedding_covariance(str(tmp_path))
    q = np.floor(mat.astype(np.float64) * 1_000_000.0 + 0.5).astype(np.int64)
    want_gram = q.T @ q
    assert len(out) == d * d
    for _, r in out.iterrows():
        i, j = int(r["i"]) - 1, int(r["j"]) - 1
        assert r["n"] == n
        assert r["sum_qi"] == q[:, i].sum()
        assert r["sum_qj"] == q[:, j].sum()
        assert r["sum_qiqj"] == want_gram[i, j]


def test_mad_priority_matches_duckdb(tmp_path):
    import duckdb

    from osmi_addresses_ray.pipelines.relational import q_mad_priority

    rng = np.random.default_rng(11)
    n = 500
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.zeros(n, dtype=np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.round(rng.uniform(10, 1000, n), 2),
            "o_orderdate": pd.to_datetime("2024-01-01"),
            "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH", "3-LOW"], n),
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(tmp_path / "orders.parquet"))
    got = q_mad_priority(str(tmp_path))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'")
    want = con.execute(
        """
        WITH m AS (SELECT o_orderpriority, quantile_disc(o_totalprice, 0.5) AS med
                   FROM orders GROUP BY o_orderpriority)
        SELECT o.o_orderpriority, max(m.med) AS med,
               quantile_disc(abs(o.o_totalprice - m.med), 0.5) AS mad
        FROM orders o JOIN m USING (o_orderpriority)
        GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
        """
    ).fetchdf()
    assert np.array_equal(got["med"].to_numpy(), want["med"].to_numpy())
    assert np.array_equal(got["mad"].to_numpy(), want["mad"].to_numpy())


def _write_emb(tmp_path, n=60, d=16, seed=5):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return mat


def test_pq_codes_match_scalar_oracle(tmp_path):
    from osmi_addresses_ray.oracle.llm_ops import pq_adc_oracle, pq_codes_oracle
    from osmi_addresses_ray.pipelines.similarity import pq_adc_search, pq_codes

    _write_emb(tmp_path)
    got = pq_codes(str(tmp_path)).reset_index(drop=True)
    want = pq_codes_oracle(str(tmp_path)).reset_index(drop=True)
    assert got.equals(want)
    ga = pq_adc_search(str(tmp_path))
    wa = pq_adc_oracle(str(tmp_path))
    assert np.array_equal(ga["vec_id"].to_numpy(), wa["vec_id"].to_numpy())
    assert np.array_equal(ga["adc_dist"].to_numpy(), wa["adc_dist"].to_numpy())


def test_pq_codes_compress_and_reconstruct_sanely(tmp_path):
    """PQ is lossy but must beat the trivial all-zero reconstruction."""
    from osmi_addresses_ray.pipelines.similarity import (
        _pq_encode,
        train_pq_codebooks,
    )

    mat = _write_emb(tmp_path).astype(np.float64)
    books = train_pq_codebooks(str(tmp_path))
    codes = _pq_encode(mat, books)
    m, k, sub = books.shape
    recon = np.concatenate([books[mi][codes[:, mi]] for mi in range(m)], axis=1)
    err = ((mat - recon) ** 2).sum()
    assert err < (mat**2).sum() * 0.9


def test_inverted_index_search_matches_scan(tmp_path):
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.textstats import (
        build_inverted_index,
        search_docs_all_terms,
        search_docs_indexed,
    )

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "merge the window batch now",          # all three terms
                "merge merge window batch",            # all, with repeats
                "merge window",                        # missing batch
                "window batch",                        # missing merge
                "BATCH Window MERGE",                  # case-folded hit
                "nothing relevant here",
                "merge batch merge window batch",      # all, heavy
                "",                                    # empty doc
            ],
            "lang": ["en"] * 8,
            "source": ["t"] * 8,
            "n_chars": np.zeros(8, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    scan = search_docs_all_terms(str(tmp_path))
    idx = search_docs_indexed(str(tmp_path))
    assert scan.equals(idx)
    assert idx["doc_id"].tolist() == [0, 1, 4, 6]
    # index layout exists and a rebuild is a cache hit (same dir)
    d1 = build_inverted_index(str(tmp_path))
    d2 = build_inverted_index(str(tmp_path))
    assert d1 == d2


def test_pca_project_matches_scalar_oracle(tmp_path):
    from osmi_addresses_ray.oracle.llm_ops import pca_project_oracle
    from osmi_addresses_ray.pipelines.similarity import pca_project

    _write_emb(tmp_path, n=120, d=16, seed=9)
    got = pca_project(str(tmp_path)).reset_index(drop=True)
    want = pca_project_oracle(str(tmp_path)).reset_index(drop=True)
    assert got.equals(want)


def test_pca_captures_planted_dominant_direction(tmp_path):
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.similarity import pca_project

    rng = np.random.default_rng(4)
    n, d = 200, 16
    t = rng.normal(size=n) * 10.0  # dominant axis = dim 0
    mat = rng.normal(size=(n, d)).astype(np.float32) * 0.1
    mat[:, 0] += t.astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
            "label": pa.array(np.zeros(n, np.int32)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    out = pca_project(str(tmp_path))
    corr = np.corrcoef(out["pc1"].to_numpy(), mat[:, 0].astype(np.float64))[0, 1]
    assert abs(corr) > 0.99


def test_duplicate_spans_planted_copies(tmp_path):
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.textstats import duplicate_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                f"intro {shared} outro one",
                f"different prefix {shared} tail",
                "totally unrelated text with no overlap at all whatsoever",
                "short",
                f"{shared}",  # the window itself
            ],
            "lang": ["en"] * 5,
            "source": ["t"] * 5,
            "n_chars": np.zeros(5, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = duplicate_spans(str(tmp_path), num_parts=3)
    # docs 0, 1, 4 share the 8-token window; 2 and 3 share nothing
    assert out["doc_id"].tolist() == [0, 1, 4]
    assert (out["n_dup_spans"] == 1).all()


def test_left_join_nulls_keeps_orderless_customers(tmp_path):
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.relational import q_left_join_nulls

    cust = pd.DataFrame({"c_custkey": np.arange(6, dtype=np.int64),
                         "c_name": [f"c{i}" for i in range(6)],
                         "c_nationkey": np.zeros(6, dtype=np.int64),
                         "c_mktsegment": ["A"] * 6})
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([0, 0, 2, 5], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [10.0, 20.0, 5.5, 7.25],
            "o_orderdate": pd.to_datetime("2024-01-01"),
            "o_orderpriority": ["1"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(cust, preserve_index=False),
                   str(tmp_path / "customer.parquet"))
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   str(tmp_path / "orders.parquet"))
    out = q_left_join_nulls(str(tmp_path), num_parts=3)
    assert out["c_custkey"].tolist() == [0, 1, 2, 3, 4, 5]
    assert out["n_orders"].tolist() == [2, 0, 1, 0, 0, 1]
    assert out["total_spent"].tolist() == [30.0, 0.0, 5.5, 0.0, 0.0, 7.25]


def test_bpe_merges_planted_corpus(tmp_path):
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.textstats import bpe_merges

    # "aaab" x 10 and "ab" x 5: pair (a,a) count 2*10=20, (a,b) 10+5=15
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": [" ".join(["aaab"] * 10), " ".join(["ab"] * 5)],
            "lang": ["en"] * 2,
            "source": ["t"] * 2,
            "n_chars": np.zeros(2, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = bpe_merges(str(tmp_path), n_merges=3)
    # merge 1: (a, a) 20; then "aa ab" x10 + "ab" x5 → (aa, ab)? sequences:
    # aaab → [aa, a, b] wait: merge replaces left-to-right: [a,a,a,b] →
    # [aa, a, b]; pairs now (aa,a) 10, (a,b) 15 → merge 2 = (a, b) 15
    assert (out.loc[0, "left"], out.loc[0, "right"], out.loc[0, "pair_count"]) == ("a", "a", 20)
    assert (out.loc[1, "left"], out.loc[1, "right"], out.loc[1, "pair_count"]) == ("a", "b", 15)
    # after merge 2: aaab = [aa, ab]; ab = [ab] → merge 3 = (aa, ab) 10
    assert (out.loc[2, "left"], out.loc[2, "right"], out.loc[2, "pair_count"]) == ("aa", "ab", 10)


def test_bpe_tie_breaks_lexicographically(tmp_path):
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.textstats import bpe_merges

    # "xy" and "ab" both appear 3 times → pair counts tie at 3; (a,b) < (x,y)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(1, dtype=np.int64),
            "text": ["xy ab xy ab xy ab"],
            "lang": ["en"],
            "source": ["t"],
            "n_chars": np.zeros(1, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    out = bpe_merges(str(tmp_path), n_merges=1)
    assert (out.loc[0, "left"], out.loc[0, "right"]) == ("a", "b")


def test_weighted_quantiles_differ_from_unweighted(tmp_path, ray_session):
    """One heavy row dominates: the weighted median is the heavy value,
    the unweighted median would not be."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.relational import q_weighted_quantiles

    # flag A: values 1.00..5.00, weight 1 each, plus value 9.00 with
    # weight 95 → W = 100; weighted p50 = p25 = 9.00 (cum hits 9.00's
    # mass at rank 6..100); p-small = low values
    df = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 6,
            "l_extendedprice": [1.0, 2.0, 3.0, 4.0, 5.0, 9.0],
            "l_quantity": [1.0, 1.0, 1.0, 1.0, 1.0, 95.0],
        }
    )
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = q_weighted_quantiles(str(tmp_path))
    r = out.iloc[0]
    assert r.total_w == 100
    # thresholds: p25 -> cum >= 25, p50 -> cum >= 50: both inside the
    # heavy 9.00 mass (cum before it is 5)
    assert r.p25 == 900 and r.p50 == 900 and r.p99 == 900
