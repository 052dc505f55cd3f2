"""Unit tests for the round-3 relational additions: exact grouped quantiles
(histogram exchange), grouped top-k (two-level partial reduction), and the
bloom-prefiltered exact semi-join."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osmi_addresses_ray.pipelines.relational import (
    _bloom_hashes,
    _bloom_member,
    bloom_semi_join,
    grouped_quantiles,
    grouped_topk,
)


def test_grouped_quantiles_matches_quantile_disc_rule():
    # duplicated values + a group with a single row
    vals = [1.0, 1.0, 2.0, 5.0, 5.0, 5.0, 9.0]
    df = pd.DataFrame({"g": ["a"] * len(vals) + ["b"], "v": vals + [42.0]})
    ds = rd.from_pandas(df).repartition(3)
    out = grouped_quantiles(ds, "g", "v", [0.0, 0.25, 0.5, 0.75, 1.0])
    a = out[out["g"] == "a"].iloc[0]
    sorted_a = sorted(vals)
    n = len(sorted_a)
    for p, col in [(0.0, "p00"), (0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (1.0, "p100")]:
        idx = max(0, int(np.ceil(p * n)) - 1)
        assert a[col] == sorted_a[idx], (p, a[col])
    b = out[out["g"] == "b"].iloc[0]
    assert all(b[c] == 42.0 for c in ["p00", "p25", "p50", "p75", "p100"])


def test_grouped_topk_ties_and_small_groups():
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1, 2, 3, 3],
            "score": [5.0, 5.0, 5.0, 1.0, 7.0, 2.0, 2.0],
            "id": [30, 10, 20, 40, 1, 2, 1],
        }
    )
    ds = rd.from_pandas(df).repartition(4)
    out = grouped_topk(ds, "k", "score", 2, tie_col="id")
    # k=1: three rows tied at 5.0 -> ids 10, 20 win; k=3 has only 2 rows
    got = out.groupby("k")["id"].apply(list).to_dict()
    assert got[1] == [10, 20]
    assert got[2] == [1]
    assert got[3] == [1, 2]
    assert out[out["k"] == 3]["rank"].tolist() == [1, 2]


def test_bloom_member_no_false_negatives():
    keys = np.arange(0, 100000, 7, dtype=np.int64)
    bits = np.zeros((1 << 20) >> 6, dtype=np.uint64)
    for idx in _bloom_hashes(keys):
        np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
    assert _bloom_member(bits, keys).all()
    # false-positive rate on disjoint probes stays tiny at this load factor
    probes = np.arange(1, 100000, 7, dtype=np.int64)  # offset by 1 -> disjoint
    fp = _bloom_member(bits, probes).mean()
    assert fp < 0.01, fp


def test_bloom_semi_join_exact_despite_false_positives():
    # Force a degenerate 64-bit filter so almost EVERY probe is a bloom hit:
    # the exact verify stage must still return only true members.
    probe = rd.from_pandas(
        pd.DataFrame({"pk": np.arange(1000, dtype=np.int64), "x": np.arange(1000) * 1.5})
    ).repartition(3)
    build = rd.from_pandas(
        pd.DataFrame({"bk": np.array([3, 500, 999, 999, 1500], dtype=np.int64)})
    ).repartition(2)
    out = bloom_semi_join(probe, "pk", build, "bk", num_parts=4, num_bits=64).to_pandas()
    assert sorted(out["pk"].tolist()) == [3, 500, 999]
    assert list(out.columns) == ["pk", "x"]


def test_bloom_semi_join_empty_build():
    probe = rd.from_pandas(pd.DataFrame({"pk": np.arange(10, dtype=np.int64)}))
    build = rd.from_arrow(pa.table({"bk": pa.array([], pa.int64())}))
    out = bloom_semi_join(probe, "pk", build, "bk", num_parts=2).to_pandas()
    assert len(out) == 0


def test_anti_join_partitions_with_semi_join():
    from osmi_addresses_ray.pipelines.relational import anti_join

    probe = rd.from_pandas(
        pd.DataFrame({"pk": np.arange(100, dtype=np.int64), "v": np.arange(100) * 2.0})
    ).repartition(3)
    build = rd.from_pandas(
        pd.DataFrame({"bk": np.array([5, 5, 17, 99, 1234], dtype=np.int64)})
    ).repartition(2)
    out = anti_join(probe, "pk", build, "bk", num_parts=4).to_pandas()
    assert sorted(out["pk"].tolist()) == sorted(set(range(100)) - {5, 17, 99})


def test_anti_join_empty_build_keeps_everything():
    from osmi_addresses_ray.pipelines.relational import anti_join

    probe = rd.from_pandas(pd.DataFrame({"pk": np.arange(10, dtype=np.int64)}))
    build = rd.from_arrow(pa.table({"bk": pa.array([], pa.int64())}))
    out = anti_join(probe, "pk", build, "bk", num_parts=2).to_pandas()
    assert sorted(out["pk"].tolist()) == list(range(10))


def test_chunk_documents_window_spec(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": [
                " ".join(f"w{i}" for i in range(40)),  # 2 chunks: 32 + 16
                "only three tokens",                    # 1 short chunk
                "...",                                  # no tokens -> no chunks
            ],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    from osmi_addresses_ray.pipelines.textstats import chunk_documents

    out = chunk_documents(str(tmp_path))
    d1 = out[out["doc_id"] == 1]
    assert d1["start_tok"].tolist() == [0, 24]
    assert d1["n_tokens"].tolist() == [32, 16]
    assert d1.iloc[1]["chunk_text"].split(" ")[0] == "w24"
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and d2.iloc[0]["chunk_text"] == "only three tokens"
    assert (out["doc_id"] == 3).sum() == 0


def test_grouped_quantiles_binned_exact_with_negatives():
    """The total-order bit binning must stay order-preserving across the
    sign boundary; result must equal the histogram variant (both exact)."""
    rng = np.random.default_rng(9)
    vals = np.concatenate(
        [rng.uniform(-1e5, 1e5, 5000), np.array([0.0, -0.0, 1e-300, -1e-300])]
    )
    df = pd.DataFrame({"g": np.where(np.arange(len(vals)) % 2 == 0, "a", "b"), "v": vals})
    ds = rd.from_pandas(df).repartition(4)
    from osmi_addresses_ray.pipelines.relational import (
        grouped_quantiles,
        grouped_quantiles_binned,
    )

    qs = [0.1, 0.5, 0.9]
    got = grouped_quantiles_binned(ds, "g", "v", qs).sort_values("g").reset_index(drop=True)
    want = grouped_quantiles(ds, "g", "v", qs).sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_ntile_formula_matches_duckdb():
    import duckdb

    from osmi_addresses_ray.pipelines.relational import _ntile_of

    for n in [1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 100, 103]:
        for b in [1, 2, 3, 4, 7]:
            want = duckdb.sql(
                f"SELECT ntile({b}) OVER (ORDER BY x) FROM (SELECT unnest(range({n})) x)"
            ).df().iloc[:, 0].to_numpy()
            got = _ntile_of(np.arange(1, n + 1), n, b)
            assert (got == want).all(), (n, b)


def test_ntile_orders_bucket_sizes(ray_session):
    from osmi_addresses_ray.pipelines.relational import q_ntile_orders

    out = q_ntile_orders("/root/testdata/sf0.001")
    assert len(out) == 1500
    sizes = out.groupby("bucket").size()
    assert list(sizes.index) == [1, 2, 3, 4]
    assert (sizes == 375).all()  # 1500 divides evenly
    # bucket must be monotone in (price desc, key asc) global order
    s = out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
    b = s["bucket"].to_numpy()
    assert (np.diff(b) >= 0).all()


def test_dense_rank_ties_share_rank_no_gaps(ray_session):
    from osmi_addresses_ray.pipelines.relational import q_dense_rank_customers

    out = q_dense_rank_customers("/root/testdata/sf0.001")
    by_cnt = out.drop_duplicates("n_orders").sort_values("n_orders", ascending=False)
    assert list(by_cnt["drank"]) == list(range(1, len(by_cnt) + 1))  # dense: no gaps
    # equal counts share the rank
    g = out.groupby("n_orders")["drank"].nunique()
    assert (g == 1).all()


def test_first_last_order_ties_and_singles(tmp_path):
    # customer 1: date tie on the first day -> smaller orderkey wins first,
    # larger wins last only if it's the max (date, key); customer 2: single order
    orders = pd.DataFrame(
        {
            "o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "o_orderkey": np.array([20, 10, 30, 7], dtype=np.int64),
            "o_orderdate": pd.to_datetime(
                ["2024-01-01", "2024-01-01", "2024-02-01", "2024-03-01"]
            ),
        }
    )
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    from osmi_addresses_ray.pipelines.relational import q_first_last_order

    out = q_first_last_order(str(tmp_path))
    assert out.to_dict("records") == [
        {"o_custkey": 1, "first_orderkey": 10, "last_orderkey": 30, "n_orders": 3},
        {"o_custkey": 2, "first_orderkey": 7, "last_orderkey": 7, "n_orders": 1},
    ]


def test_events_cube_levels(tmp_path):
    events = pd.DataFrame(
        {
            "event_type": ["a", "a", "b"],
            "ts": pd.to_datetime(
                ["2024-01-01 05:00", "2024-01-02 06:00", "2024-01-01 07:00"]
            ),
            "value": [1.0, 2.0, 4.0],
        }
    )
    events.to_parquet(tmp_path / "events.parquet", index=False)
    from osmi_addresses_ray.pipelines.relational import q_events_cube

    out = q_events_cube(str(tmp_path))
    # 3 fine rows + 2 by-type + 2 by-day + 1 grand = 8
    assert len(out) == 8
    grand = out[out["event_type"].isna() & out["day"].isna()]
    assert grand["n_events"].tolist() == [3] and grand["sum_value"].tolist() == [7.0]
    by_day = out[out["event_type"].isna() & out["day"].notna()]
    assert by_day["n_events"].tolist() == [2, 1]  # Jan 1 (a+b), Jan 2 (a)


def test_doc_repetition_edges(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": ["the the the cat", "...", "Unique Words only Unique"],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    from osmi_addresses_ray.pipelines.textstats import doc_repetition

    out = doc_repetition(str(tmp_path))
    assert out.to_dict("records") == [
        {"doc_id": 1, "n_tokens": 4, "n_distinct": 2, "top_count": 3},
        {"doc_id": 2, "n_tokens": 0, "n_distinct": 0, "top_count": 0},
        # case-sensitive spec: "Unique" twice, "Words"/"only" once
        {"doc_id": 3, "n_tokens": 4, "n_distinct": 3, "top_count": 2},
    ]


def test_props_extract_missing_and_negative(tmp_path, ray_session):
    """Malformed / k-less JSON counts as missing (min/max pinned to 0 for
    all-missing groups); negative and spaced k parse."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.relational import q_props_extract

    df = pd.DataFrame(
        {
            "event_id": range(6),
            "event_type": ["a", "a", "a", "b", "b", "c"],
            "props": ['{"k": 5}', '{"k":-3}', '{"x": 1}', '{ "k" : 7 }',
                      "not json", "{}"],
        }
    )
    df["ts"] = pd.Timestamp("2024-01-01")
    df["user_id"] = 1
    df["value"] = 0.0
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = q_props_extract(str(tmp_path)).set_index("event_type")
    assert out.loc["a", ["n", "n_missing", "sum_k", "min_k", "max_k"]].tolist() == [3, 1, 2, -3, 5]
    assert out.loc["b", ["n", "n_missing", "sum_k"]].tolist() == [2, 1, 7]
    assert out.loc["c", ["n_missing", "min_k", "max_k"]].tolist() == [1, 0, 0]


def test_theil_sen_outlier_robust_and_same_day_excluded(tmp_path, ray_session):
    """Prices climb exactly 1 cent/day; one massive outlier and one
    same-day duplicate must not move the median slope off 1.0."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.relational import theil_sen_trend

    days = np.arange(10)
    rows = []
    for i, d in enumerate(days):
        rows.append((i + 1, 1, pd.Timestamp("2024-01-01") + pd.Timedelta(days=int(d)),
                     (1000 + d) / 100.0))
    # outlier: +1e6 cents on day 20
    rows.append((100, 1, pd.Timestamp("2024-01-21"), 11020.0))
    # same-day duplicate of day 0 (pairs with it where dx=0 are excluded)
    rows.append((101, 1, pd.Timestamp("2024-01-01"), 99.99))
    orders = pd.DataFrame(
        rows, columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    pd.DataFrame({"c_custkey": [1], "c_nationkey": [7]}).to_parquet(
        tmp_path / "customer.parquet", index=False
    )
    out = theil_sen_trend(str(tmp_path), num_parts=3)
    assert out.nationkey.tolist() == [7]
    assert abs(out.slope.iloc[0] - 1.0) < 1e-9  # median slope = 1 cent/day


def test_weighted_sample_deterministic_and_weight_monotone(tmp_path, ray_session):
    """A fixed corpus with two weight classes: the draw must be reproducible
    run-to-run and the heavy class (w=50) must win far more of the k slots
    than its row share (10%) — the ∝-weight property of the min-of-w-draws
    priority. Also re-derives one row's priority by hand."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.relational import weighted_sample

    n = 2000
    ok = np.arange(1, n + 1, dtype=np.int64)
    w = np.where(ok % 10 == 0, 50.0, 1.0)  # 10% heavy rows
    pd.DataFrame(
        {"l_orderkey": ok, "l_linenumber": np.int32(1), "l_quantity": w}
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)

    out1 = weighted_sample(str(tmp_path), k=100)
    out2 = weighted_sample(str(tmp_path), k=100)
    pd.testing.assert_frame_equal(out1, out2)
    assert len(out1) == 100
    assert (np.diff(out1.priority.to_numpy()) >= 0).all()

    # heavy rows are 10% of the corpus but hold ~84% of total weight
    heavy = (out1.wt == 50).mean()
    assert heavy > 0.5, heavy

    # hand-recompute the winning row's priority
    r = out1.iloc[0]
    keymod = (int(r.l_orderkey) * 8 + int(r.l_linenumber)) % 1000003
    draws = [
        ((((keymod + j * 10007 + 1) * 2654435761) % (1 << 32) % 999983)
         * 2654435761) % (1 << 32)
        for j in range(int(r.wt))
    ]
    assert min(draws) == int(r.priority)


def test_group_moments_closed_form(ray_session, tmp_path):
    from osmi_addresses_ray.pipelines.relational import q_group_moments

    pd.DataFrame(
        {
            "l_returnflag": ["A", "A", "B"],
            "l_quantity": [2.0, 3.0, 10.0],
            "l_discount": [0.05, 0.10, 0.00],
        }
    ).to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = q_group_moments(str(tmp_path))
    a = out[out.l_returnflag == "A"].iloc[0]
    assert (a.n, a.s1, a.s2, a.s3, a.s4) == (2, 5, 13, 35, 97)
    assert a.sqd == 2 * 5 + 3 * 10  # exact centi-discount cross-moment
    b = out[out.l_returnflag == "B"].iloc[0]
    assert (b.n, b.s1, b.s2, b.s3, b.s4, b.sqd) == (1, 10, 100, 1000, 10000, 0)


def test_full_outer_hours_sentinels(ray_session, tmp_path):
    from osmi_addresses_ray.pipelines.relational import q_full_outer_hours

    base = np.datetime64("2024-01-01T00:00:00", "us")
    hr = np.timedelta64(3_600_000_000, "us")
    rows = [
        (0, 1, "click", base),            # hour 0: click only
        (1, 1, "view", base + hr),        # hour 1: view only
        (2, 1, "click", base + 2 * hr),   # hour 2: both
        (3, 1, "view", base + 2 * hr),
        (4, 1, "view", base + 2 * hr),
        (5, 1, "error", base + 3 * hr),   # hour 3: neither side -> no row
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type", "ts"])
    df["value"] = 0.0
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = q_full_outer_hours(str(tmp_path), num_parts=2)
    assert out[["n_click", "n_view"]].values.tolist() == [[1, -1], [-1, 1], [1, 2]]
    assert len(out) == 3


# --- Benford first-digit audit --------------------------------------------------


def test_benford_audit_digit_extraction_and_ppm(tmp_path, ray_session):
    """Digit boundaries: 9.99 -> 999 (9), 1.00 -> 100 (1), 100000.00 ->
    10000000 (1), 0.55 -> 55 (5), 2.345 -> 235 cents (2). Four 1s, one 9,
    one 5, one 2, plus a zero-price row that must be dropped."""
    from osmi_addresses_ray.pipelines.relational import benford_audit

    prices = [9.99, 1.00, 100000.00, 0.55, 2.345, 1.01, 19.99, 0.0]
    orders = pd.DataFrame({"o_totalprice": prices})
    orders.to_parquet(tmp_path / "orders.parquet", index=False)
    out = benford_audit(str(tmp_path))
    got = dict(zip(out["digit"], out["n"]))
    assert got == {1: 4, 2: 1, 5: 1, 9: 1}
    total = 7
    row1 = out[out["digit"] == 1].iloc[0]
    assert row1["obs_ppm"] == 4 * 1_000_000 // total
    assert row1["exp_ppm"] == 301030
    assert row1["dev_ppm"] == abs(4 * 1_000_000 // total - 301030)
    # ppm constants partition exactly
    from osmi_addresses_ray.pipelines.relational import _BENFORD_PPM

    assert int(_BENFORD_PPM.sum()) == 1_000_000


def test_benford_audit_empty(tmp_path, ray_session):
    from osmi_addresses_ray.pipelines.relational import benford_audit

    pd.DataFrame({"o_totalprice": pd.Series([], dtype="float64")}).to_parquet(
        tmp_path / "orders.parquet", index=False
    )
    out = benford_audit(str(tmp_path))
    assert out.empty
    assert list(out.columns) == ["digit", "n", "exp_ppm", "obs_ppm", "dev_ppm"]


# --- association rules -----------------------------------------------------------


def test_assoc_rules_hand_baskets(tmp_path, ray_session):
    """Baskets: {1,2,3}, {1,2}, {2,3}, {4}. Pair supports: (1,2)=2,
    (1,3)=1, (2,3)=2. Item supports 1:2, 2:3, 3:2, 4:1; n_orders=4."""
    from osmi_addresses_ray.pipelines.relational import assoc_rules

    rows = []
    for o, parts in [(10, [1, 2, 3]), (20, [1, 2]), (30, [2, 3]), (40, [4])]:
        for p in parts:
            rows.append((o, p))
            rows.append((o, p))  # duplicate lineitems must not inflate support
    df = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    df.to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = assoc_rules(str(tmp_path), top=10, num_parts=3)
    got = {
        (r.part_a, r.part_b): (r.support_ab, r.support_a, r.support_b)
        for r in out.itertuples()
    }
    assert got == {
        (1, 2): (2, 2, 3), (2, 3): (2, 3, 2), (1, 3): (1, 2, 2),
    }
    assert (out["n_orders"] == 4).all()
    # ordering: support desc then (part_a, part_b)
    assert list(zip(out["part_a"], out["part_b"])) == [(1, 2), (2, 3), (1, 3)]


def test_assoc_rules_no_pairs(tmp_path, ray_session):
    from osmi_addresses_ray.pipelines.relational import assoc_rules

    pd.DataFrame({"l_orderkey": [1, 2], "l_partkey": [7, 8]}).to_parquet(
        tmp_path / "lineitem.parquet", index=False
    )
    assert assoc_rules(str(tmp_path)).empty


# --- Soundex -----------------------------------------------------------------------


def test_soundex_canonical_vectors():
    from osmi_addresses_ray.pipelines.relational import soundex_code

    # the classic published test vectors, incl. h/w transparency
    # (Ashcraft), vowel separation (Tymczak) and first-letter dedup
    # (Pfister)
    assert soundex_code("Robert") == "R163"
    assert soundex_code("Rupert") == "R163"
    assert soundex_code("Ashcraft") == "A261"
    assert soundex_code("Ashcroft") == "A261"
    assert soundex_code("Tymczak") == "T522"
    assert soundex_code("Pfister") == "P236"
    assert soundex_code("Honeyman") == "H555"
    assert soundex_code("lee") == "L000"
    assert soundex_code("") == ""


def test_soundex_parts_counts(tmp_path, ray_session):
    from osmi_addresses_ray.pipelines.relational import soundex_parts

    names = ["robert plum", "rupert gold", "lee navy", "ashcraft mint"]
    pd.DataFrame({"p_name": names}).to_parquet(
        tmp_path / "part.parquet", index=False
    )
    out = soundex_parts(str(tmp_path))
    got = dict(zip(out["soundex"], out["n"]))
    assert got == {"R163": 2, "L000": 1, "A261": 1}


# --- bloom FPR audit ---------------------------------------------------------------


def test_bloom_fpr_audit_counts(tmp_path, ray_session):
    """Members pass always (no false negatives); nonmember passes are
    exactly n_pass - n_members; bits_set ≤ 4·n_members."""
    from osmi_addresses_ray.pipelines.relational import (
        _BLOOM_BITS,
        _bloom_hashes,
        _bloom_member,
        bloom_fpr_audit,
    )

    members = np.arange(100, 200, dtype=np.int64)
    probes = np.arange(0, 1000, dtype=np.int64)
    pd.DataFrame({"o_custkey": np.repeat(members, 2)}).to_parquet(
        tmp_path / "orders.parquet", index=False
    )
    pd.DataFrame({"c_custkey": probes}).to_parquet(
        tmp_path / "customer.parquet", index=False
    )
    out = bloom_fpr_audit(str(tmp_path)).iloc[0]
    assert out["n_probes"] == 1000 and out["n_members"] == 100
    # scalar replay of the same spec
    words = _BLOOM_BITS >> 6
    bits = np.zeros(words, dtype=np.uint64)
    for idx in _bloom_hashes(members, _BLOOM_BITS):
        np.bitwise_or.at(bits, idx >> 6, np.uint64(1) << (idx & 63).astype(np.uint64))
    ok = _bloom_member(bits, probes, _BLOOM_BITS)
    assert out["n_pass"] == int(ok.sum())
    assert out["n_fp"] == int(ok.sum()) - 100
    assert ok[(probes >= 100) & (probes < 200)].all()  # no false negatives
    assert out["bits_set"] <= 400


# --- gravity trade flows -----------------------------------------------------------


def test_trade_gravity_hand_network(tmp_path, ray_session):
    """Two nations, crafted flows; centicent arithmetic and the marginal
    totals checked by hand."""
    from osmi_addresses_ray.pipelines.relational import trade_gravity

    pd.DataFrame({"n_nationkey": [0, 1], "n_name": ["A", "B"]}).to_parquet(
        tmp_path / "nation.parquet", index=False
    )
    pd.DataFrame({"c_custkey": [10, 20], "c_nationkey": [0, 1]}).to_parquet(
        tmp_path / "customer.parquet", index=False
    )
    pd.DataFrame({"s_suppkey": [5, 6], "s_nationkey": [0, 1]}).to_parquet(
        tmp_path / "supplier.parquet", index=False
    )
    pd.DataFrame({"o_orderkey": [100, 200], "o_custkey": [10, 20]}).to_parquet(
        tmp_path / "orders.parquet", index=False
    )
    # order 100 (cust nation A): item from supp 5 (A) 10.00 @ 10% disc,
    #                            item from supp 6 (B) 20.00 @ 0%
    # order 200 (cust nation B): item from supp 6 (B) 5.00 @ 3%
    pd.DataFrame({
        "l_orderkey": [100, 100, 200],
        "l_suppkey": [5, 6, 6],
        "l_extendedprice": [10.0, 20.0, 5.0],
        "l_discount": [0.10, 0.0, 0.03],
    }).to_parquet(tmp_path / "lineitem.parquet", index=False)
    out = trade_gravity(str(tmp_path), num_parts=2)
    got = {(r.cust_nation, r.supp_nation): (r.obs_cc, r.row_cc, r.col_cc,
                                            r.total_cc)
           for r in out.itertuples()}
    aa = 1000 * 90          # 90_000
    ab = 2000 * 100         # 200_000
    bb = 500 * 97           # 48_500
    total = aa + ab + bb
    assert got == {
        ("A", "A"): (aa, aa + ab, aa, total),
        ("A", "B"): (ab, aa + ab, ab + bb, total),
        ("B", "B"): (bb, bb, ab + bb, total),
    }


# --- FD profile --------------------------------------------------------------------


def test_fd_profile_hand_tables(tmp_path, ray_session):
    from osmi_addresses_ray.pipelines.relational import fd_profile

    pd.DataFrame({
        "l_orderkey": [1, 1, 2, 3],
        "l_partkey": [10, 11, 10, 12],
        "l_suppkey": [5, 6, 5, 7],
    }).to_parquet(tmp_path / "lineitem.parquet", index=False)
    pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [100, 100, 200],
        "o_orderpriority": ["HI", "LO", "HI"],
    }).to_parquet(tmp_path / "orders.parquet", index=False)
    out = fd_profile(str(tmp_path))
    got = {(r.det, r.dep): (r.n_keys, r.n_violations, r.holds)
           for r in out.itertuples()}
    # orderkey 1 maps to supps {5,6} -> violation; orderkeys 2,3 fine
    assert got[("lineitem.l_orderkey", "lineitem.l_suppkey")] == (3, 1, 0)
    # partkey 10 -> {5}, 11 -> {6}, 12 -> {7}: FD holds
    assert got[("lineitem.l_partkey", "lineitem.l_suppkey")] == (3, 0, 1)
    # custkey 100 -> {HI, LO} violation
    assert got[("orders.o_custkey", "orders.o_orderpriority")] == (2, 1, 0)
    # the true key FD holds
    assert got[("orders.o_orderkey", "orders.o_custkey")] == (3, 0, 1)
