"""top_tokens / stratified_sample / scrub_pii — edge semantics beyond the
SQL-parity gate (which tests/test_driver_contract.py covers)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osmi_addresses_ray.pipelines import textstats


@pytest.fixture()
def tiny_docs(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "write to john.doe42@mail.example about order 1234567 today",
                "short digits 12345 stay but 999999 is masked",
                "two mails a@b and c.d@e.f plus 00000000",
                "",
                "no pii here at all",
                "edge@case@double and 123456",
            ],
            "lang": ["en", "en", "de", "de", "fr", "fr"],
            "source": ["t"] * 6,
            "n_chars": np.zeros(6, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path), docs


def test_scrub_pii_edges(tiny_docs):
    sf_dir, docs = tiny_docs
    out = textstats.scrub_pii(sf_dir)
    by = dict(zip(out["doc_id"], out["clean_text"]))
    nm = dict(zip(out["doc_id"], out["n_masked"]))
    assert by[0] == "write to <email> about order <num> today"
    assert nm[0] == 2
    assert by[1] == "short digits 12345 stay but <num> is masked"  # 5 digits survive
    assert nm[1] == 1
    assert by[2] == "two mails <email> and <email> plus <num>"
    assert nm[2] == 3
    assert by[3] == "" and nm[3] == 0
    assert nm[4] == 0
    # greedy RE2 local-part absorbs up to the second '@'
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")
    sql = (
        "SELECT doc_id, regexp_replace(regexp_replace(text,"
        " '[A-Za-z0-9_.]+@[A-Za-z0-9_.]+', '<email>', 'g'),"
        " '[0-9]{6,}', '<num>', 'g') AS clean_text FROM documents ORDER BY doc_id"
    )
    oracle = con.sql(sql).df()
    assert list(oracle["clean_text"]) == [by[i] for i in range(6)]


def test_stratified_sample_contract(tiny_docs):
    sf_dir, docs = tiny_docs
    out = textstats.stratified_sample(sf_dir, n_per_group=2)
    assert set(out["lang"]) == {"en", "de", "fr"}
    for _lang, g in out.groupby("lang"):
        assert list(g["rn"]) == list(range(1, len(g) + 1))
        assert len(g) <= 2
    out2 = textstats.stratified_sample(sf_dir, n_per_group=2)
    pd.testing.assert_frame_equal(out, out2)
    # the rank hash must match the SQL expression exactly
    h = textstats._strat_hash(docs["doc_id"].to_numpy())
    sql_h = duckdb.sql(
        "SELECT (x % 1000003) * 2654435761 % 4294967296 AS h FROM "
        "(SELECT unnest(range(6)) AS x)"
    ).df()["h"].to_numpy()
    assert (h == sql_h).all()


def test_top_tokens_ordering_and_case(tiny_docs):
    sf_dir, _ = tiny_docs
    out = textstats.top_tokens(sf_dir, k=5)
    assert len(out) == 5
    cnts = out["cnt"].to_numpy()
    assert (cnts[:-1] >= cnts[1:]).all()
    # within equal counts tokens ascend
    for _c, g in out.groupby("cnt"):
        toks = list(g["token"])
        assert toks == sorted(toks)
    # lowercase fold: 'And'/'and' would merge — all outputs already lowered
    assert all(t == t.lower() for t in out["token"])


@pytest.fixture()
def gram_docs(tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                base,                                  # benchmark doc (0 % 83 == 0)
                "intro words then " + base,            # contains benchmark 5-grams
                "alpha beta gamma delta",              # only 4 tokens shared: no 5-gram
                "merge window batch merge window",     # search terms, repeated grams
                "tiny doc",                            # < 5 tokens: no grams
                "merge window only two terms",         # missing 'batch'
            ],
            "lang": ["en"] * 6,
            "source": ["t"] * 6,
            "n_chars": np.zeros(6, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path), docs


def test_decontaminate_flags_overlap(gram_docs):
    sf_dir, _ = gram_docs
    out = textstats.decontaminate_docs(sf_dir)
    by = dict(zip(out["doc_id"], out["contaminated"]))
    ov = dict(zip(out["doc_id"], out["n_overlap"]))
    assert by[0] == 1 and ov[0] == 4   # benchmark doc self-matches its 4 grams
    assert by[1] == 1 and ov[1] == 4   # full benchmark text embedded
    assert by[2] == 0                  # 4-token prefix: no 5-gram overlap
    assert by[4] == 0                  # too short for any gram
    assert len(out) == 6               # every doc gets a row


def test_frequent_ngrams_distinct_doc_counts(gram_docs):
    sf_dir, _ = gram_docs
    out = textstats.frequent_ngrams(sf_dir, min_docs=2)
    # the 4 grams of the benchmark text appear in docs 0 and 1 -> df == 2
    assert len(out) == 4
    assert (out["df"] == 2).all()
    assert list(out["gram"]) == sorted(out["gram"])  # tie-break by gram asc


def test_search_all_terms_and_semantics(gram_docs):
    sf_dir, _ = gram_docs
    out = textstats.search_docs_all_terms(sf_dir)
    assert list(out["doc_id"]) == [3]          # only doc 3 has all three terms
    assert int(out["n_occurrences"].iloc[0]) == 5  # 2 merge + 2 window + 1 batch


def test_winnowing_guarantee_and_density(tmp_path, ray_session):
    """The winnowing guarantee: two docs sharing a run of ≥ w+k−1 = 6 tokens
    MUST share at least one selected fingerprint; selection density is ~
    2/(w+1) of grams; the rightmost-min tie rule picks ONE selection for a
    constant document's window."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.textstats import winnow_fingerprints

    shared = "alpha bravo charlie delta echo foxtrot"  # 6 shared tokens
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "one two three " + shared + " nine ten eleven twelve",
                "zz yy xx ww " + shared + " vv uu tt",
                "const const const const const const const const",
                "tiny doc",  # < k tokens after the 2-token doc? 2 tokens -> no grams
            ],
            "lang": "en", "source": "t", "n_chars": 1,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    out = winnow_fingerprints(str(tmp_path))

    f1 = set(out[out.doc_id == 1].fp)
    f2 = set(out[out.doc_id == 2].fp)
    assert f1 & f2, "shared 6-token run must share a fingerprint"
    # constant doc: all gram hashes equal -> every window picks its OWN
    # rightmost gram, so each gram is selected once after the warmup
    c = out[out.doc_id == 3]
    assert len(c) >= 3 and c.fp.nunique() == 1
    assert 4 not in set(out.doc_id)  # 2 tokens < k: no grams, no rows


def test_cdc_shift_resistance(tmp_path, ray_session):
    """THE CDC property: prepending a prefix must leave the chunking of the
    unchanged tail identical (same chunk hashes), where fixed-size splitting
    would re-chunk everything downstream."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.textstats import cdc_chunks

    rng = np.random.RandomState(3)
    body = "".join(chr(97 + rng.randint(26)) for _ in range(800))
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": [body, "PREFIX-INSERTED " + body],
            "lang": "en", "source": "t", "n_chars": 1,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    out = cdc_chunks(str(tmp_path))
    h1 = out[out.doc_id == 1].chunk_hash.tolist()
    h2 = out[out.doc_id == 2].chunk_hash.tolist()
    shared = len(set(h1) & set(h2))
    # all but the first chunk (which absorbs the prefix) must realign
    assert shared >= len(h1) - 2, (shared, len(h1), len(h2))
    # boundaries are content-keyed: mean chunk length ~ mask size
    assert 20 < out["len"].mean() < 300
    # start/len tile each document exactly
    for did, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        assert g["start"].iloc[0] == 0
        assert (g["start"].to_numpy()[1:]
                == (g["start"] + g["len"]).to_numpy()[:-1]).all()


def test_bpe_encode_compresses_and_matches_trainer(tmp_path, ray_session):
    """Encoding with the trained merges must (a) reproduce the trainer's
    segmentation on a word it fully merged, (b) never exceed character
    count, (c) strictly compress a corpus dominated by one repeated word."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.textstats import bpe_encode, bpe_merges

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "hello hello hello hello hello hello hello hello",
                "hello world",
                "",
            ],
            "lang": "en", "source": "t", "n_chars": 1,
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet", index=False)
    m = bpe_merges(str(tmp_path), n_merges=10)
    out = bpe_encode(str(tmp_path), n_merges=10).set_index("doc_id")
    # 'hello' dominates: 4 merges collapse it to ONE symbol within 10 rounds
    assert out.loc[1, "n_symbols"] == out.loc[1, "n_words"]  # 1 symbol/word
    assert out.loc[1, "ratio"] == 1.0
    assert out.loc[2, "n_symbols"] <= len("hello") + len("world")
    assert out.loc[3, "n_words"] == 0 and out.loc[3, "ratio"] == 0.0
    assert len(m) == 10 or len(m) < 10  # trainer returns ≤ n_merges


def test_temperature_mix_downweights_big_sources(tmp_path, ray_session):
    """τ=1/2 rule: a 400-doc source yields 20 picks, a 4-doc source yields 2
    — the big source's SHARE drops from 99% to ~91%... of picks 20/22; the
    small source is never drowned to zero. Quotas are exact isqrt."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.textstats import temperature_mix

    rows = [(i, f"t{i}", "en", "big", 1) for i in range(400)]
    rows += [(1000 + i, f"s{i}", "en", "small", 1) for i in range(4)]
    pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"]).to_parquet(
        tmp_path / "documents.parquet", index=False
    )
    out = temperature_mix(str(tmp_path))
    sizes = out.groupby("source").size().to_dict()
    assert sizes == {"big": 20, "small": 2}
    # within-source ranks are contiguous 1..quota
    for s, g in out.groupby("source"):
        assert g.rn.tolist() == list(range(1, sizes[s] + 1))


def test_k_anonymity_flags(tmp_path, ray_session):
    """A QI group with 6 rows from 1 user: k ok (6 ≥ 5) but l violated
    (1 < 3); a group with 2 rows from 2 users violates k but not... both."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.timeseries import k_anonymity_audit

    rows = []
    for i in range(6):  # same QI, one user -> l violation only
        rows.append((i, pd.Timestamp("2024-01-01 10:15") + pd.Timedelta(seconds=i),
                     7, "view", 5.0))
    rows.append((100, pd.Timestamp("2024-01-01 11:00"), 1, "click", 5.0))
    rows.append((101, pd.Timestamp("2024-01-01 11:30"), 2, "click", 5.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = k_anonymity_audit(str(tmp_path)).set_index("event_type")
    v = out.loc["view"]
    assert v.n_rows == 6 and v.n_users == 1
    assert v.k_violation == 0 and v.l_violation == 1
    c = out.loc["click"]
    assert c.n_rows == 2 and c.n_users == 2
    assert c.k_violation == 1 and c.l_violation == 1


def test_vocab_growth_first_appearance_attribution(tmp_path, ray_session):
    """Each type counts exactly once, at its MIN doc_id; re-appearances add
    tokens but no types; an empty doc still gets a (0-new-types) row; the
    cumulative columns are running sums over doc_id order."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.textstats import vocab_growth

    texts = [
        "alpha beta alpha",      # doc 0: types {alpha, beta}
        "beta gamma",            # doc 1: new type {gamma}
        "",                      # doc 2: empty
        "Alpha DELTA delta",     # doc 3: lowercasing -> new type {delta}
    ]
    df = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": texts,
            "lang": "en",
            "source": "t",
            "n_chars": [len(t) for t in texts],
        }
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    out = vocab_growth(str(tmp_path))
    assert out["doc_id"].tolist() == [0, 1, 2, 3]
    assert out["new_types"].tolist() == [2, 1, 0, 1]
    assert out["cum_types"].tolist() == [2, 3, 3, 4]
    assert out["doc_tokens"].tolist() == [3, 2, 0, 3]
    assert out["cum_tokens"].tolist() == [3, 5, 5, 8]
