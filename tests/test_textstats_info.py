"""token_entropy / dsir_weights — closed-form semantics beyond the SQL-parity
gate (tests/test_driver_contract.py covers oracle parity at sf0.001)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osmi_addresses_ray.pipelines import textstats


def _write_docs(tmp_path, texts, sources=None):
    n = len(texts)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": sources if sources is not None else ["s"] * n,
            "n_chars": np.zeros(n, dtype=np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def test_token_entropy_closed_form(tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            "a b c d",  # uniform over 4 -> H = 2 bits, simpson = 4
            "a a a a",  # single type -> H = 0, simpson = 16
            "",  # empty -> all zeros
            "A a",  # case-folds to one type counted twice -> H = 0, simpson = 4
            "x x y y",  # uniform over 2 -> H = 1 bit, simpson = 8
        ],
    )
    out = textstats.token_entropy(sf)
    by = out.set_index("doc_id")
    assert by.loc[0, "n_tokens"] == 4 and by.loc[0, "simpson_num"] == 4
    assert by.loc[0, "entropy"] == pytest.approx(2.0, abs=1e-9)
    assert by.loc[1, "simpson_num"] == 16 and by.loc[1, "entropy"] == 0.0
    assert by.loc[2, "n_tokens"] == 0 and by.loc[2, "entropy"] == 0.0
    assert by.loc[3, "n_tokens"] == 2 and by.loc[3, "simpson_num"] == 4
    assert by.loc[3, "entropy"] == 0.0
    assert by.loc[4, "entropy"] == pytest.approx(1.0, abs=1e-9)
    # -0.0 never escapes (the +0.0 normalization)
    assert not any(np.signbit(out["entropy"].to_numpy()))


def test_dsir_weights_prefers_target_lookalikes(tmp_path):
    # target docs are all-'aaa'; a raw-only doc is all-'bbb'. The 'aaa' doc
    # must carry a strictly higher weight than the 'bbb' doc.
    sf = _write_docs(
        tmp_path,
        ["aaa aaa aaa", "aaa aaa aaa", "bbb bbb bbb", "aaa aaa aaa", ""],
        sources=["tgt", "tgt", "raw", "raw", "raw"],
    )
    out = textstats.dsir_weights(sf, target_source="tgt")
    by = out.set_index("doc_id")
    # closed form: V=2, T_raw=12, T_tgt=6, c_raw(aaa)=9, c_tgt(aaa)=6,
    # c_raw(bbb)=3, c_tgt(bbb)=0
    const = math.log(12 + 2) - math.log(6 + 2)
    w_aaa = 3 * (math.log(7) - math.log(10)) + 3 * const
    w_bbb = 3 * (math.log(1) - math.log(4)) + 3 * const
    assert by.loc[0, "dsir_logw"] == pytest.approx(round(w_aaa, 4), abs=1e-9)
    assert by.loc[2, "dsir_logw"] == pytest.approx(round(w_bbb, 4), abs=1e-9)
    assert by.loc[0, "dsir_logw"] > by.loc[2, "dsir_logw"]
    # identical text -> identical weight regardless of the doc's own source
    assert by.loc[3, "dsir_logw"] == by.loc[0, "dsir_logw"]
    assert by.loc[4, "dsir_logw"] == 0.0 and by.loc[4, "n_tokens"] == 0


def test_dsir_no_target_docs_degenerates_cleanly(tmp_path):
    # no doc matches the target source: ct=0 everywhere, weights still finite
    sf = _write_docs(tmp_path, ["a b", "b c"], sources=["raw", "raw"])
    out = textstats.dsir_weights(sf, target_source="absent")
    assert np.isfinite(out["dsir_logw"]).all()


def test_ccnet_buckets_orders_by_lm_familiarity(tmp_path):
    import math

    # doc_ids 0 and 7 form the train split (mod 7); they are all-'common'.
    # Docs of 'common' must land in head (lowest logpp), docs of unseen
    # tokens in tail.
    texts = [
        "common common common",      # 0: train
        "common common common",      # 1: familiar
        "zzz yyy xxx",               # 2: unseen
        "common zzz common common",  # 3: mixed
        "qqq rrr sss",               # 4: unseen
        "common common common",      # 5: familiar
        "common common common common",  # 6: familiar
        "common common",             # 7: train
    ]
    sf = _write_docs(tmp_path, texts)
    out = textstats.ccnet_buckets(sf).set_index("doc_id")
    # closed form: T=5 ('common' x5 in train), V=1, p(common)=(5+1)/(5+1)=1
    # logpp(common-only doc) = ln(6) - ln(6) = 0
    assert out.loc[1, "logpp"] == 0.0
    # unseen-token doc: logpp = ln(6) - ln(1) = ln(6)
    assert out.loc[2, "logpp"] == round(math.log(6), 4)
    assert out.loc[1, "bucket"] == "head"
    assert out.loc[2, "bucket"] == "tail"
    assert out.loc[4, "bucket"] == "tail"
    # mixed doc sits strictly between
    assert 0.0 < out.loc[3, "logpp"] < out.loc[2, "logpp"]
