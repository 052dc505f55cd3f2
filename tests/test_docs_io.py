"""JSONL/CSV document ingest + sharded JSONL export round-trips."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest


def _docs_df():
    return pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [f"hello world {i} und so weiter" for i in range(6)],
            "lang": ["en", "de"] * 3,
        }
    )


def test_jsonl_roundtrip_runs_textstats(tmp_path):
    src = tmp_path / "docs.jsonl"
    with open(src, "w") as fh:
        for r in _docs_df().to_dict("records"):
            fh.write(json.dumps(r) + "\n")

    from osmi_addresses_ray.sources.docs_io import read_documents_jsonl, write_documents_jsonl

    ds = read_documents_jsonl(str(src))
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].dtype == np.int64
    assert df["text"].tolist() == _docs_df()["text"].tolist()
    assert "lang" in df.columns  # passthrough survives

    # the normalized contract feeds existing operators unchanged: write the
    # corpus as parquet into a table dir and run token_counts over it
    table_dir = tmp_path / "as_table"
    table_dir.mkdir()
    df[["doc_id", "text", "lang"]].to_parquet(table_dir / "documents.parquet", index=False)
    from osmi_addresses_ray.pipelines.textstats import token_counts

    counts = token_counts(str(table_dir))
    assert counts["n_tokens"].tolist() == [6] * 6

    out = tmp_path / "export"
    write_documents_jsonl(ds, str(out))
    lines = []
    for f in os.listdir(out):
        with open(out / f) as fh:
            lines.extend(json.loads(line) for line in fh)
    assert sorted(r["doc_id"] for r in lines) == list(range(6))


def test_csv_ingest_and_missing_column_error(tmp_path):
    src = tmp_path / "docs.csv"
    _docs_df().to_csv(src, index=False)

    from osmi_addresses_ray.sources.docs_io import read_documents_csv

    df = read_documents_csv(str(src)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["text"].tolist() == _docs_df()["text"].tolist()

    bad = tmp_path / "bad.csv"
    _docs_df().rename(columns={"text": "body"}).to_csv(bad, index=False)
    with pytest.raises(Exception, match="missing required column"):
        read_documents_csv(str(bad)).to_pandas()
