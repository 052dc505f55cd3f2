"""The sf-dependent oracles are namespaced by an input content tag so a query
run at one scale factor cannot poison a later SQL-first evaluation at another
(sf0.001 and sf0.01 ship the same row counts, so the tag is a content hash,
not count(*))."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from osmi_addresses_ray.oracle import (
    content_tag,
    read_tagged_sql,
    write_oracle_tagged,
)


def test_content_tag_distinguishes_equal_rowcount_scales():
    tags = {
        (sf, t): content_tag(f"/root/testdata/{sf}", t)
        for sf in ("sf0.001", "sf0.01")
        for t in ("documents", "embeddings")
    }
    assert tags[("sf0.001", "documents")] != tags[("sf0.01", "documents")]
    assert tags[("sf0.001", "embeddings")] != tags[("sf0.01", "embeddings")]


def test_tag_expression_matches_between_python_and_sql():
    # the write-side tag (content_tag) and the read-side WHERE subquery must
    # evaluate to the same value over the same table
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    sql = read_tagged_sql("x", "1", "documents")
    where = sql.split("WHERE tag = (")[1].split(") ORDER BY")[0]
    sql_tag = con.sql(where).fetchone()[0]
    assert int(sql_tag) == content_tag("/root/testdata/sf0.01", "documents")


def test_sql_first_reads_only_its_own_scale(tmp_path, monkeypatch):
    import osmi_addresses_ray.oracle as om

    monkeypatch.setattr(om, "ORACLE_DIR", str(tmp_path))
    t1 = content_tag("/root/testdata/sf0.001", "documents")
    t2 = content_tag("/root/testdata/sf0.01", "documents")
    write_oracle_tagged("probe", pd.DataFrame({"v": [1, 2, 3]}), t1)
    write_oracle_tagged("probe", pd.DataFrame({"v": [10, 20]}), t2)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    got = con.sql(read_tagged_sql("probe", "v", "documents")).df()
    assert list(got["v"]) == [10, 20]
    assert list(got.columns) == ["v"]  # tag partition column excluded

    # rewriting one tag must not clobber the other
    write_oracle_tagged("probe", pd.DataFrame({"v": [7]}), t2)
    got2 = con.sql(read_tagged_sql("probe", "v", "documents")).df()
    assert list(got2["v"]) == [7]
    con2 = duckdb.connect()
    con2.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    assert list(con2.sql(read_tagged_sql("probe", "v", "documents")).df()["v"]) == [1, 2, 3]
