"""Unit tests for grouped_agg_direct edge cases (round-5 verdict task #1 and
ADVICE relational.py:158): empty input, mixed mean+sum specs on one source
column (pandas agg column-order vs partial-schema order), and null-key
grouping parity with the Arrow-group_by partial."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osmi_addresses_ray.ops import direct_cogroup
from osmi_addresses_ray.pipelines.relational import grouped_agg, grouped_agg_direct


def _empty_docs_ds():
    t = pa.table({"k": pa.array([], pa.string()), "x": pa.array([], pa.int64())})
    return rd.from_arrow(t)


def test_empty_input_with_empty_schema_returns_typed_empty():
    es = pa.schema([("k", pa.string()), ("s", pa.int64())])
    out = grouped_agg_direct(
        _empty_docs_ds(), ["k"], {"s": ("x", "sum")}, empty_schema=es
    )
    assert out.count() == 0
    # assert via schema(): Dataset.to_pandas() on an empty dataset drops
    # columns (Ray quirk) — the typed blocks are what downstream sees
    assert out.schema().names == ["k", "s"]


def test_empty_input_without_empty_schema_raises():
    with pytest.raises(ValueError, match="empty_schema"):
        grouped_agg_direct(_empty_docs_ds(), ["k"], {"s": ("x", "sum")})


def test_empty_input_through_a_filtering_map_batches():
    # the frequent_ngrams shape: non-empty source whose partial stage emits
    # zero rows — schema IS known here, but the exchange must still produce
    # a typed empty result end-to-end
    df = pd.DataFrame({"k": ["a", "b"], "x": [1, 2]})
    ds = rd.from_pandas(df).map_batches(
        lambda d: d[d["x"] > 99], batch_format="pandas"
    )
    out = grouped_agg_direct(
        ds,
        ["k"],
        {"s": ("x", "sum")},
        empty_schema=pa.schema([("k", pa.string()), ("s", pa.int64())]),
    )
    assert out.count() == 0
    assert out.schema().names == ["k", "s"]


def test_mixed_mean_and_sum_on_same_column():
    # ADVICE repro: {'m': ('x','mean'), 's': ('x','sum')} used to die in
    # Table.cast on pandas-agg column order != partial-schema order
    df = pd.DataFrame(
        {"k": ["a", "a", "b", "b", "b", "c"], "x": [1, 3, 10, 20, 30, 7]}
    )
    ds = rd.from_pandas(df).repartition(3)
    out = (
        grouped_agg_direct(ds, ["k"], {"m": ("x", "mean"), "s": ("x", "sum")})
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(m=("x", "mean"), s=("x", "sum"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_null_keys_group_like_grouped_agg():
    df = pd.DataFrame(
        {"k": ["a", None, None, "b"], "x": [1, 2, 3, 4]}
    )
    ds = rd.from_pandas(df).repartition(2)
    direct = (
        grouped_agg_direct(ds, ["k"], {"s": ("x", "sum")})
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    via_ray = (
        grouped_agg(rd.from_pandas(df).repartition(2), ["k"], {"s": ("x", "sum")})
        .to_pandas()
        .sort_values("k", na_position="last")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(direct, via_ray, check_dtype=False)
    assert len(direct) == 3  # a, b, and the null group


def test_direct_cogroup_rejects_none_schema():
    ds = rd.from_pandas(pd.DataFrame({"k": [1], "x": [2]}))
    with pytest.raises(TypeError, match="pyarrow.Schema"):
        direct_cogroup([ds], [["k"]], 2, lambda t: t, [None])
