"""Property-based tests (hypothesis) for round-3 kernels."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.floats(min_value=0, max_value=1e6, allow_nan=False), min_size=1, max_size=200),
    st.floats(min_value=0.0, max_value=1.0),
)
def test_quantile_index_rule_matches_duckdb(values, p):
    """The engine's histogram walk must return the value at
    max(0, ceil(p*n)-1) of the sorted column for ANY multiset and p."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.relational import quantiles_from_histogram

    hist = pd.Series(values).value_counts().rename_axis("v").reset_index(name="cnt")
    hist["g"] = "a"
    out = quantiles_from_histogram(hist, "g", "v", [p])
    sorted_vals = np.sort(np.asarray(values))
    expect = sorted_vals[max(0, int(np.ceil(p * len(sorted_vals))) - 1)]
    assert out.iloc[0][f"p{int(round(p * 100)):02d}"] == expect


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=100),
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=100),
)
def test_sorted_member_matches_set_semantics(build, probe):
    from osmi_addresses_ray.pipelines.relational import _sorted_member

    have = np.unique(np.array(build, dtype=np.int64)) if build else np.array([], np.int64)
    keys = np.array(probe, dtype=np.int64)
    got = _sorted_member(have, keys)
    want = np.array([k in set(build) for k in probe])
    assert (got == want).all()


@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=300))
def test_hll_register_merge_equals_whole(vals):
    from osmi_addresses_ray.pipelines.sketches import hll_registers

    arr = np.array(vals, dtype=np.int64)
    whole = hll_registers(arr)
    merged = np.zeros_like(whole)
    for chunk in np.array_split(arr, 3):
        if len(chunk):
            np.maximum(merged, hll_registers(chunk), out=merged)
    assert np.array_equal(whole, merged)


@given(
    st.floats(min_value=-180, max_value=180, allow_nan=False),
    st.floats(min_value=-90, max_value=90, allow_nan=False),
    st.integers(min_value=1, max_value=9),
)
@settings(max_examples=200)
def test_geohash_prefix_property(lon, lat, p):
    """Any shorter geohash of the same point is a prefix (cells nest), and
    the cell contains the point's quantized coordinate."""
    from osmi_addresses_ray.functions.geohash import geohash_encode

    full = geohash_encode(np.array([lon]), np.array([lat]), 9)[0]
    short = geohash_encode(np.array([lon]), np.array([lat]), p)[0]
    assert full.startswith(short)


@given(
    st.integers(min_value=0, max_value=200),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)
def test_chunk_cover_property(n_tokens, size, step):
    """range(0, n, step) windows of width `size` cover every token index
    exactly when step <= size (the engine default 24 <= 32)."""
    if step > size:
        return
    covered = set()
    for s in range(0, n_tokens, step):
        covered.update(range(s, min(s + size, n_tokens)))
    assert covered == set(range(n_tokens))
