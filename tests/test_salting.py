"""Salted-key splitting: outputs must be invariant under salting."""

from __future__ import annotations

import pandas as pd
import pytest

from osmi_addresses_ray.pipelines.address_view import build_layers
from osmi_addresses_ray.sources.fixture import fixture_docs


def _layer_frames(layers) -> dict[str, pd.DataFrame]:
    out = {}
    for name, ds in layers.items():
        df = ds.to_pandas()
        out[name] = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return out


def test_match_invariant_under_salting():
    """hot_cell_threshold=1 forces every cell to salt → row sets identical
    to the unsalted run (SURVEY §4.2 salting correctness property)."""
    docs = fixture_docs(23)
    plain = _layer_frames(build_layers(docs, num_parts=4))
    salted = _layer_frames(build_layers(docs, num_parts=4, hot_cell_threshold=1))
    assert set(plain) == set(salted)
    for name in plain:
        pd.testing.assert_frame_equal(plain[name], salted[name], check_dtype=False)
