"""Full pipeline on the synthetic scalable corpus vs closed-form goldens."""

from __future__ import annotations

import pytest

from osmi_addresses_ray.pipelines.address_view import build_layers
from osmi_addresses_ray.sources.fixture import expected_counts, fixture_docs


@pytest.mark.parametrize("n_blocks", [37])
def test_fixture_golden_counts(n_blocks):
    docs = fixture_docs(n_blocks)
    layers = build_layers(docs, num_parts=4)
    exp = expected_counts(n_blocks)
    got = {name: layers[name].count() for name in exp}
    assert got == exp
