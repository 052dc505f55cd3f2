"""Stateless way layers vs testzone goldens (run_tests.sh:28-38)."""

from __future__ import annotations

import pytest
import ray.data as rd

from osmi_addresses_ray.stages.assembly import assemble_ways
from osmi_addresses_ray.stages.parse import parse_docs
from osmi_addresses_ray.stages.way_layers import (
    addrx_on_nonclosed_way_layer,
    buildings_layer,
    ways_with_addresses_layer,
    ways_with_postal_code_layer,
)


@pytest.fixture(scope="module")
def ways_geo(testzone_docs):
    ds = parse_docs(rd.from_arrow(testzone_docs))
    return assemble_ways(ds, num_parts=4).materialize()


def test_ways_with_addresses_golden(ways_geo):
    assert ways_with_addresses_layer(ways_geo).count() == 48  # run_tests.sh:28


def test_buildings_golden(ways_geo):
    assert buildings_layer(ways_geo).count() == 0  # run_tests.sh:30


def test_addrx_golden(ways_geo):
    assert addrx_on_nonclosed_way_layer(ways_geo).count() == 9  # run_tests.sh:32


def test_ways_with_postal_code_golden(ways_geo):
    assert ways_with_postal_code_layer(ways_geo).count() == 8  # run_tests.sh:38
