"""High-partition-count conformance for the native (packed-groupby /
hash-join) exchange path.

The direct two-wave exchange drives O(blocks x P) refs from the driver and
SCALE.md documents "fine to P~64; past that switch exchange='native'" — but
round 3 never RAN the native path at P >= 256. A real 100-TB cluster uses
P in the thousands, so this is the first branch a cluster user hits. These
tests assert every flagship layer is row-identical between the default
direct/P=4 build and a native/P=256 build on the reference conformance
corpus (the exchange is a pure data-movement choice; any divergence is a
partitioning bug, e.g. a hash that disagrees between the two transports).
"""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from osmi_addresses_ray.pipelines.address_view import build_layers


def _frame(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def layer_pair(testzone_docs, ray_session):
    base = build_layers(rd.from_arrow(testzone_docs), num_parts=4)
    native = build_layers(
        rd.from_arrow(testzone_docs), num_parts=256, exchange="native"
    )
    return base, native


def test_native_p256_layers_match_direct(layer_pair):
    base, native = layer_pair
    assert set(base) == set(native)
    for name in sorted(base):
        a, b = _frame(base[name]), _frame(native[name])
        assert list(a.columns) == list(b.columns), name
        pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=name)


def test_native_p256_nonempty(layer_pair):
    # guard against a vacuous pass: the reference goldens for these layers
    # (test_conformance.py) are 8 and 116 rows respectively
    base, native = layer_pair
    assert len(_frame(native["osmi_addresses_nearest_roads"])) == 8
    assert len(_frame(native["osmi_addresses_connection_line"])) == 116
