"""Scale-fallback conformance (SURVEY J3/ST2/ST3): the distributed
side-input mode — endpoint tags via two hash-partitioned joins
(``interpolation_stage_distributed``) and places via the name-sharded
index service (``build_places_shards``) — must reproduce the broadcast
mode's outputs exactly on the reference testzone corpus
(test/run_tests.sh:15-79 goldens)."""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data as rd

from osmi_addresses_ray.pipelines.address_view import build_layers

# layers whose content depends on the side inputs under test
SIDE_INPUT_LAYERS = [
    "osmi_addresses_interpolation",       # endpoint-tag joins (ST3)
    "osmi_addresses_nodes_with_addresses", # place probe (ST2) + ip points
    "osmi_addresses_connection_line",      # match over ip + place-derived rows
    "osmi_addresses_nearest_points",
]

GOLDENS = {
    "osmi_addresses_interpolation": 27,
    "osmi_addresses_nodes_with_addresses": 134,
    "osmi_addresses_connection_line": 116,
    "osmi_addresses_nearest_points": 111,
}


@pytest.fixture(scope="module")
def both_modes(testzone_docs):
    bc = build_layers(rd.from_arrow(testzone_docs), num_parts=4)
    dist = build_layers(
        rd.from_arrow(testzone_docs), num_parts=4, side_input_mode="distributed"
    )
    return bc, dist


def _sorted_table(ds) -> pa.Table:
    tabs = list(ds.iter_batches(batch_format="pyarrow"))
    if not tabs:
        return pa.table({})
    t = pa.concat_tables(tabs)
    return t.sort_by([(c, "ascending") for c in t.column_names])


@pytest.mark.parametrize("layer", SIDE_INPUT_LAYERS)
def test_distributed_matches_broadcast(both_modes, layer):
    bc, dist = both_modes
    tb, td = _sorted_table(bc[layer]), _sorted_table(dist[layer])
    assert td.num_rows == GOLDENS[layer]
    assert tb.schema.names == td.schema.names
    assert tb.equals(td), f"{layer}: distributed mode diverges from broadcast"
