"""Entrances layer — stateless filter + projection, no shuffle.

Reference: EntrancesWriter.hpp:20-37 — a node with ``entrance=*`` OR
``building=entrance`` becomes a point row {node_id, lastchange, entrance};
the ``entrance`` column stays NULL for the legacy ``building=entrance`` form
(goldens: run_tests.sh:60-61).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.wkt import point_wkt
from ..schemas import ENTRANCES_SCHEMA


def entrances_batch(batch: pa.Table) -> pa.Table:
    is_node = pc.equal(batch["etype"], "node")
    has_entrance = pc.is_valid(batch["t_entrance"])
    legacy = pc.equal(batch["t_building"], "entrance")
    keep = pc.and_(is_node, pc.or_(has_entrance, pc.fill_null(legacy, False)))
    t = batch.filter(keep)
    lon = t["lon"].to_numpy(zero_copy_only=False)
    lat = t["lat"].to_numpy(zero_copy_only=False)
    return pa.Table.from_arrays(
        [
            t["osm_id"].combine_chunks() if isinstance(t["osm_id"], pa.ChunkedArray) else t["osm_id"],
            t["lastchange"],
            t["t_entrance"],
            t["lon"],
            t["lat"],
            pa.array(["POINT"] * t.num_rows, pa.string()),
            point_wkt(lon, lat),
        ],
        schema=ENTRANCES_SCHEMA,
    )


def entrances_layer(parsed_ds):
    """parsed entity Dataset → entrances layer Dataset."""
    return parsed_ds.map_batches(entrances_batch, batch_format="pyarrow")
