"""Stateless way-derived layers — vectorized filter+project over ways_geo.

All are gated on the pass-2 nonzero-length check (GeometryHelper.hpp:154-167,
applied SecondHandler.hpp:71):

- ways_with_addresses  — WaysWithAddressesWriter.hpp:24-60: closed way with
  ``building=*`` and (street|houseno|place) → polygon row, 9 attribute cols.
- ways_with_postal_code — WaysWithPostalCodeWriter.hpp:19-38: any way with
  ``postal_code=*`` → linestring row.
- addrx_on_nonclosed_way — AddrXOnNonClosedWayWriter.hpp:17-59: NON-closed way
  carrying any of 20 addr:* keys → linestring row.
- buildings — BuildingsWriter.hpp:17-35: disabled in the reference
  (SecondHandler.hpp:73 comments the feed out; golden expects 0 rows) — built
  behind ``enabled=False``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..constants import ADDRX_KEYS_20, tag_col
from ..functions.wkt import lines_wkt_from_offsets
from ..schemas import (
    ADDRX_ON_NONCLOSED_WAY_SCHEMA,
    BUILDINGS_SCHEMA,
    WAYS_WITH_ADDRESSES_SCHEMA,
    WAYS_WITH_POSTAL_CODE_SCHEMA,
)


def _coords_and_wkt(t: pa.Table, *, polygon: bool) -> list:
    xs = t["xs"].combine_chunks() if isinstance(t["xs"], pa.ChunkedArray) else t["xs"]
    ys = t["ys"].combine_chunks() if isinstance(t["ys"], pa.ChunkedArray) else t["ys"]
    offs = np.asarray(xs.offsets) - xs.offsets[0].as_py()
    flat = np.column_stack(
        (np.asarray(xs.flatten(), dtype=np.float64), np.asarray(ys.flatten(), dtype=np.float64))
    )
    return lines_wkt_from_offsets(flat, offs, polygon=polygon)


def ways_with_addresses_batch(t: pa.Table) -> pa.Table:
    has = lambda c: pc.is_valid(t[c])
    keep = pc.and_(
        pc.and_(has(tag_col("building")), t["is_closed"]),
        pc.and_(
            t["nonzero"],
            pc.or_(
                pc.or_(has(tag_col("addr:street")), has(tag_col("addr:housenumber"))),
                has(tag_col("addr:place")),
            ),
        ),
    )
    s = t.filter(keep)
    wkt = _coords_and_wkt(s, polygon=True)
    return pa.Table.from_arrays(
        [
            s["way_id"].combine_chunks(),
            s[tag_col("addr:street")].combine_chunks(),
            s[tag_col("addr:housenumber")].combine_chunks(),
            s[tag_col("addr:postcode")].combine_chunks(),
            s[tag_col("addr:city")].combine_chunks(),
            s[tag_col("addr:country")].combine_chunks(),
            s[tag_col("addr:full")].combine_chunks(),
            s[tag_col("addr:place")].combine_chunks(),
            s["lastchange"].combine_chunks(),
            pa.array(["POLYGON"] * s.num_rows),
            wkt,
        ],
        schema=WAYS_WITH_ADDRESSES_SCHEMA,
    )


def ways_with_postal_code_batch(t: pa.Table) -> pa.Table:
    keep = pc.and_(pc.is_valid(t[tag_col("postal_code")]), t["nonzero"])
    s = t.filter(keep)
    wkt = _coords_and_wkt(s, polygon=False)
    return pa.Table.from_arrays(
        [
            s["way_id"].combine_chunks(),
            s["lastchange"].combine_chunks(),
            s[tag_col("postal_code")].combine_chunks(),
            pa.array(["LINESTRING"] * s.num_rows),
            wkt,
        ],
        schema=WAYS_WITH_POSTAL_CODE_SCHEMA,
    )


def addrx_on_nonclosed_way_batch(t: pa.Table) -> pa.Table:
    any_addr = None
    for k in ADDRX_KEYS_20:
        v = pc.is_valid(t[tag_col(k)])
        any_addr = v if any_addr is None else pc.or_(any_addr, v)
    keep = pc.and_(pc.and_(pc.invert(t["is_closed"]), any_addr), t["nonzero"])
    s = t.filter(keep)
    wkt = _coords_and_wkt(s, polygon=False)
    return pa.Table.from_arrays(
        [
            s["way_id"].combine_chunks(),
            s["lastchange"].combine_chunks(),
            pa.array(["LINESTRING"] * s.num_rows),
            wkt,
        ],
        schema=ADDRX_ON_NONCLOSED_WAY_SCHEMA,
    )


def buildings_batch(t: pa.Table) -> pa.Table:
    keep = pc.and_(
        pc.and_(pc.is_valid(t[tag_col("building")]), t["is_closed"]), t["nonzero"]
    )
    s = t.filter(keep)
    wkt = _coords_and_wkt(s, polygon=True)
    return pa.Table.from_arrays(
        [
            s["way_id"].combine_chunks(),
            s["lastchange"].combine_chunks(),
            pa.array(["POLYGON"] * s.num_rows),
            wkt,
        ],
        schema=BUILDINGS_SCHEMA,
    )


def ways_with_addresses_layer(ways_geo):
    return ways_geo.map_batches(ways_with_addresses_batch, batch_format="pyarrow")


def ways_with_postal_code_layer(ways_geo):
    return ways_geo.map_batches(ways_with_postal_code_batch, batch_format="pyarrow")


def addrx_on_nonclosed_way_layer(ways_geo):
    return ways_geo.map_batches(addrx_on_nonclosed_way_batch, batch_format="pyarrow")


def buildings_layer(ways_geo, *, enabled: bool = False):
    """Off by default, mirroring SecondHandler.hpp:73 (golden: 0 rows)."""
    if not enabled:
        import ray.data as rd

        return rd.from_arrow(BUILDINGS_SCHEMA.empty_table())
    return ways_geo.map_batches(buildings_batch, batch_format="pyarrow")
