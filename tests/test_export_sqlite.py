"""SpatiaLite-compatible export: blob format, metadata, R-tree bbox query."""

from __future__ import annotations

import sqlite3
import struct


def test_export_sqlite_roundtrip(tmp_path):
    # /tmp/vout written by the verify flow isn't guaranteed here — write a
    # fresh small layer output
    import pyarrow.parquet as pq
    import ray.data as rd

    from osmi_addresses_ray.pipelines.address_view import build_layers
    from osmi_addresses_ray.sources.fixture import fixture_docs, expected_counts
    from tools.export_sqlite import export, geometry_blob

    out_dir = tmp_path / "layers"
    layers = build_layers(fixture_docs(7), num_parts=4)
    for name, ds in layers.items():
        ds.write_parquet(str(out_dir / name))

    db = str(tmp_path / "out.sqlite")
    counts = export(str(out_dir), db)
    exp = expected_counts(7)
    for name, n in counts.items():
        assert n == exp[name], name

    con = sqlite3.connect(db)
    # metadata tables
    assert con.execute("SELECT count(*) FROM spatial_ref_sys WHERE srid=4326").fetchone()[0] == 1
    assert (
        con.execute(
            "SELECT count(*) FROM geometry_columns WHERE f_geometry_column='geometry'"
        ).fetchone()[0]
        == len(counts)
    )
    # blob format: header bytes + srid + class for a point layer
    blob = con.execute(
        "SELECT geometry FROM osmi_addresses_nodes_with_addresses LIMIT 1"
    ).fetchone()[0]
    assert blob[0] == 0x00 and blob[1] == 0x01 and blob[-1] == 0xFE
    assert struct.unpack("<i", blob[2:6])[0] == 4326
    assert struct.unpack("<i", blob[39:43])[0] == 1  # POINT class
    # R-tree bbox query (test_engine.pl inbbox semantics)
    n_in = con.execute(
        "SELECT count(*) FROM idx_osmi_addresses_nodes_with_addresses_geometry "
        "WHERE xmin >= 7.9 AND xmax <= 8.1 AND ymin >= 46.9 AND ymax <= 47.1"
    ).fetchone()[0]
    assert n_in == counts["osmi_addresses_nodes_with_addresses"]
    con.close()
