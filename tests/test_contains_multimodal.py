"""PIP containment join and multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
import ray.data as rd

from osmi_addresses_ray.sources.fixture import fixture_docs
from osmi_addresses_ray.stages.assembly import assemble_ways
from osmi_addresses_ray.stages.contains import contains_join, entrances_in_buildings
from osmi_addresses_ray.stages.media_codecs import grid_features, synthesize_pixels
from osmi_addresses_ray.stages.multimodal import MediaDecoder, media_features
from osmi_addresses_ray.stages.parse import parse_docs


def test_contains_join_basic():
    import pyarrow as pa

    points = rd.from_arrow(
        pa.table(
            {
                "point_id": pa.array([1, 2, 3], pa.int64()),
                "lon": pa.array([0.5, 5.0, 0.999]),
                "lat": pa.array([0.5, 5.0, 0.001]),
            }
        )
    )
    polys = rd.from_arrow(
        pa.table(
            {
                "poly_id": pa.array([10], pa.int64()),
                "xs": pa.array([[0.0, 1.0, 1.0, 0.0, 0.0]], pa.list_(pa.float64())),
                "ys": pa.array([[0.0, 0.0, 1.0, 1.0, 0.0]], pa.list_(pa.float64())),
            }
        )
    )
    rows = contains_join(points, polys, num_parts=2).take_all()
    assert sorted((r["point_id"], r["poly_id"]) for r in rows) == [(1, 10), (3, 10)]


def test_entrances_in_buildings_fixture():
    """Every b%5==0 block's entrance node sits inside that block's building."""
    n = 20
    parsed = parse_docs(fixture_docs(n)).materialize()
    ways_geo = assemble_ways(parsed, num_parts=4)
    rows = entrances_in_buildings(parsed, ways_geo, num_parts=4).take_all()
    exp = [(100 + b * 100 + 15, 100 + b * 100 + 11) for b in range(n) if b % 5 == 0]
    assert sorted((r["point_id"], r["poly_id"]) for r in rows) == sorted(exp)


def test_media_features_plumbing():
    feats = media_features(fixture_docs(9)).take_all()
    assert len(feats) > 0
    for f in feats[:5]:
        assert f["media_ref"].startswith("img://")
        assert len(f["feature"]) == MediaDecoder.FEATURE_DIM
        # width/height are REAL parsed dims (store spec: 8..32)
        px = synthesize_pixels(f["media_ref"])
        assert (f["width"], f["height"]) == (px.shape[1], px.shape[0])
        # feature comes from the real decoded pixels (through encode+decode)
        assert np.array_equal(np.asarray(f["feature"], np.float32), grid_features(px))
    # determinism: same ref → same feature
    by_ref = {}
    for f in feats:
        if f["media_ref"] in by_ref:
            assert np.allclose(by_ref[f["media_ref"]], f["feature"])
        by_ref[f["media_ref"]] = f["feature"]


def test_decoder_rejects_unsupported():
    dec = MediaDecoder()
    with pytest.raises(NotImplementedError):
        dec._decode(b"xx", "audio")  # non-image kind: stubbed
    with pytest.raises(NotImplementedError):
        dec._decode(b"\xff\xd8\xffjpeg-ish", "image")  # compressed codec: absent
