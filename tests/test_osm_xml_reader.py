"""Distributed OSM XML reader vs the driver-side single-file parse."""

from __future__ import annotations

import pandas as pd

from osmi_addresses_ray.sources.osm_xml import read_osm_xml
from osmi_addresses_ray.sources.testzone import load_osm_xml

TESTZONE = "/root/reference/test/osmi-testzone.osm"


def _key(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["spans_repr"] = df["spans"].map(lambda s: repr(list(s)))
    return df[["doc_id", "spans_repr"]].sort_values("doc_id").reset_index(drop=True)


def test_distributed_reader_matches_driver_parse(ray_session):
    ref = load_osm_xml(TESTZONE).to_pandas()
    # small chunks force many split boundaries through real entities
    dist = read_osm_xml(TESTZONE, n_chunks=17).to_pandas()
    pd.testing.assert_frame_equal(_key(ref), _key(dist))


def test_gz_fallback(ray_session, tmp_path):
    import gzip
    import shutil

    gz = str(tmp_path / "tz.osm.gz")
    with open(TESTZONE, "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    dist = read_osm_xml(gz).to_pandas()
    ref = load_osm_xml(TESTZONE).to_pandas()
    pd.testing.assert_frame_equal(_key(ref), _key(dist))


def test_attribute_with_slash_gt(ray_session, tmp_path):
    """'>' (and '/>') are legal unescaped inside attribute values; the
    reader must not truncate mid-element (regression: string-search close)."""
    p = tmp_path / "edge.osm"
    p.write_text(
        "<?xml version='1.0'?><osm>\n"
        "  <node id='1' lat='1.0' lon='2.0' user='a/&gt;b'/>\n"
        "  <node id='2' lat='1.1' lon='2.1' user='x/>y'>\n"
        "    <tag k='name' v='n'/>\n"
        "  </node>\n"
        "  <way id='3' user='w/>z'>\n"
        "    <nd ref='1'/><nd ref='2'/>\n"
        "  </way>\n"
        "</osm>\n"
    )
    docs = read_osm_xml(str(p), n_chunks=3).to_pandas()
    ids = sorted(docs["doc_id"])
    assert ids == ["node/1", "node/2", "way/3"]


def test_comment_with_entity_start_not_split(ray_session, tmp_path):
    """'<node' inside an XML comment or CDATA-looking text must not be taken
    for an entity boundary (it would fabricate a phantom doc and split the
    enclosing element)."""
    p = tmp_path / "comment.osm"
    p.write_text(
        "<?xml version='1.0'?>\n"
        "<!-- header comment mentioning <node id='999' lat='0' lon='0'/> -->\n"
        "<osm>\n"
        "  <node id='1' lat='1.0' lon='2.0'/>\n"
        "  <!-- interior: <way id='888'> is not real -->\n"
        "  <node id='2' lat='1.1' lon='2.1'/>\n"
        "  <way id='3'>\n"
        "    <nd ref='1'/><nd ref='2'/>\n"
        "    <tag k='note' v='x'/>\n"
        "  </way>\n"
        "</osm>\n"
    )
    for n_chunks in (1, 2, 5, 9):
        docs = read_osm_xml(str(p), n_chunks=n_chunks).to_pandas()
        assert sorted(docs["doc_id"]) == ["node/1", "node/2", "way/3"], n_chunks


def test_malformed_entity_fails_loudly(ray_session, tmp_path):
    """A malformed entity must raise, not be silently dropped."""
    import pytest
    import ray

    p = tmp_path / "broken.osm"
    p.write_text(
        "<?xml version='1.0'?><osm>\n"
        "  <node id='1' lat='1.0' lon='2.0'/>\n"
        "  <node id='2' lat='broken lon='2.1'/>\n"
        "</osm>\n"
    )
    with pytest.raises((ValueError, ray.exceptions.RayTaskError)):
        read_osm_xml(str(p), n_chunks=2).to_pandas()
