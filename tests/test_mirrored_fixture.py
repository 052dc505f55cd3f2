"""Mirrored-coordinate (southern/western hemisphere) fixture leg — round-5
verdict task #7. Every standing gate runs on the lat-47/lon-8 corpus; these
tests re-run the geodesy-sensitive surface at a NEGATIVE origin so the
floor-division / quantization handling is load-bearing, not latent."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_MIRROR_ENV = {
    "GRAFT_FIXTURE_ORIGIN": "-47,-8",
    "GRAFT_ORACLE_DIR": "/tmp/graft_oracle_mirror",
}


def test_mirrored_fixture_golden_counts(monkeypatch, ray_session):
    """Layer counts are origin-invariant by construction; a quantization or
    floor bug at negative coords would break them."""
    from osmi_addresses_ray.pipelines.address_view import build_layers
    from osmi_addresses_ray.sources import fixture

    monkeypatch.setenv("GRAFT_FIXTURE_ORIGIN", "-47,-8")
    assert fixture.fixture_origin() == (-47.0, -8.0)
    docs = fixture.fixture_docs(23)
    layers = build_layers(docs, num_parts=4)
    exp = fixture.expected_counts(23)
    got = {name: layers[name].count() for name in exp}
    assert got == exp
    # sanity: the corpus really is in the south-west quadrant
    nwa = layers["osmi_addresses_nodes_with_addresses"].to_pandas()
    assert (nwa["lat"] < 0).all() and (nwa["lon"] < 0).all()


def test_mirrored_gate_lattice_queries():
    """Cold-cache gate sim over the floor-division lattice family + two
    flagship layers at the mirrored origin (subprocess: the oracle-dir env
    must bind before module import, and workers must inherit it)."""
    shutil.rmtree(_MIRROR_ENV["GRAFT_ORACLE_DIR"], ignore_errors=True)
    names = [
        "hex_bins", "staypoints", "geohash_cells", "quad_cells",
        "polygonize_nwa", "osmi_addresses_nodes_with_addresses",
        "osmi_addresses_nearest_roads",
    ]
    env = dict(os.environ, **_MIRROR_ENV)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "gate_sim.py"),
         "/root/testdata/sf0.001", *names],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=580,
    )
    tail = "\n".join(proc.stdout.splitlines()[-20:])
    assert proc.returncode == 0, f"gate_sim rc={proc.returncode}\n{tail}\n{proc.stderr[-2000:]}"
    assert f"{len(names)} hash-equal, 0 rows-only, 0 failures" in proc.stdout, tail
