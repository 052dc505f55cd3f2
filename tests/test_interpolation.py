"""Interpolation subsystem vs testzone goldens (run_tests.sh:21,48-56)."""

from __future__ import annotations

import collections

import pytest
import ray.data as rd

from osmi_addresses_ray.stages.assembly import assemble_ways
from osmi_addresses_ray.stages.interpolation import (
    collect_endpoint_tags,
    interpolation_stage,
    validate_and_densify,
)
from osmi_addresses_ray.stages.parse import parse_docs

GOLDEN_ERRORS = {
    "no alphabetic part in addr:housenumber": 2,
    "numeric parts of housenumbers not identical": 1,
    "endpoint has wrong format": 4,
    "different tags on endpoints": 6,
    "needless interpolation": 3,
    "interpolation even but number odd": 1,
    "interpolation odd but number even": 1,
    "range too large": 1,
    "unknown interpolation type": 2,
}


@pytest.fixture(scope="module")
def interp_out(testzone_docs):
    ds = parse_docs(rd.from_arrow(testzone_docs))
    ways_geo = assemble_ways(ds, num_parts=4).materialize()
    from osmi_addresses_ray.ops import filter_notnull

    ep = collect_endpoint_tags(ds, filter_notnull(ways_geo, "t_addr_interpolation"))
    out = interpolation_stage(ways_geo, ep).materialize()
    return out


def test_interpolation_layer_goldens(interp_out):
    layer = interp_out.filter(expr="__out == 0").take_all()
    assert len(layer) == 27  # run_tests.sh:21
    errs = collections.Counter(r["error"] for r in layer if r["error"] is not None)
    assert dict(errs) == GOLDEN_ERRORS


def test_interpolated_points_golden(interp_out):
    pts = interp_out.filter(expr="__out == 1").take_all()
    assert len(pts) == 19  # run_tests.sh:24 (is_ip=1 rows)
    for p in pts:
        assert p["houseno"]


def test_densify_even():
    import numpy as np

    row, pts = validate_and_densify(
        1, "even",
        np.array([0.0, 0.001]), np.array([0.0, 0.0]),
        10, 11, False, "",
        {"addr:housenumber": "2", "addr:street": "A"},
        {"addr:housenumber": "10", "addr:street": "A"},
    )
    assert row["error"] is None
    assert [p["houseno"] for p in pts] == ["4", "6", "8"]
    assert pts[0]["lon"] == pytest.approx(0.001 * 2 / 8)


def test_densify_descending():
    import numpy as np

    row, pts = validate_and_densify(
        1, "all",
        np.array([0.0, 1.0]), np.array([0.0, 0.0]),
        10, 11, False, "",
        {"addr:housenumber": "5"},
        {"addr:housenumber": "2"},
    )
    assert [p["houseno"] for p in pts] == ["4", "3"]
    # 4 is closer to the "5" end (the line start)
    assert pts[0]["lon"] == pytest.approx(1 - 2 / 3)


def test_alphabetic_densify():
    import numpy as np

    row, pts = validate_and_densify(
        1, "alphabetic",
        np.array([0.0, 1.0]), np.array([0.0, 0.0]),
        10, 11, False, "",
        {"addr:housenumber": "7a"},
        {"addr:housenumber": "7d"},
    )
    assert row["error"] is None
    assert [p["houseno"] for p in pts] == ["7b", "7c"]


def test_ladder_overwrite_alpha_error_by_different_tags():
    import numpy as np

    # alphabetic error set first, then 'different tags on endpoints' overwrites
    row, pts = validate_and_densify(
        1, "alphabetic",
        np.array([0.0, 1.0]), np.array([0.0, 0.0]),
        10, 11, False, "",
        {"addr:housenumber": "7", "addr:street": "X"},
        {"addr:housenumber": "8", "addr:street": "Y"},
    )
    assert row["error"] == "different tags on endpoints"
    assert pts == []


def test_ladder_unknown_type_beats_all():
    import numpy as np

    row, _ = validate_and_densify(
        1, "7",
        np.array([0.0, 1.0]), np.array([0.0, 0.0]),
        10, 11, False, "",
        {"addr:housenumber": "123%&"},
        {"addr:housenumber": "4"},
    )
    assert row["error"] == "unknown interpolation type"


def test_ladder_wrong_format():
    import numpy as np

    row, _ = validate_and_densify(
        1, "all",
        np.array([0.0, 1.0]), np.array([0.0, 0.0]),
        10, 11, False, "",
        {"addr:housenumber": "123%&"},
        {"addr:housenumber": "130"},
    )
    assert row["error"] == "endpoint has wrong format"


def test_equal_endpoints_no_error_no_points():
    # ADVICE r1 (high): first==last previously raised ZeroDivisionError; the
    # C++ reference computes fraction = 1/0.0 = inf and densifies nothing
    # (InterpolationWriter.hpp:170-190) — error-free layer row, zero ip points.
    import numpy as np

    for interp, hn in [("even", "4"), ("all", "7"), ("alphabetic", "2a")]:
        row, pts = validate_and_densify(
            1, interp,
            np.array([0.0, 1.0]), np.array([0.0, 0.0]),
            10, 11, False, "",
            {"addr:housenumber": hn},
            {"addr:housenumber": hn},
        )
        assert row["error"] is None, interp
        assert pts == [], interp
