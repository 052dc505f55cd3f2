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


def test_vectorized_validator_parity_randomized():
    """The vectorized batch validator (ladder as column ops + grouped
    densify) is BIT-IDENTICAL to the scalar reference path
    (validate_and_densify) over a randomized batch covering every error
    class, both walk directions, multi-vertex ways and alphabetic ways."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from osmi_addresses_ray.constants import tag_col
    from osmi_addresses_ray.stages.interpolation import (
        IP_POINT_SCHEMA,
        InterpolationValidator,
    )

    rng = np.random.default_rng(7)
    N = 300
    rows, ep_tags, nid = [], {}, 1000
    interps = ["even", "odd", "all", "alphabetic", "weird", "even", "odd", "all"]
    hns = ["2", "4", "10", "11", "100", "0012", "7%&", "", "-4", "1001",
           "2002", "3a", "3b", "2a", "xx1", "5c"]
    for i in range(N):
        nv = int(rng.integers(2, 6))
        xs = np.sort(rng.uniform(8.0, 8.01, nv))
        ys = rng.uniform(47.0, 47.01, nv)
        f_id, l_id = nid, nid + 1
        nid += 2
        ftags = {}
        ltags = {}
        fhn = hns[rng.integers(len(hns))]
        lhn = hns[rng.integers(len(hns))]
        if fhn:
            ftags["addr:housenumber"] = fhn
        if lhn:
            ltags["addr:housenumber"] = lhn
        if rng.random() < 0.3:
            ftags["addr:street"] = "Main St"
        if rng.random() < 0.2:
            ltags["addr:city"] = "X"
        ep_tags[f_id], ep_tags[l_id] = ftags, ltags
        rows.append(
            dict(way_id=i + 1, interp=interps[rng.integers(len(interps))],
                 xs=xs, ys=ys, f=f_id, l=l_id,
                 closed=bool(rng.random() < 0.15), lastchange="2020-01-01T00:00:00Z")
        )
    t = pa.table({
        "way_id": pa.array([r["way_id"] for r in rows], pa.int64()),
        tag_col("addr:interpolation"): pa.array([r["interp"] for r in rows]),
        "first_ref": pa.array([r["f"] for r in rows], pa.int64()),
        "last_ref": pa.array([r["l"] for r in rows], pa.int64()),
        "is_closed": pa.array([r["closed"] for r in rows]),
        "lastchange": pa.array([r["lastchange"] for r in rows]),
        "xs": pa.array([r["xs"].tolist() for r in rows], pa.list_(pa.float64())),
        "ys": pa.array([r["ys"].tolist() for r in rows], pa.list_(pa.float64())),
    })
    out = InterpolationValidator(ray.put(ep_tags))(t)
    got_layer = out.filter(pc.equal(out["__out"], 0))
    got_pts = out.filter(pc.equal(out["__out"], 1))

    exp_rows, exp_pts = [], []
    for r in rows:
        row, ips = validate_and_densify(
            r["way_id"], r["interp"], r["xs"], r["ys"], r["f"], r["l"],
            r["closed"], r["lastchange"], ep_tags[r["f"]], ep_tags[r["l"]],
        )
        exp_rows.append(row)
        exp_pts.extend(ips)

    assert got_layer.num_rows == len(exp_rows)
    for k in ("way_id", "typename", "firstid", "lastid", "firstno", "lastno",
              "error", "lastchange"):
        assert got_layer[k].to_pylist() == [er[k] for er in exp_rows], k

    cols = [f.name for f in IP_POINT_SCHEMA]
    gp = got_pts.select(cols).to_pandas().sort_values(["ord1", "ord3"]).reset_index(drop=True)
    epd = (
        pd.DataFrame(exp_pts, columns=cols).sort_values(["ord1", "ord3"]).reset_index(drop=True)
        if exp_pts else pd.DataFrame(columns=cols)
    )
    assert len(gp) == len(epd) and len(gp) > 0
    for col in cols:
        a, b = gp[col].to_numpy(), epd[col].to_numpy()
        if col in ("lon", "lat"):
            assert (a == b.astype(np.float64)).all(), col  # bit-exact
        else:
            assert (a == b).all(), col


def test_interpolation_stage_refs_parity(testzone_docs, interp_out):
    """The raw-task wave (interpolation_stage_refs, the no-workdir fast
    path) is row-identical to the Dataset-plan stage on the conformance
    corpus."""
    import pandas as pd

    from osmi_addresses_ray.stages.interpolation import interpolation_stage_refs

    ds = parse_docs(rd.from_arrow(testzone_docs))
    ways_geo = assemble_ways(ds, num_parts=4).materialize()
    from osmi_addresses_ray.ops import filter_notnull

    ep = collect_endpoint_tags(ds, filter_notnull(ways_geo, "t_addr_interpolation"))
    refs_out = interpolation_stage_refs(ways_geo, ep)

    def norm(ds_):
        df = ds_.to_pandas()
        return df.sort_values(list(df.columns), kind="stable", na_position="last").reset_index(
            drop=True
        )

    a, b = norm(interp_out), norm(refs_out)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0
