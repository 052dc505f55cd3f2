"""Two-level direct exchange (round-5 verdict task #2): row parity with the
one-level grid, driver-ref bounding, and the auto-selection threshold."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from osmi_addresses_ray import ops


def _corpus(n=50_000, n_keys=5_000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n).astype(np.int64),
            "v": rng.integers(0, 1_000_000, n).astype(np.int64),
        }
    )


_SCHEMA = pa.schema([("k", pa.int64()), ("v", pa.int64())])


def _make_sum_per_key():
    # built per-call so cloudpickle ships it BY VALUE (a module-level def in
    # a test file pickles by reference, which workers cannot import)
    def _sum_per_key(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([("k", pa.int64()), ("s", pa.int64())]).empty_table()
        df = t.to_pandas().groupby("k", as_index=False, sort=True).agg(s=("v", "sum"))
        return pa.Table.from_pandas(df, preserve_index=False)

    return _sum_per_key


def _run(df, num_parts, two_level):
    ds = rd.from_pandas(df).repartition(24).materialize()
    out = ops.direct_cogroup(
        [ds], [["k"]], num_parts, _make_sum_per_key(), [_SCHEMA], two_level=two_level
    )
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    return got, dict(ops.EXCHANGE_STATS)


def test_two_level_matches_one_level_and_pandas(ray_session):
    df = _corpus()
    one, st1 = _run(df, 96, two_level=False)
    two, st2 = _run(df, 96, two_level=True)
    pd.testing.assert_frame_equal(one, two)
    want = (
        df.groupby("k", as_index=False).agg(s=("v", "sum"))
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(two, want)
    assert st1["mode"] == "one_level" and st2["mode"] == "two_level"
    # the point of the feature: piece refs bounded ~O(blocks + P), not B x P
    assert st2["piece_refs"] < st1["piece_refs"] / 8
    assert st2["piece_refs"] <= st2["n_blocks"] + st2["num_parts"]


def test_two_level_cogroup_two_sources(ray_session):
    df_a = _corpus(20_000, 500, seed=1)
    df_b = _corpus(30_000, 500, seed=2).rename(columns={"v": "w"})
    schema_b = pa.schema([("k", pa.int64()), ("w", pa.int64())])

    def joined_sum(a: pa.Table, b: pa.Table) -> pa.Table:
        da, db = a.to_pandas(), b.to_pandas()
        ga = da.groupby("k", as_index=False).agg(s=("v", "sum"))
        gb = db.groupby("k", as_index=False).agg(t=("w", "sum"))
        m = ga.merge(gb, on="k", how="inner")
        return pa.Table.from_pandas(m, preserve_index=False)

    dsa = rd.from_pandas(df_a).repartition(8).materialize()
    dsb = rd.from_pandas(df_b).repartition(8).materialize()
    kwargs = dict()
    outs = []
    for tl in (False, True):
        out = ops.direct_cogroup(
            [dsa, dsb], [["k"], ["k"]], 80, joined_sum,
            [_SCHEMA, schema_b], two_level=tl, **kwargs,
        )
        outs.append(out.to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    want = (
        df_a.groupby("k", as_index=False).agg(s=("v", "sum"))
        .merge(df_b.groupby("k", as_index=False).agg(t=("w", "sum")), on="k")
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(outs[1], want)


def test_auto_threshold_and_unsupported_combos(ray_session):
    df = _corpus(2_000, 50)
    ds = rd.from_pandas(df).repartition(4).materialize()
    out = ops.direct_cogroup(
        [ds], [["k"]], 8, _make_sum_per_key(), [_SCHEMA]
    )
    out.to_pandas()
    assert ops.EXCHANGE_STATS["mode"] == "one_level"  # P=8 < threshold
    ds2 = rd.from_pandas(df).repartition(4).materialize()
    out = ops.direct_cogroup(
        [ds2], [["k"]], ops.TWO_LEVEL_MIN_PARTS, _make_sum_per_key(), [_SCHEMA]
    )
    out.to_pandas()
    assert ops.EXCHANGE_STATS["mode"] == "two_level"
    with pytest.raises(ValueError, match="two_level"):
        ops.direct_cogroup(
            [rd.from_pandas(df).materialize()], [["k"]], 128, _make_sum_per_key(),
            [_SCHEMA], two_level=True, emit_partitioned_on=["k"],
        )


def test_two_level_with_pre_fusion(ray_session):
    # pre runs inside the split chunk: filter + project fused into wave 1
    df = _corpus(10_000, 300, seed=3)

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t.filter(pc.greater(t["v"], 500_000))
        return pa.table({"k": s["k"], "v": s["v"]})

    ds = rd.from_pandas(df).repartition(8).materialize()
    one = ops.direct_cogroup(
        [ds], [["k"]], 96, _make_sum_per_key(), [_SCHEMA], pres=[pre], two_level=False
    ).to_pandas().sort_values("k").reset_index(drop=True)
    two = ops.direct_cogroup(
        [ds], [["k"]], 96, _make_sum_per_key(), [_SCHEMA], pres=[pre], two_level=True
    ).to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, two)
    want = (
        df[df["v"] > 500_000]
        .groupby("k", as_index=False).agg(s=("v", "sum"))
        .sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(two, want)


def test_two_level_empty_partitions_hit_fn_with_typed_empties(ray_session):
    # 4 distinct keys over 96 partitions: most groups are fully empty; fn
    # must still see correctly-typed empty tables and emit typed empties
    df = pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]})
    ds = rd.from_pandas(df).materialize()
    out = ops.direct_cogroup(
        [ds], [["k"]], 96, _make_sum_per_key(), [_SCHEMA], two_level=True
    )
    got = out.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["s"].tolist() == [10, 20, 30, 40]
