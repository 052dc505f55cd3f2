"""Regression tests for ADVICE r1 edge cases in the exchange operators."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from osmi_addresses_ray.ops import direct_partitioned_map, pack_by_part
from osmi_addresses_ray.pipelines.relational import topk


def test_pack_by_part_empty_table():
    t = pa.table({"a": pa.array([], pa.int64())})
    out = pack_by_part(t, np.array([], dtype=np.int64), 0)
    assert out.num_rows == 0
    assert out.column_names == ["__part", "__src", "__blob"]


def test_direct_partitioned_map_single_part(ray_session):
    t = pa.table({"k": [1, 2, 1, 3], "v": [10, 20, 30, 40]})
    ds = rd.from_arrow(t)

    def f(part: pa.Table) -> pa.Table:
        return part.group_by("k").aggregate([("v", "sum")])

    out = direct_partitioned_map(ds, ["k"], 1, f, t.schema).take_all()
    got = {r["k"]: r["v_sum"] for r in out}
    assert got == {1: 40, 2: 20, 3: 40}


def test_topk_tie_break(ray_session):
    # rows tied at the k-th value must resolve by ascending tie column,
    # matching ORDER BY val DESC, id ASC
    df = pd.DataFrame({"id": [5, 1, 3, 2, 4], "val": [9.0, 9.0, 9.0, 7.0, 5.0]})
    ds = rd.from_pandas(df).repartition(3)
    out = topk(ds, "val", 2, tie_cols=["id"])
    assert out["id"].tolist() == [1, 3]


def test_join_pushdown_parity(ray_session):
    """Both join plans (direct and aggregation-pushed-below-join) produce
    identical results."""
    from osmi_addresses_ray.pipelines.relational import (
        q_join_orders_customers,
        q_supplier_part_join,
    )

    sf = "/root/testdata/sf0.001"
    a = q_supplier_part_join(sf, pushdown=False)
    b = q_supplier_part_join(sf, pushdown=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    c = q_join_orders_customers(sf, pushdown=False)
    d = q_join_orders_customers(sf, pushdown=True)
    pd.testing.assert_frame_equal(c, d, check_dtype=False)


def test_join_broadcast_parity(ray_session):
    """The broadcast small-side plan equals the native hash-shuffle join
    for every pushdown × broadcast combination."""
    from osmi_addresses_ray.pipelines.relational import (
        q_join_orders_customers,
        q_supplier_part_join,
    )

    sf = "/root/testdata/sf0.001"
    for q in (q_supplier_part_join, q_join_orders_customers):
        for pd_flag in (False, True):
            ref = q(sf, pushdown=pd_flag, broadcast=False)
            bc = q(sf, pushdown=pd_flag, broadcast=True)
            pd.testing.assert_frame_equal(ref, bc, check_dtype=False)


def test_broadcast_inner_join_edge(ray_session):
    """Misses are dropped (inner), empty dim yields an empty result with
    the joined schema."""
    import ray.data as rd

    from osmi_addresses_ray.pipelines.relational import broadcast_inner_join

    fact = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3, 5], pa.int64()), "v": [10.0, 20.0, 30.0, 50.0]})
    )
    dim = rd.from_arrow(
        pa.table({"dk": pa.array([1, 3, 4], pa.int64()), "name": ["a", "c", "d"]})
    )
    out = broadcast_inner_join(fact, dim, left_on="k", right_on="dk", take_cols=["name"])
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).sort_by("k")
    assert t["k"].to_pylist() == [1, 3]
    assert t["name"].to_pylist() == ["a", "c"]

    empty_dim = rd.from_arrow(
        pa.table({"dk": pa.array([], pa.int64()), "name": pa.array([], pa.string())})
    )
    out2 = broadcast_inner_join(fact, empty_dim, left_on="k", right_on="dk", take_cols=["name"])
    assert out2.count() == 0
    assert "name" in out2.schema().names


def test_join_parts_for_rule():
    """Partition counts for shuffle-join fallbacks derive from row counts
    (clamped), never a fixed literal (r3 verdict: the fixed 8 was the
    first large-scale bottleneck a cluster user hits)."""
    from osmi_addresses_ray.ops import join_parts_for

    assert join_parts_for(0) == 8
    assert join_parts_for(1_000) == 8
    assert join_parts_for(16_000_000) == 8
    assert join_parts_for(100_000_000) == 50
    assert join_parts_for(3_000_000, 100_000_000) == 50  # larger side wins
    assert join_parts_for(10**12) == 1024  # clamped at hi


def test_fit_hash_shuffle_pool_fits_cluster(ray_session):
    """The join aggregator pool must be schedulable at ANY partition count:
    total reserved CPUs and memory stay within half the cluster (the
    un-fitted defaults demand 32 CPUs + 104 GiB at P=256 and the join
    hangs forever — see SCALE.md Exchanges)."""
    import ray

    from osmi_addresses_ray.ops import fit_hash_shuffle

    res = ray.cluster_resources()
    for p in (8, 64, 256, 1024, 4096):
        kw = fit_hash_shuffle(p)
        assert kw["num_partitions"] == p
        ag = kw["aggregator_ray_remote_args"]
        aggs = min(p, 64)
        assert ag["num_cpus"] * aggs <= res["CPU"] / 2 + 1e-9
        assert ag["memory"] * aggs <= res["memory"] / 2 + 1
        assert ag["num_cpus"] > 0 and ag["memory"] > 0
