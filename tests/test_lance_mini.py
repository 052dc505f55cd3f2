"""lance-mini: the in-repo Lance-v2-layout subset that makes the ``.lance``
CLI branch executable in this sandbox (round-5 verdict task #4). Covers the
buffer-level codec (nested list<struct>, nulls, sliced fragments), the
dataset/manifest layout, and the CLI end to end on ``.lance`` input."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from osmi_addresses_ray.sources.fixture import expected_counts, fixture_table
from osmi_addresses_ray.sources.lance_mini import (
    is_lance_mini,
    read_fragment,
    read_lance_mini,
    write_fragment,
    write_lance_mini,
)


def test_fragment_roundtrip_nested_and_nulls(tmp_path):
    t = pa.table(
        {
            "i": pa.array([1, None, 3, 4], pa.int64()),
            "s": pa.array(["a", "bb", None, ""], pa.string()),
            "f": pa.array([0.5, 1.5, None, 3.5], pa.float64()),
            "ls": pa.array(
                [[{"k": "x", "n": 1}], None, [], [{"k": None, "n": None}]],
                pa.list_(pa.struct([("k", pa.string()), ("n", pa.int32())])),
            ),
        }
    )
    p = str(tmp_path / "frag.lance")
    write_fragment(t, p)
    got = read_fragment(p)
    assert got.equals(t)


def test_fragment_roundtrip_sliced_input(tmp_path):
    base = pa.table(
        {
            "i": pa.array(np.arange(100), pa.int64()),
            "s": pa.array([f"v{j}" for j in range(100)]),
            "l": pa.array([[j, j + 1] for j in range(100)], pa.list_(pa.int64())),
        }
    )
    sl = base.slice(37, 20)  # non-zero offsets through the whole tree
    p = str(tmp_path / "sliced.lance")
    write_fragment(sl, p)
    got = read_fragment(p)
    # compare by value (equals() is value-based, offsets notwithstanding)
    assert got.equals(pa.Table.from_pydict(sl.to_pydict(), schema=sl.schema))


def test_fragment_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.lance")
    with open(p, "wb") as f:
        f.write(b"\x00" * 64)
    with pytest.raises(ValueError, match="magic"):
        read_fragment(p)


def test_dataset_roundtrip_multi_fragment(tmp_path, ray_session):
    t = fixture_table(7)
    d = str(tmp_path / "docs.lance")
    write_lance_mini(t, d, rows_per_fragment=30)
    assert is_lance_mini(d)
    n_frags = len(os.listdir(os.path.join(d, "data")))
    assert n_frags == -(-t.num_rows // 30)
    ds = read_lance_mini(d)
    got = (
        ds.to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype(str)
    )
    want = (
        t.to_pandas().sort_values("doc_id").reset_index(drop=True).astype(str)
    )
    assert got.equals(want)


def test_read_lance_docs_dispatch(tmp_path, ray_session):
    from osmi_addresses_ray.sources.docs_io import read_lance_docs

    t = fixture_table(3)
    d = str(tmp_path / "docs.lance")
    write_lance_mini(t, d)
    assert read_lance_docs(d).count() == t.num_rows
    with pytest.raises(RuntimeError, match="pylance"):
        read_lance_docs(str(tmp_path / "missing.lance"))


def test_cli_end_to_end_on_lance_input(tmp_path, ray_session):
    """The north-star carrier actually EXECUTES: .lance input through the
    full CLI pipeline, layer counts equal to the same corpus via parquet."""
    from osmi_addresses_ray.cli import main

    n_blocks = 9
    t = fixture_table(n_blocks)
    lance_in = str(tmp_path / "docs.lance")
    write_lance_mini(t, lance_in, rows_per_fragment=50)
    out_l = str(tmp_path / "out_lance")
    assert main([lance_in, out_l, "--num-parts", "4"]) in (0, None)
    exp = expected_counts(n_blocks)
    for layer, n in exp.items():
        got = pq.read_table(os.path.join(out_l, layer)).num_rows
        assert got == n, (layer, got, n)
