"""Round-4 property tests: the range-partitioned as-of variant must equal
the user-keyed exchange on ARBITRARY corpora (random users, ties, bucket
widths) — the stitch's bucket-boundary reasoning is exactly the kind of
logic a planted example can miss."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from osmi_addresses_ray.pipelines import timeseries


def _write_events(tmpdir: str, rows) -> str:
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    df["props"] = "{}"
    df.to_parquet(os.path.join(tmpdir, "events.parquet"), index=False)
    return tmpdir


@st.composite
def _corpus(draw):
    n = draw(st.integers(min_value=1, max_value=60))
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = []
    for i in range(n):
        user = draw(st.integers(min_value=1, max_value=4))
        # offsets up to ~5 days in coarse steps so equal-ts ties are common
        off_s = draw(st.integers(min_value=0, max_value=400_000))
        ts = base + np.timedelta64(off_s, "s")
        etype = draw(st.sampled_from(["view", "click"]))
        rows.append((i, ts, user, etype, 1.0))
    return rows


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("asof_fuzz"))


@given(corpus=_corpus(), bucket_hours=st.sampled_from([1, 5, 24, 1000]))
@settings(max_examples=25, deadline=None)
def test_asof_range_partitioned_fuzz(corpus, bucket_hours, fuzz_dir, ray_session):
    d = _write_events(fuzz_dir, corpus)
    base = timeseries.asof_pairs_ds(d, num_parts=3).to_pandas()
    rp = timeseries.asof_pairs_range_partitioned(
        d, num_parts=3, bucket_hours=bucket_hours
    ).to_pandas()
    key = ["event_id", "user_id", "ts", "view_event_id", "view_ts", "lag_us"]

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # an all-empty Dataset can surface column-less
            return pd.DataFrame(columns=key)
        return (
            df[key].sort_values("event_id").reset_index(drop=True)
        )

    a, b = norm(base), norm(rp)
    assert len(a) == len(b)
    if len(a):
        pd.testing.assert_frame_equal(a, b)
