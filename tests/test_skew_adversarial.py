"""Adversarial skew tests for the wide exchanges (VERDICT r3 task #5).

Two worst cases a planet-scale corpus WILL contain:

1. LSH band/bucket skew — ~all documents identical, so every band hashes
   the whole corpus into ONE bucket. Without the bucket cap, pair fan-out
   is C(n, 2) and the job dies; with it, fan-out is bounded at C(cap, 2)
   per (band, bucket) and the cluster-wide truncation ledger records
   exactly what was dropped (no silent caps).

2. Single-user event skew — one user owns ~all events, so the user-keyed
   exchange the as-of/session family relies on lands everything in one
   partition. The partition kernel is a vectorized O(n log n) sweep, so
   wall time stays bounded; memory is the one resource that breaks, which
   is the documented range-partition + boundary-stitch variant's job
   (timeseries.asof_pairs_range_partitioned, tested for equality here).
"""

from __future__ import annotations

import os
import time

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def identical_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew_docs")
    n = 100_000
    text = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "through the same identical duplicated corpus document body"
    )
    pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [text] * n,
            "lang": ["en"] * n,
            "source": ["synthetic"] * n,
            "n_chars": np.full(n, len(text), dtype=np.int64),
        }
    ).to_parquet(os.path.join(d, "documents.parquet"), index=False)
    return str(d)


def test_lsh_identical_corpus_bounded(identical_docs_dir, ray_session):
    from osmi_addresses_ray.pipelines import dedup

    before = dedup.lsh_truncation_stats()
    t0 = time.monotonic()
    pairs = dedup.minhash_lsh_pairs(identical_docs_dir, num_parts=8)
    wall = time.monotonic() - t0
    after = dedup.lsh_truncation_stats()
    # bounded fan-out: C(cap, 2) = 2016 verified pairs, NOT C(100k, 2)
    cap = dedup._BUCKET_CAP
    assert len(pairs) <= cap * (cap - 1) // 2
    assert len(pairs) > 0  # the survivors are real duplicates
    # the ledger recorded the truncation (no silent caps): every band's
    # mega-bucket was capped and ~n - cap members dropped per band
    capped = after["capped_buckets"] - before["capped_buckets"]
    dropped = after["dropped_members"] - before["dropped_members"]
    assert capped >= 1
    assert dropped >= 100_000 - cap
    # bounded wall time: minutes would indicate quadratic fan-out leaked
    # through (100k identical docs, 4-CPU session; healthy run ~10 s)
    assert wall < 120, f"LSH on identical corpus took {wall:.0f}s"


def test_exact_dedup_identical_corpus(identical_docs_dir, ray_session):
    """The exact-dedup winner exchange collapses the same adversarial
    corpus to ONE winner without quadratic work anywhere."""
    from osmi_addresses_ray.pipelines import dedup

    t0 = time.monotonic()
    out = dedup.exact_dedup_docs(identical_docs_dir)
    wall = time.monotonic() - t0
    df = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert len(df) == 1 and int(df["doc_id"].iloc[0]) == 0
    assert wall < 60


@pytest.fixture(scope="module")
def single_user_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew_events")
    n = 400_000
    rng = np.random.default_rng(11)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    # one user owns 99.9% of events; a handful of background users keep the
    # exchange honest (more than one occupied partition)
    user = np.where(rng.random(n) < 0.999, 1, rng.integers(2, 10, n))
    inc = rng.integers(1, 2_000_000, n)
    # sprinkle >30-min gaps so the session test has real session breaks
    inc[rng.random(n) < 0.0005] += 31 * 60 * 1_000_000
    ts = base + np.cumsum(inc).astype("timedelta64[us]")
    etype = np.where(rng.random(n) < 0.5, "view", "click")
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": user.astype(np.int64),
            "event_type": etype,
            "value": rng.random(n),
            "props": "{}",
        }
    ).to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_asof_single_user_skew_bounded(single_user_events_dir, ray_session):
    """One partition owns ~all 400k events: the per-partition kernel is a
    vectorized lexsort sweep, so the hot partition costs O(n log n), not
    O(hours * n) or O(n^2). Compare against pandas merge_asof for
    correctness on the skewed corpus."""
    from osmi_addresses_ray.pipelines import timeseries

    t0 = time.monotonic()
    out = timeseries.asof_join_events(single_user_events_dir, num_parts=8)
    wall = time.monotonic() - t0
    assert wall < 120, f"as-of on single-user corpus took {wall:.0f}s"

    ev = pd.read_parquet(os.path.join(single_user_events_dir, "events.parquet"))
    clicks = ev[ev["event_type"] == "click"]
    views = (
        ev[ev["event_type"] == "view"]
        .sort_values(["user_id", "ts", "event_id"], kind="stable")
    )
    # brute force on user 1 only (the hot key) — sampling keeps the check
    # honest without an O(n^2) reference join
    c1 = clicks[clicks["user_id"] == 1].head(2000)
    v1 = views[views["user_id"] == 1]
    got = out[out["event_id"].isin(c1["event_id"])].set_index("event_id")
    v_ts = v1["ts"].to_numpy()
    v_id = v1["event_id"].to_numpy()
    for row in c1.itertuples():
        i = np.searchsorted(v_ts, np.datetime64(row.ts, "us"), side="right") - 1
        if i < 0:
            assert row.event_id not in got.index
        else:
            assert int(got.loc[row.event_id, "view_event_id"]) == int(v_id[i])


def test_session_windows_single_user_skew(single_user_events_dir, ray_session):
    from osmi_addresses_ray.pipelines import timeseries

    t0 = time.monotonic()
    out = timeseries.session_windows(single_user_events_dir, num_parts=8)
    wall = time.monotonic() - t0
    assert wall < 120
    # session count for the hot user matches a direct gap scan
    ev = pd.read_parquet(os.path.join(single_user_events_dir, "events.parquet"))
    e1 = ev[ev["user_id"] == 1].sort_values("ts")
    gaps = e1["ts"].diff().dt.total_seconds().to_numpy()[1:]
    n_sessions = 1 + int((gaps > 30 * 60).sum())
    got = out[out["user_id"] == 1]
    assert len(got) == n_sessions


def _asof_frame(ds_or_df):
    df = ds_or_df if isinstance(ds_or_df, pd.DataFrame) else ds_or_df.to_pandas()
    return df.sort_values("event_id").reset_index(drop=True)


def test_asof_range_partitioned_equals_user_keyed(
    single_user_events_dir, ray_session
):
    """The range-partition + boundary-stitch variant (the documented
    single-user-skew fallback, SCALE.md) produces row-identical results to
    the user-keyed exchange on the skewed corpus — with a bucket small
    enough that the hot user's history really splits across partitions."""
    from osmi_addresses_ray.pipelines import timeseries

    base = _asof_frame(
        timeseries.asof_pairs_ds(single_user_events_dir, num_parts=8)
    )
    # ~9-day corpus span; 24h buckets split user 1 across ~10 groups
    rp = _asof_frame(
        timeseries.asof_pairs_range_partitioned(
            single_user_events_dir, num_parts=8, bucket_hours=24
        )
    )
    pd.testing.assert_frame_equal(base, rp)
    assert len(rp) > 1000


def test_asof_range_partitioned_sf_corpus(ray_session):
    """Same equality on the driver's sf0.001 events table (many users,
    cross-bucket gaps, ties) at a 1-hour bucket to maximize stitching."""
    from osmi_addresses_ray.pipelines import timeseries

    sf = "/root/testdata/sf0.001"
    base = _asof_frame(timeseries.asof_pairs_ds(sf, num_parts=4))
    rp = _asof_frame(
        timeseries.asof_pairs_range_partitioned(sf, num_parts=4, bucket_hours=1)
    )
    pd.testing.assert_frame_equal(base, rp)


@pytest.fixture(scope="module")
def pre1970_events_dir(tmp_path_factory):
    """Timestamps straddling the epoch: ts // W buckets go NEGATIVE, which
    the stitch must bias out before packing (ADVICE timeseries.py:323)."""
    d = tmp_path_factory.mktemp("pre1970_events")
    n = 20_000
    rng = np.random.default_rng(23)
    base = np.datetime64("1969-12-25T00:00:00", "us")  # ~7 days pre-epoch
    user = rng.integers(1, 40, n).astype(np.int64)
    inc = rng.integers(1, 80_000_000, n)
    ts = base + np.cumsum(inc).astype("timedelta64[us]")
    etype = np.where(rng.random(n) < 0.5, "view", "click")
    pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": user,
            "event_type": etype,
            "value": rng.random(n),
            "props": "{}",
        }
    ).to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_asof_range_partitioned_pre1970_buckets(pre1970_events_dir, ray_session):
    """Negative buckets (pre-1970 ts) must not break the packed (user,
    bucket) stitch ordering — parity with the user-keyed path."""
    from osmi_addresses_ray.pipelines import timeseries

    base = _asof_frame(timeseries.asof_pairs_ds(pre1970_events_dir, num_parts=4))
    rp = _asof_frame(
        timeseries.asof_pairs_range_partitioned(
            pre1970_events_dir, num_parts=4, bucket_hours=24
        )
    )
    pd.testing.assert_frame_equal(base, rp)
    assert len(rp) > 100
