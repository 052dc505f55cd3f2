"""As-of join + session windows: semantics on a hand-built corpus with
deliberate edge cases (equal-ts ties, exact-gap boundaries, view-less
clicks), plus DuckDB oracle parity on the sf0.001 events table."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from osmi_addresses_ray.pipelines import timeseries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def micro_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute
    rows = [
        # user 1: view@0, view@5, click@5 (tie -> view@5 wins, prior-or-equal),
        # click@10, then a 31-min gap, click@41 (still joins view@5)
        (0, base + 0 * m, 1, "view", 1.0),
        (1, base + 5 * m, 1, "view", 2.0),
        (2, base + 5 * m, 1, "click", 3.0),
        (3, base + 10 * m, 1, "click", 4.0),
        (4, base + 41 * m, 1, "click", 5.0),
        # user 2: click with NO prior view (dropped by inner as-of);
        # two views at the SAME ts (max event_id wins)
        (5, base + 1 * m, 2, "click", 1.5),
        (6, base + 2 * m, 2, "view", 1.5),
        (7, base + 2 * m, 2, "view", 1.5),
        (8, base + 3 * m, 2, "click", 1.5),
        # user 3: events exactly 30 min apart (gap NOT strictly greater ->
        # one session), then 30 min + 1 us (new session)
        (9, base + 0 * m, 3, "view", 1.0),
        (10, base + 30 * m, 3, "view", 1.0),
        (11, base + 60 * m + np.timedelta64(1, "us"), 3, "view", 1.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_asof_semantics(micro_dir, ray_session):
    out = timeseries.asof_join_events(micro_dir, num_parts=2)
    got = {int(r.event_id): (int(r.view_event_id), int(r.lag_us)) for r in out.itertuples()}
    assert got[2] == (1, 0)  # tie at equal ts: prior-or-equal
    assert got[3] == (1, 5 * 60_000_000)
    assert got[4] == (1, 36 * 60_000_000)
    assert 5 not in got  # no prior view -> dropped (inner)
    assert got[8] == (7, 60_000_000)  # same-ts views -> max event_id


def test_session_semantics(micro_dir, ray_session):
    out = timeseries.session_windows(micro_dir, num_parts=2)
    u1 = out[out.user_id == 1]
    assert list(u1.session_id) == [1, 2]
    assert list(u1.n_events) == [4, 1]
    u3 = out[out.user_id == 3]
    # 30 min exactly = same session; 30 min + 1 us = new session
    assert list(u3.n_events) == [2, 1]
    assert u1.iloc[0].sum_value == pytest.approx(10.0)


@pytest.mark.parametrize("name", ["asof_click_view", "session_windows"])
def test_oracle_parity_sf0001(name, ray_session):
    import __ray_entry__ as entry

    got = entry.queries()[name](SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.execute(entry.oracle_sql()[name]).fetchdf()
    got = got.reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    assert list(got.columns) == list(want.columns)
    for c in got.columns:
        if got[c].dtype.kind == "f":
            assert np.allclose(got[c].to_numpy(), want[c].to_numpy(), atol=1e-9), c
        else:
            assert (got[c].to_numpy() == want[c].to_numpy()).all(), c


def test_sliding_window_semantics(micro_dir, ray_session):
    out = timeseries.sliding_window_counts(micro_dir, window_minutes=30, num_parts=2)
    got = {int(r.event_id): (int(r.n_window), float(r.sum_window)) for r in out.itertuples()}
    # user 1: frame is closed [ts-30m, ts]; equal-ts peers count
    assert got[0] == (1, 1.0)
    assert got[1] == (3, 6.0)  # view@0 + both @5 (peer included)
    assert got[2] == (3, 6.0)  # same frame as its peer
    assert got[3] == (4, 10.0)
    assert got[4] == (1, 5.0)  # 31 min since previous -> alone
    # user 3: event at EXACTLY ts-30m is inside the closed frame
    assert got[10] == (2, 2.0)
    # +1us past the boundary falls out
    assert got[11] == (1, 1.0)
    assert len(out) == 12  # one row per event, users never mix


def test_sliding_window_overflow_guard(tmp_path, ray_session):
    # a span so large that users x span cannot embed -> explicit error
    base = np.datetime64("2024-01-01", "us")
    huge = np.timedelta64(2**62, "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": [base, base + huge, base, base + huge],
            "user_id": np.array([1, 1, 2, 2], dtype=np.int64),
            "event_type": ["view"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    with pytest.raises(Exception, match="overflows|embedding"):
        timeseries.sliding_window_counts(str(tmp_path), num_parts=1)


def test_range_join_bucket_collision_no_double_count(tmp_path, ray_session):
    # window crosses a bucket boundary AND all buckets share one partition
    # (num_parts=1): replica clipping must keep fragments disjoint
    base = np.datetime64("2024-01-01T00:00:00", "us")
    day = np.timedelta64(86_400_000_000, "us")
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], dtype=np.int64),
            "o_custkey": np.array([1, 1, 1], dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [1.0] * 3,
            # order 1 spans the day-8 bucket edge; order 3 has no shipments
            "o_orderdate": [base + 5 * day, base + 16 * day, base + 400 * day],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    ship = [base + i * day for i in [5, 6, 7, 8, 9, 11, 16, 22, 23]]
    lineitem = pd.DataFrame(
        {
            "l_orderkey": np.arange(len(ship), dtype=np.int64),
            "l_partkey": np.zeros(len(ship), dtype=np.int64),
            "l_suppkey": np.zeros(len(ship), dtype=np.int64),
            "l_linenumber": np.ones(len(ship), dtype=np.int32),
            "l_quantity": np.arange(1.0, len(ship) + 1),
            "l_extendedprice": np.ones(len(ship)),
            "l_discount": np.zeros(len(ship)),
            "l_tax": np.zeros(len(ship)),
            "l_returnflag": ["N"] * len(ship),
            "l_linestatus": ["O"] * len(ship),
            "l_shipdate": ship,
        }
    )
    orders.to_parquet(os.path.join(tmp_path, "orders.parquet"), index=False)
    lineitem.to_parquet(os.path.join(tmp_path, "lineitem.parquet"), index=False)
    out = timeseries.range_join_shipments(str(tmp_path), days=7, num_parts=1)
    got = {int(r.o_orderkey): (int(r.n_shipments), float(r.sum_qty)) for r in out.itertuples()}
    # order 1: days 5..11 (closed-open +7) -> ships at 5,6,7,8,9,11 = qty 1..5,6th=6
    assert got[1] == (6, 1 + 2 + 3 + 4 + 5 + 6)
    # order 2: days 16..22 -> ships at 16 (qty 7) and 22 (qty 8)
    assert got[2] == (2, 7 + 8)
    assert got[3] == (0, 0.0)  # LEFT semantics: zero-shipment order kept
    # same answer at higher parallelism
    out4 = timeseries.range_join_shipments(str(tmp_path), days=7, num_parts=4)
    pd.testing.assert_frame_equal(out, out4)


def test_running_totals_negative_values_and_bucket_boundaries(tmp_path):
    """Negative cents make the in-bucket cumsum non-monotone (the bucket
    total must be the LAST row's cumulative, not the max), and rows exactly
    on the hour boundary belong to the next bucket."""
    import numpy as np
    import pandas as pd

    ts = pd.to_datetime(
        [
            "2024-01-01 00:10", "2024-01-01 00:50",  # bucket 0
            "2024-01-01 01:00",                        # boundary -> bucket 1
            "2024-01-01 01:30", "2024-01-01 02:59",
        ]
    ).astype("datetime64[us]")
    ev = pd.DataFrame(
        {
            "event_id": np.array([5, 1, 2, 3, 4], dtype=np.int64),
            "user_id": np.ones(5, dtype=np.int64),
            "event_type": ["x"] * 5,
            "ts": ts,
            "value": [10.0, -25.0, 3.5, -0.005, 2.0],
        }
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)
    from osmi_addresses_ray.pipelines.timeseries import running_totals

    out = running_totals(str(tmp_path)).set_index("event_id")
    # time order: e5(1000c), e1(-2500c), e2(350c), e3(floor(-0.5+0.5)=0c), e4(200c)
    assert out.loc[5, "running_cents"] == 1000
    assert out.loc[1, "running_cents"] == -1500
    assert out.loc[2, "running_cents"] == -1150
    assert out.loc[3, "running_cents"] == -1150
    assert out.loc[4, "running_cents"] == -950
    assert out["running_n"].sort_values().tolist() == [1, 2, 3, 4, 5]


def test_streaming_watermark_late_accounting(tmp_path):
    """Hand-built stream: arrival order is the hash permutation, so compute
    it explicitly and check the late flags against a scalar replay."""
    import numpy as np
    import pandas as pd

    ids = np.arange(8, dtype=np.int64)
    ts = pd.to_datetime(
        [
            "2024-01-01 00:05", "2024-01-01 02:00", "2024-01-01 00:10",
            "2024-01-01 03:00", "2024-01-01 00:20", "2024-01-01 02:30",
            "2024-01-01 00:40", "2024-01-01 03:10",
        ]
    ).astype("datetime64[us]")
    ev = pd.DataFrame(
        {"event_id": ids, "user_id": ids % 2, "event_type": ["x"] * 8, "ts": ts,
         "value": np.ones(8)}
    )
    ev.to_parquet(tmp_path / "events.parquet", index=False)

    from osmi_addresses_ray.pipelines.timeseries import streaming_watermark_counts

    out = streaming_watermark_counts(str(tmp_path))

    # scalar replay in the same arrival order
    arrival = ((ids % 2147483648) * 2654435761) % 4294967296
    order = np.argsort(arrival)
    wm = None
    late_by_window = {}
    n_by_window = {}
    for i in order:
        w = ts[i].floor("h")
        n_by_window[w] = n_by_window.get(w, 0) + 1
        if wm is not None and ts[i] < wm - pd.Timedelta(minutes=30):
            late_by_window[w] = late_by_window.get(w, 0) + 1
        wm = ts[i] if wm is None else max(wm, ts[i])
    got = out.set_index("window_start")
    for w, n in n_by_window.items():
        assert got.loc[w, "n_events"] == n
        assert got.loc[w, "n_late"] == late_by_window.get(w, 0)
    assert out["n_late"].sum() > 0  # the fixture genuinely exercises lateness


@pytest.fixture(scope="module")
def funnel_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("funnel_events")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")
    day = np.timedelta64(86_400_000_000, "us")
    rows = [
        # user 1: full conversion view@0 -> click@5 -> purchase@10
        (0, base + 0 * m, 1, "view", 1.0),
        (1, base + 5 * m, 1, "click", 2.0),
        (2, base + 10 * m, 1, "purchase", 3.0),
        # user 2: click BEFORE first view (must not count), then no click after
        (3, base + 0 * m, 2, "click", 1.0),
        (4, base + 5 * m, 2, "view", 1.0),
        # user 3: click at the SAME ts as the first view (strict > drops it)
        (5, base + 0 * m, 3, "view", 1.0),
        (6, base + 0 * m, 3, "click", 1.0),
        # user 4: purchase only — no view, contributes to no stage
        (7, base + 0 * m, 4, "purchase", 9.0),
        # user 1 second day: retention offset 1 (two events same day dedup)
        (8, base + day + 1 * m, 1, "view", 1.0),
        (9, base + day + 2 * m, 1, "error", 1.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_funnel_strict_ordering(funnel_dir, ray_session):
    out = timeseries.funnel_stage_counts(funnel_dir)
    by = dict(zip(out["stage"], out["n_users"]))
    assert by["1_view"] == 3      # users 1, 2, 3
    assert by["2_click"] == 1     # only user 1 clicks strictly after the view
    assert by["3_purchase"] == 1  # only user 1


def test_retention_offsets_and_day_dedup(funnel_dir, ray_session):
    out = timeseries.retention_cohorts(funnel_dir)
    # all users' first events are on day 0 -> one cohort
    assert out["cohort_day"].nunique() == 1
    by = dict(zip(out["day_offset"], out["n_users"]))
    assert by[0] == 4            # every user active on the cohort day
    assert by[1] == 1            # user 1 returns next day (2 events -> 1 row)


def test_moving_avg_clips_at_user_start(funnel_dir, ray_session):
    out = timeseries.moving_avg_user(funnel_dir)
    u1 = out[out["user_id"] == 1].sort_values("event_id")
    # all 5 user-1 events count (type-agnostic): values 1,2,3 then next-day 1,1
    # windows: [1], [1,2], [1,2,3], [2,3,1], [3,1,1]
    assert list(u1["mov_avg"]) == [1.0, 1.5, 2.0, 2.0, round(5 / 3, 6)]
    # equal-ts tie (user 3): event 5 (view) before event 6 (click) by event_id
    u3 = out[out["user_id"] == 3].sort_values("event_id")
    assert list(u3["mov_avg"]) == [1.0, 1.0]


def test_cooccurrence_requires_both_types(funnel_dir, ray_session):
    out = timeseries.event_type_cooccurrence(funnel_dir)
    pairs = set(zip(out["type_a"], out["type_b"]))
    # user 4 has only 'purchase' -> contributes nothing
    assert ("purchase", "view") not in pairs or out.set_index(
        ["type_a", "type_b"]
    ).loc[("purchase", "view"), "n_users"] == 1
    # user 1 spans view/click/purchase/error -> all 6 pairs present with n>=1
    assert ("click", "view") in pairs and ("click", "purchase") in pairs
    got = out.set_index(["type_a", "type_b"])["n_users"]
    assert got.loc[("click", "view")] == 3  # users 1, 2 and 3 all have both types


def test_session_paths_order_and_gap_edges(tmp_path):
    """Equal-ts ties order by event_id; an exactly-30-min gap stays in one
    session (strictly-greater rule); path strings follow (ts, event_id)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import session_paths

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # user 1: tie on ts → event_id order; then exactly 30 min → SAME session
        (10, base, 1, "b"),
        (11, base, 1, "a"),
        (12, base + pd.Timedelta(minutes=30), 1, "c"),
        # 30 min + 1 us → NEW session
        (13, base + pd.Timedelta(minutes=60, microseconds=1), 1, "d"),
        # user 2: single event
        (20, base, 2, "x"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["value"] = 1.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = session_paths(str(tmp_path), num_parts=2)
    got = {(int(r.user_id), int(r.session_id)): (r.path, int(r.n_events))
           for r in out.itertuples()}
    assert got == {
        (1, 1): ("b>a>c", 3),
        (1, 2): ("d", 1),
        (2, 1): ("x", 1),
    }


def test_resample_locf_semantics(tmp_path, ray_session):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import resample_locf

    base = pd.Timestamp("2024-01-01 03:30:00")
    rows = [
        # user 0: first event 03:30 -> grid starts at 04:00 (ceil-hour, no
        # NULL fill); tie at 05:10 resolves to highest event_id (value 9.0)
        (1, base, 0, 1.0),
        (2, pd.Timestamp("2024-01-01 05:10:00"), 0, 2.0),
        (3, pd.Timestamp("2024-01-01 05:10:00"), 0, 9.0),
        (4, pd.Timestamp("2024-01-01 07:00:00"), 0, 4.0),
        # user 31: all events inside one partial hour -> empty grid, no rows
        (5, pd.Timestamp("2024-01-02 03:10:00"), 31, 1.0),
        (6, pd.Timestamp("2024-01-02 03:50:00"), 31, 2.0),
        # user 7: not selected by user_mod
        (7, base, 7, 1.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    df["event_type"] = "view"
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = resample_locf(str(tmp_path), user_mod=31, num_parts=2)
    assert out.user_id.unique().tolist() == [0]
    got = {str(r.gt): r.value for r in out.itertuples()}
    assert got == {
        "2024-01-01 04:00:00": 1.0,
        "2024-01-01 05:00:00": 1.0,
        "2024-01-01 06:00:00": 9.0,  # tie -> max event_id carried forward
        "2024-01-01 07:00:00": 4.0,  # event exactly on the grid instant
    }


def test_resample_lerp_semantics(tmp_path, ray_session):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import resample_lerp

    rows = [
        # user 0: events 03:30 (v=1), 05:10 tie (v=2 then v=10 by event_id),
        # 06:00 exactly on the hour (v=4)
        (1, pd.Timestamp("2024-01-01 03:30:00"), 0, 1.0),
        (2, pd.Timestamp("2024-01-01 05:10:00"), 0, 2.0),
        (3, pd.Timestamp("2024-01-01 05:10:00"), 0, 10.0),
        (4, pd.Timestamp("2024-01-01 06:00:00"), 0, 4.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    df["event_type"] = "view"
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = resample_lerp(str(tmp_path), user_mod=31, num_parts=2)
    got = {str(r.gt): r.value for r in out.itertuples()}
    # 04:00 is 30/100 min between 03:30 (1.0) and 05:10 (10.0 — tie -> max
    # event_id); 05:00 is 90/100 min along; 06:00 is exactly on an event
    f04 = 1.0 + (10.0 - 1.0) * (1_800_000_000 / 6_000_000_000)
    f05 = 1.0 + (10.0 - 1.0) * (5_400_000_000 / 6_000_000_000)
    assert got == {
        "2024-01-01 04:00:00": f04,
        "2024-01-01 05:00:00": f05,
        "2024-01-01 06:00:00": 4.0,
    }


def test_interval_coverage_islands(tmp_path, ray_session):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import interval_coverage

    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: events at 0 and 5 overlap (one island, 15 min);
        # event at 10:00+10min EXACTLY abuts the island end (merges);
        # event at 40 starts a new island
        (1, base, 1),
        (2, base + 5 * m, 1),
        (3, base + 15 * m, 1),  # starts exactly at island end -> merges
        (4, base + 40 * m, 1),
        # user 2: one event
        (5, base, 2),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    df["event_type"] = "view"
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = interval_coverage(str(tmp_path), num_parts=2).set_index("user_id")
    assert out.loc[1, "n_islands"] == 2
    assert out.loc[1, "covered_us"] == (25 + 10) * 60_000_000
    assert out.loc[2, "n_islands"] == 1
    assert out.loc[2, "covered_us"] == 10 * 60_000_000


def test_event_transitions_order_and_user_boundaries(tmp_path, ray_session):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import event_transitions

    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: a -> b -> b; tie at equal ts resolves by event_id (b
        # before c since eid 3 < 4): a->b, b->b ... wait order is ts then
        # eid: (a,0), (b,1), (b,2@t2 eid3), (c,2@t2 eid4): a->b, b->b, b->c
        (1, base, 1, "a"),
        (2, base + m, 1, "b"),
        (3, base + 2 * m, 1, "b"),
        (4, base + 2 * m, 1, "c"),
        # user 2: single event -> no transitions; boundary to user 1 must
        # NOT create a cross-user pair
        (5, base, 2, "z"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = event_transitions(str(tmp_path), num_parts=2)
    got = {(r.from_type, r.to_type): (r.n, r.prob) for r in out.itertuples()}
    assert got == {("a", "b"): (1, 1.0), ("b", "b"): (1, 0.5), ("b", "c"): (1, 0.5)}


def test_ema_truncation_and_user_isolation(tmp_path, ray_session):
    """34 constant-value events for user 1 (EMA of a constant is the
    constant at EVERY step — truncation must not bias it) and one event for
    user 2 right between them in time (must not leak into user 1's window)."""
    import numpy as np
    import pandas as pd

    from osmi_addresses_ray.pipelines.timeseries import ema_user_value

    n = 34
    rows = []
    for i in range(n):
        rows.append((i + 1, pd.Timestamp("2024-01-01") + pd.Timedelta(minutes=i),
                     1, "a", 7.0))
    rows.append((1000, pd.Timestamp("2024-01-01 00:10:30"), 2, "a", 999.0))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)

    out = ema_user_value(str(tmp_path), num_parts=3)
    u1 = out[out.user_id == 1]
    assert len(u1) == n
    assert np.allclose(u1.ema.to_numpy(), 700.0)  # constant in → constant out
    # window saturates at 32 terms: den constant from the 32nd event on
    assert u1.den.iloc[31] == u1.den.iloc[33] == (1 << 32) - 1
    assert u1.den.iloc[0] == 1 << 31
    u2 = out[out.user_id == 2]
    assert len(u2) == 1 and u2.ema.iloc[0] == 99900.0


def test_ema_weights_recent_heavier(tmp_path, ray_session):
    """A jump from 0 to 100 puts the EMA above 50 immediately after the
    jump (recent terms dominate a dyadic ladder)."""
    import pandas as pd

    from osmi_addresses_ray.pipelines.timeseries import ema_user_value

    vals = [0.0] * 10 + [100.0]
    rows = [(i + 1, pd.Timestamp("2024-01-01") + pd.Timedelta(hours=i), 5, "a", v)
            for i, v in enumerate(vals)]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = ema_user_value(str(tmp_path), num_parts=2)
    assert out.ema.iloc[-1] > 5000  # > half the jump, in cents
    assert out.ema.iloc[-2] == 0.0


def test_cusum_changepoint_planted_shift(tmp_path):
    """A level shift at hour 6 of a 12-hour series must be the argmax; a
    constant series scores 0 everywhere and ties to the EARLIEST hour."""
    base = np.datetime64("2024-03-01T00:00:00", "us")
    hr = np.timedelta64(3_600_000_000, "us")
    rows = []
    eid = 0
    # type A: 2/hour for hours 0..5, then 8/hour for hours 6..11
    for h in range(12):
        for _ in range(2 if h < 6 else 8):
            rows.append((eid, 1, "A", base + h * hr, 0.0, "{}"))
            eid += 1
    # type B: constant 3/hour over 4 hours -> score 0, cp = first hour
    for h in range(4):
        for _ in range(3):
            rows.append((eid, 2, "B", base + h * hr, 0.0, "{}"))
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts", "value", "props"]
    )
    df.to_parquet(tmp_path / "events.parquet", index=False)
    out = timeseries.cusum_changepoints(str(tmp_path))
    a = out[out.event_type == "A"].iloc[0]
    # prefix at k=6 (end of the low regime): P=12, m=12, X=60 -> |12*12-6*60|=216
    assert a.cp_hr == pd.Timestamp("2024-03-01T05:00:00")
    assert a.score == 216 and a.n_hours == 12 and a.n_events == 60
    b = out[out.event_type == "B"].iloc[0]
    assert b.score == 0 and b.cp_hr == pd.Timestamp("2024-03-01T00:00:00")


def test_cusum_matches_duckdb_on_sf(tmp_path):
    import __ray_entry__ as entry

    out = timeseries.cusum_changepoints(SF).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    want = con.execute(entry.oracle_sql()["cusum_changepoints"]).df()
    got = out.copy()
    want["cp_hr"] = want["cp_hr"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(
        got, want.astype({"score": "int64", "n_hours": "int64", "n_events": "int64"})
    )


def test_scd2_run_compaction_and_open_intervals(tmp_path, ray_session):
    """SCD-2 semantics: consecutive same-type runs collapse; a type that
    REAPPEARS after a different run opens a NEW interval (no global merge);
    each user's final run has valid_to NULL; equal-ts ties order by
    event_id; users never share a run across the partition key."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import scd2_intervals

    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        # user 1: a a b a  -> intervals a[0,2) x2, b[2,3) x1, a[3,NULL) x1
        (1, base + 0 * m, 1, "a"),
        (2, base + 1 * m, 1, "a"),
        (3, base + 2 * m, 1, "b"),
        (4, base + 3 * m, 1, "a"),
        # user 2: tie at t0 -> eid order makes the run x,y (two intervals);
        # single trailing run stays open
        (5, base + 0 * m, 2, "x"),
        (6, base + 0 * m, 2, "y"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = scd2_intervals(str(tmp_path), num_parts=2)
    got = [
        (int(r.user_id), r.event_type, r.valid_from, r.valid_to, int(r.n_events))
        for r in out.itertuples()
    ]
    NaT = pd.NaT
    assert got == [
        (1, "a", base + 0 * m, base + 2 * m, 2),
        (1, "b", base + 2 * m, base + 3 * m, 1),
        (1, "a", base + 3 * m, NaT, 1),
        (2, "x", base + 0 * m, base + 0 * m, 1),
        (2, "y", base + 0 * m, NaT, 1),
    ]


def test_ols_trend_planted_line_and_degenerate_group(tmp_path, ray_session):
    """A perfect line recovers its exact slope/intercept (cents per hour);
    a group with a single distinct hour has den = 0 and takes the
    slope-0.0 path; sufficient stats are exact integers."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import ols_trend

    base = pd.Timestamp("2024-01-01 00:30:00")
    h = pd.Timedelta(hours=1)
    rows = [
        # line: cents = 300*x + 700 at x = 0, 1, 2
        (1, base + 0 * h, 1, "line", 7.00),
        (2, base + 1 * h, 1, "line", 10.00),
        (3, base + 2 * h, 1, "line", 13.00),
        # flat: both events inside hour x=5 -> den = 0
        (4, base + 5 * h, 2, "flat", 1.00),
        (5, base + 5 * h, 2, "flat", 3.00),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = ols_trend(str(tmp_path)).set_index("event_type")
    ln = out.loc["line"]
    assert (ln.n, ln.sx, ln.sy, ln.sxy, ln.sxx) == (3, 3, 3000, 3600, 5)
    assert ln.slope == 300.0 and ln.intercept == 700.0
    fl = out.loc["flat"]
    assert fl.slope == 0.0 and fl.n == 2 and fl.sx == 10


def test_dtw_pairs_warping_and_topk(tmp_path, ray_session):
    """A one-hour-shifted copy of a spiky profile is DTW-near (warping
    absorbs the shift) while a flat profile is DTW-far; only the top-k
    most active users enter the sweep."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import _dtw_batch, dtw_pairs

    # kernel: shift-by-one of a spike train warps to cost = edge residuals
    a = np.array([0, 10, 0, 10, 0, 10, 0, 0], np.int64)[None, :]
    b = np.array([10, 0, 10, 0, 10, 0, 0, 0], np.int64)[None, :]
    assert _dtw_batch(a, b)[0] <= 10  # warped alignment, not 60 (euclid)
    assert _dtw_batch(a, a.copy())[0] == 0

    base = pd.Timestamp("2024-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    rows = []
    eid = 0
    # user 1: 3 events at hour 2; user 2: 3 events at hour 3 (shifted copy)
    # user 3: one event each at hours 0, 8, 16 (flat-ish)
    for hh, uid, cnt in ((2, 1, 3), (3, 2, 3)):
        for c in range(cnt):
            rows.append((eid, base + hh * h, uid, "view", 1.0)); eid += 1
    for hh in (0, 8, 16):
        rows.append((eid, base + hh * h, 3, "view", 1.0)); eid += 1
    # user 99: a single event -> least active, cut by top_k=3
    rows.append((eid, base, 99, "view", 1.0)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = dtw_pairs(str(tmp_path), top_k=3)
    got = {(int(r.user_a), int(r.user_b)): int(r.dtw) for r in out.itertuples()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}  # user 99 cut
    # shifted spike warps to 0 extra cost beyond the boundary cells
    assert got[(1, 2)] == 0
    # spiky vs spread-out profile is strictly farther
    assert got[(1, 3)] > got[(1, 2)]


def test_throttle_chains_off_emitted_not_previous(tmp_path, ray_session):
    """The distinguishing case vs lag-based gaps: events at t=0, 6, 12, 24
    minutes with a 10-min throttle. Lag-gaps would emit 0 and 24 only
    (every other gap < 10); throttling emits 0, 12 (>= 0+10), 24 (>= 12+10)
    — suppression windows chain off EMITTED events. Equal-ts burst at the
    head emits exactly the min event_id; types are isolated."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import throttle_events

    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        (1, base + 0 * m, 1, "a"),
        (2, base + 6 * m, 1, "a"),
        (3, base + 12 * m, 1, "a"),
        (4, base + 24 * m, 1, "a"),
        # burst at one instant for type b: only eid 5 emits
        (5, base, 1, "b"),
        (6, base, 1, "b"),
        (7, base, 1, "b"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = throttle_events(str(tmp_path), num_parts=2)
    got = [(r.event_type, int(r.event_id), int(r.n_suppressed))
           for r in out.itertuples()]
    assert got == [("a", 1, 1), ("a", 3, 0), ("a", 4, 0), ("b", 5, 2)]


def test_conversion_lag_quantiles_exact_order_stats(tmp_path, ray_session):
    """Four converted clicks with lags 10, 20, 30, 40 minutes: the
    ceil(p*n)-1 convention gives p25=10m, p50=20m, p75=30m, p90=40m; a
    view-less click contributes nothing."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from osmi_addresses_ray.pipelines.timeseries import conversion_lag_quantiles

    base = pd.Timestamp("2024-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [(1, base, 1, "view")]
    eid = 2
    for lag in (10, 20, 30, 40):
        rows.append((eid, base + lag * m, 1, "click")); eid += 1
    rows.append((99, base, 2, "click"))  # user 2: no prior view
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    df["value"] = 0.0
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = conversion_lag_quantiles(str(tmp_path), num_parts=2).iloc[0]
    M = 60_000_000
    assert (out.n, out.p25, out.p50, out.p75, out.p90, out.max_lag) == (
        4, 10 * M, 20 * M, 30 * M, 40 * M, 40 * M
    )


def test_sliding_distinct_users_planted(tmp_path, ray_session):
    """Boundary semantics: an event at exactly k*H is counted at checkpoint
    k (ts <= h) through k + window - 1 (h < ts + W); merged per-user
    intervals contribute 0-or-1 regardless of event density."""
    H = np.timedelta64(3_600_000_000, "us")
    base = np.datetime64("2024-03-01T00:00:00", "us")  # exactly on an hour
    rows = [
        (0, base, 1, "a", 1.0),                       # boundary event
        (1, base + np.timedelta64(30, "m"), 1, "a", 1.0),  # same user, overlapping
        (2, base + np.timedelta64(90, "m"), 2, "a", 1.0),  # second user
        (3, base + 40 * H, 3, "a", 1.0),              # isolated late user
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = timeseries.sliding_distinct_users(str(tmp_path), num_parts=3)
    # brute force over the same domain
    ts_us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    Hus, W = 3_600_000_000, 24 * 3_600_000_000
    klo = -(-ts_us.min() // Hus)
    khi = ts_us.max() // Hus
    want = {
        k: len({u for u, t in zip(df["user_id"], ts_us) if t <= k * Hus < t + W})
        for k in range(klo, khi + 1)
    }
    got = dict(zip(out["hour_ts"].astype("int64") // Hus, out["n_active"]))
    assert got == want
    # user 1's two events merge into ONE interval: count at hour 1 is 2 users? no —
    # user 2 starts at minute 90 -> first checkpoint hour 2
    assert got[klo] == 1 and got[klo + 2] == 2
    # distinctness survives any partitioning
    out1 = timeseries.sliding_distinct_users(str(tmp_path), num_parts=1)
    assert out1.equals(out)


def test_sliding_distinct_users_subhour_empty(tmp_path, ray_session):
    """A corpus spanning no hour boundary has no checkpoints -> empty."""
    base = np.datetime64("2024-03-01T00:10:00", "us")
    df = pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": [base, base + np.timedelta64(5, "m")],
            "user_id": [1, 2],
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = timeseries.sliding_distinct_users(str(tmp_path), num_parts=2)
    assert out.empty and list(out.columns) == ["hour_ts", "n_active"]


def test_sliding_distinct_users_sentinel_cancellation(tmp_path, ray_session):
    """Regression for the round-3 sf0.1 wrong-answer: one user's coverage
    START (+1 at k_lo past the last full hour) canceling another user's
    coverage END (-1) at the same k inside one partition produced a GENUINE
    delta==0 bin beyond floor(max_ts/H), which the driver misread as the
    domain sentinel and emitted one extra hour row. With window=2h:
    user A @0.5h -> deltas +1@1,-1@3; user B @2.3h -> +1@3,-1@5; the k=3
    bin cancels to 0 while the true domain is [1, 2]."""
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": [base + np.timedelta64(30, "m"), base + np.timedelta64(138, "m")],
            "user_id": [1, 2],
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    Hus = 3_600_000_000
    base_us = df["ts"].astype("datetime64[us]").astype("int64").min() - 30 * 60_000_000
    for parts in (1, 3):  # 1 forces both users into the same partition
        out = timeseries.sliding_distinct_users(
            str(tmp_path), window_hours=2, num_parts=parts
        )
        hours = (out["hour_ts"].astype("int64") - base_us) // Hus
        assert list(hours) == [1, 2], f"extra/missing hour rows at parts={parts}"
        assert list(out["n_active"]) == [1, 1]


def test_km_survival_planted(tmp_path, ray_session):
    """Closed-form KM on planted lifetimes; censor boundary is STRICT
    (last event exactly at gmax - 7d stays censored)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    day = np.timedelta64(24, "h")
    rows = []
    eid = 0
    def user(uid, start, hours):
        nonlocal eid
        rows.append((eid, start, uid, "a", 1.0)); eid += 1
        rows.append((eid, start + hours * h, uid, "a", 1.0)); eid += 1
    # gmax anchored by user 99 at base+40d
    user(99, base + 40 * day, 0)           # lifetime 0, censored (last == gmax)
    user(1, base, 5)                       # dies at t=5
    user(2, base, 5)                       # dies at t=5
    user(3, base, 10)                      # dies at t=10
    user(4, base + 39 * day, 24)           # last within 7d of gmax -> censored, t=24
    user(5, base + 33 * day, 0)            # last EXACTLY at horizon -> censored (strict <)
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = timeseries.km_survival(str(tmp_path), num_parts=2)
    # deaths at t=5 (n=2, risk=6: users 1,2,3,4 have t>=5? t values: 0,5,5,10,24,0 ->
    # risk at 5 = {1,2,3,4}=4), then t=10 (risk = {3,4}=2, d=1)
    assert out["t_hours"].tolist() == [5, 10]
    assert out["n_risk"].tolist() == [4, 2]
    assert out["n_deaths"].tolist() == [2, 1]
    s1 = 10**9 * 2 // 4
    s2 = s1 * 1 // 2
    assert out["survival_e9"].tolist() == [s1, s2]


def test_km_survival_all_censored(tmp_path, ray_session):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": [0, 1],
            "ts": [base, base + np.timedelta64(1, "h")],
            "user_id": [1, 2],
            "event_type": ["a", "a"],
            "value": [1.0, 1.0],
            "props": ["{}", "{}"],
        }
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    out = timeseries.km_survival(str(tmp_path), num_parts=1)
    assert out.empty


# --- Allen interval algebra ---------------------------------------------------


def _write_events(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value"])
    df["props"] = "{}"
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)


def test_allen_interval_mix_planted(tmp_path, ray_session):
    """One user per relation family; spans are [first, last] per type."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows, eid = [], 0

    def span(uid, typ, lo, hi):
        nonlocal eid
        rows.append((eid, base + lo * h, uid, typ, 1.0)); eid += 1
        if hi != lo:
            rows.append((eid, base + hi * h, uid, typ, 1.0)); eid += 1

    span(1, "a", 0, 2); span(1, "b", 5, 8)     # before
    span(2, "a", 0, 5); span(2, "b", 5, 8)     # meets
    span(3, "a", 0, 6); span(3, "b", 5, 8)     # overlaps
    span(4, "a", 5, 6); span(4, "b", 5, 8)     # starts
    span(5, "a", 6, 7); span(5, "b", 5, 8)     # during
    span(6, "a", 6, 8); span(6, "b", 5, 8)     # finishes
    span(7, "a", 5, 8); span(7, "b", 5, 8)     # equals
    span(8, "b", 0, 2); span(8, "a", 5, 8)     # after (a vs b)
    span(9, "b", 0, 5); span(9, "a", 5, 8)     # met_by
    span(10, "a", 4, 9); span(10, "b", 5, 8)   # contains
    span(11, "a", 5, 9); span(11, "b", 5, 8)   # started_by
    span(12, "a", 4, 8); span(12, "b", 5, 8)   # finished_by
    span(13, "b", 4, 6); span(13, "a", 5, 8)   # overlapped_by
    _write_events(tmp_path, rows)
    out = timeseries.allen_interval_mix(str(tmp_path), num_parts=3)
    got = dict(zip(out["relation"], out["n_pairs"]))
    assert (out["type_a"] == "a").all() and (out["type_b"] == "b").all()
    assert got == {r: 1 for r in [
        "before", "meets", "overlaps", "starts", "during", "finishes",
        "equals", "after", "met_by", "contains", "started_by",
        "finished_by", "overlapped_by"]}


def test_allen_interval_mix_point_intervals(tmp_path, ray_session):
    """Single-event types are point intervals; the ladder still totals:
    a point at the other span's start hits the e1==s2 rung FIRST ->
    'meets' (not 'starts'), point == point -> equals, point strictly
    inside -> during. The SQL CASE walks the same order."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows = [
        (0, base + 5 * h, 1, "a", 1.0),               # point [5,5]
        (1, base + 5 * h, 1, "b", 1.0),
        (2, base + 8 * h, 1, "b", 1.0),               # b = [5,8] -> a meets b
        (3, base + 3 * h, 2, "a", 1.0),               # point [3,3]
        (4, base + 3 * h, 2, "b", 1.0),               # point [3,3] -> equals
        (5, base + 4 * h, 3, "a", 1.0),               # point [4,4]
        (6, base + 3 * h, 3, "b", 1.0),
        (7, base + 6 * h, 3, "b", 1.0),               # b=[3,6] -> a during b
    ]
    _write_events(tmp_path, rows)
    out = timeseries.allen_interval_mix(str(tmp_path), num_parts=2)
    got = dict(zip(out["relation"], out["n_pairs"]))
    assert got == {"meets": 1, "equals": 1, "during": 1}


def test_allen_interval_mix_single_type_user(tmp_path, ray_session):
    """A user with one event type emits no pairs; empty corpus -> typed empty."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    rows = [(0, base, 1, "a", 1.0), (1, base + np.timedelta64(1, "h"), 1, "a", 1.0)]
    _write_events(tmp_path, rows)
    out = timeseries.allen_interval_mix(str(tmp_path), num_parts=2)
    assert out.empty and list(out.columns) == ["type_a", "type_b", "relation", "n_pairs"]


# --- cross-correlation between top-2 event types -------------------------------


def test_xcorr_types_planted(tmp_path, ray_session):
    """Two types over a 4-hour grid: a = [2,0,1,0], b = [0,3,0,1] (b leads
    nothing; a at t correlates with b at t+1). Hand-checked stats at lags
    0 and 1."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows, eid = [], 0
    for t, cnt in [(0, 2), (2, 1)]:
        for _ in range(cnt):
            rows.append((eid, base + t * h, 1, "a", 1.0)); eid += 1
    for t, cnt in [(1, 3), (3, 1)]:
        for _ in range(cnt):
            rows.append((eid, base + t * h, 1, "b", 1.0)); eid += 1
    _write_events(tmp_path, rows)
    out = timeseries.xcorr_types(str(tmp_path), max_lag=2)
    assert list(out["lag"]) == [0, 1, 2]
    # top-2 by volume: b has 4 events, a has 3 -> type_a = b, type_b = a
    assert (out["type_a"] == "b").all() and (out["type_b"] == "a").all()
    x = np.array([0, 3, 0, 1])   # series of type_a = b
    y = np.array([2, 0, 1, 0])   # series of type_b = a
    for _, r in out.iterrows():
        k = int(r["lag"])
        xs, ys = x[: len(x) - k], y[k:]
        assert r["n"] == len(xs)
        assert r["sxy"] == int(xs @ ys)
        assert r["sx"] == int(xs.sum()) and r["sy"] == int(ys.sum())
        assert r["sxx"] == int(xs @ xs) and r["syy"] == int(ys @ ys)


def test_xcorr_types_single_type_empty(tmp_path, ray_session):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    _write_events(tmp_path, [(0, base, 1, "a", 1.0)])
    out = timeseries.xcorr_types(str(tmp_path))
    assert out.empty


def test_xcorr_types_volume_tie_breaks_by_name(tmp_path, ray_session):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows = [(0, base, 1, "z", 1.0), (1, base + h, 1, "m", 1.0)]
    _write_events(tmp_path, rows)
    out = timeseries.xcorr_types(str(tmp_path), max_lag=1)
    assert (out["type_a"] == "m").all() and (out["type_b"] == "z").all()


# --- periodicity detection ------------------------------------------------------


def test_periodicity_planted_period(tmp_path, ray_session):
    """A strict period-6 pulse train over 48 hours (spikes at t % 6 == 2)
    must fold best at p = 6 (or a multiple; 6 wins because 12/18/24 split
    the SAME energy over fewer cycles with equal ΣS² — key doubles with q,
    so the SMALLEST q... verify against the exhaustive scalar replay)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows, eid = [], 0
    for t in range(48):
        if t % 6 == 2:
            for _ in range(5):
                rows.append((eid, base + t * h, 1, "a", 1.0)); eid += 1
        else:
            rows.append((eid, base + t * h, 1, "a", 1.0)); eid += 1
    _write_events(tmp_path, rows)
    out = timeseries.periodicity_detect(str(tmp_path))
    # scalar replay
    x = np.array([5 if t % 6 == 2 else 1 for t in range(48)], dtype=np.int64)
    best = None
    for p in range(2, 25):
        q = len(x) // p
        if q < 2:
            continue
        s = x[: p * q].reshape(q, p).sum(axis=0)
        key = sum(int(v) ** 2 for v in s) * 1_000_000 // q
        if best is None or key > best[1]:
            best = (p, key)
    row = out.iloc[0]
    assert (row["best_p"], row["score_key"]) == best
    assert row["n_hours"] == 48
    assert row["best_p"] % 6 == 0  # a multiple of the planted period


def test_periodicity_short_series_skipped(tmp_path, ray_session):
    """m = 3 hours -> no period has 2 complete cycles -> type emits no row."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows = [(0, base, 1, "a", 1.0), (1, base + 2 * h, 1, "a", 1.0),
            (2, base, 1, "b", 1.0), (3, base + 9 * h, 1, "b", 1.0)]
    _write_events(tmp_path, rows)
    out = timeseries.periodicity_detect(str(tmp_path))
    assert list(out["event_type"]) == ["b"]


# --- Mann–Kendall -----------------------------------------------------------------


def test_mann_kendall_monotone_and_ties(tmp_path, ray_session):
    """Series a: counts [1,2,3,4] (strictly rising) -> S = 6, no ties.
    Series b: [2,1,1,2] -> hand-computed S and tie term."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows, eid = [], 0
    for t, c in enumerate([1, 2, 3, 4]):
        for _ in range(c):
            rows.append((eid, base + t * h, 1, "a", 1.0)); eid += 1
    for t, c in enumerate([2, 1, 1, 2]):
        for _ in range(c):
            rows.append((eid, base + t * h, 1, "b", 1.0)); eid += 1
    _write_events(tmp_path, rows)
    out = timeseries.mann_kendall(str(tmp_path))
    a = out[out["event_type"] == "a"].iloc[0]
    assert (a["n_hours"], a["s_stat"], a["tie_term"]) == (4, 6, 0)
    b = out[out["event_type"] == "b"].iloc[0]
    # pairs of [2,1,1,2]: (2,1)- (2,1)- (2,2)0 (1,1)0 (1,2)+ (1,2)+ -> S=0
    # ties: two groups of size 2 -> 2·(2·1·9) = 36
    assert (b["n_hours"], b["s_stat"], b["tie_term"]) == (4, 0, 36)


def test_mann_kendall_fenwick_matches_bruteforce(tmp_path, ray_session):
    rng = np.random.RandomState(3)
    counts = rng.randint(0, 5, 40)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows, eid = [], 0
    counts[0] = max(counts[0], 1)
    counts[-1] = max(counts[-1], 1)  # pin the series extent
    for t, c in enumerate(counts):
        for _ in range(int(c)):
            rows.append((eid, base + t * h, 1, "a", 1.0)); eid += 1
    _write_events(tmp_path, rows)
    out = timeseries.mann_kendall(str(tmp_path)).iloc[0]
    s = sum(
        int(np.sign(counts[j] - counts[i]))
        for i in range(len(counts)) for j in range(i + 1, len(counts))
    )
    assert out["s_stat"] == s and out["n_hours"] == 40


# --- Pettitt change point -----------------------------------------------------------


def test_pettitt_planted_level_shift(tmp_path, ray_session):
    """Counts [1,1,1,5,5,5]: the break is after index 2 (t_star = 2) with
    U = 3·3 = 9 (every cross pair is +1)."""
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows, eid = [], 0
    for t, c in enumerate([1, 1, 1, 5, 5, 5]):
        for _ in range(c):
            rows.append((eid, base + t * h, 1, "a", 1.0)); eid += 1
    _write_events(tmp_path, rows)
    out = timeseries.pettitt_changepoint(str(tmp_path)).iloc[0]
    assert (out["n_hours"], out["t_star"], out["u_stat"]) == (6, 2, 9)


def test_pettitt_matches_bruteforce_random(tmp_path, ray_session):
    rng = np.random.RandomState(11)
    counts = rng.randint(0, 6, 30)
    counts[0] = max(counts[0], 1); counts[-1] = max(counts[-1], 1)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    h = np.timedelta64(1, "h")
    rows, eid = [], 0
    for t, c in enumerate(counts):
        for _ in range(int(c)):
            rows.append((eid, base + t * h, 1, "a", 1.0)); eid += 1
    _write_events(tmp_path, rows)
    out = timeseries.pettitt_changepoint(str(tmp_path)).iloc[0]
    m = len(counts)
    us = []
    for t in range(m - 1):
        us.append(sum(int(np.sign(counts[j] - counts[i]))
                      for i in range(t + 1) for j in range(t + 1, m)))
    best_t = max(range(m - 1), key=lambda t: (abs(us[t]), -t))
    assert (out["t_star"], out["u_stat"]) == (best_t, us[best_t])


def test_sliding_distinct_users_combine_tier(tmp_path, ray_session):
    """The k-keyed combine exchange (distributed finalize for P x hours
    past the driver budget) is result-identical to the direct driver fold,
    including on the planted sentinel-cancellation corpus."""
    base = np.datetime64("2024-03-01T00:00:00", "us")
    df = pd.DataFrame(
        {
            "event_id": np.arange(4),
            "ts": [
                base + np.timedelta64(30, "m"),
                base + np.timedelta64(138, "m"),
                base + np.timedelta64(50, "h"),
                base + np.timedelta64(80, "h"),
            ],
            "user_id": [1, 2, 3, 1],
            "event_type": ["a"] * 4,
            "value": [1.0] * 4,
            "props": ["{}"] * 4,
        }
    )
    df.to_parquet(os.path.join(tmp_path, "events.parquet"), index=False)
    for wh in (2, 24):
        a = timeseries.sliding_distinct_users(
            str(tmp_path), window_hours=wh, num_parts=3, combine=False
        )
        b = timeseries.sliding_distinct_users(
            str(tmp_path), window_hours=wh, num_parts=3, combine=True
        )
        pd.testing.assert_frame_equal(a, b)
    # sf0.001 corpus too
    a = timeseries.sliding_distinct_users(SF, num_parts=4, combine=False)
    b = timeseries.sliding_distinct_users(SF, num_parts=4, combine=True)
    pd.testing.assert_frame_equal(a, b)
