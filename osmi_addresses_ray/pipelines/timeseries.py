"""Time-series operators Ray Data lacks natively: as-of join and
gap-based session windows over the events table.

Both are custom operators in the SURVEY §2 sense (compositions the Dataset
API cannot express directly): ONE hash exchange on ``user_id`` co-locates a
user's full history, then everything inside the partition is a vectorized
sweep over lexsorted (user, ts) arrays — no per-user Python loop, no
driver-side iteration.

Partitioning assumption (documented per the custom-operator rule): a
partition holds ALL events of its users, so per-partition memory is bounded
by the hottest user's history. At 100 TB a pathological single user would
need the range-partition-by-ts + boundary-stitch variant (sessions that
cross partition edges merged in a second tiny exchange of per-edge
fragments); the hash-by-user form is the right default for organic skew.

Determinism: every ordering tie is broken by ``event_id`` (unique), so
results are bit-stable across partition counts and runs; the DuckDB oracle
mirrors the same tie-break (ORDER BY ts, event_id).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

EVENTS_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("view_event_id", pa.int64()),
        ("view_ts", pa.timestamp("us")),
        ("lag_us", pa.int64()),
    ]
)

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("session_start", pa.timestamp("us")),
        ("session_end", pa.timestamp("us")),
        ("n_events", pa.int64()),
        ("sum_value", pa.float64()),
    ]
)

_PRE_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
    ]
)


def _read_events(sf_dir: str, columns):
    from ..ops import read_parquet_sized

    return read_parquet_sized(os.path.join(sf_dir, "events.parquet"), columns=columns)


def asof_pairs_ds(
    sf_dir: str,
    *,
    left_type: str = "click",
    right_type: str = "view",
    num_parts: int = 8,
):
    """The as-of join of ``asof_join_events`` as a DATASET (one user-keyed
    exchange, no driver materialization) — the reusable core for downstream
    aggregates like ``conversion_lag_quantiles``."""

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.or_(
            pc.equal(t["event_type"], left_type), pc.equal(t["event_type"], right_type)
        )
        return t.filter(mask).select(["event_id", "ts", "user_id", "event_type"])

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return EVENTS_ASOF_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        is_left = np.asarray(t["event_type"].to_numpy(zero_copy_only=False)) == left_type
        # views sort BEFORE clicks at equal (user, ts) — prior-OR-EQUAL
        # semantics — and event_id last so equal-ts views resolve to the max
        order = np.lexsort((eid, is_left.astype(np.int8), ts, user))
        u, tsv, ev, lf = user[order], ts[order], eid[order], is_left[order]
        # running "last view row position" (−1 where none yet)
        pos = np.where(~lf, np.arange(len(u)), -1)
        acc = np.maximum.accumulate(pos)
        take = lf & (acc >= 0)
        cand = acc[take]
        same_user = u[cand] == u[take]
        rows = np.flatnonzero(take)[same_user]
        cand = cand[same_user]
        return pa.table(
            {
                "event_id": pa.array(ev[rows], pa.int64()),
                "user_id": pa.array(u[rows], pa.int64()),
                "ts": pa.array(tsv[rows].astype("datetime64[us]")),
                "view_event_id": pa.array(ev[cand], pa.int64()),
                "view_ts": pa.array(tsv[cand].astype("datetime64[us]")),
                "lag_us": pa.array(tsv[rows] - tsv[cand], pa.int64()),
            }
        )

    from ..ops import direct_partitioned_map

    return direct_partitioned_map(
        _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
            ]
        ),
        pre=pre,
    )


_ASOF_RP_SCHEMA = pa.schema(
    [
        ("tag", pa.int8()),
        ("user_id", pa.int64()),
        ("bucket", pa.int64()),
        ("event_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("view_event_id", pa.int64()),
        ("view_ts_us", pa.int64()),
    ]
)


def asof_pairs_range_partitioned(
    sf_dir: str,
    *,
    left_type: str = "click",
    right_type: str = "view",
    num_parts: int = 8,
    bucket_hours: int = 168,
):
    """The as-of join under RANGE partitioning — the documented fallback for
    pathological single-user skew (SCALE.md: "partition = a user's full
    history" breaks when one user's history exceeds a worker).

    Exchange 1 keys on (user_id, time-bucket): a hot user's events split
    across ⌈span / bucket⌉ partitions, so no task ever holds more than one
    bucket of one user. Each (user, bucket) group resolves its clicks
    locally with the standard merge-sweep kernel, and additionally emits
    (a) ONE boundary row — the group's last view by (ts, event_id) — and
    (b) its unresolved clicks (no view at-or-before them in the bucket).
    Exchange 2 keys the tiny boundary+unresolved stream on user_id and
    stitches: an unresolved click takes the boundary view of the greatest
    EARLIER bucket (earlier bucket ⇒ strictly earlier ts, so prior-or-equal
    and tie rules can only bind inside a bucket, where the local kernel
    already applied them). Result rows are identical to ``asof_pairs_ds``
    under any partitioning; equality is asserted in
    tests/test_skew_adversarial.py.
    """
    W = np.int64(bucket_hours) * 3_600_000_000

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.or_(
            pc.equal(t["event_type"], left_type), pc.equal(t["event_type"], right_type)
        )
        s = t.filter(mask)
        ts = s["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table(
            {
                "event_id": s["event_id"],
                "ts_us": pa.array(ts, pa.int64()),
                "user_id": s["user_id"],
                "is_left": pa.array(
                    np.asarray(s["event_type"].to_numpy(zero_copy_only=False))
                    == left_type
                ),
                "bucket": pa.array(ts // W, pa.int64()),
            }
        )

    pre_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("user_id", pa.int64()),
            ("is_left", pa.bool_()),
            ("bucket", pa.int64()),
        ]
    )

    def fn1(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _ASOF_RP_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        tsv0 = t["ts_us"].to_numpy(zero_copy_only=False)
        eid0 = t["event_id"].to_numpy(zero_copy_only=False)
        lf0 = t["is_left"].to_numpy(zero_copy_only=False)
        bk0 = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid0, lf0.astype(np.int8), tsv0, user))
        u, tsv, ev, lf, bk = (
            user[order], tsv0[order], eid0[order], lf0[order], bk0[order]
        )
        n = len(u)
        idx = np.arange(n, dtype=np.int64)
        # group = (user, bucket); rows are user-major, ts-sorted, and
        # bucket is monotone in ts within a user
        new_grp = np.r_[True, (u[1:] != u[:-1]) | (bk[1:] != bk[:-1])]
        grp_start = np.maximum.accumulate(np.where(new_grp, idx, -1))
        pos = np.where(~lf, idx, -1)
        acc = np.maximum.accumulate(pos)
        local = lf & (acc >= grp_start)  # prior-or-equal view IN THIS group
        cand = acc[np.flatnonzero(local)]
        rows = np.flatnonzero(local)
        unresolved = np.flatnonzero(lf & (acc < grp_start))
        # boundary: last view per group (the lexsort makes it the max
        # position among the group's views)
        view_pos = np.where(~lf, idx, -1)
        gacc = np.maximum.accumulate(view_pos)
        grp_end = np.r_[np.flatnonzero(new_grp)[1:] - 1, n - 1]
        last_view = gacc[grp_end]
        starts = np.flatnonzero(new_grp)
        has_view = last_view >= starts
        bpos = last_view[has_view]
        parts = [
            pa.table(
                {
                    "tag": pa.array(np.zeros(len(rows), np.int8)),
                    "user_id": pa.array(u[rows], pa.int64()),
                    "bucket": pa.array(bk[rows], pa.int64()),
                    "event_id": pa.array(ev[rows], pa.int64()),
                    "ts_us": pa.array(tsv[rows], pa.int64()),
                    "view_event_id": pa.array(ev[cand], pa.int64()),
                    "view_ts_us": pa.array(tsv[cand], pa.int64()),
                }
            ),
            pa.table(
                {
                    "tag": pa.array(np.ones(len(bpos), np.int8)),
                    "user_id": pa.array(u[bpos], pa.int64()),
                    "bucket": pa.array(bk[bpos], pa.int64()),
                    "event_id": pa.array(np.zeros(len(bpos), np.int64)),
                    "ts_us": pa.array(np.zeros(len(bpos), np.int64)),
                    "view_event_id": pa.array(ev[bpos], pa.int64()),
                    "view_ts_us": pa.array(tsv[bpos], pa.int64()),
                }
            ),
            pa.table(
                {
                    "tag": pa.array(np.full(len(unresolved), 2, np.int8)),
                    "user_id": pa.array(u[unresolved], pa.int64()),
                    "bucket": pa.array(bk[unresolved], pa.int64()),
                    "event_id": pa.array(ev[unresolved], pa.int64()),
                    "ts_us": pa.array(tsv[unresolved], pa.int64()),
                    "view_event_id": pa.array(
                        np.zeros(len(unresolved), np.int64)
                    ),
                    "view_ts_us": pa.array(np.zeros(len(unresolved), np.int64)),
                }
            ),
        ]
        return pa.concat_tables(parts)

    from ..ops import direct_cogroup, direct_partitioned_map

    out1 = direct_partitioned_map(
        _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"]),
        ["user_id", "bucket"],
        num_parts,
        fn1,
        pre_schema,
        pre=pre,
    ).materialize()

    def pre_stitch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["tag"], 0))

    def fn2(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return EVENTS_ASOF_SCHEMA.empty_table()
        tag = t["tag"].to_numpy(zero_copy_only=False)
        b = t.filter(pa.array(tag == 1))
        c = t.filter(pa.array(tag == 2))
        if b.num_rows == 0 or c.num_rows == 0:
            return EVENTS_ASOF_SCHEMA.empty_table()
        bu = b["user_id"].to_numpy(zero_copy_only=False)
        bb = b["bucket"].to_numpy(zero_copy_only=False)
        bvi = b["view_event_id"].to_numpy(zero_copy_only=False)
        bvt = b["view_ts_us"].to_numpy(zero_copy_only=False)
        o = np.lexsort((bb, bu))
        bu, bb, bvi, bvt = bu[o], bb[o], bvi[o], bvt[o]
        cu = c["user_id"].to_numpy(zero_copy_only=False)
        cb = c["bucket"].to_numpy(zero_copy_only=False)
        cev = c["event_id"].to_numpy(zero_copy_only=False)
        cts = c["ts_us"].to_numpy(zero_copy_only=False)
        # latest boundary with (user == cu) and (bucket < cb): boundaries
        # are (user, bucket)-sorted, one row per bucket, so the predecessor
        # of the click's (user, bucket) position IS the greatest earlier
        # bucket's last view. Composite key shift sized from the DATA.
        # Pre-1970 timestamps yield negative buckets, which would break the
        # packed (user, bucket) ordering — bias both sides by the global
        # min so buckets are non-negative before packing. The overflow
        # guard must cover BOTH user columns: a click-only user can carry
        # the largest id, and its packed key must not wrap (np.int64 would
        # wrap silently).
        bmin = min(int(bb.min()), int(cb.min()))
        if bmin:
            bb = bb - np.int64(bmin)
            cb = cb - np.int64(bmin)
        if min(int(bu.min()), int(cu.min())) < 0:
            raise OverflowError(
                "asof_pairs_range_partitioned: negative user_id cannot be "
                "packed into the (user, bucket) composite key"
            )
        shift = np.int64(max(int(bb.max()), int(cb.max())) + 1)
        if max(int(bu.max()), int(cu.max())) > (2**62) // int(shift):
            raise OverflowError(
                "asof_pairs_range_partitioned: user-id x bucket-range "
                "composite key exceeds int64 — use a wider bucket_hours"
            )
        j = np.searchsorted(bu * shift + bb, cu * shift + cb, side="left") - 1
        ok = (j >= 0) & (bu[np.maximum(j, 0)] == cu)
        j = j[ok]
        return pa.table(
            {
                "event_id": pa.array(cev[ok], pa.int64()),
                "user_id": pa.array(cu[ok], pa.int64()),
                "ts": pa.array(cts[ok].astype("datetime64[us]")),
                "view_event_id": pa.array(bvi[j], pa.int64()),
                "view_ts": pa.array(bvt[j].astype("datetime64[us]")),
                "lag_us": pa.array(cts[ok] - bvt[j], pa.int64()),
            }
        )

    stitched = direct_cogroup(
        [out1], [["user_id"]], num_parts, fn2, [_ASOF_RP_SCHEMA],
        pres=[pre_stitch],
    )

    def local_rows(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t.filter(pc.equal(t["tag"], 0))
        return pa.table(
            {
                "event_id": s["event_id"],
                "user_id": s["user_id"],
                "ts": pa.array(
                    s["ts_us"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
                ),
                "view_event_id": s["view_event_id"],
                "view_ts": pa.array(
                    s["view_ts_us"].to_numpy(zero_copy_only=False).astype(
                        "datetime64[us]"
                    )
                ),
                "lag_us": pa.array(
                    s["ts_us"].to_numpy(zero_copy_only=False)
                    - s["view_ts_us"].to_numpy(zero_copy_only=False),
                    pa.int64(),
                ),
            }
        )

    local = out1.map_batches(local_rows, batch_format="pyarrow")
    return local.union(stitched)


def asof_join_events(
    sf_dir: str,
    *,
    left_type: str = "click",
    right_type: str = "view",
    num_parts: int = 8,
):
    """For every ``left_type`` event, the latest ``right_type`` event of the
    same user with ``ts`` ≤ the left event's ``ts`` (inner as-of join; ties
    on ts resolved to the larger event_id).

    Shape: one exchange on user_id; inside a partition both sides merge into
    a single (user, ts, side, event_id) lexsort where the "latest prior
    view" for every click is a running maximum-accumulate over view row
    positions — O(n log n) per partition, zero per-user loops.
    """
    out = asof_pairs_ds(
        sf_dir, left_type=left_type, right_type=right_type, num_parts=num_parts
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


def session_windows(sf_dir: str, *, gap_minutes: int = 30, num_parts: int = 8):
    """Gap-based session windows per user: a new session starts when the
    time since the user's previous event exceeds ``gap_minutes`` (strictly
    greater). Emits per-session (start, end, n_events, sum_value) with a
    1-based per-user session index.

    ``sum_value`` is rounded to 6 decimals on BOTH engine and oracle sides:
    double summation order differs between a segmented reduceat and
    DuckDB's aggregate, and the inputs are 2-decimal synthetic values whose
    sums agree far beyond 1e-6.
    """
    gap_us = np.int64(gap_minutes) * 60_000_000

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return SESSION_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        u, tsv, v = user[order], ts[order], val[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | (np.r_[np.int64(0), tsv[1:] - tsv[:-1]] > gap_us)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, len(u)])
        # per-user 1-based session index: global session ordinal minus the
        # ordinal of the user's first session
        sess_ord = np.arange(len(starts), dtype=np.int64)
        user_first = np.maximum.accumulate(np.where(new_user[starts], sess_ord, -1))
        sid = sess_ord - user_first + 1
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "session_start": pa.array(tsv[starts].astype("datetime64[us]")),
                "session_end": pa.array(
                    tsv[np.r_[starts[1:], len(u)] - 1].astype("datetime64[us]")
                ),
                "n_events": pa.array(counts, pa.int64()),
                "sum_value": pa.array(
                    np.round(np.add.reduceat(v, starts), 6), pa.float64()
                ),
            }
        )

    def pre(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "ts", "user_id", "value"])

    from ..ops import direct_partitioned_map

    out = direct_partitioned_map(
        _read_events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
        pre=pre,
    )
    return (
        out.to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )


def sliding_window_counts(sf_dir: str, *, window_minutes: int = 60, num_parts: int = 8):
    """Per-event sliding-window aggregate: for every event, the count and
    value-sum of the SAME user's events inside the closed time frame
    [ts - window, ts] — DuckDB's ``RANGE BETWEEN <w> PRECEDING AND CURRENT
    ROW`` semantics exactly (the frame includes equal-``ts`` peers and the
    boundary instant).

    One user-keyed exchange, then a fully vectorized in-partition sweep:
    events lexsort to (user, ts, event_id), per-user segments embed into a
    single monotone int64 axis (user ordinal × span + relative ts) so BOTH
    frame bounds come from two whole-array ``searchsorted`` calls, and the
    value sums are one cumulative-sum difference — no per-user loop, no
    per-row window re-scan. Frame memory is O(partition), not O(window).
    """
    window_us = np.int64(window_minutes) * 60_000_000
    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("n_window", pa.int64()),
            ("sum_window", pa.float64()),
        ]
    )

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return out_schema.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        u, tsv, v, e = user[order], ts[order], val[order], eid[order]
        ts_rel = tsv - tsv.min()
        uidx = np.cumsum(np.r_[0, (u[1:] != u[:-1]).astype(np.int64)])
        span = np.int64(ts_rel.max()) + window_us + np.int64(2)
        n_users = int(uidx[-1]) + 1
        if n_users * int(span) >= np.iinfo(np.int64).max:
            # the embedded axis would overflow — repartition finer instead of
            # silently wrapping (no-silent-caps rule)
            raise ValueError(
                f"sliding_window_counts: {n_users} users x {span}us span "
                f"overflows the embedding axis; raise num_parts"
            )
        big = uidx * span + ts_rel
        lo = np.searchsorted(big, big - window_us, side="left")
        hi = np.searchsorted(big, big, side="right")
        csum = np.concatenate(([0.0], np.cumsum(v)))
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "n_window": pa.array(hi - lo, pa.int64()),
                "sum_window": pa.array(np.round(csum[hi] - csum[lo], 6)),
            }
        )

    def pre(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "ts", "user_id", "value"])

    from ..ops import direct_partitioned_map

    out = direct_partitioned_map(
        _read_events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
        pre=pre,
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


_DAY_US = np.int64(86_400_000_000)


def range_join_shipments(sf_dir: str, *, days: int = 7, num_parts: int = 8):
    """Distributed range (interval) join: per order, the count and quantity
    sum of ALL lineitems whose ship date falls in the closed-open window
    [o_orderdate, o_orderdate + days) — no key equality, pure inequality
    join (the third of the as-of / window / range trio Ray Data lacks).

    Partitioning: time is cut into fixed-width buckets (wider than the
    window, so an interval overlaps at most two). Points land in exactly one
    bucket; each interval is REPLICATED to its overlapped buckets with its
    effective range clipped to that bucket, which makes the per-partition
    counts disjoint by construction even when two buckets hash to the same
    partition. In-partition work is one sort + two whole-array searchsorted
    calls; a final o_orderkey-keyed partial-sum merge (≤2 fragments per
    order) assembles the answer. Orders with no shipment emit a zero
    fragment, preserving LEFT-join semantics."""
    from ..ops import direct_cogroup, read_parquet_sized
    from .relational import grouped_agg

    span_us = np.int64(days) * _DAY_US
    width_us = np.int64(max(days + 1, 8)) * _DAY_US

    points = read_parquet_sized(
        os.path.join(sf_dir, "lineitem.parquet"), columns=["l_shipdate", "l_quantity"]
    ).materialize()
    intervals = read_parquet_sized(
        os.path.join(sf_dir, "orders.parquet"), columns=["o_orderkey", "o_orderdate"]
    ).materialize()

    pt_schema = pa.schema(
        [("bucket", pa.int64()), ("ts", pa.int64()), ("qty", pa.float64())]
    )
    iv_schema = pa.schema(
        [("bucket", pa.int64()), ("o_orderkey", pa.int64()),
         ("lo", pa.int64()), ("hi", pa.int64())]
    )

    def pre_points(t: pa.Table) -> pa.Table:
        ts = t["l_shipdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        return pa.table({
            "bucket": pa.array(ts // width_us, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "qty": pa.array(t["l_quantity"].to_numpy(zero_copy_only=False), pa.float64()),
        })

    def pre_intervals(t: pa.Table) -> pa.Table:
        start = t["o_orderdate"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        key = t["o_orderkey"].to_numpy(zero_copy_only=False)
        end = start + span_us
        b0 = start // width_us
        b1 = (end - 1) // width_us  # inclusive last overlapped bucket
        reps = (b1 - b0 + 1).astype(np.int64)
        rk = np.repeat(key, reps)
        rs = np.repeat(start, reps)
        re_ = np.repeat(end, reps)
        rb = np.repeat(b0, reps) + (
            np.arange(int(reps.sum()), dtype=np.int64)
            - np.repeat(np.cumsum(reps) - reps, reps)
        )
        # clip each replica's range to ITS bucket → fragments are disjoint
        lo = np.maximum(rs, rb * width_us)
        hi = np.minimum(re_, (rb + 1) * width_us)
        return pa.table({
            "bucket": pa.array(rb, pa.int64()),
            "o_orderkey": pa.array(rk, pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(hi, pa.int64()),
        })

    frag_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("n", pa.int64()), ("qty", pa.float64())]
    )

    def fn(points_t: pa.Table, intervals_t: pa.Table) -> pa.Table:
        if not intervals_t.num_rows:
            return frag_schema.empty_table()
        key = intervals_t["o_orderkey"].to_numpy(zero_copy_only=False)
        lo = intervals_t["lo"].to_numpy(zero_copy_only=False)
        hi = intervals_t["hi"].to_numpy(zero_copy_only=False)
        if points_t.num_rows:
            ts = points_t["ts"].to_numpy(zero_copy_only=False)
            qty = points_t["qty"].to_numpy(zero_copy_only=False)
            order = np.argsort(ts, kind="stable")
            ts, qty = ts[order], qty[order]
            a = np.searchsorted(ts, lo, side="left")
            b = np.searchsorted(ts, hi, side="left")
            csum = np.concatenate(([0.0], np.cumsum(qty)))
            n = (b - a).astype(np.int64)
            q = csum[b] - csum[a]
        else:
            n = np.zeros(len(key), dtype=np.int64)
            q = np.zeros(len(key), dtype=np.float64)
        return pa.table({
            "o_orderkey": pa.array(key, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "qty": pa.array(q, pa.float64()),
        })

    frags = direct_cogroup(
        [points, intervals], [["bucket"], ["bucket"]], num_parts, fn,
        [pt_schema, iv_schema], pres=[pre_points, pre_intervals],
    )
    merged = grouped_agg(
        frags, ["o_orderkey"],
        {"n_shipments": ("n", "sum"), "sum_qty": ("qty", "sum")},
    ).to_pandas()
    merged["sum_qty"] = merged["sum_qty"].round(4)
    return (
        merged.astype({"o_orderkey": "int64", "n_shipments": "int64"})
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )


def running_totals(sf_dir: str) -> pd.DataFrame:
    """Global running totals over ALL events in (ts, event_id) order — the
    distributed prefix-scan pattern.

    The scan key is time, which is already range-partitionable: rows hash to
    their UTC-hour bucket (ordered buckets = ordered partitions), each
    partition lexsorts its own rows and takes a local cumulative sum, the
    driver exclusive-scans the per-bucket totals (one tiny row per bucket),
    and a final vectorized add shifts every partition by its offset. One
    exchange, no global sort. Totals are EXACT integers (value → cents via
    floor(v*100+0.5), the same IEEE ops DuckDB evaluates), because a float
    running sum is order-associative and the engine's block-then-offset
    association differs from SQL's row-sequential one in the last ulp.
    Counts ride along for free.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from osmi_addresses_ray.ops import direct_partitioned_map

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts", "value"]
    )

    def pre(t: pa.Table) -> pa.Table:
        cents = pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5))
        hour = pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.int64())
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts": t["ts"],
                "cents": pc.cast(cents, pa.int64()),
                "bucket": hour,
            }
        )

    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("cents", pa.int64()),
            ("bucket", pa.int64()),
        ]
    )

    out_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("event_id", pa.int64()),
            ("n_in_bucket", pa.int64()),
            ("cum_in_bucket", pa.int64()),
        ]
    )

    def local_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        cents = t["cents"].to_numpy(zero_copy_only=False)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, bucket))
        b, e, c = bucket[order], eid[order], cents[order]
        # per-bucket positions + cumulative cents (buckets are contiguous
        # after the lexsort)
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        cum = np.cumsum(c)
        base = np.repeat(np.r_[0, cum[starts[1:] - 1]], np.diff(np.r_[starts, len(b)]))
        pos = np.arange(len(b)) - np.repeat(starts, np.diff(np.r_[starts, len(b)]))
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "event_id": pa.array(e, pa.int64()),
                "n_in_bucket": pa.array(pos + 1, pa.int64()),
                "cum_in_bucket": pa.array(cum - base, pa.int64()),
            }
        )

    scanned = direct_partitioned_map(
        ds, ["bucket"], 16, local_scan, schema, pre=pre
    ).to_pandas()

    # driver: exclusive scan over per-bucket totals. The per-bucket last row
    # is found with an O(n) idxmax, no sort; at 10^12 rows the offset add
    # itself runs as a broadcast + map_batches over the scanned dataset —
    # here the gate collects the full result anyway, so pandas applies it.
    last_idx = scanned.groupby("bucket")["n_in_bucket"].idxmax()
    per_bucket = (
        scanned.loc[last_idx]
        .set_index("bucket")[["n_in_bucket", "cum_in_bucket"]]
        .rename(columns={"n_in_bucket": "n", "cum_in_bucket": "total"})
        .sort_index()
    )
    n_off = per_bucket["n"].cumsum().shift(fill_value=0)
    c_off = per_bucket["total"].cumsum().shift(fill_value=0)
    scanned["running_n"] = (
        scanned["n_in_bucket"] + n_off.reindex(scanned["bucket"]).to_numpy()
    ).astype("int64")
    scanned["running_cents"] = (
        scanned["cum_in_bucket"] + c_off.reindex(scanned["bucket"]).to_numpy()
    ).astype("int64")
    out = scanned[["event_id", "running_n", "running_cents"]]
    return out.sort_values("event_id").reset_index(drop=True)


def streaming_watermark_counts(sf_dir: str, *, lateness_min: int = 30) -> pd.DataFrame:
    """Streaming-window semantics over a bounded replay: per hourly window,
    how many rows arrived AFTER the stream's watermark had passed them.

    Arrival order is a deterministic hash permutation of event_id — the
    testdata generator emits rows already time-sorted, so replaying in
    insertion order would never produce a late row and the gate could not
    falsify the watermark logic; the multiplicative-hash replay
    (event_id * 2654435761 mod 2^32, injective for odd multipliers) scrambles
    arrivals the way a real ingest stream interleaves shards. The watermark
    at each arrival is the running max event time over all PRIOR arrivals
    minus the allowed lateness. The running max is the same distributed prefix-scan
    shape as ``running_totals`` — ordered event-id range buckets, per-bucket
    ``np.maximum.accumulate``, driver exclusive max over one row per bucket —
    because max, like sum, is associative with an identity. Lateness flags
    are exact (pure int64 microsecond compares), so the whole operator is
    true-SQL-checkable with a window MAX OVER ... ROWS ... 1 PRECEDING.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from osmi_addresses_ray.ops import direct_partitioned_map

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"])

    def pre(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        # reduce mod 2^31 BEFORE the multiply (the training_mixture guard):
        # int64 would silently wrap past event_id ~3.5e9 while the oracle's
        # BIGINT errors — the gate must compare, not crash
        arrival = ((eid % 2147483648) * 2654435761) % 4294967296
        # arrival domain is [0, 2^32): 16 ordered range buckets via >> 28
        return pa.table(
            {
                "arrival": pa.array(arrival, pa.int64()),
                "event_id": t["event_id"],
                "ts": t["ts"],
                "bucket": pa.array(arrival >> 28, pa.int64()),
            }
        )

    schema = pa.schema(
        [("arrival", pa.int64()), ("event_id", pa.int64()),
         ("ts", pa.timestamp("us")), ("bucket", pa.int64())]
    )

    def local_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema(
                [("bucket", pa.int64()), ("arrival", pa.int64()), ("ts_us", pa.int64()),
                 ("prior_max_us", pa.int64())]
            ).empty_table()
        arr = t["arrival"].to_numpy(zero_copy_only=False)
        real_eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        bucket = t["bucket"].to_numpy(zero_copy_only=False)
        # tie-break arrival collisions (ids past 2^31 alias) by event_id —
        # the SQL window orders by (arrival, event_id) identically
        order = np.lexsort((real_eid, arr, bucket))
        b, e, s = bucket[order], arr[order], ts[order]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        sizes = np.diff(np.r_[starts, len(b)])
        # prior max WITHIN the bucket: segmented accumulate (a global
        # accumulate would leak across buckets), shifted by one with a
        # sentinel at each bucket start
        seg_run = np.empty_like(s)
        for st, sz in zip(starts, sizes):  # ≤16 buckets per task — not per-row
            seg_run[st : st + sz] = np.maximum.accumulate(s[st : st + sz])
        prior = np.r_[np.int64(np.iinfo(np.int64).min), seg_run[:-1]]
        prior[starts] = np.iinfo(np.int64).min
        return pa.table(
            {
                "bucket": pa.array(b, pa.int64()),
                "arrival": pa.array(e, pa.int64()),
                "ts_us": pa.array(s, pa.int64()),
                "prior_max_us": pa.array(prior, pa.int64()),
            }
        )

    scanned = direct_partitioned_map(ds, ["bucket"], 16, local_scan, schema, pre=pre).to_pandas()

    # driver: exclusive running max over one (bucket, max_ts) row per bucket
    bucket_max = scanned.groupby("bucket")["ts_us"].max().sort_index()
    prior_global = bucket_max.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    off = prior_global.reindex(scanned["bucket"]).to_numpy()
    prior = np.maximum(scanned["prior_max_us"].to_numpy(), off)

    lateness_us = lateness_min * 60 * 1_000_000
    ts_us = scanned["ts_us"].to_numpy()
    has_prior = prior != np.iinfo(np.int64).min
    late = has_prior & (ts_us < prior - lateness_us)
    window = (ts_us // 3_600_000_000) * 3_600_000_000
    agg = (
        pd.DataFrame({"window_start": window.astype("datetime64[us]"), "late": late})
        .groupby("window_start")
        .agg(n_events=("late", "size"), n_late=("late", "sum"))
        .reset_index()
    )
    agg["n_events"] = agg["n_events"].astype("int64")
    agg["n_late"] = agg["n_late"].astype("int64")
    return agg.sort_values("window_start").reset_index(drop=True)


def q_user_set_ops(sf_dir: str) -> pd.DataFrame:
    """INTERSECT / EXCEPT as distributed set algebra: users who both click
    and purchase, and users who click but never purchase.

    One pass builds per-batch distinct (user, has_click, has_purchase)
    indicator partials; a user-keyed groupby ORs them (max of 0/1); the
    final classification is a vectorized expression — no second scan, no
    driver-side sets.
    """
    import pyarrow.compute as pc

    from osmi_addresses_ray.pipelines.relational import grouped_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_type"]
    )

    def partial(t: pa.Table) -> pa.Table:
        click = pc.cast(pc.equal(t["event_type"], "click"), pa.int64())
        buy = pc.cast(pc.equal(t["event_type"], "purchase"), pa.int64())
        return (
            pa.table({"user_id": t["user_id"], "c": click, "b": buy})
            .group_by(["user_id"], use_threads=False)
            .aggregate([("c", "max"), ("b", "max")])
            .rename_columns(["user_id", "c", "b"])
        )

    flags = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"],
        {"c": ("c", "max"), "b": ("b", "max")},
    ).to_pandas()
    both = flags[(flags["c"] == 1) & (flags["b"] == 1)][["user_id"]].assign(set_op="both")
    only = flags[(flags["c"] == 1) & (flags["b"] == 0)][["user_id"]].assign(
        set_op="click_only"
    )
    out = pd.concat([both, only], ignore_index=True)
    return out[["set_op", "user_id"]].sort_values(["set_op", "user_id"]).reset_index(drop=True)


def q_event_gaps(sf_dir: str) -> pd.DataFrame:
    """LAG window: each event's gap (µs) to the same user's previous event
    — one user-keyed exchange, vectorized shift per partition. First event
    per user keeps a NULL gap, as LAG does."""
    import pyarrow.compute as pc

    from osmi_addresses_ray.ops import partitioned_map

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "ts"]
    )

    def gaps(t: pa.Table) -> pa.Table:
        df = t.to_pandas().sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = df["ts"].astype("datetime64[us]").astype(np.int64)
        prev = ts.shift(1)
        first = df["user_id"] != df["user_id"].shift(1)
        gap = (ts - prev).where(~first)
        out = pa.Table.from_pandas(df[["event_id", "user_id"]], preserve_index=False)
        mask = gap.isna().to_numpy()
        vals = gap.fillna(0).to_numpy(np.int64)
        return out.append_column("gap_us", pa.array(vals, pa.int64(), mask=mask))

    out = partitioned_map(ds, ["user_id"], num_parts=16, fn=gaps)
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


_FUNNEL_SCHEMA = pa.schema([("stage", pa.string()), ("n_users", pa.int64())])
_I64MAX = np.iinfo(np.int64).max


def funnel_stage_counts(
    sf_dir: str,
    *,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
    num_parts: int = 8,
) -> pd.DataFrame:
    """Ordered conversion funnel: users with a ``view``, users whose first
    view is STRICTLY followed by a ``click``, and users whose first such
    click is strictly followed by a ``purchase`` (each stage anchors at the
    MINIMUM qualifying timestamp, the standard first-touch funnel).

    Shape: events filter to the three types map-side (``pre``), ONE hash
    exchange on user_id co-locates each user's funnel history, and every
    per-partition stage time is a masked ``minimum.reduceat`` over the
    (user, ts) lexsort — no per-user Python. Partitions emit 3 partial
    rows each; the driver sums ~3×parts rows.
    """

    def pre(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.is_in(t["event_type"], value_set=pa.array(list(stages)))
        return t.filter(mask).select(["user_id", "ts", "event_type"])

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _FUNNEL_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        typ = np.asarray(t["event_type"].to_numpy(zero_copy_only=False))
        order = np.lexsort((ts, user))
        u, tsv, ty = user[order], ts[order], typ[order]
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        gidx = np.cumsum(np.r_[True, u[1:] != u[:-1]]) - 1
        prev = None  # per-user anchor time of the previous stage
        counts = []
        for si, stage in enumerate(stages):
            m = ty == stage
            if si > 0:
                m &= tsv > prev[gidx]  # STRICTLY after the previous anchor
            masked = np.where(m, tsv, _I64MAX)
            anchor = np.minimum.reduceat(masked, starts)
            counts.append(int((anchor < _I64MAX).sum()))
            prev = anchor
        return pa.table(
            {
                "stage": pa.array([f"{i+1}_{s}" for i, s in enumerate(stages)]),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    from ..ops import direct_partitioned_map

    parts = direct_partitioned_map(
        _read_events(sf_dir, ["user_id", "ts", "event_type"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema(
            [("user_id", pa.int64()), ("ts", pa.timestamp("us")), ("event_type", pa.string())]
        ),
        pre=pre,
    ).to_pandas()
    out = (
        parts.groupby("stage", sort=True)["n_users"].sum().reset_index()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


_DAY_US = np.int64(86_400_000_000)

_RETENTION_SCHEMA = pa.schema(
    [("cohort_day", pa.timestamp("us")), ("day_offset", pa.int64()), ("n_users", pa.int64())]
)


def retention_cohorts(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Cohort retention: users grouped by the day of their FIRST event
    (cohort), counted on each later day they were active (day_offset =
    active day − cohort day, in days).

    ONE user-keyed exchange; inside a partition the cohort day is a
    ``minimum.reduceat`` and active days dedup via the lexsort
    first-occurrence mask. Partials are per-(cohort, offset) user counts —
    exact globally because a user lives in exactly one partition — merged
    by a tiny final groupby.
    """

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _RETENTION_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        day = ts // _DAY_US
        order = np.lexsort((day, user))
        u, d = user[order], day[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        starts = np.flatnonzero(new_user)
        gidx = np.cumsum(new_user) - 1
        cohort = np.minimum.reduceat(d, starts)  # first (sorted) day per user
        # distinct (user, day) pairs
        keep = np.r_[True, (u[1:] != u[:-1]) | (d[1:] != d[:-1])]
        uk, dk, gk = u[keep], d[keep], gidx[keep]
        offs = dk - cohort[gk]
        part = pd.DataFrame({"cohort_day": cohort[gk], "day_offset": offs})
        agg = part.groupby(["cohort_day", "day_offset"], sort=False).size().reset_index(
            name="n_users"
        )
        return pa.table(
            {
                "cohort_day": pa.array(
                    (agg["cohort_day"].to_numpy(np.int64) * _DAY_US).astype(
                        "datetime64[us]"
                    )
                ),
                "day_offset": pa.array(agg["day_offset"].to_numpy(np.int64), pa.int64()),
                "n_users": pa.array(agg["n_users"].to_numpy(np.int64), pa.int64()),
            }
        )

    from ..ops import direct_partitioned_map

    parts = direct_partitioned_map(
        _read_events(sf_dir, ["user_id", "ts"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))]),
    ).to_pandas()
    out = (
        parts.groupby(["cohort_day", "day_offset"], sort=True)["n_users"]
        .sum()
        .reset_index()
    )
    out["n_users"] = out["n_users"].astype("int64")
    out["day_offset"] = out["day_offset"].astype("int64")
    return out


_MOVAVG_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("mov_avg", pa.float64()),
    ]
)


def moving_avg_user(sf_dir: str, *, window_rows: int = 3, num_parts: int = 8) -> pd.DataFrame:
    """Per-user trailing moving average over the last ``window_rows`` events
    (ROWS window, ordered by ts with event_id tie-break).

    ONE user-keyed exchange; the windowed sum is a cumulative-sum
    difference clipped at each user's segment start. Values sum as EXACT
    integer cents (floor(v*100+0.5), the running_totals rule) so the single
    final division is bit-identical to the SQL window aggregate.
    """

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _MOVAVG_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts, user))
        u, tsv, ev, cv = user[order], ts[order], eid[order], cents[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        ustart = np.maximum.accumulate(np.where(new_user, np.arange(len(u)), -1))
        i = np.arange(len(u))
        lo = np.maximum(i - (window_rows - 1), ustart)
        cum = np.concatenate(([0], np.cumsum(cv)))
        s = cum[i + 1] - cum[lo]
        cnt = i - lo + 1
        mov = np.round(s / (100.0 * cnt), 6)
        return pa.table(
            {
                "event_id": pa.array(ev, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "ts": pa.array(tsv.astype("datetime64[us]")),
                "mov_avg": pa.array(mov, pa.float64()),
            }
        )

    from ..ops import direct_partitioned_map

    out = direct_partitioned_map(
        _read_events(sf_dir, ["event_id", "ts", "user_id", "value"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("value", pa.float64()),
            ]
        ),
    )
    return out.to_pandas().sort_values("event_id").reset_index(drop=True)


_COOC_SCHEMA = pa.schema(
    [("type_a", pa.string()), ("type_b", pa.string()), ("n_users", pa.int64())]
)


def event_type_cooccurrence(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Per-user event-type co-occurrence: for every unordered type pair
    (a < b), the number of users that emitted both (feature-engineering /
    market-basket shape).

    Per-batch distinct (user, type) shrinks the exchange map-side; the
    user-keyed exchange then dedups globally, expands each user's sorted
    type set triangularly (repeat/arange, the pair-expansion kernel), and
    emits per-partition pair counts — exact globally because a user lives
    in one partition. Driver merges ≤ types² rows.
    """

    def pre(t: pa.Table) -> pa.Table:
        return (
            t.select(["user_id", "event_type"])
            .group_by(["user_id", "event_type"], use_threads=False)
            .aggregate([])
        )

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return _COOC_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        typ = np.asarray(t["event_type"].to_numpy(zero_copy_only=False), dtype=object)
        order = np.lexsort((typ, user))
        u, ty = user[order], typ[order]
        keep = np.r_[True, (u[1:] != u[:-1]) | (ty[1:] != ty[:-1])]
        u, ty = u[keep], ty[keep]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gidx = np.cumsum(new_user) - 1
        counts = np.bincount(gidx)
        goffs = np.concatenate(([0], np.cumsum(counts)))
        pos = np.arange(len(u)) - goffs[gidx]
        fanout = counts[gidx] - 1 - pos
        total = int(fanout.sum())
        if not total:
            return _COOC_SCHEMA.empty_table()
        lefts = np.repeat(np.arange(len(u)), fanout)
        offs = np.concatenate(([0], np.cumsum(fanout)))
        rights = lefts + 1 + (np.arange(total) - np.repeat(offs[:-1], fanout))
        pairs = pd.DataFrame({"type_a": ty[lefts], "type_b": ty[rights]})
        agg = pairs.groupby(["type_a", "type_b"], sort=False).size().reset_index(
            name="n_users"
        )
        return pa.table(
            {
                "type_a": pa.array(agg["type_a"].to_numpy(object), pa.string()),
                "type_b": pa.array(agg["type_b"].to_numpy(object), pa.string()),
                "n_users": pa.array(agg["n_users"].to_numpy(np.int64), pa.int64()),
            }
        )

    from ..ops import direct_partitioned_map

    parts = direct_partitioned_map(
        _read_events(sf_dir, ["user_id", "event_type"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema([("user_id", pa.int64()), ("event_type", pa.string())]),
        pre=pre,
    ).to_pandas()
    if len(parts.columns) == 0:
        parts = _COOC_SCHEMA.empty_table().to_pandas()
    out = (
        parts.groupby(["type_a", "type_b"], sort=True)["n_users"].sum().reset_index()
    )
    out["n_users"] = out["n_users"].astype("int64")
    return out


def q_event_trend(sf_dir: str) -> pd.DataFrame:
    """Per-type least-squares trend of DAILY event counts: slope/intercept
    over (epoch-day, count). All five regression sums (n, Σx, Σy, Σxy, Σx²)
    are exact int64 — the only floats are the final two divisions, which
    are single IEEE ops identical in DuckDB — so the oracle is the same
    closed form, not a float-accumulating regr_slope. One distributed
    (type, day) count; the per-type reduction runs over |types| × |days|
    rows."""
    from .relational import grouped_agg, read

    ds = read(sf_dir, "events", columns=["event_type", "ts"])

    def add_day(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column("day", pc.floor_temporal(t["ts"], unit="day"))

    daily = grouped_agg(
        ds.map_batches(add_day, batch_format="pyarrow"),
        ["event_type", "day"],
        {"y": (None, "count")},
    ).to_pandas()
    # exact integer epoch-day x
    daily["x"] = (daily["day"].astype("datetime64[us]").astype("int64")) // 86_400_000_000
    g = daily.groupby("event_type")
    agg = pd.DataFrame(
        {
            "n": g.size(),
            "sx": g["x"].sum(),
            "sy": g["y"].sum(),
            "sxy": g.apply(lambda d: int((d["x"] * d["y"]).sum()), include_groups=False),
            "sxx": g.apply(lambda d: int((d["x"] * d["x"]).sum()), include_groups=False),
        }
    ).reset_index()
    denom = agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]
    num = agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]
    slope = np.where(denom != 0, num / denom.where(denom != 0, 1).astype("float64"), np.nan)
    intercept = (agg["sy"] - slope * agg["sx"]) / agg["n"]
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n_days": agg["n"].astype("int64"),
            "slope": np.round(slope, 6),
            "intercept": np.round(intercept, 6),
        }
    )
    return out.sort_values("event_type").reset_index(drop=True)


SESSION_PATH_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("path", pa.string()),
        ("n_events", pa.int64()),
    ]
)


def session_paths(sf_dir: str, *, gap_minutes: int = 30, num_parts: int = 8):
    """Per-session ordered event-type journey string ('view>click>…').

    Composes the gap-sessionization kernel (same strictly-greater 30-min
    rule and (ts, event_id) order as ``session_windows``) with an ordered
    string aggregation per session. One user_id exchange; the per-partition
    sweep is the vectorized lexsort + break-scan, with only the final join
    over each session's (short) slice in Python.
    """
    gap_us = np.int64(gap_minutes) * 60_000_000

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return SESSION_PATH_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        etype = t["event_type"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        u, tsv, et = user[order], ts[order], etype[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        brk = new_user | (np.r_[np.int64(0), tsv[1:] - tsv[:-1]] > gap_us)
        starts = np.flatnonzero(brk)
        counts = np.diff(np.r_[starts, len(u)])
        sess_ord = np.arange(len(starts), dtype=np.int64)
        user_first = np.maximum.accumulate(np.where(new_user[starts], sess_ord, -1))
        sid = sess_ord - user_first + 1
        paths = [">".join(et[s : s + c]) for s, c in zip(starts, counts)]
        return pa.table(
            {
                "user_id": pa.array(u[starts], pa.int64()),
                "session_id": pa.array(sid, pa.int64()),
                "path": pa.array(paths, pa.string()),
                "n_events": pa.array(counts, pa.int64()),
            }
        )

    def pre(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "ts", "user_id", "event_type"])

    from ..ops import direct_partitioned_map

    out = direct_partitioned_map(
        _read_events(sf_dir, ["event_id", "ts", "user_id", "event_type"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("event_type", pa.string()),
            ]
        ),
        pre=pre,
    )
    return (
        out.to_pandas().sort_values(["user_id", "session_id"]).reset_index(drop=True)
    )


def event_spikes(sf_dir: str) -> pd.DataFrame:
    """Traffic-anomaly hours: hourly event counts exceeding 1.5× the global
    per-hour mean, kept as the exact integer cross-multiplication
    2·n·H > 3·N (H hours, N events — no float mean anywhere). One partial
    pre-aggregated exchange builds the hourly table; the global scalars and
    final filter run on the (calendar-bounded, ≤ ~10⁵-row) hourly result —
    never on raw events."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import grouped_agg

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def add_window(t: pa.Table) -> pa.Table:
        return pa.table({"hr": pc.floor_temporal(t["ts"], unit="hour")})

    hourly = grouped_agg(
        ds.map_batches(add_window, batch_format="pyarrow"),
        ["hr"],
        {"n": (None, "count")},
    ).to_pandas()
    if hourly.empty:
        return pd.DataFrame(
            {"hr": pd.Series([], dtype="datetime64[us]"),
             "n": pd.Series([], dtype="int64")}
        )
    hourly["n"] = hourly["n"].astype("int64")
    H = np.int64(len(hourly))
    N = np.int64(hourly["n"].sum())
    out = hourly[2 * hourly["n"] * H > 3 * N]
    return out.sort_values("hr").reset_index(drop=True)


def cusum_changepoints(sf_dir: str) -> pd.DataFrame:
    """CUSUM change-point detection per event type over its hourly count
    series (Page's cumulative-sum chart, the offline single-change argmax
    form): with ordered hourly counts x_1..x_m and total X, the drift-free
    CUSUM S_k = P_k − k·X/m (P_k the prefix sum) peaks in magnitude at the
    most likely level-shift hour. Scaled by m to stay integer-exact —
    score_k = |m·P_k − k·X| — which preserves the argmax; ties break to the
    earliest hour. Output per type: the change-point hour, the max score
    numerator, the hour count m and event total X (so score/(m) recovers
    the classic statistic).

    Shape: one partial pre-aggregated exchange builds the (type, hour)
    count table — bounded by types × calendar hours, ≪ raw events (the
    ``event_spikes`` precedent) — and the per-type cumsum/argmax is one
    vectorized pandas pass over that bounded table. int64 bound:
    m·X ≤ 10⁵ hours · 10¹² events ≈ 10¹⁷ < 2⁶³."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import grouped_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def add_window(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hr": pc.floor_temporal(t["ts"], unit="hour"),
            }
        )

    hourly = grouped_agg(
        ds.map_batches(add_window, batch_format="pyarrow"),
        ["event_type", "hr"],
        {"c": (None, "count")},
    ).to_pandas()
    if hourly.empty:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "cp_hr": pd.Series([], dtype="datetime64[us]"),
                "score": pd.Series([], dtype="int64"),
                "n_hours": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
            }
        )
    hourly["c"] = hourly["c"].astype("int64")
    hourly = hourly.sort_values(["event_type", "hr"], kind="stable").reset_index(drop=True)
    g = hourly.groupby("event_type", sort=True)
    p = g["c"].cumsum().to_numpy(np.int64)
    k = (g.cumcount() + 1).to_numpy(np.int64)
    m = g["c"].transform("size").to_numpy(np.int64)
    x = g["c"].transform("sum").to_numpy(np.int64)
    hourly["score"] = np.abs(m * p - k * x)
    hourly["n_hours"] = m
    hourly["n_events"] = x
    # idxmax returns the FIRST max — rows are hour-ordered, so ties break early
    best = hourly.loc[hourly.groupby("event_type", sort=True)["score"].idxmax()]
    out = best.rename(columns={"hr": "cp_hr"})[
        ["event_type", "cp_hr", "score", "n_hours", "n_events"]
    ]
    out["cp_hr"] = out["cp_hr"].astype("datetime64[us]")
    return out.sort_values("event_type").reset_index(drop=True)


_HOUR_US = np.int64(3_600_000_000)
_RESAMPLE_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("gt", pa.timestamp("us")),
        ("value", pa.float64()),
    ]
)


def resample_locf(
    sf_dir: str, *, user_mod: int = 31, num_parts: int = 8
) -> pd.DataFrame:
    """Regular-grid resampling with last-observation-carried-forward: for
    each selected user (user_id % ``user_mod`` == 0 — grids are long, the
    subset keeps output bounded), one row per hour from the first whole
    hour at-or-after the user's first event to the last whole hour
    at-or-before the final event, carrying the value of the latest event
    at or before the grid instant (ties at the same timestamp resolve to
    the highest event_id — the as-of family's tie rule). Starting at the
    ceil-hour guarantees every grid point has a carry source, so the
    output never contains NULL fills.

    ONE user-keyed exchange (map-side user filter fused into the split
    wave); per partition each user's grid is generated and filled with a
    single vectorized ``searchsorted`` against the user's (ts, event_id)-
    sorted events — no per-grid-point work, no driver loop. Values are
    COPIED, never computed, so engine and SQL are bit-identical with no
    rounding contract at all. A user's grid length is bounded by the time
    span, not the corpus; pathological single-user span is the same
    documented range-partition stitch as the as-of join.
    """
    from ..ops import direct_partitioned_map

    def pre(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(uid % user_mod == 0))

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _RESAMPLE_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        user, ts, eid, val = user[order], ts[order], eid[order], val[order]
        first = np.r_[True, user[1:] != user[:-1]]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(user))
        out_u, out_t, out_v = [], [], []
        for s, e in zip(starts, ends):
            h0 = -(-ts[s] // _HOUR_US) * _HOUR_US  # ceil-hour of first event
            h1 = (ts[e - 1] // _HOUR_US) * _HOUR_US
            if h0 > h1:  # all events inside one partial hour: empty grid
                continue
            grid = np.arange(h0, h1 + _HOUR_US, _HOUR_US, dtype=np.int64)
            # latest event index with ts <= grid point (ties already sorted
            # by event_id, side='right' lands after the last tied row)
            idx = np.searchsorted(ts[s:e], grid, side="right") - 1
            out_u.append(np.full(len(grid), user[s], np.int64))
            out_t.append(grid)
            out_v.append(val[s:e][idx])
        if not out_u:  # every user's events fit inside one partial hour
            return _RESAMPLE_SCHEMA.empty_table()
        return pa.table(
            {
                "user_id": np.concatenate(out_u),
                "gt": np.concatenate(out_t).view("datetime64[us]"),
                "value": np.concatenate(out_v),
            }
        ).cast(_RESAMPLE_SCHEMA)

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = direct_partitioned_map(
        ds, ["user_id"], num_parts, fill, _RESAMPLE_SCHEMA, pre=pre
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "gt": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["user_id", "gt"]).reset_index(drop=True)


def resample_lerp(
    sf_dir: str, *, user_mod: int = 31, num_parts: int = 8
) -> pd.DataFrame:
    """Regular-grid resampling with LINEAR interpolation: same per-user
    ceil-hour → floor-hour grid as ``resample_locf``, but a grid instant
    strictly between two events gets ``v0 + (v1 - v0) * (dt / DT)`` —
    dt/DT the µs distances to the bracketing events as exact-int64→float64
    casts. A grid point ON an event, or at/after the user's last event,
    copies the event value (no extrapolation). Ties at one timestamp
    resolve to the highest event_id BEFORE bracketing, so both neighbors
    are well-defined.

    Float parity: the engine evaluates the lerp with exactly the IEEE op
    order the DuckDB oracle uses (µs ints → DOUBLE, one division, one
    multiply, one add — no fused ops on either side), so engine and SQL
    are bit-identical before the driver's round-to-6 normalization.
    Distribution: identical shape to ``resample_locf`` — one user-keyed
    exchange, vectorized searchsorted bracketing per partition.
    """
    from ..ops import direct_partitioned_map

    def pre(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(uid % user_mod == 0))

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _RESAMPLE_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        user, ts, val = user[order], ts[order], val[order]
        # tie-dedup: keep the LAST row per (user, ts) = highest event_id
        last = np.r_[(user[1:] != user[:-1]) | (ts[1:] != ts[:-1]), True]
        user, ts, val = user[last], ts[last], val[last]
        first = np.r_[True, user[1:] != user[:-1]]
        starts = np.flatnonzero(first)
        ends = np.append(starts[1:], len(user))
        out_u, out_t, out_v = [], [], []
        for s, e in zip(starts, ends):
            h0 = -(-ts[s] // _HOUR_US) * _HOUR_US
            h1 = (ts[e - 1] // _HOUR_US) * _HOUR_US
            if h0 > h1:
                continue
            grid = np.arange(h0, h1 + _HOUR_US, _HOUR_US, dtype=np.int64)
            seg_ts, seg_v = ts[s:e], val[s:e]
            i0 = np.searchsorted(seg_ts, grid, side="right") - 1
            exact = (seg_ts[i0] == grid) | (i0 == len(seg_ts) - 1)
            i1 = np.minimum(i0 + 1, len(seg_ts) - 1)
            t0, v0 = seg_ts[i0], seg_v[i0]
            t1, v1 = seg_ts[i1], seg_v[i1]
            with np.errstate(divide="ignore", invalid="ignore"):
                frac = (grid - t0).astype(np.float64) / (t1 - t0).astype(
                    np.float64
                )
                v = v0 + (v1 - v0) * frac
            out_u.append(np.full(len(grid), user[s], np.int64))
            out_t.append(grid)
            out_v.append(np.where(exact, v0, v))
        if not out_u:
            return _RESAMPLE_SCHEMA.empty_table()
        return pa.table(
            {
                "user_id": np.concatenate(out_u),
                "gt": np.concatenate(out_t).view("datetime64[us]"),
                "value": np.concatenate(out_v),
            }
        ).cast(_RESAMPLE_SCHEMA)

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = direct_partitioned_map(
        ds, ["user_id"], num_parts, fill, _RESAMPLE_SCHEMA, pre=pre
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "gt": pd.Series([], dtype="datetime64[us]"),
                "value": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values(["user_id", "gt"]).reset_index(drop=True)


_COVER_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("n_islands", pa.int64()),
        ("covered_us", pa.int64()),
    ]
)
_COVER_IN_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")),
    ]
)
_COVER_SPAN_US = np.int64(600_000_000)  # each event covers [ts, ts+10min)


def interval_coverage(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Interval-union coverage per user: every event spawns the interval
    [ts, ts + 10 min); overlapping/touching intervals merge into islands
    (a new island starts when ts > the max end of the user's earlier
    intervals; exact abutment still merges). Output per user: island count
    and total covered microseconds — the activity-time primitive behind
    engagement metrics, all exact int64.

    Because every interval has the SAME span, ends are monotone once
    starts are time-sorted, so the running max of prior ends is just the
    previous row's end — the island rule vectorizes to one shift +
    compare (no per-user loop; a variable-span variant would need a
    segmented cummax instead). One user-keyed exchange; the DuckDB oracle
    states the same gaps-and-islands window algebra.
    """
    from ..ops import direct_partitioned_map

    def pre(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "user_id", "ts"])

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _COVER_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, user))
        u, s = user[order], ts[order]
        e = s + _COVER_SPAN_US
        new_user = np.r_[True, u[1:] != u[:-1]]
        prev_e = np.r_[np.int64(0), e[:-1]]  # value unused where new_user
        island_start = new_user | (s > prev_e)
        starts = np.flatnonzero(island_start)
        island_end = np.maximum.reduceat(e, starts)  # == last e (monotone)
        island_len = island_end - s[starts]
        ufirst = np.flatnonzero(new_user)
        uid = u[ufirst]
        useg = np.cumsum(new_user[starts]) - 1
        n_isl = np.bincount(useg, minlength=len(uid)).astype(np.int64)
        cov = np.zeros(len(uid), np.int64)
        np.add.at(cov, useg, island_len)
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "n_islands": pa.array(n_isl),
                "covered_us": pa.array(cov),
            }
        )

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts"])
    out = direct_partitioned_map(
        ds, ["user_id"], num_parts, fn, _COVER_IN_SCHEMA, pre=pre
    ).to_pandas()
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


_TRANS_SCHEMA = pa.schema(
    [
        ("from_type", pa.string()),
        ("to_type", pa.string()),
        ("n", pa.int64()),
    ]
)


def event_transitions(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """First-order Markov transition counts over each user's time-ordered
    event sequence ((ts, event_id) order, the family's tie rule), plus the
    row-conditional probability — the session-behavior model fit every
    analytics pipeline starts with.

    One user-keyed exchange; inside a partition a single lexsort + shift
    gives every consecutive same-user pair; per-partition partial counts
    make the final exchange |types|² rows per partition. ``prob`` is ONE
    IEEE division of exact int64 counts (n / row_total), identical in the
    SQL oracle, so the float column hashes bit-equal.
    """
    from ..ops import direct_partitioned_map

    def pre(t: pa.Table) -> pa.Table:
        return t.select(["event_id", "user_id", "ts", "event_type"])

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _TRANS_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pandas(), dtype=object)
        order = np.lexsort((eid, ts, user))
        u, e = user[order], et[order]
        same = u[1:] == u[:-1]
        pairs = pd.DataFrame({"from_type": e[:-1][same], "to_type": e[1:][same]})
        g = pairs.groupby(["from_type", "to_type"], sort=False).size().reset_index()
        g.columns = ["from_type", "to_type", "n"]
        return pa.Table.from_pandas(g, preserve_index=False).cast(_TRANS_SCHEMA)

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    parts = direct_partitioned_map(
        ds, ["user_id"], num_parts, fn,
        pa.schema(
            [
                ("event_id", pa.int64()),
                ("user_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("event_type", pa.string()),
            ]
        ),
        pre=pre,
    ).to_pandas()
    out = (
        parts.groupby(["from_type", "to_type"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    out["n"] = out["n"].astype("int64")
    tot = out.groupby("from_type")["n"].transform("sum").astype("int64")
    out["prob"] = out["n"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    return out.sort_values(["from_type", "to_type"]).reset_index(drop=True)


_EMA_W = 32  # truncated EMA window: weights 2^31 … 2^0 are exact dyadics
_EMA_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("event_id", pa.int64()),
        ("ts", pa.timestamp("us")),
        ("cents", pa.int64()),
        ("num", pa.int64()),
        ("den", pa.int64()),
        ("ema", pa.float64()),
    ]
)


def ema_user_value(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Per-user exponential moving average of event values — the streaming
    smoothing feature every behavioural model keeps per entity — made
    bit-reproducible by TRUNCATING the classic α=½ recursion to a 32-term
    window so every weight is an exact dyadic:

        num_t = Σ_{j=0..m} cents_{t-j} · 2^(31-j),  m = min(t, 31)
        den_t = 2^32 − 2^(31-m)
        ema_t = num_t / den_t          (ONE IEEE division of exact int64s)

    int64 audit: num ≤ 2^32 · max_cents — values are < 2^25 cents, so
    num < 2^57. The SQL oracle evaluates the identical BIGINT expressions
    via a ±31-row window self-join, so the float column hashes bit-equal.

    Distributed shape: ONE user-keyed exchange; inside a partition the
    window fold is 32 whole-array shift-adds masked at user boundaries
    (no per-row Python). At 10^12 events the exchange volume is the slim
    (user, ts, id, cents) projection — text/props never move.
    """
    from ..ops import direct_partitioned_map

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMA_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        val = t["value"].to_numpy(zero_copy_only=False)
        cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
        order = np.lexsort((eid, ts.astype(np.int64), user))
        user, eid, ts, cents = user[order], eid[order], ts[order], cents[order]
        n = len(user)
        first = np.r_[True, user[1:] != user[:-1]]
        start = np.maximum.accumulate(np.where(first, np.arange(n), 0))
        pos = np.arange(n) - start
        num = np.zeros(n, np.int64)
        for j in range(_EMA_W):
            w = np.int64(1) << (31 - j)
            valid = pos >= j
            idx = np.arange(n) - j
            num[valid] += cents[idx[valid]] * w
        m = np.minimum(pos, _EMA_W - 1)
        den = (np.int64(1) << 32) - (np.int64(1) << (31 - m))
        return pa.table(
            {
                "user_id": pa.array(user),
                "event_id": pa.array(eid),
                "ts": pa.array(ts),
                "cents": pa.array(cents),
                "num": pa.array(num),
                "den": pa.array(den),
                "ema": pa.array(num.astype(np.float64) / den.astype(np.float64)),
            }
        ).cast(_EMA_SCHEMA)

    ds = _read_events(sf_dir, ["user_id", "event_id", "ts", "value"])
    out = direct_partitioned_map(
        ds, ["user_id"], num_parts, fn,
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("value", pa.float64()),
            ]
        ),
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "event_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "cents": pd.Series([], dtype="int64"),
                "num": pd.Series([], dtype="int64"),
                "den": pd.Series([], dtype="int64"),
                "ema": pd.Series([], dtype="float64"),
            }
        )
    for c in ("user_id", "event_id", "cents", "num", "den"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def k_anonymity_audit(sf_dir: str, *, k: int = 5, l: int = 3) -> pd.DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et al.
    2007) over the event log — the privacy gate a training pipeline runs
    before releasing behavioural data: quasi-identifier = (event_type,
    hour-of-day, value decile-bucket); a QI group re-identifies when its
    row count < k, and leaks the sensitive attribute (user_id) when its
    distinct-user count < l.

    Exact counts only: per-batch (QI, user) pair collapse → pair-keyed
    dedup exchange → tiny per-QI aggregate (the exact COUNT(DISTINCT)
    shape); row counts ride the same combiner. Flags are integer
    comparisons — bit-equal to the SQL by construction."""
    import pyarrow.compute as pc

    from .relational import grouped_agg, read

    ds = read(sf_dir, "events", columns=["event_type", "ts", "user_id", "value"])

    def qi(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]")
        hour = (ts.astype("datetime64[h]").astype(np.int64)) % 24
        cents = np.floor(t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5).astype(np.int64)
        bucket = cents // 1000  # 10-unit value buckets
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": pa.array(hour),
                "bucket": pa.array(bucket),
                "user_id": t["user_id"],
            }
        )

    keyed = ds.map_batches(qi, batch_format="pyarrow")

    def pairs(t: pa.Table) -> pa.Table:
        return t.group_by(
            ["event_type", "hour", "bucket", "user_id"], use_threads=False
        ).aggregate([([], "count_all")]).rename_columns(
            ["event_type", "hour", "bucket", "user_id", "n"]
        )

    pair_counts = grouped_agg(
        keyed.map_batches(pairs, batch_format="pyarrow"),
        ["event_type", "hour", "bucket", "user_id"],
        {"n": ("n", "sum")},
    )
    agg = grouped_agg(
        pair_counts,
        ["event_type", "hour", "bucket"],
        {"n_rows": ("n", "sum"), "n_users": (None, "count")},
    ).to_pandas()
    for c in ("hour", "bucket", "n_rows", "n_users"):
        agg[c] = agg[c].astype("int64")
    agg["k_violation"] = (agg["n_rows"] < k).astype("int64")
    agg["l_violation"] = (agg["n_users"] < l).astype("int64")
    return agg.sort_values(["event_type", "hour", "bucket"]).reset_index(drop=True)


def ts_autocorr_stats(sf_dir: str) -> pd.DataFrame:
    """Lag-1 autocorrelation sufficient statistics per event type over its
    hour-ordered count series: n pairs, Σx_t·x_{t+1} plus the marginal sums
    the Pearson formula needs on each side of the lag — all exact int64
    (the q_group_moments family applied to a time series; consecutive =
    adjacent OBSERVED hours, the LEAD-window convention shared with
    event_transitions). High Σxy against the marginals ⇒ bursty persistent
    traffic, the feature behind rate-limit and trend detectors.

    Shape: one partial pre-aggregated exchange to the bounded hourly table;
    the lag join is an in-driver vectorized shift over that bounded table
    (event_spikes precedent)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import grouped_agg

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "ts"]
    )

    def add_window(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "hr": pc.floor_temporal(t["ts"], unit="hour"),
            }
        )

    hourly = grouped_agg(
        ds.map_batches(add_window, batch_format="pyarrow"),
        ["event_type", "hr"],
        {"c": (None, "count")},
    ).to_pandas()
    cols = ("event_type", "n_pairs", "sxy", "sx", "sy", "sxx", "syy")
    if hourly.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64" if c != "event_type" else object)
             for c in cols}
        )
    hourly["c"] = hourly["c"].astype("int64")
    hourly = hourly.sort_values(["event_type", "hr"], kind="stable").reset_index(drop=True)
    tid = hourly["event_type"].to_numpy(object)
    c = hourly["c"].to_numpy(np.int64)
    x, y = c[:-1], c[1:]
    m = tid[1:] == tid[:-1]  # pair (t, t+1) valid only within one type
    d = pd.DataFrame(
        {
            "event_type": tid[: len(x)][m],
            "sxy": (x * y)[m], "sx": x[m], "sy": y[m],
            "sxx": (x * x)[m], "syy": (y * y)[m],
        }
    )
    if d.empty:
        return pd.DataFrame(
            {c2: pd.Series([], dtype="int64" if c2 != "event_type" else object)
             for c2 in cols}
        )
    g = d.groupby("event_type", sort=True).agg(
        n_pairs=("sxy", "size"), sxy=("sxy", "sum"), sx=("sx", "sum"),
        sy=("sy", "sum"), sxx=("sxx", "sum"), syy=("syy", "sum"),
    ).reset_index()
    for c2 in ("n_pairs", "sxy", "sx", "sy", "sxx", "syy"):
        g[c2] = g[c2].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)


# --- SCD-2 state intervalization (CDC run compaction) -------------------------

_SCD2_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("valid_from", pa.timestamp("us")), ("valid_to", pa.timestamp("us")),
        ("n_events", pa.int64()),
    ]
)
_SCD2_IN_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("event_type", pa.string()),
    ]
)


def scd2_intervals(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """SCD-type-2 compaction of each user's event stream: consecutive runs
    of the same event_type (in the family's (ts, event_id) order) collapse
    into one validity interval — ``valid_from`` = first event of the run,
    ``valid_to`` = first event of the NEXT run (NULL while current), plus
    the run's event count. The change-data-capture → dimension-table
    primitive: replaying a mutation log into as-of-queryable state rows.

    One user-keyed exchange; a run can never straddle partitions, so each
    partition emits its finished intervals directly (one lexsort + two
    boolean diffs, no per-user Python). Final pass is a concat + sort of
    ~|runs| rows. TRUE SQL oracle: lag() run breaks → cumulative run id →
    group → lead() of the run start.
    """
    from ..ops import direct_partitioned_map

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _SCD2_SCHEMA.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        et = np.asarray(t["event_type"].to_pandas(), dtype=object)
        order = np.lexsort((eid, ts, user))
        u, s, e = user[order], ts[order], et[order]
        brk = np.empty(len(u), bool)
        brk[0] = True
        brk[1:] = (u[1:] != u[:-1]) | (e[1:] != e[:-1])
        starts = np.flatnonzero(brk)
        n_ev = np.diff(np.append(starts, len(u)))
        vu, vf, ve = u[starts], s[starts], e[starts]
        open_run = np.empty(len(vu), bool)  # last run of its user: no valid_to
        open_run[:-1] = vu[1:] != vu[:-1]
        open_run[-1] = True
        vt = np.empty(len(vu), np.int64)
        vt[:-1] = vf[1:]
        vt[-1] = 0
        return pa.table(
            {
                "user_id": pa.array(vu),
                "event_type": pa.array(ve, pa.string()),
                "valid_from": pa.array(vf, pa.timestamp("us")),
                "valid_to": pa.array(vt, pa.timestamp("us"), mask=open_run),
                "n_events": pa.array(n_ev.astype(np.int64)),
            }
        ).cast(_SCD2_SCHEMA)

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    out = direct_partitioned_map(
        ds, ["user_id"], num_parts, fn, _SCD2_IN_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype=object),
                "valid_from": pd.Series([], dtype="datetime64[us]"),
                "valid_to": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
            }
        )
    out["user_id"] = out["user_id"].astype("int64")
    out["n_events"] = out["n_events"].astype("int64")
    return out.sort_values(
        ["user_id", "valid_from", "event_type"]
    ).reset_index(drop=True)


# --- exact OLS trend per event type -------------------------------------------

_OLS_EPOCH_H = 473_352  # hours from unix epoch to 2024-01-01 00:00 UTC
_OLS_IN_SCHEMA = pa.schema(
    [("ts", pa.timestamp("us")), ("event_type", pa.string()), ("value", pa.float64())]
)


def ols_trend(sf_dir: str) -> pd.DataFrame:
    """Per-event-type ordinary-least-squares trend of value over time —
    the parametric sibling of ``theil_sen_trend``: slope/intercept from
    EXACT integer sufficient statistics (x = whole hours since 2024-01-01,
    y = integer cents), so the only float surface is one final division
    per coefficient. Emits the sufficient stats too (n, Σx, Σy, Σxy, Σx²),
    which is what a downstream incremental refresher would checkpoint.

    Distributed shape: per-batch integer partial sums → one tiny
    event_type-keyed groupby (≤ #types rows); the closed-form combine
    n·Σxy − Σx·Σy runs in PYTHON ints on the driver (the cross terms
    overflow int64 at ~10⁵ rows/group; arbitrary precision keeps the spec
    exact at any scale), then converts to double exactly like the SQL's
    HUGEINT::DOUBLE. Oracle: same stats via HUGEINT arithmetic.
    """
    ds = _read_events(sf_dir, ["ts", "event_type", "value"])

    def partials(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        x = ts // 3_600_000_000 - _OLS_EPOCH_H
        y = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "event_type": np.asarray(t["event_type"].to_pandas(), dtype=object),
                "n": np.int64(1),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return df.groupby("event_type", as_index=False, sort=False).sum()

    from .relational import grouped_agg

    g = grouped_agg(
        ds.map_batches(partials, batch_format="pyarrow"),
        ["event_type"],
        {c: (c, "sum") for c in ("n", "sx", "sy", "sxy", "sxx")},
    ).to_pandas()
    slopes, intercepts = [], []
    for r in g.itertuples():
        n, sx, sy, sxy, sxx = (int(r.n), int(r.sx), int(r.sy), int(r.sxy), int(r.sxx))
        num = n * sxy - sx * sy  # python ints: exact at any magnitude
        den = n * sxx - sx * sx
        slope = float(num) / float(den) if den else 0.0
        slopes.append(slope)
        # cents/hour -> intercept in cents at x=0, same op order as SQL
        intercepts.append((float(sy) - slope * float(sx)) / float(n))
    g["slope"] = np.asarray(slopes, np.float64)
    g["intercept"] = np.asarray(intercepts, np.float64)
    for c in ("n", "sx", "sy", "sxy", "sxx"):
        g[c] = g[c].astype("int64")
    return g.sort_values("event_type").reset_index(drop=True)[
        ["event_type", "n", "sx", "sy", "sxy", "sxx", "slope", "intercept"]
    ]


# --- DTW similarity between user activity profiles ------------------------------

_DTW_TOPK = 16
_DTW_INF = np.int64(1) << 62


def _dtw_batch(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Exact-int64 dynamic time warping between P aligned pairs of
    length-n integer series (cost |a_i − b_j|, steps right/down/diag):
    dp(i,j) = d(i,j) + min(dp(i-1,j), dp(i,j-1), dp(i-1,j-1)). Same
    anti-diagonal sweep as the Fréchet kernel with + in place of max,
    VECTORIZED ACROSS PAIRS — the inner ops are (P, diag) numpy minima."""
    P, n = A.shape
    d = np.abs(A[:, :, None] - B[:, None, :])  # (P, n, n)
    prev = np.full((P, n), _DTW_INF)
    prev2 = np.full((P, n), _DTW_INF)
    prev[:, 0] = d[:, 0, 0]
    for k in range(1, 2 * n - 1):
        cur = np.full((P, n), _DTW_INF)
        lo, hi = max(0, k - n + 1), min(n - 1, k)
        i = np.arange(lo, hi + 1)
        up = prev[:, i]
        left = np.where(i > 0, prev[:, i - 1], _DTW_INF)
        diag = np.where(i > 0, prev2[:, i - 1], _DTW_INF)
        pv = np.minimum(np.minimum(up, left), diag)
        cur[:, i] = d[:, i, k - i] + pv
        prev2, prev = prev, cur
    return prev[:, n - 1]


def dtw_pairs(sf_dir: str, *, top_k: int = _DTW_TOPK) -> pd.DataFrame:
    """Pairwise user-behavior similarity under temporal warping: exact
    integer DTW between the 24-point hour-of-day activity profiles
    (event counts per hour-of-day) of the ``top_k`` most ACTIVE users
    (ties by user_id). DTW tolerates shifted daily rhythms that euclidean
    profiles punish — the behavioral-cohort primitive.

    Distributed shape: profile building is one (user, hour)-keyed grouped
    count (24 rows per user on the exchange, never the event stream); the
    top-k cut and the k·(k−1)/2 pair DP run on k·24 integers — constant-
    size by construction (the hausdorff cell-exchange shape is the
    documented path for all-pairs-over-cohorts at scale). The DP itself is
    the Fréchet anti-diagonal sweep with + for max, vectorized across all
    pairs at once. TRUE SQL oracle: the same recursive-CTE two-layer
    diagonal walk with addition."""
    from .relational import grouped_agg

    ds = _read_events(sf_dir, ["user_id", "ts"])

    def hod(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "h": pa.array((ts // 3_600_000_000) % 24),
            }
        )

    prof = grouped_agg(
        ds.map_batches(hod, batch_format="pyarrow"),
        ["user_id", "h"],
        {"n": (None, "count")},
    ).to_pandas()
    if prof.empty:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("user_a", "user_b", "dtw")}
        )
    tot = prof.groupby("user_id", as_index=False)["n"].sum()
    tot = tot.sort_values(["n", "user_id"], ascending=[False, True], kind="stable")
    users = np.sort(tot["user_id"].to_numpy(np.int64)[:top_k])
    sel = prof[prof["user_id"].isin(users)]
    mat = np.zeros((len(users), 24), np.int64)
    uidx = {u: i for i, u in enumerate(users)}
    mat[
        sel["user_id"].map(uidx).to_numpy(np.int64),
        sel["h"].to_numpy(np.int64),
    ] = sel["n"].to_numpy(np.int64)
    ai, bi = np.triu_indices(len(users), k=1)
    if len(ai) == 0:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("user_a", "user_b", "dtw")}
        )
    dtw = _dtw_batch(mat[ai], mat[bi])
    out = pd.DataFrame(
        {"user_a": users[ai], "user_b": users[bi], "dtw": dtw.astype(np.int64)}
    )
    return out.sort_values(["user_a", "user_b"]).reset_index(drop=True)


# --- throttle / rate-limit emission (state-dependent debounce) -----------------

_THROTTLE_US = 600_000_000  # 10 minutes
_THROTTLE_IN_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()), ("user_id", pa.int64()),
        ("ts", pa.timestamp("us")), ("event_type", pa.string()),
    ]
)
_THROTTLE_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()), ("event_type", pa.string()),
        ("ts", pa.timestamp("us")), ("event_id", pa.int64()),
        ("n_suppressed", pa.int64()),
    ]
)


def throttle_events(sf_dir: str, *, gap_us: int = _THROTTLE_US, num_parts: int = 8) -> pd.DataFrame:
    """Rate-limited event emission (the alerting/dedup-notification
    primitive): per (user, event_type) stream in (ts, event_id) order, the
    first event emits; later events emit only when ts ≥ last EMITTED ts +
    gap. This is STATE-dependent — unlike ``session_windows``' lag-based
    gaps, suppression windows chain off emitted events, so a burst can't
    re-arm itself. Each emitted row carries n_suppressed: the events it
    absorbed before the next emission.

    One user-keyed exchange (a (user, type) stream never straddles
    partitions); in-partition the emit chain is followed by per-group
    searchsorted jumps — O(emits · log n), with the sort and the
    between-emit suppression counts fully vectorized. TRUE SQL oracle:
    recursive CTE advancing every partition one emission per iteration
    (row_number-1 candidate after each emitted row), tuple-comparison
    suppression counts."""
    from ..ops import direct_partitioned_map

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _THROTTLE_SCHEMA.empty_table()
        df = t.to_pandas()
        et_codes, et_cats = pd.factorize(df["event_type"], sort=True)
        user = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        order = np.lexsort((eid, ts, et_codes, user))
        u, g, s, e = user[order], et_codes[order], ts[order], eid[order]
        bounds = np.r_[
            0, np.flatnonzero((u[1:] != u[:-1]) | (g[1:] != g[:-1])) + 1, len(u)
        ]
        keep_idx, n_sup = [], []
        for b0, b1 in zip(bounds[:-1], bounds[1:]):
            seg = s[b0:b1]
            i = 0
            chain = [0]
            while True:
                j = int(np.searchsorted(seg, seg[i] + gap_us, side="left"))
                if j >= len(seg):
                    break
                chain.append(j)
                i = j
            nxt = chain[1:] + [len(seg)]
            for pos, np_ in zip(chain, nxt):
                keep_idx.append(b0 + pos)
                n_sup.append(np_ - pos - 1)
        k = np.asarray(keep_idx, np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[k]),
                "event_type": pa.array(
                    np.asarray(et_cats, dtype=object)[g[k]], pa.string()
                ),
                "ts": pa.array(s[k], pa.timestamp("us")),
                "event_id": pa.array(e[k]),
                "n_suppressed": pa.array(np.asarray(n_sup, np.int64)),
            }
        )

    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    out = direct_partitioned_map(
        ds, ["user_id"], num_parts, fn, _THROTTLE_IN_SCHEMA
    ).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "event_type": pd.Series([], dtype=object),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "event_id": pd.Series([], dtype="int64"),
                "n_suppressed": pd.Series([], dtype="int64"),
            }
        )
    for c in ("user_id", "event_id", "n_suppressed"):
        out[c] = out[c].astype("int64")
    return out.sort_values(
        ["user_id", "event_type", "ts", "event_id"]
    ).reset_index(drop=True)


# --- conversion-lag exact quantiles ---------------------------------------------


def conversion_lag_quantiles(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Exact view→click conversion-lag distribution: quantile_disc-style
    order statistics (p25/p50/p75/p90, idx = ceil(p·n)−1) plus count and
    max over the as-of joined click lags — the time-to-convert metric a
    funnel report keys on.

    Fully distributed: the as-of pairs stay a Dataset (``asof_pairs_ds``)
    and the quantiles run through the binned two-pass rank path
    (``grouped_quantiles_binned``: bin histogram → driver rank location →
    re-read only the hit bins), so lag values never congregate anywhere.
    Lags fit float64 exactly (< 2⁵³ µs). TRUE SQL oracle: the asof window
    SQL composed with quantile_disc.
    """
    from .relational import grouped_agg, grouped_quantiles_binned

    pairs = asof_pairs_ds(sf_dir, num_parts=num_parts).materialize()

    def project(t: pa.Table) -> pa.Table:
        lag = t["lag_us"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"g": pa.array(np.zeros(len(lag), np.int64)), "lag": pa.array(lag)}
        )

    lags = pairs.map_batches(project, batch_format="pyarrow")
    tot = grouped_agg(
        lags, ["g"], {"n": (None, "count"), "max_lag": ("lag", "max")}
    ).to_pandas()
    if tot.empty or int(tot["n"].iloc[0]) == 0:
        return pd.DataFrame(
            {
                "n": pd.Series([], dtype="int64"),
                "p25": pd.Series([], dtype="int64"),
                "p50": pd.Series([], dtype="int64"),
                "p75": pd.Series([], dtype="int64"),
                "p90": pd.Series([], dtype="int64"),
                "max_lag": pd.Series([], dtype="int64"),
            }
        )
    q = grouped_quantiles_binned(lags, "g", "lag", (0.25, 0.5, 0.75, 0.9))
    out = pd.DataFrame(
        {
            "n": [int(tot["n"].iloc[0])],
            "p25": [int(q["p25"].iloc[0])],
            "p50": [int(q["p50"].iloc[0])],
            "p75": [int(q["p75"].iloc[0])],
            "p90": [int(q["p90"].iloc[0])],
            "max_lag": [int(tot["max_lag"].iloc[0])],
        }
    )
    return out.astype("int64")


def sliding_distinct_users(
    sf_dir: str, *, window_hours: int = 24, num_parts: int = 8,
    combine: bool | None = None,
):
    """EXACT trailing-window distinct-user counts at hourly checkpoints:
    for every hour boundary h inside the data span, the number of distinct
    users with >=1 event in (h - window, h].

    ``count(DISTINCT ...)`` over a sliding frame is inexpressible as a
    window aggregate (no mergeable state), and the naive checkpoint x events
    join is O(hours * n). The exact distributed shape used here:

    1. ONE hash exchange on user_id (the only all-to-all).
    2. Per partition, per user: each event at ts covers the checkpoint
       hours k with k*H >= ts and k*H < ts + window — an integer interval
       [ceil(ts/H), ceil((ts+W)/H) - 1]. Both endpoints are monotone in ts,
       so the union of a user's intervals is a single vectorized
       merged-run sweep (break where k_lo > prev k_hi + 1); each merged
       run becomes two deltas (+1 at start, -1 past end). A user's
       contribution to any checkpoint is therefore exactly 0 or 1 —
       distinctness is enforced structurally, never recounted.
    3. Deltas are pre-aggregated per partition (np.bincount-style unique),
       so each partition ships <= 2*hours rows; the final combine + cumsum
       runs over the checkpoint axis, which is tiny by construction
       (~10^4 hours per year of data even at 100 TB of events).

    The hour domain is [ceil(min_ts/H), floor(max_ts/H)]; coverage deltas
    beyond floor(max_ts/H) are clipped by the domain, mirroring the oracle's
    generate_series bounds. Sentinel delta=0 rows carry per-partition
    floor(max_ts/H) so the domain needs no second pass over events;
    zero-sum delta bins (cross-user cancellation inside a partition) are
    dropped before the sentinel is appended so delta==0 uniquely tags it.
    """
    H = np.int64(3_600_000_000)
    W = np.int64(window_hours) * H

    delta_schema = pa.schema([("k", pa.int64()), ("delta", pa.int64())])

    def fn(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return delta_schema.empty_table()
        user = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        order = np.lexsort((ts, user))
        u, tsv = user[order], ts[order]
        k_lo = (tsv + H - 1) // H
        k_hi = (tsv + W - 1) // H  # largest k with k*H < ts + W
        new_user = np.r_[True, u[1:] != u[:-1]]
        # both k_lo and k_hi are non-decreasing within a user (monotone in
        # ts), so "previous k_hi" IS the running max — no segment-reset
        # accumulate needed
        brk = new_user.copy()
        brk[1:] |= k_lo[1:] > k_hi[:-1] + 1
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(u)] - 1
        ks = np.concatenate([k_lo[starts], k_hi[ends] + 1])
        ds_ = np.concatenate(
            [np.ones(len(starts), np.int64), -np.ones(len(starts), np.int64)]
        )
        # partition-local pre-aggregation: ship <= 2*hours rows
        uk, inv = np.unique(ks, return_inverse=True)
        agg = np.bincount(inv, weights=ds_).astype(np.int64)
        # a +1 coverage-start and a -1 coverage-end from DIFFERENT users can
        # land on the same k and cancel to a genuine 0 — drop those bins
        # BEFORE appending the sentinel, or the driver's "delta==0 means
        # sentinel" recovery misreads them and inflates the hour domain
        # (observed at sf0.1: one extra hour row past floor(max_ts/H))
        nz = agg != 0
        uk, agg = uk[nz], agg[nz]
        # sentinel: per-partition floor(max_ts/H) rides along as delta=0
        # (tsv is user-major after the lexsort — take the true max, not [-1])
        uk = np.r_[uk, tsv.max() // H]
        agg = np.r_[agg, np.int64(0)]
        return pa.table({"k": pa.array(uk, pa.int64()), "delta": pa.array(agg, pa.int64())})

    def pre(t: pa.Table) -> pa.Table:
        return t.select(["user_id", "ts"])

    from ..ops import direct_partitioned_map

    mapped = direct_partitioned_map(
        _read_events(sf_dir, ["user_id", "ts"]),
        ["user_id"],
        num_parts,
        fn,
        pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))]),
        pre=pre,
    )
    if combine is None:
        # driver frame is <= num_parts x (2 x hours + 1) rows; past ~64
        # partitions insert ONE k-keyed combine exchange so the driver sees
        # <= 2 x hours + P rows regardless of P (the distributed-finalize
        # trigger documented in SCALE.md's driver-frame-bounds table)
        combine = num_parts > 64

    if combine:

        def cfn(t: pa.Table) -> pa.Table:
            if not t.num_rows:
                return delta_schema.empty_table()
            k = t["k"].to_numpy(zero_copy_only=False)
            d = t["delta"].to_numpy(zero_copy_only=False)
            sent = d == 0  # sentinels stay out of the sum (same tag rule
            # as the map side; cross-partition cancellation to zero is
            # dropped below for the same reason)
            uk, inv = np.unique(k[~sent], return_inverse=True)
            agg = (
                np.bincount(inv, weights=d[~sent]).astype(np.int64)
                if len(uk)
                else np.empty(0, np.int64)
            )
            nz = agg != 0
            uk, agg = uk[nz], agg[nz]
            if sent.any():
                uk = np.r_[uk, k[sent].max()]
                agg = np.r_[agg, np.int64(0)]
            return pa.table(
                {"k": pa.array(uk, pa.int64()), "delta": pa.array(agg, pa.int64())}
            )

        mapped = direct_partitioned_map(
            mapped, ["k"], max(8, num_parts // 16), cfn, delta_schema
        )
    out = mapped.to_pandas()
    empty = pd.DataFrame(
        {
            "hour_ts": pd.Series([], dtype="datetime64[us]"),
            "n_active": pd.Series([], dtype="int64"),
        }
    )
    if out.empty:
        return empty
    khi = int(out.loc[out["delta"] == 0, "k"].max())
    deltas = out[out["delta"] != 0].groupby("k", as_index=False)["delta"].sum()
    deltas = deltas.sort_values("k").reset_index(drop=True)
    klo = int(deltas["k"].iloc[0])  # = ceil(min_ts/H): earliest coverage start
    if khi < klo:
        return empty
    hours = np.arange(klo, khi + 1, dtype=np.int64)
    # stepwise counts: cumulative delta in effect at each checkpoint
    cum = deltas["delta"].to_numpy().cumsum()
    idx = np.searchsorted(deltas["k"].to_numpy(), hours, side="right") - 1
    counts = np.where(idx >= 0, cum[np.maximum(idx, 0)], 0).astype(np.int64)
    return pd.DataFrame(
        {
            "hour_ts": (hours * int(H)).astype("datetime64[us]"),
            "n_active": counts,
        }
    )


def km_survival(sf_dir: str, *, censor_days: int = 7, num_parts: int = 8):
    """Kaplan–Meier survival estimate over user lifetimes, EXACT in
    fixed-point integers (scale 1e9) so engine and SQL oracle agree
    bit-for-bit with zero transcendental calls.

    Lifetime of a user = floor hours between first and last event. A user
    whose last event falls within ``censor_days`` of the global max ts is
    right-CENSORED (still alive for all we know); everyone else "dies" at
    their last event. The estimator walks distinct death times t ascending:

        s_k = s_{k-1} * (n_risk_k - n_deaths_k) // n_risk_k,  s_0 = 10^9

    with n_risk_k = users whose lifetime >= t_k (censored included).

    Distributed shape: ONE user-keyed aggregate (first/last per user,
    partial per-batch pre-agg inside grouped_agg) -> materialized per-user
    table (#users rows, << #events); global max is a second aggregate over
    THAT table, not a second events scan. Death/at-risk histograms are
    per-batch np.unique partials combined over the tiny hour axis; the
    sequential product runs on the driver over <= #distinct-death-times
    rows in python ints (no int64 overflow at any corpus size).
    """
    from .relational import grouped_agg

    per_user = grouped_agg(
        _read_events(sf_dir, ["user_id", "ts"]),
        ["user_id"],
        {"f": ("ts", "min"), "l": ("ts", "max")},
    ).materialize()

    empty = pd.DataFrame(
        {
            "t_hours": pd.Series([], dtype="int64"),
            "n_risk": pd.Series([], dtype="int64"),
            "n_deaths": pd.Series([], dtype="int64"),
            "survival_e9": pd.Series([], dtype="int64"),
        }
    )
    import ray.data.aggregate as agg

    row = per_user.aggregate(agg.Max("l"))
    if not row:
        return empty
    gmax = pd.Timestamp(row["max(l)"]).value // 1000  # ns -> us
    horizon = gmax - np.int64(censor_days) * 86_400_000_000
    H = np.int64(3_600_000_000)

    def hist(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.schema(
                [("t", pa.int64()), ("n_all", pa.int64()), ("n_dead", pa.int64())]
            ).empty_table()
        f = t["f"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        l = t["l"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        lt = (l - f) // H
        died = l < horizon
        uk, inv = np.unique(lt, return_inverse=True)
        n_all = np.bincount(inv).astype(np.int64)
        n_dead = np.bincount(inv, weights=died.astype(np.int64)).astype(np.int64)
        return pa.table(
            {
                "t": pa.array(uk, pa.int64()),
                "n_all": pa.array(n_all, pa.int64()),
                "n_dead": pa.array(n_dead, pa.int64()),
            }
        )

    parts = grouped_agg(
        per_user.map_batches(hist, batch_format="pyarrow"),
        ["t"],
        {"n_all": ("n_all", "sum"), "n_dead": ("n_dead", "sum")},
    ).to_pandas()
    if parts.empty:
        return empty
    parts = parts.sort_values("t").reset_index(drop=True)
    # at-risk at t = suffix sum of the full lifetime histogram
    n_risk_all = parts["n_all"].to_numpy()[::-1].cumsum()[::-1]
    dead = parts["n_dead"].to_numpy() > 0
    s = 10**9
    rows = []
    for t, d, r in zip(
        parts["t"].to_numpy()[dead],
        parts["n_dead"].to_numpy()[dead],
        n_risk_all[dead],
    ):
        s = s * (int(r) - int(d)) // int(r)
        rows.append((int(t), int(r), int(d), s))
    return pd.DataFrame(
        rows, columns=["t_hours", "n_risk", "n_deaths", "survival_e9"]
    ).astype("int64") if rows else empty


# --- Allen interval algebra over per-(user, type) activity spans -------------

_ALLEN_SCHEMA = pa.schema(
    [("type_a", pa.string()), ("type_b", pa.string()),
     ("relation", pa.string()), ("n_pairs", pa.int64())]
)

# deterministic total ladder over closed intervals [s1,e1] vs [s2,e2]; point
# intervals (single-event types, s == e) are legal and classified by the SAME
# ladder on both engine and SQL sides, so the algebra stays a total function
_ALLEN_NAMES = np.array(
    ["before", "after", "equals", "meets", "met_by", "starts", "started_by",
     "finishes", "finished_by", "during", "contains", "overlaps",
     "overlapped_by"], dtype=object,
)


def _allen_codes(s1, e1, s2, e2):
    """Vectorized Allen-relation code (index into _ALLEN_NAMES) via the
    first-match ladder — np.select evaluates top-down exactly like the SQL
    CASE, so the two sides agree on every degenerate (point/shared-endpoint)
    configuration."""
    conds = [
        e1 < s2,                    # before
        s1 > e2,                    # after
        (s1 == s2) & (e1 == e2),    # equals
        e1 == s2,                   # meets
        s1 == e2,                   # met_by
        (s1 == s2) & (e1 < e2),     # starts
        s1 == s2,                   # started_by
        (e1 == e2) & (s1 > s2),     # finishes
        e1 == e2,                   # finished_by
        (s1 > s2) & (e1 < e2),      # during
        (s1 < s2) & (e1 > e2),      # contains
        s1 < s2,                    # overlaps
    ]
    return np.select(conds, np.arange(12), default=12)


def allen_interval_mix(sf_dir: str, *, num_parts: int = 8) -> pd.DataFrame:
    """Allen's interval algebra profile of user activity: for every user and
    every pair of event types the user emitted (type_a < type_b), classify
    the two CLOSED activity spans [first ts, last ts] into one of Allen's 13
    interval relations (Allen 1983) and count each (type_a, type_b, relation)
    over the corpus — the temporal-pattern mix behind schedule/overlap
    mining, and the classifier a temporal-join planner sits on.

    Distributed shape: per-batch combiner (groupby (user, type) → min/max
    partials) is fused into the split wave, so the ONE user-keyed exchange
    carries per-(batch, user, type) span partials, never raw events. Inside
    a partition: merge partials (lexsort + reduceat min/max), expand each
    user's ≤T(T−1)/2 type pairs (T = distinct types, bounded by the type
    vocabulary), classify with the vectorized ladder, and emit per-partition
    partial counts — the final exchange is ≤ |types|²·13 rows per partition.
    """
    from ..ops import direct_partitioned_map

    pre_schema = pa.schema(
        [("user_id", pa.int64()), ("event_type", pa.string()),
         ("s", pa.int64()), ("e", pa.int64())]
    )

    def pre(t: pa.Table) -> pa.Table:
        ts = (
            t["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        df = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "event_type": np.asarray(t["event_type"].to_pandas(), dtype=object),
            "s": ts, "e": ts,
        })
        g = df.groupby(["user_id", "event_type"], sort=False).agg(
            s=("s", "min"), e=("e", "max")
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).cast(pre_schema)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _ALLEN_SCHEMA.empty_table()
        df = (
            t.to_pandas()
            .groupby(["user_id", "event_type"], sort=False)
            .agg(s=("s", "min"), e=("e", "max"))
            .reset_index()
            # (user, type) sort makes per-user type runs ordered, so pair
            # expansion below always yields type_a < type_b
            .sort_values(["user_id", "event_type"], kind="stable")
        )
        user = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy(dtype=object)
        s = df["s"].to_numpy()
        e = df["e"].to_numpy()
        # per-user all-pairs expansion: for a run of length k starting at o,
        # pairs (o+i, o+j) for i<j — vectorized via repeat + cumsum offsets
        starts = np.flatnonzero(np.r_[True, user[1:] != user[:-1]])
        lens = np.diff(np.r_[starts, len(user)])
        npairs = lens * (lens - 1) // 2
        if int(npairs.sum()) == 0:
            return _ALLEN_SCHEMA.empty_table()
        # left index: within each run, row i repeated (k-1-i) times
        reps = np.concatenate([np.arange(k - 1, -1, -1) for k in lens])
        li = np.repeat(np.arange(len(user)), reps)
        # right index: li + 1 .. run end — arange offset per left row
        seg = np.repeat(np.cumsum(reps) - reps, reps)
        ri = li + 1 + (np.arange(int(reps.sum())) - seg)
        code = _allen_codes(s[li], e[li], s[ri], e[ri])
        pairs = pd.DataFrame({
            "type_a": et[li], "type_b": et[ri],
            "relation": _ALLEN_NAMES[code],
        })
        g = pairs.groupby(["type_a", "type_b", "relation"], sort=False).size()
        g = g.reset_index(name="n_pairs")
        return pa.Table.from_pandas(g, preserve_index=False).cast(_ALLEN_SCHEMA)

    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"])
    parts = direct_partitioned_map(
        ds, ["user_id"], num_parts, fn, pre_schema, pre=pre
    ).to_pandas()
    if parts.empty:
        return pd.DataFrame({
            "type_a": pd.Series([], dtype=object),
            "type_b": pd.Series([], dtype=object),
            "relation": pd.Series([], dtype=object),
            "n_pairs": pd.Series([], dtype="int64"),
        })
    out = (
        parts.groupby(["type_a", "type_b", "relation"], sort=True)["n_pairs"]
        .sum()
        .reset_index()
    )
    out["n_pairs"] = out["n_pairs"].astype("int64")
    return out.sort_values(["type_a", "type_b", "relation"]).reset_index(drop=True)


# --- cross-correlation between the top-2 event types --------------------------


def xcorr_types(sf_dir: str, *, max_lag: int = 23) -> pd.DataFrame:
    """Cross-correlation sufficient statistics between the two
    highest-volume event types' dense hourly count series — does activity in
    type_a lead activity in type_b? For each lag k in 0..``max_lag`` the
    overlapped pairs (x_t, y_{t+k}) over the dense hour grid [min_hr, max_hr]
    (absent hours count 0) yield the EXACT int64 sufficient statistics
    (n, Σxy, Σx, Σy, Σx², Σy²) from which any Pearson r(k) follows — the
    engine ships the integers and leaves the one irrational (the sqrt) to
    the consumer, so the result is bit-reproducible. type_a/type_b are the
    top-2 types by total count, ties by type name ascending.

    Distributed shape: ONE pre-aggregated (event_type, hour)-keyed exchange
    builds the hourly table (per-batch combiner first — raw events never
    move); the lag sweep runs on the calendar-bounded hourly matrix
    (≤ |types| rows per hour, ~10⁵ hours per decade) as vectorized int64
    dot products, never on raw events.
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg

    empty = pd.DataFrame({
        "lag": pd.Series([], dtype="int64"),
        "type_a": pd.Series([], dtype=object),
        "type_b": pd.Series([], dtype=object),
        "n": pd.Series([], dtype="int64"),
        "sxy": pd.Series([], dtype="int64"),
        "sx": pd.Series([], dtype="int64"),
        "sy": pd.Series([], dtype="int64"),
        "sxx": pd.Series([], dtype="int64"),
        "syy": pd.Series([], dtype="int64"),
    })

    ds = _read_events(sf_dir, ["ts", "event_type"])

    def add_hr(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hr": pc.floor_temporal(t["ts"], unit="hour"),
        })

    hourly = grouped_agg(
        ds.map_batches(add_hr, batch_format="pyarrow"),
        ["event_type", "hr"],
        {"n": (None, "count")},
    ).to_pandas()
    if hourly.empty:
        return empty
    hourly["n"] = hourly["n"].astype("int64")
    totals = (
        hourly.groupby("event_type", sort=False)["n"].sum().reset_index()
        .sort_values(["n", "event_type"], ascending=[False, True], kind="stable")
    )
    if len(totals) < 2:
        return empty
    type_a, type_b = totals["event_type"].iloc[0], totals["event_type"].iloc[1]
    hr_us = hourly["hr"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hourly = hourly.assign(t=hr_us // 3_600_000_000)
    lo = int(hourly["t"].min())
    m = int(hourly["t"].max()) - lo + 1
    x = np.zeros(m, dtype=np.int64)
    y = np.zeros(m, dtype=np.int64)
    for typ, arr in ((type_a, x), (type_b, y)):
        sub = hourly[hourly["event_type"] == typ]
        idx = sub["t"].to_numpy() - lo
        arr[idx] = sub["n"].to_numpy()
    # the int64 dot products below wrap silently on overflow; bound the
    # worst case in Python ints and raise like periodicity_detect /
    # trade_gravity do — the output schema is int64, so a wider true value
    # is unrepresentable anyway
    mx, my = int(x.max()), int(y.max())
    if max(mx * mx, my * my, mx * my) * m >= 2**63:
        raise OverflowError("xcorr_types: sufficient statistics exceed int64")
    rows = []
    for k in range(0, min(max_lag, m - 1) + 1):
        xs = x[: m - k]
        ys = y[k:]
        rows.append((
            k, type_a, type_b, m - k,
            int(xs @ ys), int(xs.sum()), int(ys.sum()),
            int(xs @ xs), int(ys @ ys),
        ))
    out = pd.DataFrame(
        rows, columns=["lag", "type_a", "type_b", "n", "sxy", "sx", "sy", "sxx", "syy"]
    )
    for c in ("lag", "n", "sxy", "sx", "sy", "sxx", "syy"):
        out[c] = out[c].astype("int64")
    return out.sort_values("lag").reset_index(drop=True)


# --- periodicity detection over per-type hourly series -------------------------


def periodicity_detect(sf_dir: str, *, max_period: int = 24) -> pd.DataFrame:
    """Dominant period per event type by EXACT folded energy: over the
    type's dense hourly count series (length m), each candidate period
    p ∈ 2..``max_period`` folds the first p·(m//p) hours into p phase
    columns; the concentration score is Σ_phases S_φ² / (m//p), ranked by
    the exact integer key (Σ S_φ² · 10⁶) // (m//p) with ties to the
    smallest p — the epoch-folding period finder (Leahy et al. 1983's χ²
    folding, integerized), no FFT and no float anywhere. Periods need ≥2
    complete cycles (m//p ≥ 2). Output: (event_type, best_p, score_key,
    n_hours).

    Distributed shape: ONE pre-aggregated (type, hour)-keyed exchange (the
    xcorr/cusum hourly table); the 23-period fold sweep runs on the
    calendar-bounded hourly matrix, with phase sums squared in python ints
    (Σ S² overflows int64 past ~3·10⁹ events per type) and an int64 guard
    on the emitted key that RAISES rather than wraps.
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg

    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "best_p": pd.Series([], dtype="int64"),
        "score_key": pd.Series([], dtype="int64"),
        "n_hours": pd.Series([], dtype="int64"),
    })
    ds = _read_events(sf_dir, ["ts", "event_type"])

    def add_hr(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hr": pc.floor_temporal(t["ts"], unit="hour"),
        })

    hourly = grouped_agg(
        ds.map_batches(add_hr, batch_format="pyarrow"),
        ["event_type", "hr"],
        {"n": (None, "count")},
    ).to_pandas()
    if hourly.empty:
        return empty
    hourly["n"] = hourly["n"].astype("int64")
    hr_us = hourly["hr"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hourly = hourly.assign(t=hr_us // 3_600_000_000)
    rows = []
    for typ, sub in hourly.groupby("event_type", sort=True):
        lo = int(sub["t"].min())
        m = int(sub["t"].max()) - lo + 1
        x = np.zeros(m, dtype=np.int64)
        x[sub["t"].to_numpy() - lo] = sub["n"].to_numpy()
        best = None
        for p in range(2, max_period + 1):
            q = m // p
            if q < 2:
                continue
            s = x[: p * q].reshape(q, p).sum(axis=0)
            num = sum(int(v) * int(v) for v in s)
            key = num * 1_000_000 // q
            if key >= 2**63:
                raise OverflowError(
                    "periodicity_detect: score key exceeds int64"
                )
            if best is None or key > best[1]:
                best = (p, key)
        if best is not None:
            rows.append((typ, best[0], best[1], m))
    if not rows:
        return empty
    out = pd.DataFrame(
        rows, columns=["event_type", "best_p", "score_key", "n_hours"]
    )
    for c in ("best_p", "score_key", "n_hours"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# --- Mann–Kendall trend test statistics -----------------------------------------


def mann_kendall(sf_dir: str) -> pd.DataFrame:
    """Mann–Kendall monotonic-trend statistics per event type over its dense
    hourly count series (Mann 1945, Kendall 1975) — the standard
    nonparametric is-traffic-growing test. Emitted exact integers:
    S = Σ_{i<j} sign(x_j − x_i) and the tie correction
    tie_term = Σ_groups t·(t−1)·(2t+5); the consumer forms
    var = (n(n−1)(2n+5) − tie_term)/18 and the z statistic (the only
    irrational steps). Output: (event_type, n_hours, s_stat, tie_term).

    Distributed shape: ONE pre-aggregated (type, hour)-keyed exchange builds
    the hourly table; S folds on the calendar-bounded series via a Fenwick
    tree over the compressed value domain — O(m log m) per type on a table
    bounded by calendar hours (~10⁵/decade), never O(events) and never the
    O(m²) pair join (that is the ORACLE's job).
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg

    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "n_hours": pd.Series([], dtype="int64"),
        "s_stat": pd.Series([], dtype="int64"),
        "tie_term": pd.Series([], dtype="int64"),
    })
    ds = _read_events(sf_dir, ["ts", "event_type"])

    def add_hr(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hr": pc.floor_temporal(t["ts"], unit="hour"),
        })

    hourly = grouped_agg(
        ds.map_batches(add_hr, batch_format="pyarrow"),
        ["event_type", "hr"],
        {"n": (None, "count")},
    ).to_pandas()
    if hourly.empty:
        return empty
    hourly["n"] = hourly["n"].astype("int64")
    hr_us = hourly["hr"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hourly = hourly.assign(t=hr_us // 3_600_000_000)
    rows = []
    for typ, sub in hourly.groupby("event_type", sort=True):
        lo = int(sub["t"].min())
        m = int(sub["t"].max()) - lo + 1
        x = np.zeros(m, dtype=np.int64)
        x[sub["t"].to_numpy() - lo] = sub["n"].to_numpy()
        # compress values to ranks 1..V for the Fenwick domain
        vals, ranks = np.unique(x, return_inverse=True)
        V = len(vals)
        tree = [0] * (V + 1)

        def bit_add(i: int) -> None:
            while i <= V:
                tree[i] += 1
                i += i & (-i)

        def bit_sum(i: int) -> int:  # count of ranks <= i among seen
            s = 0
            while i > 0:
                s += tree[i]
                i -= i & (-i)
            return s

        s_stat = 0
        for k, r in enumerate(ranks):
            less = bit_sum(int(r))           # strictly below: ranks < r+1
            leq = bit_sum(int(r) + 1)        # ≤ r  (ranks are 0-based)
            greater = k - leq
            s_stat += less - greater
            bit_add(int(r) + 1)
        cnt = np.bincount(ranks)
        tie_term = int(sum(int(c) * (int(c) - 1) * (2 * int(c) + 5)
                           for c in cnt if c > 1))
        rows.append((typ, m, s_stat, tie_term))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_hours", "s_stat", "tie_term"]
    )
    for c in ("n_hours", "s_stat", "tie_term"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


# --- Pettitt change-point test -----------------------------------------------------


def pettitt_changepoint(sf_dir: str) -> pd.DataFrame:
    """Pettitt's nonparametric change-point test (Pettitt 1979) per event
    type over its dense hourly series: U_t = Σ_{i≤t<j} sign(x_j − x_i); the
    most likely break is the EARLIEST t maximizing |U_t| (t = last index of
    the pre-break segment, 0..m−2). Exact integers throughout. The
    rank-based sibling of the CUSUM detector — robust to outliers because
    only signs enter. Output: (event_type, n_hours, t_star, u_stat).

    Distributed shape: the one (type, hour) pre-aggregated exchange; per
    type, TWO Fenwick trees (past inserts / future deletes) give every U_t
    incrementally in O(m log m) on the calendar-bounded series — the O(m²)
    pair join is the ORACLE's job.
    """
    import pyarrow.compute as pc

    from .relational import grouped_agg

    empty = pd.DataFrame({
        "event_type": pd.Series([], dtype=object),
        "n_hours": pd.Series([], dtype="int64"),
        "t_star": pd.Series([], dtype="int64"),
        "u_stat": pd.Series([], dtype="int64"),
    })
    ds = _read_events(sf_dir, ["ts", "event_type"])

    def add_hr(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hr": pc.floor_temporal(t["ts"], unit="hour"),
        })

    hourly = grouped_agg(
        ds.map_batches(add_hr, batch_format="pyarrow"),
        ["event_type", "hr"],
        {"n": (None, "count")},
    ).to_pandas()
    if hourly.empty:
        return empty
    hourly["n"] = hourly["n"].astype("int64")
    hr_us = hourly["hr"].to_numpy().astype("datetime64[us]").astype(np.int64)
    hourly = hourly.assign(t=hr_us // 3_600_000_000)
    rows = []
    for typ, sub in hourly.groupby("event_type", sort=True):
        lo = int(sub["t"].min())
        m = int(sub["t"].max()) - lo + 1
        if m < 2:
            continue
        x = np.zeros(m, dtype=np.int64)
        x[sub["t"].to_numpy() - lo] = sub["n"].to_numpy()
        vals, ranks = np.unique(x, return_inverse=True)
        V = len(vals)

        class _Bit:
            def __init__(self):
                self.tree = [0] * (V + 1)

            def add(self, i: int, d: int) -> None:
                i += 1
                while i <= V:
                    self.tree[i] += d
                    i += i & (-i)

            def le(self, i: int) -> int:  # count of ranks <= i
                i += 1
                s = 0
                while i > 0:
                    s += self.tree[i]
                    i -= i & (-i)
                return s

        past, fut = _Bit(), _Bit()
        n_past = 0
        for r in ranks:
            fut.add(int(r), 1)
        n_fut = m
        best_t, best_abs, best_u = -1, -1, 0
        u = 0
        for t in range(m - 1):
            r = int(ranks[t])
            # element t leaves the future...
            fut.add(r, -1)
            n_fut -= 1
            # drop pairs (i, t): -(past_less - past_greater) vs x_t
            less_p = past.le(r - 1) if r > 0 else 0
            leq_p = past.le(r)
            u -= less_p - (n_past - leq_p)
            # add pairs (t, j): +(future_greater - future_less)
            less_f = fut.le(r - 1) if r > 0 else 0
            leq_f = fut.le(r)
            u += (n_fut - leq_f) - less_f
            # ...and joins the past
            past.add(r, 1)
            n_past += 1
            if abs(u) > best_abs:
                best_t, best_abs, best_u = t, abs(u), u
        rows.append((typ, m, best_t, best_u))
    if not rows:
        return empty
    out = pd.DataFrame(rows, columns=["event_type", "n_hours", "t_star", "u_stat"])
    for c in ("n_hours", "t_star", "u_stat"):
        out[c] = out[c].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)
