"""Event-stream operators over the ``events`` table: as-of join,
sliding windows, gap sessionization.

These extend the windowed-aggregate family (SURVEY.md §2.9,
``relational.events_hourly_window``) with the stateful stream shapes a
log/clickstream pipeline needs.  Reference parity: the crawl reference
has no stream operators — these are the "custom operators Ray Data
lacks" tier, built as compositions of ``map_batches`` +
``groupby().map_groups`` per the survey's guidance.

Scale notes:

* ``events_asof_join`` / ``sessionize`` shuffle ONCE by ``user_id``
  (hash groupby) and do all per-user work vectorized (numpy
  searchsorted / reduceat) inside ``map_groups``.  The partitioning
  assumption is per-user history fits in a task; a hot key (one user =
  whole dataset) would need a secondary time-bucket split — documented,
  not needed for clickstream-shaped data where per-user event counts
  are bounded.
* ``events_sliding_window`` needs NO extra shuffle: each event is
  exploded to its size/slide covering windows inside ``map_batches``
  (np.repeat — pure fan-out, no Python loop) and then reuses the
  partial-then-final combiner, so the only data movement is the tiny
  per-block partial rows.

Float policy matches ``relational``: money sums are exact integer
cents; timestamps are integer microseconds end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from crawl_ray.pipelines.relational import _cents, _read, partial_then_final_sum

__all__ = [
    "events_asof_join",
    "events_sliding_window",
    "sessionize",
    "sessionize_bucketed",
]

# 30-minute session gap / 6-hour windows sliding by 2 hours (µs)
SESSION_GAP_US = 1_800_000_000
WINDOW_SIZE_US = 21_600_000_000
WINDOW_SLIDE_US = 7_200_000_000


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def events_asof_join(sf_dir: str) -> pa.Table:
    """For every ``purchase`` event, the latest ``click`` by the same
    user at or before it (classic as-of join).  Tie-break on equal
    timestamps: highest ``event_id`` wins (both sides order by
    ``(ts, event_id)``, so the result is deterministic).

    Purchases with no prior click are dropped (inner as-of)."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def per_user(g: pa.Table) -> pa.Table:
        et = _np(g.column("event_type"))
        ts = _np(g.column("ts").cast(pa.int64()))
        eid = _np(g.column("event_id"))
        uid = _np(g.column("user_id"))
        is_c = et == "click"
        is_p = et == "purchase"
        if not is_c.any() or not is_p.any():
            return pa.table(
                {
                    "purchase_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "purchase_ts_us": pa.array([], pa.int64()),
                    "click_id": pa.array([], pa.int64()),
                    "click_ts_us": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        cts, ceid = ts[is_c], eid[is_c]
        order = np.lexsort((ceid, cts))
        cts, ceid = cts[order], ceid[order]
        pts, peid, puid = ts[is_p], eid[is_p], uid[is_p]
        # last click with cts <= pts; equal-ts clicks sort by event_id,
        # so right-1 lands on the max event_id among ties
        idx = np.searchsorted(cts, pts, side="right") - 1
        ok = idx >= 0
        idx = idx[ok]
        return pa.table(
            {
                "purchase_id": pa.array(peid[ok], pa.int64()),
                "user_id": pa.array(puid[ok], pa.int64()),
                "purchase_ts_us": pa.array(pts[ok], pa.int64()),
                "click_id": pa.array(ceid[idx], pa.int64()),
                "click_ts_us": pa.array(cts[idx], pa.int64()),
                "gap_us": pa.array(pts[ok] - cts[idx], pa.int64()),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    # output is per-purchase (frontier-sized at scale): stay lazy, sort
    # distributed — never collected on the driver
    return out.sort("purchase_id")


def events_sliding_window(sf_dir: str) -> pa.Table:
    """Sliding-window aggregate: 6 h windows every 2 h, per event_type.

    Each event covers exactly size/slide = 3 windows with starts
    ``(us // slide - k) * slide`` for k in 0..2 — the explode happens
    batch-local (np.repeat/tile), then the standard partial-then-final
    combiner aggregates; no event-level shuffle at any point."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    n_cover = WINDOW_SIZE_US // WINDOW_SLIDE_US

    def explode(batch: pa.Table) -> pa.Table:
        us = _np(batch.column("ts").cast(pa.int64()))
        base = (us // WINDOW_SLIDE_US) * WINDOW_SLIDE_US
        offsets = np.arange(n_cover, dtype=np.int64) * WINDOW_SLIDE_US
        starts = (base[:, None] - offsets[None, :]).ravel()
        rep = np.repeat(np.arange(len(us)), n_cover)
        return pa.table(
            {
                "event_type": batch.column("event_type").take(pa.array(rep)),
                "window_start": pa.array(starts, pa.int64()),
                "value_cents": _cents(batch.column("value")).take(pa.array(rep)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    agg = partial_then_final_sum(
        exploded,
        ["event_type", "window_start"],
        {"sum_value_cents": lambda b: b.column("value_cents")},
        count_name="n_events",
    )
    return agg.sort_by(
        [("event_type", "ascending"), ("window_start", "ascending")]
    )


def sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization: per user, a new session starts when
    the gap to the previous event exceeds 30 min.  Emits one row per
    session with count / span / value sum.

    One hash shuffle by user_id; inside each group the session split is
    a vectorized diff+cumsum and the per-session aggregates are
    ``np.add.reduceat`` — no Python row loop."""
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def per_user(g: pa.Table) -> pa.Table:
        ts = _np(g.column("ts").cast(pa.int64()))
        eid = _np(g.column("event_id"))
        uid = int(g.column("user_id")[0].as_py())
        cents = _np(_cents(g.column("value")))
        order = np.lexsort((eid, ts))
        ts, cents = ts[order], cents[order]
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = np.diff(ts) > SESSION_GAP_US
        starts = np.flatnonzero(new_sess)
        n_events = np.diff(np.append(starts, len(ts)))
        end_idx = np.append(starts[1:], len(ts)) - 1
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid), pa.int64()),
                "session_idx": pa.array(np.arange(len(starts)), pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[end_idx], pa.int64()),
                "duration_us": pa.array(ts[end_idx] - ts[starts], pa.int64()),
                "sum_value_cents": pa.array(
                    np.add.reduceat(cents, starts), pa.int64()
                ),
            }
        )

    out = ds.groupby("user_id").map_groups(per_user, batch_format="pyarrow")
    # per-session output is unbounded: stay lazy, distributed sort
    return out.sort(["user_id", "session_idx"])


def sessionize_bucketed(sf_dir: str, bucket_us: int = 86_400_000_000) -> pa.Table:
    """Hot-key-safe sessionization — the scale path for
    :func:`sessionize` (same output, same oracle).

    Two phases remove the "one user's full history fits in a task"
    assumption:

    1. shuffle by ``(user_id, ts // bucket_us)`` and sessionize each
       bucket locally — a task holds at most one user-day of events;
    2. shuffle the resulting *sessions* by ``user_id`` and stitch
       chains whose inter-session gap ≤ the threshold (only sessions
       ending/starting at bucket edges can merge; within-bucket splits
       already have gap > threshold, so the event-level rule and the
       session-level rule agree exactly).

    Phase 2's per-user input is bounded by wall-clock range — at most
    one session per gap period (``time_range / SESSION_GAP_US``) — NOT
    by event count, so a user with any event volume stitches in O(that
    bound) regardless of scale."""
    assert bucket_us >= SESSION_GAP_US
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "us": us,
                "user_id": batch.column("user_id"),
                "cents": _cents(batch.column("value")),
                "bucket": pa.array(
                    _np(us) // bucket_us, pa.int64()
                ),
            }
        )

    def local_sessions(g: pa.Table) -> pa.Table:
        ts = _np(g.column("us"))
        eid = _np(g.column("event_id"))
        uid = int(g.column("user_id")[0].as_py())
        cents = _np(g.column("cents"))
        order = np.lexsort((eid, ts))
        ts, cents = ts[order], cents[order]
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = np.diff(ts) > SESSION_GAP_US
        starts = np.flatnonzero(new_sess)
        n_events = np.diff(np.append(starts, len(ts)))
        end_idx = np.append(starts[1:], len(ts)) - 1
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid), pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[end_idx], pa.int64()),
                "sum_value_cents": pa.array(
                    np.add.reduceat(cents, starts), pa.int64()
                ),
            }
        )

    def stitch(g: pa.Table) -> pa.Table:
        uid = int(g.column("user_id")[0].as_py())
        start = _np(g.column("start_us"))
        end = _np(g.column("end_us"))
        n = _np(g.column("n_events"))
        cents = _np(g.column("sum_value_cents"))
        order = np.argsort(start, kind="stable")
        start, end, n, cents = start[order], end[order], n[order], cents[order]
        new_sess = np.ones(len(start), dtype=bool)
        new_sess[1:] = (start[1:] - end[:-1]) > SESSION_GAP_US
        heads = np.flatnonzero(new_sess)
        tails = np.append(heads[1:], len(start)) - 1
        return pa.table(
            {
                "user_id": pa.array(np.full(len(heads), uid), pa.int64()),
                "session_idx": pa.array(np.arange(len(heads)), pa.int64()),
                "n_events": pa.array(np.add.reduceat(n, heads), pa.int64()),
                "start_us": pa.array(start[heads], pa.int64()),
                "end_us": pa.array(end[tails], pa.int64()),
                "duration_us": pa.array(end[tails] - start[heads], pa.int64()),
                "sum_value_cents": pa.array(
                    np.add.reduceat(cents, heads), pa.int64()
                ),
            }
        )

    sessions = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "bucket"])
        .map_groups(local_sessions, batch_format="pyarrow")
        .groupby("user_id")
        .map_groups(stitch, batch_format="pyarrow")
    )
    return sessions.sort(["user_id", "session_idx"])
