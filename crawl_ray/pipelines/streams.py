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
  assumption is per-user history fits in a task — for hot keys use the
  ``*_bucketed`` variants below, which split by ``(user, time bucket)``
  and stitch with per-user state bounded by wall-clock range instead of
  event count (verified equal to the plain operators, same oracles).
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
import pyarrow.compute as pc

import ray.data

from crawl_ray.pipelines.relational import _cents, _read, partial_then_final_sum
from crawl_ray.util import rename_select

__all__ = [
    "events_asof_join",
    "events_asof_join_bucketed",
    "events_lead_lag",
    "events_gap_stats",
    "event_transition_matrix",
    "events_rolling_sum",
    "events_funnel",
    "events_late_data",
    "events_sliding_window",
    "sessionize",
    "sessionize_bucketed",
    "events_window_distinct",
]

ROLLING_WINDOW = 3  # current row + 2 preceding

# 30-minute session gap / 6-hour windows sliding by 2 hours (µs)
SESSION_GAP_US = 1_800_000_000
WINDOW_SIZE_US = 21_600_000_000
WINDOW_SLIDE_US = 7_200_000_000


def _np(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def events_asof_join(sf_dir: str) -> ray.data.Dataset:
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


def events_asof_join_bucketed(
    sf_dir: str, bucket_us: int = 86_400_000_000, num_partitions: int | None = None
):
    """Hot-key-safe as-of join — the scale path for
    :func:`events_asof_join` (same output, same oracle).

    Phase 1 hash-partitions by ``(user_id, ts // bucket_us)`` and
    resolves every purchase against the clicks of its OWN bucket; a
    purchase with no in-bucket prior click stays unresolved, and each
    active bucket emits one summary row (its last click, or a marker if
    it only has unresolved purchases).  Phase 2 shuffles ONLY the
    bucket summaries — bounded by active buckets per user (wall-clock
    range / bucket), not by event count — and computes each bucket's
    carry = the latest click in any earlier bucket.  Unresolved
    purchases then hash-join their carry on ``(user_id, bucket)``:
    correct because every earlier-bucket click precedes the purchase,
    so the carry IS the as-of answer when the own bucket has none.

    Like :func:`sessionize_bucketed`, both phases process whole hash
    partitions vectorized (forward-fill ``maximum.accumulate`` with
    group-boundary reset), never a per-group Python call."""
    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.pipelines.stats import _splitmix64
    from crawl_ray.util import normalize_schema

    if num_partitions is None:
        num_partitions = _default_partitions()
    n_parts = num_partitions

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, "click"), pc.equal(et, "purchase"))
        batch = pa.table(
            {
                "event_id": batch.column("event_id"),
                "us": us,
                "user_id": batch.column("user_id"),
                "event_type": et,
            }
        ).filter(keep)
        bucket = _np(batch.column("us")) // bucket_us
        uid = _np(batch.column("user_id"))
        key = uid.astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        ) + bucket.astype(np.uint64)
        return batch.append_column(
            "bucket", pa.array(bucket, pa.int64())
        ).append_column(
            "part",
            pa.array(
                (_splitmix64(key) % np.uint64(n_parts)).astype(np.int64),
                pa.int64(),
            ),
        )

    OUT_COLS = {
        "user_id": pa.int64(),
        "bucket": pa.int64(),
        "purchase_id": pa.int64(),
        "purchase_ts_us": pa.int64(),
        "click_id": pa.int64(),
        "click_ts_us": pa.int64(),
    }

    def _rows(uid, bucket, pid, pts, cid, cts):
        return pa.table(
            {
                "user_id": pa.array(uid, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "purchase_id": pa.array(pid, pa.int64()),
                "purchase_ts_us": pa.array(pts, pa.int64()),
                "click_id": pa.array(cid, pa.int64()),
                "click_ts_us": pa.array(cts, pa.int64()),
            }
        )

    def local_asof(block: pa.Table) -> pa.Table:
        """All (user, bucket) groups of one hash partition, vectorized:
        forward-fill of the last click index, reset at group starts;
        purchases sort AFTER same-ts clicks so ties stay eligible."""
        if block.num_rows == 0:
            return _rows([], [], [], [], [], [])
        uid = _np(block.column("user_id"))
        bucket = _np(block.column("bucket"))
        ts = _np(block.column("us"))
        eid = _np(block.column("event_id"))
        is_p_raw = _np(block.column("event_type")) == "purchase"
        order = np.lexsort((eid, is_p_raw, ts, bucket, uid))
        uid, bucket, ts, eid, is_p = (
            uid[order], bucket[order], ts[order], eid[order], is_p_raw[order]
        )
        n = len(uid)
        idx = np.arange(n)
        grp_change = np.ones(n, dtype=bool)
        grp_change[1:] = (uid[1:] != uid[:-1]) | (bucket[1:] != bucket[:-1])
        grp_start = np.maximum.accumulate(np.where(grp_change, idx, 0))
        last_click = np.maximum.accumulate(np.where(~is_p, idx, -1))
        valid = last_click >= grp_start
        ok = is_p & valid
        unres = is_p & ~valid
        out = []
        if ok.any():
            lc = last_click[ok]
            out.append(
                _rows(uid[ok], bucket[ok], eid[ok], ts[ok], eid[lc], ts[lc])
            )
        if unres.any():
            k = int(unres.sum())
            out.append(
                _rows(
                    uid[unres], bucket[unres], eid[unres], ts[unres],
                    np.full(k, -1), np.full(k, -1),
                )
            )
        # per-group summary: last click (or -1) for groups with clicks
        # or unresolved purchases
        starts = np.flatnonzero(grp_change)
        ends = np.append(starts[1:], n) - 1
        g_last_click = last_click[ends]
        g_has_click = g_last_click >= grp_start[ends]
        g_has_unres = np.add.reduceat(unres, starts) > 0
        emit = g_has_click | g_has_unres
        if emit.any():
            lc = g_last_click[emit]
            has = g_has_click[emit]
            cid = np.where(has, eid[np.maximum(lc, 0)], -1)
            cts_v = np.where(has, ts[np.maximum(lc, 0)], -1)
            k = int(emit.sum())
            out.append(
                _rows(
                    uid[starts][emit], bucket[starts][emit],
                    np.full(k, -1), np.full(k, -1), cid, cts_v,
                )
            )
        if not out:
            return _rows([], [], [], [], [], [])
        return pa.concat_tables(out)

    phase1 = (
        ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(local_asof, batch_format="pyarrow")
        .materialize()
    )

    def keep(pred):
        def fn(b: pa.Table) -> pa.Table:
            if b.num_rows == 0:
                return _rows([], [], [], [], [], [])
            return b.filter(pred(b))

        return fn

    resolved = phase1.map_batches(
        keep(lambda b: pc.and_(
            pc.greater_equal(b.column("purchase_id"), 0),
            pc.greater_equal(b.column("click_id"), 0),
        )),
        batch_format="pyarrow",
    )
    unresolved = normalize_schema(
        phase1.map_batches(
            keep(lambda b: pc.and_(
                pc.greater_equal(b.column("purchase_id"), 0),
                pc.less(b.column("click_id"), 0),
            )),
            batch_format="pyarrow",
        ),
        OUT_COLS,
        coalesce=num_partitions,
    )

    def add_user_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _rows([], [], [], [], [], []).append_column(
                "upart", pa.array([], pa.int64())
            )
        uid = _np(b.column("user_id"))
        return b.append_column(
            "upart",
            pa.array(
                (_splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)).astype(
                    np.int64
                ),
                pa.int64(),
            ),
        )

    summaries = phase1.map_batches(
        keep(lambda b: pc.less(b.column("purchase_id"), 0)),
        batch_format="pyarrow",
    ).map_batches(add_user_part, batch_format="pyarrow")

    def carries(block: pa.Table) -> pa.Table:
        """All users of one hash partition: carry = last click of any
        strictly earlier bucket, forward-filled with reset per user."""
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "carry_click_id": pa.array([], pa.int64()),
                "carry_click_ts": pa.array([], pa.int64()),
            }
        )
        if block.num_rows == 0:
            return empty
        uid = _np(block.column("user_id"))
        bucket = _np(block.column("bucket"))
        cid = _np(block.column("click_id"))
        cts = _np(block.column("click_ts_us"))
        order = np.lexsort((bucket, uid))
        uid, bucket, cid, cts = uid[order], bucket[order], cid[order], cts[order]
        n = len(uid)
        idx = np.arange(n)
        user_change = np.ones(n, dtype=bool)
        user_change[1:] = uid[1:] != uid[:-1]
        user_start = np.maximum.accumulate(np.where(user_change, idx, 0))
        last_click = np.maximum.accumulate(np.where(cid >= 0, idx, -1))
        # carry for row i = last click index BEFORE i within the user
        prev_last = np.concatenate(([np.int64(-1)], last_click[:-1]))
        prev_last[user_change] = -1
        has = prev_last >= user_start
        if not has.any():
            return empty
        ci = prev_last[has]
        return pa.table(
            {
                "user_id": pa.array(uid[has], pa.int64()),
                "bucket": pa.array(bucket[has], pa.int64()),
                "carry_click_id": pa.array(cid[ci], pa.int64()),
                "carry_click_ts": pa.array(cts[ci], pa.int64()),
            }
        )

    carry_ds = normalize_schema(
        summaries.groupby("upart").map_groups(carries, batch_format="pyarrow"),
        {
            "user_id": pa.int64(),
            "bucket": pa.int64(),
            "carry_click_id": pa.int64(),
            "carry_click_ts": pa.int64(),
        },
        coalesce=num_partitions,
    )

    # a FULLY empty join side is schema-less even after normalization
    # (repartition of only-empty blocks stays zero-column) — join only
    # when both sides are non-empty; counts on materialized datasets
    # are metadata-only
    unresolved = unresolved.materialize()
    carry_ds = carry_ds.materialize()
    if unresolved.count() == 0 or carry_ds.count() == 0:
        late = None
    else:
        late = unresolved.join(
            carry_ds, "inner", num_partitions, on=("user_id", "bucket")
        )

    def finish_late(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "purchase_id" not in b.column_names:
            return _final_empty()
        return _final(
            b.column("purchase_id"), b.column("user_id"),
            b.column("purchase_ts_us"), b.column("carry_click_id"),
            b.column("carry_click_ts"),
        )

    def finish_resolved(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _final_empty()
        return _final(
            b.column("purchase_id"), b.column("user_id"),
            b.column("purchase_ts_us"), b.column("click_id"),
            b.column("click_ts_us"),
        )

    out = resolved.map_batches(finish_resolved, batch_format="pyarrow")
    if late is not None:
        out = out.union(late.map_batches(finish_late, batch_format="pyarrow"))
    return out.sort("purchase_id")


def _rolling_kernel(uid, ts, eid, cents, w):
    """Whole-partition ROWS-frame rolling sum with per-user resets:
    lexsort by ``(uid, ts, eid)``, one cumsum, frame start =
    ``max(row - w + 1, user_start)``.  Returns the sorted key arrays
    plus the rolling sums (all aligned)."""
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid, cents = uid[order], ts[order], eid[order], cents[order]
    n = len(uid)
    idx = np.arange(n)
    user_change = np.ones(n, dtype=bool)
    user_change[1:] = uid[1:] != uid[:-1]
    user_start = np.maximum.accumulate(np.where(user_change, idx, 0))
    cum = np.concatenate(([np.int64(0)], np.cumsum(cents)))
    lo = np.maximum(idx - w + 1, user_start)
    roll = cum[idx + 1] - cum[lo]
    return uid, ts, eid, roll


def events_rolling_sum(sf_dir: str, num_partitions: int | None = None):
    """Row-level window function: per user, ordered by ``(ts,
    event_id)``, the rolling sum of ``value`` cents over the current +
    2 preceding rows (SQL ``SUM(...) OVER (PARTITION BY user ORDER BY
    ... ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)``).

    One hash shuffle on a computed partition id; the frame is a
    cumsum-difference over ALL users in the partition at once, with
    user-boundary resets — no per-group Python, no per-row loop."""
    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.pipelines.stats import _splitmix64

    n_parts = num_partitions or _default_partitions()
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = _np(batch.column("user_id"))
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "us": batch.column("ts").cast(pa.int64()),
                "user_id": batch.column("user_id"),
                "cents": _cents(batch.column("value")),
                "part": pa.array(
                    (
                        _splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    w = ROLLING_WINDOW

    def rolling(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "rolling_sum_cents": pa.array([], pa.int64()),
                }
            )
        uid = _np(block.column("user_id"))
        ts = _np(block.column("us"))
        eid = _np(block.column("event_id"))
        cents = _np(block.column("cents"))
        uid, ts, eid, roll = _rolling_kernel(uid, ts, eid, cents, w)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "rolling_sum_cents": pa.array(roll, pa.int64()),
            }
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(rolling, batch_format="pyarrow")
    )
    return out.sort("event_id")


def _lag_kernel(uid, ts, eid, cents):
    """Whole-partition LAG with per-user resets: lexsort by
    ``(uid, ts, eid)``, shift by one, zero at user boundaries."""
    order = np.lexsort((eid, ts, uid))
    uid, ts, eid, cents = uid[order], ts[order], eid[order], cents[order]
    prev = np.empty_like(cents)
    if len(prev):
        prev[0] = 0
        prev[1:] = cents[:-1]
        user_change = np.ones(len(uid), dtype=bool)
        user_change[1:] = uid[1:] != uid[:-1]
        prev[user_change] = 0
    return uid, ts, eid, cents, prev


def events_lead_lag(sf_dir: str, num_partitions: int | None = None):
    """Offset window function (SQL ``LAG``): per user, ordered by
    ``(ts, event_id)``, each event's value cents plus the previous
    event's (0 for the user's first event — ``coalesce(lag(...), 0)``).

    Same single-shuffle shape as :func:`events_rolling_sum`: one hash
    exchange on a salted-user partition id, then a whole-partition
    vectorized kernel — no per-group Python calls."""
    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.pipelines.stats import _splitmix64

    n_parts = num_partitions or _default_partitions()
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = _np(batch.column("user_id"))
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "us": batch.column("ts").cast(pa.int64()),
                "user_id": batch.column("user_id"),
                "cents": _cents(batch.column("value")),
                "part": pa.array(
                    (
                        _splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def lag_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                    "prev_cents": pa.array([], pa.int64()),
                }
            )
        uid, ts, eid, cents, prev = _lag_kernel(
            _np(block.column("user_id")),
            _np(block.column("us")),
            _np(block.column("event_id")),
            _np(block.column("cents")),
        )
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "ts_us": pa.array(ts, pa.int64()),
                "cents": pa.array(cents, pa.int64()),
                "prev_cents": pa.array(prev, pa.int64()),
            }
        )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(lag_block, batch_format="pyarrow")
    )
    return out.sort("event_id")



def _final(pid, uid, pts, cid, cts):
    gap = pc.subtract(pts.cast(pa.int64()), cts.cast(pa.int64()))
    return pa.table(
        {
            "purchase_id": pid.cast(pa.int64()),
            "user_id": uid.cast(pa.int64()),
            "purchase_ts_us": pts.cast(pa.int64()),
            "click_id": cid.cast(pa.int64()),
            "click_ts_us": cts.cast(pa.int64()),
            "gap_us": gap,
        }
    )


def _final_empty():
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


def sessionize(sf_dir: str) -> ray.data.Dataset:
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


def sessionize_bucketed(
    sf_dir: str, bucket_us: int = 86_400_000_000
) -> ray.data.Dataset:
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
    bound) regardless of scale.

    Both phases hash-partition on a computed partition id (``groupby``
    over n_parts synthetic keys — key-based ``repartition`` requires a
    non-default shuffle strategy) and process each partition
    vectorized: session splits are one lexsort + boundary-mask +
    ``reduceat`` over ALL (user, bucket) groups in the partition at
    once, never a per-group Python call (measured 10× faster than
    per-group ``map_groups`` at users × days group counts)."""
    assert bucket_us >= SESSION_GAP_US
    from crawl_ray.pipelines.joins import _default_partitions

    n_parts = _default_partitions()
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])

    def add_bucket(batch: pa.Table) -> pa.Table:
        from crawl_ray.pipelines.stats import _splitmix64

        us = batch.column("ts").cast(pa.int64())
        bucket = _np(us) // bucket_us
        uid = _np(batch.column("user_id"))
        key = uid.astype(np.uint64) * np.uint64(
            0x9E3779B97F4A7C15
        ) + bucket.astype(np.uint64)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "us": us,
                "user_id": batch.column("user_id"),
                "cents": _cents(batch.column("value")),
                "bucket": pa.array(bucket, pa.int64()),
                "part": pa.array(
                    (_splitmix64(key) % np.uint64(n_parts)).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def local_sessions(block: pa.Table) -> pa.Table:
        """All (user, bucket) groups of one hash partition, vectorized."""
        if block.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "sum_value_cents": pa.array([], pa.int64()),
                    "part": pa.array([], pa.int64()),
                }
            )
        uid = _np(block.column("user_id"))
        bucket = _np(block.column("bucket"))
        ts = _np(block.column("us"))
        eid = _np(block.column("event_id"))
        cents = _np(block.column("cents"))
        order = np.lexsort((eid, ts, bucket, uid))
        uid, bucket, ts, cents = uid[order], bucket[order], ts[order], cents[order]
        new_sess = np.ones(len(ts), dtype=bool)
        new_sess[1:] = (
            (uid[1:] != uid[:-1])
            | (bucket[1:] != bucket[:-1])
            | (np.diff(ts) > SESSION_GAP_US)
        )
        starts = np.flatnonzero(new_sess)
        end_idx = np.append(starts[1:], len(ts)) - 1
        from crawl_ray.pipelines.stats import _splitmix64

        h_uid = uid[starts]
        return pa.table(
            {
                "user_id": pa.array(h_uid, pa.int64()),
                "n_events": pa.array(
                    np.diff(np.append(starts, len(ts))), pa.int64()
                ),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[end_idx], pa.int64()),
                "sum_value_cents": pa.array(
                    np.add.reduceat(cents, starts), pa.int64()
                ),
                "part": pa.array(
                    (
                        _splitmix64(h_uid.astype(np.uint64)) % np.uint64(n_parts)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def stitch(block: pa.Table) -> pa.Table:
        """All users of one hash partition, vectorized."""
        if block.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64()),
                    "duration_us": pa.array([], pa.int64()),
                    "sum_value_cents": pa.array([], pa.int64()),
                }
            )
        uid = _np(block.column("user_id"))
        start = _np(block.column("start_us"))
        end = _np(block.column("end_us"))
        n = _np(block.column("n_events"))
        cents = _np(block.column("sum_value_cents"))
        order = np.lexsort((start, uid))
        uid, start, end, n, cents = (
            uid[order], start[order], end[order], n[order], cents[order]
        )
        new_sess = np.ones(len(start), dtype=bool)
        new_sess[1:] = (uid[1:] != uid[:-1]) | (
            (start[1:] - end[:-1]) > SESSION_GAP_US
        )
        heads = np.flatnonzero(new_sess)
        tails = np.append(heads[1:], len(start)) - 1
        h_uid = uid[heads]
        # per-user session ordinal: position among this user's heads
        user_first = np.ones(len(heads), dtype=bool)
        user_first[1:] = h_uid[1:] != h_uid[:-1]
        first_pos = np.maximum.accumulate(
            np.where(user_first, np.arange(len(heads)), 0)
        )
        return pa.table(
            {
                "user_id": pa.array(h_uid, pa.int64()),
                "session_idx": pa.array(
                    np.arange(len(heads)) - first_pos, pa.int64()
                ),
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
        .groupby("part")
        .map_groups(local_sessions, batch_format="pyarrow")
        .groupby("part")
        .map_groups(stitch, batch_format="pyarrow")
    )
    return sessions.sort(["user_id", "session_idx"])


FUNNEL_STAGES = ("view", "click", "purchase")


def _funnel_kernel(uid: np.ndarray, ts: np.ndarray, kind: np.ndarray):
    """Whole-partition funnel: per user, t1 = first 'view', t2 = first
    'click' strictly after t1, t3 = first 'purchase' strictly after t2
    (stage boundaries are µs values, so duplicate timestamps behave
    identically to the SQL ``e.ts > boundary`` join).  One lexsort +
    three masked ``minimum.reduceat`` passes — no per-user Python.
    Returns (users, stage) with stage ∈ {0, 1, 2, 3}."""
    order = np.lexsort((ts, uid))
    uid, ts, kind = uid[order], ts[order], kind[order]
    starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
    users = uid[starts]
    big = np.iinfo(np.int64).max

    def first_after(mask: np.ndarray, bound_row: np.ndarray) -> np.ndarray:
        masked = np.where(mask & (ts > bound_row), ts, big)
        return np.minimum.reduceat(masked, starts)

    runlens = np.diff(np.r_[starts, len(uid)])
    neg = np.full(len(uid), -1, dtype=np.int64)  # every real µs ts > -1
    t1 = first_after(kind == 0, neg)
    t2 = first_after(kind == 1, np.repeat(t1, runlens))
    t3 = first_after(kind == 2, np.repeat(t2, runlens))
    stage = (t1 < big).astype(np.int64) + (t2 < big) + (t3 < big)
    return users, stage


def events_funnel(sf_dir: str, num_partitions: int | None = None) -> pa.Table:
    """Conversion funnel (view → click → purchase, strictly ordered in
    event time per user): how many users reached each stage — the
    product-analytics shape that needs ORDERED per-user state, not just
    a groupby count.

    Scale shape: ONE hash shuffle on ``splitmix64(user) % n_parts``
    carrying every event row (non-funnel rows must ride along so
    stage-0 users appear in the histogram, matching the oracle's
    DISTINCT-user base; at 100 TB pre-reduce to one row per
    (user, kind) inside the map if the type mix is funnel-light); the
    partition
    kernel is fully vectorized (lexsort + masked ``minimum.reduceat``);
    each partition emits a ≤4-row stage histogram, so the driver
    combine is O(parts)."""
    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.pipelines.stats import _splitmix64
    from crawl_ray.util import collect_table, collect_table_typed

    n_parts = num_partitions or _default_partitions()
    ds = _read(sf_dir, "events", ["ts", "user_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        # every user must appear in the output (stage 0 included), so
        # non-funnel events stay as rows coded -1 (never match a stage)
        kind = _np(
            pc.fill_null(
                pc.index_in(
                    batch.column("event_type"),
                    value_set=pa.array(FUNNEL_STAGES),
                ),
                -1,
            ).cast(pa.int64())
        )
        uid = _np(batch.column("user_id"))
        return pa.table(
            {
                "user_id": batch.column("user_id"),
                "us": batch.column("ts").cast(pa.int64()),
                "kind": pa.array(kind, pa.int64()),
                "part": pa.array(
                    (
                        _splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def funnel(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table(
                {"stage": pa.array([], pa.int64()),
                 "n_users": pa.array([], pa.int64())}
            )
        users, stage = _funnel_kernel(
            _np(block.column("user_id")),
            _np(block.column("us")),
            _np(block.column("kind")),
        )
        st, n = np.unique(stage, return_counts=True)
        return pa.table(
            {"stage": pa.array(st, pa.int64()),
             "n_users": pa.array(n.astype(np.int64), pa.int64())}
        )

    parts = collect_table_typed(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(funnel, batch_format="pyarrow"),
        {"stage": pa.int64(), "n_users": pa.int64()},
    )
    out = parts.group_by(["stage"]).aggregate([("n_users", "sum")])
    return rename_select(
        out, {"stage": "stage", "n_users_sum": "n_users"}
    ).sort_by("stage")


# late-data model: deterministic ingest jitter — a 32-bit Knuth hash
# of event_id (the same multiplicative hash sample_documents uses)
# minus 1 h, i.e. an arrival offset in [−3600 s, +695 s] per event
# (early-skewed multi-source ingest); 30 min allowed lateness, 1 h
# tumbling windows
ARRIVAL_JITTER_US = 7_200_000_000  # offset window: hash − JITTER/2
ALLOWED_LATENESS_US = 1_800_000_000
HOUR_US = 3_600_000_000
from crawl_ray.pipelines.textops import (  # noqa: E402 — one hash, one source
    SAMPLE_MODULUS as _ARRIVAL_MOD,
    SAMPLE_MULT as _ARRIVAL_MULT,
)


def events_late_data(sf_dir: str) -> pa.Table:
    """Watermark / late-data accounting — the streaming semantics tier
    §2.9 leaves to "beyond the reference": events arrive in a
    deterministic jittered order; the watermark is the RUNNING MAX
    event time over everything that arrived earlier; an event is late
    when its hour window closed (window end ≤ watermark − allowed
    lateness) before it arrived.  Output: per window, total events and
    how many a streaming engine would have dropped/side-output.

    Scale shape: the running max is a distributed PREFIX SCAN — one
    arrival-order sort, then a pass that materializes each row's
    WITHIN-BLOCK exclusive running max plus its block key, a bounded
    per-block max table (O(blocks)) whose exclusive cummax broadcasts,
    and a final row-local pass (wm = max(local, block prefix)).  No
    step holds more than a block; the driver sees only block maxima
    and the per-window histogram."""
    from crawl_ray.util import collect_table, collect_table_typed

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def add_arrival(batch: pa.Table) -> pa.Table:
        eid = _np(batch.column("event_id")).astype(np.int64)
        us = _np(batch.column("ts").cast(pa.int64()))
        with np.errstate(over="ignore"):
            h = (eid.astype(np.uint64) * np.uint64(_ARRIVAL_MULT)) % np.uint64(
                _ARRIVAL_MOD
            )
        # h < 2^32 < JITTER window, so no modulo: offset = h − 1 h
        jitter = h.astype(np.int64) - ARRIVAL_JITTER_US // 2
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "us": pa.array(us, pa.int64()),
                "arr": pa.array(us + jitter, pa.int64()),
            }
        )

    NEG = np.int64(np.iinfo(np.int64).min // 4)

    def local_scan(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"event_id": pa.array([], pa.int64()),
                 "us": pa.array([], pa.int64()),
                 "local_wm": pa.array([], pa.int64()),
                 "blk_arr": pa.array([], pa.int64()),
                 "blk_eid": pa.array([], pa.int64())}
            )
        eid = _np(batch.column("event_id"))
        us = _np(batch.column("us"))
        arr = _np(batch.column("arr"))
        o = np.lexsort((eid, arr))
        eid, us, arr = eid[o], us[o], arr[o]
        local = np.empty(len(us), dtype=np.int64)
        local[0] = NEG
        if len(us) > 1:
            np.maximum.accumulate(us[:-1], out=local[1:])
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "us": pa.array(us, pa.int64()),
                "local_wm": pa.array(local, pa.int64()),
                # block key = first (arr, eid) in arrival order: blocks
                # are contiguous arrival ranges after the sort
                "blk_arr": pa.array(np.full(len(us), arr[0]), pa.int64()),
                "blk_eid": pa.array(np.full(len(us), eid[0]), pa.int64()),
            }
        )

    p1 = (
        ds.map_batches(add_arrival, batch_format="pyarrow", zero_copy_batch=True)
        .sort(["arr", "event_id"])
        .map_batches(local_scan, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    def blk_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"blk_arr": batch.column("blk_arr"),
             "blk_eid": batch.column("blk_eid"),
             "max_us": batch.column("us")}
        )
        g = t.group_by(["blk_arr", "blk_eid"]).aggregate([("max_us", "max")])
        return rename_select(
            g, {"blk_arr": "blk_arr", "blk_eid": "blk_eid", "max_us_max": "max_us"}
        )

    bp = collect_table_typed(
        p1.map_batches(blk_partial, batch_format="pyarrow", zero_copy_batch=True),
        {"blk_arr": pa.int64(), "blk_eid": pa.int64(), "max_us": pa.int64()},
    )
    bt = bp.group_by(["blk_arr", "blk_eid"]).aggregate([("max_us", "max")])
    ba = bt.column("blk_arr").to_numpy(zero_copy_only=False)
    be = bt.column("blk_eid").to_numpy(zero_copy_only=False)
    bm = bt.column("max_us_max").to_numpy(zero_copy_only=False).astype(np.int64)
    o = np.lexsort((be, ba))
    ba, be, bm = ba[o], be[o], bm[o]
    prefix = np.empty(len(bm), dtype=np.int64)
    if len(bm):  # empty events table: no blocks, empty prefix map
        prefix[0] = NEG
    if len(bm) > 1:
        np.maximum.accumulate(bm[:-1], out=prefix[1:])
    blocks_ref = ray.put(
        {(int(a), int(e)): int(p) for a, e, p in zip(ba, be, prefix)}
    )

    def late_partial(batch: pa.Table) -> pa.Table:
        pref = ray.get(blocks_ref)
        us = _np(batch.column("us"))
        local = _np(batch.column("local_wm"))
        a = _np(batch.column("blk_arr"))
        e = _np(batch.column("blk_eid"))
        # map each row to its block's prefix: unique composite keys
        # (few per batch) looked up once, rows resolved via inverse
        uk, inv = np.unique(np.stack([a, e], axis=1), axis=0,
                            return_inverse=True)
        blk_pref = np.array(
            [pref[(int(x), int(y))] for x, y in uk], dtype=np.int64
        )
        row_pref = blk_pref[inv]
        wm = np.maximum(local, row_pref)
        win = (us // HOUR_US) * HOUR_US
        late = (win + HOUR_US <= wm - ALLOWED_LATENESS_US).astype(np.int64)
        t = pa.table(
            {"window_start": pa.array(win, pa.int64()),
             "n_events": pa.array(np.ones(len(us), np.int64), pa.int64()),
             "n_late": pa.array(late, pa.int64())}
        )
        g = t.group_by(["window_start"]).aggregate(
            [("n_events", "sum"), ("n_late", "sum")]
        )
        return rename_select(
            g, {"window_start": "window_start", "n_events_sum": "n_events",
                "n_late_sum": "n_late"}
        )

    parts = collect_table_typed(
        p1.map_batches(late_partial, batch_format="pyarrow", zero_copy_batch=True),
        {"window_start": pa.int64(), "n_events": pa.int64(),
         "n_late": pa.int64()},
    )
    out = parts.group_by(["window_start"]).aggregate(
        [("n_events", "sum"), ("n_late", "sum")]
    )
    return rename_select(
        out, {"window_start": "window_start", "n_events_sum": "n_events",
              "n_late_sum": "n_late"}
    ).sort_by("window_start")


def events_window_distinct(sf_dir: str, num_partitions: int = 32) -> pa.Table:
    """Exact distinct-user counts per sliding window (6 h / 2 h) — the
    windowed COUNT(DISTINCT) that a sketch (stats.hll_distinct_users)
    approximates, done exactly with ONE shuffle: batch-local explode to
    the 3 covering windows + pair dedup (np.unique) → shuffle keyed on
    a mixed hash of ``(window, user) % P`` (pair-disjoint partitions: a
    pair lands in exactly one partition, so per-partition dedup is
    globally exact and counts are additive across partitions) →
    per-partition per-window counts → bounded driver combine
    (windows × P rows)."""
    from crawl_ray.util import collect_table, collect_table_typed

    from crawl_ray.pipelines.stats import _splitmix64

    n_cover = WINDOW_SIZE_US // WINDOW_SLIDE_US
    P = num_partitions
    _M1 = np.uint64(0x9E3779B97F4A7C15)
    _M2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def explode_pairs(batch: pa.Table) -> pa.Table:
        us = _np(batch.column("ts").cast(pa.int64()))
        user = _np(batch.column("user_id").cast(pa.int64()))
        base = (us // WINDOW_SLIDE_US) * WINDOW_SLIDE_US
        offsets = np.arange(n_cover, dtype=np.int64) * WINDOW_SLIDE_US
        starts = (base[:, None] - offsets[None, :]).ravel()
        users = np.repeat(user, n_cover)
        pairs = np.unique(np.stack([starts, users], axis=1), axis=0)
        with np.errstate(over="ignore"):
            # window_start is a multiple of WINDOW_SLIDE_US (= 2^11·odd
            # µs), so the raw product has 11+ known-zero low bits — the
            # splitmix64 finalizer spreads the window component into the
            # low bits `% P` reads; without it, power-of-two P degrades
            # the partition key to user_id low bits (hot-partition risk
            # for strided/sharded user ids)
            h = _splitmix64(
                pairs[:, 0].astype(np.uint64) * _M1
                ^ pairs[:, 1].astype(np.uint64) * _M2
            )
        return pa.table(
            {
                "window_start": pa.array(pairs[:, 0], pa.int64()),
                "user_id": pa.array(pairs[:, 1], pa.int64()),
                "part": pa.array(
                    (h % np.uint64(P)).astype(np.int64), pa.int64()
                ),
            }
        )

    def count_partial(group: pa.Table) -> pa.Table:
        w = _np(group.column("window_start"))
        u = _np(group.column("user_id"))
        pairs = np.unique(np.stack([w, u], axis=1), axis=0)
        uw, cnt = np.unique(pairs[:, 0], return_counts=True)
        return pa.table(
            {"window_start": pa.array(uw, pa.int64()),
             "n_users": pa.array(cnt.astype(np.int64), pa.int64())}
        )

    parts = (
        _read(sf_dir, "events", ["ts", "user_id"])
        .map_batches(explode_pairs, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("part")
        .map_groups(count_partial, batch_format="pyarrow")
    )
    t = collect_table_typed(
        parts, {"window_start": pa.int64(), "n_users": pa.int64()}
    )
    out = t.group_by(["window_start"]).aggregate([("n_users", "sum")])
    return rename_select(
        out, {"window_start": "window_start", "n_users_sum": "n_users"}
    ).sort_by("window_start")


def events_gap_stats(sf_dir: str, num_partitions: int | None = None):
    """Inter-arrival-time statistics per event type — the arrival-rate
    profile a scheduler or anomaly monitor reads: per user (ordered by
    ``ts, event_id``) each event's gap to the user's previous event,
    attributed to the LATER event's type; reported as exact median and
    truncating-mean gap seconds.

    Shape: ONE salted-user hash exchange (the :func:`events_lead_lag`
    plan), whole-partition vectorized lag kernel, then per-partition
    bounded (type × gap_s) histogram partials — the median comes off
    the combined histogram (``value_quantiles_per_type`` rank math), so
    no second shuffle and no event-level sort."""
    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.pipelines.stats import (
        _splitmix64,
        _weighted_rank_quantiles,
    )

    n_parts = num_partitions or _default_partitions()
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = _np(batch.column("user_id"))
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "us": batch.column("ts").cast(pa.int64()),
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "part": pa.array(
                    (
                        _splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def gap_hist(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {"event_type": pa.array([], pa.string()),
             "gap_s": pa.array([], pa.int64()),
             "n": pa.array([], pa.int64())}
        )
        if block.num_rows == 0:
            return empty
        uid = _np(block.column("user_id"))
        ts = _np(block.column("us"))
        eid = _np(block.column("event_id"))
        etype = block.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, ts, etype = uid[order], ts[order], etype[order]
        if len(uid) < 2:
            return empty
        same_user = uid[1:] == uid[:-1]
        gaps = (ts[1:] - ts[:-1]) // 1_000_000
        t = pa.table(
            {
                "event_type": pa.array(etype[1:][same_user], pa.string()),
                "gap_s": pa.array(gaps[same_user], pa.int64()),
                "n": pa.array(
                    np.ones(int(same_user.sum()), dtype=np.int64)
                ),
            }
        )
        out = t.group_by(["event_type", "gap_s"]).aggregate([("n", "sum")])
        return rename_select(
            out, {"event_type": "event_type", "gap_s": "gap_s", "n_sum": "n"}
        )

    from crawl_ray.util import collect_table_typed

    partials = collect_table_typed(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(gap_hist, batch_format="pyarrow"),
        {"event_type": pa.string(), "gap_s": pa.int64(), "n": pa.int64()},
    )
    combined = partials.group_by(["event_type", "gap_s"]).aggregate([("n", "sum")])
    types = np.array(combined.column("event_type").to_pylist(), dtype=object)
    gaps = combined.column("gap_s").to_numpy()
    counts = combined.column("n_sum").to_numpy()
    out_t, out_n, out_med, out_mean = [], [], [], []
    for t in sorted(set(types)):
        m = types == t
        v, c = gaps[m], counts[m]
        n = int(c.sum())
        # the shared DuckDB quantile_disc rank convention — ONE
        # definition (stats._weighted_rank_quantiles), not an inline
        # copy that can drift
        med = int(_weighted_rank_quantiles(v, c, (50,))[0])
        order = np.argsort(v)
        v, c = v[order], c[order]
        total = int(np.dot(v.astype(object), c.astype(object)))
        out_t.append(str(t))
        out_n.append(n)
        out_med.append(med)
        out_mean.append(total * 1000 // n)
    return pa.table(
        {
            "event_type": pa.array(out_t, pa.string()),
            "n_gaps": pa.array(out_n, pa.int64()),
            "median_gap_s": pa.array(out_med, pa.int64()),
            "mean_gap_milli_s": pa.array(out_mean, pa.int64()),
        }
    )


def event_transition_matrix(sf_dir: str, num_partitions: int | None = None):
    """Per-user event-type transition counts (the first-order Markov
    matrix behind funnel design and bot detection): for every
    consecutive pair of a user's events (ordered by ``ts, event_id``),
    count (prev_type → type).  ONE salted-user exchange, whole-partition
    lag kernel, bounded |types|² combiner — the categorical companion
    to :func:`events_gap_stats`."""
    from crawl_ray.pipelines.joins import _default_partitions
    from crawl_ray.pipelines.stats import _splitmix64
    from crawl_ray.util import collect_table, collect_table_typed

    n_parts = num_partitions or _default_partitions()
    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])

    def add_part(batch: pa.Table) -> pa.Table:
        uid = _np(batch.column("user_id"))
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "us": batch.column("ts").cast(pa.int64()),
                "user_id": batch.column("user_id"),
                "event_type": batch.column("event_type"),
                "part": pa.array(
                    (
                        _splitmix64(uid.astype(np.uint64)) % np.uint64(n_parts)
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    def transitions(block: pa.Table) -> pa.Table:
        empty = pa.table(
            {"prev_type": pa.array([], pa.string()),
             "event_type": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())}
        )
        if block.num_rows < 2:
            return empty
        uid = _np(block.column("user_id"))
        ts = _np(block.column("us"))
        eid = _np(block.column("event_id"))
        etype = block.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts, uid))
        uid, etype = uid[order], etype[order]
        same_user = uid[1:] == uid[:-1]
        t = pa.table(
            {
                "prev_type": pa.array(etype[:-1][same_user], pa.string()),
                "event_type": pa.array(etype[1:][same_user], pa.string()),
                "n": pa.array(np.ones(int(same_user.sum()), dtype=np.int64)),
            }
        )
        out = t.group_by(["prev_type", "event_type"]).aggregate([("n", "sum")])
        return rename_select(
            out,
            {"prev_type": "prev_type", "event_type": "event_type", "n_sum": "n"},
        )

    partials = collect_table_typed(
        ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(transitions, batch_format="pyarrow"),
        {"prev_type": pa.string(), "event_type": pa.string(),
         "n": pa.int64()},
    )
    out = partials.group_by(["prev_type", "event_type"]).aggregate([("n", "sum")])
    out = rename_select(
        out,
        {"prev_type": "prev_type", "event_type": "event_type", "n_sum": "n_transitions"},
    )
    return out.sort_by(
        [("prev_type", "ascending"), ("event_type", "ascending")]
    )
