"""Edge-case tests for the event-stream operators (as-of join,
sliding window, sessionize) over a hand-built events table: timestamp
ties, purchases with no prior click, click exactly at the purchase ts,
and single-event sessions."""

import pathlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl_ray.pipelines import streams as S

US = 1_000_000


def _events_dir(tmp_path: pathlib.Path) -> str:
    # user 1: click@10, click@20, purchase@20 (tie -> click@20 wins),
    #          purchase@15 (-> click@10), two clicks at identical ts 30
    #          (ids 10, 11 -> max id 11 wins) then purchase@40
    # user 2: purchase@5 with no prior click (dropped)
    # user 3: clicks only (no purchases)
    rows = [
        # (event_id, ts_s, user_id, event_type, value)
        (1, 10, 1, "click", 1.0),
        (2, 20, 1, "click", 1.0),
        (3, 20, 1, "purchase", 5.0),
        (4, 15, 1, "purchase", 7.0),
        (10, 30, 1, "click", 1.0),
        (11, 30, 1, "click", 1.0),
        (12, 40, 1, "purchase", 9.0),
        (20, 5, 2, "purchase", 3.0),
        (30, 7, 3, "click", 1.0),
        (31, 9, 3, "view", 2.0),
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * US for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_asof_ties_and_missing(tmp_path, ray_session):
    out = S.events_asof_join(_events_dir(tmp_path)).to_pandas()
    got = {
        int(r.purchase_id): (int(r.click_id), int(r.gap_us))
        for r in out.itertuples()
    }
    assert got == {
        3: (2, 0),  # tie: click at exactly purchase ts is eligible
        4: (1, 5 * US),
        12: (11, 10 * US),  # duplicate click ts -> max event_id
    }
    assert (out["user_id"] == 1).all()  # user 2/3 emit nothing


def test_sessionize_gaps_and_singletons(tmp_path, ray_session):
    # user 1 events at 10,15,20,20,30,30,40 s: all one session
    # (gap 1800 s); user 2 and 3 each get their own sessions
    out = S.sessionize(_events_dir(tmp_path)).to_pandas()
    u1 = out[out.user_id == 1]
    assert len(u1) == 1 and int(u1.iloc[0].n_events) == 7
    assert int(u1.iloc[0].duration_us) == 30 * US
    assert int(u1.iloc[0].sum_value_cents) == 2500
    u2 = out[out.user_id == 2]
    assert len(u2) == 1 and int(u2.iloc[0].n_events) == 1
    assert int(u2.iloc[0].duration_us) == 0


def test_sessionize_splits_on_gap(tmp_path, ray_session):
    gap = S.SESSION_GAP_US
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array([0, gap, 2 * gap + 1, 2 * gap + 2], pa.timestamp("us")),
            "user_id": pa.array([7, 7, 7, 7], pa.int64()),
            "event_type": pa.array(["view"] * 4, pa.string()),
            "value": pa.array([1.0] * 4, pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = S.sessionize(str(tmp_path)).to_pandas()
    # gap of exactly SESSION_GAP_US does NOT split; gap+1 does
    assert out.n_events.tolist() == [2, 2]
    assert out.session_idx.tolist() == [0, 1]


def test_sliding_window_coverage(tmp_path, ray_session):
    _events_dir(tmp_path)
    out = S.events_sliding_window(str(tmp_path)).to_pandas()
    n_cover = S.WINDOW_SIZE_US // S.WINDOW_SLIDE_US
    # every event lands in exactly size/slide windows
    assert out.n_events.sum() == 10 * n_cover
    # all events are in the first slide bucket -> same 3 windows per type
    starts = sorted(set(out.window_start))
    expect = [-(k * S.WINDOW_SLIDE_US) for k in range(int(n_cover))][::-1]
    assert starts == expect
    # window_start <= ts < window_start + size for every emitted window
    assert all(s <= 40 * US and 40 * US - 30 * US < s + S.WINDOW_SIZE_US
               for s in starts)


def test_sessionize_bucketed_equals_plain(tmp_path, ray_session):
    _events_dir(tmp_path)
    plain = S.sessionize(str(tmp_path)).to_pandas()
    bucketed = S.sessionize_bucketed(str(tmp_path)).to_pandas()
    assert plain.equals(bucketed)


def test_sessionize_bucketed_stitches_across_boundaries(tmp_path, ray_session):
    gap = S.SESSION_GAP_US
    B = gap  # smallest legal bucket: every bucket edge is a potential split
    # user 7: a session STRADDLING a bucket edge (events at B-1, B+1 —
    # gap 2µs), then a chain through an EMPTY bucket (event at 3B+gap
    # relative to 3B-... ), then a real split
    ts = [B - 1, B + 1,              # straddle edge -> one session
          3 * B, 4 * B - 1, 4 * B + gap - 1,   # chain across 2 edges
          6 * B + 2 * gap]           # real split (> gap after previous)
    t = pa.table(
        {
            "event_id": pa.array(list(range(1, len(ts) + 1)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * len(ts), pa.int64()),
            "event_type": pa.array(["view"] * len(ts), pa.string()),
            "value": pa.array([1.0] * len(ts), pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    plain = S.sessionize(str(tmp_path)).to_pandas()
    bucketed = S.sessionize_bucketed(str(tmp_path), bucket_us=B).to_pandas()
    assert plain.equals(bucketed)
    assert bucketed.n_events.tolist() == [2, 3, 1]
    assert bucketed.session_idx.tolist() == [0, 1, 2]


def test_asof_bucketed_equals_plain(tmp_path, ray_session):
    _events_dir(tmp_path)
    plain = S.events_asof_join(_events_dir(tmp_path)).to_pandas()
    buck = S.events_asof_join_bucketed(str(tmp_path)).to_pandas()
    assert plain.equals(buck)


def test_asof_bucketed_carry_chain(tmp_path, ray_session):
    B = 1_000_000_000  # 1000 s buckets
    # user 1: click in bucket 0; bucket 1 has only a purchase (carry
    # from bucket 0 through summary chain); bucket 3 purchase skips the
    # empty bucket 2; bucket 4: click AFTER the purchase in-bucket ->
    # must still use the carry, not the later click
    rows = [
        (1, 100, "click"),
        (2, B + 100, "purchase"),          # -> click 1 (carry)
        (3, 3 * B + 5, "purchase"),        # -> click 1 (carry over empty b2)
        (4, 4 * B + 10, "purchase"),       # -> click 1 (carry; click 5 is later)
        (5, 4 * B + 20, "click"),
        (6, 4 * B + 30, "purchase"),       # -> click 5 (in-bucket)
    ]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = S.events_asof_join_bucketed(str(tmp_path), bucket_us=B).to_pandas()
    got = dict(zip(out.purchase_id.astype(int), out.click_id.astype(int)))
    assert got == {2: 1, 3: 1, 4: 1, 6: 5}
    plain = S.events_asof_join(str(tmp_path)).to_pandas()
    assert plain.equals(out)


def test_rolling_sum_frame_and_user_reset(tmp_path, ray_session):
    # user 1: values 1,2,3,4 -> rolling(3): 100,300,600,900
    # user 2: single event -> its own value (frame clipped at user start)
    rows = [(1, 10, 1, 1.0), (2, 20, 1, 2.0), (3, 30, 1, 3.0),
            (4, 40, 1, 4.0), (5, 15, 2, 9.0)]
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] * US for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    out = S.events_rolling_sum(str(tmp_path)).to_pandas()
    got = dict(zip(out.event_id.astype(int), out.rolling_sum_cents.astype(int)))
    assert got == {1: 100, 2: 300, 3: 600, 4: 900, 5: 900}
