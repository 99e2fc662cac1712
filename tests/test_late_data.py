"""events_late_data vs an independent single-pass Python reference on
a hand corpus with known late events (plus the sf oracle in
tests/test_queries_oracle.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crawl_ray.pipelines.streams import (
    ALLOWED_LATENESS_US,
    ARRIVAL_JITTER_US,
    HOUR_US,
    _ARRIVAL_MOD,
    _ARRIVAL_MULT,
    events_late_data,
)


@pytest.fixture(scope="module")
def rand_events_dir(tmp_path_factory):
    rng = np.random.RandomState(7)
    n = 5000
    ts = np.sort(rng.randint(0, 40 * HOUR_US, size=n).astype(np.int64))
    d = tmp_path_factory.mktemp("late_events")
    pq.write_table(
        pa.table(
            {"event_id": pa.array(np.arange(n), pa.int64()),
             "ts": pa.array(ts, pa.timestamp("us")),
             "user_id": pa.array(np.zeros(n, np.int64)),
             "event_type": pa.array(["view"] * n, pa.string()),
             "value": pa.array(np.zeros(n)),
             "props": pa.array([""] * n, pa.string())}
        ),
        d / "events.parquet",
    )
    return str(d), ts


def test_late_data_matches_serial_reference(rand_events_dir, ray_session):
    d, ts = rand_events_dir
    eid = np.arange(len(ts), dtype=np.int64)
    jitter = (
        (eid.astype(np.uint64) * np.uint64(_ARRIVAL_MULT))
        % np.uint64(_ARRIVAL_MOD)
    ).astype(np.int64) % ARRIVAL_JITTER_US - ARRIVAL_JITTER_US // 2
    arr = ts + jitter
    order = np.lexsort((eid, arr))
    # serial watermark scan in arrival order
    expect = {}
    wm = None
    for i in order.tolist():
        win = (int(ts[i]) // HOUR_US) * HOUR_US
        late = wm is not None and win + HOUR_US <= wm - ALLOWED_LATENESS_US
        n, nl = expect.get(win, (0, 0))
        expect[win] = (n + 1, nl + int(late))
        wm = int(ts[i]) if wm is None else max(wm, int(ts[i]))
    got = events_late_data(d).to_pandas()
    assert int(got.n_late.sum()) > 0  # the fixture must exercise lateness
    for row in got.itertuples():
        assert expect[row.window_start] == (row.n_events, row.n_late)
    assert len(got) == len(expect)
