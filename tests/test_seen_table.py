"""SeenTable vs a Python-set reference model (incl. hypothesis fuzz)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from crawl_ray.state.seen import SeenTable


def test_basic_add_contains():
    t = SeenTable(16)
    keys = np.array([5, 7, 5, 9], dtype=np.uint64)
    new = t.add(keys)
    assert new.tolist() == [True, True, False, True]
    assert t.contains(np.array([5, 6, 7, 9], dtype=np.uint64)).tolist() == [
        True,
        False,
        True,
        True,
    ]
    assert len(t) == 3


def test_zero_key_remap():
    t = SeenTable(16)
    assert t.add(np.array([0], dtype=np.uint64)).tolist() == [True]
    assert t.contains(np.array([0, 1], dtype=np.uint64)).tolist() == [True, True]


def test_growth():
    t = SeenTable(16)
    keys = np.arange(1, 5000, dtype=np.uint64)
    new = t.add(keys)
    assert new.all()
    assert len(t) == 4999
    assert t.contains(keys).all()
    assert not t.contains(np.arange(5000, 6000, dtype=np.uint64)).any()


def test_dump_snapshot_restore():
    t = SeenTable(16)
    keys = np.array([3, 1 << 60, 42], dtype=np.uint64)
    t.add(keys)
    assert sorted(t.dump().tolist()) == sorted(keys.tolist())
    t2 = SeenTable.restore(t.snapshot())
    assert t2.contains(keys).all()
    assert len(t2) == 3


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=80),
        min_size=1,
        max_size=6,
    )
)
def test_matches_set_model(batches):
    """Small key range forces heavy collisions/probing and duplicates."""
    t = SeenTable(16)
    model: set[int] = set()
    for batch in batches:
        arr = np.array(batch, dtype=np.uint64)
        expected_new = []
        seen_in_batch = set(model)
        for k in batch:
            kk = 1 if k == 0 else k
            expected_new.append(kk not in seen_in_batch)
            seen_in_batch.add(kk)
        got_new = t.add(arr)
        assert got_new.tolist() == expected_new
        model = seen_in_batch
        probe = np.arange(0, 210, dtype=np.uint64)
        expect = [(1 if p == 0 else p) in model for p in probe.tolist()]
        assert t.contains(probe).tolist() == expect
    assert len(t) == len(model)


def test_uint64_shard_routing_matches_scalar():
    """Regression: ``np.uint64 % python-int`` silently promotes to
    float64 and loses low bits, mis-routing hosts to the wrong shard.
    Every shard-routing site must use ``% np.uint64(n)`` so the batch
    hash, the scalar hash and the driver-side route agree."""
    import numpy as np

    from crawl_ray.urlnorm import fnv1a64, fnv1a64_batch

    hosts = [f"cookiehost{k}.example" for k in range(64)] + [
        "host1.example", "cookieshared.example", "a.b.c.example:8080",
    ]
    for n_shards in (2, 3, 4, 7):
        batch = fnv1a64_batch(hosts) % np.uint64(n_shards)
        for h, b in zip(hosts, batch.tolist()):
            assert b == fnv1a64(h) % n_shards, (h, n_shards)
            # the trap: float64 promotion gives a DIFFERENT answer for
            # hashes with >53 significant bits — keep proving the guard
            # matters for at least one input
    assert any(
        int(fnv1a64_batch([h])[0] % 2) != fnv1a64(h) % 2  # noqa: S001 - the trap itself
        for h in hosts
    )
