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


# -- CuckooSeenTable (ST4 memory-envelope backend) ----------------------


def test_cuckoo_basic_add_contains():
    from crawl_ray.state.seen import CuckooSeenTable

    t = CuckooSeenTable(64)
    keys = np.array([5, 7, 5, 9], dtype=np.uint64)
    new = t.add(keys)
    assert new.tolist() == [True, True, False, True]
    assert t.contains(np.array([5, 7, 9], dtype=np.uint64)).all()
    assert len(t) == 3
    assert not t.add(keys).any()  # re-add: nothing new


def test_cuckoo_no_false_negatives_50k():
    from crawl_ray.state.seen import CuckooSeenTable

    rng = np.random.default_rng(11)
    keys = rng.choice(1 << 62, size=50_000, replace=False).astype(np.uint64)
    t = CuckooSeenTable(60_000)
    new = t.add(keys)
    # a handful of in-batch fingerprint collisions legitimately report
    # as already-seen (the documented FP semantics) — but only a handful
    assert int(new.sum()) >= 49_990
    assert len(t) == int(new.sum())
    # cuckoo guarantee: every added key IS contained
    assert t.contains(keys).all()
    # false positives bounded: expected ~1.2e-4 on absent probes
    probe = (keys.max() + 1 + np.arange(100_000)).astype(np.uint64)
    fp = int(t.contains(probe).sum())
    assert fp < 100, f"false-positive rate too high: {fp}/100000"


def test_cuckoo_snapshot_restore():
    from crawl_ray.state.seen import CuckooSeenTable

    t = CuckooSeenTable(1024)
    keys = np.arange(1, 900, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    t.add(keys)
    t2 = CuckooSeenTable.restore(t.snapshot())
    assert t2.contains(keys).all()
    assert len(t2) == len(t)
    # restored table keeps inserting correctly
    more = np.array([1 << 63], dtype=np.uint64)
    assert t2.add(more).tolist() == [True]
    assert t2.contains(more).all()


def test_cuckoo_memory_per_key_within_st4_budget():
    """SURVEY §2.4 ST4: ≤4 bytes/key at the advertised capacity (the
    north rule's 10^10-key memory envelope; exact table is 13+ B/key)."""
    from crawl_ray.state.seen import CuckooSeenTable

    cap = int(0.84 * 4 * 16384)  # power-of-two friendly capacity
    t = CuckooSeenTable(cap)
    rng = np.random.default_rng(5)
    keys = rng.choice(1 << 62, size=cap, replace=False).astype(np.uint64)
    t.add(keys)
    # all fit (4-way cuckoo fills ≥0.84 load), minus the handful of
    # in-batch fingerprint collisions that legitimately read as dups
    assert len(t) >= cap - 20
    per_key = t._table.nbytes / len(t)
    assert per_key <= 4.0, f"{per_key:.2f} B/key exceeds the ST4 budget"


def test_cuckoo_dump_raises():
    from crawl_ray.state.seen import CuckooSeenTable

    t = CuckooSeenTable(64)
    t.add(np.array([1, 2], dtype=np.uint64))
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        t.dump()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=80),
        min_size=1,
        max_size=6,
    )
)
def test_cuckoo_superset_of_set_model(batches):
    """No false negatives ever; false positives essentially never at
    this key count (deterministic hashing makes any outcome stable)."""
    from crawl_ray.state.seen import CuckooSeenTable

    t = CuckooSeenTable(512)
    model: set[int] = set()
    for batch in batches:
        arr = np.array(batch, dtype=np.uint64)
        t.add(arr)
        model |= set(batch)
        probe = np.arange(0, 210, dtype=np.uint64)
        got = t.contains(probe)
        expect = np.array([p in model for p in probe.tolist()])
        assert not (expect & ~got).any(), "false negative"
        assert int((got & ~expect).sum()) <= 2, "implausible FP count"


def test_auto_backend_resolution():
    """ST4 closure: 'auto' picks exact below 10^7 keys/shard (parity,
    dump-capable) and cuckoo at or above (the 10^10 memory envelope is
    the DEFAULT, not an option)."""
    from crawl_ray.state.seen import (
        AUTO_CUCKOO_THRESHOLD,
        CuckooSeenTable,
        SeenTable,
        make_seen_table,
        resolve_seen_backend,
    )

    assert resolve_seen_backend("auto", 1 << 16) == "exact"
    assert resolve_seen_backend("auto", AUTO_CUCKOO_THRESHOLD) == "cuckoo"
    assert resolve_seen_backend("exact", 10**9) == "exact"  # explicit wins
    assert isinstance(make_seen_table("auto", 1 << 16), SeenTable)
    assert isinstance(
        make_seen_table("auto", AUTO_CUCKOO_THRESHOLD), CuckooSeenTable
    )


def test_cuckoo_1e8_ingest_envelope_and_snapshot():
    """The SURVEY §2.4 ST4 design-point test: one shard ingests 10^8
    URL hashes — the ≤4 B/key memory envelope holds, no key is ever
    falsely absent, and snapshot/restore round-trips at that size.
    (The bulk scatter-retry insert path makes this minutes, not hours:
    ~1.5 µs/key, gather-bound.)"""
    from crawl_ray.state.seen import CuckooSeenTable, _splitmix64

    N = 100_000_000
    B = 5_000_000
    tab = CuckooSeenTable(N)
    assert tab._table.nbytes <= 4 * N, "table alone busts the envelope"
    for lo in range(0, N, B):
        keys = _splitmix64(
            np.arange(lo, lo + B, dtype=np.uint64) ^ np.uint64(0xABCDEF)
        )
        tab.add(keys)
    # count is within the in-batch/false-positive dedup slack (~1e-4)
    assert len(tab) > N * 0.999
    # total footprint (table + stash) within 4 B/key
    total_bytes = tab._table.nbytes + 16 * len(tab._stash)
    assert total_bytes <= 4 * N, f"{total_bytes / N:.2f} B/key"
    # never a false negative: a 2M-key sample of what was added
    probe = _splitmix64(
        np.arange(0, 2_000_000, dtype=np.uint64) ^ np.uint64(0xABCDEF)
    )
    assert bool(tab.contains(probe).all())
    # snapshot/restore at size
    restored = CuckooSeenTable.restore(tab.snapshot())
    assert len(restored) == len(tab)
    assert bool(restored.contains(probe).all())


# -- Seen128Table (incremental-dedup membership) ----------------------------


def test_seen128_basic_and_lo_collisions():
    """Distinct 128-bit keys sharing a lo word must be independently
    storable and distinguishable — the whole point of the hi word."""
    from crawl_ray.state.seen import Seen128Table

    t = Seen128Table(16)
    lo = np.array([7, 7, 7, 9], dtype=np.uint64)
    hi = np.array([1, 2, 3, 1], dtype=np.uint64)
    new = t.add(lo, hi)
    assert new.all() and len(t) == 4
    assert t.contains(lo, hi).all()
    # same lo, unseen hi -> NOT a member
    assert not t.contains(
        np.array([7], np.uint64), np.array([99], np.uint64)
    ).any()
    # unseen lo -> not a member
    assert not t.contains(
        np.array([8], np.uint64), np.array([1], np.uint64)
    ).any()
    # re-add: nothing new
    assert not t.add(lo, hi).any()
    assert len(t) == 4


def test_seen128_batch_dups_and_growth():
    from crawl_ray.state.seen import Seen128Table

    rng = np.random.default_rng(42)
    t = Seen128Table(16)  # force many growth cycles
    lo = rng.integers(0, 1 << 40, size=5000).astype(np.uint64)
    hi = rng.integers(0, 1 << 40, size=5000).astype(np.uint64)
    # duplicate every pair: exactly the distinct pairs count as new
    lo2 = np.r_[lo, lo]
    hi2 = np.r_[hi, hi]
    new = t.add(lo2, hi2)
    distinct = len(np.unique(np.stack([lo, hi], axis=1), axis=0))
    assert int(new.sum()) == distinct
    assert len(t) == distinct
    assert t.contains(lo, hi).all()
    # zero-lo sentinel remap round-trips
    z_lo = np.zeros(2, np.uint64)
    z_hi = np.array([5, 6], np.uint64)
    t.add(z_lo, z_hi)
    assert t.contains(z_lo, z_hi).all()


def test_seen128_snapshot_restore():
    from crawl_ray.state.seen import Seen128Table

    t = Seen128Table(16)
    lo = np.arange(1, 300, dtype=np.uint64)
    hi = lo * np.uint64(3)
    t.add(lo, hi)
    r = Seen128Table.restore(t.snapshot())
    assert len(r) == len(t)
    assert r.contains(lo, hi).all()
    assert not r.contains(lo, hi + np.uint64(1)).any()


# -- bloom backend (the north rule's "bloom/cuckoo" other half) -------------


def test_bloom_basic_add_contains():
    from crawl_ray.state.seen import BloomSeenTable

    t = BloomSeenTable(64)
    keys = np.array([5, 7, 5, 9], dtype=np.uint64)
    new = t.add(keys)
    assert new.tolist() == [True, True, False, True]
    assert t.contains(np.array([5, 7, 9], dtype=np.uint64)).all()
    assert len(t) == 3
    assert not t.add(keys).any()  # re-add: nothing new


def test_bloom_no_false_negatives_50k_and_fpr():
    from crawl_ray.state.seen import BloomSeenTable

    rng = np.random.default_rng(13)
    keys = rng.choice(1 << 62, size=50_000, replace=False).astype(np.uint64)
    t = BloomSeenTable(60_000)
    new = t.add(keys)
    # in-batch double-hash collisions are astronomically unlikely here
    assert int(new.sum()) >= 49_998
    assert len(t) == int(new.sum())
    # bloom guarantee: every added key IS contained
    assert t.contains(keys).all()
    # false positives bounded: ≈4.6e-4 at FULL capacity, lower here
    probe = (keys.max() + 1 + np.arange(100_000)).astype(np.uint64)
    fp = int(t.contains(probe).sum())
    assert fp < 150, f"false-positive rate too high: {fp}/100000"


def test_bloom_memory_per_key_and_graceful_overflow():
    """2 B/key at a power-of-two-aligned capacity, and — unlike the
    cuckoo backend's stash cliff — inserts far past capacity still
    succeed (the FPR degrades instead)."""
    from crawl_ray.state.seen import BloomSeenTable

    cap = 1 << 16
    t = BloomSeenTable(cap)
    rng = np.random.default_rng(7)
    keys = rng.choice(1 << 62, size=2 * cap, replace=False).astype(np.uint64)
    t.add(keys)  # 2x advertised capacity: must not raise
    assert t.contains(keys).all()
    per_key = t._words.nbytes / cap
    assert per_key <= 2.0, f"{per_key:.2f} B/key exceeds the bloom budget"


def test_bloom_snapshot_restore():
    from crawl_ray.state.seen import BloomSeenTable, restore_seen_table

    t = BloomSeenTable(256)
    keys = np.array([3, 1 << 50, 42], dtype=np.uint64)
    t.add(keys)
    r = restore_seen_table(t.snapshot())
    assert type(r) is BloomSeenTable
    assert len(r) == len(t)
    assert r.contains(keys).all()
    assert not r.add(keys).any()


def test_bloom_dump_raises():
    from crawl_ray.state.seen import BloomSeenTable

    t = BloomSeenTable(64)
    t.add(np.array([1, 2], dtype=np.uint64))
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        t.dump()


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=200), min_size=0, max_size=80),
        min_size=1,
        max_size=6,
    )
)
def test_bloom_superset_of_set_model(batches):
    """No false negatives ever; false positives essentially never at
    this key count (deterministic hashing makes any outcome stable)."""
    from crawl_ray.state.seen import BloomSeenTable

    t = BloomSeenTable(512)
    model: set[int] = set()
    for batch in batches:
        arr = np.array(batch, dtype=np.uint64)
        t.add(arr)
        model |= set(batch)
        probe = np.arange(0, 210, dtype=np.uint64)
        got = t.contains(probe)
        expect = np.array([p in model for p in probe.tolist()])
        assert not (expect & ~got).any(), "false negative"
        assert int((got & ~expect).sum()) <= 2, "implausible FP count"


def test_bloom_backend_dispatch():
    from crawl_ray.state.seen import BloomSeenTable, make_seen_table

    assert type(make_seen_table("bloom", 128)) is BloomSeenTable


def test_restore_dispatch_seen128():
    """restore_seen_table must route {'lo','hi'} snapshots to the
    exact-128 backend (the incremental-dedup membership checkpoint)."""
    import numpy as np

    from crawl_ray.state.seen import Seen128Table, restore_seen_table

    t = Seen128Table()
    lo = np.array([1, 2, 3], dtype=np.uint64)
    hi = np.array([7, 8, 9], dtype=np.uint64)
    t.add(lo, hi)
    r = restore_seen_table(t.snapshot())
    assert isinstance(r, Seen128Table)
    assert r.contains(lo, hi).all()


def test_bloom_batch_add_matches_sequential():
    """Batch add must implement exact SEQUENTIAL semantics: a key whose
    bit positions are covered by pre-state plus an EARLIER in-batch
    accepted key counts as already-seen, exactly as a one-by-one replay
    would decide (was-new mask and __len__ bit-equal)."""
    import numpy as np

    from crawl_ray.state.seen import BloomSeenTable

    rng = np.random.default_rng(11)
    for _ in range(10):
        a, b = BloomSeenTable(256), BloomSeenTable(256)
        keys = rng.integers(1, 1 << 20, size=900, dtype=np.uint64)
        a.add(keys[:500])
        b.add(keys[:500])
        batch = keys[500:]
        seq = np.array(
            [a.add(np.array([k], np.uint64))[0] for k in batch]
        )
        assert np.array_equal(seq, b.add(batch))
        assert len(a) == len(b)


def test_dom_attr_selector_semantics():
    """CSS regressions: [a|=v] requires the attribute to exist;
    unsupported operators raise instead of silently matching nothing."""
    import pytest

    from crawl_ray.dom import compile_selector, find, parse_html

    doc = parse_html('<div lang="en-US">a</div><p>b</p><i lang="en">c</i>')
    assert [n.tag for n in find(doc, "[lang|=en]")] == ["div", "i"]
    with pytest.raises(ValueError, match="unsupported attribute"):
        compile_selector('[href!="x"]')
